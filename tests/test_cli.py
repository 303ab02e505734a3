"""CLI veneer tests: each subcommand is exercised through main() with
an injected SparkSession and captured output — what the reference user
gets at a shell must be exactly what the tested library returns."""

from __future__ import annotations

import io

from etl_lens_spark import cli


def _run(spark, argv):
    buf = io.StringIO()
    rc = cli.main(argv, spark, buf)
    return rc, buf.getvalue()


def test_cli_catalog_sorted_desc(spark, sf_dir):
    rc, out = _run(
        spark,
        ["catalog", "--sf-dir", sf_dir, "--sort", "n_events:desc",
         "--format", "tsv", "--limit", "10"],
    )
    assert rc == 0
    lines = out.strip().splitlines()
    header = lines[0].split("\t")
    assert header[0] == "event_type" and "n_events" in header
    counts = [int(r.split("\t")[header.index("n_events")]) for r in lines[1:]]
    assert counts == sorted(counts, reverse=True) and counts


def test_cli_query_projects_and_limits(spark, sf_dir):
    rc, out = _run(
        spark,
        ["query", "--sf-dir", sf_dir, "--type", "click",
         "--columns", "event_id,user_id", "--limit", "5",
         "--format", "tsv"],
    )
    assert rc == 0
    lines = out.strip().splitlines()
    assert lines[0] == "event_id\tuser_id"
    assert len(lines) == 6  # header + 5 rows
    # EP2 determinism: first-N under event-time order
    ids = [int(r.split("\t")[0]) for r in lines[1:]]
    assert ids == sorted(ids) or len(set(ids)) == 5


def test_cli_sql_over_views(spark, sf_dir):
    rc, out = _run(
        spark,
        ["sql", "--sf-dir", sf_dir, "--format", "tsv",
         "SELECT r_name FROM region ORDER BY r_name"],
    )
    assert rc == 0
    names = out.strip().splitlines()[1:]
    assert names == sorted(names) and len(names) == 5


def test_cli_run_registry_and_unknown(spark, sf_dir):
    rc, out = _run(
        spark,
        ["run", "r_catalog_build", "--sf-dir", sf_dir,
         "--format", "tsv", "--limit", "50"],
    )
    assert rc == 0
    assert "event_type" in out.splitlines()[0]
    rc, _ = _run(spark, ["run", "definitely_not_a_query"])
    assert rc == 2


def test_cli_explain_shows_pushdown(spark, sf_dir):
    rc, out = _run(spark, ["explain", "q6_revenue_forecast",
                           "--sf-dir", sf_dir])
    assert rc == 0
    assert "PushedFilters" in out and "Physical Plan" in out


def test_cli_list_names_every_registry_query(spark):
    from etl_lens_spark.queries import REGISTRY, _load

    _load()
    rc, out = _run(spark, ["list"])
    assert rc == 0
    listed = {ln.split("\t")[0] for ln in out.strip().splitlines()}
    assert listed == set(REGISTRY)


def test_cli_oracle_subcommand(spark):
    # runs the differential check through the CLI veneer; exit code
    # carries the pass/fail contract
    rc, _ = _run(spark, ["oracle", "r_catalog_build"])
    assert rc == 0
