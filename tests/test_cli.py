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


def test_cli_explain_golden_matches_headline_pin(spark, sf_dir):
    """Golden explain (VERDICT r4 #9): the user-facing `explain`
    subcommand output for a pinned headline must carry exactly the
    plan the pin table audits — exchange count, no join/Python nodes,
    whole-stage codegen on the agg path, and a pruned ReadSchema —
    so the CLI's answer to 'what will this do to my cluster' is the
    same plan CI pins."""
    from tests.test_plan_shapes import HEADLINE_PINS

    rc, out = _run(spark, ["explain", "q1_pricing_summary",
                           "--sf-dir", sf_dir])
    assert rc == 0
    want_ex, want_joins, want_py = HEADLINE_PINS["q1_pricing_summary"]
    assert out.count("Exchange") >= want_ex  # formatted mode lists nodes
    assert "Join" not in out and want_joins == set()
    assert "EvalPython" not in out and "InPandas" not in out
    # partial+final agg pair around the one shuffle (tree section
    # nodes are "HashAggregate (n)"; the detail section repeats them
    # as "(n) HashAggregate")
    import re

    assert len(re.findall(r"HashAggregate \(\d+\)", out)) == 2
    # column pruning reached the scan: only the 7 q1 columns are read
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", out)
    assert m, out
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }


def test_cli_config_lists_every_knob_and_reflects_sets(spark, sf_dir):
    """The `config` subcommand is the user-facing dial surface: every
    registered knob prints with current/default/meaning, and a
    session-level SET shows up as current != default."""
    from etl_lens_spark.config import KNOBS

    rc, out = _run(spark, ["config"])
    assert rc == 0
    lines = [ln for ln in out.strip().splitlines() if ln]
    keys = {ln.split("\t")[0] for ln in lines}
    assert keys == set(KNOBS)
    spark.conf.set("spark.etl_lens.cms.width", "512")
    try:
        rc, out = _run(spark, ["config"])
        row = next(
            ln for ln in out.splitlines()
            if ln.startswith("spark.etl_lens.cms.width")
        )
        assert "\t512\t" in row and "(set)" in row
    finally:
        spark.conf.unset("spark.etl_lens.cms.width")
