"""[R] semantics unit tests: first-seen dedup, non-zero coalesce,
enum fallback, ragged conform — the reference behaviors SURVEY §5
flags as non-standard (``src/main.cpp:45-53, 256-259, 796-803,
1292-1303``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_lens_spark import catalog as cat


def test_first_seen_is_deterministic_first_row(spark):
    df = spark.createDataFrame(
        [
            ("a", 3, "third"),
            ("a", 1, "first"),
            ("a", 2, "second"),
            ("b", 9, "only"),
        ],
        "key string, seq int, payload string",
    )
    out = cat.first_seen(df, ["key"], [F.col("seq")]).collect()
    got = {r["key"]: r["payload"] for r in out}
    assert got == {"a": "first", "b": "only"}


def test_coalesce_nonzero_skips_zero_not_null():
    # reference semantics: first NON-ZERO argument (src/main.cpp:45-53)
    from etl_lens_spark import get_spark

    spark = get_spark()
    df = spark.createDataFrame(
        [(0, 5), (3, 9), (0, 0), (None, 7)], "a int, b int"
    )
    out = df.select(
        cat.coalesce_nonzero(F.col("a"), F.col("b")).alias("c")
    ).collect()
    assert [r["c"] for r in out] == [5, 3, 0, 7]


def test_enum_decode_falls_back_to_raw(spark):
    df = spark.createDataFrame([("click",), ("unknown_ev",)], "t string")
    out = cat.enum_decode(df, "t", {"click": "UI"}, "d").collect()
    got = {r["t"]: r["d"] for r in out}
    assert got == {"click": "UI", "unknown_ev": "unknown_ev"}


def test_conform_pads_and_truncates(spark):
    df = spark.createDataFrame([(1, "x", "extra")], "a int, b string, z string")
    out = cat.conform(df, ["a", "b", "missing"])
    assert out.columns == ["a", "b", "missing"]
    row = out.collect()[0]
    assert row["a"] == 1 and row["b"] == "x" and row["missing"] is None


def test_per_type_query_limit(spark, sf_dir):
    from etl_lens_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    out = cat.per_type_query(ev, "click", limit=7)
    rows = out.collect()
    assert len(rows) == 7
    assert all(r["event_type"] == "click" for r in rows)
    # deterministic order: ascending event time
    ts = [r["ts"] for r in rows]
    assert ts == sorted(ts)


def test_build_catalog_one_row_per_type(spark, sf_dir):
    from etl_lens_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    catalog = cat.build_catalog(ev)
    rows = catalog.collect()
    types = [r["event_type"] for r in rows]
    assert len(types) == len(set(types))
    assert all(r["n_events"] > 0 for r in rows)
    assert all(r["schema_keys"] for r in rows)


def test_hexint_wide_value_not_truncated(spark):
    """A value wider than `width` hex digits keeps its full hex form
    (lpad alone would truncate to the leftmost chars — ADVICE r1)."""
    from pyspark.sql import functions as F

    from etl_lens_spark.functions.scalar import hexint

    df = spark.range(1).select(
        hexint(F.lit(0xDEADBEEF1), 8).alias("wide"),
        hexint(F.lit(0x1F), 8).alias("narrow"),
    )
    row = df.collect()[0]
    assert row["wide"] == "0xdeadbeef1"
    assert row["narrow"] == "0x0000001f"
