"""Unit tests for warehouse_q (SCD2 compaction, association rules)
and text_pmi_bigrams — hand-computed micro-fixtures."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F


class TestScd2History:
    def test_run_collapse_and_validity_chain(self, spark, tmp_path):
        # one customer: A,A,B,A over four days -> 3 versions
        rows = [
            (1, datetime.date(2020, 1, d), "A" if d != 3 else "B", 100.0)
            for d in (1, 2, 3, 4)
        ]
        orders = spark.createDataFrame(
            rows, ["o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice"]
        )
        sf = str(tmp_path)
        orders.write.mode("overwrite").parquet(f"{sf}/orders.parquet")

        from etl_lens_spark.queries.warehouse_q import scd2_history

        out = scd2_history(spark, sf).collect()
        assert [r["attr"] for r in out] == ["A", "B", "A"]
        assert [r["n_days"] for r in out] == [2, 1, 1]
        # validity chain: each valid_to equals the next valid_from
        assert out[0]["valid_to"] == out[1]["valid_from"]
        assert out[1]["valid_to"] == out[2]["valid_from"]
        assert out[2]["valid_to"] is None
        assert [r["is_current"] for r in out] == [0, 0, 1]
        assert [r["version"] for r in out] == [1, 2, 3]

    def test_same_day_orders_deterministic(self, spark, tmp_path):
        # two orders same day -> min priority wins, one observation
        rows = [
            (7, datetime.date(2021, 5, 1), "2-HIGH", 1.0),
            (7, datetime.date(2021, 5, 1), "1-URGENT", 1.0),
        ]
        orders = spark.createDataFrame(
            rows, ["o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice"]
        )
        sf = str(tmp_path)
        orders.write.mode("overwrite").parquet(f"{sf}/orders.parquet")

        from etl_lens_spark.queries.warehouse_q import scd2_history

        out = scd2_history(spark, sf).collect()
        assert len(out) == 1 and out[0]["attr"] == "1-URGENT"


class TestBasketRules:
    def test_support_confidence_lift_by_hand(self, spark, tmp_path):
        # 4 baskets over items X, Y: X in all 4, Y in 2, {X,Y} in 2
        baskets = {1: ["X", "Y"], 2: ["X"], 3: ["X", "Y"], 4: ["X"]}
        li = spark.createDataFrame(
            [(b, i, it) for b, its in baskets.items() for i, it in enumerate(its)],
            ["l_orderkey", "l_linenumber", "p_name"],
        )
        # reuse the query's shape inline with thresholds suited to 4 rows
        from etl_lens_spark.queries.warehouse_q import basket_association_rules  # noqa: F401

        b = li.select(
            F.col("l_orderkey").alias("basket"), F.col("p_name").alias("item")
        ).distinct()
        nb = b.agg(F.countDistinct("basket").alias("n"))
        freq = b.groupBy("item").agg(F.count(F.lit(1)).alias("c_item"))
        fb = b.join(freq, "item")
        a = fb.select("basket", F.col("item").alias("ante"), F.col("c_item").alias("ca"))
        c = fb.select("basket", F.col("item").alias("cons"), F.col("c_item").alias("cc"))
        pairs = (
            a.join(c, "basket")
            .filter(F.col("ante") < F.col("cons"))
            .groupBy("ante", "cons", "ca", "cc")
            .agg(F.count(F.lit(1)).alias("cp"))
            .crossJoin(F.broadcast(nb))
            .select(
                "ante",
                "cons",
                (F.col("cp") / F.col("n")).alias("support"),
                (F.col("cp") / F.col("ca")).alias("confidence"),
                ((F.col("cp") / F.col("ca")) / (F.col("cc") / F.col("n"))).alias(
                    "lift"
                ),
            )
            .collect()
        )
        assert len(pairs) == 1
        r = pairs[0]
        assert (r["ante"], r["cons"]) == ("X", "Y")
        assert r["support"] == pytest.approx(0.5)  # 2/4
        assert r["confidence"] == pytest.approx(0.5)  # 2/4
        assert r["lift"] == pytest.approx(1.0)  # 0.5 / (2/4)

    def test_fixture_rules_sane(self, spark, sf_dir):
        from etl_lens_spark.queries.warehouse_q import basket_association_rules

        rows = basket_association_rules(spark, sf_dir).collect()
        for r in rows:
            assert 0.0 < r["support"] <= 1.0
            assert 0.0 < r["confidence"] <= 1.0
            assert r["lift"] > 0.0
            assert r["antecedent"] < r["consequent"]


class TestPmiBigrams:
    def test_pmi_formula_by_hand(self, spark, sf_dir):
        from etl_lens_spark.queries.npipe3 import text_pmi_bigrams

        rows = text_pmi_bigrams(spark, sf_dir).collect()
        assert 0 < len(rows) <= 50
        # descending pmi with deterministic tie-break
        pmis = [r["pmi"] for r in rows]
        assert pmis == sorted(pmis, reverse=True)
        # spot-check the formula for the top row against raw counts
        top = rows[0]
        import duckdb

        con = duckdb.connect()
        toks_sql = (
            "string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')"
        )
        nu, cu1, cu2, nbi, c = con.execute(
            f"""
            WITH toks AS (SELECT {toks_sql} AS t
                          FROM read_parquet('{sf_dir}/documents.parquet')),
            uni AS (SELECT tok, COUNT(*) AS cu
                    FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
            bi AS (SELECT unnest([array_to_string(t[i:i+1], ' ')
                                  for i in range(1, len(t))]) AS g FROM toks)
            SELECT (SELECT SUM(cu) FROM uni),
                   (SELECT cu FROM uni WHERE tok = ?),
                   (SELECT cu FROM uni WHERE tok = ?),
                   (SELECT COUNT(*) FROM bi),
                   (SELECT COUNT(*) FROM bi WHERE g = ?)
            """,
            [top["w1"], top["w2"], f"{top['w1']} {top['w2']}"],
        ).fetchone()
        expect = math.log((c / nbi) / ((cu1 / nu) * (cu2 / nu)))
        assert top["pmi"] == pytest.approx(expect, rel=1e-9)
        assert top["c"] == c and c >= 5


class TestOutliersMad:
    def test_planted_outlier_flagged(self, spark, tmp_path):
        import datetime

        # 20 tightly clustered prices + one wild outlier, one group
        rows = [
            (i, datetime.date(2020, 1, 1), "1-URGENT", 100.0 + (i % 5))
            for i in range(20)
        ] + [(99, datetime.date(2020, 1, 2), "1-URGENT", 10_000.0)]
        orders = spark.createDataFrame(
            rows, ["o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice"]
        )
        sf = str(tmp_path)
        orders.write.mode("overwrite").parquet(f"{sf}/orders.parquet")

        from etl_lens_spark.queries.warehouse_q import outliers_mad

        out = outliers_mad(spark, sf).collect()
        assert len(out) == 1
        r = out[0]
        assert r["n"] == 21 and r["n_outliers"] == 1
        # the planted point is the only one beyond 3 scaled MADs
        assert r["outlier_rate"] == pytest.approx(1 / 21)

    def test_masking_resistance_vs_zscore(self, spark, tmp_path):
        import datetime
        import statistics

        # a huge outlier inflates stddev enough that a 3-sigma rule
        # would miss a moderate one; MAD still catches both
        vals = [100.0] * 30 + [140.0, 100000.0]
        rows = [
            (i, datetime.date(2020, 1, 1), "1-URGENT", v)
            for i, v in enumerate(vals)
        ]
        orders = spark.createDataFrame(
            rows, ["o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice"]
        )
        sf = str(tmp_path)
        orders.write.mode("overwrite").parquet(f"{sf}/orders.parquet")

        from etl_lens_spark.queries.warehouse_q import outliers_mad

        r = outliers_mad(spark, sf).collect()[0]
        mu, sd = statistics.mean(vals), statistics.pstdev(vals)
        n_sigma = sum(1 for v in vals if abs(v - mu) > 3 * sd)
        assert n_sigma < 2  # 3-sigma misses the moderate outlier
        assert r["n_outliers"] == 2  # MAD catches both


class TestDiagKeySkew:
    def test_hot_key_surfaces_with_ratio(self, spark, tmp_path):
        # 10 keys x 2 rows + one key with 20 rows
        rows = [(k, 1) for k in range(10) for _ in range(2)]
        rows += [(99, 1)] * 20
        li = spark.createDataFrame(rows, ["l_partkey", "l_linenumber"])
        sf = str(tmp_path)
        li.write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")

        from etl_lens_spark.queries.warehouse_q import diag_key_skew

        out = diag_key_skew(spark, sf).collect()
        top = out[0]
        assert top["key"] == 99 and top["cnt"] == 20
        # 40 rows / 11 keys -> avg ~3.64; ratio = 20/avg
        assert top["avg_cnt"] == pytest.approx(40 / 11)
        assert top["skew_ratio"] == pytest.approx(20 / (40 / 11))
        assert top["share"] == pytest.approx(0.5)


class TestTfidfCosinePairs:
    def test_clone_pair_is_unit_cosine(self, spark, sf_dir):
        from etl_lens_spark.queries.npipe3 import text_tfidf_cosine_pairs

        rows = text_tfidf_cosine_pairs(spark, sf_dir).collect()
        assert len(rows) > 0
        for r in rows:
            assert 0.5 <= r["cosine"] <= 1.0 + 1e-9
            assert r["doc_a"] < r["doc_b"]


class TestDiagJoinCardinality:
    def test_estimate_equals_actual_join_size(self, spark, sf_dir):
        from etl_lens_spark.queries.warehouse_q import diag_join_cardinality
        from etl_lens_spark.sources.tables import load_table

        top = diag_join_cardinality(spark, sf_dir).collect()
        o = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        actual = o.join(li, o["o_orderkey"] == li["l_orderkey"]).count()
        assert top[0]["total_out"] == actual  # pre-flight is exact


class TestEventsDebounce:
    def test_debounce_window_by_hand(self, spark, tmp_path):
        import datetime

        base = datetime.datetime(2024, 1, 1)
        # lag semantics (gap from previous OCCURRENCE, kept or not):
        # 0 kept (no prev), 5/11/12 dropped (gaps 5/6/1 min), 30 kept
        mins = [0, 5, 11, 12, 30]
        rows = [
            (i, base + datetime.timedelta(minutes=m), 1, "click", 1.0, "{}")
            for i, m in enumerate(mins)
        ]
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        sf = str(tmp_path)
        ev.write.mode("overwrite").parquet(f"{sf}/events.parquet")

        from etl_lens_spark.queries.warehouse_q import events_debounce

        out = events_debounce(spark, sf).collect()
        assert len(out) == 1
        assert out[0]["n_events"] == 5 and out[0]["n_kept"] == 2


class TestIntervalsCoalesce:
    def test_merge_by_hand(self, spark, tmp_path):
        import datetime

        # cust 1: days 0 and 10 overlap (30-day spans) -> one island
        # of 40 days; day 100 is separate -> 30 days
        rows = [
            (1, 1, datetime.date(2020, 1, 1), "P", 1.0),
            (2, 1, datetime.date(2020, 1, 11), "P", 1.0),
            (3, 1, datetime.date(2020, 4, 10), "P", 1.0),
        ]
        orders = spark.createDataFrame(
            rows,
            ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice"],
        )
        sf = str(tmp_path)
        orders.write.mode("overwrite").parquet(f"{sf}/orders.parquet")

        from etl_lens_spark.queries.warehouse_q import intervals_coalesce

        out = intervals_coalesce(spark, sf).collect()
        assert len(out) == 1
        r = out[0]
        assert r["n_merged"] == 2
        assert r["covered_days"] == 40 + 30
        assert r["first_start"] == datetime.date(2020, 1, 1)


class TestRollingMedian:
    def test_median_reference(self, spark, sf_dir):
        from etl_lens_spark.queries.winx_q import win_rolling_median

        rows = win_rolling_median(spark, sf_dir).collect()
        # recompute one user's trailing-9 medians in python
        import statistics

        by_user: dict[int, list] = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append(r)
        uid, urows = next(iter(by_user.items()))
        vals = []
        # rows within a user arrive ordered (query orderBy user only;
        # rely on per-user original window order via rolling value check)
        from etl_lens_spark.sources.tables import load_table
        from pyspark.sql import functions as F

        ev = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("user_id") == uid)
            .select("event_id", "value", F.unix_micros("ts").alias("ts_us"))
            .orderBy("ts_us", "event_id")
            .collect()
        )
        got = {r["event_id"]: r["rolling_median"] for r in urows}
        window: list[float] = []
        for e in ev:
            window.append(e["value"])
            expect = statistics.median(window[-9:])
            assert got[e["event_id"]] == pytest.approx(expect)


class TestAggRegression:
    def test_matches_numpy_lstsq(self, spark, sf_dir):
        import numpy as np

        from etl_lens_spark.queries.warehouse_q import agg_regression
        from etl_lens_spark.sources.tables import load_table

        rows = {r["brand"]: r for r in agg_regression(spark, sf_dir).collect()}
        li = load_table(spark, sf_dir, "lineitem")
        part = load_table(spark, sf_dir, "part")
        brand = next(iter(rows))
        pdf = (
            li.join(part, li["l_partkey"] == part["p_partkey"])
            .filter(F.col("p_brand") == brand)
            .select("l_quantity", "l_extendedprice")
            .toPandas()
        )
        x, y = pdf["l_quantity"].to_numpy(), pdf["l_extendedprice"].to_numpy()
        slope, intercept = np.polyfit(x, y, 1)
        r = rows[brand]
        assert r["slope"] == pytest.approx(slope, rel=1e-6)
        assert r["intercept"] == pytest.approx(intercept, rel=1e-6)
        assert r["n"] == len(pdf)
        assert 0.0 <= r["r2"] <= 1.0


class TestWeightedSample:
    def test_score_formula_replay(self, spark, sf_dir):
        import hashlib
        import math

        from etl_lens_spark.queries.warehouse_q import sample_weighted_exp

        rows = sample_weighted_exp(spark, sf_dir).collect()
        assert len(rows) == 20
        for r in rows[:5]:
            h = hashlib.md5(f"wexp{r['p_partkey']}".encode()).hexdigest()
            u = (1.0 + int(h[:8], 16)) / 4294967297.0
            expect = math.log(u) / r["p_retailprice"]
            assert r["score"] == pytest.approx(expect, rel=1e-12)

    def test_weight_bias(self, spark, tmp_path):
        # strong weight spread: 100 light (w=1) vs 10 heavy (w=1000)
        # items — the exp-sort top-20 must be dominated by heavies
        from etl_lens_spark.queries.warehouse_q import sample_weighted_exp

        rows = [(i, 1.0) for i in range(100)] + [
            (1000 + i, 1000.0) for i in range(10)
        ]
        part = spark.createDataFrame(rows, ["p_partkey", "p_retailprice"])
        sf = str(tmp_path)
        part.write.mode("overwrite").parquet(f"{sf}/part.parquet")

        out = sample_weighted_exp(spark, sf).collect()
        heavy = sum(1 for r in out if r["p_retailprice"] == 1000.0)
        assert heavy >= 10  # every heavy item outranks ~all lights
