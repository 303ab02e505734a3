"""Independent-reference tests for round-3 operators: each recomputes
the expected result in plain Python/numpy from first principles (not
via SQL), so a shared misunderstanding between the Spark query and its
DuckDB oracle cannot hide."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F


def test_diff_then_merge_roundtrip_identity(spark):
    """merge_apply(old, changelog) == new  ⟹  snapshot_diff(old, new)
    re-derives exactly the changelog's effects (property-style on a
    deterministic pseudo-random fixture)."""
    from etl_lens_spark.operators.cdc import merge_apply, snapshot_diff

    rows = [(k, (k * 37) % 101, f"s{k % 7}") for k in range(200)]
    old = spark.createDataFrame(rows, "k int, v int, s string")
    # deterministic changelog: delete k%11==0, update k%5==0 (not
    # deleted), insert 1000..1009
    ch = []
    for k in range(200):
        if k % 11 == 0:
            ch.append((k, "D", k, None, None))
        elif k % 5 == 0:
            ch.append((k, "U", k, (k * 37) % 101 + 1, f"s{k % 7}"))
    for k in range(1000, 1010):
        ch.append((k, "U", k, k, "new"))
    changes = spark.createDataFrame(
        ch, "k int, op string, seq int, v int, s string"
    )
    new = merge_apply(old, changes, "k")
    diff = snapshot_diff(old, new, "k", ["v", "s"])
    got = {r["k"]: r["status"] for r in diff.collect()}
    for k in range(200):
        if k % 11 == 0:
            assert got[k] == "removed"
        elif k % 5 == 0:
            assert got[k] == "changed"
        else:
            assert got[k] == "unchanged"
    for k in range(1000, 1010):
        assert got[k] == "added"


def test_token_entropy_matches_python_reference(spark):
    from etl_lens_spark.queries.npipe4 import text_token_entropy

    # recompute on sf0.001 with an independent implementation
    out = {
        r["doc_id"]: r
        for r in text_token_entropy(spark, "/root/testdata/sf0.001").collect()
    }
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for row in docs.select("doc_id", "text").collect()[:50]:
        toks = row["text"].lower().strip().replace("\t", " ")
        toks = [t for t in toks.replace("\n", " ").replace("\r", " ").split(" ") if t]
        n = len(toks)
        got = out[row["doc_id"]]
        assert got["n_tokens"] == n
        if n:
            counts: dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            h = math.log(n) - sum(c * math.log(c) for c in counts.values()) / n
            assert abs(got["entropy"] - h) < 1e-9
            assert got["n_types"] == len(counts)


def _md5_uni(salt: str, key: int, mod: int) -> int:
    h = hashlib.md5((salt + str(key)).encode()).hexdigest()[:8]
    return int(h, 16) % mod


def test_geo_grid_nearest_matches_bruteforce(spark):
    """Python brute force over the SAME md5 coordinates, restricted to
    the 3x3 neighborhood contract, must agree with the Spark query."""
    from etl_lens_spark.queries.joins_q import geo_grid_nearest_join

    sf = "/root/testdata/sf0.001"
    out = {
        r["c_custkey"]: (r["nearest_suppkey"], r["d2"])
        for r in geo_grid_nearest_join(spark, sf).collect()
    }
    cust = [
        r["c_custkey"]
        for r in spark.read.parquet(f"{sf}/customer.parquet")
        .select("c_custkey")
        .collect()
    ]
    sups = [
        r["s_suppkey"]
        for r in spark.read.parquet(f"{sf}/supplier.parquet")
        .select("s_suppkey")
        .collect()
    ]
    M = 10000001
    sloc = {
        s: (_md5_uni("slat", s, M), _md5_uni("slon", s, M)) for s in sups
    }
    for c in cust:
        lat, lon = _md5_uni("lat", c, M), _md5_uni("lon", c, M)
        cx, cy = lat // 10**6, lon // 10**6
        best = None
        for s, (sl, so_) in sloc.items():
            if abs(sl // 10**6 - cx) <= 1 and abs(so_ // 10**6 - cy) <= 1:
                d2 = (lat - sl) ** 2 + (lon - so_) ** 2
                if best is None or (d2, s) < best:
                    best = (d2, s)
        if best is None:
            assert c not in out
        else:
            assert out[c] == (best[1], best[0])


def test_ks_drift_matches_python_reference(spark):
    from etl_lens_spark.queries.quality_q import stats_ks_drift

    sf = "/root/testdata/sf0.001"
    row = stats_ks_drift(spark, sf).collect()[0]
    ev = (
        spark.read.parquet(f"{sf}/events.parquet")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("v"))
        .collect()
    )
    a = sorted(r["v"] for r in ev if r["event_type"] == "click")
    b = sorted(r["v"] for r in ev if r["event_type"] == "purchase")
    vs = sorted(set(a) | set(b))
    import bisect

    d = 0.0
    for v in vs:
        f1 = bisect.bisect_right(a, v) / len(a)
        f2 = bisect.bisect_right(b, v) / len(b)
        d = max(d, abs(f1 - f2))
    assert row["n1"] == len(a) and row["n2"] == len(b)
    assert abs(row["ks_d"] - d) < 1e-12


def test_interval_overlap_month_boundary(spark):
    """A pair that overlaps ONLY across a month boundary must be
    found (the banding explodes both sides to every covered month, so
    cross-boundary overlaps share the later band)."""
    from etl_lens_spark.queries.joins_q import interval_overlap_join

    sf = "/root/testdata/sf0.001"
    pairs = {
        (r["promo_id"], r["order_id"])
        for r in interval_overlap_join(spark, sf).collect()
    }
    orders = {
        r["o_orderkey"]: r["d"]
        for r in spark.read.parquet(f"{sf}/orders.parquet")
        .select("o_orderkey", F.col("o_orderdate").cast("date").alias("d"))
        .collect()
    }
    import datetime as dt

    expected = set()
    cross_month = 0
    for p, pd_ in orders.items():
        if p % 97:
            continue
        for o, od in orders.items():
            if o % 13:
                continue
            a_s, a_e = pd_, pd_ + dt.timedelta(days=30)
            b_s, b_e = od, od + dt.timedelta(days=7)
            if a_s < b_e and b_s < a_e:
                expected.add((p, o))
                if (a_s.year, a_s.month) != (b_s.year, b_s.month):
                    cross_month += 1
    assert pairs == expected
    assert cross_month > 0, "fixture exercises no cross-month overlap"
