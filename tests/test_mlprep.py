"""Stats/ML-prep tranche: Spearman and MI pinned against pure
pandas/Python replicas; fold determinism, DP noise bounds, conformal
coverage, and bootstrap CI sanity."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow.parquet as pq

from etl_lens_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def _md5_52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def test_spearman_matches_pandas_average_ranks(spark):
    out = {
        r.pair: r for r in all_queries()["stats_spearman_corr"](
            spark, SF
        ).collect()
    }
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    ).to_pandas()
    pairs = {
        "qty_vs_price": ("l_quantity", "l_extendedprice"),
        "discount_vs_qty": ("l_discount", "l_quantity"),
        "tax_vs_price": ("l_tax", "l_extendedprice"),
    }
    for pair, (cx, cy) in pairs.items():
        rx = li[cx].astype(float).rank(method="average").to_numpy()
        ry = li[cy].astype(float).rank(method="average").to_numpy()
        want = np.corrcoef(rx, ry)[0, 1]
        got = out[pair]
        assert got.n_rows == len(li)
        assert abs(got.spearman - want) < 1e-9, (pair, got.spearman, want)
    # bounded like any correlation
    assert all(-1.0 <= r.spearman <= 1.0 for r in out.values())


def test_mutual_information_matches_python(spark):
    row = all_queries()["stats_mutual_information"](spark, SF).collect()[0]
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["lang", "source"]
    ).to_pandas()
    joint = docs.groupby(["lang", "source"]).size()
    n = len(docs)
    mx = docs.groupby("lang").size()
    my = docs.groupby("source").size()
    mi = sum(
        (c / n) * math.log(c * n / (mx[lg] * my[src]))
        for (lg, src), c in joint.items()
    )
    hx = -sum((c / n) * math.log(c / n) for c in mx)
    hy = -sum((c / n) * math.log(c / n) for c in my)
    assert row.n_docs == n
    assert row.n_cells == len(joint)
    assert abs(row.mi_nats - mi) < 1e-9
    assert abs(row.nmi - mi / math.sqrt(hx * hy)) < 1e-9
    assert -1e-12 <= row.mi_nats
    assert row.nmi <= 1.0 + 1e-12


def test_target_encoding_leave_fold_out(spark):
    rows = all_queries()["ml_target_encode_kfold"](spark, SF).collect()
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey",
                                         "o_totalprice"]
    ).to_pandas()
    cust = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nation = pq.read_table(
        f"{SF}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    df = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    df["fold"] = [
        _md5_52(f"te1|{k}") % 5 for k in df["o_orderkey"]
    ]
    df["y"] = df["o_totalprice"].astype(float)
    gmean = df["y"].sum() / len(df)
    name_of = dict(zip(nation["n_nationkey"], nation["n_name"]))
    by_nf = df.groupby(["c_nationkey", "fold"])["y"].agg(["sum", "count"])
    by_n = df.groupby("c_nationkey")["y"].agg(["sum", "count"])
    got = {(r.n_name, r.fold): r for r in rows}
    for (nk, fold), g in by_nf.iterrows():
        want = (by_n.loc[nk]["sum"] - g["sum"] + 10.0 * gmean) / (
            by_n.loc[nk]["count"] - g["count"] + 10.0
        )
        r = got[(name_of[nk], fold)]
        assert r.n_in_fold == g["count"]
        # decimal-sum vs float-sum ordering: loose-ish tolerance
        assert abs(r.encoding - want) < 1e-6 * abs(want)


def test_dp_noise_is_bounded_and_deterministic(spark):
    q = all_queries()["privacy_dp_noisy_counts"]
    rows1 = {r.n_name: r for r in q(spark, SF).collect()}
    rows2 = {r.n_name: r for r in q(spark, SF).collect()}
    # 52-bit seeded uniform bounds the Laplace tail at (1/eps)·52·ln2
    bound = 52 * math.log(2) + 1
    for name, r in rows1.items():
        assert abs(r.noisy_cnt - r.true_cnt) < bound
        assert rows2[name].noisy_cnt == r.noisy_cnt  # seeded → identical
        assert r.eps == 1.0
    # the mechanism must actually perturb (not all-zero noise)
    assert any(r.noisy_cnt != r.true_cnt for r in rows1.values())


def test_conformal_coverage_near_nominal(spark):
    rows = all_queries()["ml_conformal_intervals"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.q_resid > 0
        assert r.n_cal > 0 and r.n_test > 0
        # split-conformal guarantee: coverage ≈ 0.9 up to finite-sample
        # noise (small per-group test counts at sf0.001)
        assert 0.75 <= r.coverage <= 1.0, (r.l_returnflag, r.coverage)


def test_theil_sen_matches_numpy_pairwise_median(spark):
    r = all_queries()["stats_theil_sen_slope"](spark, SF).collect()[0]
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    ).to_pandas()
    orders["d"] = (
        orders["o_orderdate"].dt.normalize()
        - np.datetime64("1995-01-01")
    ).dt.days
    from decimal import ROUND_HALF_UP, Decimal

    def dec_sum(v):
        # Spark's CAST(double AS DECIMAL(18,2)) rounds HALF_UP on the
        # decimal rendering of the double (not banker's)
        return float(
            sum(
                Decimal(repr(x)).quantize(
                    Decimal("0.01"), rounding=ROUND_HALF_UP
                )
                for x in v
            )
        )

    daily = orders.groupby("d")["o_totalprice"].apply(dec_sum).sort_index()
    d = daily.index.to_numpy(dtype=float)
    v = daily.to_numpy()
    slopes = [
        (v[j] - v[i]) / (d[j] - d[i])
        for i in range(len(d))
        for j in range(i + 1, len(d))
    ]
    assert r.n_days == len(d)
    assert r.n_pairs == len(slopes)
    # quantile_disc(0.5) = lower-median order statistic
    want = sorted(slopes)[(len(slopes) - 1) // 2]
    assert abs(r.slope - want) < 1e-9
    resid = sorted(vi - r.slope * di for di, vi in zip(d, v))
    assert abs(r.intercept - resid[(len(resid) - 1) // 2]) < 1e-6


def test_autocorrelation_matches_numpy(spark):
    rows = {
        r.lag: r
        for r in all_queries()["stats_autocorrelation"](
            spark, SF
        ).collect()
    }
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    ).to_pandas()
    orders["d"] = (
        orders["o_orderdate"].dt.normalize()
        - np.datetime64("1995-01-01")
    ).dt.days
    daily = orders.groupby("d")["o_totalprice"].sum()
    assert set(rows) == set(range(1, 8))
    for lag, r in rows.items():
        x, y = [], []
        for d, v in daily.items():
            if d + lag in daily.index:
                x.append(v)
                y.append(daily[d + lag])
        assert r.n_pairs == len(x)
        want = np.corrcoef(x, y)[0, 1]
        assert abs(r.acf - want) < 1e-6, (lag, r.acf, want)
        assert -1.0 <= r.acf <= 1.0


def test_mmd_drift_sanity(spark):
    r = all_queries()["stats_mmd_drift"](spark, SF).collect()[0]
    assert r.k_early <= 512 and r.k_late <= 512
    assert r.k_early > 0 and r.k_late > 0
    assert r.sigma > 0
    # biased MMD^2 estimator is non-negative up to numerical noise,
    # and bounded by 2 for a kernel <= 1
    assert -1e-9 <= r.mmd2 <= 2.0
    # same distribution family → small statistic
    assert r.mmd2 < 0.5


def test_fellegi_sunter_scores_ordered_and_consistent(spark):
    rows = all_queries()["entity_fellegi_sunter_scores"](
        spark, SF
    ).collect()
    assert len(rows) > 0
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # more agreements never score lower than zero agreements' floor
    by_agree = {}
    for r in rows:
        by_agree.setdefault(r.n_agree, []).append(r.score)
    if 3 in by_agree and 0 in by_agree:
        assert min(by_agree[3]) > max(by_agree[0])
    for r in rows:
        assert r.p1 < r.p2


def test_l_diversity_replica(spark):
    rows = all_queries()["privacy_l_diversity"](spark, SF).collect()
    cust = pq.read_table(
        f"{SF}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
    ).to_pandas()
    cust["band"] = np.floor(cust["c_acctbal"] / 1000.0).astype(int)
    g = cust.groupby(["c_nationkey", "c_mktsegment"]).agg(
        k_size=("band", "size"), l_distinct=("band", "nunique")
    )
    assert len(rows) == len(g)
    for r in rows:
        w = g.loc[(r.c_nationkey, r.c_mktsegment)]
        assert r.k_size == w["k_size"]
        assert r.l_distinct == w["l_distinct"]
        assert r.below_l == int(w["l_distinct"] < 3)


def test_bootstrap_ci_brackets_point_mean(spark):
    r = all_queries()["stats_bootstrap_poisson_ci"](spark, SF).collect()[0]
    assert r.b_reps == 16
    assert r.ci_lo < r.ci_hi
    assert r.ci_lo <= r.point_mean <= r.ci_hi
    # CI half-width should be within an order of magnitude of the
    # theoretical s/sqrt(n) * 1.645 band
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_totalprice"]
    ).to_pandas()
    y = orders["o_totalprice"].astype(float).to_numpy()
    se = y.std(ddof=1) / math.sqrt(len(y))
    half = (r.ci_hi - r.ci_lo) / 2
    assert 0.2 * 1.645 * se < half < 5 * 1.645 * se


def test_soundex_sql_replica_matches_spark_native(spark):
    """The DuckDB-side soundex replica must agree with Spark's native
    soundex on the classic edge-case names (H/W collapse, vowel
    reset, first-letter dup), not just the corpus vocabulary."""
    import duckdb

    from etl_lens_spark.queries.mlprep_q import _SOUNDEX_SQL

    names = [
        "ROBERT", "RUPERT", "ASHCRAFT", "ASHCROFT", "TYMCZAK",
        "PFISTER", "HONEYMAN", "JACKSON", "WASHINGTON", "LEE",
        "GUTIERREZ", "VANDEUSEN", "DEUSEN", "AAAA", "HW", "BOOTH",
        "CZARKOWSKA", "LLOYD", "SCHMIDT", "SCHNEIDER",
    ]
    sdf = spark.createDataFrame([(n,) for n in names], "w string")
    from pyspark.sql import functions as F

    got = {
        r.w: r.code
        for r in sdf.select("w", F.soundex("w").alias("code")).collect()
    }
    want = {
        w: c
        for w, c in duckdb.sql(
            f"SELECT w, {_SOUNDEX_SQL} AS c FROM (SELECT UNNEST($names) AS w)",
            params={"names": names},
        ).fetchall()
    }
    assert got == want, {
        k: (got[k], want[k]) for k in names if got[k] != want[k]
    }


def test_holt_winters_deterministic_and_sane(spark):
    q = all_queries()["ts_holt_winters_fit"]
    r1 = {r.n_name: r for r in q(spark, SF).collect()}
    r2 = {r.n_name: r for r in q(spark, SF).collect()}
    assert len(r1) == 25
    for name, r in r1.items():
        assert r.rmse > 0
        # bit-identical across runs (sequential float recursion is
        # deterministic per series)
        assert r2[name].level == r.level
        assert r2[name].trend == r.trend
        assert r2[name].rmse == r.rmse
        assert r2[name].forecast_next == r.forecast_next
        # one-step error should beat predicting zero revenue
        assert r.rmse < abs(r.level) + abs(r.forecast_next) + 1e9


def test_correlation_matrix_matches_numpy(spark):
    rows = all_queries()["profile_correlation_matrix"](
        spark, SF
    ).collect()
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    ).to_pandas()
    for r in rows:
        want = np.corrcoef(
            li[r.col_x].astype(float), li[r.col_y].astype(float)
        )[0, 1]
        assert abs(r.pearson - want) < 1e-9, (r.col_x, r.col_y)
    assert len(rows) == 6


def test_point_in_polygon_frac_converges_to_area(spark):
    rows = {
        r.poly_id: r
        for r in all_queries()["geo_point_in_polygon_join"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    assert set(rows) == {"triangle", "l_shape", "pentagon"}
    for pid, r in rows.items():
        assert r.n_inside > 0
        # uniform points: containment fraction ~ polygon area
        # (binomial noise at n≈120k points: a few sigma ≈ 0.006)
        assert abs(r.frac_inside - r.shoelace_area) < 0.01, (
            pid, r.frac_inside, r.shoelace_area,
        )


def test_mahalanobis_top_is_jointly_extreme(spark):
    rows = all_queries()["outliers_mahalanobis_2d"](spark, SF).collect()
    assert len(rows) == 20
    d2s = [r.d2 for r in rows]
    assert d2s == sorted(d2s, reverse=True)
    assert all(d2 > 0 for d2 in d2s)


def test_boxcox_grid_is_complete_and_finite(spark):
    rows = all_queries()["feature_boxcox_lambda"](spark, SF).collect()
    assert [r.lam for r in rows] == [-1.0, -0.5, 0.0, 0.5, 1.0]
    assert all(math.isfinite(r.avg_loglik) for r in rows)


def test_neyman_allocation_dominates_high_variance_strata(spark):
    rows = all_queries()["sample_neyman_allocation"](spark, SF).collect()
    assert len(rows) == 5
    tot = sum(r.alloc_neyman for r in rows)
    assert abs(tot - 1000) <= len(rows)  # rounding slack
    # the allocation ratio must track N_h * S_h
    w = [(r.n_h * r.s_h, r.alloc_neyman) for r in rows]
    w.sort()
    allocs = [a for _, a in w]
    assert allocs == sorted(allocs)


def test_als_one_step_matches_numpy_solve(spark):
    rows = all_queries()["reco_als_one_step"](spark, SF).collect()
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_quantity"],
    ).to_pandas()
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).to_pandas()
    df = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    r = (
        df.groupby(["o_custkey", "l_partkey"])["l_quantity"]
        .apply(lambda v: float(sum(int(x) for x in v)))
        .reset_index(name="rating")
    )
    assert rows
    for row in rows[:5]:
        sub = r[r["o_custkey"] == row.u]
        assert row.n_items == len(sub)
        a11 = a12 = a22 = b1 = b2 = 0.0
        for _, rec in sub.iterrows():
            v2 = _md5_52(f"als1|{int(rec['l_partkey'])}") / 2.0**52
            a11 += 1.0
            a12 += v2
            a22 += v2 * v2
            b1 += rec["rating"]
            b2 += v2 * rec["rating"]
        a11 += 0.1
        a22 += 0.1
        det = a11 * a22 - a12 * a12
        assert abs(row.u1 - (b1 * a22 - b2 * a12) / det) < 1e-9
        assert abs(row.u2 - (b2 * a11 - b1 * a12) / det) < 1e-9


def test_kmeans_plusplus_lloyd_replica(spark):
    rows = all_queries()["ml_kmeans_plusplus_lloyd"](spark, SF).collect()
    assert [r.k for r in rows] == [1, 2, 3, 4]
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice"],
    ).to_pandas()
    n_rows = len(li)
    assert sum(r.n_assigned for r in rows) == n_rows
    # full pure-python replay of the derandomized k-means++
    li["rid0"] = li["l_orderkey"] * 8 + li["l_linenumber"]
    li["x"] = li["l_quantity"].astype(float)
    li["y"] = li["l_extendedprice"].astype(float)
    li = li.sort_values(["rid0", "x", "y"]).reset_index(drop=True)
    li["rn"] = li.groupby("rid0").cumcount() + 1
    li["rid"] = li["rid0"] * 32 + li["rn"]
    n = float(n_rows)
    mx, my = li["x"].sum() / n, li["y"].sum() / n
    sdx = ((li["x"] * li["x"]).sum() / n - mx * mx) ** 0.5
    sdy = ((li["y"] * li["y"]).sum() / n - my * my) ** 0.5
    zx = ((li["x"] - mx) / sdx).to_numpy()
    zy = ((li["y"] - my) / sdy).to_numpy()
    rid = li["rid"].to_numpy()
    centers = []
    for k in range(1, 5):
        u = np.array(
            [_md5_52(f"kpp{k}|{int(r)}") / 2.0**52 for r in rid]
        )
        if not centers:
            key = np.log(u)
        else:
            d = np.min(
                [
                    (zx - cx) ** 2 + (zy - cy) ** 2
                    for cx, cy in centers
                ],
                axis=0,
            )
            key = np.log(u) / np.maximum(d, 1e-300)
        j = int(np.argmax(key))
        centers.append((zx[j], zy[j]))
    for r, (cx, cy) in zip(rows, centers):
        assert abs(r.init_cx - cx) < 1e-12 and abs(r.init_cy - cy) < 1e-12


def test_login_streaks_replica(spark):
    rows = all_queries()["events_login_streaks"](spark, SF).collect()
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts"]
    ).to_pandas()
    ev = ev.dropna(subset=["user_id"])
    ev["d"] = (
        ev["ts"].dt.normalize() - np.datetime64("1995-01-01")
    ).dt.days
    got = {r.user_id: r for r in rows}
    for uid, r in list(got.items())[:20]:
        days = sorted(set(ev[ev["user_id"] == uid]["d"]))
        streaks, cur = [], 1
        for a, b in zip(days, days[1:]):
            if b == a + 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        assert r.longest_streak == max(streaks)
        assert r.n_streaks == len(streaks)
        assert r.active_days == len(days)
        assert r.first_day == days[0]


def test_trimmed_mean_matches_numpy(spark):
    r = all_queries()["stats_trimmed_mean"](spark, SF).collect()[0]
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_totalprice"]
    ).to_pandas()
    from decimal import ROUND_HALF_UP, Decimal

    v = sorted(
        Decimal(repr(x)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
        for x in orders["o_totalprice"]
    )
    k = int(np.floor(0.05 * len(v)))
    kept = v[k : len(v) - k]
    assert r.n_rows == len(v)
    assert r.n_trimmed_each_tail == k
    assert r.n_kept == len(kept)
    want = float(sum(kept)) / len(kept)
    assert abs(r.trimmed_mean - want) < 1e-9


def test_huber_downweights_vs_ols(spark):
    r = all_queries()["ml_huber_irls_step"](spark, SF).collect()[0]
    assert r.sigma > 0
    assert 0 < r.sum_weights < r.n_rows  # some rows downweighted
    assert math.isfinite(r.a1) and math.isfinite(r.b1)
    # OLS replica
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice"],
    ).to_pandas()
    x = li["l_quantity"].astype(float).to_numpy()
    y = li["l_extendedprice"].astype(float).to_numpy()
    b0 = np.polyfit(x, y, 1)
    assert abs(r.b0 - b0[0]) < 1e-6 * max(1.0, abs(b0[0]))
    assert abs(r.a0 - b0[1]) < 1e-6 * max(1.0, abs(b0[1]))


def test_quantile_normalize_aligns_distributions(spark):
    rows = all_queries()["feature_quantile_normalize"](
        spark, SF
    ).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    # every source maps onto the SAME reference values per ventile
    ref = {}
    for src, rs in by_src.items():
        for r in rs:
            if r.ventile in ref:
                assert ref[r.ventile] == r.ref_value
            ref[r.ventile] = r.ref_value
        # monotone: higher ventile -> higher src mean
        ordered = sorted(rs, key=lambda t: t.ventile)
        means = [t.src_mean for t in ordered]
        assert means == sorted(means)


def test_sprt_walk_monotone_in_evidence(spark):
    rows = all_queries()["ab_test_sprt"](spark, SF).collect()
    assert rows
    # replay the walk
    cum = 0.0
    import math as m

    lw = m.log(0.22 / 0.18)
    ll = m.log(0.78 / 0.82)
    for r in rows:
        cum += r.conv * lw + (r.n - r.conv) * ll
        assert abs(r.cum_llr - cum) < 1e-9
        assert r.decision in {"accept_h1", "accept_h0", "continue"}


def test_ivm_delta_rules_exact(spark):
    rows = all_queries()["ivm_join_delta"](spark, SF).collect()
    assert len(rows) == 25
    for r in rows:
        assert r.matches == 1
        assert r.maintained_rev == r.recomputed_rev
        assert r.maintained_n == r.recomputed_n


def test_benjamini_hochberg_stepup_property(spark):
    rows = all_queries()["stats_benjamini_hochberg"](spark, SF).collect()
    assert len(rows) == 25
    assert [r.rk for r in rows] == list(range(1, 26))
    ps = [r.p for r in rows]
    assert ps == sorted(ps)
    assert all(0.0 <= p <= 1.0 + 1e-12 for p in ps)
    # rejected set is exactly the rank prefix up to the last k with
    # p_k <= k*q/m
    ks = [r.rk for r in rows if r.p <= r.bh_threshold]
    kmax = max(ks) if ks else 0
    for r in rows:
        assert r.rejected == int(r.rk <= kmax)
    # erf approximation sanity against math.erfc
    for r in rows[:5]:
        want = math.erfc(abs(r.z) / math.sqrt(2.0))
        assert abs(r.p - want) < 2e-7


def test_nelson_aalen_vs_km_consistency(spark):
    na = all_queries()["survival_nelson_aalen"](spark, SF).collect()
    km = {
        r.t_days: r
        for r in all_queries()["survival_kaplan_meier"](
            spark, SF
        ).collect()
    }
    assert na
    prev = 0.0
    for r in na:
        assert r.cum_hazard >= prev  # monotone nondecreasing
        prev = r.cum_hazard
        if r.t_days in km and km[r.t_days].km_survival > 0:
            # H(t) >= -ln S(t) is the exact inequality
            # (sum of x >= sum of -ln(1-x) is false; correct
            # direction: -ln(1-x) >= x so -lnS >= H)
            assert -math.log(km[r.t_days].km_survival) >= (
                r.cum_hazard - 1e-9
            )


def test_fixed_effects_differs_from_pooled(spark):
    r = all_queries()["stats_panel_fixed_effects"](spark, SF).collect()[0]
    assert r.n_obs > 0 and r.n_groups > 1
    assert math.isfinite(r.beta_within)
    assert math.isfinite(r.beta_pooled)


def test_markov_stationary_converged_and_normalized(spark):
    rows = all_queries()["events_markov_stationary"](
        spark, SF
    ).collect()
    ps = {r.event_type: r.stationary_p for r in rows}
    assert abs(sum(ps.values()) - 1.0) < 1e-9
    assert all(p > 0 for p in ps.values())
    # convergence: one more application of P barely moves pi
    ev = pq.read_table(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_type", "event_id"],
    ).to_pandas()
    ev = ev.dropna(subset=["user_id"]).sort_values(
        ["user_id", "ts", "event_id"]
    )
    trans = {}
    for uid, grp in ev.groupby("user_id"):
        types = list(grp["event_type"])
        for a, b in zip(types, types[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    outs = {}
    for (a, _), c in trans.items():
        outs[a] = outs.get(a, 0) + c
    nxt = {}
    for (a, b), c in trans.items():
        nxt[b] = nxt.get(b, 0.0) + ps[a] * c / outs[a]
    for k in ps:
        assert abs(nxt[k] - ps[k]) < 1e-6


def test_tail_dependence_bounds(spark):
    r = all_queries()["stats_tail_dependence"](spark, SF).collect()[0]
    assert 0.0 <= r.lambda_upper <= 1.0
    assert r.n_joint <= r.n_y_tail
    assert r.independence_baseline == 0.050000000000000044 or abs(
        r.independence_baseline - 0.05
    ) < 1e-12


def test_gpd_moments_match_numpy(spark):
    r = all_queries()["stats_gpd_peaks_over_threshold"](
        spark, SF
    ).collect()[0]
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_totalprice"]
    ).to_pandas()
    v = np.sort(orders["o_totalprice"].astype(float).to_numpy())
    k = int(np.ceil(0.9 * len(v)))
    u = v[k - 1]
    exc = v[v > u] - u
    m, s2 = exc.mean(), exc.var()
    assert r.threshold == u
    assert r.n_exc == len(exc)
    assert abs(r.xi_hat - 0.5 * (1 - m * m / s2)) < 1e-9
    assert abs(r.beta_hat - 0.5 * m * (m * m / s2 + 1)) < 1e-9


def test_hilbert_curve_properties(spark):
    rows = {
        r.curve: r
        for r in all_queries()["lake_hilbert_vs_zorder_locality"](
            spark, SF
        ).collect()
    }
    assert set(rows) == {"hilbert", "zorder", "row_major"}
    for r in rows.values():
        assert r.n_distinct_index == r.n_cells == 65536  # bijective
    # the defining Hilbert property: EVERY consecutive pair adjacent
    assert rows["hilbert"].avg_step == 1.0
    assert rows["hilbert"].max_step == 1
    # Z-order pays discontinuity seams
    assert rows["zorder"].avg_step > 1.9
    assert rows["zorder"].max_step == 256


def test_seasonal_strength_bounds(spark):
    r = all_queries()["ts_seasonal_strength"](spark, SF).collect()[0]
    assert r.n_days > 0
    assert 0.0 <= r.seasonal_strength <= 1.0
    assert r.var_residual <= r.var_detrended + 1e-9


def test_burrows_delta_symmetric_metricish(spark):
    rows = all_queries()["text_burrows_delta"](spark, SF).collect()
    assert rows
    deltas = [r.delta for r in rows]
    assert deltas == sorted(deltas)
    assert all(d >= 0 for d in deltas)
    assert all(r.src_a < r.src_b for r in rows)


def test_learning_curve_monotone_training_size(spark):
    rows = all_queries()["ml_learning_curve"](spark, SF).collect()
    assert [r.frac for r in rows] == [0.1, 0.2, 0.4, 0.8]
    sizes = [r.n_train for r in rows]
    assert sizes == sorted(sizes)  # nested subsamples grow
    assert all(r.n_test > 0 for r in rows)
    assert all(math.isfinite(r.rmse) and r.rmse > 0 for r in rows)
