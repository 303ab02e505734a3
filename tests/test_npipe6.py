"""Round-5 tranche semantics: Bradley–Terry, Cohen's kappa, JL
projection, triangle counting, sliding-window chunking — each beyond
the oracle hash (the oracle proves cross-engine equality; these prove
the MATH does what the contract says)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_lens_spark.queries import REGISTRY, all_queries

all_queries()


def test_bradley_terry_ratings_rank_like_wins(spark, sf_dir):
    rows = REGISTRY["pref_bradley_terry_fit"].fn(spark, sf_dir).collect()
    assert len(rows) >= 2
    assert all(r["rating"] > 0 for r in rows)
    # sum-normalized to n_players (mean rating 1)
    assert abs(sum(r["rating"] for r in rows) - len(rows)) < 1e-6
    # the MM fixpoint must order the extremes like the win counts do
    by_wins = sorted(rows, key=lambda r: (r["wins"], r["source"]))
    assert by_wins[-1]["rating"] > by_wins[0]["rating"]
    # every match is counted twice across the symmetric matrix
    assert sum(r["wins"] for r in rows) * 2 == sum(
        r["n_matches"] for r in rows
    )


def test_bradley_terry_mm_converges(spark, sf_dir):
    """One extra MM round moves ratings by <1% — the unrolled depth
    is past the knee, not an arbitrary cutoff."""
    import etl_lens_spark.queries.npipe6 as m

    base = {
        r["source"]: r["rating"]
        for r in m.pref_bradley_terry_fit(spark, sf_dir).collect()
    }
    orig = m._BT_ITERS
    m._BT_ITERS = orig + 1
    try:
        more = {
            r["source"]: r["rating"]
            for r in m.pref_bradley_terry_fit(spark, sf_dir).collect()
        }
    finally:
        m._BT_ITERS = orig
    assert max(abs(more[s] - base[s]) / base[s] for s in base) < 0.01


def test_kappa_matches_construction(spark, sf_dir):
    row = REGISTRY["label_agreement_kappa"].fn(spark, sf_dir).first()
    # annotator B agrees w.p. 0.7 and NEVER agrees otherwise (shift
    # is 1 or 2 mod 3), so po ~ 0.7 and pe ~ 1/3 on near-uniform
    # marginals -> kappa ~ 0.55
    assert 0.64 < row["po"] < 0.76
    assert 0.30 < row["pe"] < 0.37
    assert 0.45 < row["kappa"] < 0.66
    expect = (row["po"] - row["pe"]) / (1.0 - row["pe"])
    assert abs(row["kappa"] - expect) < 1e-12


def test_jl_projection_preserves_distances(spark, sf_dir):
    rows = REGISTRY["emb_jl_projection_audit"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    ratios = [r["dist_ratio"] for r in rows]
    # JL with k=16: individual ratios are loose but bounded, the
    # sample mean concentrates near 1
    assert all(0.15 < x < 3.5 for x in ratios)
    assert 0.6 < sum(ratios) / len(ratios) < 1.5
    for r in rows:
        assert r["d2_orig"] > 0 and r["d2_proj"] > 0


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    """Recompute triangles in pure Python from the SAME edge set and
    require exact per-vertex equality (and the 3|total invariant)."""
    import itertools

    import etl_lens_spark.queries.npipe6 as m
    from etl_lens_spark.sources.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < m._TRI_USERS)
        .select(
            "user_id",
            "event_type",
            (F.unix_micros("ts") / F.lit(m._TRI_BUCKET_US))
            .cast("long")
            .alias("bkt"),
        )
        .collect()
    )
    groups: dict = {}
    for r in ev:
        groups.setdefault((r["event_type"], r["bkt"]), set()).add(
            r["user_id"]
        )
    edges = set()
    for us in groups.values():
        for a, b in itertools.combinations(sorted(us), 2):
            edges.add((a, b))
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    per_vertex: dict = {}
    total = 0
    for a, b in edges:
        for c in adj.get(b, set()):
            if (a, c) in edges:
                total += 1
                for v in (a, b, c):
                    per_vertex[v] = per_vertex.get(v, 0) + 1
    got = {
        r["vertex"]: r["n_triangles"]
        for r in REGISTRY["graph_triangle_count_users"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == per_vertex
    assert sum(got.values()) == 3 * total


@pytest.mark.parametrize("n_tok", [1, 5, 95, 96, 97, 127, 128, 129,
                                   223, 224, 225, 400])
def test_chunk_formula_equals_enumeration(n_tok):
    """The closed-form chunk/emit/pad arithmetic equals literal
    window enumeration for every boundary case."""
    import etl_lens_spark.queries.npipe6 as m

    C, S = m._CHUNK_C, m._CHUNK_S
    # literal enumeration of the HF-style sliding windows
    starts = [0]
    while starts[-1] + C < n_tok:
        starts.append(starts[-1] + S)
    lengths = [min(C, n_tok - s) for s in starts]
    n_chunks = 1 + -((-max(n_tok - C, 0)) // S)  # 1 + ceil(max/S)
    emitted = n_tok + (n_chunks - 1) * (C - S)
    pad = n_chunks * C - emitted
    assert n_chunks == len(starts)
    assert emitted == sum(lengths)
    assert pad == sum(C - ln for ln in lengths)


def test_chunk_windows_per_source_sums(spark, sf_dir):
    rows = (
        REGISTRY["text_chunk_sliding_windows"].fn(spark, sf_dir).collect()
    )
    for r in rows:
        assert r["emitted_tokens"] == r["n_tokens"] + r["dup_tokens"]
        assert (
            r["pad_tokens"]
            == r["n_chunks"] * 128 - r["emitted_tokens"]
        )
        assert r["n_chunks"] >= r["n_docs"]


def test_cms_join_size_never_underestimates(spark, sf_dir):
    row = REGISTRY["cms_join_size_estimate"].fn(spark, sf_dir).first()
    assert row["exact_join_size"] > 0
    assert row["est_join_size"] >= row["exact_join_size"]
    # CMS bound: overestimate <= exact + e/width * N_a*N_b whp; on
    # this key distribution the ratio stays small
    assert row["overestimate_ratio"] < 1.5


def test_isotonic_matches_stack_pava_bitexact(spark, sf_dir):
    """The minimax identity must equal the classic sequential
    pool-adjacent-violators fit on the same bins — pooled means
    recomputed from the identical integer prefix sums."""
    rows = (
        REGISTRY["ml_isotonic_calibration"].fn(spark, sf_dir).collect()
    )
    assert len(rows) == 32
    ns = [r["n"] for r in rows]
    ps = [r["pos"] for r in rows]
    # stack PAVA on (pos, n) pools
    pools: list[list[int]] = []  # [pos, n]
    for p_, n_ in zip(ps, ns):
        pools.append([p_, n_])
        while (
            len(pools) > 1
            and pools[-2][0] * pools[-1][1]
            >= pools[-1][0] * pools[-2][1]
        ):
            b = pools.pop()
            pools[-1][0] += b[0]
            pools[-1][1] += b[1]
    expect = []
    for p_, n_ in pools:
        expect.extend([p_ / n_] * 0)  # lengths tracked below
    # expand pools to per-bin fits
    expect = []
    i = 0
    for p_, n_ in pools:
        # pool covers bins until its cumulative n matches
        cum = 0
        while cum < n_:
            cum += ns[i]
            expect.append(p_ / n_)
            i += 1
    got = [r["iso_rate"] for r in rows]
    assert len(expect) == 32
    for g, e in zip(got, expect):
        assert abs(g - e) < 1e-12
    # monotone non-decreasing
    assert all(b >= a - 1e-12 for a, b in zip(got, got[1:]))
    # the planted truth is increasing, so the fit must span a real range
    assert got[-1] - got[0] > 0.3


def test_rbo_identity_and_bounds(spark, sf_dir):
    """RBO is 1 for identical rankings (self-comparison sanity via
    the normalization) and in [0,1]; top1/topk agreements are
    prefix-intersection fractions."""
    rows = REGISTRY["rank_rbo_overlap"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["rbo"] <= 1.0 + 1e-12
        assert r["top1_agreement"] in (0.0, 1.0)
        assert 0.0 <= r["top10_agreement"] <= 1.0
    # the two rankers (value-sum vs count) are correlated on this
    # fixture but not identical: expect a non-degenerate spread
    vals = [r["rbo"] for r in rows]
    assert max(vals) > 0.2


def test_rbo_equals_handrolled(spark, sf_dir):
    """Recompute truncated RBO in pure Python from the same ranked
    lists and require 1e-12 agreement."""
    import etl_lens_spark.queries.npipe6 as m
    from etl_lens_spark.sources.tables import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy("event_type", "user_id")
        .agg(
            F.sum("value").alias("tv"),
            F.count(F.lit(1)).alias("ne"),
        )
        .collect()
    )
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(
            (r["user_id"], r["tv"], r["ne"])
        )
    expect = {}
    for et, us in by_type.items():
        ra = [u for u, tv, ne in sorted(us, key=lambda x: (-x[1], x[0]))]
        rb = [u for u, tv, ne in sorted(us, key=lambda x: (-x[2], x[0]))]
        s = 0.0
        for d in range(1, m._RBO_K + 1):
            a_d = len(set(ra[:d]) & set(rb[:d])) / d
            s += m._RBO_P ** (d - 1) * a_d
        expect[et] = (1 - m._RBO_P) * s / (1 - m._RBO_P**m._RBO_K)
    got = {
        r["event_type"]: r["rbo"]
        for r in REGISTRY["rank_rbo_overlap"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for et in got:
        assert abs(got[et] - expect[et]) < 1e-12


def test_shapley_efficiency_and_bruteforce(spark, sf_dir):
    """Shapley efficiency: sum of attributions equals v(N) - v(empty);
    and the whole vector matches a pure-Python brute force over the
    same per-user masks."""
    import itertools
    import math

    import etl_lens_spark.queries.npipe6 as m
    from etl_lens_spark.sources.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "event_type", F.unix_micros("ts").alias("us"))
        .collect()
    )
    first_purchase = {}
    for r in ev:
        if r["event_type"] == "purchase":
            u = r["user_id"]
            if u not in first_purchase or r["us"] < first_purchase[u]:
                first_purchase[u] = r["us"]
    masks: dict = {u: 0 for u in first_purchase}
    bit = {ch: 1 << i for i, ch in enumerate(m._SHAP_CHANNELS)}
    for r in ev:
        u = r["user_id"]
        if u in first_purchase and r["us"] < first_purchase[u]:
            b = bit.get(r["event_type"])
            if b:
                masks[u] |= b
    n = len(m._SHAP_CHANNELS)

    def v(S):
        return sum(1 for mk in masks.values() if mk & ~S == 0)

    expect = {}
    for i, ch in enumerate(m._SHAP_CHANNELS):
        phi = 0.0
        others = [j for j in range(n) if j != i]
        for r_ in range(n):
            for sub in itertools.combinations(others, r_):
                S = sum(1 << j for j in sub)
                w = (
                    math.factorial(r_)
                    * math.factorial(n - r_ - 1)
                    / math.factorial(n)
                )
                phi += w * (v(S | (1 << i)) - v(S))
        expect[ch] = phi
    got = {
        r["channel"]: r["phi"]
        for r in REGISTRY["events_shapley_attribution"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(expect)
    for ch in got:
        assert abs(got[ch] - expect[ch]) < 1e-9
    # efficiency
    full = v((1 << n) - 1)
    empty = v(0)
    assert abs(sum(got.values()) - (full - empty)) < 1e-9
    # monotone game -> nonnegative attributions
    assert all(p >= -1e-12 for p in got.values())


def test_krippendorff_matches_handrolled(spark, sf_dir):
    """Recompute alpha in pure Python from the same md5 label/missing
    streams and require exact agreement (all weights dyadic)."""
    import hashlib as hl

    import etl_lens_spark.queries.npipe6 as m

    def md5long(s):
        return int(hl.md5(s.encode()).hexdigest()[:13], 16)

    SCALE = float(1 << 52)
    n_docs = 500  # sf0.001 fixture
    from etl_lens_spark.sources.tables import load_table

    ids = [
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .collect()
    ]
    o: dict = {}
    n_items = 0
    for d in ids:
        labs = []
        for a in range(1, m._KRIPP_ANN + 1):
            present = (
                md5long(f"km{a}|{d}") / SCALE >= m._KRIPP_MISS
            )
            if present:
                labs.append(md5long(f"kr{a}|{d}") % 3)
        mm = len(labs)
        if mm < 2:
            continue
        n_items += 1
        for g in range(mm):
            for h in range(mm):
                if g != h:
                    key = (labs[g], labs[h])
                    o[key] = o.get(key, 0.0) + 1.0 / (mm - 1)
    n = sum(o.values())
    d_obs = sum(v for (c, k), v in o.items() if c != k)
    nc: dict = {}
    for (c, k), v_ in o.items():
        nc[c] = nc.get(c, 0.0) + v_
    cross = sum(
        nc[c1] * nc[c2] for c1 in nc for c2 in nc if c1 != c2
    )
    d_exp = cross / (n - 1.0)
    alpha = 1.0 - d_obs / d_exp
    row = (
        REGISTRY["label_agreement_krippendorff"].fn(spark, sf_dir).first()
    )
    assert row["n_items"] == n_items
    assert abs(row["n_pairable"] - n) < 1e-9
    assert abs(row["d_obs"] - d_obs) < 1e-9
    assert abs(row["alpha"] - alpha) < 1e-12
    # random labels with partial agreement-by-chance only: alpha ~ 0
    assert -0.2 < row["alpha"] < 0.2


def test_mann_whitney_matches_scipy_free_reference(spark, sf_dir):
    """Recompute U/AUC/z in pure Python (tie-averaged ranks) from the
    same cents values and require exact agreement."""
    from etl_lens_spark.sources.tables import load_table
    import etl_lens_spark.queries.npipe6 as m

    rows = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin(m._MWU_A, m._MWU_B))
        .select(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("x"),
            (F.col("o_orderpriority") == m._MWU_A)
            .cast("int")
            .alias("ga"),
        )
        .collect()
    )
    xs = sorted({r["x"] for r in rows})
    from collections import Counter

    cnt = Counter(r["x"] for r in rows)
    # tie-averaged rank per value
    rank = {}
    cum = 0
    for x in xs:
        c = cnt[x]
        rank[x] = cum + (c + 1) / 2
        cum += c
    na = sum(r["ga"] for r in rows)
    nb = len(rows) - na
    ra = sum(rank[r["x"]] for r in rows if r["ga"])
    u_a = ra - na * (na + 1) / 2
    t = sum(c**3 - c for c in cnt.values())
    n = len(rows)
    sigma = (
        na * nb / 12 * ((n + 1) - t / (n * (n - 1)))
    ) ** 0.5
    z = (u_a - na * nb / 2) / sigma
    got = REGISTRY["stats_mann_whitney_u"].fn(spark, sf_dir).first()
    assert got["na"] == na and got["nb"] == nb
    assert got["u_a"] == int(u_a)
    assert abs(got["auc"] - u_a / (na * nb)) < 1e-12
    assert abs(got["z"] - z) < 1e-9
    # similar distributions -> modest z, AUC near 0.5
    assert 0.35 < got["auc"] < 0.65


def test_ipw_ate_recovers_planted_effect(spark, sf_dir):
    rows = REGISTRY["causal_ipw_ate"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    ate = sum(r["contribution"] for r in rows)
    # planted +$10k per treated unit; the stratified estimator is
    # unbiased, so recovery is asserted within 4 standard errors
    # DERIVED FROM THE DATA (order-value variance is large relative
    # to any fixed tolerance at sf0.001)
    import etl_lens_spark.queries.npipe6 as m
    from etl_lens_spark.operators.kmv import SCALE as MD5_SCALE
    from etl_lens_spark.operators.kmv import kmv_value
    from etl_lens_spark.sources.tables import load_table

    pr = (
        F.substring(F.col("o_orderpriority"), 1, 1).cast("long") - 1
    ).cast("double")
    t = F.when(
        kmv_value(
            F.concat(F.lit("tr|"), F.col("o_orderkey").cast("string"))
        ).cast("double")
        / F.lit(MD5_SCALE)
        < F.lit(0.2) + F.lit(0.1) * pr,
        1,
    ).otherwise(0)
    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("stratum"),
        t.alias("t"),
        (
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            + t * m._ATE_EFFECT_C
        ).alias("yc"),
    )
    st = base.groupBy("stratum", "t").agg(
        F.count(F.lit(1)).alias("n"),
        F.var_samp((F.col("yc") / 100).cast("double")).alias("v"),
    ).collect()
    arms = {(r["stratum"], r["t"]): (r["n"], r["v"]) for r in st}
    n_total = sum(n for n, _ in arms.values())
    se2 = 0.0
    for s_ in {k[0] for k in arms}:
        n1, v1 = arms[(s_, 1)]
        n0, v0 = arms[(s_, 0)]
        w = (n1 + n0) / n_total
        se2 += w * w * (v1 / n1 + v0 / n0)
    se = se2**0.5
    planted = m._ATE_EFFECT_C / 100
    assert abs(ate - planted) < 4 * se, (ate, planted, se)
    for i, r in enumerate(sorted(rows, key=lambda r: r["stratum"])):
        planted = 0.2 + 0.1 * i
        assert abs(r["e_hat"] - planted) < 0.08
        assert r["n_t"] < r["n"]


def test_did_recovers_planted_effect(spark, sf_dir):
    """The 2x2 DiD contrast recovers the planted effect within a
    data-derived 4-SE bound (parallel trends hold by construction)."""
    import etl_lens_spark.queries.npipe6 as m
    from etl_lens_spark.operators.kmv import SCALE as MD5_SCALE
    from etl_lens_spark.operators.kmv import kmv_value
    from etl_lens_spark.sources.tables import load_table

    cells = {
        (r["treated"], r["post"]): r
        for r in REGISTRY["causal_diff_in_diff"].fn(spark, sf_dir).collect()
    }
    assert set(cells) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    did = (
        cells[(1, 1)]["y_mean"] - cells[(1, 0)]["y_mean"]
    ) - (cells[(0, 1)]["y_mean"] - cells[(0, 0)]["y_mean"])
    treated = (
        kmv_value(
            F.concat(F.lit("dd|"), F.col("o_custkey").cast("string"))
        )
        % 2
    )
    post = (
        F.col("o_orderdate").cast("date") >= F.lit(m._DID_CUT)
    ).cast("int")
    obs = load_table(spark, sf_dir, "orders").select(
        treated.alias("t"),
        post.alias("p"),
        (
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            + treated * post * m._DID_EFFECT_C
        ).alias("yc"),
    )
    st = obs.groupBy("t", "p").agg(
        F.count(F.lit(1)).alias("n"),
        F.var_samp((F.col("yc") / 100).cast("double")).alias("v"),
    ).collect()
    se = sum(r["v"] / r["n"] for r in st) ** 0.5
    planted = m._DID_EFFECT_C / 100
    assert abs(did - planted) < 4 * se, (did, planted, se)


def test_hard_negatives_are_hardest_cross_label(spark, sf_dir):
    """Each mined negative must (a) carry a different label than its
    anchor and (b) beat every other cross-label candidate's cosine —
    verified against a numpy brute force."""
    import numpy as np

    from etl_lens_spark.sources.tables import load_table

    vecs = {
        r["vec_id"]: (r["label"], np.array(r["embedding"], dtype=np.float64))
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    got = {
        r["qid"]: r
        for r in REGISTRY["emb_hard_negative_mining"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert len(got) == 20
    for qid, r in got.items():
        ql, qv = vecs[qid]
        assert r["negative_label"] != r["q_label"] == ql
        best_cos, best_id = None, None
        for cid, (cl, cv) in vecs.items():
            if cl == ql:
                continue
            cos = float(
                qv @ cv / (np.linalg.norm(qv) * np.linalg.norm(cv))
            )
            key = (cos, -cid)
            if best_cos is None or key > (best_cos, -best_id):
                best_cos, best_id = cos, cid
        assert r["hard_negative_id"] == best_id
        assert abs(r["cos"] - best_cos) < 1e-9


def test_class_balance_weights_properties(spark, sf_dir):
    rows = REGISTRY["ml_class_balance_weights"].fn(spark, sf_dir).collect()
    assert rows
    # normalization: weighted sample count equals true count
    assert (
        abs(sum(r["weight"] * r["n"] for r in rows)
            - sum(r["n"] for r in rows))
        < 1e-6
    )
    # rarer classes never get SMALLER weights
    by_n = sorted(rows, key=lambda r: r["n"])
    ws = [r["weight"] for r in by_n]
    assert all(a >= b - 1e-12 for a, b in zip(ws, ws[1:]))


def test_offpolicy_ips_consistency(spark, sf_dir):
    """IPS with estimated context-free propensities and the replay
    estimator target the same policy value: on this log (action
    independent of the user-parity context by construction) they
    must agree closely, and both must lie in [0, 1]."""
    row = REGISTRY["bandit_offpolicy_ips"].fn(spark, sf_dir).first()
    assert row["n_logged"] > 0
    assert 0.0 <= row["replay_estimate"] <= 1.0
    assert 0.0 <= row["logging_policy_reward"] <= 1.0
    assert row["ips_estimate"] >= 0.0
    # IPS = replay * (match_mass correction); with context-free
    # propensities the two coincide up to the per-action mix
    assert abs(row["ips_estimate"] - row["replay_estimate"]) < 0.05
    # the deterministic target picks 1 of 5 actions per context:
    # match rate ~ 1/5
    assert 0.1 < row["match_rate"] < 0.3


def test_simpsons_paradox_full_reversal(spark, sf_dir):
    rows = {
        r["stratum"]: r
        for r in REGISTRY["stats_simpsons_paradox_scan"]
        .fn(spark, sf_dir)
        .collect()
    }
    strata = [s for s in rows if s != "ALL"]
    assert len(strata) == 5 and "ALL" in rows
    # planted: within-stratum slope is exactly -1 (y = 2s - u,
    # x = s + u, s constant within stratum)
    for s in strata:
        assert abs(rows[s]["slope"] - (-1.0)) < 1e-9
    # pooled: stratum drives both -> strongly positive
    assert rows["ALL"]["slope"] > 0.5
