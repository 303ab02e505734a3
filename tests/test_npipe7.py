"""Round-5 continuation-tranche semantics beyond the oracle hash:
negative-sampling batch invariants, label-noise-detection math, and
the tokenizer-fertility anchors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_lens_spark.queries import REGISTRY, all_queries

all_queries()


# ---------------------------------------------------------------------------
# emb_negative_sampling
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def neg_rows(spark, sf_dir):
    return REGISTRY["emb_negative_sampling"].fn(spark, sf_dir).collect()


def test_negative_sampling_excludes_positives(neg_rows):
    assert all(r["neg_label"] != r["q_label"] for r in neg_rows)


def test_negative_sampling_k_per_anchor(neg_rows):
    from collections import Counter

    from etl_lens_spark.queries.npipe7 import _NS_ANCHORS, _NS_K

    per = Counter(r["qid"] for r in neg_rows)
    assert len(per) == _NS_ANCHORS
    assert all(c == _NS_K for c in per.values())
    # ranks are 1..k, sample keys strictly increasing within anchor
    by_q = {}
    for r in neg_rows:
        by_q.setdefault(r["qid"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["neg_rank"])
        assert [r["neg_rank"] for r in rows] == list(range(1, _NS_K + 1))
        keys = [r["sample_key"] for r in rows]
        assert keys == sorted(keys)


def test_negative_sampling_is_replayable(spark, sf_dir, neg_rows):
    """Same corpus snapshot → bit-identical batches (the lineage
    property the deterministic hash buys)."""
    again = REGISTRY["emb_negative_sampling"].fn(spark, sf_dir).collect()
    assert again == neg_rows


def test_negative_sampling_spreads_over_labels(neg_rows):
    """Uniform-ish: the 64 draws shouldn't all hit one label."""
    labels = {r["neg_label"] for r in neg_rows}
    assert len(labels) >= 3


# ---------------------------------------------------------------------------
# ml_label_noise_knn
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def noise_rows(spark, sf_dir):
    return REGISTRY["ml_label_noise_knn"].fn(spark, sf_dir).collect()


def test_label_noise_covers_corpus(noise_rows, spark, sf_dir):
    n = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .count()
    )
    assert len(noise_rows) == n


def test_label_noise_fraction_consistent(noise_rows):
    from etl_lens_spark.queries.npipe7 import _LN_FLAG, _LN_K

    for r in noise_rows:
        assert 0 <= r["n_disagree"] <= _LN_K
        assert abs(r["disagreement"] - r["n_disagree"] / _LN_K) < 1e-12
        assert r["flagged"] == (r["n_disagree"] > _LN_K * _LN_FLAG)


def test_label_noise_matches_numpy_reference(spark, sf_dir):
    """Exact kNN-disagreement recomputed densely in numpy."""
    import numpy as np

    from etl_lens_spark.queries.npipe7 import _LN_K

    pdf = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .toPandas()
    )
    X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    labels = pdf["label"].to_numpy()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cos = Xn @ Xn.T
    expected = {}
    for i in range(len(ids)):
        order = sorted(
            (j for j in range(len(ids)) if j != i),
            key=lambda j: (-cos[i, j], ids[j]),
        )[:_LN_K]
        expected[int(ids[i])] = sum(
            1 for j in order if labels[j] != labels[i]
        )
    got = {
        r["vec_id"]: r["n_disagree"]
        for r in REGISTRY["ml_label_noise_knn"].fn(spark, sf_dir).collect()
    }
    mismatches = {
        k: (got[k], expected[k])
        for k in expected
        if got[k] != expected[k]
    }
    # float64 numpy GEMM vs the sequential fold can disagree only on
    # exact cosine ties at the k-boundary; demand near-total agreement
    assert len(mismatches) <= len(expected) * 0.01, mismatches


# ---------------------------------------------------------------------------
# text_tokenizer_fertility
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fert(spark, sf_dir):
    rows = REGISTRY["text_tokenizer_fertility"].fn(spark, sf_dir).collect()
    return {r["tokenizer"]: r for r in rows}


def test_fertility_anchors(fert):
    ws, chars = fert["whitespace"], fert["chars"]
    assert ws["fertility"] == 1.0
    assert abs(chars["chars_per_token"] - 1.0) < 1e-12
    # chars fertility = mean word length = whitespace chars_per_token
    assert abs(chars["fertility"] - ws["chars_per_token"]) < 1e-9


def test_fertility_learned_tokenizers_bounded(fert):
    hi = fert["chars"]["fertility"]
    for name in ("bpe_8m", "unigram_lm", "wordpiece"):
        row = fert[name]
        assert 1.0 <= row["fertility"] <= hi, name
        # every tokenizer sees the same word stream
        assert row["n_words"] == fert["whitespace"]["n_words"]
        # fertility and chars_per_token are consistent inverses
        assert (
            abs(
                row["fertility"] * row["chars_per_token"]
                - fert["chars"]["fertility"]
            )
            < 1e-9
        ), name


def test_fertility_matches_encoder_outputs(spark, sf_dir):
    """The BPE row must equal Σ freq·n_tokens / Σ freq recomputed
    straight from the audited encoder."""
    from etl_lens_spark.queries.bpe_q import _WP_MAXW, N_MERGES
    from etl_lens_spark.text import bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wf = bpe.word_freqs(docs).filter(F.length("word") <= _WP_MAXW)
    enc = bpe.encode_words(wf, bpe.train_merges(wf, N_MERGES))
    agg = enc.agg(
        (
            F.sum(F.col("freq") * F.col("n_tokens")).cast("double")
            / F.sum("freq")
        ).alias("fert")
    ).collect()[0]
    rows = REGISTRY["text_tokenizer_fertility"].fn(spark, sf_dir).collect()
    got = {r["tokenizer"]: r["fertility"] for r in rows}
    assert abs(got[f"bpe_{N_MERGES}m"] - agg["fert"]) < 1e-9


# ---------------------------------------------------------------------------
# emb_matryoshka_truncation_audit
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mt_rows(spark, sf_dir):
    rows = (
        REGISTRY["emb_matryoshka_truncation_audit"]
        .fn(spark, sf_dir)
        .collect()
    )
    return {r["dim"]: r for r in rows}


def test_matryoshka_error_grows_as_dims_shrink(mt_rows):
    assert set(mt_rows) == {32, 16, 8}
    assert (
        mt_rows[32]["mean_abs_err"]
        <= mt_rows[16]["mean_abs_err"]
        <= mt_rows[8]["mean_abs_err"]
    )
    for r in mt_rows.values():
        assert 0.0 <= r["mean_abs_err"] <= r["max_abs_err"] <= 2.0
        assert 0.0 <= r["nn_agreement"] <= 1.0
        assert r["n_pairs"] == 25 * 24 // 2


def test_matryoshka_matches_numpy(spark, sf_dir):
    """Truncated-cosine errors recomputed densely in numpy."""
    import numpy as np

    pdf = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter("vec_id < 25")
        .orderBy("vec_id")
        .toPandas()
    )
    X = np.array(pdf["embedding"].tolist(), dtype=np.float64)

    def cosm(d):
        Xd = X[:, :d]
        Xn = Xd / np.linalg.norm(Xd, axis=1, keepdims=True)
        return Xn @ Xn.T

    full = cosm(64)
    iu = np.triu_indices(len(X), k=1)
    got = {
        r["dim"]: r
        for r in REGISTRY["emb_matryoshka_truncation_audit"]
        .fn(spark, sf_dir)
        .collect()
    }
    for d in (32, 16, 8):
        err = np.abs(cosm(d)[iu] - full[iu])
        assert abs(got[d]["mean_abs_err"] - err.mean()) < 1e-9
        assert abs(got[d]["max_abs_err"] - err.max()) < 1e-9


# ---------------------------------------------------------------------------
# dataset_curriculum_phases
# ---------------------------------------------------------------------------


def test_curriculum_phases_partition_corpus(spark, sf_dir):
    rows = (
        REGISTRY["dataset_curriculum_phases"].fn(spark, sf_dir).collect()
    )
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert [r["phase"] for r in rows] == [1, 2, 3, 4]
    assert sum(r["n_docs"] for r in rows) == n_docs
    # NTILE balance: sizes differ by at most 1
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # difficulty is non-decreasing across phase boundaries
    for a, b in zip(rows, rows[1:]):
        assert a["difficulty_max"] <= b["difficulty_min"] + 1e-12
    # cumulative budget is the running sum and ends at the corpus total
    cum = 0
    for r in rows:
        cum += r["n_tokens"]
        assert r["cum_tokens"] == cum


# ---------------------------------------------------------------------------
# ml_gbdt_split_histogram
# ---------------------------------------------------------------------------


def test_gbdt_split_gain_math(spark, sf_dir):
    """The winning split's gain recomputed from raw data in numpy,
    and gains are non-negative (squared loss, λ-regularized)."""
    import numpy as np

    rows = REGISTRY["ml_gbdt_split_histogram"].fn(spark, sf_dir).collect()
    assert {r["feature"] for r in rows} == {"quantity", "discount", "tax"}
    pdf = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_extendedprice", "l_quantity", "l_discount", "l_tax"
    ).toPandas()
    # half-away-from-zero to match Spark/DuckDB round() (np.round
    # is half-to-even); all values are positive
    y = np.floor(
        pdf["l_extendedprice"].to_numpy()
        * pdf["l_discount"].to_numpy()
        * 100
        + 0.5
    ).astype(np.int64)
    bins = {
        "quantity": pdf["l_quantity"].to_numpy().astype(np.int64),
        "discount": np.round(pdf["l_discount"].to_numpy() * 100).astype(
            np.int64
        ),
        "tax": np.round(pdf["l_tax"].to_numpy() * 100).astype(np.int64),
    }
    lam, scale = 1.0, 100000.0
    for r in rows:
        b = bins[r["feature"]]
        left = b <= r["split_bin"]
        gl = y[left].sum() / scale
        gr = y[~left].sum() / scale
        gt = y.sum() / scale
        n = len(y)
        gain = (
            gl**2 / (left.sum() + lam)
            + gr**2 / ((~left).sum() + lam)
            - gt**2 / (n + lam)
        )
        assert r["n_left"] == left.sum()
        assert r["n_right"] == (~left).sum()
        assert abs(r["gain"] - gain) < 1e-6
    # discount drives the target (y = price·discount), so its best
    # split must carry large positive gain; quantity/tax carry no
    # signal (independent columns in the fixture), and with
    # uncentered gradients + λ>0 an uninformative split's gain sits
    # near −μ² (slightly negative) — the "don't split" signal a
    # γ-threshold would act on
    gains = {r["feature"]: r["gain"] for r in rows}
    assert gains["discount"] > 0
    assert gains["discount"] > gains["quantity"]
    assert gains["discount"] > gains["tax"]


def test_gbdt_split_is_argmax(spark, sf_dir):
    """No other bin of the winning feature beats the reported gain
    (exhaustive check over the ≤51-bin histogram in numpy)."""
    import numpy as np

    rows = REGISTRY["ml_gbdt_split_histogram"].fn(spark, sf_dir).collect()
    pdf = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_extendedprice", "l_quantity", "l_discount"
    ).toPandas()
    # half-away-from-zero to match Spark/DuckDB round() (np.round
    # is half-to-even); all values are positive
    y = np.floor(
        pdf["l_extendedprice"].to_numpy()
        * pdf["l_discount"].to_numpy()
        * 100
        + 0.5
    ).astype(np.int64)
    b = pdf["l_quantity"].to_numpy().astype(np.int64)
    lam, scale = 1.0, 100000.0
    gt, n = y.sum() / scale, len(y)
    best = max(
        (
            (
                y[b <= s].sum() / scale
            ) ** 2 / ((b <= s).sum() + lam)
            + (y[b > s].sum() / scale) ** 2 / ((b > s).sum() + lam)
            - gt**2 / (n + lam)
            for s in np.unique(b)
            if (b > s).sum() > 0
        ),
    )
    got = {r["feature"]: r["gain"] for r in rows}["quantity"]
    assert abs(got - best) < 1e-6


# ---------------------------------------------------------------------------
# sample_reservoir_uniform
# ---------------------------------------------------------------------------


def test_reservoir_sample_is_bottom_k_by_hash(spark, sf_dir):
    from etl_lens_spark.operators.kmv import kmv_value
    from etl_lens_spark.queries.npipe7 import _RS_K

    rows = REGISTRY["sample_reservoir_uniform"].fn(spark, sf_dir).collect()
    assert [r["sample_rank"] for r in rows] == list(range(1, _RS_K + 1))
    hv = [r["hv"] for r in rows]
    assert hv == sorted(hv)
    # the k-th member really is the k-th smallest hash corpus-wide
    all_hv = sorted(
        r["hv"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(kmv_value(F.col("doc_id")).alias("hv"))
        .collect()
    )
    assert hv == all_hv[:_RS_K]


def test_reservoir_sample_stable_under_append(spark, sf_dir):
    """Appending rows can only swap members in via smaller hashes —
    the surviving members keep their relative order."""
    from etl_lens_spark.operators.kmv import kmv_value
    from etl_lens_spark.queries.npipe7 import _RS_K

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    half = docs.filter("doc_id % 2 = 0")
    hv_half = sorted(
        r["hv"]
        for r in half.select(kmv_value(F.col("doc_id")).alias("hv")).collect()
    )[:_RS_K]
    full = REGISTRY["sample_reservoir_uniform"].fn(spark, sf_dir).collect()
    hv_full = [r["hv"] for r in full]
    # every full-corpus member NOT in the half sample must beat (be
    # smaller than) the half sample's k-th hash or belong to the
    # added half
    assert set(hv_full) & set(hv_half)  # overlap survives


# ---------------------------------------------------------------------------
# dataset_kcenter_coreset
# ---------------------------------------------------------------------------


def test_kcenter_matches_numpy_gonzalez(spark, sf_dir):
    import numpy as np

    from etl_lens_spark.queries.npipe7 import _KC_K

    pdf = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .toPandas()
    )
    X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    sel = [0]
    mind = ((X - X[list(ids).index(0)]) ** 2).sum(axis=1)
    expected = [(1, 0)]
    for rank in range(2, _KC_K + 1):
        # argmax with min-vec_id tie-break
        best = max(range(len(ids)), key=lambda i: (mind[i], -ids[i]))
        expected.append((rank, int(ids[best])))
        mind = np.minimum(mind, ((X - X[best]) ** 2).sum(axis=1))
    rows = REGISTRY["dataset_kcenter_coreset"].fn(spark, sf_dir).collect()
    got = [(r["selection_rank"], r["vec_id"]) for r in rows]
    assert got == expected
    # final covering radius matches the numpy replica
    assert abs(rows[-1]["covering_radius"] - mind.max()) < 1e-6


def test_kcenter_radius_non_increasing(spark, sf_dir):
    rows = REGISTRY["dataset_kcenter_coreset"].fn(spark, sf_dir).collect()
    radii = [r["covering_radius"] for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(radii, radii[1:]))
    assert radii[-1] >= 0.0


# ---------------------------------------------------------------------------
# ml_active_learning_batch
# ---------------------------------------------------------------------------


def test_active_learning_batch_is_least_certain(spark, sf_dir):
    from etl_lens_spark.queries.quality_q import _AL_K

    rows = REGISTRY["ml_active_learning_batch"].fn(spark, sf_dir).collect()
    assert [r["al_rank"] for r in rows] == list(range(1, _AL_K + 1))
    unc = [r["uncertainty"] for r in rows]
    assert unc == sorted(unc)
    for r in rows:
        assert abs(r["uncertainty"] - abs(r["score"] - 0.5)) < 1e-9
        assert 0.0 <= r["entropy"] <= 0.6931472  # ≤ ln 2
    # entropy is maximal where uncertainty is minimal: the batch's
    # mean entropy must beat the corpus-wide mean
    scored = REGISTRY["ml_logreg_score_filter"].fn(spark, sf_dir).collect()
    import math

    def ent(p):
        p = min(max(p, 1e-12), 1 - 1e-12)
        return -(p * math.log(p) + (1 - p) * math.log(1 - p))

    corpus_mean = sum(ent(r["score"]) for r in scored) / len(scored)
    batch_mean = sum(r["entropy"] for r in rows) / len(rows)
    assert batch_mean > corpus_mean


# ---------------------------------------------------------------------------
# text_bleu_ngram_eval
# ---------------------------------------------------------------------------


def test_bleu_matches_pure_python(spark, sf_dir):
    """Corpus BLEU-2 recomputed with a dict-based reference."""
    import math
    import re as _re
    from collections import Counter

    pdf = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .orderBy("doc_id")
        .toPandas()
    )
    toks = {
        int(r.doc_id): _re.sub(r"\s+", " ", r.text.lower()).strip().split(" ")
        for r in pdf.itertuples()
        if _re.sub(r"\s+", " ", r.text.lower()).strip()
    }
    clip = {1: [0, 0], 2: [0, 0]}
    cand_len = ref_len = n_pairs = 0
    for d, wl in toks.items():
        if d % 2 or d + 1 not in toks:
            continue
        rl = toks[d + 1]
        n_pairs += 1
        cand_len += len(wl)
        ref_len += len(rl)
        for n in (1, 2):
            cg = Counter(
                tuple(wl[i : i + n]) for i in range(len(wl) - n + 1)
            )
            rg = Counter(
                tuple(rl[i : i + n]) for i in range(len(rl) - n + 1)
            )
            clip[n][0] += sum(min(c, rg[g]) for g, c in cg.items())
            clip[n][1] += sum(cg.values())
    p1 = clip[1][0] / clip[1][1]
    p2 = clip[2][0] / clip[2][1]
    bp = math.exp(min(0.0, 1.0 - ref_len / cand_len))
    bleu = bp * math.exp(0.5 * math.log(p1) + 0.5 * math.log(p2))
    row = REGISTRY["text_bleu_ngram_eval"].fn(spark, sf_dir).collect()[0]
    assert row["n_pairs"] == n_pairs
    assert row["cand_len"] == cand_len and row["ref_len"] == ref_len
    assert abs(row["prec1"] - p1) < 1e-6
    assert abs(row["prec2"] - p2) < 1e-6
    assert abs(row["bleu2"] - bleu) < 1e-6
    # identity pairs would score 1; distinct docs must score below
    assert 0.0 < row["bleu2"] < 1.0
    assert row["prec2"] <= row["prec1"]  # higher order is harder



# ---------------------------------------------------------------------------
# ml_gbdt_boost_round2
# ---------------------------------------------------------------------------


def test_gbdt_round2_tree_consistency(spark, sf_dir):
    """Root row matches round-1's winner; child splits cover the
    node populations; every reported gain is recomputable."""
    rows = {
        r["node"]: r
        for r in REGISTRY["ml_gbdt_boost_round2"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {"root", "L", "R"}
    r1 = {
        r["feature"]: r
        for r in REGISTRY["ml_gbdt_split_histogram"]
        .fn(spark, sf_dir)
        .collect()
    }
    best1 = max(r1.values(), key=lambda r: r["gain"])
    root = rows["root"]
    assert (root["feature"], root["split_bin"]) == (
        best1["feature"],
        best1["split_bin"],
    )
    # children partition the root's two sides
    assert (
        rows["L"]["n_left"] + rows["L"]["n_right"] == root["n_left"]
    )
    assert (
        rows["R"]["n_left"] + rows["R"]["n_right"] == root["n_right"]
    )
    # leaf weights only on the root row
    assert root["w_left"] is not None and root["w_right"] is not None
    assert rows["L"]["w_left"] is None and rows["R"]["w_left"] is None


def test_gbdt_round2_residual_gain_numpy(spark, sf_dir):
    """Node L's winning gain recomputed from raw residuals in numpy."""
    import numpy as np

    rows = {
        r["node"]: r
        for r in REGISTRY["ml_gbdt_boost_round2"].fn(spark, sf_dir).collect()
    }
    root = rows["root"]
    pdf = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_extendedprice", "l_quantity", "l_discount", "l_tax"
    ).toPandas()
    y = np.floor(
        pdf["l_extendedprice"].to_numpy()
        * pdf["l_discount"].to_numpy()
        * 100
        + 0.5
    ).astype(np.int64)
    bins = {
        "quantity": pdf["l_quantity"].to_numpy().astype(np.int64),
        "discount": np.round(pdf["l_discount"].to_numpy() * 100).astype(
            np.int64
        ),
        "tax": np.round(pdf["l_tax"].to_numpy() * 100).astype(np.int64),
    }
    lam, scale = 1.0, 100000.0
    left = bins[root["feature"]] <= root["split_bin"]
    w_node = (y[left].sum() / scale) / (left.sum() + lam)
    assert abs(w_node - root["w_left"]) < 1e-5
    # residual gradient g2 = w_node - y on node L; best split there
    yl = y[left]
    bl = bins[rows["L"]["feature"]][left]
    s = rows["L"]["split_bin"]
    sl, sr = bl <= s, bl > s
    g2 = lambda m: m.sum() * w_node - y[left][m].sum() / scale
    gain = (
        g2(sl) ** 2 / (sl.sum() + lam)
        + g2(sr) ** 2 / (sr.sum() + lam)
        - g2(np.ones_like(sl, bool)) ** 2 / (len(yl) + lam)
    )
    assert abs(rows["L"]["gain"] - gain) < 1e-6


# ---------------------------------------------------------------------------
# dataset_inbatch_negative_packing
# ---------------------------------------------------------------------------


def test_inbatch_packing_label_distinct(spark, sf_dir):
    rows = (
        REGISTRY["dataset_inbatch_negative_packing"]
        .fn(spark, sf_dir)
        .collect()
    )
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r["batch_size"] for r in rows) == n
    assert all(r["all_distinct"] for r in rows)  # the construction proof
    # batch sizes non-increasing in batch_id (round-robin property)
    sizes = [r["batch_size"] for r in sorted(rows, key=lambda r: r["batch_id"])]
    assert sizes == sorted(sizes, reverse=True)


# ---------------------------------------------------------------------------
# pack_length_bucket_padding
# ---------------------------------------------------------------------------


def test_length_bucket_padding_accounting(spark, sf_dir):
    rows = (
        REGISTRY["pack_length_bucket_padding"].fn(spark, sf_dir).collect()
    )
    import math

    from pyspark.sql import functions as SF

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = SF.trim(
        SF.regexp_replace(SF.lower(SF.col("text")), r"\s+", " ")
    )
    d = [
        r["n"]
        for r in docs.filter(norm != "")
        .select(SF.size(SF.split(norm, " ")).alias("n"))
        .collect()
    ]
    assert sum(r["n_docs"] for r in rows) == len(d)
    assert sum(r["n_tokens"] for r in rows) == sum(d)
    naive = 1.0 - sum(d) / (len(d) * max(d))
    for r in rows:
        # bucket is the enclosing power of two
        assert r["bucket_len"] == 2 ** math.ceil(
            math.log2(r["bucket_len"])
        )
        assert 0.0 <= r["padding_frac"] < 1.0
        # bucketing must beat padding-to-global-max in every bucket
        assert r["padding_frac"] <= r["naive_padding_frac"] + 1e-9
        assert abs(r["naive_padding_frac"] - naive) < 1e-6
        # exact token accounting
        assert (
            r["padding_tokens"]
            == r["n_docs"] * r["bucket_len"] - r["n_tokens"]
        )


def test_bleu_survives_one_word_docs(spark, tmp_path):
    """Regression: Spark's sequence(1, 0) DESCENDS, so a one-word doc
    used to index wl[1]/wl[-1] in the bigram transform (ANSI error).
    The guard emits an empty bigram array instead — matching DuckDB's
    empty range(1, 1)."""
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["hello", "hello world", "a b c", "a"],
            "lang": ["en"] * 4,
            "source": ["t"] * 4,
            "n_chars": [5, 11, 5, 1],
        }
    )
    d = str(tmp_path / "bleu_fixture")
    spark.createDataFrame(docs).coalesce(1).write.parquet(
        f"{d}/documents.parquet"
    )
    row = REGISTRY["text_bleu_ngram_eval"].fn(spark, d).collect()[0]
    # pair (0,1): cand "hello" (1 word, no bigrams) vs ref "hello world"
    # pair (2,3): cand "a b c" vs ref "a"
    assert row["n_pairs"] == 2
    assert row["cand_len"] == 4 and row["ref_len"] == 3
    # unigram clips: hello→1 of 1; a b c→1 of 3 ⇒ p1 = 2/4
    assert abs(row["prec1"] - 0.5) < 1e-9
    # bigrams: cand0 has none; cand2 has 2, ref3 none ⇒ p2 = 0/2 = 0
    assert row["prec2"] == 0.0


# ---------------------------------------------------------------------------
# ml_threshold_sweep / mix_epoch_schedule / emb_norm_outlier_audit
# ---------------------------------------------------------------------------


def test_threshold_sweep_monotone(spark, sf_dir):
    rows = REGISTRY["ml_threshold_sweep"].fn(spark, sf_dir).collect()
    assert [r["threshold"] for r in rows] == [
        round(i / 10.0, 1) for i in range(1, 10)
    ]
    n = rows[0]["tp"] + rows[0]["fp"] + rows[0]["fn"] + rows[0]["tn"]
    for r in rows:
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n
    # raising the threshold can only shrink the predicted-positive set
    pos = [r["tp"] + r["fp"] for r in rows]
    assert pos == sorted(pos, reverse=True)
    # recall is non-increasing in threshold
    rec = [r["recall"] for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(rec, rec[1:]))


def test_epoch_schedule_budget_accounting(spark, sf_dir):
    from etl_lens_spark.queries.npipe7 import _EP_BUDGET_X

    rows = REGISTRY["mix_epoch_schedule"].fn(spark, sf_dir).collect()
    assert abs(sum(r["mix_weight"] for r in rows) - 1.0) < 1e-5
    corpus = sum(r["avail_tokens"] for r in rows)
    requested = sum(r["requested_tokens"] for r in rows)
    assert abs(requested - _EP_BUDGET_X * corpus) <= len(rows)
    # temperature < 1 up-weights small sources: the smallest source
    # must repeat at least as much as the largest
    rows_by_size = sorted(rows, key=lambda r: r["avail_tokens"])
    assert rows_by_size[0]["epochs"] >= rows_by_size[-1]["epochs"] - 1e-9
    for r in rows:
        # requested_tokens is rounded to an integer, epochs is not —
        # they agree within half a token over the source size
        assert abs(
            r["epochs"] - r["requested_tokens"] / r["avail_tokens"]
        ) <= 0.5 / r["avail_tokens"] + 1e-6


def test_norm_audit_numpy(spark, sf_dir):
    import numpy as np

    pdf = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .toPandas()
    )
    X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    nrm = np.linalg.norm(X, axis=1)
    rows = REGISTRY["emb_norm_outlier_audit"].fn(spark, sf_dir).collect()
    assert sum(r["n"] for r in rows) == len(nrm)
    assert abs(min(r["min_norm"] for r in rows) - nrm.min()) < 1e-5
    assert abs(max(r["max_norm"] for r in rows) - nrm.max()) < 1e-5
    # p01/p99 cutoffs flag ~2% of the corpus in total
    flagged = sum(r["n_low"] + r["n_high"] for r in rows)
    assert 0 < flagged <= max(4, int(0.03 * len(nrm)) + 2)


# ---------------------------------------------------------------------------
# events_bot_detection_heuristics / reco_gini_popularity
# ---------------------------------------------------------------------------


def test_bot_detection_planted_metronome(spark, tmp_path):
    """A planted 1-event-per-second scheduler must be flagged; a
    planted bursty human must not."""
    import pandas as pd

    base = pd.Timestamp("2025-01-01")
    bot = [base + pd.Timedelta(seconds=i) for i in range(60)]
    human = [
        base + pd.Timedelta(seconds=s)
        for s in [0, 1, 2, 300, 301, 7200, 7201, 7203, 50000, 50001,
                  90000, 90005, 90007, 130000]
    ]
    pdf = pd.DataFrame(
        {
            "event_id": range(len(bot) + len(human)),
            "ts": bot + human,
            "user_id": [1] * len(bot) + [2] * len(human),
            "event_type": ["view"] * (len(bot) + len(human)),
            "value": [1.0] * (len(bot) + len(human)),
            "props": ["{}"] * (len(bot) + len(human)),
        }
    )
    d = str(tmp_path / "bot_fixture")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        f"{d}/events.parquet"
    )
    rows = {
        r["user_id"]: r
        for r in REGISTRY["events_bot_detection_heuristics"]
        .fn(spark, d)
        .collect()
    }
    assert rows[1]["bot_flag"] and rows[1]["gap_cv"] < 0.01
    assert not rows[2]["bot_flag"] and rows[2]["gap_cv"] > 0.35


def test_gini_matches_numpy(spark, sf_dir):
    import numpy as np

    pdf = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_partkey")
        .count()
        .toPandas()
        .sort_values(["count", "l_partkey"])
    )
    c = pdf["count"].to_numpy(dtype=np.float64)
    n, s = len(c), c.sum()
    rk = np.arange(1, n + 1)
    gini = 2.0 * (rk * c).sum() / (n * s) - (n + 1) / n
    row = REGISTRY["reco_gini_popularity"].fn(spark, sf_dir).collect()[0]
    assert row["n_items"] == n and row["n_interactions"] == s
    assert abs(row["gini"] - gini) < 1e-6
    assert 0.0 <= row["gini"] < 1.0
    # top decile can't hold less than a decile's uniform share
    assert row["top_decile_share"] >= 0.1 - 1e-9
