"""Runtime tuning knobs, read from Spark session conf so a deploy
can set them per-job (``--conf spark.etl_lens.sketch.accuracy=10000``)
without touching query code.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Saturating default: bit-exact (matches DuckDB quantile_disc rank
# semantics) up to gate-scale inputs — GK merge error compounds across
# partial-aggregate merges, so exactness needs accuracy ~5-7x N, not
# 1x N (measured round 4, PLANS.md). Production at real scale sets
# this DOWN (Spark's default is 10000) and accepts the eps*N rank
# bound; the plan shape is identical either way.
SKETCH_ACCURACY_DEFAULT = 1_000_000


def sketch_accuracy(spark: SparkSession) -> int:
    """approx_percentile accuracy for the sketch-twin queries
    (feature_quantile_bins_approx, customer_rfm_segments_approx,
    group_quantiles_approx)."""
    return int(
        spark.conf.get(
            "spark.etl_lens.sketch.accuracy", str(SKETCH_ACCURACY_DEFAULT)
        )
    )


# Bottom-k size of the KMV distinct sketches (batch merge query and
# the streaming state machine). Relative error ~ 1/sqrt(k-2); state
# is k longs per group. The default matches the declared oracles —
# production trades it against per-key state like any sketch knob.
KMV_K_DEFAULT = 64


def kmv_k(spark: SparkSession) -> int:
    """Bottom-k size for sketch_kmv_distinct_merge /
    streaming_kmv_distinct_live (operators/kmv.py)."""
    return int(spark.conf.get("spark.etl_lens.kmv.k", str(KMV_K_DEFAULT)))


# MinHash-LSH near-dup knobs (dedup/minhash.py). num_hashes must be
# divisible by bands; rows-per-band = num_hashes // bands sets the
# candidate threshold s* ~ (1/bands)^(1/rows). Defaults match the
# declared dedup_minhash_lsh contract (64 hashes x 16 bands, r=4).
MINHASH_NUM_HASHES_DEFAULT = 64
MINHASH_BANDS_DEFAULT = 16
MINHASH_SHINGLE_N_DEFAULT = 3


def minhash_params(spark: SparkSession) -> tuple[int, int, int]:
    """(num_hashes, bands, shingle_n) for dedup_minhash_lsh.

    Setting ``spark.etl_lens.minhash.target_jaccard`` DERIVES bands
    from the S-curve error minimization (dedup/tuning.py) instead of
    reading the bands knob — knobs-from-math rather than hand-tuning
    (explicit ``...minhash.bands`` still wins if both are set)."""
    nh = int(
        spark.conf.get(
            "spark.etl_lens.minhash.num_hashes",
            str(MINHASH_NUM_HASHES_DEFAULT),
        )
    )
    target = spark.conf.get(
        "spark.etl_lens.minhash.target_jaccard", None
    )
    if target is not None and spark.conf.get(
        "spark.etl_lens.minhash.bands", None
    ) is None:
        from etl_lens_spark.dedup.tuning import tune_lsh_params

        tuned_b, _ = tune_lsh_params(float(target), nh)
        b = tuned_b
    else:
        b = int(
            spark.conf.get(
                "spark.etl_lens.minhash.bands",
                str(MINHASH_BANDS_DEFAULT),
            )
        )
    n = int(
        spark.conf.get(
            "spark.etl_lens.minhash.shingle_n",
            str(MINHASH_SHINGLE_N_DEFAULT),
        )
    )
    if nh % b:
        raise ValueError(
            f"spark.etl_lens.minhash.num_hashes ({nh}) must be divisible "
            f"by spark.etl_lens.minhash.bands ({b})"
        )
    return nh, b, n


# SRP-LSH ANN knobs (similarity/knn.py): signature bits set bucket
# granularity (2^n_bits buckets); probes = 1 + flip-1 neighbors
# visited per query (equal-budget multi-probe recall uplift measured
# round 2: 0.60 -> 0.83 at probes=4).
SRP_N_BITS_DEFAULT = 8
SRP_PROBES_DEFAULT = 4


def srp_params(spark: SparkSession) -> tuple[int, int]:
    """(n_bits, probes) for sim_lsh_topk."""
    return (
        int(
            spark.conf.get(
                "spark.etl_lens.srp.n_bits", str(SRP_N_BITS_DEFAULT)
            )
        ),
        int(
            spark.conf.get(
                "spark.etl_lens.srp.probes", str(SRP_PROBES_DEFAULT)
            )
        ),
    )


# IVF-Flat ANN knobs (similarity/ivf.py): n_cells is the coarse
# quantizer size (shuffle key cardinality), nprobe the cells each
# query visits — recall/cost dial at fixed index.
IVF_N_CELLS_DEFAULT = 16
IVF_NPROBE_DEFAULT = 6
IVF_TRAIN_ITERS_DEFAULT = 3


def ivf_params(spark: SparkSession) -> tuple[int, int, int]:
    """(n_cells, nprobe, train_iters) for sim_ivf_topk."""
    return (
        int(
            spark.conf.get(
                "spark.etl_lens.ivf.n_cells", str(IVF_N_CELLS_DEFAULT)
            )
        ),
        int(
            spark.conf.get(
                "spark.etl_lens.ivf.nprobe", str(IVF_NPROBE_DEFAULT)
            )
        ),
        int(
            spark.conf.get(
                "spark.etl_lens.ivf.train_iters",
                str(IVF_TRAIN_ITERS_DEFAULT),
            )
        ),
    )


# Count-min sketch heavy-hitter knobs (operators/cms.py):
# overestimate bound eps ~ e/width with prob 1 - e^-depth; state is
# depth x width longs per sketch.
CMS_DEPTH_DEFAULT = 5
CMS_WIDTH_DEFAULT = 4096


def cms_params(spark: SparkSession) -> tuple[int, int]:
    """(depth, width) for cms_heavy_hitters."""
    return (
        int(
            spark.conf.get(
                "spark.etl_lens.cms.depth", str(CMS_DEPTH_DEFAULT)
            )
        ),
        int(
            spark.conf.get(
                "spark.etl_lens.cms.width", str(CMS_WIDTH_DEFAULT)
            )
        ),
    )


# Registry of every knob for the CLI `config` listing: conf key ->
# (default, one-line meaning). Keep in sync when adding knobs above.
KNOBS: dict[str, tuple[str, str]] = {
    "spark.etl_lens.sketch.accuracy": (
        str(SKETCH_ACCURACY_DEFAULT),
        "approx_percentile accuracy for the *_approx quantile twins",
    ),
    "spark.etl_lens.kmv.k": (
        str(KMV_K_DEFAULT),
        "KMV bottom-k size (distinct sketches, batch + streaming)",
    ),
    "spark.etl_lens.minhash.num_hashes": (
        str(MINHASH_NUM_HASHES_DEFAULT),
        "MinHash signature components (must divide by bands)",
    ),
    "spark.etl_lens.minhash.bands": (
        str(MINHASH_BANDS_DEFAULT),
        "LSH bands; rows-per-band = num_hashes/bands",
    ),
    "spark.etl_lens.minhash.target_jaccard": (
        "(unset)",
        "derive bands from the S-curve tuner (dedup/tuning.py) for "
        "this similarity threshold; explicit bands wins if both set",
    ),
    "spark.etl_lens.minhash.shingle_n": (
        str(MINHASH_SHINGLE_N_DEFAULT),
        "word-shingle size feeding the MinHash signature",
    ),
    "spark.etl_lens.srp.n_bits": (
        str(SRP_N_BITS_DEFAULT),
        "SRP-LSH signature bits (2^bits buckets)",
    ),
    "spark.etl_lens.srp.probes": (
        str(SRP_PROBES_DEFAULT),
        "multi-probe bucket visits per query (1 + flip-1 neighbors)",
    ),
    "spark.etl_lens.ivf.n_cells": (
        str(IVF_N_CELLS_DEFAULT),
        "IVF coarse-quantizer cells (corpus shuffle key cardinality)",
    ),
    "spark.etl_lens.ivf.nprobe": (
        str(IVF_NPROBE_DEFAULT),
        "IVF cells probed per query",
    ),
    "spark.etl_lens.ivf.train_iters": (
        str(IVF_TRAIN_ITERS_DEFAULT),
        "IVF k-means training iterations",
    ),
    "spark.etl_lens.cms.depth": (
        str(CMS_DEPTH_DEFAULT),
        "count-min sketch rows (error prob 1 - e^-depth)",
    ),
    "spark.etl_lens.cms.width": (
        str(CMS_WIDTH_DEFAULT),
        "count-min sketch columns (overestimate eps ~ e/width)",
    ),
}


def describe(spark: SparkSession) -> list[tuple[str, str, str, str]]:
    """(key, current, default, meaning) for every knob — the CLI
    `config` subcommand's data source."""
    out = []
    for key, (default, meaning) in sorted(KNOBS.items()):
        out.append((key, spark.conf.get(key, default), default, meaning))
    return out
