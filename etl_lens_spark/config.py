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
