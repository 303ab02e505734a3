"""The UDF/UDAF/UDTF surface (SURVEY §2.2: SQLite's
``sqlite3_create_function`` family → Spark's Python UDF tiers).

Everything here is Arrow-batched (pandas_udf / applyInPandas) — the
only acceptable Python path at scale. Row-at-a-time ``F.udf`` is
deliberately absent from the hot paths; it exists in Spark but costs
~10-100x and nothing in the engine needs it.

The functions are written to be *oracle-comparable*: arithmetic uses
formulas whose floating-point evaluation matches the SQL equivalent
at 6-decimal rounding (inputs pre-scaled to small magnitudes; see
each docstring).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def weighted_mean_udaf(values: pd.Series, weights: pd.Series) -> float:
    """GROUPED_AGG pandas UDF (a UDAF): sum(v*w)/sum(w).

    Uses explicit float64 sums over the Arrow batch — the same
    left-fold the SQL oracle computes; group sizes in the fixtures
    keep magnitudes small enough that accumulation-order differences
    vanish at 6 decimals."""
    num = float((values * weights).sum())
    den = float(weights.sum())
    return num / den if den != 0.0 else float("nan")


REGRESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_points", T.LongType()),
        T.StructField("slope_per_hour", T.DoubleType()),
    ]
)


def _fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """OLS slope of value vs event-time for one group, computed with
    the textbook closed form on *re-centered* x (hours since the
    group's first event) — small magnitudes so the float result
    matches DuckDB's regr_slope at 6 decimals."""
    x = (pdf["ts_us"] - pdf["ts_us"].min()) / 3_600_000_000.0
    y = pdf["value"]
    n = float(len(pdf))
    sx, sy = float(x.sum()), float(y.sum())
    sxx, sxy = float((x * x).sum()), float((x * y).sum())
    denom = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / denom if denom != 0 else float("nan")
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_points": [len(pdf)],
            "slope_per_hour": [slope],
        }
    )


def per_user_trend(events: DataFrame) -> DataFrame:
    """applyInPandas (grouped-map UDF): per-user OLS trend of event
    value over time. One shuffle on user_id; each group processed as
    one Arrow batch. The canonical "custom per-group model fit" shape
    for feature pipelines."""
    slim = events.select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    return slim.groupBy("user_id").applyInPandas(
        _fit_group, REGRESSION_SCHEMA
    )


ZSCORE_SCHEMA = "user_id long, event_id long, value double, zscore double"


def per_user_zscore(events: DataFrame) -> DataFrame:
    """applyInPandas returning one row per input row (group-local
    normalization) — population std (ddof=0)."""

    def z(pdf: pd.DataFrame) -> pd.DataFrame:
        std = float(pdf["value"].std(ddof=0))
        mean = float(pdf["value"].mean())
        out = pdf[["user_id", "event_id", "value"]].copy()
        out["zscore"] = (
            (pdf["value"] - mean) / std if std > 0 else 0.0
        )
        return out

    slim = events.select("user_id", "event_id", "value")
    return slim.groupBy("user_id").applyInPandas(z, ZSCORE_SCHEMA)
