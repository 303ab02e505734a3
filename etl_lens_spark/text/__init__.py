from etl_lens_spark.text.analysis import (
    add_langid,
    add_quality_signals,
    add_token_counts,
)

__all__ = ["add_langid", "add_quality_signals", "add_token_counts"]
