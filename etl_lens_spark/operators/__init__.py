from etl_lens_spark.operators.partitioning import parallelize_compute

__all__ = ["parallelize_compute"]
