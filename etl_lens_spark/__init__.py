"""etl_lens_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of pyboers/ETL-Lens
(an ETW event-trace analyzer with a latent SQLite SQL surface; see
SURVEY.md) as an idiomatic Apache Spark DataFrame/SQL engine, extended
with large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns).

Layers
------
- [R] reference-implemented behavior: event catalog build, per-type
  filter/project/limit queries, multi-key sort, enum decode
  (``etl_lens_spark.catalog``, ``etl_lens_spark.operators``).
- [L] latent SQL surface (SQLite 3.46 dialect superset): joins, aggs,
  window functions, set ops, scalar/JSON functions, subqueries —
  expressed through Spark SQL / DataFrame so Catalyst optimizes them.
- [N] north-star operators: ``etl_lens_spark.dedup``,
  ``etl_lens_spark.similarity``, ``etl_lens_spark.text``,
  ``etl_lens_spark.multimodal``, ``etl_lens_spark.streaming``.

Every operator is designed for a 1000-executor / 100 TB deployment:
declarative plans (Catalyst pushdown + AQE), explicit broadcast of
small dimensions, shuffle-minimizing compositions, no driver-side
collects in any transform.
"""

from etl_lens_spark.session import get_spark
from etl_lens_spark.sources.tables import TABLE_NAMES, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views", "TABLE_NAMES"]

__version__ = "0.1.0"
