"""Change-data-capture declared queries: snapshot diff, batch MERGE
apply, and order-independent replica checksums (operators/cdc.py).

The reference is a read-only trace viewer (its SQLite layer is never
wired for writes — SURVEY §2.2 scopes DML out), but the engine that
FEEDS such a viewer's lakehouse needs exactly this batch CDC algebra:
every nightly 100 TB pipeline ends in "diff the new snapshot against
yesterday's", "apply the changelog", "prove the replica matches".

Cross-engine discipline: doubles never enter a digest or a compare —
prices go through DECIMAL(18,2)·100 → BIGINT cents in both engines,
and the row digest is the repo-standard md5-hex-prefix-to-BIGINT
(identical expression text in Spark and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_lens_spark.operators.cdc import (
    merge_apply,
    row_digest,
    snapshot_diff,
    table_checksum,
)
from etl_lens_spark.queries import query
from etl_lens_spark.sources.tables import load_table

# Exact cents from the double price column — identical in both engines.
_CENTS = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"


def _cents(col: str) -> F.Column:
    return (F.col(col).cast("decimal(18,2)") * 100).cast("long")


@query(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH old AS (
        SELECT o_orderkey,
               {_CENTS} AS price_c,
               o_orderpriority AS priority
        FROM orders WHERE o_orderkey % 7 <> 3
    ),
    new AS (
        SELECT o_orderkey,
               {_CENTS}
                 + CASE WHEN o_orderkey % 3 = 0 THEN 10000 ELSE 0 END
                 AS price_c,
               o_orderpriority AS priority
        FROM orders WHERE o_orderkey % 5 <> 2
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS status,
           o.price_c AS old_price_c,
           n.price_c AS new_price_c
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR NOT (o.price_c = n.price_c AND o.priority = n.priority)
    ORDER BY o_orderkey
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog between two keyed snapshots of ``orders``: the old
    snapshot is missing every ``%7==3`` key (those become *added*),
    the new one is missing every ``%5==2`` key (*removed*), and every
    surviving ``%3==0`` key gets a +100.00 price bump (*changed*).
    One co-partitioned full-outer join (operators/cdc.py:snapshot_diff)
    then a row-local CASE — null-safe column compares, no digest, so a
    hash collision can never mask a change."""
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 7 != 3).select(
        "o_orderkey",
        _cents("o_totalprice").alias("price_c"),
        F.col("o_orderpriority").alias("priority"),
    )
    new = orders.filter(F.col("o_orderkey") % 5 != 2).select(
        "o_orderkey",
        (
            _cents("o_totalprice")
            + F.when(F.col("o_orderkey") % 3 == 0, 10000).otherwise(0)
        ).alias("price_c"),
        F.col("o_orderpriority").alias("priority"),
    )
    return (
        snapshot_diff(old, new, "o_orderkey", ["price_c", "priority"])
        .filter(F.col("status") != "unchanged")
        .select("o_orderkey", "status", "old_price_c", "new_price_c")
        .orderBy("o_orderkey")
    )


@query(
    "cdc_merge_apply",
    oracle=f"""
    WITH base AS (
        SELECT c_custkey,
               c_name AS name,
               CAST(c_nationkey AS BIGINT) AS nation,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS bal_c,
               c_mktsegment AS segment
        FROM customer
    ),
    changes AS (
        SELECT CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 1000000
                    ELSE o_custkey END AS c_custkey,
               CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
               o_orderkey AS seq,
               'cust#' || CAST(CASE WHEN o_orderkey % 13 = 0
                                    THEN o_custkey + 1000000
                                    ELSE o_custkey END AS VARCHAR) AS name,
               CAST(o_orderkey % 25 AS BIGINT) AS nation,
               {_CENTS} AS bal_c,
               o_orderpriority AS segment
        FROM orders
    ),
    latest AS (
        SELECT * FROM (
            SELECT c_custkey, op, name, nation, bal_c, segment,
                   ROW_NUMBER() OVER (PARTITION BY c_custkey
                                      ORDER BY seq DESC, op DESC) AS rn
            FROM changes) t
        WHERE rn = 1
    )
    SELECT COALESCE(b.c_custkey, l.c_custkey) AS c_custkey,
           CASE WHEN l.op = 'U' THEN l.name ELSE b.name END AS name,
           CASE WHEN l.op = 'U' THEN l.nation ELSE b.nation END AS nation,
           CASE WHEN l.op = 'U' THEN l.bal_c ELSE b.bal_c END AS bal_c,
           CASE WHEN l.op = 'U' THEN l.segment ELSE b.segment END AS segment
    FROM base b FULL OUTER JOIN latest l ON b.c_custkey = l.c_custkey
    WHERE l.op IS NULL OR l.op <> 'D'
    ORDER BY c_custkey
    """,
)
def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE: apply an order-derived changelog onto the
    ``customer`` snapshot. Each order is a change event on its
    customer (op = D every 10th order, else upsert; ``%13`` orders
    target brand-new +1000000 keys so inserts are exercised alongside
    updates and deletes); per key only the max-seq change applies.
    Plan (operators/cdc.py:merge_apply): latest-change election rides
    ONE window on the key shuffle, the apply is a full outer join
    reusing the same partitioning — Delta/Iceberg MERGE semantics from
    plain Catalyst-planned joins."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_name").alias("name"),
        F.col("c_nationkey").cast("long").alias("nation"),
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("bal_c"),
        F.col("c_mktsegment").alias("segment"),
    )
    orders = load_table(spark, sf_dir, "orders")
    key = F.when(
        F.col("o_orderkey") % 13 == 0, F.col("o_custkey") + 1000000
    ).otherwise(F.col("o_custkey"))
    changes = orders.select(
        key.alias("c_custkey"),
        F.when(F.col("o_orderkey") % 10 == 0, "D").otherwise("U").alias("op"),
        F.col("o_orderkey").alias("seq"),
        F.concat(F.lit("cust#"), key.cast("string")).alias("name"),
        (F.col("o_orderkey") % 25).cast("long").alias("nation"),
        _cents("o_totalprice").alias("bal_c"),
        F.col("o_orderpriority").alias("segment"),
    )
    return merge_apply(cust, changes, "c_custkey").orderBy("c_custkey")


@query(
    "cdc_table_checksum",
    headline=True,
    oracle=f"""
    WITH rows_a AS (
        SELECT o_orderkey % 64 AS bucket,
               ('0x' || substring(md5(
                   CAST(o_orderkey AS VARCHAR) || '|' ||
                   CAST(o_custkey AS VARCHAR) || '|' ||
                   o_orderstatus || '|' ||
                   CAST({_CENTS} AS VARCHAR)), 1, 8))::BIGINT AS d
        FROM orders
    ),
    rows_b AS (
        SELECT o_orderkey % 64 AS bucket,
               ('0x' || substring(md5(
                   CAST(o_orderkey AS VARCHAR) || '|' ||
                   CAST(o_custkey AS VARCHAR) || '|' ||
                   o_orderstatus || '|' ||
                   CAST({_CENTS}
                        + CASE WHEN o_orderkey % 1000 = 7 THEN 1 ELSE 0 END
                        AS VARCHAR)), 1, 8))::BIGINT AS d
        FROM orders WHERE o_orderkey % 2000 <> 11
    ),
    a AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows_a,
                 CAST(SUM(d) AS BIGINT) AS checksum_a
          FROM rows_a GROUP BY bucket),
    b AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows_b,
                 CAST(SUM(d) AS BIGINT) AS checksum_b
          FROM rows_b GROUP BY bucket)
    SELECT COALESCE(a.bucket, b.bucket) AS bucket,
           a.n_rows_a, b.n_rows_b, a.checksum_a, b.checksum_b,
           (a.n_rows_a = b.n_rows_b AND a.checksum_a = b.checksum_b)
             AS match
    FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
    ORDER BY bucket
    """,
)
def cdc_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replica reconciliation without moving rows: per-bucket
    (key % 64) order-independent checksums of two ``orders`` replicas
    — replica B silently drifts (+1 cent on every ``%1000==7`` key,
    rows missing at ``%2000==11``) and the bucket join localizes the
    damage. Each side is ONE scan + an algebraic SUM/COUNT with
    map-side combine: the shuffle carries 64 rows, not the table —
    the only shape under which you can checksum 100 TB nightly
    (operators/cdc.py:table_checksum)."""
    orders = load_table(spark, sf_dir, "orders")

    def digest(price_c: F.Column) -> F.Column:
        return row_digest(
            [
                F.col("o_orderkey").cast("string"),
                F.col("o_custkey").cast("string"),
                F.col("o_orderstatus"),
                price_c.cast("string"),
            ]
        )

    bucket = F.col("o_orderkey") % 64
    a = table_checksum(orders, digest(_cents("o_totalprice")), bucket)
    drift = _cents("o_totalprice") + F.when(
        F.col("o_orderkey") % 1000 == 7, 1
    ).otherwise(0)
    b = table_checksum(
        orders.filter(F.col("o_orderkey") % 2000 != 11), digest(drift), bucket
    )
    a = a.select(
        "bucket",
        F.col("n_rows").alias("n_rows_a"),
        F.col("checksum").alias("checksum_a"),
    )
    b = b.select(
        "bucket",
        F.col("n_rows").alias("n_rows_b"),
        F.col("checksum").alias("checksum_b"),
    )
    joined = a.join(b, "bucket", "full_outer")
    return joined.select(
        "bucket",
        "n_rows_a",
        "n_rows_b",
        "checksum_a",
        "checksum_b",
        (
            (F.col("n_rows_a") == F.col("n_rows_b"))
            & (F.col("checksum_a") == F.col("checksum_b"))
        ).alias("match"),
    ).orderBy("bucket")


@query(
    "cdc_roundtrip_reconcile",
    oracle=f"""
    SELECT CASE WHEN o_orderkey % 5 <> 2 AND o_orderkey % 7 = 3
                  THEN 'removed'
                WHEN o_orderkey % 5 = 2 THEN 'added'
                WHEN o_orderkey % 5 <> 2 AND o_orderkey % 3 = 0
                  THEN 'changed'
                ELSE 'unchanged' END AS status,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    GROUP BY 1 ORDER BY status
    """,
)
def cdc_roundtrip_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end lakehouse CDC cycle, physically on disk: snapshot v1
    (orders minus the %5==2 keys) is WRITTEN to parquet; a changelog
    (deletes for %7==3, inserts for the held-out %5==2 keys, +100.00
    updates for %3==0) is applied with ``merge_apply`` and v2 is
    WRITTEN; both files are read back and ``snapshot_diff`` reconciles
    them. The per-status key counts and key checksums must equal what
    the oracle derives PURELY ARITHMETICALLY from the residue classes
    — any row lost or mangled through write→merge→write→diff shifts a
    checksum. This is the operators composing as a pipeline (the way
    a nightly job actually chains them), not three isolated queries."""
    from etl_lens_spark.sources import sinks

    orders = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    snap = orders.select(
        "o_orderkey",
        _cents("o_totalprice").alias("price_c"),
        F.col("o_orderpriority").alias("priority"),
    )
    v1 = snap.filter(key % 5 != 2)
    v1_path = sinks.scratch_path("cdc_v1_orders")
    v1.write.mode("overwrite").parquet(v1_path)

    ch = (
        snap.withColumn(
            "op",
            F.when((key % 5 != 2) & (key % 7 == 3), "D")
            .when(key % 5 == 2, "U")
            .when((key % 5 != 2) & (key % 3 == 0), "U")
            .otherwise(F.lit(None)),
        )
        .filter(F.col("op").isNotNull())
        .select(
            "o_orderkey",
            "op",
            key.alias("seq"),
            F.when(
                (key % 5 != 2) & (key % 3 == 0),
                F.col("price_c") + 10000,
            )
            .otherwise(F.col("price_c"))
            .alias("price_c"),
            "priority",
        )
    )
    v1_back = spark.read.parquet(v1_path)
    v2 = merge_apply(v1_back, ch, "o_orderkey")
    v2_path = sinks.scratch_path("cdc_v2_orders")
    v2.write.mode("overwrite").parquet(v2_path)

    diff = snapshot_diff(
        spark.read.parquet(v1_path),
        spark.read.parquet(v2_path),
        "o_orderkey",
        ["price_c", "priority"],
    )
    return (
        diff.groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
        .orderBy("status")
    )


@query(
    "cdc_time_travel_states",
    oracle=f"""
    WITH ch AS (
        SELECT o_custkey AS k, o_orderkey AS seq,
               CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
               {_CENTS} AS bal_c
        FROM orders
    ),
    points AS (SELECT CAST(unnest([3000, 9000, 15000]) AS BIGINT) AS tx),
    latest AS (
        SELECT p.tx, c.k, c.op, c.bal_c,
               ROW_NUMBER() OVER (PARTITION BY p.tx, c.k
                                  ORDER BY c.seq DESC) AS rn
        FROM points p JOIN ch c ON c.seq < p.tx
    )
    SELECT tx,
           CAST(COUNT(*) AS BIGINT) AS n_live,
           CAST(SUM(k) AS BIGINT) AS key_sum,
           CAST(SUM(bal_c) AS BIGINT) AS bal_sum_c
    FROM latest WHERE rn = 1 AND op <> 'D'
    GROUP BY tx ORDER BY tx
    """,
)
def cdc_time_travel_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transaction-time travel WITHOUT a table format: the changelog
    (orders as upserts/deletes on their customer, seq = orderkey)
    reconstructs the keyed table AS OF three transaction points —
    latest-change-wins election per (point, key), deletes erased —
    and each state is summarized by live-row count and key/balance
    checksums. One changelog scan serves all three points (the points
    table band-joins the log); this is exactly how Delta/Iceberg
    VERSION AS OF works underneath, expressed as plain Catalyst
    operators on the raw log."""
    orders = load_table(spark, sf_dir, "orders")
    ch = orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 10 == 0, "D").otherwise("U").alias("op"),
        _cents("o_totalprice").alias("bal_c"),
    )
    points = spark.createDataFrame([(3000,), (9000,), (15000,)], "tx long")
    from pyspark.sql import Window

    joined = F.broadcast(points).join(ch, ch.seq < points.tx)
    w = Window.partitionBy("tx", "k").orderBy(F.desc("seq"))
    latest = joined.withColumn("rn", F.row_number().over(w)).filter(
        (F.col("rn") == 1) & (F.col("op") != "D")
    )
    return (
        latest.groupBy("tx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_live"),
            F.sum("k").cast("long").alias("key_sum"),
            F.sum("bal_c").cast("long").alias("bal_sum_c"),
        )
        .orderBy("tx")
    )
