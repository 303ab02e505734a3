"""SimHash near-duplicate detection.

64-bit SimHash: each token votes +1/-1 per bit position according to
its 64-bit hash; the signature bit is the sign of the vote sum. Docs
within a small Hamming distance are near-duplicates.

Spark-first: the 64 vote counters are an array<int> folded over the
token array with ``F.aggregate`` + ``F.zip_with`` — row-local, no
explode, no Python, inside codegen. Candidate generation reuses the
LSH banding idea: split the 64 bits into 4 x 16-bit chunks; any pair
within Hamming distance 3 shares at least one exact chunk (pigeonhole)
— so the only shuffle is an equi-join on (chunk_id, chunk_value).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_lens_spark.dedup.exact import normalized_text

BITS = 64


def _bit_votes(token_hash: Column) -> Column:
    """array<int> of +1/-1 votes, one per bit of the token's hash.
    Literal-unrolled (shiftright needs a literal shift count); still a
    single codegen'd array expression."""
    return F.array(
        *[
            F.when(
                F.shiftright(token_hash, i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
            for i in range(BITS)
        ]
    )


def add_simhash(
    df: DataFrame, text_col: str = "text", out_col: str = "simhash_bits"
) -> DataFrame:
    """SimHash signature as array<int> of 64 bits (1/0).

    Kept as a bit array rather than packed into a long: array form
    makes Hamming distance a zip_with/filter expression and avoids
    sign pitfalls of 64-bit packing. Packing would save ~56 bytes/row
    — worth it only when the signature is persisted.
    """
    tokens = F.array_distinct(
        F.split(normalized_text(F.col(text_col)), " ")
    )
    zero = F.array_repeat(F.lit(0), BITS)
    votes = F.aggregate(
        tokens,
        zero,
        lambda acc, t: F.zip_with(
            acc, _bit_votes(F.xxhash64(t)), lambda a, v: a + v
        ),
    )
    bits = F.transform(votes, lambda v: F.when(v > 0, 1).otherwise(0))
    return df.withColumn(out_col, bits)


def hamming(a: Column, b: Column) -> Column:
    return F.size(
        F.filter(F.zip_with(a, b, lambda x, y: x != y), lambda d: d)
    )


def simhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    bits_col: str = "simhash_bits",
    chunks: int = 4,
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs (doc_a, doc_b, hamming_dist) with
    hamming <= max_hamming, found via chunk-equality blocking.

    With 4 chunks, any pair at distance <= 3 must agree on one whole
    chunk (pigeonhole) — recall is exact for that radius, no
    cross-bucket misses.
    """
    chunk_size = BITS // chunks
    chunked = df.select(
        F.col(id_col).alias("__id"),
        F.col(bits_col).alias("__bits"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(chunks - 1)),
                lambda c: F.struct(
                    c.alias("chunk_id"),
                    F.concat_ws(
                        "",
                        F.transform(
                            F.slice(
                                F.col(bits_col),
                                (c * chunk_size) + 1,
                                chunk_size,
                            ),
                            lambda x: x.cast("string"),
                        ),
                    ).alias("chunk_val"),
                ),
            )
        ).alias("ch"),
    ).select("__id", "__bits", "ch.chunk_id", "ch.chunk_val")

    sizes = chunked.groupBy("chunk_id", "chunk_val").agg(
        F.count(F.lit(1)).alias("__bn")
    )
    chunked = chunked.join(
        sizes.filter(F.col("__bn") <= max_bucket), ["chunk_id", "chunk_val"]
    ).drop("__bn")

    left = chunked.select(
        "chunk_id",
        "chunk_val",
        F.col("__id").alias("doc_a"),
        F.col("__bits").alias("bits_a"),
    )
    right = chunked.select(
        "chunk_id",
        "chunk_val",
        F.col("__id").alias("doc_b"),
        F.col("__bits").alias("bits_b"),
    )
    return (
        left.join(right, ["chunk_id", "chunk_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .select(
            "doc_a",
            "doc_b",
            hamming(F.col("bits_a"), F.col("bits_b")).cast("long").alias(
                "hamming_dist"
            ),
        )
        .filter(F.col("hamming_dist") <= max_hamming)
    )
