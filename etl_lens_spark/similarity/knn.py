"""Similarity search over embedding columns (array<float>).

Two plans, one semantic:

- ``brute_force_topk`` — exact cosine top-k: broadcast the query set,
  score every (query, corpus) pair with JVM-side array expressions,
  per-query top-k via window group-limit. Exact; the baseline and the
  oracle. Scales linearly in corpus x queries — right whenever
  |queries| is small (the common batch-scoring shape).
- ``lsh_topk`` — sign-random-projection LSH: bucket vectors by the
  sign pattern of h fixed hyperplane projections, score only
  within-bucket pairs. Sub-linear candidate set; recall tunable via
  number of bits / multi-probe. The 100 TB path when both sides are
  large.

All dot products run as ``F.aggregate``/``F.zip_with`` over
array<double> — sequential, deterministic, no Python. (A Pandas-UDF
matrix-multiply variant is the next optimization when batch shapes
justify Arrow transfer; at 64 dims the JVM expression path wins.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential (index-order) dot product — bit-identical across
    engines that fold left-to-right, which makes it oracle-safe."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    ad, bd = _as_double(a), _as_double(b)
    return dot(ad, bd) / (norm(ad) * norm(bd))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    max_queries: int = 10_000,
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Plan: broadcast(queries) x corpus (no shuffle of the corpus), then
    rank per query. The rank filter compiles to WindowGroupLimit —
    each partition keeps only k rows per query before the final
    exchange, so the shuffle is O(queries x k), not O(pairs).

    ``max_queries`` guards the O(corpus × queries) scan: exact scoring
    is right when the query batch is small; a large query set fails
    fast (one cheap count job) instead of silently launching the
    quadratic plan — switch to ``lsh_topk``/IVF or raise the cap
    explicitly.

    Norms are precomputed per side BEFORE the join — same arithmetic
    (so still oracle-exact), but the O(pairs) stage does one dot
    product instead of three. Array HOF expressions are interpreted
    (outside codegen), so per-pair work is the term that matters.
    """
    from pyspark.sql import Window

    # limit-probe: counts at most max_queries+1 rows (early-out scan),
    # so the guard costs O(max_queries) regardless of input size
    if queries.limit(max_queries + 1).count() > max_queries:
        raise ValueError(
            f"brute_force_topk scans corpus × queries and got more than "
            f"max_queries={max_queries} queries; use lsh_topk/ivf_topk "
            "(the blocked scale paths) or pass a larger max_queries "
            "explicitly"
        )
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        _as_double(F.col(vec_col)).alias("__qvec"),
    ).withColumn("__qnorm", norm(F.col("__qvec")))
    scored = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cvec"),
    ).withColumn("__cnorm", norm(F.col("__cvec"))).join(
        F.broadcast(q), F.col("neighbor_id") != F.col(query_id_col)
    )
    scored = scored.withColumn(
        "cos_sim",
        dot(F.col("__cvec"), F.col("__qvec"))
        / (F.col("__cnorm") * F.col("__qnorm")),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank_n", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_n") <= k)
        .select(query_id_col, "neighbor_id", "rank_n", "cos_sim")
    )


def _srp_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: one bit per hyperplane.
    Planes are fixed literal arrays — broadcast by value into codegen,
    no side channel."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(p) for p in plane])) >= 0, 1).otherwise(0)
        for plane in planes
    ]
    return F.concat_ws("", *[b.cast("string") for b in bits])


def make_planes(dim: int, n_bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic hyperplanes (seeded numpy normal)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).tolist()


def _probe_buckets(vec: Column, planes: list[list[float]], probes: int) -> Column:
    """Multi-probe bucket list for a query vector: the exact SRP
    bucket plus the ``probes - 1`` single-bit-flip buckets most likely
    to hold near neighbors — the flips are ordered by |projection|
    ascending (the hyperplanes the vector sits closest to, i.e. where
    a true neighbor most plausibly landed on the other side). Standard
    multi-probe LSH: recall of many-tables at the cost of one table.
    """
    projs = [
        dot(vec, F.array(*[F.lit(x) for x in plane])) for plane in planes
    ]
    bits = F.array(
        *[F.when(p >= 0, 1).otherwise(0) for p in projs]
    )
    exact = F.concat_ws(
        "", F.transform(bits, lambda x: x.cast("string"))
    )
    if probes <= 1:
        return F.array(exact)
    # flip order: ascending |projection|, index tiebreak — fully
    # deterministic, computed inside codegen (planes are literals)
    flip_order = F.array_sort(
        F.array(
            *[
                F.struct(F.abs(p).alias("a"), F.lit(i).alias("i"))
                for i, p in enumerate(projs)
            ]
        )
    )
    def _flip_at(j: int) -> Column:
        return F.concat_ws(
            "",
            F.transform(
                bits,
                lambda x, bi: F.when(bi == flip_order[j]["i"], 1 - x)
                .otherwise(x)
                .cast("string"),
            ),
        )

    flipped = [_flip_at(j) for j in range(min(probes - 1, len(planes)))]
    return F.array(exact, *flipped)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    seed: int = 42,
    probes: int = 1,
) -> DataFrame:
    """Approximate top-k: score only pairs whose SRP bucket matches.

    One equi-join shuffle on the bucket key instead of a cross
    product; with n_bits=8 the candidate set is ~1/256 of the corpus
    per query (expected). ``probes > 1`` enables multi-probe: each
    query also searches the ``probes - 1`` most promising flip-1
    buckets (closest hyperplanes first), multiplying expected
    candidates by ``probes`` but lifting recall far more than adding
    ``log2(probes)`` bits would lose. The corpus side is never
    duplicated — only the (small, broadcast) query side fans out.
    Build-once composition of srp_bucket_index → lsh_probe_topk.
    """
    planes = make_planes(dim, n_bits, seed)
    return lsh_probe_topk(
        srp_bucket_index(corpus, planes, id_col, vec_col),
        queries,
        planes,
        k=k,
        probes=probes,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
    )


def srp_bucket_index(
    corpus: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The SRP index rows (id, vector, bucket) — what a MAINTAINED
    bucket-index lake table stores (sim_ann_incremental_cdf's SRP
    side). Planes are immutable for the index's lifetime, so unlike
    IVF there is no drift dial at all: inserts append their rows,
    deletes anti-join out, and a stored bucket can never go stale."""
    return corpus.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias(vec_col)
    ).withColumn("bucket", _srp_bits(F.col(vec_col), planes))


def lsh_candidates(
    bucket_index: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
) -> DataFrame:
    """The scored candidate set BEFORE ranking — (qid, neighbor_id,
    cos_sim) for every index row sharing a probed bucket with a
    query. Exposed so consumers can measure the candidate BUDGET,
    the quantity SRP exists to bound (sim_srp_incremental_cdf pins
    it against the brute-force pair count)."""
    c = bucket_index.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cvec"),
        F.col("bucket").alias("__bucket"),
    ).withColumn("__cnorm", norm(F.col("__cvec")))
    q = (
        queries.select(
            F.col(id_col).alias(query_id_col),
            _as_double(F.col(vec_col)).alias("__qvec"),
        )
        .withColumn(
            "__bucket",
            F.explode(_probe_buckets(F.col("__qvec"), planes, probes)),
        )
        .withColumn("__qnorm", norm(F.col("__qvec")))
    )
    return (
        c.join(F.broadcast(q), "__bucket")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn(
            "cos_sim",
            dot(F.col("__cvec"), F.col("__qvec"))
            / (F.col("__cnorm") * F.col("__qnorm")),
        )
        .select(query_id_col, "neighbor_id", "cos_sim")
    )


def lsh_probe_topk(
    bucket_index: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 5,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
) -> DataFrame:
    """The probe/rescore half of lsh_topk, factored so a MAINTAINED
    bucket-index table serves queries without re-hashing the corpus.
    One definition shared with the build-once path, so the two
    cannot score differently."""
    from pyspark.sql import Window

    scored = lsh_candidates(
        bucket_index,
        queries,
        planes,
        probes=probes,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank_n", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_n") <= k)
        .select(query_id_col, "neighbor_id", "rank_n", "cos_sim")
    )


def srp_multitable_index(
    corpus: DataFrame,
    planes_list: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The MULTI-TABLE SRP index rows (id, vector, b0..b{L-1}) — one
    bucket column per independent hyperplane table, all hashed in
    ONE pass over the corpus (the sim_ann_lsh_multitable sweep
    discipline), which is exactly what a maintained lake table
    stores: an appended vector computes its L buckets from the delta
    alone, a deleted one anti-joins out, and no geometry ever goes
    stale (planes immutable, like the single-table index)."""
    out = corpus.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias(vec_col)
    )
    for t, planes in enumerate(planes_list):
        out = out.withColumn(
            f"b{t}", _srp_bits(F.col(vec_col), planes)
        )
    return out


def multitable_candidates(
    index: DataFrame,
    queries: DataFrame,
    planes_list: list[list[list[float]]],
    probes: int = 5,
    n_tables: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
) -> DataFrame:
    """The DEDUPED scored candidate set (qid, neighbor_id, cos_sim)
    from a multi-table SRP index: per-table candidate sets union,
    (query, neighbor) pairs deduplicate BEFORE scoring. This is the
    per-L unit of the operating-curve sweep (sim_ann_lsh_multitable
    counts exactly these rows as its honest scan cost) AND the
    scoring half of multitable_probe_topk — one definition, so the
    sweep's recorded curve and the maintained-index serving path
    cannot drift. ``n_tables`` probes a prefix of the tables (the
    L-axis); default all."""
    L = n_tables if n_tables is not None else len(planes_list)
    if L < 1 or L > len(planes_list):
        raise ValueError(
            f"n_tables={L} out of range for {len(planes_list)} "
            "hyperplane tables"
        )
    keep_norm = "__cnorm" in index.columns
    c = index.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cvec"),
        *[F.col(f"b{t}") for t in range(L)],
        *(["__cnorm"] if keep_norm else []),
    )
    if not keep_norm:
        # a sweep that probes the same index many times materializes
        # __cnorm into its checkpoint; a one-shot probe computes it
        c = c.withColumn("__cnorm", norm(F.col("__cvec")))
    qbase = queries.select(
        F.col(id_col).alias(query_id_col),
        _as_double(F.col(vec_col)).alias("__qvec"),
    ).withColumn("__qnorm", norm(F.col("__qvec")))
    parts = []
    for t in range(L):
        qt = qbase.withColumn(
            "__b",
            F.explode(
                _probe_buckets(F.col("__qvec"), planes_list[t], probes)
            ),
        )
        parts.append(
            c.join(F.broadcast(qt), c[f"b{t}"] == qt["__b"])
            .filter(F.col("neighbor_id") != F.col(query_id_col))
            .select(
                query_id_col,
                "neighbor_id",
                "__qvec",
                "__qnorm",
                "__cvec",
                "__cnorm",
            )
        )
    cands = parts[0]
    for p in parts[1:]:
        cands = cands.unionByName(p)
    return (
        cands.dropDuplicates([query_id_col, "neighbor_id"])
        .withColumn(
            "cos_sim",
            dot(F.col("__cvec"), F.col("__qvec"))
            / (F.col("__cnorm") * F.col("__qnorm")),
        )
        .select(query_id_col, "neighbor_id", "cos_sim")
    )


def multitable_probe_topk(
    index: DataFrame,
    queries: DataFrame,
    planes_list: list[list[list[float]]],
    k: int = 10,
    probes: int = 5,
    n_tables: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Top-k from a multi-table SRP index (srp_multitable_index
    rows): rank multitable_candidates by exact cosine. One
    definition shared by the build-once sweep and the maintained
    lake-table path, so the two cannot score differently.
    ``candidates`` lets a caller that already materialized the
    scored candidate frame (the operating-curve sweep counts it as
    its honest scan cost) rank it directly instead of probing and
    scoring a second time; it must be a multitable_candidates result
    for the SAME (index, queries, planes, probes, n_tables)."""
    from pyspark.sql import Window

    scored = (
        candidates
        if candidates is not None
        else multitable_candidates(
            index,
            queries,
            planes_list,
            probes=probes,
            n_tables=n_tables,
            id_col=id_col,
            vec_col=vec_col,
            query_id_col=query_id_col,
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank_n", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_n") <= k)
        .select(query_id_col, "neighbor_id", "rank_n", "cos_sim")
    )
