"""Embedding similarity search: exact cosine top-k, near-dup pairs, and
an LSH-bucketed approximate variant.

All dot products are built-in column algebra (``zip_with`` +
``aggregate`` → JVM codegen, sequential sum order identical to the SQL
oracle's ``list_dot_product``); no Python UDFs.

Scale notes (100 TB): brute-force top-k is O(|Q|·|N|) — fine when the
query side is small enough to broadcast (the plan below broadcasts it
explicitly, so the corpus is scanned exactly once with no shuffle).
The corpus-×-corpus near-dup search uses blocking (label, or the
random-hyperplane buckets of :func:`ann_lsh_buckets`) so the self-join
keys on buckets rather than exploding quadratically; AQE splits skewed
buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bb_bigdata_log_tools_spark.functions.hashing import MERSENNE_31, permutation_params


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in declared array order (matches SQL list_dot_product)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a)) / F.sqrt(dot(b, b))


def dedup_embedding(
    embeddings: DataFrame,
    threshold: float = 0.3,
    block_col: str = "label",
) -> DataFrame:
    """Near-dup vector pairs: cosine ≥ τ within blocking-key groups.

    Blocking on ``label`` (or any coarse cluster id / LSH bucket) keeps
    the self-join keyed — the 100 TB alternative to an all-pairs cross
    join. Pairs are emitted once (vec_id1 < vec_id2).
    """
    a = embeddings.alias("a")
    b = embeddings.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id1"),
            F.col("b.vec_id").alias("vec_id2"),
            F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .orderBy("vec_id1", "vec_id2")
    )


def ann_topk_bruteforce(
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: the first ``n_queries`` vec_ids against the
    whole corpus.

    The query side is broadcast, so the physical plan is one corpus scan
    + BroadcastNestedLoopJoin + per-query top-k window — no corpus
    shuffle. This is the correctness baseline for any ANN variant.
    """
    queries = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        embeddings.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            F.round(cosine(F.col("q_emb"), F.col("embedding")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("q_id", "rank")
    )


def ann_lsh_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    seed: int = 2024,
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector.

    Hyperplane h_j has pseudo-random ±1 components derived from the
    deterministic LCG parameter stream (component i of plane j is +1
    iff lcg(j*dim+i) is odd) — reproducible in SQL with the same
    literals. bucket = Σ_j [sign(v·h_j) > 0]·2^j.
    """
    params = permutation_params(n_planes * dim, seed)
    bucket = F.lit(0).cast("long")
    for j in range(n_planes):
        signs = [1 if params[j * dim + i][0] % 2 == 1 else -1 for i in range(dim)]
        proj = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(float(s)) for s in signs]),
                lambda x, s: x.cast("double") * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
    return embeddings.select("vec_id", "label", "embedding", bucket.alias("bucket"))


def ann_topk_lsh(
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 10,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.

    Scale path for :func:`ann_topk_bruteforce` — the corpus joins on
    ``bucket`` instead of crossing with every query. Recall is tunable
    via n_planes (fewer planes → bigger buckets → higher recall).
    """
    bucketed = ann_lsh_buckets(embeddings, n_planes)
    queries = bucketed.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    scored = bucketed.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("q_id")),
    ).select(
        "q_id",
        F.col("vec_id").alias("n_id"),
        F.round(cosine(F.col("q_emb"), F.col("embedding")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("q_id", "rank")
    )
