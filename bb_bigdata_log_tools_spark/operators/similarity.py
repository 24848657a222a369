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

from bb_bigdata_log_tools_spark.functions.hashing import permutation_params
from bb_bigdata_log_tools_spark.operators.util import small_sort


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in declared array order (matches SQL list_dot_product).

    NOTE: array higher-order functions are interpreted (no codegen) —
    fine for one-off per-row norms, but pair-join hot loops should use
    the wide-column form below instead.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a)) / F.sqrt(dot(b, b))


# Above this dimension the widened-scalar-column strategy is abandoned
# for the array form. Widening builds O(dim) expression nodes per dot
# product and instantiates them at every plan site; Catalyst's
# transformDown recursion and analyzer memory both grow with plan size,
# and past a few hundred columns plan *construction* dominates runtime
# (the same cliff class that OOMed the round-2 IVF literal plan). At
# realistic embedding dims (384-1024) the interpreted-but-plan-small
# array path wins; measured crossover on local[32] sits well above 128.
WIDEN_DIM_CLIFF = 128


def widen(df: DataFrame, dim: int, keep: list[str]) -> DataFrame:
    """Explode an embedding array into ``dim`` scalar double columns
    e0..e{dim-1} plus the row norm.

    Scalar columns keep the dot-product arithmetic inside whole-stage
    codegen (array lambda functions are interpreted in Spark), which is
    ~10× on the quadratic pair stage. The left-assoc sum below matches
    the sequential order of a SQL ``list_dot_product``.
    """
    # selectExpr/F.expr: the whole widened projection parses JVM-side
    # from strings instead of ~6 py4j gateway hops per dimension — at
    # dim=64 the chained-Column form cost ~0.3-0.5 s of pure driver
    # latency per call site (r12 profiling); the parsed trees
    # (GetArrayItem, cast, left-assoc Add of Multiply) are identical,
    # so values are bit-for-bit unchanged.
    out = df.selectExpr(
        *keep, *[f"cast(embedding[{i}] as double) as e{i}" for i in range(dim)]
    )
    norm = " + ".join(f"e{i} * e{i}" for i in range(dim))
    return out.withColumn("norm", F.expr(f"sqrt({norm})"))


def wide_dot(prefix_a: str, prefix_b: str, dim: int) -> Column:
    """Left-assoc Σ a.eᵢ·b.eᵢ over widened columns (codegen-friendly;
    single-parse SQL string — see :func:`widen` for the py4j rationale)."""
    return F.expr(
        " + ".join(f"{prefix_a}.e{i} * {prefix_b}.e{i}" for i in range(dim))
    )


def prep_embeddings(df: DataFrame, dim: int, keep: list[str]) -> DataFrame:
    """Dim-aware projection: widened scalars below :data:`WIDEN_DIM_CLIFF`
    (codegen hot path), else the raw array plus a precomputed norm
    (plan stays O(1) nodes regardless of dim).

    Both paths sum left-assoc in array order, so cosine values are
    bit-identical between strategies and to the SQL oracle.
    """
    if dim <= WIDEN_DIM_CLIFF:
        return widen(df, dim, keep)
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return df.select(*[F.col(c) for c in keep], emb.alias("embedding")).withColumn(
        "norm", F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    )


def pair_dot(prefix_a: str, prefix_b: str, dim: int) -> Column:
    """Σ aᵢ·bᵢ between two :func:`prep_embeddings` sides, matching the
    strategy that prepped them."""
    if dim <= WIDEN_DIM_CLIFF:
        return wide_dot(prefix_a, prefix_b, dim)
    return dot(F.col(f"{prefix_a}.embedding"), F.col(f"{prefix_b}.embedding"))


def dedup_embedding(
    embeddings: DataFrame,
    threshold: float = 0.3,
    block_col: str = "label",
    dim: int = 64,
) -> DataFrame:
    """Near-dup vector pairs: cosine ≥ τ within blocking-key groups.

    Blocking on ``label`` (or any coarse cluster id / LSH bucket) keeps
    the self-join keyed — the 100 TB alternative to an all-pairs cross
    join. Pairs are emitted once (vec_id1 < vec_id2).
    """
    # Widen to scalar columns (codegen) and hoist per-row norms before
    # the join: the pair expression is one fused 64-term multiply-add +
    # two divisions — ~10× over array-lambda dots, identical arithmetic.
    #
    # SALTING: a blocking key like ``label`` has few distinct values, so
    # a plain equi-join caps parallelism at |labels| tasks at ANY scale
    # (and AQE coalesces the tiny shuffle to one). Salt the left side by
    # vec_id and replicate the right side across the salt domain — the
    # pair work then spreads over |labels|·S partitions with each pair
    # produced exactly once.
    # Explicit repartition(n, keys) on both inputs: AQE honors a
    # user-specified partition count (it would otherwise coalesce this
    # small shuffle to one partition, blind to the join's quadratic
    # output expansion), and the join reuses the partitioning with no
    # extra exchange.
    salts = 8
    n_part = embeddings.sparkSession.sparkContext.defaultParallelism
    wide = prep_embeddings(embeddings, dim, ["vec_id", block_col])
    a = (
        wide.withColumn("salt", F.pmod(F.col("vec_id"), F.lit(salts)))
        .repartition(n_part, block_col, "salt")
        .alias("a")
    )
    b = (
        wide.withColumn("salt", F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(salts - 1).cast("long"))
        ))
        .repartition(n_part, block_col, "salt")
        .alias("b")
    )
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id1"),
            F.col("b.vec_id").alias("vec_id2"),
            F.round(
                pair_dot("a", "b", dim) / F.col("a.norm") / F.col("b.norm"), 4
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .transform(lambda d: small_sort(d, "vec_id1", "vec_id2"))
    )


def ann_topk_bruteforce(
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 10,
    dim: int = 64,
) -> DataFrame:
    """Exact cosine top-k: the first ``n_queries`` vec_ids against the
    whole corpus.

    The query side is broadcast, so the physical plan is one corpus scan
    + BroadcastNestedLoopJoin + per-query top-k window — no corpus
    shuffle. This is the correctness baseline for any ANN variant.
    """
    wide = prep_embeddings(embeddings, dim, ["vec_id"])
    queries = wide.filter(F.col("vec_id") < n_queries)
    scored = (
        wide.alias("c")
        .join(F.broadcast(queries.alias("q")), F.col("c.vec_id") != F.col("q.vec_id"))
        .select(
            F.col("q.vec_id").alias("q_id"),
            F.col("c.vec_id").alias("n_id"),
            F.round(
                pair_dot("q", "c", dim) / F.col("q.norm") / F.col("c.norm"), 4
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .transform(lambda d: small_sort(d, "q_id", "rank"))
    )


def ann_lsh_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    seed: int = 2024,
    dim: int = 64,
    keep_prep: bool = False,
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector.

    Hyperplane h_j has pseudo-random ±1 components derived from the
    deterministic LCG parameter stream (component i of plane j is +1
    iff lcg(j*dim+i) is odd) — reproducible in SQL with the same
    literals. bucket = Σ_j [sign(v·h_j) > 0]·2^j.

    ``keep_prep=True`` additionally emits the :func:`prep_embeddings`
    columns (widened ``e0..e{dim-1}`` + ``norm`` below the cliff; the
    double-cast array + ``norm`` above it) computed in the SAME
    projection pipeline as the bucket. The bucket-then-re-widen form
    this replaces projected the embedding array twice and cost ~1.8× on
    the bucketed top-k; fused, whole-stage codegen evaluates each
    ``e_i`` once and reuses it for planes, norm, and pair dots.
    """
    params = permutation_params(n_planes * dim, seed)
    if dim <= WIDEN_DIM_CLIFF:
        # Widened scalar projections: each plane's dot product is a
        # signed left-assoc sum of scalar columns — whole-stage codegen,
        # unlike the interpreted zip_with/aggregate HOF form (same
        # arithmetic order: 0.0 + x0·s0 + x1·s1 + ..., and ±1·x is
        # exact, so bucket ids are bit-identical to the SQL oracle's
        # list_dot_product).
        # single-parse SQL strings (see :func:`widen`): the chained
        # Column form here cost n_planes x dim x ~3 py4j hops (~1.5 s
        # at 8x64) of pure driver latency per call. ``0.0D + e0 - e1
        # ...`` parses to the same left-assoc Add/Subtract chain the
        # loop built (IEEE: x + (-y) == x - y), so bucket ids are
        # bit-identical.
        keep = ["vec_id"] if keep_prep else ["vec_id", "label", "embedding"]
        wide = embeddings.selectExpr(
            *keep,
            *[f"cast(embedding[{i}] as double) as e{i}" for i in range(dim)],
        )
        plane_terms = []
        for j in range(n_planes):
            proj = "0.0D" + "".join(
                (" + " if params[j * dim + i][0] % 2 == 1 else " - ") + f"e{i}"
                for i in range(dim)
            )
            plane_terms.append(
                f"cast(case when ({proj}) > 0 then {1 << j} else 0 end as bigint)"
            )
        bucket = F.expr("cast(0 as bigint) + " + " + ".join(plane_terms))
        if not keep_prep:
            return wide.select("vec_id", "label", "embedding", bucket.alias("bucket"))
        norm = " + ".join(f"e{i} * e{i}" for i in range(dim))
        return wide.select(
            "vec_id",
            bucket.alias("bucket"),
            *[f"e{i}" for i in range(dim)],
            F.expr(f"sqrt({norm})").alias("norm"),
        )
    # High-dim path: per-plane ±1 sign vectors as FLAT array literals
    # (depth O(1), no scalar chains) folded with zip_with+aggregate.
    # ±1.0·x is exact and the aggregate sums in array order, so bucket
    # ids match the widened path bit-for-bit.
    def _bucket(emb_col: Column) -> Column:
        bucket = F.lit(0).cast("long")
        for j in range(n_planes):
            signs = F.array(
                *[
                    F.lit(1.0 if params[j * dim + i][0] % 2 == 1 else -1.0)
                    for i in range(dim)
                ]
            )
            proj = F.aggregate(
                F.zip_with(emb_col, signs, lambda x, s: x.cast("double") * s),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(
                F.lit(0)
            ).cast("long")
        return bucket

    if not keep_prep:
        return embeddings.select(
            "vec_id", "label", "embedding", _bucket(F.col("embedding")).alias("bucket")
        )
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = embeddings.select("vec_id", emb_d.alias("embedding"))
    return base.select(
        "vec_id",
        _bucket(F.col("embedding")).alias("bucket"),
        "embedding",
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("norm"),
    )


def ivf_assign(
    embeddings: DataFrame,
    n_cells: int = 8,
    n_probe: int = 1,
    dim: int = 64,
) -> DataFrame:
    """IVF cell assignment: rank every vector's cosine against the
    ``n_cells`` deterministic centroids (the vectors with
    ``vec_id < n_cells`` — a fixed, reproducible codebook; a production
    build would train the codebook with k-means on a sample, which only
    changes the centroid literals, not this plan).

    Returns (vec_id, cell, cell_rank ≤ n_probe). The centroid side is
    a broadcast of ``n_cells`` widened rows, so assignment is ONE
    corpus scan + a per-row argmax window keyed by vec_id — no corpus
    shuffle beyond the window's hash partition on vec_id.
    """
    if n_cells < 1 or n_probe < 1:
        # loud: n_probe=0 silently assigns no cells (empty IVF search
        # reads as "no neighbors"); n_cells=0 has no codebook
        raise ValueError(f"need n_cells >= 1 and n_probe >= 1, got {n_cells}/{n_probe}")
    wide = prep_embeddings(embeddings, dim, ["vec_id"])
    cents = wide.filter(F.col("vec_id") < n_cells)
    scored = (
        wide.alias("v")
        .join(F.broadcast(cents.alias("cen")))
        .select(
            F.col("v.vec_id").alias("vec_id"),
            F.col("cen.vec_id").alias("cell"),
            (pair_dot("v", "cen", dim) / F.col("v.norm") / F.col("cen.norm")).alias(
                "cell_cos"
            ),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cell_cos"), F.asc("cell"))
    return (
        scored.withColumn("cell_rank", F.row_number().over(w))
        .filter(F.col("cell_rank") <= n_probe)
        .select("vec_id", "cell", "cell_rank")
    )


def ann_topk_ivf(
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    dim: int = 64,
) -> DataFrame:
    """IVF-flat approximate top-k: each query searches only the
    ``n_probe`` inverted lists (cells) closest to it; candidates score
    exact cosine.

    Scale shape: the index build is ONE corpus scan — a single
    :func:`ivf_assign` pass at ``n_probe`` ranks serves both sides
    (``cell_rank == 1`` is the corpus cell assignment; ranks ≤ n_probe
    restricted to query ids are the probe lists), halving the
    assignment cost vs assigning twice. The search joins queries to the
    corpus ON the cell id, so the candidate fan-out is |queries| x
    (corpus / n_cells x n_probe) instead of |queries| x corpus — the
    standard recall/throughput trade against
    :func:`ann_topk_bruteforce`. The assignment is materialized via
    ``localCheckpoint`` before re-joining the widened vectors: chaining
    two widened-column joins in one lineage makes Catalyst re-derive
    the 64-column projections per node (the round-1 IVF prototype OOMed
    exactly there); truncating lineage keeps each widened plan
    independent.
    """
    assign = ivf_assign(embeddings, n_cells, n_probe=n_probe, dim=dim).localCheckpoint()
    cells = assign.filter(F.col("cell_rank") == 1).select("vec_id", "cell")
    probes = assign.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), "cell"
    )

    wide = prep_embeddings(embeddings, dim, ["vec_id"])
    corpus = wide.alias("c").join(cells.alias("cl"), F.col("c.vec_id") == F.col("cl.vec_id"))
    queries = wide.alias("q").join(
        F.broadcast(probes.alias("p")), F.col("q.vec_id") == F.col("p.q_id")
    )
    scored = (
        corpus.join(
            F.broadcast(queries),
            (F.col("cl.cell") == F.col("p.cell"))
            & (F.col("c.vec_id") != F.col("q.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("q_id"),
            F.col("c.vec_id").alias("n_id"),
            F.round(
                pair_dot("q", "c", dim) / F.col("q.norm") / F.col("c.norm"), 4
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .transform(lambda d: small_sort(d, "q_id", "rank"))
    )


def ann_topk_lsh(
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.

    Scale path for :func:`ann_topk_bruteforce` — the corpus joins on
    ``bucket`` instead of crossing with every query. Recall is tunable
    via n_planes (fewer planes → bigger buckets → higher recall). The
    per-candidate cosine (the hot |bucket|×|queries| path) runs on
    widened scalar columns — codegen'd fused multiply-adds, same
    arithmetic order as the interpreted array form it replaces. Bucket
    ids, widened columns, and norms come out of ONE fused projection
    (``keep_prep=True``) — no second pass over the embedding array.
    """
    if n_planes < 1:
        # loud: 0 planes puts the whole corpus in one bucket — a
        # silent all-pairs join, not an LSH search
        raise ValueError(f"n_planes must be >= 1, got {n_planes}")
    bucketed = ann_lsh_buckets(embeddings, n_planes, dim=dim, keep_prep=True)
    queries = bucketed.filter(F.col("vec_id") < n_queries)
    scored = (
        bucketed.alias("c")
        .join(
            F.broadcast(queries.alias("q")),
            (F.col("c.bucket") == F.col("q.bucket"))
            & (F.col("c.vec_id") != F.col("q.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("q_id"),
            F.col("c.vec_id").alias("n_id"),
            F.round(
                pair_dot("q", "c", dim) / F.col("q.norm") / F.col("c.norm"), 4
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .transform(lambda d: small_sort(d, "q_id", "rank"))
    )



def embedding_quantize(embeddings: DataFrame) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x|/127,
    q_i = clamp(floor(x_i/scale + 0.5), ±127) — the standard 4×
    memory/bandwidth reduction that makes billion-vector ANN serving
    fit in RAM; scores are computed on int8 with one dequantize per
    vector.

    Output: (vec_id, scale, qvec, max_abs_err) where max_abs_err is the
    per-vector worst reconstruction error |q·scale − x|.

    Determinism note: ``floor(x/scale + 0.5)`` is used instead of
    ``round`` because round's half-even/half-up behavior differs
    between engines while floor is IEEE-exact in both — the oracle
    reproduces qvec bit-for-bit.

    100 TB shape: pure per-row column algebra (array HOFs) — one scan,
    no shuffle; plan size is O(1) in dim (no widening), so any
    embedding dimension is safe.
    """
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    max_abs = F.array_max(F.transform(emb, lambda x: F.abs(x)))
    scale = max_abs / F.lit(127.0)

    def q(x):
        return F.greatest(
            F.lit(-127.0),
            F.least(F.lit(127.0), F.floor(x / scale + F.lit(0.5)).cast("double")),
        )

    qvec = F.when(
        scale == 0, F.transform(emb, lambda x: F.lit(0))
    ).otherwise(F.transform(emb, lambda x: q(x).cast("int")))
    err = F.when(scale == 0, F.lit(0.0)).otherwise(
        F.array_max(F.transform(emb, lambda x: F.abs(q(x) * scale - x)))
    )
    return embeddings.select(
        "vec_id",
        F.round(scale, 6).alias("scale"),
        qvec.alias("qvec"),
        F.round(err, 4).alias("max_abs_err"),
    ).transform(lambda d: small_sort(d, "vec_id"))


def semdedup(
    embeddings: DataFrame,
    threshold: float = 0.3,
    n_cells: int = 8,
    dim: int = 64,
    sort: bool = True,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus into ``n_cells`` IVF cells,
    then flag every vector whose cosine to a LOWER-id vector in the
    same cell reaches ``threshold``. The kept set is the corpus minus
    the flagged rows — one representative survives per within-cell
    near-dup chain (vec_id order stands in for the paper's arbitrary
    tie-break).

    Output: (vec_id, cell, dup_of, max_cos) — one row per REMOVED
    vector, ``dup_of`` the smallest near-duplicate neighbor,
    ``max_cos`` its closest in-cell similarity.

    100 TB shape: the cell assignment is one broadcast-centroid scan
    (:func:`ivf_assign`, localCheckpointed so the self-join below
    does not duplicate the window subtree — the round-2 Catalyst
    lesson); the quadratic cosine work is confined within cells and
    salted exactly like :func:`dedup_embedding`, so pair generation
    spreads over |cells|·S partitions instead of capping at |cells|
    tasks. At real scale ``n_cells`` grows with the corpus (the paper
    uses ~10⁴ k-means cells for 10⁸ docs), keeping per-cell pair
    counts bounded.
    """
    cells = (
        ivf_assign(embeddings, n_cells, n_probe=1, dim=dim)
        .select("vec_id", "cell")
        .localCheckpoint()
    )
    salts = 8
    n_part = embeddings.sparkSession.sparkContext.defaultParallelism
    wide = prep_embeddings(embeddings, dim, ["vec_id"]).join(cells, "vec_id")
    a = (
        wide.withColumn("salt", F.pmod(F.col("vec_id"), F.lit(salts)))
        .repartition(n_part, "cell", "salt")
        .alias("a")
    )
    b = (
        wide.withColumn("salt", F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(salts - 1).cast("long"))
        ))
        .repartition(n_part, "cell", "salt")
        .alias("b")
    )
    pairs = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("b.vec_id").alias("vec_id"),
            F.col("a.cell").alias("cell"),
            F.col("a.vec_id").alias("neighbor"),
            F.round(
                pair_dot("a", "b", dim) / F.col("a.norm") / F.col("b.norm"), 4
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    return (
        pairs.groupBy("vec_id", "cell")
        .agg(
            F.min("neighbor").alias("dup_of"),
            F.round(F.max("cos_sim"), 4).alias("max_cos"),
        )
        .transform(lambda d: small_sort(d, "vec_id") if sort else d)
    )


def kmeans_embeddings(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    sort: bool = True,
) -> DataFrame:
    """Fixed-iteration Lloyd's k-means over the embedding corpus with a
    deterministic init (centroids = the ``k`` lowest-vec_id vectors —
    the reproducible stand-in for k-means|| seeding, which would only
    change the initial centroid relation, not the loop).

    Assignment metric is cosine (argmax, ties to the lowest cluster);
    the update step is the per-dimension mean of each cluster's
    members. Output after ``iters`` rounds: (vec_id, cluster, cos_sim
    rounded to 4).

    100 TB shape per iteration: ONE corpus scan joined against a
    broadcast k-row centroid relation for assignment, then a
    (cluster, dim)-keyed partial aggregate — k·dim rows — rebuilt into
    arrays driver-free via collect_list per cluster. Centroids are
    localCheckpointed each round: the lineage would otherwise double
    per iteration (the round-2 Catalyst-OOM failure mode for iterative
    plans). No ``.collect()`` anywhere — the loop is Python, the data
    never leaves the cluster.
    """
    vecs = embeddings.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    cents = (
        vecs.filter(F.col("vec_id") < k)
        .select(F.col("vec_id").alias("cluster"), F.col("emb").alias("cent"))
        .localCheckpoint()
    )

    def assign(c):
        sim = cosine(F.col("emb"), F.col("cent"))
        w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cluster"))
        return (
            vecs.join(F.broadcast(c))
            .select("vec_id", "emb", "cluster", sim.alias("sim"))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") == 1)
            .drop("rnk")
        )

    for _ in range(iters - 1):
        assigned = assign(cents)
        # per-(cluster, dim) mean → k·dim rows → arrays via ordered
        # collect_list; empty clusters simply vanish (standard Lloyd's).
        cents = (
            assigned.select(
                "cluster", F.posexplode("emb").alias("pos", "x")
            )
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.getField("m"),
                ).alias("cent")
            )
            .localCheckpoint()
        )
    final = assign(cents)
    return final.select(
        "vec_id", "cluster", F.round("sim", 4).alias("cos_sim")
    ).transform(lambda d: small_sort(d, "vec_id") if sort else d)


def ann_recall_eval(
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 10,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Recall@k of the LSH-bucketed ANN against the exact brute-force
    top-k — the evaluation harness every approximate index needs
    before it replaces the exact path in production.

    Both sides reuse the existing operators (no third implementation
    to drift); the overlap is a per-query semi-join on (q_id, n_id).
    Output: (q_id, n_hits, recall) — recall = |approx ∩ exact| / k.

    100 TB shape: the costs are the two ANN runs themselves; the
    overlap join touches only n_queries·k rows.
    """
    exact = ann_topk_bruteforce(embeddings, n_queries, k).select(
        "q_id", "n_id"
    )
    approx = ann_topk_lsh(embeddings, n_queries, k, n_planes, dim).select(
        F.col("q_id").alias("aq_id"), F.col("n_id").alias("an_id")
    )
    hits = exact.join(
        approx,
        (F.col("q_id") == F.col("aq_id")) & (F.col("n_id") == F.col("an_id")),
        "left_semi",
    )
    per_q = hits.groupBy("q_id").agg(F.count("*").alias("n_hits"))
    # queries whose buckets missed everything still get a row
    all_q = exact.select("q_id").distinct()
    return (
        all_q.join(per_q, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.round(F.coalesce("n_hits", F.lit(0)) / F.lit(k), 4).alias(
                "recall"
            ),
        )
        .transform(lambda d: small_sort(d, "q_id"))
    )


def embedding_outliers(
    embeddings: DataFrame,
    n_cells: int = 8,
    top_n: int = 50,
    dim: int = 64,
    salts: int = 16,
) -> DataFrame:
    """Embedding-space quality control: the ``top_n`` vectors FURTHEST
    from every IVF centroid (lowest max-cosine) — garbage, corrupted,
    or out-of-distribution embeddings surface here before they poison
    ANN recall or semantic dedup (the QC sibling of :func:`semdedup`,
    sharing its cell machinery).

    Rank key is the ROUNDED (4dp) nearest-centroid cosine with vec_id
    as tie-break, so the cut is engine-exact. Global bottom-N uses the
    salted two-phase rank (no single task ever sorts the corpus —
    ``sample_reservoir``'s discipline).

    Output: (vec_id, cell, cell_cos, outlier_rank), rank 1 = worst fit.
    """
    wide = prep_embeddings(embeddings, dim, ["vec_id"])
    cents = wide.filter(F.col("vec_id") < n_cells)
    scored = (
        wide.alias("v")
        .join(F.broadcast(cents.alias("cen")))
        .select(
            F.col("v.vec_id").alias("vec_id"),
            F.col("cen.vec_id").alias("cell"),
            (pair_dot("v", "cen", dim) / F.col("v.norm") / F.col("cen.norm")).alias(
                "cell_cos"
            ),
        )
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("cell_cos"), F.asc("cell")
    )
    best = (
        scored.withColumn("rnk", F.row_number().over(w_assign))
        .filter(F.col("rnk") == 1)
        .select("vec_id", "cell", F.round("cell_cos", 4).alias("cell_cos"))
    )
    salt = F.pmod(F.col("vec_id"), F.lit(salts))
    w1 = Window.partitionBy(salt).orderBy(F.asc("cell_cos"), F.asc("vec_id"))
    survivors = (
        best.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= top_n)
        .drop("r1")
    )
    w2 = Window.partitionBy().orderBy(F.asc("cell_cos"), F.asc("vec_id"))
    return (
        survivors.withColumn("outlier_rank", F.row_number().over(w2))
        .filter(F.col("outlier_rank") <= top_n)
    )
