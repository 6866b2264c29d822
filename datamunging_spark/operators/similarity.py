"""Similarity search over embedding columns (X2).

v1 baseline: brute-force cosine top-k — exact, deterministic, oracle-
checkable. Scale path: LSH bucketing (random hyperplane signs) so candidate
generation is an equi-join on bucket keys instead of a cross join; IVF-style
coarse quantization is the further growth path (SURVEY.md §7 step 6).

Everything is expression-only (zip_with/aggregate fold for the dot product)
— no Python UDF in the hot path. For very wide vectors a pandas_udf matmul
per partition can beat the fold; benchmarked, the expression path wins at
dim≤256 by staying in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datamunging_spark.functions import cosine_similarity, dot_product, l2_norm


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan shape: broadcast(queries) × corpus → per-row cosine → window top-k
    partitioned by query id. The query side is the small side by contract
    (a batch of probes), so the "cross join" is a broadcast nested loop over
    ONE pass of the corpus — at 100 TB the corpus is scanned once, never
    shuffled; only (n_queries × k) rows survive to the window.

    Generalizes MLlib ``findSynonyms`` (R39, reference README.md:388-392)
    to any array<float> column.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("_qv"), F.col("_cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _hyperplane(dim: int, seed: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane via splitmix-style
    integer mixing — reproducible across sessions without numpy RNG state."""
    vals = []
    x = (seed * 0x9E3779B97F4A7C15 + plane * 0xBF58476D1CE4E5B9) & (2**64 - 1)
    for _ in range(dim):
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & (2**64 - 1)
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB & (2**64 - 1)
        x = x ^ (x >> 31)
        vals.append((x / 2**63) - 1.0)
    return vals


def lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    out: str = "bucket",
) -> DataFrame:
    """Random-hyperplane (sign) LSH bucket id: n_planes sign bits packed into
    an int. Cosine-similar vectors collide with high probability; bucket key
    is uniform-ish so the downstream equi-join cannot skew badly."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, seed, p)])
        sign_bit = F.when(dot_product(F.col(vec_col), plane) >= 0, 1).otherwise(0)
        bucket = F.shiftleft(bucket, 1).bitwiseOR(sign_bit.cast("long"))
    return df.withColumn(out, bucket)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucketing with OR-amplification —
    ``n_tables`` independent hash tables, candidates = union of per-table
    bucket collisions. Recall < 1 by construction (property-tested, not
    oracle-hashed); scale: every shuffle is an equi-join on a bucket key;
    candidate volume ≈ n_tables × bucket occupancy, never O(|Q|×|C|)."""
    q = queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    cand = None
    for t in range(n_tables):
        qb = lsh_bucket(q, "_qv", dim, n_planes, seed + 1000 * t)
        cb = lsh_bucket(c, "_cv", dim, n_planes, seed + 1000 * t)
        pairs = qb.join(cb, on="bucket").drop("bucket")
        cand = pairs if cand is None else cand.union(pairs)
    scored = (
        cand.dropDuplicates(["query_id", "neighbor_id"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("_qv"), F.col("_cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
