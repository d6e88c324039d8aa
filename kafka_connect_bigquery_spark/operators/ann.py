"""Similarity search over embedding columns (array<float>).

Two paths:

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  One shuffle-free broadcast of the query set against the corpus scan;
  per-pair work is a codegen'd zip_with/aggregate (no Python).
- ``lsh_ann_topk``: random-hyperplane LSH buckets as the scale path —
  candidates share a bucket, exact cosine only within buckets. At
  100 TB the bucket id is the shuffle/partition key and the corpus is
  written bucketed by it, so a query touches ~1/2^planes of the data.

Determinism: cosines are computed over integer-quantized products
(floor(x*y*1e8 + .5) summed as exact integers) so the result is
bit-identical across engines, partitionings, and runs — see
``quantized_dot``. Hyperplane weights are a deterministic arithmetic
function of (plane, dim), not an RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QE = 100_000_000  # 1e8 quantization for per-element products


def quantized_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product: sum of floor(x*y*QE + 0.5) as long.

    Every step (float->double widening, double multiply, floor) is
    IEEE-deterministic; integer summation is order-independent."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(x.cast("double") * y.cast("double") * QE + F.lit(0.5)).cast(
            "long"
        ),
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)


def quantized_norm_sq(a: Column) -> Column:
    return quantized_dot(a, a)


def cosine_from_quantized(dot_q: Column, norm_a_q: Column, norm_b_q: Column) -> Column:
    """cosine = (dot/QE) / (sqrt(na/QE) * sqrt(nb/QE)) — the exact
    expression the oracle mirrors."""
    qe = F.lit(float(QE))
    return (dot_q / qe) / (
        F.sqrt(norm_a_q / qe) * F.sqrt(norm_b_q / qe)
    )


def with_norm(df: DataFrame, vec_col: str, out_col: str = "__norm_q") -> DataFrame:
    """Precompute per-vector quantized norms once (reused across queries
    — at corpus scale this column is stored with the table)."""
    return df.withColumn(out_col, quantized_norm_sq(F.col(vec_col)))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact brute-force cosine top-k of corpus for each query vector.

    Returns (query_id, neighbor_id, cosine, rank). The query side is
    broadcast (queries << corpus); ranking windows partition by query.
    """
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col("__norm_q").alias("qn"),
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.col("__norm_q").alias("cn"),
    )
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = joined.withColumn(
        "cosine",
        cosine_from_quantized(
            quantized_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# --------------------------------------------------------------------------
# LSH (random hyperplanes) scale path
# --------------------------------------------------------------------------

def hyperplane_weight(plane: Column, dim: Column) -> Column:
    """Deterministic pseudo-random +-1 weight for (plane, dim): an
    arithmetic hash both engines compute identically (integer ops only)."""
    h = (plane * 1009 + dim * 9176 + 2027) % 7
    return F.when(h < 3, F.lit(-1)).otherwise(F.lit(1))


def lsh_bucket(vec_col: Column, *, n_planes: int = 8) -> Column:
    """Sign-of-projection bucket id in [0, 2^n_planes): bit p set iff
    hyperplane_p . v > 0. Elements are quantized to integers *before*
    the signed sum so the sign is summation-order-independent (a raw
    double sum would be engine/partitioning-dependent near zero)."""
    def plane_bit(p: int) -> Column:
        proj_q = F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), F.size(vec_col) - 1),
                lambda x, d: F.floor(x.cast("double") * QE + F.lit(0.5)).cast("long")
                * hyperplane_weight(F.lit(p), d),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        return F.when(proj_q > 0, F.lit(2**p)).otherwise(F.lit(0))

    out = F.lit(0)
    for p in range(n_planes):
        out = out + plane_bit(p)
    return out


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 6,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: exact cosine only within the query's LSH bucket.

    Recall < 1 by construction (that's the trade); the bucket column is
    the partition key at scale. Returns (query_id, neighbor_id, cosine,
    rank) like cosine_topk.
    """
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col("__norm_q").alias("qn"),
        lsh_bucket(F.col(vec_col), n_planes=n_planes).alias("bucket"),
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.col("__norm_q").alias("cn"),
        lsh_bucket(F.col(vec_col), n_planes=n_planes).alias("bucket_c"),
    )
    joined = c.join(F.broadcast(q), F.col("bucket") == F.col("bucket_c"))
    if exclude_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = joined.withColumn(
        "cosine",
        cosine_from_quantized(
            quantized_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
