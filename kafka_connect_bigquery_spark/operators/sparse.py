"""Sparse vector text features: feature hashing and similarity joins.

The third similarity modality in the engine, between set-based shingle
Jaccard (operators/dedup.py) and dense embedding cosine
(operators/ann.py): documents become SPARSE term-frequency vectors via
the hashing trick (token -> md5 bucket, no vocabulary build — the
HashingTF idea as plain DataFrame ops), and similarity is computed by
an inverted-index join on the shared buckets — never an all-pairs
comparison.

Exactness: tf counts and dot products are integers; the cosine
threshold test is cross-multiplied so no sqrt/float division ever
happens:

    cos(a, b) >= t/100  <=>  10000 * dot^2 >= t^2 * ||a||^2 * ||b||^2

(valid because dot >= 0 for tf vectors), making results engine- and
partitioning-exact — a SQL oracle hash-matches them.

Scale: one shuffle builds the tf rows (groupBy doc x bucket); the
pair join is postings-list self-join per bucket, bounded by the
``max_bucket_df`` guard (ultra-common buckets are stop-features that
carry no discrimination and would otherwise make the join quadratic —
the same guard discipline as the shingle/gram passes), then one
map-side-combinable groupBy over (a, b) sums the per-bucket products.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.functions.text import tokens

DIM = 1024


def _bucket(tok: Column, dim: int) -> Column:
    """Hashing-trick feature index: md5(token) -> [0, dim)."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long") % dim


def hashed_tf(
    df: DataFrame, id_col: str, text_col: str, *, dim: int = DIM
) -> DataFrame:
    """Sparse term-frequency rows ``(id, bucket, tf)`` — one row per
    (document, occupied feature bucket). No vocabulary pass, no fit
    step; the same text always maps to the same vector on any engine."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok")
    )
    return (
        toks.select(id_col, _bucket(F.col("_tok"), dim).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def sparse_norms(tf: DataFrame, id_col: str) -> DataFrame:
    """Per-document squared L2 norm (exact integer)."""
    return tf.groupBy(id_col).agg(
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("norm2")
    )


def cosine_pairs(
    tf: DataFrame,
    id_col: str,
    *,
    threshold_pct: int = 50,
    max_bucket_df: int = 200,
) -> DataFrame:
    """Document pairs with cosine >= threshold_pct/100, via the
    inverted-index join. Emits ``(id_a, id_b, dot, norm2_a, norm2_b)``
    with id_a < id_b; the threshold is applied in exact integer
    arithmetic. Buckets occupied by more than ``max_bucket_df``
    documents are dropped as stop-features (guard documented above)."""
    # the guard is a two-level aggregate (groupBy + semi-join), never a
    # window keyed on the skewed bucket column — the hottest buckets
    # are exactly the ones being dropped (same skew discipline as the
    # dedup frequency guards)
    bucket_df = tf.groupBy("bucket").agg(F.count(F.lit(1)).alias("_df"))
    guarded = tf.join(
        bucket_df.filter(F.col("_df") <= max_bucket_df).select("bucket"),
        "bucket",
        "left_semi",
    )
    a = guarded.select(
        F.col("bucket"), F.col(id_col).alias("id_a"), F.col("tf").alias("tf_a")
    )
    b = guarded.select(
        F.col("bucket"), F.col(id_col).alias("id_b"), F.col("tf").alias("tf_b")
    )
    dots = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).cast("long").alias("dot"))
    )
    # norms over the SAME guarded subspace as the dot products —
    # cosine is measured in the discriminative-feature space, so two
    # identical documents score exactly 1 (full-vector norms would
    # deflate every pair by the mass of the dropped stop-features)
    norms = sparse_norms(guarded, id_col)
    na = norms.select(F.col(id_col).alias("id_a"), F.col("norm2").alias("norm2_a"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("norm2").alias("norm2_b"))
    t2 = threshold_pct * threshold_pct
    # the cross-multiplied compare runs in decimal(38,0): long*long
    # silently wraps on big documents (norm2 ~ tokens^2), and the SQL
    # twin widens to HUGEINT the same way
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .filter(
            dec("dot") * dec("dot") * F.lit(10_000)
            >= F.lit(t2) * dec("norm2_a") * dec("norm2_b")
        )
        .select("id_a", "id_b", "dot", "norm2_a", "norm2_b")
    )
