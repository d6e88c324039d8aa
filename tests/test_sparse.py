"""Feature hashing + sparse cosine join (operators/sparse.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.operators import sparse


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: bigint, text: string")


def test_hashed_tf_counts_and_determinism(spark):
    df = _docs(spark, [(1, "red fish red"), (2, "blue fish")])
    tf = sparse.hashed_tf(df, "doc_id", "text", dim=64)
    rows = {(r["doc_id"], r["bucket"], r["tf"]) for r in tf.collect()}
    # doc 1: red x2 + fish x1 -> two occupied buckets (unless collision)
    per_doc = {}
    for d, b, t in rows:
        per_doc.setdefault(d, []).append(t)
    assert sorted(per_doc[1]) in ([1, 2], [3])  # collision folds to one bucket
    assert sum(per_doc[2]) == 2
    again = {
        (r["doc_id"], r["bucket"], r["tf"])
        for r in sparse.hashed_tf(df, "doc_id", "text", dim=64).collect()
    }
    assert rows == again


def test_identical_docs_hit_cosine_one(spark):
    df = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "totally different words here entirely"),
        ],
    )
    tf = sparse.hashed_tf(df, "doc_id", "text", dim=128)
    pairs = sparse.cosine_pairs(tf, "doc_id", threshold_pct=99, max_bucket_df=10)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(1, 2)}
    r = pairs.collect()[0]
    # identical vectors: dot == both squared norms (cos exactly 1)
    assert r["dot"] == r["norm2_a"] == r["norm2_b"]


def test_stop_feature_guard_drops_universal_tokens(spark):
    # 'common' appears in every doc; with max_bucket_df=2 its bucket is
    # guarded out, so docs sharing ONLY it never pair
    df = _docs(
        spark,
        [(i, f"common unique{i}") for i in range(1, 5)],
    )
    tf = sparse.hashed_tf(df, "doc_id", "text", dim=256)
    pairs = sparse.cosine_pairs(tf, "doc_id", threshold_pct=10, max_bucket_df=2)
    assert pairs.count() == 0


def test_no_allpairs_without_shared_buckets(spark):
    df = _docs(spark, [(1, "aa bb"), (2, "cc dd"), (3, "ee ff")])
    tf = sparse.hashed_tf(df, "doc_id", "text", dim=1024)
    assert sparse.cosine_pairs(tf, "doc_id", threshold_pct=1).count() == 0
