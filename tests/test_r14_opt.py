"""Round-14 optimization pins: changed operator internals must be
equivalent to the shapes they replaced.

- dedup._shingle_postings(pack=True): the base-128 BIGINT shingle pack
  must be an injective image of the string postings — same (doc,
  shingle) multiset under the bijection, including short-document edge
  shingles and empty canonical texts. Every pack=True consumer
  (ngram_jaccard_pairs, containment_pairs, search.jaccard_rank) uses
  `sh` only as an equality/count key, so set equality here pins their
  results bit-for-bit.
- integrity_audit: the fact-scale parent edge (lineitem->orders) must
  not build a broadcast of the orders key set (guide §3.1 — a key set
  that grows with the fact table cannot be broadcast at 100 TB).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.operators import dedup


def _pack_py(s: str, n: int) -> int:
    v = 0
    for i in range(n):
        c = ord(s[i]) if i < len(s) else 0
        v = v * 128 + c
    return v


_DOCS = [
    (1, "The quick brown fox; JUMPS!! over   the lazy dog 42"),
    (2, "the quick brown fox jumps over the lazy dog 42"),  # near-dup of 1
    (3, "ab"),        # shorter than the shingle width
    (4, "a"),         # single char
    (5, ";;; !!!"),   # canonicalizes to empty text
    (6, "numbers 0123456789 and spaces"),
    (7, "zzz zzz zzz zzz"),  # repeated shingles (array_distinct path)
]


@pytest.mark.parametrize("n", [3, 5])
def test_packed_postings_bijective_image_of_strings(spark, n):
    df = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    s_posts = dedup._shingle_postings(df, "doc_id", "text", n, None)
    p_posts = dedup._shingle_postings(df, "doc_id", "text", n, None, pack=True)
    s_rows = [(r["doc"], _pack_py(r["sh"], n)) for r in s_posts.collect()]
    p_rows = [(r["doc"], r["sh"]) for r in p_posts.collect()]
    assert sorted(s_rows) == sorted(p_rows)
    # injectivity across the distinct string universe (not just per doc)
    strings = {r["sh"] for r in s_posts.collect()}
    assert len({_pack_py(s, n) for s in strings}) == len(strings)


def test_packed_postings_respect_doc_freq_guard(spark):
    df = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    s_posts = dedup._shingle_postings(df, "doc_id", "text", 3, 2)
    p_posts = dedup._shingle_postings(df, "doc_id", "text", 3, 2, pack=True)
    s_rows = sorted((r["doc"], _pack_py(r["sh"], 3)) for r in s_posts.collect())
    p_rows = sorted((r["doc"], r["sh"]) for r in p_posts.collect())
    assert s_rows == p_rows


def test_ngram_jaccard_pairs_unchanged_by_pack(spark):
    # pin the full operator output against a hand-computed expectation
    # (docs 1 and 2 are near-dups; the ratio columns are integer-exact)
    df = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    out = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, min_jaccard=0.5
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r for r in out}
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    # sizes/intersection recomputed in Python over canonical trigrams
    import re

    def tri(s):
        s = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", "", s.lower())).strip()
        if len(s) < 3:
            return {s[i : i + 3] for i in range(1)}
        return {s[i : i + 3] for i in range(len(s) - 2)}

    a, b = tri(_DOCS[0][1]), tri(_DOCS[1][1])
    assert (r["size_a"], r["size_b"], r["inter_size"]) == (
        len(a),
        len(b),
        len(a & b),
    )


def test_integrity_audit_orders_edge_not_broadcast(spark):
    from kafka_connect_bigquery_spark import queries as qmod

    df = qmod.q_integrity_audit(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the merge hint survives into the optimized plan as a join of the
    # orders key aggregate WITHOUT a broadcast hint; cheap structural
    # check — the physical witness is plans/r14/integrity_audit_after
    assert "o_orderkey" in plan
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in phys or "ShuffledHashJoin" in phys
    # and the result itself matches the oracle (driver-witnessed; smoke
    # here): 7 edges, zero orphans on conforming TPC-H data
    rows = {r["fk_edge"]: r for r in df.collect()}
    assert len(rows) == 7
    assert all(r["n_orphans"] == 0 for r in rows.values())
