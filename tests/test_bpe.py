"""BPE vocabulary induction (operators/bpe.py): the Spark training
loop must learn the identical merge sequence as a pure-Python replay
of the classic algorithm."""

from __future__ import annotations

import re

from kafka_connect_bigquery_spark.operators import bpe

_TOKEN_RE = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")


def _ref_tokens(text):
    return _TOKEN_RE.findall(text.lower())


def _ref_merge(tokens, a, b):
    out = []
    for t in tokens:
        if out and out[-1] == a and t == b:
            out[-1] = a + b
        else:
            out.append(t)
    return out


def _ref_learn(texts, n_merges):
    corpus = [_ref_tokens(t) for t in texts]
    merges = []
    for _ in range(n_merges):
        counts = {}
        for toks in corpus:
            for x, y in zip(toks, toks[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + 1
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        merges.append((a, b))
        corpus = [_ref_merge(t, a, b) for t in corpus]
    return merges


TEXTS = [
    "the cat sat on the mat",
    "the cat ate the rat",
    "a cat and a rat sat",
    "low lower lowest",
    "low low low!",
]


def _df(spark):
    return spark.createDataFrame([(t,) for t in TEXTS], "text: string")


def test_learn_merges_matches_reference(spark):
    got = bpe.learn_merges(_df(spark), "text", n_merges=5)
    want = _ref_learn(TEXTS, 5)
    assert got == want and len(got) >= 2


def test_merge_is_left_to_right_nonoverlapping(spark):
    # 'aaa' under pair (a, a): first two merge, third survives alone
    df = spark.createDataFrame([("a a a",)], "text: string")
    toked = bpe._tokenized(df, "text")
    merged = bpe._merge_pair(toked, "a", "a").collect()[0]["tk"]
    assert merged == ["aa", "a"]


def test_top_pairs_deterministic_rank(spark):
    rows = bpe.top_pairs(_df(spark), "text", k=5).collect()
    assert [r["rnk"] for r in rows] == [1, 2, 3, 4, 5]
    ordered = [(-r["cnt"], r["a"], r["b"]) for r in rows]
    assert ordered == sorted(ordered)


def test_stops_when_no_pair_repeats(spark):
    df = spark.createDataFrame([("x y",), ("p q",)], "text: string")
    assert bpe.learn_merges(df, "text", n_merges=3) == []
