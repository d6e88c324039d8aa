"""Sequence packing + decontamination operator semantics.

Oracle parity is covered by verify_local/the driver; these tests pin
the *semantics* on hand-computed fixtures: offsets are a per-shard
prefix sum, boundary straddling is detected exactly, packing is
invariant to input partitioning, and the decontamination join respects
splits and the stop-gram guard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.operators import packing


def _doc(doc_id, n_words):
    return (doc_id, " ".join(f"w{doc_id}x{i}" for i in range(n_words)))


@pytest.fixture(scope="module")
def docs(spark):
    # single shard (n_shards=1 below) so the layout is hand-checkable
    rows = [_doc(1, 10), _doc(2, 90), _doc(3, 40), _doc(4, 5)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pack_prefix_sum_and_straddle(docs):
    out = {
        r["doc_id"]: r
        for r in packing.sequence_pack(
            docs, "doc_id", "text", budget=100, n_shards=1
        ).collect()
    }
    # doc token counts are the word counts (words are single subword runs
    # + digits: "w1x3" -> [w, 1, x, 3] = 4 subtokens per word)
    assert out[1]["n_tokens"] == 40
    assert out[1]["token_offset"] == 0 and out[1]["seq_index"] == 0
    # doc2: 90 words * 4 = 360 tokens, starts at 40 -> seq 0, ends token
    # 399 (seq 3) -> straddles
    assert out[2]["token_offset"] == 40
    assert out[2]["seq_index"] == 0 and out[2]["straddles"]
    # doc3 starts at 400 -> exactly on a boundary, seq 4
    assert out[3]["token_offset"] == 400
    assert out[3]["seq_index"] == 4
    # doc3: 160 tokens -> ends token 559 (seq 5) -> straddles
    assert out[3]["straddles"]
    # doc4: 20 tokens at offset 560 -> fits inside seq 5
    assert out[4]["token_offset"] == 560
    assert out[4]["seq_index"] == 5 and not out[4]["straddles"]


def test_pack_partitioning_invariance(docs):
    a = packing.sequence_pack(docs, "doc_id", "text", budget=64, n_shards=4)
    b = packing.sequence_pack(
        docs.repartition(7), "doc_id", "text", budget=64, n_shards=4
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_empty_doc_never_straddles(spark):
    df = spark.createDataFrame([(1, ""), (2, "a b c")], ["doc_id", "text"])
    rows = {
        r["doc_id"]: r
        for r in packing.sequence_pack(
            df, "doc_id", "text", budget=2, n_shards=1
        ).collect()
    }
    assert rows[1]["n_tokens"] == 0 and not rows[1]["straddles"]


@pytest.fixture(scope="module")
def split_docs(spark):
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        # planted contamination: train doc 1 contains the eval 6-gram
        (1, f"one two {shared} three", "train"),
        (2, "completely different training content here now", "train"),
        (3, f"{shared} tail words", "test"),
        # val split must not count as contamination
        (4, f"{shared} in validation", "val"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "split"])


def test_decontaminate_flags_planted_overlap(split_docs):
    out = packing.decontaminate(
        split_docs, "doc_id", "text", "split", n=5, max_gram_doc_freq=50
    ).collect()
    assert [r["train_doc_id"] for r in out] == [1]
    r = out[0]
    # shared run is 6 tokens -> two 5-grams, both rare, one eval doc
    assert r["n_shared_grams"] == 2
    assert r["n_eval_docs"] == 1


def test_decontaminate_stop_gram_guard(split_docs):
    # every gram of the shared run appears in 3 docs (train+test+val);
    # a df guard of 2 drops them all -> no contamination reported
    out = packing.decontaminate(
        split_docs, "doc_id", "text", "split", n=5, max_gram_doc_freq=2
    ).collect()
    assert out == []


def test_passage_boilerplate_flags_shared_spans(spark):
    from kafka_connect_bigquery_spark.operators import dedup

    boiler = "all rights reserved contact us terms"  # 6 tokens -> 1 passage at P=6
    rows = [
        (1, f"{boiler} unique content one"),
        (2, f"{boiler} other words here"),
        (3, f"{boiler} third doc body"),
        (4, boiler),  # all-boilerplate document
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc"]: r
        for r in dedup.passage_boilerplate(
            df, "doc_id", "text", passage_tokens=6, max_doc_freq=2
        ).collect()
    }
    # the shared 6-token passage appears in 4 docs > max_df=2 -> boiler
    assert all(out[d]["n_boilerplate"] == 1 for d in (1, 2, 3, 4))
    assert out[1]["n_passages"] == 2
    # all-boilerplate doc keeps nothing: md5 of empty string
    import hashlib

    assert out[4]["cleaned_fp"] == hashlib.md5(b"").hexdigest()
    # distinct survivors -> distinct cleaned fingerprints
    assert len({out[d]["cleaned_fp"] for d in (1, 2, 3)}) == 3


def test_decontaminate_short_docs_no_grams(spark):
    df = spark.createDataFrame(
        [(1, "too short", "train"), (2, "too short", "test")],
        ["doc_id", "text", "split"],
    )
    assert (
        packing.decontaminate(df, "doc_id", "text", "split", n=5).collect() == []
    )


def test_shard_plan_exact_and_balanced(spark):
    """shard_plan's two-level distributed prefix sum must equal the
    naive single-window global cumsum bit-for-bit, shards must be
    contiguous in hash order, and every shard's token mass must be
    bounded by budget + its largest straddling document."""
    from pyspark.sql import Window

    from kafka_connect_bigquery_spark.operators.packing import shard_plan

    rows = [(i, 37 + (i * 811) % 4000) for i in range(800)]  # skewed sizes
    df = spark.createDataFrame(rows, "doc_id: bigint, n_chars: bigint")
    tps = 20_000
    out = shard_plan(df, "doc_id", "n_chars", tokens_per_shard=tps).collect()

    # oracle: one global window in hash order
    got = {r["doc_id"]: (r["h"], r["cum_tokens"], r["shard_id"]) for r in out}
    ordered = sorted(out, key=lambda r: (r["h"], r["doc_id"]))
    cum = 0
    for r in ordered:
        cum += r["n_chars"]
        assert r["cum_tokens"] == cum, "two-level cumsum diverged from naive"
        assert r["shard_id"] == (cum - r["n_chars"]) // tps
    # contiguity: shard ids are non-decreasing in hash order
    ids = [r["shard_id"] for r in ordered]
    assert ids == sorted(ids)
    # balance: each shard holds <= tps + (its largest doc - 1) tokens
    from collections import defaultdict

    mass = defaultdict(int)
    largest = defaultdict(int)
    for r in ordered:
        mass[r["shard_id"]] += r["n_chars"]
        largest[r["shard_id"]] = max(largest[r["shard_id"]], r["n_chars"])
    for s, m in mass.items():
        assert m <= tps + largest[s], f"shard {s} overfilled: {m}"
    # determinism across invocations
    again = shard_plan(df, "doc_id", "n_chars", tokens_per_shard=tps).collect()
    assert {r["doc_id"]: r["shard_id"] for r in again} == {
        k: v[2] for k, v in got.items()
    }


def test_shard_plan_rejects_non_power_of_two_buckets(spark):
    import pytest as _pytest

    from kafka_connect_bigquery_spark.operators.packing import shard_plan

    df = spark.createDataFrame([(1, 10)], "doc_id: bigint, n_chars: bigint")
    with _pytest.raises(ValueError):
        shard_plan(df, "doc_id", "n_chars", tokens_per_shard=100, n_order_buckets=48)
