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


# ---------------------------------------------------------------------------
# Classic word-dict BPE (r08): one corpus pass, vocab-bounded rounds
# ---------------------------------------------------------------------------


def _ref_learn_words(texts, n_merges):
    """Sennrich Algorithm 1: word-frequency dict, chars + </w>, merge
    within words, counts weighted by word frequency."""
    from collections import Counter

    def canon_words(t):
        c = re.sub(r"[^a-z0-9\s]", "", t.lower())
        return [w for w in re.sub(r"\s+", " ", c).strip().split(" ") if w]

    freqs = Counter(w for t in texts for w in canon_words(t))
    vocab = {w: list(w) + [bpe.WORD_END] for w in freqs}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for w, toks in vocab.items():
            for x, y in zip(toks, toks[1:]):
                counts[(x, y)] += freqs[w]
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        merges.append((a, b))
        vocab = {w: _ref_merge(t, a, b) for w, t in vocab.items()}
    return merges


def test_learn_merges_words_matches_classic_reference(spark):
    got = bpe.learn_merges_words(_df(spark), "text", n_merges=8)
    assert got == _ref_learn_words(TEXTS, 8)
    assert got  # the corpus genuinely learns something


def test_learn_merges_words_partitioning_invariant(spark):
    df = _df(spark)
    one = bpe.learn_merges_words(df.coalesce(1), "text", n_merges=4)
    many = bpe.learn_merges_words(df.repartition(8), "text", n_merges=4)
    assert one == many


def test_apply_merges_words_roundtrips_and_uses_merges(spark):
    df = _df(spark)
    merges = bpe.learn_merges_words(df, "text", n_merges=6)
    out = bpe.apply_merges_words(df, "text", merges).collect()
    for row in out:
        subs = row["subwords"]
        # every word reconstructs exactly: concatenation of its
        # subwords minus the </w> markers equals the lowered text
        joined = "".join(subs).replace(bpe.WORD_END, " ").strip()
        canon = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", "", row["text"].lower())).strip()
        assert joined == canon
        # at least one learned multi-char unit is actually used
        if merges:
            assert any(len(s.replace(bpe.WORD_END, "")) > 1 for s in subs)


def test_word_dict_bpe_never_crosses_word_boundary(spark):
    # "b a" is adjacent ACROSS words in every document, but word-dict
    # BPE has no cross-word pairs at all: the only learnable units are
    # (b, </w>) and (a, </w>); ("b", "a") must never appear
    df = spark.createDataFrame([("b a",)] * 5, "text: string")
    merges = bpe.learn_merges_words(df, "text", n_merges=3)
    assert merges and ("b", "a") not in merges
    assert merges[0] == ("a", bpe.WORD_END)  # tie-break: pair text asc
    # the stream variant DOES see the cross-word pair — the semantic
    # difference between the two trainers, pinned
    assert ("b", "a") in bpe.learn_merges(df, "text", n_merges=3)


# ---------------------------------------------------------------------------
# r13: dict-input training + batched segmentation (the >=1k-merge path)
# ---------------------------------------------------------------------------

def _zipf_dict(n_words=300, seed=7):
    """Synthetic Zipf (word, count) dict — the input shape of dict-BPE
    (a real corpus reaches the trainer only through word_freq_dict)."""
    import random

    rng = random.Random(seed)
    letters = "abcdefghijklmnop"
    words = set()
    while len(words) < n_words:
        words.add(
            "".join(rng.choice(letters) for _ in range(rng.randint(2, 10)))
        )
    ws = sorted(words)
    return {w: max(1, int(1000 / (i + 1))) + rng.randint(0, 3) for i, w in enumerate(ws)}


def _ref_learn_dict(freqs, n_merges):
    """Pure-Python Sennrich loop over an explicit frequency dict."""
    from collections import Counter

    vocab = {w: list(w) + [bpe.WORD_END] for w in freqs}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for w, toks in vocab.items():
            for x, y in zip(toks, toks[1:]):
                counts[(x, y)] += freqs[w]
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        merges.append((a, b))
        vocab = {w: _ref_merge(t, a, b) for w, t in vocab.items()}
    return merges


def _dict_df(spark, freqs):
    rows = [(list(w) + [bpe.WORD_END], int(c)) for w, c in sorted(freqs.items())]
    return spark.createDataFrame(rows, "tk: array<string>, cnt: long")


def test_learn_merges_from_dict_matches_python_replay(spark):
    """The dict-input trainer (the O(vocab)-per-merge loop the >=1k-
    merge vocabulary rung runs) must learn the identical merge sequence
    as the pure-Python Sennrich replay over the same dict — 64 merges
    deep, so the equality covers long-horizon state, not just the first
    few winners."""
    freqs = _zipf_dict()
    got = bpe.learn_merges_from_dict(_dict_df(spark, freqs), n_merges=64)
    want = _ref_learn_dict(freqs, 64)
    assert got == want
    assert len(got) == 64  # the dict genuinely sustains 64 merges


def test_learn_merges_words_delegates_to_dict_loop(spark):
    df = _df(spark)
    via_words = bpe.learn_merges_words(df, "text", n_merges=6)
    via_dict = bpe.learn_merges_from_dict(
        bpe.word_freq_dict(df, "text"), n_merges=6
    )
    assert via_words == via_dict


def test_segment_words_equals_apply_merges_words(spark):
    """Batched segmentation (merges_per_pass expression batches with
    checkpoints between) must produce byte-identical subwords to the
    single-expression apply_merges_words — especially across batch
    boundaries (41 merges at 16/pass exercises two boundaries and a
    partial final batch)."""
    freqs = _zipf_dict(n_words=120, seed=11)
    merges = _ref_learn_dict(freqs, 41)
    assert len(merges) == 41
    words = spark.createDataFrame(
        [(w,) for w in sorted(freqs)], "word: string"
    )
    seg = {
        r["word"]: list(r["subwords"])
        for r in bpe.segment_words(words, "word", merges, merges_per_pass=16).collect()
    }
    ref = {
        r["word"]: list(r["subwords"])
        for r in bpe.apply_merges_words(words, "word", merges).collect()
    }
    assert seg == ref
    # and batching is semantics-free: a different batch size agrees
    seg7 = {
        r["word"]: list(r["subwords"])
        for r in bpe.segment_words(words, "word", merges, merges_per_pass=7).collect()
    }
    assert seg7 == ref
