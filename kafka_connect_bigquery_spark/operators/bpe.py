"""BPE-style vocabulary induction over a text corpus.

The statistic that drives byte-pair encoding — adjacent-subword pair
frequencies — is a pure aggregation: explode each document's
(token[i], token[i+1]) pairs, one map-side-combinable groupBy. The
iterative learner then alternates

    count pairs  ->  pick the most frequent (deterministic tie-break)
    ->  merge its adjacent occurrences left-to-right in every document

for a fixed number of rounds, exactly the classic BPE training loop
(Sennrich et al. 2016) with the corpus pass expressed as a
higher-order fold (``F.aggregate``) — no UDF, no driver-side text.
Token arrays are checkpointed per round (the repo's HOF-hygiene rule)
so each round is one linear pass.

Scale: the pair table is bounded by (vocab size)^2 — corpus-size-
independent — so the per-round top-1 (and the ``top_pairs`` report)
may use a single global window over that small aggregate; the corpus
itself only streams through the fold.

Determinism: counts are exact integers and ties break on the pair
text, so the learned merge sequence is identical on any engine or
partitioning (the pytest replays the loop in pure Python and demands
equality; the pair statistics have a SQL oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.functions.text import subword_tokens
from kafka_connect_bigquery_spark.functions.winutil import bounded_global


def _tokenized(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(subword_tokens(F.col(text_col)).alias("tk")).localCheckpoint(
        eager=False
    )


def _pair_counts(toked: DataFrame) -> DataFrame:
    pairs = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("tk") - 1, F.lit(0))),
        lambda i: F.struct(
            F.element_at("tk", i.cast("int")).alias("a"),
            F.element_at("tk", (i + 1).cast("int")).alias("b"),
        ),
    )
    return (
        toked.filter(F.size("tk") >= 2)
        .select(F.explode(pairs).alias("_p"))
        .select("_p.a", "_p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def adjacent_pair_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(a, b, cnt): frequency of each adjacent subword pair."""
    return _pair_counts(_tokenized(df, text_col))


def top_pairs(df: DataFrame, text_col: str, k: int = 20) -> DataFrame:
    """The k most frequent adjacent pairs with a fully deterministic
    order (count desc, then pair text) — the candidates round one of
    BPE training would merge. Top-k rides orderBy+limit over the
    vocab^2-bounded pair table (TakeOrderedAndProject: per-partition
    top-N + merge, never a global sort); rank is recomputed over the
    k survivors only."""
    order = [F.desc("cnt"), F.asc("a"), F.asc("b")]
    return (
        adjacent_pair_counts(df, text_col)
        .orderBy(*order)
        .limit(k)
        .withColumn("rnk", F.row_number().over(bounded_global(*order)).cast("long"))
    )


def _merge_pair(toked: DataFrame, a: str, b: str) -> DataFrame:
    """One BPE merge round: replace left-to-right non-overlapping
    (a, b) adjacencies with the fused token a+b, as a fold."""
    merged = F.aggregate(
        F.col("tk"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return toked.select(merged.alias("tk")).localCheckpoint(eager=False)


def learn_merges(
    df: DataFrame, text_col: str, *, n_merges: int = 4
) -> list[tuple[str, str]]:
    """Run ``n_merges`` BPE training rounds; returns the learned merge
    sequence [(a, b), ...] in order. Stops early when no pair repeats."""
    toked = _tokenized(df, text_col)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(toked)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        toked = _merge_pair(toked, a, b)
    return merges


# ---------------------------------------------------------------------------
# Classic word-dict BPE (Sennrich et al. 2016, Algorithm 1) — the
# 100 TB shape
# ---------------------------------------------------------------------------
#
# ``learn_merges`` streams the whole CORPUS once per round — n_merges
# corpus passes. Classic BPE never merges across word boundaries, which
# buys the decisive compression: aggregate the corpus ONCE into the
# (word, count) frequency dict, then every training round runs over the
# dict — vocabulary-bounded, corpus-size-independent. A 100 TB corpus
# with a 10^8-word vocabulary pays one corpus scan total; each round is
# a pass over 10^8 dict rows (still a Spark frame — too big to collect,
# small enough to iterate), with pair statistics weighted by word
# frequency. The merge fold itself is the same HOF as _merge_pair.

WORD_END = "</w>"


def word_freq_dict(df: DataFrame, text_col: str) -> DataFrame:
    """The one corpus pass: whitespace-word frequencies as ``(tk, cnt)``
    with ``tk`` the word's character sequence plus the ``</w>``
    end-of-word marker (so merges can learn suffixes without ever
    crossing a word boundary — Sennrich's formulation)."""
    from kafka_connect_bigquery_spark.functions.text import tokens

    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.substring(F.col("w"), i.cast("int"), 1),
    )
    tk = F.concat(chars, F.array(F.lit(WORD_END)))
    return words.select(tk.alias("tk"), "cnt").localCheckpoint(eager=False)


def _weighted_pair_counts(dict_df: DataFrame) -> DataFrame:
    pairs = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("tk") - 1, F.lit(0))),
        lambda i: F.struct(
            F.element_at("tk", i.cast("int")).alias("a"),
            F.element_at("tk", (i + 1).cast("int")).alias("b"),
        ),
    )
    return (
        dict_df.filter(F.size("tk") >= 2)
        .select(F.explode(pairs).alias("_p"), "cnt")
        .groupBy("_p.a", "_p.b")
        .agg(F.sum("cnt").alias("cnt"))
    )


def learn_merges_from_dict(
    dict_df: DataFrame, *, n_merges: int = 8, return_dict: bool = False
):
    """The dict-BPE training loop over an existing ``(tk, cnt)``
    word-frequency dict (``word_freq_dict``'s output shape): each round
    counts frequency-weighted adjacent pairs over the DICT, merges the
    winner (count desc, pair text asc — fully deterministic), repeats.
    Stops early when no pair's weighted count reaches 2.

    This is the O(vocab)-per-merge shape the 100 TB claim rests on: a
    round never touches the corpus, only the dict frame — so a 30k-
    merge vocabulary costs 30k vocab-sized passes after ONE corpus
    scan. Per-round hygiene for long merge sequences: the dict is
    localCheckpoint'ed each round (materialized by the next round's
    top-1 collect), truncating lineage so round N's plan never replays
    rounds 1..N-1.

    ``return_dict=True`` returns ``(merges, final_dict)`` so a caller
    continuing training (e.g. the cost-curve bench, checkpoint by
    checkpoint) resumes from the merged state instead of replaying the
    whole prefix."""
    d = dict_df
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            _weighted_pair_counts(d)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        merged = F.aggregate(
            F.col("tk"),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        d = d.select(merged.alias("tk"), "cnt").localCheckpoint(eager=False)
    if return_dict:
        return merges, d
    return merges


def learn_merges_words(
    df: DataFrame, text_col: str, *, n_merges: int = 8
) -> list[tuple[str, str]]:
    """Classic within-word BPE training: one corpus pass builds the
    word-frequency dict (``word_freq_dict``), then
    ``learn_merges_from_dict`` runs the vocabulary-bounded merge loop.
    Merge semantics differ from ``learn_merges`` exactly as classic BPE
    differs from a stream tokenizer: pairs never span whitespace, and
    suffix units carry the ``</w>`` marker."""
    return learn_merges_from_dict(word_freq_dict(df, text_col), n_merges=n_merges)


def segment_words(
    words: DataFrame,
    word_col: str,
    merges: list[tuple[str, str]],
    *,
    merges_per_pass: int = 16,
) -> DataFrame:
    """Segment a frame of (distinct) WORDS against a learned merge
    list, returning the input plus a ``subwords`` array column — the
    vocab-side half of the dictionary-encoded tokenize (corpus tokens
    then broadcast-join onto this map).

    Why not ``apply_merges_words`` directly: that builds ONE expression
    nesting every merge's fold — fine at a handful of merges, but a
    real vocabulary is 1k-30k merges and a single expression with
    thousands of nested higher-order aggregates blows Catalyst's
    analysis/codegen budget. Here the merge list is replayed in
    ``merges_per_pass``-sized expression batches with a localCheckpoint
    between passes: each pass is one linear scan of the vocab-sized
    frame with a bounded expression tree, so cost is
    O(n_merges × vocab) rows TOTAL — corpus-size-independent — and
    expression depth never grows past one batch. Batch boundaries are
    semantics-free (merges apply strictly in list order either way;
    pinned by the pytest twin against ``apply_merges_words``)."""

    def fold(a: str, b: str):
        def step(acc: Column, x: Column) -> Column:
            return F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
                ),
            ).otherwise(F.concat(acc, F.array(x)))

        return step

    chars = F.transform(
        F.sequence(F.lit(1), F.length(word_col)),
        lambda i: F.substring(F.col(word_col), i.cast("int"), 1),
    )
    out = words.withColumn(
        "subwords", F.concat(chars, F.array(F.lit(WORD_END)))
    )
    for lo in range(0, len(merges), merges_per_pass):
        tk = F.col("subwords")
        for a, b in merges[lo : lo + merges_per_pass]:
            tk = F.aggregate(tk, F.array().cast("array<string>"), fold(a, b))
        out = out.withColumn("subwords", tk).localCheckpoint(eager=False)
    return out


def apply_merges_words(
    df: DataFrame, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: per word,
    start from characters + ``</w>`` and replay the merges in order —
    the inference half of the tokenizer, one linear pass per merge
    over the row's own array (no shuffle at all). Returns the input
    plus a ``subwords`` array column."""
    from kafka_connect_bigquery_spark.functions.text import tokens

    def fold(a: str, b: str):
        def step(acc: Column, x: Column) -> Column:
            return F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
                ),
            ).otherwise(F.concat(acc, F.array(x)))

        return step

    def seg(word: Column) -> Column:
        chars = F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: F.substring(word, i.cast("int"), 1),
        )
        tk = F.concat(chars, F.array(F.lit(WORD_END)))
        for a, b in merges:
            tk = F.aggregate(tk, F.array().cast("array<string>"), fold(a, b))
        return tk

    subwords = F.flatten(
        F.transform(
            F.filter(tokens(F.col(text_col)), lambda w: w != F.lit("")),
            seg,
        )
    )
    return df.withColumn("subwords", subwords)
