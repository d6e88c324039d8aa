"""Sequence packing and decontamination for LLM training-data pipelines.

Two corpus-preparation operators the reference connector has no analog
for (its job ends at the warehouse write; these consume the warehoused
corpus):

- ``sequence_pack``: concat-and-chunk packing of documents into
  fixed-token-budget training sequences (the GPT-style pre-training
  layout: documents are concatenated in a deterministic order and cut
  every ``budget`` tokens, so a document may straddle a sequence
  boundary). Sharded so packing parallelizes: each shard packs
  independently, which is exactly how production pipelines shard their
  tokenized corpus, and keeps the window sort per-shard instead of a
  single global ORDER BY.

- ``decontaminate``: n-gram overlap detection between a held-out split
  and the training split (the GPT-3/PaLM eval-contamination check):
  token n-grams of eval documents are matched against training
  documents via an inverted-index equi-join on the n-gram hash.

Both are pure DataFrame plans — no UDFs, no driver-side loops — and
both are deterministic (md5-derived shards/hashes), so results are
reproducible across engines, cluster sizes, and retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.functions.text import subword_tokens, tokens
from kafka_connect_bigquery_spark.functions.winutil import bounded_global


def _shard(col, n_shards: int, salt: str = "pack"):
    """Deterministic shard in [0, n_shards) from a stable id (md5-based,
    same draw the sampling operators use — pure per-row arithmetic)."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards).alias(
        "shard"
    )


def sequence_pack(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    budget: int = 2048,
    n_shards: int = 64,
) -> DataFrame:
    """Assign each document its position in the packed training layout.

    Within a shard, documents are ordered by id and concatenated; the
    token stream is cut every ``budget`` tokens. Emits one row per
    document: shard, token count, global token offset within the shard
    stream, the sequence (pack) index its first token lands in, and
    whether it straddles a sequence boundary (split across training
    sequences).

    Scale: one shuffle on ``shard`` for the running-sum window; shards
    are md5-uniform so the sort is balanced, and ``n_shards`` bounds
    per-task state at any corpus size. No global sort, no driver state.
    """
    toked = df.select(
        F.col(id_col),
        _shard(F.col(id_col), n_shards),
        F.size(subword_tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    cum = F.sum("n_tokens").over(w)
    return (
        toked.withColumn("token_end", cum)
        .withColumn("token_offset", F.col("token_end") - F.col("n_tokens"))
        .withColumn("seq_index", F.floor(F.col("token_offset") / budget))
        .withColumn(
            "straddles",
            # last token of the doc falls in a later sequence than its
            # first token (empty docs never straddle)
            (F.col("n_tokens") > 0)
            & (
                F.floor((F.col("token_end") - 1) / budget)
                != F.col("seq_index")
            ),
        )
        .select(
            id_col, "shard", "n_tokens", "token_offset", "seq_index", "straddles"
        )
    )


def _gram_hashes(n: int):
    """md5 hashes of whitespace-token n-grams over a ``_toks`` array
    column. Guarded: Spark's ``sequence(1, 0)`` is the *descending*
    sequence [1, 0], so short documents must short-circuit to an empty
    array instead of relying on an empty sequence."""
    return F.when(
        F.size("_toks") >= n,
        F.expr(
            f"transform(sequence(1, size(_toks) - {n - 1}),"
            f" i -> md5(array_join(slice(_toks, i, {n}), ' ')))"
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))


def decontaminate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split_col: str,
    *,
    train_split: str = "train",
    eval_split: str = "test",
    n: int = 5,
    max_gram_doc_freq: int = 50,
    min_shared: int = 1,
) -> DataFrame:
    """Flag training documents that share token ``n``-grams with any
    eval-split document.

    Returns one row per contaminated training document: the count of
    distinct shared n-grams and of distinct eval documents hit. The
    stop-gram guard (``max_gram_doc_freq``) drops n-grams present in
    more than that many documents corpus-wide — boilerplate n-grams
    carry no contamination signal and would otherwise make the
    inverted-index join quadratic (same role as the stop-shingle guard
    in the Jaccard dedup pass).

    Scale: grams explode -> two equi-joins on the gram hash. The eval
    side of a real corpus is tiny (benchmarks, not the crawl), so AQE
    broadcasts it; the df-guard aggregation is one count per distinct
    gram (map-side combinable).
    """
    # materialize the token array before the slice-per-gram lambda:
    # Catalyst collapses a bare projection, putting the tokenization
    # expression back inside the HOF body where it re-runs per gram
    # (see dedup._shingle_postings); the checkpoint is a hard barrier.
    # fan_out first: tokenization + gram hashing are the CPU of this
    # operator and must not run at the input's row-group parallelism
    from kafka_connect_bigquery_spark.operators.skew import fan_out

    toked = fan_out(df).select(
        F.col(id_col), F.col(split_col), tokens(F.col(text_col)).alias("_toks")
    ).localCheckpoint(eager=True)
    # unhex AFTER the explode (row-wise, whole-stage codegen — inside
    # the HOF it would evaluate interpreted): the gram key rides every
    # downstream exchange/join/agg as BINARY(16) instead of a 32-char
    # hex string (guide §2.3, narrower types — 24 vs 40 bytes per
    # UnsafeRow field, cheaper equality/hash). Injective (fixed-format
    # lowercase hex -> bytes), the gram never surfaces in results, and
    # every consumer uses it only as an equality key, so distinct
    # counts and join matches are identical.
    posts = (
        toked.select(
            id_col,
            split_col,
            F.explode(F.array_distinct(_gram_hashes(n))).alias("gram"),
        )
        .select(id_col, split_col, F.unhex("gram").alias("gram"))
        .localCheckpoint(eager=True)
    )
    # Two-phase stop-gram guard (same shape as dedup._shingle_postings):
    # phase 1 is a COUNT-ONLY aggregate per gram — map-side combinable,
    # a few bytes per gram in the buffer no matter how hot the gram —
    # whose over-threshold survivors broadcast back as an anti-join.
    # Only then does phase 2 collect_set the posting lists, on grams
    # already guaranteed <= max_gram_doc_freq postings each. The naive
    # one-shuffle form (collect_set first, filter on the count after)
    # buffers the hottest gram's ENTIRE posting set — ~10^8 ids for a
    # boilerplate 5-gram at 100 TB — before discarding it; here no
    # aggregation buffer ever exceeds the guard bound. Explode runs
    # once: checkpointed.
    stop = (
        posts.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("gram_df"))
        .filter(F.col("gram_df") > max_gram_doc_freq)
        .select("gram")
    )
    kept = posts.join(F.broadcast(stop), "gram", "left_anti")
    per_gram = (
        kept.groupBy("gram")
        .agg(
            F.collect_set(
                F.when(F.col(split_col) == train_split, F.col(id_col))
            ).alias("train_ids"),
            F.collect_set(
                F.when(F.col(split_col) == eval_split, F.col(id_col))
            ).alias("eval_ids"),
        )
        .filter((F.size("train_ids") > 0) & (F.size("eval_ids") > 0))
    )
    pairs = per_gram.select(
        "gram",
        F.explode("train_ids").alias("train_doc_id"),
        F.col("eval_ids"),
    ).select("gram", "train_doc_id", F.explode("eval_ids").alias("eval_doc_id"))
    return (
        pairs.groupBy("train_doc_id")
        .agg(
            F.countDistinct("gram").alias("n_shared_grams"),
            F.countDistinct("eval_doc_id").alias("n_eval_docs"),
        )
        .filter(F.col("n_shared_grams") >= min_shared)
    )


def shard_plan(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    *,
    tokens_per_shard: int,
    n_order_buckets: int = 64,
    salt: str = "shardplan",
) -> DataFrame:
    """Token-balanced training-shard assignment: rows take a seeded-hash
    global order, then a running weight (token) sum bins them so every
    shard carries ~``tokens_per_shard`` tokens. ``hash % n`` balances
    COUNTS; under the document-length skew of a real corpus that makes
    shards token-lopsided, and at 100 TB token-lopsided shards are
    straggler epochs. The hash order doubles as the corpus shuffle every
    pre-training run wants (no epoch-correlated ordering).

    Scale shape — the global running sum is a TWO-LEVEL distributed
    prefix sum, never a single-partition global window:

    1. each row hashes to a 60-bit order key h; its top bits pick one of
       ``n_order_buckets`` hash-RANGE buckets (bucket order == h order);
    2. one tiny aggregation computes per-bucket totals; a window over
       those ``n_order_buckets`` rows (driver-scale) turns them into
       bucket offsets, broadcast back;
    3. a window PARTITIONED BY bucket (parallel) computes the
       within-bucket running sum; offset + within = exact global cumsum.

    Every step is integer arithmetic on md5-derived keys, so the plan is
    engine-exact and restart-stable: same corpus + salt => same shards,
    on any cluster size. Returns the input plus ``h`` (order key),
    ``cum_tokens`` (inclusive running sum in hash order) and
    ``shard_id`` (= floor((cum_tokens - weight) / tokens_per_shard); a
    row larger than the budget still lands in exactly one shard).
    """
    if n_order_buckets < 1 or n_order_buckets & (n_order_buckets - 1):
        raise ValueError("n_order_buckets must be a power of two")
    shift = 60 - n_order_buckets.bit_length() + 1  # h has 60 bits
    hid = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    base = df.withColumn(
        "h", F.conv(F.substring(hid, 1, 15), 16, 10).cast("long")
    ).withColumn("__w", F.col(weight_col).cast("long"))
    base = base.withColumn("__b", F.expr(f"shiftrightunsigned(h, {shift})"))
    totals = base.groupBy("__b").agg(F.sum("__w").alias("__bt"))
    # n_order_buckets rows: the only global window runs over THEM, not
    # over the corpus
    off_w = bounded_global("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__b", F.coalesce(F.sum("__bt").over(off_w), F.lit(0)).alias("__off")
    )
    within = Window.partitionBy("__b").orderBy("h", id_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    out = (
        base.join(F.broadcast(offsets), "__b")
        .withColumn("cum_tokens", F.col("__off") + F.sum("__w").over(within))
        .withColumn(
            "shard_id",
            # integer DIV: double division would lose exactness past
            # 2^53 cumulative tokens (a few PB of corpus — reachable)
            F.expr(f"CAST((cum_tokens - __w) DIV {int(tokens_per_shard)} AS BIGINT)"),
        )
    )
    return out.drop("__b", "__w", "__off")
