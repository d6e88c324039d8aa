"""Deterministic sampling and dataset splitting.

Training-data pipelines need *reproducible* sampling: the same document
must land in the same split on every run, engine, and cluster size —
`rand()`-based sampling breaks replayed micro-batches, retried tasks,
and cross-engine audits. Everything here derives from md5 of a stable
id, so membership is a pure function of the row.

Scale: sampling/splitting are narrow per-row projections (no shuffle);
split-filtered scans push the predicate down like any other filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# use the first 8 md5 hex digits as a uniform draw in [0, 1)
_HASH_SPACE = float(0x100000000)


def hash_uniform(col: Column, *, salt: str = "") -> Column:
    """Deterministic uniform [0,1) draw from a stable id column.

    ``salt`` decorrelates independent sampling decisions over the same
    ids (e.g. sampling vs splitting)."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_HASH_SPACE)


def hash_sample(
    df: DataFrame, id_col: str, rate: float, *, salt: str = ""
) -> DataFrame:
    """Keep ~rate of rows, deterministically by id hash."""
    return df.filter(hash_uniform(F.col(id_col), salt=salt) < rate)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    *,
    cap: float,
    salt: str = "w",
) -> DataFrame:
    """Poisson (independent-inclusion) importance sampling: keep row i
    with probability p_i = min(1, w_i / cap), deterministically from the
    id hash — the per-ROW generalization of the per-SOURCE rates in
    ``mixture_rebalance`` (e.g. token-count-proportional sampling, so a
    long document is as likely to contribute as its token mass).

    The returned frame carries ``p_sample`` so downstream estimators can
    Horvitz-Thompson reweight by 1/p_sample. Pure per-row projection +
    filter: no shuffle, no state, identical membership on any engine or
    partitioning (every arithmetic step is an IEEE double op on exact
    integer inputs)."""
    u = hash_uniform(F.col(id_col), salt=salt)
    p = F.least(F.lit(1.0), F.col(weight_col).cast("double") / F.lit(float(cap)))
    return df.withColumn("p_sample", p).filter(u < F.col("p_sample"))


def assign_split(
    col: Column,
    fractions: dict[str, float],
    *,
    salt: str = "split",
) -> Column:
    """Map an id column to a split label ('train'/'val'/'test'/…) by
    hash range; fractions must sum to 1. Assignment is stable under
    re-runs and independent of row order/partitioning."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    u = hash_uniform(col, salt=salt)
    expr = None
    acc = 0.0
    *head, (last_name, _) = list(fractions.items())
    for name, frac in head:
        acc += frac
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return F.lit(last_name) if expr is None else expr.otherwise(F.lit(last_name))


def split_dataset(
    df: DataFrame, id_col: str, fractions: dict[str, float], *, salt: str = "split"
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split."""
    return df.withColumn("split", assign_split(F.col(id_col), fractions, salt=salt))


def mixture_rebalance(
    df: DataFrame,
    id_col: str,
    source_col: str,
    *,
    alpha: float = 0.5,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-scaled domain rebalancing: downsample each source so
    the output mixture is proportional to ``count^alpha`` (alpha<1
    flattens the natural distribution toward uniform — the standard
    multilingual/multi-domain pre-training reweighting; alpha=1 keeps
    the corpus as-is, alpha=0 equalizes sources).

    With alpha=0.5 the per-source keep rate reduces to
    ``sqrt(n_min / n_s)``: the rarest source keeps everything, dominant
    sources shed mass. Rates derive from exact integer counts and
    membership from the md5 draw, so the kept set is reproducible on
    any engine or partitioning.

    Scale: one map-side-combinable count per source (the rate table is
    tiny and broadcast back), then a pure per-row filter — no shuffle
    of the corpus itself.
    """
    # the per-source count table feeds both the max-ratio aggregate and
    # the rate projection — checkpoint so the corpus is scanned once
    counts = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("_n")
    ).localCheckpoint(eager=False)
    # weight_s / n_s = n^(alpha-1), normalized so the largest ratio
    # (the rarest source) keeps rate 1.0. The normalizer is a plain
    # aggregate broadcast back — not a window: even over the tiny rate
    # table an unpartitioned window is a shape the plan fence bans
    ratio = F.pow(F.col("_n").cast("double"), F.lit(alpha - 1.0))
    max_ratio = counts.agg(F.max(ratio).alias("_mx"))
    rates = counts.crossJoin(F.broadcast(max_ratio)).select(
        source_col,
        F.col("_n").alias("n_source"),
        (ratio / F.col("_mx")).alias("keep_rate"),
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(hash_uniform(F.col(id_col), salt=salt) < F.col("keep_rate"))
    )


def sample_k_per_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    k: int,
    *,
    salt: str = "kpg",
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, chosen by deterministic
    hash order — the eval-set construction primitive ("k examples per
    language/domain") that `LIMIT`-per-group cannot do reproducibly and
    rand() cannot do replayably. Adds ``sample_rank`` (1..k within the
    group, stable).

    Scale: one shuffle on the group for the ranking window; the hash
    order de-correlates the pick from ingestion order, so the sample is
    unbiased even when the table is time-clustered.
    """
    w = Window.partitionBy(group_col).orderBy(
        hash_uniform(F.col(id_col), salt=salt), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Deterministic stratified sampling: each stratum keeps its own
    rate (e.g. downsample dominant languages, keep all of rare ones) —
    the corpus-rebalancing primitive of training-data pipelines.
    Strata not listed keep ``default_rate``. Still a pure per-row
    projection: no shuffle, no state."""
    rate = F.lit(default_rate)
    for k, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(r)).otherwise(rate)
    return df.filter(hash_uniform(F.col(id_col), salt=salt) < rate)


def contrastive_pairs(
    positives: DataFrame,
    ids: DataFrame,
    id_col: str,
    *,
    n_negatives: int = 4,
    pool_rate: float = 0.1,
    salt: str = "neg",
) -> DataFrame:
    """Contrastive training-pair mining: label the given ``positives``
    (anchor, item) pairs 1 and attach ``n_negatives`` deterministic
    negatives per anchor, drawn from a SHARED hash-sampled candidate
    pool — the distributed analogue of in-batch negatives (every
    contrastive recipe's default), where negatives come from a small
    common pool rather than per-anchor scans of the corpus.

    Negative selection is a pure function of (anchor, candidate) ids:
    pool membership by ``hash_uniform(id) < pool_rate``, per-anchor
    ranking by ``hash_uniform(anchor || ':' || candidate)`` — so the
    pair set is reproducible across runs, engines, and partitionings,
    and a retried task emits identical pairs.

    Scale shape: the pool (≈pool_rate·n ids) broadcasts; candidate
    generation is |anchors| × |pool| (bounded, never corpus²); known
    positives and self-pairs are anti-joined out before ranking.
    Returns (anchor, item, label) with label ∈ {1, 0}.
    """
    pos = positives.select(
        F.col(positives.columns[0]).alias("anchor"),
        F.col(positives.columns[1]).alias("item"),
    )
    anchors = pos.select("anchor").distinct()
    pool = ids.select(F.col(id_col).alias("item")).filter(
        hash_uniform(F.col(id_col), salt=salt + "_pool") < pool_rate
    )
    # exclude known positives in EITHER orientation: canonical pairs
    # carry (min, max), but a pool candidate may be the smaller id
    pos_sym = pos.unionByName(
        pos.select(F.col("item").alias("anchor"), F.col("anchor").alias("item"))
    )
    cand = (
        anchors.join(F.broadcast(pool))
        .filter(F.col("anchor") != F.col("item"))
        .join(pos_sym, ["anchor", "item"], "left_anti")
    )
    key = hash_uniform(
        F.concat(F.col("anchor").cast("string"), F.lit(":"), F.col("item").cast("string")),
        salt=salt,
    )
    w = Window.partitionBy("anchor").orderBy(key.asc(), F.col("item").asc())
    negs = (
        cand.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_negatives)
        .select("anchor", "item")
    )
    return pos.withColumn("label", F.lit(1)).unionByName(
        negs.withColumn("label", F.lit(0))
    )


def dsir_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    *,
    buckets: int = 1024,
    q: int = 1_000_000,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by how much more likely its hashed unigram+bigram features are
    under the *target* distribution (rows where ``is_target``) than
    under the raw corpus — the signal DSIR resamples on to tilt a raw
    crawl toward a quality domain.

    log w(doc) = Σ_b tf_doc[b] · ln( p_target[b] / p_raw[b] ), with
    add-one smoothing over ``buckets`` hashed features. The per-bucket
    log-likelihood ratio is floored to the 1/q lattice BEFORE the
    per-document integer sum (the quantized-ln discipline shared with
    BM25/entropy), so the emitted ``dsir_logw_q`` is engine-exact.

    Scale shape: one (doc, bucket) tf groupBy over exploded features —
    the only corpus-sized shuffle; bucket marginals are ≤``buckets``
    rows; the LLR table broadcasts back. Returns one row per document:
    (doc_id, is_target, n_features, dsir_logw_q, target_like)."""
    from kafka_connect_bigquery_spark.functions.text import tokens
    from kafka_connect_bigquery_spark.operators.skew import fan_out

    # tokenize + feature-hash is the operator's CPU: run it at cluster
    # parallelism, not the input's row-group count
    base = fan_out(df).select(
        F.col(id_col).alias("doc_id"),
        is_target.alias("is_target"),
        tokens(F.col(text_col)).alias("_toks"),
    )
    # materialize the token array BEFORE the bigram HOF (re-eval trap)
    feats = base.select(
        "doc_id",
        "is_target",
        F.explode(
            F.concat(
                F.col("_toks"),
                F.when(
                    F.size("_toks") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("_toks") - 1),
                        lambda i: F.concat_ws(
                            " ",
                            F.element_at(F.col("_toks"), i),
                            F.element_at(F.col("_toks"), i + 1),
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>")),
            )
        ).alias("feat"),
    ).select(
        "doc_id",
        "is_target",
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("dsir:"), F.col("feat"))), 1, 8), 16, 10)
            .cast("long")
            % buckets
        ).alias("bucket"),
    )
    tf = (
        feats.groupBy("doc_id", "is_target", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)  # feeds marginals, totals, and scoring
    )
    raw = tf.groupBy("bucket").agg(F.sum("tf").alias("cnt_r"))
    tgt = tf.filter(F.col("is_target")).groupBy("bucket").agg(
        F.sum("tf").alias("cnt_t")
    )
    tot = tf.agg(
        F.sum("tf").alias("tot_r"),
        F.sum(F.when(F.col("is_target"), F.col("tf")).otherwise(0)).alias("tot_t"),
    )
    pt = (F.coalesce(F.col("cnt_t"), F.lit(0)) + 1).cast("double") / (
        F.col("tot_t") + buckets
    ).cast("double")
    pr = (F.coalesce(F.col("cnt_r"), F.lit(0)) + 1).cast("double") / (
        F.col("tot_r") + buckets
    ).cast("double")
    llr = (
        raw.join(tgt, "bucket", "full")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.floor(F.log(pt / pr) * q + F.lit(0.5)).cast("long").alias("llr_q"),
        )
    )
    scores = (
        tf.join(F.broadcast(llr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_features"),
            F.sum(F.col("tf") * F.col("llr_q")).cast("long").alias("dsir_logw_q"),
        )
    )
    zero = F.lit(0).cast("long")
    return (
        base.select("doc_id", "is_target")
        .join(scores, "doc_id", "left")
        .select(
            "doc_id",
            "is_target",
            F.coalesce("n_features", zero).alias("n_features"),
            F.coalesce("dsir_logw_q", zero).alias("dsir_logw_q"),
            (F.coalesce("dsir_logw_q", zero) > 0).alias("target_like"),
        )
    )
