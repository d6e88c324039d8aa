"""Text-analysis functions for training-data pipelines.

All pure Column expressions (JVM-side, codegen'd): language-ID by
stopword evidence, quality scoring from surface statistics, token
counting, and document fingerprinting. Deterministic by construction so
corpus-scale decisions are reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.operators.dedup import canonical_text, fingerprint  # noqa: F401

# Small evidence sets per language (n-gram/stopword heuristic; the usual
# fastText-style classifier is out of scope for a SQL-checkable op).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "los", "que", "y"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization of canonical text."""
    return F.split(canonical_text(col), " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def unique_token_count(col: Column) -> Column:
    return F.size(F.array_distinct(tokens(col)))


# BPE-ish subword splitting: letter runs, digit runs, and single
# punctuation marks become separate tokens (the pre-tokenization shape
# GPT-style BPE vocabularies assume), as one regexp pass.
BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def subword_tokens(col: Column) -> Column:
    return F.regexp_extract_all(F.lower(col), F.lit(BPE_TOKEN_RE), 0)


def subword_count(col: Column) -> Column:
    """Sub-token count under the BPE-ish pre-tokenizer — the budget
    proxy for LLM token accounting."""
    return F.size(subword_tokens(col))


# Polynomial (Rabin-Karp) rolling hash over whitespace tokens:
# fold acc -> (acc*B + h(token)) mod M with h = first 8 md5 hex digits.
# Order-sensitive (unlike the md5-of-canonical fingerprint), so
# reordered-content documents hash differently.
ROLL_B = 131
ROLL_M = 1_000_000_007


def rolling_hash(col: Column) -> Column:
    toks = tokens(col)
    hashes = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLL_B + x) % ROLL_M,
    )


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_scores(col: Column) -> dict[str, Column]:
    toks = tokens(col)
    return {lang: _marker_hits(toks, ms) for lang, ms in LANG_MARKERS.items()}


def predict_lang(col: Column) -> Column:
    """argmax over marker-hit counts with deterministic tie-break
    (alphabetical language code; 'und' = undetermined when no evidence)."""
    scores = lang_scores(col)
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(scores, reverse=True):  # reverse so earlier alpha wins ties
        s = scores[lang]
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return best


def quality_features(col: Column) -> dict[str, Column]:
    """Surface-statistics features used by the quality score."""
    raw_len = F.length(col)
    toks = tokens(col)
    n_tok = F.size(toks)
    alpha_len = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    digit_len = F.length(F.regexp_replace(col, r"[^0-9]", ""))
    stop_hits = _marker_hits(toks, LANG_MARKERS["en"])
    return {
        "n_chars": raw_len.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "avg_token_len": (alpha_len.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")),
        "alpha_ratio": alpha_len.cast("double") / F.greatest(raw_len, F.lit(1)).cast("double"),
        "digit_ratio": digit_len.cast("double") / F.greatest(raw_len, F.lit(1)).cast("double"),
        "stopword_ratio": stop_hits.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double"),
        "unique_ratio": F.size(F.array_distinct(toks)).cast("double")
        / F.greatest(n_tok, F.lit(1)).cast("double"),
    }


def quality_score(col: Column) -> Column:
    """Composite quality in [0,1]-ish: rewards natural length, letter
    share, stopword presence, and lexical diversity. Weights are fixed
    constants — the score is a deterministic feature, not a model."""
    ft = quality_features(col)
    length_term = F.least(ft["n_tokens"].cast("double") / F.lit(100.0), F.lit(1.0))
    return (
        F.lit(0.25) * length_term
        + F.lit(0.25) * ft["alpha_ratio"]
        + F.lit(0.25) * F.least(ft["stopword_ratio"] * 5, F.lit(1.0))
        + F.lit(0.25) * ft["unique_ratio"]
    )


# --------------------------------------------------------------------------
# corpus bigram language-model fluency (KenLM-style quality proxy)
# --------------------------------------------------------------------------

LM_Q = 1_000_000  # probability quantization: per-bigram score is the
# integer (count(w1,w2) * LM_Q) // count(w1) — pure bigint arithmetic,
# so corpus-wide scoring is bit-identical on any engine or partitioning


def doc_bigrams(df, id_col: str, text_col: str):
    """(doc, w1, w2) rows — one per consecutive token pair. The token
    array is referenced only at row scope (slice argument positions,
    not lambda bodies), so no checkpoint barrier is needed. NOT
    fan_out'd: allocation-bound, measured slower widened in a shared
    local heap (see bm25_doc_lengths)."""
    from pyspark.sql import functions as F

    toks = tokens(F.col(text_col))
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w1"),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w2"),
    )
    return df.select(
        F.col(id_col).alias("doc"), F.explode(pairs).alias("p")
    ).select("doc", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))


def bigram_fluency(df, id_col: str, text_col: str):
    """Per-document fluency under the corpus's own bigram model: the
    mean quantized conditional probability (count(w1,w2)*LM_Q //
    count(w1)) over the document's bigrams. Template-generated or
    shuffled text scores low against natural word order; the classic
    cheap LM-quality gate before training (perplexity filtering with
    the corpus as its own model).

    Scale: two count aggregations build the model (map-side
    combinable); scoring is one equi-join from doc bigrams to the
    bigram table (the w1 marginal rides along on the bigram row, so
    the unigram table is never joined separately at explosion size).
    Everything is integer arithmetic until the final mean.
    """
    from pyspark.sql import functions as F

    grams = doc_bigrams(df, id_col, text_col)
    lm = grams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bi"))
    uni = grams.groupBy("w1").agg(F.count(F.lit(1)).alias("c_uni"))
    # integer floor-div, never a double quotient: floor(a/b) in floating
    # point can miss by one ulp at integer boundaries
    model = lm.join(uni, "w1").withColumn(
        "q", F.expr(f"c_bi * {LM_Q}L div c_uni")
    )
    scored = grams.join(model.select("w1", "w2", "q"), ["w1", "w2"])
    return scored.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("q").alias("lm_score_q"),
        (F.sum("q").cast("double") / F.count(F.lit(1))).alias("fluency"),
    )


BM25_Q = 1_000_000  # score quantization lattice


def bm25_scores(
    df,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    q: int = BM25_Q,
):
    """Okapi BM25 relevance of every document to a fixed term query
    (Robertson & Walker, the standard ranking function for sparse
    retrieval): idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)), tf
    normalization with length prior b and saturation k1.

    Engine-exactness: every float step is an IEEE double op both Spark
    and an oracle perform identically on identical inputs; the one
    transcendental (ln) is evaluated on an identical double argument
    and immediately quantized to the 1/q lattice, and per-term
    contributions are floored to integers before the (order-sensitive)
    final sum — so the score is a BIGINT, hash-comparable.

    Scale shape: tokenization + explode is the corpus scan; the filter
    to query terms happens BEFORE the groupBy so the tf shuffle carries
    only matching postings (|terms| × df rows, not the corpus); the df
    table (≤|terms| rows) and the 1-row corpus stats broadcast. Returns
    (doc, score_q, score, n_terms) for docs matching ≥1 term.
    """
    # tokenize the corpus ONCE: the lazy checkpoint is the barrier that
    # lets both the doc-length table and the postings derive from the
    # same materialized scan (bm25_postings on the raw df would
    # re-tokenize — the multi-scan class the q15/collocations fixes
    # removed elsewhere)
    toked = bm25_doc_lengths(df, id_col, text_col).localCheckpoint(eager=False)
    tf = _postings_from_toked(toked, query_terms)
    return bm25_from_tables(tf, toked.select("doc", "dl"), k1=k1, b=b, q=q)


def bm25_doc_lengths(df, id_col: str, text_col: str):
    """(doc, toks, dl) — the document-length half of the BM25 index.
    Deliberately NOT fan_out'd: the tokenize+explode is allocation-
    bound and measured SLOWER widened at every tested corpus size in a
    shared local heap (1.37x at sf1, 1.2x at sf10 — the isin filter
    right after the explode keeps the narrow stage short, unlike the
    trigram build in docs_ngram_novelty which crosses over at ~50 MB).
    On a multi-executor cluster the input arrives wide anyway."""
    from pyspark.sql import functions as F

    return df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("toks")
    ).withColumn("dl", F.size("toks"))


def bm25_postings(df, id_col: str, text_col: str, query_terms: list[str]):
    """(doc, dl, term, tf) postings restricted to ``query_terms`` — the
    term-frequency half of the BM25 index. Both halves are plain
    DataFrames, so they can be PERSISTED as warehouse tables and
    maintained incrementally over a CDC feed (see the
    ``bm25_incremental`` registry query) instead of recomputed per
    query."""
    toked = bm25_doc_lengths(df, id_col, text_col)
    return _postings_from_toked(toked, query_terms)


def _postings_from_toked(toked, query_terms: list[str]):
    """Postings from an already-tokenized (doc, toks, dl) frame — the
    shared tail of bm25_postings and bm25_scores (which tokenizes once
    and feeds both index halves from the checkpointed scan)."""
    from pyspark.sql import functions as F

    return (
        toked.select("doc", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin([t.lower() for t in query_terms]))
        .groupBy("doc", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_from_tables(
    tf,
    doc_lengths,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    q: int = BM25_Q,
):
    """Score from materialized index tables: ``tf`` = (doc, dl, term,
    tf), ``doc_lengths`` = (doc, dl) over the WHOLE corpus (df/N/avgdl
    derive from these, never from re-tokenizing documents). Identical
    arithmetic to ``bm25_scores`` — the two entry points must agree
    bit-for-bit, which is what makes incremental index maintenance
    oracle-checkable against full recompute."""
    from pyspark.sql import functions as F

    # tf feeds both the df aggregation and the scoring join — without
    # a barrier its (corpus-scan) lineage runs twice
    tf = tf.localCheckpoint(eager=False)
    stats = doc_lengths.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfq"))
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
    idf_arg = F.lit(1.0) + (
        (F.col("n_docs") - F.col("dfq")).cast("double") + F.lit(0.5)
    ) / (F.col("dfq").cast("double") + F.lit(0.5))
    idf_q = F.floor(F.log(idf_arg) * q + F.lit(0.5)).cast("long")
    tfnorm = (F.col("tf") * F.lit(float(k1 + 1.0))) / (
        F.col("tf")
        + F.lit(float(k1))
        * (F.lit(float(1.0 - b)) + F.lit(float(b)) * F.col("dl") / avgdl)
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("contrib_q", F.floor(tfnorm * idf_q + F.lit(0.5)).cast("long"))
    )
    return scored.groupBy("doc").agg(
        F.sum("contrib_q").cast("bigint").alias("score_q"),
        (F.sum("contrib_q").cast("double") / q).alias("score"),
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
    )
