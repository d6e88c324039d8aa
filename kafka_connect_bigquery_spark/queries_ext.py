"""Extension queries: dedup, similarity search, text analysis, multimodal.

Same contract as queries.py: every entry pairs the Spark operator (from
operators/dedup.py, operators/ann.py, functions/text.py,
functions/multimodal.py) with a DuckDB oracle that re-derives the same
result in ANSI SQL. Hash-exactness rests on two invariants shared by
the operators: (1) all hashing is md5-of-string, (2) all float
reductions are integer-quantized before summation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.functions import multimodal, text as text_fns
from kafka_connect_bigquery_spark.operators import ann, dedup
from kafka_connect_bigquery_spark.operators import search as search_ops
from kafka_connect_bigquery_spark.queries import _qsum_sql, _ts_us
from kafka_connect_bigquery_spark.session import read_table

_TS_US_EXT = _ts_us()
_QE = ann.QE


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# canonical-text SQL twin of dedup.canonical_text
_CANON = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)

# whitespace-token SQL twin of functions.text.tokens (used throughout)
_TOKS = f"str_split({_CANON}, ' ')"

# BPE-ish subword count twin of functions.text.subword_count
_SUBTOK_SQL = (
    "CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))"
    " AS BIGINT)"
)

# ---------------------------------------------------------------------------
# dedup: exact
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on canonical-text fingerprint. One
    shuffle on the fingerprint; at 100 TB this is the cheapest pass and
    runs first to shrink the corpus for the fuzzy passes."""
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"), "doc_id", "text")


Q_DEDUP_EXACT_SQL = f"""
WITH canon AS (SELECT doc_id, {_CANON} AS c FROM documents)
SELECT md5(c) AS fp, min(doc_id) AS keep_id, count(*) AS dup_count
FROM canon GROUP BY 1
"""

# ---------------------------------------------------------------------------
# dedup: n-gram Jaccard
# ---------------------------------------------------------------------------

_JACCARD_MIN = 0.10
_JACCARD_MAX_DF = 100  # stop-shingle guard: shingles in >100 docs carry
# no discriminative signal and make the candidate join quadratic


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup pairs via inverted-index join, blocked by
    language and guarded by shingle document frequency (the two knobs
    that bound candidate counts on a real corpus — without the df guard
    stop-shingles make the self-join quadratic in corpus size)."""
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=3,
        min_jaccard=_JACCARD_MIN,
        block_col="lang",
        max_doc_freq=_JACCARD_MAX_DF,
    )


def _ngram_sql(min_jaccard: float) -> str:
    return f"""
WITH canon AS (SELECT doc_id, lang, {_CANON} AS c FROM documents),
sh_all AS (
  SELECT doc_id, lang,
         unnest(list_distinct([substr(c, CAST(i AS INT), 3)
                 for i in range(1, greatest(length(c) - 2, 1) + 1)])) AS sh
  FROM canon
),
freq AS (SELECT sh FROM sh_all GROUP BY sh HAVING count(*) <= {_JACCARD_MAX_DF}),
sh AS (SELECT sh_all.* FROM sh_all JOIN freq USING (sh)),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter_size
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, inter_size, sa.sz AS size_a, sb.sz AS size_b,
       inter_size / CAST(sa.sz + sb.sz - inter_size AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE inter_size / CAST(sa.sz + sb.sz - inter_size AS DOUBLE) >= {min_jaccard}
"""


Q_DEDUP_NGRAM_SQL = _ngram_sql(_JACCARD_MIN)

# rational Jaccard threshold for the exact prefix-filtered join.
# 5-gram shingles + t=0.9: char-3-gram universes are too dense for
# discriminative prefixes (measured max prefix-df 1890 at sf0.1),
# and this corpus carries a large just-below-threshold similarity
# band, so the production point is high-confidence near-dup pairs
_PFX_NUM, _PFX_DEN = 9, 10


def q_dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs Jaccard >= 0.7 via prefix filtering
    (operators/dedup.py::prefix_filter_pairs — AllPairs/PPJoin prefix
    principle): candidates come only from each doc's df-rarest shingle
    prefix, so the self-join stays bounded WITHOUT the recall-losing
    stop-shingle guard the ``dedup_ngram_jaccard`` entry uses. The
    oracle is the brute inverted-index join over ALL shingles — any
    pair the prefix filter missed hash-mismatches, which is the
    exactness theorem checked as data."""
    from kafka_connect_bigquery_spark.operators import dedup as D

    return D.prefix_filter_pairs(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=5,
        jaccard_num=_PFX_NUM,
        jaccard_den=_PFX_DEN,
    )


Q_DEDUP_PREFIX_SQL = f"""
WITH canon AS (SELECT doc_id, {_CANON} AS c FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct([substr(c, CAST(i AS INT), 5)
                 for i in range(1, greatest(length(c) - 4, 1) + 1)])) AS sh
  FROM canon
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter_size
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, inter_size, sa.sz AS size_a, sb.sz AS size_b,
       inter_size / CAST(sa.sz + sb.sz - inter_size AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE {_PFX_DEN} * inter_size >= {_PFX_NUM} * (sa.sz + sb.sz - inter_size)
"""


_CONTAIN_PCT = 60


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs (operators/dedup.py
    containment_pairs): |A∩B| / min(|A|,|B|) over the same guarded
    shingle index as the Jaccard pass — the measure that catches a
    short document embedded verbatim in a long one, where Jaccard's
    union term hides the duplication. Integer-exact ratio columns."""
    return dedup.containment_pairs(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=3,
        min_containment_pct=_CONTAIN_PCT,
        block_col="lang",
        max_doc_freq=_JACCARD_MAX_DF,
    )


Q_DEDUP_CONTAINMENT_SQL = f"""
WITH canon AS (SELECT doc_id, lang, {_CANON} AS c FROM documents),
sh_all AS (
  SELECT doc_id, lang,
         unnest(list_distinct([substr(c, CAST(i AS INT), 3)
                 for i in range(1, greatest(length(c) - 2, 1) + 1)])) AS sh
  FROM canon
),
freq AS (SELECT sh FROM sh_all GROUP BY sh HAVING count(*) <= {_JACCARD_MAX_DF}),
sh AS (SELECT sh_all.* FROM sh_all JOIN freq USING (sh)),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter_size
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, inter_size, sa.sz AS size_a, sb.sz AS size_b,
       inter_size * 100 // least(sa.sz, sb.sz) AS containment_pct,
       inter_size * 100 // (sa.sz + sb.sz - inter_size) AS jaccard_pct
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE inter_size * 100 >= least(sa.sz, sb.sz) * {_CONTAIN_PCT}
"""

_RECALL_TRUTH_J = 0.5


def q_dedup_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality audit: recall/precision of the MinHash-LSH
    candidate set against exact n-gram Jaccard truth (pairs with
    J >= 0.5). The measurement every production dedup pipeline needs
    before trusting an approximate index — here it is itself an
    oracle-exact query (both sides are deterministic, the ratios are
    integer-quantized)."""
    d = _t(spark, sf_dir, "documents")
    truth = dedup.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, min_jaccard=_RECALL_TRUTH_J,
        block_col="lang", max_doc_freq=_JACCARD_MAX_DF,
    ).select("id_a", "id_b")
    cand = dedup.minhash_lsh_dedup_pairs(
        d, "doc_id", "text", num_hashes=_MH_HASHES, bands=_MH_BANDS, n=3
    ).select("id_a", "id_b").distinct()
    hits = truth.join(cand, ["id_a", "id_b"])
    t = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    c = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    h = hits.agg(F.count(F.lit(1)).alias("n_hits"))
    # 1-row frames: the nested-loop join is a broadcast of single rows
    return (
        t.join(h).join(c)
        .select(
            "n_truth",
            "n_candidates",
            "n_hits",
            F.expr("n_hits * 1000000L div greatest(n_truth, 1)").alias("recall_q"),
            F.expr("n_hits * 1000000L div greatest(n_candidates, 1)").alias(
                "precision_q"
            ),
        )
    )


def _minhash_pairs_sql_text() -> str:
    # defined after the minhash section below; resolved lazily at
    # registry-build time via the module attribute
    return Q_DEDUP_MINHASH_SQL


def _recall_sql() -> str:
    return f"""
WITH truth AS (
  SELECT id_a, id_b FROM ({_ngram_sql(_RECALL_TRUTH_J).strip().rstrip()})
),
cand AS (
  SELECT DISTINCT id_a, id_b FROM ({_minhash_pairs_sql_text().strip()})
),
hits AS (SELECT id_a, id_b FROM truth JOIN cand USING (id_a, id_b)),
agg AS (
  SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
         (SELECT COUNT(*) FROM cand) AS n_candidates,
         (SELECT COUNT(*) FROM hits) AS n_hits
)
SELECT n_truth, n_candidates, n_hits,
       n_hits * 1000000 // greatest(n_truth, 1) AS recall_q,
       n_hits * 1000000 // greatest(n_candidates, 1) AS precision_q
FROM agg
"""


# ---------------------------------------------------------------------------
# dedup: passage-level boilerplate
# ---------------------------------------------------------------------------

_PASSAGE_TOKENS = 10
_PASSAGE_MAX_DF = 3


def q_dedup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level boilerplate removal (C4-style line dedup over
    fixed 10-token spans): passages occurring in >3 documents are
    template noise; emits per-doc passage counts and the cleaned-text
    fingerprint for a follow-up exact pass."""
    return dedup.passage_boilerplate(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        passage_tokens=_PASSAGE_TOKENS,
        max_doc_freq=_PASSAGE_MAX_DF,
    )


Q_DEDUP_PASSAGES_SQL = f"""
WITH toked AS (
  SELECT doc_id AS doc, {_TOKS} AS toks FROM documents
),
passages AS (
  SELECT doc, CAST(i AS INT) - 1 AS pos,
         array_to_string(
           toks[(CAST(i AS INT) - 1) * {_PASSAGE_TOKENS} + 1
                : CAST(i AS INT) * {_PASSAGE_TOKENS}], ' ') AS passage
  FROM toked,
       unnest(range(1, CAST(ceil(len(toks) / {_PASSAGE_TOKENS}.0) AS INT) + 1))
         AS t(i)
),
hashed AS (SELECT doc, pos, passage, md5(passage) AS ph FROM passages),
freq AS (SELECT ph, COUNT(DISTINCT doc) AS pass_df FROM hashed GROUP BY ph),
flagged AS (
  SELECT h.doc, h.pos, h.passage, f.pass_df > {_PASSAGE_MAX_DF} AS is_boiler
  FROM hashed h JOIN freq f USING (ph)
)
SELECT doc,
       COUNT(*) AS n_passages,
       CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate,
       md5(coalesce(string_agg(passage, ' ' ORDER BY pos)
                      FILTER (WHERE NOT is_boiler), ''))
         AS cleaned_fp
FROM flagged
GROUP BY doc
"""


# ---------------------------------------------------------------------------
# dedup: winnowing fingerprints
# ---------------------------------------------------------------------------

# k=16/w=8: detect shared substrings >= 23 chars; the synthetic docs are
# template-generated and share short runs ubiquitously, so short grams
# make every pair a candidate. max_df=20 is the stop-fingerprint guard
# (a fingerprint present in >20 docs is template noise, not overlap
# signal — same role as the stop-shingle guard in the Jaccard pass).
_WIN_K, _WIN_W = 16, 8
_WIN_MIN_SHARED = 2
_WIN_MAX_DF = 20


def q_dedup_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed-fingerprint near-dup pairs (MOSS local fingerprinting):
    k-gram rolling hashes, window-minimum selection, inverted-index
    join on shared fingerprints. Detects *local* overlaps (any shared
    substring >= k+w-1 chars) that whole-document hashing misses, at
    ~1/w of the full shingle index's postings volume."""
    return dedup.winnow_pairs(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        k=_WIN_K,
        w=_WIN_W,
        min_shared=_WIN_MIN_SHARED,
        max_doc_freq=_WIN_MAX_DF,
    )


Q_DEDUP_WINNOW_SQL = f"""
WITH canon AS (SELECT doc_id, {_CANON} AS c FROM documents),
grams AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(c) - {_WIN_K - 1}, 1) + 1),
           i -> CAST(concat('0x',
                 substr(md5(substr(c, CAST(i AS INT), {_WIN_K})), 1, 8)) AS BIGINT)
         ) AS g
  FROM canon
),
fps AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(g) - {_WIN_W - 1}, 1) + 1),
           j -> list_aggregate(g[CAST(j AS INT):CAST(j + {_WIN_W - 1} AS INT)], 'min'))
         ) AS f
  FROM grams
),
posts AS (SELECT doc_id AS doc, unnest(f) AS fp FROM fps),
kept AS (
  SELECT p.doc, p.fp FROM posts p
  JOIN (SELECT fp FROM posts GROUP BY fp
        HAVING COUNT(*) <= {_WIN_MAX_DF}) ok USING (fp)
),
sizes AS (SELECT doc, COUNT(*) AS n_fp FROM kept GROUP BY doc),
pairs AS (
  SELECT a.doc AS id_a, b.doc AS id_b, COUNT(*) AS n_shared
  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc < b.doc
  GROUP BY 1, 2 HAVING COUNT(*) >= {_WIN_MIN_SHARED}
)
SELECT id_a, id_b, n_shared, sa.n_fp AS n_a, sb.n_fp AS n_b
FROM pairs
JOIN sizes sa ON sa.doc = id_a
JOIN sizes sb ON sb.doc = id_b
"""

# ---------------------------------------------------------------------------
# dedup: MinHash + LSH
# ---------------------------------------------------------------------------

_MH_HASHES, _MH_BANDS = 8, 4


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8)/LSH(4 bands) candidate pairs. The band bucket is the
    join key — candidates shuffle, the cross product never exists."""
    return dedup.minhash_lsh_dedup_pairs(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        num_hashes=_MH_HASHES,
        bands=_MH_BANDS,
        n=3,
    )


def _minhash_sql() -> str:
    mh = ",\n       ".join(
        f"min(md5('{i}:' || sh)) AS mh{i}" for i in range(_MH_HASHES)
    )
    r = _MH_HASHES // _MH_BANDS
    bands = ",\n       ".join(
        "md5(concat_ws(',', "
        + ", ".join(f"mh{i}" for i in range(b * r, (b + 1) * r))
        + f")) AS band{b}"
        for b in range(_MH_BANDS)
    )
    band_list = ", ".join(f"band{b}" for b in range(_MH_BANDS))
    return f"""
WITH canon AS (SELECT doc_id, {_CANON} AS c FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct([substr(c, CAST(i AS INT), 3)
                 for i in range(1, greatest(length(c) - 2, 1) + 1)])) AS sh
  FROM canon
),
mh AS (
  SELECT doc_id,
       {mh}
  FROM sh GROUP BY doc_id
),
bands AS (
  SELECT doc_id,
       {bands}
  FROM mh
),
stacked AS (SELECT doc_id, unnest([{band_list}]) AS bucket FROM bands)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM stacked a JOIN stacked b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
"""


Q_DEDUP_MINHASH_SQL = _minhash_sql()


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash-LSH dedup over the warehouse CDC feed — the
    operation a 100 TB ingest pipeline runs daily: newly landed
    documents (from ``read_changes`` on the bucketed corpus table)
    probe the *existing* band-postings index instead of recomputing the
    corpus (operators/dedup.py:lsh_probe_index).

    Scenario staged here: the corpus lands in a bucketed warehouse
    table as a base MERGE (snapshot v0) + a delta MERGE (every 10th
    doc, snapshot v1); the delta is recovered through the manifest-diff
    CDC feed, NOT from the source frame. Result = pairs(index) ∪
    probe(delta, index) — which the oracle (the full-recompute MinHash
    SQL over all documents) proves identical to one-shot dedup of the
    union. In production only the probe term runs per ingest; cost
    follows the delta, never the corpus.
    """
    import shutil as _sh
    import tempfile
    import time as _time
    import uuid as _uuid
    import os as _os

    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # scratch warehouse per invocation (same discipline as
    # queries.q_merge_upsert_bucketed: lazy readers outlive the call,
    # stale dirs swept opportunistically)
    base = _os.path.join(tempfile.gettempdir(), "kcbq_spark_incdedup")
    _os.makedirs(base, exist_ok=True)
    now = _time.time()
    for stale in _os.listdir(base):
        p = _os.path.join(base, stale)
        try:
            if now - _os.path.getmtime(p) > 3600:
                _sh.rmtree(p, ignore_errors=True)
        except OSError:
            pass
    wh = Warehouse(spark, _os.path.join(base, _uuid.uuid4().hex[:12]))
    spec = TableSpec(partition_grain="NONE", key_bucket_count=8)
    is_delta = F.pmod(F.col("doc_id"), F.lit(10)) == 0
    for pred in (~is_delta, is_delta):
        wh.merge(
            docs.filter(pred).withColumn("i", F.col("doc_id")),
            "docs",
            ["doc_id"],
            mode="upsert",
            order_col="i",
            spec=spec,
        )
    base_docs = wh.read("docs", version=0).select("doc_id", "text")
    delta_docs = (
        wh.read_changes("docs", from_version=0)
        .filter(F.col("_change_type").isin("insert", "update"))
        .select("doc_id", "text")
    )
    kw = dict(num_hashes=_MH_HASHES, bands=_MH_BANDS)
    sig_base = dedup.minhash_signature(
        base_docs, "doc_id", "text", n=3, num_hashes=_MH_HASHES
    )
    sig_delta = dedup.minhash_signature(
        delta_docs, "doc_id", "text", n=3, num_hashes=_MH_HASHES
    )
    idx = dedup.lsh_band_postings(sig_base, "doc_id", **kw)
    newp = dedup.lsh_band_postings(sig_delta, "doc_id", **kw)
    # pairs already known to the index (production keeps these), plus
    # the incremental probe for everything the delta introduces
    known_pairs = dedup.lsh_pairs_from_postings(idx)
    return known_pairs.unionByName(dedup.lsh_probe_index(newp, idx)).distinct()


# ---------------------------------------------------------------------------
# dedup: SimHash signatures
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 16


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 16-bit SimHash signatures (term-frequency-weighted
    bit votes over token md5s)."""
    return dedup.simhash(
        _t(spark, sf_dir, "documents"), "doc_id", "text", bits=_SIMHASH_BITS
    )


Q_DEDUP_SIMHASH_SQL = f"""
WITH canon AS (SELECT doc_id, {_CANON} AS c FROM documents),
tok AS (
  SELECT doc_id, md5(t.tok) AS h
  FROM canon, unnest(str_split(c, ' ')) AS t(tok)
),
bits AS (
  SELECT doc_id, h, CAST(g.b AS INT) AS b
  FROM tok, generate_series(0, {_SIMHASH_BITS - 1}) AS g(b)
),
votes AS (
  SELECT doc_id, b,
    SUM(CASE WHEN (CAST(FLOOR((instr('0123456789abcdef',
                 substr(h, CAST(FLOOR(b / 4) AS INT) + 1, 1)) - 1)
               / POWER(2.0, b % 4)) AS INT) % 2) = 1
        THEN 1 ELSE -1 END) AS v
  FROM bits GROUP BY 1, 2
)
SELECT doc_id,
       CAST(SUM(CASE WHEN v > 0 THEN CAST(POWER(2.0, b) AS BIGINT) ELSE 0 END)
         AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
"""

def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate PAIRS (the read side of the signature
    pass): pigeonhole segment blocking — two 16-bit signatures within
    Hamming distance 3 must share one of 4 whole segments, so the
    candidate join keys on (segment index, segment value), never the
    cross product — then the exact Hamming re-rank."""
    sigs = dedup.simhash(
        _t(spark, sf_dir, "documents"), "doc_id", "text", bits=_SIMHASH_BITS
    )
    return dedup.simhash_pairs(sigs, "doc_id", bits=_SIMHASH_BITS, max_hamming=3)


Q_DEDUP_SIMHASH_PAIRS_SQL = f"""
WITH sigs AS ({Q_DEDUP_SIMHASH_SQL}),
segs AS (
  SELECT doc_id, simhash, g.s AS si,
         CAST(FLOOR(simhash / POWER(2.0, g.s * 4)) AS BIGINT) % 16 AS sv
  FROM sigs, generate_series(0, 3) AS g(s)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM segs a JOIN segs b
    ON a.si = b.si AND a.sv = b.sv AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
"""


# ---------------------------------------------------------------------------
# dedup: duplicate clustering
# ---------------------------------------------------------------------------

def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: connected components over the MinHash/LSH
    candidate-pair graph; survivor = smallest doc_id per cluster."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_dedup_pairs(
        docs, "doc_id", "text", num_hashes=_MH_HASHES, bands=_MH_BANDS, n=3
    )
    cc = dedup.connected_components(
        docs.select(F.col("doc_id").alias("node")), pairs
    )
    return cc.select(
        F.col("node").alias("doc_id"),
        "component",
        (F.col("node") == F.col("component")).alias("is_survivor"),
    )


def _components_sql() -> str:
    return f"""
WITH RECURSIVE pairs AS ({_minhash_sql()}),
und AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT und.u, reach.r FROM und JOIN reach ON reach.node = und.v
)
SELECT node AS doc_id, min(r) AS component,
       (node = min(r)) AS is_survivor
FROM reach GROUP BY node
"""


Q_DEDUP_COMPONENTS_SQL = _components_sql()


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor SELECTION — the policy step after near-dup detection +
    clustering: per duplicate cluster (connected components over the
    MinHash/LSH pair graph, same machinery as `dedup_components`) keep
    the highest-quality document, quality = token count with ties to
    the smallest doc_id. `dedup_components`' min-id survivor is the
    arbitrary-but-deterministic baseline; real corpus curation keeps
    the best copy (longest, least truncated), not the first-seen one.

    Returns (component, cluster_size, survivor_id, survivor_tokens).
    Scale: the argmax is ONE struct-max aggregation on component (no
    window, no second shuffle) riding the same key partitioning as the
    cluster-size count; components/pairs are the LSH-blocked machinery
    that never goes O(n^2)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_dedup_pairs(
        docs, "doc_id", "text", num_hashes=_MH_HASHES, bands=_MH_BANDS, n=3
    )
    cc = dedup.connected_components(
        docs.select(F.col("doc_id").alias("node")), pairs
    )
    quality = docs.select(
        F.col("doc_id").alias("node"),
        text_fns.token_count(F.col("text")).cast("long").alias("q"),
    )
    j = cc.join(quality, "node")
    # lexicographic struct max = argmax(q, then smallest node): exact,
    # deterministic, and a plain partial-aggregable agg
    best = F.max(
        F.struct(
            F.col("q").alias("q"),
            (-F.col("node")).alias("neg_node"),
            F.col("node").alias("node"),
        )
    )
    return (
        j.groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cluster_size"),
            best.alias("_b"),
        )
        .select(
            "component",
            "cluster_size",
            F.col("_b.node").alias("survivor_id"),
            F.col("_b.q").alias("survivor_tokens"),
        )
    )


Q_DEDUP_KEEP_BEST_SQL = f"""
WITH RECURSIVE pairs AS ({_minhash_sql()}),
und AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT und.u, reach.r FROM und JOIN reach ON reach.node = und.v
),
cc AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
qual AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS q FROM documents
),
sel AS (
  SELECT cc.component, cc.node, qual.q
  FROM cc JOIN qual ON qual.doc_id = cc.node
),
ranked AS (
  SELECT component, node, q,
         row_number() OVER (PARTITION BY component
                            ORDER BY q DESC, node ASC) AS rk
  FROM sel
)
SELECT s.component,
       CAST(s.cluster_size AS BIGINT) AS cluster_size,
       r.node AS survivor_id,
       r.q AS survivor_tokens
FROM (SELECT component, COUNT(*) AS cluster_size FROM sel GROUP BY 1) s
JOIN ranked r ON r.component = s.component AND r.rk = 1
"""

# ---------------------------------------------------------------------------
# dedup: embedding cosine
# ---------------------------------------------------------------------------

_EMB_MIN_COS = 0.4


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact baseline; the LSH-bucketed
    variant is the 100 TB path — same operator with n_planes set)."""
    return dedup.embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), min_cosine=_EMB_MIN_COS
    )


Q_DEDUP_EMBEDDING_SQL = f"""
WITH el AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS d
  FROM embeddings
),
norms AS (
  SELECT vec_id, SUM(CAST(FLOOR(v * v * {_QE} + 0.5) AS BIGINT)) AS nq
  FROM el GROUP BY vec_id
),
dots AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         SUM(CAST(FLOOR(a.v * b.v * {_QE} + 0.5) AS BIGINT)) AS dq
  FROM el a JOIN el b ON a.d = b.d AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       (dq / {_QE}.0) / (sqrt(na.nq / {_QE}.0) * sqrt(nb.nq / {_QE}.0)) AS cosine
FROM dots
JOIN norms na ON na.vec_id = id_a
JOIN norms nb ON nb.vec_id = id_b
WHERE (dq / {_QE}.0) / (sqrt(na.nq / {_QE}.0) * sqrt(nb.nq / {_QE}.0)) >= {_EMB_MIN_COS}
"""

_CP_NEG = 4
_CP_POOL = 0.1


def q_pairs_contrastive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-pair mining (operators/sampling.py:contrastive_pairs)
    for embedding-model training: positives are the quantized-cosine
    near-dup pairs (label 1); each anchor gets 4 deterministic
    negatives from a shared hash-sampled pool (label 0) — the
    distributed in-batch-negatives construction, reproducible across
    runs/engines/partitionings so replayed jobs emit identical pairs."""
    from kafka_connect_bigquery_spark.operators import sampling

    emb = _t(spark, sf_dir, "embeddings")
    pos = dedup.embedding_near_dup_pairs(emb, min_cosine=_EMB_MIN_COS).select(
        "id_a", "id_b"
    )
    return sampling.contrastive_pairs(
        pos, emb, "vec_id", n_negatives=_CP_NEG, pool_rate=_CP_POOL
    )


def _hash_u_sql(salt: str, expr: str) -> str:
    return (
        f"CAST(concat('0x', substr(md5(concat('{salt}', {expr})), 1, 8))"
        " AS BIGINT) / 4294967296.0"
    )


Q_PAIRS_CONTRASTIVE_SQL = f"""
WITH el AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS d
  FROM embeddings
),
norms AS (
  SELECT vec_id, SUM(CAST(FLOOR(v * v * {_QE} + 0.5) AS BIGINT)) AS nq
  FROM el GROUP BY vec_id
),
dots AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         SUM(CAST(FLOOR(a.v * b.v * {_QE} + 0.5) AS BIGINT)) AS dq
  FROM el a JOIN el b ON a.d = b.d AND a.vec_id < b.vec_id
  GROUP BY 1, 2
),
pos AS (
  SELECT id_a AS anchor, id_b AS item FROM dots
  JOIN norms na ON na.vec_id = id_a
  JOIN norms nb ON nb.vec_id = id_b
  WHERE (dq / {_QE}.0) / (sqrt(na.nq / {_QE}.0) * sqrt(nb.nq / {_QE}.0))
        >= {_EMB_MIN_COS}
),
pos_sym AS (
  SELECT anchor, item FROM pos
  UNION ALL SELECT item, anchor FROM pos
),
anchors AS (SELECT DISTINCT anchor FROM pos),
pool AS (
  SELECT vec_id AS item FROM embeddings
  WHERE {_hash_u_sql("neg_pool", "CAST(vec_id AS VARCHAR)")} < {_CP_POOL}
),
cand AS (
  SELECT a.anchor, p.item FROM anchors a CROSS JOIN pool p
  WHERE a.anchor <> p.item
    AND NOT EXISTS (SELECT 1 FROM pos_sym s
                    WHERE s.anchor = a.anchor AND s.item = p.item)
),
negs AS (
  SELECT anchor, item FROM (
    SELECT anchor, item,
           row_number() OVER (
             PARTITION BY anchor
             ORDER BY {_hash_u_sql("neg",
                 "concat(CAST(anchor AS VARCHAR), ':', CAST(item AS VARCHAR))")},
               item) AS rk
    FROM cand
  ) WHERE rk <= {_CP_NEG}
)
SELECT anchor, item, 1 AS label FROM pos
UNION ALL
SELECT anchor, item, 0 AS label FROM negs
"""


# ---------------------------------------------------------------------------
# dedup: semantic (SemDeDup)
# ---------------------------------------------------------------------------

_SEM_LISTS = 8
_SEM_MIN_COS = 0.4


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: seeded coarse quantizer
    (8 lists, no Lloyd — closed-form, see ann.seed_centroids), within-
    cluster quantized-cosine near-dup marking, keep-min-id policy.
    The cluster id doubles as the blocking key, so this is the shape a
    100 TB semantic-dedup pass actually runs: assignment scan + one
    per-cluster equi-join."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = ann.seed_centroids(emb, k=_SEM_LISTS)
    return dedup.semantic_dedup(emb, cents, min_cosine=_SEM_MIN_COS)


Q_DEDUP_SEMANTIC_SQL = f"""
WITH el AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS d
  FROM embeddings
),
elq AS (
  SELECT vec_id, d, v, CAST(FLOOR(v * {ann.QD} + 0.5) AS BIGINT) AS vq FROM el
),
seeds AS (
  SELECT vec_id AS list_id, d, vq AS sq FROM elq WHERE vec_id < {_SEM_LISTS}
),
dists AS (
  SELECT e.vec_id, s.list_id,
         SUM((e.vq - s.sq) * (e.vq - s.sq)) AS dist
  FROM elq e JOIN seeds s ON e.d = s.d
  GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
    FROM dists
  ) WHERE rn = 1
),
norms AS (
  SELECT vec_id, SUM(CAST(FLOOR(v * v * {_QE} + 0.5) AS BIGINT)) AS nq
  FROM el GROUP BY vec_id
),
cand AS (
  SELECT a1.vec_id AS id_a, a2.vec_id AS id_b
  FROM assign a1 JOIN assign a2
    ON a1.list_id = a2.list_id AND a1.vec_id < a2.vec_id
),
dots AS (
  SELECT c.id_a, c.id_b,
         SUM(CAST(FLOOR(q.v * n.v * {_QE} + 0.5) AS BIGINT)) AS dq
  FROM cand c
  JOIN el q ON q.vec_id = c.id_a
  JOIN el n ON n.vec_id = c.id_b AND n.d = q.d
  GROUP BY 1, 2
),
losers AS (
  SELECT DISTINCT d.id_b AS vec_id
  FROM dots d
  JOIN norms n1 ON n1.vec_id = d.id_a
  JOIN norms n2 ON n2.vec_id = d.id_b
  WHERE (d.dq / {_QE}.0) / (sqrt(n1.nq / {_QE}.0) * sqrt(n2.nq / {_QE}.0))
        >= {_SEM_MIN_COS}
)
SELECT a.vec_id, CAST(a.list_id AS INT) AS list_id,
       (l.vec_id IS NULL) AS keep
FROM assign a LEFT JOIN losers l ON l.vec_id = a.vec_id
"""

# ---------------------------------------------------------------------------
# dedup: edit distance
# ---------------------------------------------------------------------------

_EDIT_MAX = 15


_EDIT_PREFIX = 64


def q_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance re-ranking of LSH candidates: exact Levenshtein
    (integer, engine-identical) over bounded canonical-text prefixes,
    only for pairs the MinHash/LSH stage already blocked. Two cost
    guards make the O(len²) DP survive corpus scale: the length-
    difference lower bound (|len_a-len_b| > τ ⇒ dist > τ) prunes
    before any DP runs, and the DP operates on fixed-size prefixes so
    per-pair cost is bounded regardless of document length."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_dedup_pairs(
        docs, "doc_id", "text", num_hashes=_MH_HASHES, bands=_MH_BANDS, n=3
    )
    canon = docs.select(
        F.col("doc_id"),
        F.substring(dedup.canonical_text(F.col("text")), 1, _EDIT_PREFIX).alias("c"),
    )
    a = canon.select(F.col("doc_id").alias("id_a"), F.col("c").alias("ca"))
    b = canon.select(F.col("doc_id").alias("id_b"), F.col("c").alias("cb"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .filter(
            F.abs(F.length("ca") - F.length("cb")) <= _EDIT_MAX
        )
        .withColumn("edit_dist", F.levenshtein(F.col("ca"), F.col("cb")).cast("long"))
        .filter(F.col("edit_dist") <= _EDIT_MAX)
        .select("id_a", "id_b", "edit_dist")
    )


def _edit_sql() -> str:
    return f"""
WITH pairs AS ({_minhash_sql()}),
canon AS (SELECT doc_id, substr({_CANON}, 1, {_EDIT_PREFIX}) AS c FROM documents)
SELECT id_a, id_b, CAST(levenshtein(a.c, b.c) AS BIGINT) AS edit_dist
FROM pairs
JOIN canon a ON a.doc_id = id_a
JOIN canon b ON b.doc_id = id_b
WHERE abs(length(a.c) - length(b.c)) <= {_EDIT_MAX}
  AND levenshtein(a.c, b.c) <= {_EDIT_MAX}
"""


Q_DEDUP_EDIT_SQL = _edit_sql()

# ---------------------------------------------------------------------------
# embedding dimension statistics (array explode analytics)
# ---------------------------------------------------------------------------

def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension statistics over the embedding column via
    posexplode — the lateral-view analytics shape; quantized sums keep
    the means exact. At scale this is one explode (row·dim) + one
    shuffle on the 64 dimension keys with map-side combine."""
    from kafka_connect_bigquery_spark.queries import _qsum, _qval

    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select(F.posexplode("embedding").alias("dim", "v"))
        .select(F.col("dim").cast("long").alias("dim"), F.col("v").cast("double").alias("v"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _qval(_qsum(F.col("v"))).alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
    )


Q_EMB_DIM_STATS_SQL = f"""
WITH el AS (
  SELECT CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS d
  FROM embeddings
)
SELECT CAST(d AS BIGINT) AS dim, COUNT(*) AS n,
       {_qsum_sql('v')} AS sum_v,
       MIN(v) AS min_v, MAX(v) AS max_v
FROM el GROUP BY 1
"""

def q_embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (class centroids — the nearest-class-
    mean / clustering-init primitive): posexplode to (label, dim, v),
    one shuffle on the small (label x dim) key space with map-side
    combine; means from quantized integer sums so the centroids are
    bit-identical on any partitioning."""
    from kafka_connect_bigquery_spark.queries import _qsum

    emb = _t(spark, sf_dir, "embeddings")
    g = (
        emb.select(F.col("label").cast("long").alias("label"),
                   F.posexplode("embedding").alias("dim", "v"))
        .select("label", F.col("dim").cast("long").alias("dim"),
                F.col("v").cast("double").alias("v"))
        .groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _qsum(F.col("v")).alias("_sq"),
        )
    )
    # mean = quantized-sum / (n * 1e4): one integer-exact division path
    return g.select(
        "label", "dim", "n",
        (F.col("_sq").cast("double") / (F.col("n") * 10_000.0)).alias("mean_v"),
    )


Q_EMB_LABEL_CENTROIDS_SQL = """
WITH el AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS d
  FROM embeddings
)
SELECT label, CAST(d AS BIGINT) AS dim, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(v * 10000 + 0.5) AS DECIMAL(38,0))) AS DOUBLE)
         / (COUNT(*) * 10000.0) AS mean_v
FROM el GROUP BY 1, 2
"""


_HIST_BUCKET = 100


def q_docs_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length distribution of the corpus in 100-token buckets —
    the first chart every dataset card shows; integer bucketing, one
    map-side-combinable groupBy."""
    from kafka_connect_bigquery_spark.functions import text as text_fns

    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            (
                F.floor(text_fns.subword_count(F.col("text")) / _HIST_BUCKET)
                * _HIST_BUCKET
            ).cast("long").alias("bucket_lo")
        )
        .groupBy("bucket_lo")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


Q_DOCS_LENGTH_HIST_SQL = f"""
SELECT CAST(({_SUBTOK_SQL} // {_HIST_BUCKET}) * {_HIST_BUCKET} AS BIGINT) AS bucket_lo,
       COUNT(*) AS n_docs
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_ANN_K = 5
_ANN_NQ = 10  # query vectors: vec_id < 10


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 for the first 10 query vectors.
    Baseline for the LSH variant; quantized-integer dot products make
    ranks engine- and partitioning-independent."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _ANN_NQ)
    return ann.cosine_topk(queries, emb, k=_ANN_K)


def _ann_sql(bucketed: bool) -> str:
    bucket_cte = ""
    dots_from = (
        f"FROM el q JOIN el c ON q.d = c.d AND q.vec_id < {_ANN_NQ}"
        " AND c.vec_id <> q.vec_id"
    )
    if bucketed:
        plane_terms = ",\n      ".join(
            f"CASE WHEN SUM(CAST(FLOOR(v * {_QE} + 0.5) AS BIGINT) * "
            f"(CASE WHEN ({p} * 1009 + d * 9176 + 2027) % 7 < 3 THEN -1 ELSE 1 END)) > 0 "
            f"THEN {2**p} ELSE 0 END AS p{p}"
            for p in range(_ANN_PLANES)
        )
        bucket_sum = " + ".join(f"p{p}" for p in range(_ANN_PLANES))
        bucket_cte = f""",
buckets AS (
  SELECT vec_id, {bucket_sum} AS bucket FROM (
    SELECT vec_id,
      {plane_terms}
    FROM el GROUP BY vec_id
  )
)"""
        dots_from += (
            "\n       JOIN buckets bq ON bq.vec_id = q.vec_id"
            "\n       JOIN buckets bc ON bc.vec_id = c.vec_id AND bq.bucket = bc.bucket"
        )
    return f"""
WITH el AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS d
  FROM embeddings
),
norms AS (
  SELECT vec_id, SUM(CAST(FLOOR(v * v * {_QE} + 0.5) AS BIGINT)) AS nq
  FROM el GROUP BY vec_id
){bucket_cte},
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         SUM(CAST(FLOOR(q.v * c.v * {_QE} + 0.5) AS BIGINT)) AS dq
  {dots_from}
  GROUP BY 1, 2
),
scored AS (
  SELECT query_id, neighbor_id,
         (dq / {_QE}.0) / (sqrt(nq_q / {_QE}.0) * sqrt(nq_c / {_QE}.0)) AS cosine
  FROM (
    SELECT d.query_id, d.neighbor_id, d.dq, nq1.nq AS nq_q, nq2.nq AS nq_c
    FROM dots d
    JOIN norms nq1 ON nq1.vec_id = d.query_id
    JOIN norms nq2 ON nq2.vec_id = d.neighbor_id
  )
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {_ANN_K}
"""


Q_ANN_COSINE_SQL = _ann_sql(bucketed=False)

_ANN_PLANES = 6


_IVF_LISTS = 8
_IVF_PROBE = 2


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 with a *seeded* coarse quantizer: the 8
    init centroids (smallest vec_ids) without Lloyd refinement, probing
    the 2 nearest lists per query. Seeding makes the whole pipeline a
    closed-form function of the input, so the SQL oracle reproduces it
    bit-exactly (quantized integer distances, see operators/ann.py).
    The iterative ``kmeans_fit`` refinement is covered by unit tests
    (n_probe = n_lists degrades to exact brute force)."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = ann.seed_centroids(emb, k=_IVF_LISTS)
    queries = emb.filter(F.col("vec_id") < _ANN_NQ)
    return ann.ivf_topk(queries, emb, cents, k=_ANN_K, n_probe=_IVF_PROBE)


_QD = ann.QD

Q_ANN_IVF_SQL = f"""
WITH el AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS d
  FROM embeddings
),
elq AS (
  SELECT vec_id, d, v, CAST(FLOOR(v * {_QD} + 0.5) AS BIGINT) AS vq FROM el
),
seeds AS (
  SELECT vec_id AS list_id, d, vq AS sq FROM elq WHERE vec_id < {_IVF_LISTS}
),
dists AS (
  SELECT e.vec_id, s.list_id,
         SUM((e.vq - s.sq) * (e.vq - s.sq)) AS dist
  FROM elq e JOIN seeds s ON e.d = s.d
  GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
    FROM dists
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
    FROM dists WHERE vec_id < {_ANN_NQ}
  ) WHERE rn <= {_IVF_PROBE}
),
norms AS (
  SELECT vec_id, SUM(CAST(FLOOR(v * v * {_QE} + 0.5) AS BIGINT)) AS nq
  FROM el GROUP BY vec_id
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a ON a.list_id = p.list_id
  WHERE a.vec_id <> p.query_id
),
dots AS (
  SELECT c.query_id, c.neighbor_id,
         SUM(CAST(FLOOR(q.v * n.v * {_QE} + 0.5) AS BIGINT)) AS dq
  FROM cand c
  JOIN el q ON q.vec_id = c.query_id
  JOIN el n ON n.vec_id = c.neighbor_id AND n.d = q.d
  GROUP BY 1, 2
),
scored AS (
  SELECT d.query_id, d.neighbor_id,
         (d.dq / {_QE}.0) / (sqrt(nq1.nq / {_QE}.0) * sqrt(nq2.nq / {_QE}.0)) AS cosine
  FROM dots d
  JOIN norms nq1 ON nq1.vec_id = d.query_id
  JOIN norms nq2 ON nq2.vec_id = d.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {_ANN_K}
"""


def q_ann_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance over the warehouse CDC feed —
    the embedding-side twin of ``dedup_incremental``: the corpus lands
    in a bucketed table as base MERGE (v0) + delta MERGE (every 10th
    vector, v1); the coarse quantizer is seeded from the BASE build and
    the delta — recovered through manifest-diff CDC, not the source
    frame — is assigned to the *existing* centroids. Result = base
    assignment ∪ delta assignment, which the oracle (one-shot
    assignment of the whole table to the same seeds) proves identical
    to a full index rebuild. In production only the delta term runs
    per ingest: a 100 TB ANN index absorbs a day's embeddings at
    delta cost, centroids untouched."""
    import os as _os
    import shutil as _sh
    import tempfile
    import time as _time
    import uuid as _uuid

    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = _os.path.join(tempfile.gettempdir(), "kcbq_spark_incann")
    _os.makedirs(base, exist_ok=True)
    now = _time.time()
    for stale in _os.listdir(base):
        p = _os.path.join(base, stale)
        try:
            if now - _os.path.getmtime(p) > 3600:
                _sh.rmtree(p, ignore_errors=True)
        except OSError:
            pass
    wh = Warehouse(spark, _os.path.join(base, _uuid.uuid4().hex[:12]))
    spec = TableSpec(partition_grain="NONE", key_bucket_count=8)
    is_delta = F.pmod(F.col("vec_id"), F.lit(10)) == 0
    for pred in (~is_delta, is_delta):
        wh.merge(
            emb.filter(pred).withColumn("i", F.col("vec_id")),
            "vecs",
            ["vec_id"],
            mode="upsert",
            order_col="i",
            spec=spec,
        )
    base_vecs = wh.read("vecs", version=0).select("vec_id", "embedding")
    cents = ann.seed_centroids(base_vecs, k=_IVF_LISTS)
    delta_vecs = (
        wh.read_changes("vecs", from_version=0)
        .filter(F.col("_change_type").isin("insert", "update"))
        .select("vec_id", "embedding")
    )
    assign = lambda d: d.select(  # noqa: E731
        "vec_id", ann.assign_list("embedding", cents).alias("list_id")
    )
    return assign(base_vecs).unionByName(assign(delta_vecs))


Q_ANN_INCREMENTAL_SQL = f"""
WITH el AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS d
  FROM embeddings
),
elq AS (
  SELECT vec_id, d, CAST(FLOOR(v * {_QD} + 0.5) AS BIGINT) AS vq FROM el
),
seed_rank AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS list_id
  FROM (SELECT vec_id FROM embeddings WHERE vec_id % 10 <> 0
        ORDER BY vec_id LIMIT {_IVF_LISTS})
),
seeds AS (
  SELECT r.list_id, e.d, e.vq AS sq FROM seed_rank r JOIN elq e USING (vec_id)
),
dists AS (
  SELECT e.vec_id, s.list_id,
         SUM((e.vq - s.sq) * (e.vq - s.sq)) AS dist
  FROM elq e JOIN seeds s ON e.d = s.d
  GROUP BY 1, 2
)
SELECT vec_id, list_id FROM (
  SELECT vec_id, list_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
  FROM dists
) WHERE rn = 1
"""


def _scratch_wh(spark, key: str):
    """A throwaway Warehouse root under tmp with the staged entries'
    stale-dir sweep (same convention as q_warehouse_text_search)."""
    import os as _os
    import shutil as _sh
    import tempfile
    import time as _time
    import uuid as _uuid

    from kafka_connect_bigquery_spark.sinks.warehouse import Warehouse

    base = _os.path.join(tempfile.gettempdir(), f"kcbq_spark_{key}")
    _os.makedirs(base, exist_ok=True)
    now = _time.time()
    for stale in _os.listdir(base):
        p = _os.path.join(base, stale)
        try:
            if now - _os.path.getmtime(p) > 3600:
                _sh.rmtree(p, ignore_errors=True)
        except OSError:
            pass
    return Warehouse(spark, _os.path.join(base, _uuid.uuid4().hex[:12]))


def q_warehouse_ann_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector similarity through the TABLE-ATTACHED ANN index
    (sinks/warehouse.py::record_ann/read_nearest) — the index modality
    that completes the bloom/zonemap/HLL/text family: embeddings land
    in TWO appends (the second refreshes the recorded per-file list
    memberships incrementally against the FROZEN seeded quantizer,
    new files only) and the probe answers "5 nearest to vec 1's
    embedding" exactly within the 2 probed inverted lists, skipping
    files proven to hold no probed-list vector. Seeding (8 smallest
    vec_ids of the FIRST append = the even ids 0..14) makes the whole
    pipeline closed-form, so the oracle reproduces it bit-exactly with
    the same quantized integer distances as Q_ANN_IVF_SQL. A wrongly
    skipped file loses candidate rows and hash-mismatches."""
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    wh = _scratch_wh(spark, "annidx")
    spec = TableSpec(partition_grain="NONE")
    wh.append(emb.filter(F.col("vec_id") % 2 == 0), "vecs", spec)
    wh.record_ann("vecs", "embedding", id_col="vec_id", n_lists=_IVF_LISTS)
    wh.append(emb.filter(F.col("vec_id") % 2 == 1), "vecs", spec)  # incremental
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]
    ]
    return wh.read_nearest(
        "vecs", "embedding", qv, k=_ANN_K, n_probe=_IVF_PROBE
    )


Q_WAREHOUSE_ANN_SQL = f"""
WITH el AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS d
  FROM embeddings
),
elq AS (
  SELECT vec_id, d, v, CAST(FLOOR(v * {_QD} + 0.5) AS BIGINT) AS vq FROM el
),
seeds AS (
  SELECT r.list_id, e.d, e.vq AS sq
  FROM (
    SELECT vec_id,
           CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS list_id
    FROM (SELECT vec_id FROM embeddings WHERE vec_id % 2 = 0
          ORDER BY vec_id LIMIT {_IVF_LISTS})
  ) r JOIN elq e USING (vec_id)
),
dists AS (
  SELECT e.vec_id, s.list_id,
         SUM((e.vq - s.sq) * (e.vq - s.sq)) AS dist
  FROM elq e JOIN seeds s ON e.d = s.d
  GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
    FROM dists
  ) WHERE rn = 1
),
probes AS (
  SELECT list_id FROM (
    SELECT list_id,
           row_number() OVER (ORDER BY dist, list_id) AS rn
    FROM dists WHERE vec_id = 1
  ) WHERE rn <= {_IVF_PROBE}
),
norms AS (
  SELECT vec_id, SUM(CAST(FLOOR(v * v * {_QE} + 0.5) AS BIGINT)) AS nq
  FROM el GROUP BY vec_id
),
cand AS (
  SELECT a.vec_id AS neighbor_id
  FROM assign a JOIN probes p ON a.list_id = p.list_id
),
dots AS (
  SELECT c.neighbor_id,
         SUM(CAST(FLOOR(q.v * n.v * {_QE} + 0.5) AS BIGINT)) AS dq
  FROM cand c
  JOIN el n ON n.vec_id = c.neighbor_id
  JOIN el q ON q.vec_id = 1 AND q.d = n.d
  GROUP BY 1
)
SELECT neighbor_id, cosine, rank FROM (
  SELECT d.neighbor_id,
         (d.dq / {_QE}.0) /
         (sqrt(nq.nq / {_QE}.0) * sqrt(nn.nq / {_QE}.0)) AS cosine,
         CAST(row_number() OVER (
              ORDER BY (d.dq / {_QE}.0) /
                       (sqrt(nq.nq / {_QE}.0) * sqrt(nn.nq / {_QE}.0)) DESC,
                       d.neighbor_id) AS INT) AS rank
  FROM dots d
  JOIN norms nq ON nq.vec_id = 1
  JOIN norms nn ON nn.vec_id = d.neighbor_id
) WHERE rank <= {_ANN_K}
"""


def q_warehouse_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC through the warehouse: PQ codes PERSISTED in the table's
    `_ann` index (sinks/warehouse.py::record_ann(pq_m=...) /
    read_nearest_pq) — candidate generation + ADC scoring read m
    stored ints per vector from `_ann/codes/`, and only the shortlist
    survivors' raw embeddings are read for the exact re-rank. Staging
    mirrors warehouse_ann_read (two appends; the second encodes its
    files incrementally against the FROZEN seeded quantizer AND frozen
    seeded codebooks), so centroids = the 8 smallest EVEN vec_ids and
    codebook entry j = the quantized residual of the j-th smallest
    EVEN vec_id — closed form end to end, letting the oracle reproduce
    encoding, the driver-computed ADC tables, the shortlist, and the
    re-rank bit-exactly. A wrong stored code, a wrongly skipped file,
    or a shortlist perturbation all hash-mismatch."""
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    wh = _scratch_wh(spark, "annpq")
    spec = TableSpec(partition_grain="NONE")
    wh.append(emb.filter(F.col("vec_id") % 2 == 0), "vecs", spec)
    wh.record_ann(
        "vecs", "embedding", id_col="vec_id", n_lists=_IVF_LISTS,
        pq_m=_PQ_M, pq_ksub=_PQ_KSUB,
    )
    wh.append(emb.filter(F.col("vec_id") % 2 == 1), "vecs", spec)  # incremental
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]
    ]
    return wh.read_nearest_pq(
        "vecs", "embedding", qv,
        k=_ANN_K, n_probe=_IVF_PROBE, shortlist=_PQ_SHORTLIST,
    )


def q_warehouse_ann_pq_many(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch IVFADC through the warehouse
    (sinks/warehouse.py::read_nearest_pq_many): a FRAME of query
    vectors (the first 10 embeddings, the retrieval-request shape)
    answered in one job against the STORED PQ codes — per query, ADC
    over its 2 nearest frozen lists reading m stored ints per
    candidate, a 20-deep shortlist, exact cosine re-rank touching only
    shortlisted raw vectors, self-matches excluded (the dedup shape).
    Same closed-form staging as warehouse_ann_pq (even-id seeds and
    codebooks, incremental second append), so the oracle reproduces
    the whole pipeline bit-exactly per query."""
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    wh = _scratch_wh(spark, "annpqmany")
    spec = TableSpec(partition_grain="NONE")
    wh.append(emb.filter(F.col("vec_id") % 2 == 0), "vecs", spec)
    wh.record_ann(
        "vecs", "embedding", id_col="vec_id", n_lists=_IVF_LISTS,
        pq_m=_PQ_M, pq_ksub=_PQ_KSUB,
    )
    wh.append(emb.filter(F.col("vec_id") % 2 == 1), "vecs", spec)  # incremental
    queries = emb.filter(F.col("vec_id") < _ANN_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return wh.read_nearest_pq_many(
        "vecs", "embedding", queries,
        k=_ANN_K, n_probe=_IVF_PROBE, shortlist=_PQ_SHORTLIST,
        exclude_self=True,
    )


def q_warehouse_ann_many(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch form of the warehouse ANN probe
    (sinks/warehouse.py::read_nearest_many) — a FRAME of query vectors
    (the first 10 embeddings, the retrieval-request shape) answered in
    one job against the table-attached index: per query, exact top-5
    within its 2 nearest frozen-quantizer lists, self-matches excluded
    (the dedup shape). Same staging as warehouse_ann_read (two appends,
    the second refreshing the index incrementally); the oracle is the
    closed-form IVF SQL with seeds = the 8 smallest EVEN vec_ids (the
    record-time corpus)."""
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    wh = _scratch_wh(spark, "annmany")
    spec = TableSpec(partition_grain="NONE")
    wh.append(emb.filter(F.col("vec_id") % 2 == 0), "vecs", spec)
    wh.record_ann("vecs", "embedding", id_col="vec_id", n_lists=_IVF_LISTS)
    wh.append(emb.filter(F.col("vec_id") % 2 == 1), "vecs", spec)  # incremental
    queries = emb.filter(F.col("vec_id") < _ANN_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return wh.read_nearest_many(
        "vecs", "embedding", queries,
        k=_ANN_K, n_probe=_IVF_PROBE, exclude_self=True,
    )


Q_WAREHOUSE_ANN_MANY_SQL = f"""
WITH el AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS d
  FROM embeddings
),
elq AS (
  SELECT vec_id, d, v, CAST(FLOOR(v * {_QD} + 0.5) AS BIGINT) AS vq FROM el
),
seeds AS (
  SELECT r.list_id, e.d, e.vq AS sq
  FROM (
    SELECT vec_id,
           CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS list_id
    FROM (SELECT vec_id FROM embeddings WHERE vec_id % 2 = 0
          ORDER BY vec_id LIMIT {_IVF_LISTS})
  ) r JOIN elq e USING (vec_id)
),
dists AS (
  SELECT e.vec_id, s.list_id,
         SUM((e.vq - s.sq) * (e.vq - s.sq)) AS dist
  FROM elq e JOIN seeds s ON e.d = s.d
  GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
    FROM dists
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
    FROM dists WHERE vec_id < {_ANN_NQ}
  ) WHERE rn <= {_IVF_PROBE}
),
norms AS (
  SELECT vec_id, SUM(CAST(FLOOR(v * v * {_QE} + 0.5) AS BIGINT)) AS nq
  FROM el GROUP BY vec_id
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a ON a.list_id = p.list_id
  WHERE a.vec_id <> p.query_id
),
dots AS (
  SELECT c.query_id, c.neighbor_id,
         SUM(CAST(FLOOR(q.v * n.v * {_QE} + 0.5) AS BIGINT)) AS dq
  FROM cand c
  JOIN el q ON q.vec_id = c.query_id
  JOIN el n ON n.vec_id = c.neighbor_id AND n.d = q.d
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT d.query_id, d.neighbor_id,
         (d.dq / {_QE}.0) /
         (sqrt(nq1.nq / {_QE}.0) * sqrt(nq2.nq / {_QE}.0)) AS cosine,
         CAST(row_number() OVER (PARTITION BY d.query_id
              ORDER BY (d.dq / {_QE}.0) /
                       (sqrt(nq1.nq / {_QE}.0) * sqrt(nq2.nq / {_QE}.0)) DESC,
                       d.neighbor_id) AS INT) AS rank
  FROM dots d
  JOIN norms nq1 ON nq1.vec_id = d.query_id
  JOIN norms nq2 ON nq2.vec_id = d.neighbor_id
) WHERE rank <= {_ANN_K}
"""


def q_warehouse_ann_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warehouse ANN index with a Lloyd-REFINED quantizer
    (``record_ann(kmeans_iters=1)``) — the production configuration,
    proven oracle-checkable end-to-end: the quantizer trains on the
    record-time corpus (the even-vec_id first append: seeds = its 8
    smallest ids, one deterministic Lloyd iteration over it), FREEZES,
    the odd-id append refreshes the index incrementally against it,
    and the probe answers top-5 for vec 1's embedding within 2 lists.
    The oracle composes the kmeans-iteration CTEs (op-order-identical
    IEEE arithmetic) with the IVF probe CTEs."""
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    wh = _scratch_wh(spark, "annref")
    spec = TableSpec(partition_grain="NONE")
    wh.append(emb.filter(F.col("vec_id") % 2 == 0), "vecs", spec)
    wh.record_ann(
        "vecs", "embedding", id_col="vec_id",
        n_lists=_IVF_LISTS, kmeans_iters=1,
    )
    wh.append(emb.filter(F.col("vec_id") % 2 == 1), "vecs", spec)  # incremental
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]
    ]
    return wh.read_nearest(
        "vecs", "embedding", qv, k=_ANN_K, n_probe=_IVF_PROBE
    )


Q_WAREHOUSE_ANN_REFINED_SQL = f"""
WITH el AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS d
  FROM embeddings
),
elq AS (
  SELECT vec_id, d, v, CAST(FLOOR(v * {_QD} + 0.5) AS BIGINT) AS vq FROM el
),
-- quantizer training corpus = the record-time (even-id) append
s0 AS (
  SELECT r.list_id, e.d, e.vq AS sq
  FROM (
    SELECT vec_id,
           CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS list_id
    FROM (SELECT vec_id FROM embeddings WHERE vec_id % 2 = 0
          ORDER BY vec_id LIMIT {_IVF_LISTS})
  ) r JOIN elq e USING (vec_id)
),
d0 AS (
  SELECT e.vec_id, s.list_id, SUM((e.vq - s.sq) * (e.vq - s.sq)) AS dist
  FROM elq e JOIN s0 s ON e.d = s.d
  WHERE e.vec_id % 2 = 0
  GROUP BY 1, 2
),
a0 AS (
  SELECT vec_id, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
    FROM d0
  ) WHERE rn = 1
),
m1 AS (
  SELECT a.list_id, e.d,
         CAST(FLOOR(((CAST(SUM(e.vq) AS DOUBLE) / COUNT(*)) / {_QD}.0)
                    * {_QD} + 0.5) AS BIGINT) AS cq
  FROM a0 a JOIN elq e USING (vec_id)
  GROUP BY 1, 2
),
s1 AS (
  SELECT s0.list_id, s0.d, COALESCE(m1.cq, s0.sq) AS sq
  FROM s0 LEFT JOIN m1 ON m1.list_id = s0.list_id AND m1.d = s0.d
),
-- frozen refined quantizer: assignment of the FULL corpus + the probe
dists AS (
  SELECT e.vec_id, s.list_id, SUM((e.vq - s.sq) * (e.vq - s.sq)) AS dist
  FROM elq e JOIN s1 s ON e.d = s.d GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
    FROM dists
  ) WHERE rn = 1
),
probes AS (
  SELECT list_id FROM (
    SELECT list_id, row_number() OVER (ORDER BY dist, list_id) AS rn
    FROM dists WHERE vec_id = 1
  ) WHERE rn <= {_IVF_PROBE}
),
norms AS (
  SELECT vec_id, SUM(CAST(FLOOR(v * v * {_QE} + 0.5) AS BIGINT)) AS nq
  FROM el GROUP BY vec_id
),
cand AS (
  SELECT a.vec_id AS neighbor_id
  FROM assign a JOIN probes p ON a.list_id = p.list_id
),
dots AS (
  SELECT c.neighbor_id,
         SUM(CAST(FLOOR(q.v * n.v * {_QE} + 0.5) AS BIGINT)) AS dq
  FROM cand c
  JOIN el n ON n.vec_id = c.neighbor_id
  JOIN el q ON q.vec_id = 1 AND q.d = n.d
  GROUP BY 1
)
SELECT neighbor_id, cosine, rank FROM (
  SELECT d.neighbor_id,
         (d.dq / {_QE}.0) /
         (sqrt(nq.nq / {_QE}.0) * sqrt(nn.nq / {_QE}.0)) AS cosine,
         CAST(row_number() OVER (
              ORDER BY (d.dq / {_QE}.0) /
                       (sqrt(nq.nq / {_QE}.0) * sqrt(nn.nq / {_QE}.0)) DESC,
                       d.neighbor_id) AS INT) AS rank
  FROM dots d
  JOIN norms nq ON nq.vec_id = 1
  JOIN norms nn ON nn.vec_id = d.neighbor_id
) WHERE rank <= {_ANN_K}
"""


def q_warehouse_ann_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN index's bucketed-MERGE twin: the corpus lands as base
    MERGE (vec_id % 10 != 0) + delta MERGE (every 10th vector) into a
    key-bucketed table; ``record_ann`` after the base freezes the
    quantizer (seeds = 8 smallest base vec_ids), the delta merge's
    post-commit hook indexes the NEW generations incrementally, and
    superseded generations' index rows go dead harmlessly (the probe
    iterates the manifest-resolved live set). The probe for vec 0's
    embedding — itself a delta row — must equal the closed-form oracle
    over the full corpus."""
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    wh = _scratch_wh(spark, "annbkt")
    spec = TableSpec(partition_grain="NONE", key_bucket_count=8)
    is_delta = F.pmod(F.col("vec_id"), F.lit(10)) == 0
    wh.merge(
        emb.filter(~is_delta).withColumn("i", F.col("vec_id")),
        "vecs", ["vec_id"], mode="upsert", order_col="i", spec=spec,
    )
    wh.record_ann("vecs", "embedding", id_col="vec_id", n_lists=_IVF_LISTS)
    wh.merge(
        emb.filter(is_delta).withColumn("i", F.col("vec_id")),
        "vecs", ["vec_id"], mode="upsert", order_col="i", spec=spec,
    )
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    return wh.read_nearest(
        "vecs", "embedding", qv, k=_ANN_K, n_probe=_IVF_PROBE
    )


Q_WAREHOUSE_ANN_BUCKETED_SQL = f"""
WITH el AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS d
  FROM embeddings
),
elq AS (
  SELECT vec_id, d, v, CAST(FLOOR(v * {_QD} + 0.5) AS BIGINT) AS vq FROM el
),
seeds AS (
  SELECT r.list_id, e.d, e.vq AS sq
  FROM (
    SELECT vec_id,
           CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS list_id
    FROM (SELECT vec_id FROM embeddings WHERE vec_id % 10 <> 0
          ORDER BY vec_id LIMIT {_IVF_LISTS})
  ) r JOIN elq e USING (vec_id)
),
dists AS (
  SELECT e.vec_id, s.list_id,
         SUM((e.vq - s.sq) * (e.vq - s.sq)) AS dist
  FROM elq e JOIN seeds s ON e.d = s.d
  GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
    FROM dists
  ) WHERE rn = 1
),
probes AS (
  SELECT list_id FROM (
    SELECT list_id,
           row_number() OVER (ORDER BY dist, list_id) AS rn
    FROM dists WHERE vec_id = 0
  ) WHERE rn <= {_IVF_PROBE}
),
norms AS (
  SELECT vec_id, SUM(CAST(FLOOR(v * v * {_QE} + 0.5) AS BIGINT)) AS nq
  FROM el GROUP BY vec_id
),
cand AS (
  SELECT a.vec_id AS neighbor_id
  FROM assign a JOIN probes p ON a.list_id = p.list_id
),
dots AS (
  SELECT c.neighbor_id,
         SUM(CAST(FLOOR(q.v * n.v * {_QE} + 0.5) AS BIGINT)) AS dq
  FROM cand c
  JOIN el n ON n.vec_id = c.neighbor_id
  JOIN el q ON q.vec_id = 0 AND q.d = n.d
  GROUP BY 1
)
SELECT neighbor_id, cosine, rank FROM (
  SELECT d.neighbor_id,
         (d.dq / {_QE}.0) /
         (sqrt(nq.nq / {_QE}.0) * sqrt(nn.nq / {_QE}.0)) AS cosine,
         CAST(row_number() OVER (
              ORDER BY (d.dq / {_QE}.0) /
                       (sqrt(nq.nq / {_QE}.0) * sqrt(nn.nq / {_QE}.0)) DESC,
                       d.neighbor_id) AS INT) AS rank
  FROM dots d
  JOIN norms nq ON nq.vec_id = 0
  JOIN norms nn ON nn.vec_id = d.neighbor_id
) WHERE rank <= {_ANN_K}
"""


def q_pretrain_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed incremental pretraining tick
    (pipelines/pretrain.py::incremental_tick) — the 100 TB operating
    shape the individually-oracled operators were built for: documents
    land in THREE appends (ascending doc_id terciles — the
    ingest-monotonic shape); each tick reads ONLY its delta via
    ``read_appended``, quality-gates it, exact-dedups it against the
    accumulated fingerprint table, near-dedups it by PROBING the
    accumulated LSH band-postings index (``lsh_probe_index`` — the
    corpus is never re-signed or self-joined), and appends survivors +
    index rows. The oracle is the one-shot batch over the full corpus:
    gate → min-id-per-fingerprint → LSH pairs → drop every id_b — so
    the tick decomposition provably loses and invents nothing."""
    from kafka_connect_bigquery_spark.functions.text import token_count
    from kafka_connect_bigquery_spark.pipelines.pretrain import (
        CorpusConfig,
        PretrainTickTables,
        incremental_tick,
    )
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # ascending terciles: two bounded 1-row collects for the cut points
    hi = docs.agg(F.max("doc_id")).first()[0]
    c1, c2 = hi // 3, 2 * hi // 3
    wh = _scratch_wh(spark, "pretrain")
    spec = TableSpec(partition_grain="NONE")
    cfg = CorpusConfig(
        min_quality=0.2,
        minhash_hashes=_PRETRAIN_MH,
        minhash_bands=_PRETRAIN_BANDS,
    )
    tables = PretrainTickTables()
    cursor = None
    art = None
    for pred in (
        F.col("doc_id") <= c1,
        (F.col("doc_id") > c1) & (F.col("doc_id") <= c2),
        F.col("doc_id") > c2,
    ):
        wh.append(docs.filter(pred), "corpus", spec)
        art = incremental_tick(wh, "corpus", cursor, tables=tables, cfg=cfg)
        cursor = art["cursor"]
    return art["survivors"].select(
        "doc_id", token_count(F.col("text")).cast("bigint").alias("n_tok")
    )


# stricter banding than the dedup entries (r = 4 rows/band): the
# template-heavy synthetic corpus collapses almost entirely under the
# permissive 8/4 scheme, leaving too thin a witness
_PRETRAIN_MH, _PRETRAIN_BANDS = 16, 4


def _pretrain_inc_sql() -> str:
    mh = ",\n       ".join(
        f"min(md5('{i}:' || sh)) AS mh{i}" for i in range(_PRETRAIN_MH)
    )
    r = _PRETRAIN_MH // _PRETRAIN_BANDS
    bands = ",\n       ".join(
        "md5(concat_ws(',', "
        + ", ".join(f"mh{i}" for i in range(b * r, (b + 1) * r))
        + f")) AS band{b}"
        for b in range(_PRETRAIN_BANDS)
    )
    band_list = ", ".join(f"band{b}" for b in range(_PRETRAIN_BANDS))
    stops = ", ".join(f"'{m}'" for m in text_fns.LANG_MARKERS["en"])
    quality = (
        "0.25 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)"
        " + 0.25 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))"
        " AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE))"
        f" + 0.25 * least((CAST(len(list_filter(toks, t -> t IN ({stops})))"
        " AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE)) * 5, 1.0)"
        " + 0.25 * (CAST(len(list_distinct(toks)) AS DOUBLE)"
        " / CAST(greatest(len(toks), 1) AS DOUBLE))"
    )
    return f"""
WITH toked AS (
  SELECT doc_id, text, {_CANON} AS c, {_TOKS} AS toks FROM documents
),
gated AS (
  SELECT doc_id, text, c, toks FROM toked WHERE {quality} >= 0.2
),
fp AS (SELECT doc_id, c, toks, md5(c) AS fp FROM gated),
exact AS (
  SELECT f.doc_id, f.c, f.toks FROM fp f
  JOIN (SELECT fp, min(doc_id) AS doc_id FROM fp GROUP BY fp) k
    ON f.fp = k.fp AND f.doc_id = k.doc_id
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct([substr(c, CAST(i AS INT), 3)
                 for i in range(1, greatest(length(c) - 2, 1) + 1)])) AS sh
  FROM exact
),
mh AS (
  SELECT doc_id,
       {mh}
  FROM sh GROUP BY doc_id
),
bands AS (
  SELECT doc_id,
       {bands}
  FROM mh
),
stacked AS (SELECT doc_id, unnest([{band_list}]) AS bucket FROM bands),
losers AS (
  SELECT DISTINCT b.doc_id AS doc_id
  FROM stacked a JOIN stacked b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT e.doc_id, CAST(len(e.toks) AS BIGINT) AS n_tok
FROM exact e
WHERE e.doc_id NOT IN (SELECT doc_id FROM losers)
"""


Q_PRETRAIN_INC_SQL = _pretrain_inc_sql()


def q_pretrain_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental tick under the ``survivor="best"`` policy (r13):
    same tercile-append drive as ``pretrain_incremental``, but each
    near-dup candidate pair's LOWER-quality side loses (quality = token
    count, ties to the smaller id — the ``dedup_keep_best`` policy). The
    new mechanism this witnesses is RETROACTIVE EVICTION: a later tick's
    higher-quality twin beats an already-accepted survivor, which leaves
    the corpus via the append-only ``evicted`` state table (merge-on-
    read anti-join — rides the tick's stamped-append atomicity). Oracle
    = the one-shot batch with quality-oriented losers, so tick
    decomposition + eviction provably reproduce the batch policy."""
    from kafka_connect_bigquery_spark.functions.text import token_count
    from kafka_connect_bigquery_spark.pipelines.pretrain import (
        CorpusConfig,
        PretrainTickTables,
        incremental_tick,
    )
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    hi = docs.agg(F.max("doc_id")).first()[0]
    c1, c2 = hi // 3, 2 * hi // 3
    wh = _scratch_wh(spark, "pretrain_best")
    spec = TableSpec(partition_grain="NONE")
    cfg = CorpusConfig(
        min_quality=0.2,
        minhash_hashes=_PRETRAIN_MH,
        minhash_bands=_PRETRAIN_BANDS,
        survivor="best",
    )
    tables = PretrainTickTables()
    cursor = None
    art = None
    for pred in (
        F.col("doc_id") <= c1,
        (F.col("doc_id") > c1) & (F.col("doc_id") <= c2),
        F.col("doc_id") > c2,
    ):
        wh.append(docs.filter(pred), "corpus", spec)
        art = incremental_tick(wh, "corpus", cursor, tables=tables, cfg=cfg)
        cursor = art["cursor"]
    return art["survivors"].select(
        "doc_id", token_count(F.col("text")).cast("bigint").alias("n_tok")
    )


def _pretrain_keep_best_sql() -> str:
    """Batch oracle with the quality-oriented loser rule: shares every
    CTE with the min-id oracle except ``losers`` — per bucket-collision
    pair (a < b), the loser is b when q_a >= q_b (quality ties keep the
    smaller id), else a."""
    base = _pretrain_inc_sql()
    min_id_losers = """losers AS (
  SELECT DISTINCT b.doc_id AS doc_id
  FROM stacked a JOIN stacked b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
)"""
    best_losers = """qual AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS q FROM exact
),
losers AS (
  SELECT DISTINCT CASE WHEN qa.q >= qb.q THEN b.doc_id ELSE a.doc_id END AS doc_id
  FROM stacked a JOIN stacked b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
  JOIN qual qa ON qa.doc_id = a.doc_id
  JOIN qual qb ON qb.doc_id = b.doc_id
)"""
    assert min_id_losers in base
    return base.replace(min_id_losers, best_losers)


Q_PRETRAIN_KEEP_BEST_SQL = _pretrain_keep_best_sql()


def q_embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document clustering with a LLOYD-REFINED quantizer — the oracle
    that was missing from the k-means story (seeded IVF entries avoid
    iterations entirely; ``kmeans_fit`` was unit-tested only): one
    deterministic Lloyd iteration (init = 8 smallest vec_ids,
    per-dimension means from quantized integer sums, empty clusters
    keep their seed) then the final assignment. Every arithmetic step
    is IEEE-pinned (int sums -> one true division -> one /QD -> the
    assignment's floor(c*QD + 0.5)), so DuckDB reproduces the
    partition bit-exactly by mirroring the op order."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = ann.kmeans_fit(emb, k=_IVF_LISTS, iters=1)
    return emb.select(
        "vec_id",
        ann.assign_list(F.col("embedding"), cents).alias("list_id"),
    )


Q_EMBEDDING_KMEANS_SQL = f"""
WITH el AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS d
  FROM embeddings
),
elq AS (
  SELECT vec_id, d, CAST(FLOOR(v * {_QD} + 0.5) AS BIGINT) AS vq FROM el
),
s0 AS (
  SELECT r.list_id, e.d, e.vq AS sq
  FROM (
    SELECT vec_id,
           CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS list_id
    FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {_IVF_LISTS})
  ) r JOIN elq e USING (vec_id)
),
d0 AS (
  SELECT e.vec_id, s.list_id, SUM((e.vq - s.sq) * (e.vq - s.sq)) AS dist
  FROM elq e JOIN s0 s ON e.d = s.d GROUP BY 1, 2
),
a0 AS (
  SELECT vec_id, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
    FROM d0
  ) WHERE rn = 1
),
-- the Lloyd step, op-order-identical to operators/ann.py::kmeans_fit:
-- integer sums of quantized elements, ONE true division by the count,
-- /QD to the float centroid, then the assignment's floor(c*QD + 0.5)
m1 AS (
  SELECT a.list_id, e.d,
         CAST(FLOOR(((CAST(SUM(e.vq) AS DOUBLE) / COUNT(*)) / {_QD}.0)
                    * {_QD} + 0.5) AS BIGINT) AS cq
  FROM a0 a JOIN elq e USING (vec_id)
  GROUP BY 1, 2
),
s1 AS (
  SELECT s0.list_id, s0.d, COALESCE(m1.cq, s0.sq) AS sq
  FROM s0 LEFT JOIN m1 ON m1.list_id = s0.list_id AND m1.d = s0.d
),
d1 AS (
  SELECT e.vec_id, s.list_id, SUM((e.vq - s.sq) * (e.vq - s.sq)) AS dist
  FROM elq e JOIN s1 s ON e.d = s.d GROUP BY 1, 2
)
SELECT vec_id, list_id FROM (
  SELECT vec_id, list_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
  FROM d1
) WHERE rn = 1
"""


_RRF_TOP_N = 20  # per-retriever depth
_RRF_TOP_K = 10  # fused depth


def q_search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (operators/search.py): for each of the 10 query
    documents, a lexical ranking (char-trigram Jaccard via the dedup
    inverted index) and a dense ranking (exact cosine over the aligned
    embeddings) are fused by integer reciprocal-rank fusion — the
    rank-level combiner of the modern RAG stack, needing no score
    calibration between the two retrievers. Assumes the testdata's
    doc_id ↔ vec_id alignment (one embedding per document)."""
    from kafka_connect_bigquery_spark.operators import search

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = search.jaccard_rank(
        docs.filter(F.col("doc_id") < _ANN_NQ),
        docs,
        "doc_id",
        "text",
        top_n=_RRF_TOP_N,
        max_doc_freq=_JACCARD_MAX_DF,
        # the query set IS rows of `docs`: skip the corpus-text
        # union+distinct shuffle in the index build (r13)
        queries_in_corpus=True,
    ).select("query_id", "doc_id", "rank")
    dense = (
        ann.cosine_topk(
            emb.filter(F.col("vec_id") < _ANN_NQ), emb, k=_RRF_TOP_N
        )
        .select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    )
    return search.rrf_fuse([lex, dense], top_k=_RRF_TOP_K)


Q_SEARCH_HYBRID_SQL = f"""
WITH canon AS (SELECT doc_id, {_CANON} AS c FROM documents),
sh_all AS (
  SELECT doc_id,
         unnest(list_distinct([substr(c, CAST(i AS INT), 3)
                 for i in range(1, greatest(length(c) - 2, 1) + 1)])) AS sh
  FROM canon
),
freq AS (SELECT sh FROM sh_all GROUP BY sh HAVING count(*) <= {_JACCARD_MAX_DF}),
sh AS (SELECT sh_all.* FROM sh_all JOIN freq USING (sh)),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT q.doc_id AS qid, c.doc_id AS did, count(*) AS inter_size
  FROM sh q JOIN sh c ON q.sh = c.sh
  WHERE q.doc_id < {_ANN_NQ} AND q.doc_id <> c.doc_id
  GROUP BY 1, 2
),
lex AS (
  SELECT qid AS query_id, did AS doc_id, rank FROM (
    SELECT i.qid, i.did,
           row_number() OVER (
             PARTITION BY i.qid
             ORDER BY i.inter_size /
                      CAST(sq.sz + sd.sz - i.inter_size AS DOUBLE) DESC,
                      i.did) AS rank
    FROM inter i
    JOIN sizes sq ON sq.doc_id = i.qid
    JOIN sizes sd ON sd.doc_id = i.did
  ) WHERE rank <= {_RRF_TOP_N}
),
el AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS d
  FROM embeddings
),
norms AS (
  SELECT vec_id, SUM(CAST(FLOOR(v * v * {_QE} + 0.5) AS BIGINT)) AS nq
  FROM el GROUP BY vec_id
),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         SUM(CAST(FLOOR(q.v * c.v * {_QE} + 0.5) AS BIGINT)) AS dq
  FROM el q JOIN el c ON q.d = c.d
  WHERE q.vec_id < {_ANN_NQ} AND q.vec_id <> c.vec_id
  GROUP BY 1, 2
),
dense AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT d.query_id, d.doc_id,
           row_number() OVER (
             PARTITION BY d.query_id
             ORDER BY (d.dq / {_QE}.0) /
                      (sqrt(n1.nq / {_QE}.0) * sqrt(n2.nq / {_QE}.0)) DESC,
                      d.doc_id) AS rank
    FROM dots d
    JOIN norms n1 ON n1.vec_id = d.query_id
    JOIN norms n2 ON n2.vec_id = d.doc_id
  ) WHERE rank <= {_RRF_TOP_N}
),
contribs AS (
  SELECT query_id, doc_id, {search_ops.RRF_Q} // ({search_ops.RRF_K} + rank) AS contrib
  FROM lex
  UNION ALL
  SELECT query_id, doc_id, {search_ops.RRF_Q} // ({search_ops.RRF_K} + rank)
  FROM dense
),
fused AS (
  SELECT query_id, doc_id, CAST(SUM(contrib) AS BIGINT) AS score_q,
         CAST(COUNT(*) AS INT) AS n_lists
  FROM contribs GROUP BY 1, 2
)
SELECT query_id, doc_id, score_q, n_lists, rank FROM (
  SELECT query_id, doc_id, score_q, n_lists,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_q DESC, doc_id) AS rank
  FROM fused
) WHERE rank <= {_RRF_TOP_K}
"""


_RP_DIM = 16


def q_embedding_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection of the embeddings to 16
    dimensions (operators/ann.py:random_projection): deterministic ±1
    hyperplane weights from the shared integer hash, quantized-exact
    components — the storage/compute reduction step before index builds
    at corpus scale. The projection matrix never materializes; it IS
    the hash."""
    proj = ann.random_projection(
        _t(spark, sf_dir, "embeddings"), out_dim=_RP_DIM
    )
    # row-per-component for the hash comparator (array cells compare
    # poorly across Arrow round-trips)
    return proj.select(
        "vec_id", F.posexplode("proj_q").alias("p", "comp_q")
    ).withColumn("component", F.col("comp_q").cast("double") / ann.QD)


Q_EMBEDDING_PROJECTION_SQL = f"""
WITH el AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS d
  FROM embeddings
),
elq AS (
  SELECT vec_id, d, CAST(FLOOR(v * {_QD} + 0.5) AS BIGINT) AS vq FROM el
),
comps AS (
  SELECT e.vec_id, p.p,
         CAST(SUM(e.vq * (CASE WHEN CAST(concat('0x',
                  substr(md5(concat('rp', CAST(p.p AS VARCHAR), ':',
                                    CAST(e.d AS VARCHAR))), 1, 2))
                  AS INT) % 2 = 0
               THEN -1 ELSE 1 END)) AS BIGINT) AS cq
  FROM elq e CROSS JOIN (SELECT unnest(range({_RP_DIM})) AS p) p
  GROUP BY 1, 2
)
SELECT vec_id, CAST(p AS INT) AS p, cq AS comp_q,
       CAST(cq AS DOUBLE) / {_QD} AS component
FROM comps
"""


_PQ_M = 8  # subspaces (64-dim embeddings -> 8 dims per subspace)
_PQ_KSUB = 16  # codebook entries per subspace (4-bit codes)
_PQ_SHORTLIST = 20


def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (IVFADC) approximate top-5: seeded coarse quantizer (8
    lists, probe 2) + residual product quantization (8 subspaces x 16
    codes), ADC scoring over the probed lists, exact-cosine re-rank of
    the 20-candidate shortlist. Codebooks are seeded from the residuals
    of the 16 smallest-id vectors — closed form, so the SQL oracle
    reproduces encoding, ADC, and re-rank bit-exactly."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = ann.seed_centroids(emb, k=_IVF_LISTS)
    books = ann.pq_codebooks(emb, cents, m=_PQ_M, ksub=_PQ_KSUB)
    queries = emb.filter(F.col("vec_id") < _ANN_NQ)
    return ann.ivfpq_topk(
        queries,
        emb,
        cents,
        books,
        k=_ANN_K,
        n_probe=_IVF_PROBE,
        shortlist=_PQ_SHORTLIST,
    )


_PQ_DSUB = 64 // _PQ_M

Q_ANN_IVFPQ_SQL = f"""
WITH el AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS d
  FROM embeddings
),
elq AS (
  SELECT vec_id, d, v, CAST(FLOOR(v * {_QD} + 0.5) AS BIGINT) AS vq FROM el
),
seeds AS (
  SELECT vec_id AS list_id, d, vq AS sq FROM elq WHERE vec_id < {_IVF_LISTS}
),
cdists AS (
  SELECT e.vec_id, s.list_id,
         SUM((e.vq - s.sq) * (e.vq - s.sq)) AS dist
  FROM elq e JOIN seeds s ON e.d = s.d
  GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
    FROM cdists
  ) WHERE rn = 1
),
resid AS (
  SELECT e.vec_id, a.list_id, e.d, e.d // {_PQ_DSUB} AS s,
         e.vq - sd.sq AS r
  FROM elq e
  JOIN assign a ON a.vec_id = e.vec_id
  JOIN seeds sd ON sd.list_id = a.list_id AND sd.d = e.d
),
cb AS (
  SELECT vec_id AS code_id, s, d, r AS cr FROM resid WHERE vec_id < {_PQ_KSUB}
),
codes AS (
  SELECT vec_id, list_id, s, code_id FROM (
    SELECT r.vec_id, r.list_id, r.s, c.code_id,
           row_number() OVER (PARTITION BY r.vec_id, r.s
                ORDER BY SUM((r.r - c.cr) * (r.r - c.cr)), c.code_id) AS rn
    FROM resid r JOIN cb c ON c.s = r.s AND c.d = r.d
    GROUP BY r.vec_id, r.list_id, r.s, c.code_id
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
    FROM cdists WHERE vec_id < {_ANN_NQ}
  ) WHERE rn <= {_IVF_PROBE}
),
qresid AS (
  SELECT p.query_id, p.list_id, e.d, e.d // {_PQ_DSUB} AS s,
         e.vq - sd.sq AS r
  FROM probes p
  JOIN elq e ON e.vec_id = p.query_id
  JOIN seeds sd ON sd.list_id = p.list_id AND sd.d = e.d
),
tabs AS (
  SELECT q.query_id, q.list_id, q.s, c.code_id,
         SUM((q.r - c.cr) * (q.r - c.cr)) AS t
  FROM qresid q JOIN cb c ON c.s = q.s AND c.d = q.d
  GROUP BY 1, 2, 3, 4
),
adc AS (
  SELECT t.query_id, k.vec_id AS neighbor_id, SUM(t.t) AS adc_q
  FROM codes k
  JOIN tabs t ON t.list_id = k.list_id AND t.s = k.s AND t.code_id = k.code_id
  WHERE k.vec_id <> t.query_id
  GROUP BY 1, 2
),
short AS (
  SELECT query_id, neighbor_id, adc_q FROM (
    SELECT query_id, neighbor_id, adc_q,
           row_number() OVER (PARTITION BY query_id
                ORDER BY adc_q, neighbor_id) AS rn
    FROM adc
  ) WHERE rn <= {_PQ_SHORTLIST}
),
norms AS (
  SELECT vec_id, SUM(CAST(FLOOR(v * v * {_QE} + 0.5) AS BIGINT)) AS nq
  FROM el GROUP BY vec_id
),
dots AS (
  SELECT s.query_id, s.neighbor_id, s.adc_q,
         SUM(CAST(FLOOR(q.v * n.v * {_QE} + 0.5) AS BIGINT)) AS dq
  FROM short s
  JOIN el q ON q.vec_id = s.query_id
  JOIN el n ON n.vec_id = s.neighbor_id AND n.d = q.d
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT d.query_id, d.neighbor_id, d.adc_q,
         (d.dq / {_QE}.0) / (sqrt(nq1.nq / {_QE}.0) * sqrt(nq2.nq / {_QE}.0)) AS cosine
  FROM dots d
  JOIN norms nq1 ON nq1.vec_id = d.query_id
  JOIN norms nq2 ON nq2.vec_id = d.neighbor_id
)
SELECT query_id, neighbor_id, adc_q / 1000000000000.0 AS adc_dist, cosine, rank
FROM (
  SELECT query_id, neighbor_id, adc_q, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {_ANN_K}
"""


# warehouse IVFADC oracle: same pipeline as Q_ANN_IVFPQ_SQL, with the
# record-time corpus = the EVEN vec_ids (first append): coarse seeds =
# 8 smallest even ids, codebook entry j = residual of the j-th smallest
# even id; ONE query (vec_id 1, an odd id encoded by the INCREMENTAL
# second-append refresh), no self-exclusion (read_nearest probes a
# literal vector, not a corpus row).
Q_WAREHOUSE_ANN_PQ_SQL = f"""
WITH el AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS d
  FROM embeddings
),
elq AS (
  SELECT vec_id, d, v, CAST(FLOOR(v * {_QD} + 0.5) AS BIGINT) AS vq FROM el
),
seeds AS (
  SELECT r.list_id, e.d, e.vq AS sq
  FROM (
    SELECT vec_id,
           CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS list_id
    FROM (SELECT vec_id FROM embeddings WHERE vec_id % 2 = 0
          ORDER BY vec_id LIMIT {_IVF_LISTS})
  ) r JOIN elq e USING (vec_id)
),
cdists AS (
  SELECT e.vec_id, s.list_id,
         SUM((e.vq - s.sq) * (e.vq - s.sq)) AS dist
  FROM elq e JOIN seeds s ON e.d = s.d
  GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
    FROM cdists
  ) WHERE rn = 1
),
resid AS (
  SELECT e.vec_id, a.list_id, e.d, e.d // {_PQ_DSUB} AS s,
         e.vq - sd.sq AS r
  FROM elq e
  JOIN assign a ON a.vec_id = e.vec_id
  JOIN seeds sd ON sd.list_id = a.list_id AND sd.d = e.d
),
cbsel AS (
  SELECT vec_id,
         CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code_id
  FROM (SELECT vec_id FROM embeddings WHERE vec_id % 2 = 0
        ORDER BY vec_id LIMIT {_PQ_KSUB})
),
cb AS (
  SELECT c.code_id, r.s, r.d, r.r AS cr
  FROM resid r JOIN cbsel c USING (vec_id)
),
codes AS (
  SELECT vec_id, list_id, s, code_id FROM (
    SELECT r.vec_id, r.list_id, r.s, c.code_id,
           row_number() OVER (PARTITION BY r.vec_id, r.s
                ORDER BY SUM((r.r - c.cr) * (r.r - c.cr)), c.code_id) AS rn
    FROM resid r JOIN cb c ON c.s = r.s AND c.d = r.d
    GROUP BY r.vec_id, r.list_id, r.s, c.code_id
  ) WHERE rn = 1
),
probes AS (
  SELECT list_id FROM (
    SELECT list_id,
           row_number() OVER (ORDER BY dist, list_id) AS rn
    FROM cdists WHERE vec_id = 1
  ) WHERE rn <= {_IVF_PROBE}
),
qresid AS (
  SELECT p.list_id, e.d, e.d // {_PQ_DSUB} AS s, e.vq - sd.sq AS r
  FROM probes p
  JOIN elq e ON e.vec_id = 1
  JOIN seeds sd ON sd.list_id = p.list_id AND sd.d = e.d
),
tabs AS (
  SELECT q.list_id, q.s, c.code_id,
         SUM((q.r - c.cr) * (q.r - c.cr)) AS t
  FROM qresid q JOIN cb c ON c.s = q.s AND c.d = q.d
  GROUP BY 1, 2, 3
),
adc AS (
  SELECT k.vec_id AS neighbor_id, SUM(t.t) AS adc_q
  FROM codes k
  JOIN tabs t ON t.list_id = k.list_id AND t.s = k.s AND t.code_id = k.code_id
  GROUP BY 1
),
short AS (
  SELECT neighbor_id, adc_q FROM (
    SELECT neighbor_id, adc_q,
           row_number() OVER (ORDER BY adc_q, neighbor_id) AS rn
    FROM adc
  ) WHERE rn <= {_PQ_SHORTLIST}
),
norms AS (
  SELECT vec_id, SUM(CAST(FLOOR(v * v * {_QE} + 0.5) AS BIGINT)) AS nq
  FROM el GROUP BY vec_id
),
dots AS (
  SELECT s.neighbor_id, s.adc_q,
         SUM(CAST(FLOOR(q.v * n.v * {_QE} + 0.5) AS BIGINT)) AS dq
  FROM short s
  JOIN el q ON q.vec_id = 1
  JOIN el n ON n.vec_id = s.neighbor_id AND n.d = q.d
  GROUP BY 1, 2
),
scored AS (
  SELECT d.neighbor_id, d.adc_q,
         (d.dq / {_QE}.0) / (sqrt(nq1.nq / {_QE}.0) * sqrt(nq2.nq / {_QE}.0)) AS cosine
  FROM dots d
  JOIN norms nq1 ON nq1.vec_id = 1
  JOIN norms nq2 ON nq2.vec_id = d.neighbor_id
)
SELECT neighbor_id, adc_q / 1000000000000.0 AS adc_dist, cosine, rank
FROM (
  SELECT neighbor_id, adc_q, cosine,
         CAST(row_number() OVER (ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {_ANN_K}
"""


# batch form: per-query probes over vec_id < _ANN_NQ, self-matches
# excluded — otherwise identical to Q_WAREHOUSE_ANN_PQ_SQL (even-id
# seeds/codebooks = the warehouse record-time corpus)
Q_WAREHOUSE_ANN_PQ_MANY_SQL = f"""
WITH el AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) - 1 AS d
  FROM embeddings
),
elq AS (
  SELECT vec_id, d, v, CAST(FLOOR(v * {_QD} + 0.5) AS BIGINT) AS vq FROM el
),
seeds AS (
  SELECT r.list_id, e.d, e.vq AS sq
  FROM (
    SELECT vec_id,
           CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS list_id
    FROM (SELECT vec_id FROM embeddings WHERE vec_id % 2 = 0
          ORDER BY vec_id LIMIT {_IVF_LISTS})
  ) r JOIN elq e USING (vec_id)
),
cdists AS (
  SELECT e.vec_id, s.list_id,
         SUM((e.vq - s.sq) * (e.vq - s.sq)) AS dist
  FROM elq e JOIN seeds s ON e.d = s.d
  GROUP BY 1, 2
),
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
    FROM cdists
  ) WHERE rn = 1
),
resid AS (
  SELECT e.vec_id, a.list_id, e.d, e.d // {_PQ_DSUB} AS s,
         e.vq - sd.sq AS r
  FROM elq e
  JOIN assign a ON a.vec_id = e.vec_id
  JOIN seeds sd ON sd.list_id = a.list_id AND sd.d = e.d
),
cbsel AS (
  SELECT vec_id,
         CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code_id
  FROM (SELECT vec_id FROM embeddings WHERE vec_id % 2 = 0
        ORDER BY vec_id LIMIT {_PQ_KSUB})
),
cb AS (
  SELECT c.code_id, r.s, r.d, r.r AS cr
  FROM resid r JOIN cbsel c USING (vec_id)
),
codes AS (
  SELECT vec_id, list_id, s, code_id FROM (
    SELECT r.vec_id, r.list_id, r.s, c.code_id,
           row_number() OVER (PARTITION BY r.vec_id, r.s
                ORDER BY SUM((r.r - c.cr) * (r.r - c.cr)), c.code_id) AS rn
    FROM resid r JOIN cb c ON c.s = r.s AND c.d = r.d
    GROUP BY r.vec_id, r.list_id, r.s, c.code_id
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT vec_id, list_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
    FROM cdists WHERE vec_id < {_ANN_NQ}
  ) WHERE rn <= {_IVF_PROBE}
),
qresid AS (
  SELECT p.query_id, p.list_id, e.d, e.d // {_PQ_DSUB} AS s,
         e.vq - sd.sq AS r
  FROM probes p
  JOIN elq e ON e.vec_id = p.query_id
  JOIN seeds sd ON sd.list_id = p.list_id AND sd.d = e.d
),
tabs AS (
  SELECT q.query_id, q.list_id, q.s, c.code_id,
         SUM((q.r - c.cr) * (q.r - c.cr)) AS t
  FROM qresid q JOIN cb c ON c.s = q.s AND c.d = q.d
  GROUP BY 1, 2, 3, 4
),
adc AS (
  SELECT t.query_id, k.vec_id AS neighbor_id, SUM(t.t) AS adc_q
  FROM codes k
  JOIN tabs t ON t.list_id = k.list_id AND t.s = k.s AND t.code_id = k.code_id
  WHERE k.vec_id <> t.query_id
  GROUP BY 1, 2
),
short AS (
  SELECT query_id, neighbor_id, adc_q FROM (
    SELECT query_id, neighbor_id, adc_q,
           row_number() OVER (PARTITION BY query_id
                ORDER BY adc_q, neighbor_id) AS rn
    FROM adc
  ) WHERE rn <= {_PQ_SHORTLIST}
),
norms AS (
  SELECT vec_id, SUM(CAST(FLOOR(v * v * {_QE} + 0.5) AS BIGINT)) AS nq
  FROM el GROUP BY vec_id
),
dots AS (
  SELECT s.query_id, s.neighbor_id, s.adc_q,
         SUM(CAST(FLOOR(q.v * n.v * {_QE} + 0.5) AS BIGINT)) AS dq
  FROM short s
  JOIN el q ON q.vec_id = s.query_id
  JOIN el n ON n.vec_id = s.neighbor_id AND n.d = q.d
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT d.query_id, d.neighbor_id, d.adc_q,
         (d.dq / {_QE}.0) / (sqrt(nq1.nq / {_QE}.0) * sqrt(nq2.nq / {_QE}.0)) AS cosine
  FROM dots d
  JOIN norms nq1 ON nq1.vec_id = d.query_id
  JOIN norms nq2 ON nq2.vec_id = d.neighbor_id
)
SELECT query_id, neighbor_id, adc_q / 1000000000000.0 AS adc_dist, cosine, rank
FROM (
  SELECT query_id, neighbor_id, adc_q, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {_ANN_K}
"""


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5: exact cosine only within the
    query's hyperplane-sign bucket — the 100 TB path where the bucket is
    the partition key."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _ANN_NQ)
    return ann.lsh_ann_topk(queries, emb, k=_ANN_K, n_planes=_ANN_PLANES)


Q_ANN_LSH_SQL = _ann_sql(bucketed=True)

# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def q_text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-evidence language ID with deterministic tie-break, plus
    the per-language evidence counts."""
    d = _t(spark, sf_dir, "documents")
    scores = text_fns.lang_scores(F.col("text"))
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        text_fns.predict_lang(F.col("text")).alias("predicted_lang"),
        *[scores[lang].cast("long").alias(f"hits_{lang}") for lang in sorted(scores)],
    )


def _marker_sql(markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter({_TOKS}, t -> t IN ({lst})))"


_LANG_HITS = {lang: _marker_sql(ms) for lang, ms in text_fns.LANG_MARKERS.items()}

Q_TEXT_LANG_SQL = f"""
WITH hits AS (
  SELECT doc_id, lang AS labeled_lang,
         CAST({_LANG_HITS['de']} AS BIGINT) AS hits_de,
         CAST({_LANG_HITS['en']} AS BIGINT) AS hits_en,
         CAST({_LANG_HITS['es']} AS BIGINT) AS hits_es,
         CAST({_LANG_HITS['fr']} AS BIGINT) AS hits_fr
  FROM documents
)
SELECT doc_id, labeled_lang,
       CASE WHEN greatest(hits_de, hits_en, hits_es, hits_fr) = 0 THEN 'und'
            WHEN hits_fr = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'fr'
            WHEN hits_es = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'es'
            WHEN hits_en = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'en'
            ELSE 'de' END AS predicted_lang,
       hits_de, hits_en, hits_es, hits_fr
FROM hits
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features + composite score per document."""
    d = _t(spark, sf_dir, "documents")
    ft = text_fns.quality_features(F.col("text"))
    return d.select(
        "doc_id",
        *[ft[k].alias(k) for k in sorted(ft)],
        text_fns.quality_score(F.col("text")).alias("quality"),
    )


_QF = {
    "n_chars": "CAST(length(text) AS BIGINT)",
    "n_tokens": f"CAST(len({_TOKS}) AS BIGINT)",
    "alpha": "length(regexp_replace(text, '[^A-Za-z]', '', 'g'))",
    "digit": "length(regexp_replace(text, '[^0-9]', '', 'g'))",
    "stop": _marker_sql(text_fns.LANG_MARKERS["en"]),
    "uniq": f"len(list_distinct({_TOKS}))",
}

Q_TEXT_QUALITY_SQL = f"""
WITH ft AS (
  SELECT doc_id,
         {_QF['n_chars']} AS n_chars,
         {_QF['n_tokens']} AS n_tokens,
         {_QF['alpha']} AS alpha,
         {_QF['digit']} AS digit,
         {_QF['stop']} AS stop,
         {_QF['uniq']} AS uniq
  FROM documents
)
SELECT doc_id,
       CAST(alpha AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) AS alpha_ratio,
       CAST(alpha AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE) AS avg_token_len,
       CAST(digit AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) AS digit_ratio,
       n_chars,
       n_tokens,
       CAST(stop AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE) AS stopword_ratio,
       CAST(uniq AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE) AS unique_ratio,
       0.25 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
       + 0.25 * (CAST(alpha AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE))
       + 0.25 * least((CAST(stop AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE)) * 5, 1.0)
       + 0.25 * (CAST(uniq AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE)) AS quality
FROM ft
"""


def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + document fingerprint (rolling-hash stand-in is
    the canonical md5 fingerprint shared with exact dedup)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        text_fns.token_count(F.col("text")).cast("long").alias("n_tokens"),
        text_fns.unique_token_count(F.col("text")).cast("long").alias("n_unique_tokens"),
        dedup.fingerprint(F.col("text")).alias("fingerprint"),
    )


Q_TEXT_TOKENS_SQL = f"""
SELECT doc_id,
       CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct({_TOKS})) AS BIGINT) AS n_unique_tokens,
       md5({_CANON}) AS fingerprint
FROM documents
"""

def q_text_subword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish sub-token counting + order-sensitive Rabin-Karp rolling
    hash (whitespace fingerprint's order-sensitive complement)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        text_fns.subword_count(F.col("text")).cast("long").alias("n_subtokens"),
        text_fns.rolling_hash(F.col("text")).alias("rolling_hash"),
    )


Q_TEXT_SUBWORD_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT)
         AS n_subtokens,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform({_TOKS},
             t -> CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT))),
         (acc, x) -> (acc * {text_fns.ROLL_B} + x) % {text_fns.ROLL_M}
       ) AS rolling_hash
FROM documents
"""


_TOP_TERMS_K = 3


def q_text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term salience (tf-idf-shaped retrieval scoring): top-3 tokens per
    document by tf x linearized idf. The idf is the exact integer
    floor(N*1e4 / df) rather than a log — same monotonic ranking signal
    for salience, but bit-identical across engines (libm log rounding
    differs), so the ranks are oracle-exact.

    Scale: token explode -> one shuffle for per-(doc, term) tf, the df
    table is a small broadcast, ranking windows partition by doc."""
    d = _t(spark, sf_dir, "documents")
    from pyspark.sql import Window

    par = spark.sparkContext.defaultParallelism
    toks = d.repartition(par).select(
        "doc_id", F.explode(text_fns.tokens(F.col("text"))).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.distinct().groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.count()
    scored = tf.join(F.broadcast(df_), "tok").withColumn(
        "score_q",
        F.col("tf") * F.floor(F.lit(n_docs * 10_000) / F.col("df")).cast("long"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_q"), F.asc("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _TOP_TERMS_K)
        .select("doc_id", "tok", "tf", "df", "score_q", "rnk")
    )


Q_TEXT_TOP_TERMS_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(str_split({_CANON}, ' ')) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT tok, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY 1),
scored AS (
  SELECT doc_id, tok, tf, df,
         tf * CAST(FLOOR((SELECT COUNT(*) FROM documents) * 10000.0 / df) AS BIGINT)
           AS score_q
  FROM tf JOIN df USING (tok)
)
SELECT doc_id, tok, tf, df, score_q, rnk FROM (
  SELECT scored.*,
         CAST(row_number() OVER (PARTITION BY doc_id
              ORDER BY score_q DESC, tok ASC) AS BIGINT) AS rnk
  FROM scored
) WHERE rnk <= {_TOP_TERMS_K}
"""


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload decode plumbing: pack text bytes as an opaque
    payload, run the Arrow-batched mapInPandas 'decoder' (deterministic
    md5-derived stand-in for the real codec)."""
    d = _t(spark, sf_dir, "documents")
    return multimodal.decode_image_meta(multimodal.pack_payload(d, "doc_id", "text"))


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal stage chain: decode metadata -> frame sampling
    (every 2nd frame, declarative explode) -> Arrow-batched feature
    extraction, joined per document."""
    d = _t(spark, sf_dir, "documents")
    packed = multimodal.pack_payload(d, "doc_id", "text")
    frames = multimodal.sample_frames(multimodal.decode_image_meta(packed)).select(
        "doc_id", "frame_index"
    )
    feats = multimodal.extract_features(packed)
    return frames.join(feats, "doc_id").select(
        "doc_id",
        "frame_index",
        *[
            F.col("feature")[i].alias(f"f{i}")
            for i in range(multimodal.FEATURE_DIM)
        ],
    )


def _frame_feature_sql() -> str:
    feats = ",\n       ".join(
        f"CAST(concat('0x', substr(content_md5, {8 * i + 1}, 8)) AS BIGINT)"
        f" / 4294967295.0 AS f{i}"
        for i in range(multimodal.FEATURE_DIM)
    )
    return f"""
WITH m AS (
  SELECT doc_id, md5(text) AS content_md5,
         1 + octet_length(encode(text)) % 7 AS n_frames
  FROM documents
)
SELECT doc_id, CAST(unnest(range(0, n_frames, 2)) AS BIGINT) AS frame_index,
       {feats}
FROM m
"""


Q_MULTIMODAL_FRAMES_SQL = _frame_feature_sql()


_CHUNK_SECONDS = 10


def q_multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio plumbing chain: pack payload -> Arrow-batched header probe
    (deterministic stand-in at the declared AudioDecoder seam) ->
    fixed-window chunking (declarative explode). One row per 10 s chunk
    with sample offsets — the batch unit an ASR/feature stage consumes."""
    d = _t(spark, sf_dir, "documents")
    meta = multimodal.decode_audio_meta(
        multimodal.pack_payload(d, "doc_id", "text")
    )
    return multimodal.chunk_audio(meta, chunk_seconds=_CHUNK_SECONDS).select(
        "doc_id",
        "sample_rate",
        "n_samples",
        "n_channels",
        "chunk_index",
        "start_sample",
        "end_sample",
    )


Q_MULTIMODAL_AUDIO_SQL = f"""
WITH m AS (
  SELECT doc_id,
         CASE CAST(concat('0x', substr(md5(text), 1, 2)) AS BIGINT) % 3
           WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS sample_rate,
         1 + CAST(concat('0x', substr(md5(text), 3, 1)) AS BIGINT) % 2 AS n_channels,
         1 + CAST(concat('0x', substr(md5(text), 5, 4)) AS BIGINT) % 120 AS secs
  FROM documents
),
meta AS (
  SELECT doc_id, CAST(sample_rate AS BIGINT) AS sample_rate,
         CAST(sample_rate * secs AS BIGINT) AS n_samples,
         CAST(n_channels AS BIGINT) AS n_channels,
         CAST(sample_rate AS BIGINT) * {_CHUNK_SECONDS} AS spc
  FROM m
)
SELECT doc_id, sample_rate, n_samples, n_channels,
       CAST(unnest(range(0, (n_samples + spc - 1) // spc)) AS BIGINT) AS chunk_index,
       CAST(unnest(range(0, (n_samples + spc - 1) // spc)) * spc AS BIGINT)
         AS start_sample,
       CAST(least(n_samples, (unnest(range(0, (n_samples + spc - 1) // spc)) + 1) * spc)
            AS BIGINT) AS end_sample
FROM meta
"""


Q_MULTIMODAL_SQL = """
WITH m AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         md5(text) AS content_md5
  FROM documents
)
SELECT doc_id, n_bytes, content_md5,
       CAST(1 + (instr('0123456789abcdef', substr(content_md5, 1, 1)) - 1) * 16
              + (instr('0123456789abcdef', substr(content_md5, 2, 1)) - 1) AS BIGINT) AS width,
       CAST(1 + (instr('0123456789abcdef', substr(content_md5, 3, 1)) - 1) * 16
              + (instr('0123456789abcdef', substr(content_md5, 4, 1)) - 1) AS BIGINT) AS height,
       CAST(1 + n_bytes % 7 AS BIGINT) AS n_frames
FROM m
"""

# ---------------------------------------------------------------------------
# deterministic sampling / dataset splits
# ---------------------------------------------------------------------------

_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}
_SAMPLE_RATE = 0.25


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test assignment + hash-sampled subset
    membership per document — pure per-row md5 arithmetic, identical on
    any engine/partitioning (rand()-based splits are not replayable)."""
    from kafka_connect_bigquery_spark.operators import sampling

    d = _t(spark, sf_dir, "documents")
    out = sampling.split_dataset(d, "doc_id", _SPLITS)
    return out.select(
        "doc_id",
        "split",
        (sampling.hash_uniform(F.col("doc_id"), salt="s1") < _SAMPLE_RATE).alias(
            "in_sample"
        ),
    )


def _split_sql() -> str:
    u = (
        "CAST(concat('0x', substr(md5(concat('{salt}', CAST(doc_id AS VARCHAR))), 1, 8))"
        " AS BIGINT) / 4294967296.0"
    )
    u_split = u.format(salt="split")
    u_s1 = u.format(salt="s1")
    return f"""
SELECT doc_id,
       CASE WHEN {u_split} < 0.8 THEN 'train'
            WHEN {u_split} < 0.9 THEN 'val'
            ELSE 'test' END AS split,
       {u_s1} < {_SAMPLE_RATE} AS in_sample
FROM documents
"""


Q_DATASET_SPLIT_SQL = _split_sql()

_WS_CAP = 500.0  # chars at which inclusion saturates to certainty


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-proportional Poisson sampling (operators/sampling.py:
    weighted_sample): keep each document with probability
    min(1, n_chars/500) so sampled mass tracks character mass; the
    emitted p_sample enables Horvitz-Thompson reweighting downstream."""
    from kafka_connect_bigquery_spark.operators import sampling

    d = _t(spark, sf_dir, "documents")
    return sampling.weighted_sample(d, "doc_id", "n_chars", cap=_WS_CAP).select(
        "doc_id", "n_chars", "p_sample"
    )


_WS_U = (
    "CAST(concat('0x', substr(md5(concat('w', CAST(doc_id AS VARCHAR))), 1, 8))"
    " AS BIGINT) / 4294967296.0"
)

Q_WEIGHTED_SAMPLE_SQL = f"""
SELECT doc_id, n_chars,
       LEAST(CAST(1.0 AS DOUBLE), n_chars / CAST({_WS_CAP} AS DOUBLE)) AS p_sample
FROM documents
WHERE {_WS_U} < LEAST(CAST(1.0 AS DOUBLE), n_chars / CAST({_WS_CAP} AS DOUBLE))
"""

_ENT_Q = 1_000_000


def q_mixture_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixture diagnostics per language: Shannon entropy of the
    source distribution within each language, and KL divergence of that
    conditional distribution from the global source mix — the two
    numbers a data-mixture dashboard watches to catch a domain
    collapsing into one source or drifting from the corpus-wide blend.

    Exactness: per-term contributions -p·ln(p) and p·ln(p/q) are IEEE
    double chains on identical inputs, each floored to the 1/Q lattice
    before the (integer) per-group sum — the quantized-ln discipline
    shared with BM25. Scale shape: two count aggregations (lang×source
    and source), the ≤|sources|-row global table broadcast; the corpus
    is scanned once."""
    d = _t(spark, sf_dir, "documents")
    ls = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_ls")
    ).localCheckpoint(eager=False)  # feeds 4 consumers: scan the corpus once
    l = ls.groupBy("lang").agg(F.sum("n_ls").alias("n_l"))
    s = ls.groupBy("source").agg(F.sum("n_ls").alias("n_s"))
    n = ls.agg(F.sum("n_ls").alias("n_total"))
    p = F.col("n_ls").cast("double") / F.col("n_l").cast("double")
    q = F.col("n_s").cast("double") / F.col("n_total").cast("double")
    ent_term = F.floor(-(p * F.log(p)) * _ENT_Q + F.lit(0.5)).cast("long")
    kl_term = F.floor((p * F.log(p / q)) * _ENT_Q + F.lit(0.5)).cast("long")
    joined = (
        ls.join(l, "lang")
        .join(F.broadcast(s), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            F.col("n_ls"),
            ent_term.alias("eq"),
            kl_term.alias("kq"),
        )
    )
    return joined.groupBy("lang").agg(
        F.sum("n_ls").cast("bigint").alias("n_docs"),
        F.sum("eq").cast("bigint").alias("entropy_q"),
        (F.sum("eq").cast("double") / _ENT_Q).alias("entropy"),
        F.sum("kq").cast("bigint").alias("kl_q"),
        (F.sum("kq").cast("double") / _ENT_Q).alias("kl"),
    )


Q_MIXTURE_ENTROPY_SQL = f"""
WITH ls AS (SELECT lang, source, COUNT(*) AS n_ls FROM documents GROUP BY 1, 2),
l AS (SELECT lang, CAST(SUM(n_ls) AS BIGINT) AS n_l FROM ls GROUP BY 1),
s AS (SELECT source, CAST(SUM(n_ls) AS BIGINT) AS n_s FROM ls GROUP BY 1),
n AS (SELECT CAST(SUM(n_ls) AS BIGINT) AS n_total FROM ls),
terms AS (
  SELECT ls.lang, ls.n_ls,
    CAST(FLOOR(-((CAST(ls.n_ls AS DOUBLE) / CAST(l.n_l AS DOUBLE))
        * ln(CAST(ls.n_ls AS DOUBLE) / CAST(l.n_l AS DOUBLE)))
        * {_ENT_Q} + CAST(0.5 AS DOUBLE)) AS BIGINT) AS eq,
    CAST(FLOOR(((CAST(ls.n_ls AS DOUBLE) / CAST(l.n_l AS DOUBLE))
        * ln((CAST(ls.n_ls AS DOUBLE) / CAST(l.n_l AS DOUBLE))
             / (CAST(s.n_s AS DOUBLE) / CAST(n.n_total AS DOUBLE))))
        * {_ENT_Q} + CAST(0.5 AS DOUBLE)) AS BIGINT) AS kq
  FROM ls JOIN l USING (lang) JOIN s USING (source) CROSS JOIN n
)
SELECT lang, CAST(SUM(n_ls) AS BIGINT) AS n_docs,
       CAST(SUM(eq) AS BIGINT) AS entropy_q,
       CAST(SUM(eq) AS DOUBLE) / {_ENT_Q} AS entropy,
       CAST(SUM(kq) AS BIGINT) AS kl_q,
       CAST(SUM(kq) AS DOUBLE) / {_ENT_Q} AS kl
FROM terms GROUP BY 1
"""


_ZIPF_TOP = 500
_ZIPF_Q = 100_000  # ln lattice; Q=1e5 keeps k*Σxy far below 2^63


def q_text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit over the corpus's top-500 terms — the
    power-law diagnostic (alongside ``docs_vocab_growth``'s Heaps
    curve) that flags synthetic or template-heavy corpora before
    training: natural text has slope ≈ -1; duplication and templating
    flatten or kink the line. Closed-form least squares of
    ln(count) on ln(rank), both floored to the 1/Q integer lattice, so
    the slope is an exact BIGINT ratio. Top-k rides orderBy+limit
    (TakeOrderedAndProject), never a global window over term TYPES;
    rank is recomputed over the 500 survivors."""
    from kafka_connect_bigquery_spark.functions import text as text_fns
    from kafka_connect_bigquery_spark.functions.winutil import bounded_global

    from kafka_connect_bigquery_spark.operators.skew import fan_out

    d = _t(spark, sf_dir, "documents")
    counts = (
        # fan_out, not a bare repartition: a corpus already scanning
        # wide (the 100 TB case) must not pay a full exchange here
        fan_out(d)
        .select(F.explode(text_fns.tokens(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    order = [F.desc("n"), F.asc("tok")]
    ranked = (
        counts.orderBy(*order)
        .limit(_ZIPF_TOP)
        .withColumn("r", F.row_number().over(bounded_global(*order)).cast("long"))
    )
    lx = F.floor(F.log(F.col("r").cast("double")) * _ZIPF_Q + F.lit(0.5)).cast("long")
    ly = F.floor(F.log(F.col("n").cast("double")) * _ZIPF_Q + F.lit(0.5)).cast("long")
    agg = ranked.select(lx.alias("lx"), ly.alias("ly")).agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    num = F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    # slope stays an exact BIGINT ratio; the intercept's cross products
    # exceed int64, so it is an IEEE double chain over the SAME exact
    # integer sums — deterministic on both engines
    numd, dend = num.cast("double"), den.cast("double")
    return agg.select(
        F.col("k").cast("bigint").alias("n_terms"),
        num.cast("bigint").alias("slope_num"),
        den.cast("bigint").alias("slope_den"),
        (numd / dend).alias("slope"),
        (
            (F.col("sy").cast("double") * dend - numd * F.col("sx").cast("double"))
            / (F.col("k").cast("double") * dend)
            / _ZIPF_Q
        ).alias("intercept_ln"),
    )


Q_TEXT_ZIPF_SQL = f"""
WITH toks AS (
  SELECT unnest({_TOKS}) AS tok FROM documents
),
counts AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks WHERE tok <> '' GROUP BY 1
),
ranked AS (
  SELECT n, CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT) AS r
  FROM counts ORDER BY n DESC, tok LIMIT {_ZIPF_TOP}
),
q AS (
  SELECT CAST(FLOOR(ln(CAST(r AS DOUBLE)) * {_ZIPF_Q} + 0.5) AS BIGINT) AS lx,
         CAST(FLOOR(ln(CAST(n AS DOUBLE)) * {_ZIPF_Q} + 0.5) AS BIGINT) AS ly
  FROM ranked
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(lx) AS BIGINT) AS sx,
         CAST(SUM(ly) AS BIGINT) AS sy, CAST(SUM(lx * lx) AS BIGINT) AS sxx,
         CAST(SUM(lx * ly) AS BIGINT) AS sxy
  FROM q
)
SELECT k AS n_terms,
       CAST(k * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(k * sxx - sx * sx AS BIGINT) AS slope_den,
       CAST(k * sxy - sx * sy AS DOUBLE) / CAST(k * sxx - sx * sx AS DOUBLE)
         AS slope,
       (CAST(sy AS DOUBLE) * CAST(k * sxx - sx * sx AS DOUBLE)
          - CAST(k * sxy - sx * sy AS DOUBLE) * CAST(sx AS DOUBLE))
         / (CAST(k AS DOUBLE) * CAST(k * sxx - sx * sx AS DOUBLE))
         / {_ZIPF_Q} AS intercept_ln
FROM s
"""


_CHUNK_W = 64
_CHUNK_S = 48


def q_docs_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (window 64, stride 48) — the
    context-chunking pass every RAG / long-context training pipeline
    runs before embedding or packing. Pure per-row array arithmetic:
    chunk count ceil(max(n-W,0)/S)+1, token slices via higher-order
    array functions, md5 fingerprint of each chunk for downstream
    chunk-level dedup. No shuffle at all — runs at scan speed on any
    cluster size; the oracle re-derives every boundary, so off-by-one
    window/stride bugs hash-mismatch."""
    from kafka_connect_bigquery_spark.functions import text as text_fns

    d = _t(spark, sf_dir, "documents")
    toks = F.filter(text_fns.tokens(F.col("text")), lambda t: t != "")
    base = d.select("doc_id", toks.alias("tk")).withColumn(
        "n_tok", F.size("tk").cast("bigint")
    )
    n_chunks = (
        F.floor(
            (F.greatest(F.col("n_tok") - _CHUNK_W, F.lit(0)) + _CHUNK_S - 1)
            / _CHUNK_S
        ).cast("long")
        + 1
    )
    chunked = base.select(
        "doc_id",
        "tk",
        "n_tok",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    ).withColumn(
        "chunk", F.slice(F.col("tk"), F.col("chunk_id") * _CHUNK_S + 1, _CHUNK_W)
    )
    return chunked.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        "n_tok",
        F.size("chunk").cast("bigint").alias("chunk_len"),
        F.element_at("chunk", 1).alias("first_tok"),
        F.element_at("chunk", -1).alias("last_tok"),
        F.md5(F.array_join("chunk", " ")).alias("chunk_fp"),
    )


Q_DOCS_CHUNKS_SQL = f"""
WITH base AS (
  SELECT doc_id, [t for t in {_TOKS} if t <> ''] AS tk FROM documents
),
sized AS (
  SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n_tok,
         CAST(FLOOR((greatest(len(tk) - {_CHUNK_W}, 0) + {_CHUNK_S} - 1)
              / {_CHUNK_S}) AS BIGINT) + 1 AS n_chunks
  FROM base
),
chunks AS (
  SELECT doc_id, n_tok, CAST(i AS BIGINT) AS chunk_id,
         tk[CAST(i AS INT) * {_CHUNK_S} + 1 :
            CAST(i AS INT) * {_CHUNK_S} + {_CHUNK_W}] AS chunk
  FROM sized, unnest(range(0, n_chunks)) AS u(i)
)
SELECT doc_id, chunk_id, n_tok,
       CAST(len(chunk) AS BIGINT) AS chunk_len,
       chunk[1] AS first_tok,
       chunk[-1] AS last_tok,
       md5(array_to_string(chunk, ' ')) AS chunk_fp
FROM chunks
"""


_BASKET_MINSUP = 3
_BASKET_TOP = 50
_BASKET_Q = 1_000_000


def q_orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining over lineitem (A-priori, Agrawal &
    Srikant VLDB'94): part pairs co-ordered in >= 3 orders, with exact
    integer lift. The A-priori prune — only items whose own support
    reaches the pair threshold can appear in a qualifying pair — runs
    as a broadcast semi-join BEFORE the per-order self-join, which is
    what keeps candidate pairs bounded on a skewed real basket corpus
    (popular items otherwise dominate the join). Per-order pair
    generation is an equi-join on the order key (co-partitioned, no
    cartesian); top pairs ride orderBy+limit with rank recomputed over
    the survivors; lift is the exact integer
    floor(n_pair * n_orders * Q / (n_p1 * n_p2))."""
    from kafka_connect_bigquery_spark.functions.winutil import bounded_global

    li = _t(spark, sf_dir, "lineitem")
    # NOTE (r13 negative result): repartition(par, "o") before the
    # checkpoint does NOT buy the pair self-join its exchange back —
    # localCheckpoint surfaces as a bare ExistingRDD scan with UNKNOWN
    # partitioning in Spark 4.1, so consumers re-exchange anyway and
    # the extra shuffle is pure cost (measured 1.19x; plan shows
    # Exchange hashpartitioning AFTER the RDD scan).
    baskets = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=False)  # feeds item counts, totals, both pair sides
    )
    items = baskets.groupBy("p").agg(F.count(F.lit(1)).alias("n_item"))
    freq = items.filter(F.col("n_item") >= _BASKET_MINSUP).localCheckpoint(
        eager=False
    )  # broadcast twice (prune + lift columns)
    # (r13 also tried repartition(par, "o") AFTER the checkpoint: the
    # planner kept the broadcast pair join, materialized BOTH
    # repartition exchanges without reuse, and the wall was unchanged
    # (1.63 vs 1.61 s min-of-5) — the pair explosion is not
    # width-starved enough to pay two exchanges for. Left as-is.)
    fb = baskets.join(F.broadcast(freq.select("p")), "p", "left_semi")
    # Width for the pair explosion (r14, the r13 deferred item measured
    # at sf1 per the verdict ask): the checkpoint surfaces as an
    # ExistingRDD with few partitions, so the o-keyed self-join and its
    # quadratic per-basket pair fan-out ran at checkpoint width.
    # Neutral at sf0.1 (1.61 vs 1.63 min-of-5, r13); at sf1
    # single-file the repartitioned shape won every aggregate of a
    # 4-round interleaved A/B on a wave-y host (minima 3.05 vs 3.75 s
    # = 0.81x, medians ~5.4 vs ~11 s) — the explosion is width-starved
    # as soon as baskets outgrow a few input splits, which is also the
    # 100 TB shape (guide §2.5: spread the explosion, not the scan).
    fb = fb.repartition(
        fb.sparkSession.sparkContext.defaultParallelism, "o"
    )
    a = fb.select("o", F.col("p").alias("p1"))
    b = fb.select("o", F.col("p").alias("p2"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= _BASKET_MINSUP)
    )
    n_orders = baskets.select("o").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    order = [F.desc("n_pair"), F.asc("p1"), F.asc("p2")]
    return (
        pairs.orderBy(*order)
        .limit(_BASKET_TOP)
        .withColumn("rank", F.row_number().over(bounded_global(*order)))
        .join(
            F.broadcast(freq.select(F.col("p").alias("p1"), F.col("n_item").alias("n_p1"))),
            "p1",
        )
        .join(
            F.broadcast(freq.select(F.col("p").alias("p2"), F.col("n_item").alias("n_p2"))),
            "p2",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            F.col("p1").cast("bigint").alias("p1"),
            F.col("p2").cast("bigint").alias("p2"),
            F.col("n_pair").cast("bigint").alias("n_pair"),
            F.col("n_p1").cast("bigint").alias("n_p1"),
            F.col("n_p2").cast("bigint").alias("n_p2"),
            F.col("n_orders").cast("bigint").alias("n_orders"),
            F.expr(
                f"CAST(n_pair * n_orders * {_BASKET_Q} DIV (n_p1 * n_p2) AS BIGINT)"
            ).alias("lift_q"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


Q_ORDERS_BASKET_SQL = f"""
WITH baskets AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
items AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n_item FROM baskets GROUP BY 1),
freq AS (SELECT * FROM items WHERE n_item >= {_BASKET_MINSUP}),
fb AS (SELECT b.* FROM baskets b JOIN freq USING (p)),
pairs AS (
  SELECT a.p AS p1, b.p AS p2, CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM fb a JOIN fb b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_BASKET_MINSUP}
),
tot AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM baskets),
top AS (
  SELECT *, CAST(row_number() OVER (ORDER BY n_pair DESC, p1, p2) AS INT) AS rank
  FROM pairs ORDER BY n_pair DESC, p1, p2 LIMIT {_BASKET_TOP}
)
SELECT CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2, n_pair,
       f1.n_item AS n_p1, f2.n_item AS n_p2, n_orders,
       CAST(n_pair * n_orders * {_BASKET_Q} // (f1.n_item * f2.n_item) AS BIGINT)
         AS lift_q,
       rank
FROM top
JOIN freq f1 ON f1.p = top.p1
JOIN freq f2 ON f2.p = top.p2
CROSS JOIN tot
"""


_PMI_MIN_COUNT = 5
_PMI_TOP = 50


def q_text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: the corpus's top bigrams by pointwise mutual
    information, PMI = ln(P(w1,w2)/(P(w1)P(w2))) — the phrase-detection
    pass (new_york, machine_learning) that runs before tokenizer/vocab
    induction. Counts come from one bigram aggregation (reusing the
    fluency model's corpus scan shape), PMI is the quantized-ln chain,
    and a min-count guard drops the unstable tail before ranking."""
    from kafka_connect_bigquery_spark.functions.text import doc_bigrams
    from pyspark.sql import Window

    # the bigram explosion feeds FOUR aggregations (bi/u1/u2/n); without
    # a barrier each one re-tokenizes the corpus (the q15 double-scan
    # class of defect) — checkpoint the gram frame once.
    # NOTE (r13 negative result): fan_out-widening the text before
    # doc_bigrams measured 1.36x SLOWER on a quiet host — the bigram
    # explode is allocation-bound (doc_bigrams docstring) and the four
    # consumers overlap as one job, so the widening exchange + wide GC
    # contention cost more than the width bought (contrast
    # docs_ngram_novelty, where the hash-heavy distinct won from it).
    grams = doc_bigrams(
        _t(spark, sf_dir, "documents"), "doc_id", "text"
    ).localCheckpoint(eager=False)
    bi = grams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bi"))
    u1 = grams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    u2 = grams.groupBy("w2").agg(F.count(F.lit(1)).alias("c2"))
    n = grams.agg(F.count(F.lit(1)).alias("n_total"))
    pmi_arg = (
        F.col("c_bi").cast("double") * F.col("n_total").cast("double")
    ) / (F.col("c1").cast("double") * F.col("c2").cast("double"))
    pmi_q = F.floor(F.log(pmi_arg) * _ENT_Q + F.lit(0.5)).cast("long")
    scored = (
        bi.filter(F.col("c_bi") >= _PMI_MIN_COUNT)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n))
        .select("w1", "w2", "c_bi", pmi_q.alias("pmi_q"))
    )
    # top-k via orderBy+limit (TakeOrderedAndProject: per-partition
    # top-N + merge), NOT a global row_number window — scored bigram
    # TYPES grow Heaps-sublinearly but unbounded, and an unpartitioned
    # window would sort them all in one task (r06-verdict scale-killer).
    # rank is recomputed over the _PMI_TOP surviving rows only.
    from kafka_connect_bigquery_spark.functions.winutil import bounded_global

    w = bounded_global(F.desc("pmi_q"), F.asc("w1"), F.asc("w2"))
    return (
        scored.orderBy(F.desc("pmi_q"), F.asc("w1"), F.asc("w2"))
        .limit(_PMI_TOP)
        .withColumn("rank", F.row_number().over(w))
        .select(
            "w1", "w2",
            F.col("c_bi").cast("bigint").alias("c_bi"),
            "pmi_q",
            (F.col("pmi_q").cast("double") / _ENT_Q).alias("pmi"),
            "rank",
        )
    )


Q_TEXT_COLLOCATIONS_SQL = f"""
WITH toked AS (SELECT doc_id AS doc, {_TOKS} AS toks FROM documents),
grams AS (
  SELECT doc, toks[CAST(i AS INT)] AS w1, toks[CAST(i AS INT) + 1] AS w2
  FROM toked, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS t(i)
),
bi AS (SELECT w1, w2, COUNT(*) AS c_bi FROM grams GROUP BY 1, 2),
u1 AS (SELECT w1, COUNT(*) AS c1 FROM grams GROUP BY 1),
u2 AS (SELECT w2, COUNT(*) AS c2 FROM grams GROUP BY 1),
n AS (SELECT COUNT(*) AS n_total FROM grams),
scored AS (
  SELECT bi.w1, bi.w2, bi.c_bi,
    CAST(FLOOR(ln((CAST(bi.c_bi AS DOUBLE) * CAST(n.n_total AS DOUBLE))
                  / (CAST(u1.c1 AS DOUBLE) * CAST(u2.c2 AS DOUBLE)))
         * {_ENT_Q} + CAST(0.5 AS DOUBLE)) AS BIGINT) AS pmi_q
  FROM bi JOIN u1 USING (w1) JOIN u2 USING (w2) CROSS JOIN n
  WHERE bi.c_bi >= {_PMI_MIN_COUNT}
)
SELECT w1, w2, CAST(c_bi AS BIGINT) AS c_bi, pmi_q,
       CAST(pmi_q AS DOUBLE) / {_ENT_Q} AS pmi, rank
FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY pmi_q DESC, w1, w2) AS INT) AS rank
  FROM scored
) WHERE rank <= {_PMI_TOP}
"""


def q_docs_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence for the (lang, source)
    contingency table — the statistical gate a mixture dashboard runs
    before claiming two corpus facets are independent. Emits the
    quantized statistic, degrees of freedom, and per-cell contributions
    summed exactly: each (observed-expected)²/expected term is an IEEE
    double chain on exact integer counts, floored to the 1/Q lattice
    before the integer sum. One count aggregation + broadcast marginals;
    the corpus is scanned once."""
    d = _t(spark, sf_dir, "documents")
    obs = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("o")
    ).localCheckpoint(eager=False)  # feeds 4 consumers
    row = obs.groupBy("lang").agg(F.sum("o").alias("n_lang"))
    colm = obs.groupBy("source").agg(F.sum("o").alias("n_source"))
    tot = obs.agg(F.sum("o").alias("n_total"))
    expected = (
        F.col("n_lang").cast("double")
        * F.col("n_source").cast("double")
        / F.col("n_total").cast("double")
    )
    dev = F.col("o").cast("double") - expected
    term_q = F.floor(dev * dev / expected * _ENT_Q + F.lit(0.5)).cast("long")
    cells = (
        obs.join(F.broadcast(row), "lang")
        .join(F.broadcast(colm), "source")
        .crossJoin(F.broadcast(tot))
        .select(term_q.alias("tq"))
    )
    dims = (
        row.agg(F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(F.broadcast(colm.agg(F.count(F.lit(1)).alias("n_cols"))))
    )
    return (
        cells.agg(F.sum("tq").cast("bigint").alias("chi2_q"))
        .crossJoin(F.broadcast(dims))
        .select(
            "chi2_q",
            (F.col("chi2_q").cast("double") / _ENT_Q).alias("chi2"),
            ((F.col("n_rows") - 1) * (F.col("n_cols") - 1))
            .cast("bigint")
            .alias("dof"),
        )
    )


Q_DOCS_CHI_SQUARE_SQL = f"""
WITH obs AS (SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2),
row_m AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS n_lang FROM obs GROUP BY 1),
col_m AS (SELECT source, CAST(SUM(o) AS BIGINT) AS n_source FROM obs GROUP BY 1),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n_total FROM obs),
cells AS (
  SELECT CAST(FLOOR(
    (CAST(o.o AS DOUBLE)
     - CAST(r.n_lang AS DOUBLE) * CAST(c.n_source AS DOUBLE)
       / CAST(t.n_total AS DOUBLE))
    * (CAST(o.o AS DOUBLE)
       - CAST(r.n_lang AS DOUBLE) * CAST(c.n_source AS DOUBLE)
         / CAST(t.n_total AS DOUBLE))
    / (CAST(r.n_lang AS DOUBLE) * CAST(c.n_source AS DOUBLE)
       / CAST(t.n_total AS DOUBLE))
    * {_ENT_Q} + CAST(0.5 AS DOUBLE)) AS BIGINT) AS tq
  FROM obs o
  JOIN row_m r USING (lang) JOIN col_m c USING (source) CROSS JOIN tot t
),
dims AS (
  SELECT (SELECT COUNT(*) FROM row_m) AS n_rows,
         (SELECT COUNT(*) FROM col_m) AS n_cols
)
SELECT CAST(SUM(tq) AS BIGINT) AS chi2_q,
       CAST(SUM(tq) AS DOUBLE) / {_ENT_Q} AS chi2,
       CAST((d.n_rows - 1) * (d.n_cols - 1) AS BIGINT) AS dof
FROM cells CROSS JOIN dims d
GROUP BY d.n_rows, d.n_cols
"""


def q_events_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford leading-digit audit of event values — the fraud/synthetic-
    data smell test. The leading digit comes from the INTEGER string of
    the 1e-4-quantized value (both engines print integers identically;
    extracting digits from a double's formatting would diverge), so the
    whole query is counting + integer-lattice shares."""
    e = _t(spark, sf_dir, "events")
    vq = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
    digits = (
        e.select(vq.alias("vq"))
        .filter(F.col("vq") > 0)
        .select(F.substring(F.col("vq").cast("string"), 1, 1).alias("digit"))
    )
    counts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    ).localCheckpoint(eager=False)  # feeds totals AND the share projection
    total = counts.agg(F.sum("n").alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            F.expr("n * 1000000L div n_total").alias("share_q"),
        )
    )


Q_EVENTS_BENFORD_SQL = """
WITH digits AS (
  SELECT substr(CAST(vq AS VARCHAR), 1, 1) AS digit
  FROM (SELECT CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS vq FROM events)
  WHERE vq > 0
),
counts AS (SELECT digit, COUNT(*) AS n FROM digits GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM counts)
SELECT digit, CAST(n AS BIGINT) AS n,
       CAST(n * 1000000 // n_total AS BIGINT) AS share_q
FROM counts CROSS JOIN tot
"""


def q_events_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) comparing 'click' vs 'view' values —
    the non-parametric twin of ``events_welch_t``, computed ENTIRELY in
    integers. Like the KS twin below, the corpus is aggregated to the
    DISTINCT quantized-value grid FIRST (per-value a/b counts), and the
    ordered window runs only over that bounded frame: with cumulative
    group size giving min-rank r(v) = 1 + cum-count(<v) and tie-group
    size c(v) = a(v)+b(v), each observation's doubled midrank is
    2·r(v) + c(v) − 1, so 2·R₁ = Σ_v a(v)·(2·r(v)+c(v)−1) and 2·U₁ are
    exact BIGINTs (float midranks would be summation-order-dependent).
    A per-ROW rank window here would funnel every event through one
    task — the r06-verdict scale-killer this formulation replaces; the
    distinct-value frame is capped by the 1e-4 quantization lattice."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_WELCH_A, _WELCH_B)
    )
    vq = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
    per_val = (
        e.select("event_type", vq.alias("vq"))
        .groupBy("vq")
        .agg(
            F.sum(F.when(F.col("event_type") == _WELCH_A, 1).otherwise(0)).alias("a"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    # frame = DISTINCT 1e-4-quantized values (the lattice), not rows;
    # bounded_global declares the intended single partition (fence-
    # allowlisted with this bound)
    from kafka_connect_bigquery_spark.functions.winutil import bounded_global

    w = bounded_global("vq").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_val.select(
        "a",
        "c",
        (F.coalesce(F.sum("c").over(w), F.lit(0)) + 1).alias("r"),
    )
    return (
        ranked.agg(
            F.sum("a").alias("na"),
            F.sum(F.col("c") - F.col("a")).alias("nb"),
            F.sum(F.col("a") * (2 * F.col("r") + F.col("c") - 1)).alias("ra2"),
        )
        .select(
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            F.col("ra2").cast("bigint").alias("rank_sum_x2"),
            (F.col("ra2") - F.col("na") * (F.col("na") + 1))
            .cast("bigint")
            .alias("u_x2"),
        )
        # degenerate-corpus guard: the SQL oracle's a CROSS JOIN b frame
        # is EMPTY when either event type has no rows, while a global
        # agg always emits one row (NULL/0-filled on an empty or
        # one-group input) — filter it back to the empty frame so both
        # engines agree on every input, not just populated ones
        .filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
    )


Q_EVENTS_MANNWHITNEY_SQL = f"""
WITH base AS (
  SELECT event_type, CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS vq
  FROM events WHERE event_type IN ('click', 'view')
),
ranked AS (
  SELECT event_type,
         2 * rank() OVER (ORDER BY vq)
           + COUNT(*) OVER (PARTITION BY vq) - 1 AS mid2
  FROM base
),
g AS (
  SELECT event_type, COUNT(*) AS n, CAST(SUM(mid2) AS BIGINT) AS r2
  FROM ranked GROUP BY 1
)
SELECT CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
       a.r2 AS rank_sum_x2,
       CAST(a.r2 - a.n * (a.n + 1) AS BIGINT) AS u_x2
FROM (SELECT * FROM g WHERE event_type = 'click') a
CROSS JOIN (SELECT * FROM g WHERE event_type = 'view') b
"""


def q_events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic for 'click' vs 'view'
    value distributions, kept INTEGER throughout: with cumulative
    counts c₁(x), c₂(x) at each observed value, the sup-distance
    D = max|c₁/n₁ − c₂/n₂| is reported as the exact integer numerator
    max|c₁·n₂ − c₂·n₁| over the common denominator n₁·n₂ — float ECDFs
    would tie-break differently across engines. Cumulative counts come
    from one ordered window over the distinct-value grid."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_WELCH_A, _WELCH_B)
    )
    vq = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
    per_val = (
        e.select("event_type", vq.alias("vq"))
        .groupBy("vq")
        .agg(
            F.sum(F.when(F.col("event_type") == _WELCH_A, 1).otherwise(0)).alias("a"),
            F.sum(F.when(F.col("event_type") == _WELCH_B, 1).otherwise(0)).alias("b"),
        )
        .localCheckpoint(eager=False)  # feeds the cumulative window AND totals
    )
    # frame = DISTINCT quantized-value grid (fence-allowlisted bound)
    from kafka_connect_bigquery_spark.functions.winutil import bounded_global

    w = bounded_global("vq").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_val.select(
        F.sum("a").over(w).alias("ca"), F.sum("b").over(w).alias("cb")
    )
    tot = per_val.agg(
        F.sum("a").alias("na"), F.sum("b").alias("nb")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")).alias("d"),
            "na",
            "nb",
        )
        .agg(
            F.max("d").cast("bigint").alias("d_num"),
            F.first("na").cast("bigint").alias("n_a"),
            F.first("nb").cast("bigint").alias("n_b"),
            (F.max("d").cast("double") / (F.first("na") * F.first("nb")).cast("double"))
            .alias("d_stat"),
        )
    )


Q_EVENTS_KS_SQL = """
WITH per_val AS (
  SELECT vq,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS b
  FROM (SELECT event_type, CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS vq
        FROM events WHERE event_type IN ('click', 'view'))
  GROUP BY 1
),
cum AS (
  SELECT SUM(a) OVER w AS ca, SUM(b) OVER w AS cb FROM per_val
  WINDOW w AS (ORDER BY vq ROWS UNBOUNDED PRECEDING)
),
tot AS (
  SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb FROM per_val
)
SELECT CAST(MAX(abs(ca * nb - cb * na)) AS BIGINT) AS d_num,
       ANY_VALUE(na) AS n_a, ANY_VALUE(nb) AS n_b,
       CAST(MAX(abs(ca * nb - cb * na)) AS DOUBLE)
         / CAST(ANY_VALUE(na) * ANY_VALUE(nb) AS DOUBLE) AS d_stat
FROM cum CROSS JOIN tot
"""


_WELCH_A, _WELCH_B = "click", "view"


def q_events_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic comparing 'click' vs 'view'
    event values — the A/B-test read-out, computed entirely from exact
    additive sufficient statistics (n, Σvq, Σvq²) so the distributed
    aggregation is summation-order-free; the final mean/variance/t
    chain is a fixed sequence of IEEE double ops, quantized once at the
    end. Includes the Welch–Satterthwaite degrees of freedom."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_WELCH_A, _WELCH_B)
    )
    vq = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
    stats = (
        e.select("event_type", vq.alias("vq"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("vq").alias("s1"),
            F.sum(F.col("vq") * F.col("vq")).alias("s2"),
        )
        .localCheckpoint(eager=False)  # filtered twice (A side, B side)
    )
    a = stats.filter(F.col("event_type") == _WELCH_A).select(
        F.col("n").alias("na"), F.col("s1").alias("sa"), F.col("s2").alias("qa")
    )
    b = stats.filter(F.col("event_type") == _WELCH_B).select(
        F.col("n").alias("nb"), F.col("s1").alias("sb"), F.col("s2").alias("qb")
    )
    j = a.crossJoin(F.broadcast(b))
    # all doubles from here: identical op sequence on both engines
    ma = F.col("sa").cast("double") / F.col("na").cast("double") / 10000.0
    mb = F.col("sb").cast("double") / F.col("nb").cast("double") / 10000.0
    # sample variance of v = (Σv² - n·m²)/(n-1), v in 1e-4 units
    va = (
        F.col("qa").cast("double") / 100000000.0
        - F.col("na").cast("double") * ma * ma
    ) / (F.col("na").cast("double") - F.lit(1.0))
    vb = (
        F.col("qb").cast("double") / 100000000.0
        - F.col("nb").cast("double") * mb * mb
    ) / (F.col("nb").cast("double") - F.lit(1.0))
    sea = va / F.col("na").cast("double")
    seb = vb / F.col("nb").cast("double")
    t = (ma - mb) / F.sqrt(sea + seb)
    dof = (sea + seb) * (sea + seb) / (
        sea * sea / (F.col("na").cast("double") - F.lit(1.0))
        + seb * seb / (F.col("nb").cast("double") - F.lit(1.0))
    )
    q = F.lit(float(_ENT_Q))
    return j.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.floor(t * q + F.lit(0.5)).cast("bigint").alias("t_q"),
        (F.floor(t * q + F.lit(0.5)).cast("double") / q).alias("t_stat"),
        F.floor(dof * q + F.lit(0.5)).cast("bigint").alias("dof_q"),
    )


Q_EVENTS_WELCH_SQL = f"""
WITH stats AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(vq) AS BIGINT) AS s1,
         CAST(SUM(vq * vq) AS BIGINT) AS s2
  FROM (SELECT event_type, CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS vq
        FROM events WHERE event_type IN ('{_WELCH_A}', '{_WELCH_B}'))
  GROUP BY 1
),
j AS (
  SELECT a.n AS na, a.s1 AS sa, a.s2 AS qa,
         b.n AS nb, b.s1 AS sb, b.s2 AS qb
  FROM (SELECT * FROM stats WHERE event_type = '{_WELCH_A}') a
  CROSS JOIN (SELECT * FROM stats WHERE event_type = '{_WELCH_B}') b
),
calc AS (
  SELECT na, nb,
    CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 10000.0 AS ma,
    CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 10000.0 AS mb,
    (CAST(qa AS DOUBLE) / 100000000.0
      - CAST(na AS DOUBLE)
        * (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 10000.0)
        * (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 10000.0))
      / (CAST(na AS DOUBLE) - CAST(1.0 AS DOUBLE)) AS va,
    (CAST(qb AS DOUBLE) / 100000000.0
      - CAST(nb AS DOUBLE)
        * (CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 10000.0)
        * (CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 10000.0))
      / (CAST(nb AS DOUBLE) - CAST(1.0 AS DOUBLE)) AS vb
  FROM j
),
ses AS (
  SELECT na, nb, ma, mb,
         va / CAST(na AS DOUBLE) AS sea,
         vb / CAST(nb AS DOUBLE) AS seb
  FROM calc
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
  CAST(FLOOR((ma - mb) / sqrt(sea + seb) * {_ENT_Q}.0
             + CAST(0.5 AS DOUBLE)) AS BIGINT) AS t_q,
  CAST(FLOOR((ma - mb) / sqrt(sea + seb) * {_ENT_Q}.0
             + CAST(0.5 AS DOUBLE)) AS DOUBLE) / {_ENT_Q}.0 AS t_stat,
  CAST(FLOOR((sea + seb) * (sea + seb)
       / (sea * sea / (CAST(na AS DOUBLE) - CAST(1.0 AS DOUBLE))
          + seb * seb / (CAST(nb AS DOUBLE) - CAST(1.0 AS DOUBLE)))
       * {_ENT_Q}.0 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS dof_q
FROM ses
"""


_STRAT_RATES = {"en": 0.5, "de": 1.0, "fr": 0.25}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing stratified sample: per-language keep rates
    (all German, half English, quarter French, drop the rest),
    deterministic per document."""
    from kafka_connect_bigquery_spark.operators import sampling

    d = _t(spark, sf_dir, "documents")
    return sampling.stratified_hash_sample(
        d, "doc_id", "lang", _STRAT_RATES
    ).select("doc_id", "lang")


def _strat_sql() -> str:
    u = (
        "CAST(concat('0x', substr(md5(concat('strat', CAST(doc_id AS VARCHAR))), 1, 8))"
        " AS BIGINT) / 4294967296.0"
    )
    cases = " ".join(
        f"WHEN lang = '{k}' THEN {r}" for k, r in sorted(_STRAT_RATES.items())
    )
    return f"""
SELECT doc_id, lang FROM documents
WHERE {u} < (CASE {cases} ELSE 0.0 END)
"""


Q_STRATIFIED_SAMPLE_SQL = _strat_sql()

_MIX_ALPHA = 0.5


def q_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain rebalancing (alpha=0.5): keep rates
    derived from per-source counts so the output mixture tracks
    count^alpha — dominant sources shed mass, the rarest keeps all.
    Deterministic md5 membership; rate table broadcast, corpus
    un-shuffled."""
    from kafka_connect_bigquery_spark.operators import sampling

    d = _t(spark, sf_dir, "documents")
    return sampling.mixture_rebalance(
        d, "doc_id", "lang", alpha=_MIX_ALPHA
    ).select("doc_id", "lang", "n_source")


_MIX_U = (
    "CAST(concat('0x', substr(md5(concat('mix', CAST(doc_id AS VARCHAR))), 1, 8))"
    " AS BIGINT) / 4294967296.0"
)

Q_MIXTURE_REBALANCE_SQL = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n_source FROM documents GROUP BY lang
),
rates AS (
  SELECT lang, n_source,
         pow(CAST(n_source AS DOUBLE), {_MIX_ALPHA - 1.0}) /
           MAX(pow(CAST(n_source AS DOUBLE), {_MIX_ALPHA - 1.0})) OVER ()
           AS keep_rate
  FROM counts
)
SELECT d.doc_id, d.lang, r.n_source
FROM documents d JOIN rates r USING (lang)
WHERE {_MIX_U} < r.keep_rate
"""

# ---------------------------------------------------------------------------
# BQ-shape record projection (reference conversion surface, P3-P6 + L1)
# ---------------------------------------------------------------------------

def q_bq_shape_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's record-conversion surface as one projection over
    events: schemaless-JSON field extraction, bytes→base64 (P4), double
    special clamp (P5), the Timestamp wire format (P6,
    'yyyy-MM-dd HH:mm:ss.SSS' UTC), and the day-partition column (L1).

    Scale: pure narrow projection — no shuffle, whole-stage codegen'd,
    runs at scan speed on any cluster size."""
    from kafka_connect_bigquery_spark.functions import bq_shape

    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.regexp_extract(F.col("props"), r'"k": (\d+)', 1).cast("long").alias("prop_k"),
        bq_shape.bytes_to_base64(F.encode(F.col("event_type"), "UTF-8")).alias(
            "event_type_b64"
        ),
        bq_shape.clamp_double_specials(F.col("value")).alias("value_clamped"),
        F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss.SSS").alias("ts_wire"),
        F.date_format(F.col("ts"), "yyyy-MM-dd").alias("p_date"),
    )


Q_BQ_SHAPE_SQL = f"""
SELECT event_id,
       CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS prop_k,
       base64(encode(event_type)) AS event_type_b64,
       CASE WHEN isnan(value) THEN 4.9e-324 ELSE value END AS value_clamped,
       strftime({_TS_US_EXT}, '%Y-%m-%d %H:%M:%S.%g') AS ts_wire,
       strftime({_TS_US_EXT}, '%Y-%m-%d') AS p_date
FROM events
"""

# ---------------------------------------------------------------------------
# text: PII scrub (training-data redaction pass)
# ---------------------------------------------------------------------------

# Patterns chosen to mean the same thing under Java regex (Spark) and
# RE2 (DuckDB): character classes, +, {2,} only — no lookarounds.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL_RE = r"https?://[^\s]+"


def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over documents: count and mask emails and URLs —
    the standard scrub pass before LLM training. The synthetic corpus
    carries no PII, so deterministic addresses derived from doc_id are
    woven in first (both engines build the identical wire text); the
    scrub itself is two JVM-side regexp passes, no UDFs, embarrassingly
    parallel at 100 TB."""
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    wire = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" contact user"), did, F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit(" see https://data.example.org/doc/"), did),
        ).otherwise(F.lit("")),
    )
    w = d.withColumn("w", wire)
    return w.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("w"), F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("w"), F.lit(_URL_RE), F.lit(0)))
        .cast("long")
        .alias("n_urls"),
        F.regexp_replace(
            F.regexp_replace(F.col("w"), _EMAIL_RE, "<EMAIL>"), _URL_RE, "<URL>"
        ).alias("scrubbed"),
    )


Q_TEXT_PII_SQL = f"""
WITH wire AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 4 = 0
                 THEN ' see https://data.example.org/doc/' || CAST(doc_id AS VARCHAR)
                 ELSE '' END AS w
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(w, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(w, '{_URL_RE}')) AS BIGINT) AS n_urls,
       regexp_replace(regexp_replace(w, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_URL_RE}', '<URL>', 'g') AS scrubbed
FROM wire
"""


# ---------------------------------------------------------------------------
# text: composite quality gate (Gopher-style rules)
# ---------------------------------------------------------------------------

def q_docs_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite quality gate: token-count bounds plus
    mean-token-length bounds decide keep/drop. Mean length is emitted as
    a floor(x*100) integer so the threshold compare is engine-exact (no
    raw double comparisons). Pure column arithmetic over the canonical
    text — one projection, no shuffle."""
    from kafka_connect_bigquery_spark.operators.dedup import canonical_text

    d = _t(spark, sf_dir, "documents")
    c = canonical_text(F.col("text"))
    w = d.select("doc_id", c.alias("c"))
    n = F.size(F.split(F.col("c"), " "))
    # canonical text is single-spaced: total token chars = len - (n-1)
    total_chars = F.length(F.col("c")) - n + 1
    mean_len_x100 = F.floor(F.lit(100) * total_chars / n).cast("long")
    out = w.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        mean_len_x100.alias("mean_len_x100"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_tokens") >= 20)
        & (F.col("n_tokens") <= 80)
        & (F.col("mean_len_x100") >= 350)
        & (F.col("mean_len_x100") <= 500),
    )


Q_DOCS_QUALITY_SQL = f"""
WITH canon AS (SELECT doc_id, {_CANON} AS c FROM documents),
m AS (
  SELECT doc_id,
         len(str_split(c, ' ')) AS n,
         length(c) - len(str_split(c, ' ')) + 1 AS total_chars
  FROM canon)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(floor(100 * total_chars / n) AS BIGINT) AS mean_len_x100,
       (n >= 20 AND n <= 80
        AND floor(100 * total_chars / n) >= 350
        AND floor(100 * total_chars / n) <= 500) AS keep
FROM m
"""


# ---------------------------------------------------------------------------
# text: repetition statistics (Gopher repetition-rule family)
# ---------------------------------------------------------------------------

def q_text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signal for quality filtering (the Gopher 'fraction of
    characters in the most common n-gram' rule): per document, the count
    of the most-frequent token bigram and the total bigram count. Ratio
    stays integer/integer (emit both, compare exactly). Plan: bigrams are
    built row-locally with zip_with against the token array's own tail
    (no window, no extra shuffle), then explode -> two aggregations on
    doc_id-prefixed keys. No UDFs anywhere."""
    from kafka_connect_bigquery_spark.operators.dedup import canonical_text

    d = _t(spark, sf_dir, "documents")
    toks = F.split(canonical_text(F.col("text")), " ")
    tail = F.slice(toks, F.lit(2), F.size(toks))
    bigrams = F.filter(
        F.zip_with(toks, tail, lambda x, y: F.concat_ws(" ", x, y)),
        lambda b: b.contains(" "),
    )
    big = d.select("doc_id", F.explode(bigrams).alias("bigram"))
    counts = big.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("c"))
    # only the max/total counts are emitted — naming the argmax bigram is
    # tie-unstable across engines and adds nothing to the filter rule
    return counts.groupBy("doc_id").agg(
        F.max("c").cast("long").alias("top_bigram_count"),
        F.sum("c").cast("long").alias("n_bigrams"),
    )


Q_TEXT_REPETITION_SQL = f"""
WITH canon AS (SELECT doc_id, {_CANON} AS c FROM documents),
tok AS (
  -- DuckDB 1.0 has no WITH ORDINALITY; index through unnest(range())
  SELECT doc_id,
         str_split(c, ' ')[CAST(u.pos AS INT) + 1] AS tok,
         u.pos AS pos
  FROM canon, unnest(range(len(str_split(c, ' ')))) AS u(pos)
),
big AS (
  SELECT doc_id,
         tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
  FROM tok
),
counts AS (
  -- lead() past the end is NULL and NULL-concat nulls the bigram,
  -- mirroring the Spark side's nxt IS NOT NULL filter
  SELECT doc_id, bigram, COUNT(*) AS c
  FROM big WHERE bigram IS NOT NULL
  GROUP BY 1, 2
)
SELECT doc_id,
       CAST(max(c) AS BIGINT) AS top_bigram_count,
       CAST(sum(c) AS BIGINT) AS n_bigrams
FROM counts GROUP BY doc_id
"""


def q_docs_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty — the corpus-curation twin of the
    repetition rules: for each document, how many of its DISTINCT token
    trigrams appear in no other document (corpus df == 1). Low novelty
    flags template/boilerplate mass a pretraining mix should
    down-weight; ``dedup_*`` finds near-copies, this finds the
    mushier "everything here is phrased like everything else" signal.
    All integers: n_distinct_tri, n_unique_tri, novelty_x100 =
    100*unique DIV distinct. Plan: trigrams built row-locally
    (zip_with against the token array's own tails — no window, no
    shuffle), distinct per doc, then ONE shuffle on trigram for the
    df counts and a join back. Docs with < 3 tokens carry no trigram
    and drop out — same on both engines."""
    from kafka_connect_bigquery_spark.operators.dedup import canonical_text
    from kafka_connect_bigquery_spark.operators.skew import fan_out

    # widen unconditionally: the trigram explode + per-doc distinct
    # feeds a SHARED lazy checkpoint, so a narrow scan serializes the
    # materialization onto one core (profiled: 1.2 s single-task stage
    # at sf0.1 = ~80% of the query) — unlike the pre-r13 when_bytes
    # gate, which only paid off for non-checkpointed explodes. The
    # exchange moves raw text once; no-op on wide scans at 100 TB.
    d = fan_out(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = F.split(canonical_text(F.col("text")), " ")
    t2 = F.slice(toks, F.lit(2), F.size(toks))
    t3 = F.slice(toks, F.lit(3), F.size(toks))
    bc = F.zip_with(t2, t3, lambda b, c: F.concat(b, F.lit(" "), c))
    tri = F.zip_with(toks, bc, lambda a, x: F.concat(a, F.lit(" "), x))
    tris = F.filter(tri, lambda x: x.isNotNull())
    pairs = (
        d.select("doc_id", F.explode(tris).alias("tri"))
        .distinct()  # trigram TYPES per doc
        # EAGER: both consumer aggregations (and their join) would
        # otherwise re-analyze the full trigram-explode plan on every
        # downstream Dataset op — profiled 1.8 s of driver construction
        .localCheckpoint(eager=True)  # feeds BOTH aggregations below
    )
    # no join-back of df counts onto the corpus-sized pairs frame: a
    # trigram with df == 1 has exactly ONE owner, so min(doc_id) in the
    # df aggregation names it — unique-per-doc then reduces over <= one
    # row per trigram TYPE, and the only join left is 50k-row per-doc
    # frames instead of re-shuffling millions of (doc, tri) pairs.
    # Two corpus-sized shuffles instead of three; results identical.
    uniq_per_doc = (
        pairs.groupBy("tri")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.min("doc_id").alias("owner"),
        )
        .filter(F.col("df") == 1)
        .groupBy(F.col("owner").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_unique_tri"))
    )
    per_doc = (
        pairs.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_distinct_tri"))
        .join(uniq_per_doc, "doc_id", "left")
        .withColumn("n_unique_tri", F.coalesce("n_unique_tri", F.lit(0)))
    )
    # integer division on BOTH engines (Spark DIV / DuckDB //): a
    # double-then-cast would round on DuckDB but truncate on Spark
    novelty = F.expr("CAST(100 * n_unique_tri AS BIGINT) DIV n_distinct_tri")
    return per_doc.select(
        "doc_id",
        F.col("n_distinct_tri").cast("bigint").alias("n_distinct_tri"),
        F.col("n_unique_tri").cast("bigint").alias("n_unique_tri"),
        novelty.alias("novelty_x100"),
        (novelty < 20).alias("template_like"),
    )


Q_DOCS_NGRAM_NOVELTY_SQL = f"""
WITH canon AS (SELECT doc_id, {_CANON} AS c FROM documents),
tok AS (
  SELECT doc_id,
         str_split(c, ' ')[CAST(u.pos AS INT) + 1] AS tok,
         u.pos AS pos
  FROM canon, unnest(range(len(str_split(c, ' ')))) AS u(pos)
),
tri AS (
  SELECT DISTINCT doc_id,
         tok || ' ' || lead(tok) OVER w || ' ' || lead(tok, 2) OVER w AS tri
  FROM tok
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
pairs AS (SELECT doc_id, tri FROM tri WHERE tri IS NOT NULL),
dfc AS (SELECT tri, COUNT(*) AS df FROM pairs GROUP BY 1),
per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_tri,
         CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unique_tri
  FROM pairs JOIN dfc USING (tri) GROUP BY 1
)
SELECT doc_id, n_distinct_tri, n_unique_tri,
       CAST((100 * n_unique_tri) // n_distinct_tri AS BIGINT) AS novelty_x100,
       CAST((100 * n_unique_tri) // n_distinct_tri AS BIGINT) < 20
         AS template_like
FROM per_doc
"""


_KPG_K = 5


def q_sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sample: exactly 5 documents per
    language by md5-hash order — the reproducible eval-set construction
    primitive (rand() is not replayable, LIMIT is not per-group)."""
    from kafka_connect_bigquery_spark.operators import sampling

    return sampling.sample_k_per_group(
        _t(spark, sf_dir, "documents"), "doc_id", "lang", _KPG_K
    ).select("doc_id", "lang", "sample_rank")


_KPG_U = (
    "CAST(concat('0x', substr(md5(concat('kpg', CAST(doc_id AS VARCHAR))), 1, 8))"
    " AS BIGINT) / 4294967296.0"
)

Q_SAMPLE_K_PER_GROUP_SQL = f"""
SELECT doc_id, lang, sample_rank FROM (
  SELECT doc_id, lang,
         CAST(row_number() OVER (PARTITION BY lang
              ORDER BY {_KPG_U}, doc_id) AS BIGINT) AS sample_rank
  FROM documents
) WHERE sample_rank <= {_KPG_K}
"""


def q_text_bigram_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self bigram LM fluency per document (the cheap perplexity
    gate): mean quantized conditional bigram probability under the
    corpus's own counts — integer arithmetic end to end, so scores are
    engine- and partitioning-exact."""
    return text_fns.bigram_fluency(
        _t(spark, sf_dir, "documents"), "doc_id", "text"
    )


Q_TEXT_BIGRAM_FLUENCY_SQL = f"""
WITH toked AS (SELECT doc_id AS doc, {_TOKS} AS toks FROM documents),
grams AS (
  SELECT doc, toks[CAST(i AS INT)] AS w1, toks[CAST(i AS INT) + 1] AS w2
  FROM toked, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS t(i)
),
lm AS (SELECT w1, w2, COUNT(*) AS c_bi FROM grams GROUP BY 1, 2),
uni AS (SELECT w1, COUNT(*) AS c_uni FROM grams GROUP BY 1),
model AS (
  SELECT lm.w1, lm.w2, (c_bi * {text_fns.LM_Q}) // c_uni AS q
  FROM lm JOIN uni USING (w1)
)
SELECT doc, COUNT(*) AS n_bigrams,
       CAST(SUM(q) AS BIGINT) AS lm_score_q,
       CAST(SUM(q) AS DOUBLE) / COUNT(*) AS fluency
FROM grams JOIN model USING (w1, w2)
GROUP BY doc
"""


_BM25_TERMS = ["dup", "vector", "merge"]


def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 relevance of every document to a fixed 3-term query
    (functions/text.py:bm25_scores): quantized-ln idf, length-normalized
    tf saturation, integer per-term contributions. Sparse-retrieval
    scoring — the ranking half of a hybrid (BM25 + ANN) search stack."""
    return text_fns.bm25_scores(
        _t(spark, sf_dir, "documents"), "doc_id", "text", _BM25_TERMS
    )


_BM25_IN = ", ".join(f"'{t}'" for t in _BM25_TERMS)

# Literal doubles are CAST explicitly: DuckDB parses 0.75 as DECIMAL and
# would do exact decimal math where Spark does IEEE double math.
Q_TEXT_BM25_SQL = f"""
WITH toked AS (SELECT doc_id AS doc, {_TOKS} AS toks FROM documents),
dls AS (SELECT doc, len(toks) AS dl, toks FROM toked),
stats AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_dl FROM dls
),
posts AS (SELECT doc, dl, unnest(toks) AS term FROM dls),
tf AS (
  SELECT doc, dl, term, COUNT(*) AS tf FROM posts
  WHERE term IN ({_BM25_IN}) GROUP BY 1, 2, 3
),
dfreq AS (SELECT term, COUNT(*) AS dfq FROM tf GROUP BY 1),
scored AS (
  SELECT t.doc,
    CAST(FLOOR(
      ((t.tf * CAST(2.2 AS DOUBLE)) /
       (t.tf + CAST(1.2 AS DOUBLE) *
        (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * t.dl /
         (CAST(s.total_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))))
      * FLOOR(ln(CAST(1.0 AS DOUBLE) +
           (CAST(s.n_docs - d.dfq AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
           (CAST(d.dfq AS DOUBLE) + CAST(0.5 AS DOUBLE)))
          * {text_fns.BM25_Q} + CAST(0.5 AS DOUBLE))
      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS contrib_q
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN stats s
)
SELECT doc, CAST(SUM(contrib_q) AS BIGINT) AS score_q,
       CAST(SUM(contrib_q) AS DOUBLE) / {text_fns.BM25_Q} AS score,
       CAST(COUNT(*) AS BIGINT) AS n_terms
FROM scored GROUP BY 1
"""


def q_bm25_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental BM25 search-index maintenance over the warehouse CDC
    feed: the (doc,dl) and (doc,term,tf) index tables built at snapshot
    v0 absorb a delta MERGE — inserts AND re-upserts of existing docs —
    by removing pre-image rows and adding post-image rows from
    ``read_changes(images="both")``, then scoring from the maintained
    tables (functions/text.py:bm25_from_tables). The oracle is the
    full-corpus BM25 SQL, so maintained == recomputed bit-for-bit.
    This is how a 100 TB search index actually lives: per-ingest cost
    follows the delta; documents are never re-tokenized."""
    import os as _os
    import shutil as _sh
    import tempfile
    import time as _time
    import uuid as _uuid

    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = _os.path.join(tempfile.gettempdir(), "kcbq_spark_incbm25")
    _os.makedirs(base, exist_ok=True)
    now = _time.time()
    for stale in _os.listdir(base):
        p = _os.path.join(base, stale)
        try:
            if now - _os.path.getmtime(p) > 3600:
                _sh.rmtree(p, ignore_errors=True)
        except OSError:
            pass
    wh = Warehouse(spark, _os.path.join(base, _uuid.uuid4().hex[:12]))
    spec = TableSpec(partition_grain="NONE", key_bucket_count=8)
    is_new = F.pmod(F.col("doc_id"), F.lit(10)) == 0
    is_touch = (F.pmod(F.col("doc_id"), F.lit(7)) == 0) & ~is_new
    # v0: the base corpus; v1: new docs + same-content re-upserts of
    # every 7th doc (the re-upserts exercise the pre-image removal path)
    wh.merge(
        docs.filter(~is_new).withColumn("i", F.col("doc_id")),
        "docs", ["doc_id"], mode="upsert", order_col="i", spec=spec,
    )
    wh.merge(
        docs.filter(is_new | is_touch).withColumn("i", F.col("doc_id")),
        "docs", ["doc_id"], mode="upsert", order_col="i", spec=spec,
    )
    base_docs = wh.read("docs", version=0).select("doc_id", "text")
    dl_v0 = text_fns.bm25_doc_lengths(base_docs, "doc_id", "text").select("doc", "dl")
    tf_v0 = text_fns.bm25_postings(base_docs, "doc_id", "text", _BM25_TERMS)

    ch = wh.read_changes("docs", from_version=0, images="both")
    removed = ch.filter(
        F.col("_change_type").isin("update_preimage", "delete")
    ).select(F.col("doc_id").alias("doc")).distinct()
    added = ch.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).select("doc_id", "text")

    dl = dl_v0.join(removed, "doc", "left_anti").unionByName(
        text_fns.bm25_doc_lengths(added, "doc_id", "text").select("doc", "dl")
    )
    tf = tf_v0.join(removed, "doc", "left_anti").unionByName(
        text_fns.bm25_postings(added, "doc_id", "text", _BM25_TERMS)
    )
    return text_fns.bm25_from_tables(tf, dl)


# ---------------------------------------------------------------------------
# sequence packing + decontamination (training-data layout operators)
# ---------------------------------------------------------------------------

_PACK_BUDGET = 2048
_PACK_SHARDS = 8  # sf-test value; production uses O(cluster cores)
_SHARD_TPS = 50_000  # tokens (chars) per training shard


def q_corpus_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced training-shard planning (operators/packing.py::
    shard_plan): documents take a seeded-hash global order (the corpus
    shuffle), then an exact global running character sum — computed as
    a TWO-LEVEL distributed prefix sum (within-hash-bucket window +
    broadcast bucket offsets), never a single-partition window — bins
    them into ~50k-char shards. The oracle recomputes the cumsum with
    one global window (fine at test scale) and must match bit-for-bit:
    the decomposition is exact, not approximate."""
    from kafka_connect_bigquery_spark.operators.packing import shard_plan

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = shard_plan(d, "doc_id", "n_chars", tokens_per_shard=_SHARD_TPS)
    return out.select("doc_id", "h", "cum_tokens", "shard_id")


Q_CORPUS_SHARD_PLAN_SQL = f"""
WITH t AS (
  SELECT doc_id, n_chars,
         CAST(concat('0x', substr(md5(concat('shardplan', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS h
  FROM documents
),
c AS (
  SELECT doc_id, n_chars, h,
         SUM(n_chars) OVER (ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT doc_id, h, CAST(cum AS BIGINT) AS cum_tokens,
       CAST((cum - n_chars) // {_SHARD_TPS} AS BIGINT) AS shard_id
FROM c
"""


def q_docs_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: where each document's tokens
    land in the fixed-budget training-sequence layout (shard, offset,
    sequence index, boundary-straddle flag). See operators/packing.py
    for the scale design (per-shard windows, no global sort)."""
    from kafka_connect_bigquery_spark.operators import packing

    return packing.sequence_pack(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        budget=_PACK_BUDGET,
        n_shards=_PACK_SHARDS,
    )


Q_DOCS_SEQUENCE_PACK_SQL = f"""
WITH toked AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(concat('pack', CAST(doc_id AS VARCHAR))), 1, 8))
              AS BIGINT) % {_PACK_SHARDS} AS shard,
         {_SUBTOK_SQL} AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, shard, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS token_end
  FROM toked
)
SELECT doc_id, shard, n_tokens,
       token_end - n_tokens AS token_offset,
       CAST(FLOOR((token_end - n_tokens) / {_PACK_BUDGET}.0) AS BIGINT) AS seq_index,
       n_tokens > 0 AND
         CAST(FLOOR((token_end - 1) / {_PACK_BUDGET}.0) AS BIGINT)
           != CAST(FLOOR((token_end - n_tokens) / {_PACK_BUDGET}.0) AS BIGINT)
         AS straddles
FROM cum
"""


_DECON_N = 5
_DECON_MAX_DF = 50


def q_docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set contamination scan: training documents sharing rare
    token 5-grams with the held-out test split (the GPT-3-style n-gram
    decontamination check), via inverted-index join on the gram hash
    with a stop-gram document-frequency guard."""
    from kafka_connect_bigquery_spark.operators import packing, sampling

    d = sampling.split_dataset(_t(spark, sf_dir, "documents"), "doc_id", _SPLITS)
    return packing.decontaminate(
        d,
        "doc_id",
        "text",
        "split",
        n=_DECON_N,
        max_gram_doc_freq=_DECON_MAX_DF,
    )


_SPLIT_U = (
    "CAST(concat('0x', substr(md5(concat('split', CAST(doc_id AS VARCHAR))), 1, 8))"
    " AS BIGINT) / 4294967296.0"
)

Q_DOCS_DECONTAMINATE_SQL = f"""
WITH split AS (
  SELECT doc_id, text,
         CASE WHEN {_SPLIT_U} < 0.8 THEN 'train'
              WHEN {_SPLIT_U} < 0.9 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
posts AS (
  SELECT doc_id, split, unnest(list_distinct(
           list_transform(range(1, greatest(len({_TOKS}) - {_DECON_N - 1}, 0) + 1),
             i -> md5(array_to_string({_TOKS}[CAST(i AS INT):CAST(i + {_DECON_N - 1} AS INT)], ' ')))
         )) AS gram
  FROM split
),
rare AS (SELECT gram FROM posts GROUP BY gram HAVING COUNT(*) <= {_DECON_MAX_DF}),
guarded AS (SELECT posts.* FROM posts JOIN rare USING (gram))
SELECT t.doc_id AS train_doc_id,
       COUNT(DISTINCT t.gram) AS n_shared_grams,
       COUNT(DISTINCT e.doc_id) AS n_eval_docs
FROM (SELECT doc_id, gram FROM guarded WHERE split = 'train') t
JOIN (SELECT doc_id, gram FROM guarded WHERE split = 'test') e USING (gram)
GROUP BY 1
HAVING COUNT(DISTINCT t.gram) >= 1
"""


# ---------------------------------------------------------------------------
# dedup: exact-substring duplicated runs (Lee et al. 2021)
# ---------------------------------------------------------------------------

_SUBSTR_N = 5


def q_dedup_substring_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr duplication profile (operators/dedup.py
    substring_run_stats): every token position whose 5-gram recurs in
    another document is marked, overlapping marks merge into maximal
    runs by an interval-union sweep, and each document reports its
    duplicated-token coverage — the cut signal of suffix-array dedup
    (Lee et al. 2021) at gram granularity. O(total tokens), no pairwise
    join anywhere: one gram groupBy, one semi-join, one per-doc window."""
    return dedup.substring_run_stats(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=_SUBSTR_N
    )


Q_DEDUP_SUBSTRING_RUNS_SQL = f"""
WITH base AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
pos AS (
  SELECT doc_id, u.pos, u.gram FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(len(tk) - {_SUBSTR_N - 1}, 0) + 1),
             i -> struct_pack(
                    pos := CAST(i - 1 AS BIGINT),
                    gram := md5(array_to_string(
                      tk[CAST(i AS INT):CAST(i + {_SUBSTR_N - 1} AS INT)], ' '))))
           ) AS u
    FROM base
  )
),
dup AS (SELECT gram FROM pos GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
marked AS (
  SELECT pos.doc_id, pos.pos AS s, pos.pos + {_SUBSTR_N - 1} AS e
  FROM pos JOIN dup USING (gram)
),
sweep AS (
  SELECT doc_id, s, e,
         CASE WHEN MAX(e) OVER w IS NULL OR s > MAX(e) OVER w + 1
              THEN 1 ELSE 0 END AS new_island
  FROM marked
  WINDOW w AS (PARTITION BY doc_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
isl AS (
  SELECT doc_id, s, e,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY s) AS island
  FROM sweep
),
runs AS (
  SELECT doc_id, island, MAX(e) - MIN(s) + 1 AS run_len, COUNT(*) AS n_starts
  FROM isl GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(n_starts) AS BIGINT) AS n_dup_starts,
         CAST(COUNT(*) AS BIGINT) AS n_dup_runs,
         CAST(SUM(run_len) AS BIGINT) AS dup_covered_tokens,
         CAST(MAX(run_len) AS BIGINT) AS longest_dup_run
  FROM runs GROUP BY 1
)
SELECT b.doc_id, CAST(len(b.tk) AS BIGINT) AS n_tokens,
       COALESCE(n_dup_starts, 0) AS n_dup_starts,
       COALESCE(n_dup_runs, 0) AS n_dup_runs,
       COALESCE(dup_covered_tokens, 0) AS dup_covered_tokens,
       COALESCE(longest_dup_run, 0) AS longest_dup_run,
       CASE WHEN len(b.tk) = 0 THEN CAST(0 AS BIGINT)
            ELSE COALESCE(dup_covered_tokens, 0) * 100 // len(b.tk) END AS dup_pct
FROM base b LEFT JOIN per_doc USING (doc_id)
"""


# ---------------------------------------------------------------------------
# DSIR importance weights (hashed n-gram importance resampling)
# ---------------------------------------------------------------------------

_DSIR_B = 1024
_DSIR_Q = 1_000_000


def q_docs_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (operators/sampling.py dsir_weights):
    hashed unigram+bigram bucket counts give every document a
    log-likelihood-ratio score of target-domain (here: lang='en')
    versus raw-corpus feature distributions — the Xie et al. 2023
    selection signal. Per-bucket ln is lattice-quantized before the
    integer per-doc sum, so scores are engine-exact; the LLR table is
    1024 rows and broadcasts."""
    from kafka_connect_bigquery_spark.operators import sampling

    return sampling.dsir_weights(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        F.col("lang") == "en",
        buckets=_DSIR_B,
        q=_DSIR_Q,
    )


Q_DOCS_DSIR_SQL = f"""
WITH base AS (SELECT doc_id, lang = 'en' AS is_target, {_TOKS} AS tk FROM documents),
feats AS (
  SELECT doc_id, is_target,
         CAST(concat('0x', substr(md5(concat('dsir:', feat)), 1, 8)) AS BIGINT)
           % {_DSIR_B} AS bucket
  FROM (
    SELECT doc_id, is_target,
           unnest(list_concat(tk,
             list_transform(range(1, len(tk)),
               i -> tk[CAST(i AS INT)] || ' ' || tk[CAST(i + 1 AS INT)])
           )) AS feat
    FROM base
  )
),
tf AS (SELECT doc_id, is_target, bucket, COUNT(*) AS tf FROM feats GROUP BY 1, 2, 3),
raw AS (SELECT bucket, CAST(SUM(tf) AS BIGINT) AS cnt_r FROM tf GROUP BY 1),
tgt AS (SELECT bucket, CAST(SUM(tf) AS BIGINT) AS cnt_t FROM tf
        WHERE is_target GROUP BY 1),
tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS tot_r,
               CAST(SUM(CASE WHEN is_target THEN tf ELSE 0 END) AS BIGINT) AS tot_t
        FROM tf),
llr AS (
  SELECT bucket,
         CAST(FLOOR(ln((CAST(COALESCE(cnt_t, 0) + 1 AS DOUBLE)
                        / CAST(tot_t + {_DSIR_B} AS DOUBLE))
                     / (CAST(COALESCE(cnt_r, 0) + 1 AS DOUBLE)
                        / CAST(tot_r + {_DSIR_B} AS DOUBLE)))
                  * {_DSIR_Q} + 0.5) AS BIGINT) AS llr_q
  FROM raw FULL JOIN tgt USING (bucket), tot
),
scores AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_features,
         CAST(SUM(tf * llr_q) AS BIGINT) AS dsir_logw_q
  FROM tf JOIN llr USING (bucket) GROUP BY 1
)
SELECT b.doc_id, b.is_target,
       COALESCE(n_features, 0) AS n_features,
       COALESCE(dsir_logw_q, 0) AS dsir_logw_q,
       COALESCE(dsir_logw_q, 0) > 0 AS target_like
FROM base b LEFT JOIN scores USING (doc_id)
"""


# ---------------------------------------------------------------------------
# vocabulary growth (Heaps-law corpus diagnostic)
# ---------------------------------------------------------------------------

_VOCAB_STEPS = 10


def q_docs_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth curve: cumulative token count and
    distinct-vocabulary size at 10 corpus prefixes (doc_id order) — the
    diagnostic that tells a data curator whether a crawl is still
    contributing new vocabulary or has gone stale/duplicative (V ~ K·N^β
    with β≈0.5 for healthy natural-language corpora; β→0 means the new
    data repeats the old). Scale shape: NO global window — each token's
    first-occurrence doc and each doc's token count reduce in one
    groupBy apiece; the 10 thresholds come from a 1-row min/max agg and
    broadcast, so the curve costs two corpus-sized aggregations however
    many steps are asked for."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(text_fns.tokens(F.col("text"))).alias("tok")
    )
    first = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    per_doc = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_toks"))
    bounds = d.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    steps = spark.range(1, _VOCAB_STEPS + 1).select(
        F.col("id").cast("int").alias("step")
    )
    # threshold_k = lo + (hi - lo) * k DIV steps  (integer lattice)
    th = steps.crossJoin(F.broadcast(bounds)).select(
        "step",
        (
            F.col("lo")
            + F.expr(f"(hi - lo) * step DIV {_VOCAB_STEPS}")
        ).alias("threshold"),
    )
    vocab = (
        th.join(first, first.first_doc <= th.threshold, "left")
        .groupBy("step", "threshold")
        .agg(F.count("tok").alias("vocab_size"))
    )
    toks_cum = (
        th.join(per_doc, per_doc.doc_id <= th.threshold, "left")
        .groupBy("step", "threshold")
        .agg(F.coalesce(F.sum("n_toks"), F.lit(0)).alias("n_tokens_cum"))
    )
    return (
        vocab.join(toks_cum, ["step", "threshold"])
        .select("step", "threshold", "n_tokens_cum", "vocab_size")
    )


Q_DOCS_VOCAB_GROWTH_SQL = f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
first AS (SELECT tok, MIN(doc_id) AS first_doc FROM toks GROUP BY 1),
per_doc AS (SELECT doc_id, COUNT(*) AS n_toks FROM toks GROUP BY 1),
bounds AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents),
steps AS (SELECT CAST(unnest(range(1, {_VOCAB_STEPS} + 1)) AS INT) AS step),
th AS (
  SELECT step, lo + (hi - lo) * step // {_VOCAB_STEPS} AS threshold
  FROM steps, bounds
),
vocab AS (
  SELECT step, threshold, CAST(COUNT(tok) AS BIGINT) AS vocab_size
  FROM th LEFT JOIN first ON first_doc <= threshold GROUP BY 1, 2
),
toks_cum AS (
  SELECT step, threshold,
         CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) AS n_tokens_cum
  FROM th LEFT JOIN per_doc ON doc_id <= threshold GROUP BY 1, 2
)
SELECT step, threshold, n_tokens_cum, vocab_size
FROM vocab JOIN toks_cum USING (step, threshold)
"""


# ---------------------------------------------------------------------------
# sparse text features: hashing trick + integer-exact cosine join
# ---------------------------------------------------------------------------

_SPARSE_DIM = 256
_SPARSE_T = 80
_SPARSE_MAXDF = 200


def q_text_hashed_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (operators/sparse.py): every document becomes a
    sparse term-frequency vector with no vocabulary pass — token →
    md5 bucket, one (doc, bucket, tf) row per occupied feature. The
    deterministic hash means the same text vectorizes identically on
    any engine, which the oracle proves."""
    from kafka_connect_bigquery_spark.operators import sparse

    return sparse.hashed_tf(
        _t(spark, sf_dir, "documents"), "doc_id", "text", dim=_SPARSE_DIM
    )


_SPARSE_TF_SQL = f"""
  SELECT doc_id,
         CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % {_SPARSE_DIM} AS bucket,
         COUNT(*) AS tf
  FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
  GROUP BY 1, 2
"""

Q_TEXT_HASHED_TF_SQL = f"SELECT doc_id, bucket, tf FROM ({_SPARSE_TF_SQL})"


def q_text_sparse_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse cosine similarity join over hashed-tf vectors: inverted-
    index join on shared feature buckets (stop-feature guard bounds the
    postings), integer dot products, and a cross-multiplied threshold —
    cos >= 0.8 decided without a single float op."""
    from kafka_connect_bigquery_spark.operators import sparse

    tf = sparse.hashed_tf(
        _t(spark, sf_dir, "documents"), "doc_id", "text", dim=_SPARSE_DIM
    )
    return sparse.cosine_pairs(
        tf, "doc_id", threshold_pct=_SPARSE_T, max_bucket_df=_SPARSE_MAXDF
    )


Q_TEXT_SPARSE_COSINE_SQL = f"""
WITH tf AS ({_SPARSE_TF_SQL}),
bdf AS (SELECT bucket, COUNT(*) AS d FROM tf GROUP BY 1),
g AS (SELECT tf.* FROM tf JOIN bdf USING (bucket) WHERE d <= {_SPARSE_MAXDF}),
dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
  FROM g a JOIN g b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
norms AS (SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS norm2 FROM g GROUP BY 1)
SELECT id_a, id_b, dot, na.norm2 AS norm2_a, nb.norm2 AS norm2_b
FROM dots
JOIN norms na ON id_a = na.doc_id
JOIN norms nb ON id_b = nb.doc_id
WHERE CAST(dot AS HUGEINT) * dot * 10000
      >= {_SPARSE_T * _SPARSE_T} * CAST(na.norm2 AS HUGEINT) * nb.norm2
"""


# ---------------------------------------------------------------------------
# distributed linear algebra: Gram matrix over the embedding corpus
# ---------------------------------------------------------------------------

_GRAM_DIM = 64


def q_embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X^T X over the embedding corpus (operators/linalg.py): the
    normal-equations / PCA building block as one aggregation — per-row
    upper-triangle outer products via a higher-order function (no
    self-join, no data shuffle), d(d+1)/2 output groups regardless of
    corpus size. Quantized-exact on the ANN QE lattice, so the oracle
    hash-matches the distributed sum."""
    from kafka_connect_bigquery_spark.operators import linalg

    return linalg.gram_matrix(
        _t(spark, sf_dir, "embeddings"), "embedding", dim=_GRAM_DIM
    )


Q_EMBEDDING_GRAM_SQL = f"""
WITH idx AS (SELECT unnest(range({_GRAM_DIM})) AS n),
p AS (
  SELECT i.n AS i, j.n AS j,
         CAST(FLOOR(CAST(embedding[CAST(i.n + 1 AS INT)] AS DOUBLE)
                    * CAST(embedding[CAST(j.n + 1 AS INT)] AS DOUBLE)
                    * {_QE} + 0.5)
              AS BIGINT) AS p
  FROM embeddings, idx i, idx j
  WHERE j.n >= i.n
)
SELECT i, j, CAST(SUM(p) AS DOUBLE) / {_QE}.0 AS gram FROM p GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# BPE vocabulary induction: adjacent-pair statistics
# ---------------------------------------------------------------------------

_BPE_K = 20


def q_bpe_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k most frequent adjacent subword pairs over the corpus
    (operators/bpe.py) — the statistic each BPE training round merges
    on, with a fully deterministic (count, pair-text) order. One
    map-side-combinable groupBy; the ranking window runs over the
    vocab^2-bounded pair table, never the corpus."""
    from kafka_connect_bigquery_spark.operators import bpe

    return bpe.top_pairs(_t(spark, sf_dir, "documents"), "text", k=_BPE_K)


_SUBTOK_ARR = "regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')"

Q_BPE_TOP_PAIRS_SQL = f"""
WITH toks AS (SELECT {_SUBTOK_ARR} AS tk FROM documents),
p AS (
  SELECT unnest(list_transform(range(1, len(tk)),
           i -> struct_pack(a := tk[CAST(i AS INT)],
                            b := tk[CAST(i + 1 AS INT)]))) AS pr
  FROM toks WHERE len(tk) >= 2
),
c AS (SELECT pr.a AS a, pr.b AS b, COUNT(*) AS cnt FROM p GROUP BY 1, 2),
r AS (SELECT a, b, cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, a, b) AS BIGINT) AS rnk
      FROM c)
SELECT a, b, cnt, rnk FROM r WHERE rnk <= {_BPE_K}
"""


# ---------------------------------------------------------------------------
# BPE tokenizer application (the inference half)
# ---------------------------------------------------------------------------

def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION — encode every document against a learned
    merge list (operators/bpe.py::apply_merges_words, the inference
    half of BPE; training is `bpe_top_pairs`/learn_merges_words). The
    merge list is PINNED [(t,h), (a,n), (e,</w>)] and chosen
    char-DISJOINT, which makes the merges provably independent (one
    merge can neither create nor destroy another's adjacency — the
    fused symbol is never a single char), so each word's subword count
    reduces to exact substring arithmetic the SQL oracle can compute;
    the Spark side still replays the REAL symbol-by-symbol fold over
    chars+</w>. Returns per-doc subword count, base symbol count and
    the x100 compression ratio — all integers.

    Scale — the DICTIONARY-ENCODED tokenize (how a 100 TB corpus is
    actually encoded): the symbol fold replays the merges over the
    DISTINCT vocabulary only (map-side-combined groupBy — vocab-sized,
    not corpus-sized), and the per-token subword counts broadcast-join
    back onto the exploded token stream. Cost per merge is
    O(vocab), not O(token instances) — the only shape under which a
    real 30k-merge vocabulary is even feasible. Measured at sf10
    (143.8M subwords): per-instance fold 87.1 s vs dict-encoded
    41.1 s (2.1x) with just THREE merges — the residual cost is the
    shared canonicalize+explode pass, so the dict win grows linearly
    with merge count while per-instance cost would. The fold itself
    is the REAL apply_merges_words machinery (operators/bpe.py), run
    on the vocab frame; the doc-level re-aggregation collapses
    map-side (143M partial-agg updates -> one ~|docs|-row exchange)."""
    from kafka_connect_bigquery_spark.operators import bpe
    from kafka_connect_bigquery_spark.operators.skew import fan_out

    d = fan_out(_t(spark, sf_dir, "documents"))
    merges = [("t", "h"), ("a", "n"), ("e", bpe.WORD_END)]
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(text_fns.tokens(F.col("text")), lambda w: w != F.lit(""))
        ).alias("tok"),
    ).localCheckpoint(eager=False)
    # ^ toks feeds BOTH the vocab build and the count join — without
    # the barrier the canonicalize+explode pass runs twice over the
    # corpus (ReuseExchange does not dedupe reused subtrees; verified
    # A/B: 43.6 -> 27.1 s at sf10, 5.46 -> 3.74 s at sf1). The
    # executor-local write of the (doc_id, tok) stream is the standard
    # trade against re-running the regex canonicalization at 100 TB.
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_n")).drop("_n")
    per_tok = bpe.apply_merges_words(vocab, "tok", merges).select(
        "tok",
        F.size("subwords").cast("long").alias("_k"),
        (F.length("tok") + 1).cast("long").alias("_b"),
    )
    agg = (
        toks.join(F.broadcast(per_tok), "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("_k").cast("long").alias("n_subwords"),
            F.sum("_b").cast("long").alias("n_base_symbols"),
        )
    )
    out = (
        d.select("doc_id")
        .join(agg, "doc_id", "left")
        .fillna(0, subset=["n_subwords", "n_base_symbols"])
    )
    return out.select(
        "doc_id",
        "n_subwords",
        "n_base_symbols",
        # integer DIV on both engines — a double divide + truncate can
        # land one below the exact quotient
        F.when(
            F.col("n_base_symbols") > 0,
            F.expr("(100 * n_subwords) div n_base_symbols"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("compression_x100"),
    )


Q_BPE_ENCODE_SQL = f"""
WITH w AS (
  SELECT doc_id, unnest(list_filter({_TOKS}, t -> t != '')) AS tok
  FROM documents
),
per AS (
  SELECT doc_id,
         SUM(len(tok) + 1) AS base,
         SUM(len(tok) + 1
             - (len(tok) - len(replace(tok, 'th', ''))) // 2
             - (len(tok) - len(replace(tok, 'an', ''))) // 2
             - CASE WHEN tok LIKE '%e' THEN 1 ELSE 0 END) AS subw
  FROM w GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(per.subw, 0) AS BIGINT) AS n_subwords,
       CAST(COALESCE(per.base, 0) AS BIGINT) AS n_base_symbols,
       CAST(CASE WHEN COALESCE(per.base, 0) > 0
                 THEN (100 * per.subw) // per.base ELSE 0 END AS BIGINT)
         AS compression_x100
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Avro wire-format round-trip (P9's Avro seam, witnessed as a batch query)
# ---------------------------------------------------------------------------

_AVRO_WIRE_SCHEMA = """{
  "type": "record", "name": "ev", "fields": [
    {"name": "event_id", "type": "long"},
    {"name": "user_id", "type": "long"},
    {"name": "event_type", "type": ["null", "string"]},
    {"name": "value", "type": "double"}
  ]
}"""


def q_avro_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Avro wire format witnessed end-to-end: events rows encode to
    RAW Avro binary (spec encoder, Arrow-batched) and decode back
    through the SAME value-parser seam the streaming pipeline plugs in
    (schema/avro.py::avro_value_parser — the reference's fixture wire
    format, BigQuerySinkConnectorIT.java:75-159). Decode(encode(row))
    must be the identity, which is exactly what the oracle selects from
    the source table: longs round-trip through zigzag varints, doubles
    bit-exactly through IEEE little-endian, strings through UTF-8, and
    the null-union through its branch index. This is the one sanctioned
    Python pair outside multimodal — Arrow-batched in both directions,
    existing precisely because the sandbox lacks the spark-avro JVM
    datasource (the cluster fast path)."""
    from kafka_connect_bigquery_spark.schema import avro as A

    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    enc = A.avro_encode_udf(spark, _AVRO_WIRE_SCHEMA)
    parser = A.avro_value_parser(spark, _AVRO_WIRE_SCHEMA, mode="python")
    wire = e.select(
        enc(F.struct("event_id", "user_id", "event_type", "value")).alias("value")
    )
    return wire.select(parser(F.col("value")).alias("v")).select("v.*")


Q_AVRO_WIRE_SQL = """
SELECT event_id, user_id, event_type, value FROM events
"""


REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "avro_wire_roundtrip": (q_avro_wire_roundtrip, Q_AVRO_WIRE_SQL),
    "dedup_exact": (q_dedup_exact, Q_DEDUP_EXACT_SQL),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, Q_DEDUP_NGRAM_SQL),
    "dedup_prefix_filter": (q_dedup_prefix_filter, Q_DEDUP_PREFIX_SQL),
    "dedup_containment": (q_dedup_containment, Q_DEDUP_CONTAINMENT_SQL),
    "dedup_winnow": (q_dedup_winnow, Q_DEDUP_WINNOW_SQL),
    "dedup_passages": (q_dedup_passages, Q_DEDUP_PASSAGES_SQL),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, Q_DEDUP_MINHASH_SQL),
    "dedup_incremental": (q_dedup_incremental, Q_DEDUP_MINHASH_SQL),
    "dedup_minhash_recall": (q_dedup_minhash_recall, _recall_sql()),
    "dedup_simhash": (q_dedup_simhash, Q_DEDUP_SIMHASH_SQL),
    "dedup_simhash_pairs": (q_dedup_simhash_pairs, Q_DEDUP_SIMHASH_PAIRS_SQL),
    "dedup_embedding_cosine": (q_dedup_embedding, Q_DEDUP_EMBEDDING_SQL),
    "dedup_semantic": (q_dedup_semantic, Q_DEDUP_SEMANTIC_SQL),
    "pairs_contrastive": (q_pairs_contrastive, Q_PAIRS_CONTRASTIVE_SQL),
    "dedup_components": (q_dedup_components, Q_DEDUP_COMPONENTS_SQL),
    "dedup_keep_best": (q_dedup_keep_best, Q_DEDUP_KEEP_BEST_SQL),
    "dedup_edit_distance": (q_dedup_edit_distance, Q_DEDUP_EDIT_SQL),
    "dedup_substring_runs": (q_dedup_substring_runs, Q_DEDUP_SUBSTRING_RUNS_SQL),
    "docs_dsir_weights": (q_docs_dsir_weights, Q_DOCS_DSIR_SQL),
    "docs_vocab_growth": (q_docs_vocab_growth, Q_DOCS_VOCAB_GROWTH_SQL),
    "embedding_dim_stats": (q_embedding_dim_stats, Q_EMB_DIM_STATS_SQL),
    "embedding_label_centroids": (q_embedding_label_centroids, Q_EMB_LABEL_CENTROIDS_SQL),
    "docs_length_histogram": (q_docs_length_histogram, Q_DOCS_LENGTH_HIST_SQL),
    "dataset_split": (q_dataset_split, Q_DATASET_SPLIT_SQL),
    "stratified_sample": (q_stratified_sample, Q_STRATIFIED_SAMPLE_SQL),
    "weighted_sample": (q_weighted_sample, Q_WEIGHTED_SAMPLE_SQL),
    "mixture_rebalance": (q_mixture_rebalance, Q_MIXTURE_REBALANCE_SQL),
    "mixture_entropy": (q_mixture_entropy, Q_MIXTURE_ENTROPY_SQL),
    "docs_chi_square": (q_docs_chi_square, Q_DOCS_CHI_SQUARE_SQL),
    "text_collocations": (q_text_collocations, Q_TEXT_COLLOCATIONS_SQL),
    "text_zipf_fit": (q_text_zipf_fit, Q_TEXT_ZIPF_SQL),
    "orders_market_basket": (q_orders_market_basket, Q_ORDERS_BASKET_SQL),
    "docs_chunk_windows": (q_docs_chunk_windows, Q_DOCS_CHUNKS_SQL),
    "events_welch_t": (q_events_welch_t, Q_EVENTS_WELCH_SQL),
    "events_benford": (q_events_benford, Q_EVENTS_BENFORD_SQL),
    "events_mannwhitney": (q_events_mannwhitney, Q_EVENTS_MANNWHITNEY_SQL),
    "events_ks_test": (q_events_ks_test, Q_EVENTS_KS_SQL),
    "sample_k_per_group": (q_sample_k_per_group, Q_SAMPLE_K_PER_GROUP_SQL),
    "bq_shape_projection": (q_bq_shape_events, Q_BQ_SHAPE_SQL),
    "ann_cosine_topk": (q_ann_cosine_topk, Q_ANN_COSINE_SQL),
    "ann_lsh_topk": (q_ann_lsh_topk, Q_ANN_LSH_SQL),
    "ann_ivf_topk": (q_ann_ivf_topk, Q_ANN_IVF_SQL),
    "ann_incremental": (q_ann_incremental, Q_ANN_INCREMENTAL_SQL),
    "pretrain_incremental": (q_pretrain_incremental, Q_PRETRAIN_INC_SQL),
    "pretrain_keep_best": (q_pretrain_keep_best, Q_PRETRAIN_KEEP_BEST_SQL),
    "embedding_kmeans": (q_embedding_kmeans, Q_EMBEDDING_KMEANS_SQL),
    "warehouse_ann_read": (q_warehouse_ann_read, Q_WAREHOUSE_ANN_SQL),
    "warehouse_ann_many": (q_warehouse_ann_many, Q_WAREHOUSE_ANN_MANY_SQL),
    "warehouse_ann_pq": (q_warehouse_ann_pq, Q_WAREHOUSE_ANN_PQ_SQL),
    "warehouse_ann_pq_many": (
        q_warehouse_ann_pq_many,
        Q_WAREHOUSE_ANN_PQ_MANY_SQL,
    ),
    "warehouse_ann_refined": (
        q_warehouse_ann_refined,
        Q_WAREHOUSE_ANN_REFINED_SQL,
    ),
    "warehouse_ann_bucketed": (
        q_warehouse_ann_bucketed,
        Q_WAREHOUSE_ANN_BUCKETED_SQL,
    ),
    "search_hybrid_rrf": (q_search_hybrid_rrf, Q_SEARCH_HYBRID_SQL),
    "embedding_projection": (q_embedding_projection, Q_EMBEDDING_PROJECTION_SQL),
    "ann_ivfpq_topk": (q_ann_ivfpq_topk, Q_ANN_IVFPQ_SQL),
    "text_language_id": (q_text_language_id, Q_TEXT_LANG_SQL),
    "text_quality_scores": (q_text_quality, Q_TEXT_QUALITY_SQL),
    "text_token_stats": (q_text_token_stats, Q_TEXT_TOKENS_SQL),
    "text_subword_stats": (q_text_subword_stats, Q_TEXT_SUBWORD_SQL),
    "text_top_terms": (q_text_top_terms, Q_TEXT_TOP_TERMS_SQL),
    "text_pii_scrub": (q_text_pii_scrub, Q_TEXT_PII_SQL),
    "docs_quality_filter": (q_docs_quality_filter, Q_DOCS_QUALITY_SQL),
    "text_repetition_stats": (q_text_repetition_stats, Q_TEXT_REPETITION_SQL),
    "docs_ngram_novelty": (q_docs_ngram_novelty, Q_DOCS_NGRAM_NOVELTY_SQL),
    "text_bigram_fluency": (q_text_bigram_fluency, Q_TEXT_BIGRAM_FLUENCY_SQL),
    "text_bm25": (q_text_bm25, Q_TEXT_BM25_SQL),
    "bm25_incremental": (q_bm25_incremental, Q_TEXT_BM25_SQL),
    "multimodal_image_meta": (q_multimodal_meta, Q_MULTIMODAL_SQL),
    "multimodal_frame_features": (q_multimodal_frames, Q_MULTIMODAL_FRAMES_SQL),
    "multimodal_audio_chunks": (q_multimodal_audio_chunks, Q_MULTIMODAL_AUDIO_SQL),
    "docs_sequence_pack": (q_docs_sequence_pack, Q_DOCS_SEQUENCE_PACK_SQL),
    "corpus_shard_plan": (q_corpus_shard_plan, Q_CORPUS_SHARD_PLAN_SQL),
    "docs_decontaminate": (q_docs_decontaminate, Q_DOCS_DECONTAMINATE_SQL),
    "text_hashed_tf": (q_text_hashed_tf, Q_TEXT_HASHED_TF_SQL),
    "text_sparse_cosine": (q_text_sparse_cosine, Q_TEXT_SPARSE_COSINE_SQL),
    "embedding_gram": (q_embedding_gram, Q_EMBEDDING_GRAM_SQL),
    "bpe_top_pairs": (q_bpe_top_pairs, Q_BPE_TOP_PAIRS_SQL),
    "bpe_encode": (q_bpe_encode, Q_BPE_ENCODE_SQL),
}
