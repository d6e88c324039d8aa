"""Corpus-construction pipeline (pipelines/pretrain.py): stage
invariants, equivalence with direct operator application, and
re-run determinism over the sf0.001 documents table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.functions.text import quality_score
from kafka_connect_bigquery_spark.operators import dedup
from kafka_connect_bigquery_spark.pipelines.pretrain import CorpusConfig, build_corpus
from kafka_connect_bigquery_spark.session import read_table

CFG = CorpusConfig(min_quality=0.2, pack_budget=256, pack_shards=8)


@pytest.fixture(scope="module")
def artifacts(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return docs, build_corpus(docs, cfg=CFG)


def _ids(df, col="doc_id"):
    return {r[col] for r in df.select(col).collect()}


def test_stage_flow_and_gate(spark, artifacts):
    docs, a = artifacts
    n_docs = docs.count()
    assert 0 < a["gated"].count() <= n_docs
    below = docs.filter(quality_score(F.col("text")) < CFG.min_quality)
    assert _ids(a["gated"]).isdisjoint(_ids(below))
    # monotone shrink through the dedup stages
    assert _ids(a["near_survivors"]) <= _ids(a["exact_survivors"]) <= _ids(a["gated"])


def test_exact_stage_one_doc_per_fingerprint(spark, artifacts):
    _, a = artifacts
    surv = a["exact_survivors"]
    fp_count = (
        surv.select(dedup.fingerprint(F.col("text")).alias("fp")).distinct().count()
    )
    assert fp_count == surv.count()


def test_near_stage_no_candidate_pair_survives(spark, artifacts):
    _, a = artifacts
    surv_ids = _ids(a["near_survivors"])
    pairs = dedup.minhash_lsh_dedup_pairs(
        a["exact_survivors"], "doc_id", "text",
        num_hashes=CFG.minhash_hashes, bands=CFG.minhash_bands, n=CFG.shingle_n,
    )
    for r in pairs.collect():
        assert not (r["id_a"] in surv_ids and r["id_b"] in surv_ids), (
            r["id_a"], r["id_b"],
        )


def test_train_is_decontaminated_split(spark, artifacts):
    _, a = artifacts
    train_ids = _ids(a["train"])
    split_train = _ids(a["split"].filter(F.col("split") == "train"))
    contaminated = _ids(a["contaminated"], "train_doc_id")
    assert train_ids == split_train - contaminated
    # packing covers exactly the training docs
    assert _ids(a["packed"]) == train_ids


def test_rerun_is_deterministic(spark, artifacts):
    docs, a = artifacts
    b = build_corpus(docs, cfg=CFG)
    for stage in ("near_survivors", "train"):
        assert _ids(a[stage]) == _ids(b[stage])
    pa = {(r["doc_id"], r["seq_index"]) for r in a["packed"].collect()}
    pb = {(r["doc_id"], r["seq_index"]) for r in b["packed"].collect()}
    assert pa == pb


def test_semantic_stage_drops_embedding_dups(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    cfg = CorpusConfig(min_quality=0.2, pack_budget=256, pack_shards=8,
                       sem_min_cosine=0.4)
    a = build_corpus(docs, cfg=cfg, embeddings=emb)
    near, sem = _ids(a["near_survivors"]), _ids(a["sem_survivors"])
    assert sem <= near
    # stage equivalence: sem_survivors == near_survivors minus the
    # operator's own losers (how many overlap is data-dependent — the
    # MinHash stage may already have dropped the semantic dups)
    from kafka_connect_bigquery_spark.operators import ann, dedup as ddp

    cents = ann.seed_centroids(emb, k=cfg.sem_clusters)
    verdict = ddp.semantic_dedup(emb, cents, min_cosine=cfg.sem_min_cosine)
    losers = {r["vec_id"] for r in verdict.filter("NOT keep").collect()}
    assert sem == near - losers
    # downstream stages consume the semantic survivors
    assert _ids(a["split"]) == sem


def test_without_embeddings_sem_stage_is_identity(spark, artifacts):
    _, a = artifacts
    assert _ids(a["sem_survivors"]) == _ids(a["near_survivors"])


# ---------------------------------------------------------------------------
# Incremental mode (r09): incremental_tick == batch rebuild
# ---------------------------------------------------------------------------

def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


@pytest.fixture(scope="module")
def tick_run(spark, sf_dir, tmp_path_factory):
    """Three append ticks over a corpus with cross-tick exact AND near
    duplicates plus a junk doc, run through incremental_tick; the batch
    rebuild on the unioned corpus is the reference."""
    from kafka_connect_bigquery_spark.pipelines.pretrain import (
        PretrainTickTables,
        incremental_tick,
    )
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    base = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    texts = {
        r["doc_id"]: r["text"]
        for r in base.filter(F.col("doc_id") < 30).collect()
    }
    # controlled sentinels: long unique sentences so the cross-tick
    # exact/near hits do not depend on the organic corpus's own dups
    import random

    rng = random.Random(42)
    words = [f"w{rng.randrange(10**6)}" for _ in range(120)]
    c1 = "the quick pelican " + " ".join(words[:60]) + " finally lands"
    c2 = "another heron story " + " ".join(words[60:]) + " and ends here"
    t1 = [(int(i), texts[i]) for i in sorted(texts) if i < 10]
    t1 += [(90, c1)]
    # tick 2: fresh docs + an exact twin and a near twin (one word
    # appended to a 50+-word text: high-Jaccard shingles) of tick-1's c1
    t2 = [(int(i) + 100, texts[i]) for i in sorted(texts) if 10 <= i < 20]
    t2 += [(190, c2), (293, c1), (295, c1 + " appended")]
    # tick 3: fresh docs + an exact twin of TICK-2's c2, another near
    # twin of tick-1's c1, an intra-tick exact pair, and a junk doc the
    # quality gate must drop
    t3 = [(int(i) + 300, texts[i]) for i in sorted(texts) if 20 <= i < 30]
    t3 += [
        (391, c2),                   # exact dup of tick-2's id 190
        (392, c1 + " otherwise"),    # near dup of tick-1's id 90
        (393, "unique alpha beta gamma delta words here we go now ok"),
        (394, "unique alpha beta gamma delta words here we go now ok"),
        (395, " ".join(["12345"] * 50)),  # junk (score 0.13): gated out
    ]
    all_rows = t1 + t2 + t3

    wh = Warehouse(spark, str(tmp_path_factory.mktemp("pretrain_inc")))
    spec = TableSpec(partition_grain="NONE")
    tables = PretrainTickTables()
    cursor = None
    arts = []
    for rows in (t1, t2, t3):
        wh.append(_mk_docs(spark, rows), "corpus", spec)
        art = incremental_tick(
            wh, "corpus", cursor, tables=tables, cfg=CFG, tokens_per_shard=200
        )
        cursor = art["cursor"]
        arts.append(art)
    batch = build_corpus(_mk_docs(spark, all_rows), cfg=CFG)
    return wh, tables, arts, batch, all_rows


def test_incremental_ticks_equal_batch_rebuild(spark, tick_run):
    wh, tables, arts, batch, all_rows = tick_run
    inc_ids = _ids(arts[-1]["survivors"])
    batch_ids = _ids(batch["near_survivors"])
    assert inc_ids == batch_ids
    # the accumulated rows match too (not just ids)
    inc_rows = {
        (r["doc_id"], r["text"])
        for r in arts[-1]["survivors"].select("doc_id", "text").collect()
    }
    batch_rows = {
        (r["doc_id"], r["text"])
        for r in batch["near_survivors"].select("doc_id", "text").collect()
    }
    assert inc_rows == batch_rows


def test_cross_tick_dedup_hits_actually_happened(spark, tick_run):
    """The equality proof must not be vacuous: the injected old<->new
    twins were really dropped by the fingerprint table / probe index,
    in the tick that saw them."""
    wh, tables, arts, batch, all_rows = tick_run
    final = _ids(arts[-1]["survivors"])
    assert 90 in final and 293 not in final       # exact dup, tick1<->tick2
    assert 190 in final and 391 not in final      # exact dup, tick2<->tick3
    assert 295 not in final                       # near dup, tick1<->tick2
    assert 392 not in final                       # near dup, tick1<->tick3
    assert 393 in final and 394 not in final      # intra-tick exact pair
    assert 395 not in final                       # junk gated out
    # and the drops happened in the arriving tick (delta-sized work)
    assert 293 not in _ids(arts[1]["near_new"])
    assert 295 not in _ids(arts[1]["near_new"])


def test_incremental_shard_plan_matches_batch(spark, tick_run):
    """shard_plan over the accumulated survivors is a deterministic
    function of the survivor set: incremental and batch corpora yield
    identical shard assignments."""
    from kafka_connect_bigquery_spark.functions.text import token_count
    from kafka_connect_bigquery_spark.operators import packing

    wh, tables, arts, batch, all_rows = tick_run
    inc = {
        (r["doc_id"], r["shard_id"], r["cum_tokens"])
        for r in arts[-1]["shards"].select("doc_id", "shard_id", "cum_tokens").collect()
    }
    ref = packing.shard_plan(
        batch["near_survivors"].withColumn("n_tok", token_count(F.col("text"))),
        "doc_id",
        "n_tok",
        tokens_per_shard=200,
    )
    want = {
        (r["doc_id"], r["shard_id"], r["cum_tokens"])
        for r in ref.select("doc_id", "shard_id", "cum_tokens").collect()
    }
    assert inc == want


def test_tick_with_no_new_rows_is_a_noop(spark, tick_run):
    from kafka_connect_bigquery_spark.pipelines.pretrain import incremental_tick

    wh, tables, arts, batch, all_rows = tick_run
    before = _ids(arts[-1]["survivors"])
    art = incremental_tick(
        wh, "corpus", arts[-1]["cursor"], tables=tables, cfg=CFG
    )
    assert art["new_rows"].count() == 0
    assert _ids(art["survivors"]) == before


def test_incremental_tick_with_semantic_stage_equals_batch(spark, sf_dir, tmp_path):
    """The embeddings-enabled tick: the SemDeDup stage runs
    incrementally against the accumulated (id, embedding, list_id)
    index with the quantizer frozen at tick 1, and the accumulated
    survivors equal build_corpus(embeddings=...)'s sem_survivors on the
    unioned corpus — including a cross-tick semantic hit between docs
    whose TEXTS are unrelated (only the vectors are twins)."""
    import random

    from kafka_connect_bigquery_spark.pipelines.pretrain import (
        PretrainTickTables,
        incremental_tick,
    )
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    rng = random.Random(7)

    def words(n):
        return " ".join(f"q{rng.randrange(10**6)}" for _ in range(n))

    # fully synthetic corpus: unique 40-word texts (no lexical dups), so
    # the semantic stage is the only dedup with any losers
    t1 = [(i, f"tick one doc {words(40)}") for i in range(8)]
    t2 = [(100 + i, f"tick two doc {words(40)}") for i in range(6)]
    t3 = [(300 + i, f"tick three doc {words(40)}") for i in range(6)]
    t3 += [(396, f"vector twin doc {words(40)}")]
    all_rows = t1 + t2 + t3

    def emb_of(i):
        r = random.Random(1000 + i)
        return [r.uniform(-1.0, 1.0) for _ in range(4)]

    embs = {i: emb_of(i) for i, _ in all_rows}
    embs[396] = [x * 1.01 for x in embs[3]]  # cross-tick semantic twin of doc 3
    emb_df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in embs.items()],
        "vec_id: long, embedding: array<double>",
    )

    cfg = CorpusConfig(min_quality=0.0, sem_clusters=4, sem_min_cosine=0.95)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    spec = TableSpec(partition_grain="NONE")
    tables = PretrainTickTables()
    cursor = None
    art = None
    for rows in (t1, t2, t3):
        wh.append(_mk_docs(spark, rows), "corpus", spec)
        art = incremental_tick(
            wh, "corpus", cursor, tables=tables, cfg=cfg, embeddings=emb_df
        )
        cursor = art["cursor"]
    batch = build_corpus(_mk_docs(spark, all_rows), cfg=cfg, embeddings=emb_df)
    inc_ids = _ids(art["survivors"])
    assert inc_ids == _ids(batch["sem_survivors"])
    # the vector twin was dropped ACROSS ticks (doc 3 arrived tick 1,
    # its twin 396 in tick 3), despite unrelated texts
    assert 3 in inc_ids and 396 not in inc_ids
    # and the drop happened in the arriving tick, delta-sized
    assert 396 not in _ids(art["sem_new"])
    assert 396 in _ids(art["near_new"])  # it passed the lexical stages


# ---------------------------------------------------------------------------
# Torn-tick recovery (r11): the state commit is atomic as a group
# ---------------------------------------------------------------------------

def _tick_rows():
    import random

    rng = random.Random(7)
    words = [f"w{rng.randrange(10**6)}" for _ in range(120)]
    c1 = "the quick pelican " + " ".join(words[:60]) + " finally lands"
    c2 = "another heron story " + " ".join(words[60:]) + " and ends here"
    t1 = [(1, c1), (2, "a perfectly ordinary sentence about rivers and stones flowing daily")]
    t2 = [
        (101, c2),                      # fresh: MUST survive the crash
        (102, c1),                      # exact dup of tick-1's 1: must drop
        (103, c1 + " appended"),        # near dup of tick-1's 1: must drop
        (104, "yet another normal document with enough plain words to pass the gate"),
    ]
    t3 = [(201, c2), (202, "final fresh document speaking of mountains and calm weather today")]
    return t1, t2, t3


def _crash_after_n_state_appends(wh, n):
    """Monkeypatch wh.append to raise AFTER the n-th state-table append
    commits — the worst case: the write is durable, the tick is not."""
    real = wh.append
    seen = {"n": 0}

    def append(df, table, spec=None, **kw):
        real(df, table, spec, **kw)
        if table != "corpus":
            seen["n"] += 1
            if seen["n"] >= n:
                raise RuntimeError("injected crash after state append")

    wh.append = append
    return lambda: setattr(wh, "append", real)


@pytest.mark.parametrize("fail_after", [1, 2, 3])
def test_torn_tick_recovers_without_loss_or_duplication(
    spark, tmp_path, fail_after
):
    """Kill the tick after each state append in turn (fingerprints /
    postings / survivors — the marker never lands); the rerun must
    excise the torn writes and converge to the batch rebuild. The
    pre-fix failure mode: a crash after the fingerprints append made
    the rerun's anti-join treat the delta's docs as already ingested,
    silently dropping them from the corpus forever."""
    from kafka_connect_bigquery_spark.pipelines.pretrain import (
        PretrainTickTables,
        incremental_tick,
    )
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    t1, t2, t3 = _tick_rows()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    spec = TableSpec(partition_grain="NONE")
    tables = PretrainTickTables()

    wh.append(_mk_docs(spark, t1), "corpus", spec)
    cursor = incremental_tick(wh, "corpus", None, tables=tables, cfg=CFG)["cursor"]

    wh.append(_mk_docs(spark, t2), "corpus", spec)
    fp_rows_before = wh.read(tables.fingerprints).count()
    restore = _crash_after_n_state_appends(wh, fail_after)
    with pytest.raises(RuntimeError, match="injected crash"):
        incremental_tick(wh, "corpus", cursor, tables=tables, cfg=CFG)
    restore()
    # non-vacuous: the torn tick really left durable partial state
    assert wh.read(tables.fingerprints).count() > fp_rows_before

    # rerun the crashed tick with the SAME cursor, then one more tick
    art = incremental_tick(wh, "corpus", cursor, tables=tables, cfg=CFG)
    cursor = art["cursor"]
    wh.append(_mk_docs(spark, t3), "corpus", spec)
    art = incremental_tick(wh, "corpus", cursor, tables=tables, cfg=CFG)

    batch = build_corpus(_mk_docs(spark, t1 + t2 + t3), cfg=CFG)
    want = {
        (r["doc_id"], r["text"])
        for r in batch["near_survivors"].select("doc_id", "text").collect()
    }
    got_rows = art["survivors"].select("doc_id", "text").collect()
    got = {(r["doc_id"], r["text"]) for r in got_rows}
    assert got == want                      # no loss (101/104 present), no resurrections
    assert len(got_rows) == len(got)        # no duplicated rows either
    assert 101 in {d for d, _ in got} and 104 in {d for d, _ in got}
    # internal state is dedup-consistent too: one row per fingerprint
    fp = wh.read(tables.fingerprints)
    assert fp.count() == fp.select("fp").distinct().count()


def test_torn_first_tick_recovers(spark, tmp_path):
    """A crash during the very first tick (no tick log exists yet)
    rolls back to empty state: the rerun re-freezes from scratch."""
    from kafka_connect_bigquery_spark.pipelines.pretrain import (
        PretrainTickTables,
        incremental_tick,
    )
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    t1, t2, _ = _tick_rows()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    spec = TableSpec(partition_grain="NONE")
    tables = PretrainTickTables()

    wh.append(_mk_docs(spark, t1), "corpus", spec)
    restore = _crash_after_n_state_appends(wh, 1)
    with pytest.raises(RuntimeError, match="injected crash"):
        incremental_tick(wh, "corpus", None, tables=tables, cfg=CFG)
    restore()

    art = incremental_tick(wh, "corpus", None, tables=tables, cfg=CFG)
    wh.append(_mk_docs(spark, t2), "corpus", spec)
    art = incremental_tick(wh, "corpus", art["cursor"], tables=tables, cfg=CFG)
    batch = build_corpus(_mk_docs(spark, t1 + t2), cfg=CFG)
    assert _ids(art["survivors"]) == _ids(batch["near_survivors"])


# ---------------------------------------------------------------------------
# survivor="best" policy (r13): keep the highest-quality copy
# ---------------------------------------------------------------------------

BEST_CFG = CorpusConfig(
    min_quality=0.2, pack_budget=256, pack_shards=8, survivor="best"
)


def _best_rows():
    """Three ticks where LATER, larger-id near-twins are LONGER (higher
    token count): min_id keeps the early copy, best keeps the late one
    — so the policies observably diverge, and the incremental path must
    retroactively EVICT an already-accepted survivor."""
    import random

    rng = random.Random(13)
    words = [f"w{rng.randrange(10**6)}" for _ in range(120)]
    c1 = "the quick pelican " + " ".join(words[:60]) + " finally lands"
    c2 = "another heron story " + " ".join(words[60:]) + " and ends here"
    t1 = [
        (1, c1),
        (2, "a perfectly ordinary sentence about rivers and stones flowing daily"),
    ]
    t2 = [
        (101, c2),
        # near twin of tick-1's doc 1, LONGER: beats it under "best"
        (102, c1 + " appended richer tail"),
    ]
    t3 = [
        # near twin of tick-2's doc 101, longer: evicts 101 too
        (201, c2 + " expanded"),
        (202, "final fresh document speaking of mountains and calm weather today"),
    ]
    return t1, t2, t3


def test_orient_pairs_by_quality_rule(spark):
    """Per-pair loser = lexicographically smaller (q, -id): lower
    quality loses; a quality TIE drops the LARGER id (degenerates to
    the min-id policy)."""
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "id_a: long, id_b: long"
    )
    quality = spark.createDataFrame(
        # pair (1,2): b better -> 1 loses; (3,4): a better -> 4 loses;
        # (5,6): tie -> 6 loses
        [(1, 10), (2, 20), (3, 20), (4, 10), (5, 7), (6, 7)],
        "doc: long, q: long",
    )
    losers = _ids(dedup.orient_pairs_by_quality(pairs, quality), "doc")
    assert losers == {1, 4, 6}


def test_build_corpus_keep_best_diverges_from_min_id(spark):
    t1, t2, t3 = _best_rows()
    docs = _mk_docs(spark, t1 + t2 + t3)
    min_ids = _ids(build_corpus(docs, cfg=CFG)["near_survivors"])
    best_ids = _ids(build_corpus(docs, cfg=BEST_CFG)["near_survivors"])
    # min_id: first/smallest copy survives each near-dup cluster
    assert 1 in min_ids and 102 not in min_ids
    assert 101 in min_ids and 201 not in min_ids
    # best: the longer late copy survives instead
    assert 102 in best_ids and 1 not in best_ids
    assert 201 in best_ids and 101 not in best_ids
    # docs with no near-twin are policy-independent
    assert {2, 202} <= min_ids and {2, 202} <= best_ids


def test_build_corpus_rejects_unknown_survivor_policy(spark):
    docs = _mk_docs(spark, [(1, "hello world")])
    with pytest.raises(ValueError, match="survivor"):
        build_corpus(docs, cfg=CorpusConfig(survivor="newest"))


def test_incremental_keep_best_equals_batch_with_eviction(spark, tmp_path):
    """The tick-vs-batch equality contract under survivor='best',
    including the new mechanism: doc 1 is ACCEPTED in tick 1, then
    beaten by tick-2's longer twin 102 and retroactively evicted (via
    the append-only evicted table, not an in-place rewrite); same for
    101 -> 201 across ticks 2 -> 3."""
    from kafka_connect_bigquery_spark.pipelines.pretrain import (
        PretrainTickTables,
        incremental_tick,
    )
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    t1, t2, t3 = _best_rows()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    spec = TableSpec(partition_grain="NONE")
    tables = PretrainTickTables()

    wh.append(_mk_docs(spark, t1), "corpus", spec)
    a1 = incremental_tick(wh, "corpus", None, tables=tables, cfg=BEST_CFG)
    assert 1 in _ids(a1["survivors"])  # accepted at arrival

    wh.append(_mk_docs(spark, t2), "corpus", spec)
    a2 = incremental_tick(wh, "corpus", a1["cursor"], tables=tables, cfg=BEST_CFG)
    s2 = _ids(a2["survivors"])
    assert 102 in s2 and 1 not in s2  # retroactive eviction happened
    assert 1 in _ids(wh.read(tables.evicted))  # ...through the evicted table

    wh.append(_mk_docs(spark, t3), "corpus", spec)
    a3 = incremental_tick(wh, "corpus", a2["cursor"], tables=tables, cfg=BEST_CFG)

    batch = build_corpus(_mk_docs(spark, t1 + t2 + t3), cfg=BEST_CFG)
    want = {
        (r["doc_id"], r["text"])
        for r in batch["near_survivors"].select("doc_id", "text").collect()
    }
    got_rows = a3["survivors"].select("doc_id", "text").collect()
    got = {(r["doc_id"], r["text"]) for r in got_rows}
    assert got == want
    assert len(got_rows) == len(got)  # no duplicated rows
    assert {102, 201, 2, 202} == {d for d, _ in got}


def test_torn_tick_with_eviction_recovers(spark, tmp_path):
    """A crash AFTER the evicted append but before the survivors append
    + marker: recovery excises the stamped evicted/postings rows, and
    the rerun re-issues the same eviction — converging to batch."""
    from kafka_connect_bigquery_spark.pipelines.pretrain import (
        PretrainTickTables,
        incremental_tick,
    )
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    t1, t2, t3 = _best_rows()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    spec = TableSpec(partition_grain="NONE")
    tables = PretrainTickTables()

    wh.append(_mk_docs(spark, t1), "corpus", spec)
    cursor = incremental_tick(wh, "corpus", None, tables=tables, cfg=BEST_CFG)["cursor"]

    wh.append(_mk_docs(spark, t2), "corpus", spec)
    # best-policy tick appends: fingerprints, postings, evicted,
    # survivors — crash right after the evicted append (the new one)
    restore = _crash_after_n_state_appends(wh, 3)
    with pytest.raises(RuntimeError, match="injected crash"):
        incremental_tick(wh, "corpus", cursor, tables=tables, cfg=BEST_CFG)
    restore()

    art = incremental_tick(wh, "corpus", cursor, tables=tables, cfg=BEST_CFG)
    wh.append(_mk_docs(spark, t3), "corpus", spec)
    art = incremental_tick(wh, "corpus", art["cursor"], tables=tables, cfg=BEST_CFG)

    batch = build_corpus(_mk_docs(spark, t1 + t2 + t3), cfg=BEST_CFG)
    assert _ids(art["survivors"]) == _ids(batch["near_survivors"])
    # the eviction wasn't double-recorded by the rerun
    ev = wh.read(tables.evicted).select("doc_id").collect()
    assert len(ev) == len({r["doc_id"] for r in ev})


def test_materialize_survivors_folds_evictions(spark, tmp_path):
    """Compaction of the eviction log: after materialize_survivors the
    un-compacted read (survivors ANTI JOIN evicted) and the compacted
    table are identical, evicted is empty, further ticks keep working,
    and a second materialize is a no-op."""
    from kafka_connect_bigquery_spark.pipelines.pretrain import (
        PretrainTickTables,
        incremental_tick,
        materialize_survivors,
    )
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    t1, t2, t3 = _best_rows()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    spec = TableSpec(partition_grain="NONE")
    tables = PretrainTickTables()

    wh.append(_mk_docs(spark, t1), "corpus", spec)
    cursor = incremental_tick(wh, "corpus", None, tables=tables, cfg=BEST_CFG)["cursor"]
    wh.append(_mk_docs(spark, t2), "corpus", spec)
    a2 = incremental_tick(wh, "corpus", cursor, tables=tables, cfg=BEST_CFG)
    before = _ids(a2["survivors"])

    folded = materialize_survivors(wh, tables=tables)
    assert folded >= 1  # doc 1's eviction really got compacted
    assert _ids(wh.read(tables.survivors)) == before  # same corpus, now direct
    assert wh.read(tables.evicted).count() == 0
    assert materialize_survivors(wh, tables=tables) == 0  # idempotent no-op

    # the pipeline continues across a compaction: tick 3 still equals batch
    wh.append(_mk_docs(spark, t3), "corpus", spec)
    a3 = incremental_tick(wh, "corpus", a2["cursor"], tables=tables, cfg=BEST_CFG)
    batch = build_corpus(_mk_docs(spark, t1 + t2 + t3), cfg=BEST_CFG)
    assert _ids(a3["survivors"]) == _ids(batch["near_survivors"])


def test_evicted_log_records_each_id_once(spark, tmp_path):
    """A beaten doc's postings stay in the index, so a later still-better
    twin makes it lose AGAIN — but only the first eviction may land in
    the append-only log (the pre-fix behavior re-appended the id every
    tick it lost in)."""
    from kafka_connect_bigquery_spark.pipelines.pretrain import (
        PretrainTickTables,
        incremental_tick,
    )
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    import random

    rng = random.Random(13)
    words = [f"w{rng.randrange(10**6)}" for _ in range(60)]
    c1 = "the quick pelican " + " ".join(words) + " finally lands"
    t1 = [(1, c1), (2, "a perfectly ordinary sentence about rivers and stones flowing daily")]
    t2 = [(102, c1 + " appended richer tail")]          # evicts 1
    t3 = [(301, c1 + " appended richer tail and an even longer closing passage")]
    # 301 beats BOTH 1 (already evicted) and 102 (accepted) in one tick

    wh = Warehouse(spark, str(tmp_path / "wh"))
    spec = TableSpec(partition_grain="NONE")
    tables = PretrainTickTables()
    cursor = None
    art = None
    for rows in (t1, t2, t3):
        wh.append(_mk_docs(spark, rows), "corpus", spec)
        art = incremental_tick(wh, "corpus", cursor, tables=tables, cfg=BEST_CFG)
        cursor = art["cursor"]

    ev = [r["doc_id"] for r in wh.read(tables.evicted).select("doc_id").collect()]
    assert sorted(ev) == [1, 102]  # 1 appears ONCE despite losing twice
    batch = build_corpus(_mk_docs(spark, t1 + t2 + t3), cfg=BEST_CFG)
    assert _ids(art["survivors"]) == _ids(batch["near_survivors"]) == {2, 301}


def test_best_policy_rejects_null_q_index_rows(spark, tmp_path):
    """Schema-evolution hazard: a postings index created before the q
    column reads its old rows as q=NULL once a q-bearing append evolves
    the table. Column presence then passes the static guard, but a NULL
    quality would silently invert the orientation — the tick must fail
    loudly instead."""
    from kafka_connect_bigquery_spark.pipelines.pretrain import (
        PretrainTickTables,
        incremental_tick,
    )
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    import random

    rng = random.Random(13)
    words = [f"w{rng.randrange(10**6)}" for _ in range(60)]
    c1 = "the quick pelican " + " ".join(words) + " finally lands"
    t1 = [(1, c1)]
    t2 = [(102, c1 + " appended richer tail")]

    wh = Warehouse(spark, str(tmp_path / "wh"))
    spec = TableSpec(partition_grain="NONE")
    tables = PretrainTickTables()
    wh.append(_mk_docs(spark, t1), "corpus", spec)
    a1 = incremental_tick(wh, "corpus", None, tables=tables, cfg=BEST_CFG)

    # simulate the pre-q index: rewrite the postings table WITHOUT q,
    # then evolve it back in with a q-bearing append (old rows -> NULL)
    posts = wh.read(tables.postings).localCheckpoint(eager=True)
    wh.overwrite(posts.drop("q"), tables.postings, spec)
    wh.append(
        posts.limit(1).withColumn("doc", F.lit(999999).cast("long")),
        tables.postings,
        spec,
    )
    assert "q" in wh.read(tables.postings).columns  # presence check passes

    wh.append(_mk_docs(spark, t2), "corpus", spec)
    with pytest.raises(Exception, match="rebuild the state tables"):
        incremental_tick(
            wh, "corpus", a1["cursor"], tables=tables, cfg=BEST_CFG
        )


def test_materialize_survivors_no_spurious_recovery(spark, tmp_path):
    """Compaction re-points the tick log at the post-compaction table
    versions, so the next tick's torn-tick recovery does NOT fire
    delete_where on healthy state (pre-fix: every compaction left
    permanent no-op deferred-delete predicates on both tables)."""
    from kafka_connect_bigquery_spark.pipelines.pretrain import (
        PretrainTickTables,
        incremental_tick,
        materialize_survivors,
    )
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    t1, t2, t3 = _best_rows()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    spec = TableSpec(partition_grain="NONE")
    tables = PretrainTickTables()

    wh.append(_mk_docs(spark, t1), "corpus", spec)
    cursor = incremental_tick(wh, "corpus", None, tables=tables, cfg=BEST_CFG)["cursor"]
    wh.append(_mk_docs(spark, t2), "corpus", spec)
    a2 = incremental_tick(wh, "corpus", cursor, tables=tables, cfg=BEST_CFG)
    assert materialize_survivors(wh, tables=tables) >= 1

    calls = []
    real = wh.delete_where

    def spy(*a, **kw):
        calls.append(a)
        return real(*a, **kw)

    wh.delete_where = spy
    wh.append(_mk_docs(spark, t3), "corpus", spec)
    a3 = incremental_tick(wh, "corpus", a2["cursor"], tables=tables, cfg=BEST_CFG)
    wh.delete_where = real
    assert calls == []  # healthy state: recovery stayed quiet
    batch = build_corpus(_mk_docs(spark, t1 + t2 + t3), cfg=BEST_CFG)
    assert _ids(a3["survivors"]) == _ids(batch["near_survivors"])


def test_incremental_keep_best_with_embeddings_equals_batch(spark, tmp_path):
    """survivor='best' composed with the semantic stage: evicting doc 5
    must also retire its VECTOR from the sem probe population, or a
    later semantically-similar doc (396, text unrelated) is vetoed by a
    doc the batch pipeline never lets vote. Pre-fix: incremental drops
    396 while build_corpus keeps it."""
    import random

    from kafka_connect_bigquery_spark.pipelines.pretrain import (
        PretrainTickTables,
        incremental_tick,
        materialize_survivors,
    )
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    rng = random.Random(7)

    def words(n):
        return " ".join(f"q{rng.randrange(10**6)}" for _ in range(n))

    doc5_text = f"tick one doc {words(40)}"
    t1 = [(i, f"tick one doc {words(40)}") for i in range(5)]
    t1.append((5, doc5_text))
    t1 += [(i, f"tick one doc {words(40)}") for i in (6, 7)]
    # 105: LSH near-twin of doc 5, longer -> evicts it (doc 5 is NOT a
    # quantizer seed: seeds are the 4 smallest tick-1 ids {0,1,2,3})
    t2 = [(100 + i, f"tick two doc {words(40)}") for i in range(4)]
    t2.append((105, doc5_text + " appended richer tail " + words(6)))
    t3 = [(300 + i, f"tick three doc {words(40)}") for i in range(4)]
    t3.append((396, f"vector twin doc {words(40)}"))
    t4 = [(500, f"tick four doc {words(40)}")]
    all_rows = t1 + t2 + t3 + t4

    def emb_of(i):
        r = random.Random(1000 + i)
        return [r.uniform(-1.0, 1.0) for _ in range(4)]

    embs = {i: emb_of(i) for i, _ in all_rows}
    embs[396] = [x * 1.01 for x in embs[5]]  # semantic twin of EVICTED doc 5
    emb_df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in embs.items()],
        "vec_id: long, embedding: array<double>",
    )

    cfg = CorpusConfig(
        min_quality=0.0, sem_clusters=4, sem_min_cosine=0.95, survivor="best"
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    spec = TableSpec(partition_grain="NONE")
    tables = PretrainTickTables()
    cursor = None
    art = None
    for rows in (t1, t2, t3):
        wh.append(_mk_docs(spark, rows), "corpus", spec)
        art = incremental_tick(
            wh, "corpus", cursor, tables=tables, cfg=cfg, embeddings=emb_df
        )
        cursor = art["cursor"]

    batch = build_corpus(
        _mk_docs(spark, t1 + t2 + t3), cfg=cfg, embeddings=emb_df
    )
    want = _ids(batch["sem_survivors"])
    assert _ids(art["survivors"]) == want
    # non-vacuous: the eviction happened AND the twin survived it
    assert 5 not in want and 105 in want and 396 in want

    # compaction also folds the vectors: after materialize, a rebuilt
    # probe over a fresh tick still equals batch
    assert materialize_survivors(wh, tables=tables) >= 1
    wh.append(_mk_docs(spark, t4), "corpus", spec)
    art = incremental_tick(
        wh, "corpus", cursor, tables=tables, cfg=cfg, embeddings=emb_df
    )
    batch = build_corpus(_mk_docs(spark, all_rows), cfg=cfg, embeddings=emb_df)
    assert _ids(art["survivors"]) == _ids(batch["sem_survivors"])
    # doc 5's vector is physically gone, not just filtered
    assert 5 not in _ids(wh.read(tables.sem_vectors), "vec_id")


def test_keep_best_eviction_resurrects_sem_losers(spark, tmp_path):
    """r13 fuzz finding, pinned deterministically: the sem stage's veto
    population is the CURRENT near-survivor set, so when keep-best
    eviction retroactively removes a doc, every past doc whose ONLY
    smaller-id semantic twin was that doc must re-enter the survivors —
    exactly what build_corpus computes from scratch.

    Script: tick 1 admits A (id 3) and sem-drops T (id 5, vector twin
    of A); tick 2's B (id 7) is a higher-quality near-dup of A's text,
    so A is evicted — and T must resurrect."""
    from kafka_connect_bigquery_spark.pipelines.pretrain import (
        PretrainTickTables,
        incremental_tick,
    )
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    words = lambda a, n: " ".join(f"{a}{i}" for i in range(n))  # noqa: E731
    a_text = words("alpha", 18)
    rows1 = [
        (0, words("anch", 30)),            # quantizer seed 0 (corpus-max q)
        (1, words("bnch", 30)),            # quantizer seed 1
        (3, a_text),                       # A
        (5, words("tfresh", 18)),          # T: text unrelated, vector twins A
    ]
    rows2 = [(7, a_text + " zz")]          # B: near-dup of A, 19 > 18 tokens
    embs = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0, 0.0],
        3: [0.0, 0.0, 1.0, 0.0],
        5: [0.0, 0.0, 1.01, 0.0],          # cos(T, A) = 1.0
        7: [0.0, 0.0, 0.0, 1.0],           # orthogonal to everyone
    }
    emb_df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in sorted(embs.items())],
        "vec_id: long, embedding: array<double>",
    )
    cfg = CorpusConfig(
        min_quality=0.0, sem_clusters=2, sem_min_cosine=0.95, survivor="best"
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    spec = TableSpec(partition_grain="NONE")
    tables = PretrainTickTables()
    cursor, art = None, None
    for rows in (rows1, rows2):
        wh.append(_mk_docs(spark, rows), "corpus", spec)
        art = incremental_tick(
            wh, "corpus", cursor, tables=tables, cfg=cfg, embeddings=emb_df
        )
        cursor = art["cursor"]
    batch = build_corpus(
        _mk_docs(spark, rows1 + rows2), cfg=cfg, embeddings=emb_df
    )
    got = _ids(art["survivors"])
    assert got == _ids(batch["sem_survivors"])
    assert 3 not in got      # A: evicted by the higher-quality near-dup B
    assert 5 in got          # T: resurrected once its only twin left
    assert 7 in got
