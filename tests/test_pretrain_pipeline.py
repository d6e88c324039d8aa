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
