"""End-to-end pretraining-corpus construction: the composition a user
of this engine actually runs over raw documents, assembled from the
repo's public operators in the canonical order —

    quality gate → exact dedup → MinHash-LSH near-dedup →
    [semantic dedup over embeddings, when provided] →
    train/val/test split → eval decontamination → sequence packing

Every stage is one of the individually-oracled operators
(functions/text.py, operators/dedup.py, operators/sampling.py,
operators/packing.py); this module adds only the glue: survivor
policies (keep the smallest id), anti-joins between stages, and a
single artifact dict so each intermediate stays inspectable (and
cacheable — at 100 TB you persist the survivor frames between stages,
you don't re-derive them).

Scale notes: the stage boundaries are all semi/anti-joins on the id
column against SMALL frames (dup groups, candidate pairs, contaminated
ids — each orders of magnitude below the corpus), so AQE broadcasts
them; the corpus itself is never shuffled except where the underlying
operator's contract requires it (fingerprint groupBy, LSH band join,
gram join, the per-shard packing window).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.functions.text import quality_score
from kafka_connect_bigquery_spark.operators import ann, dedup, packing, sampling


@dataclass(frozen=True)
class CorpusConfig:
    min_quality: float = 0.35
    minhash_hashes: int = 16
    minhash_bands: int = 4
    shingle_n: int = 3
    split_fractions: dict = field(
        default_factory=lambda: {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    decon_n: int = 5
    decon_max_df: int = 50
    pack_budget: int = 2048
    pack_shards: int = 64
    sem_clusters: int = 8
    sem_min_cosine: float = 0.95


def build_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: CorpusConfig = CorpusConfig(),
    embeddings: DataFrame | None = None,
    emb_id_col: str = "vec_id",
    emb_vec_col: str = "embedding",
) -> dict[str, DataFrame]:
    """Run the full corpus pipeline; returns every stage's artifact:

    - ``gated``: docs passing the quality gate
    - ``exact_survivors``: one doc per exact-content fingerprint
      (smallest id survives)
    - ``near_survivors``: minus near-duplicates — any doc appearing as
      the larger id of an LSH candidate pair is dropped (the standard
      greedy policy; swap in connected_components + min-per-cluster
      when cluster-exact survivorship matters)
    - ``sem_survivors``: minus SemDeDup semantic duplicates, when an
      aligned ``embeddings`` frame is passed (ids shared with docs);
      identical to ``near_survivors`` otherwise
    - ``split``: survivors with a stable ``split`` column
    - ``contaminated``: train docs sharing rare n-grams with test docs
    - ``train``: the decontaminated training split
    - ``packed``: per-doc packed-layout coordinates for ``train``
    """
    did = F.col(id_col)

    gated = docs.filter(quality_score(F.col(text_col)) >= cfg.min_quality)

    fps = dedup.exact_dedup(gated, id_col, text_col)
    exact_survivors = gated.join(
        fps.select(F.col("keep_id").alias(id_col)), id_col, "left_semi"
    )

    pairs = dedup.minhash_lsh_dedup_pairs(
        exact_survivors,
        id_col,
        text_col,
        num_hashes=cfg.minhash_hashes,
        bands=cfg.minhash_bands,
        n=cfg.shingle_n,
    )
    near_survivors = exact_survivors.join(
        pairs.select(F.col("id_b").alias(id_col)).distinct(), id_col, "left_anti"
    )

    sem_survivors = near_survivors
    if embeddings is not None:
        # verdicts only over docs still alive after the LSH pass: scoring
        # the FULL embeddings frame lets an already-removed smaller-id
        # doc win its semantic cluster, deleting every surviving copy of
        # that cluster from the final corpus (over-deletion)
        live_emb = embeddings.join(
            near_survivors.select(F.col(id_col).alias(emb_id_col)),
            emb_id_col,
            "left_semi",
        )
        cents = ann.seed_centroids(
            live_emb, id_col=emb_id_col, vec_col=emb_vec_col, k=cfg.sem_clusters
        )
        verdict = dedup.semantic_dedup(
            live_emb,
            cents,
            id_col=emb_id_col,
            vec_col=emb_vec_col,
            min_cosine=cfg.sem_min_cosine,
        )
        sem_losers = verdict.filter(~F.col("keep")).select(
            F.col(emb_id_col).alias(id_col)
        )
        sem_survivors = near_survivors.join(sem_losers, id_col, "left_anti")

    split = sampling.split_dataset(sem_survivors, id_col, cfg.split_fractions)

    contaminated = packing.decontaminate(
        split,
        id_col,
        text_col,
        "split",
        n=cfg.decon_n,
        max_gram_doc_freq=cfg.decon_max_df,
    )
    train = split.filter(F.col("split") == "train").join(
        contaminated.select(F.col("train_doc_id").alias(id_col)),
        id_col,
        "left_anti",
    )

    packed = packing.sequence_pack(
        train, id_col, text_col, budget=cfg.pack_budget, n_shards=cfg.pack_shards
    )

    return {
        "gated": gated,
        "exact_survivors": exact_survivors,
        "near_survivors": near_survivors,
        "sem_survivors": sem_survivors,
        "split": split,
        "contaminated": contaminated,
        "train": train,
        "packed": packed,
    }
