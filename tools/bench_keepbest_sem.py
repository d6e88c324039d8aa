"""Measure the keep-best incremental tick WITH the semantic stage at a
scale rung — the path the r13 eviction fixes touch: per-tick cost of
the sem-probe's merge-on-read exclusion (sem_vectors ANTI JOIN evicted
∪ this tick's losers) and of ``materialize_survivors`` folding the
eviction log into BOTH survivors and sem_vectors.

Usage:
    python tools/bench_keepbest_sem.py [sf_dir] [--ticks 3]

Drives tercile appends of <sf_dir>/documents.parquet (embeddings from
<sf_dir>/embeddings.parquet, covering the docs whose ids appear there),
runs keep-best ticks, then a compaction, then ONE post-compaction tick
— printing per-stage wall seconds and the eviction/survivor counts.
Correctness cross-check: accumulated survivors == build_corpus on the
full corpus (set equality on ids), same contract the pytest suite pins
at toy scale.
"""

from __future__ import annotations

import argparse
import shutil
import sys
import tempfile
import time
import uuid
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from kafka_connect_bigquery_spark.pipelines.pretrain import (  # noqa: E402
    CorpusConfig,
    PretrainTickTables,
    build_corpus,
    incremental_tick,
    materialize_survivors,
)
from kafka_connect_bigquery_spark.session import get_spark, read_table  # noqa: E402
from kafka_connect_bigquery_spark.sinks.warehouse import (  # noqa: E402
    TableSpec,
    Warehouse,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/repo/.scale/sf1")
    ap.add_argument("--ticks", type=int, default=3)
    ap.add_argument("--clusters", type=int, default=32)
    ap.add_argument(
        "--no-emb",
        action="store_true",
        help="skip the semantic stage (A/B baseline: isolates its cost)",
    )
    args = ap.parse_args()

    spark = get_spark("bench-keepbest-sem")
    docs = read_table(spark, args.sf_dir, "documents").select("doc_id", "text")
    emb = None
    if not args.no_emb:
        emb = read_table(spark, args.sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
    n_docs, n_vecs = docs.count(), (emb.count() if emb is not None else 0)
    hi = docs.agg(F.max("doc_id")).first()[0]
    cuts = [hi * (i + 1) // args.ticks for i in range(args.ticks)]
    cfg = CorpusConfig(
        min_quality=0.2,
        survivor="best",
        sem_clusters=args.clusters,
        sem_min_cosine=0.95,
    )

    root = Path(tempfile.gettempdir()) / f"kcbq_kbsem_{uuid.uuid4().hex[:8]}"
    wh = Warehouse(spark, str(root))
    spec = TableSpec(partition_grain="NONE")
    tables = PretrainTickTables()
    cursor, art, lo = None, None, None
    tick_s = []
    try:
        for c in cuts:
            pred = F.col("doc_id") <= c
            if lo is not None:
                pred = pred & (F.col("doc_id") > lo)
            lo = c
            wh.append(docs.filter(pred), "corpus", spec)
            t0 = time.monotonic()
            art = incremental_tick(
                wh, "corpus", cursor, tables=tables, cfg=cfg, embeddings=emb
            )
            art["survivors"].count()  # settle the lazy tail
            tick_s.append(time.monotonic() - t0)
            cursor = art["cursor"]
            print(f"tick {len(tick_s)}: {tick_s[-1]:.1f}s", flush=True)

        ev_n = wh.read(tables.evicted).count()
        t0 = time.monotonic()
        folded = materialize_survivors(wh, tables=tables)
        mat_s = time.monotonic() - t0

        # one post-compaction tick over a small fresh slice (re-append
        # the top 2% of ids as near-twin bait is unnecessary — an empty
        # delta still pays recovery + state reads, the fixed paths)
        t0 = time.monotonic()
        art = incremental_tick(
            wh, "corpus", cursor, tables=tables, cfg=cfg, embeddings=emb
        )
        art["survivors"].count()
        post_s = time.monotonic() - t0

        surv = {r["doc_id"] for r in art["survivors"].select("doc_id").collect()}
        t0 = time.monotonic()
        batch = build_corpus(docs, cfg=cfg, embeddings=emb)
        b_out = batch["sem_survivors" if emb is not None else "near_survivors"]
        want = {r["doc_id"] for r in b_out.select("doc_id").collect()}
        batch_s = time.monotonic() - t0
        print(
            f"docs={n_docs} vecs={n_vecs} ticks={[round(s,1) for s in tick_s]}"
            f" total={sum(tick_s):.1f}s materialize={mat_s:.1f}s"
            f" (folded {folded} of {ev_n} log rows)"
            f" post_compaction_tick={post_s:.1f}s batch={batch_s:.1f}s"
            f" survivors={len(surv)} equal_batch={surv == want}",
            flush=True,
        )
        if surv != want:
            print(
                f"  DIVERGENCE: inc-only={sorted(surv - want)[:10]}"
                f" batch-only={sorted(want - surv)[:10]}",
                flush=True,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
