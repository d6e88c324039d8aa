"""Settle the r11 `search_hybrid_rrf` watch item (r11 verdict ask #2).

7-run interleaved A/B in ONE session at sf0.1, anchored on tpch_q6,
alternating variant order each round (the repo's settlement protocol —
this host shows ±30% noise with repeated-run decay, so only
interleaved same-session distributions are comparable):

- A (HEAD, r11 shape): `_shingle_postings` widens the RAW input with
  ``fan_out(df)`` before the canon projection.
- B (pre-r11 shape): canon projection first, then an unconditional
  ``repartition(defaultParallelism)`` before the checkpoint.

Hypothesis under test: `search_hybrid_rrf` feeds `_shingle_postings` a
post-``union().distinct()`` frame; under AQE, ``df.rdd`` (fan_out's
narrow-input probe) FINALIZES the adaptive plan, which executes the
upstream shuffle stages — and the eager localCheckpoint right after
executes them again. Raw-scan inputs (the dedup family) have no
upstream stages, so only the hybrid-retrieval entry pays the double
execution. The script also times the probe in isolation.

Usage: python tools/ab_shingle_rrf.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _old_shingle_postings(
    df: DataFrame, id_col: str, text_col: str, n: int, max_doc_freq: int | None
) -> DataFrame:
    """The pre-r11 (f9ec94d^) shape, verbatim: projection ->
    repartition(par) -> checkpoint."""
    from kafka_connect_bigquery_spark.operators.dedup import canonical_text

    par = df.sparkSession.sparkContext.defaultParallelism
    canon = (
        df.select(
            F.col(id_col).alias("doc"), canonical_text(F.col(text_col)).alias("_c")
        )
        .repartition(par)
        .localCheckpoint(eager=True)
    )
    c = F.col("_c")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(1))),
            lambda i: c.substr(i, F.lit(n)),
        )
    )
    posts = canon.select("doc", F.explode(shingles).alias("sh"))
    if max_doc_freq is not None:
        posts = posts.localCheckpoint(eager=True)
        stop = (
            posts.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") > max_doc_freq)
            .select("sh")
        )
        posts = posts.join(F.broadcast(stop), "sh", "left_anti")
    return posts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    from kafka_connect_bigquery_spark import queries as qmod
    from kafka_connect_bigquery_spark.operators import dedup as D
    from kafka_connect_bigquery_spark.session import get_spark

    spark = get_spark("ab-shingle-rrf")
    reg = qmod.queries()
    head_impl = D._shingle_postings

    def run(name: str) -> float:
        t0 = time.time()
        reg[name](spark, sf_dir).count()
        return round(time.time() - t0, 4)

    def with_variant(impl, name: str) -> float:
        D._shingle_postings = impl
        try:
            return run(name)
        finally:
            D._shingle_postings = head_impl

    # --- probe-cost micro-check (hypothesis isolation) ----------------
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    union = (
        docs.select("doc_id", "text")
        .unionByName(docs.select("doc_id", "text"))
        .distinct()
    )
    t0 = time.time()
    nparts = union.rdd.getNumPartitions()
    probe_cost = round(time.time() - t0, 4)
    t0 = time.time()
    scan_parts = docs.rdd.getNumPartitions()
    scan_probe_cost = round(time.time() - t0, 4)
    print(
        json.dumps(
            {
                "probe": {
                    "post_distinct_rdd_probe_sec": probe_cost,
                    "post_distinct_parts": nparts,
                    "raw_scan_rdd_probe_sec": scan_probe_cost,
                    "raw_scan_parts": scan_parts,
                }
            }
        ),
        flush=True,
    )

    # --- warmup both variants + anchor --------------------------------
    run("tpch_q6_forecast_revenue")
    with_variant(head_impl, "search_hybrid_rrf")
    with_variant(_old_shingle_postings, "search_hybrid_rrf")

    out = {"anchor_q6": [], "A_head": [], "B_prer11": []}
    for i in range(rounds):
        out["anchor_q6"].append(run("tpch_q6_forecast_revenue"))
        order = (
            [("A_head", head_impl), ("B_prer11", _old_shingle_postings)]
            if i % 2 == 0
            else [("B_prer11", _old_shingle_postings), ("A_head", head_impl)]
        )
        for label, impl in order:
            out[label].append(with_variant(impl, "search_hybrid_rrf"))
        print(json.dumps({"round": i, **{k: v[-1] for k, v in out.items()}}), flush=True)

    summary = {
        k: {
            "runs": v,
            "min": min(v),
            "median": sorted(v)[len(v) // 2],
        }
        for k, v in out.items()
    }
    summary["verdict_ratio_min_A_over_B"] = round(
        summary["A_head"]["min"] / summary["B_prer11"]["min"], 4
    )
    print(json.dumps(summary, indent=2), flush=True)


if __name__ == "__main__":
    main()
