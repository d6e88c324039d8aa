"""sf10 engine-twin invariants for the non-linear families (r13).

The 30-entry sf10 EXACT sweep covers linear DuckDB oracles only; the
dedup/ANN/sketch families stop at sf1 because their quadratic oracles
are unaffordable DuckDB-side at 100x. This tool carries each family to
sf10 with the ENGINE-TWIN invariant that defines its correctness,
checked exactly (frame equality, not estimates):

1. ANN    — probe == brute force: ``ivf_topk`` with n_probe = n_lists
            must equal ``cosine_topk`` row-for-row on hash-sampled
            queries over the full sf10 embeddings (the IVF path's
            exact-degradation contract); recall@k at the production
            n_probe is reported alongside as context.
2. Sketch — merged == rebuilt: for HLL / KMV / count-min / AMS-F2,
            build over an 80% id-split of sf10 events, build over the
            20%, MERGE, and demand slot-for-slot equality with the
            one-shot build over the union (the mergeability algebra
            every distributed/incremental use rests on).
3. Dedup  — prefix-filter == inverted-index join on a capped slice:
            ``prefix_filter_pairs`` (AllPairs prefix principle) must
            return the identical pair set as the unfiltered exact
            inverted-index Jaccard join on a sf10 document slice (the
            no-recall-loss guarantee); plus the LSH probe invariant
            pairs(index ∪ new) == pairs(index) ∪ probe(new, index)
            on a capped slice, 80/20 split.

Why the dedup slices are capped — OUTPUT size, not machinery: the
synthetic corpus draws every document from a 31-word vocabulary, so
its pair DENSITY is pathological (~9% of all doc pairs LSH-collide:
11,420 pairs among 500 docs at sf0.001). Materializing the invariant's
pair sets over all 500k sf10 docs is ~10^10 OUTPUT rows — infeasible
for any engine and unrepresentative of a real corpus (density ~1e-6).
The caps bound the quadratic pair output; the operators themselves are
the same blocked/bucketed machinery the 30/30 sf10 sweep's inputs ran.

Usage: python tools/verify_sf10_invariants.py [--sf-dir .scale/sf10_mf]
       [--slice-docs 5000] [--lsh-docs 20000]
Prints one JSON line with per-invariant verdicts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def _same_frame(a, b, cols) -> dict:
    """Exact set equality of two frames on cols (order-insensitive)."""
    a = a.select(*cols)
    b = b.select(*cols)
    only_a = a.exceptAll(b).count()
    only_b = b.exceptAll(a).count()
    return {
        "rows_a": a.count(),
        "rows_b": b.count(),
        "only_a": only_a,
        "only_b": only_b,
        "equal": only_a == 0 and only_b == 0,
    }


def ann_invariant(spark, sf_dir: str) -> dict:
    from kafka_connect_bigquery_spark.operators import ann
    from kafka_connect_bigquery_spark.session import read_table

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    # ~20 hash-sampled queries spread across the id space
    queries = emb.filter(F.pmod(F.col("vec_id"), F.lit(max(1, n // 20))) == 0)
    nq = queries.count()
    cents = ann.seed_centroids(emb, id_col="vec_id", vec_col="embedding", k=16)
    t0 = time.time()
    exact = ann.cosine_topk(queries, emb, k=10).localCheckpoint(eager=True)
    t_exact = time.time() - t0
    t0 = time.time()
    probe_all = ann.ivf_topk(
        queries, emb, cents, k=10, n_probe=len(cents)
    ).localCheckpoint(eager=True)
    t_all = time.time() - t0
    eq = _same_frame(
        probe_all, exact, ["query_id", "neighbor_id", "cosine", "rank"]
    )
    # production posture: n_probe=4 recall@10 vs exact
    t0 = time.time()
    approx = ann.ivf_topk(queries, emb, cents, k=10, n_probe=4)
    hits = approx.select("query_id", "neighbor_id").intersect(
        exact.select("query_id", "neighbor_id")
    ).count()
    t_probe = time.time() - t0
    return {
        "corpus": n,
        "queries": nq,
        "probe_all_equals_brute": eq,
        "recall_at_10_nprobe4": round(hits / max(1, nq * 10), 4),
        "sec_brute": round(t_exact, 1),
        "sec_probe_all": round(t_all, 1),
        "sec_probe4": round(t_probe, 1),
    }


def sketch_invariant(spark, sf_dir: str) -> dict:
    from kafka_connect_bigquery_spark.operators import sketch as SK
    from kafka_connect_bigquery_spark.session import read_table

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    hi = ev.agg(F.max("event_id")).first()[0]
    cut = (hi * 4) // 5
    a = ev.filter(F.col("event_id") <= cut)
    b = ev.filter(F.col("event_id") > cut)
    out = {}

    def check(name, build, merge, key_cols):
        t0 = time.time()
        merged = merge(build(a), build(b))
        rebuilt = build(ev)
        eq = _same_frame(merged, rebuilt, key_cols)
        eq["sec"] = round(time.time() - t0, 1)
        out[name] = eq

    check(
        "hll",
        lambda d: SK.hll_build(d, "user_id"),
        lambda x, y: SK.hll_merge(x, y),
        ["register", "rho"],
    )
    check(
        "kmv",
        lambda d: SK.kmv_build(d, "user_id"),
        lambda x, y: SK.kmv_merge(x, y),
        ["hv"],
    )
    check(
        "count_min",
        lambda d: SK.count_min_build(d, "user_id"),
        lambda x, y: SK.count_min_merge(x, y),
        ["d", "slot", "cnt"],
    )
    check(
        "ams_f2",
        lambda d: SK.ams_build(d, "user_id"),
        lambda x, y: SK.ams_merge(x, y),
        ["d", "slot", "s"],
    )
    return out


def dedup_invariant(spark, sf_dir: str, slice_docs: int, lsh_docs: int) -> dict:
    from kafka_connect_bigquery_spark.operators import dedup
    from kafka_connect_bigquery_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = {}

    # -- prefix-filter == unfiltered inverted-index exact join ----------
    sl = docs.filter(F.col("doc_id") < slice_docs).localCheckpoint(eager=True)
    n_slice = sl.count()
    tn, td, n = 7, 10, 3
    t0 = time.time()
    pf = dedup.prefix_filter_pairs(
        sl, "doc_id", "text", n=n, jaccard_num=tn, jaccard_den=td
    ).localCheckpoint(eager=True)
    t_pf = time.time() - t0
    # the unfiltered twin: full postings self-join -> exact integer
    # Jaccard test (no prefix pruning, no stop-shingle guard)
    posts = dedup._shingle_postings(sl, "doc_id", "text", n, None).localCheckpoint(
        eager=True
    )
    sizes = posts.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    t0 = time.time()
    inter = (
        posts.select(F.col("doc").alias("id_a"), "sh")
        .join(
            posts.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b")),
            (F.col("sh") == F.col("sh_b")) & (F.col("id_a") < F.col("id_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter_size"))
    )
    twin = (
        inter.join(sizes.select(F.col("doc").alias("id_a"), F.col("sz").alias("size_a")), "id_a")
        .join(sizes.select(F.col("doc").alias("id_b"), F.col("sz").alias("size_b")), "id_b")
        .filter(
            F.col("inter_size") * td
            >= (F.col("size_a") + F.col("size_b") - F.col("inter_size")) * tn
        )
        .localCheckpoint(eager=True)
    )
    t_twin = time.time() - t0
    eq = _same_frame(pf, twin, ["id_a", "id_b", "inter_size"])
    out["prefix_filter_slice"] = {
        "slice_docs": n_slice,
        **eq,
        "sec_prefix": round(t_pf, 1),
        "sec_inverted_index_twin": round(t_twin, 1),
    }

    # -- LSH probe invariant on a capped slice (output-bound; see
    # module docstring), 80/20 split by id ------------------------------
    lsl = docs.filter(F.col("doc_id") < lsh_docs)
    cut = (lsh_docs * 4) // 5
    t0 = time.time()
    sig = dedup.minhash_signature(lsl, "doc_id", "text", num_hashes=16, n=3)
    posts_all = dedup.lsh_band_postings(
        sig, "doc_id", num_hashes=16, bands=4
    ).localCheckpoint(eager=True)
    idx = posts_all.filter(F.col("doc") <= cut)
    new = posts_all.filter(F.col("doc") > cut)
    full = dedup.lsh_pairs_from_postings(posts_all)
    decomposed = dedup.lsh_pairs_from_postings(idx).unionByName(
        dedup.lsh_probe_index(new, idx)
    ).distinct()
    eq2 = _same_frame(full, decomposed, ["id_a", "id_b"])
    out["lsh_probe_slice"] = {
        "docs": lsl.count(),
        **eq2,
        "sec": round(time.time() - t0, 1),
    }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".scale", "sf10_mf"))
    ap.add_argument("--slice-docs", type=int, default=5_000)
    ap.add_argument("--lsh-docs", type=int, default=20_000)
    ap.add_argument("--families", default="ann,sketch,dedup")
    args = ap.parse_args()

    from kafka_connect_bigquery_spark.session import get_spark

    spark = get_spark("sf10_invariants")
    out = {"metric": "sf10_invariants", "sf_dir": args.sf_dir}
    fams = set(args.families.split(","))
    if "ann" in fams:
        out["ann"] = ann_invariant(spark, args.sf_dir)
        print(json.dumps({"ann": out["ann"]}), flush=True)
    if "sketch" in fams:
        out["sketch"] = sketch_invariant(spark, args.sf_dir)
        print(json.dumps({"sketch": out["sketch"]}), flush=True)
    if "dedup" in fams:
        out["dedup"] = dedup_invariant(
            spark, args.sf_dir, args.slice_docs, args.lsh_docs
        )
        print(json.dumps({"dedup": out["dedup"]}), flush=True)
    spark.stop()
    print(json.dumps(out, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
