"""Real-vocabulary BPE rung (r13): per-merge cost curve + engine twins.

The r12 `bpe_encode` entry proves the dictionary-encoded fold with 3
pinned merges; the 100 TB claim is O(vocab)-per-merge at a real ~1k-30k
merge vocabulary. Three measurements close the gap:

A. **Corpus saturation at sf1**: `learn_merges_words` over the sf1
   documents corpus runs to early-stop. The synthetic corpus has a
   31-word vocabulary (measured: max possible merges ~138), so a
   >=1k-merge vocabulary CANNOT come from this corpus — recorded
   honestly, with engine == pure-Python equality on the full
   saturated sequence.

B. **>=1k-merge cost curve on a Zipf dict**: dict-BPE's input is the
   (word, count) frequency dict — the corpus reaches training only
   through `word_freq_dict`'s ONE pass (its cost is corpus-linear and
   already measured elsewhere). So the >=1k rung feeds a synthesized
   Zipf-frequency dict of realistic size to `learn_merges_from_dict`,
   records cumulative wall time at power-of-two checkpoints (the
   per-merge cost curve), and replays the SAME dict in pure Python to
   pin the full merge sequence (engine == twin at every checkpoint).

C. **Encode cost vs merge count at sf1**: the dictionary-encoded
   tokenize (vocab-side `segment_words` + broadcast count join — the
   `bpe_encode` shape) with the saturated merge list vs 3 merges:
   encode cost must ride the VOCAB, not the corpus, so the delta stays
   far below proportional-to-merges.

Usage:
  python tools/bench_bpe_vocab.py [--sf-dir .scale/sf1] [--merges 1024]
         [--dict-words 50000] [--no-twin]

Prints one JSON line; full detail mirrors to stdout as it goes.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def zipf_freqs(n_words: int, seed: int = 7) -> dict[str, int]:
    """Deterministic Zipf-ish (word, count) dict with realistic word
    lengths (2-12 latin chars)."""
    rng = random.Random(seed)
    letters = "abcdefghijklmnopqrstuvwxyz"
    words: set[str] = set()
    while len(words) < n_words:
        words.add("".join(rng.choice(letters) for _ in range(rng.randint(2, 12))))
    ws = sorted(words)
    rng.shuffle(ws)
    return {
        w: max(1, int(10_000_000 / (i + 1))) + rng.randint(0, 3)
        for i, w in enumerate(ws)
    }


def py_learn(freqs: dict[str, int], n_merges: int, word_end: str) -> list:
    """Pure-Python Sennrich replay over the same dict (the twin)."""
    vocab = {w: tuple(w) + (word_end,) for w in freqs}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, toks in vocab.items():
            f = freqs[w]
            for x, y in zip(toks, toks[1:]):
                counts[(x, y)] += f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        merges.append((a, b))
        fused = a + b
        nv = {}
        for w, toks in vocab.items():
            if a not in toks or b not in toks:
                nv[w] = toks
                continue
            out = []
            for x in toks:
                if out and out[-1] == a and x == b:
                    out[-1] = fused
                else:
                    out.append(x)
            nv[w] = tuple(out)
        vocab = nv
    return merges


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".scale", "sf1"))
    ap.add_argument("--merges", type=int, default=1024)
    ap.add_argument("--dict-words", type=int, default=50_000)
    ap.add_argument("--no-twin", action="store_true")
    args = ap.parse_args()

    from kafka_connect_bigquery_spark.operators import bpe
    from kafka_connect_bigquery_spark.operators.skew import fan_out
    from kafka_connect_bigquery_spark.session import get_spark, read_table
    from kafka_connect_bigquery_spark.functions import text as text_fns

    spark = get_spark("bench_bpe_vocab")
    out: dict = {"metric": "bpe_vocab_rung", "sf_dir": args.sf_dir}

    # -- A: corpus saturation at sf1 -----------------------------------
    docs = read_table(spark, args.sf_dir, "documents")
    t0 = time.time()
    sat = bpe.learn_merges_words(docs, "text", n_merges=10_000)
    t_sat = time.time() - t0
    print(f"[A] sf1 corpus saturated at {len(sat)} merges in {t_sat:.1f}s", flush=True)
    texts = [r["text"] for r in docs.select("text").collect()]
    # python twin over the same corpus-derived dict
    import re

    def canon_words(t):
        c = re.sub(r"[^a-z0-9\s]", "", t.lower())
        return [w for w in re.sub(r"\s+", " ", c).strip().split(" ") if w]

    corpus_freqs = Counter(w for t in texts for w in canon_words(t))
    twin_a = py_learn(dict(corpus_freqs), 10_000, bpe.WORD_END)
    a_equal = sat == twin_a
    print(f"[A] engine == python replay: {a_equal}", flush=True)
    out["corpus_saturation"] = {
        "merges": len(sat),
        "sec": round(t_sat, 1),
        "sec_per_merge": round(t_sat / max(1, len(sat)), 3),
        "twin_equal": a_equal,
        "distinct_words": len(corpus_freqs),
    }

    # -- B: >=1k-merge cost curve on the Zipf dict ----------------------
    freqs = zipf_freqs(args.dict_words)
    dict_df = spark.createDataFrame(
        [(list(w) + [bpe.WORD_END], int(c)) for w, c in sorted(freqs.items())],
        "tk: array<string>, cnt: long",
    ).repartition(32)
    checkpoints = [c for c in (16, 64, 256, 512, 1024, 2048, 4096) if c <= args.merges]
    if not checkpoints or checkpoints[-1] != args.merges:
        checkpoints.append(args.merges)
    curve = []
    merges_all: list = []
    d = dict_df
    t_start = time.time()
    prev = 0
    for cp in checkpoints:
        step = cp - prev
        got, d = bpe.learn_merges_from_dict(d, n_merges=step, return_dict=True)
        merges_all.extend(got)
        el = time.time() - t_start
        curve.append(
            {
                "merges": len(merges_all),
                "cum_sec": round(el, 1),
                "sec_per_merge": round(el / max(1, len(merges_all)), 4),
            }
        )
        print(f"[B] {len(merges_all)} merges: {el:.1f}s cumulative "
              f"({el / max(1, len(merges_all)):.3f} s/merge)", flush=True)
        if len(merges_all) < cp:
            print(f"[B] dict saturated at {len(merges_all)} merges", flush=True)
            break
        prev = cp
    out["zipf_curve"] = {
        "dict_words": args.dict_words,
        "checkpoints": curve,
        "learned": len(merges_all),
    }
    if not args.no_twin:
        t0 = time.time()
        twin_b = py_learn(freqs, len(merges_all), bpe.WORD_END)
        b_equal = merges_all == twin_b
        print(f"[B] engine == python replay over {len(merges_all)} merges: "
              f"{b_equal} (twin took {time.time() - t0:.0f}s)", flush=True)
        out["zipf_curve"]["twin_equal"] = b_equal

    # -- C: encode cost vs merge count at sf1 ---------------------------
    def encode_secs(merges: list) -> float:
        d2 = fan_out(read_table(spark, args.sf_dir, "documents"))
        toks = d2.select(
            "doc_id",
            F.explode(
                F.filter(text_fns.tokens(F.col("text")), lambda w: w != F.lit(""))
            ).alias("tok"),
        ).localCheckpoint(eager=False)
        vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_n")).drop("_n")
        per_tok = bpe.segment_words(vocab, "tok", merges).select(
            "tok", F.size("subwords").cast("long").alias("_k")
        )
        t0 = time.time()
        n = (
            toks.join(F.broadcast(per_tok), "tok")
            .agg(F.sum("_k").alias("n_subwords"))
            .collect()[0]["n_subwords"]
        )
        el = time.time() - t0
        print(f"[C] encode with {len(merges)} merges: {el:.1f}s "
              f"({n} subwords)", flush=True)
        return el

    t3 = min(encode_secs(sat[:3]) for _ in range(2))
    tsat = min(encode_secs(sat) for _ in range(2))
    out["encode_vs_merges"] = {
        "merges_3_sec": round(t3, 2),
        "merges_sat_sec": round(tsat, 2),
        "sat": len(sat),
        "ratio": round(tsat / t3, 2),
    }
    spark.stop()
    print(json.dumps(out, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
