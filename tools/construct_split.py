"""Split each headline query's wall time into DataFrame CONSTRUCTION
(driver-side plan building: py4j round trips + eager analysis, guide §5
"the driver should do almost no work") vs EXECUTION (the .count() the
bench times).

Construction is timed as ``registry[name](spark, sf_dir)`` alone;
execution as ``.count()`` on the returned frame. Because many queries
eagerly localCheckpoint intermediates, "construction" here includes
those materializations — which is exactly the bench-relevant split: the
bench pays both, and anything we can move out of per-invocation py4j
chatter is a win on every call.

Usage: python tools/construct_split.py [sf_dir] [query ...]
Writes plans/r14/construct_split_<sf>.json, prints worst-first table.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    only = set(argv[1:])

    import bench
    from kafka_connect_bigquery_spark import queries as qmod
    from kafka_connect_bigquery_spark.session import get_spark

    spark = get_spark("construct-split")
    registry = qmod.queries()
    names = [n for n in bench.HEADLINE if n in registry]
    if only:
        names = [n for n in names if n in only]

    # warmup (file listings, codegen)
    registry[names[0]](spark, sf_dir).count()

    rows = []
    for name in names:
        best_c, best_e = float("inf"), float("inf")
        for _ in range(3):
            t0 = time.time()
            df = registry[name](spark, sf_dir)
            t1 = time.time()
            df.count()
            t2 = time.time()
            best_c = min(best_c, t1 - t0)
            best_e = min(best_e, t2 - t1)
        rows.append(
            {
                "query": name,
                "construct_s": round(best_c, 3),
                "execute_s": round(best_e, 3),
                "construct_frac": round(best_c / max(best_c + best_e, 1e-9), 3),
            }
        )
    spark.stop()

    rows.sort(key=lambda r: -r["construct_s"])
    out = os.path.join(REPO, "plans", "r14")
    os.makedirs(out, exist_ok=True)
    sf = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(out, f"construct_split_{sf}.json")
    with open(path, "w") as f:
        json.dump(rows, f, indent=2)
    tot_c = sum(r["construct_s"] for r in rows)
    tot_e = sum(r["execute_s"] for r in rows)
    print(f"TOTAL construct={tot_c:.2f}s execute={tot_e:.2f}s -> {path}")
    for r in rows[:25]:
        print(
            f"{r['query']:38s} c={r['construct_s']:7.3f} "
            f"e={r['execute_s']:7.3f} frac={r['construct_frac']:.2f}"
        )


if __name__ == "__main__":
    main()
