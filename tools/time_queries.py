"""Time a list of registry queries (min-of-N .count(), warmed session)
— the focused interleaved-A/B harness used by optimization rounds.

Usage: python tools/time_queries.py <sf_dir> <n_runs> <query> [query ...]
Prints one JSON line {query: min_sec, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir, n_runs, names = sys.argv[1], int(sys.argv[2]), sys.argv[3:]
    from kafka_connect_bigquery_spark import queries as qmod
    from kafka_connect_bigquery_spark.session import get_spark

    spark = get_spark("time-queries")
    registry = qmod.queries()
    registry[names[0]](spark, sf_dir).count()  # warmup
    out = {}
    for name in names:
        samples = []
        for _ in range(n_runs):
            t0 = time.time()
            registry[name](spark, sf_dir).count()
            samples.append(time.time() - t0)
        out[name] = round(min(samples), 4)
    spark.stop()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
