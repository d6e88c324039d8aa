"""Per-query stage-level profile of the bench headline set (guide §1:
measure first, empirically — the local-mode stand-in for the Spark UI
stage table).

For each query it records, over the stages created by a timed run:
- wall clock (same ``.count()`` action as bench.py, min-of-N),
- executor run/CPU time, input bytes, shuffle read/write bytes and
  rows, spill — so "where does the time go" (compute vs shuffle vs
  scan) is answerable per query,
- the executed final plan's operator census: exchange count, join
  strategies, codegen span count, Python-boundary nodes.

Usage:
  python tools/profile_bench.py [sf_dir] [query ...]   # default: headline
Writes JSON to plans/r13/profile_<basename(sf_dir)>.json and prints a
sorted table (slowest first).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _stages(spark) -> dict[int, dict]:
    """stageId -> metric dict from the AppStatusStore (post-hoc).

    Spark 4.1 signature: stageList(statuses, details, withSummaries,
    unsortedQuantiles, taskStatus) — empty statuses list = all stages.
    """
    out: dict[int, dict] = {}
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    empty = sc._jvm.java.util.ArrayList()
    no_q = sc._gateway.new_array(sc._jvm.double, 0)
    it = store.stageList(empty, False, False, no_q, empty).iterator()
    while it.hasNext():
        s = it.next()
        out[int(s.stageId())] = {
            "name": str(s.name()),
            "run_ms": int(s.executorRunTime()),
            "cpu_ms": int(s.executorCpuTime()) // 1_000_000,
            "input_mb": int(s.inputBytes()) >> 20,
            "sh_read_mb": int(s.shuffleReadBytes()) >> 20,
            "sh_write_mb": int(s.shuffleWriteBytes()) >> 20,
            "sh_read_rows": int(s.shuffleReadRecords()),
            "sh_write_rows": int(s.shuffleWriteRecords()),
            "spill_disk_mb": int(s.diskBytesSpilled()) >> 20,
            "tasks": int(s.numTasks()),
        }
    return out


def _plan_census(df) -> dict:
    tree = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": len(re.findall(r"Exchange (?:hash|range|Single|round)", tree)),
        "broadcast_exchanges": tree.count("BroadcastExchange"),
        "smj": tree.count("SortMergeJoin"),
        "shj": tree.count("ShuffledHashJoin"),
        "bhj": tree.count("BroadcastHashJoin"),
        "bnlj": tree.count("BroadcastNestedLoopJoin"),
        "cartesian": tree.count("CartesianProduct"),
        "python": tree.count("BatchEvalPython")
        + tree.count("ArrowEvalPython")
        + tree.count("MapInPandas")
        + tree.count("MapInArrow"),
        "aqe_final": "isFinalPlan=true" in tree,
    }


def profile(spark, registry, names, sf_dir, n_runs=3):
    rows = []
    for name in names:
        fn = registry[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        walls = []
        stage_delta: dict[int, dict] = {}
        census = None
        for i in range(n_runs):
            before = set(_stages(spark))
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.count()
            walls.append(round(time.time() - t0, 4))
            if i == 0:
                after = _stages(spark)
                stage_delta = {k: v for k, v in after.items() if k not in before}
                try:
                    census = _plan_census(df)
                except Exception:
                    census = None
        spark.sparkContext.setJobDescription(None)
        agg = {
            k: sum(s[k] for s in stage_delta.values())
            for k in (
                "run_ms", "cpu_ms", "input_mb", "sh_read_mb", "sh_write_mb",
                "sh_read_rows", "sh_write_rows", "spill_disk_mb", "tasks",
            )
        }
        top = sorted(stage_delta.values(), key=lambda s: -s["run_ms"])[:6]
        rows.append(
            {
                "query": name,
                "wall_min": min(walls),
                "wall_runs": walls,
                "n_stages": len(stage_delta),
                **agg,
                "census": census,
                "top_stages": top,
            }
        )
    return rows


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    from kafka_connect_bigquery_spark import queries as qmod
    from kafka_connect_bigquery_spark.session import get_spark

    import bench

    registry = qmod.queries()
    names = argv[1:] or [n for n in bench.HEADLINE if n in registry]
    spark = get_spark("profile-bench")
    # warmup (file listing + codegen), same as bench.py
    registry[names[0]](spark, sf_dir).count()
    rows = profile(spark, registry, names, sf_dir)
    rows.sort(key=lambda r: -r["wall_min"])
    out = os.path.join(
        REPO, "plans", "r13",
        f"profile_{os.path.basename(sf_dir.rstrip(os.sep))}.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    hdr = (
        f"{'query':40s} {'wall':>7s} {'run_s':>7s} {'cpu_s':>7s} "
        f"{'in_mb':>6s} {'shr_mb':>6s} {'shw_mb':>6s} {'shr_rows':>9s} "
        f"{'stg':>4s} {'exch':>4s} {'joins s/h/b':>11s}"
    )
    print(hdr)
    for r in rows:
        c = r["census"] or {}
        joins = f"{c.get('smj', '?')}/{c.get('shj', '?')}/{c.get('bhj', '?')}"
        print(
            f"{r['query']:40s} {r['wall_min']:7.3f} {r['run_ms'] / 1e3:7.2f} "
            f"{r['cpu_ms'] / 1e3:7.2f} {r['input_mb']:6d} {r['sh_read_mb']:6d} "
            f"{r['sh_write_mb']:6d} {r['sh_read_rows']:9d} {r['n_stages']:4d} "
            f"{c.get('exchanges', -1):4d} {joins:>11s}"
        )
    print(f"\nwrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
