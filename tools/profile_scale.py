"""Profile the steepest sf10 scale curves (r11 verdict ask #5): q5
(41x per 100x data) and q3 (18x) — shuffle spill, final AQE join
strategies, and a measured bucketed co-location A/B for the
lineitem⨝orders spine.

What it records per query:
- min-of-3 wall clock;
- per-run memory/disk spill deltas from the AppStatusStore stage
  metrics (the local-mode stand-in for the Spark UI's spill columns);
- the final adaptive plan's join nodes (isFinalPlan=true), so join-
  strategy regressions at the 60M-row rung are visible in text.

Co-location experiment: lineitem and orders (spine columns only)
written once as catalog bucketed tables on orderkey
(sinks/bucketed_catalog.save_bucketed, 32 buckets = local cores),
then the q5 spine join runs plain vs bucketed, interleaved, 5 rounds.
The bucketed scan advertises hash distribution, so the l⨝o exchange
(the dominant shuffle at sf10: ~60M rows repartitioned) is elided;
the write-time shuffle is paid ONCE and amortizes over every later
orderkey join — the 100 TB play the module docstring describes.

Usage: python tools/profile_scale.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def _stage_metrics(spark) -> dict[int, tuple[int, int]]:
    """stageId -> (memoryBytesSpilled, diskBytesSpilled) from the
    status store (driver-side, post-hoc)."""
    out: dict[int, tuple[int, int]] = {}
    try:
        store = spark.sparkContext._jsc.sc().statusStore()
        it = store.stageList(None).iterator()
        while it.hasNext():
            s = it.next()
            out[int(s.stageId())] = (
                int(s.memoryBytesSpilled()),
                int(s.diskBytesSpilled()),
            )
    except Exception:
        pass
    return out


def _run_profiled(spark, df, label: str, n_runs: int = 3) -> dict:
    walls, spills = [], []
    plan = None
    for _ in range(n_runs):
        before = _stage_metrics(spark)
        t0 = time.time()
        df.count()
        walls.append(round(time.time() - t0, 3))
        after = _stage_metrics(spark)
        mem = sum(v[0] for k, v in after.items() if k not in before)
        disk = sum(v[1] for k, v in after.items() if k not in before)
        spills.append({"mem_spill_mb": mem >> 20, "disk_spill_mb": disk >> 20})
        if plan is None:
            tree = df._jdf.queryExecution().executedPlan().toString()
            plan = [
                ln.strip()
                for ln in tree.splitlines()
                if "Join" in ln or "Exchange" in ln or "isFinalPlan" in ln
            ]
    return {
        "label": label,
        "wall_runs": walls,
        "wall_min": min(walls),
        "spill_per_run": spills,
        "plan_join_exchange_nodes": plan,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
    work = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/buckets"

    from kafka_connect_bigquery_spark import queries as qmod
    from kafka_connect_bigquery_spark.session import get_spark
    from kafka_connect_bigquery_spark.sinks.bucketed_catalog import save_bucketed

    spark = get_spark("profile-scale")
    reg = qmod.queries()

    results = {"sf_dir": sf_dir}
    for name in ("tpch_q3_shipping_priority", "tpch_q5_local_supplier_volume"):
        results[name] = _run_profiled(spark, reg[name](spark, sf_dir), name)
        print(json.dumps(results[name]), flush=True)

    # ---- co-location A/B on the q5 spine ------------------------------
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    n_buckets = spark.sparkContext.defaultParallelism
    t0 = time.time()
    save_bucketed(
        li, "li_b", ["l_orderkey"], n_buckets, path=os.path.join(work, "li_b")
    )
    save_bucketed(
        od, "od_b", ["o_orderkey"], n_buckets, path=os.path.join(work, "od_b")
    )
    bucket_write_sec = round(time.time() - t0, 2)

    def spine(l, o):
        o2 = o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        j = l.join(o2, l["l_orderkey"] == o2["o_orderkey"])
        return j.groupBy("o_custkey").agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
        )

    plain = spine(li, od)
    bucketed = spine(spark.table("li_b"), spark.table("od_b"))
    ab = {"plain": [], "bucketed": []}
    for i in range(5):
        order = ["plain", "bucketed"] if i % 2 == 0 else ["bucketed", "plain"]
        for lbl in order:
            df = plain if lbl == "plain" else bucketed
            t0 = time.time()
            df.count()
            ab[lbl].append(round(time.time() - t0, 3))
        print(json.dumps({"round": i, **{k: v[-1] for k, v in ab.items()}}), flush=True)
    results["colocation_ab"] = {
        "bucket_write_sec": bucket_write_sec,
        "n_buckets": n_buckets,
        "plain": {"runs": ab["plain"], "min": min(ab["plain"])},
        "bucketed": {"runs": ab["bucketed"], "min": min(ab["bucketed"])},
        "ratio_bucketed_over_plain": round(
            min(ab["bucketed"]) / min(ab["plain"]), 3
        ),
        "bucketed_plan": [
            ln.strip()
            for ln in bucketed._jdf.queryExecution().executedPlan().toString().splitlines()
            if "Join" in ln or "Exchange" in ln
        ],
    }
    print(json.dumps(results["colocation_ab"], indent=1), flush=True)


if __name__ == "__main__":
    main()
