"""Streaming ingest throughput bench (r11 verdict ask #6).

The correctness story for the streaming engine is the soak + wire
witnesses; this measures the one missing axis: ROWS/SEC. Five
configurations over the same sf0.1 events payload (100k rows, JSON
wire format, Kafka column contract via the file-source stand-in):

1. ``append``    — S2 streaming-insert path (write_batch), offset dedup on.
2. ``upsert``    — S4 upsert+delete MERGE path (merge_batch): keys collide
                   on user_id (~1500 distinct keys over 100k rows, the
                   reference's compaction-heavy shape) and 2% tombstones.
3. ``upsert+ivm``— same, plus an attached RollupMaintainer and HLL
                   SketchMaintainer so every batch also pays the
                   index/IVM refresh through the CDC feed — the
                   marginal cost of keeping query artifacts fresh.
4. ``upsert_delete_amortized`` (r13) — the reference's DESIGN POINT:
                   BigQuerySinkConfig defaults mergeIntervalMs to 60 s
                   (:353-374), i.e. merges amortize over an interval's
                   accumulated rows. Here the trigger drains the whole
                   staged backlog as ONE micro-batch and pays ONE
                   MERGE — the apples-to-apples rows/s vs the
                   reference, where rows 2-3 deliberately pay a MERGE
                   per arriving file (worst-case latency posture).
5. ``upsert_delete_ivm_amortized`` — 4 plus the IVM maintainers.

Reference envelope for context (no published rows/sec exists): a
10-thread writer pool with queue-based backpressure
(kcbq/config/BigQuerySinkConfig.java:399-407) and the 60 s default
merge flush interval above.

Per-batch latencies come from the query's own progress events
(StreamingQueryProgress.batchDuration), wall-clock from start to
processAllAvailable. Prints ONE JSON line; run on a quiet host.

Usage: python tools/bench_streaming.py [n_batches] [rows_per_batch]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

VALUE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _stage_source(spark, events_path: str, src_dir: str, n_batches: int, rows_per_batch: int) -> int:
    """Write the payload as n_batches parquet files in the Kafka column
    contract: key = user_id (the MERGE key), value = JSON event row,
    2% tombstones (null value) on the upsert keyspace."""
    ev = (
        spark.read.parquet(events_path)
        .orderBy("event_id")
        .limit(n_batches * rows_per_batch)
        # dense 0-based row index: event_ids may be sparse or offset, so
        # deriving __b from the raw id would skew batch count/sizes
        .withColumn(
            "__rn",
            F.row_number().over(W.orderBy("event_id")) - 1,
        )
    )
    total = ev.count()
    wire = ev.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        F.when(
            F.col("event_id") % 50 == 17, F.lit(None).cast("binary")
        )  # 2% tombstones
        .otherwise(
            F.to_json(
                F.struct("event_id", "user_id", "event_type", "value", "props")
            ).cast("binary")
        )
        .alias("value"),
        F.lit("ev").alias("topic"),
        F.lit(0).cast("int").alias("partition"),
        F.col("event_id").cast("long").alias("offset"),
        F.col("ts").alias("timestamp"),
        (F.col("__rn") / rows_per_batch).cast("long").alias("__b"),
    )
    # one file per micro-batch, staged BEFORE the clock starts
    wire.repartition("__b").write.partitionBy("__b").mode("overwrite").parquet(
        src_dir + "_staged"
    )
    # zero-padded batch ids: the file source picks files in LEXICAL
    # order (path + near-equal modtimes), and "batch_10" < "batch_2"
    # lexically — unpadded names replayed offsets OUT of order, which a
    # real Kafka partition never does (observed as a final_rows drift
    # between per-file and amortized runs: a key's newest event landed
    # in a batch processed before an older one)
    staged_dirs = sorted(
        (d for d in os.listdir(src_dir + "_staged") if d.startswith("__b=")),
        key=lambda d: int(d.split("=")[1]),
    )
    base_mtime = time.time() - 3600
    for i, d in enumerate(staged_dirs):
        bdir = os.path.join(src_dir + "_staged", d)
        for f in os.listdir(bdir):
            if f.endswith(".parquet"):
                os.makedirs(src_dir, exist_ok=True)
                dst = os.path.join(
                    src_dir, f"batch_{int(d.split('=')[1]):05d}_{f}"
                )
                shutil.copy(os.path.join(bdir, f), dst)
                # FileStreamSource orders candidate files by MODTIME;
                # sequential copies can land in the same clock tick and
                # tie-break arbitrarily, replaying offsets out of order
                # (a real Kafka partition never does) — pin strictly
                # increasing mtimes so batch order == offset order
                os.utime(dst, (base_mtime + i, base_mtime + i))
    return total


def _drive(
    spark,
    wh_dir: str,
    src: str,
    ckpt: str,
    *,
    mode: str,
    ivm: bool,
    staged_rows: int,
    amortized: bool = False,
):
    from kafka_connect_bigquery_spark.config import SinkConfig
    from kafka_connect_bigquery_spark.operators import rollup as R
    from kafka_connect_bigquery_spark.operators import sketch as SK
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse
    from kafka_connect_bigquery_spark.sources.kafka import file_stream_source
    from kafka_connect_bigquery_spark.streaming.pipeline import SinkPipeline

    wh = Warehouse(spark, wh_dir)
    upsert = mode != "append"
    cfg = SinkConfig(
        topics=["ev"],
        time_partitioning_type="NONE",
        upsert_enabled=upsert,
        delete_enabled=upsert,
        kafka_key_field_name="ukey" if upsert else None,
        errors_tolerance="none" if upsert else "permissive",
    )
    maintainers = {}
    if ivm:
        measures = {"n": F.lit(1).cast("bigint"), "sum_v": F.col("value").cast("double")}
        maintainers["ev"] = [
            R.RollupMaintainer(wh, "ev", "ev_by_type", ["event_type"], measures, count_measure="n"),
            SK.SketchMaintainer(wh, "ev", "ev_hll", "event_id", ["event_type"], kind="hll"),
        ]
    pipe = SinkPipeline(
        warehouse=wh,
        config=cfg,
        value_parser=lambda c: F.from_json(c.cast("string"), VALUE_SCHEMA),
        key_parser=(lambda c: c.cast("string")) if upsert else None,
        # the IVM maintainers consume the bucketed-MERGE CDC feed, so
        # that config gets the bucketed layout (same spec the soak uses)
        table_specs={
            "ev": TableSpec(
                partition_grain="NONE", key_bucket_count=8 if ivm else None
            )
        },
        rollup_maintainers=maintainers,
    )
    t0 = time.time()
    q = pipe.start(
        # amortized = the reference's mergeIntervalMs design point: the
        # trigger drains the WHOLE staged backlog (an interval's worth
        # of accumulated input) and pays ONE MERGE for it, instead of a
        # MERGE per arriving file. trigger_sec stays 0 so the bench
        # measures processing cost, not idle trigger waits — the
        # accumulation is represented by the backlog, not wall time.
        file_stream_source(
            spark, src, max_files_per_trigger=None if amortized else 1
        ),
        ckpt,
        key_cols=["ukey"] if upsert else None,
    )
    q.processAllAvailable()
    wall = time.time() - t0
    prog = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    batch_ms = [
        p["durationMs"]["triggerExecution"]
        for p in prog
        if p.get("numInputRows", 0) > 0
    ]
    # throughput over the STAGED row count — authoritative, unlike
    # numInputRows, which double-counts on the foreachBatch V1 path
    out = {
        "wall_sec": round(wall, 2),
        "rows": staged_rows,
        "rows_per_sec": round(staged_rows / wall, 1),
        "batches": len(batch_ms),
        "batch_ms_min": min(batch_ms) if batch_ms else None,
        "batch_ms_median": sorted(batch_ms)[len(batch_ms) // 2] if batch_ms else None,
        "batch_ms_max": max(batch_ms) if batch_ms else None,
    }
    if upsert:
        out["final_rows"] = wh.read("ev").count()
    return out


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rows_per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 5000

    from kafka_connect_bigquery_spark.session import get_spark

    spark = get_spark("bench-streaming")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    work = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        src = os.path.join(work, "src")
        staged = _stage_source(
            spark, os.path.join(sf_dir, "events.parquet"), src, n_batches, rows_per_batch
        )
        results = {}
        for label, mode, ivm, amortized in [
            ("append", "append", False, False),
            ("upsert_delete", "upsert", False, False),
            ("upsert_delete_ivm", "upsert", True, False),
            # the apples-to-apples row vs the reference's 60 s
            # mergeIntervalMs default: one MERGE over the accumulated
            # interval instead of one per arriving file
            ("upsert_delete_amortized", "upsert", False, True),
            ("upsert_delete_ivm_amortized", "upsert", True, True),
        ]:
            results[label] = _drive(
                spark,
                os.path.join(work, f"wh_{label}"),
                src,
                os.path.join(work, f"ckpt_{label}"),
                mode=mode,
                ivm=ivm,
                staged_rows=staged,
                amortized=amortized,
            )
        payload = {
            "metric": "streaming_ingest",
            "unit": "rows_per_sec",
            "staged_rows": staged,
            "n_batches": n_batches,
            "rows_per_batch": rows_per_batch,
            "configs": results,
        }
        print(json.dumps(payload), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
