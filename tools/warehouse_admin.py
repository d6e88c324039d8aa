"""Operational CLI for warehouse maintenance — the commands an
operator (or cron) runs against a table directory without writing
Spark code:

    python tools/warehouse_admin.py describe <root> <table>
    python tools/warehouse_admin.py vacuum   <root> <table> [--keep-snapshots N]
    python tools/warehouse_admin.py compact  <root> <table> [--target-file-rows N]
                                     [--partition-col c --partition-value v]
    python tools/warehouse_admin.py history  <root> <table>
    python tools/warehouse_admin.py snapshots <root> <table>
    python tools/warehouse_admin.py bloom    <root> <table> [--bloom-cols a,b]
    python tools/warehouse_admin.py text     <root> <table> [--text-cols a,b]
                                     [--contains "col:term1,term2"]
    python tools/warehouse_admin.py ann      <root> <table> [--ann-col c]
                                     [--id-col vec_id] [--n-lists N]
                                     [--nearest "0.1,0.2,..."] [--k N]
                                     [--n-probe N] [--optimize]
    python tools/warehouse_admin.py restore  <root> <table> --version N
    python tools/warehouse_admin.py autocompact <root> <table> --partition-col c
                                     [--min-files N] [--small-file-bytes N]
                                     [--max-partitions N] [--dry-run]
    python tools/warehouse_admin.py clone    <root> <table> --dest <name>
                                     [--version N]
    python tools/warehouse_admin.py tick     <root> <table> [--partition-col c]
                                     [--min-files N] [--max-partitions N]
                                     [--keep-layers N] [--keep-snapshots N]
                                     [--expire-older-than-days N]

Prints one JSON object to stdout. `describe`/`vacuum`/`snapshots` are
metadata-only (no Spark job); `compact`/`history` start a local
session. `compact` with --partition-col/--partition-value runs the
partition-scoped rewrite (O(partition) delta commit — the form a cron
schedules at fleet scale). `bloom` with --bloom-cols records per-file Bloom filters (one
Spark pass); without it, it reports the recorded bloom state. `text`
works the same way for the per-file full-text token index; with
--contains "col:term1,term2" it runs a conjunctive indexed grep and
reports the match count plus how many files the probe opened. `ann`
with --ann-col records the IVF vector index (frozen seeded quantizer +
per-file list memberships); with --nearest "x,y,..." it probes the
index and reports the top-k (neighbor id, cosine) plus how many files
the probe opened; without either it reports the recorded state.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="warehouse_admin")
    p.add_argument(
        "command",
        choices=[
            "describe", "vacuum", "compact", "history", "snapshots",
            "bloom", "text", "ann", "restore", "autocompact", "clone",
            "tick",
        ],
    )
    p.add_argument("root")
    p.add_argument("table")
    p.add_argument("--keep-snapshots", type=int, default=None)
    p.add_argument("--target-file-rows", type=int, default=1_000_000)
    p.add_argument("--bloom-cols", default=None, help="comma-separated columns")
    p.add_argument("--text-cols", default=None, help="comma-separated columns")
    p.add_argument("--ann-col", default=None, help="vector column to index")
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--n-lists", type=int, default=8)
    p.add_argument(
        "--pq-m", type=int, default=None,
        help="ann: also persist residual-PQ codes with this many "
        "subspaces (probes can then use --pq ADC candidate generation)",
    )
    p.add_argument("--pq-ksub", type=int, default=16)
    p.add_argument("--nearest", default=None, help="query vector: comma-separated floats")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--n-probe", type=int, default=2)
    p.add_argument(
        "--pq", action="store_true",
        help="ann --nearest: probe via the stored PQ codes (ADC "
        "shortlist + exact re-rank) instead of the raw-vector scan",
    )
    p.add_argument("--shortlist", type=int, default=20)
    p.add_argument(
        "--optimize", action="store_true",
        help="ann: rewrite the table co-located by list assignment "
        "(maximizes probe file-skipping; same commit contract as compact)",
    )
    p.add_argument(
        "--contains", default=None,
        help='indexed grep: "col:term1,term2" (AND of whole tokens)',
    )
    p.add_argument("--version", type=int, default=None)
    p.add_argument("--partition-col", default=None)
    p.add_argument("--partition-value", default=None)
    p.add_argument("--min-files", type=int, default=4)
    p.add_argument(
        "--small-file-bytes", type=int, default=64 * 1024 * 1024,
        help="mean-file-size bar below which a partition counts as fragmented",
    )
    p.add_argument(
        "--max-partitions", type=int, default=None,
        help="cap partitions compacted per tick (steady-state cron "
        "shape). tick: absent -> maintenance_tick's default cap of 4; "
        "pass 0 for unbounded. autocompact: absent -> unbounded",
    )
    p.add_argument(
        "--dry-run", action="store_true",
        help="autocompact: print the plan without rewriting anything",
    )
    p.add_argument(
        "--dest", default=None,
        help="clone: destination table name (required)",
    )
    p.add_argument(
        "--expire-older-than-days", type=int, default=None,
        help="tick: partition TTL (omit to skip expiration)",
    )
    p.add_argument(
        "--keep-layers", type=int, default=2,
        help="tick: retained rewrite-era layers to keep (time travel window)",
    )
    args = p.parse_args(argv)

    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    def wh(spark=None):
        if spark is None:
            from kafka_connect_bigquery_spark.session import get_spark

            spark = get_spark("warehouse-admin")
        return Warehouse(spark, args.root)

    if args.command == "describe":
        out = Warehouse(None, args.root).describe_detail(args.table)
    elif args.command == "snapshots":
        out = {"table": args.table, "snapshots": Warehouse(None, args.root).snapshots(args.table)}
    elif args.command == "vacuum":
        removed = Warehouse(None, args.root).vacuum(
            args.table, keep_snapshots=args.keep_snapshots
        )
        out = {"table": args.table, "removed_paths": removed}
    elif args.command == "compact":
        w = wh()
        if args.partition_value is not None:
            if not args.partition_col:
                print("--partition-value requires --partition-col", file=sys.stderr)
                return 2
            grain = {
                "p_hour": "HOUR", "p_date": "DAY",
                "p_month": "MONTH", "p_year": "YEAR",
            }.get(args.partition_col)
            if grain is None:
                print(f"unknown partition column {args.partition_col}", file=sys.stderr)
                return 2
            n = w.compact_partition(
                args.table,
                TableSpec(partition_grain=grain),
                args.partition_value,
                target_file_rows=args.target_file_rows,
            )
            out = {
                "table": args.table,
                "partition": f"{args.partition_col}={args.partition_value}",
                "files_before": n,
                "compacted": n > 0,
            }
        else:
            n = w.compact(
                args.table,
                TableSpec(partition_grain="NONE"),
                target_file_rows=args.target_file_rows,
            )
            out = {"table": args.table, "files_before": n, "compacted": n > 0}
    elif args.command == "tick":
        grain = {
            "p_hour": "HOUR", "p_date": "DAY",
            "p_month": "MONTH", "p_year": "YEAR",
            None: "NONE",
        }.get(args.partition_col, None)
        if grain is None:
            print(f"unknown partition column {args.partition_col}", file=sys.stderr)
            return 2
        # --max-partitions absent -> let maintenance_tick's own
        # steady-state default (4 per tick) apply, keeping cron
        # invocations capped as documented; the argparse default is
        # None, which would otherwise mean UNBOUNDED table-wide work.
        tick_kwargs = {}
        if args.max_partitions is not None:
            tick_kwargs["max_partitions"] = (
                None if args.max_partitions == 0 else args.max_partitions
            )
        out = wh().maintenance_tick(
            args.table,
            TableSpec(partition_grain=grain),
            min_files=args.min_files,
            small_file_bytes=args.small_file_bytes,
            target_file_rows=args.target_file_rows,
            keep_layers=args.keep_layers,
            keep_snapshots=args.keep_snapshots,
            expire_older_than_days=args.expire_older_than_days,
            **tick_kwargs,
        )
    elif args.command == "clone":
        if not args.dest:
            print("clone requires --dest", file=sys.stderr)
            return 2
        # metadata + hardlinks only — no Spark session needed
        res = Warehouse(None, args.root).clone_table(
            args.table, args.dest, version=args.version
        )
        out = {"table": args.table, "dest": args.dest, **res}
    elif args.command == "autocompact":
        if not args.partition_col:
            print("autocompact requires --partition-col", file=sys.stderr)
            return 2
        grain = {
            "p_hour": "HOUR", "p_date": "DAY",
            "p_month": "MONTH", "p_year": "YEAR",
        }.get(args.partition_col)
        if grain is None:
            print(f"unknown partition column {args.partition_col}", file=sys.stderr)
            return 2
        spec = TableSpec(partition_grain=grain)
        kw = dict(min_files=args.min_files, small_file_bytes=args.small_file_bytes)
        if args.dry_run:
            plan = Warehouse(None, args.root).plan_compaction(
                args.table, spec, **kw
            )
            out = {"table": args.table, "dry_run": True, "plan": plan}
        else:
            done = wh().auto_compact(
                args.table, spec,
                target_file_rows=args.target_file_rows,
                max_partitions=args.max_partitions,
                **kw,
            )
            out = {"table": args.table, "compacted": done}
    elif args.command == "restore":
        if args.version is None:
            print("restore requires --version", file=sys.stderr)
            return 2
        new_v = wh().restore(args.table, args.version)
        out = {"table": args.table, "restored_to": args.version, "new_version": new_v}
    elif args.command == "bloom":
        if args.bloom_cols:
            w = wh()
            w.record_bloom(args.table, args.bloom_cols.split(","))
        bw = Warehouse(None, args.root)
        meta = bw.bloom_meta(args.table)
        out = {
            "table": args.table,
            "meta": meta,
            "n_files": len(bw.bloom_indexed_files(args.table)) if meta else 0,
        }
    elif args.command == "text":
        if args.text_cols:
            w = wh()
            w.record_text_index(args.table, args.text_cols.split(","))
        if args.contains:
            col, _, raw = args.contains.partition(":")
            if not raw:
                print('--contains wants "col:term1,term2"', file=sys.stderr)
                return 2
            w = wh()
            hitdf = w.read_containing_all(args.table, col, raw.split(","))
            n = hitdf.count()
            out = {
                "table": args.table,
                "contains": {"col": col, "terms": raw.split(",")},
                "n_rows": n,
                "n_files_opened": len(hitdf.inputFiles()),
            }
        else:
            tw = Warehouse(None, args.root)
            meta = tw.text_meta(args.table)
            out = {
                "table": args.table,
                "meta": meta,
                "n_files": len(tw.text_indexed_files(args.table)) if meta else 0,
            }
    elif args.command == "ann":
        if args.ann_col:
            wh().record_ann(
                args.table, args.ann_col,
                id_col=args.id_col, n_lists=args.n_lists,
                pq_m=args.pq_m, pq_ksub=args.pq_ksub,
            )
        if args.optimize:
            wh().optimize_ann(args.table)
        aw = Warehouse(None, args.root)
        meta = aw.ann_meta(args.table)
        if args.nearest:
            if not meta:
                print("no ANN index recorded; pass --ann-col first", file=sys.stderr)
                return 2
            qv = [float(x) for x in args.nearest.split(",")]
            if args.pq:
                hitdf = wh().read_nearest_pq(
                    args.table, meta["col"], qv,
                    k=args.k, n_probe=args.n_probe, shortlist=args.shortlist,
                )
            else:
                hitdf = wh().read_nearest(
                    args.table, meta["col"], qv, k=args.k, n_probe=args.n_probe
                )
            rows = hitdf.collect()
            out = {
                "table": args.table,
                "k": args.k,
                "n_probe": args.n_probe,
                "pq": bool(args.pq),
                "neighbors": [
                    {"neighbor_id": r["neighbor_id"], "cosine": r["cosine"],
                     "rank": r["rank"]}
                    for r in rows
                ],
                "n_files_opened": len(hitdf.inputFiles()),
            }
        else:
            out = {
                "table": args.table,
                "meta": {
                    k: v for k, v in (meta or {}).items()
                    if k not in ("centroids", "codebooks")
                },
                "n_lists": len((meta or {}).get("centroids", [])),
                "n_files": len(aw.ann_indexed_files(args.table)) if meta else 0,
                "n_files_encoded": (
                    len(aw.ann_encoded_files(args.table)) if meta else 0
                ),
            }
    else:  # history
        w = wh()
        out = {
            "table": args.table,
            "commits": [r.asDict() for r in w.history(args.table).collect()],
        }
    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
