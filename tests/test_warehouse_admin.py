"""Warehouse maintenance CLI (tools/warehouse_admin.py)."""

from __future__ import annotations

import json

from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

SPEC = TableSpec(partition_grain="NONE", key_bucket_count=4)


def _run(capsys, *argv):
    from tools.warehouse_admin import main

    assert main(list(argv)) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_describe_vacuum_snapshots_cli(spark, tmp_path, capsys):
    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    df = spark.createDataFrame(
        [(k, f"v{k}", k, False) for k in range(10)],
        "k: bigint, v: string, i: bigint, __tombstone: boolean",
    )
    wh.merge(df, "t", ["k"], mode="upsert", spec=SPEC)
    wh.merge(df.limit(2), "t", ["k"], mode="upsert", spec=SPEC)

    d = _run(capsys, "describe", root, "t")
    assert d["layout"] == "bucketed" and d["generation"] == 1

    s = _run(capsys, "snapshots", root, "t")
    assert s["snapshots"] == [0, 1]

    v = _run(capsys, "vacuum", root, "t", "--keep-snapshots", "1")
    assert v["removed_paths"] >= 1
    assert _run(capsys, "snapshots", root, "t")["snapshots"] == [1]

    h = _run(capsys, "history", root, "t")
    assert len(h["commits"]) >= 1


def test_bloom_cli_record_and_report(spark, tmp_path, capsys):
    root = str(tmp_path / "whb")
    wh = Warehouse(spark, root)
    df = spark.createDataFrame(
        [(k, f"u{k}") for k in range(30)], "id: bigint, user: string"
    )
    wh.append(df, "t", TableSpec(partition_grain="NONE"))

    empty = _run(capsys, "bloom", root, "t")
    assert empty["meta"] is None and empty["n_files"] == 0

    rec = _run(capsys, "bloom", root, "t", "--bloom-cols", "id,user")
    assert rec["meta"]["cols"] == ["id", "user"]
    assert rec["n_files"] >= 1

    # the recorded filter is live: point lookup via read_pruned_where
    assert wh.read_pruned_where("t", {"id": 7}).count() == 1


def test_history_reports_commit_time(spark, tmp_path, capsys):
    import time

    root = str(tmp_path / "whh")
    wh = Warehouse(spark, root)
    df = spark.createDataFrame(
        [(1, "a", 0, False)], "k: bigint, v: string, i: bigint, __tombstone: boolean"
    )
    t0 = time.time()
    wh.merge(df, "t", ["k"], mode="upsert", spec=SPEC)
    h = _run(capsys, "history", root, "t")
    assert len(h["commits"]) == 1
    assert abs(float(h["commits"][0]["committed_at"]) - t0) < 120


def test_restore_cli(spark, tmp_path, capsys):
    root = str(tmp_path / "whr")
    wh = Warehouse(spark, root)
    df0 = spark.createDataFrame(
        [(1, "a", 0, False)], "k: bigint, v: string, i: bigint, __tombstone: boolean"
    )
    df1 = spark.createDataFrame(
        [(1, "b", 1, False)], "k: bigint, v: string, i: bigint, __tombstone: boolean"
    )
    wh.merge(df0, "t", ["k"], spec=SPEC)
    wh.merge(df1, "t", ["k"], spec=SPEC)
    out = _run(capsys, "restore", root, "t", "--version", "0")
    assert out["restored_to"] == 0 and out["new_version"] == 2
    assert [r["v"] for r in wh.read("t").collect()] == ["a"]


def test_flat_append_evolution_keeps_column_and_values(spark, tmp_path):
    """Probe-found (round 5): on the FLAT append path, a batch carrying
    a new column evolved the write but a plain parquet read sampled one
    old footer and silently dropped the column AND its values. The
    evolved schema now persists in the layout metadata (additive union,
    like the bucketed manifest commit) and read() passes it explicitly,
    so footer-missing columns surface as NULLs and present values are
    read properly."""
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    spec = TableSpec(partition_grain="NONE")
    wh.append(spark.createDataFrame([(1, "a")], "k: bigint, v: string"), "t", spec)
    wh.append(
        spark.createDataFrame([(2, "b", 9)], "k: bigint, v: string, w: bigint"),
        "t",
        spec,
    )
    df = wh.read("t")
    assert df.columns == ["k", "v", "w"]
    assert sorted((r["k"], r["v"], r["w"]) for r in df.collect()) == [
        (1, "a", None),
        (2, "b", 9),
    ]
    # a later narrow append must not regress the stored schema
    wh.append(spark.createDataFrame([(3, "c")], "k: bigint, v: string"), "t", spec)
    assert wh.read("t").columns == ["k", "v", "w"]
    # overwrite is a full re-statement: schema REPLACED, not unioned
    wh.overwrite(spark.createDataFrame([(4, "d")], "k: bigint, v: string"), "t", spec)
    assert wh.read("t").columns == ["k", "v"]
    # compaction carries the stored schema through (flat branch)
    wh.append(
        spark.createDataFrame([(5, "e", 50)], "k: bigint, v: string, w: bigint"),
        "t",
        spec,
    )
    wh.compact("t", spec, target_file_rows=4, min_files=1)
    assert sorted((r["k"], r["w"]) for r in wh.read("t").collect()) == [
        (4, None),
        (5, 50),
    ]


def test_text_index_cli(spark, tmp_path, capsys):
    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "k: bigint, body: string"
    )
    wh.append(df, "t", TableSpec(partition_grain="NONE"))
    out = _run(capsys, "text", root, "t", "--text-cols", "body")
    assert out["meta"] == {"cols": ["body"]} and out["n_files"] >= 1
    # report-only form
    out = _run(capsys, "text", root, "t")
    assert out["meta"] == {"cols": ["body"]}


def test_partition_compact_cli(spark, tmp_path, capsys):
    import datetime

    root = str(tmp_path / "whp")
    wh = Warehouse(spark, root)
    spec = TableSpec(partition_grain="DAY", timestamp_field="ts")
    for k in range(3):
        df = spark.createDataFrame(
            [(k * 10 + j, datetime.datetime(2024, 1, 1, 12, 0), float(j)) for j in range(5)],
            ["id", "ts", "v"],
        )
        wh.append(df, "t", spec)
    before = {r["id"] for r in wh.read("t").collect()}
    out = _run(
        capsys, "compact", root, "t",
        "--partition-col", "p_date", "--partition-value", "2024-01-01",
    )
    assert out["compacted"] and out["partition"] == "p_date=2024-01-01"
    assert {r["id"] for r in wh.read("t").collect()} == before


def test_text_contains_cli(spark, tmp_path, capsys):
    root = str(tmp_path / "whg")
    wh = Warehouse(spark, root)
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha"), (3, "beta")], "k: bigint, body: string"
    )
    wh.append(df, "t", TableSpec(partition_grain="NONE"))
    wh.record_text_index("t", ["body"])
    out = _run(capsys, "text", root, "t", "--contains", "body:alpha,beta")
    assert out["n_rows"] == 1
    assert out["contains"]["terms"] == ["alpha", "beta"]


def test_autocompact_cli_dry_run_then_execute(spark, tmp_path, capsys):
    import datetime

    root = str(tmp_path / "whac")
    wh = Warehouse(spark, root)
    spec = TableSpec(partition_grain="DAY", timestamp_field="ts")
    for k in range(3):
        for day in (1, 2):
            df = spark.createDataFrame(
                [
                    (k * 10 + j, datetime.datetime(2024, 1, day, 12, 0), float(j))
                    for j in range(5)
                ],
                ["id", "ts", "v"],
            )
            wh.append(df, "t", spec)
    before = {(r["id"], r["p_date"]) for r in wh.read("t").collect()}

    plan = _run(
        capsys, "autocompact", root, "t",
        "--partition-col", "p_date", "--min-files", "2", "--dry-run",
    )
    assert plan["dry_run"] and [e["value"] for e in plan["plan"]] == [
        "2024-01-01", "2024-01-02",
    ]

    out = _run(
        capsys, "autocompact", root, "t",
        "--partition-col", "p_date", "--min-files", "2", "--max-partitions", "1",
    )
    assert [e["value"] for e in out["compacted"]] == ["2024-01-01"]
    assert out["compacted"][0]["files_rewritten"] >= 2
    out2 = _run(
        capsys, "autocompact", root, "t", "--partition-col", "p_date",
        "--min-files", "2",
    )
    assert [e["value"] for e in out2["compacted"]] == ["2024-01-02"]
    assert {(r["id"], r["p_date"]) for r in wh.read("t").collect()} == before


def test_clone_cli_is_sparkless(spark, tmp_path, capsys):
    import datetime

    root = str(tmp_path / "whc")
    wh = Warehouse(spark, root)
    spec = TableSpec(partition_grain="DAY", timestamp_field="ts")
    df = spark.createDataFrame(
        [(j, datetime.datetime(2024, 1, 1, 12, 0), float(j)) for j in range(8)],
        ["id", "ts", "v"],
    )
    wh.append(df, "t", spec)
    out = _run(capsys, "clone", root, "t", "--dest", "t_dev")
    assert out["dest"] == "t_dev" and out["n_files"] > 0
    assert out["n_hardlinked"] == out["n_files"]
    assert {r["id"] for r in wh.read("t_dev").collect()} == set(range(8))


def test_maintenance_tick_cli_composes_upkeep(spark, tmp_path, capsys):
    import datetime

    root = str(tmp_path / "whtick")
    wh = Warehouse(spark, root)
    spec = TableSpec(partition_grain="DAY", timestamp_field="ts")
    for k in range(3):
        df = spark.createDataFrame(
            [
                (k * 10 + j, datetime.datetime(2024, 1, 1, 12, 0), float(j))
                for j in range(5)
            ],
            ["id", "ts", "v"],
        )
        wh.append(df, "t", spec)
    before = {(r["id"], r["p_date"]) for r in wh.read("t").collect()}
    out = _run(
        capsys, "tick", root, "t", "--partition-col", "p_date",
        "--min-files", "2", "--keep-layers", "1",
    )
    assert [e["value"] for e in out["compacted"]] == ["2024-01-01"]
    assert out["retained_layers_removed"] >= 0
    assert "vacuumed_paths" in out
    assert {(r["id"], r["p_date"]) for r in wh.read("t").collect()} == before
    # steady state: the next tick has nothing to compact
    out2 = _run(
        capsys, "tick", root, "t", "--partition-col", "p_date",
        "--min-files", "2",
    )
    assert out2["compacted"] == []


def test_tick_cli_without_max_partitions_stays_capped(spark, tmp_path, capsys):
    """A cron `tick` with no --max-partitions must inherit
    maintenance_tick's steady-state cap (4/tick), NOT argparse's None
    (unbounded table-wide compaction); --max-partitions 0 opts into
    unbounded explicitly."""
    import datetime

    root = str(tmp_path / "whcap")
    wh = Warehouse(spark, root)
    spec = TableSpec(partition_grain="DAY", timestamp_field="ts")
    # 6 fragmented day partitions, 3 small files each
    for k in range(3):
        df = spark.createDataFrame(
            [
                (k * 100 + d, datetime.datetime(2024, 1, 1 + d, 12, 0), 1.0)
                for d in range(6)
            ],
            ["id", "ts", "v"],
        )
        wh.append(df, "t", spec)
    out = _run(
        capsys, "tick", root, "t", "--partition-col", "p_date",
        "--min-files", "2",
    )
    assert len(out["compacted"]) == 4  # the documented per-tick cap
    out2 = _run(
        capsys, "tick", root, "t", "--partition-col", "p_date",
        "--min-files", "2", "--max-partitions", "0",
    )
    assert len(out2["compacted"]) == 2  # 0 -> unbounded: the rest


def test_ann_cli_record_and_probe(spark, tmp_path, capsys):
    root = str(tmp_path / "whann")
    wh = Warehouse(spark, root)
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(64)
    )
    wh.append(emb, "vecs", TableSpec(partition_grain="NONE"))
    out = _run(capsys, "ann", root, "vecs", "--ann-col", "embedding")
    assert out["meta"]["col"] == "embedding"
    assert out["n_lists"] == 8
    assert out["n_files"] >= 1
    qv = ",".join(str(float(x)) for x in emb.first()["embedding"])
    out2 = _run(
        capsys, "ann", root, "vecs", f"--nearest={qv}", "--k", "3",
        "--n-probe", "2",
    )
    assert len(out2["neighbors"]) == 3
    assert out2["neighbors"][0]["rank"] == 1
    assert abs(out2["neighbors"][0]["cosine"] - 1.0) < 1e-9  # self first
    # --optimize rewrites co-located by list; probe results unchanged
    out3 = _run(capsys, "ann", root, "vecs", "--optimize")
    assert out3["n_files"] >= 1
    out4 = _run(
        capsys, "ann", root, "vecs", f"--nearest={qv}", "--k", "3",
        "--n-probe", "2",
    )
    assert [n["neighbor_id"] for n in out4["neighbors"]] == [
        n["neighbor_id"] for n in out2["neighbors"]
    ]


def test_ann_cli_pq_record_and_probe(spark, tmp_path, capsys):
    root = str(tmp_path / "whpq")
    wh = Warehouse(spark, root)
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(64)
    )
    wh.append(emb, "vecs", TableSpec(partition_grain="NONE"))
    out = _run(
        capsys, "ann", root, "vecs", "--ann-col", "embedding",
        "--pq-m", "8", "--pq-ksub", "16",
    )
    assert out["meta"]["pq_m"] == 8
    assert "codebooks" not in out["meta"]  # report stays compact
    assert out["n_files_encoded"] >= 1
    qv = ",".join(str(float(x)) for x in emb.first()["embedding"])
    pq = _run(
        capsys, "ann", root, "vecs", f"--nearest={qv}", "--k", "3",
        "--n-probe", "2", "--pq", "--shortlist", "10",
    )
    assert pq["pq"] is True
    assert len(pq["neighbors"]) == 3
    assert abs(pq["neighbors"][0]["cosine"] - 1.0) < 1e-9  # self first
    # the exact IVF probe agrees on the re-ranked ids
    ivf = _run(
        capsys, "ann", root, "vecs", f"--nearest={qv}", "--k", "3",
        "--n-probe", "2",
    )
    assert pq["neighbors"][0]["neighbor_id"] == ivf["neighbors"][0]["neighbor_id"]
