"""Flat-table op-log scaling contract (r06 verdict ask 4): commits are
one small per-version file under ``_oplog/``, append commits are
O(|written files|) DELTAS (never an O(table) state snapshot or dir
listing), periodic checkpoints are RECONSTRUCTED from the log, and
version reads resolve through the checkpoint+delta chain — including
across a legacy single-file ``_oplog.jsonl`` prefix."""

from __future__ import annotations

import json
import os

from kafka_connect_bigquery_spark.sinks.warehouse import (
    TableSpec,
    Warehouse,
    WarehouseError,
)

SPEC = TableSpec(partition_grain="NONE")


def _df(spark, lo, hi):
    return spark.createDataFrame([(i, f"v{i}") for i in range(lo, hi)], "k: bigint, v: string")


def _recs(wh, table):
    d = wh._oplog_dir(table)
    out = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out.append((name, json.load(f)))
    return out


def test_append_commits_are_deltas_with_periodic_checkpoints(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    for i in range(6):
        wh.append(_df(spark, 10 * i, 10 * i + 10), "t", SPEC)
    recs = _recs(wh, "t")
    assert [n for n, _ in recs] == [f"{v:08d}.json" for v in range(6)]
    # v0 is a checkpoint (version % N == 0); v1..v5 are pure deltas
    assert "state" in recs[0][1] and "delta" not in recs[0][1]
    for _, r in recs[1:]:
        assert "delta" in r and "state" not in r
        assert r["delta"]["add"] and not r["delta"]["remove"]
        # a delta never carries the table's file list
        assert "files" not in r["delta"]
    # every version reconstructs; file sets grow strictly and the final
    # reconstruction equals checkpoint files plus every delta's adds
    sizes = [len(wh._flat_state_at("t", v)["files"]) for v in range(6)]
    assert sizes == sorted(sizes) and sizes[0] < sizes[-1]
    expected = set(recs[0][1]["state"]["files"])
    for _, r in recs[1:]:
        expected |= set(r["delta"]["add"])
    assert set(wh._flat_state_at("t", 5)["files"]) == expected
    # version reads return exactly the rows present then
    assert wh.read("t", version=0).count() == 10
    assert wh.read("t", version=3).count() == 40
    assert wh.read("t", version=5).count() == 60


def test_checkpoint_every_n_is_reconstructed_not_listed(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    n = Warehouse._OPLOG_CHECKPOINT_EVERY
    for i in range(n + 2):
        wh.append(_df(spark, 10 * i, 10 * i + 2), "t", SPEC)
    recs = _recs(wh, "t")
    assert "state" in recs[0][1]
    assert "state" in recs[n][1], "periodic checkpoint missing"
    # the checkpoint's file set equals the reconstruction at n-1 plus
    # its own adds — i.e. it is consistent with the delta chain
    chain = set(recs[0][1]["state"]["files"])
    for _, r in recs[1:n]:
        chain |= set(r["delta"]["add"])
    # the record BEFORE the checkpoint knows nothing of checkpoint adds
    assert chain <= set(recs[n][1]["state"]["files"])
    assert wh.read("t", version=n + 1).count() == (n + 2) * 2


def test_overwrite_and_compact_are_checkpoints_and_history_is_clean(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.append(_df(spark, 0, 10), "t", SPEC)
    wh.append(_df(spark, 10, 20), "t", SPEC)
    wh.overwrite(_df(spark, 0, 5), "t", SPEC)
    wh.append(_df(spark, 5, 8), "t", SPEC)
    wh.compact("t", SPEC, min_files=1)
    recs = _recs(wh, "t")
    ops = [r["op"] for _, r in recs]
    assert ops == ["append", "append", "overwrite", "append", "compact"]
    assert "state" in recs[2][1] and "state" in recs[4][1]
    # history(): detail JSON carries neither the manifest nor the delta
    for row in wh.history("t").collect():
        detail = json.loads(row["detail"])
        assert "state" not in detail and "delta" not in detail
    # all five versions reconstruct across the two dir swaps
    assert [wh.read("t", version=v).count() for v in range(5)] == [10, 20, 5, 8, 8]


def test_delete_where_commits_metadata_only_delta(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.append(_df(spark, 0, 10), "t", SPEC)
    wh.delete_where("t", "k >= 7")
    recs = _recs(wh, "t")
    r = recs[1][1]
    assert r["op"] == "delete_where"
    assert r["delta"]["add"] == [] and r["delta"]["remove"] == []
    assert r["delta"]["deletes"], "pending delete must ride the record"
    assert wh.read("t").count() == 7
    assert wh.read("t", version=0).count() == 10
    assert wh.read("t", version=1).count() == 7


def test_legacy_jsonl_prefix_still_resolves(spark, tmp_path):
    """Tables written by the pre-r07 engine carry a single-file jsonl
    log of full-state records; new commits continue the version line in
    the per-commit dir, and every version on either side reads."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.append(_df(spark, 0, 10), "t", SPEC)
    wh.append(_df(spark, 10, 20), "t", SPEC)
    # demote the dir records to a legacy jsonl, as an old engine wrote
    recs = [r for _, r in _recs(wh, "t")]
    import shutil

    shutil.rmtree(wh._oplog_dir("t"))
    with open(wh._oplog_path("t"), "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    wh.append(_df(spark, 20, 30), "t", SPEC)
    new = _recs(wh, "t")
    assert [n for n, _ in new] == ["00000002.json"]
    assert [wh.read("t", version=v).count() for v in range(3)] == [10, 20, 30]
    assert wh.history("t").count() == 3


def test_stray_tmp_record_is_invisible_to_readers(spark, tmp_path):
    """A crash mid-write leaves only a ``NNNNNNNN.json.tmp.<pid>``
    staging orphan (the record publishes via tmp + os.replace); readers
    and the version counter must ignore it, and the version line must
    continue cleanly past it."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.append(_df(spark, 0, 10), "t", SPEC)
    # simulate a crashed writer: truncated staging file for v1
    orphan = os.path.join(wh._oplog_dir("t"), "00000001.json.tmp.99999")
    with open(orphan, "w") as f:
        f.write('{"op": "append", "delta": {"add"')  # truncated JSON
    assert wh._oplog_len("t") == 1
    wh.history("t").collect()  # must not raise
    wh.append(_df(spark, 10, 20), "t", SPEC)
    assert [n for n, _ in _recs(wh, "t")] == ["00000000.json", "00000001.json"]
    assert wh.read("t", version=1).count() == 20


def test_periodic_checkpoint_reconciles_against_listing(spark, tmp_path):
    """Self-heal at checkpoint commits: a live data file no log record
    references (crashed earlier append: files moved in, record never
    committed) is ADOPTED by the next periodic checkpoint, and the
    repair is recorded loudly in the commit record."""
    import shutil

    wh = Warehouse(spark, str(tmp_path / "wh"))
    n = Warehouse._OPLOG_CHECKPOINT_EVERY
    for i in range(n - 1):  # versions 0..n-2; next commit is version n-1
        wh.append(_df(spark, 10 * i, 10 * i + 2), "t", SPEC)
    # orphan: copy a live part file to a name no record references
    tdir = wh.path("t")
    part = next(
        p for p in os.listdir(tdir)
        if p.endswith(".parquet") and not p.startswith(("_", "."))
    )
    shutil.copy(os.path.join(tdir, part), os.path.join(tdir, "part-orphan.parquet"))
    wh.append(_df(spark, 900, 902), "t", SPEC)   # version n-1: plain delta
    assert "delta" in _recs(wh, "t")[-1][1]      # orphan still unknown
    wh.append(_df(spark, 910, 912), "t", SPEC)   # version n: checkpoint
    name, rec = _recs(wh, "t")[-1]
    assert "state" in rec
    assert rec["reconciled"]["orphans_adopted"] == ["part-orphan.parquet"]
    assert "part-orphan.parquet" in rec["state"]["files"]
    # log-derived latest now equals the directory-listing read
    assert wh.read("t", version=wh._oplog_len("t") - 1).count() == wh.read("t").count()


def test_overwrite_crash_before_swap_preserves_history(spark, tmp_path):
    """The op-log dir is COPIED into the incoming dir, so a crash in
    the window before the swap leaves the original table — history
    included — intact (pre-r08, the move stranded it in scratch)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.append(_df(spark, 0, 10), "t", SPEC)
    wh.append(_df(spark, 10, 20), "t", SPEC)

    # crash injection: fail inside _swap_dir_retaining before any rename
    def boom(table, tmp):
        raise RuntimeError("injected crash before swap")

    orig = wh._swap_dir_retaining
    wh._swap_dir_retaining = boom
    try:
        wh.overwrite(_df(spark, 0, 5), "t", SPEC)
    except RuntimeError:
        pass
    finally:
        wh._swap_dir_retaining = orig
    # original table fully intact: data, history, every version
    assert wh.read("t").count() == 20
    assert wh.history("t").count() == 2
    assert [wh.read("t", version=v).count() for v in range(2)] == [10, 20]
    # and the table still accepts new commits on the same version line
    wh.append(_df(spark, 20, 30), "t", SPEC)
    assert wh.read("t", version=2).count() == 30


# ---------------------------------------------------------------------------
# read_appended: the incremental-consumer feed over the append log (r08)
# ---------------------------------------------------------------------------


def _ids(df):
    return {r["k"] for r in df.collect()}


def test_read_appended_returns_only_span_rows(spark, tmp_path):
    import pytest

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.append(_df(spark, 0, 5), "t", SPEC)      # v0
    wh.append(_df(spark, 5, 9), "t", SPEC)      # v1
    wh.append(_df(spark, 9, 12), "t", SPEC)     # v2
    assert _ids(wh.read_appended("t", 0)) == set(range(5, 12))
    assert _ids(wh.read_appended("t", 0, 1)) == set(range(5, 9))
    assert _ids(wh.read_appended("t", 2, 2)) == set()  # empty span
    with pytest.raises(WarehouseError, match="bad version span"):
        wh.read_appended("t", 2, 99)


def test_read_appended_sees_through_compaction(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.append(_df(spark, 0, 5), "t", SPEC)      # v0
    wh.append(_df(spark, 5, 9), "t", SPEC)      # v1
    wh.compact("t", SPEC, target_file_rows=10_000, min_files=2)  # v2
    wh.append(_df(spark, 9, 12), "t", SPEC)     # v3
    # the v1 append's files were parked by the compact; the feed must
    # still read them (retained-layer resolution), and the compact
    # itself contributes nothing
    assert _ids(wh.read_appended("t", 0)) == set(range(5, 12))


def test_read_appended_recovers_checkpoint_upgraded_appends(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh._OPLOG_CHECKPOINT_EVERY = 3  # force an upgraded append quickly
    for i in range(5):  # v0..v4; v3 lands as a checkpoint record
        wh.append(_df(spark, i * 10, i * 10 + 2), "t", SPEC)
    recs = wh._read_oplog("t")
    assert "state" in recs[3] and "delta" not in recs[3]
    assert _ids(wh.read_appended("t", 2)) == {30, 31, 40, 41}


def test_read_appended_strict_on_mutating_ops(spark, tmp_path):
    import pytest

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.append(_df(spark, 0, 5), "t", SPEC)      # v0
    wh.delete_where("t", "k = 1")               # v1
    wh.append(_df(spark, 5, 8), "t", SPEC)      # v2
    with pytest.raises(WarehouseError, match="delete_where"):
        wh.read_appended("t", 0)
    # non-strict: just the appends, as inserted (insert images — the
    # deleted k=1 is NOT in the span's appends anyway)
    assert _ids(wh.read_appended("t", 0, strict=False)) == {5, 6, 7}
    # spans that avoid the mutation stay strict-clean
    assert _ids(wh.read_appended("t", 1, 2)) == {5, 6, 7}


def test_read_appended_refuses_bucketed(spark, tmp_path):
    import pytest

    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(1, 1.0, 0, False)], ["id", "v", "i", "__tombstone"]
    )
    wh.merge(
        df, "bt", ["id"], mode="upsert_delete",
        spec=TableSpec(partition_grain="NONE", key_bucket_count=2),
    )
    with pytest.raises(WarehouseError, match="no op log|flat"):
        wh.read_appended("bt", 0)
