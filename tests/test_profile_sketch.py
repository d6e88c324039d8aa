"""Table profiling (operators/profile.py) and the count-min sketch
(operators/sketch.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.operators import profile as P
from kafka_connect_bigquery_spark.operators import sketch as SK


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "aa", 1.5),
            (2, None, 2.5),
            (2, "bbbb", None),
            (None, "aa", 4.0),
        ],
        "k: bigint, s: string, v: double",
    )


def test_profile_per_column_stats(spark):
    rows = {r["col_name"]: r for r in P.profile(_df(spark)).collect()}
    assert set(rows) == {"k", "s", "v"}
    k = rows["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (4, 1, 2)
    assert (k["min_num"], k["max_num"]) == (1.0, 2.0)
    assert k["min_str"] is None and k["avg_len"] is None
    s = rows["s"]
    assert (s["n_nulls"], s["n_distinct"]) == (1, 2)
    assert (s["min_str"], s["max_str"]) == ("aa", "bbbb")
    assert s["avg_len"] == (2 + 4 + 2) / 3
    v = rows["v"]
    assert (v["min_num"], v["max_num"]) == (1.5, 4.0)


def test_profile_column_subset_and_approx(spark):
    out = P.profile(_df(spark), ["k"], exact_distinct=False).collect()
    assert len(out) == 1 and out[0]["col_name"] == "k"
    assert out[0]["n_distinct"] >= 1  # HLL++ estimate, not asserted exact


def test_cms_never_underestimates(spark):
    df = spark.createDataFrame(
        [(i % 7,) for i in range(200)] + [(None,)], "u: bigint"
    )
    sk = SK.count_min_build(df, "u", depth=3, width=16)
    est = {
        r["u"]: r["cm_estimate"]
        for r in SK.count_min_estimate(sk, df, "u", depth=3, width=16).collect()
    }
    exact = {
        r["u"]: r["n"]
        for r in df.filter(F.col("u").isNotNull())
        .groupBy("u").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(est) == set(exact)  # NULL key skipped
    for u, n in exact.items():
        assert est[u] >= n
    # sketch is bounded: at most depth*width cells
    assert sk.count() <= 3 * 16


def test_cms_merge_equals_single_build(spark):
    a = spark.createDataFrame([(i % 5,) for i in range(50)], "u: bigint")
    b = spark.createDataFrame([(i % 3,) for i in range(30)], "u: bigint")
    merged = SK.count_min_merge(
        SK.count_min_build(a, "u", depth=2, width=8),
        SK.count_min_build(b, "u", depth=2, width=8),
    )
    whole = SK.count_min_build(a.unionByName(b), "u", depth=2, width=8)
    as_map = lambda df: {(r["d"], r["slot"]): r["cnt"] for r in df.collect()}
    assert as_map(merged) == as_map(whole)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def test_hll_registers_bounded_and_deterministic(spark):
    df = spark.createDataFrame([(i,) for i in range(300)] + [(None,)], "v: bigint")
    reg = SK.hll_build(df, "v")
    rows = reg.collect()
    assert len(rows) <= 1 << SK.HLL_P
    for r in rows:
        assert 0 <= r["register"] < (1 << SK.HLL_P)
        assert 1 <= r["rho"] <= 32 - SK.HLL_P + 1
    # build is deterministic: a second pass produces identical registers
    again = {(r["register"], r["rho"]) for r in SK.hll_build(df, "v").collect()}
    assert {(r["register"], r["rho"]) for r in rows} == again


def test_hll_merge_equals_global_build(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(500)], "v: bigint, g: string"
    )
    grouped = SK.hll_build_grouped(df, "v", ["g"])
    merged = SK.hll_merge(grouped.select("register", "rho"))
    direct = SK.hll_build(df, "v")
    as_map = lambda d: {r["register"]: r["rho"] for r in d.collect()}
    assert as_map(merged) == as_map(direct)


def test_hll_estimate_reasonable_and_integer(spark):
    n = 2000
    df = spark.createDataFrame([(i,) for i in range(n)], "v: bigint")
    est = SK.hll_estimate(SK.hll_build(df, "v")).collect()[0]
    assert est["m"] == 1 << SK.HLL_P
    assert isinstance(est["hll_estimate"], int)
    # raw estimate within the ~3-sigma band for m=256 (sigma ~6.5%)
    assert abs(est["hll_estimate"] - n) <= 0.25 * n


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([(i % 10,) for i in range(100)], "v: bigint")
    est = SK.kmv_estimate(SK.kmv_build(df, "v", k=64), k=64).collect()[0]
    assert est["n_kept"] == 10
    assert est["kmv_estimate"] == 10  # sketch saw every distinct value


def test_kmv_merge_is_lossless(spark):
    a = spark.createDataFrame([(i,) for i in range(0, 400, 2)], "v: bigint")
    b = spark.createDataFrame([(i,) for i in range(1, 400, 2)], "v: bigint")
    merged = SK.kmv_merge(SK.kmv_build(a, "v"), SK.kmv_build(b, "v"))
    direct = SK.kmv_build(a.unionByName(b), "v")
    assert sorted(r["hv"] for r in merged.collect()) == sorted(
        r["hv"] for r in direct.collect()
    )


def test_kmv_estimate_reasonable(spark):
    n = 3000
    df = spark.createDataFrame([(i,) for i in range(n)], "v: bigint")
    est = SK.kmv_estimate(SK.kmv_build(df, "v")).collect()[0]
    assert est["n_kept"] == SK.KMV_K
    # k=64 -> sigma ~12.5%; allow 3 sigma
    assert abs(est["kmv_estimate"] - n) <= 0.4 * n


def test_hll_estimate_grouped_matches_per_group_single(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(600)], "v: bigint, g: string"
    )
    grouped = SK.hll_build_grouped(df, "v", ["g"])
    per = {
        r["g"]: (r["n_nonzero"], r["s_scaled"], r["hll_estimate"])
        for r in SK.hll_estimate_grouped(grouped, ["g"]).collect()
    }
    for g in ("g0", "g1", "g2"):
        single = SK.hll_estimate(
            SK.hll_build(df.filter(F.col("g") == g), "v")
        ).collect()[0]
        assert per[g] == (
            single["n_nonzero"], single["s_scaled"], single["hll_estimate"]
        )


# ---------------------------------------------------------------------------
# HLL incremental maintenance (hll_maintain_grouped)
# ---------------------------------------------------------------------------


def _reg_map(df):
    return {(r["g"], r["register"]): r["rho"] for r in df.collect()}


def _cdc(spark, rows):
    """rows: (g, v, _change_type)"""
    return spark.createDataFrame(rows, "g: string, v: bigint, _change_type: string")


def test_hll_maintain_insert_only_never_touches_current(spark):
    """Insert/update CDC rides the cheap merge path: maintained equals a
    direct rebuild, and `current` is NEVER scanned — proven by handing
    the operator a poisoned current that would corrupt the sketch if the
    rebuild path ran."""
    base = spark.createDataFrame(
        [(("a" if i % 2 else "b"), i) for i in range(200)], "g: string, v: bigint"
    )
    stored = SK.hll_build_grouped(base, "v", ["g"])
    cdc = _cdc(
        spark,
        [("a", v, "insert") for v in range(200, 260)]
        # an update that keeps the sketched tuple: pre == post
        + [("b", 8, "update_preimage"), ("b", 8, "update_postimage")],
    )
    poisoned = spark.createDataFrame([("a", 10**9), ("b", 10**9)], "g: string, v: bigint")
    maintained = SK.hll_maintain_grouped(stored, cdc, "v", ["g"], poisoned)
    final = base.unionByName(
        spark.createDataFrame([("a", v) for v in range(200, 260)], "g: string, v: bigint")
    )
    assert _reg_map(maintained) == _reg_map(SK.hll_build_grouped(final, "v", ["g"]))


def test_hll_maintain_delete_rebuilds_only_lost_group(spark):
    base = spark.createDataFrame(
        [(("a" if i % 2 else "b"), i) for i in range(200)], "g: string, v: bigint"
    )
    stored = SK.hll_build_grouped(base, "v", ["g"])
    # delete two values from group a; group b untouched
    cdc = _cdc(spark, [("a", 1, "delete"), ("a", 3, "delete")])
    final = base.filter(~((F.col("g") == "a") & F.col("v").isin(1, 3)))
    maintained = SK.hll_maintain_grouped(stored, cdc, "v", ["g"], final)
    assert _reg_map(maintained) == _reg_map(SK.hll_build_grouped(final, "v", ["g"]))


def test_hll_maintain_update_moving_group_rebuilds_source_group(spark):
    """An update that MOVES the sketched tuple across groups: the losing
    group rebuilds, the gaining group cheap-merges."""
    base = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 10)], "g: string, v: bigint"
    )
    stored = SK.hll_build_grouped(base, "v", ["g"])
    cdc = _cdc(spark, [("a", 2, "update_preimage"), ("b", 2, "update_postimage")])
    final = spark.createDataFrame(
        [("a", 1), ("b", 10), ("b", 2)], "g: string, v: bigint"
    )
    maintained = SK.hll_maintain_grouped(stored, cdc, "v", ["g"], final)
    assert _reg_map(maintained) == _reg_map(SK.hll_build_grouped(final, "v", ["g"]))


def test_hll_maintain_group_fully_deleted_disappears(spark):
    base = spark.createDataFrame([("a", 1), ("b", 2)], "g: string, v: bigint")
    stored = SK.hll_build_grouped(base, "v", ["g"])
    cdc = _cdc(spark, [("a", 1, "delete")])
    final = base.filter(F.col("g") != "a")
    maintained = SK.hll_maintain_grouped(stored, cdc, "v", ["g"], final)
    got = _reg_map(maintained)
    assert got == _reg_map(SK.hll_build_grouped(final, "v", ["g"]))
    assert not any(g == "a" for g, _ in got)


# ---------------------------------------------------------------------------
# KMV incremental maintenance (kmv_maintain_grouped)
# ---------------------------------------------------------------------------


def _kmv_map(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["g"], set()).add(r["hv"])
    return out


def test_kmv_maintain_insert_only_never_touches_current(spark):
    base = spark.createDataFrame(
        [(("a" if i % 2 else "b"), i) for i in range(200)], "g: string, v: bigint"
    )
    stored = SK.kmv_build_grouped(base, "v", ["g"])
    cdc = _cdc(
        spark,
        [("a", v, "insert") for v in range(200, 260)]
        + [("b", 8, "update_preimage"), ("b", 8, "update_postimage")],
    )
    poisoned = spark.createDataFrame([("a", 10**9), ("b", 10**9)], "g: string, v: bigint")
    maintained = SK.kmv_maintain_grouped(stored, cdc, "v", ["g"], poisoned)
    final = base.unionByName(
        spark.createDataFrame([("a", v) for v in range(200, 260)], "g: string, v: bigint")
    )
    assert _kmv_map(maintained) == _kmv_map(SK.kmv_build_grouped(final, "v", ["g"]))


def test_kmv_maintain_delete_rebuilds_lost_group(spark):
    base = spark.createDataFrame(
        [(("a" if i % 2 else "b"), i) for i in range(200)], "g: string, v: bigint"
    )
    stored = SK.kmv_build_grouped(base, "v", ["g"])
    cdc = _cdc(spark, [("a", 1, "delete"), ("a", 3, "delete")])
    final = base.filter(~((F.col("g") == "a") & F.col("v").isin(1, 3)))
    maintained = SK.kmv_maintain_grouped(stored, cdc, "v", ["g"], final)
    assert _kmv_map(maintained) == _kmv_map(SK.kmv_build_grouped(final, "v", ["g"]))


def test_kmv_grouped_estimates_match_single_group_build(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(600)], "v: bigint, g: string"
    )
    grouped = SK.kmv_build_grouped(df, "v", ["g"])
    per = {
        r["g"]: (r["n_kept"], r["kth_hash"], r["kmv_estimate"])
        for r in SK.kmv_estimate_grouped(grouped, ["g"]).collect()
    }
    for g in ("g0", "g1", "g2"):
        single = SK.kmv_estimate(
            SK.kmv_build(df.filter(F.col("g") == g), "v")
        ).collect()[0]
        assert per[g] == (
            single["n_kept"], single["kth_hash"], single["kmv_estimate"]
        )


def test_sketch_maintainer_tracks_cdc_and_catches_up(spark, tmp_path):
    """SketchMaintainer (r08): the streaming-attachable twin of
    RollupMaintainer — durable cursor, CDC-span refresh through
    hll/kmv_maintain_grouped, full-rebuild fallback, maintained state
    always equal to a direct rebuild."""
    from pyspark.sql import functions as F

    from kafka_connect_bigquery_spark.operators import sketch as SK
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"), snapshot_retention=8)
    spec = TableSpec(partition_grain="NONE", key_bucket_count=4)

    def merge(rows):
        df = spark.createDataFrame(
            rows, "k: bigint, g: string, v: bigint, i: bigint, __tombstone: boolean"
        )
        wh.merge(df, "src", ["k"], mode="upsert_delete", spec=spec)

    def direct(kind):
        src = wh.read("src")
        build = SK.hll_build_grouped if kind == "hll" else SK.kmv_build_grouped
        return {tuple(r) for r in build(src, "v", ["g"]).collect()}

    merge([(i, f"g{i % 3}", i, 0, False) for i in range(30)])
    live = SK.SketchMaintainer(wh, "src", "src_hll", "v", ["g"], kind="hll")
    lag = SK.SketchMaintainer(wh, "src", "src_kmv", "v", ["g"], kind="kmv")
    assert live.refresh() >= 1  # first refresh = rebuild
    assert {tuple(r) for r in wh.read("src_hll").collect()} == direct("hll")
    assert live.refresh() == 0  # current: no-op

    # two merges, the live maintainer refreshing after each; the lagging
    # one never ran and must catch up across both in one refresh
    merge([(0, "g1", 500, 1, False), (1, None, None, 1, True)])
    assert live.refresh() == 1
    assert {tuple(r) for r in wh.read("src_hll").collect()} == direct("hll")
    merge([(40, "g0", 600, 2, False), (2, "g2", 601, 2, False)])
    assert live.refresh() == 1
    assert {tuple(r) for r in wh.read("src_hll").collect()} == direct("hll")
    assert lag.refresh() >= 1
    assert {tuple(r) for r in wh.read("src_kmv").collect()} == direct("kmv")

    # attachable to the streaming pipeline hook: same refresh protocol
    assert hasattr(live, "refresh") and live.CURSOR_KEY == "sketch_applied_version"


# ---------------------------------------------------------------------------
# Count-min grouped build + linear CDC maintenance (r08)
# ---------------------------------------------------------------------------


def _cm_map(df):
    return {(r["g"], r["d"], r["slot"]): r["cnt"] for r in df.collect()}


def test_cm_grouped_matches_per_group_single_build(spark):
    df = spark.createDataFrame(
        [(i % 7, "g%d" % (i % 3)) for i in range(300)], "v: bigint, g: string"
    )
    grouped = SK.count_min_build_grouped(df, "v", ["g"])
    for g in ("g0", "g1", "g2"):
        single = {
            (r["d"], r["slot"]): r["cnt"]
            for r in SK.count_min_build(df.filter(F.col("g") == g), "v").collect()
        }
        sub = {
            (d, s): c for (gg, d, s), c in _cm_map(grouped).items() if gg == g
        }
        assert sub == single


def test_cm_maintain_is_linear_no_rebuild_input(spark):
    """The linear-sketch headline: deletes SUBTRACT — maintenance takes
    no `current` at all, and maintained cells equal a direct rebuild of
    the final state for inserts, updates, and deletes alike."""
    base = spark.createDataFrame(
        [(("a" if i % 2 else "b"), i % 11) for i in range(200)],
        "g: string, v: bigint",
    )
    stored = SK.count_min_build_grouped(base, "v", ["g"])
    cdc = _cdc(
        spark,
        [("a", v % 11, "insert") for v in range(200, 240)]
        + [("b", 8, "update_preimage"), ("b", 9, "update_postimage")]
        + [("a", 1, "delete"), ("a", 3, "delete")],
    )
    final = (
        base.unionByName(
            spark.createDataFrame(
                [("a", v % 11) for v in range(200, 240)], "g: string, v: bigint"
            )
        )
        .exceptAll(
            spark.createDataFrame(
                [("b", 8), ("a", 1), ("a", 3)], "g: string, v: bigint"
            )
        )
        .unionByName(
            spark.createDataFrame([("b", 9)], "g: string, v: bigint")
        )
    )
    maintained = SK.count_min_maintain_grouped(stored, cdc, "v", ["g"])
    assert _cm_map(maintained) == _cm_map(
        SK.count_min_build_grouped(final, "v", ["g"])
    )


def test_cm_maintain_group_fully_deleted_disappears(spark):
    base = spark.createDataFrame([("a", 1), ("b", 2)], "g: string, v: bigint")
    stored = SK.count_min_build_grouped(base, "v", ["g"])
    cdc = _cdc(spark, [("a", 1, "delete")])
    maintained = SK.count_min_maintain_grouped(stored, cdc, "v", ["g"])
    got = _cm_map(maintained)
    assert got == _cm_map(
        SK.count_min_build_grouped(base.filter(F.col("g") != "a"), "v", ["g"])
    )
    assert not any(k[0] == "a" for k in got)


def test_cm_estimate_grouped_never_underestimates(spark):
    df = spark.createDataFrame(
        [(i % 5, "g%d" % (i % 2)) for i in range(200)], "v: bigint, g: string"
    )
    sk = SK.count_min_build_grouped(df, "v", ["g"])
    est = {
        (r["g"], r["v"]): r["cm_estimate"]
        for r in SK.count_min_estimate_grouped(sk, df, "v", ["g"]).collect()
    }
    exact = {
        (r["g"], r["v"]): r["n"]
        for r in df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for key, n in exact.items():
        assert est[key] >= n


def test_sketch_maintainer_cm_kind(spark, tmp_path):
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    wh = Warehouse(spark, str(tmp_path / "whcm"), snapshot_retention=8)
    spec = TableSpec(partition_grain="NONE", key_bucket_count=4)

    def merge(rows):
        df = spark.createDataFrame(
            rows, "k: bigint, g: string, v: bigint, i: bigint, __tombstone: boolean"
        )
        wh.merge(df, "src", ["k"], mode="upsert_delete", spec=spec)

    def direct():
        return {
            tuple(r)
            for r in SK.count_min_build_grouped(
                wh.read("src"), "v", ["g"]
            ).collect()
        }

    merge([(i, f"g{i % 2}", i % 9, 0, False) for i in range(24)])
    m = SK.SketchMaintainer(wh, "src", "src_cm", "v", ["g"], kind="cm")
    assert m.refresh() >= 1
    assert {tuple(r) for r in wh.read("src_cm").collect()} == direct()
    # delete + update: the linear path absorbs both without a rebuild
    merge([(0, "g0", 0, 1, True), (1, "g1", 7, 1, False)])
    assert m.refresh() == 1
    assert {tuple(r) for r in wh.read("src_cm").collect()} == direct()


# ---------------------------------------------------------------------------
# AMS F2 (tug-of-war) sketch (r08)
# ---------------------------------------------------------------------------


def _exact_f2(df, col):
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * F.col("n")).alias("f2"))
        .collect()[0]["f2"]
    )


def test_ams_merge_equals_single_build(spark):
    df = spark.createDataFrame([(i % 13,) for i in range(400)], "v: bigint")
    a, b = df.filter(F.col("v") % 2 == 0), df.filter(F.col("v") % 2 == 1)
    merged = {
        (r["d"], r["slot"]): r["s"]
        for r in SK.ams_merge(
            SK.ams_build(a, "v"), SK.ams_build(b, "v")
        ).collect()
    }
    single = {
        (r["d"], r["slot"]): r["s"] for r in SK.ams_build(df, "v").collect()
    }
    assert merged == single


def test_ams_f2_estimate_within_theory_bounds(spark):
    """E[est] = F2 with relative std ~ sqrt(2/width); assert a loose
    5-sigma band — deterministic (hashing is fixed), the band just
    documents the accuracy class."""
    df = spark.createDataFrame([(i % 50,) for i in range(1000)], "v: bigint")
    est = SK.ams_f2_estimate(SK.ams_build(df, "v")).collect()[0]["f2_estimate"]
    f2 = _exact_f2(df, "v")
    sigma = (2.0 / SK.AMS_WIDTH) ** 0.5 * f2
    assert abs(est - f2) <= 5 * sigma


def test_ams_maintain_linear_deletes_subtract(spark):
    base = spark.createDataFrame([(i % 17,) for i in range(300)], "v: bigint")
    stored = SK.ams_build(base, "v")
    cdc = spark.createDataFrame(
        [(3, "insert"), (3, "insert"), (5, "delete"), (16, "update_preimage"),
         (2, "update_postimage")],
        "v: bigint, _change_type: string",
    )
    final = (
        base.unionByName(spark.createDataFrame([(3,), (3,), (2,)], "v: bigint"))
        .exceptAll(spark.createDataFrame([(5,), (16,)], "v: bigint"))
    )
    got = {
        (r["d"], r["slot"]): r["s"]
        for r in SK.ams_maintain(stored, cdc, "v").collect()
    }
    want = {
        (r["d"], r["slot"]): r["s"] for r in SK.ams_build(final, "v").collect()
    }
    assert got == want


def test_ams_empty_sketch_estimates_zero(spark):
    empty = spark.createDataFrame([], "v: bigint")
    est = SK.ams_f2_estimate(SK.ams_build(empty, "v")).collect()[0]["f2_estimate"]
    assert est == 0


# ---------------------------------------------------------------------------
# Fixed-grid histogram: mergeable quantiles that survive deletes (r08)
# ---------------------------------------------------------------------------

_HKW = dict(lo=0.0, hi=100.0, nbins=10)


def _hist_map(df):
    return {(r["g"], r["bucket"]): r["cnt"] for r in df.collect()}


def test_hist_build_clamps_out_of_range_values(spark):
    df = spark.createDataFrame(
        [("a", -5.0), ("a", 0.0), ("a", 55.0), ("a", 99.9), ("a", 240.0)],
        "g: string, v: double",
    )
    got = _hist_map(SK.hist_build_grouped(df, "v", ["g"], **_HKW))
    assert got == {("a", 0): 2, ("a", 5): 1, ("a", 9): 2}


def test_hist_maintain_moves_buckets_and_subtracts(spark):
    base = spark.createDataFrame(
        [(("a" if i % 2 else "b"), float(i % 100)) for i in range(200)],
        "g: string, v: double",
    )
    stored = SK.hist_build_grouped(base, "v", ["g"], **_HKW)
    cdc = spark.createDataFrame(
        [
            ("a", 15.0, "insert"),
            ("a", 1.0, "delete"),
            # value update moves the row two buckets up
            ("b", 22.0, "update_preimage"),
            ("b", 47.0, "update_postimage"),
        ],
        "g: string, v: double, _change_type: string",
    )
    final = (
        base.unionByName(
            spark.createDataFrame([("a", 15.0), ("b", 47.0)], "g: string, v: double")
        ).exceptAll(
            spark.createDataFrame([("a", 1.0), ("b", 22.0)], "g: string, v: double")
        )
    )
    got = _hist_map(SK.hist_maintain_grouped(stored, cdc, "v", ["g"], **_HKW))
    assert got == _hist_map(SK.hist_build_grouped(final, "v", ["g"], **_HKW))


def test_hist_quantiles_match_exact_on_bucket_grid(spark):
    # values on exact bucket lower edges so the quantile bucket is
    # computable by hand: group a = [0,10,...,90] uniform
    df = spark.createDataFrame(
        [("a", float(10 * i)) for i in range(10)], "g: string, v: double"
    )
    h = SK.hist_build_grouped(df, "v", ["g"], **_HKW)
    q = SK.hist_quantile_grouped(h, ["g"], [500, 900], **_HKW).collect()[0]
    # ceil(0.5*10)=5th value = 40 -> bucket 4; ceil(0.9*10)=9th = 80 -> 8
    assert (q["n"], q["p500_bucket"], q["p900_bucket"]) == (10, 4, 8)
    assert (q["p500_lo"], q["p900_lo"]) == (40.0, 80.0)


def test_hist_merge_is_cellwise_addition(spark):
    df = spark.createDataFrame(
        [("a", float(i % 100)) for i in range(300)], "g: string, v: double"
    )
    a = df.filter(F.col("v") < 50)
    b = df.filter(F.col("v") >= 50)
    ha = SK.hist_build_grouped(a, "v", ["g"], **_HKW)
    hb = SK.hist_build_grouped(b, "v", ["g"], **_HKW)
    merged = (
        ha.unionByName(hb).groupBy("g", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    assert _hist_map(merged) == _hist_map(
        SK.hist_build_grouped(df, "v", ["g"], **_HKW)
    )


def test_sketch_maintainer_hist_kind(spark, tmp_path):
    from kafka_connect_bigquery_spark.sinks.warehouse import TableSpec, Warehouse

    wh = Warehouse(spark, str(tmp_path / "whh"), snapshot_retention=8)
    spec = TableSpec(partition_grain="NONE", key_bucket_count=4)
    kw = dict(lo=0.0, hi=100.0, nbins=10)

    def merge(rows):
        df = spark.createDataFrame(
            rows, "k: bigint, g: string, v: double, i: bigint, __tombstone: boolean"
        )
        wh.merge(df, "src", ["k"], mode="upsert_delete", spec=spec)

    def direct():
        return {
            tuple(r)
            for r in SK.hist_build_grouped(wh.read("src"), "v", ["g"], **kw).collect()
        }

    merge([(i, f"g{i % 2}", float(i % 100), 0, False) for i in range(30)])
    m = SK.SketchMaintainer(wh, "src", "src_hist", "v", ["g"], kind="hist", **kw)
    assert m.refresh() >= 1
    assert {tuple(r) for r in wh.read("src_hist").collect()} == direct()
    # delete + a value update that moves buckets: linear path only
    merge([(0, "g0", 0.0, 1, True), (1, "g1", 77.0, 1, False)])
    assert m.refresh() == 1
    assert {tuple(r) for r in wh.read("src_hist").collect()} == direct()
