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
