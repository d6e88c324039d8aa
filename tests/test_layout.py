"""Z-order clustering tests: the Morton layout must give per-file
min/max ranges that allow data skipping on EVERY clustered column,
where a lexicographic sort only helps the leading one."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from kafka_connect_bigquery_spark.operators.layout import zorder_key, zorder_write_sorted


@pytest.fixture()
def grid_df(spark):
    # uniform 2-d grid: worst case for lexicographic, ideal to show
    # z-order's benefit on the second column
    rows = [(x, y) for x in range(64) for y in range(64)]
    return spark.createDataFrame(rows, ["a", "b"])


def _file_spans(spark, path, col):
    """Per-parquet-file (min, max) of col, via file-grouped read."""
    df = spark.read.parquet(path).withColumn("__f", F.input_file_name())
    rows = df.groupBy("__f").agg(F.min(col).alias("mn"), F.max(col).alias("mx")).collect()
    return [(r["mn"], r["mx"]) for r in rows]


def test_zorder_key_deterministic_and_bounded(spark, grid_df):
    k1 = [r[0] for r in grid_df.select(zorder_key(grid_df, ["a", "b"], bits=4)).collect()]
    k2 = [r[0] for r in grid_df.select(zorder_key(grid_df, ["a", "b"], bits=4)).collect()]
    assert k1 == k2
    assert all(0 <= k < 2 ** 8 for k in k1)  # 4 bits x 2 cols


def test_zorder_files_skip_on_both_columns(spark, grid_df, tmp_path):
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "lex")
    n = 16
    zorder_write_sorted(grid_df, ["a", "b"], bits=4, n_files=n).write.parquet(zpath)
    (
        grid_df.repartitionByRange(n, "a", "b")
        .sortWithinPartitions("a", "b")
        .write.parquet(lpath)
    )

    def avg_span(path, col):
        spans = [mx - mn for mn, mx in _file_spans(spark, path, col)]
        return sum(spans) / len(spans)

    # leading column: lexicographic wins or ties — fine
    # second column: z-order spans must be much tighter than lex (which
    # covers the full 0..63 range in every file)
    z_b = avg_span(zpath, "b")
    lex_b = avg_span(lpath, "b")
    assert z_b < lex_b * 0.5, f"z-order b-span {z_b} not tighter than lex {lex_b}"
    # and the z-layout still bounds the first column usefully
    assert avg_span(zpath, "a") < 40  # full range would be 63
