"""Golden end-to-end fixture tests (FIXTURES.md, mirroring the
reference's BigQuerySinkConnectorIT integration corpus).

Each fixture's records flow the full path — kafka-shaped source stream
-> SinkPipeline convert/route/shape -> warehouse parquet — and are read
back ``ORDER BY row`` (the reference's verification convention) and
asserted against hand-written expected values, plus a DuckDB read of
the same warehouse files as a cross-engine check.

The value_parser plays the Connect framework's converter role (which
happens *before* the reference connector sees records): parse wire
JSON at base encodings, then apply the logical-type / bytes transforms.
"""

from __future__ import annotations

import base64
import datetime
import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_bigquery_spark.config import SinkConfig
from kafka_connect_bigquery_spark.schema import logical_types
from kafka_connect_bigquery_spark.sinks.warehouse import Warehouse
from kafka_connect_bigquery_spark.sources.kafka import KAFKA_SCHEMA, file_stream_source
from kafka_connect_bigquery_spark.streaming.pipeline import SinkPipeline


def _kafka_rows(rows):
    out = []
    for key, val, topic, part, off in rows:
        out.append(
            (
                key.encode() if key else None,
                json.dumps(val).encode() if val is not None else None,
                topic,
                part,
                off,
                None,
            )
        )
    return out


def _run(spark, tmp_path, rows, cfg, value_parser, key_cols=None):
    src = str(tmp_path / "src")
    spark.createDataFrame(_kafka_rows(rows), KAFKA_SCHEMA).write.mode("append").parquet(src)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    pipe = SinkPipeline(warehouse=wh, config=cfg, value_parser=value_parser)
    q = pipe.start(file_stream_source(spark, src), str(tmp_path / "ckpt"), key_cols=key_cols)
    q.processAllAvailable()
    q.stop()
    return wh, pipe


def _duck_rows(wh, table, order_by="row"):
    import duckdb
    import glob

    files = glob.glob(f"{wh.path(table)}/**/*.parquet", recursive=True)
    con = duckdb.connect()
    return con.execute(
        f"SELECT * FROM read_parquet({files!r}) ORDER BY {order_by}"
    ).df()


# ---------------------------------------------------------------------------
# 1. primitives — widening + base64 bytes
# ---------------------------------------------------------------------------

_PRIM_WIRE = T.StructType(
    [
        T.StructField("row", T.LongType()),
        T.StructField("null_prim", T.LongType()),
        T.StructField("boolean_prim", T.BooleanType()),
        T.StructField("int_prim", T.LongType()),
        T.StructField("long_prim", T.LongType()),
        T.StructField("float_prim", T.DoubleType()),
        T.StructField("double_prim", T.DoubleType()),
        T.StructField("string_prim", T.StringType()),
        T.StructField("bytes_prim", T.StringType()),  # JSON wire = base64
    ]
)


def _prim_parser(c):
    parsed = F.from_json(c.cast("string"), _PRIM_WIRE)
    # bytes: wire base64 -> binary (the Connect deserializer step)
    return F.when(
        parsed.isNotNull(),
        parsed.withField("bytes_prim", F.unbase64(parsed["bytes_prim"]).cast("binary")),
    )


_PRIM_PARSER_FIELDS = None  # keep flake quiet


def test_primitives_fixture(spark, tmp_path):
    raw = base64.b64encode(b"forty-two bytes").decode()
    rows = [
        (
            "k1",
            {
                "row": 1,
                "null_prim": None,
                "boolean_prim": False,
                "int_prim": 4242,
                "long_prim": 42424242424242,
                "float_prim": 42.42,
                "double_prim": 42424242.42424242,
                "string_prim": "forty-two",
                "bytes_prim": raw,
            },
            "primitives",
            0,
            0,
        ),
        (
            "k2",
            {
                "row": 2,
                "null_prim": 7,
                "boolean_prim": True,
                "int_prim": -1,
                "long_prim": 1,
                "float_prim": -0.5,
                "double_prim": 2.5,
                "string_prim": "x",
                "bytes_prim": base64.b64encode(b"\x00\x01").decode(),
            },
            "primitives",
            0,
            1,
        ),
    ]
    cfg = SinkConfig(topics=["primitives"], time_partitioning_type="NONE")
    # _prim_parser returns binary bytes_prim; to_bq_shape re-encodes b64
    wh, _ = _run(spark, tmp_path, rows, cfg, _prim_parser)
    got = wh.read("primitives").orderBy("row").collect()
    assert [r["row"] for r in got] == [1, 2]
    r1, r2 = got
    assert r1["null_prim"] is None and r2["null_prim"] == 7
    assert r1["boolean_prim"] is False and r2["boolean_prim"] is True
    # widening: int/long both INT64, float/double both FLOAT64
    assert dict(wh.read("primitives").dtypes)["int_prim"] == "bigint"
    assert dict(wh.read("primitives").dtypes)["float_prim"] == "double"
    assert r1["long_prim"] == 42424242424242
    assert r1["float_prim"] == 42.42
    # bytes emitted as base64 STRING (reference wire behavior)
    assert r1["bytes_prim"] == raw
    assert dict(wh.read("primitives").dtypes)["bytes_prim"] == "string"
    # cross-engine: duckdb reads the same parquet identically
    pdf = _duck_rows(wh, "primitives")
    assert list(pdf["row"]) == [1, 2]
    assert list(pdf["bytes_prim"]) == [raw, base64.b64encode(b"\x00\x01").decode()]


# ---------------------------------------------------------------------------
# 2. nulls — optional fields
# ---------------------------------------------------------------------------

def test_nulls_fixture(spark, tmp_path):
    wire = T.StructType(
        [
            T.StructField("row", T.LongType(), False),
            T.StructField("f1", T.StringType(), False),
            T.StructField("f2", T.StringType(), True),
            T.StructField("f3", T.LongType(), True),
            T.StructField("f4", T.BooleanType(), True),
        ]
    )
    rows = [
        ("k1", {"row": 1, "f1": "Required string", "f2": None, "f3": None, "f4": False}, "nulls", 0, 0),
        ("k2", {"row": 2, "f1": "Required string", "f2": "Optional string", "f3": 42, "f4": None}, "nulls", 0, 1),
        ("k3", {"row": 3, "f1": "Required string", "f2": None, "f3": 42, "f4": None}, "nulls", 0, 2),
        ("k4", {"row": 4, "f1": "Required string", "f2": "Optional string", "f3": None, "f4": True}, "nulls", 0, 3),
    ]
    cfg = SinkConfig(topics=["nulls"], time_partitioning_type="NONE")
    wh, _ = _run(spark, tmp_path, rows, cfg, lambda c: F.from_json(c.cast("string"), wire))
    got = wh.read("nulls").orderBy("row").collect()
    assert [(r.f2, r.f3, r.f4) for r in got] == [
        (None, None, False),
        ("Optional string", 42, None),
        (None, 42, None),
        ("Optional string", None, True),
    ]


# ---------------------------------------------------------------------------
# 3. logical-types — Kafka Timestamp/Date
# ---------------------------------------------------------------------------

def test_logical_types_fixture(spark, tmp_path):
    wire = T.StructType(
        [
            T.StructField("row", T.LongType(), False),
            T.StructField("timestamp_test", T.LongType(), True),  # epoch ms
            T.StructField("date_test", T.LongType(), True),  # epoch days
        ]
    )
    ts_conv = logical_types.lookup("org.apache.kafka.connect.data.Timestamp").convert
    date_conv = logical_types.lookup("org.apache.kafka.connect.data.Date").convert

    def parser(c):
        p = F.from_json(c.cast("string"), wire)
        return F.when(
            p.isNotNull(),
            p.withField("timestamp_test", ts_conv(p["timestamp_test"]))
            .withField("date_test", date_conv(p["date_test"])),
        )

    ms = 1_590_965_598_123  # 2020-05-31T22:53:18.123Z
    days = 18_413  # 2020-05-31
    rows = [("k1", {"row": 1, "timestamp_test": ms, "date_test": days}, "logical", 0, 0)]
    cfg = SinkConfig(topics=["logical"], time_partitioning_type="NONE")
    wh, _ = _run(spark, tmp_path, rows, cfg, parser)
    r = wh.read("logical").first()
    assert r["timestamp_test"] == datetime.datetime(2020, 5, 31, 22, 53, 18, 123000)
    assert r["date_test"] == datetime.date(2020, 5, 31)
    assert dict(wh.read("logical").dtypes) == {
        "row": "bigint",
        "timestamp_test": "timestamp",
        "date_test": "date",
    }


# ---------------------------------------------------------------------------
# 4. matryoshka-dolls — deep nesting + arrays
# ---------------------------------------------------------------------------

def test_matryoshka_fixture(spark, tmp_path):
    wire = T.StructType(
        [
            T.StructField("row", T.LongType(), False),
            T.StructField(
                "middle",
                T.StructType(
                    [
                        T.StructField("middle_array", T.ArrayType(T.DoubleType()), True),
                        T.StructField(
                            "inner",
                            T.StructType(
                                [
                                    T.StructField("inner_int", T.LongType(), True),
                                    T.StructField("inner_string", T.StringType(), True),
                                ]
                            ),
                            True,
                        ),
                    ]
                ),
                True,
            ),
        ]
    )
    rows = [
        (
            "k1",
            {
                "row": 1,
                "middle": {
                    "middle_array": [42.0, 42.42, 42.4242],
                    "inner": {"inner_int": 42, "inner_string": "42"},
                },
            },
            "dolls",
            0,
            0,
        )
    ]
    cfg = SinkConfig(topics=["dolls"], time_partitioning_type="NONE")
    wh, _ = _run(spark, tmp_path, rows, cfg, lambda c: F.from_json(c.cast("string"), wire))
    r = wh.read("dolls").first()
    assert r["middle"]["middle_array"] == [42.0, 42.42, 42.4242]
    assert r["middle"]["inner"]["inner_int"] == 42
    assert r["middle"]["inner"]["inner_string"] == "42"


# ---------------------------------------------------------------------------
# 5. gcs-load — primitives via the batch-load path
# ---------------------------------------------------------------------------

def test_gcs_load_fixture(spark, tmp_path):
    raw = base64.b64encode(b"batch bytes").decode()
    rows = [
        ("k1", {"row": 1, "null_prim": None, "boolean_prim": True, "int_prim": 1,
                "long_prim": 2, "float_prim": 0.5, "double_prim": 1.5,
                "string_prim": "s", "bytes_prim": raw}, "gcsload", 0, 0),
        ("k2", {"row": 2, "null_prim": 3, "boolean_prim": False, "int_prim": 4,
                "long_prim": 5, "float_prim": 2.5, "double_prim": 3.5,
                "string_prim": "t", "bytes_prim": raw}, "gcsload", 0, 1),
    ]
    staging = str(tmp_path / "staging")
    cfg = SinkConfig(
        topics=["gcsload"],
        enable_batch_load_topics=["gcsload"],
        gcs_staging_dir=staging,
        time_partitioning_type="NONE",
    )
    wh, pipe = _run(spark, tmp_path, rows, cfg, _prim_parser)
    assert not wh.exists("gcsload")  # staged only (S5)
    assert pipe.load_staged(staging) == ["gcsload"]  # loader tick (S6)
    got = wh.read("gcsload").orderBy("row").collect()
    assert [r["row"] for r in got] == [1, 2]
    assert got[0]["string_prim"] == "s" and got[1]["int_prim"] == 4
    # NDJSON staging serializes binary as base64 — same wire shape
    assert got[0]["bytes_prim"] == raw


# ---------------------------------------------------------------------------
# RegexRouter SMT — topic rewrite ahead of routing
# (quickstart connector.properties:35-38 strip-prefix;
#  BigQuerySinkConnectorIT.java:314-317 add-suffix)


def test_regex_router_fixture(spark, tmp_path):
    parser = lambda c: F.from_json(  # noqa: E731
        c.cast("string"), T.StructType([T.StructField("row", T.LongType())])
    )
    rows = [
        ("k1", {"row": 1}, "kcbq_orders", 0, 0),     # strip-prefix match
        ("k2", {"row": 2}, "plain_topic", 0, 1),     # no match -> unchanged
        ("k3", {"row": 3}, "kcbq_mapped", 0, 2),     # rewritten THEN mapped
    ]
    cfg = SinkConfig(
        topics=["kcbq_orders", "plain_topic", "kcbq_mapped"],
        time_partitioning_type="NONE",
        smt_regex_routers=[("(kcbq_)(.*)", "$2")],
        topic2table_map={"mapped": "custom_dest"},
    )
    wh, pipe = _run(spark, tmp_path, rows, cfg, parser)
    # RegexRouter semantics: full-match rewrite, $N capture refs, SMT
    # runs before the map lookup (the map key is the REWRITTEN topic)
    assert pipe.router.table_for("kcbq_orders") == "orders"
    assert pipe.router.table_for("plain_topic") == "plain_topic"
    assert pipe.router.table_for("kcbq_mapped") == "custom_dest"
    # partial matches must NOT rewrite (matcher.matches(), not find())
    assert pipe.router.table_for("xkcbq_orders") == "xkcbq_orders"
    assert {r.row for r in wh.read("orders").collect()} == {1}
    assert {r.row for r in wh.read("plain_topic").collect()} == {2}
    assert {r.row for r in wh.read("custom_dest").collect()} == {3}


def test_regex_router_suffix_chain(spark, tmp_path):
    """The IT's addSuffix shape ('(.*)' -> '$1<suffix>') chained after a
    prefix strip — rules apply in transforms-list order."""
    from kafka_connect_bigquery_spark.operators.routing import TopicRouter

    router = TopicRouter(
        smt_rules=[("(kcbq_)(.*)", "$2"), ("(.*)", "$1_it_suffix")]
    )
    assert router.table_for("kcbq_test_topic") == "test_topic_it_suffix"
    # column-side expression agrees with driver-side resolution
    df = spark.createDataFrame([("kcbq_test_topic",), ("other",)], "topic string")
    got = {
        r.t
        for r in df.select(router.routing_column(F.col("topic")).alias("t")).collect()
    }
    assert got == {"test_topic_it_suffix", "other_it_suffix"}


def test_regex_router_invalid_regex_rejected():
    import pytest

    from kafka_connect_bigquery_spark.operators.routing import (
        RoutingConfigError,
        TopicRouter,
    )

    with pytest.raises(RoutingConfigError, match="invalid RegexRouter"):
        TopicRouter(smt_rules=[("(unclosed", "$1")])
