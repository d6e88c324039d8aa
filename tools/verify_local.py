"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names/types, and an order-insensitive value comparison (exact for
non-floats; floats must match to 1e-9 relative — we *aim* for bitwise
equality via decimal-cast aggregation, and report max deviation).

Driver-strictness notes (post round-1): the comparison is
**dtype-sensitive** — a Spark int64 column vs a DuckDB float64 column is
a FAIL even when every value compares equal (the driver hashes
materialized values, so `3123` vs `3123.0` mismatch). Pass
``--plain-session`` to run the Spark side against a conf-free
``SparkSession`` exactly like the driver harness does (no engine confs
from get_spark()), which is how the round-1 nanos-parquet crash escaped
local verification.

Usage: python tools/verify_local.py [--plain-session] [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # multi-file table (gen_scale.py files_per_table > 1)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            )
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _dtype_class(dt) -> str:
    """Coarse dtype class for driver-style sensitivity: int vs float vs
    bool vs datetime vs other. The driver's value hash sees `3123` and
    `3123.0` as different, so an int column on one side and a float
    column on the other must FAIL here too."""
    import pandas as pd

    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    return "other"


def compare(spark_df, duck_rel) -> dict:
    import pandas as pd  # noqa: F401

    sp = spark_df.toPandas()
    dp = duck_rel.df()
    res = {"rows_spark": len(sp), "rows_duck": len(dp)}
    sp_cols = sorted(sp.columns)
    dp_cols = sorted(dp.columns)
    res["cols_match"] = sp_cols == dp_cols
    if not res["cols_match"]:
        res["cols_spark"], res["cols_duck"] = sp_cols, dp_cols
        return res
    if len(sp) != len(dp):
        return res
    sp = sp[sp_cols]
    dp = dp[dp_cols]
    # dtype-sensitive gate (driver strictness): int-vs-float = FAIL even
    # if values are numerically equal. Empty frames can't be classified
    # reliably (all-object), skip the gate there.
    dtype_bad = []
    if len(sp) > 0:
        for c in sp_cols:
            a, b = _dtype_class(sp[c].dtype), _dtype_class(dp[c].dtype)
            # object-vs-anything is resolved by the value compare below;
            # the hard gate is numeric-class disagreement.
            if a != b and "other" not in (a, b):
                dtype_bad.append(f"{c}: spark={sp[c].dtype} duck={dp[c].dtype}")
    res["dtype_mismatches"] = dtype_bad
    if dtype_bad:
        res["value_mismatches"] = -1
        res["exact_hash_match"] = False
        return res
    s_rows = sorted((tuple(_canon(v) for v in row) for row in sp.itertuples(index=False)),
                    key=lambda r: tuple(str(x) for x in r))
    d_rows = sorted((tuple(_canon(v) for v in row) for row in dp.itertuples(index=False)),
                    key=lambda r: tuple(str(x) for x in r))
    mismatches = 0
    max_float_dev = 0.0
    first_bad = None
    for a, b in zip(s_rows, d_rows):
        if a == b:
            continue
        # allow tiny float deviation, track it
        ok = len(a) == len(b)
        if ok:
            for x, y in zip(a, b):
                if x == y:
                    continue
                if isinstance(x, float) and isinstance(y, float):
                    if math.isnan(x) and math.isnan(y):
                        continue
                    denom = max(abs(x), abs(y), 1e-12)
                    dev = abs(x - y) / denom
                    max_float_dev = max(max_float_dev, dev)
                    if dev > 1e-9:
                        ok = False
                        break
                else:
                    ok = False
                    break
        if not ok:
            mismatches += 1
            if first_bad is None:
                first_bad = (a, b)
    res["value_mismatches"] = mismatches
    res["max_float_dev"] = max_float_dev
    res["exact_hash_match"] = mismatches == 0 and max_float_dev == 0.0
    if first_bad:
        res["first_bad"] = [str(first_bad[0])[:300], str(first_bad[1])[:300]]
    return res


def _plain_spark():
    """A conf-free SparkSession mimicking the driver harness: no engine
    confs (no nanosAsLong, default shuffle partitions, no UTC pin other
    than what the driver itself sets). Queries must survive this."""
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("verify-plain")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return spark


def main():
    argv = [a for a in sys.argv[1:]]
    plain = "--plain-session" in argv
    if plain:
        argv.remove("--plain-session")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entry_mod
    from kafka_connect_bigquery_spark.session import get_spark

    spark = _plain_spark() if plain else get_spark("verify-local")
    con = _duck_con(sf_dir)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                rel = con.sql(oracles[name])
                r = compare(df, rel)
                ok = (
                    r.get("cols_match")
                    and r["rows_spark"] == r["rows_duck"]
                    and r.get("value_mismatches") == 0
                    and r.get("max_float_dev", 1) == 0.0
                )
                tag = "EXACT" if r.get("exact_hash_match") else ("OK~" if ok else "FAIL")
            else:
                n = df.count()
                r = {"rows_spark": n}
                ok, tag = n >= 0, "ROWS-ONLY"
        except Exception as e:  # noqa: BLE001
            ok, tag, r = False, "ERROR", {"error": str(e)[:500]}
        dt = time.time() - t0
        print(f"[{tag:9s}] {name:40s} {dt:6.1f}s {r}")
        if not ok:
            failed.append(name)
    n_run = len(only) if only else len(qs)
    print(f"\n{n_run - len(failed)}/{n_run} passed")
    if failed:
        print("FAILED:", failed)
        sys.exit(1)


if __name__ == "__main__":
    main()
