"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names/types, and an order-insensitive value comparison (exact for
non-floats; floats must match to 1e-9 relative — we *aim* for bitwise
equality via decimal-cast aggregation, and report max deviation).

Usage: python tools/verify_local.py [sf_dir] [query_name ...]
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
        if os.path.exists(p):
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


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from kafka_connect_bigquery_spark.session import get_spark

    spark = get_spark("verify-local")
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
    print(f"\n{len(qs) - len(failed)}/{len(qs) if not only else len(only)} passed")
    if failed:
        print("FAILED:", failed)
        sys.exit(1)


if __name__ == "__main__":
    main()
