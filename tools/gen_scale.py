"""Scale-factor data generator for the sf1 (and beyond) scale proof.

The driver ships read-only sf0.001/0.01/0.1 parquet; measuring how the
engine's plans SCALE needs a bigger rung on the same schema. This
generator reproduces the driver tables' schema (exact arrow dtypes,
verified against /root/testdata/sf0.1) and value envelopes (key ranges,
date ranges, category sets, fanouts measured from sf0.1) at any sf, so
per-query sf0.1 -> sf1 wall-clock ratios measure the ENGINE's scaling,
not a schema drift. It is NOT the driver's generator (seed semantics
differ): generated dirs are for scaling/bench/oracle-consistency runs,
never for cross-checking against driver-recorded sf0.1 hashes — the
DuckDB oracle runs on the SAME generated files, so correctness
comparisons stay meaningful at any sf.

Usage: python tools/gen_scale.py <sf> <out_dir> [files_per_table]
       (e.g. 1 /root/repo/.scale/sf1 32)

Rows at sf=1 (10x the sf0.1 counts): customer 150k, supplier 10k,
part 200k, orders 1.5M, lineitem ~6.1M, events 1M, documents 50k,
embeddings 20k.

files_per_table (default 1, r13): >1 writes each table as a DIRECTORY
``name.parquet/part-NNNNN.parquet`` of that many row-sliced files —
the realistic 100 TB layout (a real corpus lands in thousands of
files, so scans parallelize at file granularity and every per-file
index/pruning structure sees real file boundaries). Tables too small
to slice meaningfully (< 10k rows/file) get fewer files; the fixed
dims stay single-file. Slicing happens AFTER generation from the same
seed, so a multi-file rung holds EXACTLY the same rows in the same
order as the single-file rung — any query result difference between
layouts is a file-boundary bug, not data drift.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUS = ["O", "F", "P"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["red", "small", "hot", "cold", "old", "new", "large", "blue"]
NOUNS = ["gear", "gizmo", "widget", "ring", "plate", "anvil", "bolt", "rod"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]
VOCAB = [
    "the", "batch", "data", "sort", "value", "hash", "filter", "big",
    "dup", "column", "order", "a", "vector", "part", "scan", "slow",
    "agg", "key", "window", "table", "merge", "join", "line", "small",
    "group", "query", "row", "stream", "spark", "fast", "customer",
]

DAY_US = 86_400_000_000
EPOCH_1995 = np.datetime64("1995-01-01", "us").astype("int64")
ORDER_DAYS = (
    np.datetime64("2001-08-01", "us").astype("int64") - EPOCH_1995
) // DAY_US
EPOCH_2024 = np.datetime64("2024-01-01", "us").astype("int64")


def _ts_us(int64_us: np.ndarray) -> pa.Array:
    return pa.array(int64_us, type=pa.timestamp("us"))


def gen(sf: float, out: str, files_per_table: int = 1) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(out, exist_ok=True)
    # clamp every count to >= 1: a tiny sf (e.g. 1e-5) would otherwise
    # zero out the key tables and rng.integers(0, 0, ...) raises in the
    # orders/lineitem generators that sample those keyspaces
    n_cust = max(1, int(150_000 * sf))
    n_supp = max(1, int(10_000 * sf))
    n_part = max(1, int(200_000 * sf))
    n_ord = max(1, int(1_500_000 * sf))
    n_evt = max(1, int(1_000_000 * sf))
    n_doc = max(1, int(50_000 * sf))
    n_emb = max(1, int(20_000 * sf))

    def write(name, table):
        import shutil

        rows = table.num_rows
        # don't shard below ~10k rows/file: a 32-way split of a 25-row
        # dim would measure file-listing overhead, not layout realism
        n_files = max(1, min(int(files_per_table), rows // 10_000))
        dest = os.path.join(out, f"{name}.parquet")
        if os.path.isdir(dest):
            shutil.rmtree(dest)
        elif os.path.exists(dest):
            os.remove(dest)
        if n_files == 1:
            pq.write_table(table, dest, row_group_size=1 << 20)
        else:
            os.makedirs(dest)
            step = -(-rows // n_files)  # ceil division
            for i in range(n_files):
                chunk = table.slice(i * step, step)
                if chunk.num_rows == 0:
                    break
                pq.write_table(
                    chunk,
                    os.path.join(dest, f"part-{i:05d}.parquet"),
                    row_group_size=1 << 20,
                )
        print(f"{name}: {table.num_rows} rows in {n_files} file(s)", flush=True)

    # -- region / nation (fixed dimensions) ---------------------------
    write(
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
            }
        ),
    )
    write(
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
    )

    # -- customer ------------------------------------------------------
    write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust), pa.int32()
                ),
                "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
                "c_mktsegment": pa.array(
                    np.array(SEGS)[rng.integers(0, 5, n_cust)]
                ),
            }
        ),
    )

    # -- supplier --------------------------------------------------------
    write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
                "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
            }
        ),
    )

    # -- part ------------------------------------------------------------
    adj = np.array(ADJS)[rng.integers(0, len(ADJS), n_part)]
    noun = np.array(NOUNS)[rng.integers(0, len(NOUNS), n_part)]
    write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part), pa.int64()),
                "p_name": [f"{a} {n}" for a, n in zip(adj, noun)],
                "p_brand": [f"Brand#{b}" for b in rng.integers(1, 26, n_part)],
                "p_type": pa.array(np.array(TYPES)[rng.integers(0, 6, n_part)]),
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": np.round(
                    900.0 + (np.arange(n_part) % 1000) * 0.1, 2
                ),
            }
        ),
    )

    # -- orders ------------------------------------------------------------
    odate_day = rng.integers(0, ORDER_DAYS + 1, n_ord)
    odate_us = EPOCH_1995 + odate_day * DAY_US
    write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
                "o_orderstatus": pa.array(
                    np.array(STATUS)[
                        rng.choice(3, n_ord, p=[0.49, 0.49, 0.02])
                    ]
                ),
                "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
                "o_orderdate": _ts_us(odate_us),
                "o_orderpriority": pa.array(
                    np.array(PRIOS)[rng.integers(0, 5, n_ord)]
                ),
            }
        ),
    )

    # -- lineitem (avg ~4.07 lines per order, 1..7) -----------------------
    nlines = rng.integers(1, 8, n_ord)
    lok = np.repeat(np.arange(n_ord), nlines)
    n_li = len(lok)
    lnum = np.concatenate([np.arange(1, k + 1) for k in nlines]).astype(np.int32)
    ship_us = (
        EPOCH_1995
        + np.repeat(odate_day, nlines) * DAY_US
        + rng.integers(1, 96, n_li) * DAY_US
    )
    write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(lok, pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
                "l_linenumber": pa.array(lnum, pa.int32()),
                "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
                "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
                "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
                "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
                "l_returnflag": pa.array(
                    np.array(["A", "N", "R"])[
                        rng.choice(3, n_li, p=[0.25, 0.5, 0.25])
                    ]
                ),
                "l_linestatus": pa.array(
                    np.array(["F", "O"])[rng.integers(0, 2, n_li)]
                ),
                "l_shipdate": _ts_us(ship_us),
            }
        ),
    )

    # -- events (ts sorted by event_id over ~30 days) ---------------------
    gaps = rng.exponential(30 * DAY_US / n_evt, n_evt)
    ts = EPOCH_2024 + np.cumsum(gaps).astype("int64")
    n_users = max(1, int(1500 * (sf / 0.1)))
    write(
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(n_evt), pa.int64()),
                "ts": _ts_us(ts),
                "user_id": pa.array(rng.integers(0, n_users, n_evt), pa.int64()),
                "event_type": pa.array(
                    np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)]
                ),
                "value": np.round(
                    np.abs(rng.normal(60, 70, n_evt)).clip(0, 600), 2
                ),
                "props": [
                    json.dumps({"k": int(k)})
                    for k in rng.integers(0, 100, n_evt)
                ],
            }
        ),
    )

    # -- documents (31-word vocab, 10..100 words, ~0.2% exact dups) -------
    langs = np.array(LANGS)[rng.choice(5, n_doc, p=LANG_W)]
    lens = rng.integers(10, 101, n_doc)
    vocab = np.array(VOCAB)
    texts: list[str] = []
    for i in range(n_doc):
        if i > 100 and rng.random() < 0.002:
            texts.append(texts[int(rng.integers(0, i))])
        else:
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), lens[i])]))
    write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_doc), pa.int64()),
                "text": texts,
                "lang": pa.array(langs),
                "source": [f"src{s}" for s in rng.integers(0, 20, n_doc)],
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
    )

    # -- embeddings (10 directional clusters on the 64-sphere) ------------
    cents = rng.normal(size=(10, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    v = 0.75 * cents[labels] + rng.normal(0, 0.35, (n_emb, 64))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_emb), pa.int64()),
                "embedding": pa.array(
                    list(v.astype(np.float32)), pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
    )


if __name__ == "__main__":
    sf = float(sys.argv[1])
    out = sys.argv[2]
    files = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    gen(sf, out, files)
