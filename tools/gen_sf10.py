#!/usr/bin/env python3
"""Generate a local sf10 fixture (~100x sf0.1, ~10x /tmp/sf1) at
/tmp/sf10 for scale spot-checks two decades above the driver's sf0.1
gate. Not driver data — a dev tool.

Built from /tmp/sf1 (run tools/gen_sf1.py first) with the same
shape-preserving perturbations, one decade up:
  - key offset per copy is 1e9 (sf1 keys live in [0, 1e9) after its
    copy*1e8 offsets, so copies stay disjoint and FKs hold);
  - documents.text gets a per-copy consonant rotation (sf1 already
    rotated vowels; rotating a disjoint alphabet keeps the 10 sf1
    copies mutually unrelated INSIDE each new copy, and the new copies
    unrelated to each other — near-dup density per doc stays at the
    sf0.1 rate instead of every doc gaining 99 exact twins);
  - embeddings.embedding gets a per-copy cyclic shift of 7*i (sf1 used
    shift i on 64 dims; stride 7 is coprime to 64, so the 100 composed
    shifts stay distinct and copies point in unrelated directions).
Single parquet file per table with bounded row groups so Spark still
parallelizes the scan.
"""
import os
import duckdb

SRC = "/tmp/sf1"
DST = "/tmp/sf10"
COPIES = 10
OFF = 1_000_000_000

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

CONS = "bcdfghjklmnpqrstvwxyz"


def rot(i: int) -> str:
    k = (i * 5) % len(CONS)
    return CONS[k:] + CONS[:k]


def gen(table: str, select_fmt: str) -> None:
    parts = [select_fmt.format(i=i, off=i * OFF, rot=rot(i))
             for i in range(COPIES)]
    sql = " UNION ALL ".join(parts)
    con.execute(
        f"COPY ({sql}) TO '{DST}/{table}.parquet'"
        " (FORMAT PARQUET, ROW_GROUP_SIZE 100000)")
    n = con.execute(
        f"SELECT COUNT(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


gen("documents",
    "SELECT doc_id + {off} AS doc_id,"
    f" translate(text, '{CONS}', '{{rot}}') AS text,"
    " lang, source, n_chars"
    f" FROM '{SRC}/documents.parquet'")

gen("embeddings",
    "SELECT vec_id + {off} AS vec_id,"
    " CAST([embedding[((j - 1 + 7 * {i}) % 64) + 1] FOR j IN range(1, 65)]"
    "   AS FLOAT[]) AS embedding,"
    " label"
    f" FROM '{SRC}/embeddings.parquet'")

gen("events",
    "SELECT event_id + {off} AS event_id, ts, user_id + {off} AS user_id,"
    " event_type, value, props"
    f" FROM '{SRC}/events.parquet'")

gen("orders",
    "SELECT o_orderkey + {off} AS o_orderkey, o_custkey + {off} AS o_custkey,"
    " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
    f" FROM '{SRC}/orders.parquet'")

gen("lineitem",
    "SELECT l_orderkey + {off} AS l_orderkey, l_partkey + {off} AS l_partkey,"
    " l_suppkey + {off} AS l_suppkey, l_linenumber, l_quantity,"
    " l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
    " l_shipdate"
    f" FROM '{SRC}/lineitem.parquet'")

gen("customer",
    "SELECT c_custkey + {off} AS c_custkey, c_name, c_nationkey, c_acctbal,"
    " c_mktsegment"
    f" FROM '{SRC}/customer.parquet'")

gen("part",
    "SELECT * REPLACE (p_partkey + {off} AS p_partkey)"
    f" FROM '{SRC}/part.parquet'")

gen("supplier",
    "SELECT * REPLACE (s_suppkey + {off} AS s_suppkey)"
    f" FROM '{SRC}/supplier.parquet'")

# fixed-cardinality dims: single copy
for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet')"
                f" TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")
print("done ->", DST)
