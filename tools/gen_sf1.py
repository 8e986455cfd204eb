#!/usr/bin/env python3
"""Generate a local sf1 fixture (~10x sf0.1) at /tmp/sf1 for scale
spot-checks (VERDICT r2 item 8). Not driver data — a dev tool.

Each table is 10 key-offset copies of sf0.1. Content columns are
perturbed so the workload SHAPE stays realistic instead of becoming
10x-clique adversarial:
  - documents.text: per-copy vowel rotation -> copies are unrelated
    docs, so the near-dup rate per doc matches sf0.1 instead of every
    doc gaining 9 exact twins;
  - embeddings.embedding: per-copy cyclic dimension shift -> copies
    point in unrelated directions, same ANN/dedup density as sf0.1.
Keys are offset by copy*100M consistently across tables, so FKs hold.
Single parquet file per table (tools/check.py reads '<dir>/<t>.parquet')
with bounded row groups so Spark still parallelizes the scan.
"""
import os
import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1"
COPIES = 10
OFF = 100_000_000

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

VOWELS = "aeiou"


def rot(i: int) -> str:
    return VOWELS[i % 5:] + VOWELS[:i % 5]


def gen(table: str, select_fmt: str) -> None:
    parts = [select_fmt.format(i=i, off=i * OFF, rot=rot(i))
             for i in range(COPIES)]
    sql = " UNION ALL ".join(parts)
    con.execute(
        f"COPY ({sql}) TO '{DST}/{table}.parquet'"
        " (FORMAT PARQUET, ROW_GROUP_SIZE 100000)")
    n = con.execute(f"SELECT COUNT(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


gen("documents",
    "SELECT doc_id + {off} AS doc_id,"
    " translate(text, 'aeiou', '{rot}') AS text,"
    " lang, source, n_chars"
    f" FROM '{SRC}/documents.parquet'")

gen("embeddings",
    "SELECT vec_id + {off} AS vec_id,"
    " CAST([embedding[((j - 1 + {i}) % 64) + 1] FOR j IN range(1, 65)]"
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
