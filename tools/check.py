#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ (Spark parquet) and oracle_sql.json, runs
each oracle in DuckDB with the sfDir tables registered as views, and
compares as unordered multisets with column names sorted.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_types(con, from_clause: str) -> dict:
    """Column name → DuckDB type for a DESCRIBE-able query."""
    return {r[0]: r[1] for r in con.execute(f"DESCRIBE {from_clause}").fetchall()}


def norm_type(t: str) -> str:
    """Collapse differences the driver's hash compare tolerates
    (timestamp precision, integer widths up to 64-bit: r1 evidence —
    INTEGER-vs-BIGINT columns all passed hash_match) but NEVER
    HUGEINT/INT128: DuckDB's uncast SUM returns HUGEINT, the driver
    hash-fails it, and round 1 shipped 7 oracle bugs that pandas Int64
    coercion masked here."""
    t = t.upper()
    if t.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "INT64CLASS"
    return t


def type_mismatches(spark_t: dict, duck_t: dict) -> list:
    out = []
    for c in sorted(set(spark_t) & set(duck_t)):
        a, b = norm_type(spark_t[c]), norm_type(duck_t[c])
        if a != b:
            out.append(f"{c}: spark={spark_t[c]} oracle={duck_t[c]}")
    return out


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    key = sorted(df.columns)
    return df.sort_values(key, kind="mergesort", na_position="last").reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            bad_types = type_mismatches(
                duck_types(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'"),
                duck_types(con, f"({sql})"))
            if bad_types:
                print(f"FAIL {name}: dtype mismatch {bad_types}")
                n_bad += 1
                continue
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.execute(sql).df()
            g, w = canon(got), canon(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
                n_bad += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
                n_bad += 1
                continue
            diff_cols = []
            for c in g.columns:
                a, b = g[c], w[c]
                if pd.api.types.is_float_dtype(a):
                    eq = ((a - b).abs() < 1e-9) | (a.isna() & b.isna())
                else:
                    eq = (a == b) | (a.isna() & b.isna())
                # Nullable dtypes (e.g. Int64) yield pandas <NA> when
                # exactly one side is NULL, and Series.all() SKIPS NA --
                # so a value-vs-NULL divergence silently passed for two
                # rounds (q_jsonl_scan). NA must count as a mismatch.
                eq = eq.fillna(False)
                if not bool(eq.all()):
                    diff_cols.append(c)
            if diff_cols:
                n_bad += 1
                print(f"FAIL {name}: value mismatch in {diff_cols}")
                for c in diff_cols[:2]:
                    m = ~(((g[c] == w[c]) | (g[c].isna() & w[c].isna())).fillna(False))
                    print(f"  {c} spark={g[c][m].head(3).tolist()} duck={w[c][m].head(3).tolist()}")
            else:
                n_ok += 1
                print(f"OK   {name} ({len(g)} rows)")
        except Exception as e:
            n_bad += 1
            print(f"ERR  {name}: {str(e).splitlines()[0] if str(e) else e}")
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
