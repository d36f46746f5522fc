#!/usr/bin/env python3
"""Hash-safe output-type audit (VERDICT r6 task #1).

Usage: python3 tools/typeaudit.py <sfDir> <verifyOutDir>

For every query in <verifyOutDir>/oracle_sql.json, compares the Spark
result's parquet schema against the DuckDB oracle's result types and
flags any pairing that can trip the driver's hash canonicalization:

  - DuckDB HUGEINT anywhere in the oracle result
  - DECIMAL on either side
  - integer width skew (INT32 vs BIGINT / INT64 vs INTEGER)
  - FLOAT32 vs DOUBLE

The contract: final projections use only BIGINT / DOUBLE / VARCHAR /
DATE (+ TIMESTAMP / BOOLEAN / arrays of those), identical on both sides.
"""
import glob
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

SAFE_SPARK = {"int64", "double", "string", "date32[day]", "bool",
              "timestamp[us]", "timestamp[ns]", "binary", "large_string"}


def spark_types(out_dir, name):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return None
    schema = pq.read_schema(files[0])
    return {f.name: str(f.type) for f in schema}


def duck_types(con, sql):
    rel = con.sql(sql)
    return dict(zip(rel.columns, [str(t) for t in rel.types]))


def base(t):
    """Collapse array wrappers: 'list<item: int64>' -> 'int64', 'BIGINT[]' -> 'BIGINT'."""
    t = str(t)
    if t.startswith("list<item: ") and t.endswith(">"):
        return t[len("list<item: "):-1], True
    if t.endswith("[]"):
        return t[:-2], True
    return t, False


def pair_flags(st, dt):
    """Return list of problem strings for one (spark_type, duck_type) pair."""
    s, s_arr = base(st)
    d, d_arr = base(dt)
    probs = []
    if d == "HUGEINT":
        probs.append("duck=HUGEINT")
    if d.startswith("DECIMAL") or s.startswith("decimal"):
        probs.append(f"decimal spark={s} duck={d}")
    if (s == "int32" and d == "BIGINT") or (s == "int64" and d == "INTEGER"):
        probs.append(f"int-width spark={s} duck={d}")
    if (s == "float" and d == "DOUBLE") or (s == "double" and d == "FLOAT"):
        probs.append(f"float-width spark={s} duck={d}")
    if s == "int32" and d == "INTEGER":
        probs.append("both-int32 (contract wants BIGINT)")
    if s_arr != d_arr:
        probs.append(f"array-mismatch spark={st} duck={dt}")
    if (s.startswith("timestamp") and d == "DATE") or \
       (s == "date32[day]" and d.startswith("TIMESTAMP")):
        probs.append(f"date-vs-timestamp spark={s} duck={d}")
    return probs


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        st = spark_types(out_dir, name)
        if st is None:
            print(f"SKIP {name}: no spark output")
            continue
        try:
            dt = duck_types(con, sql)
        except Exception as e:
            print(f"ERR  {name}: oracle failed: {e}")
            n_bad += 1
            continue
        probs = []
        for c in sorted(set(st) | set(dt)):
            if c not in st or c not in dt:
                probs.append(f"{c}: only-one-side spark={st.get(c)} duck={dt.get(c)}")
                continue
            for p in pair_flags(st[c], dt[c]):
                probs.append(f"{c}: {p}")
        if probs:
            n_bad += 1
            print(f"BAD  {name}: " + "; ".join(probs))
    print(f"\n{n_bad} queries flagged of {len(oracles)}")
    # non-zero exit so the verify loop fails loudly on any leak — a
    # hand-written oracle that returns HUGEINT/DECIMAL/width-skewed
    # finals must die here, not in the driver's hash compare
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
