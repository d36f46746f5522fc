#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over views named after the fixture
tables, sorts columns by name and rows by all columns, and diffs values.
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def cells_equal(a, b):
    if a is None and b is None:
        return True
    if hasattr(a, "__len__") and not isinstance(a, str):
        try:
            return list(a) == list(b)
        except Exception:
            return False
    try:
        import pandas as pd
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    try:
        if isinstance(a, float) or isinstance(b, float):
            if a is None or b is None:
                return False
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b
    except TypeError:
        pass
    return a == b

def java_double_str(x):
    """Replicate java.lang.Double.toString (what Verify's cast-to-string
    dump prints): shortest round-trip digits, plain decimal when
    1e-3 <= |x| < 1e7, else d.dddEn scientific."""
    import math
    from decimal import Decimal
    if x != x:
        return "NaN"
    if x == float("inf"):
        return "Infinity"
    if x == float("-inf"):
        return "-Infinity"
    sign = "-" if math.copysign(1.0, x) < 0 else ""
    if x == 0:
        return sign + "0.0"
    t = Decimal(repr(abs(x))).as_tuple()
    digits = "".join(map(str, t.digits)).rstrip("0") or "0"
    adj = t.exponent + len(t.digits) - 1  # x = d.igits * 10^adj
    if -3 <= adj < 7:
        if adj >= 0:
            ip = digits.ljust(adj + 1, "0")[:adj + 1]
            fp = digits[adj + 1:] or "0"
            return f"{sign}{ip}.{fp}"
        return sign + "0." + "0" * (-adj - 1) + digits
    frac = digits[1:] or "0"
    return f"{sign}{digits[0]}.{frac}E{adj}"


def golden_cell(v):
    """Format one oracle cell exactly as Verify's [verify:cells] dump does
    on the Spark side (cast-to-string semantics, NULL for null)."""
    import datetime
    from decimal import Decimal
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return java_double_str(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex().upper()
    if isinstance(v, datetime.datetime):
        s = v.strftime("%Y-%m-%d %H:%M:%S")
        if v.microsecond:
            s += ("%.6f" % (v.microsecond / 1e6))[1:].rstrip("0")
        return s
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, Decimal):
        raise ValueError(f"decimal cell {v} violates the hash-safe contract")
    return str(v)


def emit_golden(con, oracles, golden_dir):
    """Write <golden_dir>/<name>.txt with the oracle's canonical cells
    (sorted columns, |-joined rows) for every oracle result <= 100 rows —
    the same shape Verify dumps, so a driver-red row is diffable
    engine-vs-golden from the driver log with no DuckDB in the loop."""
    import os
    os.makedirs(golden_dir, exist_ok=True)
    n = 0
    for name, sql in sorted(oracles.items()):
        try:
            cur = con.execute(sql)
            cols = [d[0] for d in cur.description]
            rows = cur.fetchall()
        except Exception as e:
            print(f"GOLDEN SKIP {name}: oracle failed: {e}")
            continue
        if len(rows) > 100:
            continue
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        try:
            lines = sorted("|".join(golden_cell(r[i]) for i in order)
                           for r in rows)
        except ValueError as e:
            print(f"GOLDEN SKIP {name}: {e}")
            continue
        with open(f"{golden_dir}/{name}.txt", "w") as f:
            f.write(f"# {name} cols={','.join(sorted(cols))}\n")
            for ln in lines:
                f.write(ln + "\n")
        n += 1
    print(f"== wrote {n} golden files to {golden_dir} ==")


def main():
    if sys.argv[1] == "--emit-golden":
        sf_dir, out_dir, golden_dir = sys.argv[2], sys.argv[3], sys.argv[4]
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
        emit_golden(con, oracles, golden_dir)
        return
    json_out = None
    only = None
    argv = sys.argv[1:]
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    if "--only" in argv:
        # comma-separated exact names OR shard spec "i/n" (hash by index
        # over the sorted oracle list) — lets a long sweep run as N
        # parallel processes whose --json outputs are merged afterwards
        i = argv.index("--only")
        only = argv[i + 1]
        del argv[i:i + 2]
    sf_dir, out_dir = argv[0], argv[1]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        if "/" in only and "," not in only:
            i, n = map(int, only.split("/"))
            names = sorted(oracles)
            oracles = {k: oracles[k] for j, k in enumerate(names) if j % n == i}
        else:
            keep = set(only.split(","))
            oracles = {k: v for k, v in oracles.items() if k in keep}
    report = {}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        report[name] = rec
        try:
            spark_df = canon(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf())
            rec["spark_rows"] = len(spark_df)
            oracle_df = canon(con.execute(sql).fetchdf())
            rec["oracle_rows"] = len(oracle_df)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            rec["err"] = str(e)[:500]
            n_fail += 1
            continue
        ok = True
        rec["rows_match"] = len(spark_df) == len(oracle_df)
        rec["schema_match"] = list(spark_df.columns) == list(oracle_df.columns)
        if not rec["schema_match"]:
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(oracle_df.columns)}")
            ok = False
        elif not rec["rows_match"]:
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(oracle_df)}")
            ok = False
        else:
            rec["hash_match"] = True
            sv, ov = spark_df.values.tolist(), oracle_df.values.tolist()
            for i, (r1, r2) in enumerate(zip(sv, ov)):
                bad = [(c, x, y) for c, (x, y) in
                       zip(spark_df.columns, zip(r1, r2)) if not cells_equal(x, y)]
                if bad:
                    print(f"FAIL {name}: row {i} diff {bad[:3]}")
                    rec["hash_match"] = False
                    ok = False
                    break
        if ok:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    if json_out:
        # Queries Verify dumped but no oracle covers -> driver's no_oracle rows
        import glob, os
        for d in sorted(glob.glob(f"{out_dir}/*/")):
            name = os.path.basename(d.rstrip("/"))
            if name in report:
                continue
            try:
                n = con.execute(
                    f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
            except Exception:
                continue
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": n,
                            "oracle_rows": None, "err": "no_oracle"}
        with open(json_out, "w") as f:
            json.dump(dict(sorted(report.items())), f, indent=1)
        print(f"== wrote {json_out} ({len(report)} entries) ==")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
