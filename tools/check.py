#!/usr/bin/env python3
"""Local oracle checker mirroring the driver's DuckDB compare.

Usage: python3 tools/check.py <sfDir> <outDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against the sfDir
tables, sorts columns by name + rows by all columns, and compares values.
"""
import json, math, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def dtype_family(dt):
    """Coarse dtype family. int vs float is a REAL difference (the driver's
    hash is type-sensitive: DuckDB SUM(BIGINT)->HUGEINT->float64 vs Spark
    BIGINT hash-mismatches even when values agree), so int and float are
    distinct families. Width within a family (int32 vs int64) is fine."""
    k = getattr(dt, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "other"

def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        return bool(a == b)
    except Exception:
        return False

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_glob = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not res_glob:
            print(f"FAIL {name}: no result parquet")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({res_glob!r})").fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        dt_bad = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
                  if dtype_family(g[c].dtype) != dtype_family(e[c].dtype)]
        if dt_bad:
            print(f"FAIL {name}: dtype family mismatch {dt_bad}")
            n_fail += 1
            continue
        bad = []
        for i in range(len(g)):
            for c in g.columns:
                a, b = g[c].iloc[i], e[c].iloc[i]
                a = None if a is None or (isinstance(a, float) and False) else a
                if not cell_eq(a if a is not None else None, b):
                    bad.append((i, c, a, b))
        # pandas NaN for nulls: treat NaN==NaN above
        if bad:
            print(f"FAIL {name}: {len(bad)} cell diffs, first: {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
