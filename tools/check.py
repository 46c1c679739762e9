#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query result parquet in <verifyOutDir>, runs the matching SQL from
oracle_sql.json in DuckDB (tables = parquet files in <sfDir>), then compares:
columns sorted by name, rows sorted by all columns, exact value equality.
"""
import json, sys, glob, os
import duckdb

def canon(df):
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: str(list(v)) if hasattr(v, "__len__") and not isinstance(v, str) else v)
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = n_rowsonly = 0
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(d):
            continue
        qname = os.path.basename(d)
        got = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
        if qname not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            if len(got) > 0: n_rowsonly += 1
            else: n_bad += 1
            print(f"  {status:10s} {qname} rows={len(got)}")
            continue
        try:
            exp = con.execute(oracle[qname]).df()
        except Exception as e:
            n_bad += 1
            print(f"  ORACLE-ERR {qname}: {e}")
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            n_bad += 1
            print(f"  COL-MISMATCH {qname}: got={list(g.columns)} exp={list(e.columns)}")
            continue
        if len(g) != len(e):
            n_bad += 1
            print(f"  ROW-MISMATCH {qname}: got={len(g)} exp={len(e)}")
            continue
        diff_cols = []
        for c in g.columns:
            a, b = g[c], e[c]
            try:
                eq = (a.astype(str).values == b.astype(str).values).all()
            except Exception:
                eq = False
            if not eq:
                diff_cols.append(c)
        if diff_cols:
            n_bad += 1
            print(f"  VAL-MISMATCH {qname}: cols={diff_cols}")
            for c in diff_cols[:2]:
                mask = g[c].astype(str).values != e[c].astype(str).values
                print(f"    {c}: got={g[c][mask].head(3).tolist()} exp={e[c][mask].head(3).tolist()}")
        else:
            n_ok += 1
            print(f"  OK         {qname} rows={len(g)}")
    print(f"== {n_ok} ok, {n_rowsonly} rows-only, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
