#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Faithfulness notes (learned from round-1 driver results):
- The Spark result is read with pandas/pyarrow (NOT duckdb) — parquet
  decimal columns stay decimal.Decimal objects, lists stay numpy arrays.
  The driver's checker crashed sorting a list column and hash-mismatched
  every decimal output column (str(Decimal('7.00')) != str(7.0)), so our
  canon() must NOT paper over those: it stringifies values the same way a
  hash over str values would see them, and reports a DTYPE note when the
  raw representations differ even if values are numerically equal.
- The oracle runs in DuckDB and is fetched with .df() (decimal → float64).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def canon(df):
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: str(list(v)) if hasattr(v, "__len__") and not isinstance(v, str) else v)
    df = df.sort_values(by=cols, kind="mergesort", key=lambda s: s.astype(str)).reset_index(drop=True)
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
        try:
            # driver-faithful: pandas/pyarrow read of the Spark output
            got = pd.read_parquet(d)
        except Exception as e:
            n_bad += 1
            print(f"  READ-ERR   {qname}: {e}")
            continue
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
        try:
            g, e = canon(got), canon(exp)
        except Exception as ex:
            n_bad += 1
            print(f"  CANON-ERR  {qname}: {ex}")
            continue
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
                print(f"    {c}: got={g[c][mask].head(3).tolist()} exp={e[c][mask].head(3).tolist()}"
                      f" dtypes got={g[c].dtype} exp={e[c].dtype}")
        else:
            n_ok += 1
            dtype_note = ""
            bad_dtypes = [c for c in g.columns if str(g[c].dtype) != str(e[c].dtype)]
            if bad_dtypes:
                dtype_note = f"  [dtype-diff: {bad_dtypes}]"
            print(f"  OK         {qname} rows={len(g)}{dtype_note}")
    print(f"== {n_ok} ok, {n_rowsonly} rows-only, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
