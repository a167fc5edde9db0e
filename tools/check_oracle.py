#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result) and runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir tables,
then compares: schema (column names), row count, and values (columns
sorted by name, rows sorted by all columns). Floats compared exactly
first, then with 1e-9 relative tolerance reported separately.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp cols to ns for cross-engine compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # parquet DATE columns arrive as object-of-datetime.date while
            # DuckDB yields datetime64 — the driver matches these, so
            # normalize before the dtype-strict comparison
            nonnull = df[c].dropna()
            if len(nonnull) and all(isinstance(v, __import__("datetime").date)
                                    and not isinstance(v, __import__("datetime").datetime)
                                    for v in nonnull):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                df[c] = df[c].apply(
                    lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    # a subset Verify run writes oracle_sql_subset.json (never
    # clobbering a full record); prefer it when it is the only file or
    # strictly newer than the full one (the iteration flow)
    full, sub = f"{out_dir}/oracle_sql.json", f"{out_dir}/oracle_sql_subset.json"
    if os.path.exists(sub) and (
            not os.path.exists(full)
            or os.path.getmtime(sub) > os.path.getmtime(full)):
        oracle = json.load(open(sub))
    else:
        oracle = json.load(open(full))
    results = {}
    for name in sorted(oracle):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            results[name] = "MISSING spark result"
            continue
        try:
            got = norm(pd.read_parquet(res_dir))
            want = norm(con.sql(oracle[name]).df())
        except Exception as e:
            results[name] = f"ERROR {type(e).__name__}: {e}"
            continue
        if list(got.columns) != list(want.columns):
            results[name] = f"SCHEMA got={list(got.columns)} want={list(want.columns)}"
            continue
        if len(got) != len(want):
            results[name] = f"ROWS got={len(got)} want={len(want)}"
            continue
        mismatches = []
        for c in got.columns:
            g, w = got[c], want[c]
            # dtype-strict like the driver: a DuckDB HUGEINT SUM comes back
            # as float64 while Spark yields int64 — values match but the
            # driver's value-hash differs. Fail on numeric-kind mismatch so
            # this class can't pass locally (CAST the oracle SQL instead).
            if g.dtype.kind != w.dtype.kind:
                mismatches.append(
                    f"{c}: DTYPE got={g.dtype} want={w.dtype} "
                    "(driver hash-fails this; CAST the oracle SQL)")
                continue
            if g.dtype.kind == "f" or w.dtype.kind == "f":
                g = g.astype(float); w = w.astype(float)
                both_nan = g.isna() & w.isna()
                exact = (g == w) | both_nan
                if not exact.all():
                    close = np.isclose(g, w, rtol=1e-9, atol=1e-12, equal_nan=True)
                    if close.all():
                        mismatches.append(f"{c}: FLOAT-CLOSE(not exact) n={int((~exact).sum())}")
                    else:
                        i = int(np.argmax(~close))
                        mismatches.append(f"{c}: DIFF at row {i}: got={g.iloc[i]} want={w.iloc[i]}")
            else:
                eq = (g == w) | (g.isna() & w.isna())
                if not eq.all():
                    i = int(np.argmax(~eq.values))
                    mismatches.append(f"{c}: DIFF at row {i}: got={g.iloc[i]!r} want={w.iloc[i]!r}")
        results[name] = "OK" if not mismatches else "; ".join(mismatches)
    width = max(len(n) for n in results) if results else 0
    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, v in results.items():
        print(f"{name:<{width}}  {v}")
    print(f"\n{n_ok}/{len(results)} OK")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
