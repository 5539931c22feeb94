#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/oracle_check.py <sfDir> <outDir> [query ...]

Reads each <outDir>/<name> parquet dir (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB with views over
<sfDir>/*.parquet, and compares: column names (sorted), row counts, and
cell values (exact; floats reported with max-abs-diff when not identical).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical row order: sort by every column (stringified for mixed types)
    key = df.astype(str)
    idx = key.sort_values(by=list(df.columns)).index
    return df.loc[idx].reset_index(drop=True)

def strnorm(df):
    """Driver-style cell stringification: values as pandas renders them
    (dtype-sensitive!), NULLs canonicalized. A DuckDB HUGEINT column
    (sum of ints) becomes float64 -> '3.0' while Spark int64 -> '3';
    a Spark DECIMAL parquet column -> Decimal('1.2300') vs '1.23'.
    These MUST match or the driver's hash compare fails."""
    df = df.reindex(sorted(df.columns), axis=1)
    s = df.astype(str)
    s = s.mask(df.isna(), "NULL")
    return s.sort_values(by=list(s.columns)).reset_index(drop=True)

def compare(name, got, want, got_pa=None):
    ok = True
    if sorted(got.columns) != sorted(want.columns):
        print(f"[FAIL] {name}: columns differ\n  spark={sorted(got.columns)}\n  duck ={sorted(want.columns)}")
        return False
    if len(got) != len(want):
        print(f"[FAIL] {name}: row count {len(got)} vs {len(want)}")
        return False
    g, w = norm(got), norm(want)
    for c in g.columns:
        gv, wv = g[c], w[c]
        if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(wv):
            ga = pd.to_numeric(gv, errors="coerce").to_numpy(dtype=float)
            wa = pd.to_numeric(wv, errors="coerce").to_numpy(dtype=float)
            both_nan = np.isnan(ga) & np.isnan(wa)
            eq = (ga == wa) | both_nan
            if not eq.all():
                d = np.nanmax(np.abs(ga - wa))
                i = int(np.argmin(eq))
                print(f"[FAIL] {name}.{c}: {int((~eq).sum())}/{len(eq)} float cells differ, maxabs={d:.3e} e.g. {ga[i]!r} vs {wa[i]!r}")
                ok = False
        else:
            eq = (gv.astype(str) == wv.astype(str)) | (gv.isna() & wv.isna())
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                print(f"[FAIL] {name}.{c}: {int((~eq).sum())}/{len(eq)} cells differ e.g. {gv.iloc[i]!r} vs {wv.iloc[i]!r}")
                ok = False
    # second gate: driver-style dtype-sensitive stringify compare
    # (spark side read via pyarrow/pandas like the driver, not duckdb)
    if ok and got_pa is not None:
        gs, ws = strnorm(got_pa), strnorm(want)
        for c in gs.columns:
            ne = gs[c] != ws[c]
            if ne.any():
                i = int(ne.to_numpy().argmax())
                print(f"[FAIL] {name}.{c}: stringify mismatch {int(ne.sum())}/{len(ne)} e.g. {gs[c].iloc[i]!r} vs {ws[c].iloc[i]!r} (dtype {got_pa[c].dtype} vs {want[c].dtype})")
                ok = False
    if ok:
        print(f"[ OK ] {name}: {len(got)} rows x {len(got.columns)} cols")
    return ok

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"[FAIL] {name}: no spark output at {res_dir}")
            n_fail += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
            got_pa = pd.read_parquet(res_dir)
        except Exception as e:
            print(f"[FAIL] {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if compare(name, got, want, got_pa):
            n_ok += 1
        else:
            n_fail += 1
    print(f"== {n_ok} ok, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
