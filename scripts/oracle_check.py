#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare with the engine's parquet
output (written by `graft.Verify`). Columns are sorted by name before
comparison (mirroring the driver); rows are sorted by all columns.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>
"""
import json, math, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = n_noorc = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        got = con.execute(
            f"SELECT * FROM '{qdir}/*.parquet'").df()
        if name not in oracles:
            print(f"[rows-only] {name}: rows={len(got)}")
            n_noorc += 1
            continue
        want = con.execute(oracles[name]).df()
        ok, msg = compare(got, want)
        if ok:
            n_pass += 1
            print(f"[PASS] {name}: rows={len(got)}")
        else:
            n_fail += 1
            print(f"[FAIL] {name}: {msg}")
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noorc} rows-only ==")
    return 1 if n_fail else 0

def compare(got, want):
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        return False, f"columns differ: {gc} vs {wc}"
    if len(got) != len(want):
        return False, f"row counts differ: {len(got)} vs {len(want)}"
    # dtype-strict: the driver hashes value strings, so int64 2538 vs
    # float64 2538.0 is a driver FAIL even though == says equal. Compare
    # dtype KIND (int-vs-float-vs-object), not exact width: int32 vs
    # int64 both render "2538" and pass the driver.
    def kind(dt):
        k = dt.kind
        return "i" if k in "iu" else k
    for c in gc:
        kg, kw = kind(got[c].dtype), kind(want[c].dtype)
        if kg != kw and len(got) > 0:
            return False, f"col {c} dtype kind differs: {got[c].dtype} vs {want[c].dtype}"
    def hashable(df):
        out = df.copy()
        for c in out.columns:
            out[c] = out[c].map(
                lambda v: tuple(v) if hasattr(v, "__len__") and not isinstance(v, str) else v)
        return out
    g = hashable(got[gc]).sort_values(gc).reset_index(drop=True)
    w = hashable(want[wc]).sort_values(wc).reset_index(drop=True)
    for c in gc:
        for i, (a, b) in enumerate(zip(g[c], w[c])):
            if not eq(a, b):
                return False, f"col {c} row {i}: {a!r} != {b!r}"
    return True, ""

def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if not (isinstance(a, float) and isinstance(b, float)):
            return False  # int-vs-float is a driver hash mismatch
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact — rounding happens engine-side
    if hasattr(a, "__len__") and not isinstance(a, str):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
