#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle compare.

Usage: python3 tools/compare.py [sfDir] [outDir]

Runs each oracle_sql.json entry in DuckDB over the sfDir parquet tables and
compares, value by value (strict), against the Spark parquet written by
graft.Verify. Columns are sorted by name on both sides (the driver does the
same before hashing). Exit 1 on any mismatch, with a per-query diff report.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def load_spark(outdir, name):
    files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        # strip tz so Spark's UTC-instant timestamps compare to DuckDB's naive
        if isinstance(s.dtype, pd.DatetimeTZDtype):
            df[c] = s.dt.tz_localize(None)
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if not (v is None or (isinstance(v, float) and np.isnan(v))) else None)
    return df


def diff(name, sdf, ddf):
    probs = []
    if list(sdf.columns) != list(ddf.columns):
        probs.append(f"columns spark={list(sdf.columns)} duck={list(ddf.columns)}")
        return probs
    if len(sdf) != len(ddf):
        probs.append(f"rows spark={len(sdf)} duck={len(ddf)}")
        return probs
    for c in sdf.columns:
        a, b = sdf[c].to_numpy(), ddf[c].to_numpy()
        if a.dtype != b.dtype:
            probs.append(f"col {c}: dtype spark={a.dtype} duck={b.dtype}")
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                af = a.astype(float); bf = b.astype(float)
                neq = ~((af == bf) | (np.isnan(af) & np.isnan(bf)))
            else:
                neq = ~((pd.Series(a).isna() & pd.Series(b).isna()).to_numpy() |
                        (pd.Series(a) == pd.Series(b)).fillna(False).to_numpy())
        except Exception as e:
            probs.append(f"col {c}: compare error {e}")
            continue
        n = int(neq.sum())
        if n:
            i = int(np.argmax(neq))
            probs.append(f"col {c}: {n} diffs; first@row{i}: spark={a[i]!r} duck={b[i]!r}")
    return probs


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify"
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    declared = set(oracle)
    produced = {os.path.basename(p) for p in glob.glob(os.path.join(outdir, "*")) if os.path.isdir(p)}
    failures = {}
    for name in sorted(declared):
        sdf = load_spark(outdir, name)
        if sdf is None:
            failures[name] = ["no spark output"]
            continue
        try:
            ddf = con.execute(oracle[name]).df()
        except Exception as e:
            failures[name] = [f"oracle SQL error: {e}"]
            continue
        probs = diff(name, norm(sdf), norm(ddf))
        if probs:
            failures[name] = probs
    for name in sorted(produced - declared):
        sdf = load_spark(outdir, name)
        n = 0 if sdf is None else len(sdf)
        tag = "OK (no-oracle, rows>0)" if n > 0 else "EMPTY (no-oracle, rows==0!)"
        print(f"[compare] {name}: {tag} rows={n}")
        if n == 0:
            # the verify gate's contract: no EMPTY no-oracle rows — enforce
            # it in the exit code, not just the log line
            failures[name] = ["no-oracle query produced 0 rows"]
    ok = len(declared) - len(failures)
    print(f"[compare] oracled: {ok}/{len(declared)} match")
    for name, probs in sorted(failures.items()):
        print(f"[compare] FAIL {name}")
        for p in probs:
            print(f"    {p}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
