#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate.

Runs DuckDB oracle SQL from Verify.scala's oracle_sql.json against the
same parquet tables and compares with the Spark-side parquet dumps
(columns sorted by name, rows sorted, values compared cell-by-cell).

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/gv"`:
    python3 tools/local_verify.py /root/testdata/sf0.01 /tmp/gv [name...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize: timestamps → iso strings, floats rounded repr
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(outdir)):
        path = os.path.join(outdir, name)
        if not os.path.isdir(path) or (only and name not in only):
            continue
        files = glob.glob(f"{path}/*.parquet")
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").df() if files \
            else pd.DataFrame()
        if name not in oracle:
            print(f"  {name:34s} rows-only: {len(got)} rows")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"✗ {name:34s} ORACLE SQL ERROR: {e}")
            n_bad += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"✗ {name:34s} COLUMNS spark={list(g.columns)} oracle={list(e.columns)}")
            n_bad += 1
            continue
        if len(g) != len(e):
            print(f"✗ {name:34s} ROWS spark={len(g)} oracle={len(e)}")
            n_bad += 1
            continue
        # dtype check (schema match) then values
        mism = []
        for c in g.columns:
            gv, ev = g[c], e[c]
            if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(ev.dtype, np.floating):
                bad = ~(np.isclose(gv.astype(float), ev.astype(float), rtol=0, atol=0.0,
                                   equal_nan=True))
            else:
                bad = ~((gv == ev) | (gv.isna() & ev.isna()))
            bad = np.asarray(bad)
            if bad.any():
                i = int(np.argmax(bad))
                mism.append(f"{c}[row{i}]: spark={gv.iloc[i]!r} oracle={ev.iloc[i]!r} (n={int(bad.sum())})")
        sdt = {c: str(g[c].dtype) for c in g.columns}
        edt = {c: str(e[c].dtype) for c in e.columns}
        dt_mism = {c: (sdt[c], edt[c]) for c in g.columns
                   if sdt[c] != edt[c] and not (sdt[c].startswith("float") and edt[c].startswith("float"))}
        if mism or dt_mism:
            print(f"✗ {name:34s} {'; '.join(mism[:3])} {('DTYPES ' + str(dt_mism)) if dt_mism else ''}")
            n_bad += 1
        else:
            print(f"✓ {name:34s} {len(g)} rows")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
