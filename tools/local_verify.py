#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate.

Runs DuckDB oracle SQL from Verify.scala's oracle_sql.json against the
same parquet tables and compares with the Spark-side parquet dumps
(columns sorted by name, rows sorted, values compared cell-by-cell).

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/gv"`:
    python3 tools/local_verify.py /root/testdata/sf0.01 /tmp/gv [name...]
    python3 tools/local_verify.py --json OUT.json SFDIR OUTDIR [name...]

--json writes a machine-readable artifact in the driver's shape:
    {name: {rows_match, schema_match, hash_match, err}} — committed each
round as CORRECTNESS_LOCAL_r{N}.json so the round carries a diffable
correctness file even when the driver-side capture fails.
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
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sfdir, outdir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    report = {}
    def record(name, rows_match, schema_match, hash_match, err=None):
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "err": err}
    for name in sorted(os.listdir(outdir)):
        path = os.path.join(outdir, name)
        if not os.path.isdir(path) or (only and name not in only):
            continue
        files = glob.glob(f"{path}/*.parquet")
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").df() if files \
            else pd.DataFrame()
        if name not in oracle:
            # informational only: a legitimately-empty result is not a
            # failure, so record the row count rather than a pass/fail
            # derived from non-emptiness
            print(f"  {name:34s} rows-only: {len(got)} rows")
            record(name, None, None, None, f"rows-only (no oracle): {len(got)} rows")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"✗ {name:34s} ORACLE SQL ERROR: {e}")
            record(name, False, False, False, f"oracle sql error: {e}")
            n_bad += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"✗ {name:34s} COLUMNS spark={list(g.columns)} oracle={list(e.columns)}")
            record(name, False, False, False,
                   f"columns spark={list(g.columns)} oracle={list(e.columns)}")
            n_bad += 1
            continue
        if len(g) != len(e):
            print(f"✗ {name:34s} ROWS spark={len(g)} oracle={len(e)}")
            record(name, False, True, False, f"rows spark={len(g)} oracle={len(e)}")
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
            record(name, True, not dt_mism, False,
                   "; ".join(mism[:3]) + (f" DTYPES {dt_mism}" if dt_mism else ""))
            n_bad += 1
        else:
            print(f"✓ {name:34s} {len(g)} rows")
            record(name, True, True, True)
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sfdir, "n_ok": n_ok, "n_bad": n_bad,
                       "queries": report}, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
