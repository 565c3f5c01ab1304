#!/usr/bin/env python3
"""Driver-replica oracle check (dev tool, runs with the driver-side python).

Usage: python3 tools/check_oracle.py /tmp/vout /root/testdata/sf0.01

Loads each <out>/<query> parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the testdata tables, sorts
columns by name on both sides (like the driver), and compares values exactly.
"""
import json, sys, glob, os
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return [c for c in sorted(cols)], out

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(t).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    # queries that threw wrote no output dir — surface them instead of
    # silently skipping (Verify records them in failures.json)
    fpath = f"{outdir}/failures.json"
    if os.path.exists(fpath):
        for qname, err in json.load(open(fpath)).items():
            fail += 1
            print(f"✗ {qname}: QUERY FAILED: {err[:200]}")
    for qdir in sorted(glob.glob(f"{outdir}/q*")):
        qname = os.path.basename(qdir)
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        gcols, grows = got.columns, got.fetchall()
        if qname not in oracle:
            print(f"  {qname}: rows-only ({len(grows)} rows)")
            continue
        want = con.sql(oracle[qname])
        wcols, wrows = want.columns, want.fetchall()
        gc, gr = canon(grows, gcols)
        wc, wr = canon(wrows, wcols)
        status = []
        if gc != wc:
            status.append(f"COLS spark={gc} duck={wc}")
        if len(gr) != len(wr):
            status.append(f"ROWCOUNT spark={len(gr)} duck={len(wr)}")
        elif gc == wc:
            sg, sw = sorted(map(repr, gr)), sorted(map(repr, wr))
            diffs = [(a, b) for a, b in zip(sg, sw) if a != b]
            if diffs:
                status.append(f"{len(diffs)} VALUE DIFFS e.g. spark={diffs[0][0]} duck={diffs[0][1]}")
        if status:
            fail += 1
            print(f"✗ {qname}: " + "; ".join(status))
        else:
            ok += 1
            print(f"✓ {qname} ({len(gr)} rows)")
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
