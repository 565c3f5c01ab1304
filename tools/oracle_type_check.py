#!/usr/bin/env python3
"""Fail if any oracle output column has a hash-fragile DuckDB type.

DuckDB widens SUM over integers to HUGEINT and arithmetic keeps it wide;
the driver's result hasher serializes HUGEINT differently than BIGINT, so
a value-identical result can hash-mismatch (the q151 r10 incident). Every
oracle's final select must therefore land on BIGINT/DOUBLE/VARCHAR/BOOL
etc. — never HUGEINT/UHUGEINT/DECIMAL.

Usage: tools/oracle_type_check.py <dump_dir_with_oracle_sql.json> <sf_dir>
"""
import glob
import json
import os
import sys

import duckdb


def main() -> int:
    dump, sf = sys.argv[1], sys.argv[2]
    sql = json.load(open(os.path.join(dump, "oracle_sql.json")))
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf, "*.parquet")):
        t = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    bad = []
    for name, q in sorted(sql.items()):
        try:
            desc = con.execute(f"DESCRIBE ({q})").fetchall()
        except Exception as e:  # an unrunnable oracle is its own failure
            bad.append((name, "<error>", str(e).splitlines()[0][:120]))
            continue
        for col, typ, *_ in desc:
            if typ in ("HUGEINT", "UHUGEINT") or typ.startswith("DECIMAL"):
                bad.append((name, col, typ))
    for name, col, typ in bad:
        print(f"FRAGILE {name}.{col}: {typ}")
    print(f"{len(sql)} oracles checked, {len(bad)} fragile columns")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
