#!/usr/bin/env python3
"""Local pre-validation harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sf_dir> <verify_out_dir>

Reads each <out_dir>/<name> parquet directory written by graft.Verify, runs
the matching oracle SQL from <out_dir>/oracle_sql.json against DuckDB views
over the same testdata parquet tables, and compares row counts, column names
(sorted), and values (rows sorted by all columns). Exits nonzero on any
mismatch so it can gate commits.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sc = [cols[i] for i in order]
    sr = sorted(
        [tuple(norm(r[i]) for i in order) for r in rows],
        key=lambda t: tuple((x is None, str(x)) for x in t))
    return sc, sr


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    oracles = json.loads(Path(out_dir, "oracle_sql.json").read_text())

    failures = []
    names = sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir())
    for name in names:
        got = con.sql(f"FROM '{out_dir}/{name}/*.parquet'")
        gcols, grows = got.columns, got.fetchall()
        if name not in oracles:
            print(f"  {name:24s} rows={len(grows):7d}  (no oracle: rows-only)")
            continue
        try:
            exp = con.sql(oracles[name])
            ecols, erows = exp.columns, exp.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"  {name:24s} ORACLE SQL ERROR: {e}")
            continue
        gc, gr = canon(gcols, grows)
        ec, er = canon(ecols, erows)
        status = []
        if gc != ec:
            status.append(f"cols {gc} != {ec}")
        if len(gr) != len(er):
            status.append(f"rows {len(gr)} != {len(er)}")
        elif gr != er:
            bad = sum(1 for a, b in zip(gr, er) if a != b)
            for a, b in zip(gr, er):
                if a != b:
                    status.append(f"values differ in {bad}/{len(gr)} rows; first: {a} != {b}")
                    break
        if status:
            failures.append(name)
            print(f"  {name:24s} FAIL: {'; '.join(status)}")
        else:
            print(f"  {name:24s} rows={len(gr):7d}  OK")

    missing = sorted(set(oracles) - set(names))
    for name in missing:
        failures.append(name)
        print(f"  {name:24s} MISSING OUTPUT (query failed in Verify?)")
    print(f"{len(names) - len([f for f in failures if f in names])}/{len(names)} outputs OK; "
          f"{len(failures)} failures")
    # an EMPTY comparison is a failure, not a vacuous pass: round 12's
    # official correctness record shipped as {} because the driver's check
    # died on oracle cost, and nothing downstream noticed — zero compared
    # outputs means the gate did not run, so say so loudly
    if not names:
        print("EMPTY RESULT SET: no query outputs were compared — "
              "treat this gate as FAILED, not passed")
        sys.exit(2)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
