#!/usr/bin/env python3
"""Loud validator for a driver-written CORRECTNESS_r*.json.

Usage: python3 tools/assert_correctness.py <file> [min_queries]

Round 12's official record shipped as an empty `{}` (the driver's oracle
check died on DuckDB cost and wrote nothing) and the bank silently read as
"untested" even though a full re-run proved 312/312 green. This exits
nonzero — with a one-line reason — when the file is missing, unparseable,
empty, smaller than min_queries (default 300), or carries any non-green
row, so an empty record is a FAILURE someone sees, never a shrug.
"""
import json
import sys


def main():
    if len(sys.argv) < 2:
        print("usage: assert_correctness.py <CORRECTNESS_r*.json> [min_queries]")
        return 2
    path = sys.argv[1]
    min_q = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    try:
        d = json.load(open(path))
    except Exception as e:
        print(f"FAIL: {path} unreadable/unparseable: {e}")
        return 2
    if not isinstance(d, dict) or not d:
        print(f"FAIL: {path} is empty ({d!r}) — the correctness gate DID NOT RUN")
        return 2
    if len(d) < min_q:
        print(f"FAIL: {path} carries only {len(d)} queries (< {min_q}) — undersized record")
        return 2
    bad = sorted(n for n, r in d.items()
                 if not (isinstance(r, dict) and r.get("rows_match")
                         and r.get("schema_match") and r.get("hash_match")))
    if bad:
        print(f"FAIL: {len(bad)}/{len(d)} queries not green: {', '.join(bad[:10])}"
              + (" ..." if len(bad) > 10 else ""))
        return 1
    print(f"OK: {len(d)} queries, all green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
