#!/usr/bin/env python3
"""Ledger cross-check: every query gated in SparkEntry must be mentioned in
at least one scale/coverage ledger (SCALE.md, COVERAGE.md, BENCH_NOTES.md)
— i.e. it has either a measured 10x-curvature row, an output-adjudication
note, or a coverage-table entry. A query with no ledger mention is
unmeasured scale surface (round-13 verdict #7 class).

Known non-query "q_*" literals (column names etc.) are excluded here; add
to EXCLUDE when a new false positive appears, with a comment saying what
it actually is.

Usage: python3 tools/ledger_check.py   (run from the repo root; exits 1 on
any unmeasured query, 2 on usage/IO errors)
"""
import re
import sys

EXCLUDE = {
    "q_rank",  # percent_rank output column in q_quality_rank, not a query
}

LEDGERS = ["SCALE.md", "COVERAGE.md", "BENCH_NOTES.md"]
SRC = "src/main/scala/graft/SparkEntry.scala"


def main():
    try:
        src = open(SRC).read()
        ledger = "".join(open(p).read() for p in LEDGERS)
    except OSError as e:
        print(f"ledger_check: cannot read inputs: {e}")
        return 2
    # q\d*_ covers both q_-named rows and the TPC-H-named q1_pricing /
    # q3_shipping / q5_supplier / q10_returns (round-14 verdict: the q_-only
    # regex left those four invisible to this checker)
    qs = sorted(set(re.findall(r'"(q\d*_[a-z0-9_]+)"', src)) - EXCLUDE)
    missing = [q for q in qs if q not in ledger]
    if missing:
        print(f"FAIL: {len(missing)} of {len(qs)} queries have no ledger "
              f"mention in {'/'.join(LEDGERS)}: {missing}")
        return 1
    print(f"OK: {len(qs)} queries all ledger-covered")
    return 0


if __name__ == "__main__":
    sys.exit(main())
