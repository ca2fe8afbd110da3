#!/usr/bin/env python3
"""Oracle type-discipline lint: fail on any oracle output column whose
DuckDB type is not bit-stable through the driver's pandas/typed hash path.

Why: the driver's compare hashes TYPED values after sorting columns by
name. DuckDB renders HUGEINT/UHUGEINT/DECIMAL through pandas as float64
(e.g. sum(BIGINT) -> HUGEINT -> 500.0) while Spark writes BIGINT 500 —
values identical, hash mismatch. `q_chi2` was red for two rounds on
exactly this; a DESCRIBE sweep over the oracle bank finds it in <5 s.

Usage: python3 tools/oracle_type_lint.py <sf_dir> <oracle_sql.json>
       (run after graft.Verify has dumped oracle_sql.json; any
        SPARK_GRAFT_ONLY filter still dumps the FULL oracle bank)

Exits nonzero if any oracle output column is HUGEINT/UHUGEINT/DECIMAL,
or if DESCRIBE itself errors (malformed SQL never reaches the driver).
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types whose DuckDB->pandas conversion is not bit-identical to the Spark
# parquet column a correctly-aliased query would produce. Hard failures.
BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")

# Raw-float output columns are the OTHER flake class (the round-9 q_chi2
# value flake was a double computed with different summation orders): any
# engine-order-sensitive arithmetic that lands in a DOUBLE output can
# hash-mismatch. Warn — rounded doubles (round(x, 6) similarity scores)
# are an accepted, measured-stable idiom — but every warned column should
# be a deliberate choice, not an unaliased accident.
WARN = ("DOUBLE", "FLOAT", "REAL")


def main():
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    oracles = json.loads(Path(oracle_json).read_text())

    failures = []
    warnings = []
    for name in sorted(oracles):
        try:
            desc = con.sql(f"DESCRIBE {oracles[name]}").fetchall()
        except Exception as e:
            failures.append((name, f"DESCRIBE error: {e}"))
            continue
        for col, typ, *_ in desc:
            if any(b in typ.upper() for b in BAD):
                failures.append((name, f"column `{col}` is {typ}"))
            elif any(w in typ.upper() for w in WARN):
                warnings.append((name, f"column `{col}` is {typ}"))

    for name, why in warnings:
        print(f"  {name:24s} type-lint warn: {why} "
              f"(floating output — must be rounded/deliberate)")
    if failures:
        for name, why in failures:
            print(f"  {name:24s} TYPE LINT FAIL: {why}")
        print(f"{len(failures)} type-lint failures / {len(oracles)} oracles "
              f"({len(warnings)} float warnings)")
        sys.exit(1)
    print(f"oracle type lint: {len(oracles)} oracles clean "
          f"(no {'/'.join(BAD)} output columns; "
          f"{len(warnings)} deliberate-float warnings)")


if __name__ == "__main__":
    main()
