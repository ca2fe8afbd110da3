#!/usr/bin/env python3
"""Generate the 10x scaling-measurement dataset (/tmp/sf1 by default).

Replicates the sf0.1 bench tables 10x with id-shifted copies:
- documents: copy 0 is verbatim; copies 1..9 append a per-copy token to the
  text, so cross-copy pairs are NEAR-dups. CAVEAT (measured, round 9):
  the suffix perturbation leaves cross-copy trigram Jaccard at ~0.96, so
  every doc sits in a 10-member above-threshold family — per-doc dup
  density is multiplied by the copy count, and the TRUE pair output of
  dedup queries grows ~(copies choose 2) per family (~3 orders of
  magnitude here). Scaling ratios for pair-emitting dedup queries on this
  corpus therefore measure output growth, not corpus growth; compare
  runtimes against result counts (see SCALE.md round-9 re-measurement)
  or strengthen the perturbation if family-free scaling is wanted.
- events: pure id shift (event_id, user_id) — the streaming-CC and sketch
  workloads only need volume.
- embeddings: copies get deterministic per-(vec_id, dim, copy) additive
  noise (+-0.24 max), so copies are NOT trivially cosine-near — bucketed
  ANN/near-dup candidate growth stays organic rather than manufactured.
  The noise mixes through a LARGE modulus before the final % 17: a direct
  (a*v + b*i + c) % 17 form makes the whole noise VECTOR depend on v only
  through v mod 17, i.e. 17 giant classes sharing one large noise vector —
  manufactured near-dup clusters that blow up any pair space quadratically
  (observed: 62x at 10x on the ensemble near-dup query).

Driver-side tooling only (duckdb); the engine under test never imports it.
Round 8 built the same dataset ad hoc and did not save the generator —
this is the saved, re-runnable version (documents output is equivalent in
shape; exact texts may differ from round 8's ad-hoc perturbation).

Usage: python3 tools/gen10x.py [src_dir] [out_dir] [copies]
"""
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

import os

os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.sql("SET threads TO 16")

con.sql(f"""
COPY (
  WITH c AS (SELECT unnest(generate_series(0, {copies - 1})) AS c),
  m AS (SELECT max(doc_id) + 1 AS shift FROM '{src}/documents.parquet')
  SELECT d.doc_id + c.c * m.shift AS doc_id,
         CASE WHEN c.c = 0 THEN d.text ELSE d.text || ' zz' || c.c END AS text,
         d.lang, d.source,
         CASE WHEN c.c = 0 THEN d.n_chars
              ELSE d.n_chars + 4 + CAST(c.c >= 10 AS BIGINT) END AS n_chars
  FROM '{src}/documents.parquet' d, c, m
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")

con.sql(f"""
COPY (
  WITH c AS (SELECT unnest(generate_series(0, {copies - 1})) AS c),
  m AS (SELECT max(event_id) + 1 AS eshift, max(user_id) + 1 AS ushift
        FROM '{src}/events.parquet')
  SELECT e.event_id + c.c * m.eshift AS event_id, e.ts,
         e.user_id + c.c * m.ushift AS user_id,
         e.event_type, e.value, e.props
  FROM '{src}/events.parquet' e, c, m
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")

con.sql(f"""
COPY (
  WITH c AS (SELECT unnest(generate_series(0, {copies - 1})) AS c),
  m AS (SELECT max(vec_id) + 1 AS shift FROM '{src}/embeddings.parquet')
  SELECT e.vec_id + c.c * m.shift AS vec_id,
         CASE WHEN c.c = 0 THEN e.embedding
              ELSE list_transform(list_zip(e.embedding,
                     list_transform(generate_series(1, len(e.embedding)),
                       i -> (((e.vec_id * 1103515245 + i * 12345 + c.c * 987654321) % 2147483647) % 17 - 8) * 0.03)),
                   p -> CAST(p[1] + p[2] AS FLOAT)) END AS embedding,
         e.label
  FROM '{src}/embeddings.parquet' e, c, m
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")

# graph-side tables (round 8 measured these at 10x with an ad-hoc dataset;
# saved here): pure id shifts keep the customer-order graph's degree
# structure per copy while the `o_orderkey % n_customer` target derivation
# re-mixes cross-copy, so the 10x graph is organically connected rather
# than 10 disjoint replicas.
con.sql(f"""
COPY (
  WITH c AS (SELECT unnest(generate_series(0, {copies - 1})) AS c),
  m AS (SELECT max(c_custkey) + 1 AS shift FROM '{src}/customer.parquet')
  SELECT k.c_custkey + c.c * m.shift AS c_custkey,
         'Customer#' || lpad(CAST(k.c_custkey + c.c * m.shift AS VARCHAR), 9, '0') AS c_name,
         k.c_nationkey, k.c_acctbal, k.c_mktsegment
  FROM '{src}/customer.parquet' k, c, m
) TO '{out}/customer.parquet' (FORMAT PARQUET)
""")

con.sql(f"""
COPY (
  WITH c AS (SELECT unnest(generate_series(0, {copies - 1})) AS c),
  m AS (SELECT max(o_orderkey) + 1 AS oshift FROM '{src}/orders.parquet'),
  mc AS (SELECT max(c_custkey) + 1 AS cshift FROM '{src}/customer.parquet')
  SELECT o.o_orderkey + c.c * m.oshift AS o_orderkey,
         o.o_custkey + c.c * mc.cshift AS o_custkey,
         o.* EXCLUDE (o_orderkey, o_custkey)
  FROM '{src}/orders.parquet' o, c, m, mc
) TO '{out}/orders.parquet' (FORMAT PARQUET)
""")

con.sql(f"""
COPY (
  WITH c AS (SELECT unnest(generate_series(0, {copies - 1})) AS c),
  m AS (SELECT max(p_partkey) + 1 AS shift FROM '{src}/part.parquet')
  SELECT p.p_partkey + c.c * m.shift AS p_partkey,
         p.* EXCLUDE (p_partkey)
  FROM '{src}/part.parquet' p, c, m
) TO '{out}/part.parquet' (FORMAT PARQUET)
""")

for t in ("documents", "events", "embeddings", "customer", "orders", "part"):
    n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")
