#!/usr/bin/env python3
"""Generate the REALISTIC-dup-density 10x dataset (/tmp/sf1r by default).

gen10x.py's corpus is adversarially dup-dense (round-14 verdict #4): every
document sits in a 10-member near-dup family (cross-copy trigram Jaccard
~0.96), and every embedding sits in a ~10-member moderate-cosine neighbor
family — which drives both the 16,464x dedup pair blowup and the
"dispersal regime" behind the flat IVF's n^1.95 cost note. Production
corpora carry ~1-2% duplicates, not 90%.

This variant keeps the same row counts and id spaces but makes copies
1..9 GENUINELY DIFFERENT documents/vectors, except a deterministic
~`dup_permille`/1000 sample of (row, copy) pairs that stay near-dups:

- documents: non-dup copies reverse the text and stamp a copy token
  (trigram overlap with the source collapses); dup copies keep the
  gen10x ' zzC' suffix (near-dup family member). n_chars = length(text).
- embeddings: non-dup copies get 8x the gen10x noise amplitude (the
  vector is mostly noise -> neighbor families disperse organically);
  dup copies keep the small +-0.24 perturbation.
- events / customer / orders / part: identical to gen10x (pure id
  shifts; dup density is a text/vector notion).

Driver-side tooling only (duckdb); the engine under test never imports it.

Usage: python3 tools/gen10x_real.py [src_dir] [out_dir] [copies] [dup_permille]
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1r"
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
dup_permille = int(sys.argv[4]) if len(sys.argv) > 4 else 15

os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.sql("SET threads TO 16")

# deterministic per-(id, copy) dup coin: a multiplicative hash mixed
# through a large modulus (the gen10x noise lesson: a small final modulus
# applied directly to a linear form makes the outcome depend on id only
# through id mod m)
DUP = ("((({id} * 2654435761 + c.c * 40503) % 2147483647) % 1000) "
       f"< {dup_permille}")

con.sql(f"""
COPY (
  WITH c AS (SELECT unnest(generate_series(0, {copies - 1})) AS c),
  m AS (SELECT max(doc_id) + 1 AS shift FROM '{src}/documents.parquet')
  SELECT d.doc_id + c.c * m.shift AS doc_id,
         CASE WHEN c.c = 0 THEN d.text
              WHEN {DUP.format(id='d.doc_id')} THEN d.text || ' zz' || c.c
              ELSE reverse(d.text) || ' uq' || (d.doc_id * 10 + c.c) END AS text,
         d.lang, d.source,
         CASE WHEN c.c = 0 THEN d.n_chars
              WHEN {DUP.format(id='d.doc_id')}
                THEN d.n_chars + 3 + length(CAST(c.c AS VARCHAR))
              ELSE d.n_chars + 4 + length(CAST(d.doc_id * 10 + c.c AS VARCHAR))
         END AS n_chars
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
                       i -> (((e.vec_id * 1103515245 + i * 12345 + c.c * 987654321) % 2147483647) % 17 - 8)
                            * CASE WHEN {DUP.format(id='e.vec_id')} THEN 0.03 ELSE 0.24 END)),
                   p -> CAST(p[1] + p[2] AS FLOAT)) END AS embedding,
         e.label
  FROM '{src}/embeddings.parquet' e, c, m
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")

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
