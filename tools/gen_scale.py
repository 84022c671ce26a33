#!/usr/bin/env python3
"""Scale-curve fixture generator (VERDICT r9 #4).

Replicates the driver's sf0.1 tables to sf0.3 / sf1 by R-fold replication
with deterministic id offsets, so the heavy dedup/graph family can be
benched at 3 scale points:

- customer: fresh dense keys 0..N-1 with the Customer#%09d name pattern
  (the q127/q128 blocking structure densifies exactly as TPC-H would);
  other columns cycle from the base rows.
- orders/lineitem: per-replica key offsets (orderkey/custkey/suppkey/
  partkey), giving R disjoint copies of the supplier-customer graph —
  per-iteration join work scales linearly in rows, which is the
  data-proportionality axis this fixture measures (skew is measured
  separately by SkewBench's purpose-built fixtures).
- documents: doc_id offset + a per-replica ROTATION of the closed
  31-token vocabulary: within-replica dup structure is preserved
  verbatim, cross-replica shingles diverge, so near-dup density stays
  constant while n grows.

Usage: python3 tools/gen_scale.py OUTROOT  (writes OUTROOT/sf0.3, OUTROOT/sf1)
"""
import os
import sys

import duckdb

BASE = "/root/testdata/sf0.1"
VOCAB = ['a', 'agg', 'batch', 'big', 'column', 'customer', 'data', 'dup',
         'fast', 'filter', 'group', 'hash', 'join', 'key', 'line', 'merge',
         'order', 'part', 'query', 'row', 'scan', 'slow', 'small', 'sort',
         'spark', 'stream', 'table', 'the', 'value', 'vector', 'window']
PASSTHROUGH = ["region", "nation", "supplier", "part", "events"]


def gen(out, reps):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW reps AS SELECT unnest(range({reps})) AS r")
    vocab_sql = "[" + ",".join(f"'{t}'" for t in VOCAB) + "]"

    con.execute(f"""
      COPY (
        SELECT (r.r * 15000 + b.c_custkey) AS c_custkey,
               printf('Customer#%09d', r.r * 15000 + b.c_custkey) AS c_name,
               b.c_nationkey, b.c_acctbal, b.c_mktsegment
        FROM '{BASE}/customer.parquet' b, reps r
        ORDER BY 1
      ) TO '{out}/customer.parquet' (FORMAT parquet)""")

    okmax, cmax = con.execute(
        f"SELECT max(o_orderkey) + 1, 15000 FROM '{BASE}/orders.parquet'").fetchone()
    smax, pmax = con.execute(
        f"SELECT max(l_suppkey) + 1, max(l_partkey) + 1 FROM '{BASE}/lineitem.parquet'").fetchone()
    con.execute(f"""
      COPY (
        SELECT (r.r * {okmax} + b.o_orderkey) AS o_orderkey,
               (r.r * {cmax} + b.o_custkey) AS o_custkey,
               b.o_orderstatus, b.o_totalprice, b.o_orderdate, b.o_orderpriority
        FROM '{BASE}/orders.parquet' b, reps r ORDER BY 1
      ) TO '{out}/orders.parquet' (FORMAT parquet)""")
    con.execute(f"""
      COPY (
        SELECT (r.r * {okmax} + b.l_orderkey) AS l_orderkey,
               (r.r * {pmax} + b.l_partkey) AS l_partkey,
               (r.r * {smax} + b.l_suppkey) AS l_suppkey,
               b.l_linenumber, b.l_quantity, b.l_extendedprice, b.l_discount,
               b.l_tax, b.l_returnflag, b.l_linestatus, b.l_shipdate
        FROM '{BASE}/lineitem.parquet' b, reps r ORDER BY 1
      ) TO '{out}/lineitem.parquet' (FORMAT parquet)""")

    con.execute(f"""
      COPY (
        WITH v(vs) AS (SELECT {vocab_sql})
        SELECT doc_id, text, lang, source, length(text) AS n_chars FROM (
          SELECT (r.r * 5000 + b.doc_id) AS doc_id,
                 array_to_string(list_transform(string_split(b.text, ' '),
                   t -> coalesce(vs[((list_position(vs, t) - 1 + r.r) % 31) + 1], t)),
                   ' ') AS text,
                 b.lang, b.source
          FROM '{BASE}/documents.parquet' b, reps r, v) ORDER BY 1
      ) TO '{out}/documents.parquet' (FORMAT parquet)""")

    # embeddings: vec_id offset + a per-replica ROTATION of the dims —
    # norms (and the global quantization scale) are preserved verbatim,
    # neighbor structure diverges across replicas, so the ANN working set
    # grows linearly while per-replica geometry stays identical
    nvec = con.execute(
        f"SELECT max(vec_id) + 1 FROM '{BASE}/embeddings.parquet'").fetchone()[0]
    con.execute(f"""
      COPY (
        SELECT (r.r * {nvec} + b.vec_id) AS vec_id,
               (b.embedding[(r.r % len(b.embedding)) + 1:] ||
                b.embedding[:(r.r % len(b.embedding))]) AS embedding,
               b.label
        FROM '{BASE}/embeddings.parquet' b, reps r ORDER BY 1
      ) TO '{out}/embeddings.parquet' (FORMAT parquet)""")

    for t in PASSTHROUGH:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)
    con.close()
    print(f"{out}: reps={reps} done")


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_scale"
    gen(f"{root}/sf0.3", 3)
    gen(f"{root}/sf1", 10)
