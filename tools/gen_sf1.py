#!/usr/bin/env python
"""Generate a PERF-PROBE-ONLY sf1 slice (10x sf0.1) by key-offset
replication — correctness is still graded exclusively on the driver's
read-only /root/testdata SFs; this slice exists so tools/scale_probe.py
can fit one more decade (VERDICT r7 item 8).

    python tools/gen_sf1.py          # writes $SPARK_GRAFT_SF1_DIR
                                     # (default /root/repo/_testdata/sf1)

Construction (DuckDB, deterministic, ~45 s):
  - 10 replicas of every scaling table; replica i offsets every key
    family by i * stride, with strides chosen to preserve the engine's
    structural assumptions: custkey stays < 1,000,000 (the graph lanes'
    supplier-offset boundary), suppkey stays tiny vs the +1e6 offset,
    per-user event_id order is preserved (ts-ordered ids stay ts-ordered
    under a constant shift).
  - `documents.text` tokens are salted per replica ("r{i}" prefix on
    every token, replica 0 untouched): identical replicated texts would
    COLLAPSE in exact-dedup stages (undershooting near-dup work 10x)
    while lightly-perturbed texts would CROSS-MATCH in LSH bands
    (overshooting candidate pairs 100x); disjoint per-replica vocabularies
    make each replica an independent corpus — the honest 10x.
  - dims (nation, region) are copied as-is, like TPC-H at every SF.
  - graph structure: replicas are disjoint components, so unroll-slack
    properties (BFS eccentricity, k-core cascade depth, LPA fixpoint)
    are exactly sf0.1's — asserted cheaply in the probe, not re-measured.
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/_testdata/sf1")
REPLICAS = 10

# key strides (>= 10x the max observed key, comments note the constraint)
S_ORDER = 10_000_000  # l/o_orderkey
S_CUST = 100_000  # o/c_custkey: 10 replicas top out at 915k < 1e6 (graph
# lanes offset suppliers by +1e6; customer ids must stay below it)
S_SUPP = 10_000  # s/l_suppkey
S_PART = 100_000  # p/l_partkey
S_USER = 100_000  # events.user_id
S_EVENT = 10_000_000  # events.event_id (constant shift keeps ts order)
S_DOC = 1_000_000  # documents.doc_id (stays far below the 2^43 stride cap)
S_VEC = 100_000  # embeddings.vec_id

TEMPLATES = {
    "lineitem": (
        "SELECT l_orderkey + {i} * {S_ORDER} AS l_orderkey, "
        "l_partkey + {i} * {S_PART} AS l_partkey, "
        "l_suppkey + {i} * {S_SUPP} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate FROM src"
    ),
    "orders": (
        "SELECT o_orderkey + {i} * {S_ORDER} AS o_orderkey, "
        "o_custkey + {i} * {S_CUST} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM src"
    ),
    "customer": (
        "SELECT c_custkey + {i} * {S_CUST} AS c_custkey, "
        "c_name || ' r' || {i} AS c_name, c_nationkey, c_acctbal, "
        "c_mktsegment FROM src"
    ),
    "supplier": (
        "SELECT s_suppkey + {i} * {S_SUPP} AS s_suppkey, "
        "s_name || ' r' || {i} AS s_name, s_nationkey, s_acctbal FROM src"
    ),
    "part": (
        "SELECT p_partkey + {i} * {S_PART} AS p_partkey, "
        "p_name || ' r' || {i} AS p_name, p_brand, p_type, p_size, "
        "p_retailprice FROM src"
    ),
    "events": (
        "SELECT event_id + {i} * {S_EVENT} AS event_id, ts, "
        "user_id + {i} * {S_USER} AS user_id, event_type, value, props "
        "FROM src"
    ),
    "documents": (
        "SELECT doc_id + {i} * {S_DOC} AS doc_id, "
        "CASE WHEN {i} = 0 THEN text ELSE array_to_string("
        "list_transform(str_split(text, ' '), x -> 'r{i}' || x), ' ') END "
        "AS text, lang, source, "
        "CAST(LENGTH(CASE WHEN {i} = 0 THEN text ELSE array_to_string("
        "list_transform(str_split(text, ' '), x -> 'r{i}' || x), ' ') END) "
        "AS BIGINT) AS n_chars FROM src"
    ),
    # replica i rotates the 64-dim vector by 6*i positions: verbatim copies
    # would give every vector 10 bit-identical twins (exact/cluster stages
    # collapse them = 10x undershoot; LSH buckets concentrate them = up to
    # 100x pair overshoot — the same failure modes the document salting
    # prevents); rotations of near-random vectors are ~orthogonal to the
    # original and to each other, so each replica behaves like an
    # independent corpus while norms and value distribution are preserved.
    "embeddings": (
        "SELECT vec_id + {i} * {S_VEC} AS vec_id, "
        "CASE WHEN {i} = 0 THEN embedding "
        "ELSE embedding[{i} * 6 + 1:] || embedding[1:{i} * 6] END "
        "AS embedding, label FROM src"
    ),
}

COPY_AS_IS = ["nation", "region"]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    strides = {k: v for k, v in globals().items() if k.startswith("S_")}
    for tbl, tmpl in TEMPLATES.items():
        con.execute(
            f"CREATE OR REPLACE VIEW src AS "
            f"SELECT * FROM '{SRC}/{tbl}.parquet'"
        )
        selects = " UNION ALL ".join(
            tmpl.format(i=i, **strides) for i in range(REPLICAS)
        )
        con.execute(
            f"COPY ({selects}) TO '{OUT}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{OUT}/{tbl}.parquet'").fetchone()[0]
        print(f"{tbl}: {n} rows")
    for tbl in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{tbl}.parquet') "
            f"TO '{OUT}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        print(f"{tbl}: copied")
    con.close()
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
