"""Synthesize a 10x (sf1) dataset from the driver's sf0.1 fixtures.

The driver ships sf{0.001,0.01,0.1} only; the scaling study (BASELINE.md)
needs one decade more. We replicate each FACT table 10x with per-replica
key offsets so every foreign key still resolves to exactly one parent —
join fan-outs, group cardinalities per key, and skew shape are preserved,
which is how the real data would scale. Dimension tables (region, nation)
stay fixed, as they would in a real star schema.

Two tables need content perturbation, not just key offsets, to scale
honestly:

- ``documents``: verbatim 10x copies would give every doc 9 exact
  duplicates, inflating MinHash/exact-dedup candidate sets ~45x
  (quadratic in copies) instead of the ~10x a genuinely larger corpus
  produces. Each replica r>0 suffixes every word with ``_r`` — shingle
  sets across replicas become disjoint (no cross-replica near-dups)
  while the WITHIN-replica near-dup density the generator planted is
  preserved, so dedup work scales linearly like real data.
- ``embeddings``: same argument for cosine near-dup pairs; each replica
  rotates the vector by r positions (norm-preserving, direction-changing).

``events.ts`` is stored as parquet TIMESTAMP(NANOS) (which Spark's
vectorized reader rejects; tables.table() reads it via nanosAsLong) — we
write plain BIGINT epoch-nanos, which the same nanosAsLong read path
accepts unchanged.

Usage: python scripts/make_sf1.py [src_dir] [dst_dir] [replicas]
Defaults: /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import pathlib
import sys

import duckdb

REPLICAS = 10

# per-table max-key offsets are computed from the source so replica r's keys
# occupy [r*(max+1), (r+1)*(max+1)) — disjoint, order-preserving ranges.
FACT_SQL = {
    "customer": """
        SELECT c_custkey + r.r * (1 + (SELECT max(c_custkey) FROM src)) AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM src, range({n}) r(r)""",
    "supplier": """
        SELECT s_suppkey + r.r * (1 + (SELECT max(s_suppkey) FROM src)) AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM src, range({n}) r(r)""",
    "part": """
        SELECT p_partkey + r.r * (1 + (SELECT max(p_partkey) FROM src)) AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM src, range({n}) r(r)""",
    "orders": """
        SELECT o_orderkey + r.r * (1 + (SELECT max(o_orderkey) FROM src)) AS o_orderkey,
               o_custkey + r.r * (1 + (SELECT max(c_custkey)
                                       FROM '{src_dir}/customer.parquet')) AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM src, range({n}) r(r)""",
    "lineitem": """
        SELECT l_orderkey + r.r * (1 + (SELECT max(o_orderkey)
                                        FROM '{src_dir}/orders.parquet')) AS l_orderkey,
               l_partkey + r.r * (1 + (SELECT max(p_partkey)
                                       FROM '{src_dir}/part.parquet')) AS l_partkey,
               l_suppkey + r.r * (1 + (SELECT max(s_suppkey)
                                       FROM '{src_dir}/supplier.parquet')) AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM src, range({n}) r(r)""",
    "events": """
        SELECT event_id + r.r * (1 + (SELECT max(event_id) FROM src)) AS event_id,
               epoch_ns(ts) AS ts,
               user_id + r.r * (1 + (SELECT max(user_id) FROM src)) AS user_id,
               event_type, value, props
        FROM src, range({n}) r(r)""",
    "documents": """
        SELECT doc_id + r.r * (1 + (SELECT max(doc_id) FROM src)) AS doc_id,
               CASE WHEN r.r = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)', '\\1_' || r.r, 'g')
               END AS text,
               lang, source,
               CAST(length(CASE WHEN r.r = 0 THEN text
                                ELSE regexp_replace(text, '(\\S+)', '\\1_' || r.r, 'g')
                           END) AS BIGINT) AS n_chars
        FROM src, range({n}) r(r)""",
    "embeddings": """
        SELECT vec_id + r.r * (1 + (SELECT max(vec_id) FROM src)) AS vec_id,
               CASE WHEN r.r = 0 THEN embedding
                    ELSE list_concat(embedding[r.r + 1:], embedding[1:r.r])
               END AS embedding,
               label
        FROM src, range({n}) r(r)""",
}
DIM_SQL = {name: "SELECT * FROM src" for name in ("region", "nation")}


def main() -> None:
    src_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else REPLICAS
    pathlib.Path(dst_dir).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    # events.ts vintage-awareness: a source produced by THIS script already
    # stores ts as epoch-ns BIGINT (the driver's legacy encoding), so a
    # second decade (sf1 -> sf10) must pass it through instead of
    # re-encoding a timestamp.
    ts_type = con.execute(
        f"SELECT typeof(ts) FROM '{src_dir}/events.parquet' LIMIT 1"
    ).fetchone()[0]
    for name, sql in {**DIM_SQL, **FACT_SQL}.items():
        if name == "events" and ts_type == "BIGINT":
            sql = sql.replace("epoch_ns(ts) AS ts,", "ts,")
        q = sql.format(n=n, src_dir=src_dir).replace(
            "FROM src", f"FROM '{src_dir}/{name}.parquet'"
        )
        con.execute(
            f"COPY ({q}) TO '{dst_dir}/{name}.parquet' (FORMAT PARQUET, CODEC ZSTD)"
        )
        rows = con.execute(f"SELECT count(*) FROM '{dst_dir}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {rows} rows")


if __name__ == "__main__":
    main()
