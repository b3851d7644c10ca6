"""Round-11 optimization gates.

Pins the round-11 rewrites' contracts:

1. graph_cc's frontier-only (delta) propagation computes EXACTLY the
   textbook all-neighbors form, round for round — checked against a plain
   non-frontier reference loop built here from the same edge set.
2. llm_minhash_est_err's signature panel is cached and consumed by both
   pair-join sides (the pre-round-11 form recomputed the O(n²)-hashed
   panel once per side).
3. bench.py's measurement-honesty hook: reset_edge_memo really evicts the
   memoized co-purchase edge cache, so every timed bench run rebuilds the
   edges cold (VERDICT r10 item 1).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from air_quality_data_pipeline_spark.operators import graph as graph_mod
from air_quality_data_pipeline_spark.registry import load_all_queries

SPECS = load_all_queries()


def test_cc_frontier_matches_textbook_propagation(spark, sf_dir):
    """lab_k = min(lab_{k-1}, min over ALL neighbors of lab_{k-1}) is the
    contract; the frontier form only joins CHANGED labels. Rebuild the
    textbook form here (no frontier, no persist) and require row-for-row
    equality after _CC_ITERS rounds."""
    edges = graph_mod._copurchase_edges(spark, sf_dir)
    lab = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(graph_mod._CC_ITERS):
        neigh_min = (
            edges.join(lab, edges.src == lab.node)
            .select(F.col("dst").alias("node"), "lbl")
            .groupBy("node")
            .agg(F.min("lbl").alias("minl"))
        )
        lab = (
            lab.alias("l")
            .join(neigh_min.alias("m"), "node", "left")
            .select(
                "node", F.least(F.col("lbl"), F.coalesce("minl", "lbl")).alias("lbl")
            )
        )
    expected = {(r["node"], r["lbl"]) for r in lab.collect()}
    got = {
        (r["suppkey"], r["comp"])
        for r in SPECS["graph_cc"].builder(spark, sf_dir).collect()
    }
    assert got == expected

    got_shuffle = {
        (r["suppkey"], r["comp"])
        for r in SPECS["graph_cc_shuffle"].builder(spark, sf_dir).collect()
    }
    assert got_shuffle == expected


def test_est_err_panel_cached_for_both_join_sides(spark, sf_dir):
    """The signature panel must be persisted and read from cache by both
    pair-join sides instead of re-hashing the corpus per side."""
    df = SPECS["llm_minhash_est_err"].builder(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2, plan


def test_reset_edge_memo_evicts_cache(spark, sf_dir):
    """bench.py calls reset_edge_memo before every timed run; it must
    leave the memo empty so the next build recomputes from parquet."""
    df = graph_mod._copurchase_edges(spark, sf_dir)
    df.count()  # materialize + memoize
    assert graph_mod._EDGE_MEMO
    graph_mod.reset_edge_memo()
    assert not graph_mod._EDGE_MEMO
    # a fresh call rebuilds (and re-memoizes) without error
    assert graph_mod._copurchase_edges(spark, sf_dir).count() == df.count()
