"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop write (full evaluation of every
column on every row, no driver transfer). The headline set spans the engine:
scan→join→agg→topk (flagship), the shuffle-heavy relational core, windows,
batch time-windowing, and the LLM-pipeline operators (dedup / similarity /
text / multimodal).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship",
    "join_dim",
    "join_bcast",
    "agg_cube",
    "agg_stats",
    "topk",
    "win_latest",
    "win_frame",
    "st_tumble",
    "proj_select",
    "llm_exact_dedup",
    "llm_minhash_dedup",
    "llm_sim_search",
    "llm_sim_search_ivf",
    "llm_text_stats",
    "llm_fingerprint",
    "mm_decode",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    from pyspark.sql import SparkSession

    from air_quality_data_pipeline_spark.session import apply_engine_conf

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("air-quality-pipeline-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    apply_engine_conf(spark)

    from air_quality_data_pipeline_spark.registry import load_all_queries

    specs = load_all_queries()

    # warm the JVM/session on the smallest fixture so the first measured
    # query doesn't pay one-time init (codegen compiler, parquet footer
    # caches, Python worker pool)
    for warm in ("flagship", "mm_decode"):
        specs[warm].builder(spark, "/root/testdata/sf0.001").write.mode(
            "overwrite"
        ).format("noop").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = specs[name].builder(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": f"headline_{len(HEADLINE)}q_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
