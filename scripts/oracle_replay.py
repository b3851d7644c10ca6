"""Full oracle replay at an arbitrary sf_dir (default /tmp/sf1 — 10x the
driver's scale): run every registered oracle-checked query in Spark AND its
DuckDB oracle SQL on the same parquet, compare exactly (oracle.check_query).

Correctness-at-scale evidence: a query that only passes at small sf (hash
overflow, skew-sensitive float folds, output growing super-linearly) fails
here. Rows-only queries just have to execute.

Usage: python scripts/oracle_replay.py [sf_dir] [--skip name,name,...]
                                                [--only name,name,...]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/tmp/sf1"
skip = set()
only = None
for i, a in enumerate(sys.argv):
    if a == "--skip" and i + 1 < len(sys.argv):
        skip = set(sys.argv[i + 1].split(","))
    if a == "--only" and i + 1 < len(sys.argv):
        only = set(sys.argv[i + 1].split(","))

from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[16]").appName("oracle-replay")
         .config("spark.driver.memory", "24g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from air_quality_data_pipeline_spark.registry import load_all_queries
from air_quality_data_pipeline_spark.oracle import check_query

specs = load_all_queries()
fails = []
for name, spec in sorted(specs.items()):
    if only is not None and name not in only:
        continue
    if name in skip:
        print(f"{name:24s} SKIPPED"); continue
    t = time.time()
    try:
        if spec.oracle is None:
            n = spec.builder(spark, sf_dir).count()
            print(f"{name:24s} ROWS-ONLY n={n} {time.time()-t:6.1f}s")
            continue
        probs = check_query(spec.builder(spark, sf_dir), spec.oracle, sf_dir)
    except Exception as ex:
        probs = [f"EXCEPTION {type(ex).__name__}: {str(ex)[:200]}"]
    status = "OK" if not probs else "MISMATCH"
    print(f"{name:24s} {status:8s} {time.time()-t:6.1f}s" + ("" if not probs else " :: " + probs[0][:160]), flush=True)
    if probs:
        fails.append(name)
print("FAILS:", fails if fails else "none")
sys.exit(1 if fails else 0)
