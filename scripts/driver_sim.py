"""Simulate the verification driver: plain SparkSession, import the contract,
run entry() at sf0.001, then every oracle-checked query at sf0.01 vs DuckDB."""
import sys, time, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

# driver-like session: defaults only (no engine confs) — catches hidden assumptions
spark = (SparkSession.builder.master("local[16]").appName("driver-sim").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

t0 = time.time()
df = e.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}, {time.time()-t0:.1f}s")
print("entry first row:", rows[0])
assert len(rows) > 0

qs = e.queries()
os_ = e.oracle_sql()
print(f"queries: {len(qs)}, oracles: {len(os_)}")

import duckdb
from air_quality_data_pipeline_spark.oracle import check_query
SF = "/root/testdata/sf0.01"
fails = []
for name in sorted(os_):
    t = time.time()
    try:
        probs = check_query(qs[name](spark, SF), os_[name], SF)
    except Exception as ex:
        probs = [f"EXCEPTION {type(ex).__name__}: {str(ex)[:200]}"]
    status = "OK" if not probs else "MISMATCH"
    print(f"{name:22s} {status:8s} {time.time()-t:5.1f}s" + ("" if not probs else " :: " + probs[0][:150]))
    if probs: fails.append(name)
# rows-only queries must run
for name in sorted(set(qs) - set(os_)):
    try:
        n = qs[name](spark, SF).count()
        print(f"{name:22s} ROWS-ONLY n={n}")
    except Exception as ex:
        print(f"{name:22s} ROWS-ONLY EXCEPTION: {str(ex)[:150]}"); fails.append(name)
print("FAILS:", fails if fails else "none")
sys.exit(1 if fails else 0)
