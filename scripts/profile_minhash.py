"""Profile llm_minhash_dedup's shuffle/spill per stage (VERDICT r7 item 3).

Runs the query at the given fixture dir, then reads the Spark UI REST API
for per-stage shuffle-write / spill / input bytes so the sf30 DNF-(disk)
can be attributed to a specific plan object: the persisted shingle arrays,
the band-bucket exchange, or the verify joins' array exchanges.

Usage: python scripts/profile_minhash.py [sf_dir] [query_name]
Defaults: /tmp/sf1 llm_minhash_dedup
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    name = sys.argv[2] if len(sys.argv) > 2 else "llm_minhash_dedup"

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", "32")
        .appName(f"profile-{name}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from air_quality_data_pipeline_spark.registry import load_all_queries

    spec = load_all_queries()[name]
    t0 = time.time()
    n = spec.builder(spark, sf_dir).count()
    wall = time.time() - t0
    print(f"{name} @ {sf_dir}: {n} rows in {wall:.1f}s\n")

    api = f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{spark.sparkContext.applicationId}"
    stages = json.load(urllib.request.urlopen(f"{api}/stages?status=complete"))
    stages.sort(key=lambda s: -(s["shuffleWriteBytes"] + s["diskBytesSpilled"]))
    gib = 1 << 30
    print(
        f"{'stage':>5} {'shufWrite':>10} {'shufRead':>10} {'spillMem':>10} "
        f"{'spillDisk':>10} {'input':>10}  name"
    )
    for s in stages:
        print(
            f"{s['stageId']:>5} "
            f"{s['shuffleWriteBytes'] / gib:>9.2f}G "
            f"{s['shuffleReadBytes'] / gib:>9.2f}G "
            f"{s['memoryBytesSpilled'] / gib:>9.2f}G "
            f"{s['diskBytesSpilled'] / gib:>9.2f}G "
            f"{s['inputBytes'] / gib:>9.2f}G  "
            f"{s['name'].splitlines()[0][:70]}"
        )
    tot_w = sum(s["shuffleWriteBytes"] for s in stages) / gib
    tot_sp = sum(s["diskBytesSpilled"] for s in stages) / gib
    print(f"\ntotal shuffle write {tot_w:.2f} GiB, total disk spill {tot_sp:.2f} GiB")

    rdds = json.load(urllib.request.urlopen(f"{api}/storage/rdd"))
    for r in rdds:
        print(
            f"persisted RDD {r['id']}: mem {r['memoryUsed'] / gib:.2f} GiB, "
            f"disk {r['diskUsed'] / gib:.2f} GiB, {r['numCachedPartitions']} parts"
        )
    spark.stop()


if __name__ == "__main__":
    main()
