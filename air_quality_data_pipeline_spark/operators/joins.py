"""Join operators (SURVEY.md §2.C).

The reference's joins are imperative: a dict build+probe (reference
main.py:152-161, 238-241), a "kept iff produced rows" semi join
(main.py:273-275), and a per-key correlated fetch loop (main.py:220-226).
Here each becomes a declarative equi-join; Catalyst/AQE pick broadcast vs
sort-merge, and explicit ``broadcast()`` hints pin the build side where we
know the dimension is small — at 100 TB that's the difference between a
map-side join and a full fact-table shuffle.
"""

from __future__ import annotations

import itertools
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.exact import exact_sum, exact_sum_sql
from ..registry import register
from ..session import apply_engine_conf
from ..tables import rebalance_for_map, table

_BUCKET_COUNTER = itertools.count()

_JOIN_BCAST_ORACLE = """
SELECT p_brand, COUNT(*) AS line_cnt, SUM(l_quantity) AS sum_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size <= 25
GROUP BY p_brand
"""


@register("join_bcast", oracle=_JOIN_BCAST_ORACLE, tags=("join",))
def join_bcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join, small build side (the reference's sensor_map
    dict, main.py:152-161, probed per measurement at main.py:238-241).

    ``part`` is filtered before broadcast, so the fact table never shuffles.
    """
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("line_cnt"), F.sum("l_quantity").alias("sum_qty"))
    )


_JOIN_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
"""


@register("join_semi", oracle=_JOIN_SEMI_ORACLE, tags=("join",))
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with ≥1 completed order (reference
    main.py:273-275 keeps stations that produced ≥1 valid row)."""
    apply_engine_conf(spark)
    cust = table(spark, sf_dir, "customer")
    done = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(done, cust.c_custkey == done.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


_JOIN_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
"""


@register("join_anti", oracle=_JOIN_ANTI_ORACLE, tags=("join",))
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no pending orders (complement of the
    reference's warn-and-skip at main.py:211-213)."""
    apply_engine_conf(spark)
    cust = table(spark, sf_dir, "customer")
    pending = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return cust.join(pending, cust.c_custkey == pending.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


_JOIN_DIM_ORACLE = f"""
SELECT r_name AS region, n_name AS nation,
       COUNT(*) AS order_cnt,
       {exact_sum_sql('o_totalprice')} AS total_revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


@register("join_dim", oracle=_JOIN_DIM_ORACLE, tags=("join",))
def join_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dimension enrichment (the reference tags every row with
    its config city, main.py:209, 263): orders ⋈ customer ⋈ nation ⋈ region
    with all dimensions broadcast."""
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            exact_sum(F.col("o_totalprice")).alias("total_revenue"),
        )
    )


_JOIN_NESTED_CORR_ORACLE = """
SELECT c_custkey, c_name,
       (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS order_cnt
FROM customer
"""


@register("join_nested_corr", oracle=_JOIN_NESTED_CORR_ORACLE, tags=("join",))
def join_nested_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated per-key lookup (the reference's per-location /latest fetch
    loop, main.py:220-226) flattened into one aggregate + outer join — the
    N-network-calls pattern becomes a single distributed join."""
    apply_engine_conf(spark)
    cust = table(spark, sf_dir, "customer")
    counts = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return cust.join(counts, cust.c_custkey == counts.o_custkey, "left").select(
        "c_custkey",
        "c_name",
        F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("order_cnt"),
    )


# --- join_salted: skew mitigation (beyond-reference scale technique) ---------

_SALTS = 8

_JOIN_SALTED_ORACLE = """
WITH fact AS (
  SELECT o_orderkey, o_custkey % 10 AS hot_key, o_totalprice FROM orders
),
dim AS (
  SELECT n_nationkey % 10 AS hot_key, MIN(n_name) AS dim_name
  FROM nation GROUP BY n_nationkey % 10
)
SELECT f.hot_key, d.dim_name, COUNT(*) AS cnt,
       CAST(SUM(CAST(f.o_totalprice AS DECIMAL(20, 4))) AS DOUBLE) AS total
FROM fact f JOIN dim d ON f.hot_key = d.hot_key
GROUP BY f.hot_key, d.dim_name
"""


@register("join_salted", oracle=_JOIN_SALTED_ORACLE, tags=("join", "scale"))
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join for skewed keys: the fact side's key is deliberately
    collapsed to 10 hot values (every key ~10% of all rows — pathological
    skew). The fact side appends a content-derived salt, the dim side
    explodes x8, and the join runs on (key, salt) — splitting each hot key
    across 8 tasks instead of melting one reducer. Result is provably
    identical to the unsalted join (the oracle IS the unsalted join).
    AQE's skew-split handles moderate skew automatically; explicit salting
    is the deterministic fallback for extreme generators like this.

    The salt projection is wrapped in coalesce(..., 0) to make it
    NON-NULLABLE: InferFiltersFromConstraints only generates isnotnull
    constraints for nullable join keys, and the inferred isnotnull(salt)
    used to be alias-substituted into the scan Filter, re-evaluating the
    md5 per row (the round-8 sweep's 2x constant — VERDICT r8 item 4).
    Semantics are unchanged-or-better: a null o_orderkey now salts to 0
    and joins (matching the unsalted oracle) instead of being dropped."""
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    fact = orders.select(
        "o_orderkey",
        (F.col("o_custkey") % 10).alias("hot_key"),
        "o_totalprice",
        F.coalesce(
            F.expr(
                "cast(conv(substring(md5(cast(o_orderkey as string)), 1, 8), 16, 10) as bigint)"
            )
            % _SALTS,
            F.lit(0),
        ).alias("salt"),
    )
    dim = (
        nation.groupBy((F.col("n_nationkey") % 10).alias("hot_key"))
        .agg(F.min("n_name").alias("dim_name"))
        .withColumn("salt", F.explode(F.expr(f"sequence(0, {_SALTS - 1})")))
    )
    return (
        fact.join(dim, ["hot_key", "salt"])
        .groupBy("hot_key", "dim_name")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(20,4)")).cast("double").alias("total"),
        )
    )


# --- join_bucketed: co-located (zero-exchange) join --------------------------

_JOIN_BUCKETED_ORACLE = """
SELECT o.o_custkey, COUNT(*) AS order_cnt,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(20, 4))) AS DOUBLE) AS total,
       MIN(c.c_name) AS c_name
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY o.o_custkey
"""


@register("join_bucketed", oracle=_JOIN_BUCKETED_ORACLE, tags=("join", "scale"))
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: both sides are written bucketed by the join
    key (8 buckets), so the join consumes the tables' bucketing as its
    required distribution — NO exchange on either side (asserted in
    tests/test_plans.py). At 100 TB this is the difference between
    shuffling two fact tables per join and shuffling them once at write
    time for every future join; the groupBy on the same key also reuses
    the bucketing."""
    apply_engine_conf(spark)
    import tempfile

    base = tempfile.mkdtemp(prefix="bucketed_")
    n = next(_BUCKET_COUNTER)
    ot, ct = f"orders_b_{os.getpid()}_{n}", f"customer_b_{os.getpid()}_{n}"
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    (orders.write.mode("overwrite").option("path", f"{base}/{ot}")
        .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable(ot))
    (cust.write.mode("overwrite").option("path", f"{base}/{ct}")
        .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable(ct))
    o, c = spark.table(ot), spark.table(ct)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(20,4)")).cast("double").alias("total"),
            F.min("c_name").alias("c_name"),
        )
    )


# --- join_asof: as-of (nearest-preceding-event) join -------------------------

_JOIN_ASOF_ORACLE = """
WITH p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
SELECT p.user_id,
       epoch_us(p.ts) AS purchase_us,
       epoch_us(c.ts) AS asof_click_us,
       p.value
FROM p ASOF JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
"""


@register("join_asof", oracle=_JOIN_ASOF_ORACLE, tags=("join", "timeseries"))
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — an operator Spark lacks natively, built as the
    single-shuffle union+window formulation: tag both sides, union, sort
    within each user by (ts, side) so a click at the same instant precedes
    the purchase, and carry the latest click timestamp forward with
    last(..., ignorenulls) over a running row frame. ONE exchange on
    user_id total — versus a naive range join, which at 100 TB degenerates
    to per-key nested loops. Oracle is DuckDB's native ASOF JOIN (inner,
    equality included), proving the rewrite implements textbook as-of
    semantics."""
    apply_engine_conf(spark)
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros(F.to_timestamp("ts")).alias("us"), "value", F.lit(0).alias("side")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_micros(F.to_timestamp("ts")).alias("us"),
        F.lit(None).cast("double").alias("value"), F.lit(1).alias("side"),
    )
    # side=1 (click) sorts before side=0 (purchase) at equal ts via desc
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("us"), F.desc("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = p.unionByName(c).withColumn(
        "asof_click_us",
        F.last(F.when(F.col("side") == 1, F.col("us")), ignorenulls=True).over(w),
    )
    return (
        tagged.filter((F.col("side") == 0) & F.col("asof_click_us").isNotNull())
        .select("user_id", F.col("us").alias("purchase_us"), "asof_click_us", "value")
    )


# --- join_range: interval join via bucket expansion --------------------------

_RANGE_WIDTH = 25000.0  # bucket width; each 50k band spans exactly 2 buckets

_JOIN_RANGE_ORACLE = """
WITH bands AS (
  SELECT n_nationkey AS band_id,
         n_nationkey * 50000.0 AS lo,
         (n_nationkey + 1) * 50000.0 AS hi
  FROM nation WHERE n_nationkey < 12
)
SELECT b.band_id, COUNT(*) AS cnt,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(20, 4))) AS DOUBLE) AS total
FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band_id
"""


@register("join_range", oracle=_JOIN_RANGE_ORACLE, tags=("join", "timeseries"))
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join — rewritten as a bucket-expansion equi-join:
    facts compute bucket = floor(price / width); each band row is exploded
    to the buckets it overlaps; the join runs on bucket equality and the
    exact range predicate refines survivors. Work scales with
    rows x overlap (2 buckets/band here), not rows x bands — the standard
    cure for non-equi joins that Catalyst would otherwise plan as a
    broadcast nested loop over every (row, band) pair."""
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    bands = (
        nation.filter(F.col("n_nationkey") < 12)
        .select(
            F.col("n_nationkey").alias("band_id"),
            (F.col("n_nationkey") * 50000.0).alias("lo"),
            ((F.col("n_nationkey") + 1) * 50000.0).alias("hi"),
        )
        .withColumn(
            "bucket",
            F.explode(F.expr(f"sequence(cast(floor(lo / {_RANGE_WIDTH}) as bigint), "
                             f"cast(floor((hi - 0.0001) / {_RANGE_WIDTH}) as bigint))")),
        )
    )
    facts = orders.select(
        "o_totalprice",
        F.floor(F.col("o_totalprice") / _RANGE_WIDTH).cast("bigint").alias("bucket"),
    )
    return (
        facts.join(F.broadcast(bands), "bucket")
        .filter((F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")))
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(20,4)")).cast("double").alias("total"),
        )
    )


# --- join_outer ---------------------------------------------------------------

_JOIN_OUTER_ORACLE = """
WITH o AS (
  SELECT o_custkey, COUNT(*) AS order_cnt,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE) AS total_spend
  FROM orders GROUP BY o_custkey
)
SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
       c.c_name,
       COALESCE(o.order_cnt, 0) AS order_cnt,
       COALESCE(o.total_spend, 0.0) AS total_spend,
       CAST(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END AS INT) AS orphan_order,
       CAST(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END AS INT) AS inactive_customer
FROM customer c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
"""


@register("join_outer", oracle=_JOIN_OUTER_ORACLE, tags=("join",))
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — the reconciliation shape (which side is missing?)
    the other join demos can't express: customers with no orders AND
    orders whose customer is gone survive, with COALESCE key/metric
    repair. Orders are pre-aggregated per customer BEFORE the join (the
    exchange carries one row per customer, not per order), and both sides
    then hash-partition on the same key — at 100 TB this is one shuffle
    per side into a sort-merge full join, no broadcast (full outer can't
    broadcast) and no row explosion. The spend sum is DECIMAL-exact."""
    apply_engine_conf(spark)
    cu = table(spark, sf_dir, "customer")
    od = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_spend"),
        )
    )
    j = cu.join(od, cu.c_custkey == od.o_custkey, "full_outer")
    return j.select(
        F.coalesce(cu.c_custkey, od.o_custkey).alias("custkey"),
        cu.c_name,
        F.coalesce(od.order_cnt, F.lit(0)).alias("order_cnt"),
        F.coalesce(od.total_spend, F.lit(0.0)).alias("total_spend"),
        F.when(cu.c_custkey.isNull(), 1).otherwise(0).cast("int").alias("orphan_order"),
        F.when(od.o_custkey.isNull(), 1).otherwise(0).cast("int").alias("inactive_customer"),
    )


# --- join_runtime_filter ------------------------------------------------------

_JOIN_RTF_ORACLE = """
SELECT o.o_orderdate,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18, 2))) AS DOUBLE) AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
  AND o.o_orderdate >= DATE '1995-03-01' AND o.o_orderdate < DATE '1995-04-01'
GROUP BY o.o_orderdate
"""

# aggressive thresholds so the optimizer injects the bloom filter at test
# scale too (the defaults gate on a 10 GB application-side scan — exactly
# the 100 TB regime this operator demonstrates); scoped to this query and
# restored by the builder.
_RTF_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # the optimizer (correctly) skips runtime filters when the creation side
    # is broadcastable — a broadcast join already prunes at the probe. The
    # 100 TB regime this operator demonstrates is dim-too-big-to-broadcast
    # but small-enough-to-bloom; emulate it at test scale by disabling
    # auto-broadcast for this one query (restored by apply_engine_conf).
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@register("join_runtime_filter", oracle=_JOIN_RTF_ORACLE, tags=("join", "scale"))
def join_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join: a selective dimension-side predicate
    (urgent orders from one month, ~1/60 of orders) is turned by the
    optimizer into a bloom filter that is evaluated ON THE FACT SCAN, so
    lineitem rows for non-qualifying orders die before the shuffle — the
    row-level analog of partition pruning, and at 100 TB the difference
    between shuffling the whole fact table and shuffling 2%% of it. The
    merge hint keeps the join a shuffle SMJ (a broadcast join would already
    prune at the probe; runtime filters exist for the case where the
    creation side fits a bloom filter but not a broadcast table).
    tests/test_plans.py asserts the injected ``bloom_filter_might_contain``
    predicate; the result itself is conf-independent and oracle-checked."""
    apply_engine_conf(spark)
    for k, v in _RTF_CONFS.items():
        spark.conf.set(k, v)
    od = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("1995-03-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1995-04-01").cast("date"))
        )
        .select("o_orderkey", "o_orderdate")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    j = li.hint("merge").join(od, F.col("l_orderkey") == F.col("o_orderkey"))
    return j.groupBy("o_orderdate").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.expr("CAST(l_extendedprice AS DECIMAL(18,2))"))
        .cast("double")
        .alias("revenue"),
    )


# --- join_fuzzy ---------------------------------------------------------------

# Blocked fuzzy join: an incoming "dirty" batch (10% of part names, each
# with one character deterministically dropped near the tail) is matched
# against the master by edit distance. The blocking key — the name's first
# word, untouched by the tail perturbation — turns the O(n*m) all-pairs
# edit-distance problem into per-bucket work (sum of bucket_a*bucket_b),
# which is THE practical fuzzy-join formulation at scale: the equi-join on
# the block key shuffles/broadcasts like any join, and Levenshtein runs
# only inside buckets. Levenshtein is the classic DP (integer result,
# verified identical in Spark and DuckDB), so the whole match is
# oracle-checkable.
_FUZZY_MAXDIST = 2

_JOIN_FUZZY_ORACLE = f"""
WITH master AS (
  SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk FROM part
),
dirty AS (
  SELECT p_partkey AS dirty_id,
         substring(p_name, 1, length(p_name) - (p_partkey % 5) - 2)
           || substring(p_name, length(p_name) - (p_partkey % 5), 64) AS dirty_name,
         string_split(p_name, ' ')[1] AS blk
  FROM part WHERE p_partkey % 10 = 3
),
cand AS (
  SELECT d.dirty_id, d.dirty_name, m.p_partkey, m.p_name,
         levenshtein(d.dirty_name, m.p_name) AS dist
  FROM dirty d JOIN master m ON m.blk = d.blk
  WHERE levenshtein(d.dirty_name, m.p_name) <= {_FUZZY_MAXDIST}
)
SELECT dirty_id,
       (MIN(struct_pack(dist := dist, p_partkey := p_partkey))).p_partkey AS matched_id,
       (MIN(struct_pack(dist := dist, p_partkey := p_partkey))).dist AS distance,
       COUNT(*) AS n_candidates
FROM cand GROUP BY dirty_id
"""


@register("join_fuzzy", oracle=_JOIN_FUZZY_ORACLE, tags=("join", "llm"))
def join_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join (entity resolution): dirty batch vs master on a
    blocking-key equi-join, Levenshtein <= 2 inside buckets only, best
    match per dirty record via the min(struct(dist, key)) argmin aggregate
    (map-side combinable — no window over the candidate stream). The
    blocking key is the name's first word, which the synthetic tail
    corruption never touches; at 100 TB the block join is an ordinary
    shuffle/broadcast join and the edit-distance DP runs on bucket-local
    pairs — never all pairs."""
    apply_engine_conf(spark)
    part = table(spark, sf_dir, "part")
    master = part.select(
        "p_partkey", "p_name", F.expr("split(p_name, ' ')[0]").alias("blk")
    )
    dirty = part.filter(F.col("p_partkey") % 10 == 3).select(
        F.col("p_partkey").alias("dirty_id"),
        F.expr(
            "concat(substring(p_name, 1, length(p_name) - (p_partkey % 5) - 2),"
            " substring(p_name, length(p_name) - (p_partkey % 5), 64))"
        ).alias("dirty_name"),
        F.expr("split(p_name, ' ')[0]").alias("blk"),
    )
    # part.parquet is far under one split at bench scale, so the probe side
    # streamed through the broadcast join as ONE partition and the whole
    # candidate x levenshtein pipeline ran on one core (profiled: a single
    # 3.5 s task was 99% of this query's wall at sf0.1). Round-robin the
    # 10% dirty batch first — a few KB exchanged vs the DP spread 32-way.
    dirty = rebalance_for_map(dirty, spark)
    # two candidate-pruning layers ahead of the DP: (1) |len(a)−len(b)| ≤ k
    # is a NECESSARY condition for edit distance ≤ k — a length compare
    # removes most in-block pairs before any DP; (2) the threshold form of
    # levenshtein runs the BANDED O(n·k) DP with early exit (returns -1
    # past the threshold) instead of the full O(n·m) table. Same result
    # set; measured 1.37x faster at sf0.1 (A/B, median of 5, same session).
    cand = (
        dirty.join(master, "blk")
        .filter(
            F.abs(F.length("dirty_name") - F.length("p_name")) <= _FUZZY_MAXDIST
        )
        .select(
            "dirty_id",
            "p_partkey",
            F.levenshtein("dirty_name", "p_name", _FUZZY_MAXDIST).alias("dist"),
        )
        .filter(F.col("dist") >= 0)
    )
    best = F.min(F.struct("dist", "p_partkey"))
    return cand.groupBy("dirty_id").agg(
        best["p_partkey"].alias("matched_id"),
        best["dist"].alias("distance"),
        F.count(F.lit(1)).alias("n_candidates"),
    )


# --- join_cross: explicit cartesian (both sides provably tiny) ---------------

_CROSS_ORACLE = """
SELECT r1.r_name AS region_a, r2.r_name AS region_b,
       CASE WHEN r1.r_regionkey < r2.r_regionkey THEN 1 ELSE 0 END AS ordered_pair
FROM region r1 CROSS JOIN region r2
"""


@register("join_cross", oracle=_CROSS_ORACLE, tags=("join",))
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product — the one join type the rest of this
    module is plan-gated AGAINST appearing by accident. It has exactly one
    legitimate shape at scale: both sides provably tiny (config/dimension
    cross products, parameter grids — here region x region, 25 rows). The
    API requires the intent to be explicit (``crossJoin``; SQL CROSS
    JOIN), which is the guard: a cartesian that appears WITHOUT this
    opt-in is a planning bug the test suite catches. Broadcast NL join at
    any cluster size — no exchange of the big... there is no big side, by
    contract."""
    apply_engine_conf(spark)
    r1 = table(spark, sf_dir, "region")
    r2 = table(spark, sf_dir, "region")
    return r1.alias("a").crossJoin(r2.alias("b")).select(
        F.col("a.r_name").alias("region_a"),
        F.col("b.r_name").alias("region_b"),
        F.when(F.col("a.r_regionkey") < F.col("b.r_regionkey"), 1)
        .otherwise(0)
        .alias("ordered_pair"),
    )


# --- join_spatial: grid-bucketed radius join ---------------------------------

# Synthetic geo: latitudes clamped to [-60, 60) so one 5-degree cell ring
# always covers the 250 km radius (lon cell width >= 111.19 * cos(60) * 5
# = 278 km). Coordinates are integer tenths of a degree derived from keys,
# so GRID CELLS are computable in exact integer arithmetic — candidate
# generation can never disagree between engines; only the final haversine
# verify touches floats (same expression, ROUND-stabilized output, the
# f_haversine parity rule).
_SPATIAL_RADIUS_M = 250000.0

_Q_LAT = "(CAST((c_custkey % 1200) AS DOUBLE) / 10.0 - 60.0)"
_Q_LON = "(CAST(((c_custkey * 7) % 3600) AS DOUBLE) / 10.0 - 180.0)"
_S_LAT = "(CAST((s_suppkey % 1200) AS DOUBLE) / 10.0 - 60.0)"
_S_LON = "(CAST(((s_suppkey * 7) % 3600) AS DOUBLE) / 10.0 - 180.0)"

from ..functions.geo import HAVERSINE_SQL as _HAV_SQL  # noqa: E402
from ..functions.geo import haversine_m as _haversine_m  # noqa: E402

_SPATIAL_DIST = _HAV_SQL.format(lat1=_Q_LAT, lon1=_Q_LON, lat2=_S_LAT, lon2=_S_LON)

_JOIN_SPATIAL_ORACLE = f"""
SELECT c_custkey, s_suppkey, ROUND({_SPATIAL_DIST}, 0) AS dist_m
FROM customer, supplier
WHERE {_SPATIAL_DIST} <= {_SPATIAL_RADIUS_M}
"""


@register("join_spatial", oracle=_JOIN_SPATIAL_ORACLE, tags=("join", "geo"))
def join_spatial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (spatial) join without a cartesian: every customer point
    matched to all supplier stations within 250 km. The oracle is the
    brute-force all-pairs filter (O(|C|x|S|) — fine for DuckDB at fixture
    scale, fatal at 100 TB); the Spark plan is the scale formulation:

    1. Bucket both sides into 5-degree grid cells — EXACT integer
       arithmetic on the key-derived tenth-degree lattice, so the
       candidate set is engine-reproducible by construction.
    2. Explode the station side to its 3x3 neighbor ring (lon wraps mod 72
       — haversine is antimeridian-correct, so the grid must be too);
       equi-join on the cell pair. A constant 9x on the SMALL side buys a
       ~cell-count reduction of the pair space — the same
       candidates-then-verify shape as llm_minhash_dedup and llm_emb_lsh,
       with geometry instead of hashing.
    3. Verify the exact haversine <= R on candidates only.

    The cell size is chosen so one ring always covers the radius at the
    clamped latitudes (docstring math above) — candidate RECALL is
    structural, not probabilistic. At 100 TB both sides shuffle once on
    the cell key (or the station side broadcasts when small); skewed
    cells (urban density) split under AQE like any hot join key."""
    apply_engine_conf(spark)
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey")
    q = cust.select(
        "c_custkey",
        F.expr(_Q_LAT).alias("qlat"),
        F.expr(_Q_LON).alias("qlon"),
        F.expr("(c_custkey % 1200) div 50").alias("cell_la"),
        F.expr("((c_custkey * 7) % 3600) div 50").alias("cell_lo"),
    )
    s = supp.select(
        "s_suppkey",
        F.expr(_S_LAT).alias("slat"),
        F.expr(_S_LON).alias("slon"),
        F.expr("(s_suppkey % 1200) div 50").alias("s_la"),
        F.expr("((s_suppkey * 7) % 3600) div 50").alias("s_lo"),
    ).select(
        "s_suppkey",
        "slat",
        "slon",
        F.explode(
            F.expr(
                "array(-1, 0, 1)"
            )
        ).alias("dla"),
        "s_la",
        "s_lo",
    ).select(
        "s_suppkey",
        "slat",
        "slon",
        (F.col("s_la") + F.col("dla")).alias("cell_la"),
        F.explode(F.expr("array(-1, 0, 1)")).alias("dlo"),
        "s_lo",
    ).select(
        "s_suppkey",
        "slat",
        "slon",
        "cell_la",
        ((F.col("s_lo") + F.col("dlo") + 72) % 72).alias("cell_lo"),
    )
    dist = _haversine_m(F.col("qlat"), F.col("qlon"), F.col("slat"), F.col("slon"))
    return (
        q.join(s, ["cell_la", "cell_lo"])
        .filter(dist <= F.lit(_SPATIAL_RADIUS_M))
        .select("c_custkey", "s_suppkey", F.round(dist, 0).alias("dist_m"))
    )


# --- join_nullsafe: null-safe equality join ----------------------------------

# NULL join keys are manufactured deterministically: the '4-NOT SPECIFIED'
# priority maps to NULL on BOTH sides (NULLIF), so the null-safe join must
# match the NULL bucket while a plain equi-join would silently drop it —
# the exact bug class this operator exists to demonstrate.
_JOIN_NULLSAFE_ORACLE = """
WITH dim AS (
  SELECT DISTINCT NULLIF(o_orderpriority, '4-NOT SPECIFIED') AS k,
         o_orderpriority AS label
  FROM orders
)
SELECT d.label, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(20, 4))) AS DOUBLE) AS revenue
FROM orders o
JOIN dim d
  ON NULLIF(o.o_orderpriority, '4-NOT SPECIFIED') IS NOT DISTINCT FROM d.k
GROUP BY d.label
ORDER BY d.label
"""


@register("join_nullsafe", oracle=_JOIN_NULLSAFE_ORACLE, tags=("join",))
def join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (Spark ``<=>`` / ANSI IS NOT DISTINCT FROM):
    NULL keys MATCH each other instead of vanishing. Plain equi-joins
    silently drop every NULL-keyed row — the classic fact-table leak when
    a dimension key is optional — and the standard workaround (COALESCE to
    a sentinel) corrupts data the moment a real key collides with the
    sentinel. ``eqNullSafe`` is the principled form, and Spark still plans
    it as a HASH join (keys compared under null-safe semantics), not a
    nested loop, so the 100 TB cost profile is identical to a normal
    equi-join: dim broadcast here, shuffle-hash on bigger dims. The NULL
    bucket is manufactured deterministically from a real priority value on
    both sides, so the oracle proves the NULL-match path carries exactly
    its rows."""
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    dim = (
        orders.select("o_orderpriority")
        .distinct()
        .select(
            F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")).alias("k"),
            F.col("o_orderpriority").alias("label"),
        )
    )
    fact = orders.select(
        F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")).alias("k1"),
        "o_totalprice",
    )
    return (
        fact.join(F.broadcast(dim), fact.k1.eqNullSafe(dim.k))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(20,4)")).cast("double").alias("revenue"),
        )
        .orderBy("label")
    )


# --- join_scd2: point-in-time (slowly-changing-dimension) join ---------------

# The dimension history is derived: each (customer, order date) opens a
# priority epoch valid until the customer's next order date (SCD-2
# [valid_from, valid_to) semantics). Probes are lineitems looked up AS OF
# their ship date. The oracle spells the textbook BETWEEN-join over
# lead()-derived epoch intervals; the engine uses the single-shuffle
# union+window formulation instead (join_asof note) — same semantics,
# no range join. The open epoch's end is a sentinel date, not NULL: an
# `OR vt IS NULL` inside the join condition blocks DuckDB's range-join
# machinery and degenerates to a nested loop at sf1 (measured hang).
_JOIN_SCD2_ORACLE = """
WITH dim AS (
  SELECT o_custkey AS ck, o_orderdate AS vf, max(o_orderpriority) AS prio
  FROM orders GROUP BY o_custkey, o_orderdate
),
epochs AS (
  SELECT ck, prio, vf,
         coalesce(lead(vf) OVER (PARTITION BY ck ORDER BY vf),
                  DATE '9999-12-31') AS vt
  FROM dim
),
probe AS (
  SELECT o.o_custkey AS ck, l.l_shipdate AS d,
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(20, 4)) AS rev
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT coalesce(e.prio, '0-BEFORE-HISTORY') AS epoch_priority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(p.rev) AS DOUBLE) AS revenue
FROM probe p LEFT JOIN epochs e
  ON p.ck = e.ck AND p.d >= e.vf AND p.d < e.vt
GROUP BY coalesce(e.prio, '0-BEFORE-HISTORY')
"""


@register("join_scd2", oracle=_JOIN_SCD2_ORACLE, tags=("join", "timeseries"))
def join_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 point-in-time lookup: attribute each lineitem to the
    priority epoch its customer was in ON THE SHIP DATE — the dimension-
    history join every warehouse runs against slowly-changing dims. The
    naive formulation is an interval join (equi-key + BETWEEN), which
    Spark plans as a per-key nested loop — quadratic in orders-per-
    customer at 100 TB. Instead: tag epoch-opens (is_dim=1) and probes
    (is_dim=0), union them, and run ONE window per customer ordered by
    (date, is_dim DESC) carrying last(prio, ignorenulls) forward — every
    probe picks up the newest epoch at or before its date in a single
    exchange. Same-date tie goes to the dimension (valid_from is
    inclusive), matching the oracle's d >= vf. Probes dated before the
    customer's first epoch (the fixture HAS lineitems shipping before
    their order date) land in an explicit '0-BEFORE-HISTORY' bucket —
    SCD lookups must surface, not silently drop, pre-history facts.
    Revenue folds DECIMAL-exact in the final per-epoch aggregate."""
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    dim = orders.groupBy(
        F.col("o_custkey").alias("ck"), F.col("o_orderdate").alias("d")
    ).agg(F.max("o_orderpriority").alias("prio"))
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_shipdate",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(20,4)")
        .alias("rev"),
    )
    probe = li.join(
        orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey")
    ).select(
        F.col("o_custkey").alias("ck"), F.col("l_shipdate").alias("d"), "rev"
    )
    dim_u = dim.select(
        "ck", "d", F.lit(1).alias("is_dim"), "prio",
        F.lit(None).cast("decimal(20,4)").alias("rev"),
    )
    probe_u = probe.select(
        "ck", "d", F.lit(0).alias("is_dim"),
        F.lit(None).cast("string").alias("prio"), "rev",
    )
    w = (
        Window.partitionBy("ck")
        .orderBy(F.col("d").asc(), F.col("is_dim").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = dim_u.unionByName(probe_u).withColumn(
        "epoch_priority",
        F.coalesce(
            F.last("prio", ignorenulls=True).over(w), F.lit("0-BEFORE-HISTORY")
        ),
    )
    return (
        tagged.filter(F.col("is_dim") == 0)
        .groupBy("epoch_priority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )


# --- join_interval_overlap: interval x interval overlap join ------------------

# Completes the temporal-join family: join_asof (point -> latest event),
# join_scd2 (point -> validity epoch), ts_interval_merge (coalescing),
# and now interval x interval OVERLAPS. Candidates come from a fixed
# time-grid equi-join (the join_spatial recipe in 1-D): the cell width
# equals the LONGEST interval, so every interval covers at most 2 cells
# and grid recall is STRUCTURAL — two intervals that overlap must share
# a cell. Exact overlap verifies on candidates only. All integer
# microseconds; the oracle is the direct inequality join (OR-free, so
# DuckDB plans its range join — the join_scd2 lesson).
_IVL_A_US = 2_400_000_000  # 40 min session intervals (clicks)
_IVL_B_US = 1_500_000_000  # 25 min incident intervals (purchases)
_IVL_CELL = _IVL_A_US  # grid cell = max interval length

_IVL_OVERLAP_ORACLE = f"""
WITH a AS (
  SELECT user_id, event_id AS a_id, epoch_us(ts) AS s,
         epoch_us(ts) + {_IVL_A_US} AS e
  FROM events WHERE event_type = 'click'
),
b AS (
  SELECT user_id, event_id AS b_id, epoch_us(ts) AS s,
         epoch_us(ts) + {_IVL_B_US} AS e
  FROM events WHERE event_type = 'purchase'
)
SELECT a.user_id, a.a_id, b.b_id,
       least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
FROM a JOIN b
  ON a.user_id = b.user_id AND a.s < b.e AND b.s < a.e
"""


@register("join_interval_overlap", oracle=_IVL_OVERLAP_ORACLE, tags=("join", "timeseries"))
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: every (session, incident) interval pair per
    user that overlaps in time, with the overlap duration — the temporal
    OVERLAPS workload behind incident attribution and concurrent-session
    billing. Spark plans a bare inequality join as a per-key nested loop
    (quadratic per user); instead each interval explodes to the <= 2
    fixed-width grid cells it covers (cell = longest interval, so shared-
    cell candidacy is structurally complete, never probabilistic), cells
    equi-join on (user, cell), and the exact predicate verifies the
    candidates — the same candidates-then-verify shape as join_spatial /
    MinHash, with a time grid instead of a lattice or hash family. The
    duplicate candidate a pair generates when both intervals straddle the
    same two cells is removed by a distinct on the pair key BEFORE the
    (cheap, integer) overlap columns are derived."""
    apply_engine_conf(spark)
    ev = table(spark, sf_dir, "events")
    us = F.unix_micros(F.to_timestamp("ts"))
    a = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("a_id"),
        us.alias("a_s"),
        (us + F.lit(_IVL_A_US)).alias("a_e"),
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("b_id"),
        us.alias("b_s"),
        (us + F.lit(_IVL_B_US)).alias("b_e"),
    )

    def cells(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "cell",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.expr(f"{s} div {_IVL_CELL}"),
                        F.expr(f"({e} - 1) div {_IVL_CELL}"),
                    )
                )
            ),
        )

    cand = (
        cells(a, "a_s", "a_e")
        .join(cells(b, "b_s", "b_e"), ["user_id", "cell"])
        .filter((F.col("a_s") < F.col("b_e")) & (F.col("b_s") < F.col("a_e")))
        .select("user_id", "a_id", "b_id", "a_s", "a_e", "b_s", "b_e")
        .distinct()
    )
    return cand.select(
        "user_id",
        "a_id",
        "b_id",
        (
            F.least(F.col("a_e"), F.col("b_e"))
            - F.greatest(F.col("a_s"), F.col("b_s"))
        ).alias("overlap_us"),
    )


# --- join_asof_nearest: tolerance + nearest-direction as-of -------------------

# Completes the as-of family (join_asof = backward/unbounded): pandas
# merge_asof(direction='nearest', tolerance=T) semantics — for every
# purchase the nearest click in EITHER direction within the tolerance,
# equidistant ties to the earlier (backward) click. Same single-shuffle
# union+window recipe: both directional candidates come from one sort —
# Catalyst hosts the preceding-frame last() and following-frame first()
# in ONE Window node — so tolerance+direction costs no extra exchange
# over plain as-of. The oracle is the direct argmin-within-band join,
# OR-free so DuckDB plans its range join (the join_scd2 lesson).
_ASOF_TOL_US = 43_200_000_000  # 12 h

_ASOF_NEAREST_ORACLE = f"""
WITH p AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
  WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'click'
),
j AS (
  SELECT p.user_id, p.event_id, p.us AS pus, c.us AS cus,
         ABS(c.us - p.us) AS dist,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY ABS(c.us - p.us), c.us) AS rn
  FROM p JOIN c ON c.user_id = p.user_id
   AND c.us >= p.us - {_ASOF_TOL_US} AND c.us <= p.us + {_ASOF_TOL_US}
)
SELECT user_id, event_id AS purchase_id, pus AS purchase_us, cus AS click_us,
       dist AS dist_us,
       CASE WHEN cus <= pus THEN 'backward' ELSE 'forward' END AS direction
FROM j WHERE rn = 1
"""


@register("join_asof_nearest", oracle=_ASOF_NEAREST_ORACLE, tags=("join", "timeseries"))
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join with a tolerance band — the
    sensor-alignment variant (pandas ``merge_asof(direction='nearest',
    tolerance=T)``): each purchase matches its nearest click within ±12 h,
    equidistant ties to the earlier click. Both directional candidates
    ride ONE union + ONE window sort per user (the join_asof recipe): the
    backward candidate is last(click_ts) over the preceding frame, the
    forward candidate first(click_ts) over the following frame — same
    partitioning, same ordering, so Catalyst stacks the two Window nodes
    over ONE exchange and ONE sort (plan-gated: no re-sort between). The
    nearest/tolerance arbitration is a pure row-local CASE. At 100 TB
    this beats the banded-join formulation (probe × clicks-in-band
    fan-out) and degenerates nowhere: the window is linear in rows per
    user. All integer microseconds → engine-exact."""
    apply_engine_conf(spark)
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.unix_micros(F.to_timestamp("ts")).alias("us"),
        F.lit(0).alias("side"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.lit(None).cast("long").alias("event_id"),
        F.unix_micros(F.to_timestamp("ts")).alias("us"), F.lit(1).alias("side"),
    )
    base = Window.partitionBy("user_id").orderBy(F.asc("us"), F.desc("side"))
    w_back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    click_us = F.when(F.col("side") == 1, F.col("us"))
    tagged = (
        p.unionByName(c)
        .withColumn("back_us", F.last(click_us, ignorenulls=True).over(w_back))
        .withColumn("fwd_us", F.first(click_us, ignorenulls=True).over(w_fwd))
    )
    db = F.col("us") - F.col("back_us")
    df_ = F.col("fwd_us") - F.col("us")
    ok_b = F.col("back_us").isNotNull() & (db <= _ASOF_TOL_US)
    ok_f = F.col("fwd_us").isNotNull() & (df_ <= _ASOF_TOL_US)
    chosen = (
        F.when(ok_b & (~ok_f | (db <= df_)), F.col("back_us"))
        .when(ok_f, F.col("fwd_us"))
    )
    return (
        tagged.filter(F.col("side") == 0)
        .withColumn("click_us", chosen)
        .filter(F.col("click_us").isNotNull())
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("us").alias("purchase_us"),
            "click_us",
            F.abs(F.col("click_us") - F.col("us")).alias("dist_us"),
            F.when(F.col("click_us") <= F.col("us"), "backward")
            .otherwise("forward")
            .alias("direction"),
        )
    )


# --- join_nearest: nearest-neighbor (argmin) spatial join ---------------------

# join_spatial answers "everything within R"; this answers "THE closest
# one" — the nearest-station / nearest-warehouse assignment join. The
# argmin runs over the SAME grid-ring candidate set (structural recall:
# one 3×3 ring of 5° cells provably covers the 250 km radius at the
# clamped latitudes — join_spatial's docstring math), restricted to
# candidates within R so "nearest" is well-defined inside the ring
# guarantee. Selection key is FLOOR(dist_m × 1000) AS BIGINT with
# s_suppkey as tiebreak: millimeter-quantized integer comparison, no
# float knife edge in the rank.
_JOIN_NEAREST_ORACLE = f"""
WITH cand AS (
  SELECT c_custkey, s_suppkey,
         CAST(floor({_SPATIAL_DIST} * 1000.0) AS BIGINT) AS dist_mm
  FROM customer, supplier
  WHERE {_SPATIAL_DIST} <= {_SPATIAL_RADIUS_M}
)
SELECT c_custkey, s_suppkey,
       CAST(dist_mm AS DOUBLE) / 1000.0 AS dist_m
FROM (
  SELECT c_custkey, s_suppkey, dist_mm,
         row_number() OVER (PARTITION BY c_custkey
                            ORDER BY dist_mm, s_suppkey) AS rnk
  FROM cand
) WHERE rnk = 1
"""


@register("join_nearest", oracle=_JOIN_NEAREST_ORACLE, tags=("join", "geo"))
def join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-supplier assignment: for every customer with at least one
    supplier within 250 km, the single closest one (millimeter-quantized
    distance, suppkey tiebreak) — the argmin-per-left-row join that
    "radius join + pick one" dashboards and assignment pipelines need.

    Scale shape: candidates come from the identical grid-cell + 3×3
    neighbor-ring equi-join as join_spatial (oracle is the brute-force
    all-pairs argmin — fatal at scale, exact at fixture scale); the
    argmin itself is a max_by/min_by-style single hash aggregate on
    c_custkey — ONE shuffle carrying (key, suppkey, BIGINT mm) triples,
    no window sort. The ring guarantees the true nearest-within-R is in
    the candidate set, so recall is structural, not probabilistic."""
    apply_engine_conf(spark)
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey")
    q = cust.select(
        "c_custkey",
        F.expr(_Q_LAT).alias("qlat"),
        F.expr(_Q_LON).alias("qlon"),
        F.expr("(c_custkey % 1200) div 50").alias("cell_la"),
        F.expr("((c_custkey * 7) % 3600) div 50").alias("cell_lo"),
    )
    s = (
        supp.select(
            "s_suppkey",
            F.expr(_S_LAT).alias("slat"),
            F.expr(_S_LON).alias("slon"),
            F.expr("(s_suppkey % 1200) div 50").alias("s_la"),
            F.expr("((s_suppkey * 7) % 3600) div 50").alias("s_lo"),
        )
        .select(
            "s_suppkey",
            "slat",
            "slon",
            F.explode(F.expr("array(-1, 0, 1)")).alias("dla"),
            "s_la",
            "s_lo",
        )
        .select(
            "s_suppkey",
            "slat",
            "slon",
            (F.col("s_la") + F.col("dla")).alias("cell_la"),
            F.explode(F.expr("array(-1, 0, 1)")).alias("dlo"),
            "s_lo",
        )
        .select(
            "s_suppkey",
            "slat",
            "slon",
            "cell_la",
            ((F.col("s_lo") + F.col("dlo") + 72) % 72).alias("cell_lo"),
        )
    )
    dist = _haversine_m(F.col("qlat"), F.col("qlon"), F.col("slat"), F.col("slon"))
    cand = (
        q.join(s, ["cell_la", "cell_lo"])
        .filter(dist <= F.lit(_SPATIAL_RADIUS_M))
        .select(
            "c_custkey",
            "s_suppkey",
            F.floor(dist * 1000.0).cast("bigint").alias("dist_mm"),
        )
    )
    return cand.groupBy("c_custkey").agg(
        F.expr("min_by(s_suppkey, struct(dist_mm, s_suppkey))").alias("s_suppkey"),
        (F.min(F.struct("dist_mm", "s_suppkey"))["dist_mm"].cast("double") / 1000.0).alias(
            "dist_m"
        ),
    )
