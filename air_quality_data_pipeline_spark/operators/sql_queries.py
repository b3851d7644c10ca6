"""SQL-surface queries: the engine's ``spark.sql`` layer plus relational
forms beyond the SURVEY §2 minimum (grouping sets, pivot/unpivot,
deterministic sampling, subquery shapes).

The reference has no SQL layer (SURVEY §3: a single imperative function);
a complete analytics engine must accept declarative SQL, so these queries
run as SQL text against temp views of the fixture tables and go through
the full parse → analyze → optimize → execute path. TPC-H-shaped headliners
(q1/q3/q6 over the fixture schema) double as optimizer benchmarks: each is
the canonical pattern Catalyst must handle well (wide agg, join-then-topk,
selective scan).

Scale notes: sampling is content-hash based (deterministic, no seed
coordination across engines or executors — the property you want for
reproducible 100 TB subsets); pivot uses an explicit value list so the plan
is a single pass (no distinct-collect on the driver).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..session import apply_engine_conf
from ..tables import table

# --- the SQL layer -----------------------------------------------------------


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        table(spark, sf_dir, n).createOrReplaceTempView(n)


_SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(20, 4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(20, 4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20, 4))) AS DOUBLE)
         AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("sql_q1", oracle=_SQL_Q1, tags=("sql",))
def sql_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape through the SQL layer: selective date scan + wide
    hash aggregate. Decimal-cast sums make the result order-independent
    (exact arithmetic), then cast back to double for the contract. Partial
    aggregation (map-side combine) happens automatically; the only exchange
    carries 6 aggregate cells per (flag, status) group."""
    apply_engine_conf(spark)
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_SQL_Q1)


_SQL_Q3 = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20, 4))) AS DOUBLE)
         AS revenue,
       o_orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < DATE '1995-03-15'
      AND l_shipdate > DATE '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("sql_q3", oracle=_SQL_Q3, tags=("sql",))
def sql_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filtered 3-way join → agg → top-10. Catalyst pushes
    each filter into its scan and plans TakeOrderedAndProject for the
    ORDER BY+LIMIT (no global sort). The customer side is broadcast at test
    scale by AQE; at 100 TB it flips to shuffle join on the same plan."""
    apply_engine_conf(spark)
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_SQL_Q3)


_SQL_Q6 = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(20, 4))) AS DOUBLE)
         AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


@register("sql_q6", oracle=_SQL_Q6, tags=("sql",))
def sql_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-predicate benchmark. All four
    predicates reach the parquet reader as PushedFilters (row-group pruning
    at scale); the aggregate is a single global cell."""
    apply_engine_conf(spark)
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_SQL_Q6)


# --- grouping sets -----------------------------------------------------------

_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(20, 4))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS cnt
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("agg_grouping_sets", oracle=_GROUPING_SETS, tags=("agg", "sql"))
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (generalization of the cube/rollup pair,
    SURVEY §2.D note): one Expand + one hash aggregate, not one pass per
    set."""
    apply_engine_conf(spark)
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_GROUPING_SETS)


# --- pivot / unpivot ---------------------------------------------------------

_PIVOT_ORACLE = """
SELECT n_name,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                     THEN CAST(o_totalprice AS DECIMAL(20, 4)) END) AS DOUBLE) AS urgent,
       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
                     THEN CAST(o_totalprice AS DECIMAL(20, 4)) END) AS DOUBLE) AS high,
       CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
                     THEN CAST(o_totalprice AS DECIMAL(20, 4)) END) AS DOUBLE) AS low
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


@register("pivot_wide", oracle=_PIVOT_ORACLE, tags=("agg",))
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot long→wide with an EXPLICIT value list: a single-pass
    conditional aggregation. Without the list Spark first runs a distinct
    scan and collects pivot values to the driver — never do that at 100
    TB."""
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "o_orderpriority", F.col("o_totalprice").cast("decimal(20,4)").alias("p"))
    )
    return (
        joined.groupBy("n_name")
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "5-LOW"])
        .sum("p")
        .select(
            "n_name",
            F.col("1-URGENT").cast("double").alias("urgent"),
            F.col("2-HIGH").cast("double").alias("high"),
            F.col("5-LOW").cast("double").alias("low"),
        )
    )


_UNPIVOT_ORACLE = """
SELECT c_custkey, metric, val FROM (
  SELECT c_custkey,
         'acctbal' AS metric, CAST(c_acctbal AS DOUBLE) AS val FROM customer
  UNION ALL
  SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
)
"""


@register("unpivot_long", oracle=_UNPIVOT_ORACLE, tags=("agg",))
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot wide→long via the native unpivot (melt) operator — planned
    as Expand, one pass, output 2x rows, no shuffle."""
    apply_engine_conf(spark)
    cust = table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")


# --- deterministic sampling --------------------------------------------------

_SAMPLE_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10
"""


@register("sample_hash", oracle=_SAMPLE_ORACLE, tags=("sample",))
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by content hash of the key — reproducible
    across engines, runs, and partitionings (unlike seed-based
    ``df.sample``, whose output depends on partition layout). This is how a
    100 TB pipeline takes an auditable subset; the predicate pushes to the
    scan and needs no shuffle."""
    apply_engine_conf(spark)
    orders = table(spark, sf_dir, "orders")
    bucket = F.expr(
        "cast(conv(substring(md5(cast(o_orderkey as string)), 1, 8), 16, 10) as bigint) % 100"
    )
    return orders.filter(bucket < 10).select("o_orderkey", "o_totalprice")


# --- subquery shapes ---------------------------------------------------------

_SUB_SCALAR = """
SELECT l_orderkey, l_linenumber,
       CAST(l_extendedprice AS DOUBLE) AS price
FROM lineitem
WHERE l_extendedprice > (SELECT 2 * AVG(l_extendedprice) FROM lineitem)
"""


@register("sub_scalar", oracle=_SUB_SCALAR, tags=("sql", "subquery"))
def sub_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: planned as a 1-row subquery broadcast
    into the filter — the scan streams once, no self-join."""
    apply_engine_conf(spark)
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_SUB_SCALAR)


_SUB_IN = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
)
"""


@register("sub_in", oracle=_SUB_IN, tags=("sql", "subquery"))
def sub_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery → planned as left-semi join (same physical shape as
    flt_exists, reached from SQL)."""
    apply_engine_conf(spark)
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(_SUB_IN)


_SUB_CORR_EXISTS = """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0
)
"""


@register("sub_not_exists", oracle=_SUB_CORR_EXISTS, tags=("sql", "subquery"))
def sub_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS → decorrelated by Catalyst into a left-anti
    join; no per-row re-execution of the inner query."""
    apply_engine_conf(spark)
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_SUB_CORR_EXISTS)


# --- sql_merge_upsert: batch MERGE / CDC upsert ------------------------------

# Deterministic change batch derived from the base table itself:
#  - UPDATE rows: every 7th customer gets +1000.0 balance, segment 'UPSERTED'
#  - INSERT rows: every 101st customer re-keyed +1000000 (net-new keys)
# Expected state = base rows overridden by key-matching batch rows, plus the
# net-new batch rows (classic MERGE WHEN MATCHED UPDATE / NOT MATCHED INSERT).
_MERGE_UPSERT = """
WITH batch AS (
  SELECT c_custkey, c_name, c_acctbal + 1000.0 AS c_acctbal,
         'UPSERTED' AS c_mktsegment
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 1000000 AS c_custkey, c_name, c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 101 = 0
),
merged AS (
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment, src,
         row_number() OVER (PARTITION BY c_custkey ORDER BY src DESC) AS rn
  FROM (
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment, 0 AS src FROM customer
    UNION ALL
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment, 1 AS src FROM batch
  )
)
SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM merged WHERE rn = 1
"""


@register("sql_merge_upsert", oracle=_MERGE_UPSERT, tags=("sql", "lakehouse"))
def sql_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE (CDC upsert) without a table format: base ∪ batch with a
    source-priority tag, then one row per key via a row_number window
    (batch wins). This is the engine's upsert primitive when the target is
    plain parquet — one shuffle on the merge key, linear in |base| + |batch|.
    On a cluster the window partitions by the same key the target is
    bucketed on, so the exchange co-locates with the subsequent write. With
    a transactional table format the same plan becomes MERGE INTO; the
    union+window formulation is the format-free equivalent (and what a
    MERGE compiles to physically: outer-join-shaped key alignment)."""
    apply_engine_conf(spark)
    _views(spark, sf_dir, "customer")
    return spark.sql(_MERGE_UPSERT)


# --- sql_q4 / sql_q14 / sql_q18: remaining TPC-H-shaped optimizer probes -----

_SQL_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


@register("sql_q4", oracle=_SQL_Q4, tags=("sql",))
def sql_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS under a grouped count. Catalyst
    decorrelates the subquery into a LEFT SEMI join on l_orderkey with the
    l_shipdate > o_orderdate residual, so the inner query never re-executes
    per row; the date predicate prunes the orders scan first, making the
    (typically much larger) lineitem side probe a small build set. The
    final aggregate is 5 groups — the exchange after the semi join carries
    one cell per (task, priority)."""
    apply_engine_conf(spark)
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_SQL_Q4)


# Ratio determinism: numerator/denominator are DECIMAL-exact sums (identical
# in both engines), each cast to DOUBLE before one IEEE division — identical
# inputs + one identical operation = bit-identical ratio.
_SQL_Q14 = """
SELECT
  100.0 * CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
                   THEN l_extendedprice * (1 - l_discount) ELSE 0 END
              AS DECIMAL(20, 4))) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
              AS DECIMAL(20, 4))) AS DOUBLE) AS promo_revenue_pct,
  CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
                   THEN l_extendedprice * (1 - l_discount) ELSE 0 END
              AS DECIMAL(20, 4))) AS DOUBLE) AS promo_revenue,
  COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-02-01'
"""


@register("sql_q14", oracle=_SQL_Q14, tags=("sql",))
def sql_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promo revenue share): conditional aggregation over
    a fact-dim join — the CASE WHEN lives INSIDE the sum, so one pass
    computes both branches of the ratio (no second scan, no self-join).
    The one-month shipdate predicate reaches the lineitem parquet scan;
    part is the broadcast side. The global aggregate is a single cell, so
    the post-join exchange carries one partial per task."""
    apply_engine_conf(spark)
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_SQL_Q14)


_SQL_Q18 = """
SELECT c_custkey, c_name, o_orderkey, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(20, 4))) AS DOUBLE) AS sum_qty
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(20, 4))) > 300
)
GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@register("sql_q18", oracle=_SQL_Q18, tags=("sql",))
def sql_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): IN over a grouped HAVING
    subquery → planned as an aggregate-then-semi-join, so the qualifying
    orderkey set is computed ONCE from a lineitem-only aggregate (map-side
    partials, exchange carries (orderkey, sum) cells) and then semi-joins
    the 3-way fact-dim join. The HAVING threshold makes the semi-join build
    side tiny at any scale — the classic needle-filter pattern. ORDER
    BY+LIMIT plans as TakeOrderedAndProject (per-partition top-100, no
    global sort)."""
    apply_engine_conf(spark)
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_SQL_Q18)


# --- sql_lateral: correlated LATERAL subquery (top-N per row) ----------------

_SQL_LATERAL = """
SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
"""


@register("sql_lateral", oracle=_SQL_LATERAL, tags=("sql", "subquery"))
def sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — top-2 orders PER customer, written the
    way an analyst writes it (a per-row subquery with ORDER BY+LIMIT).
    Catalyst decorrelates it: the inner query is NOT re-executed per
    customer row; the plan ranks orders within o_custkey once and joins —
    the same physical shape as the win_rank formulation, from declarative
    SQL. That decorrelation is the difference between O(|orders|) and
    O(|customer| x |orders|) at scale, and it's why LATERAL is safe to
    expose on a 100 TB warehouse. The identical text runs in DuckDB, which
    keeps the oracle a true dialect-shared query."""
    apply_engine_conf(spark)
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_SQL_LATERAL)
