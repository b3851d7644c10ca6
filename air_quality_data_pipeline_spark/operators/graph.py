"""Graph operators over relation-derived edge sets.

The reference has no graph surface (its 309-line ETL is row-oriented,
main.py:137-162); an analytics engine curating 100 TB corpora needs at
least the iterative-propagation primitive (PageRank-style scoring is the
canonical link-quality signal in web-corpus curation, and the same
join-aggregate-iterate skeleton underlies label propagation and connected
components — see llm_dedup_clusters for the min-label variant).

Design for scale:

- **Edges are derived, never collected.** The co-purchase graph is built
  from lineitem with one self-join on the order key and one hash aggregate;
  the driver never sees an edge.
- **Fixed-point BIGINT arithmetic end-to-end.** Float PageRank is
  summation-order-dependent, so two engines (or two partitionings) disagree
  in the last ulps. Every quantity here is an integer: rank is scaled by
  10^12, per-edge contributions use integer division, and the damping mix
  is (85 * inflow) div 100. Integer sums are commutative — the result is
  BIT-IDENTICAL on any cluster layout and in DuckDB, which is what makes a
  full value-hash oracle possible for an iterative algorithm.
- **The iteration is a driver LOOP, not driver DATA.** Each of the 3
  rounds is one broadcast-join + hash-aggregate over the rank table
  (|V| rows); lineage stays 3 levels deep, nothing is collected.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..registry import register
from ..session import apply_engine_conf, scoped_persist, set_compute_dense_floor
from ..tables import rebalance_for_map, table

_SCALE = 1_000_000_000_000  # 10^12 fixed-point scale
_ITERS = 3
_DAMP_NUM, _DAMP_DEN = 85, 100

# Both graph queries consume the SAME mean-thresholded co-purchase edge set,
# and its build (lineitem self-join + hash aggregate) is the most expensive
# stage of either. Memoize the persisted edge DataFrame per
# (applicationId, sf_dir) so a driver pass running both queries
# materializes it ONCE (ADVICE r5). The memo holds one entry: switching
# sf_dir or restarting the session evicts (and unpersists) the old one.
# This deliberately bypasses scoped_persist — its blocks are freed by the
# NEXT query's apply_engine_conf, which is exactly the reuse window here.
# The edge set is |supplier-pairs above the mean| rows (two ints each),
# orders of magnitude below lineitem, so holding it cached is cheap.
_EDGE_MEMO: dict[tuple[str, str], DataFrame] = {}


def reset_edge_memo() -> None:
    """Evict (and unpersist) the memoized co-purchase edge set.

    bench.py calls this before EVERY timed run (VERDICT r10 item 1): the
    memo's legitimate reuse window is *across queries in one driver pass*,
    but inside bench.py's median-of-5 loop it made runs 2-5 read a warm
    cache, so the reported heavy-line median measured a warm edge build.
    Evicting between timed runs makes every sample a cold end-to-end
    computation from the parquet inputs. Driver correctness passes and
    sweep runs keep the cross-query reuse untouched.
    """
    for k in list(_EDGE_MEMO):
        try:
            _EDGE_MEMO.pop(k).unpersist()
        except Exception:
            pass  # stale session already stopped


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric supplier co-purchase edges: pairs co-occurring in more
    orders than the average pair (mean threshold — scale-invariant)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _EDGE_MEMO.get(key)
    if hit is not None:
        return hit
    for k in list(_EDGE_MEMO):
        try:
            _EDGE_MEMO.pop(k).unpersist()
        except Exception:
            pass  # stale session already stopped
    # round-11: the self-join's map side (scan + hash + shuffle write of
    # 600k key pairs at sf0.1) ran on the 1-3 tasks the one-row-group
    # fixture scan yields, and the reduce side coalesced to ~11 tasks
    # under the stock 1MB AQE floor — together most of the cold edge
    # build's wall (interleaved A/B: 2.7 s -> 1.4 s). The rebalance is
    # semantically inert (a groupBy-join consumes it); the floor is the
    # compute-dense coalescing fix shared with llm_minhash_dedup,
    # restored by the next query's apply_engine_conf.
    set_compute_dense_floor(spark)
    li = rebalance_for_map(
        table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey"), spark
    )
    l1 = li.alias("l1")
    l2 = li.alias("l2")
    pair_counts = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        )
        .groupBy(F.col("l1.l_suppkey").alias("src"), F.col("l2.l_suppkey").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    mean_w = pair_counts.agg((F.sum("w").cast("double") / F.count(F.lit(1))).alias("m"))
    edges = (
        pair_counts.join(F.broadcast(mean_w))
        .filter(F.col("w") > F.col("m"))
        .select("src", "dst")
        .persist()
    )
    _EDGE_MEMO[key] = edges
    return edges

def _oriented_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every triangle of the co-purchase graph as one (a < b < c) row —
    the edge-iterator adjacency-intersection form shared by
    graph_triangles, graph_jaccard and graph_clustering_coef.

    Attach each oriented edge (a, b) its endpoints' forward-neighbor
    arrays; array_intersect(N+(a), N+(b)) emits every closing c directly.
    Replaces the round-9 wedge self-join + closing equi-join, which
    materialized every wedge as a row: 61.8M wedge rows + 13.4M closing
    probes = 102 s CPU at sf0.1 for the same 13.4M triangles this form
    yields from ~100M codegen'd array-element ops (~16 s CPU measured).
    Counting is all-integer and array ORDER never matters, so the output
    is engine-exact regardless of collect_list order. Skew: one edge row
    carries <= 2·max-forward-degree ints and O(deg(a)+deg(b)) work — the
    wedge join pushed deg² ROWS through one hot mid-node key, strictly
    worse for the same hub. The attach joins broadcast when the runtime
    estimate allows and degrade to shuffle joins at scale (unhinted)."""
    fwd = _copurchase_edges(spark, sf_dir).filter(F.col("src") < F.col("dst"))
    adj = fwd.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
    e = fwd.join(
        adj.select(F.col("src").alias("a_"), F.col("nbrs").alias("na")),
        F.col("src") == F.col("a_"),
    ).join(
        # left: the highest-id node has no forward neighbors; a NULL nb
        # makes array_intersect NULL and explode emits nothing — exactly
        # "no triangle closes through this edge", no coalesce needed.
        adj.select(F.col("src").alias("b_"), F.col("nbrs").alias("nb")),
        F.col("dst") == F.col("b_"),
        "left",
    )
    return e.select(
        F.col("src").alias("a"),
        F.col("dst").alias("b"),
        F.explode(F.array_intersect("na", "nb")).alias("c"),
    )


# The oracle spells the identical integer algebra as chained CTEs — one CTE
# pair (inflowK, prK) per iteration. // is DuckDB's integer division; the
# Spark side uses DIV. Both truncate toward zero and every value is
# positive, so they agree exactly. pair_counts/edges/deg are MATERIALIZED:
# DuckDB inlines multiply-referenced CTEs by default, and the reference
# fan-out here (edges consumed by deg + all three iterations, each pulling
# pair_counts again) re-expands the lineitem self-join enough times to
# spill tens of GB at sf1 — materializing computes each once.
_PAGERANK_ORACLE = f"""
WITH pair_counts AS MATERIALIZED (
  SELECT l1.l_suppkey AS src, l2.l_suppkey AS dst, COUNT(*) AS w
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
  GROUP BY l1.l_suppkey, l2.l_suppkey
),
edges AS MATERIALIZED (
  SELECT src, dst FROM pair_counts
  WHERE w > (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) FROM pair_counts)
),
deg AS MATERIALIZED (
  SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src
),
n AS (SELECT COUNT(*) AS c FROM deg),
p0 AS (
  SELECT node, ({_SCALE} // (SELECT c FROM n)) AS pr FROM deg
),
inflow1 AS (
  SELECT e.dst AS node, SUM(p.pr // d.outdeg) AS inflow
  FROM edges e JOIN p0 p ON p.node = e.src JOIN deg d ON d.node = e.src
  GROUP BY e.dst
),
p1 AS (
  SELECT node, (15 * ({_SCALE} // (SELECT c FROM n))) // 100
               + ({_DAMP_NUM} * inflow) // {_DAMP_DEN} AS pr
  FROM inflow1
),
inflow2 AS (
  SELECT e.dst AS node, SUM(p.pr // d.outdeg) AS inflow
  FROM edges e JOIN p1 p ON p.node = e.src JOIN deg d ON d.node = e.src
  GROUP BY e.dst
),
p2 AS (
  SELECT node, (15 * ({_SCALE} // (SELECT c FROM n))) // 100
               + ({_DAMP_NUM} * inflow) // {_DAMP_DEN} AS pr
  FROM inflow2
),
inflow3 AS (
  SELECT e.dst AS node, SUM(p.pr // d.outdeg) AS inflow
  FROM edges e JOIN p2 p ON p.node = e.src JOIN deg d ON d.node = e.src
  GROUP BY e.dst
),
p3 AS (
  SELECT node, (15 * ({_SCALE} // (SELECT c FROM n))) // 100
               + ({_DAMP_NUM} * inflow) // {_DAMP_DEN} AS pr
  FROM inflow3
)
SELECT CAST(node AS BIGINT) AS suppkey, CAST(pr AS BIGINT) AS pr_fixed
FROM p3
ORDER BY pr_fixed DESC, suppkey
"""


@register("graph_pagerank", oracle=_PAGERANK_ORACLE, tags=("graph", "iterative"))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank over the supplier co-purchase graph.

    Graph: suppliers are nodes; an edge connects suppliers whose pair
    co-occurs in MORE orders than the average pair (the mean threshold is
    scale-invariant — co-occurrence counts and their mean both grow with
    SF, so the graph stays meaningfully sparse at every scale, unlike a
    fixed cutoff). The graph is symmetric, so there are no dangling nodes
    and out-degree equals in-degree.

    Rank arithmetic is scaled-integer (see module docstring): pr starts at
    SCALE div N and each round is
    ``(15 * (SCALE div N)) div 100  +  (85 * sum(pr_src div outdeg_src)) div 100``
    — every operation integral, every sum commutative, so Spark and DuckDB
    agree bit-for-bit after any number of iterations.

    Scale: the edge build is one self-equi-join on l_orderkey (shuffle on
    the key; within-order pair fan-out is bounded by order size) + one hash
    aggregate. Each iteration joins the |V|-row rank table to edges —
    rank and degree sides broadcast at any realistic |V| — and reduces by
    dst with map-side partial sums. 3 iterations = 3 such rounds; lineage
    is shallow enough that no checkpoint is needed."""
    apply_engine_conf(spark)
    edges = _copurchase_edges(spark, sf_dir)
    # round-11: deg is consumed every round (contribution divisor) plus
    # by n_nodes, and n_nodes broadcasts into every round's teleport term
    # — cache the |V|-row degree table once instead of re-aggregating the
    # edge set per reference (guide §5; profiled as repeated near-empty
    # aggregate jobs).
    deg = scoped_persist(
        edges.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("outdeg")
        )
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("c"))
    # base rank and teleport term, both exact integers derived from |V|
    pr = (
        deg.join(F.broadcast(n_nodes))
        .select("node", F.expr(f"{_SCALE} div c").alias("pr"))
    )
    teleport = F.expr(f"15 * ({_SCALE} div c) div 100")
    for _ in range(_ITERS):
        inflow = (
            edges.join(F.broadcast(pr), edges.src == pr.node)
            .join(F.broadcast(deg.alias("d")), edges.src == F.col("d.node"))
            .select(edges.dst, F.expr("pr div outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        pr = (
            inflow.join(F.broadcast(n_nodes))
            .select(
                F.col("dst").alias("node"),
                (teleport + F.expr(f"{_DAMP_NUM} * inflow div {_DAMP_DEN}")).alias("pr"),
            )
        )
    out = pr.select(
        F.col("node").cast("bigint").alias("suppkey"),
        F.col("pr").cast("bigint").alias("pr_fixed"),
    ).orderBy(F.desc("pr_fixed"), F.asc("suppkey"))
    return out


# --- graph_triangles: triangle counting --------------------------------------

# Same mean-thresholded co-purchase edge set as graph_pagerank (see above);
# triangles are counted on the CANONICAL orientation src < dst, so each
# triangle is generated exactly once as (a < b < c). All-integer — exact
# in both engines. The CTEs are MATERIALIZED for the same inlining reason
# as the pagerank oracle.
_TRIANGLES_ORACLE = """
WITH pair_counts AS MATERIALIZED (
  SELECT l1.l_suppkey AS src, l2.l_suppkey AS dst, COUNT(*) AS w
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
  GROUP BY l1.l_suppkey, l2.l_suppkey
),
fwd AS MATERIALIZED (
  SELECT src, dst FROM pair_counts
  WHERE w > (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) FROM pair_counts)
    AND src < dst
),
tri AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM fwd e1
  JOIN fwd e2 ON e2.src = e1.dst
  JOIN fwd e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
per_node AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY node
)
SELECT CAST(node AS BIGINT) AS suppkey, n_triangles
FROM per_node
ORDER BY n_triangles DESC, suppkey
"""


@register("graph_triangles", oracle=_TRIANGLES_ORACLE, tags=("graph",))
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the supplier co-purchase graph — the
    canonical multi-way self-join graph workload (clustering-coefficient
    numerator, community-density signal). The classic distributed
    formulation: orient every edge LOW -> HIGH (src < dst) so each
    triangle (a < b < c) is generated exactly once — the orientation both
    kills duplicate counting AND bounds the join fan-out by forward-degree
    (sum over nodes of forward-deg^2, the standard skew bound: high-degree
    hubs contribute only their HIGHER-numbered neighbors).

    Plan: edge-iterator with adjacency intersection — attach each edge
    (a, b) its endpoints' forward-neighbor arrays and emit
    array_intersect(N+(a), N+(b)): every common forward neighbor c closes
    the triangle a < b < c exactly once. The round-9 form (wedge self-join
    + closing equi-join) materialized every wedge as a row — 61.8M wedge
    rows plus 13.4M closing probes at sf0.1, 102 s of CPU in join/row
    machinery for a 3.4 s wall on 32 cores (profiled r10). The intersect
    form does the same set logic as codegen'd array ops on edge rows
    (~100M element ops, no wedge rows, no closing join) — measured ~7x
    less CPU, identical output (counting is all-integer; array order
    never matters). Skew: one edge row's work is O(deg(a) + deg(b)) and
    its payload <= 2·max-forward-degree ints, vs the wedge join where one
    hot mid-node key owned deg^2 rows through a single exchange — the
    orientation bound (forward-degree) is the same, the per-key blowup is
    strictly smaller. The adjacency attach joins broadcast when the
    estimate allows and degrade to shuffle joins at scale (unhinted, AQE
    decides from runtime sizes).

    The edge set is the memoized symmetric one shared with graph_pagerank;
    the graph is symmetric, so filtering src < dst AFTER the mean
    threshold yields exactly the oracle's fwd orientation."""
    apply_engine_conf(spark)
    tri = _oriented_triangles(spark, sf_dir)
    # ONE pass: explode each triangle to its 3 corners map-side. The
    # union-of-three-selects formulation recomputes the whole
    # wedge+closing pipeline per branch (no cross-branch subplan reuse
    # in Catalyst) — measured 3x the work at sf0.1.
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node.select(
        F.col("node").cast("bigint").alias("suppkey"), "n_triangles"
    ).orderBy(F.desc("n_triangles"), F.asc("suppkey"))


# --- graph_cc: connected components (min-label propagation) -------------------

# Completes the graph family (pagerank = weighted propagation,
# triangles = local density, cc = global reachability). Labels are pure
# integer MINs — commutative, associative, engine-exact — so unlike float
# label-weights the whole fixed point is value-hash-checkable. 3 rounds of
# min-label propagation equal true connected components whenever every
# node is within 3 hops of its component's minimum-id node; on the dense
# mean-thresholded co-purchase graph the fixture converges in 2 (the
# convergence claim is pinned by a property test, not assumed).
_CC_ITERS = 3


def _cc_oracle() -> str:
    labs = ["lab0"]
    iters = []
    for k in range(_CC_ITERS):
        prev, cur = labs[-1], f"lab{k + 1}"
        iters.append(f"""
{cur} AS MATERIALIZED (
  SELECT l.node, LEAST(l.lbl, COALESCE(m.minl, l.lbl)) AS lbl
  FROM {prev} l LEFT JOIN (
    SELECT e.dst AS node, MIN(l2.lbl) AS minl
    FROM edges e JOIN {prev} l2 ON l2.node = e.src
    GROUP BY e.dst
  ) m ON m.node = l.node
)""")
        labs.append(cur)
    return f"""
WITH pair_counts AS MATERIALIZED (
  SELECT l1.l_suppkey AS src, l2.l_suppkey AS dst, COUNT(*) AS w
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
  GROUP BY l1.l_suppkey, l2.l_suppkey
),
edges AS MATERIALIZED (
  SELECT src, dst FROM pair_counts
  WHERE w > (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) FROM pair_counts)
),
lab0 AS MATERIALIZED (
  SELECT DISTINCT src AS node, src AS lbl FROM edges
),{",".join(iters)},
sizes AS (
  SELECT lbl AS comp, CAST(COUNT(*) AS BIGINT) AS comp_size
  FROM {labs[-1]} GROUP BY lbl
)
SELECT CAST(l.node AS BIGINT) AS suppkey, CAST(l.lbl AS BIGINT) AS comp,
       s.comp_size
FROM {labs[-1]} l JOIN sizes s ON s.comp = l.lbl
ORDER BY suppkey
"""


@register("graph_cc", oracle=_cc_oracle(), tags=("graph", "iterative"))
def graph_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components on the supplier co-purchase graph by
    min-label propagation — the reachability primitive under duplicate
    clustering (llm_dedup_clusters is its min-label twin over LSH edges)
    and community bookkeeping. Each round every node takes the MIN of its
    own label and its neighbors' labels: an all-integer, order-free
    reduction, so the result is bit-identical on any partitioning and in
    DuckDB (full value-hash oracle for an iterative algorithm).

    Scale shape: the label table is |V| rows (two ints) — it BROADCASTS
    to the edge relation every round (plan-gated), so each iteration is
    one map-side join + one map-side-combinable MIN aggregate; the edge
    set itself is never reshuffled and lineage stays _CC_ITERS levels
    deep. At 100 TB |V| can outgrow a broadcast — the same loop then runs
    as a co-partitioned shuffle join keyed on src, or graduates to the
    large-star/small-star algorithm; the declared plan leaves that swap
    to the optimizer.

    Round-11 rewrite (guide §2.3 shuffle fewer bytes / §5 caching), same
    fixed point bit-for-bit:

    - **Round 1 needs no label join at all**: labels start as the
      identity, so min-over-neighbors of lbl0 is just min(src) per dst —
      one aggregate straight over the edge set.
    - **Frontier-only propagation (delta iteration)** for rounds 2+:
      only labels that CHANGED last round can lower a neighbor this
      round. Proof: labels are monotone nonincreasing and
      lab_k(v) <= min_u lab_{k-1}(u) after round k, so for an unchanged
      neighbor u, lab_{k-1}(u) = lab_{k-2}(u) >= that min — already
      folded into lab_{k-1}(v). Hence
      lab_k(v) = min(lab_{k-1}(v), min over CHANGED u of lab_{k-1}(u)):
      the edge join carries only frontier rows (429k -> 247k join rows
      by round 3 at sf0.1; the shrinkage compounds at scale where most
      of a 100 TB graph converges in early rounds).
    - **Per-round scoped_persist of the label table**: lab_k is consumed
      twice (next round's update join + the frontier filter), so the
      unpersisted form re-derived the whole history at every reference —
      the plan doubled per round (2^3 copies of the base, 184 KB plan
      text, ~25 near-empty broadcast-rebuild jobs = most of the 6.0 s
      sf0.1 wall, profiled r11). Caching each round's |V|-row table
      makes the lineage linear.
    """
    apply_engine_conf(spark)
    edges = _copurchase_edges(spark, sf_dir)
    m1 = edges.groupBy(F.col("dst").alias("node")).agg(F.min("src").alias("minl"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    lab = scoped_persist(
        nodes.join(F.broadcast(m1), "node", "left").select(
            "node", F.least(F.col("node"), F.coalesce("minl", "node")).alias("lbl")
        )
    )
    # frontier after round 1: nodes whose label moved off the identity
    delta = lab.filter(F.col("lbl") < F.col("node"))
    for _ in range(_CC_ITERS - 1):
        dmin = (
            edges.join(
                F.broadcast(delta.select(F.col("node").alias("src"), "lbl")), "src"
            )
            .select(F.col("dst").alias("node"), "lbl")
            .groupBy("node")
            .agg(F.min("lbl").alias("dminl"))
        )
        upd = scoped_persist(
            lab.join(F.broadcast(dmin), "node", "left").select(
                "node",
                F.col("lbl").alias("prev"),
                F.least("lbl", F.coalesce("dminl", "lbl")).alias("lbl"),
            )
        )
        delta = upd.filter(F.col("lbl") < F.col("prev")).select("node", "lbl")
        lab = upd.select("node", "lbl")
    sizes = lab.groupBy(F.col("lbl").alias("comp")).agg(
        F.count(F.lit(1)).alias("comp_size")
    )
    return (
        lab.join(F.broadcast(sizes), lab.lbl == sizes.comp)
        .select(
            F.col("node").cast("bigint").alias("suppkey"),
            F.col("lbl").cast("bigint").alias("comp"),
            "comp_size",
        )
        .orderBy("suppkey")
    )


# --- graph_jaccard: per-edge neighborhood similarity --------------------------

# The link-prediction / community-strength feature: for every edge (a, b),
# |N(a) ∩ N(b)| / |N(a) ∪ N(b)|. Common neighbors of an edge = triangles
# through that edge, so the count REUSES the oriented wedge pipeline
# (each canonical triangle a<b<c explodes to its three edge pairs); the
# union size is deg(a) + deg(b) - common (a and b stay members — b ∈ N(a)).
# All integers until one final division on identical operands → exact.
_JACCARD_ORACLE = """
WITH pair_counts AS MATERIALIZED (
  SELECT l1.l_suppkey AS src, l2.l_suppkey AS dst, COUNT(*) AS w
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
  GROUP BY l1.l_suppkey, l2.l_suppkey
),
edges AS MATERIALIZED (
  SELECT src, dst FROM pair_counts
  WHERE w > (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) FROM pair_counts)
),
deg AS MATERIALIZED (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src
),
fwd AS MATERIALIZED (SELECT src, dst FROM edges WHERE src < dst),
tri AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM fwd e1
  JOIN fwd e2 ON e2.src = e1.dst
  JOIN fwd e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
common AS (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS common FROM (
    SELECT a AS x, b AS y FROM tri
    UNION ALL SELECT a, c FROM tri
    UNION ALL SELECT b, c FROM tri
  ) GROUP BY x, y
)
SELECT f.src, f.dst, COALESCE(c.common, 0) AS common_neighbors,
       da.d + db.d - COALESCE(c.common, 0) AS union_size,
       CAST(COALESCE(c.common, 0) AS DOUBLE)
         / (da.d + db.d - COALESCE(c.common, 0)) AS jaccard
FROM fwd f
LEFT JOIN common c ON c.x = f.src AND c.y = f.dst
JOIN deg da ON da.node = f.src
JOIN deg db ON db.node = f.dst
"""


@register("graph_jaccard", oracle=_JACCARD_ORACLE, tags=("graph",))
def graph_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood Jaccard similarity for every edge of the co-purchase
    graph — the classic link-prediction / tie-strength feature. Common
    neighbors of edge (a,b) = triangles through (a,b), so this REUSES the
    degree-bounded oriented wedge pipeline (graph_triangles) instead of
    the naive N(a)⋈N(b) neighborhood join whose fan-out is
    sum-of-degree² over ALL wedge pairs, closed or not: each canonical
    triangle explodes map-side to its three edge pairs, one hash
    aggregate counts them, and degrees broadcast back onto the edge list.
    Edges with zero triangles surface via the LEFT join (jaccard 0, not
    dropped). Integers end-to-end; one final division on identical
    operands in both engines."""
    apply_engine_conf(spark)
    edges = _copurchase_edges(spark, sf_dir)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    fwd = edges.filter(F.col("src") < F.col("dst"))
    # triangles via the shared adjacency-intersection enumerator (see
    # _oriented_triangles — replaces the wedge self-join + closing join)
    tri = _oriented_triangles(spark, sf_dir)
    pairs = tri.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("x"), F.col("b").alias("y")),
                F.struct(F.col("a").alias("x"), F.col("c").alias("y")),
                F.struct(F.col("b").alias("x"), F.col("c").alias("y")),
            )
        ).alias("p")
    ).select("p.x", "p.y")
    common = pairs.groupBy("x", "y").agg(F.count(F.lit(1)).cast("bigint").alias("common"))
    da = deg.select(F.col("node").alias("src"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("dst"), F.col("d").alias("db"))
    out = (
        fwd.join(
            common,
            (fwd.src == common.x) & (fwd.dst == common.y),
            "left",
        )
        .join(F.broadcast(da), "src")
        .join(F.broadcast(db), "dst")
        .select(
            "src",
            "dst",
            F.coalesce("common", F.lit(0)).alias("common_neighbors"),
            (F.col("da") + F.col("db") - F.coalesce("common", F.lit(0))).alias(
                "union_size"
            ),
            (
                F.coalesce("common", F.lit(0)).cast("double")
                / (F.col("da") + F.col("db") - F.coalesce("common", F.lit(0)))
            ).alias("jaccard"),
        )
    )
    return out


# --- graph_2hop: friends-of-friends reach ------------------------------------

# The 2-hop neighborhood size — the reach/recommendation primitive ("how
# many suppliers are one introduction away?"). Exact semantics: nodes at
# distance EXACTLY 2 (reachable through some neighbor, not a direct
# neighbor, not self). All work is integer pairs: the wedge expansion is
# the same dst=src self-equi-join the triangle count uses, the distinct is
# a hash aggregate on (node, nb2), and direct-neighbor removal is a
# LEFT ANTI join back to the edge set — exchanges never carry more than
# two ints per row.
_TWOHOP_ORACLE = """
WITH pair_counts AS MATERIALIZED (
  SELECT l1.l_suppkey AS src, l2.l_suppkey AS dst, COUNT(*) AS w
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
  GROUP BY l1.l_suppkey, l2.l_suppkey
),
edges AS MATERIALIZED (
  SELECT src, dst FROM pair_counts
  WHERE w > (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) FROM pair_counts)
),
deg AS (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree FROM edges GROUP BY src
),
wedge AS (
  SELECT DISTINCT e1.src AS node, e2.dst AS nb2
  FROM edges e1 JOIN edges e2 ON e2.src = e1.dst
  WHERE e1.src <> e2.dst
),
foaf AS (
  SELECT w.node, CAST(COUNT(*) AS BIGINT) AS foaf_count
  FROM wedge w
  WHERE NOT EXISTS (
    SELECT 1 FROM edges e WHERE e.src = w.node AND e.dst = w.nb2
  )
  GROUP BY w.node
)
SELECT CAST(d.node AS BIGINT) AS suppkey, d.degree,
       COALESCE(f.foaf_count, 0) AS foaf_count
FROM deg d LEFT JOIN foaf f ON f.node = d.node
ORDER BY suppkey
"""


@register("graph_2hop", oracle=_TWOHOP_ORACLE, tags=("graph",))
def graph_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friends-of-friends reach per supplier: the count of nodes at
    distance exactly 2 (through a neighbor, not a direct neighbor, not
    self) — the standard recommendation / influence-reach feature next to
    degree. Completes the neighborhood family (triangles = closed wedges,
    jaccard = per-edge overlap, 2hop = OPEN reach).

    Scale shape (round-10 rewrite, same as graph_harmonic): the round-9
    wedge self-join expanded every 2-path as a row (sum-of-degree², 61.8M
    rows at sf0.1) and deduped them pairwise; this form keeps reach sets
    as SPARSE BITMAP words — one edge-keyed join + one bit_or hash
    aggregate builds distance<=2 words, and the exact-distance-2 count is
    word-wise mask arithmetic bit_count(r2 & ~r1 & ~self) — no pair row,
    no distinct, no anti join. Per-round row volume is bounded by the
    wedge count and is 64x below it on dense regions (13.0 s -> ~1 s wall
    at sf0.1)."""
    apply_engine_conf(spark)
    edges = _copurchase_edges(spark, sf_dir)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    r1 = (
        edges.select(
            F.col("src").alias("node"),
            F.expr("dst div 64").alias("widx"),
            F.expr("shiftleft(1L, cast(dst % 64 as int))").alias("w1"),
        )
        .groupBy("node", "widx")
        .agg(F.expr("bit_or(w1)").alias("w1"))
    )
    r1 = scoped_persist(r1)
    r2 = (
        edges.join(r1, edges.dst == r1.node)
        .select(F.col("src").alias("node"), "widx", F.col("w1").alias("w2"))
        .groupBy("node", "widx")
        .agg(F.expr("bit_or(w2)").alias("w2"))
    )
    _selfw = "(CASE WHEN widx = node div 64 THEN shiftleft(1L, cast(node % 64 as int)) ELSE 0L END)"
    foaf = (
        r2.join(r1, ["node", "widx"], "left")
        .select(
            "node",
            F.expr(f"bit_count(w2 & ~coalesce(w1, 0L) & ~{_selfw})").alias("c"),
        )
        .groupBy("node")
        .agg(F.sum("c").alias("foaf_count"))
        .filter(F.col("foaf_count") > 0)
    )
    return (
        deg.alias("d")
        .join(F.broadcast(foaf.alias("f")), "node", "left")
        .select(
            F.col("node").cast("bigint").alias("suppkey"),
            "degree",
            F.coalesce("foaf_count", F.lit(0)).cast("bigint").alias("foaf_count"),
        )
        .orderBy("suppkey")
    )


# --- graph_kcore: k-core decomposition (iterative peeling) --------------------

# The core-periphery primitive: the k-core is the maximal subgraph where
# every node keeps degree >= k AFTER all lower-degree nodes are peeled
# away — the standard "dense backbone" extractor (spam-farm detection,
# community seeding) that raw degree can't express (a hub whose neighbors
# are all leaves has high degree but no core membership). Both engines run
# the IDENTICAL bounded peel — _KCORE_ROUNDS rounds of "drop nodes whose
# within-subgraph degree < k" — so the result is well-defined and
# hash-comparable even before convergence; a property test pins that the
# fixture actually converges within the budget (one more round is a
# fixed point), so the output IS the true k-core, not a truncation.
_KCORE_K = 4
_KCORE_ROUNDS = 6


def _kcore_oracle() -> str:
    names = ["n0"]
    rounds = []
    for r in range(_KCORE_ROUNDS):
        prev, cur = names[-1], f"n{r + 1}"
        rounds.append(f"""
{cur} AS MATERIALIZED (
  SELECT e.src AS node
  FROM edges e
  JOIN {prev} a ON a.node = e.src
  JOIN {prev} b ON b.node = e.dst
  GROUP BY e.src
  HAVING COUNT(*) >= {_KCORE_K}
)""")
        names.append(cur)
    last = names[-1]
    return f"""
WITH pair_counts AS MATERIALIZED (
  SELECT l1.l_suppkey AS src, l2.l_suppkey AS dst, COUNT(*) AS w
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
  GROUP BY l1.l_suppkey, l2.l_suppkey
),
edges AS MATERIALIZED (
  SELECT src, dst FROM pair_counts
  WHERE w > (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) FROM pair_counts)
),
n0 AS MATERIALIZED (
  SELECT DISTINCT src AS node FROM edges
),{",".join(rounds)}
SELECT CAST(e.src AS BIGINT) AS suppkey,
       CAST(COUNT(*) AS BIGINT) AS core_degree,
       CAST({_KCORE_K} AS INT) AS k
FROM edges e
JOIN {last} a ON a.node = e.src
JOIN {last} b ON b.node = e.dst
GROUP BY e.src
ORDER BY suppkey
"""


@register("graph_kcore", oracle=_kcore_oracle(), tags=("graph", "iterative"))
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition of the co-purchase graph (k=4): iteratively
    peel nodes whose degree within the surviving subgraph is below k; what
    remains is the dense backbone. Reports each core member's
    within-core degree.

    Scale shape: each peel round is two semi-joins of the edge set against
    the surviving node list (|V| rows of one BIGINT — broadcast at any
    realistic |V|) + one map-side-combinable count-HAVING aggregate. The
    node list is localCheckpoint()ed each round: it is referenced TWICE
    per round (both endpoints), and without materialization the logical
    plan doubles per round (2^rounds blowup) — the checkpoint keeps
    lineage flat, the same driver-loop discipline as llm_kmeans_train.
    The edge set itself is never reshuffled. All-integer, order-free —
    value-hash exact in DuckDB.

    Early exit: peeling only ever REMOVES nodes, so an unchanged node
    COUNT after a round proves set equality — a fixed point — and every
    further round is a no-op in both engines (the oracle's full
    _KCORE_ROUNDS CTE chain reaches the identical set). On a dense graph
    that converges in 1-2 rounds this cuts the driver loop from 6 passes
    over the edge set to 2-3 (measured 69 s → ~25 s at sf1); the count is
    one scalar job over the just-checkpointed |V|-row list, not a
    collect."""
    apply_engine_conf(spark)
    edges = _copurchase_edges(spark, sf_dir)
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint()
    n_prev = nodes.count()
    for _ in range(_KCORE_ROUNDS):
        a = nodes.select(F.col("node").alias("na"))
        b = nodes.select(F.col("node").alias("nb"))
        nodes = (
            edges.join(F.broadcast(a), edges.src == F.col("na"))
            .join(F.broadcast(b), edges.dst == F.col("nb"))
            .groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= _KCORE_K)
            .select("node")
            .localCheckpoint()
        )
        n_cur = nodes.count()
        if n_cur == n_prev:
            break
        n_prev = n_cur
    a = nodes.select(F.col("node").alias("na"))
    b = nodes.select(F.col("node").alias("nb"))
    return (
        edges.join(F.broadcast(a), edges.src == F.col("na"))
        .join(F.broadcast(b), edges.dst == F.col("nb"))
        .groupBy(F.col("src").alias("suppkey"))
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .select(
            F.col("suppkey").cast("bigint"),
            F.col("core_degree").cast("bigint"),
            F.lit(_KCORE_K).cast("int").alias("k"),
        )
        .orderBy("suppkey")
    )


# --- graph_bfs: multi-source BFS hop distance ---------------------------------

# The "how far is every node from the nearest hub" primitive (network
# reach, cascade radius, infrastructure coverage). Seeds are the 3
# smallest node ids — deterministic at every SF and trivially
# re-derivable in SQL. Distance is the MINIMUM hop count to any seed,
# bounded at _BFS_HOPS; level-synchronous frontier expansion is the
# textbook distributed BFS: each round joins the (tiny) frontier against
# the edge set and anti-joins the visited set, so per-round work is
# |frontier-adjacent edges|, not |V|². All-integer — value-hash exact.
_BFS_HOPS = 3
_BFS_SEEDS = 3


def _bfs_oracle() -> str:
    ctes = [
        """nodes AS (SELECT DISTINCT src AS node FROM edges),
seeds AS (SELECT node FROM nodes ORDER BY node LIMIT 3),
d0 AS (SELECT node, 0 AS dist FROM seeds)"""
    ]
    for h in range(1, _BFS_HOPS + 1):
        ctes.append(
            f"""f{h} AS (
  SELECT DISTINCT e.dst AS node
  FROM edges e JOIN d{h - 1} v ON v.node = e.src
  WHERE e.dst NOT IN (SELECT node FROM d{h - 1})
),
d{h} AS (
  SELECT node, dist FROM d{h - 1}
  UNION ALL SELECT node, {h} AS dist FROM f{h}
)"""
        )
    chain = ",\n".join(ctes)
    return f"""
WITH pair_counts AS MATERIALIZED (
  SELECT l1.l_suppkey AS src, l2.l_suppkey AS dst, COUNT(*) AS w
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
  GROUP BY l1.l_suppkey, l2.l_suppkey
),
edges AS MATERIALIZED (
  SELECT src, dst FROM pair_counts
  WHERE w > (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) FROM pair_counts)
),
{chain}
SELECT CAST(node AS BIGINT) AS suppkey, CAST(dist AS INT) AS dist
FROM d{_BFS_HOPS}
ORDER BY suppkey
"""


@register("graph_bfs", oracle=_bfs_oracle(), tags=("graph",))
def graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS: minimum hop distance (≤ 3) from the 3
    smallest-id supplier nodes over the co-purchase graph —
    level-synchronous frontier expansion, the canonical distributed BFS.

    Scale shape: per round, the CURRENT FRONTIER (not the visited set,
    not |V|) joins the never-reshuffled edge set — a broadcast join while
    the frontier is small, AQE's call once it grows; the visited set is
    removed by LEFT ANTI join and localCheckpoint()ed so lineage stays
    one level deep per hop (the kcore/kmeans driver-loop discipline —
    a loop over plans, never over data). Early exit on an empty frontier:
    the remaining rounds are no-ops in both engines, so the bounded
    DuckDB CTE chain reaches the identical fixed point. Every exchange
    carries (BIGINT, BIGINT) pairs; all-integer, value-hash exact."""
    apply_engine_conf(spark)
    edges = _copurchase_edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(_BFS_SEEDS)
    )
    visited = seeds.select("node", F.lit(0).alias("dist")).localCheckpoint()
    frontier = visited.select("node")
    for h in range(1, _BFS_HOPS + 1):
        frontier = (
            edges.join(F.broadcast(frontier), edges.src == F.col("node"))
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .localCheckpoint()
        )
        if frontier.count() == 0:
            break
        visited = visited.unionByName(
            frontier.select("node", F.lit(h).alias("dist"))
        ).localCheckpoint()
    return visited.select(
        F.col("node").cast("bigint").alias("suppkey"),
        F.col("dist").cast("int").alias("dist"),
    ).orderBy("suppkey")


# --- graph_adamic_adar: link-prediction scoring ------------------------------

# Adamic–Adar: for an edge (a, b), sum over common neighbors w of
# 1 / ln(deg(w)) — the classic link-prediction / tie-strength feature
# that, unlike raw common-neighbor counts (graph_jaccard's numerator),
# DOWN-WEIGHTS hub intermediaries: a shared neighbor connected to
# everything is weak evidence, a shared niche neighbor is strong.
# Exactness: each neighbor's term is FLOOR(10^6 / ln(deg)) — ln and the
# division run on identical operands in both engines, floor removes the
# last-ulp knife edge, and the per-edge score is then a SUM of BIGINTs
# (commutative — partitioning-independent). deg(w) >= 2 for any common
# neighbor (w touches both endpoints), so ln never sees 1.
#
# Weights ride the EDGE table, not the credit stream: attaching
# FLOOR(10^6/ln deg) to fwd's two endpoints (|E|/2-row joins) lets every
# triangle carry t_a, t_b, t_c inline, so the 3x|tri| credit stream is
# pure projection + ONE aggregate — profiled at sf1 (134M triangles),
# joining the per-node weight onto the credit stream instead costs 342 s
# in the oracle engine vs ~140 s for this shape; the same restructuring
# removes a 400M-row broadcast-join probe from the Spark side.
_AA_SCALE = 1_000_000

_ADAMIC_ADAR_ORACLE = """
WITH pair_counts AS MATERIALIZED (
  SELECT l1.l_suppkey AS src, l2.l_suppkey AS dst, COUNT(*) AS w
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
  GROUP BY l1.l_suppkey, l2.l_suppkey
),
edges AS MATERIALIZED (
  SELECT src, dst FROM pair_counts
  WHERE w > (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) FROM pair_counts)
),
wt AS MATERIALIZED (
  -- deg-1 nodes: ln(1)=0 would divide by zero (ANSI Spark throws, DuckDB
  -- yields inf) — but a degree-1 node can never be a COMMON neighbor of
  -- an edge's endpoints, so its weight is never consumed; define it 0.
  SELECT src AS node,
         CASE WHEN COUNT(*) < 2 THEN 0
              ELSE CAST(floor(1000000.0 / ln(CAST(COUNT(*) AS DOUBLE))) AS BIGINT)
         END AS t
  FROM edges GROUP BY src
),
fwd AS MATERIALIZED (
  SELECT e.src, e.dst, wa.t AS t_src, wb.t AS t_dst
  FROM (SELECT src, dst FROM edges WHERE src < dst) e
  JOIN wt wa ON wa.node = e.src
  JOIN wt wb ON wb.node = e.dst
),
tri AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c,
         e1.t_src AS t_a, e1.t_dst AS t_b, e2.t_dst AS t_c
  FROM fwd e1
  JOIN fwd e2 ON e2.src = e1.dst
  JOIN fwd e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
scored AS MATERIALIZED (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS common_neighbors,
         CAST(SUM(t) AS BIGINT) AS aa_micro
  FROM (
    SELECT a AS x, b AS y, t_c AS t FROM tri
    UNION ALL SELECT a, c, t_b FROM tri
    UNION ALL SELECT b, c, t_a FROM tri
  )
  GROUP BY x, y
)
SELECT f.src, f.dst,
       COALESCE(s.common_neighbors, 0) AS common_neighbors,
       COALESCE(s.aa_micro, 0) AS aa_micro,
       CAST(COALESCE(s.aa_micro, 0) AS DOUBLE) / 1000000.0 AS adamic_adar
FROM fwd f
LEFT JOIN scored s ON s.x = f.src AND s.y = f.dst
"""


@register("graph_adamic_adar", oracle=_ADAMIC_ADAR_ORACLE, tags=("graph",))
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link-prediction score for every co-purchase edge: the
    hub-discounted common-neighbor measure (Σ 1/ln deg(w)) — the feature
    ranking "which weak ties are about to become strong" in
    recommendation and graph-cleaning pipelines.

    Scale shape: REUSES graph_jaccard's degree-bounded oriented triangle
    pipeline, but the per-node weight FLOOR(10^6/ln deg) is attached to
    the EDGE table's two endpoints up front (two broadcast joins on the
    |E|/2-row oriented edge list) so each canonical triangle carries all
    three neighbor weights INLINE — the 3x|tri| credit stream is a pure
    map-side explode feeding ONE hash aggregate, with no join anywhere on
    the triangle-sized data (profiled: the join-the-credits alternative
    is 2.4x slower at sf1 and the gap widens with triangle count).
    Integer micro-unit sums — bit-portable on any partitioning (see
    module comment)."""
    apply_engine_conf(spark)
    edges = _copurchase_edges(spark, sf_dir)
    # deg-1 guard mirrors the oracle: ln(1)=0 would raise DIVIDE_BY_ZERO
    # under ANSI; a degree-1 node is never a common neighbor, so 0 is safe
    wt = edges.groupBy(F.col("src").alias("node")).agg(
        F.when(F.count(F.lit(1)) < 2, F.lit(0).cast("bigint"))
        .otherwise(
            F.floor(
                F.lit(float(_AA_SCALE)) / F.log(F.count(F.lit(1)).cast("double"))
            ).cast("bigint")
        )
        .alias("t")
    )
    fwd = (
        edges.filter(F.col("src") < F.col("dst"))
        .join(F.broadcast(wt.select(F.col("node").alias("src"), F.col("t").alias("t_src"))), "src")
        .join(F.broadcast(wt.select(F.col("node").alias("dst"), F.col("t").alias("t_dst"))), "dst")
        .select("src", "dst", "t_src", "t_dst")
    )
    # round-10: same adjacency-intersection triangle enumeration as
    # _oriented_triangles, with the per-node weight PACKED INTO the long
    # adjacency element (dst * 2^22 + t) so the exploded common neighbor
    # (c, t_c) needs no join on the triangle-sized stream. The packing is
    # load-bearing twice: array_intersect only takes its hashed fast path
    # for atomic element types (struct elements fall back to pairwise
    # O(deg²) membership scans — measured 43 s vs ~2 s here), and t is
    # functionally dependent on dst so packed values match across sides.
    # Bounds: t = floor(1e6/ln(deg)) <= 1.443M < 2^22 (deg >= 2; a deg-1
    # node can never be a common neighbor), and dst < 2^41 keeps
    # dst*2^22 + t inside int64. The dst bound is ENFORCED, not assumed
    # (ADVICE r10): assert_true fails the query loudly on an out-of-range
    # id instead of silently corrupting triangles/weights. One comparison
    # per EDGE row (never triangle-grain); ifnull folds the passing NULL
    # to +0 so the packed value is unchanged.
    adjw = fwd.groupBy("src").agg(
        F.collect_list(
            F.expr(
                "dst * 4194304L + t_dst + ifnull(assert_true(dst < 2199023255552L,"
                " 'graph_adamic_adar: node id >= 2^41 overflows the dst*2^22+t"
                " packing'), 0L)"
            )
        ).alias("nbrs")
    )
    e = fwd.join(
        adjw.select(F.col("src").alias("a_"), F.col("nbrs").alias("na")),
        F.col("src") == F.col("a_"),
    ).join(
        adjw.select(F.col("src").alias("b_"), F.col("nbrs").alias("nb")),
        F.col("dst") == F.col("b_"),
        "left",
    )
    tri = e.select(
        F.col("src").alias("a"),
        F.col("dst").alias("b"),
        F.col("t_src").alias("t_a"),
        F.col("t_dst").alias("t_b"),
        F.explode(F.array_intersect("na", "nb")).alias("cw"),
    ).select(
        "a",
        "b",
        F.expr("cw div 4194304L").alias("c"),
        "t_a",
        "t_b",
        F.expr("cw % 4194304L").alias("t_c"),
    )
    contrib = tri.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("x"), F.col("b").alias("y"), F.col("t_c").alias("t")),
                F.struct(F.col("a").alias("x"), F.col("c").alias("y"), F.col("t_b").alias("t")),
                F.struct(F.col("b").alias("x"), F.col("c").alias("y"), F.col("t_a").alias("t")),
            )
        ).alias("p")
    ).select("p.x", "p.y", "p.t")
    scored = contrib.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("common_neighbors"),
        F.sum("t").cast("bigint").alias("aa_micro"),
    )
    return (
        fwd.join(scored, (fwd.src == scored.x) & (fwd.dst == scored.y), "left")
        .select(
            "src",
            "dst",
            F.coalesce("common_neighbors", F.lit(0)).cast("bigint").alias(
                "common_neighbors"
            ),
            F.coalesce("aa_micro", F.lit(0)).cast("bigint").alias("aa_micro"),
            (F.coalesce("aa_micro", F.lit(0)).cast("double") / _AA_SCALE).alias(
                "adamic_adar"
            ),
        )
    )


# --- graph_reciprocity: weighted reciprocity of the behavior-transition graph -

# The directed companion to the symmetric co-purchase graph: nodes are
# event types, a directed edge (a → b) with weight w counts how often a
# user's event of type a is IMMEDIATELY followed by one of type b (the
# Markov transition graph behind funnel design and bot detection — organic
# behavior has asymmetric flows like view→purchase ≫ purchase→view).
# Weighted reciprocity per source node: Σ_b min(w(a,b), w(b,a)) / Σ_b
# w(a,b) — 1.0 means every outflow is matched by an equal return flow.
_RECIPROCITY_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC) AS prev_type
  FROM events
),
edges AS (
  SELECT prev_type AS src, event_type AS dst,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM seq
  WHERE prev_type IS NOT NULL AND prev_type <> event_type
  GROUP BY prev_type, event_type
),
matched AS (
  SELECT e.src, e.dst, e.w,
         COALESCE(r.w, 0) AS w_rev,
         CASE WHEN e.w < COALESCE(r.w, 0) THEN e.w
              ELSE COALESCE(r.w, 0) END AS w_min
  FROM edges e LEFT JOIN edges r ON r.src = e.dst AND r.dst = e.src
)
SELECT src AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_out_edges,
       CAST(SUM(w) AS BIGINT) AS out_weight,
       CAST(SUM(w_min) AS BIGINT) AS reciprocated_weight,
       CAST(SUM(w_min) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS reciprocity
FROM matched
GROUP BY src
"""


@register("graph_reciprocity", oracle=_RECIPROCITY_ORACLE, tags=("graph",))
def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reciprocity of the directed behavior-transition graph:
    nodes are event types, edge (a → b) counts immediate a→b successions
    within a user's stream; reciprocity(a) = Σ min(w_ab, w_ba) / Σ w_ab.
    Organic flows are asymmetric (view→purchase ≫ purchase→view) — a
    reciprocity spike is a bot/replay signature.

    Scale shape: the corpus-sized work is ONE user-keyed window (lag) —
    the same exchange any sessionization pays — collapsing map-side into
    the ≤ |types|² edge table; the reverse-edge match is a self-join on
    that bounded table (broadcast at any corpus size: the node domain,
    not the data, bounds it). Counts are BIGINT; the single division has
    exact-operand inputs, bit-identical in both engines."""
    apply_engine_conf(spark)
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    # Persisted: the ≤ |types|² edge table feeds BOTH sides of the
    # reverse-edge self-join — without the persist, the corpus-sized lag
    # window runs twice.
    edges = scoped_persist(
        seq.filter(
            F.col("prev_type").isNotNull()
            & (F.col("prev_type") != F.col("event_type"))
        )
        .groupBy(
            F.col("prev_type").alias("src"), F.col("event_type").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    rev = edges.select(
        F.col("src").alias("r_dst"), F.col("dst").alias("r_src"),
        F.col("w").alias("w_rev"),
    )
    matched = edges.join(
        F.broadcast(rev),
        (F.col("src") == F.col("r_src")) & (F.col("dst") == F.col("r_dst")),
        "left",
    ).select(
        "src",
        "w",
        F.least(F.col("w"), F.coalesce(F.col("w_rev"), F.lit(0))).alias("w_min"),
    )
    return matched.groupBy(F.col("src").alias("event_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_out_edges"),
        F.sum("w").cast("bigint").alias("out_weight"),
        F.sum("w_min").cast("bigint").alias("reciprocated_weight"),
        (F.sum("w_min").cast("double") / F.sum("w").cast("double")).alias(
            "reciprocity"
        ),
    )


# --- graph_modularity: partition quality of an attribute community ------------

# Newman modularity of the supplier-nation partition over the co-purchase
# graph: do suppliers co-sell within their nation more than a random
# degree-preserving rewiring would predict? Q = Σ_c (e_c/m2 − (K_c/m2)²)
# with m2 = directed edge count (the symmetric list counts each
# undirected edge twice), e_c = within-community directed edges, K_c =
# community degree sum. All counts are BIGINT; every division has
# exact-operand inputs, and the global Q is the division of two exact
# BIGINTs (Q_num = m2·Σe_c − ΣK_c², denominator m2²) — no float
# accumulation anywhere.
_MODULARITY_ORACLE = """
WITH pair_counts AS MATERIALIZED (
  SELECT l1.l_suppkey AS src, l2.l_suppkey AS dst, COUNT(*) AS w
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
  GROUP BY l1.l_suppkey, l2.l_suppkey
),
edges AS MATERIALIZED (
  SELECT src, dst FROM pair_counts
  WHERE w > (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) FROM pair_counts)
),
lab AS (
  SELECT e.src, e.dst,
         ss.s_nationkey AS c_src, sd.s_nationkey AS c_dst
  FROM edges e
  JOIN supplier ss ON ss.s_suppkey = e.src
  JOIN supplier sd ON sd.s_suppkey = e.dst
),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM edges),
by_c AS (
  SELECT c_src AS community,
         CAST(COUNT(*) AS BIGINT) AS degree_sum,
         CAST(SUM(CASE WHEN c_src = c_dst THEN 1 ELSE 0 END) AS BIGINT)
           AS internal_edges
  FROM lab GROUP BY c_src
),
tot AS (
  SELECT CAST(SUM(internal_edges) AS BIGINT) AS sum_e,
         CAST(SUM(degree_sum * degree_sum) AS BIGINT) AS sum_k2
  FROM by_c
)
SELECT b.community,
       CAST((SELECT COUNT(DISTINCT s_nationkey) FROM supplier
             WHERE s_suppkey IN (SELECT src FROM edges)) AS BIGINT)
         AS n_communities,
       b.degree_sum, b.internal_edges,
       CAST(b.internal_edges AS DOUBLE) / CAST(m.m2 AS DOUBLE)
         - (CAST(b.degree_sum AS DOUBLE) / CAST(m.m2 AS DOUBLE))
           * (CAST(b.degree_sum AS DOUBLE) / CAST(m.m2 AS DOUBLE))
         AS q_contrib,
       CAST(m.m2 * t.sum_e - t.sum_k2 AS DOUBLE)
         / CAST(m.m2 * m.m2 AS DOUBLE) AS q_global
FROM by_c b, m, tot t
"""


@register("graph_modularity", oracle=_MODULARITY_ORACLE, tags=("graph",))
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the supplier-nation partition over the
    co-purchase graph — the partition-quality score behind community
    detection: q_contrib per nation (within-nation edge share minus the
    degree-preserving null expectation) and the exact global Q.

    Scale shape: edges come from the memoized persisted co-purchase
    build shared with pagerank/cc/kcore (one build per session × sf);
    labeling is a BROADCAST of the supplier dim onto both endpoints; the
    per-community rollup and the two scalar aggregates (m2, ΣK²) are all
    bounded-table work. Q_num = m2·Σe_c − ΣK_c² stays BIGINT-exact
    (m2 ≤ \\|E\\|, K_c² ≤ m2² — int64-safe to ~3e9 directed edges), and
    every emitted double is a division of exact operands."""
    apply_engine_conf(spark)
    edges = _copurchase_edges(spark, sf_dir)
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    lab = (
        edges.join(
            F.broadcast(supp.withColumnRenamed("s_nationkey", "c_src")),
            edges.src == F.col("s_suppkey"),
        )
        .drop("s_suppkey")
        .join(
            F.broadcast(supp.withColumnRenamed("s_nationkey", "c_dst")),
            F.col("dst") == F.col("s_suppkey"),
        )
        .drop("s_suppkey")
    )
    by_c = lab.groupBy(F.col("c_src").alias("community")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree_sum"),
        F.sum(F.when(F.col("c_src") == F.col("c_dst"), 1).otherwise(0))
        .cast("bigint")
        .alias("internal_edges"),
    )
    from pyspark.sql import Window

    wall = Window.partitionBy()
    m2 = F.sum("degree_sum").over(wall).cast("bigint")
    sum_e = F.sum("internal_edges").over(wall).cast("bigint")
    sum_k2 = (
        F.sum(F.col("degree_sum") * F.col("degree_sum")).over(wall).cast("bigint")
    )
    n_comm = F.count(F.lit(1)).over(wall).cast("bigint")
    d = F.col("degree_sum").cast("double") / m2.cast("double")
    return by_c.select(
        "community",
        n_comm.alias("n_communities"),
        "degree_sum",
        "internal_edges",
        (
            F.col("internal_edges").cast("double") / m2.cast("double") - d * d
        ).alias("q_contrib"),
        (
            (m2 * sum_e - sum_k2).cast("double") / (m2 * m2).cast("double")
        ).alias("q_global"),
    )


# --- graph_clustering_coef: local clustering coefficient ----------------------

# The local-density companion to graph_triangles' counts: c_v =
# 2·T_v / (deg_v·(deg_v − 1)) — how close each supplier's neighborhood
# is to a clique (high c_v + low degree = tight ring; web-graph spam
# farms and co-purchase cliques both surface here). Triangle counts come
# from the same oriented (src < dst) pipeline as graph_triangles — each
# triangle enumerated ONCE — joined back to the degree table so
# zero-triangle nodes still appear; nodes of degree < 2 are excluded
# (coefficient undefined). The division sees two exact BIGINTs.
_CLUSTERING_ORACLE = """
WITH pair_counts AS MATERIALIZED (
  SELECT l1.l_suppkey AS src, l2.l_suppkey AS dst, COUNT(*) AS w
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
  GROUP BY l1.l_suppkey, l2.l_suppkey
),
edges AS MATERIALIZED (
  SELECT src, dst FROM pair_counts
  WHERE w > (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) FROM pair_counts)
),
fwd AS MATERIALIZED (SELECT src, dst FROM edges WHERE src < dst),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
        FROM edges GROUP BY src),
tri AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM fwd e1
  JOIN fwd e2 ON e2.src = e1.dst
  JOIN fwd e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
per_node AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY node
)
SELECT CAST(d.node AS BIGINT) AS suppkey, d.degree,
       COALESCE(p.n_triangles, 0) AS n_triangles,
       CAST(2 * COALESCE(p.n_triangles, 0) AS DOUBLE)
         / CAST(d.degree * (d.degree - 1) AS DOUBLE) AS clustering
FROM deg d LEFT JOIN per_node p ON p.node = d.node
WHERE d.degree >= 2
"""


@register("graph_clustering_coef", oracle=_CLUSTERING_ORACLE, tags=("graph",))
def graph_clustering_coef(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per supplier: c_v = 2·T_v /
    (deg_v·(deg_v − 1)) over the co-purchase graph — the
    neighborhood-density score (cliques and spam-farm rings have c ≈ 1,
    hubs bridging communities have c ≈ 0) that graph_triangles' raw
    counts don't normalize for.

    Scale shape: reuses the memoized persisted edge build; triangles are
    enumerated once on the oriented (src < dst) half (the degree-bounded
    graph_triangles pipeline), then LEFT-joined back to the degree table
    so zero-triangle nodes keep a row. Everything exchanged is
    (node, BIGINT) pairs; the coefficient divides two exact BIGINTs —
    bit-identical in both engines."""
    apply_engine_conf(spark)
    edges = _copurchase_edges(spark, sf_dir)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    # triangles via the shared adjacency-intersection enumerator (see
    # _oriented_triangles); ONE explode of the 3 corners replaces the
    # 3-branch union, which re-enumerated all triangles per branch
    tri = _oriented_triangles(spark, sf_dir)
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return (
        deg.filter(F.col("degree") >= 2)
        .join(per_node, "node", "left")
        .select(
            F.col("node").cast("bigint").alias("suppkey"),
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("bigint").alias(
                "n_triangles"
            ),
            (
                (2 * F.coalesce(F.col("n_triangles"), F.lit(0))).cast("double")
                / (F.col("degree") * (F.col("degree") - 1)).cast("double")
            ).alias("clustering"),
        )
    )


# --- graph_hits: hubs & authorities on the customer->supplier graph -----------

# Kleinberg's HITS on the bipartite purchase graph: customers are hubs
# (who buys broadly from the good suppliers), suppliers are authorities
# (who is bought from by the strong hubs). Two full hub<->authority
# rounds, unrolled in the oracle exactly like graph_pagerank's.
#
# Fixed-point discipline (pagerank's recipe, adapted to HITS's
# normalization): scores are BIGINTs; after each matrix product the
# vector is renormalized with  x div ((max(x) div SCALE) + 1)  — pure
# integer ops, so both engines agree bit-for-bit, and (unlike the
# textbook x*SCALE/max) the intermediate never multiplies a raw sum by
# SCALE, keeping every value inside int64 through sf10000
# (sum(w * score) <= SCALE * |lineitem|).
_HITS_SCALE = 1_000_000

_HITS_ORACLE = f"""
WITH edges AS MATERIALIZED (
  SELECT o.o_custkey AS cust, l.l_suppkey AS supp, COUNT(*) AS w
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey, l.l_suppkey
),
a1_raw AS (SELECT supp, CAST(SUM(w) AS BIGINT) AS x FROM edges GROUP BY supp),
m1 AS (SELECT MAX(x) AS m FROM a1_raw),
a1 AS (SELECT supp, x // (((SELECT m FROM m1) // {_HITS_SCALE}) + 1) AS a FROM a1_raw),
h1_raw AS (
  SELECT e.cust, CAST(SUM(e.w * a1.a) AS BIGINT) AS x
  FROM edges e JOIN a1 ON a1.supp = e.supp GROUP BY e.cust
),
m2 AS (SELECT MAX(x) AS m FROM h1_raw),
h1 AS (SELECT cust, x // (((SELECT m FROM m2) // {_HITS_SCALE}) + 1) AS h FROM h1_raw),
a2_raw AS (
  SELECT e.supp, CAST(SUM(e.w * h1.h) AS BIGINT) AS x
  FROM edges e JOIN h1 ON h1.cust = e.cust GROUP BY e.supp
),
m3 AS (SELECT MAX(x) AS m FROM a2_raw),
a2 AS (SELECT supp, x // (((SELECT m FROM m3) // {_HITS_SCALE}) + 1) AS a FROM a2_raw)
SELECT a2.supp AS suppkey,
       CAST(a1.a AS BIGINT) AS auth1_fixed,
       CAST(a2.a AS BIGINT) AS auth2_fixed,
       CAST(RANK() OVER (ORDER BY a2.a DESC, a2.supp ASC) AS BIGINT) AS auth_rank
FROM a2 JOIN a1 ON a1.supp = a2.supp
"""


@register("graph_hits", oracle=_HITS_ORACLE, tags=("graph", "iterative"))
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled HITS rounds on the bipartite customer→supplier
    purchase graph: supplier authority = Σ over buying customers of
    (edge weight × customer hub), hub = the transpose product, each
    renormalized in pure integer arithmetic so both engines agree
    bit-for-bit (see module fixed-point note).

    Scale shape: the corpus-sized work is ONE fact shuffle building the
    (cust, supp, w) edge table — persisted because all three matrix
    products reuse it; every product joins edges to a node-grain score
    vector (BROADCAST — the node domain, not the data, bounds it) and
    reduces map-side by the opposite endpoint. The rank window rides the
    |suppliers|-row result."""
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    edges = scoped_persist(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )

    def _norm(df: DataFrame, key: str, out: str) -> DataFrame:
        # round-11: the raw vector is consumed twice (1-row max + the
        # normalization join), so without a cache every reference
        # re-derived the whole product chain from the edge table — the
        # plan doubled per product (64 KB plan text, 61 jobs, most of
        # the 4.8 s sf0.1 wall, profiled r11). The cached table is
        # node-grain (|suppliers| or |customers| rows, two BIGINTs).
        df = scoped_persist(df)
        m = df.agg(F.max("x").alias("m"))
        return df.join(F.broadcast(m)).select(
            key, F.expr(f"x div ((m div {_HITS_SCALE}) + 1)").alias(out)
        )

    a1 = scoped_persist(
        _norm(
            edges.groupBy("supp").agg(F.sum("w").cast("bigint").alias("x")),
            "supp",
            "a",
        )
    )  # a1 is consumed twice more: the h1 product and the final join
    h1 = _norm(
        edges.join(F.broadcast(a1), "supp")
        .groupBy("cust")
        .agg(F.sum(F.col("w") * F.col("a")).cast("bigint").alias("x")),
        "cust",
        "h",
    )
    a2 = _norm(
        edges.join(F.broadcast(h1), "cust")
        .groupBy("supp")
        .agg(F.sum(F.col("w") * F.col("h")).cast("bigint").alias("x")),
        "supp",
        "a",
    )
    from pyspark.sql import Window

    rank_w = Window.orderBy(F.desc("auth2_fixed"), F.asc("suppkey"))
    return (
        a2.select(F.col("supp").alias("suppkey"), F.col("a").alias("auth2_fixed"))
        .join(a1.select(F.col("supp").alias("suppkey"), F.col("a").alias("auth1_fixed")), "suppkey")
        .select(
            "suppkey",
            "auth1_fixed",
            "auth2_fixed",
            F.rank().over(rank_w).cast("bigint").alias("auth_rank"),
        )
    )


# --- graph_degree_dist: log2-bucketed degree distribution ---------------------

# The sanity check run BEFORE any expensive graph algorithm: is the degree
# distribution heavy-tailed (scale-free) or flat? Which log2 band holds
# the hubs that make triangle counting / clustering quadratic? Buckets
# are derived WITHOUT libm: length(bin(deg)) == floor(log2(deg)) + 1 is
# pure integer/string arithmetic in both engines, so there is no
# power-of-two ulp cliff (ln(8)/ln(2) can round below 3).
_DEGREE_DIST_ORACLE = """
WITH pair_counts AS MATERIALIZED (
  SELECT l1.l_suppkey AS src, l2.l_suppkey AS dst, COUNT(*) AS w
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
  GROUP BY l1.l_suppkey, l2.l_suppkey
),
edges AS MATERIALIZED (
  SELECT src, dst FROM pair_counts
  WHERE w > (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) FROM pair_counts)
),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src),
n AS (SELECT COUNT(*) AS c FROM deg),
hist AS (
  SELECT CAST(length(bin(d)) AS BIGINT) AS bucket,
         COUNT(*) AS n_nodes,
         CAST(MIN(d) AS BIGINT) AS min_deg,
         CAST(MAX(d) AS BIGINT) AS max_deg
  FROM deg GROUP BY length(bin(d))
)
SELECT bucket, n_nodes, min_deg, max_deg,
       CAST(n_nodes AS DOUBLE) / (SELECT c FROM n) AS node_share
FROM hist
"""


@register("graph_degree_dist", oracle=_DEGREE_DIST_ORACLE, tags=("graph",))
def graph_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed degree distribution of the co-purchase graph (bucket
    b holds degrees in [2^(b-1), 2^b)): node counts, exact band min/max,
    and share — the heavy-tail diagnostic run before committing to a
    quadratic neighborhood algorithm.

    Scale shape: reuses the memoized persisted edge build (pagerank/cc/
    kcore twin); degrees are one map-side-combined aggregate at the node
    grain; the histogram re-aggregates the |V|-row degree table into <=
    log2(|V|) buckets. Bucketing is length(bin(d)) — integer exact, no
    ln() power-of-two cliff. node_share divides two exact BIGINTs."""
    apply_engine_conf(spark)
    edges = _copurchase_edges(spark, sf_dir)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    n = deg.agg(F.count(F.lit(1)).alias("c"))
    hist = deg.groupBy(F.length(F.bin("d")).cast("bigint").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("d").cast("bigint").alias("min_deg"),
        F.max("d").cast("bigint").alias("max_deg"),
    )
    return hist.join(F.broadcast(n)).select(
        "bucket",
        "n_nodes",
        "min_deg",
        "max_deg",
        (F.col("n_nodes").cast("double") / F.col("c")).alias("node_share"),
    )


# --- graph_label_prop: community detection by majority-label propagation ------

# Complements the family's propagation trio (pagerank = weighted rank,
# cc = reachability, label-prop = COMMUNITIES): each round, every node
# adopts the label most frequent among its neighbors, ties broken by the
# SMALLEST label — the synchronous LPA of Raghavan et al. (2007), made
# fully deterministic (classic LPA breaks ties randomly; a random tie
# would be engine-unreproducible). The argmax-with-tie-break is encoded
# as one integer MIN: key = (10^9 - cnt) * 10^9 + lbl — higher count
# sorts first, then smaller label — so each round is count + MIN
# aggregates, commutative and bit-exact on any partitioning.
_LP_ITERS = 2
_LP_ENC = 1_000_000_000


def _label_prop_oracle() -> str:
    labs = ["lab0"]
    iters = []
    for k in range(_LP_ITERS):
        prev, cur = labs[-1], f"lab{k + 1}"
        iters.append(f"""
{cur} AS MATERIALIZED (
  SELECT node,
         MIN(({_LP_ENC} - cnt) * {_LP_ENC} + lbl) % {_LP_ENC} AS lbl
  FROM (
    SELECT e.dst AS node, l.lbl, COUNT(*) AS cnt
    FROM edges e JOIN {prev} l ON l.node = e.src
    GROUP BY e.dst, l.lbl
  )
  GROUP BY node
)""")
        labs.append(cur)
    return f"""
WITH pair_counts AS MATERIALIZED (
  SELECT l1.l_suppkey AS src, l2.l_suppkey AS dst, COUNT(*) AS w
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
  GROUP BY l1.l_suppkey, l2.l_suppkey
),
edges AS MATERIALIZED (
  SELECT src, dst FROM pair_counts
  WHERE w > (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) FROM pair_counts)
),
lab0 AS MATERIALIZED (
  SELECT DISTINCT src AS node, src AS lbl FROM edges
),{",".join(iters)},
sizes AS (
  SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS community_size
  FROM {labs[-1]} GROUP BY lbl
)
SELECT CAST(l.node AS BIGINT) AS suppkey, CAST(l.lbl AS BIGINT) AS community,
       s.community_size
FROM {labs[-1]} l JOIN sizes s ON s.community = l.lbl
ORDER BY suppkey
"""


@register("graph_label_prop", oracle=_label_prop_oracle(), tags=("graph", "iterative"))
def graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation (LPA communities) on
    the supplier co-purchase graph: each round every node adopts its
    neighbors' MAJORITY label, smallest-label tie-break — the random
    tie-break of textbook LPA replaced by an integer encoding
    ((10^9 - cnt)·10^9 + lbl, one MIN) so the fixed point is bit-exact
    in DuckDB and on any cluster partitioning.

    Scale shape: per round ONE broadcast join of the |V|-row label table
    onto the never-reshuffled edge set, a (node, lbl) count aggregate
    (map-side combinable), and a MIN over the encoded key — the graph_cc
    loop with count-weighted labels; the same swap to a co-partitioned
    shuffle join applies when |V| outgrows a broadcast. _LP_ITERS is a
    driver loop over plans, never over data."""
    apply_engine_conf(spark)
    edges = _copurchase_edges(spark, sf_dir)
    lab = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(_LP_ITERS):
        votes = (
            edges.join(F.broadcast(lab), edges.src == lab.node)
            .select(F.col("dst").alias("node"), "lbl")
            .groupBy("node", "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        lab = votes.groupBy("node").agg(
            (
                F.min((F.lit(_LP_ENC) - F.col("cnt")) * _LP_ENC + F.col("lbl"))
                % _LP_ENC
            ).alias("lbl")
        )
    # round-11: the closing sizes aggregate + join consume lab twice —
    # cache the final |V|-row label table so the whole _LP_ITERS vote
    # chain executes once instead of twice (guide §5).
    lab = scoped_persist(lab)
    sizes = lab.groupBy(F.col("lbl").alias("community")).agg(
        F.count(F.lit(1)).alias("community_size")
    )
    return (
        lab.join(F.broadcast(sizes), lab.lbl == sizes.community)
        .select(
            F.col("node").cast("bigint").alias("suppkey"),
            F.col("lbl").cast("bigint").alias("community"),
            "community_size",
        )
        .orderBy("suppkey")
    )


# --- graph_cc_shuffle: min-label CC in the shuffle-join form -------------------


@register("graph_cc_shuffle", oracle=_cc_oracle(), tags=("graph", "iterative"))
def graph_cc_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graph_cc's documented 100 TB graduation, implemented: the SAME
    min-label propagation algebra (identical oracle, identical output),
    but the per-round label join is a CO-PARTITIONED SHUFFLE join (merge
    hint) instead of a broadcast — the form that works when |V| outgrows
    what a broadcast can carry. Because the label table and the edge set
    shuffle on the same key (src/node) every round, consecutive rounds
    reuse the exchange layout; the MIN aggregates stay map-side
    combinable. Plan-gated: NO broadcast anywhere on the label loop —
    the gate proves the declared plan, not the optimizer's small-data
    shortcut. Integer MIN labels keep the fixed point bit-exact on any
    partitioning (see graph_cc).

    Round-11: same frontier-only delta iteration + per-round persist as
    graph_cc (identical fixed point — proof there), expressed with merge
    hints on every label-loop join so the declared no-broadcast cluster
    shape is preserved. The frontier shrinkage matters MOST in this form:
    each round's shuffle carries only changed labels and their edge
    fan-out instead of the full |E| join."""
    apply_engine_conf(spark)
    edges = _copurchase_edges(spark, sf_dir)
    m1 = edges.groupBy(F.col("dst").alias("node")).agg(F.min("src").alias("minl"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    lab = scoped_persist(
        nodes.join(m1.hint("merge"), "node", "left").select(
            "node", F.least(F.col("node"), F.coalesce("minl", "node")).alias("lbl")
        )
    )
    delta = lab.filter(F.col("lbl") < F.col("node"))
    for _ in range(_CC_ITERS - 1):
        dmin = (
            edges.join(
                delta.select(F.col("node").alias("src"), "lbl").hint("merge"), "src"
            )
            .select(F.col("dst").alias("node"), "lbl")
            .groupBy("node")
            .agg(F.min("lbl").alias("dminl"))
        )
        upd = scoped_persist(
            lab.join(dmin.hint("merge"), "node", "left").select(
                "node",
                F.col("lbl").alias("prev"),
                F.least("lbl", F.coalesce("dminl", "lbl")).alias("lbl"),
            )
        )
        delta = upd.filter(F.col("lbl") < F.col("prev")).select("node", "lbl")
        lab = upd.select("node", "lbl")
    sizes = lab.groupBy(F.col("lbl").alias("comp")).agg(
        F.count(F.lit(1)).alias("comp_size")
    )
    return (
        lab.join(sizes.hint("merge"), lab.lbl == sizes.comp)
        .select(
            F.col("node").cast("bigint").alias("suppkey"),
            F.col("lbl").cast("bigint").alias("comp"),
            "comp_size",
        )
        .orderBy("suppkey")
    )


# --- graph_assortativity: degree-degree correlation ----------------------------

# One number that says whether hubs attach to hubs (assortative, r > 0 —
# social-style graphs) or hubs attach to leaves (disassortative, r < 0 —
# hub-and-spoke supply networks): the Pearson correlation of the degrees
# at the two ends of every edge (Newman 2002, eq. 4 — computed over the
# directed symmetric edge list, the standard undirected formulation).
# Degrees are small integers, so every moment is an exact DECIMAL(38,0)
# sum — order-free, map-side combinable — and the closing ratio sees
# exact operands; ROUND(9) absorbs the int128/BigDecimal double ulp.
_ASSORTATIVITY_ORACLE = """
WITH pair_counts AS MATERIALIZED (
  SELECT l1.l_suppkey AS src, l2.l_suppkey AS dst, COUNT(*) AS w
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
  GROUP BY l1.l_suppkey, l2.l_suppkey
),
edges AS MATERIALIZED (
  SELECT src, dst FROM pair_counts
  WHERE w > (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) FROM pair_counts)
),
deg AS MATERIALIZED (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS ne,
         SUM(CAST(da.d AS HUGEINT)) AS sx,
         SUM(CAST(db.d AS HUGEINT)) AS sy,
         SUM(CAST(da.d AS HUGEINT) * db.d) AS sxy,
         SUM(CAST(da.d AS HUGEINT) * da.d) AS sxx,
         SUM(CAST(db.d AS HUGEINT) * db.d) AS syy
  FROM edges e
  JOIN deg da ON da.node = e.src
  JOIN deg db ON db.node = e.dst
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
       ne // 2 AS n_edges,
       ROUND(CAST(sx AS DOUBLE) / ne, 6) AS mean_edge_deg,
       CASE WHEN (ne * sxx - sx * sx) > 0 AND (ne * syy - sy * sy) > 0
            THEN ROUND(CAST(ne * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(ne * sxx - sx * sx AS DOUBLE)
                              * CAST(ne * syy - sy * sy AS DOUBLE)), 9)
            ELSE NULL END AS assortativity
FROM m
"""


@register("graph_assortativity", oracle=_ASSORTATIVITY_ORACLE, tags=("graph",))
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph: Pearson correlation
    of endpoint degrees over the symmetric edge list — positive means
    hubs trade with hubs, negative means hub-and-spoke. The one-row
    structural summary beside graph_degree_dist's histogram.

    Scale shape: REUSES the memoized persisted edge set shared by all
    graph operators; the |V|-row degree table joins onto the two edge
    endpoints (broadcast — degrees are a projection of the edge list,
    orders of magnitude below the fact table), and ONE map-side-combined
    aggregate collapses everything to a single moment row. Exact integer
    moments: deterministic under any partitioning (see oracle
    comment)."""
    apply_engine_conf(spark)
    edges = _copurchase_edges(spark, sf_dir)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    da = deg.select(F.col("node").alias("src"), F.col("d").alias("dx"))
    db = deg.select(F.col("node").alias("dst"), F.col("d").alias("dy"))
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = (
        edges.join(F.broadcast(da), "src")
        .join(F.broadcast(db), "dst")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("ne"),
            F.sum(d("dx")).alias("sx"),
            F.sum(d("dy")).alias("sy"),
            F.sum(d("dx") * d("dy")).alias("sxy"),
            F.sum(d("dx") * d("dx")).alias("sxx"),
            F.sum(d("dy") * d("dy")).alias("syy"),
        )
    )
    n_nodes = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    ned = F.col("ne").cast("decimal(38,0)")
    vx = ned * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = ned * F.col("syy") - F.col("sy") * F.col("sy")
    num = ned * F.col("sxy") - F.col("sx") * F.col("sy")
    return m.crossJoin(F.broadcast(n_nodes)).select(
        "n_nodes",
        F.expr("ne div 2").alias("n_edges"),
        F.round(F.col("sx").cast("double") / F.col("ne"), 6).alias("mean_edge_deg"),
        F.when(
            (vx > 0) & (vy > 0),
            F.round(
                num.cast("double") / F.sqrt(vx.cast("double") * vy.cast("double")), 9
            ),
        ).alias("assortativity"),
    )


# --- graph_harmonic: 3-bounded harmonic centrality ------------------------------

# Harmonic centrality H(u) = sum over v != u of 1/d(u,v), truncated at
# distance 3 — the standard scalable stand-in for closeness on graphs
# where full APSP is off the table: three sparse frontier joins instead
# of a shortest-path solver. Distance classes are computed exactly by
# set subtraction (exactly-2 = reachable-in-2 minus neighbors minus
# self; exactly-3 = one step from the exactly-2 frontier minus
# everything nearer), so H is pure integer arithmetic in micro-units:
# n1/1 + n2/2 + n3/3 -> n1*1000000 + n2*500000 + n3*333333.
_HARMONIC_ORACLE = """
WITH pair_counts AS MATERIALIZED (
  SELECT l1.l_suppkey AS src, l2.l_suppkey AS dst, COUNT(*) AS w
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
  GROUP BY l1.l_suppkey, l2.l_suppkey
),
edges AS MATERIALIZED (
  SELECT src, dst FROM pair_counts
  WHERE w > (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) FROM pair_counts)
),
d1 AS MATERIALIZED (SELECT DISTINCT src AS a, dst AS b FROM edges),
d2 AS MATERIALIZED (
  SELECT DISTINCT x.a, e.dst AS b
  FROM d1 x JOIN edges e ON e.src = x.b AND e.dst <> x.a
  EXCEPT SELECT a, b FROM d1
),
d3 AS MATERIALIZED (
  SELECT DISTINCT x.a, e.dst AS b
  FROM d2 x JOIN edges e ON e.src = x.b AND e.dst <> x.a
  EXCEPT (SELECT a, b FROM d1 UNION ALL SELECT a, b FROM d2)
),
n AS (
  SELECT a,
         SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS n2,
         SUM(CASE WHEN d = 3 THEN 1 ELSE 0 END) AS n3
  FROM (
    SELECT a, 1 AS d FROM d1
    UNION ALL SELECT a, 2 FROM d2
    UNION ALL SELECT a, 3 FROM d3
  )
  GROUP BY a
)
SELECT CAST(a AS BIGINT) AS suppkey,
       CAST(n1 AS BIGINT) AS n_dist1,
       CAST(n2 AS BIGINT) AS n_dist2,
       CAST(n3 AS BIGINT) AS n_dist3,
       CAST(n1 * 1000000 + n2 * 500000 + n3 * 333333 AS BIGINT)
         AS harmonic_micro
FROM n
"""


@register("graph_harmonic", oracle=_HARMONIC_ORACLE, tags=("graph",))
def graph_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-bounded harmonic centrality over the co-purchase graph: per
    node, how many peers sit at distance exactly 1, 2 and 3, combined as
    sum(1/d) in exact micro-units — the scalable closeness stand-in
    (full closeness needs APSP; bounded harmonic needs k sparse joins
    and is the form production graph stacks ship).

    Scale shape (round-10 rewrite): the round-9 form expanded every
    frontier PATH as a row — the d2 step alone is a sum-of-degree² join
    (61.8M rows at sf0.1) funneled through a pairwise DISTINCT, measured
    at 528 s CPU / 151 MB shuffle for a 24.7 s wall. This form keeps the
    same exact set semantics as SPARSE BITMAP words: a node's reach set
    is (word_index, 64-bit word) rows, each BFS round is one edge-keyed
    join + one bit_or hash aggregate (codegen, map-side combinable), and
    distance classes are word-wise mask arithmetic (r2 & ~r1 & ~self)
    closed by bit_count sums — no pair row ever exists, no left_anti
    joins. Row volume per round is sum over edges (a,b) of
    |nonzero words of reach(b)| <= min(deg(b), ceil(maxid/64)) — never
    MORE rows than the path-expansion join, and 64x fewer on dense
    regions (measured 26x wall here). Word ids derive from node ids
    (div/mod 64) so the representation is deterministic and exact in
    both engines; the oracle keeps the relational frontier form."""
    apply_engine_conf(spark)
    edges = _copurchase_edges(spark, sf_dir)

    def _bit_or(df: DataFrame, node: str, w: str) -> DataFrame:
        return df.groupBy(node, "widx").agg(F.expr(f"bit_or({w})").alias(w))

    # r1: exact-distance-1 reach words (no self loops in the edge set)
    r1 = _bit_or(
        edges.select(
            F.col("src").alias("node"),
            F.expr("dst div 64").alias("widx"),
            F.expr("shiftleft(1L, cast(dst % 64 as int))").alias("w1"),
        ),
        "node",
        "w1",
    )
    r1 = scoped_persist(r1)
    # rK+1 = OR over neighbors b of rK(b): one join + one bit_or aggregate
    r2 = _bit_or(
        edges.join(r1, edges.dst == r1.node).select(
            F.col("src").alias("node"), "widx", F.col("w1").alias("w2")
        ),
        "node",
        "w2",
    )
    r2 = scoped_persist(r2)
    r3 = _bit_or(
        edges.join(r2, edges.dst == r2.node).select(
            F.col("src").alias("node"), "widx", F.col("w2").alias("w3")
        ),
        "node",
        "w3",
    )
    # SQL & / ~ are bitwise on longs (PySpark Column & is boolean-only)
    _selfw = "(CASE WHEN widx = node div 64 THEN shiftleft(1L, cast(node % 64 as int)) ELSE 0L END)"
    n1 = r1.groupBy("node").agg(F.sum(F.expr("bit_count(w1)")).alias("n1"))
    n2 = (
        r2.join(r1, ["node", "widx"], "left")
        .select(
            "node",
            F.expr(f"bit_count(w2 & ~coalesce(w1, 0L) & ~{_selfw})").alias("c"),
        )
        .groupBy("node")
        .agg(F.sum("c").alias("n2"))
    )
    n3 = (
        r3.join(r2, ["node", "widx"], "left")
        .join(r1, ["node", "widx"], "left")
        .select(
            "node",
            F.expr(
                f"bit_count(w3 & ~coalesce(w2, 0L) & ~coalesce(w1, 0L) & ~{_selfw})"
            ).alias("c"),
        )
        .groupBy("node")
        .agg(F.sum("c").alias("n3"))
    )
    n = (
        n1.join(n2, "node")
        .join(n3, "node")
        .select(F.col("node").alias("a"), "n1", "n2", "n3")
    )
    return n.select(
        F.col("a").cast("bigint").alias("suppkey"),
        F.col("n1").cast("bigint").alias("n_dist1"),
        F.col("n2").cast("bigint").alias("n_dist2"),
        F.col("n3").cast("bigint").alias("n_dist3"),
        (F.col("n1") * 1000000 + F.col("n2") * 500000 + F.col("n3") * 333333)
        .cast("bigint")
        .alias("harmonic_micro"),
    )


# --- graph_pref_attach: preferential-attachment link prediction -----------------

# The third classical link-prediction feature next to graph_jaccard
# (normalized overlap) and graph_adamic_adar (hub-discounted overlap):
# score CANDIDATE pairs — non-adjacent node pairs sharing at least one
# neighbor (the open-wedge endpoints) — by deg(u) * deg(v), the
# preferential-attachment product. Pure integer counts end to end.
_PREF_ATTACH_ORACLE = """
WITH pair_counts AS MATERIALIZED (
  SELECT l1.l_suppkey AS src, l2.l_suppkey AS dst, COUNT(*) AS w
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
  GROUP BY l1.l_suppkey, l2.l_suppkey
),
edges AS MATERIALIZED (
  SELECT src, dst FROM pair_counts
  WHERE w > (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) FROM pair_counts)
),
deg AS MATERIALIZED (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src
),
wedge AS (
  SELECT e1.dst AS u, e2.dst AS v, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM edges e1 JOIN edges e2
    ON e2.src = e1.src AND e1.dst < e2.dst
  GROUP BY e1.dst, e2.dst
),
cand AS (
  SELECT w.u, w.v, w.n_common
  FROM wedge w
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = w.u AND e.dst = w.v)
)
SELECT c.u, c.v, c.n_common, du.d * dv.d AS pa_score
FROM cand c
JOIN deg du ON du.node = c.u
JOIN deg dv ON dv.node = c.v
"""


@register("graph_pref_attach", oracle=_PREF_ATTACH_ORACLE, tags=("graph",))
def graph_pref_attach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preferential-attachment link prediction: every non-adjacent node
    pair sharing at least one neighbor (open-wedge endpoints), scored by
    the degree product deg(u) * deg(v) alongside its common-neighbor
    count — the classical PA feature completing the link-prediction trio
    with graph_jaccard and graph_adamic_adar. All-integer arithmetic.

    Scale shape (round-10 rewrite, the graph_harmonic/graph_2hop sparse
    bitmap form): the round-9 center self-join expanded every open wedge
    as a row (sum-of-degree² — ~92M rows at sf0.1, 7.8 s wall). Here the
    candidate set per node is word arithmetic — r2 & ~r1 & ~self is
    exactly "shares a neighbor, not adjacent, not me" — exploded to
    (u, v > u) pairs at the OUTPUT grain, and n_common(u, v) =
    sum of bit_count(w1(u) & w1(v)) over the pair's neighbor words: a
    pair x words join instead of a wedge expansion (~20x fewer rows;
    measured 7.8 s -> ~1.3 s). No anti join (the mask does it), and the
    exchanges carry (node, word) longs."""
    apply_engine_conf(spark)
    edges = _copurchase_edges(spark, sf_dir)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    r1 = (
        edges.select(
            F.col("src").alias("node"),
            F.expr("dst div 64").alias("widx"),
            F.expr("shiftleft(1L, cast(dst % 64 as int))").alias("w1"),
        )
        .groupBy("node", "widx")
        .agg(F.expr("bit_or(w1)").alias("w1"))
    )
    r1 = scoped_persist(r1)
    r2 = (
        edges.join(r1, edges.dst == r1.node)
        .select(F.col("src").alias("node"), "widx", F.col("w1").alias("w2"))
        .groupBy("node", "widx")
        .agg(F.expr("bit_or(w2)").alias("w2"))
    )
    _selfw = "(CASE WHEN widx = node div 64 THEN shiftleft(1L, cast(node % 64 as int)) ELSE 0L END)"
    candw = r2.join(r1, ["node", "widx"], "left").select(
        "node",
        "widx",
        F.expr(f"(w2 & ~coalesce(w1, 0L) & ~{_selfw})").alias("w"),
    )
    # symmetric candidates: keep the u < v half by masking v bits <= u
    cand = (
        candw.filter(F.col("w") != 0)
        .select(
            F.col("node").alias("u"),
            F.explode(
                F.expr(
                    "filter(transform(sequence(0, 63), j -> "
                    "CASE WHEN (w & shiftleft(1L, j)) != 0 "
                    "THEN widx * 64L + cast(j AS BIGINT) END), x -> x IS NOT NULL)"
                )
            ).alias("v"),
        )
        .filter(F.col("v") > F.col("u"))
    )
    w1u = r1.select(F.col("node").alias("u"), "widx", F.col("w1").alias("w1u"))
    w1v = r1.select(F.col("node").alias("v"), "widx", F.col("w1").alias("w1v"))
    cand = (
        cand.join(w1u, "u")
        .join(w1v, ["v", "widx"])
        .groupBy("u", "v")
        .agg(F.sum(F.expr("bit_count(w1u & w1v)")).cast("bigint").alias("n_common"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    return (
        cand.join(du, "u")
        .join(dv, "v")
        .select(
            "u", "v", "n_common", (F.col("du") * F.col("dv")).alias("pa_score")
        )
    )

# --- graph_richclub: rich-club connectivity coefficient ------------------------

# Do the highest-degree suppliers trade disproportionately with EACH
# OTHER? The rich-club coefficient phi(k) = E_k / (N_k * (N_k - 1))
# (directed-pair normalization — our memoized edge set is symmetric)
# sweeps a degree threshold k and compares the realized edge density
# among nodes of degree > k to the complete-graph bound. Rising phi(k)
# with k = an elite core (hub interconnection); flat = degree-neutral
# mixing. Thresholds are the degree values at the 25/50/75/90th integer
# rank positions of the degree distribution itself (row_number on the
# |V|-grain table, ceil(pct*n/100) index — EXACT rank selection, no
# interpolated percentile whose closing ulp could flip a floor), so the
# sweep is scale-invariant with no magic constants at sf1000.
_RICHCLUB_ORACLE = """
WITH pair_counts AS MATERIALIZED (
  SELECT l1.l_suppkey AS src, l2.l_suppkey AS dst, COUNT(*) AS w
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
  GROUP BY l1.l_suppkey, l2.l_suppkey
),
edges AS MATERIALIZED (
  SELECT src, dst FROM pair_counts
  WHERE w > (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) FROM pair_counts)
),
deg AS MATERIALIZED (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src
),
ranked AS (
  SELECT d, ROW_NUMBER() OVER (ORDER BY d, node) AS rn,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n
  FROM deg
),
ks2 AS (
  SELECT DISTINCT r.d AS k
  FROM ranked r
  JOIN (SELECT UNNEST([25, 50, 75, 90]) AS pct) q
    ON r.rn = CAST(ceil(q.pct * r.n / 100.0e0) AS BIGINT)
),
club AS (
  SELECT k.k, CAST(COUNT(*) AS BIGINT) AS n_k
  FROM ks2 k JOIN deg ON deg.d > k.k GROUP BY k.k
),
ek AS (
  SELECT k.k, CAST(COUNT(*) AS BIGINT) AS e_k
  FROM ks2 k
  JOIN edges e ON TRUE
  JOIN deg da ON da.node = e.src AND da.d > k.k
  JOIN deg db ON db.node = e.dst AND db.d > k.k
  GROUP BY k.k
)
SELECT c.k AS degree_threshold, c.n_k AS club_size,
       COALESCE(ek.e_k, 0) AS club_edges,
       CASE WHEN c.n_k < 2 THEN NULL
            ELSE ROUND(CAST(COALESCE(ek.e_k, 0) AS DOUBLE)
                       / (CAST(c.n_k AS DOUBLE) * (c.n_k - 1)), 9)
       END AS phi
FROM club c LEFT JOIN ek ON ek.k = c.k
"""


@register("graph_richclub", oracle=_RICHCLUB_ORACLE, tags=("graph",))
def graph_richclub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient phi(k) of the co-purchase graph at the
    degree distribution's own quartile/decile thresholds — realized edge
    density among nodes of degree > k against the complete-graph bound
    (directed-pair normalization; the memoized edge set is symmetric).
    Self-normalizing thresholds keep the sweep meaningful at any SF.

    Scale shape: REUSES the memoized persisted edge build shared by the
    graph family; degrees collapse to the |V| grain, the <= 4-row
    threshold panel BROADCASTS onto two degree-filtered semi-join passes
    over the edge list, and every exchange carries int pairs. The
    quantile is exact percentile on the |V|-row degree table — dimension
    work, not fact work."""
    apply_engine_conf(spark)
    edges = _copurchase_edges(spark, sf_dir)
    deg = scoped_persist(
        edges.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).cast("bigint").alias("d")
        )
    )
    wr = Window.orderBy("d", "node")
    ranked = deg.select(
        "d",
        F.row_number().over(wr).alias("rn"),
    ).crossJoin(F.broadcast(deg.agg(F.count(F.lit(1)).cast("bigint").alias("n"))))
    pcts = spark.range(1).select(
        F.explode(F.array(*[F.lit(v) for v in (25, 50, 75, 90)])).alias("pct")
    )
    ks = (
        ranked.join(
            F.broadcast(pcts),
            F.col("rn")
            == F.ceil(F.col("pct") * F.col("n") / F.lit(100.0)).cast("bigint"),
        )
        .select(F.col("d").alias("k"))
        .distinct()
    )
    # the <=4-row threshold panel must BROADCAST into both non-equi joins —
    # an unhinted crossJoin plans as CartesianProduct (left-partitions x
    # right-partitions tasks over the edge list; plan-gated out)
    club = deg.join(F.broadcast(ks), deg.d > ks.k).groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_k")
    )
    da = deg.select(F.col("node").alias("src"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("dst"), F.col("d").alias("db"))
    rich_edges = edges.join(da, "src").join(db, "dst")
    ek = (
        rich_edges.crossJoin(F.broadcast(ks))
        .filter((F.col("da") > F.col("k")) & (F.col("db") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_k"))
    )
    return (
        club.join(ek, "k", "left")
        .select(
            F.col("k").alias("degree_threshold"),
            F.col("n_k").alias("club_size"),
            F.coalesce("e_k", F.lit(0)).cast("bigint").alias("club_edges"),
            F.when(F.col("n_k") < 2, F.lit(None).cast("double"))
            .otherwise(
                F.round(
                    F.coalesce("e_k", F.lit(0)).cast("double")
                    / (F.col("n_k").cast("double") * (F.col("n_k") - 1)),
                    9,
                )
            )
            .alias("phi"),
        )
    )


# --- graph_bipartite_project: item-item projection of a bipartite graph --------

# The market-basket projection: customers x brands collapses to a
# brand-brand graph weighted by shared customers, keeping only pairs
# whose co-occurrence beats independence (lift > 1). Lift is decided by
# the INTEGER cross-multiply w*N > n_a*n_b — no double can flip
# membership. The projection fans out per-customer pairs, bounded by the
# brand-domain square, never by the corpus.
_BIPROJ_ORACLE = """
WITH cb AS (
  SELECT DISTINCT o.o_custkey AS cust, p.p_brand AS brand
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
),
deg AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n FROM cb GROUP BY brand
),
tot AS (SELECT CAST(COUNT(DISTINCT cust) AS BIGINT) AS nn FROM cb),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM cb a JOIN cb b ON b.cust = a.cust AND a.brand < b.brand
  GROUP BY a.brand, b.brand
)
SELECT p.brand_a, p.brand_b, p.w,
       da.n AS n_a, db.n AS n_b,
       ROUND(CAST(p.w AS DOUBLE) * CAST(t.nn AS DOUBLE)
             / (CAST(da.n AS DOUBLE) * CAST(db.n AS DOUBLE)), 9) AS lift,
       ROUND(CAST(p.w AS DOUBLE)
             / CAST(da.n + db.n - p.w AS DOUBLE), 9) AS jaccard
FROM pairs p
JOIN deg da ON da.brand = p.brand_a
JOIN deg db ON db.brand = p.brand_b
CROSS JOIN tot t
WHERE p.w * t.nn > da.n * db.n
"""


@register("graph_bipartite_project", oracle=_BIPROJ_ORACLE, tags=("graph",))
def graph_bipartite_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite projection of the customer-brand purchase graph onto
    brands: edge weight = customers buying both, kept only when
    co-occurrence beats independence (lift > 1, decided by integer
    cross-multiplication). The item-item graph that powers
    co-recommendation and assortment analysis.

    Scale shape: the corpus collapses FIRST to distinct (customer,
    brand) memberships (one map-side distinct); the pair fan-out is
    per-customer and bounded by the brand-domain square — the classic
    bounded-fan-out projection, same regime as _copurchase_edges.
    Degrees and the customer total are dimension-sized broadcasts; the
    lift gate is exact integer arithmetic."""
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cb = scoped_persist(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("o_custkey").alias("cust"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    deg = cb.groupBy("brand").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = cb.agg(F.countDistinct("cust").cast("bigint").alias("nn"))
    a = cb.alias("a")
    b = cb.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cust") == F.col("b.cust"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    da = deg.select(F.col("brand").alias("brand_a"), F.col("n").alias("n_a"))
    db = deg.select(F.col("brand").alias("brand_b"), F.col("n").alias("n_b"))
    out = (
        pairs.join(F.broadcast(da), "brand_a")
        .join(F.broadcast(db), "brand_b")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("w") * F.col("nn") > F.col("n_a") * F.col("n_b"))
    )
    return out.select(
        "brand_a",
        "brand_b",
        "w",
        "n_a",
        "n_b",
        F.round(
            F.col("w").cast("double")
            * F.col("nn").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
            9,
        ).alias("lift"),
        F.round(
            F.col("w").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("w")).cast("double"),
            9,
        ).alias("jaccard"),
    )


# --- graph_triad_census: cyclic vs transitive triangle motifs ------------------

# Directed-motif fingerprinting: in a trade graph, A->B->C->A cycles mean
# circular flow, while transitive A->B, B->C, A->C triangles mean
# hierarchy. The census runs on the nation-grain trade graph (customer
# nation -> supplier nation, sparsified to above-mean weight exactly like
# _copurchase_edges' threshold), so the triple self-join touches a
# domain-bounded table that broadcasts at any corpus size. Each cyclic
# triangle is counted once via its rotation-minimal corner; each
# transitive triangle once via its unique (source, middle, sink) roles.
# trade/e are MATERIALIZED in the oracle: DuckDB inlines
# multiply-referenced CTEs by default, and the three triad corners would
# each re-expand the 4-way lineitem join — measured 929 s + full-disk
# spill DNF at sf1 before materializing (the graph_pagerank oracle
# lesson, same fix).
_TRIAD_ORACLE = """
WITH trade AS MATERIALIZED (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
  GROUP BY 1, 2
),
m AS (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) AS mean_w FROM trade),
e AS MATERIALIZED (
  SELECT src, dst FROM trade CROSS JOIN m WHERE CAST(w AS DOUBLE) > mean_w
),
cyc AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n
  FROM e ab JOIN e bc ON bc.src = ab.dst
            JOIN e ca ON ca.src = bc.dst AND ca.dst = ab.src
  WHERE ab.src < ab.dst AND ab.src < bc.dst
),
ff AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n
  FROM e ab JOIN e bc ON bc.src = ab.dst
            JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst
  WHERE ab.dst <> ac.dst AND ab.src <> bc.dst
),
ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e)
SELECT ne.n AS n_edges, cyc.n AS n_cyclic, ff.n AS n_transitive,
       ROUND(CAST(cyc.n AS DOUBLE)
             / (CAST(cyc.n AS DOUBLE) + CAST(ff.n AS DOUBLE)), 9)
         AS cycle_share
FROM ne CROSS JOIN cyc CROSS JOIN ff
"""


@register("graph_triad_census", oracle=_TRIAD_ORACLE, tags=("graph",))
def graph_triad_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed triangle census of the nation-level trade graph: cyclic
    (A->B->C->A) vs transitive (A->B, B->C, A->C) motif counts and the
    cycle share — the hierarchy-vs-circulation fingerprint used in
    trade-flow and money-laundering analytics.

    Scale shape: the corpus collapses ONCE to nation-grain weighted
    edges (two broadcast dim joins + one map-side agg); the above-mean
    sparsification and the triple self-join run on the |nations|^2
    bounded table — broadcastable at any corpus size. Cyclic triangles
    dedup by rotation-minimal corner (src < both others); transitive
    ones are naturally unique by their role assignment."""
    apply_engine_conf(spark)
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    trade = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    trade = scoped_persist(trade)
    m = trade.agg(
        (F.sum("w").cast("double") / F.count(F.lit(1))).alias("mean_w")
    )
    e = scoped_persist(
        trade.crossJoin(F.broadcast(m))
        .filter(F.col("w").cast("double") > F.col("mean_w"))
        .select("src", "dst")
    )
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b2"), F.col("dst").alias("c"))
    ca = e.select(F.col("src").alias("c2"), F.col("dst").alias("a2"))
    cyc = (
        ab.join(F.broadcast(bc), F.col("b2") == F.col("b"))
        .join(
            F.broadcast(ca),
            (F.col("c2") == F.col("c")) & (F.col("a2") == F.col("a")),
        )
        .filter((F.col("a") < F.col("b")) & (F.col("a") < F.col("c")))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_cyclic"))
    )
    ac = e.select(F.col("src").alias("a3"), F.col("dst").alias("c3"))
    ff = (
        ab.join(F.broadcast(bc), F.col("b2") == F.col("b"))
        .join(
            F.broadcast(ac),
            (F.col("a3") == F.col("a")) & (F.col("c3") == F.col("c")),
        )
        .filter((F.col("b") != F.col("c")) & (F.col("a") != F.col("c")))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitive"))
    )
    ne = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    out = ne.crossJoin(F.broadcast(cyc)).crossJoin(F.broadcast(ff))
    return out.select(
        "n_edges",
        "n_cyclic",
        "n_transitive",
        F.round(
            F.col("n_cyclic").cast("double")
            / (F.col("n_cyclic").cast("double") + F.col("n_transitive").cast("double")),
            9,
        ).alias("cycle_share"),
    )


# --- graph_eigencentrality: power-iteration eigenvector centrality --------------

# "Important because connected to the important": the eigenvector-
# centrality cousin of pagerank without damping or out-degree division —
# influence flows along RAW adjacency, so a hub's weight is the sum of
# its neighbors' weights. Three power iterations in pure integer
# fixed-point: scores start at 10^6, each round sums neighbor scores and
# renormalizes by the maximum via integer DIV — every value on every
# round is a BIGINT, so three rounds of both engines are bit-identical
# (the graph_pagerank recipe, different recurrence).
_EIGEN_SCALE = 1000000

_EIGEN_ORACLE = f"""
WITH pair_counts AS MATERIALIZED (
  SELECT l1.l_suppkey AS src, l2.l_suppkey AS dst, COUNT(*) AS w
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
  GROUP BY 1, 2
),
m AS (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) AS mean_w FROM pair_counts),
edges AS MATERIALIZED (
  SELECT src, dst FROM pair_counts CROSS JOIN m WHERE CAST(w AS DOUBLE) > mean_w
),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
x0 AS (SELECT node, CAST({_EIGEN_SCALE} AS BIGINT) AS x FROM nodes),
s1 AS (
  SELECT e.dst AS node, CAST(SUM(x.x) AS BIGINT) AS x
  FROM edges e JOIN x0 x ON x.node = e.src GROUP BY e.dst
),
x1 AS (
  SELECT node, CAST(x * {_EIGEN_SCALE} // (SELECT MAX(x) FROM s1) AS BIGINT) AS x
  FROM s1
),
s2 AS (
  SELECT e.dst AS node, CAST(SUM(x.x) AS BIGINT) AS x
  FROM edges e JOIN x1 x ON x.node = e.src GROUP BY e.dst
),
x2 AS (
  SELECT node, CAST(x * {_EIGEN_SCALE} // (SELECT MAX(x) FROM s2) AS BIGINT) AS x
  FROM s2
),
s3 AS (
  SELECT e.dst AS node, CAST(SUM(x.x) AS BIGINT) AS x
  FROM edges e JOIN x2 x ON x.node = e.src GROUP BY e.dst
),
x3 AS (
  SELECT node, CAST(x * {_EIGEN_SCALE} // (SELECT MAX(x) FROM s3) AS BIGINT) AS x
  FROM s3
)
SELECT node AS s_suppkey, x AS score_fixed,
       ROUND(CAST(x AS DOUBLE) / {_EIGEN_SCALE}.0, 9) AS centrality
FROM x3 WHERE x * 10 >= {_EIGEN_SCALE}
"""


@register("graph_eigencentrality", oracle=_EIGEN_ORACLE, tags=("graph",))
def graph_eigencentrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eigenvector centrality of the supplier co-purchase graph via three
    integer fixed-point power iterations (max-normalized each round,
    reported where centrality >= 0.1) — the influence score where a
    node matters because its NEIGHBORS matter, complementing
    graph_pagerank (random-surfer) and graph_hits (hub/authority).

    Scale shape: the edge build is the shared bounded _copurchase
    collapse; each iteration is ONE hash join edge->score plus a
    map-side sum on the node grain — the score table is |V|-sized and
    broadcastable; normalization is a 1-row max broadcast with integer
    DIV (truncation identical in both engines, every value BIGINT on
    every round)."""
    apply_engine_conf(spark)
    # _copurchase_edges is already session-memoized + persisted; wrapping
    # it in scoped_persist would unpersist the SHARED cache at the next
    # query and break every downstream graph operator's cache reuse
    # (caught by test_clustering_coef_reuses_edge_cache).
    edges = _copurchase_edges(spark, sf_dir)
    x = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.lit(_EIGEN_SCALE).cast("bigint").alias("x")
    )
    for _ in range(3):
        # round-11: each round's raw sum table s is consumed TWICE (the
        # 1-row max aggregate and the normalization join), so the
        # unpersisted form re-derived the entire iteration history at
        # every reference — the plan doubled per round (155 KB plan text,
        # 78 jobs, most of the 4.1 s sf0.1 wall, profiled r11). Caching
        # the |V|-row table per round makes the lineage linear; identical
        # integer values on any partitioning.
        s = scoped_persist(
            edges.join(x, edges.src == x.node)
            .groupBy(edges.dst.alias("n2"))
            .agg(F.sum("x").cast("bigint").alias("xs"))
        )
        mx = s.agg(F.max("xs").alias("mx"))
        x = s.crossJoin(F.broadcast(mx)).select(
            F.col("n2").alias("node"),
            F.expr(f"cast(xs * {_EIGEN_SCALE} div mx as bigint)").alias("x"),
        )
    return x.filter(F.col("x") * 10 >= _EIGEN_SCALE).select(
        F.col("node").alias("s_suppkey"),
        F.col("x").alias("score_fixed"),
        F.round(F.col("x").cast("double") / float(_EIGEN_SCALE), 9).alias(
            "centrality"
        ),
    )


# --- graph_katz: truncated Katz centrality ---------------------------------------

# Katz centrality counts ALL walks into a node, geometrically damped by
# length — the centrality that, unlike degree, credits a node for being
# reachable from many places, and, unlike eigenvector centrality
# (graph_eigencentrality's power iteration), has a closed TRUNCATED form:
# with alpha = 1/10, katz_i = sum_k alpha^k * walks_k(i) over k = 1..3.
# Walk counts are exact BIGINT path aggregates (two edge joins), and the
# alpha-weighting collapses to pure integer arithmetic in 1/1000 units:
# katz_milli = 100*w1 + 10*w2 + w3 — no float until the final /1000.
_KATZ_ORACLE = """
WITH pair_counts AS MATERIALIZED (
  SELECT l1.l_suppkey AS src, l2.l_suppkey AS dst, COUNT(*) AS w
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
  GROUP BY l1.l_suppkey, l2.l_suppkey
),
edges AS MATERIALIZED (
  SELECT src, dst FROM pair_counts
  WHERE w > (SELECT CAST(SUM(w) AS DOUBLE) / COUNT(*) FROM pair_counts)
),
w1 AS MATERIALIZED (
  SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS walks1
  FROM edges GROUP BY dst
),
w2 AS MATERIALIZED (
  SELECT e.dst AS node, CAST(SUM(w1.walks1) AS BIGINT) AS walks2
  FROM edges e JOIN w1 ON w1.node = e.src
  GROUP BY e.dst
),
w3 AS (
  SELECT e.dst AS node, CAST(SUM(w2.walks2) AS BIGINT) AS walks3
  FROM edges e JOIN w2 ON w2.node = e.src
  GROUP BY e.dst
)
SELECT w1.node, w1.walks1,
       COALESCE(w2.walks2, 0) AS walks2,
       COALESCE(w3.walks3, 0) AS walks3,
       ROUND(CAST(100 * w1.walks1 + 10 * COALESCE(w2.walks2, 0)
                  + COALESCE(w3.walks3, 0) AS DOUBLE) / 1000.0, 9) AS katz
FROM w1
LEFT JOIN w2 ON w2.node = w1.node
LEFT JOIN w3 ON w3.node = w1.node
"""


@register("graph_katz", oracle=_KATZ_ORACLE, tags=("graph",))
def graph_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated Katz centrality (alpha = 0.1, walks of length 1..3) on
    the mean-thresholded supplier co-purchase graph — the walk-counting
    centrality with a CLOSED form at fixed truncation, complementing
    graph_eigencentrality's iterative power method. In-walk counts are
    exact BIGINT aggregates; the alpha mix is integer arithmetic in
    1/1000 units (katz_milli = 100*w1 + 10*w2 + w3), float only at the
    final /1000 (ROUND(9) is belt-and-braces: the operands are exact).

    Scale shape: the edge build is the memoized co-purchase set
    (_copurchase_edges, shared with pagerank/eigencentrality — one
    lineitem self-join per session); walk aggregation is two node-keyed
    hash joins on the edge table, each collapsing map-side to the
    |nodes| grain. In-walks (dst-side) make the node table the build
    side; no walk enumeration ever materializes — counts compose by
    A^T-multiplication. Every node with in-degree appears via the w1
    LEFT spine (disconnected dst-less nodes carry no Katz mass by
    definition)."""
    apply_engine_conf(spark)
    edges = _copurchase_edges(spark, sf_dir)
    w1 = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("walks1")
    )
    w1 = scoped_persist(w1)
    w2 = (
        edges.join(
            w1.select(F.col("node").alias("src"), "walks1"), "src"
        )
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum("walks1").cast("bigint").alias("walks2"))
    )
    w2 = scoped_persist(w2)
    w3 = (
        edges.join(
            w2.select(F.col("node").alias("src"), "walks2"), "src"
        )
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum("walks2").cast("bigint").alias("walks3"))
    )
    out = (
        w1.join(w2, "node", "left")
        .join(w3, "node", "left")
        .select(
            "node",
            "walks1",
            F.coalesce("walks2", F.lit(0)).cast("bigint").alias("walks2"),
            F.coalesce("walks3", F.lit(0)).cast("bigint").alias("walks3"),
        )
    )
    return out.select(
        "node",
        "walks1",
        "walks2",
        "walks3",
        F.round(
            (
                F.lit(100) * F.col("walks1")
                + F.lit(10) * F.col("walks2")
                + F.col("walks3")
            ).cast("double")
            / F.lit(1000.0),
            9,
        ).alias("katz"),
    )
