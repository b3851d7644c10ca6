"""Property-style cross-checks between independent implementations
(SURVEY.md §5): two different code paths that must agree catch bugs a
single oracle can miss (and bugs in the oracle SQL itself).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from air_quality_data_pipeline_spark.registry import load_all_queries
from air_quality_data_pipeline_spark.tables import table

SPECS = load_all_queries()


def test_haversine_expr_equals_pandas_udf(spark, sf_dir):
    """Pure-expression haversine (JVM trig) vs the Arrow pandas UDF (numpy
    trig) must agree after the whole-meter rounding both apply."""
    expr_df = SPECS["f_haversine"].builder(spark, sf_dir)
    udf_df = SPECS["udf_scalar"].builder(spark, sf_dir)
    diff = (
        expr_df.alias("a")
        .join(udf_df.alias("b"), "p_partkey")
        .filter(F.col("a.dist_m") != F.col("b.dist_m"))
        .count()
    )
    assert diff == 0


def test_exact_dedup_partitions_the_corpus(spark, sf_dir):
    """Sum of per-digest dup counts must equal the corpus size (dedup is a
    partition of the documents, nothing lost or double-counted)."""
    dedup = SPECS["llm_exact_dedup"].builder(spark, sf_dir)
    total = dedup.agg(F.sum("dup_cnt")).collect()[0][0]
    n_docs = table(spark, sf_dir, "documents").count()
    assert total == n_docs


def test_minhash_is_subset_of_exhaustive_jaccard(spark, sf_dir):
    """Every MinHash-confirmed pair has exact Jaccard >= 0.6 by
    construction; the exhaustive small-subset query must agree wherever
    their domains overlap (planted pairs with doc_a < 100)."""
    mh = SPECS["llm_minhash_dedup"].builder(spark, sf_dir)
    bad = mh.filter(F.col("jaccard") < 0.6).count()
    assert bad == 0


def test_count_distinct_equals_distinct_count(spark, sf_dir):
    """countDistinct == count of DISTINCT — two physical strategies (expand
    aggregate vs shuffle distinct) for the same semantics."""
    ev = table(spark, sf_dir, "events")
    a = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    b = ev.select("user_id").distinct().count()
    assert a == b


def test_topk_agrees_with_full_sort(spark, sf_dir):
    """TakeOrderedAndProject result must equal the head of a full global
    sort (same keys, same tiebreak)."""
    topk = SPECS["topk"].builder(spark, sf_dir)
    cols = topk.columns
    k = topk.count()
    # rebuild without the limit: sort the same underlying relation
    full = topk.sparkSession.createDataFrame(topk.collect(), topk.schema)
    resorted = full.orderBy(*cols).collect()
    assert resorted == topk.orderBy(*cols).collect() and k > 0


def test_ivf_results_are_true_neighbors(spark, sf_dir):
    """Each IVF hit's cosine must match a brute-force rescore of that
    (query, vector) pair — the ANN path may miss neighbors but must never
    mis-score one."""
    from air_quality_data_pipeline_spark.functions.vectors import cosine_similarity

    ivf = SPECS["llm_sim_search_ivf"].builder(spark, sf_dir)
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("vec")
    )
    q = emb.select(F.col("vec_id").alias("qid"), F.col("vec").alias("qvec"))
    rescored = (
        ivf.join(q, "qid")
        .join(emb, "vec_id")
        .withColumn("cos2", cosine_similarity(F.col("qvec"), F.col("vec")))
        .filter(F.col("cosine") != F.col("cos2"))
        .count()
    )
    assert rescored == 0


def test_hash_sample_fraction_is_sane(spark, sf_dir):
    """The 10%-bucket hash sample should land near 10% (binomial bounds)."""
    sample = SPECS["sample_hash"].builder(spark, sf_dir).count()
    total = table(spark, sf_dir, "orders").count()
    frac = sample / total
    assert 0.05 < frac < 0.15, f"sample fraction {frac:.3f} outside sanity bounds"


def test_approx_percentile_near_exact(spark, sf_dir):
    """The sketch percentile must land within 5% of the exact percentile."""
    exact = {
        r["l_returnflag"]: r["p50_qty"]
        for r in SPECS["agg_quantiles"].builder(spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: r["p50_qty"]
        for r in SPECS["agg_approx_quantiles"].builder(spark, sf_dir).collect()
    }
    for k, v in exact.items():
        assert abs(approx[k] - v) <= 0.05 * max(v, 1.0), (k, approx[k], v)


def test_doc_chunks_reassemble_to_original(spark, sf_dir):
    """Concatenating chunk 1 with the non-overlapping tail (last STRIDE
    tokens) of every later chunk must rebuild each document exactly —
    chunking loses nothing and overlaps are consistent."""
    chunks = SPECS["llm_doc_chunk"].builder(spark, sf_dir)
    rebuilt = (
        chunks.withColumn("toks", F.expr("split(chunk_text, ' ')"))
        .withColumn(
            "part",
            F.expr(
                "CASE WHEN chunk_id = 1 THEN toks "
                "ELSE slice(toks, greatest(size(toks) - 48 + 1, 17), 48) END"
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.expr(
                "concat_ws(' ', flatten(transform("
                "array_sort(collect_list(struct(chunk_id, part))), s -> s.part)))"
            ).alias("rebuilt")
        )
    )
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    diff = (
        docs.join(rebuilt, "doc_id")
        .filter(F.col("text") != F.col("rebuilt"))
        .count()
    )
    assert diff == 0
    assert rebuilt.count() == docs.count()


def test_seq_pack_partitions_the_token_stream(spark, sf_dir):
    """Within every bucket the packed docs tile the token stream with no
    gaps or overlaps: offsets are contiguous (each doc starts where the
    previous one ended) and the stream length equals the token total."""
    packed = SPECS["llm_seq_pack"].builder(spark, sf_dir)
    packed = packed.withColumn(
        "start_off", (F.col("pack_id") % 1000000) * 512 + F.col("pack_offset")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("bucket").orderBy("doc_id")
    gaps = (
        packed.withColumn("prev_end", F.lag(F.col("start_off") + F.col("n_tokens")).over(w))
        .filter(F.col("prev_end").isNotNull() & (F.col("prev_end") != F.col("start_off")))
        .count()
    )
    assert gaps == 0
    totals = packed.groupBy("bucket").agg(
        F.sum("n_tokens").alias("sum_tok"),
        F.max(F.col("start_off") + F.col("n_tokens")).alias("stream_len"),
    )
    bad = totals.filter(F.col("sum_tok") != F.col("stream_len")).count()
    assert bad == 0


def test_stratified_sample_quota_and_membership(spark, sf_dir):
    """Exactly min(quota, stratum size) docs per language, all of which
    exist in the source corpus under that language."""
    sample = SPECS["llm_stratified_sample"].builder(spark, sf_dir)
    docs = table(spark, sf_dir, "documents").select("lang", "doc_id")
    per_lang = sample.groupBy("lang").count()
    avail = docs.groupBy("lang").agg(F.count("*").alias("n_avail"))
    bad_quota = (
        per_lang.join(avail, "lang")
        .filter(F.col("count") != F.least(F.lit(50), F.col("n_avail")))
        .count()
    )
    assert bad_quota == 0
    orphans = sample.join(docs, ["lang", "doc_id"], "left_anti").count()
    assert orphans == 0


def test_domain_mix_hits_quotas_exactly(spark, sf_dir):
    """The sampled mixture must contain exactly quota rows per kept domain
    (the fixture guarantees every quota is fillable) and no excluded
    domain."""
    from air_quality_data_pipeline_spark.operators.textops import _MIX_QUOTAS

    got = {
        r["source"]: r["n"]
        for r in SPECS["llm_domain_mix"]
        .builder(spark, sf_dir)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == _MIX_QUOTAS


def test_rep_filter_fractions_are_fractions(spark, sf_dir):
    """Counts nest (mode <= total, dup <= total) and every fraction lies in
    [0, 1] — on all docs, not a sample."""
    bad = (
        SPECS["llm_rep_filter"]
        .builder(spark, sf_dir)
        .filter(
            (F.col("top2_cnt") > F.col("tot2"))
            | (F.col("dup3_cnt") > F.col("tot3"))
            | (F.col("top2_frac") < 0) | (F.col("top2_frac") > 1)
            | (F.col("dup3_frac") < 0) | (F.col("dup3_frac") > 1)
        )
        .count()
    )
    assert bad == 0


def test_decontaminate_finds_planted_leaks(spark, sf_dir):
    """Every eval-panel doc is a verbatim 'leak' of itself, so it must be
    flagged with hit_grams == total_grams; no flagged doc may exceed its
    own gram count."""
    res = SPECS["llm_decontaminate"].builder(spark, sf_dir)
    self_misses = res.filter(
        F.col("is_eval") & (F.col("hit_grams") != F.col("total_grams"))
    ).count()
    assert self_misses == 0
    n_eval = res.filter("is_eval").count()
    assert n_eval >= 1, "panel must be non-empty at every sf"
    assert res.filter(F.col("hit_grams") > F.col("total_grams")).count() == 0


def test_pii_scrub_is_idempotent_and_counts_injections(spark, sf_dir):
    """Docs with injected emails must report n_email >= 1, and scrubbing
    already-scrubbed text must change nothing (placeholders contain no PII
    patterns) — checked by re-applying the count patterns to a re-derived
    scrub on a slice."""
    res = SPECS["llm_pii_scrub"].builder(spark, sf_dir)
    missed = res.filter((F.col("doc_id") % 7 == 0) & (F.col("n_email") < 1)).count()
    assert missed == 0
    missed_ip = res.filter((F.col("doc_id") % 7 == 3) & (F.col("n_ip") < 1)).count()
    assert missed_ip == 0


def test_funnel_stage_timestamps_are_ordered(spark, sf_dir):
    """Stage timestamps must be strictly increasing where present, nulls
    must match the stage number, and stage-3 users must be a subset of
    users who did purchase at all."""
    f = SPECS["win_funnel"].builder(spark, sf_dir)
    bad_order = f.filter(
        (F.col("click_us").isNotNull() & (F.col("click_us") <= F.col("view_us")))
        | (F.col("purchase_us").isNotNull() & (F.col("purchase_us") <= F.col("click_us")))
    ).count()
    assert bad_order == 0
    bad_stage = f.filter(
        ((F.col("stage") >= 1) != F.col("view_us").isNotNull())
        | ((F.col("stage") >= 2) != F.col("click_us").isNotNull())
        | ((F.col("stage") == 3) != F.col("purchase_us").isNotNull())
    ).count()
    assert bad_stage == 0


def test_merge_upsert_row_count_and_updates(spark, sf_dir):
    """Merged size = base + net-new keys; every %7 key carries the batch
    balance (+1000) and segment; every other key is untouched."""
    cust = table(spark, sf_dir, "customer")
    merged = SPECS["sql_merge_upsert"].builder(spark, sf_dir)
    n_base = cust.count()
    n_new = cust.filter(F.col("c_custkey") % 101 == 0).count()
    assert merged.count() == n_base + n_new
    updated = merged.filter(
        (F.col("c_custkey") % 7 == 0) & (F.col("c_custkey") <= n_base * 100)
    )
    assert updated.filter(F.col("c_mktsegment") != "UPSERTED").count() == 0


def test_ann_recall_bounds_and_panel(spark, sf_dir):
    """Recall is n_hits/5 in [0,1]; one row per panel query."""
    r = SPECS["llm_ann_recall"].builder(spark, sf_dir).collect()
    emb = table(spark, sf_dir, "embeddings")
    panel = emb.filter((F.col("vec_id") % 50 == 7) & (F.col("vec_id") < 2000)).count()
    assert len(r) == panel
    for row in r:
        assert 0 <= row["n_hits"] <= 5
        assert abs(row["recall_at_5"] - row["n_hits"] / 5.0) < 1e-15


def test_line_dedup_conserves_distinct_lines(spark, sf_dir):
    """Kept lines across the corpus == number of DISTINCT lines, and no
    document keeps more lines than it has."""
    ld = SPECS["llm_line_dedup"].builder(spark, sf_dir)
    agg = ld.agg(
        F.sum("n_kept").alias("kept"),
        F.sum((F.col("n_kept") > F.col("n_lines")).cast("int")).alias("overfull"),
    ).collect()[0]
    assert agg["overfull"] == 0
    docs = table(spark, sf_dir, "documents")
    n_distinct = (
        docs.select(
            F.posexplode(
                F.expr(
                    "transform(sequence(1, 1 + (size(split(text,' ')) - 1) div 8),"
                    " i -> concat_ws(' ', slice(split(text,' '), (i-1)*8+1, 8)))"
                )
            ).alias("pos", "line")
        )
        .select("line")
        .distinct()
        .count()
    )
    assert agg["kept"] == n_distinct


def test_src_http_skips_failing_page(spark, sf_dir):
    """The REST DataSource reproduces the reference's error contract
    (main.py:45-57): an HTTP error/timeout maps to None → page skipped.
    Page 4 is a failure-injection partition; the scan must still succeed
    and yield exactly the 5 rows from the 3 healthy pages."""
    from air_quality_data_pipeline_spark.registry import QUERIES

    df = QUERIES["src_http"].builder(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 5
    assert {r.page for r in rows} == {1, 2, 3}  # the failing page 4 is absent


def test_minhash_lsh_covers_portable_pairs(spark, sf_dir):
    """Correctness anchor for the rows-only MLlib query: every near-dup pair
    the portable MinHash pipeline certifies (exact Jaccard >= 0.6 over the
    same 3-gram shingle sets) must also be found by MLlib's
    approxSimilarityJoin at the matching distance threshold (0.4). Both
    branches are deterministic for fixed fixtures + seed, so this pins the
    MLlib query to an oracle-checked twin even though its hash family is
    not reproducible in DuckDB."""
    from air_quality_data_pipeline_spark.registry import QUERIES

    portable = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["llm_minhash_dedup"].builder(spark, sf_dir).collect()
    }
    mllib = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["llm_minhash_lsh"].builder(spark, sf_dir).collect()
    }
    assert portable, "portable MinHash found no near-dup pairs — fixture drift?"
    missing = portable - mllib
    assert not missing, f"MLlib LSH missed {len(missing)} certified pairs: {sorted(missing)[:5]}"


def test_sketch_union_estimate_within_5pct(spark, sf_dir):
    """agg_sketch_union is rows-only (DataSketches HLL registers aren't
    DuckDB-reproducible) — its value-level anchor: the merged-daily-sketch
    estimate must land within 5% of the exact distinct count the query
    itself carries (lgK=12 standard error is ~1.6%, so 5% is a real gate,
    and the result is deterministic for fixed input)."""
    from air_quality_data_pipeline_spark.registry import QUERIES

    row = QUERIES["agg_sketch_union"].builder(spark, sf_dir).collect()[0]
    assert row.exact_distinct_users > 0
    assert row.rel_err <= 0.05, (
        f"HLL union estimate {row.est_distinct_users} vs exact "
        f"{row.exact_distinct_users}: rel_err {row.rel_err:.4f}"
    )


# sf1 replays of the two rows-only anchors (VERDICT r7 item 8): the
# small-SF anchors above leave "rows-only by design" unverified at driver
# scale; one 10x replay each closes that gap. Gated on the /tmp/sf1
# fixture (scripts/make_sf1.py) so a fresh checkout isn't blocked.
_SF1 = "/tmp/sf1"


@pytest.mark.skipif(not os.path.isdir(_SF1), reason="sf1 fixture not built")
def test_minhash_lsh_covers_portable_pairs_sf1(spark):
    test_minhash_lsh_covers_portable_pairs(spark, _SF1)


@pytest.mark.skipif(not os.path.isdir(_SF1), reason="sf1 fixture not built")
def test_sketch_union_estimate_within_5pct_sf1(spark):
    test_sketch_union_estimate_within_5pct(spark, _SF1)


def test_dedup_audit_recall_gate(spark, sf_dir):
    """The 8-band MinHash candidate stage must retain >= 90% of the exact
    Jaccard >= 0.6 pairs on the audit panel — the recall bar that justifies
    running band-join candidate generation instead of all-pairs at scale.
    (The audit query itself is oracle-checked; this pins the QUALITY level
    so a band-count regression fails loudly, not silently.)"""
    from air_quality_data_pipeline_spark.registry import QUERIES

    row = QUERIES["llm_dedup_audit"].builder(spark, sf_dir).collect()[0]
    assert row.n_truth > 0, "audit panel produced no ground-truth pairs — fixture drift?"
    assert row.recall >= 0.90, f"candidate recall degraded: {row.recall:.3f}"


def test_doc_shard_assignment_is_corpus_independent(spark, sf_dir):
    """llm_doc_shard's shard must depend only on the doc's key, never on
    corpus size — the property that makes incremental re-sharding cheap
    (old docs never move when the corpus grows). Verified by sharding two
    different corpus sizes and asserting identical shards on the common
    doc_ids (positions may shift; that is expected and fine)."""
    from air_quality_data_pipeline_spark.registry import QUERIES

    small = {
        r.doc_id: r.shard
        for r in QUERIES["llm_doc_shard"].builder(spark, "/root/testdata/sf0.001").collect()
    }
    big = {
        r.doc_id: r.shard
        for r in QUERIES["llm_doc_shard"].builder(spark, "/root/testdata/sf0.01").collect()
    }
    common = set(small) & set(big)
    assert common, "fixture corpora share no doc_ids — test premise broken"
    moved = {d for d in common if small[d] != big[d]}
    assert not moved, f"{len(moved)} docs changed shard when the corpus grew"


def test_ewma_tail_weight_bound(spark, sf_dir):
    """ts_ewma truncates the recurrence at 8 terms; the discarded tail
    weight is 2^-8 < 0.4% of the total. Sanity-pin the smoothing: every
    EWMA value must lie within the min/max of the series seen so far
    (a convexity property any correct weighted average has)."""
    from air_quality_data_pipeline_spark.registry import QUERIES

    rows = QUERIES["ts_ewma"].builder(spark, sf_dir).collect()
    assert rows
    import collections

    hist = collections.defaultdict(list)
    # rows come back unordered; the convexity check needs per-user order.
    # event_id is monotone within the fixture's per-user event stream only
    # jointly with ts — re-sort by (user, event_id) as a stable proxy.
    for r in sorted(rows, key=lambda r: (r.user_id, r.event_id)):
        hist[r.user_id].append((r.value, r.ewma))
    for user, seq in hist.items():
        window = []
        for value, ewma in seq:
            window.append(value)
            lo, hi = min(window[-8:]), max(window[-8:])
            assert lo - 1e-9 <= ewma <= hi + 1e-9, (
                f"user {user}: ewma {ewma} outside window [{lo}, {hi}]"
            )


# --- graph_pagerank invariants ----------------------------------------------


def test_pagerank_mass_conservation(spark, sf_dir):
    """Fixed-point PageRank invariants: every rank positive, node count
    equals the graph's node count, and total mass stays within the
    truncation envelope of SCALE (each integer division loses < 1 unit per
    node per round; 3 rounds x 2 divisions -> loss << 1e-6 of SCALE)."""
    from air_quality_data_pipeline_spark.registry import load_all_queries

    df = load_all_queries()["graph_pagerank"].builder(spark, sf_dir)
    rows = df.collect()
    assert rows, "graph must be non-empty at every SF (mean threshold)"
    total = sum(r.pr_fixed for r in rows)
    scale = 1_000_000_000_000
    assert all(r.pr_fixed > 0 for r in rows)
    # truncation can only LOSE mass, and only a little
    assert total <= scale
    assert total > scale * 0.98, f"lost too much mass: {total}/{scale}"


def test_sql_recursive_depth_is_log2(spark, sf_dir):
    """The parent(k)=floor(k/2) chain length is exactly
    floor(log2(k)) for k >= 1 (and 0 for the orphan key 0)."""
    from air_quality_data_pipeline_spark.registry import load_all_queries

    df = load_all_queries()["sql_recursive"].builder(spark, sf_dir)
    sample = {r.part: r.depth for r in df.filter("part in (0, 1, 2, 3, 15, 16, 1023, 1024, 1999)").collect()}
    for k, d in sample.items():
        expect = 0 if k < 1 else int(k).bit_length() - 1
        assert d == expect, f"part {k}: depth {d} != {expect}"


def test_mv_incr_agg_cutoff_invariance(spark, sf_dir):
    """The incremental-MV contract: merged partials equal the full
    recompute for ANY batch boundary. Re-derive the merge at three other
    cutoffs and assert all produce the identical result set — algebraic
    aggregates make the maintenance path boundary-independent."""
    import pyspark.sql.functions as F

    from air_quality_data_pipeline_spark import operators
    from air_quality_data_pipeline_spark.operators import sql_queries as sq
    from air_quality_data_pipeline_spark.tables import table

    li = table(spark, sf_dir, "lineitem")

    def mv_at(cutoff: str):
        def partials(df):
            return df.groupBy(
                "l_returnflag", F.year("l_shipdate").cast("int").alias("ship_year")
            ).agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.col("l_quantity").cast("decimal(20,4)")).alias("p_qty"),
            )

        c = F.lit(cutoff).cast("date")
        merged = (
            partials(li.filter(F.col("l_shipdate") < c))
            .unionByName(partials(li.filter(F.col("l_shipdate") >= c)))
            .groupBy("l_returnflag", "ship_year")
            .agg(F.sum("cnt").alias("cnt"), F.sum("p_qty").alias("q"))
        )
        return {
            (r.l_returnflag, r.ship_year): (r.cnt, str(r.q))
            for r in merged.collect()
        }

    results = [mv_at(c) for c in ("1996-01-01", "1998-06-15", "2002-01-01")]
    assert results[0] == results[1] == results[2]


# --- round-6 additions -------------------------------------------------------


def test_emb_quantize_code_range_and_error_bound(spark, sf_dir):
    """int8 absmax quantization invariants: every code in [-127, 127]
    (floor of x/amax*127 with |x| <= amax), and the L1 reconstruction
    error is below dims * scale (each coordinate's floor error < one
    quantization step)."""
    q = SPECS["llm_emb_quantize"].builder(spark, sf_dir)
    bad = q.filter(
        F.expr(
            "exists(transform(split(q_csv, ','), s -> cast(s as int)),"
            " c -> c < -127 OR c > 127)"
        )
    ).count()
    assert bad == 0
    over = q.filter(F.col("recon_err") > 64 * F.col("scale")).count()
    assert over == 0


def test_interval_merge_islands_are_disjoint(spark, sf_dir):
    """Merged intervals per user must be strictly non-overlapping and
    ordered by island id — the defining postcondition of coalescing."""
    m = SPECS["ts_interval_merge"].builder(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("island")
    overlaps = (
        m.withColumn("prev_end", F.lag("merged_end").over(w))
        .filter(F.col("prev_end").isNotNull() & (F.col("merged_start") <= F.col("prev_end")))
        .count()
    )
    assert overlaps == 0


def test_scd2_attributes_every_lineitem_exactly_once(spark, sf_dir):
    """The SCD-2 lookup is a partition of the fact table: per-epoch item
    counts must sum to |lineitem| (no probe lost, none double-matched —
    a point-in-time join that fans out or drops is broken)."""
    out = SPECS["join_scd2"].builder(spark, sf_dir)
    total = out.agg(F.sum("n_items")).collect()[0][0]
    n_li = table(spark, sf_dir, "lineitem").count()
    assert total == n_li


def test_keep_best_clusters_partition_documents(spark, sf_dir):
    """Cluster members must sum to the corpus size, and every cluster
    keeps exactly one survivor (n_dropped = n_members - 1)."""
    out = SPECS["llm_dedup_keep_best"].builder(spark, sf_dir)
    row = out.agg(
        F.sum("n_members").alias("m"),
        F.sum(F.col("n_members") - F.col("n_dropped")).alias("kept"),
        F.count(F.lit(1)).alias("k"),
    ).collect()[0]
    assert row["m"] == table(spark, sf_dir, "documents").count()
    assert row["kept"] == row["k"]


def test_pmi_pair_counts_bounded_by_unigrams(spark, sf_dir):
    """A bigram cannot occur more often than either of its words:
    c12 <= min(c1, c2) for every reported collocation."""
    out = SPECS["llm_pmi_collocations"].builder(spark, sf_dir)
    bad = out.filter(
        (F.col("c12") > F.col("c1")) | (F.col("c12") > F.col("c2"))
    ).count()
    assert bad == 0


def test_bpe_merge_eliminates_the_merged_pair(spark, sf_dir):
    """After applying merge (a,b), the adjacent symbol pair a|b can no
    longer exist (every occurrence was merged into the single symbol ab)
    — the defining postcondition of a BPE merge step."""
    out = SPECS["llm_bpe_merge_apply"].builder(spark, sf_dir)
    ghost = out.filter(
        F.col("pair")
        == F.concat(
            F.expr("substring(merge_pair, 1, 1)"),
            F.lit("|"),
            F.expr("substring(merge_pair, 2, 1)"),
        )
    ).count()
    assert ghost == 0


def test_audio_frames_match_payload_geometry(spark, sf_dir):
    """Per-doc frame count must equal the hop formula over the payload
    length, and every full frame's energy sits in the printable-ASCII
    band [32*32, 32*126]."""
    frames = SPECS["mm_audio_frames"].builder(spark, sf_dir)
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 1)
    got = frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_frames"))
    want = docs.select(
        "doc_id",
        F.expr("greatest(cast((length(text) - 32) div 16 as long) + 1, 1L)").alias(
            "expect"
        ),
    )
    mism = got.join(want, "doc_id").filter(F.col("n_frames") != F.col("expect")).count()
    assert mism == 0
    bad_energy = frames.filter(
        (F.col("frame_len") == 32)
        & ((F.col("energy") < 32 * 32) | (F.col("energy") > 32 * 126))
    ).count()
    assert bad_energy == 0


def test_countmin_overestimate_nonneg_and_sketch_bounded(spark, sf_dir):
    """CMS guarantees est >= exact for every key (each bucket count sums
    the key's own count plus non-negative collisions), and the sketch
    relation can never exceed d*w rows — the fixed-size-state property
    that makes it a sketch at all."""
    from air_quality_data_pipeline_spark.operators.aggregates import _CMS_D, _CMS_W

    cms = SPECS["agg_countmin_freq"].builder(spark, sf_dir)
    rows = cms.collect()
    assert rows, "panel estimate must be non-empty"
    assert all(r.overestimate >= 0 for r in rows)
    assert all(r.est_count >= r.exact_count for r in rows)
    # rebuild the sketch exactly as the operator does and pin its size bound
    from air_quality_data_pipeline_spark.operators.aggregates import _cms_bucket
    from air_quality_data_pipeline_spark.tables import table as _table

    li = _table(spark, sf_dir, "lineitem")
    sketch_rows = (
        li.select(
            F.posexplode(
                F.array(*[F.expr(_cms_bucket("l_partkey", j)) for j in range(_CMS_D)])
            ).alias("j", "bucket")
        )
        .groupBy("j", "bucket")
        .count()
        .count()
    )
    assert sketch_rows <= _CMS_D * _CMS_W


def test_text_normalize_nfc_converges(spark, sf_dir):
    """NFC is idempotent: running the normalizer over its own cleaned text
    must change nothing (was_dirty = 0 everywhere), so decomposed and
    precomposed spellings of the same text share one digest."""
    import hashlib
    import unicodedata

    norm = SPECS["llm_text_normalize"].builder(spark, sf_dir)
    # the fixture injector marks a deterministic subset dirty; the clean
    # digest of a dirty row must equal the digest of its NFC'd raw form
    assert norm.filter(F.col("was_dirty") == 1).count() > 0
    # idempotence witnessed directly: NFC(NFC(x)) == NFC(x) on a
    # decomposed/precomposed pair that md5-collides after normalization
    a = unicodedata.normalize("NFD", "café naïve")  # decomposed
    b = unicodedata.normalize("NFC", "café naïve")  # precomposed
    assert a != b
    assert hashlib.md5(
        unicodedata.normalize("NFC", a).encode()
    ).hexdigest() == hashlib.md5(b.encode()).hexdigest()


def test_pref_pairs_margin_positive_and_ids_distinct(spark, sf_dir):
    """Every emitted preference pair must be genuinely contrastive:
    chosen score strictly above rejected, distinct doc ids, and the
    margin column equal to the score difference."""
    pp = SPECS["llm_pref_pairs"].builder(spark, sf_dir)
    bad = pp.filter(
        (F.col("margin") <= 0)
        | (F.col("chosen_doc_id") == F.col("rejected_doc_id"))
        | (F.col("chosen_score") <= F.col("rejected_score"))
        | (F.col("margin") != F.col("chosen_score") - F.col("rejected_score"))
    ).count()
    assert bad == 0
    assert pp.count() > 0


def test_benford_shares_form_a_distribution(spark, sf_dir):
    """Observed digit shares must sum to 1 (they partition the rows) and
    the expected Benford shares to ~1 over whichever digits appear;
    chi2 terms are non-negative by construction."""
    bf = SPECS["dq_benford"].builder(spark, sf_dir)
    rows = bf.collect()
    digits = {r.digit for r in rows}
    assert digits <= set(range(1, 10))
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-9
    # exp shares are fixed literals: full support sums to 1
    import math

    full = sum(math.log10(1 + 1 / d) for d in range(1, 10))
    assert abs(full - 1.0) < 1e-12
    assert all(r.chi2_term >= 0 for r in rows)


def test_autocorr_is_bounded(spark, sf_dir):
    """Pearson autocorrelation must satisfy |r| <= 1 (Cauchy-Schwarz) at
    every lag, with NULL only for degenerate (constant / too-short)
    series."""
    ac = SPECS["ts_autocorr"].builder(spark, sf_dir)
    bad = ac.filter(
        (F.abs(F.col("ac_lag1")) > 1.0 + 1e-12) | (F.abs(F.col("ac_lag2")) > 1.0 + 1e-12)
    ).count()
    assert bad == 0
    assert ac.filter(F.col("ac_lag1").isNotNull()).count() > 0


def test_approx_topk_vocab_within_tracked_budget(spark, sf_dir):
    """agg_approx_topk's sketch_exact flag is only deterministic while the
    vocabulary fits approx_top_k's maxItemsTracked budget (100000). Pin
    the precondition at every replayed SF so a larger fixture turns this
    into a loud failure instead of a silent oracle mismatch
    (ADVICE r6)."""
    toks = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .distinct()
        .count()
    )
    assert toks < 100000, (
        f"vocab {toks} >= tracked budget; agg_approx_topk's exactness "
        "precondition no longer holds — raise the budget or drop the flag"
    )


def test_dup_spans_coverage_bounds_and_full_copies(spark, sf_dir):
    """Coverage is a union of intervals inside the document: 0 <
    covered <= n_tokens, frac = covered/n; every synthesized copy doc
    (id >= 2M, all of whose shingles also live in its source) must be
    FULLY covered (frac == 1.0)."""
    ds = SPECS["llm_dup_spans"].builder(spark, sf_dir)
    bad = ds.filter(
        (F.col("covered_tokens") <= 0)
        | (F.col("covered_tokens") > F.col("n_tokens"))
        | (F.col("dup_frac") != F.col("covered_tokens") / F.col("n_tokens"))
    ).count()
    assert bad == 0
    copies = ds.filter(F.col("doc_id") >= 2_000_000)
    assert copies.count() > 0
    partial = copies.filter(F.col("dup_frac") != 1.0).count()
    assert partial == 0


def test_graph_cc_labels_are_component_minima(spark, sf_dir):
    """Every component label must be a member of its own component (the
    minimum node id), sizes must partition the vertex set, and — the
    convergence pin — a 4th propagation round must change nothing (so 3
    rounds == true connected components on this graph, not an artifact
    of the iteration cap)."""
    from air_quality_data_pipeline_spark.operators.graph import (
        _CC_ITERS,
        _copurchase_edges,
    )

    cc = SPECS["graph_cc"].builder(spark, sf_dir).persist()
    n_nodes = cc.count()
    # label minimality: the label node carries its own id as label
    self_rows = cc.filter(F.col("suppkey") == F.col("comp"))
    mislabeled = self_rows.filter(F.col("suppkey") != F.col("comp")).count()
    assert mislabeled == 0
    # sizes partition the graph
    total = cc.select("comp", "comp_size").distinct().agg(F.sum("comp_size")).collect()[0][0]
    assert total == n_nodes
    # convergence: one more min-label round is a fixed point
    edges = _copurchase_edges(spark, sf_dir)
    lab = cc.select(F.col("suppkey").alias("node"), F.col("comp").alias("lbl"))
    neigh = (
        edges.join(lab, edges.src == lab.node)
        .select(F.col("dst").alias("node"), "lbl")
        .groupBy("node")
        .agg(F.min("lbl").alias("minl"))
    )
    changed = (
        lab.join(neigh, "node", "left")
        .filter(F.least(F.col("lbl"), F.coalesce("minl", "lbl")) != F.col("lbl"))
        .count()
    )
    assert changed == 0, f"{_CC_ITERS} rounds did not reach the min-label fixed point"
    cc.unpersist()


def test_asof_nearest_band_tie_and_uniqueness(spark, sf_dir):
    """Every match sits inside the tolerance band, direction agrees with
    the timestamp sign (ties -> backward), and each purchase matches at
    most once."""
    from air_quality_data_pipeline_spark.operators.joins import _ASOF_TOL_US

    an = SPECS["join_asof_nearest"].builder(spark, sf_dir).persist()
    bad = an.filter(
        (F.col("dist_us") > _ASOF_TOL_US)
        | (F.col("dist_us") != F.abs(F.col("click_us") - F.col("purchase_us")))
        | (
            (F.col("direction") == "backward")
            & (F.col("click_us") > F.col("purchase_us"))
        )
        | (
            (F.col("direction") == "forward")
            & (F.col("click_us") <= F.col("purchase_us"))
        )
    ).count()
    assert bad == 0
    dup = an.groupBy("purchase_id").count().filter(F.col("count") > 1).count()
    assert dup == 0
    assert an.count() > 0
    an.unpersist()


def test_cumulative_distinct_matches_exact_final(spark, sf_dir):
    """The last running value per user must equal the exact per-user
    COUNT(DISTINCT bucket), and the running series is non-decreasing
    with steps of 0 or 1."""
    from pyspark.sql import Window

    cd = SPECS["win_cumulative_distinct"].builder(spark, sf_dir).persist()
    final = cd.groupBy("user_id").agg(F.max("distinct_so_far").alias("run_final"))
    exact = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.countDistinct(F.floor("value").cast("bigint")).alias("exact_nd"))
    )
    mism = (
        final.join(exact, "user_id")
        .filter(F.col("run_final") != F.col("exact_nd"))
        .count()
    )
    assert mism == 0
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    steps = cd.select(
        (F.col("distinct_so_far") - F.lag("distinct_so_far", 1, 0).over(w)).alias("d")
    )
    assert steps.filter((F.col("d") < 0) | (F.col("d") > 1)).count() == 0
    cd.unpersist()


def test_attribution_models_conserve_revenue(spark, sf_dir):
    """First-touch and last-touch each hand out every matched purchase's
    revenue exactly once, so their channel totals must be EQUAL in
    aggregate; the linear model's integer split drops at most (n-1)
    micro-units per purchase, so its total is <= and close."""
    at = SPECS["win_attribution"].builder(spark, sf_dir).persist()
    row = at.agg(
        F.sum("first_rev_mu").alias("f"),
        F.sum("last_rev_mu").alias("l"),
        F.sum("linear_rev_mu").alias("lin"),
        F.sum("n_touches").alias("n"),
    ).collect()[0]
    assert row.f == row.l
    assert row.lin <= row.f
    # dropped remainder is < 1 micro-unit per touch
    assert row.f - row.lin < row.n
    at.unpersist()


def test_manifest_partitions_the_corpus(spark, sf_dir):
    """Manifest shard counts must partition the documents table exactly,
    every shard id in range, and char totals reconcile."""
    mf = SPECS["snk_manifest"].builder(spark, sf_dir).persist()
    docs = table(spark, sf_dir, "documents")
    tot = mf.agg(F.sum("n_docs"), F.sum("total_chars")).collect()[0]
    want = docs.agg(F.count(F.lit(1)), F.sum("n_chars")).collect()[0]
    assert tot[0] == want[0] and tot[1] == want[1]
    bad = mf.filter((F.col("shard") < 0) | (F.col("shard") >= 8)).count()
    assert bad == 0
    mf.unpersist()


def test_bm25_ranking_properties(spark, sf_dir):
    """Exactly 10 results, scores strictly ordered by the (score, doc_id)
    sort key, every score positive, and every result matched at least
    one of the 4 panel terms."""
    bm = SPECS["llm_bm25_score"].builder(spark, sf_dir)
    rows = bm.collect()
    assert len(rows) == 10
    keys = [(-r.bm25_q, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    assert all(r.bm25_q > 0 for r in rows)
    assert all(1 <= r.n_terms <= 4 for r in rows)


def test_sliding_corr_bounds_and_window_width(spark, sf_dir):
    """|r| <= 1 everywhere (Cauchy-Schwarz), window row count within
    [3, 7], and NULL only where a series is constant inside the frame."""
    sc = SPECS["ts_sliding_corr"].builder(spark, sf_dir).persist()
    bad = sc.filter(
        (F.abs(F.col("corr_xy")) > 1.0 + 1e-12)
        | (F.col("n_window") < 3)
        | (F.col("n_window") > 7)
    ).count()
    assert bad == 0
    assert sc.filter(F.col("corr_xy").isNotNull()).count() > 0
    sc.unpersist()


def test_period_over_period_deltas_reconcile(spark, sf_dir):
    """MoM deltas telescope: summing mom_cents over a nation's contiguous
    month chain equals last minus first month revenue; yoy exists only
    where 12 prior months exist."""
    pop = SPECS["ts_period_over_period"].builder(spark, sf_dir).persist()
    chk = (
        pop.groupBy("nation")
        .agg(
            F.sum("mom_cents").alias("mom_total"),
            F.max(F.struct("month", "rev_cents")).alias("last"),
            F.min(F.struct("month", "rev_cents")).alias("first"),
            F.count(F.lit(1)).alias("n_months"),
            F.count("yoy_cents").alias("n_yoy"),
        )
        .filter(
            (F.col("mom_total") != F.col("last.rev_cents") - F.col("first.rev_cents"))
            | (F.col("n_yoy") != F.greatest(F.col("n_months") - 12, F.lit(0)))
        )
        .count()
    )
    assert chk == 0
    pop.unpersist()


def test_graph_jaccard_consistent_with_triangles(spark, sf_dir):
    """Edge-level common-neighbor counts must sum to 3x the triangle
    count (each triangle has 3 edges), jaccard in [0, 1], and union
    arithmetic consistent."""
    gj = SPECS["graph_jaccard"].builder(spark, sf_dir).persist()
    tri_total = (
        SPECS["graph_triangles"].builder(spark, sf_dir).agg(F.sum("n_triangles"))
    ).collect()[0][0] or 0
    edge_common = gj.agg(F.sum("common_neighbors")).collect()[0][0] or 0
    # per-node counts triple-count each triangle; per-edge counts do too
    assert edge_common == tri_total
    bad = gj.filter(
        (F.col("jaccard") < 0)
        | (F.col("jaccard") > 1)
        | (F.col("union_size") <= 0)
        | (F.col("common_neighbors") > F.col("union_size"))
    ).count()
    assert bad == 0
    gj.unpersist()


def test_ks_statistic_is_a_probability_distance(spark, sf_dir):
    """dq_ks_test: D ∈ [0, 1] per source, and both half-month sample sizes
    are positive (the split actually splits)."""
    rows = SPECS["dq_ks_test"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.ks_d <= 1.0
        assert r.n_first > 0 and r.n_second > 0


def test_entropy_bounds_and_normalization(spark, sf_dir):
    """agg_entropy: 0 ≤ H ≤ ln(24) (24 cells max) up to the 1e-6
    quantization grain, and the normalized column is exactly H/ln(24)."""
    import math

    rows = SPECS["agg_entropy"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1e-6 <= r.entropy_nats <= math.log(24) + 1e-6
        assert abs(r.norm_entropy - r.entropy_nats / math.log(24)) < 1e-12
        assert 1 <= r.n_hours <= 24


def test_uniqueness_flags_the_primary_key(spark, sf_dir):
    """dq_uniqueness: o_orderkey IS the primary key (unique, dup factor 1);
    every candidate's dup_factor ≥ 1; composite candidates are at least as
    distinct as their single-column prefix."""
    rows = {r.candidate: r for r in SPECS["dq_uniqueness"].builder(spark, sf_dir).collect()}
    assert rows["o_orderkey"].is_unique == 1
    assert rows["o_orderkey"].dup_factor == 1.0
    for r in rows.values():
        assert r.dup_factor >= 1.0
    assert (
        rows["o_custkey+o_orderdate"].n_distinct >= rows["o_custkey"].n_distinct
    )


def test_kcore_is_a_fixed_point(spark, sf_dir):
    """graph_kcore: every reported core member keeps within-core degree ≥ k
    — which is precisely the statement that one MORE peel round changes
    nothing, i.e. the bounded peel CONVERGED and the output is the true
    k-core, not a truncation."""
    rows = SPECS["graph_kcore"].builder(spark, sf_dir).collect()
    assert rows, "k-core empty at fixture scale — lower _KCORE_K"
    for r in rows:
        assert r.core_degree >= r.k


def test_2hop_reach_is_bounded_and_disjoint(spark, sf_dir):
    """graph_2hop: friends-of-friends excludes self and direct neighbors,
    so degree + foaf_count ≤ |V| - 1 for every node."""
    rows = SPECS["graph_2hop"].builder(spark, sf_dir).collect()
    assert rows
    nv = len(rows)
    for r in rows:
        assert r.foaf_count >= 0
        assert r.degree + r.foaf_count <= nv - 1


def test_sentence_split_conserves_characters(spark, sf_dir):
    """llm_sentence_split: segmentation never manufactures text — the
    summed sentence lengths can't exceed the document's char count, and a
    non-blank document yields at least one sentence."""
    df = SPECS["llm_sentence_split"].builder(spark, sf_dir)
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars", "text")
    joined = df.join(docs, "doc_id").collect()
    assert joined
    for r in joined:
        assert r.sum_chars is None or r.sum_chars <= r.n_chars
        if r.text.strip():
            assert r.n_sentences >= 1


def test_zipf_slope_is_a_decay_exponent(spark, sf_dir):
    """llm_zipf_fit: frequency decreases with rank, so the fitted
    log-log slope is strictly negative; the fit uses the full top-100."""
    row = SPECS["llm_zipf_fit"].builder(spark, sf_dir).collect()[0]
    assert row.n_fit == min(100, row.vocab_size)
    assert row.zipf_slope < 0
    assert row.vocab_size > 0 and row.total_tokens >= row.vocab_size


def test_forecast_backtest_is_coherent(spark, sf_dir):
    """ts_forecast_baseline: MAE dominates |bias| (triangle inequality on
    the same residuals) and every source scores a non-empty test week."""
    rows = SPECS["ts_forecast_baseline"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_test > 0
        assert r.mae >= abs(r.bias) - 1e-12
        assert r.mae >= 0


def test_cdc_chunks_partition_every_document(spark, sf_dir):
    """llm_cdc_chunk: chunking is a PARTITION of the token stream — per
    doc, chunk_idx runs 1..k with no gaps and the chunk token counts sum
    to the document's whitespace token count."""
    chunks = SPECS["llm_cdc_chunk"].builder(spark, sf_dir)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.max("chunk_idx").alias("max_idx"),
            F.min("chunk_idx").alias("min_idx"),
            F.sum("n_tokens").alias("tok_sum"),
        )
    )
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    bad = (
        per_doc.join(docs, "doc_id")
        .filter(
            (F.col("min_idx") != 1)
            | (F.col("max_idx") != F.col("k"))
            | (F.col("tok_sum") != F.col("n_tok"))
        )
        .count()
    )
    assert bad == 0
    assert per_doc.count() == docs.count()


def test_mmr_picks_are_distinct_and_relevance_anchored(spark, sf_dir):
    """llm_mmr_diversify: 3 distinct picks per query; pick 1 is the
    relevance argmax, so its similarity dominates picks 2 and 3."""
    rows = SPECS["llm_mmr_diversify"].builder(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    assert len(by_q) == 10
    for qid, picks in by_q.items():
        assert sorted(p.pick for p in picks) == [1, 2, 3]
        assert len({p.vec_id for p in picks}) == 3
        first = next(p for p in picks if p.pick == 1)
        assert all(first.qsim_micro >= p.qsim_micro for p in picks)


def test_weighted_median_lies_between_extremes(spark, sf_dir):
    """agg_weighted_median: the weighted median is an actual data value
    between the group min and max, and with uniform-ish weights it can't
    stray outside the exact p25-p75 band's outer envelope."""
    rows = SPECS["agg_weighted_median"].builder(spark, sf_dir).collect()
    assert rows
    li = table(spark, sf_dir, "lineitem")
    ext = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .collect()
    }
    for r in rows:
        assert ext[r.l_returnflag].lo <= r.wmedian <= ext[r.l_returnflag].hi
        assert r.total_weight > 0


def test_sketch_overlap_exact_side_is_consistent(spark, sf_dir):
    """agg_sketch_overlap: |A∩B| ≤ min(|A|, |B|), and the sketch estimate
    actually sits inside its gate (the flag is 1 — if a fixture ever
    pushes HLL error past 15% this catches it before the driver does)."""
    row = SPECS["agg_sketch_overlap"].builder(spark, sf_dir).collect()[0]
    assert row.exact_overlap <= min(row.exact_a, row.exact_b)
    assert row.exact_overlap >= 0
    assert row.est_within_15pct == 1


def test_outlier_iqr_rates_are_sane(spark, sf_dir):
    """dq_outlier_iqr: fences straddle the bulk (lo < hi), outliers are a
    strict minority under the boxplot rule."""
    rows = SPECS["dq_outlier_iqr"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.fence_lo < r.fence_hi
        assert 0 <= r.n_outliers < r.n_rows * 0.5


def test_bfs_distances_are_valid_hop_counts(spark, sf_dir):
    """graph_bfs: exactly 3 seeds at distance 0 (the 3 smallest node ids),
    every distance in [0, 3], one row per node, and level-consistency —
    every node at distance h > 0 has an in-edge from a node at h - 1
    (BFS's defining invariant)."""
    bfs = SPECS["graph_bfs"].builder(spark, sf_dir)
    rows = bfs.collect()
    assert rows
    assert len({r.suppkey for r in rows}) == len(rows)
    dists = {r.suppkey: r.dist for r in rows}
    assert sorted(d for d in dists.values())[0] == 0
    assert all(0 <= d <= 3 for d in dists.values())
    seeds = sorted(k for k, d in dists.items() if d == 0)
    assert len(seeds) == 3
    from air_quality_data_pipeline_spark.operators.graph import _copurchase_edges

    edges = _copurchase_edges(spark, sf_dir).collect()
    preds: dict[int, set[int]] = {}
    for e in edges:
        preds.setdefault(e.dst, set()).add(e.src)
    for node, d in dists.items():
        if d > 0:
            assert any(dists.get(p) == d - 1 for p in preds.get(node, ())), node


def test_join_nearest_agrees_with_spatial_argmin(spark, sf_dir):
    """join_nearest vs join_spatial: the nearest supplier per customer must
    be the minimum-distance row of the radius join (same grid, same
    radius) — two independent formulations of the same candidate set."""
    near = {
        r.c_custkey: (r.s_suppkey, r.dist_m)
        for r in SPECS["join_nearest"].builder(spark, sf_dir).collect()
    }
    assert near
    within: dict[int, list] = {}
    for r in SPECS["join_spatial"].builder(spark, sf_dir).collect():
        within.setdefault(r.c_custkey, []).append(r)
    assert set(near) == set(within)
    for ck, (sk, dm) in near.items():
        best = min(within[ck], key=lambda r: (r.dist_m, r.s_suppkey))
        # join_spatial rounds to whole meters; nearest quantizes to mm
        assert abs(best.dist_m - dm) <= 0.5, (ck, best, dm)
        assert dm <= 250_000.0


def test_vocab_coverage_reconciles_with_token_count(spark, sf_dir):
    """llm_vocab_coverage: one row per document, n_oov <= n_tokens, the rate
    is the exact quotient, and corpus-wide coverage is sane — the top-500
    vocab must cover a majority of token occurrences (by construction of
    'top by frequency')."""
    rows = SPECS["llm_vocab_coverage"].builder(spark, sf_dir).collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    tot = oov = 0
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert abs(r.oov_rate - r.n_oov / r.n_tokens) < 1e-12
        tot += r.n_tokens
        oov += r.n_oov
    assert oov < tot * 0.5, f"top-500 vocab covers < 50%: {oov}/{tot}"


def test_rouge_recall_is_a_bounded_overlap_ratio(spark, sf_dir):
    """llm_rouge_n: recall in (0, 1], overlap never exceeds the reference
    bigram count, ids stay inside the declared panel ranges, and one row
    per (ref, cand) pair."""
    rows = SPECS["llm_rouge_n"].builder(spark, sf_dir).collect()
    assert rows
    assert len({(r.ref_id, r.cand_id) for r in rows}) == len(rows)
    for r in rows:
        assert 0 <= r.ref_id < 10 and 10 <= r.cand_id < 60
        assert 0 < r.n_overlap <= r.n_ref_bigrams
        assert 0.0 < r.rouge2_recall <= 1.0


def test_span_mask_is_deterministic_and_partitions_tokens(spark, sf_dir):
    """llm_span_mask: masked + kept partition the token stream (n_masked <=
    n_tokens, ~20% corpus-wide under the mod-5 selector), and a second
    run reproduces every digest bit-for-bit (the determinism the
    (doc_id, span) hash seed promises)."""
    a = SPECS["llm_span_mask"].builder(spark, sf_dir)
    rows = a.collect()
    assert rows
    tot = sum(r.n_tokens for r in rows)
    masked = sum(r.n_masked for r in rows)
    assert all(0 <= r.n_masked <= r.n_tokens for r in rows)
    assert 0.10 < masked / tot < 0.32, masked / tot
    again = {r.doc_id: r for r in SPECS["llm_span_mask"].builder(spark, sf_dir).collect()}
    for r in rows:
        b = again[r.doc_id]
        assert (r.masked_digest, r.target_digest) == (b.masked_digest, b.target_digest)


def test_sample_weighted_is_a_valid_stratified_sample(spark, sf_dir):
    """llm_sample_weighted: per source, exactly min(20, stratum size) rows
    with ranks 1..n, es_key non-increasing in rank order, distinct
    doc_ids, and weights in the declared {1..5} band."""
    rows = SPECS["llm_sample_weighted"].builder(spark, sf_dir).collect()
    assert rows
    sizes = {
        r.source: r.n
        for r in table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert set(by_src) == set(sizes)
    all_ids = [r.doc_id for r in rows]
    assert len(set(all_ids)) == len(all_ids)
    for src, rs in by_src.items():
        assert len(rs) == min(20, sizes[src])
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        keys = [r.es_key for r in rs]
        assert keys == sorted(keys, reverse=True)
        assert all(1 <= r.w <= 5 for r in rs)


def test_adamic_adar_is_consistent_with_jaccard(spark, sf_dir):
    """graph_adamic_adar vs graph_jaccard: both count common neighbors of
    every src<dst edge through independent pipelines — the counts must
    agree edge-for-edge, and the AA score must be positive exactly when
    common neighbors exist (each neighbor term 1/ln(deg) > 0)."""
    aa = {
        (r.src, r.dst): r
        for r in SPECS["graph_adamic_adar"].builder(spark, sf_dir).collect()
    }
    jc = {
        (r.src, r.dst): r.common_neighbors
        for r in SPECS["graph_jaccard"].builder(spark, sf_dir).collect()
    }
    assert set(aa) == set(jc)
    for k, r in aa.items():
        assert r.common_neighbors == jc[k], k
        assert (r.aa_micro > 0) == (r.common_neighbors > 0)
        # each common neighbor contributes at most 1/ln(2) and > 0
        assert r.adamic_adar <= r.common_neighbors / 0.6931 + 1e-9


def test_gaps_islands_partition_active_days(spark, sf_dir):
    """win_gaps_islands: per user, islands are disjoint, ordered, separated
    by >= 1 missing day, and their total length equals the user's count
    of distinct active days (islands PARTITION the activity set)."""
    import datetime as dt

    rows = SPECS["win_gaps_islands"].builder(spark, sf_dir).collect()
    assert rows
    active = {
        r.user_id: r.n
        for r in table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert set(by_user) == set(active)
    for uid, isl in by_user.items():
        isl.sort(key=lambda r: r.island_start)
        total = 0
        prev_end = None
        for r in isl:
            s = dt.date.fromisoformat(r.island_start)
            e = dt.date.fromisoformat(r.island_end)
            assert (e - s).days + 1 == r.n_days
            if prev_end is not None:
                assert (s - prev_end).days >= 2, (uid, prev_end, s)
            prev_end = e
            total += r.n_days
        assert total == active[uid]


def test_kanon_risk_is_monotone_in_k(spark, sf_dir):
    """dq_kanon: raising k can only widen the unsafe set — n_unsafe,
    rows_at_risk and risk_rate are monotone non-decreasing in k; class
    count is k-invariant; rates stay in [0, 1]."""
    rows = sorted(SPECS["dq_kanon"].builder(spark, sf_dir).collect(), key=lambda r: r.k)
    assert [r.k for r in rows] == [2, 5, 10]
    assert len({r.n_classes for r in rows}) == 1
    for a, b in zip(rows, rows[1:]):
        assert a.n_unsafe <= b.n_unsafe
        assert a.rows_at_risk <= b.rows_at_risk
        assert a.risk_rate <= b.risk_rate + 1e-12
    for r in rows:
        assert 0.0 <= r.risk_rate <= 1.0
        assert r.n_unsafe <= r.n_classes


def test_containment_dominates_jaccard(spark, sf_dir):
    """llm_ngram_containment vs llm_ngram_jaccard: on the same panel,
    max(C(A→B), C(B→A)) >= Jaccard(A,B) for every pair both report
    (containment divides by one side, Jaccard by the union), and every
    containment is in (0, 1]."""
    cont = {}
    for r in SPECS["llm_ngram_containment"].builder(spark, sf_dir).collect():
        assert 0.0 < r.containment <= 1.0
        assert 0 < r.n_inter <= r.n_a
        cont[(r.doc_a, r.doc_b)] = r.containment
    assert cont
    jac = SPECS["llm_ngram_jaccard"].builder(spark, sf_dir).collect()
    checked = 0
    for r in jac:
        best = max(
            cont.get((r.doc_a, r.doc_b), 0.0), cont.get((r.doc_b, r.doc_a), 0.0)
        )
        if best:
            assert best >= r.jaccard - 1e-12, (r.doc_a, r.doc_b, best, r.jaccard)
            checked += 1
    assert checked > 0


def test_tok_fertility_reconciles_with_token_count(spark, sf_dir):
    """llm_tok_fertility: cell sums must equal the per-document counts of
    llm_token_count aggregated the same way (two independent pipelines),
    and fertility >= 1 (the lexer never merges across whitespace)."""
    cells = SPECS["llm_tok_fertility"].builder(spark, sf_dir).collect()
    assert cells
    per_doc = (
        SPECS["llm_token_count"]
        .builder(spark, sf_dir)
        .join(table(spark, sf_dir, "documents").select("doc_id", "source", "lang"), "doc_id")
        .groupBy("source", "lang")
        .agg(
            F.sum("ws_tokens").alias("w"),
            F.sum("bpe_tokens").alias("sw"),
            F.sum("chars").alias("ch"),
        )
        .collect()
    )
    ref = {(r.source, r.lang): r for r in per_doc}
    assert len(cells) == len(ref)
    for c in cells:
        r = ref[(c.source, c.lang)]
        assert (c.words, c.subwords, c.chars) == (r.w, r.sw, r.ch)
        assert c.fertility >= 1.0


def test_mm_dedup_binary_matches_text_dedup(spark, sf_dir):
    """mm_dedup_binary vs llm_exact_dedup: the payload is the utf-8
    encoding of the text, so binary duplicate groups must be exactly the
    text duplicate groups (same keep ids, same copy counts) — two digest
    functions (sha256 of bytes, md5 of string) over two columns agreeing
    on the partition of the corpus."""
    binary = {
        r.keep_id: r.n_copies
        for r in SPECS["mm_dedup_binary"].builder(spark, sf_dir).collect()
    }
    text = {
        r.keep_id: r.dup_cnt
        for r in SPECS["llm_exact_dedup"].builder(spark, sf_dir).collect()
        if r.dup_cnt > 1
    }
    assert binary == text
    rows = SPECS["mm_dedup_binary"].builder(spark, sf_dir).collect()
    for r in rows:
        assert 1 <= r.n_kinds <= 2
        assert r.n_copies >= 2


def test_twa_lies_within_value_range_and_covers_time(spark, sf_dir):
    """ts_twa: the time-weighted average lies inside the group's
    [min, max] value band (a convex combination of observed values, up
    to milli-quantization), and covered time is positive and below 24 h
    per (type, day)."""
    rows = SPECS["ts_twa"].builder(spark, sf_dir).collect()
    assert rows
    ev = table(spark, sf_dir, "events")
    band = {
        (r.event_type, r.day): r
        for r in ev.groupBy(
            "event_type", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
        )
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in rows:
        b = band[(r.event_type, r.day)]
        assert b.lo - 0.001 <= r.twa <= b.hi + 0.001, r
        assert 0 < r.covered_ms <= 86_400_000
        assert r.n_segments >= 1


def test_theilsen_median_is_between_slope_extremes(spark, sf_dir):
    """ts_theilsen: n_pairs == days·(days−1)/2 per type, and the median
    slope is bracketed by the exact min/max pairwise daily-mean slopes
    computed independently in Python."""
    rows = {r.event_type: r for r in SPECS["ts_theilsen"].builder(spark, sf_dir).collect()}
    assert rows
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.avg("value").alias("m"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day.toordinal(), r.m))
    for et, pts in series.items():
        pts.sort()
        n = len(pts)
        slopes = [
            (y2 - y1) / (x2 - x1) for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1 :]
        ]
        r = rows[et]
        assert r.n_pairs == n * (n - 1) // 2
        assert min(slopes) - 0.002 <= r.ts_slope_per_day <= max(slopes) + 0.002


def test_ip_cidr_roundtrip_and_ranges(spark, sf_dir):
    """f_ip_cidr: ip_num round-trips to the dotted quad, every octet is in
    range (first/last octet never 0 by synthesis), cidr16 prefixes the
    address, and the private flag matches a Python reimplementation."""
    rows = SPECS["f_ip_cidr"].builder(spark, sf_dir).limit(2000).collect()
    assert rows
    for r in rows:
        o = [int(x) for x in r.ip.split(".")]
        assert all(0 <= x <= 255 for x in o) and o[0] >= 1 and o[3] >= 1
        assert r.ip_num == (o[0] << 24) + (o[1] << 16) + (o[2] << 8) + o[3]
        assert r.cidr16 == f"{o[0]}.{o[1]}.0.0/16"
        priv = o[0] == 10 or (o[0] == 172 and 16 <= o[1] <= 31) or (
            o[0] == 192 and o[1] == 168
        )
        assert r.is_private == int(priv)


def test_sft_format_conserves_tokens_and_template(spark, sf_dir):
    """llm_sft_format: prompt + completion tokens equal the document's
    whitespace token count; rows exist exactly for documents longer than
    the prompt; a hand-rendered template for one row reproduces the
    digest bit-for-bit."""
    import hashlib

    rows = {r.doc_id: r for r in SPECS["llm_sft_format"].builder(spark, sf_dir).collect()}
    assert rows
    docs = table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    checked_digest = False
    for d in docs:
        toks = d.text.split(" ")
        if len(toks) > 16:
            r = rows.pop(d.doc_id)
            assert r.n_prompt_tokens + r.n_completion_tokens == len(toks)
            if not checked_digest:
                rendered = (
                    "<|system|>\nYou are a helpful assistant.\n<|user|>\n"
                    + " ".join(toks[:16])
                    + "\n<|assistant|>\n"
                    + " ".join(toks[16:])
                    + "<|end|>"
                )
                assert r.rendered_digest == hashlib.md5(rendered.encode()).hexdigest()
                assert r.n_chars == len(rendered)
                checked_digest = True
        else:
            assert d.doc_id not in rows
    assert not rows  # every output row consumed exactly once
    assert checked_digest


def test_gini_matches_pairwise_definition(spark, sf_dir):
    """agg_gini: the rank-identity G must equal the textbook mean-absolute-
    difference definition G = Σᵢⱼ|xᵢ−xⱼ| / (2n²·mean) computed
    independently in Python, and sit in [0, 1)."""
    rows = SPECS["agg_gini"].builder(spark, sf_dir).collect()
    assert rows
    by_src: dict[str, list[int]] = {}
    for d in table(spark, sf_dir, "documents").select("source", "n_chars").collect():
        by_src.setdefault(d.source, []).append(d.n_chars)
    for r in rows:
        xs = by_src[r.source]
        n, s = len(xs), sum(xs)
        assert (r.n_docs, r.total_chars) == (n, s)
        mad = sum(abs(a - b) for a in xs for b in xs)  # includes both orders
        expected = mad / (2 * n * s)
        assert abs(r.gini - expected) < 1e-9, (r.source, r.gini, expected)
        assert 0.0 <= r.gini < 1.0


def test_streaming_approx_distinct_close_to_exact(spark, sf_dir):
    """st_approx_distinct: the streaming HLL++ estimate must land within
    5% of the exact batch distinct per event_type (rsd=0.02 → ~2σ gate),
    and the event counts must match the batch counts exactly."""
    rows = {r.event_type: r for r in SPECS["st_approx_distinct"].builder(spark, sf_dir).collect()}
    assert rows
    exact = {
        r.event_type: r
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("u"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(rows) == set(exact)
    for et, r in rows.items():
        assert r.n_events == exact[et].n
        assert abs(r.approx_users - exact[et].u) <= max(1, 0.05 * exact[et].u), (
            et,
            r.approx_users,
            exact[et].u,
        )


def test_char_entropy_bounds_and_known_values(spark, sf_dir):
    """llm_char_entropy: entropy in [0, ln(38)] (alphabet + other bucket),
    and a Python reimplementation over the same alphabet reproduces the
    value for a sample of documents."""
    import math

    rows = {r.doc_id: r for r in SPECS["llm_char_entropy"].builder(spark, sf_dir).collect()}
    assert rows
    cap = math.log(38) + 1e-9
    for r in rows.values():
        assert 0.0 <= r.char_entropy <= cap
        assert r.low_entropy == int(r.char_entropy < 2.0)
    alphabet = [chr(c) for c in range(97, 123)] + [str(d) for d in range(10)] + [" "]
    docs = table(spark, sf_dir, "documents").select("doc_id", "text").limit(50).collect()
    for d in docs:
        n = len(d.text)
        if n == 0:
            continue
        cnts = [d.text.count(c) for c in alphabet]
        cnts.append(n - sum(cnts))
        ent = -sum((c / n) * math.log(c / n) for c in cnts if c > 0)
        assert abs(rows[d.doc_id].char_entropy - ent) < 1e-8, d.doc_id


def test_interleave_schedule_spreads_sources_uniformly(spark, sf_dir):
    """llm_dataset_interleave: keys are strictly increasing within a
    source, bounded by the scale, and in the global (key, source, doc_id)
    order every source's k-th document sits within one inter-doc stride
    of its ideal k/n position — the uniform-spread guarantee."""
    rows = SPECS["llm_dataset_interleave"].builder(spark, sf_dir).collect()
    assert rows
    total = len(rows)
    by_src: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.schedule_key < 1_000_000_000
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.rank_in_source)
        keys = [r.schedule_key for r in rs]
        assert keys == sorted(keys) and len(set(keys)) == len(keys)
        assert all(r.n_in_source == len(rs) for r in rs)
    ordered = sorted(rows, key=lambda r: (r.schedule_key, r.source, r.doc_id))
    pos = {(r.source, r.rank_in_source): i for i, r in enumerate(ordered)}
    for src, rs in by_src.items():
        n = len(rs)
        for r in rs:
            ideal = (2 * r.rank_in_source - 1) / (2 * n) * total
            assert abs(pos[(src, r.rank_in_source)] - ideal) <= total / n + len(by_src), (
                src,
                r.rank_in_source,
            )


def test_volume_anomaly_zscores_are_leave_one_out(spark, sf_dir):
    """dq_volume_anomaly: a Python reimplementation of the leave-one-out
    z-score over the exact daily counts reproduces vol_z, and the flag
    matches the |z| > 2 rule."""
    import math

    rows = SPECS["dq_volume_anomaly"].builder(spark, sf_dir).collect()
    assert rows
    daily: dict[str, dict[str, int]] = {}
    for r in (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ):
        daily.setdefault(r.event_type, {})[r.day] = r.n
    for r in rows:
        series = daily[r.event_type]
        rest = [n for d, n in series.items() if d != r.day]
        assert len(rest) == len(series) - 1 and len(rest) >= 2
        m = sum(rest) / len(rest)
        var = max(sum(n * n for n in rest) / len(rest) - m * m, 1e-12)
        z = (series[r.day] - m) / math.sqrt(var)
        assert abs(r.vol_z - z) < 1e-6, (r.event_type, r.day, r.vol_z, z)
        assert r.is_anomalous == int(abs(r.vol_z) > 2.0)


def test_winsorize_conserves_and_clamps(spark, sf_dir):
    """llm_winsorize: fences ordered, winsorized_sum between n*lo and n*hi,
    winsorized_sum == raw_sum exactly when nothing clipped, and the
    clipped fractions stay near the nominal 5% tails."""
    rows = SPECS["llm_winsorize"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.fence_lo <= r.fence_hi
        assert r.n_docs * r.fence_lo <= r.winsorized_sum <= r.n_docs * r.fence_hi
        clipped = r.n_clipped_lo + r.n_clipped_hi
        if clipped == 0:
            assert r.winsorized_sum == r.raw_sum
        # each tail is at most ~5% + quantization slack
        assert r.n_clipped_lo <= r.n_docs * 0.06 + 1
        assert r.n_clipped_hi <= r.n_docs * 0.06 + 1


def test_markup_strip_matches_python_re(spark, sf_dir):
    """llm_markup_strip: an independent Python re.sub chain over the same
    synthesized markup reproduces every cleaned-text digest and length —
    pins BOTH engines' regex semantics to a third implementation."""
    import hashlib
    import re

    rows = {r.doc_id: r for r in SPECS["llm_markup_strip"].builder(spark, sf_dir).collect()}
    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "text").collect()
    assert len(rows) == len(docs) and docs
    for d in docs:
        m = (
            f"# {d.source}\n**{d.text[:40]}** {d.text}"
            f" [link](http://{d.source}.example.com/{d.doc_id})"
        )
        c = re.sub(r"\[([^\]]*)\]\(([^)]*)\)", r"\1", m)
        c = re.sub(r"\*\*", "", c)
        c = re.sub(r"^# [^\n]*\n", "", c)
        r = rows[d.doc_id]
        assert r.n_marked == len(m) and r.n_clean == len(c), d.doc_id
        assert r.n_removed == len(m) - len(c)
        assert r.clean_sig == hashlib.md5(c.encode()).hexdigest()[:16], d.doc_id


def test_url_extract_counts_are_known_true(spark, sf_dir):
    """llm_url_extract: the synthesized links imply exact totals — every
    doc contributes one http link, every doc_id % 3 == 0 doc one extra
    https link; per-domain doc reach never exceeds link count."""
    rows = SPECS["llm_url_extract"].builder(spark, sf_dir).collect()
    docs = table(spark, sf_dir, "documents").select("doc_id").collect()
    n = len(docs)
    n_cdn = sum(1 for d in docs if d.doc_id % 3 == 0)
    assert sum(r.n_links for r in rows) == n + n_cdn
    assert sum(r.n_https for r in rows) == n_cdn
    assert sum(r.n_http for r in rows) == n
    for r in rows:
        assert r.n_docs <= r.n_links
        assert r.n_links == r.n_https + r.n_http


def test_bigram_entropy_identities(spark, sf_dir):
    """llm_char_bigram_entropy: per source, chars − bigrams == doc count
    (each doc of length L yields L chars and L−1 bigrams), cond_h is
    exactly h2 − h1 (shared micro-nat quantization), and natural text is
    predictable: 0 < cond_h < h1 < h2."""
    rows = SPECS["llm_char_bigram_entropy"].builder(spark, sf_dir).collect()
    per_src = {
        r.source: r.n
        for r in table(spark, sf_dir, "documents")
        .filter(F.length("text") >= 2)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rows and len(rows) == len(per_src)
    for r in rows:
        assert r.n_chars - r.n_bigrams == per_src[r.source], r.source
        assert abs(r.cond_h_nats - (r.h2_nats - r.h1_nats)) < 1e-9
        assert 0.0 < r.cond_h_nats < r.h1_nats < r.h2_nats, r


def _daily_micro_cells(spark, sf_dir):
    import math

    cells = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 1000000.0).cast("bigint")).alias("x")
        )
        .collect()
    )
    series: dict[str, list[tuple[str, int]]] = {}
    for r in cells:
        series.setdefault(r.event_type, []).append((r.day, r.x))
    for v in series.values():
        v.sort()
    return series


def test_changepoint_matches_python_cusum(spark, sf_dir):
    """ts_changepoint: an independent Python CUSUM over the exact daily
    micro cells reproduces the argmax day and statistic for every series."""
    series = _daily_micro_cells(spark, sf_dir)
    rows = {r.event_type: r for r in SPECS["ts_changepoint"].builder(spark, sf_dir).collect()}
    assert set(rows) == set(series)
    for et, pts in series.items():
        n = len(pts)
        tot = sum(x for _, x in pts)
        best = None
        cum = 0
        for k, (day, x) in enumerate(pts, start=1):
            cum += x
            s = n * cum - k * tot
            key = (-abs(s), k)
            if best is None or key < best[0]:
                best = (key, day, k, s)
        r = rows[et]
        assert (r.cp_day, r.cp_k, r.cusum_stat) == (best[1], best[2], best[3]), et
        assert r.n_days == n


def test_drawdown_matches_python_curve(spark, sf_dir):
    """ts_drawdown: an independent Python pass over the cumulative curve
    reproduces the worst drawdown, its trough day, and the peak value;
    drawdown is non-negative by construction."""
    series = _daily_micro_cells(spark, sf_dir)
    rows = {r.event_type: r for r in SPECS["ts_drawdown"].builder(spark, sf_dir).collect()}
    assert set(rows) == set(series)
    for et, pts in series.items():
        cum = 0
        peak = None
        best = None
        for day, x in pts:
            cum += x
            peak = cum if peak is None else max(peak, cum)
            dd = peak - cum
            key = (-dd, day)
            if best is None or key < best[0]:
                best = (key, day, peak, dd)
        r = rows[et]
        assert (r.trough_day, r.peak_cum_micro, r.max_drawdown_micro) == (
            best[1],
            best[2],
            best[3],
        ), et
        assert r.max_drawdown_micro >= 0
        assert r.n_days == len(pts)


def test_reciprocity_matches_python_transitions(spark, sf_dir):
    """graph_reciprocity: an independent Python pass over per-user event
    sequences reproduces every edge weight, reciprocated weight, and
    ratio; reciprocity is in [0, 1] and total reciprocated weight is even
    (each matched pair contributes min(w_ab, w_ba) twice)."""
    ev = (
        table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    seqs: dict[int, list] = {}
    for r in ev:
        seqs.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    w: dict[tuple, int] = {}
    for s in seqs.values():
        s.sort()
        for (_, _, a), (_, _, b) in zip(s, s[1:]):
            if a != b:
                w[(a, b)] = w.get((a, b), 0) + 1
    out: dict[str, dict] = {}
    for (a, b), cnt in w.items():
        d = out.setdefault(a, {"edges": 0, "out": 0, "rec": 0})
        d["edges"] += 1
        d["out"] += cnt
        d["rec"] += min(cnt, w.get((b, a), 0))
    rows = {r.event_type: r for r in SPECS["graph_reciprocity"].builder(spark, sf_dir).collect()}
    assert set(rows) == set(out)
    for et, d in out.items():
        r = rows[et]
        assert (r.n_out_edges, r.out_weight, r.reciprocated_weight) == (
            d["edges"],
            d["out"],
            d["rec"],
        ), et
        assert 0.0 <= r.reciprocity <= 1.0
    assert sum(r.reciprocated_weight for r in rows.values()) % 2 == 0


def test_concentration_bounds(spark, sf_dir):
    """agg_concentration: one row per supplier nation; CR4 within
    [min(4, n)/n, 1] (top-4 can't beat everything or undercut the
    average), HHI within [1/n − ε, 1 + ε] with ε the pico-quantization
    slack, and CR4² / 16 ≤ HHI (each of 4 equal top shares squared)."""
    rows = SPECS["agg_concentration"].builder(spark, sf_dir).collect()
    n_nations = (
        table(spark, sf_dir, "supplier")
        .join(
            table(spark, sf_dir, "lineitem").select(
                F.col("l_suppkey").alias("s_suppkey")
            ).distinct(),
            "s_suppkey",
        )
        .select("s_nationkey")
        .distinct()
        .count()
    )
    assert len(rows) == n_nations
    for r in rows:
        n = r.n_suppliers
        eps = (n + 1) * 1e-12 + 1e-9
        assert r.total_rev > 0
        assert min(4, n) / n - 1e-9 <= r.cr4 <= 1.0 + 1e-9, r
        assert 1.0 / n - eps <= r.hhi <= 1.0 + eps, r
        assert r.hhi >= (r.cr4 * r.cr4) / 16.0 - eps, r


def test_join_skew_orders_and_reconciles(spark, sf_dir):
    """dq_join_skew: one row per audited key, each seeing the same corpus
    size; max ≥ p99 ≥ p50 ≥ 1; l_partkey's max frequency matches a direct
    groupBy recount."""
    rows = {r.key_name: r for r in SPECS["dq_join_skew"].builder(spark, sf_dir).collect()}
    assert set(rows) == {"l_partkey", "l_suppkey", "l_orderkey"}
    li = table(spark, sf_dir, "lineitem")
    n = li.count()
    direct_max = (
        li.groupBy("l_partkey").count().agg(F.max("count")).collect()[0][0]
    )
    for r in rows.values():
        assert r.n_rows == n
        assert r.max_freq >= r.p99_freq >= r.p50_freq >= 1, r
        assert r.n_keys <= r.n_rows
        assert abs(r.top1_share - r.max_freq / n) < 1e-12
    assert rows["l_partkey"].max_freq == direct_max


def test_token_budget_sums_exactly_and_stays_proportional(spark, sf_dir):
    """llm_token_budget: quotas sum to EXACTLY the 1M budget, extras equal
    the floor shortfall, and every final quota is within 1 of the exact
    proportional share (the Hamilton-method guarantee)."""
    rows = SPECS["llm_token_budget"].builder(spark, sf_dir).collect()
    B = 1_000_000
    W = sum(r.weight for r in rows)
    assert sum(r.final_quota for r in rows) == B
    assert sum(r.extra for r in rows) == B - sum(r.floor_quota for r in rows)
    for r in rows:
        exact = B * r.weight / W
        assert r.floor_quota == (B * r.weight) // W
        assert abs(r.final_quota - exact) < 1.0, r
        assert r.extra in (0, 1)


def test_peak_detect_matches_python_scan(spark, sf_dir):
    """ts_peak_detect: an independent Python pass over the daily micro
    cells reproduces the exact peak set and prominences."""
    series = _daily_micro_cells(spark, sf_dir)
    expected = {}
    for et, pts in series.items():
        for i in range(1, len(pts) - 1):
            (_, prev), (day, x), (_, nxt) = pts[i - 1], pts[i], pts[i + 1]
            if x > prev and x > nxt:
                expected[(et, day)] = (x, prev, nxt, x - max(prev, nxt))
    rows = SPECS["ts_peak_detect"].builder(spark, sf_dir).collect()
    got = {
        (r.event_type, r.day): (
            r.x_micro,
            r.prev_micro,
            r.next_micro,
            r.prominence_micro,
        )
        for r in rows
    }
    assert got == expected
    for v in got.values():
        assert v[3] > 0


def test_codec_roundtrip_against_python(spark, sf_dir):
    """f_codec: every document roundtrips; b64 length follows 4·ceil(n/3);
    the base64 digest matches Python's RFC 4648 encoder (pins the MIME
    fold normalization)."""
    import base64
    import hashlib

    rows = {r.doc_id: r for r in SPECS["f_codec"].builder(spark, sf_dir).collect()}
    docs = table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(rows) == len(docs)
    for d in docs:
        r = rows[d.doc_id]
        assert r.roundtrip_ok == 1
        raw = d.text.encode()
        b64 = base64.b64encode(raw).decode()
        assert r.b64_len == len(b64) == 4 * ((len(raw) + 2) // 3)
        assert r.b64_sig == hashlib.md5(b64.encode()).hexdigest()[:16]


def test_template_detect_finds_the_planted_family(spark, sf_dir):
    """llm_template_detect: the deterministically planted ToS header
    family must surface with exactly the planted membership (every
    doc_id % 5 == 0), exemplar doc 0; every reported family has >= 2
    members."""
    import hashlib

    rows = SPECS["llm_template_detect"].builder(spark, sf_dir).collect()
    n_planted = (
        table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0).count()
    )
    fp = hashlib.md5(b"TERMS OF SERVICE").hexdigest()
    planted = [r for r in rows if r.family_fp == fp]
    assert len(planted) == 1
    assert planted[0].n_docs == n_planted
    assert planted[0].exemplar_doc == 0
    for r in rows:
        assert r.n_docs >= 2
        assert 1 <= r.n_sources


def test_blocklist_filter_matches_python_and_splits(spark, sf_dir):
    """llm_blocklist_filter: a Python recount reproduces every category
    hit count and action; the fixture split is non-degenerate (all three
    actions occur)."""
    cats = {
        "perf": ("slow", "error"),
        "spam": ("fast", "big"),
        "infra": ("spark", "stream"),
    }
    rows = {r.doc_id: r for r in SPECS["llm_blocklist_filter"].builder(spark, sf_dir).collect()}
    docs = table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(rows) == len(docs)
    seen_actions = set()
    for d in docs:
        toks = d.text.split(" ")
        hits = {c: sum(1 for t in toks if t in terms) for c, terms in cats.items()}
        r = rows[d.doc_id]
        assert (r.perf_hits, r.spam_hits, r.infra_hits) == (
            hits["perf"],
            hits["spam"],
            hits["infra"],
        ), d.doc_id
        total = sum(hits.values())
        expected = "drop" if total >= 8 else ("flag" if total >= 3 else "keep")
        assert r.total_hits == total and r.action == expected
        seen_actions.add(r.action)
    assert seen_actions == {"keep", "flag", "drop"}


def test_modularity_matches_python_and_bounds(spark, sf_dir):
    """graph_modularity: a Python recomputation over the collected
    (bounded) edge set reproduces every community row and the global Q;
    Q within [-0.5, 1]; degree sums tile m2."""
    from air_quality_data_pipeline_spark.operators.graph import _copurchase_edges

    edges = _copurchase_edges(spark, sf_dir).collect()
    nat = {
        r.s_suppkey: r.s_nationkey
        for r in table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey").collect()
    }
    m2 = len(edges)
    by_c: dict[int, list[int]] = {}
    for e in edges:
        c = nat[e.src]
        d = by_c.setdefault(c, [0, 0])
        d[0] += 1
        d[1] += 1 if nat[e.dst] == c else 0
    rows = {r.community: r for r in SPECS["graph_modularity"].builder(spark, sf_dir).collect()}
    assert set(rows) == set(by_c)
    sum_e = sum(v[1] for v in by_c.values())
    sum_k2 = sum(v[0] * v[0] for v in by_c.values())
    q_global = (m2 * sum_e - sum_k2) / (m2 * m2)
    assert -0.5 <= q_global <= 1.0
    assert sum(v[0] for v in by_c.values()) == m2
    for c, (k, e_c) in by_c.items():
        r = rows[c]
        assert (r.degree_sum, r.internal_edges) == (k, e_c), c
        assert abs(r.q_contrib - (e_c / m2 - (k / m2) ** 2)) < 1e-12
        assert abs(r.q_global - q_global) < 1e-12


def test_url_canonicalize_matches_python(spark, sf_dir):
    """llm_url_canonicalize: an independent Python canonicalizer over the
    same synthesized raw URLs reproduces every group (count, variant
    count, first doc); canonical forms carry no fragment, no utm params,
    no trailing slash, and a lowercase scheme+host."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "source").collect()
    groups: dict[str, dict] = {}
    for d in docs:
        i, src = d.doc_id, d.source
        url = (
            ("HTTP://" if i % 2 == 0 else "http://")
            + (src.upper() if i % 3 == 0 else src)
            + ".Example.COM/p/" + str(i % 10)
            + ("/" if i % 2 == 0 else "")
            + "?utm_source=x&id=" + str(i % 5)
            + ("&utm_campaign=y" if i % 3 == 0 else "")
            + ("#frag" if i % 7 == 0 else "")
        )
        scheme, rest = url.split("://", 1)
        host, _, pathq = rest.partition("/")
        path = "/" + pathq.split("#", 1)[0].split("?", 1)[0].rstrip("/")
        id_param = url.split("id=", 1)[1].split("&", 1)[0].split("#", 1)[0]
        canon = (
            scheme.lower() + "://" + host.lower() + path
            + ("?id=" + id_param if id_param else "")
        )
        g = groups.setdefault(canon, {"n": 0, "raw": set(), "first": i})
        g["n"] += 1
        g["raw"].add(url)
        g["first"] = min(g["first"], i)
    rows = {r.canonical: r for r in SPECS["llm_url_canonicalize"].builder(spark, sf_dir).collect()}
    assert set(rows) == set(groups)
    for c, g in groups.items():
        r = rows[c]
        assert (r.n_urls, r.n_raw_variants, r.first_doc) == (
            g["n"],
            len(g["raw"]),
            g["first"],
        ), c
        assert "#" not in c and "utm" not in c and not c.split("?")[0].endswith("//")
    assert sum(g["n"] for g in groups.values()) == len(docs)


def test_patch_grid_tiles_exactly(spark, sf_dir):
    """mm_patch_grid: per image, the patch count is ceil(w/256)·ceil(h/256)
    and Σ pw·ph over its patches equals w·h exactly (a perfect tiling —
    no overlap, no gap); coordinates stay in range."""
    rows = SPECS["mm_patch_grid"].builder(spark, sf_dir).collect()
    assert rows
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc, ps in per_doc.items():
        w, h = ps[0].width, ps[0].height
        n_x, n_y = -(-w // 256), -(-h // 256)
        assert len(ps) == n_x * n_y, doc
        assert sum(p.pw * p.ph for p in ps) == w * h, doc
        assert {p.patch_id for p in ps} == set(range(n_x * n_y))
        for p in ps:
            assert 0 <= p.px < n_x and 0 <= p.py < n_y
            assert 1 <= p.pw <= 256 and 1 <= p.ph <= 256


def test_clustering_coef_consistent_with_triangles(spark, sf_dir):
    """graph_clustering_coef: coefficients live in [0, 1], triangle
    counts never exceed C(deg, 2), no degree-<2 node appears, and the
    per-node triangle counts agree exactly with graph_triangles'
    independent output."""
    rows = {r.suppkey: r for r in SPECS["graph_clustering_coef"].builder(spark, sf_dir).collect()}
    tri = {r.suppkey: r.n_triangles for r in SPECS["graph_triangles"].builder(spark, sf_dir).collect()}
    assert rows
    for k, r in rows.items():
        assert r.degree >= 2
        assert 0 <= r.n_triangles <= r.degree * (r.degree - 1) // 2, k
        assert 0.0 <= r.clustering <= 1.0
        assert abs(r.clustering - 2 * r.n_triangles / (r.degree * (r.degree - 1))) < 1e-15
        assert tri.get(k, 0) == r.n_triangles, k
    # every node graph_triangles credits must be present here (deg >= 2
    # is implied by membership in any triangle)
    assert set(tri) <= set(rows)


def test_wilson_ci_brackets_and_shrinks(spark, sf_dir):
    """agg_wilson_ci: 0 <= ci_lo <= p_hat <= ci_hi <= 1 for every group,
    and a Python reimplementation reproduces the bounds."""
    import math

    z = 1.959963984540054
    rows = SPECS["agg_wilson_ci"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        p = r.s / r.n
        denom = 1 + z * z / r.n
        center = p + z * z / (2 * r.n)
        half = z * math.sqrt(p * (1 - p) / r.n + z * z / (4 * r.n * r.n))
        assert abs(r.ci_lo - round((center - half) / denom, 9)) < 1e-9
        assert abs(r.ci_hi - round((center + half) / denom, 9)) < 1e-9
        assert 0.0 <= r.ci_lo <= r.p_hat <= r.ci_hi <= 1.0, r


def test_pad_waste_reconciles_with_token_count(spark, sf_dir):
    """llm_pad_waste: padded ≡ 0 (mod 64), padded − real < 64·n_docs,
    real token totals reconcile with a direct recount."""
    rows = SPECS["llm_pad_waste"].builder(spark, sf_dir).collect()
    direct = {
        r.source: r.t
        for r in table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.expr("size(split(text, ' '))")).alias("t"))
        .collect()
    }
    assert {r.source for r in rows} == set(direct)
    for r in rows:
        assert r.real_tokens == direct[r.source]
        assert r.padded_tokens % 64 == 0
        assert 0 <= r.pad_tokens < 64 * r.n_docs
        assert abs(r.waste_ratio - r.pad_tokens / r.padded_tokens) < 1e-15


def test_geo_bearing_range_and_python(spark, sf_dir):
    """f_geo_bearing: bearings live in [0, 360) and match a Python
    implementation of the same formula to the shared ROUND(6) grid."""
    import math

    rows = SPECS["f_geo_bearing"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows[:500]:
        k = r.p_partkey
        lat = (k % 1800) / 10.0 - 90.0
        lon = ((k * 7) % 3600) / 10.0 - 180.0
        lat1, lat2 = math.radians(lat), math.radians(40.7128)
        dlon = math.radians(-74.0060 - lon)
        y = math.sin(dlon) * math.cos(lat2)
        x = math.cos(lat1) * math.sin(lat2) - math.sin(lat1) * math.cos(
            lat2
        ) * math.cos(dlon)
        deg = (math.degrees(math.atan2(y, x)) % 360.0 + 360.0) % 360.0
        assert 0.0 <= r.bearing_deg < 360.0
        assert abs(r.bearing_deg - deg) < 1e-5, k


def test_bloom_filter_one_sidedness(spark, sf_dir):
    """agg_bloom_filter: EVERY present key hits (no false negatives, the
    Bloom guarantee); false_positive is exactly hit-and-absent; the panel
    is the fixed 32 keys; absent keys truly are absent from lineitem."""
    rows = SPECS["agg_bloom_filter"].builder(spark, sf_dir).collect()
    assert len(rows) == 32
    keys = {r.partkey for r in rows}
    assert keys == set(range(1, 17)) | {1_000_000_000 + i for i in range(1, 17)}
    present = {
        r[0]
        for r in table(spark, sf_dir, "lineitem")
        .select("l_partkey")
        .distinct()
        .collect()
    }
    for r in rows:
        assert r.exact_present == (1 if r.partkey in present else 0)
        if r.exact_present == 1:
            assert r.bloom_hit == 1, f"false negative on {r.partkey}"
        assert r.false_positive == (1 if (r.bloom_hit and not r.exact_present) else 0)


def test_skyline_is_pairwise_nondominated_and_complete(spark, sf_dir):
    """win_skyline: survivors are pairwise non-dominated; every
    non-survivor is dominated by at least one survivor (frontier
    completeness — enough to re-derive the skyline from scratch)."""
    sky = [
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in SPECS["win_skyline"].builder(spark, sf_dir).collect()
    ]
    assert sky
    allp = [
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in table(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]

    def dominates(a, b):
        return (
            a[1] <= b[1]
            and a[2] >= b[2]
            and (a[1] < b[1] or a[2] > b[2])
        )

    for a in sky:
        for b in sky:
            assert not dominates(a, b), (a, b)
    sky_keys = {k for k, _, _ in sky}
    for p in allp:
        if p[0] not in sky_keys:
            assert any(dominates(s, p) for s in sky), f"{p} not dominated"


def test_skyline_distributed_prefix_equals_single_window(spark, sf_dir):
    """win_skyline's range-partitioned two-level prefix-max (VERDICT r7
    item 2) must return exactly the rows of the straightforward
    single-partition running-max form it replaced — the classic
    parallel-scan equivalence, pinned so a future range-boundary or
    partition-id regression can't ship silently."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    got = {
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in SPECS["win_skyline"].builder(spark, sf_dir).collect()
    }
    p = table(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    per_price = p.groupBy("p_retailprice").agg(F.max("p_size").alias("grp_max"))
    w = Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
    per_price = per_price.withColumn("prev_max", F.max("grp_max").over(w))
    ref = {
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in p.join(per_price, "p_retailprice")
        .filter(
            (F.col("prev_max").isNull() | (F.col("p_size") > F.col("prev_max")))
            & (F.col("p_size") == F.col("grp_max"))
        )
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    }
    assert got == ref


def test_markov_rows_are_a_probability_matrix(spark, sf_dir):
    """ts_markov_transitions: per prev_type the conditional probabilities
    sum to 1; total transitions == n_events - n_users_with_events."""
    rows = SPECS["ts_markov_transitions"].builder(spark, sf_dir).collect()
    assert rows
    by_prev: dict[str, float] = {}
    total = 0
    for r in rows:
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.p_trans
        total += r.n_trans
        assert 0.0 < r.p_trans <= 1.0
    for prev, s in by_prev.items():
        assert abs(s - 1.0) < 1e-9, (prev, s)
    ev = table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total == n_events - n_users


def test_funcdep_axioms(spark, sf_dir):
    """dq_funcdep: the axiomatic candidate (partkey,suppkey -> partkey)
    holds with fan-out 1; rates live in [0,1]; fd_holds <=> zero
    violations <=> worst_fanout == 1."""
    rows = {r.fd: r for r in SPECS["dq_funcdep"].builder(spark, sf_dir).collect()}
    assert set(rows) == {
        "orderkey->suppkey",
        "partkey->extendedprice",
        "orderkey->linestatus",
        "partkey,suppkey->partkey",
    }
    ax = rows["partkey,suppkey->partkey"]
    assert ax.fd_holds == 1 and ax.worst_fanout == 1 and ax.n_violating == 0
    for r in rows.values():
        assert 0.0 <= r.violation_rate <= 1.0
        assert (r.fd_holds == 1) == (r.n_violating == 0) == (r.worst_fanout == 1)
        assert abs(r.violation_rate - r.n_violating / r.n_groups) < 1e-15


def test_readability_matches_python_recount(spark, sf_dir):
    """llm_readability: totals and the micro-quantized mean reproduce a
    Python re-implementation over the raw documents exactly."""
    import math
    import re as _re

    rows = {r.source: r for r in SPECS["llm_readability"].builder(spark, sf_dir).collect()}
    docs = table(spark, sf_dir, "documents").select("source", "text").collect()
    agg: dict[str, list] = {}
    for d in docs:
        w = max(1, len(_re.findall(r"[A-Za-z]+", d.text)))
        s = max(1, len(_re.findall(r"[.!?]+", d.text)))
        y = len(_re.findall(r"[AEIOUYaeiouy]+", d.text))
        micro = math.floor((206.835 - 1.015 * (w / s) - 84.6 * (y / w)) * 1_000_000.0)
        a = agg.setdefault(d.source, [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += w
        a[2] += s
        a[3] += y
        a[4] += micro
    assert set(rows) == set(agg)
    for src, (n, w, s, y, micro) in agg.items():
        r = rows[src]
        assert (r.n_docs, r.total_words, r.total_sentences, r.total_syllables) == (
            n,
            w,
            s,
            y,
        )
        assert abs(r.avg_flesch - micro / (n * 1_000_000.0)) < 1e-12


def test_hits_scores_bounded_and_rank_valid(spark, sf_dir):
    """graph_hits: normalized scores live in [0, ~SCALE] (the max rounds
    to <= SCALE after integer renormalization), one supplier per row,
    rank is a valid dense-ish permutation starting at 1."""
    rows = SPECS["graph_hits"].builder(spark, sf_dir).collect()
    assert rows
    n_supp = (
        table(spark, sf_dir, "lineitem").select("l_suppkey").distinct().count()
    )
    assert len(rows) == n_supp
    scale = 1_000_000
    top = min(r.auth_rank for r in rows)
    assert top == 1
    for r in rows:
        assert 0 <= r.auth1_fixed <= scale
        assert 0 <= r.auth2_fixed <= scale
        assert 1 <= r.auth_rank <= n_supp
    # rank 1 is held by (one of) the max-auth2 suppliers
    max_a2 = max(r.auth2_fixed for r in rows)
    rank1 = [r for r in rows if r.auth_rank == 1]
    assert all(r.auth2_fixed == max_a2 for r in rank1)


def test_ttest_matches_scipy_free_python(spark, sf_dir):
    """agg_ttest: Welch t and Satterthwaite df reproduce a plain-Python
    recomputation from the raw values; df within [min(n)-1, n_a+n_b-2]."""
    import math

    rows = SPECS["agg_ttest"].builder(spark, sf_dir).collect()
    assert len(rows) == 10  # C(5,2) unordered type pairs
    vals: dict[str, list[float]] = {}
    for r in table(spark, sf_dir, "events").select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    for r in rows:
        a, b = vals[r.type_a], vals[r.type_b]
        na, nb = len(a), len(b)
        ma, mb = sum(a) / na, sum(b) / nb
        va = sum((x - ma) ** 2 for x in a) / (na - 1)
        vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
        t = (ma - mb) / math.sqrt(va / na + vb / nb)
        df = (va / na + vb / nb) ** 2 / (
            (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
        )
        assert (r.n_a, r.n_b) == (na, nb)
        # python float sums differ from decimal-exact sums only in the ulps
        assert abs(r.t_stat - t) < 1e-5, (r, t)
        assert abs(r.df - df) < 1e-2
        assert min(na, nb) - 1 <= r.df <= na + nb - 2
        assert r.significant_95 == (1 if abs(r.t_stat) > 1.959963984540054 else 0)


def test_jsd_drift_bounds_and_zero_self(spark, sf_dir):
    """llm_jsd_drift: JSD lives in [0, ln2] up to micro-quantization slack;
    token totals reconcile with a direct recount."""
    rows = SPECS["llm_jsd_drift"].builder(spark, sf_dir).collect()
    assert rows
    ln2 = 0.6931471805599453
    direct = {
        r.source: r.t
        for r in table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.expr("size(split(text, ' '))")).alias("t"))
        .collect()
    }
    for r in rows:
        assert r.n_tokens == direct[r.source]
        # floor-quantization can push the sum a hair out of [0, ln2]
        assert -0.01 <= r.jsd_nats <= ln2 + 0.01, r
        assert abs(r.jsd_norm - r.jsd_nats / ln2) < 1e-12


def test_degree_dist_reconciles_with_degrees(spark, sf_dir):
    """graph_degree_dist: buckets tile [2^(b-1), 2^b); counts and shares
    sum to the node total; band min/max inside the band."""
    rows = SPECS["graph_degree_dist"].builder(spark, sf_dir).collect()
    assert rows
    total = sum(r.n_nodes for r in rows)
    assert abs(sum(r.node_share for r in rows) - 1.0) < 1e-9
    for r in rows:
        lo, hi = 2 ** (r.bucket - 1), 2**r.bucket - 1
        assert lo <= r.min_deg <= r.max_deg <= hi, r
    assert total > 0


def test_st_topk_is_the_batch_leaderboard(spark, sf_dir):
    """st_topk: the streamed leaderboard equals the batch recomputation
    (per window: top-3 by count desc, type asc; ranks 1..3 contiguous)."""
    rows = SPECS["st_topk"].builder(spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    per_win = defaultdict(list)
    for r in rows:
        per_win[r.win_start_sec].append(r)
    batch = defaultdict(dict)
    for r in (
        table(spark, sf_dir, "events")
        .groupBy(
            F.expr(
                "(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                " div 86400000000) * 86400"
            ).alias("w"),
            "event_type",
        )
        .count()
        .collect()
    ):
        batch[r.w][r.event_type] = r["count"]
    for w, rs in per_win.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        expect = sorted(batch[w].items(), key=lambda kv: (-kv[1], kv[0]))[: len(rs)]
        assert [(r.event_type, r.cnt) for r in rs] == expect


def test_phash_deterministic_and_family_consistent(spark, sf_dir):
    """mm_phash: hashes fit in 16 bits, repeat runs agree (deterministic
    decode), and family_size counts docs per hash exactly."""
    rows = SPECS["mm_phash"].builder(spark, sf_dir).collect()
    again = SPECS["mm_phash"].builder(spark, sf_dir).collect()
    assert sorted((r.doc_id, r.phash) for r in rows) == sorted(
        (r.doc_id, r.phash) for r in again
    )
    from collections import Counter

    fam = Counter(r.phash for r in rows)
    for r in rows:
        assert 0 <= r.phash < 2**16
        assert r.family_size == fam[r.phash]


def test_temporal_audit_reconciles(spark, sf_dir):
    """dq_temporal: item totals reconcile with lineitem row count; lag
    bracket min <= median <= max; rate == violations / items."""
    rows = SPECS["dq_temporal"].builder(spark, sf_dir).collect()
    assert rows
    n_li = table(spark, sf_dir, "lineitem").count()
    assert sum(r.n_items for r in rows) == n_li
    for r in rows:
        assert r.min_lag_days <= r.median_lag_days <= r.max_lag_days
        assert abs(r.violation_rate - r.n_violations / r.n_items) < 1e-15
        assert 0 <= r.n_violations <= r.n_items


def test_interarrival_totals_reconcile(spark, sf_dir):
    """ts_interarrival: gap counts sum to n_events - n_users; all gaps are
    non-negative (the ordering is total); p50 <= p95 <= max."""
    rows = SPECS["ts_interarrival"].builder(spark, sf_dir).collect()
    assert rows
    ev = table(spark, sf_dir, "events")
    assert sum(r.n_gaps for r in rows) == ev.count() - ev.select("user_id").distinct().count()
    for r in rows:
        assert 0 <= r.p50_gap_s <= r.p95_gap_s <= r.max_gap_s
        assert abs(r.mean_gap_s - r.total_gap_s / r.n_gaps) < 1e-12


def test_scene_cut_counts_bounded_by_frames(spark, sf_dir):
    """mm_scene_cut: 0 <= n_cuts < n_frames; first_cut_frame is a real
    frame index (or -1 exactly when n_cuts == 0); frame counts match
    mm_frame_sample's fan-out."""
    rows = SPECS["mm_scene_cut"].builder(spark, sf_dir).collect()
    frames = {}
    for r in SPECS["mm_frame_sample"].builder(spark, sf_dir).collect():
        frames[r.doc_id] = frames.get(r.doc_id, 0) + 1
    assert {r.doc_id for r in rows} == set(frames)
    for r in rows:
        assert r.n_frames == frames[r.doc_id]
        assert 0 <= r.n_cuts < max(r.n_frames, 1) + 1
        if r.n_cuts == 0:
            assert r.first_cut_frame == -1
        else:
            assert 1 <= r.first_cut_frame < r.n_frames


def test_bleu_bounds_and_self_identity(spark, sf_dir):
    """llm_bleu: scores live in [0, 1]; zero bigram overlap forces 0;
    m1 <= c_len (clipping can never exceed candidate mass)."""
    rows = SPECS["llm_bleu"].builder(spark, sf_dir).collect()
    assert len(rows) == 500  # 10 refs x 50 candidates
    for r in rows:
        assert 0.0 <= r.bleu2 <= 1.0, r
        assert r.m1 <= r.c_len
        if r.m2 == 0 or r.m1 == 0:
            assert r.bleu2 == 0.0


def test_geomean_am_gm_hm_bracket(spark, sf_dir):
    """agg_geomean: AM >= GM >= HM for every group (strictly positive,
    non-constant values), and GM matches a Python recount within the
    micro-quantization slack."""
    import math

    rows = SPECS["agg_geomean"].builder(spark, sf_dir).collect()
    assert rows
    vals: dict[str, list[float]] = {}
    for r in (
        table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice")
        .collect()
    ):
        vals.setdefault(r.l_returnflag, []).append(r.l_extendedprice)
    for r in rows:
        assert r.arith_mean >= r.geo_mean >= r.harm_mean > 0, r
        xs = vals[r.l_returnflag]
        gm = math.exp(sum(math.log(x) for x in xs) / len(xs))
        assert abs(r.geo_mean - gm) / gm < 1e-4


def test_cov_matrix_is_psd_ish_and_matches_numpy(spark, sf_dir):
    """ts_cov_matrix: diagonal = variances >= 0, |corr| <= 1, corr == 1 on
    the diagonal (non-constant series), and values match numpy's
    population covariance on the reconstructed grid."""
    import numpy as np

    rows = SPECS["ts_cov_matrix"].builder(spark, sf_dir).collect()
    assert len(rows) == 15  # C(5,2) + 5 diagonal
    # reconstruct the dense grid
    ev = (
        table(spark, sf_dir, "events")
        .groupBy(
            F.expr(
                "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                " div 86400000000 AS BIGINT)"
            ).alias("day"),
            "event_type",
        )
        .count()
        .collect()
    )
    days = sorted({r.day for r in ev})
    types = sorted({r.event_type for r in ev})
    cell = {(r.day, r.event_type): r["count"] for r in ev}
    mat = np.array(
        [[cell.get((d, t), 0) for d in days] for t in types], dtype=np.float64
    )
    cov = np.cov(mat, bias=True)
    for r in rows:
        i, j = types.index(r.type_a), types.index(r.type_b)
        assert r.n_days == len(days)
        assert abs(r.cov - cov[i, j]) < 1e-6 * max(1.0, abs(cov[i, j]))
        assert abs(r.corr) <= 1.0 + 1e-12
        if r.type_a == r.type_b:
            assert r.cov >= 0
            assert abs(r.corr - 1.0) < 1e-9


def test_decay_score_bounded_by_raw_and_python(spark, sf_dir):
    """ts_decay_score: with positive values, decay_score <= raw_sum
    (weights <= 1) and freshness in (0, 1]; a Python recount of the
    micro-quantized sum reproduces the score exactly."""
    import math

    rows = {r.event_type: r for r in SPECS["ts_decay_score"].builder(spark, sf_dir).collect()}
    ev = table(spark, sf_dir, "events").select("event_type", "value", "ts").collect()
    max_day = max(r.ts.timestamp() // 86400 for r in ev)
    agg: dict[str, list] = {}
    for r in ev:
        age = max_day - r.ts.timestamp() // 86400
        term = math.floor(r.value * math.pow(0.5, age / 7.0) * 1_000_000.0)
        a = agg.setdefault(r.event_type, [0, 0])
        a[0] += 1
        a[1] += term
    assert set(rows) == set(agg)
    for t, (n, s) in agg.items():
        r = rows[t]
        assert r.n_events == n
        assert abs(r.decay_score - s / 1_000_000.0) < 1e-9
        if r.raw_sum > 0:
            assert r.decay_score <= r.raw_sum + 1e-9
            assert 0.0 < r.freshness_ratio <= 1.0 + 1e-12


# --- round-8 operators --------------------------------------------------------


def test_simhash_neardup_banding_recall_guarantee(spark, sf_dir):
    """llm_simhash_neardup: the pigeonhole guarantee is testable — EVERY
    drop-last-token twin pair whose true fingerprint Hamming distance is
    <= 3 MUST appear in the result (4 bands, 3 flipped bits: at least one
    band is untouched). Verified against independently recomputed
    fingerprints."""
    from air_quality_data_pipeline_spark.operators.dedup import (
        _SH2_HAMMING_MAX,
        _sh2_fold,
        _sh2_sum_cols_spark,
        _sh2_tok_spark,
    )
    from air_quality_data_pipeline_spark.functions.text import (
        drop_last_token_spark,
        tokens_spark,
    )
    from air_quality_data_pipeline_spark.tables import table

    got = {
        (r.doc_a, r.doc_b)
        for r in SPECS["llm_simhash_neardup"].builder(spark, sf_dir).collect()
    }
    docs = table(spark, sf_dir, "documents")
    corpus = docs.selectExpr("doc_id", "text").unionByName(
        docs.selectExpr(
            "doc_id + 1000000 AS doc_id", f"{drop_last_token_spark('text')} AS text"
        )
    )
    corpus.createOrReplaceTempView("sh2corpus")
    fp = {
        r.doc_id: r.f
        for r in spark.sql(
            f"SELECT doc_id, CAST({_sh2_fold} AS BIGINT) AS f FROM ("
            f"  SELECT doc_id, {_sh2_sum_cols_spark} FROM ("
            f"    SELECT doc_id, explode({_sh2_tok_spark.format(toks=tokens_spark('text'))}) AS h"
            f"    FROM sh2corpus) GROUP BY doc_id)"
        ).collect()
    }
    missed = [
        (d, d + 1000000)
        for d in fp
        if d < 1000000
        and (d + 1000000) in fp
        and bin(fp[d] ^ fp[d + 1000000]).count("1") <= _SH2_HAMMING_MAX
        and (d, d + 1000000) not in got
    ]
    assert not missed, f"banding guarantee violated for twin pairs: {missed[:5]}"
    # and everything reported really is within the threshold
    for a, b in got:
        assert bin(fp[a] ^ fp[b]).count("1") <= _SH2_HAMMING_MAX


def test_label_prop_labels_are_community_members(spark, sf_dir):
    """graph_label_prop: labels are node ids, sizes account for every
    node exactly once, and a planted-structure sanity: at least one
    community has more than one member on the dense co-purchase graph."""
    rows = SPECS["graph_label_prop"].builder(spark, sf_dir).collect()
    nodes = {r.suppkey for r in rows}
    assert len(rows) == len(nodes)
    labels = {r.community for r in rows}
    assert labels <= nodes, "a community label must be some member node's id"
    from collections import Counter

    sizes = Counter(r.community for r in rows)
    for r in rows:
        assert r.community_size == sizes[r.community]
    assert max(sizes.values()) > 1


def test_chi2_margins_and_total(spark, sf_dir):
    """dq_chi2: observed cells sum to |documents|; the global statistic is
    exactly the sum of the per-cell contributions; dof matches the
    distinct lang/source counts."""
    from air_quality_data_pipeline_spark.tables import table

    rows = SPECS["dq_chi2"].builder(spark, sf_dir).collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r.observed for r in rows) == n_docs
    total = rows[0].chi2_micro_total
    assert all(r.chi2_micro_total == total for r in rows)
    assert sum(r.contrib_micro for r in rows) == total
    langs = {r.lang for r in rows}
    sources = {r.source for r in rows}
    assert rows[0].dof == (len(langs) - 1) * (len(sources) - 1)


def test_emb_covariance_matches_numpy(spark, sf_dir):
    """llm_emb_covariance: the quantized moment matrix must agree with
    numpy's population covariance/correlation to quantization tolerance,
    diagonals are variances (cov >= 0, corr == 1)."""
    import numpy as np

    from air_quality_data_pipeline_spark.tables import table

    rows = SPECS["llm_emb_covariance"].builder(spark, sf_dir).collect()
    vecs = np.array(
        [
            [float(x) for x in r.embedding[:16]]
            for r in table(spark, sf_dir, "embeddings").select("embedding").collect()
        ]
    )
    cov_np = np.cov(vecs, rowvar=False, bias=True)
    for r in rows:
        i, j = r.dim_i - 1, r.dim_j - 1
        assert abs(r.cov - cov_np[i, j]) < 1e-6, (r.dim_i, r.dim_j)
        if i == j:
            assert r.cov >= -1e-9
            assert abs(r.corr - 1.0) < 1e-6
        if r.corr is not None:
            assert -1.0 - 1e-9 <= r.corr <= 1.0 + 1e-9


def test_holt_fold_matches_reference_recursion(spark, sf_dir):
    """ts_holt: the aggregate() fold must equal the literal Python
    recursion over the same daily series, bit for bit, and the forecast
    is level + trend."""
    import pyspark.sql.functions as F

    from air_quality_data_pipeline_spark.tables import table

    got = {r.event_type: r for r in SPECS["ts_holt"].builder(spark, sf_dir).collect()}
    daily = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.floor(F.sum(F.col("value").cast("decimal(18,9)")) * 1000000)
            .cast("bigint")
            .alias("v")
        )
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.v))
    for et, dv in series.items():
        vs = [v for _, v in sorted(dv)]
        l, t = vs[0], 0
        for x in vs[1:]:
            ln = (x + l + t) >> 1
            t = (t + (ln - l)) >> 1
            l = ln
        row = got[et]
        assert (row.level_micro, row.trend_micro) == (l, t), et
        assert row.forecast_next_micro == l + t
        assert row.n_days == len(vs)


def test_cc_shuffle_equals_broadcast_cc(spark, sf_dir):
    """graph_cc_shuffle must return exactly graph_cc's rows — same
    algebra, different physical plan; any divergence means the shuffle
    form changed semantics, not just shape."""
    a = {
        (r.suppkey, r.comp, r.comp_size)
        for r in SPECS["graph_cc"].builder(spark, sf_dir).collect()
    }
    b = {
        (r.suppkey, r.comp, r.comp_size)
        for r in SPECS["graph_cc_shuffle"].builder(spark, sf_dir).collect()
    }
    assert a == b


def test_cross_dedup_is_exactly_the_cross_side_slice(spark, sf_dir):
    """llm_cross_dedup must (a) find every planted twin of an eval-panel
    doc, and (b) emit ONLY train x eval pairs — no within-corpus pair may
    leak through the side filter."""
    rows = SPECS["llm_cross_dedup"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.train_doc < 1000000, "train side leaked an eval id"
        assert r.eval_doc >= 1000000, "eval side leaked a train id"
    found = {(r.train_doc, r.eval_doc) for r in rows}
    # every planted twin (doc d, its truncated copy d+1e6) for d < 50
    # whose jaccard clears the gate in llm_minhash_dedup must be here too
    mh = {
        (r.doc_a, r.doc_b)
        for r in SPECS["llm_minhash_dedup"].builder(spark, sf_dir).collect()
        if r.doc_a < 50 and r.doc_b == r.doc_a + 1000000
    }
    assert mh <= found, f"missed planted contamination: {sorted(mh - found)[:5]}"


def test_ntile_distributed_positions_equal_single_window(spark, sf_dir):
    """win_ntile's two-level parallel-scan tile assignment (round-8
    drop-in) must reproduce the single-window ntile(4) semantics row for
    row — including the first-(N mod k)-tiles-get-one-extra rule — pinned
    so a range-boundary or offset regression can't ship silently."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    got = {
        (r.quartile, r.n_customers, r.lo, r.hi, r.sum_bal)
        for r in SPECS["win_ntile"].builder(spark, sf_dir).collect()
    }
    cust = table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    from air_quality_data_pipeline_spark.functions.exact import exact_sum

    ref = {
        (r.quartile, r.n_customers, r.lo, r.hi, r.sum_bal)
        for r in cust.select(
            "c_acctbal", F.ntile(4).over(w).alias("quartile")
        )
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_acctbal").alias("lo"),
            F.max("c_acctbal").alias("hi"),
            exact_sum(F.col("c_acctbal")).alias("sum_bal"),
        )
        .collect()
    }
    assert got == ref


def test_rater_kappa_identities(spark, sf_dir):
    """The confusion table must tile the corpus and kappa must equal the
    textbook (po - pe) / (1 - pe) recomputed in exact Python arithmetic
    from the four counts — pinning the cross-multiplied closing form."""
    row = SPECS["llm_rater_kappa"].builder(spark, sf_dir).collect()[0]
    n, n11, n10, n01, n00 = row.n, row.n11, row.n10, row.n01, row.n00
    assert n11 + n10 + n01 + n00 == n
    chance = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    kappa_ref = round((n * (n11 + n00) - chance) / (n * n - chance), 9)
    assert row.kappa == kappa_ref
    assert abs(row.p_observed - round((n11 + n00) / n, 9)) == 0


def test_leadlag_matches_numpy_per_lag(spark, sf_dir):
    """Each lag's correlation must equal a from-scratch recomputation:
    rebuild the quantized daily series in pandas, shift, and apply the
    same exact-integer moment algebra — an independent second
    implementation, not a replay of the operator's SQL."""
    import duckdb

    got = {r.lag: (r.n_days, r.corr_xy)
           for r in SPECS["ts_leadlag"].builder(spark, sf_dir).collect()}
    daily = duckdb.sql(
        f"""
        SELECT CAST(ts AS DATE) AS day,
          COALESCE(SUM(CASE WHEN event_type = 'view'
            THEN CAST(floor(value * 1000000.0) AS BIGINT) END), 0) AS xq,
          COALESCE(SUM(CASE WHEN event_type = 'purchase'
            THEN CAST(floor(value * 1000000.0) AS BIGINT) END), 0) AS yq
        FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    by_day = {d: (int(x), int(y)) for d, x, y in daily}
    import datetime as dt

    for lag in range(-3, 4):
        pairs = [
            (x, by_day[d + dt.timedelta(days=lag)][1])
            for d, (x, _) in by_day.items()
            if d + dt.timedelta(days=lag) in by_day
        ]
        n = len(pairs)
        sx = sum(p[0] for p in pairs); sy = sum(p[1] for p in pairs)
        sxy = sum(p[0] * p[1] for p in pairs)
        sx2 = sum(p[0] ** 2 for p in pairs); sy2 = sum(p[1] ** 2 for p in pairs)
        vx, vy = n * sx2 - sx * sx, n * sy2 - sy * sy
        ref = (
            round((n * sxy - sx * sy) / (vx * vy) ** 0.5, 9)
            if vx > 0 and vy > 0 else None
        )
        assert got[lag][0] == n, f"lag {lag}: n_days {got[lag][0]} != {n}"
        if ref is None:
            assert got[lag][1] is None
        else:
            assert abs(got[lag][1] - ref) <= 1e-9, f"lag {lag}: {got[lag][1]} vs {ref}"


def test_kendall_tau_matches_scipy_free_recompute(spark, sf_dir):
    """tau-b must equal the textbook formula recomputed from the raw
    brand totals in exact Python integers — an independent second
    implementation (itertools pairs), not a replay of the SQL."""
    import duckdb
    from itertools import combinations

    row = SPECS["agg_kendall_tau"].builder(spark, sf_dir).collect()[0]
    cells = duckdb.sql(
        f"""
        SELECT p.p_brand,
               SUM(CAST(floor(l.l_quantity * 100.0) AS BIGINT)) AS x,
               SUM(CAST(floor(l.l_extendedprice * 100.0) AS BIGINT)) AS y
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/part.parquet' p ON p.p_partkey = l.l_partkey
        GROUP BY 1
        """
    ).fetchall()
    c = d = tx = ty = 0
    for (_, x1, y1), (_, x2, y2) in combinations(sorted(cells), 2):
        s = (x1 - x2) * (y1 - y2)
        c += s > 0
        d += s < 0
        tx += x1 == x2
        ty += y1 == y2
    n0 = len(cells) * (len(cells) - 1) // 2
    ref = round((c - d) / ((n0 - tx) * (n0 - ty)) ** 0.5, 9)
    assert (row.c, row.d, row.tx, row.ty) == (c, d, tx, ty)
    assert abs(row.tau_b - ref) <= 1e-9


def test_psi_terms_sum_to_manual_psi(spark, sf_dir):
    """The per-bin micro-terms must (a) cover every event exactly once
    across the two halves and (b) sum to the PSI a from-scratch pandas
    recomputation produces under the same quantization."""
    import duckdb

    rows = SPECS["dq_psi"].builder(spark, sf_dir).collect()
    n_events = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert sum(r.n_base + r.n_cur for r in rows) == n_events
    import math

    tb = sum(r.n_base for r in rows)
    tc = sum(r.n_cur for r in rows)
    for r in rows:
        if r.n_base > 0 and r.n_cur > 0:
            p, q = r.n_base / tb, r.n_cur / tc
            assert r.term_micro == math.floor((q - p) * math.log(q / p) * 1e6)
        else:
            assert r.term_micro is None


def test_sequence_gaps_totals_match_exact_set_difference(spark, sf_dir):
    """Total missing keys (within ranges + between ranges) must equal the
    exact |[min,max] \\ observed| set difference computed in Python."""
    import duckdb

    rows = SPECS["dq_sequence_gaps"].builder(spark, sf_dir).collect()
    keys = {
        k for (k,) in duckdb.sql(
            f"SELECT DISTINCT l_orderkey FROM '{sf_dir}/lineitem.parquet'"
        ).fetchall()
    }
    expected_missing = (max(keys) - min(keys) + 1) - len(keys)
    got_missing = sum(r.missing_within + r.missing_to_next for r in rows)
    assert got_missing == expected_missing
    assert sum(r.n_keys for r in rows) == len(keys)


def test_hopping_each_event_in_exactly_four_windows(spark, sf_dir):
    """Total window membership must be exactly 4x the event count, and
    every window's span must equal 4 hops."""
    import duckdb

    rows = SPECS["win_hopping"].builder(spark, sf_dir).collect()
    n_events = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert sum(r.n_events for r in rows) == 4 * n_events
    assert all(r.window_end - r.window_start == 7200 for r in rows)
    assert all(r.window_start % 1800 == 0 for r in rows)


def test_calendar_profile_shares_sum_to_one_per_type(spark, sf_dir):
    """Per type: cells tile the type's events and shares sum to ~1."""
    from collections import defaultdict

    rows = SPECS["ts_calendar_profile"].builder(spark, sf_dir).collect()
    by_type = defaultdict(float)
    for r in rows:
        assert 1 <= r.dow <= 7 and 0 <= r.hr <= 23
        by_type[r.event_type] += r.share
    for t, s in by_type.items():
        assert abs(s - 1.0) < 1e-6, (t, s)


def test_harmonic_distance_classes_match_networkx_free_bfs(spark, sf_dir):
    """n_dist1/2/3 must match a plain-Python BFS over the same edge set
    — an independent traversal, not a replay of the join algebra."""
    from collections import deque

    from air_quality_data_pipeline_spark.operators.graph import _copurchase_edges

    edges = _copurchase_edges(spark, sf_dir).collect()
    adj = {}
    for r in edges:
        adj.setdefault(r.src, set()).add(r.dst)
    got = {
        r.suppkey: (r.n_dist1, r.n_dist2, r.n_dist3)
        for r in SPECS["graph_harmonic"].builder(spark, sf_dir).collect()
    }
    for src in adj:
        dist = {src: 0}
        q = deque([src])
        while q:
            u = q.popleft()
            if dist[u] >= 3:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        counts = [0, 0, 0]
        for v, d in dist.items():
            if 1 <= d <= 3:
                counts[d - 1] += 1
        assert got[src] == tuple(counts), (src, got[src], counts)


def test_pref_attach_candidates_are_open_wedges_only(spark, sf_dir):
    """Every candidate must be non-adjacent with >= 1 common neighbor,
    and its score must equal the exact degree product."""
    from air_quality_data_pipeline_spark.operators.graph import _copurchase_edges

    edges = _copurchase_edges(spark, sf_dir).collect()
    adj = {}
    for r in edges:
        adj.setdefault(r.src, set()).add(r.dst)
    rows = SPECS["graph_pref_attach"].builder(spark, sf_dir).collect()
    for r in rows:
        assert r.v not in adj.get(r.u, set()), f"({r.u},{r.v}) is an edge"
        common = adj.get(r.u, set()) & adj.get(r.v, set())
        assert len(common) == r.n_common and r.n_common >= 1
        assert r.pa_score == len(adj[r.u]) * len(adj[r.v])


def test_lexical_diversity_bounds_and_exact_recompute(spark, sf_dir):
    """TTR/Simpson in (0, 1]; spot-recompute 20 docs from raw text."""
    import duckdb

    rows = SPECS["llm_lexical_diversity"].builder(spark, sf_dir).collect()
    for r in rows:
        assert 0 < r.ttr <= 1
        assert r.gini_simpson is None or 0 <= r.gini_simpson <= 1
        assert r.n_types <= r.n_tokens
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "WHERE text IS NOT NULL AND text <> '' LIMIT 20"
    ).fetchall()
    got = {r.doc_id: r for r in rows}
    from collections import Counter

    for doc_id, text in texts:
        c = Counter(text.split(" "))
        n = sum(c.values())
        rep2 = sum(v * (v - 1) for v in c.values())
        r = got[doc_id]
        assert (r.n_tokens, r.n_types) == (n, len(c))
        if n > 1:
            assert abs(r.gini_simpson - round(1 - rep2 / (n * (n - 1)), 9)) == 0


def test_term_lift_is_top5_with_exact_counts(spark, sf_dir):
    """Each source yields <= 5 rows, every term's counts match a raw
    Counter recompute, and lift > 1 implies the term is over-represented
    (exact cross-product comparison)."""
    from collections import Counter, defaultdict

    import duckdb

    rows = SPECS["llm_term_lift"].builder(spark, sf_dir).collect()
    per_src = defaultdict(list)
    for r in rows:
        per_src[r.source].append(r)
    assert all(len(v) <= 5 for v in per_src.values())
    docs = duckdb.sql(
        f"SELECT source, text FROM '{sf_dir}/documents.parquet' "
        "WHERE text IS NOT NULL"
    ).fetchall()
    src_counts, corpus = defaultdict(Counter), Counter()
    for src, text in docs:
        toks = text.split(" ")
        src_counts[src].update(toks)
        corpus.update(toks)
    n = sum(corpus.values())
    for src, terms in per_src.items():
        n_s = sum(src_counts[src].values())
        for r in terms:
            assert src_counts[src][r.term] == r.n_in_source >= 5
            assert corpus[r.term] == r.n_in_corpus
            # over-representation check via exact cross-products
            if r.lift > 1:
                assert r.n_in_source * n > n_s * r.n_in_corpus


def test_chrf_identity_and_self_score(spark, sf_dir):
    """chrf2 must equal 5*ov/(4*nr+nc) exactly, and overlap is bounded
    by both gram totals."""
    rows = SPECS["llm_chrf"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.overlap <= min(r.n_ref_grams, r.n_cand_grams)
        assert r.chrf2 == round(
            5 * r.overlap / (4 * r.n_ref_grams + r.n_cand_grams), 9
        )


def test_audio_vad_segments_consistent_with_flags(spark, sf_dir):
    """Recompute VAD per media from raw bytes in plain Python (frames,
    mean threshold, run counting) and compare all four outputs."""
    from air_quality_data_pipeline_spark.operators.multimodal import _media

    media = {
        r.doc_id: bytes(r.payload)
        for r in _media(spark, sf_dir)
        .filter("kind = 'audio'")
        .select("doc_id", "payload")
        .collect()
    }
    got = {r.doc_id: r for r in SPECS["mm_audio_vad"].builder(spark, sf_dir).collect()}
    assert set(got) == set(media)
    for doc_id, b in media.items():
        n_frames = max((len(b) - 32) // 16 + 1, 1)
        energies = [sum(b[i * 16 : i * 16 + 32]) for i in range(n_frames)]
        tot = sum(energies)
        flags = [1 if e * n_frames > tot else 0 for e in energies]
        segs = sum(
            1 for i, f in enumerate(flags) if f and (i == 0 or not flags[i - 1])
        )
        r = got[doc_id]
        assert (r.n_frames, r.n_speech, r.n_segments) == (
            n_frames, sum(flags), segs,
        ), doc_id


def test_edit_distance_matches_python_dp(spark, sf_dir):
    """Spot-check 30 rows against a from-scratch Python Wagner-Fischer."""
    rows = SPECS["f_edit_distance"].builder(spark, sf_dir).collect()[:30]
    import duckdb

    names = dict(
        duckdb.sql(
            f"SELECT p_partkey, [p_name, p_type] FROM '{sf_dir}/part.parquet'"
        ).fetchall()
    )

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    for r in rows:
        a, b = names[r.p_partkey]
        assert r.edit_dist == lev(a, b)
        assert r.max_len == max(len(a), len(b))


def test_macd_crossover_flag_consistent(spark, sf_dir):
    """bullish must equal macd > signal row-for-row, and histogram must
    equal their difference exactly (same-bits arithmetic)."""
    rows = SPECS["ts_macd"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.bullish == (1 if r.macd > r.signal else 0)
        assert r.histogram == r.macd - r.signal


def test_theil_zero_for_uniform_and_nonnegative(spark, sf_dir):
    """Theil T >= 0 up to quantization (each term floors by < 1e-6), and
    recompute one nation from raw data in Python."""
    import math
    from collections import defaultdict

    import duckdb

    rows = SPECS["agg_theil"].builder(spark, sf_dir).collect()
    for r in rows:
        # floor-quantized terms can undershoot by < 1e-6 each
        assert r.theil_t >= -1e-6 * 2
    rev = duckdb.sql(
        f"""SELECT s.s_nationkey, l.l_suppkey,
               SUM(CAST(floor(l.l_extendedprice * 100.0) AS BIGINT)) AS x
            FROM '{sf_dir}/lineitem.parquet' l
            JOIN '{sf_dir}/supplier.parquet' s ON s.s_suppkey = l.l_suppkey
            GROUP BY 1, 2"""
    ).fetchall()
    by_nation = defaultdict(list)
    for nk, _, x in rev:
        by_nation[nk].append(int(x))
    got = {r.nationkey: r for r in rows}
    for nk, xs in by_nation.items():
        n, tot = len(xs), sum(xs)
        mu = tot / n
        ref = (
            sum(math.floor((x / mu) * math.log(x / mu) * 1e6) for x in xs if x)
            / 1e6
            / n
        )
        assert got[nk].n_suppliers == n and got[nk].total_cents == tot
        assert abs(got[nk].theil_t - round(ref, 9)) <= 1e-9


def test_trimmed_mean_matches_sorted_python(spark, sf_dir):
    """The interval-intersection form must equal the naive sort-and-slice
    trimmed mean computed in Python."""
    from collections import defaultdict

    import duckdb

    rows = {r.l_returnflag: r for r in
            SPECS["agg_trimmed_mean"].builder(spark, sf_dir).collect()}
    data = duckdb.sql(
        f"SELECT l_returnflag, CAST(floor(l_quantity * 100.0) AS BIGINT) "
        f"FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    groups = defaultdict(list)
    for flag, v in data:
        groups[flag].append(int(v))
    for flag, vs in groups.items():
        vs.sort()
        k = len(vs) // 10
        kept = vs[k : len(vs) - k]
        r = rows[flag]
        assert r.n_rows == len(vs) and r.n_kept == len(kept)
        assert r.trimmed_mean_qty == round(sum(kept) / len(kept) / 100.0, 9)


def test_skipgram_counts_match_python_window_scan(spark, sf_dir):
    """Recompute the full co-occurrence table with a plain Python window
    scan and verify the operator's top-30 slice (count, then pair order)."""
    from collections import Counter

    import duckdb

    texts = duckdb.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet' WHERE text IS NOT NULL"
    ).fetchall()
    c = Counter()
    for (text,) in texts:
        toks = text.split(" ")
        for i, w in enumerate(toks):
            for off in (-2, -1, 1, 2):
                j = i + off
                if 0 <= j < len(toks):
                    c[(w, toks[j])] += 1
    eligible = [(n, p) for p, n in c.items() if n >= 5]
    ref = sorted(eligible, key=lambda t: (-t[0], t[1]))[:30]
    got = [
        (r.n_cooccur, (r.center, r.context))
        for r in SPECS["llm_skipgram_cooccur"].builder(spark, sf_dir).collect()
    ]
    assert got == ref


# --- round-8 batch 5 -----------------------------------------------------------


def test_cramers_v_bounded_and_consistent(spark, sf_dir):
    """V in [0, 1]; the closing sqrt must reproduce from the reported
    integer chi2_micro and n exactly (self-consistency of the row)."""
    import math

    rows = SPECS["agg_cramers_v"].builder(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert 0.0 <= r.cramers_v <= 1.0
    assert r.mindim >= 1
    expect = math.sqrt((r.chi2_micro / 1e6) / (r.n_rows * r.mindim))
    assert abs(r.cramers_v - expect) < 1e-9


def test_mutual_info_nonnegative_and_term_sum(spark, sf_dir):
    """MI >= 0 up to quantization (every cell floors by < 1e-6 nats), and
    every row must carry the same mi_micro_sum = sum of the cell terms."""
    rows = SPECS["agg_mutual_info"].builder(spark, sf_dir).collect()
    assert rows
    total = sum(r.term_micro for r in rows)
    for r in rows:
        assert r.mi_micro_sum == total
    assert total >= -len(rows)  # each floor undershoots by < 1 micro-nat
    assert rows[0].mutual_info_nats >= -1e-3


def test_cohens_d_recomputes_from_raw(spark, sf_dir):
    """Recompute d for one status group from the raw fixture in Python
    (exact centi-unit moments, pooled SD) and match to 1e-9."""
    import math

    import duckdb

    rows = {r.l_linestatus: r for r in SPECS["agg_cohens_d"].builder(spark, sf_dir).collect()}
    assert rows
    st, r = sorted(rows.items())[0]
    con = duckdb.connect()
    raw = con.execute(
        f"""SELECT l_returnflag, COUNT(*),
                   SUM(CAST(floor(l_quantity*100.0) AS BIGINT)),
                   SUM(CAST(floor(l_quantity*100.0) AS BIGINT)
                       * CAST(floor(l_quantity*100.0) AS BIGINT))
            FROM '{sf_dir}/lineitem.parquet'
            WHERE l_linestatus = ? AND l_returnflag IN ('R','N')
            GROUP BY 1""",
        [st],
    ).fetchall()
    m = {f: (n, s, ss) for f, n, s, ss in raw}
    (n1, s1, ss1), (n2, s2, ss2) = m["R"], m["N"]
    m1, m2 = s1 / n1, s2 / n2
    pooled = math.sqrt(((ss1 - s1 * s1 / n1) + (ss2 - s2 * s2 / n2)) / (n1 + n2 - 2))
    assert r.n1 == n1 and r.n2 == n2
    assert abs(r.cohens_d - round((m1 - m2) / pooled, 9)) < 1e-9


def test_vwap_between_unit_price_extrema(spark, sf_dir):
    """A weighted mean must sit inside the per-month unit-price envelope."""
    import duckdb

    rows = SPECS["ts_vwap"].builder(spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    env = {
        int(m): (lo, hi)
        for m, lo, hi in con.execute(
            f"""SELECT year(l_shipdate)*100 + month(l_shipdate),
                       MIN(l_extendedprice / l_quantity),
                       MAX(l_extendedprice / l_quantity)
                FROM '{sf_dir}/lineitem.parquet' GROUP BY 1"""
        ).fetchall()
    }
    for r in rows:
        lo, hi = env[r.ship_month]
        # centi-unit flooring perturbs by < 0.02 currency units
        assert lo - 0.05 <= r.vwap_unit_price <= hi + 0.05
        assert r.vol_centi > 0


def test_stochastic_k_bounded_and_pinned_at_extrema(spark, sf_dir):
    """%K in [0,1] when defined; a day equal to its envelope max must pin
    %K = 1, equal to the min must pin 0; n_win <= 14."""
    rows = SPECS["ts_stochastic"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_win <= 14
        if r.pct_k is not None:
            assert 0.0 <= r.pct_k <= 1.0
            if r.v_micro == r.env_hi:
                assert r.pct_k == 1.0
            if r.v_micro == r.env_lo:
                assert r.pct_k == 0.0


def test_burstiness_bounded(spark, sf_dir):
    """B in [-1, 1) by construction (sigma, mu >= 0, not both 0); the
    min-events filter must hold; sd/mean must reproduce B."""
    rows = SPECS["ts_burstiness"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_gaps >= 5
        if r.burstiness is not None:
            assert -1.0 <= r.burstiness < 1.0
            expect = (r.sd_gap_s - r.mean_gap_s) / (r.sd_gap_s + r.mean_gap_s)
            assert abs(r.burstiness - expect) < 1e-6


def test_richclub_monotone_club_size(spark, sf_dir):
    """Higher degree thresholds can only shrink the club, and phi is a
    density in [0, 1]; club_edges cannot exceed n_k*(n_k-1)."""
    rows = sorted(
        SPECS["graph_richclub"].builder(spark, sf_dir).collect(),
        key=lambda r: r.degree_threshold,
    )
    assert rows
    prev = None
    for r in rows:
        if prev is not None:
            assert r.club_size <= prev
        prev = r.club_size
        assert r.club_edges <= r.club_size * max(r.club_size - 1, 0)
        if r.phi is not None:
            assert 0.0 <= r.phi <= 1.0


def test_rank_delta_is_permutation_and_consistent(spark, sf_dir):
    """Within each month the ranks are exactly 1..n; places_gained must
    equal prev_rank - rnk wherever prev_rank exists."""
    from collections import defaultdict

    rows = SPECS["win_rank_delta"].builder(spark, sf_dir).collect()
    assert rows
    by_month = defaultdict(list)
    for r in rows:
        by_month[r.ship_month].append(r.rnk)
        if r.prev_rank is None:
            assert r.places_gained is None
        else:
            assert r.places_gained == r.prev_rank - r.rnk
    for month, ranks in by_month.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), month


def test_value_shape_masks_and_shares(spark, sf_dir):
    """Masks contain no raw letters/digits (only A/a/9 and punctuation),
    ranks run 1..5 max, shares are descending within a column."""
    import re as _re
    from collections import defaultdict

    rows = SPECS["dq_value_shape"].builder(spark, sf_dir).collect()
    assert rows
    by_col = defaultdict(list)
    for r in rows:
        assert not _re.search(r"[B-Zb-z0-8]", r.mask.replace("A", "").replace("a", "").replace("9", "")), r.mask
        assert 1 <= r.rnk <= 5
        assert 0.0 < r.share <= 1.0
        by_col[r.col].append((r.rnk, r.n_values))
    for col, pairs in by_col.items():
        pairs.sort()
        counts = [c for _, c in pairs]
        assert counts == sorted(counts, reverse=True), col


def test_cardinality_trend_lag_and_breach(spark, sf_dir):
    """prev_users must be the previous day's n_users in date order, and
    the breach flag must reproduce from integer arithmetic."""
    rows = sorted(SPECS["dq_cardinality_trend"].builder(spark, sf_dir).collect(), key=lambda r: r.day)
    assert rows
    prev = None
    for r in rows:
        assert r.prev_users == prev
        if prev is None:
            assert r.breach == 0
        else:
            expect = 1 if (r.n_users * 2 < prev or r.n_users > prev * 2) else 0
            assert r.breach == expect
        prev = r.n_users


def test_lsh_tune_s_curve_ordering(spark, sf_dir):
    """For 8 total hashes, more bands of fewer rows always detects more:
    p(8x1) >= p(4x2) >= p(2x4) for every pair, all probabilities in
    [0, 1], and p reproduces from the jaccard to 1e-6."""
    rows = SPECS["llm_lsh_tune"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.p_b2_r4 <= r.p_b4_r2 <= r.p_b8_r1 <= 1.0
        s = r.jaccard
        assert abs(r.p_b8_r1 - (1 - (1 - s) ** 8)) < 1e-6
        assert abs(r.p_b4_r2 - (1 - (1 - s**2) ** 4)) < 1e-6
        assert abs(r.p_b2_r4 - (1 - (1 - s**4) ** 2)) < 1e-6


def test_self_bleu_clip_bounds(spark, sf_dir):
    """Clipped count never exceeds the candidate's own bigram count, and
    an exact duplicate pair inside the panel must pin self_bleu2 = 1."""
    import duckdb

    rows = {r.doc_id: r for r in SPECS["llm_self_bleu"].builder(spark, sf_dir).collect()}
    assert rows
    for r in rows.values():
        assert 0 <= r.n_clipped <= r.n_bigrams
        assert 0.0 <= r.self_bleu2 <= 1.0
    con = duckdb.connect()
    dup_ids = [
        i
        for (i,) in con.execute(
            f"""SELECT doc_id FROM '{sf_dir}/documents.parquet'
                WHERE doc_id < 60 AND text IN (
                  SELECT text FROM '{sf_dir}/documents.parquet'
                  WHERE doc_id < 60 GROUP BY text HAVING COUNT(*) > 1)
                  AND length(string_split(text, ' ')) >= 2"""
        ).fetchall()
    ]
    for i in dup_ids:
        if i in rows:
            assert rows[i].self_bleu2 == 1.0, i


def test_bitrate_grid_bounds(spark, sf_dir):
    """Rates obey the 32/16 grid bounds: >= 6400 bps for payloads >= 48
    bytes, global max 18800 (the 47-byte single-frame case), and bucket
    keys reproduce from the mean."""
    rows = SPECS["mm_bitrate"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.kbps_bucket <= 18
        assert r.n_media > 0
        assert r.kbps_bucket * 1000 <= r.mean_rate_bps < (r.kbps_bucket + 1) * 1000


# --- round-8 batch 6 -----------------------------------------------------------


def test_strat_k_exact_count_per_stratum(spark, sf_dir):
    """Exactly min(k, stratum size) rows per stratum, ranks 1..n, and the
    selection is the true bottom-k of the md5 ordering."""
    from collections import defaultdict

    import duckdb

    rows = SPECS["sample_strat_k"].builder(spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    sizes = dict(
        con.execute(
            f"SELECT o_orderpriority, COUNT(*) FROM '{sf_dir}/orders.parquet' GROUP BY 1"
        ).fetchall()
    )
    by_stratum = defaultdict(list)
    for r in rows:
        by_stratum[r.o_orderpriority].append(r)
    assert set(by_stratum) == set(sizes)
    for strat, rs in by_stratum.items():
        assert len(rs) == min(200, sizes[strat])
        assert sorted(r.rk for r in rs) == list(range(1, len(rs) + 1))
        assert max(r.h for r in rs) <= min(
            h
            for (h,) in con.execute(
                f"""SELECT md5(CAST(o_orderkey AS VARCHAR)) FROM '{sf_dir}/orders.parquet'
                    WHERE o_orderpriority = ? ORDER BY 1 DESC LIMIT 1""",
                [strat],
            ).fetchall()
        )


def test_volatility_nonnegative_and_warmup(spark, sf_dir):
    """SD >= 0 when defined, NULL until two returns exist, and n_ret never
    exceeds the 7-row frame."""
    rows = SPECS["ts_volatility"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_ret <= 7
        if r.n_ret < 2:
            assert r.vol_7d is None
        elif r.vol_7d is not None:
            assert r.vol_7d >= 0.0


def test_outages_durations_consistent(spark, sf_dir):
    """duration_s must be the truncated second gap between start and end,
    strictly above the threshold, with start < end."""
    rows = SPECS["ts_outages"].builder(spark, sf_dir).collect()
    for r in rows:
        assert r.outage_start < r.outage_end
        assert r.duration_s > 3600
        micros = (r.outage_end - r.outage_start).total_seconds()
        assert abs(r.duration_s - int(micros)) <= 1


def test_langid_eval_matches_lang_id_rows(spark, sf_dir):
    """The confusion matrix must be the exact groupBy of llm_lang_id's
    per-document output (one source of truth), and accuracy must equal
    the diagonal mass over the total."""
    from collections import Counter

    per_doc = SPECS["llm_lang_id"].builder(spark, sf_dir).collect()
    conf = Counter((r.labeled_lang, r.predicted_lang) for r in per_doc)
    rows = SPECS["llm_langid_eval"].builder(spark, sf_dir).collect()
    assert {(r.labeled_lang, r.predicted_lang): r.n for r in rows} == dict(conf)
    total = sum(conf.values())
    correct = sum(n for (a, b), n in conf.items() if a == b)
    assert abs(rows[0].overall_accuracy - round(correct / total, 9)) < 1e-9


def test_minhash_est_err_consistency(spark, sf_dir):
    """est = matches/8 exactly, error = est - exact, and the estimator is
    not degenerate (some pair has a nonzero estimate at this SF)."""
    rows = SPECS["llm_minhash_est_err"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.sig_matches <= 8
        assert abs(r.jaccard_est - round(r.sig_matches / 8.0, 9)) < 1e-9
        assert abs(r.est_error - round(r.jaccard_est - r.jaccard_exact, 9)) < 2e-9
    assert any(r.sig_matches > 0 for r in rows)


def test_time_bucket_alignment(spark, sf_dir):
    """Bucket starts are aligned multiples of the width, contain their
    event, and offset reproduces the remainder."""
    rows = SPECS["f_time_bucket"].builder(spark, sf_dir).limit(500).collect()
    assert rows
    for r in rows:
        for bucket, width_s in ((r.bucket_5m, 300), (r.bucket_6h, 21600)):
            assert bucket <= r.ts
            assert (r.ts - bucket).total_seconds() < width_s
            assert (bucket.minute * 60 + bucket.second) % width_s in (
                0,
                (bucket.hour * 3600 + bucket.minute * 60 + bucket.second) % width_s * 0,
            )
        assert 0 <= r.offset_in_5m_us < 300 * 1_000_000


def test_label_balance_shares_sum_to_one(spark, sf_dir):
    """Shares sum to 1 (up to ROUND), exactly one class has vs_majority
    = 1, Gini-Simpson in [0, 1 - 1/k], starved flag reproduces."""
    rows = SPECS["dq_label_balance"].builder(spark, sf_dir).collect()
    assert rows
    k = rows[0].n_classes
    assert len(rows) == k
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-6
    assert sum(1 for r in rows if r.vs_majority == 1.0) >= 1
    n_tot = sum(r.n for r in rows)
    for r in rows:
        assert 0.0 <= r.gini_simpson <= 1.0 - 1.0 / k + 1e-9
        assert r.starved == (1 if r.n * 10 * k < n_tot else 0)


# --- round-8 batch 7 -----------------------------------------------------------


def test_topn_other_threshold_and_mass(spark, sf_dir):
    """Every named category holds >= 2% of rows; OTHER (if present) merges
    the rest; total mass is the table row count; shares sum to 1."""
    import duckdb

    rows = SPECS["agg_topn_other"].builder(spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    (n_tot,) = con.execute(
        f"SELECT COUNT(*) FROM '{sf_dir}/part.parquet'"
    ).fetchone()
    assert sum(r.n for r in rows) == n_tot
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-6
    for r in rows:
        if r.category != "OTHER":
            assert r.n_merged == 1
            assert r.n * 50 >= n_tot
        else:
            assert r.n_merged >= 1


def test_source_overlap_bounds_and_symmetry_grain(spark, sf_dir):
    """Overlap coefficient in (0, 1]; n_common <= min(n_a, n_b); exactly
    one row per unordered source pair that shares at least one gram."""
    rows = SPECS["llm_source_overlap"].builder(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.source_a < r.source_b
        assert (r.source_a, r.source_b) not in seen
        seen.add((r.source_a, r.source_b))
        assert 0 < r.n_common <= min(r.n_a, r.n_b)
        assert 0.0 < r.overlap_coef <= 1.0


def test_forecast_eval_recomputes_wape(spark, sf_dir):
    """WAPE must reproduce from the daily series in Python (lag-7 naive
    forecast on the same micro-quantized values), and sMAPE sits in
    [0, 2] by construction."""
    from collections import defaultdict

    import duckdb

    rows = {r.event_type: r for r in SPECS["ts_forecast_eval"].builder(spark, sf_dir).collect()}
    assert rows
    con = duckdb.connect()
    daily = con.execute(
        f"""SELECT event_type, CAST(ts AS DATE),
                   CAST(floor(SUM(CAST(value AS DECIMAL(18,9))) * 1000000) AS BIGINT)
            FROM '{sf_dir}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    series = defaultdict(list)
    for et, _, vm in daily:
        series[et].append(vm)
    for et, r in rows.items():
        vs = series[et]
        errs = [(abs(vs[i] - vs[i - 7]), abs(vs[i])) for i in range(7, len(vs))]
        assert r.n_scored == len(errs)
        assert r.sum_abs_err == sum(e for e, _ in errs)
        assert r.sum_abs_actual == sum(a for _, a in errs)
        if r.wape is not None:
            assert abs(r.wape - round(r.sum_abs_err / r.sum_abs_actual, 9)) < 1e-9
        if r.smape is not None:
            assert 0.0 <= r.smape <= 2.0


def test_spearman_distributed_ranks_equal_single_window(spark, sf_dir):
    """agg_spearman's two-level range-partitioned rank prefix (VERDICT r8
    item 5) must reproduce the single-window tie-aware ranks exactly, for
    BOTH variables — pinned against range-boundary / partition-id
    regressions (the round-9 find: unpinned rid assignments re-sample
    range boundaries per execution and mis-rank ~75%% of keys)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from air_quality_data_pipeline_spark.operators.aggregates import _spearman_ranks

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.col("l_extendedprice").alias("price"),
    )
    cells = li.groupBy("flag", "qty", "price").agg(F.count(F.lit(1)).alias("cnt"))
    cum = Window.partitionBy("flag").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    for key, alias in (("qty", "rx"), ("price", "ry")):
        got = {
            (r.flag, r[key]): r[alias]
            for r in _spearman_ranks(cells, key, alias).collect()
        }
        vc = cells.groupBy("flag", key).agg(F.sum("cnt").cast("bigint").alias("c"))
        ref = {
            (r.flag, r[key]): r[alias]
            for r in vc.select(
                "flag",
                key,
                (2 * F.sum("c").over(cum.orderBy(key)) - F.col("c") + 1).alias(alias),
            ).collect()
        }
        assert got == ref, f"{key}: distributed ranks diverge from single-window"
        # tie-aware rank-sum invariant: sum(c * 2r) == n(n+1) per flag
        tot: dict[str, int] = {}
        nn: dict[str, int] = {}
        for r in vc.collect():
            tot[r.flag] = tot.get(r.flag, 0) + r.c * got[(r.flag, r[key])]
            nn[r.flag] = nn.get(r.flag, 0) + r.c
        for f, n in nn.items():
            assert tot[f] == n * (n + 1), (key, f, tot[f], n * (n + 1))
