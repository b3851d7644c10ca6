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
# Round-9 window, in need-order (VERDICT r8 item 1: "drive the staged
# round-9 window green"):
# (a) the 50 queries with NO driver row — the ENTIRE round-8
#     DEFERRED_FIRST_ROW set, in the deferral-set listing order (round-8
#     batches 2-7). len() of that set is 50, not the 49 the round-8
#     planning comment claimed (the off-by-one lesson again — counts were
#     re-derived with len() this round), so these fill the window EXACTLY
#     and the win_ntile changed-code re-sample is bumped to the round-10
#     window front (it is property-pinned equal to the old form and
#     four-SF oracle-green in every local test run; only the driver row
#     is postponed).
# (b) queries whose CODE or ORACLE changed this round and already have a
#     green row: none can ride (window full) — any such change this round
#     goes into ROUND10_RESAMPLE below in the same commit.
# (c) no filler this round (window full with first rows).
# (d) round-8 window greens + round-1 greens keep ordering the tail.
DRIVER_PRIORITY = [
    # (a) the 50 never-sampled first rows (== round-8 DEFERRED_FIRST_ROW)
    # round-8 batch 2 (stats/ts/graph/llm/mm breadth), in add order
    "agg_mannwhitney",
    "agg_anova",
    "ts_bollinger",
    "ts_rsi",
    "graph_assortativity",
    "llm_emb_outliers",
    "llm_prefix_dedup",
    "mm_aspect_bucket",
    "sample_bottomk",
    # round-8 batch 3
    "ts_leadlag",
    "llm_rater_kappa",
    # round-8 batch 4
    "agg_kendall_tau",
    "dq_psi",
    "dq_sequence_gaps",
    "win_hopping",
    "ts_calendar_profile",
    "graph_harmonic",
    "graph_pref_attach",
    "llm_lexical_diversity",
    "llm_term_lift",
    "llm_chrf",
    "mm_audio_vad",
    "f_edit_distance",
    "ts_macd",
    "agg_theil",
    "agg_trimmed_mean",
    "llm_skipgram_cooccur",
    # round-8 batch 5
    "agg_cramers_v",
    "agg_mutual_info",
    "agg_cohens_d",
    "ts_vwap",
    "ts_stochastic",
    "ts_burstiness",
    "graph_richclub",
    "win_rank_delta",
    "dq_value_shape",
    "dq_cardinality_trend",
    "llm_lsh_tune",
    "llm_self_bleu",
    "mm_bitrate",
    # round-8 batch 6
    "sample_strat_k",
    "ts_volatility",
    "ts_outages",
    "llm_langid_eval",
    "llm_minhash_est_err",
    "f_time_bucket",
    "dq_label_balance",
    # round-8 batch 7
    "agg_topn_other",
    "llm_source_overlap",
    "ts_forecast_eval",
    # ---- 50-slot fold: names below only order the registry tail ----
    # (d) round-8 window greens (sampled r08), window order
    "llm_char_entropy",
    "llm_dataset_interleave",
    "dq_volume_anomaly",
    "llm_winsorize",
    "llm_markup_strip",
    "llm_url_extract",
    "llm_char_bigram_entropy",
    "ts_changepoint",
    "ts_drawdown",
    "graph_reciprocity",
    "agg_concentration",
    "dq_join_skew",
    "llm_token_budget",
    "ts_peak_detect",
    "f_codec",
    "llm_template_detect",
    "llm_blocklist_filter",
    "graph_modularity",
    "llm_url_canonicalize",
    "mm_patch_grid",
    "graph_clustering_coef",
    "f_geo_bearing",
    "agg_wilson_ci",
    "llm_pad_waste",
    "agg_bloom_filter",
    "win_skyline",
    "ts_markov_transitions",
    "dq_funcdep",
    "llm_readability",
    "graph_hits",
    "agg_ttest",
    "llm_jsd_drift",
    "graph_degree_dist",
    "st_topk",
    "mm_phash",
    "dq_temporal",
    "ts_interarrival",
    "mm_scene_cut",
    "llm_bleu",
    "agg_geomean",
    "ts_cov_matrix",
    "ts_decay_score",
    "llm_simhash_neardup",
    "graph_label_prop",
    "dq_chi2",
    "llm_emb_covariance",
    "ts_holt",
    "graph_cc_shuffle",
    "llm_cross_dedup",
    "agg_spearman",
    # round-1 greens (stale filler pool), module order
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

# Round 9 rotates ALL 50 never-sampled oracle-checked queries into the
# window (slots 1-50, VERDICT r8 item 1), emptying the round-8 deferral
# set. New operators registered this round must be added to
# DEFERRED_FIRST_ROW in the same commit — the round-6 lesson: a @register
# without window accounting ships a red suite. Per VERDICT r8 item 3 the
# growth cap is what the round-10 window can clear: 50 slots minus
# len(ROUND10_RESAMPLE) minus the st_approx_distinct rows-only slot.
#
# st_approx_distinct is rows-only by design (HLL++ registers aren't
# DuckDB-reproducible; value anchor = within-5%-of-exact property test).
# VERDICT r8 item 2: it must get an explicit rows-only driver row the way
# llm_minhash_lsh/agg_sketch_union did in r5 — it is first in line for a
# round-10 window slot (tracked in ROUND10_RESAMPLE below).
DEFERRED_FIRST_ROW: set[str] = {
    # round-9 additions (batches 1-2): the round-9 window was already full
    # with the 50 round-8 first rows when these landed, so they are owed
    # round-10 slots. Budget check: test_next_window_budget_not_exceeded.
    "agg_levene",
    "agg_jackknife_ratio",
    "agg_bayes_shrink",
    "agg_circular_mean",
    "agg_chao1",
    "agg_bootstrap_ci",
    "ts_sax",
    "ts_lag_features",
    "ts_crossover",
    "graph_bipartite_project",
    "graph_triad_census",
    "dq_simpson",
    "dq_dup_burden",
    "llm_code_detect",
    "llm_script_mix",
    "llm_boilerplate_lines",
    "llm_knn_graph",
    "llm_label_medoid",
    "win_reset_cumsum",
    "f_hash_rng",
    "ts_hurst",
    "graph_eigencentrality",
    "agg_tail_contrib",
    "dq_heaping",
    "dq_null_correlation",
    "mm_modality_balance",
    "ts_pacf",
    "llm_fleiss_kappa",
    "llm_curriculum_phase",
}

# Names owed a round-10 window slot that are NOT first rows: changed-code
# re-samples and the deliberate rows-only slot. Kept as code (not a
# comment) so the accounting tests can enforce the round-10 budget.
ROUND10_RESAMPLE: set[str] = {
    # rows-only by design; never driver-sampled (VERDICT r8 item 2)
    "st_approx_distinct",
    # CODE changed late in round 8 (distributed two-level position scan
    # replaced the single-partition ntile window; same oracle, green
    # driver rows r06 predate the change); bumped from the round-9 window
    # because the 50 first rows fill it exactly
    "win_ntile",
    # CODE changed round 9 (VERDICT r8 item 4: hash-inside-Filter 2x
    # constants removed — non-nullable salt/digest projections,
    # inline_outer; llm_incr_dedup's oracle gained the matching COALESCE)
    "join_salted",
    "llm_incr_dedup",
    "llm_cdc_chunk",
    # CODE changed round 9 (VERDICT r8 item 5 + the rid-determinism find:
    # agg_spearman's value-grain prefix is now the distributed two-level
    # scan, and all three rid-based operators persist their range-exchange
    # rid assignment so fan-out consumers can't see re-sampled boundaries)
    "agg_spearman",
    "win_skyline",
    # CODE+ORACLE changed round 9 (hostile-panel find: Spark's
    # double->bigint cast truncates while DuckDB's rounds — bare
    # l_quantity casts became explicit floor() in both engines; identity
    # on the integral quantities real data carries). agg_mannwhitney got
    # the same fix but rides the round-9 window itself.
    "agg_skew_kurt",
    "agg_weighted_median",
}


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (idempotent) and return the registry,
    reordered so DRIVER_PRIORITY names come first (see comment above)."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    prioritized = [n for n in DRIVER_PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(prioritized)]
    return {n: QUERIES[n] for n in [*prioritized, *rest]}
