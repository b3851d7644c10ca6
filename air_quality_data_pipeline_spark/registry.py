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
# Round-8 window, in need-order (VERDICT r7 item 1: "rotate the ENTIRE
# DEFERRED_FIRST_ROW set into the round-8 window"):
# (a) the 42 queries with NO driver row — every DEFERRED_FIRST_ROW name,
#     in the deferral-set listing order (session-2 pairs, then session-3
#     batches A–H, then session-4 batches I–K). Two of them (mm_scene_cut
#     byte-length contract, ts_decay_score libm-free weight — both ADVICE
#     r7 fixes) also changed this round, so their first rows double as
#     changed-code re-samples.
# (b) queries whose CODE or ORACLE changed this round and already have a
#     green row: none so far (round-8 advice fixes all landed inside the
#     deferred set). New round-8 operators insert HERE, each displacing
#     one (c) filler — at most 8 new operators this round keeps the
#     window whole with zero new deferral debt.
# (c) filler: stalest greens (last driver sample round 1), module order —
#     8 ride this round's window (slots 43-50).
# (d) remaining round-1 greens, kept for ordering the registry tail and
#     as the next filler pool.
DRIVER_PRIORITY = [
    # (a) the 42 never-sampled first rows (== DEFERRED_FIRST_ROW)
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
    # (b) new round-8 operators (each displaced one (c) filler; all 8
    # slots now used — agg_spearman takes the last one, so the window is
    # exactly blocks (a) + (b) and no filler rides this round)
    "llm_simhash_neardup",
    "graph_label_prop",
    "dq_chi2",
    "llm_emb_covariance",
    "ts_holt",
    "graph_cc_shuffle",
    "llm_cross_dedup",
    "agg_spearman",
    # (c) filler: stalest greens (last sampled r1), module order
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

# Round 8 rotates ALL 42 never-sampled queries into the window (slots
# 1-42, VERDICT r7 item 1), emptying the 42-name round-7 deferral set.
# New operators registered this round must go into block (b) of
# DRIVER_PRIORITY in the same commit — the round-6 lesson: a @register
# without window accounting ships a red suite. The 8 filler slots all
# went to new round-8 operators; the 9 batch-2 operators below exceed
# the window and are DEFERRED to the round-9 window front — each is
# four-SF oracle-green locally (tests/test_oracle.py replays them every
# run), so the deferral postpones only the driver row, not verification.
#
# st_approx_distinct is rows-only by design (HLL++ registers aren't
# DuckDB-reproducible; value anchor = within-5%-of-exact property test)
# and is exempt per the rows-only rule.
# Round-9 window planning note: besides the deferral set below, win_ntile's
# CODE changed late in round 8 (the distributed two-level position scan
# replaced the single-partition ntile window; same oracle, green driver
# rows r06 predate the change) — rotate it into the round-9 window as a
# changed-code re-sample. Round-9 window budget = len(DEFERRED_FIRST_ROW)
# first rows + that 1 re-sample; derive counts with len() when planning,
# not from comment literals (the round-7 off-by-one lesson).
DEFERRED_FIRST_ROW: set[str] = {
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
    # round-8 batch 4 (ordinal association, PSI drift, key continuity,
    # hopping windows, calendar seasonality, bounded centrality, PA links)
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
    # round-8 batch 5 (association effect sizes, oscillator/burstiness
    # series, rich-club, rank movement, mask profiling, cardinality
    # audit, LSH tuning, self-BLEU, bitrate)
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
    # round-8 batch 6 (sampling, volatility/outage series, classifier
    # eval, estimator audit, time bucketing, label balance)
    "sample_strat_k",
    "ts_volatility",
    "ts_outages",
    "llm_langid_eval",
    "llm_minhash_est_err",
    "f_time_bucket",
    "dq_label_balance",
    # round-8 batch 7 (rare-category collapse, source overlap, forecast
    # scoring) — these three bring the round-9 window to exactly 50:
    # len(DEFERRED_FIRST_ROW)=49 first rows + the win_ntile changed-code
    # re-sample. Round 8 adds NO further operators past this point.
    "agg_topn_other",
    "llm_source_overlap",
    "ts_forecast_eval",
}


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (idempotent) and return the registry,
    reordered so DRIVER_PRIORITY names come first (see comment above)."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    prioritized = [n for n in DRIVER_PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(prioritized)]
    return {n: QUERIES[n] for n in [*prioritized, *rest]}
