"""Adversarial-fixture oracle replay (SURVEY.md §5 hardening).

The driver's synthetic documents are uniform word soup: never NULL, never
empty, never unicode, never containing markup or regex metacharacters. Any
cross-engine divergence on those classes (NULL-propagation differences,
code-point vs byte length, regex dialect corners) would ship invisibly.

This module rebuilds the documents table from a hostile row set — NULL
text, empty string, whitespace-only, NFC vs NFD unicode, emoji + CJK,
genuine markdown (so synthesized markup NESTS), regex metacharacters, a
very long document — alongside the untouched sf0.001 companions, and
replays a panel of document-path operators through the exact driver
comparator (oracle.check_query). An operator is allowed to DEFINE any
semantics for these rows, but both engines must agree on it.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from air_quality_data_pipeline_spark.oracle import TABLE_NAMES, check_query
from air_quality_data_pipeline_spark.registry import load_all_queries

SPECS = load_all_queries()

_ADV_TEXTS = [
    None,                                   # NULL text
    "",                                     # empty
    "x",                                    # single char (no bigrams)
    "   ",                                  # whitespace only
    "café münü nfc",         # NFC-composed accents
    "café münü nfd",      # NFD-decomposed same letters
    "你好\U0001f30d world mix",     # CJK + astral-plane emoji
    "word " * 2000 + "tail",                # very long document
    "a\nb\tc\r\nd",                         # embedded control whitespace
    "# real header\n**already bold** [pre](http://pre.example/x) body",
    "a*b[c](d)\\e ^$.|?+ literal metachars",
    "plain control document for baseline behavior",
    # Multibyte doc whose char count and byte count land in DIFFERENT
    # div-100 frame buckets even after the greatest(.,1) floor (ADVICE
    # r7): 70 three-byte CJK chars = 70 chars / 210 bytes, so a
    # char-counting engine computes greatest(70//100,1)=1 frame while the
    # byte-counting contract yields 210//100=2 frames. Exercises the
    # mm_scene_cut / mm_frame_sample char-vs-byte boundary.
    "漢" * 70,
]


@pytest.fixture(scope="module")
def adv_dir(spark):
    """Fixture dir: hostile documents.parquet + sf0.001 companions."""
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = "/tmp/adv_fixture"
    os.makedirs(dst, exist_ok=True)
    for name in TABLE_NAMES:
        if name == "documents":
            continue
        # unconditional copy: the driver can regenerate sf0.001 between
        # rounds, and a stale cached companion would silently skew replays
        shutil.copyfile(
            os.path.join(src, f"{name}.parquet"),
            os.path.join(dst, f"{name}.parquet"),
        )
    rows = {
        "doc_id": list(range(len(_ADV_TEXTS))),
        "text": _ADV_TEXTS,
        "lang": [["en", "de", "zh"][i % 3] for i in range(len(_ADV_TEXTS))],
        "source": [f"adv{i % 4}" for i in range(len(_ADV_TEXTS))],
        "n_chars": [len(t) if t is not None else None for t in _ADV_TEXTS],
    }
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    pq.write_table(pa.table(rows, schema=schema), os.path.join(dst, "documents.parquet"))
    return dst


# Document-path operators whose semantics the hostile rows can reach.
# Exclusions are deliberate and documented:
# - llm_winsorize / llm_token_budget aggregate n_chars only (NULL rows
#   drop identically) — covered by the normal oracle; nothing text-shaped
#   to attack.
# - similarity/embedding ops never read documents.text.
ADV_PANEL = [
    "llm_markup_strip",      # synthesized markup NESTS with real markdown
    "llm_url_extract",       # pre-existing URL in text joins the synthesized ones
    "llm_char_bigram_entropy",
    "f_codec",               # unicode → byte-level base64/hex
    "f_checksum",
    "llm_exact_dedup",
    "llm_text_stats",
    "llm_token_count",
    "llm_lang_id",
    "llm_quality_score",
    "llm_fingerprint",
    "llm_line_dedup",
    "llm_sentence_split",
    "llm_char_entropy",
    "llm_text_normalize",    # NFC vs NFD is this operator's whole job
    "llm_sft_format",
    "llm_doc_chunk",
    "llm_dataset_diff",
    # session-4 document-path operators:
    "llm_readability",   # greatest(1, NULL-count) floors; NULL-flesch rows drop identically
    "llm_jsd_drift",     # NULL text tokenizes to no rows in both engines
    "llm_bleu",          # NULL-text reference vanishes from the panel identically
    "mm_phash",          # NULL payload => phash 0 (defined, matching the oracle CASE)
    "mm_scene_cut",      # greatest(NULL, 1) => 1 frame in both engines
    # round-8 document-path operators:
    "llm_simhash_neardup",  # NULL/empty docs produce no token votes identically
    "llm_cross_dedup",      # NULL/empty eval twins vanish identically
    "llm_minhash_dedup",    # shingle-less docs excluded (NULL-sig buckets)
    "llm_dedup_audit",      # same exclusion in the exact-truth panel
    "dq_chi2",              # NULL-text rows still carry (lang, source) cells
    # round-8 batch-2 document-path operators:
    "llm_prefix_dedup",     # NULL/short docs excluded by the >= 8-token guard
    "mm_aspect_bucket",     # md5(unicode text): utf-8 byte hashing must agree
    # round-8 batch-4 document-path operators:
    "llm_lexical_diversity",  # NULL/empty excluded; single-token docs pin NULL simpson
    "llm_term_lift",          # unicode terms through the exact truncating rank key
    "llm_chrf",               # multibyte char bigrams: length() units must agree
    "mm_audio_vad",           # NULL payload excluded identically (mm_phash lesson)
    "llm_skipgram_cooccur",   # unicode tokens through the (doc, pos) equi-join
    # round-8 batch-5 document-path operators:
    "llm_lsh_tune",           # hostile panel pairs through the S-curve algebra
    "llm_self_bleu",          # NULL/1-token docs drop (no bigrams) identically
    "mm_bitrate",             # NULL payload => NULL length row drops from the grid
    # round-8 batch-6 document-path operators:
    "llm_langid_eval",        # NULL text scores 0 on every profile -> tiebreak row
    "llm_minhash_est_err",    # shingle-less hostile docs excluded identically
    # round-8 batch-7 document-path operators:
    "llm_source_overlap",     # NULL/1-token docs add no bigrams identically
    # round-9 document-path operators:
    "llm_code_detect",        # markup/unicode rows carry real symbol density;
                              # the 0.02 gate must flip identically
    "llm_script_mix",         # hostile unicode/emoji rows exercise every
                              # char class for real (not just the planting)
    "llm_boilerplate_lines",  # NULL/short docs chunk to nothing identically
    "dq_dup_burden",          # hostile EXACT-duplicate rows join the planted
                              # replay through the digest cells
    "agg_chao1",              # NULL text adds no words; unicode words count
                              # once per source identically
    "llm_fleiss_kappa",       # NULL text drops from all three gates at once
    "llm_curriculum_phase",   # single-token/NULL docs mass at the low tertile
    # round-10 document-path operators:
    "llm_dp_count",           # counts include NULL-text docs; the hash noise
                              # depends only on the source key
    "llm_epoch_plan",         # NULL text drops identically; whitespace-only
                              # docs still carry tokens into avail/weight
    # round-10 batch-2 document-path operators:
    "llm_ece",                # NULL text filtered identically; empty/CJK docs
                              # land in bin 0 via exact integer division
    "llm_filter_funnel",      # hostile docs exercise every gate boundary
                              # (length band, ttr, stopword absence)
    "llm_rrf_fusion",         # the lexical list re-ranks under hostile docs;
                              # tie-break on doc_id must agree cross-engine
]


@pytest.mark.parametrize("name", ADV_PANEL)
def test_adversarial_oracle_match(spark, adv_dir, name):
    spec = SPECS[name]
    assert spec.oracle is not None
    problems = check_query(spec.builder(spark, adv_dir), spec.oracle, adv_dir)
    assert not problems, f"{name} diverges on hostile rows: {problems[:3]}"


# --- adversarial events: timestamp collisions --------------------------------

# Real event streams have timestamp ties (batched ingestion, clock
# granularity); the synthetic fixtures' microsecond-random ts almost never
# collide, so a window ordered by ts WITHOUT a deterministic tie-break
# looks green at every shipped SF while being engine-dependent (and
# run-dependent) on real data. This fixture forces the worst case — one
# user whose events ALL share a timestamp, one with pairwise duplicates —
# plus value edge cases (exact zeros, negatives), and replays the
# time-series / window panel through the driver comparator.

_TS_BASE = 1704067200_000_000  # 2024-01-01 00:00:00 UTC in epoch-µs


def _adv_events_rows():
    rows = []
    eid = 0
    types = ["view", "click", "purchase", "signup", "error"]
    # user 1: 40 events, ALL at the same microsecond, across types/values
    for i in range(40):
        rows.append((eid, _TS_BASE + 3_600_000_000, 1, types[i % 5],
                     float(i % 7) - 2.0, '{"k": %d}' % i))
        eid += 1
    # user 2: pairwise-duplicate timestamps over 16 days (daily cells stay
    # non-degenerate for changepoint/peak/volume ops; 16 days so the
    # 7-day bollinger and 14-delta RSI windows actually fill — with
    # negative and zero daily sums in the early days)
    for d in range(16):
        for j in range(10):
            ts = _TS_BASE + d * 86_400_000_000 + (j // 2) * 1_000_000
            rows.append((eid, ts, 2, types[j % 5], 0.0 if j == 0 else j * 1.5,
                         '{"k": %d}' % j))
            eid += 1
    # user 3: clean strictly-increasing control series over 6 days
    for d in range(6):
        for j in range(8):
            ts = _TS_BASE + d * 86_400_000_000 + j * 7_000_000 + 13
            rows.append((eid, ts, 3, types[(d + j) % 5], d + j * 0.25,
                         '{"k": %d}' % (d * 10 + j)))
            eid += 1
    # user 4: a single event (windows of size 1)
    rows.append((eid, _TS_BASE + 5_000_000, 4, "view", 42.0, "{}"))
    return rows


@pytest.fixture(scope="module")
def adv_events_dir(spark):
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = "/tmp/adv_events_fixture"
    os.makedirs(dst, exist_ok=True)
    for name in TABLE_NAMES:
        if name == "events":
            continue
        # unconditional copy: the driver can regenerate sf0.001 between
        # rounds, and a stale cached companion would silently skew replays
        shutil.copyfile(
            os.path.join(src, f"{name}.parquet"),
            os.path.join(dst, f"{name}.parquet"),
        )
    rows = _adv_events_rows()
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {
                "event_id": list(cols[0]),
                "ts": list(cols[1]),
                "user_id": list(cols[2]),
                "event_type": list(cols[3]),
                "value": list(cols[4]),
                "props": list(cols[5]),
            },
            schema=schema,
        ),
        os.path.join(dst, "events.parquet"),
    )
    return dst


# Every oracle-checked operator that orders or aggregates the events
# stream. A tie in ts must not make the result engine-dependent.
ADV_EVENTS_PANEL = [
    "ts_gapfill",
    "ts_ohlc",
    "ts_rolling",
    "ts_seasonal",
    "ts_concurrency",
    "ts_ewma",
    "ts_cusum",
    "ts_mad_outliers",
    "ts_interval_merge",
    "ts_trend_slope",
    "ts_downsample",
    "ts_autocorr",
    "ts_sliding_corr",
    "ts_period_over_period",
    "ts_forecast_baseline",
    "ts_twa",
    "ts_theilsen",
    "ts_changepoint",
    "ts_drawdown",
    "ts_peak_detect",
    "win_rank",
    "win_latest",
    "win_frame",
    "win_offsets",
    "win_distribution",
    "win_sessionize",
    "win_funnel",
    "win_ntile",
    "win_median_smooth",
    "win_streaks",
    "win_share",
    "win_pct_rank",
    "win_running_extrema",
    "win_cumulative_distinct",
    "win_attribution",
    "win_gaps_islands",
    "win_retention",
    "agg_entropy",
    "dq_volume_anomaly",
    "graph_reciprocity",
    # session-4 events-path operators:
    "ts_markov_transitions",  # lag tie-break on (ts, event_id)
    "ts_interarrival",        # all-tied user => zero gaps, identically
    "ts_cov_matrix",          # degenerate day cells, zero/negative values
    "agg_ttest",              # zero-variance groups => Inf/NaN must agree
    "st_topk",                # leaderboard ties broken by type, not arrival
    "ts_decay_score",         # zero/negative values; raw_sum 0 => Inf must agree
    "ts_holt",                # shift recursion on negative daily sums (floor both engines)
    # round-8 batch-2 events-path operators:
    "ts_bollinger",           # negative/zero daily sums through the integer breach gate
    "ts_rsi",                 # all-loss windows (sg = 0) and the 50.0 flat convention
    "agg_anova",              # truncation-div means on NEGATIVE group sums must agree
    # round-8 batch-4 events-path operators:
    "win_hopping",            # collided timestamps: same 4 windows, count-only semantics
    "ts_calendar_profile",    # ISO dow numbering under tied timestamps
    "dq_psi",                 # negative micro-values through the integer bin edges
    "ts_macd",                # short/negative series: partial-window adaptive chains
    # round-8 batch-5 events-path operators:
    "agg_mutual_info",        # degenerate margins (one dow dominates) through ln terms
    "ts_stochastic",          # size-1 and flat envelopes pin NULL %K identically
    "ts_burstiness",          # all-tied user: zero gaps => 0/0 pins NULL (not Inf)
    "dq_cardinality_trend",   # halve/double breach on tiny integer day counts
    # round-8 batch-6 events-path operators:
    "ts_volatility",          # negative daily sums pin NULL returns (no ln(<=0))
    "ts_outages",             # all-tied user contributes zero gaps; 16-day spans gap
    "f_time_bucket",          # collided timestamps bucket identically (pure arithmetic)
    # round-8 batch-7 events-path operators:
    "ts_forecast_eval",       # zero/negative daily sums through |err| sums and
                              # the zero-denominator sMAPE NULL pin
    # round-9 events-path operators:
    "agg_levene",             # collided/negative value cells through the
                              # half-cent median order stats and integer z cells
    "agg_circular_mean",      # massed identical times-of-day: resultant near 1,
                              # ln(r) in circ_std must agree at the boundary
    "dq_heaping",             # negative cents through the %10 digit cells
                              # (both engines' % follow truncation sign rules)
    "dq_null_correlation",    # negative values land below every quartile edge
    "ts_sax",                 # negative daily sums through z-normalization
    "ts_lag_features",        # short/collided series: NULL lags, size-1 std
    "ts_crossover",           # flat series: fast == slow pins signal +1
    "ts_hurst",               # zero-range chunks dropped identically (HAVING)
    "win_reset_cumsum",       # collided timestamps tie-break on (ts, event_id)
    "f_hash_rng",             # pure hash arithmetic, unaffected by collisions
    "ts_pacf",                # collided/flat series: zero-variance lags pin
                              # NULL pacf identically through the nullif guard
    # round-10 events-path operators:
    "ts_spectral_power",      # negative daily sums through the phase cells;
                              # all-zero bins pin NULL share via nullif
    "ts_entropy_rate",        # collided timestamps tie-break on (ts, event_id)
                              # before the bigram collapse
    "ts_haar_energy",         # negative/collided daily sums through the exact
                              # integer sign-flip details
]


@pytest.mark.parametrize("name", ADV_EVENTS_PANEL)
def test_adversarial_ts_collisions(spark, adv_events_dir, name):
    spec = SPECS[name]
    assert spec.oracle is not None
    problems = check_query(spec.builder(spark, adv_events_dir), spec.oracle, adv_events_dir)
    assert not problems, f"{name} diverges under ts collisions: {problems[:3]}"


# --- adversarial embeddings: degenerate vectors -------------------------------

# Broken encoders ship zero vectors, exact duplicates, denormal-scale
# values, and constant vectors; cosine math divides by the norm, so a
# zero-norm row is where engine semantics (NULL vs NaN vs Inf) diverge
# first. 64-dim like the fixture; every value is a power of two times a
# small integer so dot products and norms are EXACT in float64 and any
# divergence is semantic, not rounding.


def _adv_embeddings_rows():
    import struct

    dim = 64
    rows = []

    def vec(fn):
        return [float(fn(i)) for i in range(dim)]

    rows.append((0, vec(lambda i: 0.0), 0))                        # zero vector
    rows.append((1, vec(lambda i: 0.25), 1))                       # constant
    rows.append((2, vec(lambda i: 0.25), 1))                       # exact duplicate
    rows.append((3, vec(lambda i: -0.25), 2))                      # antipodal
    rows.append((4, vec(lambda i: 2.0 ** -60 if i == 0 else 0.0), 3))  # tiny norm
    rows.append((5, vec(lambda i: 1024.0 if i == 0 else 0.0), 4))  # huge single-axis
    rows.append((6, vec(lambda i: (1 if i % 2 == 0 else -1) * 0.125), 5))
    rows.append((7, vec(lambda i: 0.0625 * ((i % 5) - 2)), 6))
    # a clean cluster of slightly-perturbed copies (near-dup bait)
    for k in range(8, 20):
        rows.append((k, vec(lambda i, k=k: 0.5 if i == (k % 4) else 0.125), 7 + (k % 3)))
    return rows


@pytest.fixture(scope="module")
def adv_emb_dir(spark):
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = "/tmp/adv_emb_fixture"
    os.makedirs(dst, exist_ok=True)
    for name in TABLE_NAMES:
        if name == "embeddings":
            continue
        # unconditional copy: the driver can regenerate sf0.001 between
        # rounds, and a stale cached companion would silently skew replays
        shutil.copyfile(
            os.path.join(src, f"{name}.parquet"),
            os.path.join(dst, f"{name}.parquet"),
        )
    rows = _adv_embeddings_rows()
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": [r[0] for r in rows],
                "embedding": [r[1] for r in rows],
                "label": [r[2] for r in rows],
            },
            schema=schema,
        ),
        os.path.join(dst, "embeddings.parquet"),
    )
    return dst


ADV_EMB_PANEL = [
    "llm_emb_covariance",
    "llm_sim_search",
    "llm_emb_neardup",
    "llm_emb_centroid",
    "llm_kmeans_iter",
    "llm_sim_search_ivf",
    "llm_ann_recall",
    "llm_emb_lsh",
    "llm_semantic_dedup",
    "llm_emb_quantize",
    "llm_hard_negatives",
    "llm_mmr_diversify",
    # round-10: the cogrouped Arrow kernel must agree with the unpruned
    # relational oracle on degenerate vectors (zero norm, antipodal,
    # exact duplicates, tiny/huge magnitudes)
    "llm_knn_graph",
]


@pytest.mark.parametrize("name", ADV_EMB_PANEL)
def test_adversarial_degenerate_vectors(spark, adv_emb_dir, name):
    spec = SPECS[name]
    assert spec.oracle is not None
    problems = check_query(spec.builder(spark, adv_emb_dir), spec.oracle, adv_emb_dir)
    assert not problems, f"{name} diverges on degenerate vectors: {problems[:3]}"


# --- adversarial graph: hostile co-purchase topologies (VERDICT r7 item 5) ----

# The sf fixtures' co-purchase graph is a dense random blob — it never
# exercises a star hub with triangle-free spokes (clustering-coef / adamic-
# adar zero denominators), an unreachable component (BFS infinity rows),
# a supplier alone in its orders (never enters the edge relation), row
# multiplicity inside one order (pair weights from duplicate lines), or a
# mean-threshold that eliminates nodes entirely. Each order below is a
# (orderkey, [suppkeys]) basket; pair weight = co-occurrence count.
#
# Mixed fixture pair-weight audit: star 10 directed entries w=2, triangle
# 6 entries w=3, noise 8 entries w=1, dup-pair 2 entries w=2 — mean =
# 50/26 ≈ 1.92, so w>mean keeps star+triangle+dup-pair and kills the
# noise pairs (nodes 40-47 vanish AFTER contributing to the mean).

_GRAPH_ORDERS_MIXED = (
    # star: hub 1 — spokes 2..6, each pair in two orders (w=2)
    [(201, [1, 2]), (202, [1, 2]), (203, [1, 3]), (204, [1, 3]),
     (205, [1, 4]), (206, [1, 4]), (207, [1, 5]), (208, [1, 5]),
     (209, [1, 6]), (210, [1, 6])]
    # triangle 10-11-12 in three shared orders (w=3)
    + [(301, [10, 11, 12]), (302, [10, 11, 12]), (303, [10, 11, 12])]
    # noise pairs (w=1): thresholded OUT, but they drag the mean below 2
    + [(401, [40, 41]), (402, [42, 43]), (403, [44, 45]), (404, [46, 47])]
    # isolated supplier: an order with a single supplier -> no pairs
    + [(500, [20])]
    # duplicate-row multiplicity: supplier 30 listed twice in one order
    + [(600, [30, 30, 31])]
)

# Uniform fixture: every pair weight 1 -> mean = 1 -> w > mean empty for
# ALL pairs. The edge set (and thus every graph result) must be empty in
# BOTH engines — this is where division-by-zero / empty-aggregate
# semantics (|V| = 0, COUNT(*) = 0 denominators) diverge first.
_GRAPH_ORDERS_UNIFORM = [(701, [50, 51]), (702, [52, 53]), (703, [54, 55])]


def _write_graph_fixture(dst: str, baskets) -> str:
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    os.makedirs(dst, exist_ok=True)
    for name in TABLE_NAMES:
        if name in ("lineitem", "supplier"):
            continue
        shutil.copyfile(
            os.path.join(src, f"{name}.parquet"),
            os.path.join(dst, f"{name}.parquet"),
        )
    import datetime

    li = {k: [] for k in (
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    )}
    for okey, supps in baskets:
        for ln, s in enumerate(supps, start=1):
            li["l_orderkey"].append(okey)
            li["l_partkey"].append(s % 7)
            li["l_suppkey"].append(s)
            li["l_linenumber"].append(ln)
            li["l_quantity"].append(float(1 + s % 5))
            li["l_extendedprice"].append(100.0 + okey)
            li["l_discount"].append(0.05)
            li["l_tax"].append(0.02)
            li["l_returnflag"].append("N")
            li["l_linestatus"].append("O")
            li["l_shipdate"].append(
                datetime.datetime(2024, 1, 1 + okey % 28)
            )
    li_schema = pa.schema(
        [
            ("l_orderkey", pa.int64()),
            ("l_partkey", pa.int64()),
            ("l_suppkey", pa.int64()),
            ("l_linenumber", pa.int32()),
            ("l_quantity", pa.float64()),
            ("l_extendedprice", pa.float64()),
            ("l_discount", pa.float64()),
            ("l_tax", pa.float64()),
            ("l_returnflag", pa.string()),
            ("l_linestatus", pa.string()),
            ("l_shipdate", pa.timestamp("us")),
        ]
    )
    pq.write_table(pa.table(li, schema=li_schema), os.path.join(dst, "lineitem.parquet"))
    # supplier rows for every node id (graph_modularity joins s_nationkey;
    # % 3 communities split the triangle across two communities)
    supps = sorted({s for _, basket in baskets for s in basket})
    sup_schema = pa.schema(
        [
            ("s_suppkey", pa.int64()),
            ("s_name", pa.string()),
            ("s_nationkey", pa.int32()),
            ("s_acctbal", pa.float64()),
        ]
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": supps,
                "s_name": [f"adv supplier {s}" for s in supps],
                "s_nationkey": [s % 3 for s in supps],
                "s_acctbal": [100.0 * s for s in supps],
            },
            schema=sup_schema,
        ),
        os.path.join(dst, "supplier.parquet"),
    )
    return dst


@pytest.fixture(scope="module")
def adv_graph_dir(spark):
    return _write_graph_fixture("/tmp/adv_graph_fixture", _GRAPH_ORDERS_MIXED)


@pytest.fixture(scope="module")
def adv_graph_empty_dir(spark):
    return _write_graph_fixture("/tmp/adv_graph_empty_fixture", _GRAPH_ORDERS_UNIFORM)


# Every oracle-checked operator on the lineitem co-purchase graph
# (graph_reciprocity rides the events panel — its graph is event-derived).
ADV_GRAPH_PANEL = [
    "graph_cc_shuffle",
    "graph_label_prop",
    "graph_pagerank",
    "graph_triangles",
    "graph_cc",
    "graph_jaccard",
    "graph_2hop",
    "graph_kcore",
    "graph_bfs",
    "graph_adamic_adar",
    "graph_modularity",
    "graph_clustering_coef",
    "graph_hits",
    "graph_degree_dist",
    # round-8 batch-4:
    "graph_harmonic",         # chain topology exercises distance-3; empty set => no rows
    "graph_pref_attach",      # star hub: all leaf pairs are open wedges
]


@pytest.mark.parametrize("name", ADV_GRAPH_PANEL)
def test_adversarial_graph_topologies(spark, adv_graph_dir, name):
    spec = SPECS[name]
    assert spec.oracle is not None
    problems = check_query(spec.builder(spark, adv_graph_dir), spec.oracle, adv_graph_dir)
    assert not problems, f"{name} diverges on hostile topology: {problems[:3]}"


@pytest.mark.parametrize("name", ADV_GRAPH_PANEL)
def test_adversarial_graph_empty_edges(spark, adv_graph_empty_dir, name):
    spec = SPECS[name]
    assert spec.oracle is not None
    problems = check_query(
        spec.builder(spark, adv_graph_empty_dir), spec.oracle, adv_graph_empty_dir
    )
    assert not problems, f"{name} diverges on the empty edge set: {problems[:3]}"


# --- adversarial lineitem/orders: ties, credits, zero quantities ----------------

# The relational/stat family's hostile classes the TPC-H-shaped fixtures
# never produce: CREDIT lines (negative extended price — flips a
# supplier's or a whole nation's revenue negative, reaching the ln(<= 0)
# guard where DuckDB RAISES and Spark returns NULL), zero quantities
# (a whole calendar month with zero traded volume — the x/0.0 edge where
# DuckDB yields NULL and Spark Infinity), massed value ties (one order
# whose 8 lines share one quantity — rank/trim arithmetic under heavy
# duplication), floor-boundary fractional quantities (q*100 landing a
# hair below an integer), a negative quantity, same-supplier orders
# (no co-purchase pairs), sparse high order keys and childless orders
# (key-continuity and outer paths). Rows are APPENDED to the sf0.001
# base so every operator keeps non-degenerate margins; the replay runs
# the exact driver comparator — engines must agree on whatever semantics
# each operator defines for these rows.

_ADV_LI_COLS = (
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate",
)


def _adv_lineitem_rows():
    import datetime

    rows = []
    d = datetime.datetime
    # order 100000 (1990-01): zero-quantity month => ts_vwap volume 0
    for ln in range(1, 6):
        rows.append((100000, ln * 13 % 200, ln % 10, ln, 0.0, 100.0 + ln,
                     0.0, 0.0, "R" if ln % 2 else "N", "F", d(1990, 1, 10 + ln)))
    # order 100007 (1990-02): 8 lines, ONE quantity, ONE supplier (5) —
    # tie mass for trim/rank arithmetic, no co-purchase pairs
    for ln in range(1, 9):
        rows.append((100007, (50 + ln) % 200, 5, ln, 25.0, 5000.0,
                     0.1, 0.05, "R" if ln <= 4 else "N", "F", d(1990, 2, 10)))
    # order 100100 (1990-03): a huge CREDIT line — supplier 6 (and its
    # nation, depending on base totals) goes revenue-negative
    rows.append((100100, 7, 6, 1, 1.0, -99999999.99, 0.0, 0.0, "R", "O",
                 d(1990, 3, 5)))
    # order 100101 (1990-03): floor-boundary and NEGATIVE quantities
    rows.append((100101, 11, 7, 1, 19.995, 1234.56, 0.02, 0.01, "N", "O",
                 d(1990, 3, 6)))
    rows.append((100101, 12, 7, 2, -3.5, 777.77, 0.0, 0.0, "N", "O",
                 d(1990, 3, 6)))
    # order 100102 (1990-03): fractional quantities on flags A and R —
    # the round-9 find: Spark's double->bigint cast truncates toward zero
    # while DuckDB's ROUNDS, so any operator pairing a bare bigint cast of
    # l_quantity with its oracle diverges on -3.5 / 19.995 / x.5 cells.
    # Flag-N rows above missed the A/R-filtered statistics (agg_mannwhitney)
    # entirely; these reach them.
    rows.append((100102, 21, 8, 1, 7.5, 432.10, 0.0, 0.0, "A", "F",
                 d(1990, 3, 7)))
    rows.append((100102, 22, 8, 2, -0.5, 210.98, 0.0, 0.0, "R", "F",
                 d(1990, 3, 7)))
    rows.append((100102, 23, 8, 3, 19.995, 654.32, 0.0, 0.0, "A", "F",
                 d(1990, 3, 7)))
    return rows


@pytest.fixture(scope="module")
def adv_li_dir(spark):
    import datetime

    import duckdb

    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = "/tmp/adv_lineitem_fixture"
    os.makedirs(dst, exist_ok=True)
    for name in TABLE_NAMES:
        if name in ("lineitem", "orders"):
            continue
        shutil.copyfile(
            os.path.join(src, f"{name}.parquet"),
            os.path.join(dst, f"{name}.parquet"),
        )
    con = duckdb.connect()
    # lineitem: base rows + hostile rows (duckdb handles the parquet IO and
    # keeps the base file's physical types)
    li = pa.table(
        {c: [r[i] for r in _adv_lineitem_rows()] for i, c in enumerate(_ADV_LI_COLS)},
        schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("l_linenumber", pa.int32()),
                ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()),
                ("l_discount", pa.float64()),
                ("l_tax", pa.float64()),
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("l_shipdate", pa.timestamp("us")),
            ]
        ),
    )
    con.register("adv_li", li)
    con.execute(
        f"""COPY (SELECT * FROM '{src}/lineitem.parquet'
                  UNION ALL SELECT * FROM adv_li)
            TO '{dst}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    d = datetime.datetime
    hostile_orders = [
        (100000, 3, "F", 0.0, d(1990, 1, 15), "1-URGENT"),
        (100007, 7, "F", 40000.0, d(1990, 2, 1), "2-HIGH"),
        (100100, 11, "O", -99999999.99, d(1990, 3, 1), "3-MEDIUM"),
        (100101, 13, "O", 2012.33, d(1990, 3, 1), "5-LOW"),
        # childless orders on sparse keys: key-continuity + outer paths
        (100200, 17, "P", 10.0, d(1990, 4, 1), "4-NOT SPECIFIED"),
        (100203, 19, "P", 11.0, d(1990, 4, 2), "1-URGENT"),
        (100204, 23, "F", 12.0, d(1990, 4, 3), "2-HIGH"),
    ]
    od = pa.table(
        {
            "o_orderkey": [r[0] for r in hostile_orders],
            "o_custkey": [r[1] for r in hostile_orders],
            "o_orderstatus": [r[2] for r in hostile_orders],
            "o_totalprice": [r[3] for r in hostile_orders],
            "o_orderdate": pa.array([r[4] for r in hostile_orders], pa.timestamp("us")),
            "o_orderpriority": [r[5] for r in hostile_orders],
        }
    )
    con.register("adv_od", od)
    con.execute(
        f"""COPY (SELECT * FROM '{src}/orders.parquet'
                  UNION ALL SELECT * FROM adv_od)
            TO '{dst}/orders.parquet' (FORMAT PARQUET)"""
    )
    return dst


# lineitem/orders-path oracle operators the hostile classes can reach.
ADV_LINEITEM_PANEL = [
    "agg_trimmed_mean",   # tie mass + negative centi-quantity value cells
    "agg_cohens_d",       # credit/zero rows through the clamped pooled SD
    "agg_theil",          # NEGATIVE supplier revenue: the ln(<=0) guard
    "agg_gini",           # rank form under negative revenue cells
    "agg_weighted_avg",   # negative prices through the decimal-exact sums
    "agg_weighted_median",
    "agg_kendall_tau",    # brand cells with negative revenue contributions
    "ts_vwap",            # 1990-01 has ZERO traded volume: NULL, not Inf
    "ts_stochastic",      # appended months extend each type's daily series
    "win_rank_delta",     # massed cent ties under the (cents, suppkey) key
    "sample_strat_k",     # sparse keys perturb the md5 bottom-k per stratum
    "agg_cramers_v",      # new (status, priority) cells shift every margin
    "dq_sequence_gaps",   # 100000+ keys open giant ranges; childless orders
    "sql_q1",             # negative price/quantity through decimal Q1 sums
    "graph_richclub",     # same-supplier order + credit edges reshape degrees
    # round-9 statistical-family extension (VERDICT r8 item 9):
    "agg_mannwhitney",    # massed qty ties drive the T = c^3-c tie term and
                          # the negative-quantity cells cross rank groups
    "agg_spearman",       # tie-aware 2x ranks over negative/boundary value
                          # cells through the distributed range-prefix path
    # round-9 lineitem-path operators (all four quantity consumers were
    # floor()-hardened against the Spark-truncates/DuckDB-rounds cast
    # divergence BEFORE first driver sampling — this panel is the proof):
    "agg_jackknife_ratio",   # credit line flips a leave-one-out ratio's sign;
                             # fractional/negative qty through floor()
    "agg_bootstrap_ci",      # negative/fractional qty in every replicate's
                             # weighted mean; zero-weight replicates divide NULL
    "agg_bayes_shrink",      # hostile partkeys shift brand moments; negative
                             # qty through the integer ss cells
    "dq_simpson",            # negative qty flips per-segment covariance signs
    "agg_tail_contrib",      # credit cents sit below every p99 threshold;
                             # the two-level prefix must place them first
    "graph_bipartite_project", # childless orders and same-supplier baskets
                               # perturb degrees; lift gate on shifted totals
    "graph_triad_census",    # hostile orders reshape the trade edge set
    "graph_eigencentrality", # same-supplier order adds no co-purchase edge
]


@pytest.mark.parametrize("name", ADV_LINEITEM_PANEL)
def test_adversarial_lineitem_credits_ties(spark, adv_li_dir, name):
    spec = SPECS[name]
    assert spec.oracle is not None
    problems = check_query(spec.builder(spark, adv_li_dir), spec.oracle, adv_li_dir)
    assert not problems, f"{name} diverges on hostile lineitem rows: {problems[:3]}"
