"""Deduplication operators (SURVEY.md §2.K): exact, MinHash, SimHash, Jaccard.

Scale design:
- exact dedup is a hash-groupBy on a content digest — one shuffle on the
  digest, no text comparison;
- MinHash dedup never compares all pairs: signatures are per-row expressions,
  candidates come from an equi-join on (band, value), and the exact Jaccard
  verification joins only candidate pairs. At 100 TB the candidate join is
  the only super-linear step and it is data-dependent sparse;
- hashing is the engine-portable polynomial family (functions/hashing.py), so
  every stage is oracle-checkable — Spark's Murmur3 would be unverifiable.

MinHashLSH from Spark MLlib is exposed as the non-portable, battle-tested
alternative (rows-only check).

Because the fixture corpus has no true duplicates, near-dups are synthesized
in-query: every document is unioned with a copy that lost its final token
(ids offset by 1_000_000) — both engines construct the identical corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.hashing import (
    SHINGLE_MOD_WIDE,
    minhash_signature_duckdb,
    minhash_signature_spark_sql,
    shingle_hashes_duckdb,
    shingle_hashes_spark_sql,
    token_hashes_duckdb,
    token_hashes_spark_sql,
)
from ..functions.text import (
    drop_last_token_duckdb,
    drop_last_token_spark,
    shingles_duckdb,
    shingles_spark,
    tokens_duckdb,
    tokens_spark,
)
from ..registry import register
from ..session import apply_engine_conf, scoped_persist, set_compute_dense_floor
from ..tables import rebalance_for_map, table

# --- llm_exact_dedup ---------------------------------------------------------

_EXACT_DEDUP_ORACLE = """
SELECT sha256(text) AS text_hash, MIN(doc_id) AS canonical_doc, COUNT(*) AS dup_cnt
FROM documents
GROUP BY sha256(text)
"""


@register("llm_exact_dedup", oracle=_EXACT_DEDUP_ORACLE, tags=("llm", "dedup"))
def llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content digest: group on sha2(text, 256), keep the
    minimum doc_id as canonical. The shuffle key is the 32-byte digest, not
    the document — at 100 TB the exchange carries hashes, not text."""
    apply_engine_conf(spark)
    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.sha2("text", 256).alias("text_hash"))
        .agg(F.min("doc_id").alias("canonical_doc"), F.count(F.lit(1)).alias("dup_cnt"))
    )


# --- llm_minhash_dedup --------------------------------------------------------

_MH_SPARK_ARR = "array(" + ", ".join(minhash_signature_spark_sql("sh_hashes", 8)) + ")"
# int-array variant: sh_hashes carried as array<int> (shingle hashes are
# < SHINGLE_MOD_WIDE = 2^31−1, so INT holds them exactly); the
# universal-hash product a*h needs int64, so h is widened back per
# element. Halves the verify joins' shuffle/spill bytes — the profiled
# sf30 bottleneck. The WIDE shingle modulus matters as much as the wire
# format: with the default 1e6 space, 3M documents saturate the hash
# universe and MinHash minima concentrate — measured as multi-hundred-MB
# LSH buckets (collect_list heap OOM at sf30).
_MH_SPARK_ARR_INT = "array(" + ", ".join(
    s.replace("* h +", "* cast(h as bigint) +")
    for s in minhash_signature_spark_sql("sh_hashes", 8)
) + ")"
_MH_DUCK_ARR = "[" + ", ".join(minhash_signature_duckdb("sh_hashes", 8)) + "]"

_MINHASH_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, {drop_last_token_duckdb('text')} AS text
  FROM documents
),
hashed AS (
  SELECT doc_id, {token_hashes_duckdb(tokens_duckdb('text'))} AS th FROM corpus
),
shingled AS (
  -- shingle-less docs (< 3 tokens) are excluded: they have no content to
  -- match, their all-NULL signatures would bucket together under Spark's
  -- NULL-grouping groupBy (DuckDB's join semantics drop them), and the
  -- empty-vs-empty Jaccard is 0/0 (ANSI Spark job-kill on hostile rows)
  SELECT doc_id, list_distinct({shingle_hashes_duckdb('th', mod=SHINGLE_MOD_WIDE)}) AS sh_hashes FROM hashed
  WHERE len({shingle_hashes_duckdb('th', mod=SHINGLE_MOD_WIDE)}) > 0
),
sigs AS (
  SELECT doc_id, sh_hashes, {_MH_DUCK_ARR} AS sig FROM shingled
),
bands AS (
  SELECT doc_id, i AS band, sig[i] AS mh
  FROM sigs, UNNEST(range(1, 9)) AS t(i)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id
),
verified AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(sa.sh_hashes, sb.sh_hashes)) AS n_inter,
         len(sa.sh_hashes) AS n_a, len(sb.sh_hashes) AS n_b
  FROM cand c
  JOIN shingled sa ON sa.doc_id = c.doc_a
  JOIN shingled sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b,
       CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) AS jaccard
FROM verified
WHERE CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) >= 0.6
"""


@register("llm_minhash_dedup", oracle=_MINHASH_ORACLE, tags=("llm", "dedup"))
def llm_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash near-dup detection, fully engine-portable: tokens are hashed
    once per document (md5-fold, functions/hashing.py), 3-gram shingle
    hashes are composed from token hashes with pure integer ops, 8 MinHash
    bands feed a band-equality candidate join, and an exact Jaccard ≥ 0.6
    on the shingle hash sets verifies candidates only — never all pairs.

    Every synthesized near-dup (doc + copy-minus-last-token) must surface;
    random cross-doc pairs are killed by the Jaccard gate.
    """
    apply_engine_conf(spark)
    # AQE's byte-based coalescing folded the bucket pair expansion onto ONE
    # core (0.66 s task) and the array-intersect verify onto FOUR (3.4 s
    # CPU) at sf0.1 — the shuffled bytes are MBs but the per-row compute is
    # heavy (guide §2: compute-blind coalescing). Lowering the coalesce
    # floor for this query keeps those stages wide; at cluster scale the
    # stages carry GBs and the floor is never the binding constraint.
    # Derivation + build→execute sequencing contract: session.py
    # set_compute_dense_floor. Restored by the next query's
    # apply_engine_conf.
    set_compute_dense_floor(spark)
    docs = table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.expr(drop_last_token_spark("text")).alias("text"),
        )
    )
    # shingle-less docs (< 3 tokens) are excluded BEFORE hashing: the
    # predicate is equivalent to the oracle's len(shingles) > 0 (a 3-gram
    # list is non-empty iff tokens >= 3) and costs one split per row. A
    # filter on the computed shingle array instead is a 20x regression:
    # PushPredicateThroughNonJoin substitutes the alias into the pushed
    # condition and re-evaluates the full md5 chain per reference
    # (caught by the round-8 bench; see oracle comment for WHY the
    # exclusion exists: NULL-sig buckets / 0-0 jaccard).
    corpus = corpus.filter(F.size(F.split(F.col("text"), " ")) >= 3)
    # spread the md5/shingle map work across every core (tiny text exchange
    # vs per-token compute; see tables.rebalance_for_map)
    corpus = rebalance_for_map(corpus, spark)
    hashed = corpus.select(
        "doc_id", F.expr(token_hashes_spark_sql(tokens_spark("text"))).alias("th")
    )
    # sh_hashes as array<int>: shingle hashes are < SHINGLE_MOD_WIDE =
    # 2^31−1, so INT holds them exactly (and the wide space is load-bearing
    # — see the _MH_SPARK_ARR_INT note). The verify joins exchange these,
    # and the narrower element type halves their shuffle-write and
    # sort-spill bytes (profiled at sf10: the array exchange + its
    # sort-merge spill, 5.98 G write / 11.7 G disk spill, is what ran
    # sf30 out of local disk — not the persist at 0.41 G, not the band
    # bucket exchange at 1.05 G; scripts/profile_minhash.py).
    shingled = hashed.select(
        "doc_id",
        F.array_distinct(
            F.expr(shingle_hashes_spark_sql("th", mod=SHINGLE_MOD_WIDE))
        )
        .cast("array<int>")
        .alias("sh_hashes"),
    )
    # Persist the signature base: it feeds three subtrees (bands, shingle
    # explode, set sizes) and the barrier stops Catalyst from pushing inferred
    # not-null filters below it — which would inline the hash chain per use.
    # At cluster scale this is the "materialize signatures once" step every
    # LSH dedup pipeline has.
    shingled = scoped_persist(shingled)
    sigs = shingled.select("doc_id", "sh_hashes", F.expr(_MH_SPARK_ARR_INT).alias("sig"))
    bands = sigs.select(
        "doc_id", F.posexplode("sig").alias("band0", "mh")
    ).select("doc_id", (F.col("band0") + 1).alias("band"), "mh")
    # Candidate pairs via ONE shuffle: group band rows into (band, mh)
    # buckets and expand pairs inside each bucket. A band self-join computes
    # the same pairs but exchanges the band rows twice (both join sides) and
    # re-derives the signatures per side; the groupBy ships each band row
    # once (~15% faster at sf0.1, half the exchange volume at 100 TB). LSH
    # keeps buckets near-singleton by construction, so the in-bucket
    # quadratic expansion is bounded; a pathological hot bucket would mean
    # the band width, not the pairing strategy, needs retuning.
    buckets = (
        bands.groupBy("band", "mh")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
    )
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    "filter(flatten(transform(ids, a -> transform(ids, b -> struct(a, b)))),"
                    " p -> p.a < p.b)"
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
    )
    # Exact verification by joining the (persisted) shingle sets onto the
    # sparse candidate pairs and intersecting arrays per pair — two joins
    # and zero aggregations, vs the explode/equi-join/count formulation
    # which costs four joins plus a groupBy. Candidate pairs are the only
    # super-linear object and LSH keeps them sparse by construction.
    sa = shingled.select(F.col("doc_id").alias("doc_a"), F.col("sh_hashes").alias("sh_a"))
    sb = shingled.select(F.col("doc_id").alias("doc_b"), F.col("sh_hashes").alias("sh_b"))
    # First verify join: SHUFFLE_HASH with the 16-byte candidate pairs as
    # the build side, so the sa array stream is never sorted (while cand
    # fits a broadcast AQE still upgrades it; the hint governs the
    # fallback). The SECOND join must NOT build a hash map — both its
    # sides carry arrays, and building from either exhausts task memory
    # (measured at sf30: cannotAcquireMemoryToBuildLongHashedRelation);
    # its sort-merge spills the array rows to disk gracefully, and with
    # the WIDE shingle modulus keeping candidates linear that spill is a
    # few GB, not the saturated-space explosion that killed round 7's
    # sf30 run.
    verified = (
        cand.hint("shuffle_hash")
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("n_inter"),
            F.size("sh_a").cast("long").alias("n_a"),
            F.size("sh_b").cast("long").alias("n_b"),
        )
    )
    jac = F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        verified.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.6)
    )


# --- llm_simhash --------------------------------------------------------------

_SIMHASH_BITS = 24  # token hashes are < 2^20·· (mod 1_000_003), 24 bits inspected

_simhash_sum_cols_spark = ", ".join(
    f"SUM(CASE WHEN (shiftright(h, {j}) & 1) = 1 THEN 1 ELSE -1 END) AS b{j}"
    for j in range(_SIMHASH_BITS)
)
_simhash_sum_cols_duck = ", ".join(
    f"SUM(CASE WHEN ((h >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS b{j}"
    for j in range(_SIMHASH_BITS)
)
_simhash_fold = " + ".join(f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(_SIMHASH_BITS))

_SIMHASH_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, UNNEST({token_hashes_duckdb(tokens_duckdb('text'))}) AS h
  FROM documents
),
bits AS (
  SELECT doc_id, {_simhash_sum_cols_duck}
  FROM tok GROUP BY doc_id
)
SELECT doc_id, CAST({_simhash_fold} AS BIGINT) AS simhash
FROM bits
"""


@register("llm_simhash", oracle=_SIMHASH_ORACLE, tags=("llm", "dedup"))
def llm_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash document fingerprint: per-token polynomial hashes vote ±1 on
    each of 24 bit positions; the sign vector is folded back into one bigint.
    Near-dup docs differ in few bits (Hamming distance) — pair search then
    bands the fingerprint bytes, same pattern as llm_minhash_dedup."""
    apply_engine_conf(spark)
    docs = rebalance_for_map(table(spark, sf_dir, "documents"), spark)
    tok = docs.select(
        "doc_id",
        F.explode(F.expr(token_hashes_spark_sql(tokens_spark("text")))).alias("h"),
    )
    # the 24 vote columns as generated expressions
    agg_exprs = [
        F.sum(
            F.when((F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(_SIMHASH_BITS)
    ]
    bits = tok.groupBy("doc_id").agg(*agg_exprs)
    fold = None
    for j in range(_SIMHASH_BITS):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fold = term if fold is None else fold + term
    return bits.select("doc_id", fold.cast("long").alias("simhash"))


# --- llm_ngram_jaccard ---------------------------------------------------------

_NGRAM_JACCARD_ORACLE = f"""
WITH sub AS (
  SELECT doc_id, list_distinct({shingles_duckdb(tokens_duckdb('text'))}) AS sh
  FROM documents WHERE doc_id < 100
),
e AS (SELECT doc_id, UNNEST(sh) AS s FROM sub),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sz AS (SELECT doc_id, len(sh) AS n FROM sub)
SELECT doc_a, doc_b,
       CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.05
"""


@register("llm_ngram_jaccard", oracle=_NGRAM_JACCARD_ORACLE, tags=("llm", "dedup"))
def llm_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity join on a bounded subset (doc_id <
    100): the ground-truth variant MinHash approximates. The pairwise stage
    is the explicit O(n²)-capable path — bounded input by construction."""
    apply_engine_conf(spark)
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    sub = docs.select(
        "doc_id", F.array_distinct(F.expr(shingles_spark(tokens_spark("text")))).alias("sh")
    )
    e = sub.select("doc_id", F.explode("sh").alias("s"))
    e2 = e.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("s_b"))
    inter = (
        e.join(e2, (e.s == e2.s_b) & (e.doc_id < e2.doc_b))
        .groupBy(F.col("doc_id").alias("doc_a"), "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz = sub.select("doc_id", F.size("sh").cast("long").alias("n"))
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.05)
    )


# --- llm_minhash_lsh (MLlib, rows-only) ----------------------------------------


@register("llm_minhash_lsh", tags=("llm", "dedup", "rows-only"))
def llm_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHashLSH near-dup join via Spark MLlib (HashingTF → MinHashLSH →
    approxSimilarityJoin) — the battle-tested scale path. Rows-only check:
    MLlib's hash family is JVM-specific, unverifiable cross-engine."""
    apply_engine_conf(spark)
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.expr(drop_last_token_spark("text")).alias("text"),
        )
    )
    # tokens >= 3 == non-empty shingle list; cheap pre-filter, never a
    # predicate on the computed array (the llm_minhash_dedup 20x lesson)
    corpus = corpus.filter(F.size(F.split(F.col("text"), " ")) >= 3)
    # the 2-split documents scan ran ALL of HashingTF + the 8-table MinHash
    # family on 2 cores (profiled: two stages, 53 s CPU total, 2 tasks
    # each — 90% of this query's wall). Same spread as llm_minhash_dedup.
    corpus = rebalance_for_map(corpus, spark)
    shingled = corpus.select(
        "doc_id",
        F.array_distinct(F.expr(shingles_spark(tokens_spark("text")))).alias("shingles"),
    )
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18)
    # Persist barrier (the llm_minhash_dedup pattern): approxSimilarityJoin
    # plants size(hashes) > 0 / isnotnull filters that Catalyst pushes BELOW
    # the rebalance exchange, inlining the whole shingle+TF+MinHash chain
    # into a scan-side Filter — evaluated TWICE per row, on the 2-task scan,
    # once per join side (profiled: two 17 s-CPU 2-task stages were 85% of
    # this query). The cache computes features ONCE post-rebalance and both
    # join sides read it.
    feats = scoped_persist(tf.transform(shingled))
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.4, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.col("jaccard_dist"),
        )
    )


# --- llm_dedup_clusters: connected components over near-dup pairs ------------

_CLUSTERS_ORACLE = f"""
WITH RECURSIVE
pairs AS (
  SELECT doc_a, doc_b FROM ({_MINHASH_ORACLE.strip().rstrip(';')})
),
und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
)
SELECT a AS doc_id, least(a, MIN(b)) AS cluster_rep,
       CASE WHEN least(a, MIN(b)) = a THEN 1 ELSE 0 END AS is_canonical
FROM reach GROUP BY a
"""


@register("llm_dedup_clusters", oracle=_CLUSTERS_ORACLE, tags=("llm", "dedup", "iterative"))
def llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash near-dup pairs — the step that
    turns pairwise matches into dedup decisions (keep one canonical doc per
    cluster). Pregel-style min-label propagation: each round every doc
    adopts the minimum label in its neighborhood; converges to the
    component minimum in O(diameter) rounds. Each round localCheckpoints to
    truncate lineage (the standard guard for iterative DataFrame
    algorithms) and the driver reads ONE scalar (changed-count) per round —
    the data itself never leaves the executors. The oracle computes the
    same fixpoint via DuckDB's recursive transitive closure, so the
    iterative implementation is verified against closed-form reachability.
    """
    apply_engine_conf(spark)
    pairs = llm_minhash_dedup(spark, sf_dir).select("doc_a", "doc_b")
    und = pairs.unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    und = und.localCheckpoint()
    labels = und.select(F.col("a").alias("doc_id")).distinct().withColumn(
        "label", F.col("doc_id")
    )
    for _ in range(10):  # diameter bound; every fixture graph converges in <4
        nbr_min = (
            und.join(labels, und.b == labels.doc_id)
            .groupBy(F.col("a").alias("doc_id2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.doc_id == nbr_min.doc_id2, "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
                F.col("label").alias("old_label"),
            )
        ).localCheckpoint()
        changed = new_labels.filter(F.col("label") != F.col("old_label")).count()
        labels = new_labels.select("doc_id", "label")
        if changed == 0:
            break
    return labels.select(
        "doc_id",
        F.col("label").alias("cluster_rep"),
        F.when(F.col("label") == F.col("doc_id"), 1).otherwise(0).alias("is_canonical"),
    )


# --- llm_incr_dedup: incremental batch-vs-corpus dedup ------------------------

_INCR_DEDUP_ORACLE = """
WITH batch AS (
  SELECT doc_id, COALESCE(sha256(text), '') AS text_hash
  FROM documents WHERE doc_id % 10 = 7
),
corpus AS (
  SELECT DISTINCT COALESCE(sha256(text), '') AS text_hash
  FROM documents WHERE doc_id % 10 != 7
),
fresh AS (
  SELECT b.doc_id, b.text_hash
  FROM batch b LEFT JOIN corpus c ON c.text_hash = b.text_hash
  WHERE c.text_hash IS NULL
)
SELECT text_hash, MIN(doc_id) AS canonical_doc, COUNT(*) AS batch_dup_cnt
FROM fresh GROUP BY text_hash
"""


@register("llm_incr_dedup", oracle=_INCR_DEDUP_ORACLE, tags=("llm", "dedup"))
def llm_incr_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the daily-ingest pattern: dedup a new batch
    (docs with doc_id % 10 = 7 stand in for today's crawl) against the
    existing corpus, then within itself. The anti join and the group-by
    both key on the 32-byte digest, so at 100 TB the corpus side is a
    digest index scan, never the documents; the batch (typically orders of
    magnitude smaller) is the build side. Exchanges carry hashes only.

    The digest projection is coalesce(sha2(text), '') — NON-NULLABLE, so
    InferFiltersFromConstraints never generates the isnotnull(sha2(...))
    filter that used to re-evaluate the digest per row in the scan Filter
    (round-8 sweep 2x constant, VERDICT r8 item 4). A hypothetical null
    text keys as '' (can't collide with any real 64-hex digest); the
    oracle applies the same coalesce so both engines agree by
    construction."""
    apply_engine_conf(spark)
    docs = table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 10 == 7).select(
        "doc_id", F.coalesce(F.sha2("text", 256), F.lit("")).alias("text_hash")
    )
    corpus = (
        docs.filter(F.col("doc_id") % 10 != 7)
        .select(F.coalesce(F.sha2("text", 256), F.lit("")).alias("text_hash"))
        .distinct()
    )
    fresh = batch.join(corpus, "text_hash", "left_anti")
    return fresh.groupBy("text_hash").agg(
        F.min("doc_id").alias("canonical_doc"), F.count(F.lit(1)).alias("batch_dup_cnt")
    )


# --- llm_line_dedup: C4-style corpus-wide line dedup -------------------------

_LINE_W = 8  # tokens per "line" (the fixture corpus is single-line text, so
# fixed 8-token windows stand in for newline-delimited lines; on real data the
# chunker is split(text, '\n') and everything downstream is identical)

_LINE_DEDUP_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
),
lines AS (
  SELECT doc_id, i AS line_no,
         array_to_string(list_slice(toks, (i - 1) * {_LINE_W} + 1, i * {_LINE_W}), ' ') AS line
  FROM t, UNNEST(range(1, 1 + (n - 1) // {_LINE_W} + 1)) AS u(i)
),
hashed AS (
  SELECT doc_id, line_no, line, md5(line) AS lh FROM lines
),
k AS (
  SELECT doc_id, line_no, line,
         row_number() OVER (PARTITION BY lh ORDER BY doc_id, line_no) AS rn
  FROM hashed
),
kept AS (SELECT doc_id, line_no, line FROM k WHERE rn = 1),
clean AS (
  SELECT doc_id,
         array_to_string(list(line ORDER BY line_no), ' ') AS text_clean,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(1 + (n - 1) // {_LINE_W} AS BIGINT) AS n_lines,
       CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
       md5(COALESCE(text_clean, '')) AS clean_md5,
       CAST(length(COALESCE(text_clean, '')) AS BIGINT) AS n_chars_clean
FROM t LEFT JOIN clean ON clean.doc_id = t.doc_id
"""


@register("llm_line_dedup", oracle=_LINE_DEDUP_ORACLE, tags=("llm", "dedup", "text"))
def llm_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-wide line deduplication: split every document into
    lines (fixed 8-token windows on this single-line fixture corpus), keep
    only the globally FIRST occurrence of each distinct line — (doc_id,
    line_no) order, which also removes within-document repeats — and
    reassemble each document from its surviving lines.

    Scale shape: the dedup exchange is keyed on md5(line) (32 bytes), never
    on raw text, and the first-occurrence rule is a min-struct window on
    that digest — one shuffle over the line set. Reassembly groups by
    doc_id (second shuffle, carries only surviving lines). Output carries
    md5(text_clean) + counts rather than the cleaned corpus so the query
    result stays bounded; the full cleaned text is one concat_ws away.
    This is the dedup C4 applies before training (three-sentence / line
    dedup) — the reference has no analog (north-star mandate)."""
    apply_engine_conf(spark)
    docs = rebalance_for_map(table(spark, sf_dir, "documents"), spark)
    t = docs.select(
        "doc_id",
        F.expr("split(text, ' ')").alias("toks"),
        F.expr("size(split(text, ' '))").alias("n"),
    )
    chunks = F.expr(
        f"transform(sequence(1, 1 + (n - 1) div {_LINE_W}),"
        f" i -> concat_ws(' ', slice(toks, (i - 1) * {_LINE_W} + 1, {_LINE_W})))"
    )
    lines = t.select("doc_id", F.posexplode(chunks).alias("pos", "line")).select(
        "doc_id", (F.col("pos") + 1).alias("line_no"), "line", F.md5("line").alias("lh")
    )
    # first global occurrence per line digest: min-struct window, the same
    # argmin-as-aggregate trick as the IVF assignment (no self-join)
    wk = Window.partitionBy("lh")
    kept = (
        lines.withColumn("keep", F.min(F.struct("doc_id", "line_no")).over(wk))
        .filter(
            (F.col("keep.doc_id") == F.col("doc_id"))
            & (F.col("keep.line_no") == F.col("line_no"))
        )
        .select("doc_id", "line_no", "line")
    )
    clean = kept.groupBy("doc_id").agg(
        F.expr(
            "concat_ws(' ', transform(array_sort(collect_list(struct(line_no, line))),"
            " s -> s.line))"
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        t.select("doc_id", F.expr(f"1 + (n - 1) div {_LINE_W}").cast("long").alias("n_lines"))
        .join(clean, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
            F.md5(F.coalesce(F.col("text_clean"), F.lit(""))).alias("clean_md5"),
            F.length(F.coalesce(F.col("text_clean"), F.lit(""))).cast("long").alias(
                "n_chars_clean"
            ),
        )
    )


# --- llm_dedup_audit: candidate-stage precision/recall vs exact truth ---------

# Bounded audit slice (ann_recall methodology, similarity.py): exact
# all-pairs Jaccard is quadratic, so the ground truth runs on a fixed-size
# doc panel at every scale factor — the audit cost stays constant while the
# pipeline under audit scales. 200 docs + their synthesized near-dup copies
# = 400 corpus rows, ~80k candidate pairs max.
_AUDIT_DOCS = 200
_AUDIT_TAU = 0.6

_AUDIT_CORPUS_DUCK = f"""
corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {_AUDIT_DOCS}
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, {drop_last_token_duckdb('text')} AS text
  FROM documents WHERE doc_id < {_AUDIT_DOCS}
),
hashed AS (
  SELECT doc_id, {token_hashes_duckdb(tokens_duckdb('text'))} AS th FROM corpus
),
shingled AS (
  SELECT doc_id, list_distinct({shingle_hashes_duckdb('th', mod=SHINGLE_MOD_WIDE)}) AS sh_hashes FROM hashed
  WHERE len({shingle_hashes_duckdb('th', mod=SHINGLE_MOD_WIDE)}) > 0
)"""

_DEDUP_AUDIT_ORACLE = f"""
WITH {_AUDIT_CORPUS_DUCK},
truth AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM shingled a JOIN shingled b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh_hashes, b.sh_hashes)) AS DOUBLE)
        / (len(a.sh_hashes) + len(b.sh_hashes)
           - len(list_intersect(a.sh_hashes, b.sh_hashes))) >= {_AUDIT_TAU}
),
sigs AS (
  SELECT doc_id, {_MH_DUCK_ARR} AS sig FROM shingled
),
bands AS (
  SELECT doc_id, i AS band, sig[i] AS mh
  FROM sigs, UNNEST(range(1, 9)) AS t(i)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id
),
hits AS (SELECT * FROM cand INTERSECT SELECT * FROM truth)
SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
       (SELECT COUNT(*) FROM cand) AS n_candidates,
       (SELECT COUNT(*) FROM hits) AS n_hits,
       CAST((SELECT COUNT(*) FROM hits) AS DOUBLE)
         / (SELECT COUNT(*) FROM cand) AS precision,
       CAST((SELECT COUNT(*) FROM hits) AS DOUBLE)
         / (SELECT COUNT(*) FROM truth) AS recall
"""


@register("llm_dedup_audit", oracle=_DEDUP_AUDIT_ORACLE, tags=("llm", "dedup"))
def llm_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-generation quality audit for MinHash dedup: on a fixed
    bounded panel, exact all-pairs Jaccard (the ground truth nobody can
    afford corpus-wide) vs the 8-band MinHash candidate set, reported as
    one (n_truth, n_candidates, n_hits, precision, recall) row. This is
    the dedup analog of llm_ann_recall: the recall number is what tells
    you whether the band count is right BEFORE you spend a 100 TB pass,
    and because both branches are deterministic portable hashing, the
    audit itself is oracle-checked exactly. The all-pairs join is bounded
    by the literal panel cap, so audit cost is constant at any sf."""
    apply_engine_conf(spark)
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < _AUDIT_DOCS)
    corpus = docs.select("doc_id", "text").unionByName(
        docs.select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.expr(drop_last_token_spark("text")).alias("text"),
        )
    )
    # tokens >= 3 == non-empty shingle list; cheap pre-filter, never a
    # predicate on the computed array (the llm_minhash_dedup 20x lesson)
    corpus = corpus.filter(F.size(F.split(F.col("text"), " ")) >= 3)
    corpus = rebalance_for_map(corpus, spark)
    hashed = corpus.select(
        "doc_id", F.expr(token_hashes_spark_sql(tokens_spark("text"))).alias("th")
    )
    shingled = scoped_persist(
        hashed.select(
            "doc_id",
            # same WIDE shingle space as the pipeline under audit — the
            # audit must measure the production hash family, not a
            # narrower one (see llm_minhash_dedup)
            F.array_distinct(
                F.expr(shingle_hashes_spark_sql("th", mod=SHINGLE_MOD_WIDE))
            ).alias("sh_hashes"),
        )
    )
    sa = shingled.select(F.col("doc_id").alias("doc_a"), F.col("sh_hashes").alias("sh_a"))
    sb = shingled.select(F.col("doc_id").alias("doc_b"), F.col("sh_hashes").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    truth = (
        sa.join(sb, F.col("doc_a") < F.col("doc_b"))
        .filter(inter / (F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b"))) >= _AUDIT_TAU)
        .select("doc_a", "doc_b")
    )
    sigs = shingled.select("doc_id", F.expr(_MH_SPARK_ARR).alias("sig"))
    bands = sigs.select("doc_id", F.posexplode("sig").alias("band0", "mh")).select(
        "doc_id", (F.col("band0") + 1).alias("band"), "mh"
    )
    buckets = (
        bands.groupBy("band", "mh")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
    )
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    "filter(flatten(transform(ids, a -> transform(ids, b -> struct(a, b)))),"
                    " p -> p.a < p.b)"
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
    )
    truth = scoped_persist(truth)
    cand = scoped_persist(cand)
    hits = cand.join(truth, ["doc_a", "doc_b"], "left_semi")
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_hits = hits.agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        n_truth.crossJoin(n_cand)
        .crossJoin(n_hits)
        .select(
            "n_truth",
            "n_candidates",
            "n_hits",
            (F.col("n_hits").cast("double") / F.col("n_candidates")).alias("precision"),
            (F.col("n_hits").cast("double") / F.col("n_truth")).alias("recall"),
        )
    )


# --- llm_dedup_keep_best: canonical-document selection -----------------------

# Clusters key on md5 of the normalized 40-char prefix (the fixture has
# no byte-exact duplicates but DOES have shared prefixes — the template-
# boilerplate pattern); the survivor policy is (longest, then lowest id),
# expressed as ONE max_by/arg_max aggregate on the composite key
# n_chars * 2^32 - doc_id (doc_id < 2^32 under the fixture generator's id
# space; a production run would widen to a struct comparator) so selection
# costs a single exchange carrying digests + two ints per cluster.
_KEEP_BEST_ORACLE = """
SELECT md5(substr(text, 1, 40)) AS cluster_key,
       arg_max(doc_id, n_chars * 4294967296 - doc_id) AS kept_doc_id,
       CAST(MAX(n_chars) AS BIGINT) AS kept_chars,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
FROM documents
GROUP BY md5(substr(text, 1, 40))
"""


@register("llm_dedup_keep_best", oracle=_KEEP_BEST_ORACLE, tags=("llm", "dedup"))
def llm_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection: cluster near-duplicates (here by
    normalized 40-char-prefix digest — the template/boilerplate key) and
    keep the BEST member of each cluster rather than an arbitrary one —
    dedup as curation. The survivor policy (longest document, ties to the
    lowest doc_id) is a deterministic total order, encoded as max_by over
    the composite integer n_chars * 2^32 - doc_id: one map-side-combinable aggregate, one
    exchange, and the shuffle carries (digest, two ints) per cluster —
    text never moves. This is the policy layer the hash-dedup family
    (llm_exact_dedup drops later copies; minhash clusters report pairs)
    deliberately leaves out."""
    apply_engine_conf(spark)
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy(
        F.md5(F.expr("substring(text, 1, 40)")).alias("cluster_key")
    ).agg(
        F.expr("max_by(doc_id, n_chars * 4294967296L - doc_id)").alias("kept_doc_id"),
        F.max("n_chars").cast("bigint").alias("kept_chars"),
        F.count(F.lit(1)).alias("n_members"),
        (F.count(F.lit(1)) - 1).cast("bigint").alias("n_dropped"),
    )


# --- llm_dup_spans: exact duplicated-span coverage ---------------------------

# Span-level exact dedup (the "deduplicating training data" substring
# family): the whole-doc operators above miss a document that is 40%
# boilerplate; this one measures, per document, the fraction of its token
# positions covered by an 8-token shingle that also occurs in ANOTHER
# document. Coverage of the union of fixed-length intervals needs no
# island bookkeeping: sorted by start, interval [i, i+K-1] contributes
# min(K, i - lag(i)) new tokens — one window, one aggregate, all integer.
# The corpus follows the module convention: deduplicated spans are
# synthesized in-query (every doc_id % 3 == 0 re-enters at +2_000_000
# minus its final token), so both engines build the identical corpus.
_SPAN_K = 8

_DUP_SPANS_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, {drop_last_token_duckdb("text")}
  FROM documents WHERE doc_id % 3 = 0
),
arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM corpus),
sh AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         md5(array_to_string(a[i:i + {_SPAN_K - 1}], ' ')) AS h
  FROM arr, UNNEST(range(1, len(a) - {_SPAN_K - 2})) AS u(i)
  WHERE len(a) >= {_SPAN_K}
),
dup AS (SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
m AS (SELECT s.doc_id, s.i FROM sh s JOIN dup d USING (h)),
cov AS (
  SELECT doc_id,
         LEAST({_SPAN_K}, i - COALESCE(
           LAG(i) OVER (PARTITION BY doc_id ORDER BY i), i - {_SPAN_K})) AS added
  FROM m
),
agg AS (
  SELECT doc_id, CAST(SUM(added) AS BIGINT) AS covered_tokens
  FROM cov GROUP BY doc_id
)
SELECT g.doc_id, CAST(len(ar.a) AS BIGINT) AS n_tokens, g.covered_tokens,
       CAST(g.covered_tokens AS DOUBLE) / len(ar.a) AS dup_frac
FROM agg g JOIN arr ar USING (doc_id)
"""


@register("llm_dup_spans", oracle=_DUP_SPANS_ORACLE, tags=("llm", "dedup", "text"))
def llm_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span coverage: the fraction of token
    positions covered by an exact 8-token shingle shared with another
    document — the span-level dedup signal (boilerplate, licence
    blocks, templated text) that whole-document digests and MinHash both
    miss. Pipeline: map-side shingle explode from the token ARRAY (no
    window needed to build shingles — transform over sequence, zero
    exchange), hash-aggregate on the shingle digest to find cross-doc
    spans, join the duplicated digests back (AQE broadcasts the small
    dup side), then ONE window per doc turns sorted start positions into
    exact union-coverage via min(K, gap) — no island machinery. Every
    exchange carries (doc_id, pos, md5) — the text never shuffles; at
    100 TB the digest aggregate is the only big shuffle and it is
    map-side combinable. Coverage arithmetic is all-integer until the
    final division, so the result is engine-exact."""
    apply_engine_conf(spark)
    docs = table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionAll(
        docs.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"),
            F.expr(drop_last_token_spark("text")).alias("text"),
        )
    )
    # one-row-group fixture scans are 1 task; the 8-token shingle md5
    # explode is the heavy map work — spread first (OPTIMIZATION_r10.md)
    arr = rebalance_for_map(corpus, spark).select(
        "doc_id", F.split("text", " ").alias("a")
    )
    sh = (
        arr.filter(F.size("a") >= _SPAN_K)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(a) - {_SPAN_K - 1}), "
                    f"i -> struct(CAST(i AS BIGINT) AS i, "
                    f"md5(concat_ws(' ', slice(a, i, {_SPAN_K}))) AS h))"
                )
            ).alias("s"),
        )
        .select("doc_id", F.col("s.i").alias("i"), F.col("s.h").alias("h"))
    )
    dup = sh.groupBy("h").agg(F.countDistinct("doc_id").alias("nd")).filter(
        F.col("nd") >= 2
    )
    m = sh.join(dup.select("h"), "h").select("doc_id", "i")
    w = Window.partitionBy("doc_id").orderBy("i")
    cov = m.select(
        "doc_id",
        F.least(
            F.lit(_SPAN_K),
            F.col("i") - F.coalesce(F.lag("i").over(w), F.col("i") - _SPAN_K),
        ).alias("added"),
    )
    agg = cov.groupBy("doc_id").agg(F.sum("added").cast("bigint").alias("covered_tokens"))
    return agg.join(arr, "doc_id").select(
        "doc_id",
        F.size("a").cast("bigint").alias("n_tokens"),
        "covered_tokens",
        (F.col("covered_tokens").cast("double") / F.size("a")).alias("dup_frac"),
    )


# --- llm_ngram_containment: directional sub-document detection ----------------

# Jaccard misses the "A is a chunk of B" case: a 50-token quote inside a
# 5000-token page has tiny Jaccard but containment(A in B) ≈ 1.0.
# Containment C(A→B) = |sh(A) ∩ sh(B)| / |sh(A)| is the DIRECTIONAL
# overlap measure sub-document dedup needs (boilerplate quotes, nested
# crawls, prompt-in-completion leaks). Same bounded ground-truth panel as
# llm_ngram_jaccard (doc_id < 100 — the exact twin of the banded
# approximate paths); the intersection is computed ONCE per unordered
# pair, then fanned map-side into both directions with each side's own
# denominator. Integer counts, exact-operand division.
_CONTAIN_MIN = 0.30

_NGRAM_CONTAIN_ORACLE = f"""
WITH sub AS (
  SELECT doc_id, list_distinct({shingles_duckdb(tokens_duckdb('text'))}) AS sh
  FROM documents WHERE doc_id < 100
),
e AS (SELECT doc_id, UNNEST(sh) AS s FROM sub),
inter AS (
  SELECT a.doc_id AS lo, b.doc_id AS hi, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
dirs AS (
  SELECT lo AS doc_a, hi AS doc_b, n_inter FROM inter
  UNION ALL
  SELECT hi AS doc_a, lo AS doc_b, n_inter FROM inter
),
sz AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n FROM sub)
SELECT d.doc_a, d.doc_b, d.n_inter, sz.n AS n_a,
       CAST(d.n_inter AS DOUBLE) / sz.n AS containment
FROM dirs d JOIN sz ON sz.doc_id = d.doc_a
WHERE CAST(d.n_inter AS DOUBLE) / sz.n >= {_CONTAIN_MIN}
"""


@register("llm_ngram_containment", oracle=_NGRAM_CONTAIN_ORACLE, tags=("llm", "dedup"))
def llm_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional n-gram containment C(A→B) = |sh(A)∩sh(B)| / |sh(A)| on
    the bounded ground-truth panel — the sub-document dedup measure that
    catches "A is a chunk of B" pairs symmetric Jaccard under-scores.

    Scale shape: the shared-shingle equi-join computes each unordered
    intersection ONCE (shingle strings meet only inside the join; the
    pair stream carries ids + counts), explode() fans the pair into its
    two directions MAP-SIDE, and the per-side denominator arrives by an
    id-keyed join of the tiny size table. The panel bound makes the
    quadratic tail explicit — the production path at 100 TB is the same
    candidates-then-verify recipe with LSH candidates (llm_minhash_dedup)
    feeding this exact containment verify."""
    apply_engine_conf(spark)
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    sub = docs.select(
        "doc_id",
        F.array_distinct(F.expr(shingles_spark(tokens_spark("text")))).alias("sh"),
    )
    e = sub.select("doc_id", F.explode("sh").alias("s"))
    e2 = e.select(F.col("doc_id").alias("hi"), F.col("s").alias("s_b"))
    inter = (
        e.join(e2, (e.s == e2.s_b) & (e.doc_id < e2.hi))
        .groupBy(F.col("doc_id").alias("lo"), "hi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    dirs = inter.select(
        F.explode(
            F.array(
                F.struct(F.col("lo").alias("doc_a"), F.col("hi").alias("doc_b")),
                F.struct(F.col("hi").alias("doc_a"), F.col("lo").alias("doc_b")),
            )
        ).alias("p"),
        "n_inter",
    ).select("p.doc_a", "p.doc_b", "n_inter")
    sz = sub.select(
        F.col("doc_id").alias("doc_a"), F.size("sh").cast("bigint").alias("n_a")
    )
    cont = F.col("n_inter").cast("double") / F.col("n_a")
    return (
        dirs.join(sz, "doc_a")
        .select("doc_a", "doc_b", "n_inter", "n_a", cont.alias("containment"))
        .filter(F.col("containment") >= _CONTAIN_MIN)
    )


# --- llm_simhash_neardup: banded-Hamming LSH pairing over wide SimHash --------

# llm_simhash produces FINGERPRINTS; this op closes the loop and finds the
# PAIRS — the production simhash dedup (Manku/Jain/Sarma, WWW'07): a wide
# fingerprint split into b bands such that any pair within Hamming
# distance d < b must agree exactly on at least one band (pigeonhole), so
# candidates come from band-equality buckets and only candidates pay the
# exact Hamming check. The 24-bit llm_simhash fingerprint is too narrow
# to band at scale (64-value bands -> quadratic buckets), so this op
# widens the per-token hash to 60 bits (15 md5 hex digits, sign-safe in
# BIGINT) and bands 4 x 15 bits: Hamming <= 3 pairs are GUARANTEED to
# collide in >= 1 of the 4 bands.
_SH2_BITS = 60
_SH2_BANDS = 4
_SH2_BAND_BITS = 15
_SH2_HAMMING_MAX = 3

# empty tokens are dropped BEFORE hashing: Spark's split('', ' ') yields
# [''] while DuckDB's string_split yields [] (adversarial-fixture finding
# on the empty-string twin of a single-token doc), and a whitespace
# tokenizer should not emit empty tokens in either engine anyway
_sh2_tok_spark = (
    "transform(filter({toks}, t -> t <> ''), "
    "t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"
)
_sh2_tok_duck = (
    "list_transform(list_filter({toks}, t -> t <> ''), "
    "t -> CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT))"
)
_sh2_sum_cols_spark = ", ".join(
    f"SUM(CASE WHEN (shiftright(h, {j}) & 1) = 1 THEN 1 ELSE -1 END) AS b{j}"
    for j in range(_SH2_BITS)
)
_sh2_sum_cols_duck = ", ".join(
    f"SUM(CASE WHEN ((h >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS b{j}"
    for j in range(_SH2_BITS)
)
_sh2_fold = " + ".join(
    f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(_SH2_BITS)
)
_SH2_BAND_MASK = (1 << _SH2_BAND_BITS) - 1

_SIMHASH_NEARDUP_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, {drop_last_token_duckdb('text')} AS text
  FROM documents
),
tok AS (
  SELECT doc_id, UNNEST({_sh2_tok_duck.format(toks=tokens_duckdb('text'))}) AS h
  FROM corpus
),
fp AS (
  SELECT doc_id, CAST({_sh2_fold} AS BIGINT) AS f
  FROM (SELECT doc_id, {_sh2_sum_cols_duck} FROM tok GROUP BY doc_id)
),
bands AS (
  SELECT doc_id, f, t.i AS band,
         (f >> (t.i * {_SH2_BAND_BITS})) & {_SH2_BAND_MASK} AS bv
  FROM fp, UNNEST(range(0, {_SH2_BANDS})) AS t(i)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.f AS f_a, b.f AS f_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(f_a, f_b)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(f_a, f_b)) <= {_SH2_HAMMING_MAX}
"""


@register("llm_simhash_neardup", oracle=_SIMHASH_NEARDUP_ORACLE, tags=("llm", "dedup"))
def llm_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate PAIRS via banded-Hamming LSH — the production
    simhash dedup loop (llm_simhash stops at fingerprints): 60-bit
    fingerprint, 4 bands x 15 bits, so any pair within Hamming <= 3 shares
    at least one exact band (pigeonhole recall guarantee); candidates come
    from ONE groupBy(band, bv) bucket exchange carrying (doc_id, fp) only
    — the llm_minhash_dedup pairing shape — and just the candidates pay
    bit_count(xor) verification.

    Scale shape: fingerprints are per-row votes (linear, no shuffle until
    the 16-byte band rows); 15-bit bands keep buckets near-singleton at
    fixture scale, and the documented production widening (64-bit fp,
    4 x 16 bands) is the same plan with different constants. Near-dups
    synthesized as drop-last-token twins, as in llm_minhash_dedup."""
    apply_engine_conf(spark)
    # the bucket pair-expansion + hamming verify stage reads < 1 MB of
    # (band, bv) buckets but runs nested per-bucket transforms — AQE's
    # byte-based coalescing folded it onto ONE task (0.92 s CPU at sf0.1,
    # profiled r11). Same compute-blind-coalescing fix as
    # llm_minhash_dedup; restored by the next query's apply_engine_conf.
    set_compute_dense_floor(spark)
    docs = table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.expr(drop_last_token_spark("text")).alias("text"),
        )
    )
    corpus = rebalance_for_map(corpus, spark)
    tok = corpus.select(
        "doc_id",
        F.explode(F.expr(_sh2_tok_spark.format(toks=tokens_spark("text")))).alias("h"),
    )
    bits = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))) == 1, 1
                ).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(_SH2_BITS)
        ]
    )
    fold = None
    for j in range(_SH2_BITS):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fold = term if fold is None else fold + term
    fp = bits.select("doc_id", fold.cast("long").alias("f"))
    bands = fp.select(
        "doc_id",
        "f",
        F.explode(F.sequence(F.lit(0), F.lit(_SH2_BANDS - 1))).alias("band"),
    ).select(
        "doc_id",
        "f",
        "band",
        F.expr(
            f"shiftright(f, cast(band * {_SH2_BAND_BITS} as int))"
            f" & {_SH2_BAND_MASK}"
        ).alias("bv"),
    )
    buckets = (
        bands.groupBy("band", "bv")
        .agg(F.collect_list(F.struct("doc_id", "f")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    "filter(flatten(transform(ids, a -> transform(ids, b -> "
                    "named_struct('doc_a', a.doc_id, 'doc_b', b.doc_id, "
                    "'f_a', a.f, 'f_b', b.f)))), p -> p.doc_a < p.doc_b)"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b", "p.f_a", "p.f_b")
        .distinct()
    )
    hamming = F.bit_count(F.expr("f_a ^ f_b")).cast("bigint")
    return (
        cand.select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= _SH2_HAMMING_MAX)
    )


# --- llm_cross_dedup: LSH decontamination across two corpora -------------------

# llm_decontaminate answers "which training docs CONTAIN eval n-grams";
# this is the fuzzy-document complement: which training docs are NEAR
# DUPLICATES of an eval document (paraphrased or truncated contamination
# that exact n-gram containment under-counts). Same MinHash/LSH machinery
# as llm_minhash_dedup (wide shingle modulus, array<int> wire format),
# with the two corpora tagged by side and the in-bucket pair expansion
# emitting ONLY cross-side pairs — within-train near-dups (the dedup
# problem, not the contamination problem) never materialize, which at
# 100 TB is most of the candidate volume.
_XDEDUP_EVAL_DOCS = 50  # synthesized eval panel: truncated twins of these

_CROSS_DEDUP_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text, 0 AS side FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, {drop_last_token_duckdb('text')} AS text,
         1 AS side
  FROM documents WHERE doc_id < {_XDEDUP_EVAL_DOCS}
),
hashed AS (
  SELECT doc_id, side, {token_hashes_duckdb(tokens_duckdb('text'))} AS th FROM corpus
),
shingled AS (
  SELECT doc_id, side,
         list_distinct({shingle_hashes_duckdb('th', mod=SHINGLE_MOD_WIDE)}) AS sh
  FROM hashed
  WHERE len({shingle_hashes_duckdb('th', mod=SHINGLE_MOD_WIDE)}) > 0
),
sigs AS (SELECT doc_id, side, sh, {_MH_DUCK_ARR.replace("sh_hashes", "sh")} AS sig FROM shingled),
bands AS (
  SELECT doc_id, side, i AS band, sig[i] AS mh
  FROM sigs, UNNEST(range(1, 9)) AS t(i)
),
cand AS (
  SELECT DISTINCT a.doc_id AS train_doc, b.doc_id AS eval_doc
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.mh = b.mh AND a.side = 0 AND b.side = 1
),
verified AS (
  SELECT c.train_doc, c.eval_doc,
         len(list_intersect(sa.sh, sb.sh)) AS n_inter,
         len(sa.sh) AS n_a, len(sb.sh) AS n_b
  FROM cand c
  JOIN shingled sa ON sa.doc_id = c.train_doc
  JOIN shingled sb ON sb.doc_id = c.eval_doc
)
SELECT train_doc, eval_doc,
       CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) AS jaccard
FROM verified
WHERE CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) >= 0.6
"""


@register("llm_cross_dedup", oracle=_CROSS_DEDUP_ORACLE, tags=("llm", "dedup"))
def llm_cross_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus fuzzy decontamination: MinHash/LSH near-duplicate
    pairs between the training corpus and an eval panel (synthesized as
    truncated twins of the first docs), reporting (train_doc, eval_doc,
    jaccard >= 0.6). The contamination llm_decontaminate's exact n-gram
    containment under-counts — paraphrase/truncation — surfaces here.

    Scale shape: identical exchanges to llm_minhash_dedup (wide-modulus
    array<int> shingles, ONE groupBy(band, mh) bucket exchange,
    SHUFFLE_HASH verify build from the 16-byte pairs), but the in-bucket
    expansion emits ONLY train x eval pairs — within-train candidates,
    the bulk of bucket volume at corpus scale, never exist. The eval
    side is tiny and could broadcast; the plan keeps the symmetric form
    so the same query serves eval panels of any size."""
    apply_engine_conf(spark)
    docs = table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text", F.lit(0).alias("side")).unionByName(
        docs.filter(F.col("doc_id") < _XDEDUP_EVAL_DOCS).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.expr(drop_last_token_spark("text")).alias("text"),
            F.lit(1).alias("side"),
        )
    )
    corpus = rebalance_for_map(corpus, spark)
    # tokens >= 3 == non-empty shingle list; cheap pre-filter, never a
    # predicate on the computed array (the llm_minhash_dedup 20x lesson)
    corpus = corpus.filter(F.size(F.split(F.col("text"), " ")) >= 3)
    hashed = corpus.select(
        "doc_id", "side",
        F.expr(token_hashes_spark_sql(tokens_spark("text"))).alias("th"),
    )
    shingled = scoped_persist(
        hashed.select(
            "doc_id",
            "side",
            F.array_distinct(
                F.expr(shingle_hashes_spark_sql("th", mod=SHINGLE_MOD_WIDE))
            )
            .cast("array<int>")
            .alias("sh"),
        )
    )
    sigs = shingled.select(
        "doc_id", "side", F.expr(_MH_SPARK_ARR_INT.replace("sh_hashes", "sh")).alias("sig")
    )
    bands = sigs.select(
        "doc_id", "side", F.posexplode("sig").alias("band0", "mh")
    ).select("doc_id", "side", (F.col("band0") + 1).alias("band"), "mh")
    buckets = (
        bands.groupBy("band", "mh")
        .agg(F.collect_list(F.struct("doc_id", "side")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    "filter(flatten(transform(ids, a -> transform(ids, b -> "
                    "named_struct('train_doc', a.doc_id, 'eval_doc', b.doc_id, "
                    "'sa', a.side, 'sb', b.side)))), "
                    "p -> p.sa = 0 AND p.sb = 1)"
                )
            ).alias("p")
        )
        .select("p.train_doc", "p.eval_doc")
        .distinct()
    )
    sa = shingled.select(F.col("doc_id").alias("train_doc"), F.col("sh").alias("sh_a"))
    sb = shingled.select(F.col("doc_id").alias("eval_doc"), F.col("sh").alias("sh_b"))
    verified = (
        cand.hint("shuffle_hash")
        .join(sa, "train_doc")
        .join(sb, "eval_doc")
        .select(
            "train_doc",
            "eval_doc",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("n_inter"),
            F.size("sh_a").cast("long").alias("n_a"),
            F.size("sh_b").cast("long").alias("n_b"),
        )
    )
    jac = F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        verified.select("train_doc", "eval_doc", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.6)
    )


# --- llm_prefix_dedup: boilerplate prefix clustering ---------------------------

# Web corpora are full of template families that exact dedup misses: the
# same banner/header/license preamble followed by different bodies. The
# standard screen (used alongside llm_template_detect's shape signatures)
# clusters documents on the HASH of their first-k-token prefix — catches
# shared boilerplate openings without paying near-dup machinery. k = 8
# tokens; documents shorter than k have no full prefix and are excluded
# (a 3-token doc "matching" an 8-token prefix family is noise, and the
# guard also keeps NULL/short hostile rows out — the llm_minhash_dedup
# lesson).
_PREFIX_DEDUP_ORACLE = """
WITH p AS (
  SELECT doc_id,
         array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ') AS prefix
  FROM documents
  WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 8
)
SELECT md5(prefix) AS prefix_hash,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS canonical_doc,
       MIN(prefix) AS prefix
FROM p GROUP BY md5(prefix)
HAVING COUNT(*) > 1
"""


@register("llm_prefix_dedup", oracle=_PREFIX_DEDUP_ORACLE, tags=("llm", "dedup"))
def llm_prefix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-prefix clusters: documents sharing their first 8
    tokens, grouped on the md5 of the prefix — the template-opening
    screen between llm_exact_dedup (whole doc) and llm_line_dedup (per
    line). Clusters report size, canonical member, and the prefix text
    (identical within a cluster, so MIN is free).

    Scale shape: the groupBy key is a 32-byte digest, so the exchange
    carries (digest, doc_id, 8-token prefix) — never the document; the
    aggregate combines map-side and the HAVING prunes singleton groups
    before any row leaves the final aggregation."""
    apply_engine_conf(spark)
    docs = table(spark, sf_dir, "documents")
    p = (
        docs.filter(F.col("text").isNotNull())
        .filter(F.size(F.split("text", " ")) >= 8)
        .select(
            "doc_id",
            F.array_join(F.slice(F.split("text", " "), 1, 8), " ").alias("prefix"),
        )
    )
    return (
        p.groupBy(F.md5("prefix").alias("prefix_hash"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("canonical_doc"),
            F.min("prefix").alias("prefix"),
        )
        .filter(F.col("n_docs") > 1)
    )

# --- llm_lsh_tune: MinHash-LSH band-configuration sensitivity audit ------------

# The knob the minhash family keeps citing ("band width retune"), made an
# oracle-checked number: for every ground-truth pair of the bounded exact
# panel (the llm_ngram_jaccard subset), the probability that MinHash LSH
# with 8 hashes CATCHES the pair under each way of splitting the
# signature into bands — b=8 one-row bands (the family's production
# config), b=4 two-row, b=2 four-row: p = 1 - (1 - s^r)^b. Every power
# is an integer exponent expanded as NAMED square-and-multiply
# intermediates (q2 = q*q, q4 = q2*q2 ...), so both engines run the same
# correctly-rounded IEEE multiply tree — no libm pow whose 1-ulp license
# could split the engines. The S-curve trade-off is visible per row:
# wide bands catch high-similarity pairs only, one-row bands catch
# everything including noise.
_LSH_TUNE_ORACLE = f"""
WITH sub AS (
  SELECT doc_id, list_distinct({shingles_duckdb(tokens_duckdb('text'))}) AS sh
  FROM documents WHERE doc_id < 100
),
e AS (SELECT doc_id, UNNEST(sh) AS s FROM sub),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sz AS (SELECT doc_id, len(sh) AS n FROM sub),
j AS (
  SELECT doc_a, doc_b,
         CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS s
  FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.05
),
p1 AS (SELECT doc_a, doc_b, s, 1.0e0 - s AS q, s * s AS x2 FROM j),
p2 AS (SELECT *, q * q AS q2, 1.0e0 - x2 AS u, x2 * x2 AS x4 FROM p1),
p3 AS (SELECT *, q2 * q2 AS q4, u * u AS u2, 1.0e0 - x4 AS v FROM p2),
p4 AS (SELECT *, q4 * q4 AS q8, u2 * u2 AS u4, v * v AS v2 FROM p3)
SELECT doc_a, doc_b, ROUND(s, 9) AS jaccard,
       ROUND(1.0e0 - q8, 9) AS p_b8_r1,
       ROUND(1.0e0 - u4, 9) AS p_b4_r2,
       ROUND(1.0e0 - v2, 9) AS p_b2_r4
FROM p4
"""


@register("llm_lsh_tune", oracle=_LSH_TUNE_ORACLE, tags=("llm", "dedup"))
def llm_lsh_tune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-configuration audit: detection probability
    1 - (1 - s^r)^b per ground-truth panel pair for the three ways of
    splitting the 8-hash MinHash signature (8x1 / 4x2 / 2x4) — the
    S-curve evidence behind the family's band-width knob, as an
    oracle-checked report. All powers are named square-and-multiply
    columns (see header comment; zero libm).

    Scale shape: rides the SAME bounded exact panel as llm_ngram_jaccard
    (doc_id < 100 — the ground-truth side is quadratic by nature and
    deliberately capped); the probability algebra is per-row projection
    work. Tuning at 100 TB = running this panel on a sampled slice, which
    is exactly what the bound expresses."""
    apply_engine_conf(spark)
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    sub = docs.select(
        "doc_id",
        F.array_distinct(F.expr(shingles_spark(tokens_spark("text")))).alias("sh"),
    )
    e = sub.select("doc_id", F.explode("sh").alias("s"))
    e2 = e.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("s_b"))
    inter = (
        e.join(e2, (e.s == e2.s_b) & (e.doc_id < e2.doc_b))
        .groupBy(F.col("doc_id").alias("doc_a"), "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz = sub.select("doc_id", F.size("sh").alias("n"))
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    s = F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    j = (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select("doc_a", "doc_b", s.alias("s"))
        .filter(F.col("s") >= 0.05)
    )
    p1 = j.select(
        "doc_a", "doc_b", "s",
        (F.lit(1.0) - F.col("s")).alias("q"),
        (F.col("s") * F.col("s")).alias("x2"),
    )
    p2 = p1.select(
        "*",
        (F.col("q") * F.col("q")).alias("q2"),
        (F.lit(1.0) - F.col("x2")).alias("u"),
        (F.col("x2") * F.col("x2")).alias("x4"),
    )
    p3 = p2.select(
        "*",
        (F.col("q2") * F.col("q2")).alias("q4"),
        (F.col("u") * F.col("u")).alias("u2"),
        (F.lit(1.0) - F.col("x4")).alias("v"),
    )
    p4 = p3.select(
        "*",
        (F.col("q4") * F.col("q4")).alias("q8"),
        (F.col("u2") * F.col("u2")).alias("u4"),
        (F.col("v") * F.col("v")).alias("v2"),
    )
    return p4.select(
        "doc_a", "doc_b",
        F.round("s", 9).alias("jaccard"),
        F.round(F.lit(1.0) - F.col("q8"), 9).alias("p_b8_r1"),
        F.round(F.lit(1.0) - F.col("u4"), 9).alias("p_b4_r2"),
        F.round(F.lit(1.0) - F.col("v2"), 9).alias("p_b2_r4"),
    )

# --- llm_minhash_est_err: signature-estimate error vs exact Jaccard ------------

# Closes the minhash family's audit triangle: llm_dedup_audit pins
# candidate RECALL, llm_lsh_tune pins the band S-curve, and this one pins
# the ESTIMATOR itself — on the bounded ground-truth panel, compare the
# 8-hash signature agreement fraction (the unbiased MinHash Jaccard
# estimator, matching positions / k) against the exact shingle Jaccard.
# Both engines build the IDENTICAL signatures (same md5-derived shingle
# hashes, same universal-hash parameters), so agreement counts are pure
# integers; est, exact and their error close as identical doubles. The
# per-pair error is the number that justifies (or indicts) k = 8.
_MH_EST_SPARK = "array(" + ", ".join(minhash_signature_spark_sql("sh", 8)) + ")"
_MH_EST_DUCK = "[" + ", ".join(minhash_signature_duckdb("sh", 8)) + "]"

_MINHASH_EST_ORACLE = f"""
WITH sub AS (
  SELECT doc_id,
         list_distinct({shingle_hashes_duckdb(token_hashes_duckdb(tokens_duckdb('text')), mod=SHINGLE_MOD_WIDE)}) AS sh
  FROM documents WHERE doc_id < 100
),
nonempty AS (SELECT * FROM sub WHERE len(sh) > 0),
sigs AS (SELECT doc_id, sh, {_MH_EST_DUCK} AS sig FROM nonempty),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.sh, b.sh)) AS n_inter,
         len(a.sh) AS n_a, len(b.sh) AS n_b,
         len(list_filter(range(1, 9), i -> a.sig[i] = b.sig[i])) AS n_match
  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(n_match AS BIGINT) AS sig_matches,
       ROUND(CAST(n_match AS DOUBLE) / 8.0e0, 9) AS jaccard_est,
       ROUND(CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter), 9) AS jaccard_exact,
       ROUND(CAST(n_match AS DOUBLE) / 8.0e0
             - CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter), 9) AS est_error
FROM pairs
WHERE CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) >= 0.05
"""


@register("llm_minhash_est_err", oracle=_MINHASH_EST_ORACLE, tags=("llm", "dedup"))
def llm_minhash_est_err(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator audit: signature-agreement Jaccard estimate
    (matches/8) vs exact shingle Jaccard per ground-truth panel pair,
    with the signed error — the third leg of the dedup audit triangle
    (llm_dedup_audit = recall, llm_lsh_tune = band S-curve, this =
    estimator bias/variance at k=8). Identical integer signatures in
    both engines; see header comment.

    Scale shape: panel-bounded (ground truth is quadratic by nature);
    signatures and shingle sets are computed once per doc on the <= 100
    panel rows, the pair join carries 8-int signatures + hash sets.
    Corpus-scale estimator audits run this on sampled panels."""
    apply_engine_conf(spark)
    docs = table(spark, sf_dir, "documents").filter(
        # tokens >= 3 == non-empty shingle list; cheap pre-filter, never
        # a predicate on the computed array (the llm_minhash_dedup 20x
        # lesson)
        (F.col("doc_id") < 100) & (F.size(F.split(F.col("text"), " ")) >= 3)
    )
    # round-11 (profiled: two ~0.9 s single-task stages at sf0.1): (1) the
    # token-hash transform was nested INSIDE the shingle lambda, so every
    # element_at re-evaluated the whole md5 token array — O(n²) md5 calls
    # per doc (the llm_ngram_novelty bug); materialize th first. (2) sigs
    # feeds BOTH sides of the pair join and was recomputed per side —
    # cache the ≤100-row panel instead.
    hashed = docs.select(
        "doc_id", F.expr(token_hashes_spark_sql(tokens_spark("text"))).alias("th")
    )
    sub = hashed.select(
        "doc_id",
        F.array_distinct(
            F.expr(shingle_hashes_spark_sql("th", mod=SHINGLE_MOD_WIDE))
        ).alias("sh"),
    )
    sigs = scoped_persist(
        sub.select("doc_id", "sh", F.expr(_MH_EST_SPARK).alias("sig"))
    )
    a = sigs.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"), F.col("sig").alias("sig_a")
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"), F.col("sig").alias("sig_b")
    )
    pairs = a.join(b, F.col("doc_a") < F.col("doc_b")).select(
        "doc_a", "doc_b",
        F.size(F.array_intersect("sh_a", "sh_b")).alias("n_inter"),
        F.size("sh_a").alias("n_a"),
        F.size("sh_b").alias("n_b"),
        F.size(
            F.expr("filter(sequence(1, 8), i -> element_at(sig_a, i) = element_at(sig_b, i))")
        ).alias("n_match"),
    )
    exact = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    est = F.col("n_match").cast("double") / F.lit(8.0)
    return pairs.filter(exact >= 0.05).select(
        "doc_a", "doc_b",
        F.col("n_match").cast("bigint").alias("sig_matches"),
        F.round(est, 9).alias("jaccard_est"),
        F.round(exact, 9).alias("jaccard_exact"),
        F.round(est - exact, 9).alias("est_error"),
    )
