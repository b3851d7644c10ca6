"""Round-10 optimization gates.

The vector fold helpers gained an unrolled 64-wide codegen fast path
(functions/vectors.py). These tests pin the optimization contract:

1. Bit-exact equivalence of the fast path against the reference fold on
   the real fixture embeddings AND on hostile inputs the fast path must
   route to the fallback (short arrays, long arrays, null elements, null
   arrays, zero vectors, denormals) — NULLness included.
2. The fast path is actually taken for 64-wide input (plan contains no
   `aggregate(` for a pure 64-wide projection).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from air_quality_data_pipeline_spark.functions.vectors import (
    _fold_dot,
    _fold_sqnorm,
    cosine_similarity_unrolled,
    dot_product_unrolled,
    l2_norm_unrolled,
)


def _ref_dot(a, b):
    return _fold_dot(a, b)


def _ref_norm(a):
    return F.sqrt(_fold_sqnorm(a))


def _ref_cosine(a, b):
    denom = _ref_norm(a) * _ref_norm(b)
    return F.when(denom != 0.0, _ref_dot(a, b) / denom)


HOSTILE_ROWS = [
    ([0.0] * 64, [0.0] * 64),                      # zero vectors (NULL cosine)
    ([0.25] * 64, [0.25] * 64),                    # constant
    ([0.25] * 64, [-0.25] * 64),                   # antipodal
    ([2.0**-60] + [0.0] * 63, [1024.0] + [0.0] * 63),  # tiny x huge
    ([0.1] * 3, [0.2] * 3),                        # short pair -> fallback
    ([0.1] * 3, [0.2] * 64),                       # mismatched -> fallback (NULL dot)
    ([0.1] * 70, [0.2] * 70),                      # longer than contract -> fallback
    (None, [0.5] * 64),                            # null array
    ([float("nan")] + [0.5] * 63, [0.5] * 64),     # NaN element
    ([1e308] * 64, [1e308] * 64),                  # overflow to inf
    # 64-wide array with a NULL element: the UNROLLED branch (not the
    # fallback) must reproduce the fold's NULL propagation (ADVICE r10 —
    # the one shape where the fast path itself handles element NULLs)
    ([0.5] * 30 + [None] + [0.5] * 33, [0.5] * 64),
]


@pytest.fixture(scope="module")
def hostile_df(spark):
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(HOSTILE_ROWS)],
        "id int, a array<double>, b array<double>",
    )


def _assert_identical(df):
    """Every row must agree bitwise (NaN==NaN, NULL==NULL, signed zeros kept)."""
    bits = (
        "CASE WHEN {c} IS NULL THEN 'null' WHEN isnan({c}) THEN 'nan' "
        "ELSE reflect('java.lang.Double', 'doubleToRawLongBits', {c}) END"
    )
    bad = df.filter(
        ~F.expr(bits.format(c="ref")).eqNullSafe(F.expr(bits.format(c="opt")))
    )
    rows = bad.collect()
    assert not rows, f"fast path diverges from fold: {rows[:5]}"


def test_hostile_dot_bitexact(spark, hostile_df):
    _assert_identical(
        hostile_df.select(
            _ref_dot(F.col("a"), F.col("b")).alias("ref"),
            dot_product_unrolled(F.col("a"), F.col("b")).alias("opt"),
        )
    )


def test_hostile_norm_bitexact(spark, hostile_df):
    _assert_identical(
        hostile_df.select(
            _ref_norm(F.col("a")).alias("ref"), l2_norm_unrolled(F.col("a")).alias("opt")
        )
    )


def test_hostile_cosine_bitexact(spark, hostile_df):
    _assert_identical(
        hostile_df.select(
            _ref_cosine(F.col("a"), F.col("b")).alias("ref"),
            cosine_similarity_unrolled(F.col("a"), F.col("b")).alias("opt"),
        )
    )


def test_fixture_cosine_bitexact(spark, sf_dir):
    """All-pairs-ish check on the real fixture: every vector vs 5 probes."""
    v = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("vec")
    )
    q = v.filter(F.col("vec_id") < 5).select(F.col("vec").alias("qvec"))
    df = v.join(F.broadcast(q)).select(
        _ref_cosine(F.col("qvec"), F.col("vec")).alias("ref"),
        cosine_similarity_unrolled(F.col("qvec"), F.col("vec")).alias("opt"),
    )
    _assert_identical(df)


def test_unrolled_path_in_plan(spark):
    """A 64-wide literal projection must NOT plan the interpreted fold
    on its hot branch; the fold survives only inside the CASE fallback."""
    df = spark.range(1).select(
        dot_product_unrolled(
            F.expr("array_repeat(cast(id as double) + 1.0, 64)"),
            F.expr("array_repeat(cast(id as double) + 2.0, 64)"),
        ).alias("d")
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "CASE WHEN" in plan, plan
    # the unrolled branch is the get()-chain, the fold only in the fallback
    assert plan.count("aggregate(") == 1, plan
    assert df.collect()[0]["d"] == 128.0
