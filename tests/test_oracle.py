"""Replay the driver's DuckDB-oracle comparison for every registered query.

This is the gate the driver applies at sf0.01 (CORRECTNESS_r{N}.json); we run
it at sf0.001 by default for speed (set SPARK_GRAFT_TEST_SF_DIR to override).
Any query with an oracle must match exactly; rows-only queries must at least
execute and return a stable schema.
"""

from __future__ import annotations

import pytest

from air_quality_data_pipeline_spark.oracle import check_query
from air_quality_data_pipeline_spark.registry import load_all_queries

SPECS = load_all_queries()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.builder(spark, sf_dir)
    problems = check_query(df, spec.oracle, sf_dir)
    assert not problems, f"{name}: " + " | ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.builder(spark, sf_dir)
    # must execute and produce a stable, non-empty schema; count must not throw
    assert df.columns, f"{name}: empty schema"
    n = df.count()
    assert n >= 0
