"""Repo-wide hash-inside-Filter gate (VERDICT r8 item 7).

The round-8 20x regression class: an optimizer rule
(PushPredicateThroughNonJoin alias substitution, InferFiltersFromConstraints,
InferFiltersFromGenerate) relocates a filter through a projection that
defines a hash-bearing column, re-evaluating the md5/sha2/conv chain per row
inside a Filter node — silently doubling (or, for per-token chains, 20x-ing)
an operator's CPU. test_plans.py pins the minhash family; THIS gate sweeps
EVERY registered query's executed plan so a future operator can't
reintroduce the class.

Allowlist: operators where the hash IS the row-selection semantics
(hash-mod sampling / panel selection — evaluated once per row by design,
triaged in BASELINE.md round-8 sweep).
"""

from __future__ import annotations

import pytest

from air_quality_data_pipeline_spark.registry import load_all_queries

SPECS = load_all_queries()
ALL_NAMES = sorted(SPECS)

# hash evaluation in a Filter is the INTENDED selection predicate here
HASH_FILTER_ALLOWED = {
    "sample_hash",  # hash-mod row sampling: the filter IS the sample
    "mm_patch_grid",  # hash-selected doc panel: the filter IS the panel
}

_HASH_TOKENS = ("md5(", "sha2(", "sha1(", "conv(")


@pytest.mark.parametrize("name", ALL_NAMES)
def test_no_hash_chain_inside_filter(spark, sf_dir, name):
    if name in HASH_FILTER_ALLOWED:
        pytest.skip("hash-in-filter is the operator's selection semantics")
    df = SPECS[name].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    offenders = [
        ln.strip()[:200]
        for ln in plan.splitlines()
        if "Filter" in ln and any(tok in ln for tok in _HASH_TOKENS)
    ]
    assert not offenders, (
        f"{name}: hash chain evaluated inside a Filter (the 20x "
        f"pushdown-substitution class):\n" + "\n".join(offenders[:3])
    )
