"""Reproducible (order-independent) aggregation helpers.

Floating-point SUM is not associative, so a parallel engine's result depends
on partitioning — unacceptable both for cross-engine verification and for
run-to-run reproducibility of a 1000-executor job. We sum money-like doubles
as DECIMAL(38,6) (exact, associative) and cast the total back to double:
bit-identical regardless of partition count, in Spark and in the oracle.

Averages are derived as exact-sum / count with a single double division —
again deterministic. Columns known to hold integral values (e.g.
``l_quantity``) sum exactly in double arithmetic already (integers < 2^53),
so they need no decimal detour.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def exact_sum(col: Column) -> Column:
    """Order-independent SUM of a double column, returned as double."""
    return F.sum(col.cast("decimal(38,6)")).cast("double")


def exact_avg(col: Column) -> Column:
    """Order-independent AVG of a double column, returned as double."""
    return F.sum(col.cast("decimal(38,6)")).cast("double") / F.count(col)


def exact_sum_sql(col: str) -> str:
    """ANSI SQL fragment for the identical order-independent SUM."""
    return f"CAST(SUM(CAST({col} AS DECIMAL(38,6))) AS DOUBLE)"


def exact_avg_sql(col: str) -> str:
    return f"(CAST(SUM(CAST({col} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({col}))"
