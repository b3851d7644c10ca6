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


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return QUERIES
