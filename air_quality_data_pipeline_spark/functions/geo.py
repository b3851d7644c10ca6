"""Geospatial column expressions.

Covers the reference's ``_haversine_m`` helper (reference main.py:75-86:
R=6371000, asin formulation, sqrt clamped to 1) as a pure Catalyst
expression — no UDF, so it stays inside whole-stage codegen and runs
vectorized on every executor.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

EARTH_RADIUS_M = 6371000.0


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters between two (lat, lon) pairs (degrees).

    Mirrors reference main.py:75-86 semantics: haversine with the ``min(1, √a)``
    clamp expressed as ``least(1.0, sqrt(a))``.
    """
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dlat / F.lit(2.0)), F.lit(2.0))
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlon / F.lit(2.0)), F.lit(2.0))
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.least(F.lit(1.0), F.sqrt(a)))


# The identical computation as an ANSI SQL fragment, for DuckDB oracles.
# {lat1}/{lon1}/{lat2}/{lon2} are substituted with SQL expressions.
HAVERSINE_SQL = (
    "2.0 * 6371000.0 * asin(least(1.0, sqrt("
    "pow(sin(radians({lat2} - {lat1}) / 2.0), 2.0)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    " * pow(sin(radians({lon2} - {lon1}) / 2.0), 2.0))))"
)


def synthetic_lat(key: Column) -> Column:
    """Deterministic pseudo-latitude in [-90, 90) derived from an int key.

    The fixtures carry no geo columns; we derive coordinates from integer
    keys with exact integer arithmetic so Spark and the oracle agree bit-for-bit.
    """
    return (key % F.lit(1800)).cast("double") / F.lit(10.0) - F.lit(90.0)


def synthetic_lon(key: Column) -> Column:
    """Deterministic pseudo-longitude in [-180, 180) derived from an int key."""
    return ((key * F.lit(7)) % F.lit(3600)).cast("double") / F.lit(10.0) - F.lit(180.0)


SYNTH_LAT_SQL = "(CAST(({key} % 1800) AS DOUBLE) / 10.0 - 90.0)"
SYNTH_LON_SQL = "(CAST((({key} * 7) % 3600) AS DOUBLE) / 10.0 - 180.0)"
