"""Flagship query + the reference pipeline re-expressed Spark-first.

The reference's one pipeline (reference main.py:198-309) has the shape
scan → filter → join → aggregate → top-k → sink. ``flagship`` runs that shape
on the driver fixtures: "top customers by revenue per region in a date
window" over lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region.

``air_quality_report`` is the same operator chain on canned station/sensor
data shaped like the reference's OpenAQ inputs (FIXTURES.md §A2-A4),
producing the reference's exact 6-column output schema
(city, location, parameter, value, unit, date — reference main.py:288).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .functions.exact import exact_sum, exact_sum_sql
from .functions.geo import haversine_m
from .registry import register
from .session import apply_engine_conf
from .tables import table

FLAGSHIP_ORACLE = f"""
SELECT r_name AS region, n_name AS nation, c_name AS customer,
       {exact_sum_sql('l_extendedprice * (1.0 - l_discount)')} AS revenue,
       SUM(l_quantity) AS sum_qty,
       COUNT(*) AS line_count
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
  AND l_quantity IS NOT NULL
GROUP BY r_name, n_name, c_name
ORDER BY revenue DESC, customer ASC
LIMIT 50
"""


@register("flagship", oracle=FLAGSHIP_ORACLE, tags=("pipeline",))
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan→filter→join→agg→top-k, the reference pipeline's shape on fixtures.

    Scale posture: dimension tables (region/nation/customer) are broadcast —
    the fact-side lineitem⋈orders join is the only shuffle; the aggregate is
    partial (map-side) before the exchange; the top-k plans as
    TakeOrderedAndProject (no global sort of the full aggregate).
    """
    apply_engine_conf(spark)
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")

    dated = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    dims = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )
    return (
        lineitem.filter(F.col("l_quantity").isNotNull())
        .join(dated, lineitem.l_orderkey == dated.o_orderkey)
        .join(F.broadcast(dims), F.col("o_custkey") == dims.c_custkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.col("c_name").alias("customer"),
        )
        .agg(
            exact_sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("revenue"),
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy(F.desc("revenue"), F.asc("customer"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Reference-semantics demo: the air-quality report on canned OpenAQ-shaped data
# ---------------------------------------------------------------------------

# city config dimension (reference main.py:11-22) — a literal DataFrame
CITY_CFG_ROWS = [
    ("Warsaw", "PL", 52.2297, 21.0122, 75000.0),
    ("New York", "US", 40.7128, -74.0060, 75000.0),
]
PARAMETERS = ["pm25", "pm10", "o3", "no2"]  # reference main.py:25
FRESH_DAYS = 30  # reference main.py:36

# canned station payloads shaped like /locations results (FIXTURES.md §A2):
# (id, name, locality, lat, lon, datetime_last_utc, sensors[(id, param, units)])
CANNED_LOCATIONS = [
    (1, "Warszawa-Centrum", "Warszawa", 52.2300, 21.0100, "2024-01-28T06:00:00Z",
     [(11, "pm25", "µg/m³"), (12, "pm10", "µg/m³"), (13, "o3", "ppm"), (14, "no2", "ppm")]),
    (2, None, "Warszawa-Praga", 52.2500, 21.0500, "2024-01-29T06:00:00Z",
     [(21, "pm25", "µg/m³"), (22, "no2", "ppm")]),
    (3, "Warszawa-Stale", "Warszawa", 52.2000, 20.9800, "2023-06-01T06:00:00Z",  # stale > 30d
     [(31, "pm25", "µg/m³")]),
    (4, "Radom-Daleko", "Radom", 51.4027, 21.1471, "2024-01-29T06:00:00Z",  # > 75 km away
     [(41, "pm25", "µg/m³")]),
    (5, "NYC-Manhattan", "New York", 40.7200, -74.0100, "2024-01-30T06:00:00Z",
     [(51, "pm25", "µg/m³"), (52, "o3", None), (53, "so2", "ppm")]),  # so2 not tracked
]

# canned measurement payloads shaped like /locations/{id}/latest (FIXTURES.md §A3):
# (location_id, sensor_id, value, datetime_utc)
CANNED_MEASUREMENTS = [
    (1, 11, 17.2, "2024-01-30T05:00:00Z"),
    (1, 12, 25.1, "2024-01-30T05:00:00Z"),
    (1, 13, 0.031, "2024-01-30T05:00:00Z"),
    (1, 14, 0.012, "2024-01-30T05:00:00Z"),
    (2, 21, 19.9, "2024-01-30T05:00:00Z"),
    (2, 22, 0.014, "2023-01-01T05:00:00Z"),  # stale measurement, dropped
    (5, 51, 9.5, "2024-01-30T04:00:00Z"),
    (5, 52, 0.027, "2024-01-30T04:00:00Z"),
    (5, 53, 0.002, "2024-01-30T04:00:00Z"),  # so2, filtered by parameter allowlist
    (1, 99, 1.0, "2024-01-30T05:00:00Z"),    # unknown sensor, dropped by join
]


def air_quality_report(spark: SparkSession, as_of: str = "2024-01-31T00:00:00Z") -> DataFrame:
    """The reference pipeline end-to-end as one declarative Spark plan.

    Re-expresses reference main.py:198-309: freshness filter (main.py:89-97),
    geo-radius filter via haversine (main.py:140-141), sensors explode + join
    (main.py:151-161, 231-241), parameter allowlist (main.py:162, 242),
    numeric validation (main.py:249-252), coalesce fallbacks (main.py:223,
    256), and the fixed 6-column projection (main.py:262-269, 288).
    """
    cities = spark.createDataFrame(
        CITY_CFG_ROWS, "city string, iso string, city_lat double, city_lon double, radius_m double"
    )
    locations = spark.createDataFrame(
        CANNED_LOCATIONS,
        "loc_id long, name string, locality string, lat double, lon double, "
        "datetime_last string, sensors array<struct<sensor_id: long, parameter: string, units: string>>",
    )
    measurements = spark.createDataFrame(
        CANNED_MEASUREMENTS, "loc_id long, sensor_id long, value double, datetime_utc string"
    )
    as_of_ts = F.to_timestamp(F.lit(as_of))

    # station candidates: fresh + inside the city radius (broadcast the config dim)
    candidates = (
        locations.crossJoin(F.broadcast(cities))
        .withColumn("dist_m", haversine_m(F.col("lat"), F.col("lon"), F.col("city_lat"), F.col("city_lon")))
        .filter(F.col("dist_m") <= F.col("radius_m"))
        .filter(F.to_timestamp("datetime_last") >= as_of_ts - F.expr(f"INTERVAL {FRESH_DAYS} DAYS"))
        .withColumn("location", F.coalesce("name", "locality", F.concat(F.lit("id:"), F.col("loc_id"))))
    )
    # sensor dimension: explode the nested array, lowercase parameter, keep allowlist
    sensors = (
        candidates.select("city", "loc_id", "location", F.explode("sensors").alias("s"))
        .select(
            "city",
            "loc_id",
            "location",
            F.col("s.sensor_id").alias("sensor_id"),
            F.lower("s.parameter").alias("parameter"),
            F.coalesce("s.units", F.lit("")).alias("unit"),
        )
        .filter(F.col("parameter").isin(PARAMETERS))
    )
    # measurements: validate, join to the (broadcast) sensor dim, project 6 columns
    return (
        measurements.filter(F.col("value").isNotNull() & F.col("sensor_id").isNotNull())
        .filter(F.col("value").cast("double").isNotNull())
        .filter(F.to_timestamp("datetime_utc") >= as_of_ts - F.expr(f"INTERVAL {FRESH_DAYS} DAYS"))
        .join(F.broadcast(sensors), ["loc_id", "sensor_id"], "inner")
        .select(
            "city",
            "location",
            "parameter",
            F.col("value").cast("double").alias("value"),
            "unit",
            F.col("datetime_utc").alias("date"),
        )
    )


def _ref_pipeline_oracle() -> str:
    """DuckDB replica of the reference pipeline over the SAME canned
    literals (sensors flattened — the oracle mirrors results, not the
    nested shape). Trig ulp differences cannot flip the geo predicate: no
    canned station sits near the 75 km boundary (nearest ~3 km, farthest
    ~103 km), and distance itself is not an output column."""
    cities = ", ".join(
        f"('{c}', '{iso}', {lat}, {lon}, {r})" for c, iso, lat, lon, r in CITY_CFG_ROWS
    )
    locs = ", ".join(
        f"({lid}, {'NULL' if name is None else repr(name)}, {'NULL' if loc is None else repr(loc)}, "
        f"{lat}, {lon}, '{dtl}')"
        for lid, name, loc, lat, lon, dtl, _sensors in CANNED_LOCATIONS
    )
    sensors = ", ".join(
        f"({lid}, {sid}, '{param}', {'NULL' if units is None else repr(units)})"
        for lid, _n, _l, _la, _lo, _d, sens in CANNED_LOCATIONS
        for sid, param, units in sens
    )
    meas = ", ".join(
        f"({lid}, {sid}, {val}, '{dt}')" for lid, sid, val, dt in CANNED_MEASUREMENTS
    )
    params = ", ".join(f"'{p}'" for p in PARAMETERS)
    hav = (
        "2 * 6371000.0 * asin(least(1.0, sqrt("
        "pow(sin(radians(city_lat - lat) / 2), 2) + "
        "cos(radians(lat)) * cos(radians(city_lat)) * "
        "pow(sin(radians(city_lon - lon) / 2), 2))))"
    )
    return f"""
WITH cities(city, iso, city_lat, city_lon, radius_m) AS (VALUES {cities}),
locs(loc_id, name, locality, lat, lon, datetime_last) AS (VALUES {locs}),
sens(loc_id, sensor_id, parameter, units) AS (VALUES {sensors}),
meas(loc_id, sensor_id, value, datetime_utc) AS (VALUES {meas}),
candidates AS (
  SELECT l.loc_id, c.city,
         coalesce(l.name, l.locality, 'id:' || l.loc_id) AS location
  FROM locs l CROSS JOIN cities c
  WHERE {hav} <= c.radius_m
    AND CAST(l.datetime_last AS TIMESTAMPTZ)
        >= CAST('2024-01-31T00:00:00Z' AS TIMESTAMPTZ) - INTERVAL {FRESH_DAYS} DAY
),
sensor_dim AS (
  SELECT cd.city, cd.loc_id, cd.location, s.sensor_id,
         lower(s.parameter) AS parameter, coalesce(s.units, '') AS unit
  FROM candidates cd JOIN sens s ON s.loc_id = cd.loc_id
  WHERE lower(s.parameter) IN ({params})
)
SELECT sd.city, sd.location, sd.parameter,
       CAST(m.value AS DOUBLE) AS value, sd.unit, m.datetime_utc AS date
FROM meas m
JOIN sensor_dim sd ON sd.loc_id = m.loc_id AND sd.sensor_id = m.sensor_id
WHERE m.value IS NOT NULL AND m.sensor_id IS NOT NULL
  AND CAST(m.datetime_utc AS TIMESTAMPTZ)
      >= CAST('2024-01-31T00:00:00Z' AS TIMESTAMPTZ) - INTERVAL {FRESH_DAYS} DAY
"""


@register("ref_pipeline", oracle=_ref_pipeline_oracle(), tags=("pipeline",))
def ref_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference pipeline semantics on canned data, oracle-checked: the
    full air-quality report (freshness + geo-radius + allowlist + validity
    filters, sensor join, coalesce fallbacks, 6-column projection) must
    match a DuckDB replica built from the same literals."""
    apply_engine_conf(spark)
    return air_quality_report(spark)
