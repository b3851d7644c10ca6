"""Time-series operators: grid resampling with forward-fill, and OHLC
downsampling (SURVEY.md §2.L additions).

The reference pipeline fetches "latest measurement per sensor" snapshots
(main.py:146-175) but has no resampling layer; any monitoring product built
on it needs regular time grids (dashboards, rate-of-change alerts) and
coarse summaries (daily bands). Both operators here are the canonical
Spark formulations:

- ``ts_gapfill``: per-entity fixed-interval grid (sequence → explode) left
  joined with per-interval last-observation, then forward-filled with a
  ``last(ignorenulls)`` running window. The grid is generated, never
  shuffled from data; the only exchanges are the per-interval aggregate and
  the per-entity window, both keyed on the entity — at 100 TB this
  partitions by sensor and each partition holds one bounded day-grid.
- ``ts_ohlc``: open/high/low/close downsampling in ONE hash aggregate via
  the min/max(struct) argmin/argmax pattern (no window, no self-join) —
  first/last/extremes all combine map-side, so the exchange carries one row
  per (entity, bucket) regardless of input size.

Determinism: open/close tiebreak on (ts, event_id) which is unique; the
volume sum goes through DECIMAL so hash-aggregate combine order cannot
perturb the double.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..registry import register
from ..session import apply_engine_conf
from ..tables import table

# one fully-covered fixture day; the grid is FIXED-SIZE (20 users x 1440
# minutes) at every scale factor so benchmarks measure data scaling, not
# output scaling
_DAY = "2024-01-05"
_NEXT_DAY = "2024-01-06"
_N_USERS = 20

_GAPFILL_ORACLE = f"""
WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id < {_N_USERS}),
g AS (
  SELECT u.user_id, t.m AS minute
  FROM u CROSS JOIN generate_series(
    TIMESTAMP '{_DAY} 00:00:00', TIMESTAMP '{_DAY} 23:59:00', INTERVAL 1 MINUTE
  ) AS t(m)
),
obs AS (
  SELECT user_id, date_trunc('minute', ts) AS minute,
         (MAX(struct_pack(ts := ts, event_id := event_id, value := value))).value AS v
  FROM events
  WHERE user_id < {_N_USERS}
    AND ts >= TIMESTAMP '{_DAY} 00:00:00' AND ts < TIMESTAMP '{_NEXT_DAY} 00:00:00'
  GROUP BY user_id, date_trunc('minute', ts)
)
SELECT g.user_id, g.minute,
       LAST_VALUE(obs.v IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.minute
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value_ffill,
       CAST(CASE WHEN obs.v IS NULL THEN 0 ELSE 1 END AS INT) AS is_observed
FROM g LEFT JOIN obs ON obs.user_id = g.user_id AND obs.minute = g.minute
"""


@register("ts_gapfill", oracle=_GAPFILL_ORACLE, tags=("timeseries", "window"))
def ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's event stream onto a 1-minute grid for one day
    and forward-fill the last observed value. The minute grid is built with
    ``sequence``+``explode`` from 20 constant rows (never read from data, so
    it costs nothing at any scale); per-minute "last observation" is the
    max(struct(ts, event_id, value)) argmax aggregate (map-side combine);
    the fill itself is one running ``last(ignorenulls)`` window per user.
    Rows before a user's first observation stay NULL — the honest contract
    for leading gaps."""
    apply_engine_conf(spark)
    ev = table(spark, sf_dir, "events").filter(
        (F.col("user_id") < _N_USERS)
        & (F.col("ts") >= F.expr(f"TIMESTAMP_NTZ '{_DAY} 00:00:00'"))
        & (F.col("ts") < F.expr(f"TIMESTAMP_NTZ '{_NEXT_DAY} 00:00:00'"))
    )
    users = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") < _N_USERS)
        .select("user_id")
        .distinct()
    )
    grid = users.select(
        "user_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, 1439), "
                f"m -> timestampadd(MINUTE, m, TIMESTAMP_NTZ '{_DAY} 00:00:00'))"
            )
        ).alias("minute"),
    )
    obs = (
        ev.select(
            "user_id",
            F.date_trunc("minute", F.col("ts")).alias("minute"),
            F.struct("ts", "event_id", "value").alias("s"),
        )
        .groupBy("user_id", "minute")
        .agg(F.max("s")["value"].alias("v"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("minute")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(obs, ["user_id", "minute"], "left").select(
        "user_id",
        "minute",
        F.last("v", ignorenulls=True).over(w).alias("value_ffill"),
        F.when(F.col("v").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("is_observed"),
    )


_OHLC_ORACLE = """
SELECT user_id, date_trunc('day', ts) AS day,
       (MIN(struct_pack(ts := ts, event_id := event_id, value := value))).value AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       (MAX(struct_pack(ts := ts, event_id := event_id, value := value))).value AS close,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18, 6))) AS DOUBLE) AS volume
FROM events
GROUP BY user_id, date_trunc('day', ts)
"""


@register("ts_ohlc", oracle=_OHLC_ORACLE, tags=("timeseries", "agg"))
def ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC (open/high/low/close) candles per user in one hash
    aggregate: open/close are min/max(struct(ts, event_id, value)) argmin /
    argmax — no sort, no window, no self-join, and every aggregate combines
    map-side, so the single exchange carries one row per (user, day). The
    volume sum is DECIMAL-exact (combine-order independent) then cast back
    to double."""
    apply_engine_conf(spark)
    ev = table(spark, sf_dir, "events")
    s = F.struct("ts", "event_id", "value")
    return (
        ev.select("user_id", F.date_trunc("day", F.col("ts")).alias("day"), "value", s.alias("s"))
        .groupBy("user_id", "day")
        .agg(
            F.min("s")["value"].alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max("s")["value"].alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("volume"),
        )
    )
