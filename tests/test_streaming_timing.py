"""Deterministic streaming-timing tests (VERDICT r4 item 7).

Watermark behaviors (late-row drops, dedup-state eviction) are timing-
dependent when several files land in one trigger, so the registered
streaming queries expose them only as rows-only or semantics-modeled
oracles. Here the micro-batch boundaries are made EXACT by construction:
each stage writes one file and runs its own ``Trigger.AvailableNow`` pass
against a SHARED checkpoint + parquet sink, so stage N processes precisely
the new file with the watermark persisted from stage N-1. That turns the
drop-set into an assertable value instead of a row count.

Spark's documented semantics pinned here:
- the late-row filter applies the watermark with a one-batch lag (a batch
  is filtered by the watermark computed at the END of the previous batch);
- ``dropDuplicatesWithinWatermark`` holds a key's state until the
  watermark passes the stored event time + delay, then evicts — so a
  duplicate arriving after eviction is re-emitted (the "within watermark"
  guarantee boundary), while one arriving within it is suppressed.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F

_DELAY = "1 hour"


def _write_stage(spark, data_dir: str, stage: str, rows: list[tuple[str, str]]) -> None:
    df = spark.createDataFrame(rows, "event_id string, ts_s string").select(
        "event_id", F.to_timestamp("ts_s").alias("ts")
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(data_dir, f"stage_{stage}"))


def _run_stage(spark, data_dir: str, ckpt: str, out_dir: str) -> set[tuple[str, int]]:
    """One AvailableNow pass over whatever is new in data_dir; returns the
    rows THIS stage appended to the parquet sink."""
    sdf = (
        spark.readStream.schema("event_id string, ts timestamp")
        .parquet(data_dir + "/*")
    )
    dedup = (
        sdf.withWatermark("ts", _DELAY)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", F.unix_timestamp("ts").alias("ts_sec"))
    )
    before = _read_out(spark, out_dir)
    q = (
        dedup.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _read_out(spark, out_dir) - before


def _read_out(spark, out_dir: str) -> set[tuple[str, int]]:
    try:
        return {
            (r.event_id, r.ts_sec)
            for r in spark.read.schema("event_id string, ts_sec long").parquet(out_dir).collect()
        }
    except Exception:
        return set()


def _sec(ts: str) -> int:
    import datetime

    return int(
        datetime.datetime.strptime(ts, "%Y-%m-%d %H:%M:%S")
        .replace(tzinfo=datetime.timezone.utc)
        .timestamp()
    )


def test_dedup_within_watermark_drop_and_eviction(spark):
    """Exact drop-set of dropDuplicatesWithinWatermark across five staged
    micro-batches: a late duplicate is dropped by the watermark filter, an
    in-watermark duplicate is suppressed by state, and a post-eviction
    duplicate is RE-emitted."""
    base = tempfile.mkdtemp(prefix="st_timing_")
    data, ckpt, out = (os.path.join(base, d) for d in ("data", "ckpt", "out"))
    os.makedirs(data)

    # stage a: seeds e1/e2; watermark afterwards = 12:00 - 1h = 11:00
    _write_stage(spark, data, "a", [("e1", "2024-02-01 10:00:00"), ("e2", "2024-02-01 12:00:00")])
    got_a = _run_stage(spark, data, ckpt, out)
    assert got_a == {("e1", _sec("2024-02-01 10:00:00")), ("e2", _sec("2024-02-01 12:00:00"))}

    # stage b (filtered by wm 11:00 from stage a):
    #   e1 dup @10:00  -> ts < wm                 -> dropped as LATE
    #   e2 dup @12:00  -> ts >= wm, state live
    #      (e2 state evicts only once wm > 12:00 + 1h = 13:00) -> SUPPRESSED
    #   e4 fresh @12:20 -> emitted (proves the batch ran)
    _write_stage(
        spark,
        data,
        "b",
        [
            ("e1", "2024-02-01 10:00:00"),
            ("e2", "2024-02-01 12:00:00"),
            ("e4", "2024-02-01 12:20:00"),
        ],
    )
    got_b = _run_stage(spark, data, ckpt, out)
    assert got_b == {("e4", _sec("2024-02-01 12:20:00"))}

    # stage c: a 15:00 tick pushes the watermark to 14:00 > 13:00, which
    # EVICTS e2's dedup state once applied
    _write_stage(spark, data, "c", [("e5", "2024-02-01 15:00:00")])
    got_c = _run_stage(spark, data, ckpt, out)
    assert got_c == {("e5", _sec("2024-02-01 15:00:00"))}

    # stage d: e2 re-arrives at 14:30 (>= wm 14:00, so not late) AFTER its
    # state was evicted -> RE-emitted: the "within watermark" guarantee
    # boundary, asserted exactly
    _write_stage(spark, data, "d", [("e2", "2024-02-01 14:30:00")])
    got_d = _run_stage(spark, data, ckpt, out)
    assert got_d == {("e2", _sec("2024-02-01 14:30:00"))}


def test_st_watermark_drop_set_exact(spark, sf_dir):
    """The registered st_watermark query's emitted aggregate, asserted as
    the exact expected row set (the oracle models these semantics in SQL;
    this pins the same drop-set in-process):
    - batch A seeds windows 10:00(click x2), 11:00(view), 12:00(click);
    - batch B's 10:20 click is dropped (window end 11:00 <= wm 11:30),
      its 11:40 view is late-but-kept (window end 12:00 > wm), the 12:10
      purchase is on time, and the far-future tick finalizes all real
      windows (its own window never closes, so it is never emitted)."""
    from air_quality_data_pipeline_spark.registry import load_all_queries

    rows = load_all_queries()["st_watermark"].builder(spark, sf_dir).collect()
    got = {(r.win_start_sec, r.event_type, r.cnt) for r in rows}
    assert got == {
        (_sec("2024-02-01 10:00:00"), "click", 2),
        (_sec("2024-02-01 11:00:00"), "view", 2),
        (_sec("2024-02-01 12:00:00"), "click", 1),
        (_sec("2024-02-01 12:00:00"), "tick", 1),
        (_sec("2024-02-01 12:00:00"), "purchase", 1),
    }
