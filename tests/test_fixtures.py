"""Fixture-vintage guards.

The driver's parquet fixtures have changed encoding between rounds (round 3:
``events.ts`` flipped from parquet TIMESTAMP(NANOS) to ``timestamp[us]``,
silently breaking every events reader). These tests pin (a) the loader
contract — ``tables.table`` must yield a canonical ``TIMESTAMP_NTZ`` ``ts``
regardless of the on-disk encoding — and (b) a pyarrow schema snapshot of
every fixture table, so the next driver-side change fails loudly by name
instead of surfacing as thirty cryptic plan-time errors.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from air_quality_data_pipeline_spark.tables import TABLE_NAMES, table

from conftest import SF_SMALL

# The encodings of events.ts the loader supports. If a new vintage appears,
# add it here AND teach tables.table() to normalise it.
_SUPPORTED_EVENTS_TS = {"timestamp[ns]", "timestamp[us]", "int64"}

# Column-name snapshot per fixture table (order-insensitive), taken from the
# round-4 driver fixtures. A driver-side rename/add/drop fails here by name.
_EXPECTED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


def _sf_dirs() -> list[str]:
    dirs = []
    for sf in ("0.001", "0.01", "0.1"):
        d = f"/root/testdata/sf{sf}"
        if os.path.isdir(d):
            dirs.append(d)
    return dirs or [SF_SMALL]


@pytest.mark.parametrize("sf_dir_any", _sf_dirs())
def test_events_ts_encoding_is_supported(sf_dir_any):
    """The on-disk events.ts encoding must be one the loader normalises."""
    arrow_type = str(pq.read_schema(f"{sf_dir_any}/events.parquet").field("ts").type)
    assert arrow_type in _SUPPORTED_EVENTS_TS, (
        f"{sf_dir_any}/events.parquet stores ts as {arrow_type!r}; "
        f"tables.table() only handles {sorted(_SUPPORTED_EVENTS_TS)} — "
        "teach the loader about the new vintage."
    )


@pytest.mark.parametrize("sf_dir_any", _sf_dirs())
def test_events_loader_yields_timestamp_ntz(spark, sf_dir_any):
    """tables.table() must canonicalise ts to TIMESTAMP_NTZ on any vintage."""
    ev = table(spark, sf_dir_any, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampNTZType), (
        f"events.ts loaded as {ev.schema['ts'].dataType}; expected TIMESTAMP_NTZ"
    )
    # and it must actually evaluate (plan-time type errors surface here)
    row = ev.selectExpr("min(ts) AS lo", "max(ts) AS hi").first()
    assert row.lo is not None and row.hi >= row.lo


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_fixture_columns_snapshot(name):
    """Every fixture table keeps its column inventory; renames fail by name."""
    schema = pq.read_schema(f"{SF_SMALL}/{name}.parquet")
    got = set(schema.names)
    expected = _EXPECTED_COLUMNS[name]
    assert got == expected, (
        f"{name}.parquet columns drifted: missing={sorted(expected - got)} "
        f"extra={sorted(got - expected)}"
    )


def test_events_loader_handles_legacy_long_nanos(spark, tmp_path):
    """The old fixture vintage (BIGINT epoch-nanos under nanosAsLong — still
    produced by scripts/make_sf1.py) must keep loading: synthesize a tiny
    events.parquet with a long ts and assert the loader rebuilds the same
    TIMESTAMP_NTZ values a native timestamp[us] file would give."""
    import pyarrow as pa

    micros = [1_704_500_000_000_000, 1_704_500_060_500_000]  # 2024-01-05-ish
    legacy = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([m * 1000 for m in micros], pa.int64()),
            "user_id": pa.array([10, 11], pa.int64()),
            "event_type": pa.array(["view", "click"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(['{"k": 1}', '{"k": 2}']),
        }
    )
    modern = legacy.set_column(
        1, "ts", pa.array(micros, pa.int64()).cast(pa.timestamp("us"))
    )
    d_legacy, d_modern = tmp_path / "legacy", tmp_path / "modern"
    for d, t in ((d_legacy, legacy), (d_modern, modern)):
        d.mkdir()
        pq.write_table(t, d / "events.parquet")

    df_legacy = table(spark, str(d_legacy), "events")
    df_modern = table(spark, str(d_modern), "events")
    for df in (df_legacy, df_modern):
        assert isinstance(df.schema["ts"].dataType, T.TimestampNTZType)
    assert (
        [r.ts for r in df_legacy.orderBy("event_id").collect()]
        == [r.ts for r in df_modern.orderBy("event_id").collect()]
    )
