"""Loader robustness: events.ts must normalize to the same instants no
matter how the engine materializes parquet TIMESTAMP(NANOS) — long
nanos (Spark 3.x nanosAsLong) or TIMESTAMP_NTZ (Spark 4.x native).
Regression test for the Spark 4.1.2 loader break (VERDICT r3 item 1).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd
from pyspark.sql import types as T

from stream_processing_test_spark.tables import load, normalize_event_ts
from tests.conftest import SF_SMALL


def test_loader_ts_is_timestamp(spark):
    ev = load(spark, SF_SMALL, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)


def test_normalize_long_and_native_paths_agree(spark):
    """The Spark 3.x path (nanos-since-epoch long -> timestamp_micros
    (ts div 1000)) and whatever THIS engine's native read produces must
    yield identical instants after normalize_event_ts."""
    native = {
        (r["event_id"], r["ts"])
        for r in load(spark, SF_SMALL, "events").select("event_id", "ts").collect()
    }

    # Reconstruct the 3.x shape: raw nanos longs via DuckDB's epoch_ns.
    con = duckdb.connect()
    pdf = con.execute(
        f"SELECT event_id, epoch_ns(ts) AS ts "
        f"FROM read_parquet('{SF_SMALL}/events.parquet')"
    ).df()
    assert pdf["ts"].dtype == "int64"
    long_df = spark.createDataFrame(pdf, "event_id LONG, ts LONG")
    as_long = {
        (r["event_id"], r["ts"])
        for r in normalize_event_ts(long_df).collect()
    }
    assert native == as_long


def test_normalize_rejects_unknown_dtype(spark):
    import pytest

    bad = spark.createDataFrame(pd.DataFrame({"ts": ["x"]}), "ts STRING")
    with pytest.raises(TypeError):
        normalize_event_ts(bad)


def test_loader_instants_independent_of_session_timezone(spark):
    """The NTZ conversion must denote the same instants under ANY
    session timezone (convert_timezone pins the UTC interpretation) —
    a plain cast would silently shift every event by the session
    offset on Spark 4."""
    from pyspark.sql import functions as F

    utc = {
        r["event_id"]: r["u"]
        for r in load(spark, SF_SMALL, "events")
        .select("event_id", F.unix_micros("ts").alias("u"))
        .collect()
    }
    scoped = spark.newSession()
    scoped.conf.set("spark.sql.session.timeZone", "America/New_York")
    ny = {
        r["event_id"]: r["u"]
        for r in load(scoped, SF_SMALL, "events")
        .select("event_id", F.unix_micros("ts").alias("u"))
        .collect()
    }
    assert utc == ny


def test_invalidate_load_cache_refreshes_listing(spark, tmp_path):
    """load() caches reader plans per (session, sf_dir, table); a caller
    that regenerates a fixture dir must be able to drop that entry and
    re-list (ADVICE r16: the write-then-re-read contract was documented
    but unenforced). After invalidate, load() returns a fresh plan that
    sees the rewritten file."""
    import pandas as pd

    from stream_processing_test_spark.tables import invalidate_load_cache

    d = tmp_path / "sfX"
    d.mkdir()
    pd.DataFrame({"r_regionkey": [1], "r_name": ["a"]}).to_parquet(
        d / "region.parquet"
    )
    first = load(spark, str(d), "region")
    assert first.count() == 1
    # same object back while cached
    assert load(spark, str(d), "region") is first
    pd.DataFrame(
        {"r_regionkey": [1, 2], "r_name": ["a", "b"]}
    ).to_parquet(d / "region.parquet")
    assert invalidate_load_cache(spark, str(d)) == 1
    assert load(spark, str(d), "region") is not first
    assert load(spark, str(d), "region").count() == 2
