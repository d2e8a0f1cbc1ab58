"""Scale-posture tests: the 100 TB layout decisions, verified on small
data via the physical plan (SURVEY.md §7 step 6).

- events partitioned by date(ts) -> daily-window queries prune
  partitions (PartitionFilters in the scan, not a full scan);
- filters/projections reach the parquet scan (PushedFilters/ReadSchema);
- small dimensions broadcast (no shuffle join for q5-shaped stars).
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_date_partitioned_events_prune(spark, tmp_path):
    """Writing events partitioned by day and filtering one day must
    produce a plan whose scan carries a partition filter — at 100 TB
    this is the difference between reading 1/30th and everything."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    )
    lake = str(tmp_path / "events_lake")
    ev.withColumn("day", F.to_date("ts")).write.partitionBy("day").parquet(lake)

    one_day = spark.read.parquet(lake).filter(F.col("day") == "2024-01-05")
    plan = _plan(one_day)
    assert "PartitionFilters" in plan
    # the partition predicate must be in PartitionFilters, not a post-scan filter
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "2024-01-05" in pf_line or "day" in pf_line
    # and it actually reads only that day's rows
    want = ev.filter(F.to_date("ts") == "2024-01-05").count()
    assert one_day.count() == want


def test_filters_and_projection_reach_scan(spark):
    """q6 shape: every predicate pushed, read schema pruned to the
    referenced columns only."""
    from stream_processing_test_spark.operators.relational import q6_forecast_revenue

    plan = _plan(q6_forecast_revenue(spark, SF_SMALL))
    assert "PushedFilters" in plan
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    for col in ["l_shipdate", "l_discount", "l_quantity"]:
        assert col in pushed
    schema_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    # only the 4 referenced columns are read (16-column table)
    assert schema_line.count(":") <= 5


def test_star_join_broadcasts_all_dims(spark):
    """q5 shape: no shuffle (SortMerge) joins — every dimension side
    must broadcast."""
    from stream_processing_test_spark.operators.relational import q5_region_revenue

    plan = _plan(q5_region_revenue(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semi_and_anti_joins_planned(spark):
    from stream_processing_test_spark.operators.relational import (
        suppliers_with_bulk_items,
        users_without_big_purchase,
    )

    semi = _plan(suppliers_with_bulk_items(spark, SF_SMALL))
    anti = _plan(users_without_big_purchase(spark, SF_SMALL))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti
