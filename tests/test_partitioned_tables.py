"""Date-partitioned fact-table layout: writes land one file set per
date directory, date predicates prune partitions (visible in the
scan's PartitionFilters), and results match the flat layout."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from shopify_db_spark.sources.tables import (
    load_table,
    scan_partition_filters,
    write_date_partitioned,
)
from tests.conftest import SF_SMOKE


def test_partitioned_write_prunes_and_matches(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "events_by_date")
    write_date_partitioned(events, path, ts_col="ts")

    # layout: one directory per date, no stray flat files
    dirs = [d for d in os.listdir(path) if d.startswith("event_date=")]
    assert len(dirs) > 1

    part = spark.read.parquet(path)
    some_date = part.select(F.min("event_date")).collect()[0][0]
    pruned = part.filter(F.col("event_date") == F.lit(some_date))

    # the date predicate reaches PartitionFilters, not a data filter
    filters = scan_partition_filters(pruned)
    assert "event_date" in filters, f"no partition pruning in: {filters!r}"

    # pruned read == flat-layout filter on the same day
    expected = events.filter(F.to_date("ts") == F.lit(some_date)).count()
    assert pruned.count() == expected > 0
    # full scan preserves every row
    assert part.count() == events.count()
