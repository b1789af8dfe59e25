"""bucketed_range_join equivalence with the naive range predicate on
constructed intervals, including bucket-boundary edges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shopify_db_spark.operators.rangejoin import bucketed_range_join


def test_range_join_matches_naive(spark):
    points = spark.createDataFrame(
        [(i, "k", f"2024-01-01 {h:02d}:{m:02d}:00")
         for i, (h, m) in enumerate([(0, 0), (0, 59), (1, 0), (1, 30), (2, 0),
                                     (5, 15), (11, 59), (12, 0), (23, 45)])],
        "pid long, k string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    intervals = spark.createDataFrame(
        [
            (100, "k", "2024-01-01 00:30:00", "2024-01-01 01:30:00"),
            (101, "k", "2024-01-01 01:00:00", "2024-01-01 02:00:00"),  # end-exclusive edge at 02:00
            (102, "k", "2024-01-01 11:00:00", "2024-01-01 12:00:01"),
            (103, "x", "2024-01-01 00:00:00", "2024-01-02 00:00:00"),  # other key
        ],
        "iid long, k string, s string, e string",
    ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))

    naive = (
        points.join(
            intervals.withColumnRenamed("k", "ik"),
            (F.col("k") == F.col("ik"))
            & (F.col("s") <= F.col("ts"))
            & (F.col("ts") < F.col("e")),
        )
        .select("pid", "iid")
        .collect()
    )
    bucketed = (
        bucketed_range_join(
            points, intervals, point_ts="ts", start_col="s", end_col="e",
            bucket_seconds=3600, keys=["k"],
        )
        .select("pid", "iid")
        .collect()
    )
    assert sorted(map(tuple, bucketed)) == sorted(map(tuple, naive))
    # sanity on the fixture: end-exclusivity (point at 02:00 not in 101)
    assert (4, 101) not in {tuple(r) for r in bucketed}
    assert (7, 102) in {tuple(r) for r in bucketed}  # 12:00 < 12:00:01


def test_range_join_rejects_collision(spark):
    df = spark.createDataFrame([("k", 1)], "k string, ts long")
    with pytest.raises(ValueError, match="rename"):
        bucketed_range_join(df, df, "ts", "ts", "ts", keys=["k"])
