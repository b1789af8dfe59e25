"""Bucketed range join — match point rows to interval rows that
contain them (``start <= ts < end``), optionally blocked on keys.

Spark plans a raw range predicate as a nested-loop/cartesian join
(O(|points|·|intervals|) per key block). The bucketization trick
makes it an equi-join: points hash to ONE time bucket, intervals
replicate into every bucket they overlap, the join runs on
(keys..., bucket), and the exact range predicate filters the
candidates. With interval lengths bounded by ~bucket size, each
interval lands in ~2 buckets — linear replication, one shuffle,
no cross join. (DuckDB solves the same query natively with IEJoin —
the oracle for catalog query q45.)

A (point, interval) pair meets at most once — the point owns exactly
one bucket — so no post-join dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKET_COL = "__bucket"


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval with
    ``start <= ts < end`` (+ equality on ``keys``). Interval columns
    must not collide with point columns (rename first)."""
    keys = keys or []
    overlap = (set(intervals.columns) - set(keys)) & set(points.columns)
    if overlap:
        raise ValueError(f"rename interval columns colliding with points: {sorted(overlap)}")

    def bucket_of(col):
        return F.floor(F.unix_timestamp(col) / F.lit(bucket_seconds))

    p = points.withColumn(BUCKET_COL, bucket_of(F.col(point_ts)))
    i = intervals.withColumn(
        BUCKET_COL,
        F.explode(
            F.sequence(bucket_of(F.col(start_col)), bucket_of(F.col(end_col)))
        ),
    )
    joined = p.join(i, [*keys, BUCKET_COL], how="inner").filter(
        (F.col(start_col) <= F.col(point_ts)) & (F.col(point_ts) < F.col(end_col))
    )
    if how == "inner":
        return joined.drop(BUCKET_COL)
    raise ValueError("only inner range joins are supported")
