"""asof_join vs pandas merge_asof (the reference implementation of
backward as-of semantics) on deterministic pseudo-random data."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from shopify_db_spark.operators.asof import asof_join


def _data():
    # deterministic congruential stream -- no RNG state to leak
    def seq(seed, n, mod):
        x, out = seed, []
        for _ in range(n):
            x = (x * 1103515245 + 12345) % (2**31)
            out.append(x % mod)
        return out

    orders = pd.DataFrame({
        "cur": [f"c{v}" for v in seq(7, 300, 3)],
        "ts": pd.to_datetime(seq(11, 300, 10_000), unit="m", origin="2024-01-01"),
        "order_id": range(300),
    })
    rates = pd.DataFrame({
        "cur": [f"c{v}" for v in seq(13, 40, 3)],
        "ts": pd.to_datetime(seq(17, 40, 10_000), unit="m", origin="2024-01-01"),
        "rate": [round(1 + 0.01 * i, 2) for i in range(40)],
    }).drop_duplicates(subset=["cur", "ts"])  # merge_asof needs unique (key, ts)
    return orders, rates


def test_asof_join_matches_pandas(spark):
    orders, rates = _data()
    expected = pd.merge_asof(
        orders.sort_values("ts", kind="stable"),
        rates.sort_values("ts", kind="stable"),
        on="ts",
        by="cur",
        direction="backward",
    ).sort_values("order_id")

    out = (
        asof_join(
            spark.createDataFrame(orders),
            spark.createDataFrame(rates),
            on="cur",
        )
        .orderBy("order_id")
        .toPandas()
    )
    assert list(out["order_id"]) == list(expected["order_id"])
    got = list(out["rate"].fillna(-1))
    want = list(expected["rate"].fillna(-1))
    assert got == pytest.approx(want)


def test_asof_exact_timestamp_matches(spark):
    left = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00", 1)], "k string, ts string, lid int"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00", 5.0), ("a", "2024-01-01 09:00:00", 3.0)],
        "k string, ts string, val double",
    ).withColumn("ts", F.to_timestamp("ts"))
    row = asof_join(left, right, on="k").collect()[0]
    assert row["val"] == 5.0  # equal timestamp matches (backward semantics)


def test_asof_rejects_column_collision(spark):
    df = spark.createDataFrame([("a", 1, 2)], "k string, ts long, x long")
    with pytest.raises(ValueError, match="rename"):
        asof_join(df, df, on="k")
