"""Bucketed co-located joins: same-bucketed tables must join with NO
shuffle exchange — the amortize-the-shuffle-at-write-time layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from shopify_db_spark.sources.tables import load_table, write_bucketed
from tests.conftest import SF_SMOKE


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketed_test")
    prior_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # force the sort-merge path: a broadcast join would skip the
    # exchange anyway and prove nothing about bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, SF_SMOKE, "lineitem")
        orders = load_table(spark, SF_SMOKE, "orders")
        write_bucketed(li, "bucketed_test.li_b", "l_orderkey", 8)
        write_bucketed(orders, "bucketed_test.ord_b", "o_orderkey", 8)

        joined = (
            spark.table("bucketed_test.li_b")
            .join(
                spark.table("bucketed_test.ord_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # neither join input may re-shuffle: bucketing pre-partitioned them
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # same result as the plain-parquet join
        expected = {
            r["o_orderstatus"]: r["n"]
            for r in li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        got = {r["o_orderstatus"]: r["n"] for r in joined.collect()}
        assert got == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior_threshold)
        spark.sql("DROP DATABASE IF EXISTS bucketed_test CASCADE")
