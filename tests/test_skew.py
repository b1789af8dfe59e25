"""salted_join must equal the plain join on a skewed dataset while
actually spreading the hot key across salt buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from shopify_db_spark.operators.skew import SALT_COL, salted_join


def _skewed(spark):
    # key 1 carries 90% of rows (the hot key); keys 2..10 the rest
    rows = [(1, i) for i in range(900)] + [
        (k, i) for k in range(2, 11) for i in range(10)
    ]
    big = spark.createDataFrame(rows, "k long, payload long")
    small = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(1, 8)], "k long, label string"
    )
    return big, small


def test_salted_join_matches_plain(spark):
    big, small = _skewed(spark)
    plain = big.join(small, "k", "inner").orderBy("k", "payload").collect()
    salted = salted_join(big, small, "k", n_salts=8).orderBy("k", "payload").collect()
    assert [tuple(r) for r in salted] == [tuple(r) for r in plain]
    # left join keeps unmatched big-side keys (8..10)
    plain_l = big.join(small, "k", "left").count()
    assert salted_join(big, small, "k", n_salts=8, how="left").count() == plain_l


def test_salt_actually_spreads_hot_key(spark):
    big, _ = _skewed(spark)
    spread = (
        big.withColumn(
            SALT_COL, F.pmod(F.xxhash64("payload"), F.lit(8))
        )
        .filter(F.col("k") == 1)
        .groupBy(SALT_COL)
        .count()
        .collect()
    )
    assert len(spread) == 8                      # all buckets used
    assert max(r["count"] for r in spread) < 900  # no bucket holds it all
