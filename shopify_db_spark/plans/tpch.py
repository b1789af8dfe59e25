"""Core analytical queries over the benchmark star schema.

Each query is the testdata-table expression of an operator family
from SURVEY.md §2 (the reference's invoice view / validation suite),
declared via the DataFrame API so Catalyst plans it: filters and
projections push into the parquet scan, small dimensions broadcast,
aggregations get map-side partials, AQE fixes skew at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from shopify_db_spark.functions.parity import dec, dlit, money_out
from shopify_db_spark.plans.catalog import query
from shopify_db_spark.sources.tables import load_table

# (1 ± x) factors re-narrowed to (8,4) so triple decimal products stay
# under 38 digits of precision on both engines (see functions.parity).
_FRAC = T.DecimalType(8, 4)


def _discount_factor() -> F.Column:
    return (dlit(1) - dec("l_discount")).cast(_FRAC)


def _tax_factor() -> F.Column:
    return (dlit(1) + dec("l_tax")).cast(_FRAC)


@query(
    "q01_pricing_summary",
    oracle="""
WITH src AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS DECIMAL(12,4)) AS qty_d,
         CAST(l_extendedprice AS DECIMAL(12,4)) AS price_d,
         CAST((1 - CAST(l_discount AS DECIMAL(12,4))) AS DECIMAL(8,4)) AS disc_f,
         CAST((1 + CAST(l_tax AS DECIMAL(12,4))) AS DECIMAL(8,4)) AS tax_f,
         l_orderkey
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '2000-09-02'
)
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(qty_d), 2) AS DOUBLE) AS sum_qty,
       CAST(ROUND(SUM(price_d), 2) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(price_d * disc_f), 2) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(price_d * disc_f * tax_f), 2) AS DOUBLE) AS sum_charge,
       COUNT(*) AS count_order,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM src
GROUP BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship pricing-summary rollup (TPC-H Q1 shape).

    Operator coverage: P3 date predicate (pushed to the parquet
    scan), A2/A4 grouped sums + exact count-distinct, F9 HALF_UP
    rounding, decimal-exact money math (reference money semantics,
    ``setup.sql:365-369``). One shuffle (the groupBy), partial aggs
    map-side; at 100 TB this stays a single-pass scan+agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            "l_orderkey",
            dec("l_quantity").alias("qty_d"),
            dec("l_extendedprice").alias("price_d"),
            _discount_factor().alias("disc_f"),
            _tax_factor().alias("tax_f"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_out(F.sum("qty_d")).alias("sum_qty"),
            money_out(F.sum("price_d")).alias("sum_base_price"),
            money_out(F.sum(F.col("price_d") * F.col("disc_f"))).alias("sum_disc_price"),
            money_out(
                F.sum(F.col("price_d") * F.col("disc_f") * F.col("tax_f"))
            ).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


@query(
    "q02_top_order_per_customer",
    oracle="""
WITH ranked AS (
  SELECT o_custkey, o_orderkey,
         CAST(o_totalprice AS DECIMAL(12,4)) AS price_d,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
SELECT o_custkey AS custkey, o_orderkey AS top_orderkey,
       CAST(ROUND(price_d, 2) AS DOUBLE) AS top_price
FROM ranked WHERE rn = 1
""",
)
def q02_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked dedup: most significant row per key (reference W1,
    ``setup.sql:196-205`` — top transaction per order), with the
    deterministic tie-break SURVEY §7.4 requires. Single window
    shuffle on the partition key; no driver-side loops.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("top_orderkey"),
            money_out(dec("o_totalprice")).alias("top_price"),
        )
    )


@query(
    "q03_regional_revenue",
    oracle="""
SELECT r_name, n_name,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1999-01-01'
GROUP BY r_name, n_name
""",
)
def q03_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake join chain (reference J1 — facts through two
    dimension hops) + grouped rollup. ``nation``/``region`` are
    broadcast (they are fixed-size at any SF); ``customer`` joins
    via hash — at 100 TB that is the one legitimate shuffle, and
    AQE converts it to broadcast when the filtered side is small.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_out(F.sum(dec("o_totalprice"))).alias("revenue"),
        )
    )


@query(
    "q04_union_distinct_branches",
    oracle="""
SELECT c_custkey AS custkey, c_name AS name, 'final' AS tag
FROM customer JOIN orders ON o_custkey = c_custkey
WHERE o_orderstatus = 'F'
UNION
SELECT c_custkey AS custkey, c_name AS name, 'open' AS tag
FROM customer JOIN orders ON o_custkey = c_custkey
WHERE o_orderstatus = 'O'
""",
)
def q04_union_distinct_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION-DISTINCT of two branch projections (reference U1,
    ``setup.sql:378-390``): the join fans rows out per matching
    order and the distinct collapses them — the exact semantics the
    reference's 4-way invoice UNION relies on. Spark's ``union`` is
    UNION ALL, so the ``.distinct()`` is explicit and load-bearing
    (SURVEY §7.4 risk #1).
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    def branch(status: str, tag: str) -> DataFrame:
        return (
            customer.join(orders, F.col("o_custkey") == F.col("c_custkey"))
            .filter(F.col("o_orderstatus") == status)
            .select(
                F.col("c_custkey").alias("custkey"),
                F.col("c_name").alias("name"),
                F.lit(tag).alias("tag"),
            )
        )

    return branch("F", "final").unionByName(branch("O", "open")).distinct()


@query(
    "q05_order_price_reconcile",
    oracle="""
WITH li AS (
  SELECT l_orderkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,4))
             * CAST((1 - CAST(l_discount AS DECIMAL(12,4))) AS DECIMAL(8,4))
             * CAST((1 + CAST(l_tax AS DECIMAL(12,4))) AS DECIMAL(8,4))) AS charge_d
  FROM lineitem GROUP BY l_orderkey
)
SELECT o_orderkey AS orderkey,
       CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,4)), 2) AS DOUBLE) AS paid_amount,
       CAST(ROUND(charge_d, 2) AS DOUBLE) AS lineitems_total
FROM orders JOIN li ON l_orderkey = o_orderkey
WHERE ABS(CAST(o_totalprice AS DECIMAL(12,4)) - charge_d)
      > ABS(CAST(o_totalprice AS DECIMAL(12,4))) * CAST(0.01 AS DECIMAL(12,4))
""",
)
def q05_order_price_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-reconciliation check (reference V7, ``tripletex.py:102-125``):
    per-order header total vs summed line-item charges, flagging
    deviations beyond 1%. The pandas ``groupby().agg(first, sum)``
    becomes a distributed agg + equi-join; both sides shuffle on the
    order key once, and at scale the agg output is the small side.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    charges = li.groupBy("l_orderkey").agg(
        F.sum(
            dec("l_extendedprice") * _discount_factor() * _tax_factor()
        ).alias("charge_d")
    )
    paid_d = dec("o_totalprice")
    return (
        orders.join(charges, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.abs(paid_d - F.col("charge_d")) > F.abs(paid_d) * dlit("0.01"))
        .select(
            F.col("o_orderkey").alias("orderkey"),
            money_out(paid_d).alias("paid_amount"),
            money_out(F.col("charge_d")).alias("lineitems_total"),
        )
    )


@query(
    "q06_orderkey_gaps",
    oracle="""
WITH keys AS (
  SELECT DISTINCT o_orderkey FROM orders WHERE o_orderstatus = 'F'
),
bounds AS (SELECT MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi FROM keys),
cand AS (SELECT UNNEST(GENERATE_SERIES(lo, hi)) AS missing_orderkey FROM bounds)
SELECT missing_orderkey
FROM cand
WHERE missing_orderkey NOT IN (SELECT o_orderkey FROM keys)
""",
)
def q06_orderkey_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap detection (reference V3/V4 order/invoice-number
    gaps, ``tripletex.py:65-99``, via F21): candidates from
    ``sequence``+``explode`` anti-joined against observed keys —
    set-based, no driver-side ``range()`` loop. The explode starts
    from a 1-row bounds aggregate, so we repartition the candidate
    stream before the anti-join to restore parallelism; at larger
    domains the range would be bucketed first.
    """
    orders = load_table(spark, sf_dir, "orders")
    keys = (
        orders.filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
        .distinct()
    )
    bounds = keys.agg(F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi"))
    cand = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("missing_orderkey")
    ).repartition("missing_orderkey")
    return cand.join(
        keys, cand["missing_orderkey"] == keys["o_orderkey"], "left_anti"
    )
