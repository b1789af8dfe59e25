"""Core analytical queries over the benchmark star schema.

Each query is the testdata-table expression of an operator family
from SURVEY.md §2 (the reference's invoice view / validation suite),
declared via the DataFrame API so Catalyst plans it: filters and
projections push into the parquet scan, small dimensions broadcast,
aggregations get map-side partials, AQE fixes skew at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
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
    ``setup.sql:365-369``).

    The DISTINCT aggregate runs as its own aggregation joined back
    on the (tiny) group key instead of inside the sums' ``agg``: a
    mixed list makes Catalyst Expand-duplicate every input row to
    give the distinct its own grouping lane, doubling the shuffled
    rows *with the decimal expressions already materialized on them*
    (measured 2×: 2.2 s mixed → 1.0 s split at sf0.1 — and at scale
    the split shuffles sum partials + a (group, orderkey) pre-agg
    instead of 2× the fact rows). Each side keeps its own pruned
    single-pass scan+agg shape.
    """
    li = load_table(spark, sf_dir, "lineitem")
    base = li.filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    ).select(
        "l_returnflag",
        "l_linestatus",
        "l_orderkey",
        dec("l_quantity").alias("qty_d"),
        dec("l_extendedprice").alias("price_d"),
        _discount_factor().alias("disc_f"),
        _tax_factor().alias("tax_f"),
    )
    sums = base.groupBy("l_returnflag", "l_linestatus").agg(
        money_out(F.sum("qty_d")).alias("sum_qty"),
        money_out(F.sum("price_d")).alias("sum_base_price"),
        money_out(F.sum(F.col("price_d") * F.col("disc_f"))).alias("sum_disc_price"),
        money_out(
            F.sum(F.col("price_d") * F.col("disc_f") * F.col("tax_f"))
        ).alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )
    dist = (
        base.groupBy("l_returnflag", "l_linestatus")
        .agg(F.countDistinct("l_orderkey").alias("n_orders"))
        .withColumnRenamed("l_returnflag", "rf_d")
        .withColumnRenamed("l_linestatus", "ls_d")
    )
    # eqNullSafe so a NULL-keyed group survives the split-aggregation
    # join (null != null under a plain inner equi-join); still planned
    # as a hash-keyed equi-join (EqualNullSafe is an extractable key)
    return sums.join(
        dist,
        F.col("l_returnflag").eqNullSafe(F.col("rf_d"))
        & F.col("l_linestatus").eqNullSafe(F.col("ls_d")),
    ).select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        "count_order",
        "n_orders",
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


@query(
    "q07_composite_key_join",
    oracle="""
WITH returns AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_extendedprice AS DECIMAL(12,4)) AS refund_d
  FROM lineitem WHERE l_returnflag = 'R'
)
SELECT li.l_orderkey AS orderkey, li.l_linenumber AS linenumber,
       CAST(ROUND(CAST(li.l_extendedprice AS DECIMAL(12,4)), 2) AS DOUBLE) AS line_price,
       CAST(ROUND(COALESCE(r.refund_d, 0), 2) AS DOUBLE) AS refunded
FROM lineitem li
LEFT JOIN returns r
  ON r.l_orderkey = li.l_orderkey AND r.l_linenumber = li.l_linenumber
WHERE li.l_shipdate >= TIMESTAMP '2000-01-01'
""",
)
def q07_composite_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite two-key LEFT join (reference J3: the refund
    line-item join on ``(order_id, line_item_product_id)``,
    ``setup.sql:325-326``) with a COALESCE fallback (F6). Both sides
    shuffle once on the same two-column key."""
    li = load_table(spark, sf_dir, "lineitem")
    returns = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_linenumber", dec("l_extendedprice").alias("refund_d"))
    )
    base = li.filter(F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
    return (
        base.alias("li")
        .join(
            returns.alias("r"),
            (F.col("r.l_orderkey") == F.col("li.l_orderkey"))
            & (F.col("r.l_linenumber") == F.col("li.l_linenumber")),
            "left",
        )
        .select(
            F.col("li.l_orderkey").alias("orderkey"),
            F.col("li.l_linenumber").alias("linenumber"),
            money_out(dec("li.l_extendedprice")).alias("line_price"),
            money_out(
                F.coalesce(F.col("r.refund_d"), F.lit(0).cast(T.DecimalType(12, 4)))
            ).alias("refunded"),
        )
    )


@query(
    "q08_group_numbering",
    oracle="""
WITH groups AS (
  SELECT o_custkey, o_orderstatus,
         ROW_NUMBER() OVER (ORDER BY o_custkey, o_orderstatus) AS seq
  FROM orders
  GROUP BY o_custkey, o_orderstatus
)
SELECT o.o_orderkey AS orderkey, g.o_custkey AS custkey,
       g.o_orderstatus AS orderstatus,
       CAST(1000 + g.seq - 1 AS INT) AS group_no
FROM orders o
RIGHT JOIN groups g
  ON o.o_custkey = g.o_custkey AND o.o_orderstatus = g.o_orderstatus
""",
)
def q08_group_numbering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Globally-numbered groups attached back to detail rows via a
    RIGHT join with start-offset arithmetic — the invoice-numbering
    shape standalone (reference J5+W2+F12, ``db.py:458-469``). The
    single-partition window runs on the distinct-group side only
    (~#customers rows) — and, like ``build_invoices``, auto-escapes
    to the two-phase numbering (``operators.numbering``) when the
    plan-time size of the bounding source says the group set has
    outgrown one task."""
    from shopify_db_spark.operators.numbering import (
        global_row_numbers,
        needs_two_phase,
    )

    orders = load_table(spark, sf_dir, "orders")
    distinct_groups = orders.select("o_custkey", "o_orderstatus").distinct()
    if needs_two_phase([orders]):
        groups = global_row_numbers(
            distinct_groups,
            ["o_custkey", "o_orderstatus"],
            col_name="group_no",
            start=1000,
        ).withColumn("group_no", F.col("group_no").cast("int"))
    else:
        groups = distinct_groups.withColumn(
            "group_no",
            (
                F.lit(1000)
                + F.row_number().over(Window.orderBy("o_custkey", "o_orderstatus"))
                - 1
            ).cast("int"),
        )
    return (
        orders.alias("o")
        .join(groups.alias("g"), ["o_custkey", "o_orderstatus"], "right")
        .select(
            F.col("o.o_orderkey").alias("orderkey"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderstatus").alias("orderstatus"),
            F.col("g.group_no").alias("group_no"),
        )
    )


@query(
    "q09_predicate_gallery",
    oracle="""
SELECT p_partkey AS partkey, p_name AS name, p_brand AS brand,
       p_type AS ptype, p_size AS psize
FROM part
WHERE (lower(p_name) LIKE '%bolt%'
       OR p_type IN ('ECONOMY', 'PREMIUM'))
  AND p_brand LIKE 'Brand#1%'
  AND p_name IS NOT NULL
  AND p_size BETWEEN 1 AND 40
  AND p_name NOT IN ('never-matches')
""",
)
def q09_predicate_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate gallery (reference P3-P11): case-insensitive
    substring (ILIKE ≡ lower+LIKE), IN-list, prefix LIKE, null
    check, BETWEEN, negated membership — all pushed into one parquet
    scan filter (no shuffle at all)."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        (F.col("p_name").ilike("%bolt%") | F.col("p_type").isin("ECONOMY", "PREMIUM"))
        & F.col("p_brand").like("Brand#1%")
        & F.col("p_name").isNotNull()
        & F.col("p_size").between(1, 40)
        & ~F.col("p_name").isin("never-matches")
    ).select(
        F.col("p_partkey").alias("partkey"),
        F.col("p_name").alias("name"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("ptype"),
        F.col("p_size").alias("psize"),
    )


@query(
    "q10_scalar_gallery",
    oracle="""
SELECT c_custkey AS custkey,
       CAST(RIGHT(CAST(c_custkey AS VARCHAR(18)), 9) AS INT) AS customer_no,
       CASE WHEN NULLIF(c_name, '') IS NOT NULL
                 AND NULLIF(c_mktsegment, '') IS NOT NULL
            THEN CONCAT(c_name, ' - ', c_mktsegment)
            WHEN c_name IS NOT NULL THEN c_name
            ELSE NULL END AS display_name,
       CONCAT(c_name, '-1') AS refund_name,
       COALESCE(NULLIF(c_mktsegment, ''), 'UNKNOWN') AS segment,
       CAST(c_acctbal AS DOUBLE) / NULLIF(CAST(c_nationkey AS DOUBLE), 0) AS bal_per_nation,
       -CAST(ROUND(CAST(c_acctbal AS DECIMAL(12,4)), 2) AS DOUBLE) AS neg_balance,
       SUBSTRING(c_name, 10, 8) AS name_suffix,
       ABS(CAST(ROUND(CAST(c_acctbal AS DECIMAL(12,4)), 2) AS DOUBLE)) AS abs_balance
FROM customer
""",
)
def q10_scalar_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function gallery (reference F2-F5, F8, F13, F15): the
    9-digit id truncation, conditional CONCAT display name, NULLIF /
    COALESCE chains, null-safe division (double-typed on both
    engines — DuckDB lowers decimal division to DOUBLE), unary
    minus, substring, abs. Pure projection — stays inside one
    whole-stage-codegen span."""
    c = load_table(spark, sf_dir, "customer")
    display = (
        F.when(
            F.nullif(F.col("c_name"), F.lit("")).isNotNull()
            & F.nullif(F.col("c_mktsegment"), F.lit("")).isNotNull(),
            F.concat(F.col("c_name"), F.lit(" - "), F.col("c_mktsegment")),
        )
        .when(F.col("c_name").isNotNull(), F.col("c_name"))
        .otherwise(F.lit(None).cast("string"))
    )
    bal2 = money_out(dec("c_acctbal"))
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.right(F.col("c_custkey").cast("string"), F.lit(9)).cast("int").alias("customer_no"),
        display.alias("display_name"),
        F.concat(F.col("c_name"), F.lit("-1")).alias("refund_name"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("")), F.lit("UNKNOWN")).alias("segment"),
        (
            F.col("c_acctbal").cast("double")
            / F.nullif(F.col("c_nationkey").cast("double"), F.lit(0.0))
        ).alias("bal_per_nation"),
        (-bal2).alias("neg_balance"),
        F.substring(F.col("c_name"), 10, 8).alias("name_suffix"),
        F.abs(bal2).alias("abs_balance"),
    )


@query(
    "q11_first_per_group",
    oracle="""
SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
       MIN(c_custkey) AS first_custkey,
       COUNT(*) AS n_customers
FROM customer
GROUP BY c_nationkey, c_mktsegment
""",
)
def q11_first_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One representative row per group (reference A3's
    ``groupby().first()`` unknown-gateway report) — expressed as a
    deterministic MIN instead of pandas frame-order ``first``."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(
        F.min("c_custkey").alias("first_custkey"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@query(
    "q12_global_aggregates",
    oracle="""
SELECT COUNT(DISTINCT s_nationkey) AS n_supplier_nations,
       COUNT(*) AS n_suppliers,
       CAST(MIN(s_acctbal) AS DOUBLE) AS min_bal,
       CAST(MAX(s_acctbal) AS DOUBLE) AS max_bal,
       CAST(ROUND(SUM(CAST(s_acctbal AS DECIMAL(12,4))), 2) AS DOUBLE) AS total_bal,
       CAST(ROUND(SUM(CAST(s_acctbal AS DECIMAL(12,4)))
                  / COUNT(*), 2) AS DOUBLE) AS mean_bal
FROM supplier
""",
)
def q12_global_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregates (reference A4-A6): exact count-distinct,
    min/max, decimal-exact sum and mean (mean = decimal sum / count
    so both engines divide the same exact operands; DuckDB lowers
    the division to DOUBLE and Spark's decimal result is rounded to
    the same 2 dp)."""
    s = load_table(spark, sf_dir, "supplier")
    sum_d = F.sum(dec("s_acctbal"))
    return s.agg(
        F.countDistinct("s_nationkey").alias("n_supplier_nations"),
        F.count(F.lit(1)).alias("n_suppliers"),
        F.min("s_acctbal").cast("double").alias("min_bal"),
        F.max("s_acctbal").cast("double").alias("max_bal"),
        money_out(sum_d).alias("total_bal"),
        money_out(sum_d / F.count(F.lit(1))).alias("mean_bal"),
    )


@query(
    "q17_topk_per_group",
    oracle="""
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
       CAST(ROUND(CAST(o_totalprice AS DECIMAL(12,4)), 2) AS DOUBLE) AS price,
       CAST(rn AS INT) AS price_rank
FROM ranked WHERE rn <= 3
""",
)
def q17_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ranked window + filter — the scalable
    top-k idiom (no global sort, no collect). Catalyst pushes the
    rank filter into the window via a TopK/rank-limit optimization
    when available."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            money_out(dec("o_totalprice")).alias("price"),
            F.col("rn").cast("int").alias("price_rank"),
        )
    )


@query(
    "q18_semi_anti_joins",
    oracle="""
SELECT c.c_custkey AS custkey, c.c_name AS name, n.n_name AS nation
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def q18_semi_anti_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no orders (the FK-orphan /
    referential-integrity check shape, reference J6 — Spark has no
    FK enforcement so integrity is a query). ``left_anti`` avoids
    materializing the match side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
        )
    )


@query(
    "q13_revenue_rollup",
    oracle="""
SELECT CASE WHEN GROUPING(r_name) = 1 THEN NULL ELSE r_name END AS r_name,
       CASE WHEN GROUPING(n_name) = 1 THEN NULL ELSE n_name END AS n_name,
       CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INT) AS grouping_level,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def q13_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (GROUPING SETS family): revenue per
    (region, nation), per region, and grand total in ONE pass —
    ``rollup`` plans a single Expand + aggregate, not three scans.
    ``grouping_id`` disambiguates genuine NULL keys from subtotal
    rows. Beyond the reference's operator set (SURVEY §2.4 notes no
    grouping sets); a core warehouse shape at scale."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.grouping_id().cast("int").alias("grouping_level"),
            F.count(F.lit(1)).alias("n_orders"),
            money_out(F.sum(dec("o_totalprice"))).alias("revenue"),
        )
        .select("r_name", "n_name", "grouping_level", "n_orders", "revenue")
    )


@query(
    "q39_running_totals",
    oracle="""
SELECT o_custkey AS custkey,
       o_orderkey AS orderkey,
       o_orderdate AS orderdate,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
            AS DOUBLE) AS running_total,
       CAST(ROW_NUMBER()
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            AS INT) AS order_seq
FROM orders
""",
)
def q39_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic running aggregate: cumulative customer spend with an
    explicit ROWS frame plus per-customer order sequence — the
    running-aggregate window shape SURVEY §2.5 notes the reference
    never uses. One shuffle on the partition key serves both
    windows."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderdate").alias("orderdate"),
        money_out(F.sum(dec("o_totalprice")).over(frame)).alias("running_total"),
        F.row_number().over(w).cast("int").alias("order_seq"),
    )


@query(
    "q46_priority_pivot",
    oracle="""
SELECT n_name,
       CAST(ROUND(SUM(CASE WHEN o_orderpriority LIKE '1%' THEN
           CAST(o_totalprice AS DECIMAL(12,4)) ELSE 0 END), 2) AS DOUBLE) AS p1_urgent,
       CAST(ROUND(SUM(CASE WHEN o_orderpriority LIKE '2%' THEN
           CAST(o_totalprice AS DECIMAL(12,4)) ELSE 0 END), 2) AS DOUBLE) AS p2_high,
       CAST(ROUND(SUM(CASE WHEN o_orderpriority LIKE '3%' THEN
           CAST(o_totalprice AS DECIMAL(12,4)) ELSE 0 END), 2) AS DOUBLE) AS p3_medium,
       CAST(ROUND(SUM(CASE WHEN o_orderpriority NOT LIKE '1%'
                       AND o_orderpriority NOT LIKE '2%'
                       AND o_orderpriority NOT LIKE '3%' THEN
           CAST(o_totalprice AS DECIMAL(12,4)) ELSE 0 END), 2) AS DOUBLE) AS p_other
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
GROUP BY n_name
""",
)
def q46_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): revenue per nation split into order-priority
    columns. Expressed as conditional aggregation — the portable,
    scale-stable form `df.pivot()` lowers to when the pivot values
    are known (unknown values would add a distinct-collection job;
    fixed columns keep the plan one-pass)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    def bucket(pred) -> Column:
        return money_out(
            F.sum(F.when(pred, dec("o_totalprice")).otherwise(dlit("0")))
        )

    pri = F.col("o_orderpriority")
    return (
        orders.join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            bucket(pri.like("1%")).alias("p1_urgent"),
            bucket(pri.like("2%")).alias("p2_high"),
            bucket(pri.like("3%")).alias("p3_medium"),
            bucket(~pri.like("1%") & ~pri.like("2%") & ~pri.like("3%")).alias(
                "p_other"
            ),
        )
    )


@query(
    "q79_rolling_revenue",
    oracle="""
WITH o AS (
  SELECT o_custkey, o_orderkey,
         CAST(o_orderdate AS DATE) AS order_date,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             AS epoch_day,
         CAST(o_totalprice AS DECIMAL(12,4)) AS price_d
  FROM orders
)
SELECT o_custkey, o_orderkey, order_date,
       CAST(ROUND(SUM(price_d) OVER w, 2) AS DOUBLE) AS revenue_7d,
       COUNT(*) OVER w AS n_orders_7d
FROM o
WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def q79_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer rolling 7-day revenue and order count — the
    time-decayed feature window every churn/LTV model starts from.
    A RANGE frame over integer epoch-days (both engines agree on
    day arithmetic; a timestamp RANGE frame would drag interval
    semantics in), partitioned by customer — no global window. The
    rolling sum aggregates DECIMAL(12,4) (``functions.parity``), so
    the result is exact under any frame evaluation order; same-day
    orders are RANGE peers and included deterministically."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("epoch_day"),
        dec("o_totalprice").alias("price_d"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("epoch_day")
        .rangeBetween(-6, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "order_date",
        money_out(F.sum("price_d").over(w)).alias("revenue_7d"),
        F.count(F.lit(1)).over(w).alias("n_orders_7d"),
    )


_Q82_MIN_SUPPORT = 2


@query(
    "q82_basket_pairs",
    oracle=f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
part_counts AS (
  SELECT l_partkey, COUNT(*) AS n_orders_part FROM items GROUP BY l_partkey
),
total AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {_Q82_MIN_SUPPORT}
)
SELECT p.part_a, p.part_b, p.support,
       ca.n_orders_part AS n_orders_a,
       cb.n_orders_part AS n_orders_b,
       (CAST(p.support AS DOUBLE) * CAST(t.n_orders AS DOUBLE))
         / (CAST(ca.n_orders_part AS DOUBLE)
            * CAST(cb.n_orders_part AS DOUBLE)) AS lift,
       CAST(p.support AS DOUBLE) / CAST(ca.n_orders_part AS DOUBLE)
           AS confidence_a_to_b
FROM pairs p
JOIN part_counts ca ON ca.l_partkey = p.part_a
JOIN part_counts cb ON cb.l_partkey = p.part_b
CROSS JOIN total t
""",
)
def q82_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association pairs over order line items:
    co-occurrence support, lift, and confidence for every part pair
    bought together in ≥ 2 orders — the frequent-itemset/
    recommendation primitive the catalog lacked. Scale shape: the
    pair join is WITHIN-basket (equi-join on ``l_orderkey``), so
    fan-out is Σ_order (basket size)² — bounded by the max basket
    (13 here; real carts are small constants), never #parts². The
    per-part counts broadcast back onto the (already aggregated)
    pair table, and all measures are ratios of exact counts. The
    order total is a metadata scalar (one count job) embedded as a
    literal — no cross join against the data."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = items.select("l_orderkey").distinct().count()
    part_counts = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_orders_part")
    )
    a = items.select(
        "l_orderkey", F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        "l_orderkey", F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _Q82_MIN_SUPPORT)
    )
    ca = part_counts.select(
        F.col("l_partkey").alias("part_a"),
        F.col("n_orders_part").alias("n_orders_a"),
    )
    cb = part_counts.select(
        F.col("l_partkey").alias("part_b"),
        F.col("n_orders_part").alias("n_orders_b"),
    )
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .select(
            "part_a",
            "part_b",
            "support",
            "n_orders_a",
            "n_orders_b",
            (
                (F.col("support").cast("double") * F.lit(float(n_orders)))
                / (
                    F.col("n_orders_a").cast("double")
                    * F.col("n_orders_b").cast("double")
                )
            ).alias("lift"),
            (
                F.col("support").cast("double")
                / F.col("n_orders_a").cast("double")
            ).alias("confidence_a_to_b"),
        )
    )


@query(
    "q88_incremental_agg",
    oracle="""
SELECT o_custkey,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE)
           AS revenue,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
""",
)
def q88_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a distributive aggregate:
    the per-customer revenue view is maintained as BASE partial
    aggregates (orders with ``o_orderkey % 10 != 0`` — the
    already-materialized state) merged with a DELTA batch's partial
    aggregates (``% 10 = 0`` — the new arrivals), by unioning the
    two partial-agg tables and re-aggregating the SUMs/COUNTs.
    Update cost is delta-sized + view-sized — the base FACTS are
    never re-scanned, which is the whole point at 100 TB (this is
    what the streaming foreachBatch MERGE in ``streaming.jobs`` does
    per micro-batch; here it is the batch-declarative form). The
    oracle is the full recompute over all orders — the gate proves
    merge ≡ recompute. Decimal partials make the merge exact under
    any combine order."""
    orders = load_table(spark, sf_dir, "orders")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.sum(dec("o_totalprice")).alias("rev_d"),
            F.count(F.lit(1)).alias("n_orders"),
        )

    base = partial(orders.filter(F.col("o_orderkey") % 10 != 0))
    delta = partial(orders.filter(F.col("o_orderkey") % 10 == 0))
    merged = (
        base.unionAll(delta)
        .groupBy("o_custkey")
        .agg(
            F.sum("rev_d").alias("rev_d"),
            F.sum("n_orders").alias("n_orders"),
        )
    )
    return merged.select(
        "o_custkey",
        money_out(F.col("rev_d")).alias("revenue"),
        "n_orders",
    )


def _q91_iter_sql(prev: str, name: str) -> str:
    return f"""
{name} AS (
  SELECT d.node, d.degree,
         CAST(150000 + (85 * COALESCE(s.in_sum, 0)) // 100 AS BIGINT) AS pr
  FROM deg d LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM(p.pr // p.degree) AS BIGINT) AS in_sum
    FROM edges e JOIN {prev} p ON p.node = e.src
    GROUP BY e.dst
  ) s ON s.node = d.node
)"""


_Q91_ORACLE = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
prs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY pa, pb
  HAVING COUNT(*) >= 2
),
edges AS (
  SELECT pa AS src, pb AS dst FROM prs
  UNION ALL
  SELECT pb AS src, pa AS dst FROM prs
),
deg AS (
  SELECT src AS node, COUNT(*) AS degree FROM edges GROUP BY src
),
pr0 AS (
  SELECT node, degree, CAST(1000000 AS BIGINT) AS pr FROM deg
),{_q91_iter_sql('pr0', 'pr1')},{_q91_iter_sql('pr1', 'pr2')},{_q91_iter_sql('pr2', 'pr3')}
SELECT node, degree, pr FROM pr3
"""


@query("q91_copurchase_pagerank", oracle=_Q91_ORACLE)
def q91_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the co-purchase graph (q82's support ≥ 2 pairs,
    symmetrized): which products sit at the center of the bought-
    together network — the item-importance prior for
    recommendations. Three message-passing iterations in SCALED
    INTEGER arithmetic (``operators.graph.integer_pagerank``), so
    ranks are bit-exact on any engine/partitioning and the unrolled
    SQL oracle can hash-match; production swaps doubles in with the
    same plan shape. Per iteration: one src-keyed join + one
    dst-keyed aggregate, lineage checkpoint-truncated — the
    iterative-graph shape q50's components already use."""
    from shopify_db_spark.operators.graph import integer_pagerank

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )
    edges = (
        pairs.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .unionAll(
            pairs.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
        )
        # localCheckpoint (not persist): the edge list is joined once
        # per pagerank iteration; checkpoint blocks are reclaimed by
        # ContextCleaner when the result is dropped, so nothing
        # accumulates across a long-lived session
        .localCheckpoint()
    )
    return integer_pagerank(edges, iterations=3)


_Q92_ORACLE = """
WITH rfm AS (
  SELECT o_custkey,
         date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                   (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders))
             AS recency_days,
         COUNT(*) AS frequency,
         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE)
             AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT o_custkey, recency_days, frequency, monetary,
         CAST(NTILE(5) OVER (ORDER BY recency_days, o_custkey) AS INT)
             AS r_tile,
         CAST(NTILE(5) OVER (ORDER BY frequency, o_custkey) AS INT)
             AS f_tile,
         CAST(NTILE(5) OVER (ORDER BY monetary, o_custkey) AS INT)
             AS m_tile
  FROM rfm
)
SELECT o_custkey, recency_days, frequency, monetary,
       r_tile, f_tile, m_tile,
       'R' || r_tile || 'F' || f_tile || 'M' || m_tile AS segment
FROM scored
"""


@query("q92_rfm_segments", oracle=_Q92_ORACLE)
def q92_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer recency (days since
    last order, relative to the corpus max date), frequency, and
    DECIMAL-exact monetary total, each bucketed into exact quintiles
    with the two-phase NTILE (``operators.numbering.global_ntile`` —
    three semantically global NTILEs, ZERO single-partition windows;
    the oracle's plain ``NTILE(5) OVER (ORDER BY ...)`` pins the
    bucket boundaries exactly). Ties break on customer key. The
    corpus max date is a metadata scalar (one min/max-only jobs).
    Output carries the composite 'R#F#M#' segment label downstream
    marketing systems key on."""
    from shopify_db_spark.operators.numbering import global_ntile

    orders = load_table(spark, sf_dir, "orders")
    max_date = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("m")
    ).collect()[0]["m"]
    # persisted: three independent NTILE pipelines re-read it; tiling
    # dimensions independently over slim projections (then joining on
    # the customer key) keeps each two-phase NTILE's bounded offset
    # stage shallow — CHAINING the ntiles multiplies the upstream
    # lineage into every offset computation (measured: 21
    # single-partition stages chained vs 3 independent)
    rfm = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(max_date).cast("date"),
            F.max(F.col("o_orderdate").cast("date")),
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        money_out(F.sum(dec("o_totalprice"))).alias("monetary"),
        # localCheckpoint: three ntile consumers share this aggregate;
        # blocks auto-reclaimed when the result is dropped (persist
        # would leak across the session until clearCache)
    ).localCheckpoint()

    def tile_on(metric: str, name: str) -> DataFrame:
        slim = rfm.select("o_custkey", metric)
        return global_ntile(
            slim, [metric, "o_custkey"], 5, col_name=name
        ).select("o_custkey", name)

    tiled = (
        rfm.join(tile_on("recency_days", "r_tile"), "o_custkey")
        .join(tile_on("frequency", "f_tile"), "o_custkey")
        .join(tile_on("monetary", "m_tile"), "o_custkey")
    )
    return tiled.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.col("r_tile").cast("int").alias("r_tile"),
        F.col("f_tile").cast("int").alias("f_tile"),
        F.col("m_tile").cast("int").alias("m_tile"),
        F.concat(
            F.lit("R"),
            F.col("r_tile").cast("int"),
            F.lit("F"),
            F.col("f_tile").cast("int"),
            F.lit("M"),
            F.col("m_tile").cast("int"),
        ).alias("segment"),
    )
