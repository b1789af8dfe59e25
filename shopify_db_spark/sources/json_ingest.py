"""Shopify raw-JSON normalization (reference N1-N8).

The reference flattens API JSON with ``pd.json_normalize(sep='_')``
plus list comprehensions that explode nested arrays while carrying
the parent id (``shopify.py:230-363, 453-463, 504-522``). Here the
raw records are typed DataFrames (``from_json`` against explicit
StructTypes — no schema inference in the ingest hot path) and every
flatten/explode is a declarative transform:

* struct flatten → dotted-path selects with aliases (N1),
* child-array extraction → ``explode`` carrying the parent id
  (N2-N5),
* head-of-array tax lines → ``element_at(..., 1)`` + coalesce
  defaults (N6),
* deep struct paths → dotted columns (N7).

Each transform returns rows in the corresponding storage-table
schema, ready for ``CommerceStore.upsert``. The reference's
``np.nan → None`` shims (``shopify.py:249,298,...``) disappear —
Spark nulls are native.

Ingest scale note: one raw-JSON DataFrame may hold any number of API
pages; all transforms are per-row/per-explode and pipeline without
shuffles, so ingest parallelism = input partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from shopify_db_spark import schemas

_MONEY_S = "decimal(18,2)"

# --- raw JSON shapes (FIXTURES.md "Raw ingest fixtures") --------------------

_TAX_LINE = T.StructType([
    T.StructField("price", T.StringType()),
    T.StructField("rate", T.DoubleType()),
    T.StructField("title", T.StringType()),
])

_PRICE_SET = T.StructType([
    T.StructField(
        "presentment_money",
        T.StructType([
            T.StructField("amount", T.StringType()),
            T.StructField("currency_code", T.StringType()),
        ]),
    )
])

RAW_LINE_ITEM = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("product_id", T.LongType()),
    T.StructField("title", T.StringType()),
    T.StructField("sku", T.StringType()),
    T.StructField("price", T.StringType()),  # Shopify money-as-string
    T.StructField("quantity", T.IntegerType()),
    T.StructField("vendor", T.StringType()),
    T.StructField("variant_title", T.StringType()),
    T.StructField("taxable", T.BooleanType()),
    T.StructField("tax_lines", T.ArrayType(_TAX_LINE)),
    T.StructField("price_set", _PRICE_SET),
    T.StructField(
        "discount_allocations",
        T.ArrayType(T.StructType([T.StructField("amount", T.StringType())])),
    ),
])

RAW_SHIPPING_LINE = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("code", T.StringType()),
    T.StructField("price", T.StringType()),
    T.StructField("discounted_price", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("phone", T.StringType()),
    T.StructField("tax_lines", T.ArrayType(_TAX_LINE)),
    T.StructField("price_set", _PRICE_SET),
])

_ADDRESS = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("address1", T.StringType()),
    T.StructField("city", T.StringType()),
    T.StructField("zip", T.StringType()),
    T.StructField("country", T.StringType()),
    T.StructField("phone", T.StringType()),
    T.StructField("latitude", T.DoubleType()),
    T.StructField("longitude", T.DoubleType()),
])

RAW_ORDER = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("customer", T.StructType([T.StructField("id", T.LongType())])),
    T.StructField("billing_address", _ADDRESS),
    T.StructField("line_items", T.ArrayType(RAW_LINE_ITEM)),
    T.StructField("shipping_lines", T.ArrayType(RAW_SHIPPING_LINE)),
    T.StructField("total_price", T.StringType()),
    T.StructField("total_line_items_price", T.StringType()),
    T.StructField("total_discounts", T.StringType()),
    T.StructField("total_tax", T.StringType()),
    T.StructField("taxes_included", T.BooleanType()),
    T.StructField("currency", T.StringType()),
    T.StructField("financial_status", T.StringType()),
    T.StructField("fulfillment_status", T.StringType()),
    T.StructField("created_at", T.StringType()),
    T.StructField("processed_at", T.StringType()),
    T.StructField("closed_at", T.StringType()),
])

RAW_CUSTOMER = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("email", T.StringType()),
    T.StructField("first_name", T.StringType()),
    T.StructField("last_name", T.StringType()),
    T.StructField("phone", T.StringType()),
    T.StructField("default_address", _ADDRESS),
    T.StructField("note", T.StringType()),
    T.StructField("total_spent", T.StringType()),
    T.StructField("verified_email", T.BooleanType()),
    T.StructField("accepts_marketing", T.BooleanType()),
    T.StructField("created_at", T.StringType()),
    T.StructField("updated_at", T.StringType()),
])

RAW_VARIANT = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("product_id", T.LongType()),
    T.StructField("price", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("sku", T.StringType()),
    T.StructField("option1", T.StringType()),
    T.StructField("option2", T.StringType()),
    T.StructField("option3", T.StringType()),
    T.StructField("created_at", T.StringType()),
    T.StructField("updated_at", T.StringType()),
])

RAW_PRODUCT = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("title", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("product_type", T.StringType()),
    T.StructField("vendor", T.StringType()),
    T.StructField("created_at", T.StringType()),
    T.StructField("updated_at", T.StringType()),
    T.StructField("variants", T.ArrayType(RAW_VARIANT)),
])

RAW_TRANSACTION = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("order_id", T.LongType()),
    T.StructField("status", T.StringType()),
    T.StructField("amount", T.StringType()),
    T.StructField("currency", T.StringType()),
    T.StructField("error_code", T.StringType()),
    T.StructField("gateway", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("created_at", T.StringType()),
    T.StructField("processed_at", T.StringType()),
])

RAW_REFUND = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("order_id", T.LongType()),
    T.StructField("note", T.StringType()),
    T.StructField("created_at", T.StringType()),
    T.StructField("processed_at", T.StringType()),
    T.StructField(
        "transactions", T.ArrayType(T.StructType([T.StructField("id", T.LongType())]))
    ),
    T.StructField(
        "refund_line_items",
        T.ArrayType(
            T.StructType([
                T.StructField("id", T.LongType()),
                T.StructField("quantity", T.IntegerType()),
                T.StructField("subtotal", T.StringType()),
                T.StructField(
                    "line_item",
                    T.StructType([T.StructField("id", T.LongType())]),
                ),
                T.StructField(
                    "subtotal_set",
                    T.StructType([
                        T.StructField(
                            "shop_money",
                            T.StructType([
                                T.StructField("currency_code", T.StringType())
                            ]),
                        )
                    ]),
                ),
            ])
        ),
    ),
])


def parse_raw(spark: SparkSession, json_lines: DataFrame | list[str], schema: T.StructType) -> DataFrame:
    """Parse a DataFrame (or list) of JSON strings into typed rows."""
    if isinstance(json_lines, list):
        json_lines = spark.createDataFrame(
            [(s,) for s in json_lines], T.StructType([T.StructField("raw", T.StringType())])
        )
    return json_lines.select(
        F.from_json(F.col(json_lines.columns[0]), schema).alias("r")
    ).select("r.*")


def _ts(col: str) -> F.Column:
    # ISO-8601 with offset → session-UTC timestamp
    return F.col(col).cast("timestamp")


def normalize_customers(raw: DataFrame) -> DataFrame:
    """Reference ``shopify.py:230-249``: struct flatten, address
    renames, phone fallback to the default address phone."""
    return raw.select(
        F.col("id"),
        F.col("email"),
        F.col("default_address.name").alias("name"),
        F.col("first_name"),
        F.col("last_name"),
        F.coalesce(F.col("phone"), F.col("default_address.phone")).alias("phone"),
        F.col("default_address.address1").alias("address"),
        F.col("default_address.city").alias("city"),
        F.col("default_address.zip").alias("zip"),
        F.col("default_address.country").alias("country"),
        F.col("total_spent").cast(_MONEY_S).alias("total_spent"),
        F.col("verified_email"),
        F.col("note"),
        F.col("accepts_marketing"),
        _ts("created_at").alias("created_at"),
        _ts("updated_at").alias("updated_at"),
    ).select(*[f.name for f in schemas.CUSTOMERS.fields])


def normalize_orders(raw: DataFrame) -> DataFrame:
    """Reference ``shopify.py:283-298``: header projection with the
    total_discounts/total_tax renames."""
    return raw.select(
        F.col("id"),
        F.col("customer.id").alias("customer_id"),
        F.col("name"),
        F.col("fulfillment_status"),
        F.col("financial_status"),
        F.col("total_price").cast(_MONEY_S).alias("total_price"),
        F.col("total_line_items_price").cast(_MONEY_S).alias("total_line_items_price"),
        F.col("total_discounts").cast(_MONEY_S).alias("total_discounts_amount"),
        F.col("total_tax").cast(_MONEY_S).alias("total_tax_amount"),
        F.col("taxes_included"),
        F.col("currency"),
        _ts("created_at").alias("created_at"),
        _ts("closed_at").alias("closed_at"),
        _ts("processed_at").alias("processed_at"),
    )


def normalize_line_items(raw_orders: DataFrame) -> DataFrame:
    """Reference ``shopify.py:303-332``: explode ``line_items``
    carrying the parent order id; head-of-array tax line with 0/None
    defaults; currency from the deep price_set path; derived
    ``total_price = unit_price × quantity``."""
    li = raw_orders.select(
        F.col("id").alias("order_id"), F.explode("line_items").alias("li")
    )
    tax0 = F.element_at("li.tax_lines", 1)
    unit_price = F.col("li.price").cast(_MONEY_S)
    return li.select(
        F.col("li.id").alias("id"),
        F.col("order_id"),
        F.col("li.product_id").alias("product_id"),
        F.col("li.title").alias("title"),
        F.col("li.sku").alias("sku"),
        unit_price.alias("unit_price"),
        (unit_price * F.col("li.quantity")).cast(_MONEY_S).alias("total_price"),
        F.coalesce(
            F.element_at("li.discount_allocations", 1)["amount"].cast(_MONEY_S),
            F.lit(0).cast(_MONEY_S),
        ).alias("total_discount_amount"),
        F.col("li.quantity").alias("quantity"),
        F.col("li.vendor").alias("vendor"),
        F.col("li.variant_title").alias("variant_title"),
        F.coalesce(tax0["price"].cast(_MONEY_S), F.lit(0).cast(_MONEY_S)).alias(
            "tax_amount"
        ),
        F.coalesce(tax0["rate"].cast("decimal(8,4)"), F.lit(0).cast("decimal(8,4)")).alias(
            "tax_rate"
        ),
        tax0["title"].alias("tax_title"),
        F.col("li.taxable").alias("taxable"),
        F.col("li.price_set.presentment_money.currency_code").alias("currency"),
    )


def normalize_shipping(raw_orders: DataFrame) -> DataFrame:
    """Reference ``shopify.py:338-362``: explode ``shipping_lines``,
    merging the parent order's *billing* address (yes, billing — the
    reference's heatmap coordinates come from the billing address,
    ``shopify.py:347-348``; replicated)."""
    sl = raw_orders.select(
        F.col("id").alias("order_id"),
        F.col("billing_address").alias("addr"),
        F.explode("shipping_lines").alias("sl"),
    )
    return sl.select(
        F.col("sl.id").alias("id"),
        F.col("order_id"),
        F.col("sl.code").alias("code"),
        F.col("sl.price").cast(_MONEY_S).alias("price"),
        F.col("sl.discounted_price").cast(_MONEY_S).alias("discounted_price"),
        F.col("sl.price_set.presentment_money.currency_code").alias("currency"),
        F.col("sl.title").alias("title"),
        F.col("sl.source").alias("source"),
        F.col("sl.phone").alias("phone"),
        F.col("addr.address1").alias("address"),
        F.col("addr.city").alias("city"),
        F.col("addr.zip").alias("zip"),
        F.col("addr.country").alias("country"),
        F.col("addr.latitude").cast("decimal(9,6)").alias("latitude"),
        F.col("addr.longitude").cast("decimal(9,6)").alias("longitude"),
    )


def normalize_transactions(raw: DataFrame) -> DataFrame:
    """Reference ``shopify.py:392-410`` (flattened transaction rows;
    the order id is already attached by the fetch layer)."""
    return raw.select(
        "id",
        "order_id",
        "status",
        F.col("amount").cast(_MONEY_S).alias("amount"),
        "currency",
        "error_code",
        "gateway",
        "kind",
        _ts("created_at").alias("created_at"),
        _ts("processed_at").alias("processed_at"),
    )


def normalize_refunds(raw: DataFrame) -> DataFrame:
    """Reference ``shopify.py:439-452``: refund header rows —
    transaction id from the head of the nested transactions array,
    refunded count = size of the line-item array."""
    return raw.select(
        F.col("id"),
        F.col("order_id"),
        F.element_at("transactions", 1)["id"].alias("transaction_id"),
        F.col("note"),
        F.coalesce(F.size("refund_line_items"), F.lit(0)).alias(
            "refunded_product_cnt"
        ),
        _ts("created_at").alias("created_at"),
        _ts("processed_at").alias("processed_at"),
    )


def normalize_refund_line_items(raw: DataFrame) -> DataFrame:
    """Reference ``shopify.py:453-463``: explode refund line items
    with the deep subtotal_set currency path."""
    rli = raw.select(
        F.col("id").alias("refund_id"), F.explode("refund_line_items").alias("rli")
    )
    return rli.select(
        F.col("rli.id").alias("id"),
        F.col("refund_id"),
        F.col("rli.line_item.id").alias("line_item_product_id"),
        F.col("rli.quantity").alias("quantity"),
        F.col("rli.subtotal_set.shop_money.currency_code").alias("currency"),
        F.col("rli.subtotal").cast(_MONEY_S).alias("refund_amount"),
    )


def normalize_products(raw: DataFrame) -> DataFrame:
    """Reference ``shopify.py:504-509``."""
    return raw.select(
        "id",
        "title",
        "status",
        "product_type",
        _ts("created_at").alias("created_at"),
        _ts("updated_at").alias("updated_at"),
        "vendor",
    )


def normalize_product_variants(raw_products: DataFrame) -> DataFrame:
    """Reference ``shopify.py:512-522``: explode ``variants``."""
    pv = raw_products.select(F.explode("variants").alias("pv"))
    return pv.select(
        F.col("pv.id").alias("id"),
        F.col("pv.product_id").alias("product_id"),
        F.col("pv.price").cast(_MONEY_S).alias("price"),
        F.col("pv.title").alias("title"),
        F.col("pv.sku").alias("sku"),
        F.col("pv.option1").alias("option1"),
        F.col("pv.option2").alias("option2"),
        F.col("pv.option3").alias("option3"),
        F.col("pv.created_at").cast("timestamp").alias("created_at"),
        F.col("pv.updated_at").cast("timestamp").alias("updated_at"),
    )
