"""Typed schemas for the commerce data model.

Spark ``StructType`` declarations of the reference's 10-table
PostgreSQL schema (reference ``setup.sql:1-190``), the invoice output
shape (reference ``tripletex.py:6-27``, ``db.py:439-458``), and the
raw Shopify-JSON shapes the ingest path normalizes
(reference ``shopify.py:13-93`` field allowlists).

Type mapping (SURVEY.md §1.2): BIGINT ids → LongType, money
``DECIMAL`` → DecimalType(18,2) (exact; never DoubleType — the
reference's 1%-reconciliation check is decimal-sensitive),
``tax_rate`` → DecimalType(8,4), TIMESTAMPTZ → TimestampType under a
pinned UTC session, ``DATE(ts)`` projections → DateType.

Spark has no PK/FK enforcement; referential integrity is validated
by ``plans.quality`` checks instead (anti-join orphan scans), which
matches the reference's verification-oriented style.
"""

from __future__ import annotations

from pyspark.sql import types as T

MONEY = T.DecimalType(18, 2)
RATE = T.DecimalType(8, 4)
GEO = T.DecimalType(9, 6)


def _struct(fields: list[tuple[str, T.DataType] | tuple[str, T.DataType, bool]]) -> T.StructType:
    out = []
    for f in fields:
        name, dtype = f[0], f[1]
        nullable = f[2] if len(f) > 2 else True
        out.append(T.StructField(name, dtype, nullable))
    return T.StructType(out)


# --- storage tables (reference setup.sql:1-190) -----------------------------

CUSTOMERS = _struct([
    ("id", T.LongType(), False),
    ("email", T.StringType()),
    ("name", T.StringType()),
    ("first_name", T.StringType()),
    ("last_name", T.StringType()),
    ("phone", T.StringType()),
    ("address", T.StringType()),
    ("city", T.StringType()),
    ("zip", T.StringType()),
    ("country", T.StringType()),
    ("total_spent", MONEY),
    ("verified_email", T.BooleanType()),
    ("note", T.StringType()),
    ("accepts_marketing", T.BooleanType()),
    ("created_at", T.TimestampType()),
    ("updated_at", T.TimestampType()),
])

ORDERS = _struct([
    ("id", T.LongType(), False),
    ("customer_id", T.LongType()),
    ("name", T.StringType(), False),
    ("fulfillment_status", T.StringType()),
    ("financial_status", T.StringType()),
    ("total_price", MONEY, False),
    ("total_line_items_price", MONEY),
    ("total_discounts_amount", MONEY),
    ("total_tax_amount", MONEY),
    ("taxes_included", T.BooleanType()),
    ("currency", T.StringType()),
    ("created_at", T.TimestampType()),
    ("closed_at", T.TimestampType()),
    ("processed_at", T.TimestampType()),
])

DISCOUNTS = _struct([
    ("id", T.LongType(), False),  # SERIAL in reference; surrogate hash of (order_id, discount_code)
    ("order_id", T.LongType()),
    ("discount_code", T.StringType()),
    ("discount_type", T.StringType()),
    ("discount_value", MONEY),
    ("discount_value_type", T.StringType()),
])

PRODUCTS = _struct([
    ("id", T.LongType(), False),
    ("title", T.StringType()),
    ("status", T.StringType()),
    ("product_type", T.StringType()),
    ("created_at", T.TimestampType()),
    ("updated_at", T.TimestampType()),
    ("vendor", T.StringType()),
])

PRODUCT_VARIANTS = _struct([
    ("id", T.LongType(), False),
    ("product_id", T.LongType(), False),
    ("price", MONEY),
    ("title", T.StringType()),
    ("sku", T.StringType()),
    ("option1", T.StringType()),
    ("option2", T.StringType()),
    ("option3", T.StringType()),
    ("created_at", T.TimestampType()),
    ("updated_at", T.TimestampType()),
])

LINE_ITEM_PRODUCTS = _struct([
    ("id", T.LongType(), False),
    ("order_id", T.LongType(), False),
    ("product_id", T.LongType()),
    ("title", T.StringType(), False),
    ("sku", T.StringType()),
    ("unit_price", MONEY, False),
    ("total_price", MONEY, False),
    ("total_discount_amount", MONEY),
    ("quantity", T.IntegerType(), False),
    ("vendor", T.StringType()),
    ("variant_title", T.StringType()),
    ("tax_amount", MONEY),
    ("tax_rate", RATE),
    ("tax_title", T.StringType()),
    ("taxable", T.BooleanType()),
    ("currency", T.StringType()),
])

TRANSACTIONS = _struct([
    ("id", T.LongType(), False),
    ("order_id", T.LongType(), False),
    ("status", T.StringType()),
    ("amount", MONEY),
    ("currency", T.StringType()),
    ("error_code", T.StringType()),
    ("gateway", T.StringType()),
    ("kind", T.StringType()),
    ("created_at", T.TimestampType()),
    ("processed_at", T.TimestampType()),
])

SHIPPING = _struct([
    ("id", T.LongType(), False),
    ("order_id", T.LongType()),
    ("code", T.StringType()),
    ("price", MONEY, False),
    ("discounted_price", MONEY),
    ("currency", T.StringType()),
    ("title", T.StringType()),
    ("source", T.StringType()),
    ("phone", T.StringType()),
    ("address", T.StringType()),
    ("city", T.StringType()),
    ("zip", T.StringType()),
    ("country", T.StringType()),
    ("latitude", GEO),
    ("longitude", GEO),
])

REFUNDS = _struct([
    ("id", T.LongType(), False),
    ("order_id", T.LongType(), False),
    ("transaction_id", T.LongType(), False),
    ("note", T.StringType()),
    ("refunded_product_cnt", T.IntegerType()),
    ("created_at", T.TimestampType()),
    ("processed_at", T.TimestampType()),
])

LINE_ITEM_PRODUCT_REFUNDS = _struct([
    ("id", T.LongType(), False),
    ("refund_id", T.LongType(), False),
    ("line_item_product_id", T.LongType(), False),
    ("quantity", T.IntegerType(), False),
    ("currency", T.StringType()),
    ("refund_amount", MONEY),
])

#: table name -> schema, with each table's upsert conflict key
#: (reference db.py:128,159,184,213,240,265,299,333,367,393).
# Legacy product sub-schema (reference db.py:485-606): SERIAL id has
# no Spark equivalent — the surrogate id is a deterministic hash of
# the unique natural key `name` (SURVEY §7.4 item 7). Reference uses
# REAL for price; we keep exact decimal (documented deviation — REAL
# would break decimal-exact comparisons for no benefit).
LEGACY_PRODUCT = _struct([
    ("id", T.LongType(), False),
    ("name", T.StringType(), False),
    ("brand", T.StringType()),
    ("price", MONEY),
    ("currency", T.StringType()),
    ("img", T.StringType()),
])

COMMERCE_TABLES: dict[str, T.StructType] = {
    "customers": CUSTOMERS,
    "orders": ORDERS,
    "discounts": DISCOUNTS,
    "products": PRODUCTS,
    "product_variants": PRODUCT_VARIANTS,
    "line_item_products": LINE_ITEM_PRODUCTS,
    "transactions": TRANSACTIONS,
    "shipping": SHIPPING,
    "refunds": REFUNDS,
    "line_item_product_refunds": LINE_ITEM_PRODUCT_REFUNDS,
    "product": LEGACY_PRODUCT,
}

UPSERT_KEYS: dict[str, list[str]] = {
    name: ["id"] for name in COMMERCE_TABLES
} | {
    "discounts": ["order_id", "discount_code"],
    # legacy product upserts ON CONFLICT (name) (db.py:596-603)
    "product": ["name"],
}

# Columns the reference's ON CONFLICT SET lists *omit* (the insert
# includes them but an update leaves the old value): orders never
# refreshes financial_status/currency (db.py:129-140), customers
# never refreshes note (db.py:266-280), line_item_products never
# refreshes tax_title (db.py:300-314). Replicated for parity —
# see operators.upsert.
UPSERT_FROZEN_COLS: dict[str, list[str]] = {
    "orders": ["financial_status", "currency"],
    "customers": ["note"],
    "line_item_products": ["tax_title"],
}

# --- invoice output (reference tripletex.py:6-27) ---------------------------

INVOICE_REQUIRED_FIELDS = [
    "CUSTOMER NO",
    "ORDER NO",
    "PAID AMOUNT",
    "ORDER LINE - COUNT",
    "ORDER LINE - UNIT PRICE",
    "ORDER LINE - VAT CODE",
    "PAYMENT TYPE",
    "INVOICE DATE",
    "DELIVERY DATE",
    "ORDER DATE",
    "DUE DATE",
    "INVOICE NO",
]

INVOICE_OPTIONAL_FIELDS = [
    "CUSTOMER NAME",
    "ORDER LINE - PROD NAME",
    "ORDER LINE - DISCOUNT",
    "ORDER LINE - DESCRIPTION",
    "ORDER LINE - PROD NO",
]

#: CSV column order (required then optional, reference shopifydb.py:144)
INVOICE_CSV_COLUMNS = INVOICE_REQUIRED_FIELDS + INVOICE_OPTIONAL_FIELDS
