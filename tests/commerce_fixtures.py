"""Hand-built commerce fixture rows covering the FIXTURES.md scenario
list: ordinary orders, kind-ranking tie-breaks, gift cards, refunds
with and without line items, guest orders, empty-string variants,
zero-price shipping (div-by-zero), sequence gaps, mispriced orders,
13-digit customer ids, unknown gateways, duplicate identical line
items (UNION-DISTINCT collapse).
"""

from __future__ import annotations

from datetime import datetime
from decimal import Decimal as D

from pyspark.sql import DataFrame, SparkSession

from shopify_db_spark import schemas


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


# 13-digit ids exercise the CUSTOMER NO last-9-digits truncation.
ALICE, BOB, CARO = 1234567890123, 9876543210987, 555

CUSTOMERS = [
    # id, email, name, first, last, phone, addr, city, zip, country,
    # total_spent, verified, note, marketing, created, updated
    (ALICE, "a@x.no", "Alice Ask", "Alice", "Ask", None, "Gate 1", "Oslo", "0150", "Norway",
     D("1000.00"), True, None, True, _ts("2023-01-01 10:00"), _ts("2024-01-01 10:00")),
    (BOB, "b@x.no", "Bob Berg", "Bob", "Berg", "+4712345678", "Gate 2", "Bergen", "5003", "Norway",
     D("500.00"), False, "VIP", False, _ts("2023-02-01 10:00"), _ts("2024-01-02 10:00")),
    (CARO, "c@x.fr", "Côte Çédille", "Côte", "Çédille", None, "Rue 3", "Paris", "75001", "France",
     D("50.00"), True, None, True, _ts("2023-03-01 10:00"), _ts("2024-01-03 10:00")),
]

ORDERS = [
    # id, customer_id, name, fulfillment, financial, total, line_total,
    # disc_total, tax_total, taxes_incl, currency, created, closed, processed
    (11, ALICE, "#1001", "fulfilled", "paid", D("250.00"), D("240.00"), D("0.00"),
     D("50.00"), True, "NOK", _ts("2024-01-05 10:00"), None, _ts("2024-01-05 10:05")),
    # created late evening +02:00 == previous-day boundary check is in
    # UTC already (engine pins UTC): 21:30 UTC stays Jan 6.
    (12, BOB, "#1002", "fulfilled", "paid", D("400.00"), D("380.00"), D("20.00"),
     D("80.00"), True, "NOK", _ts("2024-01-06 21:30"), None, _ts("2024-01-06 21:35")),
    (13, CARO, "#1003", "fulfilled", "paid", D("150.00"), D("150.00"), D("0.00"),
     D("30.00"), True, "NOK", _ts("2024-01-07 09:00"), None, _ts("2024-01-07 09:01")),
    (14, ALICE, "#1004", "fulfilled", "refunded", D("300.00"), D("300.00"), D("0.00"),
     D("60.00"), True, "NOK", _ts("2024-01-08 12:00"), None, _ts("2024-01-08 12:01")),
    (15, None, "#1005", None, "paid", D("99.00"), D("99.00"), D("0.00"),
     D("19.80"), True, "NOK", _ts("2024-01-09 08:00"), None, _ts("2024-01-09 08:01")),
    # gap: no #1006 — trips the order-number sequence check (V3)
    (17, BOB, "#1007", "partial", "paid", D("120.00"), D("120.00"), D("0.00"),
     D("24.00"), True, "NOK", _ts("2024-01-10 11:00"), None, _ts("2024-01-10 11:01")),
    # mispriced: paid 500 vs one 80.00 line — trips the 1% check (V7)
    (18, CARO, "#1008", "fulfilled", "paid", D("500.00"), D("80.00"), D("0.00"),
     D("16.00"), True, "NOK", _ts("2024-01-11 14:00"), None, _ts("2024-01-11 14:01")),
]

LINE_ITEMS = [
    # id, order_id, product_id, title, sku, unit_price, total_price,
    # total_discount_amount, qty, vendor, variant_title, tax_amount,
    # tax_rate, tax_title, taxable, currency
    # #1001: two *identical-valued* line items (distinct ids, same
    # everything else) — they collapse in the UNION DISTINCT, the
    # reference's documented caveat (SURVEY §2.7).
    (101, 11, 9001, "Wool Sweater", "SW-01", D("100.00"), D("100.00"), D("0.00"), 1,
     "Knitwear", "Large", D("20.00"), D("0.2500"), "MVA", True, "NOK"),
    (102, 11, 9001, "Wool Sweater", "SW-01", D("100.00"), D("100.00"), D("0.00"), 1,
     "Knitwear", "Large", D("20.00"), D("0.2500"), "MVA", True, "NOK"),
    (103, 11, 9002, "Socks", "SO-02", D("40.00"), D("40.00"), D("8.00"), 1,
     "Knitwear", "", D("8.00"), D("0.2500"), "MVA", True, "NOK"),
    # #1002: 20% discount line (clean percentage), plus NULL-sku line
    # whose NULL PROD NO + NULL DESCRIPTION trips V6.
    (104, 12, 9003, "Jacket", "JA-03", D("200.00"), D("200.00"), D("40.00"), 1,
     "Outdoor", "Blue", D("40.00"), D("0.2500"), "MVA", True, "NOK"),
    (105, 12, 9004, "Custom Item", None, D("90.00"), D("180.00"), D("0.00"), 2,
     None, None, D("36.00"), D("0.2500"), "MVA", True, "NOK"),
    # #1003: single line alongside the gift card
    (106, 13, 9005, "Beanie", "BE-05", D("150.00"), D("150.00"), D("0.00"), 1,
     "Knitwear", None, D("30.00"), D("0.2500"), "MVA", True, "NOK"),
    # #1004: two lines, both later refunded (one partially)
    (107, 14, 9006, "Boots", "BO-06", D("120.00"), D("240.00"), D("0.00"), 2,
     "Outdoor", "43", D("48.00"), D("0.2500"), "MVA", True, "NOK"),
    (108, 14, 9007, "Scarf", "SC-07", D("60.00"), D("60.00"), D("0.00"), 1,
     "Knitwear", "", D("12.00"), D("0.2500"), "MVA", True, "NOK"),
    # #1005: empty-string variant title (NULLIF path on the display name)
    (109, 15, 9008, "Mittens", "MI-08", D("99.00"), D("99.00"), D("0.00"), 1,
     "Knitwear", "", D("19.80"), D("0.2500"), "MVA", True, "NOK"),
    # #1007
    (110, 17, 9009, "Hat", "HA-09", D("120.00"), D("120.00"), D("0.00"), 1,
     "Knitwear", "One size", D("24.00"), D("0.2500"), "MVA", True, "NOK"),
    # #1008 (mispriced vs order total)
    (111, 18, 9010, "Gloves", "GL-10", D("80.00"), D("80.00"), D("0.00"), 1,
     "Knitwear", None, D("16.00"), D("0.2500"), "MVA", True, "NOK"),
]

TRANSACTIONS = [
    # id, order_id, status, amount, currency, error_code, gateway, kind,
    # created_at, processed_at
    (201, 11, "success", D("250.00"), "NOK", None, "vipps", "sale",
     _ts("2024-01-05 10:01"), _ts("2024-01-05 10:02")),
    # #1002: two captures (tie on kind → id tie-break), an authorization,
    # and a failure to be filtered out.
    (202, 12, "success", D("400.00"), "NOK", None, "stripe", "capture",
     _ts("2024-01-06 21:31"), _ts("2024-01-06 21:32")),
    (203, 12, "success", D("400.00"), "NOK", None, "stripe", "capture",
     _ts("2024-01-06 21:33"), _ts("2024-01-06 21:34")),
    (204, 12, "success", D("400.00"), "NOK", None, "stripe", "authorization",
     _ts("2024-01-06 21:30"), _ts("2024-01-06 21:30")),
    (205, 12, "failure", D("400.00"), "NOK", "card_declined", "stripe", "sale",
     _ts("2024-01-06 21:29"), _ts("2024-01-06 21:29")),
    # #1003: gift card redemption + real payment
    (206, 13, "success", D("50.00"), "NOK", None, "gift_card", "sale",
     _ts("2024-01-07 09:00"), _ts("2024-01-07 09:00")),
    (207, 13, "success", D("100.00"), "NOK", None, "vipps", "sale",
     _ts("2024-01-07 09:00"), _ts("2024-01-07 09:01")),
    # #1004: sale then refund transactions
    (208, 14, "success", D("300.00"), "NOK", None, "vipps", "sale",
     _ts("2024-01-08 12:01"), _ts("2024-01-08 12:02")),
    (209, 14, "success", D("300.00"), "NOK", None, "vipps", "refund",
     _ts("2024-01-09 15:00"), _ts("2024-01-09 15:01")),
    (210, 14, "success", D("60.00"), "NOK", None, "vipps", "refund",
     _ts("2024-01-12 15:00"), _ts("2024-01-12 15:01")),
    # #1005
    (211, 15, "success", D("99.00"), "NOK", None, "manual", "sale",
     _ts("2024-01-09 08:01"), _ts("2024-01-09 08:02")),
    # #1007
    (212, 17, "success", D("120.00"), "NOK", None, "vipps", "sale",
     _ts("2024-01-10 11:01"), _ts("2024-01-10 11:02")),
    # #1008
    (213, 18, "success", D("500.00"), "NOK", None, "vipps", "sale",
     _ts("2024-01-11 14:01"), _ts("2024-01-11 14:02")),
]

SHIPPING = [
    # id, order_id, code, price, discounted_price, currency, title,
    # source, phone, addr, city, zip, country, lat, lon
    (301, 11, "STD", D("49.00"), D("49.00"), "NOK", "Standard", "shopify",
     None, "Gate 1", "Oslo", "0150", "Norway", D("59.913900"), D("10.752200")),
    # #1002 has TWO shipping rows — dedup must keep exactly one
    # (lowest id under the engine's deterministic tie-break).
    (302, 12, "EXP", D("99.00"), D("79.00"), "NOK", "Express", "shopify",
     None, "Gate 2", "Bergen", "5003", "Norway", D("60.391300"), D("5.322100")),
    (303, 12, "STD", D("49.00"), D("49.00"), "NOK", "Standard", "shopify",
     None, "Gate 2", "Bergen", "5003", "Norway", D("60.391300"), D("5.322100")),
    # #1005: zero-price shipping (division-by-zero guard) + missing geo
    (304, 15, "FREE", D("0.00"), D("0.00"), "NOK", "Free shipping", "shopify",
     None, None, None, None, None, None, None),
]

REFUNDS = [
    # id, order_id, transaction_id, note, refunded_product_cnt, created, processed
    (401, 14, 209, "Too small", 3, _ts("2024-01-09 15:00"), _ts("2024-01-09 15:01")),
    # second refund with NO line items — exercises the COALESCE(t.amount)
    # fallbacks; empty-string note → 'Refund with unspecified reason'.
    (402, 14, 210, "", None, _ts("2024-01-12 15:00"), _ts("2024-01-12 15:01")),
]

REFUND_ITEMS = [
    # id, refund_id, line_item_product_id, quantity, currency, refund_amount
    (501, 401, 107, 2, "NOK", D("240.00")),
    (502, 401, 108, 1, "NOK", D("60.00")),
]

DISCOUNTS = [
    # id, order_id, discount_code, discount_type, discount_value, value_type
    # Two discounts on #1001 — the reference's vestigial join would fan
    # out product lines here; the engine omits the dead join (provably
    # identical post-DISTINCT).
    (601, 11, "WINTER10", "code", D("10.00"), "percentage"),
    (602, 11, "FREESHIP", "code", D("0.00"), "shipping"),
    (603, 12, "SAVE20", "code", D("20.00"), "percentage"),
]

_DATA = {
    "customers": CUSTOMERS,
    "orders": ORDERS,
    "line_item_products": LINE_ITEMS,
    "transactions": TRANSACTIONS,
    "shipping": SHIPPING,
    "refunds": REFUNDS,
    "line_item_product_refunds": REFUND_ITEMS,
    "discounts": DISCOUNTS,
    "products": [],
    "product_variants": [],
}


def build_tables(spark: SparkSession) -> dict[str, DataFrame]:
    return {
        name: spark.createDataFrame(rows, schema=schemas.COMMERCE_TABLES[name])
        for name, rows in _DATA.items()
    }


def write_fixture_parquet(spark: SparkSession, out_dir: str) -> dict[str, str]:
    """Write the fixtures as parquet (one dir per table) so DuckDB can
    read byte-identical data for differential tests."""
    paths = {}
    for name, df in build_tables(spark).items():
        path = f"{out_dir}/{name}.parquet"
        df.coalesce(1).write.mode("overwrite").parquet(path)
        paths[name] = path
    return paths
