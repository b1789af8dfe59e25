"""Legacy surface: customer_map view, product listing/search, and
the name-keyed legacy product upsert (reference db.py:485-606,
setup.sql:396-404)."""

from __future__ import annotations

from decimal import Decimal

from shopify_db_spark import schemas
from shopify_db_spark.plans.legacy import (
    all_products,
    customer_map,
    products_by_name,
    with_product_ids,
)
from shopify_db_spark.sources.store import CommerceStore


def _products(spark, rows):
    return with_product_ids(
        spark.createDataFrame(
            [(n, b, Decimal(p), c, i) for n, b, p, c, i in rows],
            "name string, brand string, price decimal(18,2), "
            "currency string, img string",
        )
    ).select([f.name for f in schemas.LEGACY_PRODUCT.fields])


def test_customer_map_truncates_to_nine_digits(spark):
    customers = spark.createDataFrame(
        [(6789012345678, "Big Id", "+47 1", "a@b.c"), (42, "Small Id", None, None)],
        "id long, name string, phone string, email string",
    )
    out = {r["shopify_id"]: r for r in customer_map(customers).collect()}
    assert out[6789012345678]["tripletex_id"] == 12345678  # last 9 digits, int-cast
    assert out[42]["tripletex_id"] == 42                   # short ids pass through


def test_product_search_and_order(spark):
    products = _products(spark, [
        ("Green Tea", "Acme", "30.00", "USD", "i1"),
        ("GREENHOUSE kit", "Zeta", "10.00", "USD", "i2"),
        ("Red Tea", "Acme", "20.00", "USD", "i3"),
    ])
    hits = products_by_name(products, "green").collect()
    assert [r["name"] for r in hits] == ["Green Tea", "GREENHOUSE kit"]  # brand order
    listing = all_products(products).collect()
    assert [r["name"] for r in listing] == [
        "Red Tea", "Green Tea", "GREENHOUSE kit",  # (Acme,20) (Acme,30) (Zeta,10)
    ]


def test_product_ids_deterministic(spark):
    a = _products(spark, [("Green Tea", "Acme", "30.00", "USD", "i1")]).collect()[0]
    b = _products(spark, [("Green Tea", "Acme", "99.00", "USD", "x")]).collect()[0]
    assert a["id"] == b["id"] >= 0  # id is a pure function of name


def test_legacy_product_upsert_by_name(spark, tmp_path):
    store = CommerceStore(spark, str(tmp_path))
    store.upsert("product", _products(spark, [
        ("Green Tea", "Acme", "30.00", "USD", "i1"),
        ("Red Tea", "Acme", "20.00", "USD", "i3"),
    ]))
    # conflict on name updates brand/price/currency/img (db.py:596-603)
    store.upsert("product", _products(spark, [
        ("Green Tea", "Acme", "35.00", "USD", "i1-new"),
        ("Blue Tea", "Zeta", "15.00", "USD", "i4"),
    ]))
    rows = {r["name"]: r for r in store.read("product").collect()}
    assert set(rows) == {"Green Tea", "Red Tea", "Blue Tea"}
    assert rows["Green Tea"]["price"] == Decimal("35.00")
    assert rows["Green Tea"]["img"] == "i1-new"
    assert rows["Red Tea"]["price"] == Decimal("20.00")
