"""Ingest orchestration: raw Shopify records → normalize → upsert
(the reference's ``shopify-update`` pipeline, SURVEY §3.1).

Two entry modes share all transform/sink code:

* **API mode** — pages stream from the REST client
  (``sources.shopify_api``); each entity's pages accumulate into one
  raw DataFrame per run and merge once per table (vs. the
  reference's per-page upsert — same result, far less write
  amplification);
* **offline mode** — raw JSON-lines files stand in for the API
  (``ingest_from_json_dir``); this is also the test path.

The derived-fan-out structure of the reference is preserved: one
orders payload feeds three tables (orders, line_item_products,
shipping), a refunds payload feeds two (refunds,
line_item_product_refunds), a products payload feeds two
(products, product_variants).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shopify_db_spark.sources import json_ingest as ji
from shopify_db_spark.sources import shopify_api as api
from shopify_db_spark.sources import spark_datasource as dsrc
from shopify_db_spark.sources.store import CommerceStore


def _raw_df(spark: SparkSession, records: list[dict], schema) -> DataFrame:
    lines = [json.dumps(r) for r in records]
    return ji.parse_raw(spark, lines, schema)


def ingest_orders_payload(store: CommerceStore, raw_orders: DataFrame) -> None:
    store.upsert("orders", ji.normalize_orders(raw_orders))
    store.upsert("line_item_products", ji.normalize_line_items(raw_orders))
    store.upsert("shipping", ji.normalize_shipping(raw_orders))


def ingest_refunds_payload(store: CommerceStore, raw_refunds: DataFrame) -> None:
    store.upsert("refunds", ji.normalize_refunds(raw_refunds))
    store.upsert(
        "line_item_product_refunds", ji.normalize_refund_line_items(raw_refunds)
    )


def ingest_products_payload(store: CommerceStore, raw_products: DataFrame) -> None:
    store.upsert("products", ji.normalize_products(raw_products))
    store.upsert("product_variants", ji.normalize_product_variants(raw_products))


def refund_order_ids(store: CommerceStore) -> DataFrame:
    """Orders whose financial_status mentions a refund (reference
    ``shopifydb.py:91-92`` substring filter) — as a DataFrame so the
    per-order refund fetch fans out on executors instead of
    collecting ids to the driver."""
    return (
        store.read("orders")
        .filter(F.col("financial_status").contains("refund"))
        .select("id")
    )


def shopify_update(
    spark: SparkSession,
    store: CommerceStore,
    http_get: api.HttpGet,
    base_url: str,
    created_at_min: str | None = None,
    created_at_max: str | None = None,
    sub_fetch_partitions: int | None = None,
) -> None:
    """Full API sync (reference ``shopifydb.py:56-94``): customers,
    products+variants, orders (3 tables), then per-order transactions
    and per-refund-order refunds. The per-order fetches fan out on
    executors (``sources.spark_datasource.fetch_sub_resource``);
    ``sub_fetch_partitions`` caps the concurrent task count against
    the store's API rate limit (None = inherit the id frame's
    partitioning)."""
    customers = [
        r
        for page in api.fetch_all(
            http_get, base_url, "customers", api.CUSTOMER_FIELDS,
            created_at_min=created_at_min, created_at_max=created_at_max,
        )
        for r in page
    ]
    if customers:
        store.upsert(
            "customers",
            ji.normalize_customers(_raw_df(spark, customers, ji.RAW_CUSTOMER)),
        )

    products = [
        r
        for page in api.fetch_all(
            http_get, base_url, "products", api.PRODUCT_FIELDS,
            filter_on_status=False,
            created_at_min=created_at_min, created_at_max=created_at_max,
        )
        for r in page
    ]
    if products:
        ingest_products_payload(store, _raw_df(spark, products, ji.RAW_PRODUCT))

    orders = [
        r
        for page in api.fetch_all(
            http_get, base_url, "orders", api.ORDER_FIELDS,
            created_at_min=created_at_min, created_at_max=created_at_max,
        )
        for r in page
    ]
    raw_orders = _raw_df(spark, orders, ji.RAW_ORDER) if orders else None
    if raw_orders is not None:
        ingest_orders_payload(store, raw_orders)

    # Per-order N+1 sub-fetches run as executor tasks over id
    # partitions (mapInPandas) — the order-id sets are never
    # collected to the driver. The sequential reference loop is
    # shopify.py:391-393,438-440.
    client_factory = lambda: (http_get, base_url)  # noqa: E731

    def _sub_fetch(ids: DataFrame, endpoint: str, fields: list[str]) -> DataFrame:
        raw = dsrc.fetch_sub_resource(
            ids, endpoint, fields, client_factory, num_partitions=sub_fetch_partitions
        ).select("value")
        # One materialization: the HTTP fetch must run exactly once
        # even though upsert's merge reads the update side twice.
        return raw.persist()

    if raw_orders is not None:
        txns = _sub_fetch(
            raw_orders.select("id"), "transactions", api.TRANSACTION_FIELDS
        )
        if not txns.isEmpty():
            store.upsert(
                "transactions",
                ji.normalize_transactions(ji.parse_raw(spark, txns, ji.RAW_TRANSACTION)),
            )
        txns.unpersist()

    refunds = _sub_fetch(refund_order_ids(store), "refunds", api.REFUND_FIELDS)
    if not refunds.isEmpty():
        ingest_refunds_payload(store, ji.parse_raw(spark, refunds, ji.RAW_REFUND))
    refunds.unpersist()


def ingest_from_json_dir(spark: SparkSession, store: CommerceStore, json_dir: str) -> None:
    """Offline ingest: ``<entity>.jsonl`` files of raw Shopify records
    (orders.jsonl, customers.jsonl, products.jsonl,
    transactions.jsonl, refunds.jsonl). Reads are schema'd — no
    inference — and flow through the same normalize/upsert path as
    the API."""

    def read(entity: str, schema) -> DataFrame | None:
        path = os.path.join(json_dir, f"{entity}.jsonl")
        if not os.path.exists(path):
            return None
        return spark.read.schema(schema).json(path)

    raw = read("customers", ji.RAW_CUSTOMER)
    if raw is not None:
        store.upsert("customers", ji.normalize_customers(raw))
    raw = read("products", ji.RAW_PRODUCT)
    if raw is not None:
        ingest_products_payload(store, raw)
    raw = read("orders", ji.RAW_ORDER)
    if raw is not None:
        ingest_orders_payload(store, raw)
    raw = read("transactions", ji.RAW_TRANSACTION)
    if raw is not None:
        store.upsert("transactions", ji.normalize_transactions(raw))
    raw = read("refunds", ji.RAW_REFUND)
    if raw is not None:
        ingest_refunds_payload(store, raw)
