"""The 8-check validation suite against the engineered fixtures —
each fixture scenario trips exactly the checks it was designed to
trip (FIXTURES.md scenario list)."""

from __future__ import annotations

import pytest

from shopify_db_spark.plans.invoice import build_invoices
from shopify_db_spark.plans.verify_invoices import (
    replace_invoice_gateway,
    verify_invoices,
)
from tests.commerce_fixtures import build_tables


@pytest.fixture(scope="module")
def invoices(spark):
    df = build_invoices(build_tables(spark), "2024-01-01", "2024-01-31", 1000)
    df.cache().count()
    yield df
    df.unpersist()


def test_verify_report(invoices):
    report = verify_invoices(invoices, gateways=["vipps", "stripe"])
    results = {c.name: c for c in report.checks}

    assert not report.passed
    # review-flag checks (refund + gift-card orders exist by design)
    assert not results["refunds"].passed
    assert results["refunds"].sample == ["#1004-1"]
    assert not results["gift_cards"].passed
    assert results["gift_cards"].sample == ["#1003"]
    # missing #1006 in the order sequence
    assert not results["order_no"].passed
    assert results["order_no"].sample == [1006]
    # invoice numbers are consecutive by construction
    assert results["invoice_no"].passed
    # guest order → CUSTOMER NO null (required)
    assert not results["none_values"].passed
    assert "#1005" in results["none_values"].sample
    # custom item with NULL sku and NULL description
    assert not results["description_or_sku"].passed
    assert "#1002" in results["description_or_sku"].sample
    # mispriced order
    assert not results["price"].passed
    assert "#1008" in [s[0] for s in results["price"].sample]
    # unknown gateway ('manual' on the guest order)
    assert not results["unknown_gateway"].passed
    assert ("#1005", "manual") in results["unknown_gateway"].sample

    assert report.n_refund_orders == 1
    assert report.n_ordinary_orders == 7


def test_gateway_allowlist_none_skips_check(invoices):
    report = verify_invoices(invoices, gateways=None)
    results = {c.name: c for c in report.checks}
    assert results["unknown_gateway"].passed


def test_replace_invoice_gateway(invoices):
    renamed = replace_invoice_gateway(invoices, {"vipps": "VIPPS AS", "manual": "Manual"})
    types = {r[0] for r in renamed.select("PAYMENT TYPE").distinct().collect()}
    assert "vipps" not in types and "VIPPS AS" in types and "Manual" in types
    assert "stripe" in types


def test_invoice_numbers_consecutive_from_start(invoices):
    nums = sorted(
        r[0] for r in invoices.select("INVOICE NO").distinct().collect()
    )
    assert nums == list(range(1000, 1008))
