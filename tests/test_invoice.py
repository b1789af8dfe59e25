"""Golden differential tests for the invoice pipeline.

The expected-semantics spec is an *independent* DuckDB SQL rendering
of the reference view (``/root/reference/setup.sql:192-394`` +
``db.py:409-483``) with the engine's documented deterministic
tie-breaks. Spark pipeline and DuckDB SQL read byte-identical
fixture parquet; results must match exactly.
"""

from __future__ import annotations

import duckdb
import pytest

from shopify_db_spark.plans.invoice import build_invoices, tripletex_invoice
from shopify_db_spark.testing import compare_frames
from tests.commerce_fixtures import build_tables, write_fixture_parquet

# Independent SQL spec of the view + numbering. Deterministic
# deviations mirrored from plans/invoice.py: id tie-breaks, no dead
# discounts join, (ORDER NO, payment_tag)-ordered numbering.
INVOICE_SQL = """
WITH stp AS (
    SELECT t.*,
           ROW_NUMBER() OVER (
               PARTITION BY t.order_id
               ORDER BY CASE t.kind
                            WHEN 'sale' THEN 1
                            WHEN 'capture' THEN 2
                            WHEN 'authorization' THEN 3
                            ELSE 10 END ASC,
                        t.id ASC) AS transaction_rank
    FROM transactions t
    WHERE t.status = 'success'
      AND t.kind IN ('sale', 'capture', 'authorization')
      AND t.gateway != 'gift_card'
),
product_lines AS (
    SELECT t.id AS transaction_id,
           o.id AS order_id,
           'payment' AS payment_tag,
           CAST(RIGHT(CAST(c.id AS VARCHAR), 9) AS INT) AS "CUSTOMER NO",
           c.name AS "CUSTOMER NAME",
           o.name AS "ORDER NO",
           t.amount AS "PAID AMOUNT",
           lip.quantity AS "ORDER LINE - COUNT",
           CASE WHEN NULLIF(lip.title, '') IS NOT NULL
                     AND NULLIF(lip.variant_title, '') IS NOT NULL
                THEN CONCAT(lip.title, ' - ', lip.variant_title)
                WHEN lip.title IS NOT NULL THEN lip.title
                ELSE NULL END AS "ORDER LINE - PROD NAME",
           lip.unit_price AS "ORDER LINE - UNIT PRICE",
           100 * (1 - ((lip.total_price - lip.total_discount_amount)
                        / NULLIF(lip.total_price, 0))) AS "ORDER LINE - DISCOUNT",
           3 AS "ORDER LINE - VAT CODE",
           NULL AS "ORDER LINE - DESCRIPTION",
           CAST(lip.sku AS VARCHAR) AS "ORDER LINE - PROD NO",
           t.gateway AS "PAYMENT TYPE",
           CAST(o.created_at AS DATE) AS "INVOICE DATE",
           CAST(t.processed_at AS DATE) AS "DELIVERY DATE",
           CAST(o.created_at AS DATE) AS "ORDER DATE",
           CAST(t.processed_at AS DATE) AS "DUE DATE",
           1 AS rank,
           1 AS priority
    FROM stp t
    LEFT JOIN orders o ON o.id = t.order_id
    LEFT JOIN customers c ON c.id = o.customer_id
    LEFT JOIN line_item_products lip ON lip.order_id = o.id
    WHERE t.transaction_rank = 1
),
refund_lines AS (
    SELECT t.id AS transaction_id,
           o.id AS order_id,
           'refund' AS payment_tag,
           CAST(RIGHT(CAST(c.id AS VARCHAR), 9) AS INT) AS "CUSTOMER NO",
           c.name AS "CUSTOMER NAME",
           CONCAT(o.name, '-1') AS "ORDER NO",
           -COALESCE(lipr.refund_amount, t.amount) AS "PAID AMOUNT",
           -COALESCE(lipr.quantity, 1) AS "ORDER LINE - COUNT",
           CASE WHEN lip.title IS NOT NULL
                THEN CONCAT(lip.title, ' - ', lip.variant_title)
                ELSE NULL END AS "ORDER LINE - PROD NAME",
           COALESCE(ROUND(lipr.refund_amount / lipr.quantity, 2), t.amount)
               AS "ORDER LINE - UNIT PRICE",
           0 AS "ORDER LINE - DISCOUNT",
           3 AS "ORDER LINE - VAT CODE",
           COALESCE(NULLIF(r.note, ''), 'Refund with unspecified reason')
               AS "ORDER LINE - DESCRIPTION",
           CAST(lip.sku AS VARCHAR) AS "ORDER LINE - PROD NO",
           t.gateway AS "PAYMENT TYPE",
           CAST(r.created_at AS DATE) AS "INVOICE DATE",
           CAST(r.processed_at AS DATE) AS "DELIVERY DATE",
           CAST(o.created_at AS DATE) AS "ORDER DATE",
           CAST(r.processed_at AS DATE) AS "DUE DATE",
           1 AS rank,
           2 AS priority
    FROM transactions t
    JOIN refunds r ON r.transaction_id = t.id
    LEFT JOIN line_item_product_refunds lipr ON lipr.refund_id = r.id
    LEFT JOIN orders o ON o.id = t.order_id
    LEFT JOIN customers c ON c.id = o.customer_id
    LEFT JOIN line_item_products lip
           ON lip.order_id = r.order_id AND lip.id = lipr.line_item_product_id
    WHERE t.status = 'success' AND t.kind = 'refund'
),
pl_header AS (
    SELECT DISTINCT transaction_id, order_id, "CUSTOMER NO", "CUSTOMER NAME",
                    "ORDER NO", "PAID AMOUNT", "PAYMENT TYPE", "INVOICE DATE",
                    "DELIVERY DATE", "ORDER DATE", "DUE DATE"
    FROM product_lines
),
shipping_lines AS (
    SELECT pl.transaction_id,
           pl.order_id,
           'payment' AS payment_tag,
           pl."CUSTOMER NO",
           pl."CUSTOMER NAME",
           pl."ORDER NO",
           pl."PAID AMOUNT",
           1 AS "ORDER LINE - COUNT",
           NULL AS "ORDER LINE - PROD NAME",
           s.price AS "ORDER LINE - UNIT PRICE",
           COALESCE(100 * (1 - (s.discounted_price / NULLIF(s.price, 0))), 0)
               AS "ORDER LINE - DISCOUNT",
           3 AS "ORDER LINE - VAT CODE",
           s.title AS "ORDER LINE - DESCRIPTION",
           'SHIPPING' AS "ORDER LINE - PROD NO",
           pl."PAYMENT TYPE",
           pl."INVOICE DATE",
           pl."DELIVERY DATE",
           pl."ORDER DATE",
           pl."DUE DATE",
           ROW_NUMBER() OVER (PARTITION BY pl.order_id
                              ORDER BY pl."INVOICE DATE" ASC, s.id ASC) AS rank,
           3 AS priority
    FROM pl_header pl
    JOIN shipping s ON s.order_id = pl.order_id
),
gift_card_lines AS (
    SELECT t.id AS transaction_id,
           o.id AS order_id,
           'payment' AS payment_tag,
           CAST(RIGHT(CAST(c.id AS VARCHAR), 9) AS INT) AS "CUSTOMER NO",
           c.name AS "CUSTOMER NAME",
           o.name AS "ORDER NO",
           stp.amount AS "PAID AMOUNT",
           1 AS "ORDER LINE - COUNT",
           'Gift card' AS "ORDER LINE - PROD NAME",
           -t.amount AS "ORDER LINE - UNIT PRICE",
           0 AS "ORDER LINE - DISCOUNT",
           3 AS "ORDER LINE - VAT CODE",
           NULL AS "ORDER LINE - DESCRIPTION",
           'GIFTCARD' AS "ORDER LINE - PROD NO",
           stp.gateway AS "PAYMENT TYPE",
           CAST(o.created_at AS DATE) AS "INVOICE DATE",
           CAST(t.processed_at AS DATE) AS "DELIVERY DATE",
           CAST(o.created_at AS DATE) AS "ORDER DATE",
           CAST(t.processed_at AS DATE) AS "DUE DATE",
           1 AS rank,
           4 AS priority
    FROM transactions t
    LEFT JOIN orders o ON o.id = t.order_id
    LEFT JOIN customers c ON c.id = o.customer_id
    LEFT JOIN stp ON stp.order_id = t.order_id
    WHERE t.gateway = 'gift_card' AND stp.transaction_rank = 1
),
unioned AS (
    SELECT * FROM product_lines
    UNION
    SELECT * FROM refund_lines
    UNION
    SELECT * FROM shipping_lines
    UNION
    SELECT * FROM gift_card_lines
),
view_out AS (
    SELECT transaction_id, order_id, payment_tag,
           "CUSTOMER NO", "CUSTOMER NAME", "ORDER NO",
           CAST(ROUND(CAST("PAID AMOUNT" AS DECIMAL(18,6)), 2) AS DOUBLE) AS "PAID AMOUNT",
           "ORDER LINE - COUNT", "ORDER LINE - PROD NAME",
           CAST(ROUND(CAST("ORDER LINE - UNIT PRICE" AS DECIMAL(18,6)), 2) AS DOUBLE)
               AS "ORDER LINE - UNIT PRICE",
           CAST(ROUND(CAST("ORDER LINE - DISCOUNT" AS DECIMAL(18,6)), 2) AS DOUBLE)
               AS "ORDER LINE - DISCOUNT",
           "ORDER LINE - VAT CODE", "ORDER LINE - DESCRIPTION",
           "ORDER LINE - PROD NO", "PAYMENT TYPE",
           "INVOICE DATE", "DELIVERY DATE", "ORDER DATE", "DUE DATE"
    FROM unioned
    WHERE rank = 1
)
SELECT v.*, CAST({start_id} + ind.seq - 1 AS INT) AS "INVOICE NO"
FROM view_out v
RIGHT JOIN (
    SELECT "ORDER NO", payment_tag,
           ROW_NUMBER() OVER (ORDER BY "ORDER NO", payment_tag) AS seq
    FROM view_out
    WHERE "INVOICE DATE" BETWEEN DATE '{from_date}' AND DATE '{to_date}'
    GROUP BY "ORDER NO", payment_tag
) ind ON v."ORDER NO" = ind."ORDER NO" AND v.payment_tag = ind.payment_tag
"""

FROM_DATE, TO_DATE, START_ID = "2024-01-01", "2024-01-31", 1000


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("commerce"))
    write_fixture_parquet(spark, out)
    return out


@pytest.fixture(scope="module")
def oracle_invoices(fixture_dir):
    con = duckdb.connect()
    for t in [
        "customers", "orders", "line_item_products", "transactions",
        "shipping", "refunds", "line_item_product_refunds", "discounts",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{fixture_dir}/{t}.parquet/*.parquet')"
        )
    sql = INVOICE_SQL.format(start_id=START_ID, from_date=FROM_DATE, to_date=TO_DATE)
    out = con.execute(sql).df()
    # DuckDB's RIGHT JOIN keeps payment_tag from v (NULL-free via ind);
    # drop the helper column to match the engine's final output.
    return out.drop(columns=["payment_tag"])


def test_invoice_pipeline_matches_oracle(spark, oracle_invoices):
    tables = build_tables(spark)
    result = build_invoices(tables, FROM_DATE, TO_DATE, START_ID)
    # Cast money decimals to double for the comparison (DuckDB emits
    # doubles after its double-division paths).
    from pyspark.sql import functions as F

    result = result.select(
        *[
            F.col(c).cast("double").alias(c)
            if c in ("PAID AMOUNT", "ORDER LINE - UNIT PRICE", "ORDER LINE - DISCOUNT")
            else F.col(c)
            for c in result.columns
        ]
    )
    problems = compare_frames(result.toPandas(), oracle_invoices)
    assert not problems, "; ".join(problems)


def test_invoice_semantic_spot_checks(spark):
    tables = build_tables(spark)
    view = tripletex_invoice(tables)
    rows = view.collect()
    by_order = {}
    for r in rows:
        by_order.setdefault(r["ORDER NO"], []).append(r)

    # #1001: two identical line items collapse to ONE product line
    # (UNION DISTINCT caveat) + 1 distinct-valued line + 1 shipping.
    o1001 = by_order["#1001"]
    prods = [r for r in o1001 if r["ORDER LINE - PROD NO"] not in ("SHIPPING",)]
    assert len(prods) == 2
    assert len([r for r in o1001 if r["ORDER LINE - PROD NO"] == "SHIPPING"]) == 1

    # #1002: top transaction is the lowest-id capture (202); exactly
    # one shipping line survives dedup — the lowest shipping id (302,
    # the Express row, price 99, 20.20% discount).
    o1002 = by_order["#1002"]
    assert all(r["transaction_id"] == 202 for r in o1002)
    ship = [r for r in o1002 if r["ORDER LINE - PROD NO"] == "SHIPPING"]
    assert len(ship) == 1
    assert float(ship[0]["ORDER LINE - UNIT PRICE"]) == 99.00
    assert float(ship[0]["ORDER LINE - DISCOUNT"]) == 20.20

    # #1003: gift-card line is negative and tied to the real payment.
    gift = [r for r in by_order["#1003"] if r["ORDER LINE - PROD NO"] == "GIFTCARD"]
    assert len(gift) == 1
    assert float(gift[0]["ORDER LINE - UNIT PRICE"]) == -50.00
    assert float(gift[0]["PAID AMOUNT"]) == 100.00
    assert gift[0]["PAYMENT TYPE"] == "vipps"

    # #1004 refunds: pseudo order number, negative amounts, fallbacks.
    refunds = by_order["#1004-1"]
    assert len(refunds) == 3
    no_items = [r for r in refunds if r["ORDER LINE - PROD NAME"] is None]
    assert len(no_items) == 1
    assert float(no_items[0]["PAID AMOUNT"]) == -60.00
    assert no_items[0]["ORDER LINE - DESCRIPTION"] == "Refund with unspecified reason"
    scarf = [r for r in refunds if r["ORDER LINE - PROD NAME"] == "Scarf - "]
    assert len(scarf) == 1  # Postgres CONCAT-with-NULL parity ('Title - ')

    # #1005: guest order → NULL customer; zero-price shipping →
    # discount 0 via the NULLIF guard (not a division error).
    o1005 = by_order["#1005"]
    assert all(r["CUSTOMER NO"] is None for r in o1005)
    ship5 = [r for r in o1005 if r["ORDER LINE - PROD NO"] == "SHIPPING"][0]
    assert float(ship5["ORDER LINE - DISCOUNT"]) == 0.0

    # 13-digit customer id truncates to last 9 digits.
    assert by_order["#1001"][0]["CUSTOMER NO"] == 567890123
