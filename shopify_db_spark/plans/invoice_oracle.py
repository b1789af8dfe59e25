"""ANSI-SQL rendering of the invoice pipeline semantics.

An independent SQL spec of the engine's invoice plan
(``plans.invoice``), runnable by DuckDB: used (a) by the golden
differential tests against fixture parquet, and (b) as the driver
oracle of the catalog's commerce query, prefixed with mapping CTEs
that derive commerce-shaped tables from the benchmark star schema.

The SQL mirrors ``/root/reference/setup.sql:192-394`` +
``db.py:409-483`` semantics with the engine's documented
deterministic tie-breaks (see ``plans.invoice`` module docstring).
"""

from __future__ import annotations

INVOICE_VIEW_CTES = """
stp AS (
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
           CAST(RIGHT(CAST(c.id AS VARCHAR(18)), 9) AS INT) AS "CUSTOMER NO",
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
           CAST(NULL AS VARCHAR(200)) AS "ORDER LINE - DESCRIPTION",
           CAST(lip.sku AS VARCHAR(50)) AS "ORDER LINE - PROD NO",
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
           CAST(RIGHT(CAST(c.id AS VARCHAR(18)), 9) AS INT) AS "CUSTOMER NO",
           c.name AS "CUSTOMER NAME",
           CONCAT(o.name, '-1') AS "ORDER NO",
           -COALESCE(lipr.refund_amount, t.amount) AS "PAID AMOUNT",
           -COALESCE(lipr.quantity, 1) AS "ORDER LINE - COUNT",
           CASE WHEN lip.title IS NOT NULL
                THEN CONCAT(lip.title, ' - ', COALESCE(lip.variant_title, ''))
                ELSE NULL END AS "ORDER LINE - PROD NAME",
           COALESCE(ROUND(lipr.refund_amount / lipr.quantity, 2), t.amount)
               AS "ORDER LINE - UNIT PRICE",
           0 AS "ORDER LINE - DISCOUNT",
           3 AS "ORDER LINE - VAT CODE",
           COALESCE(NULLIF(r.note, ''), 'Refund with unspecified reason')
               AS "ORDER LINE - DESCRIPTION",
           CAST(lip.sku AS VARCHAR(50)) AS "ORDER LINE - PROD NO",
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
           CAST(NULL AS VARCHAR(150)) AS "ORDER LINE - PROD NAME",
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
           CAST(RIGHT(CAST(c.id AS VARCHAR(18)), 9) AS INT) AS "CUSTOMER NO",
           c.name AS "CUSTOMER NAME",
           o.name AS "ORDER NO",
           stp.amount AS "PAID AMOUNT",
           1 AS "ORDER LINE - COUNT",
           'Gift card' AS "ORDER LINE - PROD NAME",
           -t.amount AS "ORDER LINE - UNIT PRICE",
           0 AS "ORDER LINE - DISCOUNT",
           3 AS "ORDER LINE - VAT CODE",
           CAST(NULL AS VARCHAR(200)) AS "ORDER LINE - DESCRIPTION",
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
"""

NUMBERED_SELECT = """
SELECT v.transaction_id, v.order_id,
       v."CUSTOMER NO", v."CUSTOMER NAME", v."ORDER NO",
       v."PAID AMOUNT", v."PAYMENT TYPE",
       v."ORDER LINE - COUNT", v."ORDER LINE - PROD NAME",
       v."ORDER LINE - UNIT PRICE", v."ORDER LINE - DISCOUNT",
       v."ORDER LINE - VAT CODE", v."ORDER LINE - DESCRIPTION",
       v."ORDER LINE - PROD NO",
       v."INVOICE DATE", v."DELIVERY DATE", v."ORDER DATE", v."DUE DATE",
       CAST({start_id} + ind.seq - 1 AS INT) AS "INVOICE NO"
FROM view_out v
RIGHT JOIN (
    SELECT "ORDER NO", payment_tag,
           ROW_NUMBER() OVER (ORDER BY "ORDER NO", payment_tag) AS seq
    FROM view_out
    WHERE "INVOICE DATE" BETWEEN DATE '{from_date}' AND DATE '{to_date}'
    GROUP BY "ORDER NO", payment_tag
) ind ON v."ORDER NO" = ind."ORDER NO" AND v.payment_tag = ind.payment_tag
"""


#: commerce table names the view CTEs scan
TABLE_NAMES = (
    "transactions",
    "orders",
    "customers",
    "line_item_products",
    "shipping",
    "refunds",
    "line_item_product_refunds",
)


def render_invoice_oracle(
    from_date: str,
    to_date: str,
    start_id: int,
    prelude_ctes: str = "",
    table_map: dict[str, str] | None = None,
) -> str:
    """Full oracle statement.

    ``prelude_ctes`` (ending with a comma, if non-empty) may define
    mapping CTEs; ``table_map`` rewrites the view's FROM/JOIN targets
    to those CTE names. The rewrite exists because DuckDB resolves
    CTE names across the whole WITH clause (a CTE named ``orders``
    would capture every reference, including the mapping's own scan
    of the base ``orders`` table) — so mapping CTEs must use
    non-colliding names.
    """
    import re

    view = INVOICE_VIEW_CTES.strip()
    for src, dst in (table_map or {}).items():
        view = re.sub(rf"\b(FROM|JOIN)(\s+){src}\b", rf"\1\2{dst}", view)
    return (
        "WITH "
        + prelude_ctes
        + view
        + NUMBERED_SELECT.format(
            start_id=start_id, from_date=from_date, to_date=to_date
        )
    )


def render_invoice_cte_prefix(
    from_date: str,
    to_date: str,
    start_id: int,
    prelude_ctes: str = "",
    table_map: dict[str, str] | None = None,
    cte_name: str = "invoice_base",
) -> str:
    """Same statement, but wrapped so downstream oracles can keep
    composing: returns ``WITH <prelude><view>, <cte_name> AS
    (<numbered select>)`` — append further CTEs (prefixed with a
    comma) and a final SELECT. Used by the gate queries that check
    consumers OF the invoice result (verification suite, CSV
    round-trip) rather than the result itself.
    """
    import re

    view = INVOICE_VIEW_CTES.strip()
    for src, dst in (table_map or {}).items():
        view = re.sub(rf"\b(FROM|JOIN)(\s+){src}\b", rf"\1\2{dst}", view)
    numbered = NUMBERED_SELECT.format(
        start_id=start_id, from_date=from_date, to_date=to_date
    ).strip()
    return (
        "WITH "
        + prelude_ctes
        + view
        + f",\n{cte_name} AS (\n{numbered}\n)"
    )
