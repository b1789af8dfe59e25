"""The invoice validation suite — the reference's runtime-correctness
mechanism (``tripletex.py:204-242``), re-expressed as distributed
Spark checks.

Each check mirrors one of the 8 pandas checks (SURVEY §2.10 V1-V8):
it computes its offender set as a DataFrame (so the scan work is
distributed and shares the cached invoice frame), collects a bounded
sample for the human-facing warning, and reports pass/fail on the
*full* count. All checks together take two passes over the invoice
lines (one cached scan + per-check aggregations) instead of the
reference's eight pandas scans.

Deviations (documented):

* ``_none_values`` in the reference returns the status of only the
  *last* required field checked (``tripletex.py:42`` — a bug); here
  the check fails if ANY required field has nulls, while the warning
  output per field is preserved.
* ``_price`` uses ``max`` instead of pandas' frame-order-dependent
  ``first`` for the per-order paid amount (all payment-group rows
  share it; refund groups don't, and ``max`` is deterministic).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shopify_db_spark.schemas import INVOICE_REQUIRED_FIELDS

log = logging.getLogger(__name__)

#: max offenders listed in a warning message (full count still reported)
SAMPLE = 50


@dataclass
class CheckResult:
    name: str
    passed: bool
    n_offenders: int
    sample: list = field(default_factory=list)
    message: str = ""


@dataclass
class VerificationReport:
    checks: list[CheckResult]
    n_ordinary_orders: int = 0
    n_refund_orders: int = 0

    @property
    def passed(self) -> bool:
        return all(c.passed for c in self.checks)


def _collect_sample(df: DataFrame) -> tuple[int, list]:
    rows = df.limit(SAMPLE + 1).collect()
    if len(rows) <= SAMPLE:
        return len(rows), [r[0] if len(r) == 1 else tuple(r) for r in rows]
    # offender set larger than the sample — get the exact count
    return df.count(), [r[0] if len(r) == 1 else tuple(r) for r in rows[:SAMPLE]]


def _result(name: str, df: DataFrame, describe: str) -> CheckResult:
    n, sample = _collect_sample(df)
    passed = n == 0
    msg = "" if passed else f"{describe}: {n} offender(s), e.g. {sample[:10]}"
    if msg:
        log.warning(msg)
    return CheckResult(name, passed, n, sample, msg)


def check_refunds(df: DataFrame) -> CheckResult:
    """V1: orders whose paid amount is ≤ 0 (refund lines) — flagged
    for manual review (``tripletex.py:128-139``)."""
    offenders = (
        df.filter(F.col("PAID AMOUNT") <= 0).select("ORDER NO").distinct().orderBy("ORDER NO")
    )
    return _result("refunds", offenders, "refund orders present")


def check_gift_cards(df: DataFrame) -> CheckResult:
    """V2: orders containing a GIFTCARD line (``tripletex.py:165-177``)."""
    offenders = (
        df.filter(F.col("ORDER LINE - PROD NO") == "GIFTCARD")
        .select("ORDER NO")
        .distinct()
        .orderBy("ORDER NO")
    )
    return _result("gift_cards", offenders, "gift-card orders present")


def _sequence_gaps(observed: DataFrame, col: str) -> DataFrame:
    """Missing integers strictly inside [min, max] of ``observed[col]``
    — the distributed form of the reference's ``range(min+1, max)``
    set difference (``tripletex.py:73-76``)."""
    bounds = observed.agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
    cand = bounds.select(
        F.explode(
            F.when(
                F.col("hi") > F.col("lo") + 1,
                F.sequence(F.col("lo") + 1, F.col("hi") - 1),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("missing")
    ).repartition("missing")
    return cand.join(
        observed, cand["missing"] == observed[col], "left_anti"
    ).orderBy("missing")


def check_order_no(df: DataFrame) -> CheckResult:
    """V3: gaps in the order-number sequence over non-refund rows,
    after stripping the ``#`` prefix (``tripletex.py:65-82``)."""
    observed = (
        df.filter(F.col("PAID AMOUNT") >= 0)
        .select(F.substring(F.col("ORDER NO"), 2, 18).cast("int").alias("n"))
        .distinct()
    )
    return _result("order_no", _sequence_gaps(observed, "n"), "missing order numbers")


def check_invoice_no(df: DataFrame) -> CheckResult:
    """V4: gaps in the invoice-number sequence (``tripletex.py:85-99``)."""
    observed = df.select(F.col("INVOICE NO").cast("int").alias("n")).distinct()
    return _result(
        "invoice_no", _sequence_gaps(observed, "n"), "missing invoice numbers"
    )


def check_none_values(df: DataFrame) -> CheckResult:
    """V5: required fields with nulls, reported per field
    (``tripletex.py:30-42``; reference returns only the last field's
    status — fixed here to fail on any)."""
    any_bad = 0
    samples: list = []
    messages: list[str] = []
    # One aggregation pass computes every field's null count.
    counts = df.agg(
        *[
            F.count(F.when(F.col(c).isNull(), 1)).alias(c)
            for c in INVOICE_REQUIRED_FIELDS
        ]
    ).collect()[0]
    for c in INVOICE_REQUIRED_FIELDS:
        if counts[c]:
            any_bad += counts[c]
            missing = (
                df.filter(F.col(c).isNull()).select("ORDER NO").distinct()
            )
            n, sample = _collect_sample(missing)
            samples.extend(sample)
            msg = f"required column {c} is missing for {n} order(s), e.g. {sample[:10]}"
            messages.append(msg)
            log.warning(msg)
    return CheckResult(
        "none_values", any_bad == 0, any_bad, samples, "; ".join(messages)
    )


def check_description_or_sku(df: DataFrame) -> CheckResult:
    """V6: lines where both PROD NO and DESCRIPTION are null
    (``tripletex.py:45-62``)."""
    offenders = (
        df.filter(
            F.col("ORDER LINE - PROD NO").isNull()
            & F.col("ORDER LINE - DESCRIPTION").isNull()
        )
        .select("ORDER NO")
        .distinct()
        .orderBy("ORDER NO")
    )
    return _result(
        "description_or_sku", offenders, "orders missing both PROD NO and DESCRIPTION"
    )


def check_price(df: DataFrame) -> CheckResult:
    """V7: per-order paid amount vs summed discounted line totals,
    flagging deviations > 1% of paid (``tripletex.py:102-125``)."""
    line_total = (
        F.col("ORDER LINE - COUNT")
        * F.col("ORDER LINE - UNIT PRICE")
        * (F.lit(100) - F.coalesce(F.col("ORDER LINE - DISCOUNT"), F.lit(0).cast("decimal(18,2)")))
        / F.lit(100)
    )
    grouped = (
        df.withColumn("price_after_discount", line_total)
        .groupBy("ORDER NO")
        .agg(
            F.max("PAID AMOUNT").alias("paid_amount"),
            F.sum("price_after_discount").alias("lineitems_total"),
        )
    )
    offenders = (
        grouped.withColumn(
            "diff", F.abs(F.col("paid_amount") - F.col("lineitems_total"))
        )
        .filter(F.col("diff") > F.abs(F.col("paid_amount")) * F.lit(0.01))
        .select("ORDER NO", "diff")
        .orderBy("ORDER NO")
    )
    return _result("price", offenders, "orders with >1% paid-vs-lines deviation")


def check_unknown_gateway(df: DataFrame, gateways: list[str] | None) -> CheckResult:
    """V8: payment types outside the allowlist, one report per
    (order, gateway) (``tripletex.py:142-162``)."""
    if gateways is None:
        return CheckResult("unknown_gateway", True, 0)
    offenders = (
        df.filter(~F.col("PAYMENT TYPE").isin(gateways))
        .select("ORDER NO", "PAYMENT TYPE")
        .distinct()
        .orderBy("ORDER NO", "PAYMENT TYPE")
    )
    return _result("unknown_gateway", offenders, "unknown payment gateways")


def replace_invoice_gateway(df: DataFrame, gateway_map: dict[str, str]) -> DataFrame:
    """Rename payment gateways via a mapping (reference
    ``tripletex.py:194-201`` pandas ``replace``) — a chained
    ``when`` so it stays a codegen'd projection, no UDF/join."""
    col = F.col("PAYMENT TYPE")
    expr = col
    for old, new in gateway_map.items():
        expr = F.when(col == old, F.lit(new)).otherwise(expr)
    return df.withColumn("PAYMENT TYPE", expr)


def verify_invoices(
    df: DataFrame, gateways: list[str] | None = None
) -> VerificationReport:
    """Run the full 8-check suite (reference ``verify_invoices``,
    ``tripletex.py:204-242``): empty strings normalize to null first
    (F17), order counts are logged, overall pass = all checks pass.
    """
    string_cols = [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    normalized = df.select(
        *[
            F.nullif(F.col(c), F.lit("")).alias(c) if c in string_cols else F.col(c)
            for c in df.columns
        ]
    ).cache()
    try:
        counts = normalized.agg(
            F.countDistinct(
                F.when(F.col("PAID AMOUNT") < 0, F.col("ORDER NO"))
            ).alias("n_refund"),
            F.countDistinct(
                F.when(F.col("PAID AMOUNT") >= 0, F.col("ORDER NO"))
            ).alias("n_ordinary"),
        ).collect()[0]
        log.info(
            "There are %s ordinary orders and %s refund-only orders",
            counts["n_ordinary"],
            counts["n_refund"],
        )
        # Deliberately SEQUENTIAL: submitting the 8 independent
        # checks from a thread pool (guide §2.6) was measured in
        # round 14 as 20-30 % SLOWER here — each check is a tiny
        # single-stage job over the cached frame that already
        # saturates local[32], so concurrency only adds scheduler
        # contention. On a cluster where a check's straggler tail
        # leaves executors idle, a 2-3-thread pool over these calls
        # is the documented lever.
        checks = [
            check_refunds(normalized),
            check_gift_cards(normalized),
            check_order_no(normalized),
            check_invoice_no(normalized),
            check_none_values(normalized),
            check_description_or_sku(normalized),
            check_price(normalized),
            check_unknown_gateway(normalized, gateways),
        ]
        report = VerificationReport(
            checks,
            n_ordinary_orders=counts["n_ordinary"],
            n_refund_orders=counts["n_refund"],
        )
        if report.passed:
            log.info("No irregularities detected in the invoices")
        else:
            log.warning(
                "Invoices contain one or more notices that should be checked manually"
            )
        return report
    finally:
        normalized.unpersist()
