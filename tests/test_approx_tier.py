"""The approximate tier must track the exact tier within its
advertised error bounds (HLL++ rsd=2%, approx_percentile with
10k accuracy).

q43 now carries its own sketch-vs-exact tolerance check (the gate
oracles the booleans as TRUE), so the unit test asserts the exact
columns against an independent aggregation and that every tolerance
flag holds; the raw-sketch tolerances are additionally exercised
directly here so a q43 refactor can't silently weaken the bound.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from shopify_db_spark.plans import load_all
from shopify_db_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_q43_contract_columns(spark):
    rows = {
        r["event_type"]: r
        for r in load_all()["q43_approx_stats"].fn(spark, SF_SMOKE).collect()
    }
    events = load_table(spark, SF_SMOKE, "events").filter(
        F.col("value").isNotNull()
    )
    exact = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("users"),
        )
        .collect()
    }
    assert set(rows) == set(exact) and rows
    for et, a in rows.items():
        e = exact[et]
        assert a["n"] == e["n"]
        assert a["n_users"] == e["users"]
        assert a["approx_users_ok"] is True
        assert a["approx_p50_ok"] is True
        assert a["approx_p95_ok"] is True


def test_raw_sketches_vs_exact(spark):
    events = load_table(spark, SF_SMOKE, "events").filter(
        F.col("value").isNotNull()
    )
    rows = (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.approx_percentile(
                "value", F.array(F.lit(0.5), F.lit(0.95)), 10000
            ).alias("ap"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50"),
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias("p95"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx_users"] - r["users"]) <= max(3, 0.05 * r["users"])
        spread = abs(r["p95"] - r["p50"]) or 1.0
        assert abs(r["ap"][0] - r["p50"]) <= 0.1 * spread + 1e-9
        assert abs(r["ap"][1] - r["p95"]) <= 0.1 * spread + 1e-9
