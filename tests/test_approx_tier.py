"""The approximate tier must track the exact tier within its
advertised error bounds (HLL++ rsd=2%, approx_percentile with
10k accuracy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from shopify_db_spark.plans import load_all
from shopify_db_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_approx_vs_exact(spark):
    approx = {
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
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("p50"),
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias("p95"),
        )
        .collect()
    }
    assert set(approx) == set(exact) and approx
    for et, a in approx.items():
        e = exact[et]
        assert a["n"] == e["n"]  # the exact column is exact
        assert abs(a["approx_users"] - e["users"]) <= max(3, 0.05 * e["users"])
        for pa, pe in (("approx_p50", "p50"), ("approx_p95", "p95")):
            spread = abs(e["p95"] - e["p50"]) or 1.0
            assert abs(a[pa] - e[pe]) <= 0.1 * spread + 1e-9
