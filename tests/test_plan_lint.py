"""Plan lint over the whole catalog: no accidental cartesian products
or nested-loop joins. The allowlist names the queries whose plans
legitimately contain a bounded cross join (brute-force cosine
baseline; IVF's n x K centroid-scoring pass)."""

from __future__ import annotations

import pytest

from shopify_db_spark.plans import load_all
from tests.conftest import SF_SMOKE

#: queries with a deliberate, bounded cross join
CROSS_JOIN_OK = {
    "q30_cosine_topk",   # brute-force baseline (queries x candidates)
    "q38_ivf_ann",       # n x K centroid scoring
    "q48_hourly_gapfill",  # hour x type grid (both dimension-sized)
}

ALL = sorted(load_all())


@pytest.mark.parametrize("name", ALL)
def test_no_accidental_cross_join(spark, name):
    plan = (
        load_all()[name]
        .fn(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    flags = [
        f
        for f in ("CartesianProduct", "BroadcastNestedLoopJoin")
        if f in plan
    ]
    if name in CROSS_JOIN_OK:
        return  # bounded by construction; documented at the call site
    assert not flags, f"{name} plans a cross join: {flags}"
