"""The catalog must be layout-agnostic: running a query against the
date-partitioned mirror (bench's SPARK_GRAFT_LAYOUT=partitioned —
multi-file directory trees + a partition column appended to the fact
schemas) must produce byte-identical results to the flat layout the
oracle reads."""

from __future__ import annotations

import pytest

from bench import materialize_partitioned
from shopify_db_spark.testing import compare_frames, duckdb_con
from shopify_db_spark.plans import load_all
from tests.conftest import SF_SMOKE

# Representative coverage: each partitioned fact (events / orders /
# lineitem) in scan-, join-, window- and agg-shaped queries.
SUBSET = [
    "q01_pricing_summary",
    "q04_union_distinct_branches",
    "q14_sessionize",
    "q16_json_extract",
    "q39_running_totals",
    "q44_asof_config",
    "q157_robust_outliers",  # round-9: two-phase per-type ranking over the partitioned fact
    "q158_decayed_engagement",  # round-9: max-date broadcast + shift weights over the partitioned fact
]


@pytest.fixture(scope="module")
def part_dir(spark):
    return materialize_partitioned(spark, SF_SMOKE)


@pytest.mark.parametrize("name", SUBSET)
def test_partitioned_layout_matches_flat_oracle(spark, part_dir, name):
    spec = load_all()[name]
    spark_pdf = spec.fn(spark, part_dir).toPandas()
    with duckdb_con(SF_SMOKE) as con:
        oracle_pdf = con.execute(spec.oracle).df()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name} on partitioned layout: " + "; ".join(problems)
