"""Differential tests: every catalog query with an oracle must match
DuckDB exactly at sf0.001 (fast) — the same comparison shape the
driver's correctness gate applies at sf0.01."""

from __future__ import annotations

import pytest

from shopify_db_spark.plans import load_all
from shopify_db_spark.testing import run_differential
from tests.conftest import SF_SMOKE

ALL = load_all()
WITH_ORACLE = sorted(n for n, s in ALL.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in ALL.items() if s.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, name):
    problems = run_differential(spark, SF_SMOKE, name)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    df = ALL[name].fn(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
