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


def test_compare_frames_is_dtype_family_strict():
    """Round-11 structural guard (the q121 r9/r10 lesson): the local
    compare must reproduce the external driver's dtype sensitivity.
    Equal VALUES in an int64 vs a float64 column — exactly what
    DuckDB's silent SUM(BIGINT)→HUGEINT→pandas-float64 promotion
    produces — must FAIL; engine-idiomatic representations of the
    same logical type (date objects vs datetime64, Decimal vs float,
    all-null columns) must still pass."""
    import datetime
    import decimal

    import numpy as np
    import pandas as pd

    from shopify_db_spark.testing import compare_frames

    # the driver-red signature: values equal, int64 vs float64
    s = pd.DataFrame({"comp_sum": np.array([114234, 7], dtype="int64")})
    o = pd.DataFrame({"comp_sum": np.array([114234.0, 7.0], dtype="float64")})
    problems = compare_frames(s, o)
    assert problems and "dtype family" in problems[0]

    # same family, equal values: passes
    assert not compare_frames(s, s.copy())

    # Spark DateType (objects) vs DuckDB DATE (datetime64): same family
    s2 = pd.DataFrame({"d": [datetime.date(2024, 1, 1)]})
    o2 = pd.DataFrame({"d": pd.to_datetime(["2024-01-01"])})
    assert not compare_frames(s2, o2)

    # stray Decimal compares through float (documented leniency)
    s3 = pd.DataFrame({"m": [decimal.Decimal("1.50")]})
    o3 = pd.DataFrame({"m": [1.5]})
    assert not compare_frames(s3, o3)

    # an all-null column is family-indeterminate: matches anything
    s4 = pd.DataFrame({"x": np.array([np.nan], dtype="float64")})
    o4 = pd.DataFrame({"x": [None]})
    assert not compare_frames(s4, o4)

    # bool vs int is a REAL family divergence
    s5 = pd.DataFrame({"b": np.array([True, False])})
    o5 = pd.DataFrame({"b": np.array([1, 0], dtype="int64")})
    assert compare_frames(s5, o5)
