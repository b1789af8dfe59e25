"""Skew mitigation operators.

AQE's skew-join splitting (enabled in ``session.py``) handles most
runtime skew; explicit salting remains the tool when a shuffle key
is SO hot that even split partitions overwhelm a task (the classic
power-law join key: one customer with 10% of all events), or when
AQE is unavailable (streaming state, RDD-era clusters).

``salted_join`` implements the standard replicate-and-salt scheme:
the big side spreads each hot key across ``n_salts`` sub-keys with a
deterministic hash of its remaining columns; the small side is
replicated ``n_salts`` times (explode of a literal range — cheap,
it's the SMALL side); the equi-join then runs on (key, salt), giving
every salt bucket ~1/n of the hot key's rows. Results are exactly
the plain join's rows.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side's hot
    keys spread over ``n_salts`` salt buckets.

    The salt is a deterministic hash of the big side's non-key
    columns (stable across retries — no ``rand()``, which breaks
    task re-execution); identical full rows land in one bucket,
    which is correct (they carry identical join results) and still
    spreads a hot KEY whose payload varies. Supports inner and
    left joins (the preserved side is the salted big side).

    A big side with ONLY the key column gets no spreading (the salt
    would be a pure function of the key, so every row of a hot key
    lands in one bucket) — that case warns and should use AQE skew
    handling or a row-number salt instead."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (big side preserved)")
    payload = [c for c in big.columns if c != on]
    if not payload:
        warnings.warn(
            "salted_join: big side has no non-key columns, so the salt is a "
            "pure function of the join key and hot keys are NOT spread; "
            "results are still correct",
            stacklevel=2,
        )
        payload = [on]
    salted_big = big.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in payload]), F.lit(n_salts))
    )
    replicated_small = small.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>")),
    )
    return (
        salted_big.join(replicated_small, [on, SALT_COL], how)
        .drop(SALT_COL)
    )
