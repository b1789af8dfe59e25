"""Key-based upsert (MERGE) — the engine's write-path operator.

The reference upserts every table with ``INSERT ... ON CONFLICT (pk)
DO UPDATE SET col = excluded.col, ...`` (``db.py:115-407``). Spark
has no in-place update on Parquet, and the Delta/Iceberg jars are
not in this image, so the operator is an anti-join-free *full outer
join* merge that reproduces the exact conflict semantics, including
the reference's partial SET lists: several tables deliberately
freeze columns on update (orders never refreshes
``financial_status``/``currency``, ``db.py:129-140``; customers
never refreshes ``note``, ``db.py:266-280``; line_item_products
never refreshes ``tax_title``, ``db.py:300-314``) — an update keeps
the OLD value for those columns. Naive row replacement would lose
them; the merge coalesces column-wise (SURVEY §7.4 risk #6).

Scale: the merge is one shuffle on the key columns for each side.
On a cluster the base table would be bucketed by key
(``write.bucketBy``) so repeated merges co-locate without re-shuffling
the big side; with Delta available this whole module becomes
``MERGE INTO`` (noted, not assumed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dedup_updates(updates: DataFrame, keys: list[str]) -> DataFrame:
    """Collapse duplicate keys inside one update batch (last-wins is
    undefined in a distributed batch, so highest-sort-order wins —
    deterministic). Postgres would reject such a batch outright
    ("cannot affect row a second time"); tolerating it with a
    deterministic pick is friendlier for replayed ingest pages.
    """
    order_cols = [c for c in updates.columns if c not in keys]
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc_nulls_last() for c in order_cols]
    )
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert(
    existing: DataFrame,
    updates: DataFrame,
    keys: list[str],
    frozen_cols: list[str] | None = None,
) -> DataFrame:
    """Merge ``updates`` into ``existing`` on ``keys``.

    * matched key → update row, except ``frozen_cols`` keep the OLD
      value (the reference's partial SET lists);
    * unmatched update key → insert;
    * unmatched existing key → keep.

    Column set and order follow ``existing``.
    """
    frozen = set(frozen_cols or ())
    updates = dedup_updates(updates.select(existing.columns), keys)
    old = existing.alias("old").withColumn("__old_present", F.lit(True))
    new = updates.alias("new").withColumn("__new_present", F.lit(True))
    joined = old.join(new, on=keys, how="full_outer")

    def merged(col: str) -> F.Column:
        if col in keys:
            return F.col(col)
        old_c, new_c = F.col(f"old.{col}"), F.col(f"new.{col}")
        if col in frozen:
            # frozen: only a pure insert takes the new value
            return F.when(F.col("__old_present").isNotNull(), old_c).otherwise(new_c)
        return F.when(F.col("__new_present").isNotNull(), new_c).otherwise(old_c)

    return joined.select(*[merged(c).alias(c) for c in existing.columns])
