"""Streaming gate query: the ``foreachBatch`` incremental-MERGE
pipeline driven end-to-end over bounded micro-batches.

The reference's incremental story is the ``created_at_min`` request
window re-fed through the same per-page upsert loop
(``shopifydb.py:233-244``, ``db.py:115-407``). The Spark-native
analogue is Structured Streaming: a checkpointed file/kafka source,
``foreachBatch``, and the key-merge operator (``operators.upsert``)
applied per micro-batch. This module gates that surface — the
other streaming shapes (watermark windows, ``session_window``,
``applyInPandasWithState``) are unit-tested in
``tests/test_multimodal_streaming.py``.

Oracle-ability: micro-batch boundaries are made DETERMINISTIC
(one source file per batch via ``maxFilesPerTrigger=1``, file
mtimes strictly increasing in batch order), so the post-stream
state is a pure function of the raw table and ANSI-SQL can express
it: per key, non-frozen columns come from the winning row of the
LAST batch containing the key, frozen columns from the winning row
of the FIRST batch (insert-time value — the reference's partial
SET-list quirk); the within-batch winner is ``dedup_updates``'s
deterministic highest-sort-order pick.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shopify_db_spark.operators.upsert import upsert
from shopify_db_spark.plans.catalog import query
from shopify_db_spark.sources.tables import load_table

N_BATCHES = 4
ENTITY_MOD = 997


def _order_updates(orders: DataFrame) -> DataFrame:
    """Synthetic keyed update stream from the orders table: many
    orders map onto one entity (``% 997``) so cross-batch conflicts
    exercise the merge; ``src_key`` is unique so the within-batch
    winner is fully determined by the first sort column."""
    return orders.select(
        (F.col("o_orderkey") % ENTITY_MOD).alias("entity_id"),
        F.col("o_orderkey").alias("src_key"),
        (F.col("o_orderkey") % N_BATCHES).alias("batch_no"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total"),
        F.col("o_orderstatus").alias("first_status"),
    )


@query(
    "q49_streaming_merge",
    oracle=f"""
WITH upd AS (
  SELECT o_orderkey % {ENTITY_MOD} AS entity_id,
         o_orderkey AS src_key,
         o_orderkey % {N_BATCHES} AS batch_no,
         o_orderstatus AS status,
         o_totalprice AS total,
         o_orderstatus AS first_status
  FROM orders
),
bw AS (
  SELECT * FROM (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY entity_id, batch_no
                              ORDER BY src_key DESC) AS rn
    FROM upd
  ) WHERE rn = 1
),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY entity_id ORDER BY batch_no DESC)
             AS r_last,
         ROW_NUMBER() OVER (PARTITION BY entity_id ORDER BY batch_no ASC)
             AS r_first
  FROM bw
)
SELECT l.entity_id, l.src_key, l.batch_no, l.status, l.total,
       f.first_status
FROM (SELECT * FROM r WHERE r_last = 1) l
JOIN (SELECT * FROM r WHERE r_first = 1) f USING (entity_id)
""",
)
def q49_streaming_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest via Structured Streaming: orders-derived
    updates split into four micro-batches (one file per trigger),
    each merged into the accumulating state with
    ``operators.upsert`` inside ``foreachBatch`` — ``first_status``
    is a frozen column (kept from insert time, the reference's
    partial SET-list semantics, db.py:129-140). The returned state
    must equal the batch-SQL fixpoint the oracle computes."""
    updates = _order_updates(load_table(spark, sf_dir, "orders"))
    schema = updates.schema

    workdir = tempfile.mkdtemp(prefix="stream_merge_")
    stream_dir = os.path.join(workdir, "in")
    ckpt_dir = os.path.join(workdir, "ckpt")
    os.makedirs(stream_dir)
    try:
        # one parquet file per micro-batch, mtimes strictly
        # increasing so the file source's oldest-first order equals
        # batch_no order
        base = 1_600_000_000
        for b in range(N_BATCHES):
            part_dir = os.path.join(workdir, f"part{b}")
            updates.filter(F.col("batch_no") == b).coalesce(1).write.parquet(
                part_dir
            )
            src = next(
                f for f in os.listdir(part_dir) if f.endswith(".parquet")
            )
            dst = os.path.join(stream_dir, f"batch-{b}.parquet")
            shutil.move(os.path.join(part_dir, src), dst)
            os.utime(dst, (base + 100 * b, base + 100 * b))

        state = {"df": spark.createDataFrame([], schema)}

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            # localCheckpoint: materialize per batch so state lineage
            # stays flat (the parquet-write analogue of a real sink)
            state["df"] = upsert(
                state["df"],
                batch_df,
                keys=["entity_id"],
                frozen_cols=["first_status"],
            ).localCheckpoint()

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(stream_dir)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return state["df"]
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
