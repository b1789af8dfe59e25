"""SparkSession factory with the engine's required configuration.

Pinned settings are load-bearing for correctness parity with the
DuckDB oracle (SURVEY.md §7.4):

* ``spark.sql.session.timeZone=UTC`` — ``DATE(timestamptz)`` in the
  reference depends on the Postgres server timezone
  (reference ``setup.sql:232-235``); we pin UTC on both engines.
* ``spark.sql.adaptive.enabled`` — AQE re-plans joins at runtime
  (broadcast conversion, skew-join splitting) which is the scale
  story for the 100 TB target.
* Arrow enabled — every pandas boundary (``toPandas``, pandas UDFs)
  is Arrow-batched.

``spark.sql.shuffle.partitions`` defaults to the local core count;
on a real cluster this is expected to be overridden (AQE coalesces
small partitions anyway, so a high initial number is safe).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        return int(cpus)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "shopify_db_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    Safe to call repeatedly — Spark returns the active session, but
    correctness-critical configs (timezone, ANSI mode) are runtime
    confs and are re-applied every call.
    """
    parallelism = shuffle_partitions or _default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{_default_parallelism()}]")
        .config("spark.sql.shuffle.partitions", str(parallelism))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # HALF_UP decimal round + null-on-div-by-zero match the
        # Postgres numeric semantics the reference relies on.
        .config("spark.sql.ansi.enabled", "false")
        # events.parquet carries TIMESTAMP(NANOS); read as raw longs
        # and truncate to micros in the loader (DuckDB-equivalent).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    # Re-assert runtime confs in case an existing session was returned.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.sparkContext.setLogLevel("WARN")
    return spark
