"""Multimodal catalog queries: binary-column plumbing over media
synthesized deterministically from ``documents`` (the container has
no image/audio codecs — see ``operators.multimodal`` for what's real
vs. stubbed)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shopify_db_spark.operators import multimodal as MM
from shopify_db_spark.plans.catalog import query
from shopify_db_spark.sources.tables import load_table


@query(
    "q33_media_metadata",
    oracle="""
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS kind,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       sha256(text) AS content_sha256,
       CAST(length(text) % 640 + 16 AS INT) AS width,
       CAST(length(text) % 480 + 16 AS INT) AS height,
       CAST(length(text) * 10 AS INT) AS duration_ms
FROM documents
""",
)
def q33_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata scan: byte length and content hash of
    the opaque blob plus the typed metadata struct — the projection
    a 100 TB media table serves without ever decoding (column
    pruning keeps the blob column unread when only metadata is
    selected)."""
    media = MM.synthesize_media_from_documents(load_table(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        "kind",
        F.length(F.col("content")).cast("int").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )


#: The fake decoder's feature i is ``sha256(content)[i] / 255`` —
#: SQL-expressible, so the gate query converts each float32 feature
#: back to its source byte (exact: float32 round-trip error is
#: ≪ 0.5) and DuckDB recomputes the digest bytes from hex pairs.
_Q34_FEATURE_COLS = ",\n".join(
    f"       CAST(('0x' || substr(sha256(text), {2 * i + 1}, 2)) AS INT)"
    f" AS f{i:02d}"
    for i in range(MM.FEATURE_DIM)
)

_Q34_ORACLE = f"""
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS kind,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
{_Q34_FEATURE_COLS}
FROM documents
"""


@query("q34_media_features", oracle=_Q34_ORACLE)
def q34_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction through ``mapInPandas``
    (deterministic fake decoder standing in for the codec — the
    Spark-side batch plumbing is the thing under test). The gate
    projection unpacks the ``array<float>`` feature vector into
    scalar byte columns: raw arrays are unhashable to the driver's
    pandas canonicalizer, and the byte form is exactly oracle-
    expressible (the fake decoder is sha256-derived). Library
    callers still get the array API via ``extract_features``."""
    media = MM.synthesize_media_from_documents(load_table(spark, sf_dir, "documents"))
    feats = MM.extract_features(media)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        *[
            F.round(F.col("features")[i].cast("double") * 255.0)
            .cast("int")
            .alias(f"f{i:02d}")
            for i in range(MM.FEATURE_DIM)
        ],
    )


@query(
    "q35_frame_sample_plan",
    oracle="""
WITH video AS (
  SELECT doc_id AS media_id, text,
         CAST(length(text) * 10 AS INT) AS duration_ms
  FROM documents WHERE doc_id % 3 = 2
)
SELECT media_id,
       CAST(UNNEST(generate_series(0, GREATEST(duration_ms - 1, 0), 1000)) AS BIGINT)
           AS frame_ts_ms,
       md5(text) AS content_md5
FROM video
""",
)
def q35_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: metadata-driven explode of sample
    timestamps (1 Hz) — the blob is hashed once, never duplicated
    per frame."""
    media = MM.synthesize_media_from_documents(load_table(spark, sf_dir, "documents"))
    return MM.frame_sample_plan(media, every_ms=1000).withColumn(
        "frame_ts_ms", F.col("frame_ts_ms").cast("long")
    )
