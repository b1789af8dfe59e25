"""Record linkage / entity resolution over the product catalog.

The fuzzy-matching layer a commerce pipeline needs when listings
arrive from multiple sources with typos and variant spellings (the
reference's product utility, ``db.py:485-606``, matches listings
EXACTLY by brand+name — this tier is what replaces that at scale).

Pattern: (1) collapse raw listings to DISTINCT entity profiles — the
massive shrink, rows → entities, one hash aggregate; (2) generate
candidate pairs inside a cheap blocking key (first name token), never
across the whole catalog; (3) prune candidates with the lossless
length bound |len(a)−len(b)| ≤ d before the edit-distance evaluation
(levenshtein(a,b) ≥ |len(a)−len(b)|, so no true pair is lost);
(4) score survivors with JVM-side ``levenshtein`` (codegen'd, no
Python). Pair work is Σ_block (#entities-in-block)², bounded because
it is quadratic in DISTINCT entities per block, not in listings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shopify_db_spark.plans.catalog import query
from shopify_db_spark.sources.tables import load_table

_Q77_MAX_EDIT = 3

_Q77_ORACLE = f"""
WITH e AS (
  SELECT p_name,
         split_part(p_name, ' ', 1) AS blk,
         COUNT(*) AS n_listings,
         MIN(p_partkey) AS canonical_key
  FROM part GROUP BY p_name, blk
)
SELECT a.p_name AS name_a,
       b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_distance,
       a.n_listings AS n_listings_a,
       b.n_listings AS n_listings_b,
       a.canonical_key AS canonical_a,
       b.canonical_key AS canonical_b
FROM e a
JOIN e b ON a.blk = b.blk AND a.p_name < b.p_name
WHERE abs(length(a.p_name) - length(b.p_name)) <= {_Q77_MAX_EDIT}
  AND levenshtein(a.p_name, b.p_name) <= {_Q77_MAX_EDIT}
"""


@query("q77_entity_resolution", oracle=_Q77_ORACLE)
def q77_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution over product listings: distinct name
    profiles, first-token blocking, lossless length prune, then
    edit-distance ≤ 3 pairs with listing counts and a canonical key
    per side (min partkey — the merge target). See the module
    docstring for the scale argument."""
    part = load_table(spark, sf_dir, "part")
    entities = (
        part.groupBy(
            F.col("p_name"),
            F.split(F.col("p_name"), " ").getItem(0).alias("blk"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_listings"),
            F.min("p_partkey").alias("canonical_key"),
        )
    )
    a = entities.select(
        F.col("p_name").alias("name_a"),
        "blk",
        F.col("n_listings").alias("n_listings_a"),
        F.col("canonical_key").alias("canonical_a"),
    )
    b = entities.select(
        F.col("p_name").alias("name_b"),
        "blk",
        F.col("n_listings").alias("n_listings_b"),
        F.col("canonical_key").alias("canonical_b"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= _Q77_MAX_EDIT
        )
        .withColumn(
            "edit_distance",
            F.levenshtein(F.col("name_a"), F.col("name_b")).cast("int"),
        )
        .filter(F.col("edit_distance") <= _Q77_MAX_EDIT)
        .select(
            "name_a",
            "name_b",
            "edit_distance",
            "n_listings_a",
            "n_listings_b",
            "canonical_a",
            "canonical_b",
        )
    )


@query(
    "q89_orc_roundtrip",
    oracle="""
SELECT doc_id, lang, source, n_chars FROM documents
""",
)
def q89_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC storage round-trip: write the documents metadata columns
    to ORC (Spark-native columnar alternative to Parquet — the
    format boundary an engine meets in Hive-era data lakes), read
    them back with an explicit schema, and return the rows. The
    oracle reads the same rows from the Parquet source, so the gate
    certifies lossless type round-tripping (BIGINT/VARCHAR) through
    the second columnar format. The write is partitioned (no
    coalesce(1) — ORC interchange at scale is a sharded directory,
    unlike the reference's single-file CSV contract)."""
    import os
    import tempfile

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    out = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_orc_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    docs.write.mode("overwrite").orc(out)
    return spark.read.schema(docs.schema).orc(out)


@query(
    "q94_schema_evolution",
    oracle="""
SELECT doc_id, lang,
       CASE WHEN doc_id % 2 = 0 THEN n_chars END AS n_chars
FROM documents
""",
)
def q94_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across ingest batches: an early batch wrote
    (doc_id, lang), a later batch added the ``n_chars`` column; the
    engine must read the union of both with ``mergeSchema`` and
    null-fill the missing column for old rows — the additive-column
    evolution every long-lived lake table goes through. The oracle
    states the expected semantics directly on the source table.
    (Type-CHANGING evolution is deliberately out of scope — Spark
    mergeSchema rejects it; new names + backfill is the documented
    path.)"""
    import os
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    root = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_evolve_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(root, ignore_errors=True)
    docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "lang").write.parquet(
        os.path.join(root, "batch=0")
    )
    docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "lang", "n_chars"
    ).write.parquet(os.path.join(root, "batch=1"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "batch=0"), os.path.join(root, "batch=1")
    )
    return merged.select("doc_id", "lang", "n_chars")
