"""Training-data curation tier: dup-cluster resolution, deterministic
stratified sampling, and length binning over the ``documents`` table.

These are the steps between "pairs found" and "corpus shipped" in a
large-scale LLM data pipeline: q50 turns near-dup PAIRS into clusters
with one canonical keeper (the output q25/q26/q27 only gesture at),
q51 downsamples the dominant language with a reproducible hash
sampler (no ``rand()`` — re-runs and retried tasks pick identical
rows), and q52 buckets the corpus into exact length deciles for
curriculum/packing decisions using the two-phase NTILE (no
single-partition window).

No counterpart exists in the reference (its pipeline stops at
relational queries, ``db.py``); these extend the engine toward the
100 TB corpus-prep target while staying fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shopify_db_spark.operators import dedup as DD
from shopify_db_spark.operators.graph import dup_clusters
from shopify_db_spark.operators.numbering import global_ntile
from shopify_db_spark.plans.catalog import query
from shopify_db_spark.plans.textops import _Q27_ORACLE
from shopify_db_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# q50: near-dup pairs → connected components → canonical keeper.
# The oracle resolves components as "min transitively-reachable id"
# with a recursive CTE over the SAME pair set the q27 oracle defines
# (nested WITH — DuckDB scopes it inside the CTE), which doubles as
# an independent check of the Spark-side label propagation.
_Q50_ORACLE = f"""
WITH RECURSIVE pairs AS ({_Q27_ORACLE}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       doc_id = cluster_id AS keep
FROM comp
"""


@query("q50_dup_clusters", oracle=_Q50_ORACLE)
def q50_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup endgame: SimHash near-dup pairs (q27's generator) →
    distributed connected components (min-label propagation,
    ``operators.graph``) → ``(doc_id, cluster_id, cluster_size,
    keep)`` with the min doc id as each cluster's canonical keeper.
    Transitivity is the point: the oracle's recursive closure and
    the propagation loop must agree on every multi-hop cluster."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.simhash_pairs(docs, max_hamming=4, hash_family="md5")
    return dup_clusters(pairs)


# ---------------------------------------------------------------------------
# q51: md5 is the portable uniform hash (identical lowercase hex on
# both engines); comparing the first 8 hex chars against a hex
# threshold string IS the numeric comparison on [0, 16^8) — no
# hex→int cast needed anywhere.
_Q51_ORACLE = """
SELECT doc_id, lang, source, n_chars,
       CASE WHEN lang = 'en' THEN 5.0 ELSE 1.25 END AS weight
FROM documents
WHERE substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 8) <
      CASE WHEN lang = 'en' THEN '33333333' ELSE 'cccccccc' END
"""


@query("q51_stratified_sample", oracle=_Q51_ORACLE)
def q51_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep ~20 % of the dominant
    language (en) and ~80 % of the rest, selected by
    ``md5('samp:' || doc_id) < stratum threshold`` — reproducible
    across runs, retries and engines (unlike ``rand()``/TABLESAMPLE),
    embarrassingly parallel (per-row predicate, no shuffle), with the
    inverse-rate ``weight`` for unbiased downstream statistics.
    Threshold hex: 0x33333333/16^8 ≈ 0.2, 0xcccccccc/16^8 ≈ 0.8."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(
        F.md5(F.concat(F.lit("samp:"), F.col("doc_id").cast("string"))), 1, 8
    )
    threshold = F.when(F.col("lang") == "en", F.lit("33333333")).otherwise(
        F.lit("cccccccc")
    )
    weight = F.when(F.col("lang") == "en", F.lit(5.0)).otherwise(F.lit(1.25))
    return docs.filter(bucket < threshold).select(
        "doc_id", "lang", "source", "n_chars", weight.alias("weight")
    )


# ---------------------------------------------------------------------------
_Q52_ORACLE = """
WITH t AS (
  SELECT doc_id, n_chars,
         NTILE(10) OVER (ORDER BY n_chars, doc_id) AS decile
  FROM documents
)
SELECT CAST(decile AS INT) AS decile,
       COUNT(*) AS n_docs,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars,
       AVG(n_chars) AS avg_chars
FROM t
GROUP BY decile
"""


@query("q52_length_deciles", oracle=_Q52_ORACLE)
def q52_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact length-decile profile of the corpus (bucket boundaries
    for curriculum sampling / sequence packing). NTILE is computed
    with the two-phase formulation (``operators.numbering.
    global_ntile``: range partition → local row_number → offset
    join → closed-form bucket) — bit-identical to the oracle's
    ``NTILE(10) OVER (ORDER BY ...)`` but with no single-partition
    stage over the data."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    tiled = global_ntile(docs, ["n_chars", "doc_id"], 10, col_name="decile")
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.avg("n_chars").alias("avg_chars"),
    )
