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
from shopify_db_spark.plans.textops import _Q27_ORACLE, _TOKS
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


# ---------------------------------------------------------------------------
# q53: the benchmark set is the held-out docs (doc_id % 50 = 0); a
# training doc is contaminated to the degree its 8-gram shingles
# appear in ANY benchmark doc.
_Q53_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
),
shingles AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS shingle
  FROM toks, UNNEST(generate_series(1, GREATEST(len(t) - 7, 1))) AS u(i)
),
bench AS (
  SELECT DISTINCT shingle FROM shingles WHERE doc_id % 50 = 0
),
train AS (
  SELECT * FROM shingles WHERE doc_id % 50 <> 0
)
SELECT t.doc_id,
       COUNT(*) AS n_shingles,
       SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS n_contaminated,
       CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS contamination_rate
FROM train t LEFT JOIN bench b ON t.shingle = b.shingle
GROUP BY t.doc_id
"""


@query("q53_contamination", oracle=_Q53_ORACLE)
def q53_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training document, the fraction
    of its 8-gram shingles that appear anywhere in the held-out
    benchmark partition (``doc_id % 50 = 0`` stands in for the eval
    suite). The benchmark shingle set is inherently bounded (eval
    suites are MBs, corpora are TBs), so it is broadcast to the
    training side — decontaminating a 100 TB corpus never shuffles
    the corpus, and docs exceeding a rate threshold are dropped or
    flagged downstream."""
    docs = load_table(spark, sf_dir, "documents")
    shingles = DD.doc_shingles(docs, "doc_id", "text", n=8)
    bench = (
        shingles.filter(F.col("doc_id") % 50 == 0)
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    train = shingles.filter(F.col("doc_id") % 50 != 0)
    hits = train.join(F.broadcast(bench), "shingle", "left")
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_contaminated"),
        (
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("double")
            / F.count(F.lit(1))
        ).alias("contamination_rate"),
    )


# ---------------------------------------------------------------------------
# q54: fixed-size character chunking with overlap — the context-
# window preparation step. size=800, stride=700 (100-char overlap);
# chunk i covers [i*stride+1, i*stride+size].
_Q54_SIZE, _Q54_STRIDE = 800, 700

_Q54_ORACLE = f"""
WITH spans AS (
  SELECT doc_id, length(text) AS n_chars,
         GREATEST(CAST(CEIL(CAST(length(text) - {_Q54_SIZE - _Q54_STRIDE}
                             AS DOUBLE) / {_Q54_STRIDE}) AS BIGINT), 1)
             AS n_chunks
  FROM documents
)
SELECT d.doc_id,
       CAST(u.i AS INT) AS chunk_idx,
       substr(d.text, CAST(u.i * {_Q54_STRIDE} + 1 AS BIGINT), {_Q54_SIZE})
           AS chunk_text,
       length(substr(d.text, CAST(u.i * {_Q54_STRIDE} + 1 AS BIGINT),
                     {_Q54_SIZE})) AS n_chunk_chars
FROM documents d
JOIN spans s ON s.doc_id = d.doc_id,
     UNNEST(generate_series(0, s.n_chunks - 1)) AS u(i)
"""


@query("q54_window_chunks", oracle=_Q54_ORACLE)
def q54_window_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: every document split into
    ``size=800``-char chunks at ``stride=700`` (100-char overlap so
    no boundary sentence is lost) — one row per (doc, chunk). Pure
    per-row explode of a computed index range: embarrassingly
    parallel, no shuffle, and the chunk count formula
    (``max(ceil((len - overlap)/stride), 1)``) guarantees full
    coverage incl. the short-tail final chunk and exactly one chunk
    for short docs."""
    size, stride = _Q54_SIZE, _Q54_STRIDE
    docs = load_table(spark, sf_dir, "documents")
    n_chunks = F.greatest(
        F.ceil((F.length("text") - (size - stride)).cast("double") / stride).cast(
            "long"
        ),
        F.lit(1).cast("long"),
    )
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("i"),
        )
        .select(
            "doc_id",
            F.col("i").cast("int").alias("chunk_idx"),
            F.expr(f"substring(text, i * {stride} + 1, {size})").alias("chunk_text"),
            F.length(
                F.expr(f"substring(text, i * {stride} + 1, {size})")
            ).alias("n_chunk_chars"),
        )
    )
