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

#: scratch directories created by THIS application (q89 ORC
#: interchange, q94 schema-evolution batches) — removed at
#: interpreter exit so each application cleans up after itself.
_SCRATCH_ROOTS: set[str] = set()
_SCRATCH_PREFIXES = ("spark_graft_orc_", "spark_graft_evolve_")
#: a sibling scratch dir older than this AND without a live owner
#: process is assumed to belong to a dead application (crash before
#: its atexit ran) and is pruned. The liveness check (ADVICE r7) is
#: a sibling ``<dir>.owner`` pid file written at creation — a
#: SIBLING, not a member, so `mode("overwrite")` / rmtree-and-
#: rewrite inside the dir can't destroy it; mtime alone would
#: delete the dir of a >6h-lived concurrent app that wrote once and
#: lazily re-reads later.
_SCRATCH_STALE_SECONDS = 6 * 3600


def _owner_alive(marker: str) -> bool:
    """True if ``marker`` names a pid that is still running (so the
    scratch dir beside it must not be pruned). Unreadable or
    malformed markers count as dead — the mtime gate already said
    the dir is old. A live process owned by ANOTHER user raises
    PermissionError from ``os.kill(pid, 0)`` — that is an ALIVE
    signal (ADVICE r8), not a dead one; only ProcessLookupError
    (no such pid) and read/parse failures mean dead."""
    import os

    try:
        with open(marker) as fh:
            pid = int(fh.read().strip())
        os.kill(pid, 0)
        return True
    except PermissionError:
        return True  # pid exists, owned by another user
    except (OSError, ValueError):
        return False


def _cleanup_scratch() -> None:  # pragma: no cover - atexit path
    import contextlib
    import os
    import shutil

    for d in _SCRATCH_ROOTS:
        shutil.rmtree(d, ignore_errors=True)
        with contextlib.suppress(OSError):
            os.remove(d + ".owner")


def _scratch_dir(spark: SparkSession, prefix: str, sf_dir: str) -> str:
    """applicationId-scoped temp directory for a materializing query.

    The app-id scoping keeps concurrent runs (gate + bench, parallel
    pytest) from sharing a directory; this helper closes the other
    half of the lifecycle: the first call registers an atexit hook
    that removes every directory this application created, and
    opportunistically prunes stale siblings left by applications
    that died before their own hook ran (mtime-gated AND owner-pid
    liveness-checked, so live concurrent runs are never touched —
    even ones idle longer than the stale window)."""
    import atexit
    import contextlib
    import glob
    import os
    import shutil
    import tempfile
    import time

    tmp = tempfile.gettempdir()
    if not _SCRATCH_ROOTS:
        atexit.register(_cleanup_scratch)
        now = time.time()
        for pfx in _SCRATCH_PREFIXES:
            for d in glob.glob(os.path.join(tmp, pfx + "*")):
                if d.endswith(".owner"):
                    # Reclaim a marker orphaned by a racing remover /
                    # partial cleanup (ADVICE r8): its companion dir is
                    # gone, so nothing else will ever delete it.
                    try:
                        if (
                            not os.path.exists(d[: -len(".owner")])
                            and now - os.path.getmtime(d)
                            > _SCRATCH_STALE_SECONDS
                        ):
                            os.remove(d)
                    except OSError:  # pragma: no cover - racing remover
                        pass
                    continue  # live markers handled beside their dir
                try:
                    stale = (
                        now - os.path.getmtime(d) > _SCRATCH_STALE_SECONDS
                    )
                    if stale and not _owner_alive(d + ".owner"):
                        shutil.rmtree(d, ignore_errors=True)
                        with contextlib.suppress(OSError):
                            os.remove(d + ".owner")
                except OSError:  # pragma: no cover - racing remover
                    pass
    out = os.path.join(
        tmp,
        f"{prefix}{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{spark.sparkContext.applicationId}",
    )
    if out not in _SCRATCH_ROOTS:
        _SCRATCH_ROOTS.add(out)
        with contextlib.suppress(OSError):
            with open(out + ".owner", "w") as fh:
                fh.write(str(os.getpid()))
    return out


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
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    # Path is scoped by applicationId: two concurrent runs against
    # the same SF (gate + bench, parallel pytest) must never share a
    # directory — one's overwrite would corrupt the other's pending
    # lazy read. Within one session re-runs overwrite sequentially.
    # _scratch_dir registers atexit removal + stale-sibling pruning.
    out = _scratch_dir(spark, "spark_graft_orc_", sf_dir)
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

    docs = load_table(spark, sf_dir, "documents")
    # applicationId-scoped for the same concurrent-runs reason as q89
    root = _scratch_dir(spark, "spark_graft_evolve_", sf_dir)
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


# ---------------------------------------------------------------------------
# q95: snapshot diff. Two deterministic "table versions" are derived
# from orders (A drops o_orderkey % 97 = 0; B drops % 93 = 0 and
# bumps the price of % 89 = 0 rows), so all three change classes are
# non-empty. Values are compared as DECIMALs/atoms with IS DISTINCT
# FROM — never via stringified floats (engine float formatting is
# not a stable contract).


@query(
    "q95_snapshot_diff",
    oracle="""
WITH a AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(12,4)) AS price_d
  FROM orders WHERE o_orderkey % 97 <> 0
),
b AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(12,4))
           + CASE WHEN o_orderkey % 89 = 0
                  THEN CAST(1 AS DECIMAL(12,4))
                  ELSE CAST(0 AS DECIMAL(12,4)) END AS price_d
  FROM orders WHERE o_orderkey % 93 <> 0
)
SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN a.o_orderkey IS NULL THEN 'added'
            WHEN b.o_orderkey IS NULL THEN 'removed'
            ELSE 'changed' END AS change_type,
       CAST(ROUND(a.price_d, 2) AS DOUBLE) AS old_price,
       CAST(ROUND(b.price_d, 2) AS DOUBLE) AS new_price
FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
   OR a.price_d IS DISTINCT FROM b.price_d
   OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
""",
)
def q95_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-snapshot diff: the added/removed/changed changelog
    between two versions of a table — the data-regression detector
    every pipeline wants between runs, and the input to incremental
    downstream refresh. One full-outer join on the key; non-key
    columns compared with null-safe inequality on their native
    types (decimal for money), never stringified. At scale the join
    hashes on the key and unchanged rows are dropped before any
    output materializes."""
    from shopify_db_spark.functions.parity import dec, dlit, money_out

    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        F.col("o_orderkey").alias("key_a"),
        F.col("o_orderstatus").alias("status_a"),
        dec("o_totalprice").alias("price_a"),
    )
    b = orders.filter(F.col("o_orderkey") % 93 != 0).select(
        F.col("o_orderkey").alias("key_b"),
        F.col("o_orderstatus").alias("status_b"),
        (
            dec("o_totalprice")
            + F.when(F.col("o_orderkey") % 89 == 0, dlit(1)).otherwise(
                dlit(0)
            )
        ).alias("price_b"),
    )
    joined = a.join(b, F.col("key_a") == F.col("key_b"), "full_outer")
    differs = (
        F.col("key_a").isNull()
        | F.col("key_b").isNull()
        | ~F.col("price_a").eqNullSafe(F.col("price_b"))
        | ~F.col("status_a").eqNullSafe(F.col("status_b"))
    )
    return joined.filter(differs).select(
        F.coalesce(F.col("key_a"), F.col("key_b")).alias("o_orderkey"),
        F.when(F.col("key_a").isNull(), "added")
        .when(F.col("key_b").isNull(), "removed")
        .otherwise("changed")
        .alias("change_type"),
        money_out(F.col("price_a")).alias("old_price"),
        money_out(F.col("price_b")).alias("new_price"),
    )


# ---------------------------------------------------------------------------
# q96: FK-containment profiling over the schema's candidate edges.
_Q96_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
]


def _q96_edge_sql(child: str, ck: str, parent: str, pk: str) -> str:
    return f"""
SELECT '{child}' AS child_table, '{ck}' AS child_col,
       '{parent}' AS parent_table, '{pk}' AS parent_col,
       (SELECT COUNT(DISTINCT {ck}) FROM {child}
        WHERE {ck} IS NOT NULL) AS n_child_distinct,
       (SELECT COUNT(*) FROM (
          SELECT DISTINCT c.{ck} AS v FROM {child} c
          WHERE c.{ck} IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM {parent} p
                            WHERE p.{pk} = c.{ck})
       )) AS n_orphans"""


_Q96_ORACLE = (
    "SELECT child_table, child_col, parent_table, parent_col,\n"
    "       CAST(n_child_distinct AS BIGINT) AS n_child_distinct,\n"
    "       CAST(n_orphans AS BIGINT) AS n_orphans,\n"
    "       CASE WHEN n_child_distinct = 0 THEN 1.0\n"
    "            ELSE 1.0 - CAST(n_orphans AS DOUBLE)"
    " / CAST(n_child_distinct AS DOUBLE) END AS containment\n"
    "FROM (\n"
    + "\nUNION ALL\n".join(
        _q96_edge_sql(*e) for e in _Q96_EDGES
    )
    + "\n)"
)


@query("q96_fk_profile", oracle=_Q96_ORACLE)
def q96_fk_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity profiling: for every declared candidate
    FK edge, the distinct child-key count, the orphan count (child
    values with no parent — a LEFT ANTI join on the distinct key
    set, so the probe is key-cardinality-sized, not row-sized), and
    the containment ratio. Containment = 1.0 certifies the edge;
    anything lower localizes broken ingestion. The reference
    enforces FKs in Postgres DDL (setup.sql); on a lake engine
    integrity is a measured property, and this is the measurement
    (q18's anti-join checks generalized to a schema-wide profile).

    One plan, zero driver actions: the per-edge (n_distinct,
    n_orphans) pair folds out of a single left join of the distinct
    child keys against the distinct parent keys (distinct on the
    parent side makes the join fan-out-free, so COUNT(*) over the
    joined frame is exactly the child-key count and the null-parent
    indicator sum is exactly the anti-join count), and the five
    edges union into one 5-row job. The previous shape ran 2
    blocking ``.count()`` actions per edge — 10 sequential jobs +
    driver round-trips for work with no cross-edge dependency
    (guide §2.6/§5; round 14). The containment division is the same
    binary64 divide the driver-side float() computed."""
    edge_frames = []
    for child, ck, parent, pk in _Q96_EDGES:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent)
        child_keys = (
            c.select(F.col(ck).alias("v")).filter(F.col("v").isNotNull())
            .distinct()
        )
        parent_keys = (
            p.select(F.col(pk).alias("v")).distinct()
            .withColumn("__p", F.lit(1))
        )
        stats = child_keys.join(parent_keys, "v", "left").agg(
            F.count(F.lit(1)).alias("n_child_distinct"),
            F.sum(
                F.when(F.col("__p").isNull(), 1).otherwise(0)
            ).alias("n_orphans"),
        )
        edge_frames.append(
            stats.select(
                F.lit(child).alias("child_table"),
                F.lit(ck).alias("child_col"),
                F.lit(parent).alias("parent_table"),
                F.lit(pk).alias("parent_col"),
                F.col("n_child_distinct").cast("long"),
                F.coalesce(F.col("n_orphans"), F.lit(0))
                .cast("long")
                .alias("n_orphans"),
                # an all-NULL FK column has zero distinct keys and
                # vacuously full containment (the SQL oracle's
                # 1 - 0/NULLIF(0,..) path would yield NULL; we pin the
                # vacuous-truth convention on both sides)
                F.when(F.col("n_child_distinct") == 0, F.lit(1.0))
                .otherwise(
                    F.lit(1.0)
                    - F.coalesce(F.col("n_orphans"), F.lit(0)).cast(
                        "double"
                    )
                    / F.col("n_child_distinct").cast("double")
                )
                .alias("containment"),
            )
        )
    out = edge_frames[0]
    for nxt in edge_frames[1:]:
        out = out.unionByName(nxt)
    return out


# ---------------------------------------------------------------------------
# q97: per-column profile of a table in ONE aggregate pass.
_Q97_COLS = ["doc_id", "text", "lang", "source", "n_chars"]

_Q97_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name,
       (SELECT COUNT(*) FROM documents) AS n_rows,
       (SELECT COUNT(*) FROM documents WHERE {c} IS NULL) AS n_null,
       (SELECT COUNT(DISTINCT {c}) FROM documents) AS n_distinct"""
    for c in _Q97_COLS
)


@query("q97_column_profile", oracle=_Q97_ORACLE)
def q97_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profile (row count, null count, distinct
    count per column) — the first query any engine runs against an
    unfamiliar table, and the statistics layer cost-based decisions
    feed on. ONE aggregate pass computes every column's stats
    (Catalyst plans the multi-distinct via Expand — no per-column
    scans), then the single stats row is melted to one row per
    column with ``stack``. Output is schema-sized; the scan is the
    only data-sized stage."""
    docs = load_table(spark, sf_dir, "documents")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _Q97_COLS:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"dist_{c}"))
    stats = docs.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', null_{c}, dist_{c}" for c in _Q97_COLS
    )
    return stats.selectExpr(
        "n_rows",
        f"stack({len(_Q97_COLS)}, {stack_args})"
        " AS (column_name, n_null, n_distinct)",
    ).select("column_name", "n_rows", "n_null", "n_distinct")


# ---------------------------------------------------------------------------
# q98: right-to-be-forgotten impact plan. Forget-set: customers with
# c_custkey % 250 = 0; deletion propagates along the FK graph
# (customer → orders → lineitem), and the plan reports how many rows
# each table loses, in dependency order.


@query(
    "q98_cascade_delete_plan",
    oracle="""
SELECT 'customer' AS table_name, CAST(0 AS INT) AS depth,
       (SELECT COUNT(*) FROM customer WHERE c_custkey % 250 = 0)
           AS n_rows
UNION ALL
SELECT 'orders', CAST(1 AS INT),
       (SELECT COUNT(*) FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_custkey % 250 = 0))
UNION ALL
SELECT 'lineitem', CAST(2 AS INT),
       (SELECT COUNT(*) FROM lineitem
        WHERE l_orderkey IN (
          SELECT o_orderkey FROM orders
          WHERE o_custkey IN (SELECT c_custkey FROM customer
                              WHERE c_custkey % 250 = 0)))
""",
)
def q98_cascade_delete_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascade-delete impact plan (the GDPR/right-to-be-forgotten
    pre-flight): given a forget-set of customers, count the rows
    each downstream table loses when the deletion propagates along
    the FK graph — customer → orders → lineitem, in dependency
    order. Each hop is a LEFT SEMI join on the parent's key set
    (key-sized build sides, fact tables never shuffled); the
    reference delegates this to Postgres ``ON DELETE CASCADE``
    (setup.sql FK clauses) — on a lake engine the cascade is an
    explicit, auditable plan, and this query IS the audit. The
    scalar counts are bounded single-partition finals (allowlisted
    like q06/q12)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    forget = customer.filter(F.col("c_custkey") % 250 == 0).select(
        "c_custkey"
    )
    doomed_orders = orders.join(
        forget, orders["o_custkey"] == forget["c_custkey"], "left_semi"
    )
    doomed_lines = lineitem.join(
        doomed_orders.select("o_orderkey"),
        lineitem["l_orderkey"] == F.col("o_orderkey"),
        "left_semi",
    )

    def one(table: str, depth: int, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(table).alias("table_name"),
            F.lit(depth).cast("int").alias("depth"),
            "n_rows",
        )

    return (
        one("customer", 0, forget)
        .unionAll(one("orders", 1, doomed_orders))
        .unionAll(one("lineitem", 2, doomed_lines))
    )


# ---------------------------------------------------------------------------
# q99: categorical association via LIFT (n·N / (n_row · n_col)) —
# deliberately NOT pmi = ln(lift): ln is not IEEE-correctly-rounded,
# so cross-engine last-ulp drift would break the value hash, while
# lift is a pure rational of exact counts (monotone in pmi, so
# ranking/thresholding downstream is unchanged).


@query(
    "q99_category_association",
    oracle="""
WITH cells AS (
  SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY lang, source
),
l AS (SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang),
s AS (SELECT source, COUNT(*) AS n_source FROM documents GROUP BY source)
SELECT c.lang, c.source, c.n, l.n_lang, s.n_source,
       CAST(c.n AS DOUBLE) * (SELECT COUNT(*) FROM documents)
         / (CAST(l.n_lang AS DOUBLE) * CAST(s.n_source AS DOUBLE)) AS lift
FROM cells c
JOIN l ON l.lang = c.lang
JOIN s ON s.source = c.source
""",
)
def q99_category_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical association profile: the lang × source
    contingency table with marginals and LIFT per cell — which
    sources over/under-represent which languages, the skew signal
    that drives mixture rebalancing (q70) and stratified sampling
    (q51). One aggregate for cells, two dimension-sized marginal
    aggregates broadcast back, and a metadata total embedded as a
    literal. Lift is a ratio of exact counts (see module comment on
    why not pmi)."""
    docs = load_table(spark, sf_dir, "documents")
    total = docs.count()
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n")
    )
    l = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    s = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_source"))
    return (
        cells.join(F.broadcast(l), "lang")
        .join(F.broadcast(s), "source")
        .select(
            "lang",
            "source",
            "n",
            "n_lang",
            "n_source",
            (
                F.col("n").cast("double")
                * F.lit(float(total))
                / (
                    F.col("n_lang").cast("double")
                    * F.col("n_source").cast("double")
                )
            ).alias("lift"),
        )
    )
