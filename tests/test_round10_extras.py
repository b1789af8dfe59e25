"""Round-10 hardening tests: version-proof exact quantization and
the decay-weight shift-wrap regression (round-9 advice findings)."""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd

from shopify_db_spark.plans import load_all
from tests.conftest import SF_SMOKE
from shopify_db_spark.testing import compare_frames


def _synthetic_events(tmp_path, ages_days):
    """Write a single-file events.parquet whose per-user event ages
    (relative to the newest event) are exactly ``ages_days``."""
    now = datetime.datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        {
            "event_id": i,
            "ts": now - datetime.timedelta(days=a),
            "user_id": 1000 + i,
            "event_type": "view",
            "value": 1.0,
            "props": "{}",
        }
        for i, a in enumerate(ages_days)
    ]
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    path = tmp_path / "events.parquet"
    pdf.to_parquet(path, index=False)
    return str(tmp_path)


def test_decay_weight_no_shift_wrap(spark, tmp_path):
    """Regression for the round-9 advice finding: Spark wraps the
    shiftright amount mod the BASE WIDTH, so an int-typed 10⁶ base
    made events 224–279 days old (shift 32–39) wrap back to weights
    10⁶..15625 while DuckDB yields 0. The fixed clamp (≥ 20
    half-lives → exactly 0, since 10⁶ < 2²⁰) plus a BIGINT base must
    agree with the oracle on synthetic ages spanning the former wrap
    range — testdata spans only 30 days, so this is the only gate
    that exercises it."""
    ages = [0, 6, 7, 100, 139, 140, 223, 224, 250, 279, 447, 448, 600]
    sf_dir = _synthetic_events(tmp_path, ages)
    spec = load_all()["q158_decayed_engagement"]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    oracle_pdf = con.execute(spec.oracle).df()
    assert compare_frames(spark_pdf, oracle_pdf) == []

    by_age = {
        int(r["days_since_last"]): int(r["decayed_ppm"])
        for _, r in spark_pdf.iterrows()
    }
    assert by_age[0] == 1_000_000
    assert by_age[7] == 500_000
    # the former wrap range (shift 32-39) and everything past the
    # 140-day horizon must be exactly 0, never 10⁶ again
    for a in (140, 223, 224, 250, 279, 447, 448, 600):
        assert by_age[a] == 0, f"age {a} leaked weight {by_age[a]}"
    # inside the horizon the weight is the exact shift value
    assert by_age[139] == 1_000_000 >> 19
    assert by_age[100] == 1_000_000 >> 14


def test_q124_drift_summand_is_exact_integer(spark):
    """q124's chi² summand is now a pure-integer floor division
    (−4·SCALE·ca·cb DIV (ca·nb + cb·na)); spot-check the engine
    output against an independent Python big-int recomputation so
    the algebraic reduction (not just engine parity) is pinned."""
    import collections
    import re

    drift = (
        load_all()["q124_source_drift"].fn(spark, SF_SMOKE).collect()
    )
    assert drift
    con = duckdb.connect()
    docs = con.execute(
        "SELECT source, text FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    counts: dict[str, collections.Counter] = collections.defaultdict(
        collections.Counter
    )
    for source, text in docs:
        # the catalog tokenizer: collapse whitespace, trim, lower,
        # split on single spaces (functions/text.py `tokens`)
        counts[source].update(
            re.sub(r"\s+", " ", text).strip().lower().split(" ")
        )
    totals = {s: sum(c.values()) for s, c in counts.items()}
    scale = 10**15
    for row in drift:
        a, b = row["source_a"], row["source_b"]
        ca, cb, na, nb = counts[a], counts[b], totals[a], totals[b]
        shared = set(ca) & set(cb)
        assert len(shared) == row["n_shared_terms"]
        total = 2 * scale
        for t in shared:
            num = 4 * scale * ca[t] * cb[t]
            den = ca[t] * nb + cb[t] * na
            total += -((num + den - 1) // den)
        assert total == row["chi2_scaled"], (a, b)


def test_power_of_two_quantization_is_float32_exact(spark):
    """The q121/q122/q142 quantization scales are powers of two, so
    floor(x·S) is identical whether the multiply happens at float32
    or float64 precision — the property that makes the quantization
    version-proof. Verify it holds over every embedding component in
    the smoke fixture (a 10^k scale FAILS this on the same data)."""
    import numpy as np

    con = duckdb.connect()
    vecs = con.execute(
        "SELECT embedding FROM "
        f"read_parquet('{SF_SMOKE}/embeddings.parquet')"
    ).fetchall()
    comps = np.array(
        [x for (v,) in vecs for x in v], dtype=np.float32
    )
    for scale in (1 << 20, 1 << 10):
        f32 = np.floor(comps * np.float32(scale)).astype(np.int64)
        f64 = np.floor(
            comps.astype(np.float64) * np.float64(scale)
        ).astype(np.int64)
        assert (f32 == f64).all(), f"power-of-two scale {scale} not exact"


def test_cluster_memo_keyed_per_sf_dir(spark):
    """simhash_clusters memoizes per (session, sf_dir): repeated
    calls return the identical pinned frame (no recompute), different
    sf_dirs get independent entries, and the memoized result equals a
    fresh derivation row for row."""
    from shopify_db_spark.operators import dedup as DD
    from shopify_db_spark.operators.graph import dup_clusters
    from shopify_db_spark.plans.curation import simhash_clusters
    from shopify_db_spark.sources.tables import load_table

    a1 = simhash_clusters(spark, SF_SMOKE)
    a2 = simhash_clusters(spark, SF_SMOKE)
    assert a1 is a2, "same (session, sf_dir) must hit the memo"

    b = simhash_clusters(spark, "/root/testdata/sf0.01")
    assert b is not a1, "different sf_dir must not share an entry"

    docs = load_table(spark, SF_SMOKE, "documents")
    fresh = dup_clusters(
        DD.simhash_pairs(docs, max_hamming=4, hash_family="md5")
    )
    assert sorted(map(tuple, a1.collect())) == sorted(
        map(tuple, fresh.collect())
    )


def test_semantic_pairs_sub_split_bounds_blocks(spark):
    """The sub_planes escape on semantic_dedup_pairs: sub-splitting
    shrinks within-cell blocks (candidate volume) while every
    surviving pair is a subset of the unsplit pair set that still
    shares a (cell, sub-bucket) — the same recall trade
    semantic_dedup documents."""
    from pyspark.sql import functions as F

    from shopify_db_spark.operators.similarity import semantic_dedup_pairs
    from shopify_db_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 25 == 0)
    full = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(emb, centroids, threshold=0.3).collect()
    }
    split = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(
            emb, centroids, threshold=0.3, sub_planes=2
        ).collect()
    }
    assert full, "unsplit run found no pairs on the smoke fixture"
    assert split <= full, "sub-splitting must only REMOVE candidates"
    assert len(split) < len(full) or split == full
