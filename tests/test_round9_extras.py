"""Semantic property tests for the round-9 analysis/selection tier —
invariants the DuckDB hash-match cannot express (it proves engine
parity, not that the algorithm does what its name claims)."""

from __future__ import annotations

from pyspark.sql import functions as F

from shopify_db_spark.plans import load_all
from tests.conftest import SF_SMOKE


def test_kcenter_coverage_radius_shrinks(spark):
    """Farthest-first invariant: each pick is the point farthest from
    the current centers, so the picked max-similarity is weakly
    INCREASING over rounds (the space fills up; coverage radius
    1 − max_sim is weakly decreasing)."""
    rows = load_all()["q141_kcenter_coreset"].fn(spark, SF_SMOKE).collect()
    sims = [r["max_sim"] for r in sorted(rows, key=lambda r: r["k_rank"])]
    assert sims[0] == -1.0  # seed sentinel
    for a, b in zip(sims[1:], sims[2:]):
        assert b >= a - 1e-12


def test_bucketed_batching_beats_shuffled_padding(spark):
    """q150's reason to exist: the length-sorted schedule must waste
    no more padding than the hash-shuffled baseline, corpus-wide."""
    rows = load_all()["q150_batch_padding"].fn(spark, SF_SMOKE).collect()
    waste = {"length_sorted": 0, "hash_shuffled": 0}
    for r in rows:
        waste[r["scheme"]] += r["n_docs"] * r["max_tok"] - r["sum_tok"]
    assert waste["length_sorted"] <= waste["hash_shuffled"]


def test_domain_coherence_matches_bruteforce(spark):
    """The Gram identity must agree with the literal pairwise mean
    (computed on the quantized vectors it defines itself over)."""
    from shopify_db_spark.operators.similarity import as_double, norm

    out = {
        r["source"]: r
        for r in load_all()["q153_domain_coherence"].fn(spark, SF_SMOKE).collect()
    }
    from shopify_db_spark.plans.vectorops import _Q153_S1
    from shopify_db_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    docs = load_table(spark, SF_SMOKE, "documents")
    one = sorted(out)[0]
    xs = (
        emb.join(
            docs.select(F.col("doc_id").alias("vec_id"), "source"), "vec_id"
        )
        .filter(F.col("source") == one)
        .select(as_double(F.col("embedding")).alias("ev"))
        .withColumn("nrm", norm(F.col("ev")))
        .select(
            F.transform(
                F.col("ev"),
                lambda x: F.floor(x / F.col("nrm") * _Q153_S1).cast("long"),
            ).alias("xq")
        )
        .collect()
    )
    vecs = [r["xq"] for r in xs]
    n = len(vecs)
    s = 0
    for i in range(n):
        for j in range(n):
            if i != j:
                s += sum(a * b for a, b in zip(vecs[i], vecs[j]))
    brute = s / (n * (n - 1) * _Q153_S1 * _Q153_S1)
    assert abs(brute - out[one]["mean_pairwise_cos"]) < 1e-9
    assert n == out[one]["n"]


def test_novelty_curve_decays(spark):
    """Saturation: the first ingestion decile must be more novel than
    the last (every first-decile shingle with a unique min-doc is
    novel by construction; late deciles re-see earlier shingles)."""
    rows = {
        r["decile"]: r
        for r in load_all()["q154_novelty_curve"].fn(spark, SF_SMOKE).collect()
    }
    assert rows[1]["novelty_frac"] > rows[max(rows)]["novelty_frac"]


def test_budget_mixture_respects_budget_exactly(spark):
    """Σ allocated == budget when the corpus exceeds the budget, and
    allocation is a prefix of the quality order (no source receives
    tokens while a cleaner one is truncated)."""
    rows = load_all()["q156_budget_mixture"].fn(spark, SF_SMOKE).collect()
    total = sum(r["n_tokens"] for r in rows)
    budget = total * 2 // 5
    allocated = sum(r["allocated_tokens"] for r in rows)
    assert allocated == budget
    ordered = sorted(rows, key=lambda r: (-r["quality"], r["source"]))
    seen_partial = False
    for r in ordered:
        if seen_partial:
            assert r["allocated_tokens"] == 0
        if 0 < r["allocated_tokens"] < r["n_tokens"]:
            seen_partial = True


def test_decayed_engagement_bounds(spark):
    """Every user's decayed score is bounded by n_events · 10⁶ and
    positive for any user active within the clamp horizon (20
    half-lives — 10⁶ < 2²⁰ so the weight is exactly 0 beyond)."""
    rows = load_all()["q158_decayed_engagement"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["decayed_ppm"] <= r["n_events"] * 1_000_000
        if r["days_since_last"] < 7 * 20:
            assert r["decayed_ppm"] > 0


def test_streaming_engagement_equals_batch(spark):
    """The q158→q160 twin contract, asserted directly: the streaming
    maintenance must reproduce the batch scores row for row (both
    are also oracle-checked against the same SQL; this pins the
    equivalence inside the test suite too)."""
    qs = load_all()
    batch = {
        r["user_id"]: (r["n_events"], r["decayed_ppm"], r["days_since_last"])
        for r in qs["q158_decayed_engagement"].fn(spark, SF_SMOKE).collect()
    }
    stream = {
        r["user_id"]: (r["n_events"], r["decayed_ppm"], r["days_since_last"])
        for r in qs["q160_streaming_engagement"].fn(spark, SF_SMOKE).collect()
    }
    assert batch == stream


def test_knn_recall_gate_is_consistent(spark):
    """q159's counts must be internally consistent and the recall
    meaningfully above zero on the smoke corpus (nprobe=2 cells
    genuinely contain most true neighbors there)."""
    row = load_all()["q159_knn_recall_gate"].fn(spark, SF_SMOKE).collect()[0]
    assert row["n_hits"] <= row["n_expected"]
    assert abs(row["recall"] - row["n_hits"] / row["n_expected"]) < 1e-12
    assert row["recall"] > 0.3
