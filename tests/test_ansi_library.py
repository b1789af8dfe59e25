"""Forced-ANSI smoke tests for the PUBLIC library entry points
(VERDICT r8 #7).

The catalog's ``@query`` wrapper pins ``spark.sql.ansi.enabled=false``
(plans/catalog.py), so every gate/driver/bench run masks ANSI-only
failures — but Spark 4 defaults ANSI ON, so a user calling these
operators as library functions on a vanilla session gets the ANSI
semantics. Round 8 found exactly one such latent crash
(``element_at(acc, -1)`` in the BPE fold); this module makes the
sweep systematic: each documented entry point runs once under a
forced-ANSI session on small inputs. These are smoke tests (does the
plan analyze + execute under ANSI), not value oracles — the value
contracts live in the catalog gate and the per-operator tests.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from tests.commerce_fixtures import build_tables
from tests.conftest import SF_SMOKE


@contextmanager
def forced_ansi(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text with no overlap here"),
        (4, "the quick brown fox jumps over the lazy dog"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prefix_filter_jaccard_pairs_ansi(spark, tiny_docs):
    from shopify_db_spark.operators.dedup import prefix_filter_jaccard_pairs

    with forced_ansi(spark):
        pairs = prefix_filter_jaccard_pairs(
            tiny_docs, n=3, threshold=0.5
        ).collect()
    # docs 1 and 4 are identical -> jaccard 1.0 pair must survive
    assert any(
        {r["doc_a"], r["doc_b"]} == {1, 4} and r["jaccard"] == 1.0
        for r in pairs
    )


def test_incremental_ivf_topk_ansi_both_policies(spark):
    from shopify_db_spark.operators.similarity import incremental_ivf_topk
    from shopify_db_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 50 == 0)
    batches = [
        emb.filter(F.col("vec_id") % 3 == b).limit(40) for b in range(3)
    ]
    with forced_ansi(spark):
        for admit in ("arrival", "distance"):
            out = incremental_ivf_topk(
                batches, centroids, k=2, cell_cap=8, admit=admit
            )
            assert out.count() > 0


def test_ann_int8_ansi(spark):
    from shopify_db_spark.plans.vectorops import ann_int8
    from shopify_db_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    with forced_ansi(spark):
        out = ann_int8(queries, emb, k=3, nprobe=2, n_cells=8, seed=42)
        rows = out.groupBy("query_id").count().collect()
    assert rows and all(r["count"] <= 3 for r in rows)


def test_bpe_encode_ansi(spark, tiny_docs):
    from shopify_db_spark.plans.textops import bpe_encode

    with forced_ansi(spark):
        encoded = bpe_encode(tiny_docs, n_rounds=3).collect()
    assert len(encoded) == tiny_docs.count()
    assert all(
        r["n_tokens_encoded"] <= r["n_tokens_raw"] for r in encoded
    )


def test_build_and_verify_invoices_ansi(spark):
    from shopify_db_spark.plans.invoice import build_invoices
    from shopify_db_spark.plans.verify_invoices import verify_invoices

    tables = build_tables(spark)
    with forced_ansi(spark):
        inv = build_invoices(tables, "2024-01-01", "2024-01-31", 1000)
        report = verify_invoices(inv)
    assert report.n_ordinary_orders > 0


def test_round9_entry_points_ansi(spark, tiny_docs):
    from shopify_db_spark.operators.dedup import hash64_pairs
    from shopify_db_spark.operators.multimodal import (
        media_fingerprint,
        synthesize_media_from_documents,
    )
    from shopify_db_spark.operators.similarity import balanced_assign
    from shopify_db_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 100 == 0)
    media = synthesize_media_from_documents(tiny_docs)
    with forced_ansi(spark):
        sig = media_fingerprint(media)
        pairs = hash64_pairs(
            sig, max_hamming=16, id_col="media_id", hash_col="phash"
        ).collect()
        assigned = balanced_assign(emb, centroids, cell_cap=10, nprobe=2)
        assert assigned.count() == emb.count()
    # docs 1 and 4 are identical blobs -> hamming-0 pair under ANSI too
    assert any(
        (r["id_a"], r["id_b"]) == (1, 4) and r["hamming"] == 0 for r in pairs
    )


def test_snapshot_diff_and_drift_ansi(spark, tiny_docs):
    from shopify_db_spark.plans.curation import (
        distribution_drift,
        snapshot_diff,
    )

    prev = tiny_docs.filter(F.col("doc_id") != 2)
    curr = tiny_docs.filter(F.col("doc_id") != 3).withColumn(
        "text",
        F.when(F.col("doc_id") == 4, F.concat("text", F.lit("!"))).otherwise(
            F.col("text")
        ),
    )
    labeled = tiny_docs.withColumn(
        "src", F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd")
    )
    with forced_ansi(spark):
        diff = {r["doc_id"]: r["status"] for r in
                snapshot_diff(prev, curr, "doc_id", "text").collect()}
        drift = distribution_drift(labeled, "src", "text").collect()
    assert diff == {1: "unchanged", 2: "added", 3: "removed", 4: "changed"}
    # one pair, shared vocabulary non-empty, chi2 within [0, 2]*SCALE
    from shopify_db_spark.plans.curation import _Q124_SCALE

    assert len(drift) == 1
    assert 0 <= drift[0]["chi2_scaled"] <= 2 * _Q124_SCALE
    assert drift[0]["n_shared_terms"] > 0


def test_centroid_classify_ansi(spark):
    from shopify_db_spark.plans.vectorops import q122_centroid_classify
    from tests.conftest import SF_SMOKE

    with forced_ansi(spark):
        # the catalog wrapper would pin ANSI off; call the undecorated
        # implementation so the plan really analyzes under ANSI
        conf = q122_centroid_classify(spark, SF_SMOKE)
        rows = conf.collect()
    assert sum(r["n_docs"] for r in rows) > 0


def test_label_infer_ansi(spark):
    from shopify_db_spark.plans.vectorops import (
        q126_knn_label_infer,
        q127_ivf_label_infer,
    )
    from tests.conftest import SF_SMOKE

    with forced_ansi(spark):
        exact = q126_knn_label_infer(spark, SF_SMOKE).collect()
        ivf = q127_ivf_label_infer(spark, SF_SMOKE).collect()
    assert len(exact) > 0 and len(ivf) > 0
    assert all(1 <= r["n_votes"] <= 5 for r in exact)


def test_refresh_dedup_ansi(spark, tiny_docs):
    from shopify_db_spark.plans.curation import refresh_dedup

    base = tiny_docs.filter(F.col("doc_id") <= 3)
    delta = tiny_docs.filter(F.col("doc_id") == 4)  # dup of doc 1
    with forced_ansi(spark):
        dups = refresh_dedup(base, delta).collect()
    assert len(dups) == 1 and dups[0]["dup_of"] == 1


def test_hll_and_mixture_ansi(spark, tiny_docs):
    from shopify_db_spark.plans.textops import (
        hll_estimate,
        hll_register_sum,
        hll_registers,
    )

    labeled = tiny_docs.withColumn(
        "source", F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd")
    )
    toks = labeled.selectExpr(
        "source", "explode(split(lower(text), ' ')) AS term"
    )
    with forced_ansi(spark):
        sums = hll_register_sum(
            hll_registers(toks, ["source"]), ["source"]
        ).withColumn("est", hll_estimate(F.col("register_sum")))
        rows = {r["source"]: r for r in sums.collect()}
    assert set(rows) == {"even", "odd"}
    # ~9 distinct tokens per source; raw estimator within a loose band
    assert all(0 < r["est"] < 200 for r in rows.values())


def test_mmr_rerank_ansi(spark):
    from shopify_db_spark.plans.vectorops import q135_mmr_rerank
    from tests.conftest import SF_SMOKE

    with forced_ansi(spark):
        out = q135_mmr_rerank(spark, SF_SMOKE).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["mmr_rank"])
    # every query gets exactly ranks 1..5, no repeats
    assert all(v == {1, 2, 3, 4, 5} for v in by_q.values())


def test_length_quantile_sketch_ansi(spark, tiny_docs):
    from shopify_db_spark.plans.textops import (
        histogram_quantiles,
        length_histogram,
    )

    labeled = tiny_docs.withColumn(
        "source", F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd")
    ).selectExpr(
        "source", "CAST(size(split(text, ' ')) AS BIGINT) AS n_tok"
    )
    with forced_ansi(spark):
        out = histogram_quantiles(
            length_histogram(labeled, ["source"]), ["source"]
        ).collect()
    # 2 sources x 4 percentiles, bounds ordered
    assert len(out) == 8
    assert all(r["sketch_lo"] <= r["sketch_hi"] for r in out)


def test_target_affinity_ansi(spark, tiny_docs):
    from shopify_db_spark.plans.curation import target_affinity

    labeled = tiny_docs.withColumn(
        "source", F.when(F.col("doc_id") <= 2, "tgt").otherwise("rest")
    )
    with forced_ansi(spark):
        out = target_affinity(
            labeled, target_source="tgt", min_tf=1
        ).collect()
    # only the two non-target docs are scored; affinity in [0, 1]
    assert len(out) == 2
    assert all(0.0 <= r["affinity"] <= 1.0 for r in out)


def test_kcenter_greedy_ansi(spark):
    from shopify_db_spark.plans.vectorops import kcenter_greedy
    from shopify_db_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    with forced_ansi(spark):
        out = kcenter_greedy(emb, k=4).collect()
    # exactly ranks 1..4, all distinct points, coverage sims weakly
    # increasing is NOT guaranteed, but each is a valid cosine
    assert sorted(r["k_rank"] for r in out) == [1, 2, 3, 4]
    assert len({r["vec_id"] for r in out}) == 4
    assert all(-1.0 <= r["max_sim"] <= 1.0 for r in out)


def test_power_iteration_direction_ansi(spark):
    from shopify_db_spark.plans.vectorops import power_iteration_direction
    from shopify_db_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    with forced_ansi(spark):
        out = power_iteration_direction(emb, rounds=2).collect()
    from shopify_db_spark.plans.vectorops import DIM, _Q142_S2

    assert len(out) == DIM
    # max-abs normalization: at least one component at full scale
    assert max(abs(r["v_scaled"]) for r in out) == _Q142_S2
    # mass fraction of one direction is a proper fraction
    assert all(0.0 < r["anisotropy"] <= 1.0 for r in out)


def test_remove_common_component_ansi(spark):
    from shopify_db_spark.plans.vectorops import remove_common_component
    from shopify_db_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    with forced_ansi(spark):
        out = remove_common_component(emb, rounds=2).collect()
    assert len(out) == emb.count()
    from shopify_db_spark.plans.vectorops import DIM, _Q142_S1

    # the round-to-nearest projection can exceed the original norm²
    # only within the quantization envelope Σ|xi_d| + DIM/4
    # ≤ DIM·(0.6·S1) + DIM/4 (see the q143 section comment)
    slack = DIM * int(0.6 * _Q142_S1) + DIM // 4
    assert all(
        0 <= r["norm2_after"] <= r["norm2_before"] + slack for r in out
    )
    assert all(-0.01 <= r["removed_frac"] <= 1.0 for r in out)
    # and the typical vector genuinely loses mass
    n_reduced = sum(1 for r in out if r["norm2_after"] < r["norm2_before"])
    assert n_reduced > len(out) // 2


def test_soft_dedup_weights_ansi(spark, tiny_docs):
    from shopify_db_spark.operators.dedup import simhash_pairs
    from shopify_db_spark.plans.curation import soft_dedup_weights

    labeled = tiny_docs.withColumn("source", F.lit("s"))
    with forced_ansi(spark):
        pairs = simhash_pairs(labeled, max_hamming=4, hash_family="md5")
        w = {r["doc_id"]: r for r in
             soft_dedup_weights(labeled, pairs).collect()}
    # every doc is weighted; docs 1 and 4 are identical -> same
    # cluster, weight 1/size; doc 3 is a singleton with weight 1.0
    assert set(w) == {1, 2, 3, 4}
    assert w[3]["weight"] == 1.0
    assert w[1]["cluster_size"] == w[4]["cluster_size"] >= 2
    assert abs(w[1]["weight"] * w[1]["cluster_size"] - 1.0) < 1e-12


def test_balanced_subsample_ansi(spark, tiny_docs):
    from shopify_db_spark.plans.curation import balanced_subsample

    labeled = tiny_docs.withColumn(
        "lang", F.when(F.col("doc_id") <= 3, "en").otherwise("de")
    )
    with forced_ansi(spark):
        out = balanced_subsample(labeled, stratum_col="lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["lang_rank"])
    # exact balance: every stratum downsampled to the min size (1)
    assert set(by_lang) == {"en", "de"}
    assert all(sorted(v) == [1] for v in by_lang.values())


def test_round9_ivf_consumers_ansi(spark):
    from shopify_db_spark.plans.vectorops import (
        q138_mmr_ivf,
        q151_bitext_mining,
        q152_knn_hubness,
    )

    with forced_ansi(spark):
        # undecorated module attributes — the registry wrapper (which
        # would pin ansi=false) is bypassed, so these plans analyze
        # and execute under Spark 4's default ANSI semantics
        mmr = q138_mmr_ivf(spark, SF_SMOKE).collect()
        mined = q151_bitext_mining(spark, SF_SMOKE).collect()
        hub = q152_knn_hubness(spark, SF_SMOKE).collect()
    assert mmr and all(1 <= r["mmr_rank"] <= 5 for r in mmr)
    assert mined and all(
        r["margin"] >= 0.0 or r["accepted"] == 0 for r in mined
    )
    n_vec = sum(r["n_vectors"] for r in hub)
    assert n_vec > 0 and all(r["k_occurrences"] >= 0 for r in hub)


def test_semantic_dedup_pairs_ansi(spark):
    """Round-10 library entry: q147's cell-bounded pair generator must
    analyze and execute under forced ANSI, and its pair set must be a
    subset of semantic_dedup's drop graph on the same codebook (every
    id_b in a pair is exactly a vector semantic_dedup would mark
    kept=false when a lower-id near-dup shares its cell)."""
    from shopify_db_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_pairs,
    )
    from shopify_db_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 10 == 0)
    with forced_ansi(spark):
        pairs = semantic_dedup_pairs(emb, centroids, threshold=0.4).collect()
        decisions = semantic_dedup(emb, centroids, threshold=0.4).collect()
    dropped = {r["vec_id"] for r in decisions if not r["kept"]}
    assert pairs, "no cell-bounded pairs on the smoke fixture"
    assert all(r["id_a"] < r["id_b"] for r in pairs)
    assert {r["id_b"] for r in pairs} == dropped
