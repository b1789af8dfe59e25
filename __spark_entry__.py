"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real implementations live in the ``shopify_db_spark`` package;
this module only adapts them to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from shopify_db_spark.plans import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = load_all()
    return specs["q01_pricing_summary"].fn(spark, SMOKE_SF_DIR)


#: Queries surfaced FIRST in registration order so an order-sensitive
#: 50-query driver sampler reaches them; harmless if the sample is
#: uniform. COMPUTED, not curated (VERDICT r11 item 1): regenerate
#: with ``python scripts/rotation.py`` after the round's last plan
#: change. Order: current-round plan-affected queries (enforced by
#: tests/test_rotation_lint.py), the computed stale set oldest-
#: evidence-first, a FLOOR_K=10 freshness reserve of the globally
#: oldest-evidence queries (VERDICT r12 item 2 — reserved AHEAD of
#: any --must pins so pins can never starve the tail), then pins
#: and the remaining oldest-first tail. The header line below is
#: emitted by the generator and records how many pins were absorbed
#: into higher tiers. Entries past the 50-query sample are next
#: round's starting debt.
# computed by scripts/rotation.py (base round-12; 16 plan-affected this round; 30 stale; 10 freshness-floor; 0 pins, 0 absorbed)
_NEVER_DRIVER_SAMPLED = [
    "q33_media_metadata",  # round-affected
    "q34_media_features",  # round-affected
    "q118_image_phash_dedup",  # round-affected
    "q35_frame_sample_plan",  # round-affected
    "q164_wav_band_energy",  # round-affected
    "q30_cosine_topk",  # round-affected
    "q107_cosine_topk_grid",  # round-affected
    "q109_hybrid_rrf",  # round-affected
    "q112_ann_recall_gate",  # round-affected
    "q116_contrastive_pairs",  # round-affected
    "q126_knn_label_infer",  # round-affected
    "q135_mmr_rerank",  # round-affected
    "q138_mmr_ivf",  # round-affected
    "q159_knn_recall_gate",  # round-affected
    "q163_streaming_term_stats",  # round-affected
    "q165_streaming_reservoir",  # round-affected
    "q69_geo_heatmap",  # stale since r8
    "q70_mixture_weights",  # stale since r8
    "q71_shuffle_split",  # stale since r8
    "q72_dup_spans",  # stale since r8
    "q75_bloom_decontamination",  # stale since r8
    "q80_weighted_sample",  # stale since r8
    "q85_cross_source_dups",  # stale since r8
    "q86_count_min_sketch",  # stale since r8
    "q119_balanced_clusters",  # stale since r9
    "q120_curriculum_sample",  # stale since r9
    "q127_ivf_label_infer",  # stale since r9
    "q153_domain_coherence",  # stale since r9
    "q38_ivf_ann",  # stale since r9
    "q124_source_drift",  # stale since r10
    "q14_sessionize",  # freshness floor (evidence r8)
    "q01_pricing_summary",  # freshness floor (evidence r9)
    "q123_snapshot_diff",  # freshness floor (evidence r9)
    "q128_refresh_dedup",  # freshness floor (evidence r9)
    "q130_hll_distinct",  # freshness floor (evidence r9)
    "q131_mixture_temperature",  # freshness floor (evidence r9)
    "q132_hll_overlap",  # freshness floor (evidence r9)
    "q134_source_keywords",  # freshness floor (evidence r9)
    "q136_split_leakage",  # freshness floor (evidence r9)
    "q139_length_quantile_sketch",  # freshness floor (evidence r9)
    "q140_target_affinity",  # evidence r9
    "q141_kcenter_coreset",  # evidence r9
    "q149_balanced_subsample",  # evidence r9
    "q150_batch_padding",  # evidence r9
    "q154_novelty_curve",  # evidence r9
    "q156_budget_mixture",  # evidence r9
    "q157_robust_outliers",  # evidence r9
    "q31_lsh_ann",  # evidence r9
    "q32_embedding_dedup",  # evidence r9
    "q39_running_totals",  # evidence r9
    "q46_priority_pivot",  # evidence r9
    "q02_top_order_per_customer",  # evidence r10
    "q03_regional_revenue",  # evidence r10
    "q04_union_distinct_branches",  # evidence r10
    "q05_order_price_reconcile",  # evidence r10
    "q06_orderkey_gaps",  # evidence r10
    "q07_composite_key_join",  # evidence r10
    "q08_group_numbering",  # evidence r10
    "q09_predicate_gallery",  # evidence r10
    "q10_scalar_gallery",  # evidence r10
]

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, with
    the never-driver-sampled queries registered first."""
    specs = load_all()
    ordered = {n: specs[n].fn for n in _NEVER_DRIVER_SAMPLED if n in specs}
    ordered.update(
        (n, s.fn) for n, s in specs.items() if n not in ordered
    )
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted entries (oracle=None)
    are non-SQL-expressible ops that get the weaker rows-only check."""
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
