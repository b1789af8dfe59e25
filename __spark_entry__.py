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
#: change — current-round plan-affected queries first (enforced by
#: tests/test_rotation_lint.py), then the round-12 verdict's 18
#: prescribed re-certs (q20 artifact-read plan, the un-rotated
#: ivf_assign consumers, the r7-evidence tier q92-q99), then the
#: computed stale set oldest-evidence-first. Entries past the
#: 50-query sample are next round's starting debt.
# computed by scripts/rotation.py (base round-11; 21 plan-affected this round)
_NEVER_DRIVER_SAMPLED = [
    "q20_invoice_pipeline",  # round-affected
    "q61_invoice_verify",  # round-affected
    "q115_bpe_encode",  # round-affected
    "q145_tokenizer_fertility",  # round-affected
    "q50_dup_clusters",  # round-affected
    "q125_canonical_corpus",  # round-affected
    "q137_cluster_split",  # round-affected
    "q146_soft_dedup_weights",  # round-affected
    "q162_doc_novelty",  # round-affected
    "q49_streaming_merge",  # round-affected
    "q59_streaming_windows",  # round-affected
    "q60_stateful_activity",  # round-affected
    "q73_incremental_dedup",  # round-affected
    "q102_incremental_dedup_capped",  # round-affected
    "q90_incremental_cms",  # round-affected
    "q114_streaming_ann",  # round-affected
    "q133_streaming_hll",  # round-affected
    "q144_streaming_histogram",  # round-affected
    "q155_streaming_novelty",  # round-affected
    "q160_streaming_engagement",  # round-affected
    "q163_streaming_term_stats",  # round-affected
    "q112_ann_recall_gate",  # pinned
    "q113_incremental_ann_evict",  # pinned
    "q117_contrastive_ivf",  # pinned
    "q147_dedup_disagreement",  # pinned
    "q148_split_balance",  # pinned
    "q151_bitext_mining",  # pinned
    "q152_knn_hubness",  # pinned
    "q159_knn_recall_gate",  # pinned
    "q92_rfm_segments",  # pinned
    "q93_touch_attribution",  # pinned
    "q94_schema_evolution",  # pinned
    "q95_snapshot_diff",  # pinned
    "q96_fk_profile",  # pinned
    "q97_column_profile",  # pinned
    "q98_cascade_delete_plan",  # pinned
    "q99_category_association",  # pinned
    "q100_corpus_ship",  # stale since r8
    "q103_lexical_rarity",  # stale since r8
    "q104_embedding_quantize",  # stale since r8
    "q110_bpe_merges",  # stale since r8
    "q116_contrastive_pairs",  # stale since r8
    "q51_stratified_sample",  # stale since r8
    "q52_length_deciles",  # stale since r8
    "q53_contamination",  # stale since r8
    "q54_window_chunks",  # stale since r8
    "q55_repetition_stats",  # stale since r8
    "q56_pii_scan",  # stale since r8
    "q57_boilerplate_filter",  # stale since r8
    "q58_sequence_packing",  # stale since r8
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
