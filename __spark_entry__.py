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
# computed by scripts/rotation.py (base round-13; 0 plan-affected this round; 0 stale; 10 freshness-floor; 0 pins, 0 absorbed)
_DRIVER_SAMPLE_HEAD = [
    "q46_priority_pivot",  # freshness floor (evidence r9)
    "q02_top_order_per_customer",  # freshness floor (evidence r10)
    "q03_regional_revenue",  # freshness floor (evidence r10)
    "q04_union_distinct_branches",  # freshness floor (evidence r10)
    "q05_order_price_reconcile",  # freshness floor (evidence r10)
    "q06_orderkey_gaps",  # freshness floor (evidence r10)
    "q07_composite_key_join",  # freshness floor (evidence r10)
    "q08_group_numbering",  # freshness floor (evidence r10)
    "q09_predicate_gallery",  # freshness floor (evidence r10)
    "q10_scalar_gallery",  # freshness floor (evidence r10)
    "q11_first_per_group",  # evidence r10
    "q122_centroid_classify",  # evidence r10
    "q129_domain_outliers",  # evidence r10
    "q12_global_aggregates",  # evidence r10
    "q13_revenue_rollup",  # evidence r10
    "q142_principal_direction",  # evidence r10
    "q143_common_removal",  # evidence r10
    "q158_decayed_engagement",  # evidence r10
    "q17_topk_per_group",  # evidence r10
    "q18_semi_anti_joins",  # evidence r10
    "q21_exact_dedup",  # evidence r10
    "q22_token_stats",  # evidence r10
    "q23_quality_scores",  # evidence r10
    "q24_lang_id",  # evidence r10
    "q25_ngram_jaccard_pairs",  # evidence r10
    "q26_minhash_lsh_pairs",  # evidence r10
    "q27_simhash_pairs",  # evidence r10
    "q28_winnow_fingerprints",  # evidence r10
    "q29_bpe_token_counts",  # evidence r10
    "q40_term_stats",  # evidence r10
    "q47_corpus_prep",  # evidence r10
    "q62_upsert_merge",  # evidence r10
    "q63_csv_roundtrip",  # evidence r10
    "q64_json_ingest",  # evidence r10
    "q65_json_shipping",  # evidence r10
    "q66_json_variants",  # evidence r10
    "q67_json_refunds",  # evidence r10
    "q68_json_customers",  # evidence r10
    "q76_sparse_cosine_retrieval",  # evidence r10
    "q84_prefix_filter_jaccard",  # evidence r10
    "q101_ivf_nprobe",  # evidence r11
    "q105_quantized_ann",  # evidence r11
    "q106_ivf_quantized",  # evidence r11
    "q108_incremental_ann",  # evidence r11
    "q111_hybrid_rrf_ivf",  # evidence r11
    "q121_domain_centroids",  # evidence r11
    "q15_tumbling_window",  # evidence r11
    "q161_bm25_retrieval",  # evidence r11
    "q16_json_extract",  # evidence r11
    "q19_event_funnel",  # evidence r11
    "q36_customer_map",  # evidence r11
    "q37_product_search",  # evidence r11
    "q41_cohort_retention",  # evidence r11
    "q42_value_percentiles",  # evidence r11
    "q43_approx_stats",  # evidence r11
    "q44_asof_config",  # evidence r11
    "q45_promo_range_join",  # evidence r11
    "q48_hourly_gapfill",  # evidence r11
    "q74_semantic_dedup",  # evidence r11
    "q77_entity_resolution",  # evidence r11
]

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, with
    the rotation head registered first (the driver samples the
    first 50 in registration order)."""
    specs = load_all()
    ordered = {n: specs[n].fn for n in _DRIVER_SAMPLE_HEAD if n in specs}
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
