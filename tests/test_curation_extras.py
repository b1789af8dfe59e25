"""Cross-checks between curation-tier variants: the Bloom-style
membership filter (q75) against the exact shingle-set join (q53) —
at smoke scale the benchmark shingle count is far below the Bloom
capacity, so the two must agree exactly (any diff = false positives
beyond the documented envelope, or a hashing bug)."""

from __future__ import annotations

from shopify_db_spark.plans import load_all
from tests.conftest import SF_SMOKE


def test_bloom_matches_exact_contamination(spark):
    qs = load_all()
    exact = {
        r["doc_id"]: (r["n_shingles"], r["n_contaminated"])
        for r in qs["q53_contamination"].fn(spark, SF_SMOKE).collect()
    }
    bloom = {
        r["doc_id"]: (r["n_shingles"], r["n_flagged"])
        for r in qs["q75_bloom_decontamination"].fn(spark, SF_SMOKE).collect()
    }
    assert set(exact) == set(bloom)
    assert exact == bloom
