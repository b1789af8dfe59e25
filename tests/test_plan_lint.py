"""Plan lint over the whole catalog: no accidental cartesian products
or nested-loop joins, and no unexpected single-partition exchanges.
The allowlists name the queries whose plans legitimately contain a
bounded cross join (brute-force cosine baseline; IVF's n x K
centroid-scoring pass) or a bounded global stage."""

from __future__ import annotations

import pytest

from shopify_db_spark.plans import load_all
from tests.conftest import SF_SMOKE

#: queries with a deliberate, bounded cross join
CROSS_JOIN_OK = {
    "q30_cosine_topk",   # brute-force baseline (queries x candidates)
    "q38_ivf_ann",       # n x K centroid scoring
    "q101_ivf_nprobe",   # same n x K centroid scoring, multi-probe
    "q105_quantized_ann",  # brute-force baseline over int8 codes (queries x candidates)
    "q106_ivf_quantized",  # n x K centroid scoring (assignment pass; pair scoring is cell-keyed)
    "q108_incremental_ann",  # n x K centroid scoring per arrival batch (probe join is cell-keyed)
    "q109_hybrid_rrf",  # dense side is q30's brute-force baseline (queries x candidates)
    "q110_bpe_merges",  # per-round 1-row broadcast merge rule applied corpus-wide
    "q111_hybrid_rrf_ivf",  # dense side is q38's n x K centroid scoring (cell-keyed pair join)
    "q112_ann_recall_gate",  # q30 baseline tier + n x K codebook assignment (ann pair join is cell-keyed)
    "q113_incremental_ann_evict",  # n x K centroid scoring per arrival batch (probe join is cell-keyed)
    "q115_bpe_encode",  # per-round 1-row broadcast merge rule applied corpus-wide (q110's shape)
    "q145_tokenizer_fertility",  # q115's per-round 1-row broadcast merge rule (the fertility rollup itself is an equi-join)
    "q116_contrastive_pairs",  # brute-force baseline tier (queries x candidates, q30's gated shape)
    "q117_contrastive_ivf",  # n x K centroid scoring (q101's multi-probe geometry; pair join is cell-keyed)
    "q48_hourly_gapfill",  # hour x type grid (both dimension-sized)
    "q74_semantic_dedup",  # n x K codebook assignment (codebook broadcast,
                           # fixed-size or sublinear — see semantic_dedup)
    "q122_centroid_classify",  # n x #domains broadcast centroid scoring
    "q126_knn_label_infer",  # brute-force baseline tier (q30's gated shape; production tier is q127)
    "q127_ivf_label_infer",  # n x K centroid scoring (q101's geometry; pair join is cell-keyed)
    "q129_domain_outliers",  # n x #domains broadcast centroid scoring (q122's engine)
    "q131_mixture_temperature",  # 1-row normalizer broadcast applied to #sources rows
    "q132_hll_overlap",  # S x S source-pair grid + OR-keyed register fan-out — both #sources-sized, never corpus-sized
    "q134_source_keywords",  # 1-row corpus-total broadcast applied to the scored vocab (q131's normalizer idiom)
    "q135_mmr_rerank",  # brute-force candidate baseline tier (q30's gated shape; production tier is q138)
    "q138_mmr_ivf",  # n x K centroid scoring (q101's geometry; candidate pair join is cell-keyed)
    "q140_target_affinity",  # 1-row corpus-totals broadcast applied to the vocab (q134's normalizer idiom)
    "q142_principal_direction",  # 1-row iterate/anisotropy broadcasts applied per vector and to the DIM-row output — never row x row
    "q143_common_removal",  # 1-row direction broadcast applied per vector (q142's geometry; removal is map-only)
    "q148_split_balance",  # n x K broadcast centroid scoring (q101's assignment geometry)
    "q151_bitext_mining",  # n x K broadcast centroid scoring (q101's assignment geometry; the pair join is cell-keyed)
    "q152_knn_hubness",  # n x K broadcast centroid scoring (q101's assignment geometry; the graph join is cell-keyed)
    "q159_knn_recall_gate",  # n x K centroid scoring + the q30 baseline tier's gated broadcast (recall gates embed both paths by design)
    "q149_balanced_subsample",  # 1-row min-count target broadcast applied per row (q134's normalizer idiom)
    "q156_budget_mixture",  # 1-row budget broadcast applied to the #sources-row allocation frame
    "q158_decayed_engagement",  # 1-row max-date broadcast applied per event (q134's normalizer idiom)
    "q161_bm25_retrieval",  # 1-row corpus-stats (N, TL) broadcast applied per candidate posting (q134's normalizer idiom)
}

ALL = sorted(load_all())

_DF_CACHE: dict[str, object] = {}
_PLAN_CACHE: dict[str, str] = {}


def _df(spark, name: str):
    """Catalog DataFrame per query, built once per session — the
    streaming gate queries actually RUN their bounded stream when
    invoked, so every lint sharing one construction matters."""
    if name not in _DF_CACHE:
        _DF_CACHE[name] = load_all()[name].fn(spark, SF_SMOKE)
    return _DF_CACHE[name]


def _plan(spark, name: str) -> str:
    """Physical plan per query, computed once per session."""
    if name not in _PLAN_CACHE:
        _PLAN_CACHE[name] = (
            _df(spark, name)._jdf.queryExecution().executedPlan().toString()
        )
    return _PLAN_CACHE[name]


@pytest.mark.parametrize("name", ALL)
def test_no_accidental_cross_join(spark, name):
    plan = _plan(spark, name)
    flags = [
        f
        for f in ("CartesianProduct", "BroadcastNestedLoopJoin")
        if f in plan
    ]
    if name in CROSS_JOIN_OK:
        return  # bounded by construction; documented at the call site
    assert not flags, f"{name} plans a cross join: {flags}"


#: queries whose physical plans legitimately contain Exchange
#: SinglePartition nodes, with the bound that keeps each safe at
#: scale. Every entry is (max occurrences, why it is bounded).
SINGLE_PARTITION_OK = {
    "q06_orderkey_gaps": (1, "final scalar aggregate over partial aggs"),
    "q08_group_numbering": (1, "numbering window over the group side only (auto two-phase above TWO_PHASE_SOURCE_BYTES, needs_two_phase)"),
    "q12_global_aggregates": (1, "final scalar aggregate over partial aggs"),
    "q20_invoice_pipeline": (2, "invoice-group numbering window (auto two-phase above TWO_PHASE_SOURCE_BYTES) + group distinct"),
    "q48_hourly_gapfill": (1, "hour-grid generation, dimension-sized"),
    "q52_length_deciles": (1, "two-phase NTILE offsets, #partitions rows"),
    "q58_sequence_packing": (1, "two-phase prefix-sum offsets, #partitions rows"),
    "q70_mixture_weights": (1, "partitionless window over per-source rows"),
    "q71_shuffle_split": (1, "two-phase numbering offsets, #partitions rows"),
    "q92_rfm_segments": (3, "three independent two-phase NTILE offset frames, #partitions rows each"),
    "q96_fk_profile": (5, "five per-FK-edge scalar (n_distinct, n_orphans) finals over partial aggs, one row each (round-14 single-plan shape)"),
    "q97_column_profile": (1, "final scalar aggregate over partial aggs (one stats row)"),
    "q98_cascade_delete_plan": (3, "three per-table scalar count finals over partial aggs"),
    "q100_corpus_ship": (1, "two-phase prefix-sum offsets, #partitions rows (q58's bound)"),
    "q103_lexical_rarity": (1, "two-phase NTILE offsets over the vocabulary, #partitions rows"),
    "q112_ann_recall_gate": (1, "final scalar aggregate over partial aggs (one verdict row)"),
    "q131_mixture_temperature": (1, "scalar normalizer aggregate over #sources partial rows"),
    "q134_source_keywords": (1, "scalar corpus-total aggregate over partial aggs (one n row)"),
    "q140_target_affinity": (1, "scalar class-totals aggregate over vocab partial rows (one n_t/n_r row)"),
    "q141_kcenter_coreset": (1, "global seed-pick aggregate over partial aggs (one row); per-round argmins are checkpoint-truncated out of the declared plan"),
    "q142_principal_direction": (2, "lambda and trace scalar aggregates over partial aggs (one row each); per-round renormalizations are checkpoint-truncated"),
    "q147_dedup_disagreement": (1, "final scalar agreement aggregate over partial aggs (one summary row)"),
    "q149_balanced_subsample": (3, "two-phase numbering offsets (#partitions rows) + #langs offset and 1-row min-count finals over partial aggs"),
    "q150_batch_padding": (2, "two independent two-phase numbering offset frames, #partitions rows each (q92's bound)"),
    "q154_novelty_curve": (1, "two-phase NTILE offsets, #partitions rows (q52's bound)"),
    "q156_budget_mixture": (3, "vocab NTILE offsets (#partitions rows) + 1-row budget final + partitionless greedy window over #sources rows (q70's bound)"),
    "q158_decayed_engagement": (1, "scalar max-date aggregate over partial aggs (one now row)"),
    "q159_knn_recall_gate": (1, "final scalar recall aggregate over partial aggs (one verdict row, q112's bound)"),
    "q161_bm25_retrieval": (1, "scalar corpus-stats aggregate (n_docs, tl) over per-doc partial rows (q134's bound)"),
}


def test_q32_pair_join_is_bucket_keyed(spark):
    """q32's near-dup pair join must be an equi-join whose keys
    include the LSH ``bucket`` column (plus band). Blocking on a
    fixed semantic column (label) made the join Σ block² = O(N²);
    this pins the scale-safe shape so a catalog edit can't silently
    reintroduce it."""
    import re

    plan = _plan(spark, "q32_embedding_dedup")
    join_headers = [
        ln
        for ln in plan.splitlines()
        if re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", ln)
    ]
    pair_joins = [ln for ln in join_headers if "id_a" in ln or "bucket" in ln]
    assert any("bucket" in ln for ln in pair_joins), (
        "q32 pair join lost its LSH bucket equi-key:\n" + "\n".join(join_headers)
    )


@pytest.mark.parametrize("name", ALL)
def test_no_unexpected_single_partition_exchange(spark, name):
    """Every Exchange SinglePartition in a catalog plan must be a
    known bounded shape (scalar aggregate, group-cardinality window,
    partition-count offset frame) — an unexpected one means a new
    query funnels data-sized input through one task."""
    n = _plan(spark, name).count("Exchange SinglePartition")
    allowed, _why = SINGLE_PARTITION_OK.get(name, (0, "no global stage"))
    assert n <= allowed, (
        f"{name}: {n} SinglePartition exchange(s), allowlist permits "
        f"{allowed} — justify the bound or restructure the plan"
    )


@pytest.mark.parametrize("name", ALL)
def test_no_complex_output_columns(spark, name):
    """No declared catalog query may output array/struct/map columns:
    the external driver canonicalizes results via pandas
    ``sort_values`` over raw columns, which crashes on ndarray cells
    (``TypeError: unhashable type: 'numpy.ndarray'`` — the
    CORRECTNESS_r07 q104 red row). The local gate's ``canonical_rows``
    tuples-izes arrays first, so this divergence is invisible locally;
    this lint makes it structural. Serialize complex columns (e.g.
    ``array_join(..., ' ')`` / DuckDB ``array_to_string``) instead."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f.name
        for f in _df(spark, name).schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name} outputs complex-typed column(s) {bad} — the driver's "
        "pandas canonicalizer crashes on these; serialize to string"
    )


def test_invoice_artifact_build_mapping_layer_is_cached(spark):
    """The invoice BUILD references the commerce mapping frames from
    every branch — ~28 re-derivations per run when lazy (measured
    0.75 s slower at sf0.1 and strictly worse at scale). Guard that
    the mapped tables stay persisted in the build plan (q20 itself
    now reads the materialized invoice artifact, so the lint targets
    the derivation where the mapping frames actually appear)."""
    from shopify_db_spark.plans.commerce import (
        FROM_DATE,
        START_ID,
        TO_DATE,
        commerce_tables_from_benchmark,
    )
    from shopify_db_spark.plans.invoice import build_invoices

    tables = commerce_tables_from_benchmark(spark, SF_SMOKE)
    try:
        plan = (
            build_invoices(tables, FROM_DATE, TO_DATE, START_ID)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        for df in tables.values():
            df.unpersist()
    assert "InMemory" in plan, (
        "the invoice build no longer reads the mapping layer from "
        "cache — commerce_tables_from_benchmark(cache=...) regressed"
    )


def test_q20_and_q61_read_the_invoice_artifact(spark):
    """q20 and the verify suite must READ the materialized invoice
    table (the reference's own shape: db.py writes the tripletex
    table, tripletex.py verify queries it), not rebuild the six-join
    pipeline per query. q20's declared plan shows the checkpoint
    scan directly; q61 collects scalar aggregates (its declared plan
    is a local relation), so the lint targets its input frame
    ``_normalized_invoices`` instead — the artifact read plus
    map-side normalization, no joins, no exchanges."""
    plan = _plan(spark, "q20_invoice_pipeline")
    assert "ExistingRDD" in plan, (
        "q20 no longer reads the invoice artifact "
        "(commerce.invoice_table) — per-query rebuild regressed"
    )
    from shopify_db_spark.plans.commerce_checks import _normalized_invoices

    nplan = (
        _normalized_invoices(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ExistingRDD" in nplan and "Join" not in nplan, (
        "q61's input no longer reads the invoice artifact — "
        "per-query rebuild regressed:\n" + nplan[:800]
    )


def test_q115_and_q145_read_the_bpe_artifact(spark):
    """q115 and q145 must READ the materialized BPE-encoded corpus
    (``textops.bpe_encoded_table`` — one train+apply per corpus),
    not re-run the merge training per query. q115's declared plan is
    the checkpoint scan itself (no joins, no exchanges); q145 layers
    exactly one metadata equi-join and a #langs aggregate on top, so
    its plan shows the checkpoint scan and must NOT contain the
    training loop's signature crossJoin/broadcast-argmax chain."""
    plan = _plan(spark, "q115_bpe_encode")
    assert "ExistingRDD" in plan and "Join" not in plan, (
        "q115 no longer reads the bpe_encoded artifact — "
        "per-query retrain regressed:\n" + plan[:800]
    )
    plan145 = _plan(spark, "q145_tokenizer_fertility")
    assert "ExistingRDD" in plan145, (
        "q145 no longer reads the bpe_encoded artifact — "
        "per-query retrain regressed"
    )
    assert "BroadcastNestedLoopJoin" not in plan145, (
        "q145's plan contains a cross join — the merge-training "
        "argmax chain leaked back into the consumer:\n" + plan145[:800]
    )


def test_duckdb_supports_materialized_cte_hints():
    """The `AS MATERIALIZED` hints the materialization lint below
    pins are DuckDB >= 0.9 syntax (ADVICE r11): on an older
    interpreter every hinted oracle would fail to PARSE rather than
    just run slowly. Pin the minimum here so the environment fails
    one obvious test instead of seven opaque oracle errors."""
    import duckdb

    major, minor = (int(x) for x in duckdb.__version__.split(".")[:2])
    assert (major, minor) >= (0, 9), (
        f"duckdb {duckdb.__version__} predates CTE materialization "
        "hints; the q61/q135/q138/CC oracles will not parse"
    )
    # and the syntax actually parses on this interpreter:
    con = duckdb.connect()
    try:
        assert con.execute(
            "WITH t AS MATERIALIZED (SELECT 1 AS x) "
            "SELECT x FROM t UNION ALL SELECT x FROM t"
        ).fetchall() == [(1,), (1,)]
    finally:
        con.close()


def test_mmr_oracle_round_chain_is_materialized():
    """Round-11 sweep lesson: DuckDB inlines plain CTEs once per
    REFERENCE, and each MMR round references the previous selection
    set twice, so the unhinted q135/q138 round chain re-derived the
    whole candidate generation O(2^K) times — q138's spliced IVF
    candidates OOMed DuckDB at sf0.1 under concurrent memory
    pressure (measured: old oracle fails a 12 GB cap, materialized
    oracle runs in <1 s with row-identical output). Pin the hints so
    a rewrite cannot silently reintroduce the exponential shape."""
    from shopify_db_spark.plans.vectorops import _Q135_K, _q135_oracle, _q138_oracle

    for sql in (_q135_oracle(), _q138_oracle()):
        for r in range(1, _Q135_K):
            assert f"sel{r} AS MATERIALIZED (" in sql, (
                f"sel{r} lost its MATERIALIZED hint — the MMR round "
                "chain is exponential again"
            )
        assert "cand AS MATERIALIZED (" in sql
        assert "ps AS MATERIALIZED (" in sql
    assert "scored_assign AS MATERIALIZED (" in _q138_oracle()
    # Same class, other proven-expensive sites: q61's 8×-referenced
    # norm CTE (117.6 → 3.3 s at sf0.1) and the recursive-CC
    # oracles' pair/edge CTEs re-derived inside the recursive step
    # (q50 317 → 129 s). All verified row-identical old-vs-new.
    from shopify_db_spark.plans.catalog import QUERIES

    assert "norm AS MATERIALIZED (" in QUERIES["q61_invoice_verify"].oracle
    for cc in (
        "q50_dup_clusters",
        "q125_canonical_corpus",
        "q137_cluster_split",
        "q146_soft_dedup_weights",
    ):
        sql = QUERIES[cc].oracle
        assert "pairs AS MATERIALIZED (" in sql, cc
        assert "edges AS MATERIALIZED (" in sql, cc


def test_oracle_outputs_never_hugeint():
    """Round-10 lesson (the REAL q121/q124 driver-red root cause):
    DuckDB silently promotes ``SUM(BIGINT)`` — and BIGINT arithmetic
    mixing with such a sum — to HUGEINT, which ``.df()`` materializes
    as pandas float64. The Spark twin emits int64, so the external
    driver's dtype-sensitive value hash fails while every value is
    equal — and a scalar-normalizing local compare is structurally
    blind to it (q70's oracle comments the trap at curation.py:688;
    q121 carried the only remaining un-cast instance for two rounds).

    This lint binds every catalog oracle against DuckDB (lazy — no
    execution) and rejects any top-level HUGEINT/UHUGEINT output
    column: each aggregate output must carry an explicit outer
    ``CAST(... AS BIGINT/DOUBLE/...)``. Paired with the dtype-family
    guard in ``testing.compare_frames``, the class is now impossible
    to pass locally."""
    from shopify_db_spark.plans import load_all
    from shopify_db_spark.testing import duckdb_con

    problems = []
    with duckdb_con(SF_SMOKE) as con:
        for name, spec in sorted(load_all().items()):
            if spec.oracle is None:
                continue
            rel = con.sql(spec.oracle)
            for col, typ in zip(rel.columns, rel.types):
                if "HUGEINT" in str(typ).upper():
                    problems.append(
                        f"{name}: oracle output {col!r} is {typ} — "
                        "pandas will materialize it as float64 and the "
                        "driver hash will mismatch the Spark int64; add "
                        "an outer CAST(... AS BIGINT)"
                    )
    assert not problems, "\n".join(problems)


def test_hugeint_lint_catches_the_q70_trap():
    """Regression guard for the lint itself: the literal trap shape
    documented in q70's oracle (un-cast SUM over BIGINT) must bind to
    HUGEINT, and the q124/q121 fix shape (outer CAST) to BIGINT —
    if a DuckDB upgrade ever changes this promotion, the lint above
    silently stops guarding and this test says so."""
    import duckdb

    con = duckdb.connect()
    trap = con.sql("SELECT SUM(CAST(1 AS BIGINT)) AS x FROM range(3)")
    assert [str(t) for t in trap.types] == ["HUGEINT"]
    assert str(trap.df()["x"].dtype) == "float64"  # the driver-red signature
    fixed = con.sql(
        "SELECT CAST(SUM(CAST(1 AS BIGINT)) AS BIGINT) AS x FROM range(3)"
    )
    assert [str(t) for t in fixed.types] == ["BIGINT"]
    assert str(fixed.df()["x"].dtype) == "int64"


def test_floor_scale_sites_are_version_proof():
    """``floor(x·SCALE)`` on float-derived x is only honestly "exact
    BIGINT" if the scaled product is exactly representable at EVERY
    precision an engine version might evaluate it at. Power-of-two
    scales are (the multiply only shifts the binary exponent); 10^k
    scales bet on IEEE-reproducible evaluation (constant folding /
    float-precision multiply before widening can flip floors that sit
    near an integer). NOTE: the r9/r10 q121/q124 driver reds that
    motivated this lint turned out to be a DIFFERENT class — un-cast
    DuckDB HUGEINT outputs (see ``test_oracle_outputs_never_hugeint``)
    — not floor flips; the lint stays because the flip class is real
    even though it was not that bug. This lint scans every
    floor-with-scale window
    in ``plans/`` and requires the resolved scale constant to be a
    power of two, or the site to carry an allowlist entry HERE with
    a written exactness argument.

    Allowlisted non-power-of-two scales:

    - ``curation._Q131_WSCALE`` (q131 sqrt-weights): the floored
      quantity is sqrt(n_tokens)·1e6 where n_tokens is an exact
      integer-valued binary64 — no float32 anywhere in the tree, and
      sqrt/multiply are IEEE correctly-rounded binary64 ops, so every
      conformant engine computes the identical double; magnitude
      ≤ 1e6·sqrt(1e12) = 1e12 keeps the product far below the 2^53
      integer boundary.
    """
    import importlib
    import pathlib
    import re

    plans_dir = (
        pathlib.Path(__file__).resolve().parents[1]
        / "shopify_db_spark"
        / "plans"
    )
    allow = {("curation", "_Q131_WSCALE")}
    floor_re = re.compile(r"(?i)floor\(")
    tok_re = re.compile(r"\{?(_Q\w*?(?:SCALE|WSCALE|S1|S2))\}?")
    lit_re = re.compile(r"\*\s*(1(?:_?0){3,}|10\s*\*\*\s*\d+|\d+e\d+)")
    problems = []
    for f in sorted(plans_dir.glob("*.py")):
        mod = importlib.import_module(f"shopify_db_spark.plans.{f.stem}")
        lines = f.read_text().splitlines()
        for i, line in enumerate(lines):
            if not floor_re.search(line):
                continue
            window = " ".join(lines[i : i + 3])
            for m in lit_re.finditer(window):
                problems.append(
                    f"{f.name}:{i + 1}: raw 10^k literal "
                    f"{m.group(1)} inside a floor() window"
                )
            for name in set(tok_re.findall(window)):
                val = getattr(mod, name, None)
                if not isinstance(val, int):
                    continue
                is_pow2 = val > 0 and (val & (val - 1)) == 0
                if not is_pow2 and (f.stem, name) not in allow:
                    problems.append(
                        f"{f.name}:{i + 1}: floor() scaled by "
                        f"{name}={val} — not a power of two and not "
                        "allowlisted with an exactness argument"
                    )
    assert not problems, "\n".join(problems)
