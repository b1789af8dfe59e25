"""Computed driver-rotation lint (VERDICT r11 item 1).

The q20 miss: round 11 moved q20 to the invoice-artifact read but
the hand-curated ``_NEVER_DRIVER_SAMPLED`` head never resurfaced it,
so a plan change shipped without driver re-certification. These
tests make the head mechanical: ``shopify_db_spark.rotation`` maps
the round's git diff to catalog queries through each module's AST
(units + import-resolved reference edges), and the lint fails the
round if any plan-affected query is missing from the sampled head.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from shopify_db_spark import rotation as R

#: the driver samples this many queries per round, in queries() order
DRIVER_SAMPLE = 50


@pytest.fixture(scope="module")
def modules():
    return R.load_package()


def test_analyzer_sees_the_package(modules):
    assert len(modules) > 30
    info = modules["shopify_db_spark.plans.artifacts"]
    assert "session_artifact" in info.units


def test_known_edges_resolve(modules):
    """Resolver regressions show up as missing edges; pin three
    load-bearing ones (direct import, module-alias attribute call,
    intra-module transitive call)."""
    cases = {
        "q20_invoice_pipeline": ("shopify_db_spark.plans.artifacts", "session_artifact"),
        "q161_bm25_retrieval": ("shopify_db_spark.operators.similarity", "bm25_topk"),
        # q101 calls SIM.ivf_ann which calls ivf_assign intra-module
        "q101_ivf_nprobe": ("shopify_db_spark.operators.similarity", "ivf_assign"),
    }
    qunits = R.query_units()
    for qname, expected in cases.items():
        assert expected in R.closure(modules, qunits[qname]), (qname, expected)


def test_q20_class_miss_is_caught(modules):
    """Regression for the exact round-11 escape: a change to the
    shared artifact memo must surface q20 (and every other artifact
    consumer) as plan-affected."""
    affected = R.affected_queries(
        {("shopify_db_spark.plans.artifacts", "session_artifact")}, modules
    )
    for q in (
        "q20_invoice_pipeline",
        "q61_invoice_verify",
        "q115_bpe_encode",
        "q145_tokenizer_fertility",
        "q50_dup_clusters",
    ):
        assert q in affected


def test_round_diff_queries_are_in_the_sampled_head(modules):
    """THE lint: every query whose plan changed since the last round
    boundary must sit inside the first DRIVER_SAMPLE entries of
    ``queries()`` so the driver re-certifies it this round. When a
    round touches more queries than one sample holds, the entire
    sample budget must at least be spent on affected queries."""
    base = R.round_base()
    if base is None:
        pytest.skip("no git history / round base available")
    lines = R.changed_lines(base)
    if lines is None:
        pytest.skip("git diff unavailable")
    affected = R.affected_queries(R.changed_units(modules, lines), modules)
    sampled = list(entrymod.queries())[:DRIVER_SAMPLE]
    if len(affected) <= DRIVER_SAMPLE:
        missing = [q for q in affected if q not in sampled]
        assert not missing, (
            f"plan-changed since {base} but NOT in the driver's "
            f"{DRIVER_SAMPLE}-query sample head: {missing} — regenerate "
            "_NEVER_DRIVER_SAMPLED with scripts/rotation.py"
        )
    else:
        rogue = [q for q in sampled if q not in affected]
        assert not rogue, (
            f"{len(affected)} queries changed since {base} (> sample); "
            f"every sample slot must go to an affected query, not {rogue}"
        )


def test_head_list_matches_registry():
    """Every head entry names a real catalog query (a rename that
    silently drops an entry from queries() defeats the rotation)."""
    from shopify_db_spark.plans import load_all

    specs = load_all()
    unknown = [q for q in entrymod._NEVER_DRIVER_SAMPLED if q not in specs]
    assert not unknown, f"head entries not in the catalog: {unknown}"


def test_collect_module_units_spans_and_edges():
    """Hermetic resolver checks on synthetic sources: unit spans
    include decorators, module-alias attribute calls resolve to the
    target module's units, local (function-body) imports create
    edges, and decorator arguments count as dependencies (oracle
    builders live there)."""
    opssrc = """
def helper(x):
    return x

def deco(arg):
    def wrap(fn):
        return fn
    return wrap

CONST = 7
"""
    plansrc = """
from shopify_db_spark.fakeops import deco

@deco(CONSTANT)
def fancy(spark):
    from shopify_db_spark.fakeops import helper
    return helper(1)

def plain(spark):
    import shopify_db_spark.fakeops
    return shopify_db_spark.fakeops.CONST

CONSTANT = 3
"""
    ops = R._collect_module("shopify_db_spark/fakeops.py", opssrc)
    plan = R._collect_module("shopify_db_spark/fakeplan.py", plansrc)
    mods = {m.name: m for m in (ops, plan)}

    # decorator line is inside fancy's span
    lo, hi = plan.units["fancy"]
    assert lo < hi and "CONSTANT" in plan.units

    cl = R.closure(mods, ("shopify_db_spark.fakeplan", "fancy"))
    assert ("shopify_db_spark.fakeops", "helper") in cl  # local import edge
    assert ("shopify_db_spark.fakeplan", "CONSTANT") in cl  # decorator arg
    assert ("shopify_db_spark.fakeops", "deco") in cl
    cl2 = R.closure(mods, ("shopify_db_spark.fakeplan", "plain"))
    assert ("shopify_db_spark.fakeops", "CONST") in cl2  # plain-import attr

    # a top-level import alone must NOT create unit-level edges:
    # plain does not reach helper
    assert ("shopify_db_spark.fakeops", "helper") not in cl2


def test_changed_units_maps_lines_and_skips_comments(modules):
    """Line→unit mapping on a real module: a line inside
    session_artifact maps to that unit; a comment-only line between
    units is ignored (the q162-append lesson); a code line outside
    any unit falls back to the module pseudo-unit."""
    import os

    info = modules["shopify_db_spark.plans.artifacts"]
    path = os.path.join(R.REPO, info.path)
    text = open(path).read().splitlines()

    lo, hi = info.units["session_artifact"]
    got = R.changed_units(modules, {info.path: {lo + 1}})
    assert ("shopify_db_spark.plans.artifacts", "session_artifact") in got

    # find a comment-only line outside every unit span
    spans = sorted(info.units.values())
    comment_ln = next(
        i + 1
        for i, line in enumerate(text)
        if line.strip().startswith("#")
        and not any(a <= i + 1 <= b for a, b in spans)
    )
    got = R.changed_units(modules, {info.path: {comment_ln}})
    assert got == set(), got
