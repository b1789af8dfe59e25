"""Computed driver-rotation lint (VERDICT r11 item 1).

The q20 miss: round 11 moved q20 to the invoice-artifact read but
the hand-curated ``_DRIVER_SAMPLE_HEAD`` head never resurfaced it,
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
    affected = R.affected_queries(R.changed_units(modules, lines, base), modules)
    sampled = list(entrymod.queries())[:DRIVER_SAMPLE]
    if len(affected) <= DRIVER_SAMPLE:
        missing = [q for q in affected if q not in sampled]
        assert not missing, (
            f"plan-changed since {base} but NOT in the driver's "
            f"{DRIVER_SAMPLE}-query sample head: {missing} — regenerate "
            "_DRIVER_SAMPLE_HEAD with scripts/rotation.py"
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
    unknown = [q for q in entrymod._DRIVER_SAMPLE_HEAD if q not in specs]
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


def test_removal_only_hunks_are_flagged(tmp_path):
    """ADVICE r12 (medium): a pure-deletion plan change used to anchor
    on a blank line and vanish under the blank/comment skip. End to
    end in a scratch git repo: delete a whole top-level function and
    a line inside another — changed_lines must encode the removals as
    negated OLD-file lines, and changed_units must map them to the
    base revision's units (module pseudo-unit for the deleted
    function, the enclosing unit for the mid-unit deletion)."""
    import subprocess

    pkg = tmp_path / "shopify_db_spark"
    pkg.mkdir()
    mod = pkg / "fakemod.py"
    old_src = (
        "def keep(x):\n"
        "    a = 1\n"
        "    b = 2\n"
        "    return a + b\n"
        "\n"
        "\n"
        "def doomed(x):\n"
        "    return x * 2\n"
        "\n"
        "\n"
        "def also_keep(x):\n"
        "    return x\n"
    )
    mod.write_text(old_src)
    env = {"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
           "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
           "HOME": str(tmp_path), "PATH": "/usr/bin:/bin:/usr/local/bin"}
    run = lambda *a: subprocess.run(  # noqa: E731
        a, cwd=tmp_path, env=env, capture_output=True, text=True, check=True
    )
    run("git", "init", "-q")
    run("git", "add", "-A")
    run("git", "commit", "-qm", "base")

    # delete the WHOLE of doomed (plus its surrounding blank lines)
    # and one line INSIDE keep — a pure-deletion diff, nothing added
    new_src = (
        "def keep(x):\n"
        "    a = 1\n"
        "    return a + b\n"
        "\n"
        "\n"
        "def also_keep(x):\n"
        "    return x\n"
    )
    mod.write_text(new_src)

    lines = R.changed_lines("HEAD", repo=str(tmp_path))
    assert lines is not None
    nums = lines["shopify_db_spark/fakemod.py"]
    assert nums and all(n < 0 for n in nums), nums  # removal-only diff

    new_info = R._collect_module("shopify_db_spark/fakemod.py", new_src)
    got = R.changed_units(
        {new_info.name: new_info}, lines, base="HEAD", repo=str(tmp_path)
    )
    # deleted unit -> module pseudo-unit (its dependents' closures
    # hold the pseudo-unit; no surviving sibling would flag them)
    assert ("shopify_db_spark.fakemod", None) in got, got
    # mid-unit deletion -> the enclosing (surviving) unit
    assert ("shopify_db_spark.fakemod", "keep") in got, got
    # untouched sibling must NOT be dragged in at unit precision
    assert ("shopify_db_spark.fakemod", "also_keep") not in got, got

    # without a resolvable base the fallback is the conservative
    # module pseudo-unit, never a silent skip
    got_nobase = R.changed_units({new_info.name: new_info}, lines)
    assert ("shopify_db_spark.fakemod", None) in got_nobase


def test_adjudicated_latest_round_grace(tmp_path):
    """VERDICT r13 item 1: a CORRECTNESS_r{N}.json landing in the
    worktree BEFORE the round-N verdict commit must not advance the
    evidence view the floor lints see. In a scratch repo: evidence
    files for r5 and r6, a verdict commit for r5 only —
    adjudicated_latest_round is 5, evidence_rounds(max_round=5)
    ignores the r6 rows, and once the r6 verdict commit lands the
    cap advances to 6."""
    import json as _json
    import subprocess

    env = {"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
           "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
           "HOME": str(tmp_path), "PATH": "/usr/bin:/bin:/usr/local/bin"}
    run = lambda *a: subprocess.run(  # noqa: E731
        a, cwd=tmp_path, env=env, capture_output=True, text=True, check=True
    )
    run("git", "init", "-q")
    row = {"rows_match": True, "schema_match": True,
           "hash_match": True, "err": None}
    (tmp_path / "CORRECTNESS_r5.json").write_text(
        _json.dumps({"qA": row, "qB": row})
    )
    run("git", "add", "-A")
    run("git", "commit", "-qm", "round 5: verdict/advice")

    # r6 artifact lands, no r6 verdict commit yet (judge-time state)
    (tmp_path / "CORRECTNESS_r6.json").write_text(_json.dumps({"qA": row}))
    repo = str(tmp_path)
    assert R.adjudicated_latest_round(repo) == 5
    capped = R.evidence_rounds(repo, max_round=5)
    assert capped == {"qA": 5, "qB": 5}
    uncapped = R.evidence_rounds(repo)
    assert uncapped["qA"] == 6  # the cap is what hides it, not a bug

    run("git", "add", "-A")
    run("git", "commit", "-qm", "round 6: verdict/advice")
    assert R.adjudicated_latest_round(repo) == 6


def _mandatory_queries(modules, max_round=None):
    """affected-this-round ∪ stale — the entries the main lint forces
    into the head; they outrank the freshness floor. ``max_round``
    pins the evidence view to the last adjudicated round (VERDICT r13
    item 1) so a driver artifact landing pre-verdict-commit doesn't
    shift the mandatory set under the floor lints."""
    mandatory = set(R.stale_queries(modules, max_round=max_round))
    base = R.round_base()
    if base is not None:
        lines = R.changed_lines(base)
        if lines is not None:
            mandatory |= set(
                R.affected_queries(R.changed_units(modules, lines, base), modules)
            )
    return mandatory


def test_freshness_floor_no_overdue_outside_head(modules):
    """VERDICT r12 item 2: --must pins must never starve the
    oldest-evidence tail. Any query whose newest driver evidence is
    >= MAX_EVIDENCE_AGE rounds old must sit inside the sampled head,
    unless the head is genuinely full of higher-priority entries
    (plan-affected / stale — which the main lint forces in; pins do
    NOT excuse).

    Evidence view is capped at the last ADJUDICATED round (one whose
    ``round N: verdict`` commit resolves) so the lint stays green in
    the judge-time state where ``CORRECTNESS_r{N}.json`` has landed
    in the worktree but the head regeneration that follows it hasn't
    happened yet (VERDICT r13 item 1 / ADVICE r13 — mirrors
    ``stale_queries``' skip tolerance)."""
    latest = R.adjudicated_latest_round()
    if latest is None:
        pytest.skip("no adjudicated driver evidence yet")
    from shopify_db_spark.plans import load_all

    MAX_EVIDENCE_AGE = 4
    rounds = R.evidence_rounds(max_round=latest)
    overdue = sorted(
        (q for q in load_all() if latest - rounds.get(q, 0) >= MAX_EVIDENCE_AGE),
        key=lambda q: (rounds.get(q, 0), q),
    )
    if not overdue:
        return
    sampled = set(list(entrymod.queries())[:DRIVER_SAMPLE])
    mandatory = _mandatory_queries(modules, max_round=latest)
    free = max(0, DRIVER_SAMPLE - len(mandatory - set(overdue)))
    missing = [q for q in overdue if q not in sampled]
    allowed = max(0, len(overdue) - free)
    assert len(missing) <= allowed, (
        f"queries with driver evidence >= {MAX_EVIDENCE_AGE} rounds old "
        f"(latest round r{latest}) outside the {DRIVER_SAMPLE}-query "
        f"sample head despite free slots: {missing} — regenerate "
        "_DRIVER_SAMPLE_HEAD with scripts/rotation.py (the floor "
        "reserves slots ahead of --must pins)"
    )


def test_freshness_floor_reserve_slots(modules):
    """The FLOOR_K globally-oldest non-mandatory queries must occupy
    sample-head slots whenever slack exists — keeps the evidence tail
    rotating every round even when nothing is formally overdue."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "rotation_cli", os.path.join(R.REPO, "scripts", "rotation.py")
    )
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    from shopify_db_spark.plans import load_all

    cap = R.adjudicated_latest_round()
    rounds = R.evidence_rounds(max_round=cap)
    mandatory = _mandatory_queries(modules, max_round=cap)
    oldest = sorted(
        (q for q in load_all() if q not in mandatory),
        key=lambda q: (rounds.get(q, 0), q),
    )
    k = min(cli.FLOOR_K, max(0, DRIVER_SAMPLE - len(mandatory)), len(oldest))
    sampled = set(list(entrymod.queries())[:DRIVER_SAMPLE])
    starved = [q for q in oldest[:k] if q not in sampled]
    assert not starved, (
        f"freshness-floor reserve violated: the {k} oldest-evidence "
        f"queries must be sampled, missing {starved} — regenerate "
        "_DRIVER_SAMPLE_HEAD with scripts/rotation.py"
    )
