"""Print the computed driver-rotation head for __spark_entry__.py.

Usage::

    python scripts/rotation.py [--json] [--must q20_x,q93_y] [--n 60]

Output: a ready-to-paste Python list — current-round plan-affected
queries first (the lint-enforced set), then ``--must`` pins (e.g. a
verdict's prescribed re-certs), then the computed stale set and the
oldest-evidence freshness tail, truncated to ``--n`` entries (the
driver samples the first 50).

See ``shopify_db_spark/rotation.py`` for the model; run this AFTER
the round's last plan change and regenerate ``_DRIVER_SAMPLE_HEAD``
from it — ``tests/test_rotation_lint.py`` fails the round if a
plan-changed query is missing from the sampled head.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shopify_db_spark import rotation as R  # noqa: E402

#: sample-head slots reserved for the globally-oldest-evidence
#: queries, ahead of --must pins (tests/test_rotation_lint.py
#: enforces the matching floor)
FLOOR_K = 10


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--must", default="", help="comma-separated pins")
    ap.add_argument("--n", type=int, default=60)
    args = ap.parse_args()

    modules = R.load_package()
    base = R.round_base()
    affected: list[str] = []
    if base:
        lines = R.changed_lines(base)
        if lines is not None:
            affected = R.affected_queries(
                R.changed_units(modules, lines, base), modules
            )
    stale = R.stale_queries(modules)
    must = [q for q in args.must.split(",") if q]
    rounds = R.evidence_rounds()
    from shopify_db_spark.plans import load_all

    stale_sorted = sorted(stale, key=lambda q: (stale[q], q))
    tail = sorted(
        (q for q in load_all() if q not in stale),
        key=lambda q: (rounds.get(q, 0), q),
    )
    # Freshness floor (VERDICT r12 item 2): the r12 truncation showed
    # --must pins can starve the oldest-evidence tail out of the
    # 50-query sample forever (q14). Reserve FLOOR_K tail slots ahead
    # of the pins: affected + stale keep absolute priority (the lint
    # mandates them), then the K oldest-evidence queries, THEN pins.
    mandatory: list[str] = []
    for q in affected + stale_sorted:
        if q not in mandatory:
            mandatory.append(q)
    reserve = [q for q in tail if q not in mandatory][:FLOOR_K]
    absorbed = [q for q in must if q in mandatory or q in reserve]
    ordered: list[str] = []
    for q in mandatory + reserve + must + tail:
        if q not in ordered:
            ordered.append(q)
    ordered = ordered[: args.n]

    if args.json:
        print(json.dumps({
            "base": base, "affected": affected, "stale": stale_sorted,
            "reserve": reserve, "pins": must, "absorbed": absorbed,
            "head": ordered,
        }))
        return
    print(f"# computed by scripts/rotation.py (base {base}; "
          f"{len(affected)} plan-affected this round; "
          f"{len(stale_sorted)} stale; {len(reserve)} freshness-floor; "
          f"{len(must)} pins, {len(absorbed)} absorbed)")
    print("_DRIVER_SAMPLE_HEAD = [")
    for q in ordered:
        why = ("round-affected" if q in affected
               else f"stale since r{stale[q]}" if q in stale
               else f"freshness floor (evidence r{rounds.get(q, 0)})" if q in reserve
               else "pinned" if q in must
               else f"evidence r{rounds.get(q, 0)}")
        print(f'    "{q}",  # {why}')
    print("]")


if __name__ == "__main__":
    main()
