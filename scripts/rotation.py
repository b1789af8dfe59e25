"""Print the computed driver-rotation head for __spark_entry__.py.

Usage::

    python scripts/rotation.py [--json] [--must q20_x,q93_y] [--n 60]

Output: a ready-to-paste Python list — current-round plan-affected
queries first (the lint-enforced set), then ``--must`` pins (e.g. a
verdict's prescribed re-certs), then the computed stale set and the
oldest-evidence freshness tail, truncated to ``--n`` entries (the
driver samples the first 50).

See ``shopify_db_spark/rotation.py`` for the model; run this AFTER
the round's last plan change and regenerate ``_NEVER_DRIVER_SAMPLED``
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
            affected = R.affected_queries(R.changed_units(modules, lines), modules)
    stale = R.stale_queries(modules) or {}
    must = [q for q in args.must.split(",") if q]
    rounds = R.evidence_rounds()
    from shopify_db_spark.plans import load_all

    stale_sorted = sorted(stale, key=lambda q: (stale[q], q))
    tail = sorted(
        (q for q in load_all() if q not in stale),
        key=lambda q: (rounds.get(q, 0), q),
    )
    ordered: list[str] = []
    for q in affected + must + stale_sorted + tail:
        if q not in ordered:
            ordered.append(q)
    ordered = ordered[: args.n]

    if args.json:
        print(json.dumps({"base": base, "affected": affected, "head": ordered}))
        return
    print(f"# computed by scripts/rotation.py (base {base}; "
          f"{len(affected)} plan-affected this round)")
    print("_NEVER_DRIVER_SAMPLED = [")
    for q in ordered:
        why = ("round-affected" if q in affected
               else "pinned" if q in must
               else f"stale since r{stale[q]}" if q in stale
               else f"evidence r{rounds.get(q, 0)}")
        print(f'    "{q}",  # {why}')
    print("]")


if __name__ == "__main__":
    main()
