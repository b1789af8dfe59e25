"""Oracle resource stress: run every catalog oracle on DuckDB alone
under a constrained memory_limit and report wall time + failures.

Why: the oracles are specs, but the external driver EXECUTES them —
an oracle that needs tens of GB is a gate liability even when the
Spark side is perfect. Round 11's full-catalog sf0.1 sweep caught
exactly this class: q138's MMR round chain re-inlined its spliced
IVF candidate CTEs O(2^K) times (DuckDB inlines plain CTEs once per
reference) and died with an OutOfMemoryException once other
processes held memory. Running under an explicit cap makes the
pressure scenario deterministic instead of depending on what else
the machine is doing.

Usage::

    python scripts/oracle_stress.py [--sf SF_DIR] [--limit 12GB] \
        [--slow 30] [query ...]

Prints one line per oracle that is SLOW (> --slow seconds) or FAILS,
then a JSON summary. Exit code 1 on any failure.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--limit", default="12GB")
    ap.add_argument("--slow", type=float, default=30.0)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import duckdb

    from shopify_db_spark.plans import load_all
    from shopify_db_spark.sources.tables import BENCH_TABLES

    # --limit/--sf reach SQL strings: SET/CREATE VIEW cannot be
    # prepared statements in DuckDB, so validate the limit's shape
    # and quote-escape the parquet path literal (ADVICE r11: a
    # quote in the directory name broke the interpolated DDL).
    if not re.fullmatch(r"\d+(\.\d+)?\s*[KMGT]i?B", args.limit, re.IGNORECASE):
        sys.exit(f"--limit {args.limit!r} is not a size like 12GB")

    specs = load_all()
    names = args.queries or sorted(n for n in specs if specs[n].oracle)
    slow: dict[str, float] = {}
    failed: dict[str, str] = {}
    total = 0.0
    for name in names:
        oracle = specs[name].oracle
        if not oracle:
            continue
        con = duckdb.connect()
        try:
            con.execute(f"SET memory_limit='{args.limit}'")
            for t in BENCH_TABLES:
                # CREATE VIEW cannot be a prepared statement in
                # DuckDB, so escape the path into the literal.
                path = os.path.join(args.sf, t + ".parquet").replace("'", "''")
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
                )
            t0 = time.perf_counter()
            con.execute(oracle).fetchall()
            sec = time.perf_counter() - t0
            total += sec
            if sec > args.slow:
                slow[name] = round(sec, 1)
                print(f"{name:32s} SLOW {sec:8.1f}s", flush=True)
        except Exception as exc:  # noqa: BLE001 - report and continue
            failed[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"{name:32s} FAIL {failed[name]}", flush=True)
        finally:
            con.close()
    print(
        json.dumps(
            {
                "n": len(names),
                "limit": args.limit,
                "total_sec": round(total, 1),
                "slow": slow,
                "failed": failed,
            }
        )
    )
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
