"""Simulate the correctness driver's gate locally.

Builds a BARE SparkSession — deliberately *without* the engine's
session.py confs (no UTC pin, no ANSI override, no nanosAsLong) —
exactly the way the driver constructs its own session, then runs
every ``__spark_entry__.queries()`` entry at sf0.01 against its
DuckDB oracle with the same canonical compare the driver applies.

Usage: python scripts/gate_sim.py [--out FILE] [--reverse] [sf_dir]
[query ...]

``--reverse`` runs the catalog in reverse-alphabetical order — an
order-dependence probe: a query that only passes because an earlier
query registered a temp view or warmed a session memo hash-mismatches
(or errors) here.

``--out FILE`` additionally writes the per-query lines + summary
JSON straight to FILE — the committed ``GATE_r{N}.txt`` artifact
must come from here, not from a captured stdout tail (round 6's
gate file lost 6 per-query lines to terminal truncation)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        if i + 1 >= len(args):
            sys.exit(
                "usage: gate_sim.py [--out FILE] [sf_dir] [query ...] "
                "(--out requires a FILE argument)"
            )
        out_path = args[i + 1]
        del args[i : i + 2]
    reverse = "--reverse" in args
    if reverse:
        args.remove("--reverse")
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"

    import __spark_entry__ as entrymod
    from shopify_db_spark.testing import compare_frames, duckdb_con

    spark = (
        SparkSession.builder.appName("gate_sim")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args or sorted(queries, reverse=reverse)

    results: dict[str, dict] = {}
    n_green = n_weak = n_bad = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            spark_pdf = queries[name](spark, sf_dir).toPandas()
            # Driver-parity canonicalizer probe: the external driver
            # sorts RAW columns with pandas, which throws on
            # unhashable cells (ndarray — q34 round 1, q104 round 7).
            # Our compare_frames tuples-izes arrays first, so without
            # this probe the divergence is invisible locally.
            spark_pdf.sort_values(by=sorted(spark_pdf.columns))
            if name in oracles:
                with duckdb_con(sf_dir) as con:
                    oracle_pdf = con.execute(oracles[name]).df()
                problems = compare_frames(spark_pdf, oracle_pdf)
                ok = not problems
                results[name] = {
                    "rows": len(spark_pdf),
                    "oracle_rows": len(oracle_pdf),
                    "ok": ok,
                    "problems": problems[:3],
                }
                n_green += ok
                n_bad += not ok
            else:
                results[name] = {"rows": len(spark_pdf), "ok": "rows_only"}
                n_weak += 1
        except Exception as exc:  # noqa: BLE001
            results[name] = {"ok": False, "err": f"{type(exc).__name__}: {exc}"[:300]}
            n_bad += 1
        results[name]["sec"] = round(time.perf_counter() - t0, 2)
        tag = results[name]["ok"]
        print(f"{name:32s} {str(tag):10s} {results[name]['sec']:7.2f}s", flush=True)

    summary = json.dumps({"green": n_green, "rows_only": n_weak, "bad": n_bad})
    print(summary)
    if out_path:
        # the committed artifact: every per-query line + the summary,
        # written directly (never via a captured terminal tail)
        with open(out_path, "w") as fh:
            for name in names:
                r = results[name]
                fh.write(
                    f"{name:32s} {str(r['ok']):10s} {r['sec']:7.2f}s\n"
                )
            fh.write(summary + "\n")
    bad = {n: r for n, r in results.items() if r["ok"] is False}
    if bad:
        print(json.dumps(bad, indent=2, default=str))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
