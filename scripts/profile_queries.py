"""Round-14 optimization profiler: per-query breakdown of
plan-construction time (driver-side fn() call: py4j + analysis) vs
execution time (noop sink, best of N), plus `.explain("formatted")`
capture into plans/r14/.

Usage:
    python scripts/profile_queries.py [--plans-out DIR] [--runs N] q63_csv_roundtrip q102_...
    python scripts/profile_queries.py --all            # whole catalog, no plans
    python scripts/profile_queries.py --top 15         # slowest 15 per committed BENCH_local.json

Prints one JSON line per query: {"q": name, "plan_s": ..., "exec_s": [..], "best": ...}
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plans-out", default="")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from shopify_db_spark.plans import load_all
    from shopify_db_spark.session import get_spark

    spark = get_spark(app_name="profile_queries")
    specs = load_all()

    names = list(args.names)
    if args.all:
        names = sorted(specs)
    elif args.top:
        ref = json.load(open(os.path.join(REPO, "BENCH_local.json")))
        qs = {n: t for n, t in ref["queries"].items() if n in specs}
        names = [n for n, _ in sorted(qs.items(), key=lambda kv: -kv[1])[: args.top]]
    unknown = [n for n in names if n not in specs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # warm codegen/JIT at the smallest SF, like bench.py
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf):
        for n in names:
            try:
                specs[n].fn(spark, warm_sf).write.format("noop").mode("overwrite").save()
            except Exception:
                pass
    spark.catalog.clearCache()

    results = []
    for n in names:
        spark.sparkContext.setJobDescription(f"profile:{n}")
        plan_s = None
        execs = []
        df = None
        try:
            t0 = time.perf_counter()
            df = specs[n].fn(spark, args.sf_dir)
            plan_s = time.perf_counter() - t0
            if args.plans_out:
                os.makedirs(args.plans_out, exist_ok=True)
                with open(os.path.join(args.plans_out, f"{n}_{args.suffix}.txt"), "w") as fh:
                    fh.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            execs.append(time.perf_counter() - t1)
            for _ in range(args.runs - 1):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                d2 = specs[n].fn(spark, args.sf_dir)
                d2.write.format("noop").mode("overwrite").save()
                execs.append(time.perf_counter() - t0)
                del d2
        except Exception as exc:  # noqa: BLE001
            results.append({"q": n, "error": f"{type(exc).__name__}: {exc}"[:300]})
            print(json.dumps(results[-1]), flush=True)
            continue
        finally:
            spark.catalog.clearCache()
            del df
            gc.collect()
        rec = {
            "q": n,
            "plan_s": round(plan_s, 3),
            "exec_s": [round(e, 3) for e in execs],
            "best_total": round(min(execs[1:] or execs) if len(execs) > 1 else execs[0], 3),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    total_plan = sum(r.get("plan_s", 0) or 0 for r in results)
    print(json.dumps({"n": len(results), "sum_plan_s": round(total_plan, 2)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
