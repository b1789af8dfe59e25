"""Benchmark harness: runs every declared catalog query at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall time of all queries (each executed to
completion with a cheap count-style action — results are not
collected to the driver, matching how the engine would run at scale).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from shopify_db_spark.plans import load_all
    from shopify_db_spark.session import get_spark

    spark = get_spark(app_name="shopify_db_spark_bench")
    specs = load_all()

    # Warm the JVM/session on the smallest SF so per-query numbers
    # measure the plan, not first-run classloading.
    warm = specs["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")
    warm.count()

    timings: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        # Force full execution of every operator without shipping
        # rows to the driver.
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "catalog_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
