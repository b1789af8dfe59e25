"""×R scale points for q163's PRUNED path (VERDICT r13 item 6).

The catalog q163 runs cap=None (exact vocabulary — the gated
default); the 100 TB story for streaming term stats rests on the
cap+count-min prune bounding carried state under a Zipf long tail.
The real testdata corpus has a ~235-term vocabulary at every scale
factor (replication mutates characters, not the token inventory), so
the prune never bites there; this script scales the SYNTHETIC Zipf
corpus of tests/test_streaming_realism.py — 150 heavy terms with
distinct per-term tf, a tail of n_tail single-occurrence terms — by
growing the tail ×R, then for each factor:

* runs the 3-batch incremental merge with cap=512 and a sketch width
  sized for certification power (2^19 ≫ the ×30 evicted vocabulary);
* records wall time, carried-state rows (must == cap), sparse sketch
  rows, and the count-min bound B;
* asserts the SOUND exactness certificate (ADVICE r13) certifies;
* belt-and-braces: runs the exact (cap=None) merge and asserts the
  two top-100 results are identical.

Usage::

    python scripts/q163_prune_scale.py [--factors 1,10,30] [--cap 512]

Prints one JSON line per factor plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

N_HEAVY = 150
BASE_TAIL = 1850  # the unit-factor tail of the pytest corpus
N_BATCHES = 3


def zipf_corpus(spark: SparkSession, factor: int):
    """The pytest Zipf corpus with the tail grown ×factor, built with
    Spark expressions (no driver-side row lists): heavy term i
    repeats 600−2i times per batch, tail terms once."""
    heavy = (
        spark.range(N_HEAVY * N_BATCHES)
        .select(
            (F.col("id")).alias("doc_id"),
            (F.col("id") % N_BATCHES).alias("batch_no"),
            (F.col("id") / N_BATCHES).cast("long").alias("i"),
        )
        .select(
            "doc_id",
            "batch_no",
            F.trim(
                F.repeat(
                    F.concat(F.format_string("w%05d", F.col("i")), F.lit(" ")),
                    (F.lit(600) - 2 * F.col("i")).cast("int"),
                )
            ).alias("text"),
        )
    )
    n_tail = BASE_TAIL * factor
    tail = (
        spark.range(n_tail * N_BATCHES)
        .select(
            (F.lit(N_HEAVY * N_BATCHES) + F.col("id")).alias("doc_id"),
            (F.col("id") % N_BATCHES).alias("batch_no"),
            F.format_string(
                "t%07d", (F.col("id") / N_BATCHES).cast("long")
            ).alias("text"),
        )
    )
    return heavy.unionByName(tail)


def run_factor(spark: SparkSession, factor: int, cap: int, cms_w: int) -> dict:
    from shopify_db_spark.plans.streamops import (
        _term_stats_certificate,
        _term_stats_evicted_bound,
        _term_stats_merge,
        _term_stats_result,
    )

    docs = zipf_corpus(spark, factor).localCheckpoint()
    empty = "term string, tf long, df long"

    pruned = {
        "stats": spark.createDataFrame([], empty),
        "seen": set(),
        "cap": cap,
        "cms_w": cms_w,
    }
    t0 = time.perf_counter()
    for b in range(N_BATCHES):
        _term_stats_merge(
            spark, pruned, docs.filter(F.col("batch_no") == b), b
        )
    pruned_sec = time.perf_counter() - t0

    kept_rows = pruned["stats"].count()
    cms_rows = pruned["cms"].count() if pruned.get("cms") is not None else 0
    bound = _term_stats_evicted_bound(pruned)
    cert = _term_stats_certificate(spark, pruned)

    exact = {"stats": spark.createDataFrame([], empty), "seen": set(), "cap": None}
    t0 = time.perf_counter()
    for b in range(N_BATCHES):
        _term_stats_merge(
            spark, exact, docs.filter(F.col("batch_no") == b), b
        )
    exact_sec = time.perf_counter() - t0
    exact_rows = exact["stats"].count()

    a = sorted(map(tuple, _term_stats_result(spark, pruned).collect()))
    e = sorted(map(tuple, _term_stats_result(spark, exact).collect()))
    agree = a == e

    row = {
        "factor": factor,
        "vocab": exact_rows,
        "cap": cap,
        "cms_w": cms_w,
        "kept_rows": kept_rows,
        "cms_rows": cms_rows,
        "state_rows": kept_rows + cms_rows,
        "bound_B": bound,
        "certificate_exact": cert["exact"],
        "rank100_tf": cert["rank100_tf"],
        "agrees_with_exact": agree,
        "pruned_sec": round(pruned_sec, 2),
        "exact_sec": round(exact_sec, 2),
    }
    assert kept_rows == cap, row
    assert cert["exact"], row
    assert agree, row
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,10,30")
    ap.add_argument("--cap", type=int, default=512)
    ap.add_argument("--cms-w", type=int, default=1 << 19)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("q163_prune_scale")
        .getOrCreate()
    )
    rows = []
    for factor in (int(x) for x in args.factors.split(",")):
        row = run_factor(spark, factor, args.cap, args.cms_w)
        rows.append(row)
        print(json.dumps(row))
    print(json.dumps({"summary": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
