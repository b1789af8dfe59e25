"""Connected components + two-phase NTILE unit tests (multi-hop
transitivity is the property the q50 oracle checks end-to-end)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from shopify_db_spark.operators.graph import connected_components, dup_clusters
from shopify_db_spark.operators.numbering import global_ntile


def test_chain_and_islands(spark):
    # 1-2-3-4 chain (diameter 3), 10-11 pair, 20-21-22 triangle.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["src", "dst"],
    )
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_long_chain_converges(spark):
    n = 40  # diameter 39 — worst case for min-propagation
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], ["src", "dst"])
    comp = connected_components(edges, max_iter=n + 1).collect()
    assert {r.component for r in comp} == {0}
    assert len(comp) == n + 1


def test_max_iter_raises(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(10)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(edges, max_iter=2)


def test_dup_clusters_keeper(spark):
    pairs = spark.createDataFrame(
        [(5, 9), (9, 7), (2, 3)], ["doc_a", "doc_b"]
    )
    rows = {r.doc_id: r for r in dup_clusters(pairs).collect()}
    assert rows[5].cluster_id == 5 and rows[5].keep
    assert rows[9].cluster_id == 5 and not rows[9].keep
    assert rows[7].cluster_size == 3
    assert rows[2].keep and not rows[3].keep


@pytest.mark.parametrize("n,k", [(500, 10), (7, 3), (10, 10), (3, 5), (101, 4)])
def test_global_ntile_matches_window_ntile(spark, n, k):
    df = spark.range(n).withColumn(
        "v", (F.col("id") * 2654435761) % 1000
    )
    got = global_ntile(df, ["v", "id"], k, col_name="t", num_partitions=4)
    want = df.withColumn("t", F.ntile(k).over(Window.orderBy("v", "id")))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
