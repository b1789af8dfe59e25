"""The Spark 4 Python Data Source for Shopify ingest: date-sliced
partitions, server-side-window emulation in fixture mode, and
end-to-end equivalence with the batch ingest path."""

from __future__ import annotations

import pytest

from shopify_db_spark.sources.spark_datasource import (
    DateSlice,
    ShopifyDataSource,
    _date_slices,
)


def test_date_slices_cover_and_partition():
    slices = _date_slices("2024-01-01", "2024-01-11", 3)
    assert slices[0].start == "2024-01-01"
    assert slices[-1].end == "2024-01-11"
    # contiguous, non-overlapping
    for a, b in zip(slices, slices[1:]):
        assert a.end == b.start
    # more partitions than days clamps to day count
    assert len(_date_slices("2024-01-01", "2024-01-03", 16)) == 2
    assert len(_date_slices("2024-01-01", "2024-01-01", 4)) == 1


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    from tests.test_ingest import fixtures_to_raw_json

    d = tmp_path_factory.mktemp("dsrc")
    fixtures_to_raw_json(d)
    return str(d)


def test_datasource_reads_all_orders(spark, fixture_dir):
    import json

    from shopify_db_spark.sources import json_ingest as ji

    spark.dataSource.register(ShopifyDataSource)
    raw = (
        spark.read.format("shopify")
        .option("entity", "orders")
        .option("fixture_dir", fixture_dir)
        .option("created_at_min", "2024-01-01")
        .option("created_at_max", "2024-02-01")
        .option("num_partitions", "4")
        .load()
    )
    assert raw.rdd.getNumPartitions() == 4
    with open(f"{fixture_dir}/orders.jsonl") as fh:
        expected_ids = {json.loads(l)["id"] for l in fh}
    got_ids = {json.loads(r["value"])["id"] for r in raw.collect()}
    assert got_ids == expected_ids

    # the raw strings flow through the SAME normalize path as files
    orders = ji.normalize_orders(ji.parse_raw(spark, raw.rdd.map(lambda r: r["value"]).collect(), ji.RAW_ORDER))
    assert orders.count() == len(expected_ids)


def test_datasource_window_prunes(spark, fixture_dir):
    spark.dataSource.register(ShopifyDataSource)
    narrow = (
        spark.read.format("shopify")
        .option("entity", "orders")
        .option("fixture_dir", fixture_dir)
        .option("created_at_min", "2024-01-05")
        .option("created_at_max", "2024-01-06")
        .option("num_partitions", "2")
        .load()
    )
    import json

    rows = [json.loads(r["value"]) for r in narrow.collect()]
    assert rows, "expected at least one order on 2024-01-05"
    assert all(r["created_at"][:10] == "2024-01-05" for r in rows)
