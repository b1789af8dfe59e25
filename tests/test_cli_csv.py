"""CSV round-trip and the CLI surface end-to-end: offline ingest →
generate → verify → heatmap, all through ``cli.main``."""

from __future__ import annotations

import os

import pytest

from shopify_db_spark.cli import main
from shopify_db_spark.plans.invoice import build_invoices
from shopify_db_spark.schemas import INVOICE_CSV_COLUMNS
from shopify_db_spark.sources.csv_io import read_invoice_csv, write_invoice_csv
from tests.commerce_fixtures import build_tables
from tests.test_ingest import fixtures_to_raw_json


def test_csv_roundtrip(spark, tmp_path):
    invoices = build_invoices(build_tables(spark), "2024-01-01", "2024-01-31", 1000)
    out = str(tmp_path / "invoices.csv")
    write_invoice_csv(invoices, out)
    assert os.path.isfile(out)
    with open(out) as fh:
        header = fh.readline().strip()
    assert header == ";".join(INVOICE_CSV_COLUMNS)

    back = read_invoice_csv(spark, out)
    assert back.count() == invoices.count()
    orig = {
        (r["ORDER NO"], r["ORDER LINE - PROD NO"], str(r["PAID AMOUNT"]))
        for r in invoices.collect()
    }
    loaded = {
        (r["ORDER NO"], r["ORDER LINE - PROD NO"], str(r["PAID AMOUNT"]))
        for r in back.collect()
    }
    assert orig == loaded


@pytest.fixture(scope="module")
def cli_data_dir(spark, tmp_path_factory):
    json_dir = tmp_path_factory.mktemp("cli_raw")
    fixtures_to_raw_json(json_dir)
    data_dir = str(tmp_path_factory.mktemp("cli_store"))
    rc = main([
        "--data-dir", data_dir,
        "shopify-update", "--json-dir", str(json_dir),
    ])
    assert rc == 0
    return data_dir


def test_cli_generate_and_verify(cli_data_dir, tmp_path, capsys):
    out = str(tmp_path / "inv.csv")
    rc = main([
        "--data-dir", cli_data_dir,
        "tripletex-generate",
        "--from-date", "2024-01-01", "--to-date", "2024-01-31",
        "--invoice-start-id", "1",
        "--out", out,
        "--gateway", "vipps", "stripe",
        "--rename-gateway", "manual=Manual",
    ])
    assert rc == 0
    assert os.path.isfile(out)
    assert "passed=False" in capsys.readouterr().out  # fixtures trip checks

    rc = main(["--data-dir", cli_data_dir, "tripletex-verify", "--file", out])
    captured = capsys.readouterr().out
    assert "invoice_no: ok" in captured
    assert rc == 1  # verification fails on the engineered fixtures


def test_cli_heatmap(cli_data_dir, tmp_path):
    out = str(tmp_path / "map.html")
    rc = main(["--data-dir", cli_data_dir, "heatmap", "--out", out])
    assert rc == 0
    assert os.path.getsize(out) > 0
