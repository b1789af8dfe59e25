"""Sources & sinks: parquet table catalog, CSV interchange, Shopify
REST ingest client, raw-JSON normalization."""
