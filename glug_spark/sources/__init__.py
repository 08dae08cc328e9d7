"""Input/output adapters: Iceberg-first table IO with parquet fallback."""
