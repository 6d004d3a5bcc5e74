"""Source/sink layer — catalog-table-first IO (Iceberg on real clusters,
parquet fallback in this sandbox). See sources/catalog.py."""
