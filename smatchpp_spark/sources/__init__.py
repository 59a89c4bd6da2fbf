"""Sources and sinks: corpus parquet/Iceberg-style tables, Penman, TSV."""
