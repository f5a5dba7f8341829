"""Sources/sinks: keyed parquet loading and the TiKV connector boundary."""
