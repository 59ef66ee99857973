"""Sources/sinks: image-table synthesis, resumable partitioned parquet."""
