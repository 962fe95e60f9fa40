"""Sources: parquet/Iceberg table registry, JDBC loader seam, and the
deterministic transcripts derivation used by tests/bench/correctness."""
