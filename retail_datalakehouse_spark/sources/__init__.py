"""Sources & sinks (SURVEY §2.1): CSV/Parquet readers, partitioned writers."""
