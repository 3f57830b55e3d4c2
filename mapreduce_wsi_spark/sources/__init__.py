"""Sources & sinks: files (text/csv/parquet/json) and JDBC edges."""
