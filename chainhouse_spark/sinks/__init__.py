"""Sinks: parquet-native at-rest layout and the ClickHouse DDL/JDBC path."""
