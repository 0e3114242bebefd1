"""Sources & sinks (SURVEY.md §2.1, S1-S7)."""

from kafka_streams_playground_spark.sources.parquet import load_table, load_tables, TABLES

__all__ = ["load_table", "load_tables", "TABLES"]
