"""Data sources: parquet testdata tables, CSV with explicit schema, JDBC."""

from crime_data_batch_processing_spark.sources.tables import TABLES, load_table

__all__ = ["TABLES", "load_table"]
