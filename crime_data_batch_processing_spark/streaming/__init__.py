"""Structured Streaming operators (P37)."""

from crime_data_batch_processing_spark.streaming import stream_events  # noqa: F401
