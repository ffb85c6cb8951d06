"""Structured Streaming operators (P37)."""

from crime_data_batch_processing_spark.streaming import (  # noqa: F401
    stateful,
    stream_events,
)
