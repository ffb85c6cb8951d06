"""Operator modules — importing this package registers every query."""

from crime_data_batch_processing_spark.operators import (  # noqa: F401
    aggregates,
    filters,
    joins,
    projections,
    scans,
    setops,
    sinks,
    sorts,
    time_windows,
    udfs,
    windows,
)
