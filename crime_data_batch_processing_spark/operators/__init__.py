"""Operator modules — importing this package registers every query."""

from crime_data_batch_processing_spark.operators import (  # noqa: F401
    aggregates,
    chunking,
    filters,
    joins,
    llm_dedup,
    multimodal,
    pipeline,
    projections,
    reshape,
    scale_patterns,
    scans,
    setops,
    similarity,
    sinks,
    sorts,
    subqueries,
    text_analysis,
    time_windows,
    udfs,
    windows,
)
