"""crime_data_batch_processing_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame / Catalyst / Structured
Streaming) engine providing the query and data-processing capabilities
of the reference `yavula/Crime-Data-Batch-Processing` (a Spark-2.4-era
EMR/Glue ETL pipeline — see SURVEY.md), generalized to a full
relational operator surface plus LLM-data-pipeline operators
(deduplication, similarity search, multimodal columns, text analysis),
every operator designed for 100 TB scale.

Layout:
    session.py    SparkSession factory (AQE on, UTC, Arrow)
    registry.py   query/oracle registry powering __spark_entry__.py
    sources/      parquet/CSV/JDBC readers + the reference crime schema
    operators/    relational + LLM-pipeline operators (one module per area)
    functions/    scalar/array/map function-library queries
    streaming/    Structured Streaming operators
    plans/        plan-inspection helpers (explain capture, plan asserts)
"""

from crime_data_batch_processing_spark.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
__version__ = "0.1.0"
