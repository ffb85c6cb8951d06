"""Parquet table loader for the engine's star schema.

The reference reads its one table through JDBC
(/root/reference/spark_ingest_script.py:56-61) and re-reads snapshots
from a Hive/Glue catalog (/root/reference/spark_process_script.py:37).
This engine's native at-rest format is Parquet — vectorized columnar
scan, predicate pushdown, column pruning and partition pruning all come
free from the DataSource V2 path; at 100 TB the scan is the dominant
cost and Parquet + pushdown is what keeps it proportional to the data
actually needed, not the data stored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Lazy — nothing executes until an action."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL-facing operators."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
