"""JDBC source — the reference's ingest path (O1), fixed for scale.

The reference reads its whole table in ONE task:
`spark.read.jdbc(url, "(SELECT * FROM crime_reported) crime_alias")`
with no partitioning options (/root/reference/spark_ingest_script.py:56-61)
— a single executor pulls every row, the deliberate scalability gap
SURVEY.md §3.2 flags. This reader always partitions the scan.

Exercised end-to-end by the `scan_jdbc` query (operators/scans.py):
Derby ships in Spark's jars and runs embedded in the driver JVM, so
the write → partitioned-read round trip needs no external server and
is oracle-verified like any other scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 32,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel JDBC scan: `num_partitions` tasks, each reading one
    stride of `partition_column` — the fix for the reference's
    single-task read. `table` may be a derived-table subquery
    (`"(SELECT ...) alias"`) to push computation to the RDBMS, same
    trick as spark_ingest_script.py:58.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        # server-side cursoring: avoids materializing the stride in RAM
        .option("fetchsize", "10000")
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
