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
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet's `ts` physical type has varied across testdata
    generations — TIMESTAMP(NANOS) (which Spark's parquet reader
    rejects outright, [PARQUET_TYPE_ILLEGAL] — Spark timestamps are
    microsecond precision) and plain TIMESTAMP(MICROS). Adapt to
    whatever is on disk instead of assuming one generation:

    * int64 after `nanosAsLong` (i.e. NANOS on disk): truncate to µs.
      Truncation (`div 1000`) matches DuckDB's `epoch_us()` on the
      same values exactly (verified empirically), so oracle
      comparisons on derived timestamps agree.
    * TIMESTAMP_NTZ (MICROS, isAdjustedToUTC=false): cast to
      session-zoned TIMESTAMP. The session is pinned to UTC
      (session.py), so the instant equals DuckDB's naive reading.
    * TIMESTAMP: already what every downstream operator expects.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    dt = raw.schema["ts"].dataType.simpleString()
    if dt == "bigint":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt == "timestamp_ntz":
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL-facing operators."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
