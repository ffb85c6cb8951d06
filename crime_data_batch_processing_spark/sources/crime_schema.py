"""The reference's source-table schema and flagship pipeline, natively.

The reference's single source of truth is one MySQL table
`crime_reported` with 22 columns (/root/reference/create&Load.sql:8-11)
loaded from a quoted, headered CSV (create&Load.sql:15), then snapshot
to Parquet via JDBC (/root/reference/spark_ingest_script.py:56-95) and
queried once (/root/reference/spark_process_script.py:37).

Two schemas are provided:

* RAW — byte-compatible with the reference: booleans as 'True'/'False'
  strings, timestamps as 'MM/dd/yyyy hh:mm:ss a' strings, exactly as
  the JDBC type mapping delivered them (SURVEY.md §1.2).
* TYPED — the repaired model a native engine should use: real
  BooleanType / TimestampType, derived partition columns computed as
  Spark expressions instead of driver-side strftime
  (spark_ingest_script.py:46,67-69 did this in Python).

`repair()` maps RAW → TYPED; `flagship_query()` reproduces the
reference's one query on either model, documenting the equivalence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Chicago open-data timestamp format used by date_value / updated_on.
CRIME_TS_FMT = "MM/dd/yyyy hh:mm:ss a"

#: RAW schema — exactly what the reference's JDBC read yields
#: (create&Load.sql:8-11 through the MySQL connector type mapping).
CRIME_RAW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("case_number", T.StringType(), False),
        T.StructField("date_value", T.StringType()),
        T.StructField("block_value", T.StringType()),
        T.StructField("iucr", T.StringType()),
        T.StructField("primary_type", T.StringType()),
        T.StructField("description_value", T.StringType()),
        T.StructField("local_description", T.StringType()),
        T.StructField("arrest", T.StringType()),
        T.StructField("domestic", T.StringType()),
        T.StructField("beat", T.StringType()),
        T.StructField("district", T.StringType()),
        T.StructField("ward", T.IntegerType()),
        T.StructField("community_area", T.StringType()),
        T.StructField("fbi_code", T.StringType()),
        T.StructField("x_coordinate", T.IntegerType()),
        T.StructField("y_coordinate", T.IntegerType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("updated_on", T.StringType()),
        T.StructField("latitude", T.DecimalType(11, 9)),
        T.StructField("longitude", T.DecimalType(11, 9)),
        T.StructField("location", T.StringType()),
    ]
)


def read_crime_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV load with the reference's exact semantics (create&Load.sql:15):
    header row skipped, comma-delimited, double-quote enclosed, explicit
    schema (never inferSchema — it costs a full extra pass at scale).
    """
    return spark.read.csv(path, header=True, quote='"', schema=CRIME_RAW_SCHEMA)


def repair(raw: DataFrame) -> DataFrame:
    """RAW → TYPED: the semantic repairs SURVEY.md §1.2 calls for.

    * arrest/domestic: 'True'/'False' strings → BooleanType. The
      reference's filter `arrest='False'` is case-sensitive string
      equality that silently drops NULL and case-variant rows; the
      boolean model makes that explicit (`~arrest`, NULL-safe).
    * date_value/updated_on: parsed with the Chicago open-data format.
    """
    to_bool = lambda c: F.when(F.col(c) == "True", F.lit(True)).when(  # noqa: E731
        F.col(c) == "False", F.lit(False)
    )
    return (
        raw.withColumn("arrest", to_bool("arrest"))
        .withColumn("domestic", to_bool("domestic"))
        .withColumn("date_value", F.to_timestamp("date_value", CRIME_TS_FMT))
        .withColumn("updated_on", F.to_timestamp("updated_on", CRIME_TS_FMT))
    )


def stamp_partitions(df: DataFrame, exec_date: str) -> DataFrame:
    """Add the reference's y/m/d string partition stamps (O8).

    The reference computes these driver-side with strftime '%-m'/'%-d'
    — non-zero-padded strings (spark_ingest_script.py:66-70). Done
    here as Spark expressions on a literal date so the formatting is
    engine-side and cluster-deterministic; CAST(int AS STRING) gives
    the same non-padded form.
    """
    d = F.lit(exec_date).cast("date")
    return (
        df.withColumn("y", F.year(d).cast("string"))
        .withColumn("m", F.month(d).cast("string"))
        .withColumn("d", F.dayofmonth(d).cast("string"))
    )


def flagship_query(crimes: DataFrame, typed: bool = False) -> DataFrame:
    """The reference's one query (spark_process_script.py:37):

        SELECT primary_type, count(primary_type) AS crime_count
        FROM crimes WHERE arrest='False' GROUP BY primary_type

    COUNT(col) null-skipping semantics preserved. With ``typed=True``
    the filter is the boolean-model equivalent `arrest = FALSE`
    (NULL arrests excluded either way — documented equivalence).
    """
    pred: Column = (~F.col("arrest")) if typed else (F.col("arrest") == "False")
    return (
        crimes.filter(pred)
        .groupBy("primary_type")
        .agg(F.count("primary_type").alias("crime_count"))
    )
