"""Computed-column projections.

Reference capabilities: O5 (narrow projection + alias, inside the
flagship SQL at /root/reference/spark_process_script.py:37) and O8
(literal stamps — see `scans.project_lit`). Generalized to arithmetic
expressions.

Scale notes: projections are narrow (no shuffle) and fold into the
scan stage under whole-stage codegen; column pruning means unused
source columns never leave the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crime_data_batch_processing_spark.registry import query
from crime_data_batch_processing_spark.sources.tables import load_table


@query(
    "project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
           l_quantity * 2.0 + 1.0 AS qty_scaled
    FROM lineitem
    """,
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level arithmetic with aliasing (O5 generalized).

    Per-row IEEE double arithmetic is deterministic and identical
    across engines (unlike double *aggregation*, which needs the
    decimal trick — functions/exact.py).
    """
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charged"),
        (F.col("l_quantity") * 2.0 + 1.0).alias("qty_scaled"),
    )
