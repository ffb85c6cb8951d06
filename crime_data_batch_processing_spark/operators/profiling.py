"""Data-profiling operators: one-pass column statistics.

The first thing run against any newly-landed 100 TB table is a
profile — null rates, cardinalities, value ranges per column — both
for data-quality gates and for the planner-facing statistics that
drive join ordering/broadcast decisions (the reference's pipeline has
no profiling step at all; its single query trusts the Glue-crawled
schema blindly, /root/reference/spark_ingest_script.py:87-105).

The operator's whole point is the SCAN COUNT: a naive profiler runs
one query per column per statistic (the oracle's UNION ALL shape —
5 scans here, 5N at N columns); this one computes every statistic for
every column in ONE scan with map-side partial aggregation, then
unpivots the single aggregated row driver-free. At 100 TB the exact
`COUNT(DISTINCT)` columns are the scaling caveat: each adds an Expand
replica of the scan into the distinct-aggregate shuffle, so wide
tables swap them for `approx_count_distinct` (the `agg_approx_distinct`
pattern) and keep everything else unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crime_data_batch_processing_spark.registry import query
from crime_data_batch_processing_spark.sources.tables import load_table

#: (column, SQL expression rendering the value as a cross-engine-exact
#: string). Doubles in this table carry exactly 2 decimal digits, so
#: DECIMAL(12,2) renders identically in Spark and DuckDB; dates render
#: ISO in both.
_PROFILE_COLS = [
    ("l_quantity", "CAST(CAST({v} AS DECIMAL(12,2)) AS VARCHAR)"),
    ("l_extendedprice", "CAST(CAST({v} AS DECIMAL(12,2)) AS VARCHAR)"),
    ("l_discount", "CAST(CAST({v} AS DECIMAL(12,2)) AS VARCHAR)"),
    ("l_shipdate", "CAST({v} AS VARCHAR)"),
    ("l_returnflag", "{v}"),
]

_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{c}' AS col_name,
           COUNT(*) - COUNT({c}) AS n_nulls,
           COUNT(DISTINCT {c}) AS n_distinct,
           {render.format(v=f"MIN({c})")} AS min_v,
           {render.format(v=f"MAX({c})")} AS max_v
    FROM lineitem
    """
    for c, render in _PROFILE_COLS
)


@query("profile_stats", oracle=_ORACLE)
def profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass, all-columns table profile (nulls / distincts / range).

    Spark plan: a single hash aggregate over one scan emits ONE row
    holding all 20 statistics (the multiple exact COUNT(DISTINCT)s
    compile to one Expand feeding one distinct-aggregate — still a
    single scan); `stack` then unpivots that row into the per-column
    report without touching the driver. The oracle spells the naive
    per-column UNION ALL — 5 scans — which is exactly the difference
    this operator exists to remove.
    """
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c, render in _PROFILE_COLS:
        # Spark spells the string type STRING, DuckDB VARCHAR; the
        # rendered value is identical.
        spark_render = render.replace("AS VARCHAR", "AS STRING")
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.expr(spark_render.format(v=f"MIN({c})")).alias(f"{c}__min"),
            F.expr(spark_render.format(v=f"MAX({c})")).alias(f"{c}__max"),
        ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c, _ in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_v, max_v)"
        )
    )
