"""Scalar function library: string / date / math / conditional (P26-P29).

The reference imports the whole function module but uses only `lit`
(/root/reference/spark_ingest_script.py:10,67-69 — SURVEY.md §2.2).
This module exercises the scalar surface a real workload needs, all
JVM-side `pyspark.sql.functions` — zero Python in the row path, every
expression eligible for whole-stage codegen and (where applicable)
pushdown.

Cross-engine notes baked into the queries:
* CEIL/FLOOR return BIGINT in Spark but DOUBLE in DuckDB → cast.
* Transcendentals (ln, log10) may differ by 1 ulp between libm
  implementations → rounded to 6 decimals on both sides.
* Day-of-week numbering differs across engines → avoided in favor of
  unambiguous parts (year/month/day/quarter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crime_data_batch_processing_spark.registry import query
from crime_data_batch_processing_spark.sources.tables import load_table


@query(
    "string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_type) AS type_upper,
           LOWER(p_brand) AS brand_lower,
           SUBSTRING(p_name, 1, 10) AS name_prefix,
           p_brand || '/' || p_type AS brand_type,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           TRIM(p_name) AS name_trim,
           REPLACE(p_name, ' ', '_') AS name_snake,
           REGEXP_EXTRACT(p_brand, 'Brand#(\\d+)', 1) AS brand_num,
           p_name LIKE '%al%' AS has_al,
           ARRAY_TO_STRING(STRING_SPLIT(p_type, ' '), '|') AS type_words,
           CAST(LEN(STRING_SPLIT(p_type, ' ')) AS BIGINT) AS n_type_words
    FROM part
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substring/concat/length/trim/replace/regexp/like/split."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.trim("p_name").alias("name_trim"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.col("p_name").like("%al%").alias("has_al"),
        # split is still exercised, but the OUTPUT is scalar: the
        # driver's canonicalizer hashes a sorted pandas frame and dies
        # on list cells (CORRECTNESS_r01 err) — join + count carry the
        # same information in hashable form
        F.array_join(F.split("p_type", " "), "|").alias("type_words"),
        F.size(F.split("p_type", " ")).cast("long").alias("n_type_words"),
    )


@query(
    "date_parts",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate) AS o_year,
           EXTRACT(month FROM o_orderdate) AS o_month,
           EXTRACT(day FROM o_orderdate) AS o_day,
           EXTRACT(quarter FROM o_orderdate) AS o_quarter,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
           CAST(o_orderdate AS DATE) + 30 AS plus_30d,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    """,
)
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O13 natively: date parts as ENGINE expressions.

    The reference computes every date value driver-side in Python
    (strftime at /root/reference/spark_ingest_script.py:46,67-69) —
    fine for one literal, impossible for per-row derivation. Here the
    same formatting/extraction runs distributed as Catalyst
    expressions.
    """
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
        F.quarter("o_orderdate").cast("long").alias("o_quarter"),
        # cast to DATE: DuckDB's date_trunc('month') returns DATE while
        # Spark's returns TIMESTAMP — align on the coarser type
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.datediff(F.lit("1998-01-01").cast("date"), d).cast("long").alias("days_to_98"),
        F.date_add(d, 30).alias("plus_30d"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@query(
    "math_funcs",
    oracle="""
    SELECT o_orderkey,
           ABS(o_totalprice - 100000.0) AS dist_100k,
           CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           ROUND(o_totalprice, 1) AS price_round1,
           SQRT(o_totalprice) AS price_sqrt,
           ROUND(LN(o_totalprice), 6) AS price_ln,
           ROUND(LOG10(o_totalprice), 6) AS price_log10,
           o_orderkey % 7 AS key_mod7,
           CAST(SIGN(o_totalprice - 100000.0) AS BIGINT) AS above_100k
    FROM orders
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/ceil/floor/round/sqrt/ln/log10/mod/sign.

    sqrt is IEEE-correctly-rounded (bit-identical everywhere); ln and
    log10 are libm-dependent → rounded to 6 dp on both sides. round
    uses positive values only (negative-half conventions differ).
    """
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.abs(price - 100000.0).alias("dist_100k"),
        F.ceil(price).cast("long").alias("price_ceil"),
        F.floor(price).cast("long").alias("price_floor"),
        F.round(price, 1).alias("price_round1"),
        F.sqrt(price).alias("price_sqrt"),
        F.round(F.log(price), 6).alias("price_ln"),
        F.round(F.log10(price), 6).alias("price_log10"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        # BIGINT on both sides: Spark signum returns DOUBLE, DuckDB
        # sign returns an integer type
        F.signum(price - 100000.0).cast("long").alias("above_100k"),
    )


@query(
    "cond_funcs",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(anonymized)') AS segment,
           GREATEST(c_acctbal, 1000.0) AS bal_floor1k,
           LEAST(c_acctbal, 9000.0) AS bal_cap9k,
           CASE WHEN c_nationkey % 2 = 0 THEN c_acctbal END AS even_nation_bal
    FROM customer
    """,
)
def cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / greatest / least / NULL production."""
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "negative")
        .when(bal < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("(anonymized)")
        ).alias("segment"),
        F.greatest(bal, F.lit(1000.0)).alias("bal_floor1k"),
        F.least(bal, F.lit(9000.0)).alias("bal_cap9k"),
        F.when(F.col("c_nationkey") % 2 == 0, bal).alias("even_nation_bal"),
    )
