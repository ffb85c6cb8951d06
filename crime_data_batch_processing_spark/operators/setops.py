"""Set operators: UNION [ALL], INTERSECT, EXCEPT, exact dedup.

Absent from the reference (SURVEY.md §2.2 — no set operations).

Scale notes: UNION ALL is free (plan concatenation, no shuffle);
UNION DISTINCT / INTERSECT / EXCEPT each cost a shuffle on the full
row — at 100 TB prefer pre-aggregated or key-only forms (as below:
project to the key columns first, then set-op). `dedup_exact` is the
groupBy-idiom dedup, the first rung of the dedup ladder that
operators/dedup.py extends to fuzzy matching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crime_data_batch_processing_spark.registry import query
from crime_data_batch_processing_spark.sources.tables import load_table


@query(
    "set_union",
    oracle="""
    SELECT nkey, 'all' AS src FROM (
        SELECT c_nationkey AS nkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nkey FROM supplier
    )
    UNION ALL
    SELECT nkey, 'distinct' AS src FROM (
        SELECT c_nationkey AS nkey FROM customer
        UNION
        SELECT s_nationkey AS nkey FROM supplier
    )
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (concat) and UNION (distinct) side by side."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nkey")
    )
    union_all = cust.unionByName(supp).withColumn("src", F.lit("all"))
    union_distinct = (
        cust.unionByName(supp).distinct().withColumn("src", F.lit("distinct"))
    )
    return union_all.unionByName(union_distinct)


@query(
    "set_intersect_except",
    oracle="""
    SELECT nkey, 'both' AS tag FROM (
        SELECT c_nationkey AS nkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nkey FROM supplier
    )
    UNION ALL
    SELECT nkey, 'cust_only' AS tag FROM (
        SELECT c_nationkey AS nkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nkey FROM supplier
    )
    """,
)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT and EXCEPT (both distinct forms), tagged and unioned."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nkey")
    )
    both = cust.intersect(supp).withColumn("tag", F.lit("both"))
    # subtract == ANSI EXCEPT (distinct): a value present on BOTH sides
    # disappears entirely. (exceptAll().distinct() would instead keep
    # values whose left multiplicity merely exceeds the right's.)
    cust_only = cust.subtract(supp).withColumn("tag", F.lit("cust_only"))
    return both.unionByName(cust_only)


@query(
    "dedup_exact",
    oracle="""
    SELECT doc_id, text, lang
    FROM (
        SELECT doc_id, text, lang,
               ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM (
            SELECT doc_id, text, lang FROM documents
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id, text, lang
            FROM documents WHERE doc_id % 3 = 0
        )
    ) WHERE rn = 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on content, keeping the lowest doc_id per text.

    The corpus is salted with exact duplicates (a re-keyed copy of
    every 3rd document) so the dedup provably removes rows — the
    testdata documents are all-distinct, which would make a plain
    dedup vacuously correct.

    Deliberately NOT `dropDuplicates` — that keeps an arbitrary
    (partition-order-dependent) survivor, which is nondeterministic
    under shuffle and unusable for reproducible pipelines. The
    window idiom pins the survivor; at 100 TB the equivalent
    cheaper form is groupBy(hash(text)).agg(min_by(...)) to avoid
    sorting full text — see operators/dedup.py for the hash ladder.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    dupes = docs.filter(F.col("doc_id") % 3 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    w = Window.partitionBy("text").orderBy("doc_id")
    return (
        docs.unionByName(dupes)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "set_union_evolved",
    # v1 rows surface the added column as NULL — the same evolution
    # contract scan_schema_evolution proves at the STORAGE layer,
    # here at the DataFrame layer.
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(NULL AS DOUBLE) AS o_discount_rate, 1 AS gen
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_orderstatus,
           o_totalprice / 100000.0 AS o_discount_rate, 2 AS gen
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def set_union_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift UNION: combine two generations of a feed where
    the newer one grew a column — `unionByName(allowMissingColumns=
    True)`, the DataFrame-layer counterpart of the storage-layer
    `scan_schema_evolution`.

    Positional `union` would silently MISALIGN columns the moment two
    producers order fields differently — the classic pipeline
    corruption that surfaces weeks later as garbage aggregates.
    By-name resolution with missing-column tolerance gives drifted
    feeds the Delta/Iceberg evolution contract in memory: old rows
    carry NULL for the new column, nothing shifts, and the plan is a
    plain Union (no shuffle — evolution costs nothing at read time).
    """
    o = load_table(spark, sf_dir, "orders")
    gen1 = o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus", F.lit(1).alias("gen")
    )
    gen2 = o.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice") / 100_000.0).alias("o_discount_rate"),
        F.lit(2).alias("gen"),
    )
    return gen1.unionByName(gen2, allowMissingColumns=True)
