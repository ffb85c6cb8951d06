"""Sort / limit / top-k operators.

The reference has no ORDER BY or LIMIT anywhere (SURVEY.md §2.2).

Scale notes: global ORDER BY is a range-partitioned shuffle (sampled
boundaries) — fine once, poison in a loop. ORDER BY + LIMIT k never
materializes the full sort: Spark plans TakeOrderedAndProject, a
per-partition top-k heap merged on the driver — O(n) scan, O(k)
memory, no shuffle of the data itself. Top-k *per group* uses a
window rank + filter: one shuffle on the group key, heap-free.
Every top-k here carries a unique tiebreaker so results are total-
ordered → deterministic → oracle-hashable (SURVEY.md §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crime_data_batch_processing_spark.registry import query
from crime_data_batch_processing_spark.sources.tables import load_table


@query(
    "sort_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 100
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY + LIMIT → TakeOrderedAndProject.

    (l_orderkey, l_linenumber) is the relation's primary key, so the
    ordering is total and the selected 100-row set is unique.
    """
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(100)
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rk
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey ASC
               ) AS rk
        FROM orders
    ) WHERE rk <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price within each priority class.

    row_number over (group, order DESC, unique-key ASC) then filter —
    one shuffle on the group key; the rank filter is pushed into the
    window via Spark's WindowGroupLimit so each partition keeps only
    k rows before the final sort.
    """
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


#: Pagination geometry: page size and the page served.
PAGE_SIZE = 20
PAGE_NUMBER = 3  # zero-based → rows [60, 80) of the total order


@query(
    "sort_paginate",
    oracle=f"""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT {PAGE_SIZE} OFFSET {PAGE_NUMBER * PAGE_SIZE}
    """,
)
def sort_paginate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-stable pagination: page N of a ranked listing via
    ORDER BY + OFFSET + LIMIT (`DataFrame.offset`, Spark 3.4+).

    The plan is still top-k shaped: offset+limit fold into ONE
    TakeOrderedAndProject of (offset+limit) rows — each partition
    keeps its local top-80, the driver merges and drops the first 60;
    no global sort materializes. That also states the scale limit
    honestly: cost grows with PAGE DEPTH (top-10060 for page 500), so
    deep pagination belongs to keyset continuation (WHERE (price, key)
    < last-seen — a pushed filter + top-k per page, depth-independent)
    — this operator is the front-pages form every listing API serves.
    The total-order tie-break (price DESC, key ASC) is what makes a
    page STABLE: without it, rows duplicate or vanish across pages
    whenever ties straddle a boundary.
    """
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(PAGE_NUMBER * PAGE_SIZE)
        .limit(PAGE_SIZE)
    )


@query(
    "sort_keyset",
    oracle=f"""
    WITH b AS (
        SELECT o_totalprice AS bp, o_orderkey AS bk
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 1 OFFSET {(PAGE_NUMBER + 1) * PAGE_SIZE - 1}
    )
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders, b
    WHERE o_totalprice < bp
       OR (o_totalprice = bp AND o_orderkey > bk)
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT {PAGE_SIZE}
    """,
)
def sort_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek-method) continuation: the DEPTH-INDEPENDENT page
    form `sort_paginate`'s docstring defers to — page N+1 is "the
    first PAGE_SIZE rows strictly beyond the last row the client saw",
    not "skip N·PAGE_SIZE rows".

    The client's cursor is the last-seen (price, key) tuple; here it
    is fetched once as an orchestration scalar (the last row of
    `sort_paginate`'s page, itself a TakeOrderedAndProject — in
    production the client sends these two literals back, so no server
    state survives between pages). The page query is then a LITERAL
    compound predicate + top-k: the Or((price<bp),(price=bp AND
    key>bk)) filter reaches the parquet scan as a pushed filter
    (row-group stats skip everything above the cursor), and the limit
    plans TakeOrderedAndProject — per-partition top-20 heaps, no
    offset scan, no global sort. Cost is O(scan beyond cursor) + O(k)
    memory at ANY depth: page 5 000 000 costs the same as page 4,
    which is exactly the property OFFSET pagination lacks. The strict
    (DESC, ASC) total order makes the continuation gapless and
    duplicate-free across page boundaries even when price ties
    straddle them.

    Verified against the offset form: the oracle derives the same
    cursor with LIMIT 1 OFFSET 79, so this page must equal the
    offset-built page [80, 100) row-for-row.
    """
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    # the "client cursor": last row of the previous page (row 80 of
    # the total order). One driver-side row, top-k-shaped fetch.
    cursor = (
        src.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit((PAGE_NUMBER + 1) * PAGE_SIZE)
        .tail(1)[0]
    )
    bp, bk = cursor["o_totalprice"], cursor["o_orderkey"]
    beyond = (F.col("o_totalprice") < F.lit(bp)) | (
        (F.col("o_totalprice") == F.lit(bp))
        & (F.col("o_orderkey") > F.lit(bk))
    )
    return (
        src.where(beyond)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(PAGE_SIZE)
    )
