"""Join operators: equi (inner/outer/semi/anti), broadcast, theta, as-of.

The reference performs NO joins anywhere (SURVEY.md §2.2 — verified:
no `join` call, no multi-table SQL in /root/reference). This module is
the engine's generalization of its scan→filter→agg shape to the full
join surface a warehouse workload needs.

Scale notes per strategy:
* Equi joins shuffle both sides on the key (sort-merge) unless one
  side fits the broadcast threshold — AQE demotes to broadcast at
  runtime when post-filter statistics allow. Skewed keys are split by
  AQE's skew-join handling (enabled in session.py).
* `F.broadcast` pins the plan for dimensions KNOWN small (region: 5
  rows, nation: 25) — at 100 TB never let a 5-row table be the build
  side of a shuffle.
* Theta joins have no hash strategy — they become broadcast
  nested-loop; keep the broadcast side provably tiny or rewrite
  (the as-of join below is exactly such a rewrite: a sort within
  partitions instead of an O(n·m) loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crime_data_batch_processing_spark.functions.exact import dsum, sql_dsum
from crime_data_batch_processing_spark.registry import query
from crime_data_batch_processing_spark.sources.tables import load_table


@query(
    "join_inner",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           {sql_dsum('o.o_totalprice')} AS sum_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join (fact ⋈ dim) + aggregate.

    Catalyst picks the physical strategy; at sf0.01 customer fits the
    broadcast threshold so no shuffle of the fact side occurs — the
    exact plan a 100 TB orders table wants.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
        )
    )


@query(
    "join_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders.

    COUNT(o_orderkey) counts the non-null probe side only, so
    order-less customers appear with 0 — the null-skipping COUNT(col)
    semantics of the flagship query (spark_process_script.py:37)
    doing real work.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, orders.o_custkey == customer.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_semi_anti",
    oracle="""
    SELECT c_custkey, 'has_orders' AS tag FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT c_custkey, 'no_orders' AS tag FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence joins: LEFT SEMI (EXISTS) and LEFT ANTI (NOT EXISTS).

    Semi/anti never duplicate or widen rows — at scale they beat
    `inner join + distinct` (no duplicate blow-up, build side only
    stores keys).
    """
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders")
    cond = orders.o_custkey == customer.c_custkey
    semi = customer.join(orders, cond, "left_semi").withColumn("tag", F.lit("has_orders"))
    anti = customer.join(orders, cond, "left_anti").withColumn("tag", F.lit("no_orders"))
    return semi.unionByName(anti)


@query(
    "join_broadcast",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           COUNT(*) AS n_customers,
           {sql_dsum('c.c_acctbal')} AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join through a dimension chain.

    region (5 rows) and nation (25 rows) are pinned as broadcast build
    sides — the fact side streams through map-side, zero shuffle for
    the joins themselves. The plan-quality test asserts
    BroadcastHashJoin is chosen.
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("sum_acctbal"),
        )
    )


@query(
    "join_theta",
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b, a.n_regionkey AS rkey
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join: unordered pairs of nations per region.

    The inequality rides on top of an equi key (n_regionkey), so
    Catalyst still hash-joins on the region and applies the `<` as a
    post-condition — the scalable shape for theta joins. A pure
    inequality join would force BroadcastNestedLoop: fine for a 25-row
    side, catastrophic fact-to-fact.
    """
    n = load_table(spark, sf_dir, "nation")
    a, b = n.alias("a"), n.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_name").alias("nation_a"),
        F.col("b.n_name").alias("nation_b"),
        F.col("a.n_regionkey").alias("rkey"),
    )


@query(
    "join_asof",
    oracle="""
    WITH tagged AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_left,
               CASE WHEN event_type <> 'purchase' THEN event_id END AS r_event_id
        FROM events WHERE event_type = 'purchase' OR event_type = 'click'
    ), filled AS (
        SELECT user_id, us, event_id, is_left,
               LAST_VALUE(r_event_id IGNORE NULLS) OVER (
                   PARTITION BY user_id
                   ORDER BY us, is_left, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS asof_click_id
        FROM tagged
    )
    SELECT event_id AS purchase_id, user_id, us AS purchase_us, asof_click_id
    FROM filled WHERE is_left = 1
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click at-or-before it
    (per user) — the operator Spark lacks natively (SURVEY.md P17).

    Implemented as the scalable union+window idiom rather than a
    per-key loop or a range cross-join: tag both streams, union, sort
    within user partitions by (ts, side, id), and carry the last seen
    right-side id forward with last(ignorenulls). One shuffle on
    user_id, O(n log n) per partition, no O(n·m) pair blow-up — this
    is the 100 TB form. Right rows at the exact same timestamp sort
    before left rows (is_left tiebreak), giving `<=` as-of semantics;
    event_id is the final total-order tiebreaker.

    The oracle is the same algorithm in ANSI SQL, so semantics match
    by construction (timestamps compared as epoch-µs — see
    sources/tables.py on the ns→µs story).
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    tagged = ev.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_left"),
        F.when(F.col("event_type") != "purchase", F.col("event_id")).alias("r_event_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "is_left", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.withColumn(
        "asof_click_id", F.last("r_event_id", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("is_left") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("us").alias("purchase_us"),
        "asof_click_id",
    )


#: SCD2 version boundary: customer attributes "change" at this date —
#: deterministic synthetic versioning (v1 before, v2 after).
SCD2_SPLIT = "1998-01-01"


@query(
    "join_scd2",
    oracle=f"""
    WITH dim AS (
        SELECT c_custkey, 1 AS version,
               DATE '1995-01-01' AS valid_from,
               DATE '{SCD2_SPLIT}' AS valid_to,
               c_acctbal AS acctbal_at
        FROM customer
        UNION ALL
        SELECT c_custkey, 2,
               DATE '{SCD2_SPLIT}', DATE '2002-01-01',
               c_acctbal + 100.0
        FROM customer
    )
    SELECT o.o_orderkey, o.o_custkey, d.version,
           d.acctbal_at, o.o_totalprice
    FROM orders o
    JOIN dim d
      ON o.o_custkey = d.c_custkey
     AND o.o_orderdate >= d.valid_from
     AND o.o_orderdate < d.valid_to
    """,
)
def join_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (SCD Type 2) dimension join: each fact row joins
    the dimension VERSION that was valid at the fact's own date — the
    as-was join every warehouse and feature store needs (joining
    today's attributes onto historical facts silently leaks the
    future into training data).

    The dimension's version history is synthesized deterministically
    (two versions per customer split at SCD2_SPLIT, balance +100
    after), so the oracle reconstructs it exactly. Plan shape: the
    interval predicate does NOT become a nested-loop/theta join —
    the join keys on c_custkey (equi, shuffle-or-broadcast on the
    key) and the validity window is a residual filter evaluated per
    matched pair; with the SCD2 invariant (non-overlapping versions
    per key) each fact row survives exactly once. Versions-per-key is
    small and bounded, so the fan-out before filtering is ≤ the
    version count — the standard warehouse SCD2 shape at any scale.
    `join_asof` is the sibling for UNVERSIONED event-time lookups;
    `join_range_bucketed` the general interval machinery.
    """
    cust = load_table(spark, sf_dir, "customer")
    split = F.lit(SCD2_SPLIT).cast("date")
    dim = cust.select(
        "c_custkey",
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("version"),
                    F.lit("1995-01-01").cast("date").alias("valid_from"),
                    split.alias("valid_to"),
                    F.col("c_acctbal").alias("acctbal_at"),
                ),
                F.struct(
                    F.lit(2).alias("version"),
                    split.alias("valid_from"),
                    F.lit("2002-01-01").cast("date").alias("valid_to"),
                    (F.col("c_acctbal") + 100.0).alias("acctbal_at"),
                ),
            )
        ).alias("v"),
    ).select("c_custkey", "v.*")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(dim, orders["o_custkey"] == dim["c_custkey"])
        .where(
            (F.col("o_orderdate") >= F.col("valid_from"))
            & (F.col("o_orderdate") < F.col("valid_to"))
        )
        .select(
            "o_orderkey", "o_custkey", "version", "acctbal_at", "o_totalprice"
        )
    )


@query(
    "join_null_safe",
    # segment NULLed for 'BUILDING' on both sides: the null-safe join
    # must pair the NULL fact rows with the NULL dim row — a plain
    # equi-join silently drops every one of them.
    oracle="""
    WITH dim AS (
        SELECT DISTINCT NULLIF(c_mktsegment, 'BUILDING') AS seg_key,
               COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'UNSEGMENTED')
                   AS seg_label
        FROM customer
    )
    SELECT d.seg_label, COUNT(*) AS n_customers
    FROM customer c
    JOIN dim d
      ON NULLIF(c.c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM d.seg_key
    GROUP BY d.seg_label
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of silently vanishing.

    Standard SQL equality is three-valued: NULL = NULL is NULL, so an
    equi-join DROPS every null-keyed row — the single most common
    silent-data-loss bug in dimension joins (unknown category, missing
    segment). `eqNullSafe` treats NULL as one more key value: the
    null-keyed fact rows land on the dimension's null row like any
    other group. It remains a HASH-joinable condition (null-safe
    equality is an equi predicate to Catalyst — no nested-loop
    degradation), so the fix costs nothing at scale; the one real
    cost is that all null-keyed rows hash to ONE partition — if NULL
    is a heavy key, the skew machinery (salting/AQE) applies to it
    like any other hot value.
    """
    cu = load_table(spark, sf_dir, "customer")
    key = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    dim = (
        cu.select(key.alias("seg_key"))
        .distinct()
        .select(
            "seg_key",
            F.coalesce(F.col("seg_key"), F.lit("UNSEGMENTED")).alias(
                "seg_label"
            ),
        )
    )
    return (
        cu.select(key.alias("fact_key"))
        .join(
            F.broadcast(dim), F.col("fact_key").eqNullSafe(F.col("seg_key"))
        )
        .groupBy("seg_label")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
