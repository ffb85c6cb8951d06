"""Reshape + distributional aggregates: pivot, unpivot, percentiles.

None of these exist in the reference (its one query is a straight
GROUP BY — /root/reference/spark_process_script.py:37); they round out
the analytics surface a crime-dashboard user needs next: crosstabs
(arrests by type × year), long-form melts for plotting, and
distributional stats.

Scale notes: `pivot` with an EXPLICIT values list is one hash
aggregate — same shuffle as the plain GROUP BY, wider output row.
Without the list Spark first runs a distinct-values job (a full extra
pass) and then the aggregate: always pass the list at scale. `unpivot`
is a flatMap — row count × #value-columns, no shuffle. Exact
percentiles sort within groups (memory-heavy at scale); prefer
`approx_percentile` sketches beyond interactive cardinalities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crime_data_batch_processing_spark.functions.exact import dsum
from crime_data_batch_processing_spark.registry import query
from crime_data_batch_processing_spark.sources.tables import load_table


def _filtered_dsum(expr: str, cond: str) -> str:
    # FILTER binds to the aggregate itself, inside the exact-sum CAST
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) "
        f"FILTER (WHERE {cond}) AS DOUBLE)"
    )


@query(
    "pivot_wide",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS "F_cnt",
           {_filtered_dsum('l_quantity', "l_linestatus = 'F'")} AS "F_qty",
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS "O_cnt",
           {_filtered_dsum('l_quantity', "l_linestatus = 'O'")} AS "O_qty"
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crosstab: returnflag rows × linestatus columns, two measures.

    The values list is explicit — omitting it costs an extra
    distinct-scan job at scale and makes the output schema
    data-dependent (a mobile target for every downstream consumer).
    The oracle spells the same thing as portable FILTERed aggregates.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("l_quantity").alias("qty"),
        )
    )


@query(
    "unpivot_long",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS metric_value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, CAST(p_retailprice AS DOUBLE)
    FROM part
    """,
)
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt wide columns into (metric, value) long form.

    A flatMap in the physical plan — no shuffle, output rows =
    input × #melted columns. The oracle is the portable UNION ALL
    rendering of the same reshape.
    """
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="metric_value",
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS p50_qty,
           quantile_cont(l_extendedprice, 0.9) AS p90_price,
           median(l_tax) AS med_tax
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles + median per group.

    Spark's `percentile` and DuckDB's `quantile_cont` both use linear
    interpolation between closest ranks — verified bit-identical on
    this data. Exact percentiles materialize each group's values;
    beyond interactive group sizes switch to `approx_percentile`
    (KLL/GK sketches, mergeable, bounded memory — the same
    exact→sketch trade as agg_distinct → agg_approx_distinct).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("p50_qty"),
        F.percentile("l_extendedprice", 0.9).alias("p90_price"),
        F.median("l_tax").alias("med_tax"),
    )


#: approx_percentile accuracy: rank error <= 1/ACCURACY of the group
#: size. The oracle-checkable contract brackets the sketch value
#: between the exact quantiles at p +/- RANK_EPS.
APPROX_PCT_ACCURACY = 10_000
RANK_EPS = 0.01


@query(
    "agg_approx_percentile",
    # Like agg_approx_distinct: the sketch value itself is
    # engine-specific, but its rank-error CONTRACT is SQL-expressible —
    # the estimate must land between the exact quantiles at p-eps and
    # p+eps, which holds deterministically for fixed data (the KLL/GK
    # sketch has no run-to-run randomness).
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50_exact,
           quantile_cont(l_extendedprice, 0.95) AS p95_exact,
           TRUE AS p50_ok,
           TRUE AS p95_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile with a bounded-rank-error oracle contract —
    the 100 TB form of agg_percentile.

    Exact percentiles materialize every group's values; the sketch is
    mergeable with bounded memory, so it survives any group size. The
    registered output emits the exact quantiles plus flags asserting
    the sketch landed inside its guaranteed rank window
    [q(p-eps), q(p+eps)] — at scale one would drop the exact columns
    and keep only the sketch.
    """
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    # ONE array-percentile per aggregate kind: six scalar
    # F.percentile() calls each collect their own copy of the group's
    # values (measured 5× slower at sf0.1); the array form shares a
    # single buffer and sorts it once.
    probe = [0.5 - RANK_EPS, 0.5, 0.5 + RANK_EPS,
             0.95 - RANK_EPS, 0.95, 0.95 + RANK_EPS]
    est = li.groupBy("l_returnflag").agg(
        F.percentile(price, F.array(*[F.lit(p) for p in probe])).alias("pcts"),
        F.approx_percentile(
            price, F.array(F.lit(0.5), F.lit(0.95)), APPROX_PCT_ACCURACY
        ).alias("apx"),
    )
    pc = lambda i: F.element_at("pcts", i)  # noqa: E731
    ap = lambda i: F.element_at("apx", i)  # noqa: E731
    return est.select(
        "l_returnflag",
        pc(2).alias("p50_exact"),
        pc(5).alias("p95_exact"),
        ap(1).between(pc(1), pc(3)).alias("p50_ok"),
        ap(2).between(pc(4), pc(6)).alias("p95_ok"),
    )


@query(
    "agg_weighted_median",
    # Explicit cumulative-weight replay on BOTH sides — weighted
    # quantiles have no engine builtin with pinned semantics, so the
    # definition (smallest value whose cumulative weight reaches half
    # the total) is spelled out rather than trusted to a library.
    oracle="""
    WITH w AS (
        SELECT l_returnflag, l_extendedprice AS v,
               CAST(l_quantity AS BIGINT) AS wt
        FROM lineitem
    ), c AS (
        SELECT l_returnflag, v, wt,
               SUM(wt) OVER (PARTITION BY l_returnflag
                             ORDER BY v, wt
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum,
               SUM(wt) OVER (PARTITION BY l_returnflag) AS total
        FROM w
    )
    SELECT l_returnflag,
           CAST(MAX(total) AS BIGINT) AS total_weight,
           MIN(CASE WHEN 2 * cum >= total THEN v END) AS weighted_median
    FROM c GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median per group: the price at which half the
    QUANTITY (not half the rows) sits below — the unit-weighted
    statistic behind cost-per-unit medians, wage medians weighted by
    hours, latency medians weighted by request count.

    No engine builtin has pinned weighted-quantile semantics, so the
    definition is computed explicitly: accumulate integer weights in
    value order, take the smallest value whose doubled cumulative
    weight reaches the group total. Weights are integral (quantities),
    so every comparison is exact and the chosen value is a pure
    function of the data. The conditional-MIN finalizer replaces a
    self-join against the total: one pass, no re-scan.

    Scale shape (round-9 fix, caught by the s30 soak): the window
    partitions on l_returnflag — THREE distinct values — so feeding it
    raw lineitem serializes the whole corpus sort onto three tasks
    (measured exp 1.11 at 19M rows, 29 of 32 cores idle; at 100 TB,
    three executors sort everything). Weights are therefore FIRST
    hash-aggregated per (group, value) — full parallelism, map-side
    combine — and the per-group window runs over DISTINCT VALUES, so
    its input is bounded by the value domain (2-decimal prices here),
    not the corpus. Cumulative weight per distinct value crosses the
    half-total at exactly the same value as the row form, so the
    output is identical (the oracle keeps the row-level replay). For
    a continuous value column the pre-aggregate would not bound the
    domain — the production answer there is iterative quantile
    bisection (broadcast threshold probes), a different operator.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("long").alias("wt"),
    )
    per_value = li.groupBy("l_returnflag", "v").agg(
        F.sum("wt").alias("wt")
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy(F.col("v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    c = per_value.select(
        "l_returnflag",
        "v",
        F.sum("wt").over(w_cum).alias("cum"),
        F.sum("wt").over(w_all).alias("total"),
    )
    return c.groupBy("l_returnflag").agg(
        F.max("total").alias("total_weight"),
        F.min(F.when(2 * F.col("cum") >= F.col("total"), F.col("v"))).alias(
            "weighted_median"
        ),
    )
