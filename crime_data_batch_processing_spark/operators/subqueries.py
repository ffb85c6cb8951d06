"""Subquery operators: EXISTS / NOT EXISTS, IN, and correlated scalar
subqueries.

The reference's only SQL is a flat single-table SELECT
(/root/reference/spark_process_script.py:37) — no subqueries anywhere.
A complete engine has to support them, and on Spark the right way is
to *write the subquery* and let Catalyst decorrelate: `RewritePredicate
Subquery` turns EXISTS/IN into left-semi joins and NOT EXISTS into
left-anti joins; `RewriteCorrelatedScalarSubquery` turns a correlated
scalar into an aggregate + outer join. The physical plans are exactly
the joins a user would hand-write — verified in tests/test_plans.py —
so there is no performance cliff for expressing intent declaratively.

Scale notes: because the rewrites produce ordinary joins, all the
100 TB join machinery applies unchanged — broadcast for small inner
sides, AQE skew splitting, shuffle-hash vs sort-merge selection. A
correlated scalar subquery becomes ONE aggregation over the inner
table (grouped by the correlation key), not a per-row re-execution —
O(|inner|), not O(|outer|·|inner|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from crime_data_batch_processing_spark.functions.exact import sql_davg
from crime_data_batch_processing_spark.registry import query
from crime_data_batch_processing_spark.sources.tables import load_table


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register testdata tables as temp views for spark.sql texts."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


@query(
    "subquery_exists",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE orders.o_custkey = customer.c_custkey
                        AND orders.o_orderpriority = '1-URGENT')
    """,
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS: customers with no urgent-priority order.

    Catalyst decorrelates this into a left-anti hash join on
    `c_custkey = o_custkey` — identical plan to the hand-written
    `join(..., "left_anti")` in `join_semi_anti`, demonstrating the
    declarative form costs nothing.
    """
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE orders.o_custkey = customer.c_custkey
                            AND orders.o_orderpriority = '1-URGENT')
        """
    )


@query(
    "subquery_in",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (uncorrelated subquery): orders from one market segment.

    Rewritten to a left-semi join whose inner side is the filtered
    customer projection — small enough that AQE picks a broadcast
    semi join, so the orders scan never shuffles.
    """
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
        """
    )


_SCALAR_SQL = f"""
    SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT {sql_davg("c2.c_acctbal")}
                         FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
"""


@query("subquery_scalar", oracle=_SCALAR_SQL)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers above their nation's mean
    balance.

    The mean is the decimal-exact `davg` formulation (functions/
    exact.py) spelled identically in both engines, so the comparison
    boundary is bit-identical and the row set deterministic. Catalyst
    decorrelates to one per-nation aggregate joined back to customer —
    the inner table is aggregated once, not once per outer row.
    """
    _views(spark, sf_dir, "customer")
    return spark.sql(_SCALAR_SQL)
