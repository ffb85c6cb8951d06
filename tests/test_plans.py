"""Plan-quality assertions — the 100 TB sanity checks.

Correctness says the answer is right; these say the *plan* is right:
filters reach the parquet scan, projections prune columns, small
dimensions broadcast. A query that passes the oracle but fails these
would fall over at scale.
"""

from __future__ import annotations

from crime_data_batch_processing_spark import registry
from crime_data_batch_processing_spark.plans import (
    has_pushed_filters,
    scan_read_schema,
)

registry.load_all_operators()


def test_filter_eq_pushes_down(spark, sf_dir):
    df = registry.QUERIES["filter_eq"](spark, sf_dir)
    assert has_pushed_filters(df), "equality predicate must reach the parquet scan"


def test_flagship_prunes_columns(spark, sf_dir):
    df = registry.QUERIES["agg_count_filter"](spark, sf_dir)
    schemas = scan_read_schema(df)
    assert schemas, "expected a file scan in the plan"
    # Only the group key + filter column should be read; never all 6
    # orders columns for a 2-column query.
    assert all(
        "o_totalprice" not in s and "o_orderdate" not in s for s in schemas
    ), f"column pruning failed: {schemas}"


def test_flagship_pushes_filter(spark, sf_dir):
    df = registry.QUERIES["agg_count_filter"](spark, sf_dir)
    assert has_pushed_filters(df)


def test_dimension_joins_broadcast(spark, sf_dir):
    from crime_data_batch_processing_spark.plans import uses_broadcast_join

    df = registry.QUERIES["join_broadcast"](spark, sf_dir)
    assert uses_broadcast_join(df), "5/25-row dims must be broadcast, never shuffled"


def test_sort_limit_is_take_ordered(spark, sf_dir):
    from crime_data_batch_processing_spark.plans import physical_plan

    df = registry.QUERIES["sort_limit"](spark, sf_dir)
    assert "TakeOrderedAndProject" in physical_plan(df), (
        "ORDER BY + LIMIT must plan as top-k, not a global sort"
    )
