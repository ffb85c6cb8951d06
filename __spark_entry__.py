"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export over the engine's query/oracle registry
(`crime_data_batch_processing_spark.registry`): each operator module
registers its `(spark, sf_dir) -> DataFrame` callable and — when
ANSI-SQL-expressible — its DuckDB oracle SQL via the `@query`
decorator, keeping implementation and oracle side by side.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from crime_data_batch_processing_spark import registry  # noqa: E402

registry.load_all_operators()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship reproduces the reference's one query shape
    (/root/reference/spark_process_script.py:37): filter → groupBy →
    COUNT(col) with null-skipping semantics.
    """
    return registry.QUERIES["agg_count_filter"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted → rows-only check)."""
    return dict(registry.ORACLES)
