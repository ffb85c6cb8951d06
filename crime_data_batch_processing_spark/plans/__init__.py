"""Physical-plan inspection helpers.

Used by tests to assert scale-relevant plan properties: filters pushed
into the scan, small dimensions broadcast, no Python row-at-a-time
UDFs in hot paths. `.explain()` output is the ground truth the
helpers parse.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Capture `df.explain("formatted")` as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the scan node advertises at least one pushed filter."""
    plan = physical_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def uses_broadcast_join(df: DataFrame) -> bool:
    """True if any join in the plan is broadcast (hash or nested-loop)."""
    plan = physical_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def count_nodes(df: DataFrame, name: str) -> int:
    """Count physical nodes with an EXACT name via the numbered detail
    headers of `explain("formatted")` — substring counting over the
    whole output double-counts (tree line + detail header) and
    conflates Exchange with BroadcastExchange."""
    import re

    return len(re.findall(rf"^\(\d+\) {re.escape(name)}\b", physical_plan(df), re.M))


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema column lists from each file scan (column-pruning check)."""
    return [
        line.split("ReadSchema:", 1)[1].strip()
        for line in physical_plan(df).splitlines()
        if "ReadSchema:" in line
    ]
