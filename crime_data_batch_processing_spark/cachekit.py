"""Tracked persistence: every operator that caches a derived frame
(signature state, LSH/IVF corpora) registers it here so harness code
can release executor storage between queries.

Persisted intermediates are the right call inside one query (each is
referenced from 2-4 plan branches), but they outlive the query: Spark
keeps cached blocks until `unpersist()` or session end, so a
multi-query bench/test run accumulates every query's signature state
in executor storage. MEMORY_AND_DISK means that degrades to disk
spill rather than OOM, but at 100 TB the disk is not free either —
a long-lived session must release per-query state.

Usage: operators wrap `df.persist(...)` in :func:`track`; harnesses
call :func:`release_all` after consuming each query's result (NOT
before — the returned DataFrame is lazy and unpersisting early would
just force recomputation at collect time).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

_TRACKED: list["DataFrame"] = []


def track(df: "DataFrame") -> "DataFrame":
    """Register a persisted frame for later release; returns it."""
    _TRACKED.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked frame; returns how many were released.

    Safe to call at any time: blocks for frames still mid-computation
    are dropped and would be recomputed if referenced again.
    """
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
