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
    # (1) NEW in the interrupted round-14 build — keys the driver has
    # NEVER verified (strict-swept bit-exact this round, twice):
    # sim_search_index_maintain (index compaction + delete
    # propagation), pipeline_release_inc (per-ingest release card),
    # multimodal_dedup_semantic_xwide (256-bit/8×32 geometry),
    # pipeline_release_media (media release card), corpus_delete
    # (right-to-be-forgotten propagation).
    "sim_search_index_maintain", "pipeline_release_inc",
    "multimodal_dedup_semantic_xwide", "pipeline_release_media",
    "corpus_delete",
    # (2) code CHANGED in the round-14 OPTIMIZATION pass — a stale
    # green row proves nothing about changed code. Every key below
    # was re-proven bit-exact via tools/strict_sweep.py this round
    # (see OPTIMIZATION_r14.md); the driver re-verifies them here.
    # Symmetrize-explode (knn_rank_directed / release_media):
    "sim_search_knn_graph", "sim_search_knn_graph_prod",
    "dedup_semantic", "pipeline_release_semantic",
    "pipeline_release_semantic_prod",
    # connected-components round/convergence changes:
    "dedup_clusters", "dedup_clusters_star", "pipeline_collapse",
    # _spread single-split fixes (BM25 family, release chain, text,
    # UDTF):
    "text_bm25", "sim_search_rrf", "sample_hard_negatives",
    "pipeline_eval_decontaminate", "pipeline_pretrain",
    "pipeline_curate", "pipeline_dataset_card",
    "pipeline_train_manifest", "pipeline_release", "text_ngrams",
    "text_pii_scrub", "text_repetition", "text_quality_model",
    "text_lm_score", "text_bpe_train", "text_bpe_apply",
    "udtf_token_spans",
    # pre-aggregated Expand (dsum_merge re-fold):
    "agg_cube", "agg_rollup",
    # bounded-streaming state-partition sizing (_bounded_state_conf):
    "stream_session", "stream_static_join", "stream_dedup",
    "stream_events", "stream_stream_join", "stream_stream_left_join",
    "stream_pipeline", "stream_transform_state", "stream_pysource",
    "stream_pysource_partitioned", "stream_decontaminate",
    "stream_watermark_late", "stream_stateful", "stream_anomaly",
    # 5 + 41 = 46 keys consume the ~50 cap; keys with unchanged code
    # and a green row from rounds 9-13 sort after in dict order (the
    # r9-generation rotation resumes next round).
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
