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
    # (1) code CHANGED in the round-15 OPTIMIZATION pass — a stale
    # green row proves nothing about changed code. Every key below
    # was re-proven bit-exact via tools/strict_sweep.py this round
    # (see OPTIMIZATION_r15.md); the driver re-verifies them here.
    # Banded candidate-pair repartition (banded_scored_pairs /
    # knn_inc_probe) + vectorized media embed:
    "dedup_embedding_lsh", "dedup_embedding_lsh_prod",
    "sim_search_knn_graph", "sim_search_knn_graph_prod",
    "multimodal_dedup_semantic", "multimodal_dedup_semantic_wide",
    "multimodal_dedup_semantic_xwide", "multimodal_dedup_semantic_inc",
    "dedup_semantic", "dedup_semantic_inc", "pipeline_release_media",
    "sim_search_knn_inc", "sim_search_knn_inc_prod",
    "sim_search_index_append", "sim_search_index_maintain",
    # Release-key corpus-scan fusion (_decon_quality_profile):
    "pipeline_release", "pipeline_eval_decontaminate",
    "pipeline_release_semantic", "pipeline_release_semantic_prod",
    # simhash expr-string plan build; CC/graph explode-symmetrize:
    "dedup_simhash", "dedup_clusters", "dedup_clusters_star",
    "pipeline_collapse", "graph_pagerank", "graph_bfs",
    "graph_label_propagation", "graph_triangles",
    # BPE lazy per-round persist:
    "text_bpe_train", "text_bpe_apply",
    # Inherited round-15 changes (commit e7b7058): decimal-exact
    # cube/rollup fold, _spread reverts:
    "agg_cube", "agg_rollup", "pipeline_dataset_card",
    "pipeline_train_manifest",
    # (2) last driver-green in ROUND 9 — the oldest remaining
    # generation (displaced by the r14 rotation; resumed here to keep
    # driver evidence aging out, r14 verdict item 9). 33 + 17 = 50
    # keys consume the cap exactly; the rest of the r9 generation
    # (quality_expectations, sample_bottomk, sample_split, scan_*,
    # sim_search_pq, sink_compacted, stream_count_min,
    # text_dedup_spans, text_domain_mix, text_ngrams, udf_arrow,
    # udtf_token_spans, window_*) sorts next in dict order.
    "agg_ab_test", "agg_argmax", "agg_count_filter", "agg_distinct",
    "agg_gini", "agg_grouping_sets", "agg_mad", "agg_multi",
    "analytics_waiting_suppliers", "dedup_containment",
    "dedup_incremental", "dedup_ngram_jaccard", "join_bloom",
    "join_scd2", "multimodal_decode", "multimodal_dedup",
    "profile_stats",
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
