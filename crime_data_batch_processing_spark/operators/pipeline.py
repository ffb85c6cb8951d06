"""End-to-end pretraining-data pipeline: quality filter → exact dedup
→ near-dup removal → context-window chunking, as ONE composed query.

The reference's entire pipeline is scan → filter → group → sink
(/root/reference/spark_process_script.py:37); an LLM training-data
pipeline is the same shape with more stages. Each stage here is the
registered operator it reuses (`text_quality` rules, `dedup_exact`
keep-first semantics, `dedup_ngram_jaccard` pairs, `doc_chunks`
windowing) — this query exists to prove the stages COMPOSE into one
lazy plan: no materialization between stages, one optimizer pass over
the whole chain, and Catalyst is free to reorder/push filters across
stage boundaries.

Scale shape: the quality filter is a codegen'd predicate evaluated at
the scan; exact dedup is one hash aggregate; near-dup removal is a
left-anti join against the (far smaller) duplicate-id set; chunking
is shuffle-free explode. The only shuffles in the whole pipeline are
the dedup aggregate and the anti-join — at 100 TB that is the floor
for these semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crime_data_batch_processing_spark.functions.textkit import tokens
from crime_data_batch_processing_spark.operators.chunking import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
)
from crime_data_batch_processing_spark.operators.llm_dedup import (
    _SQL_PAIR_BASE,
    JACCARD_THRESHOLD,
    dedup_ngram_jaccard,
)
from crime_data_batch_processing_spark.registry import query
from crime_data_batch_processing_spark.sources.tables import load_table

#: Gopher-style keep rules: long enough to train on, diverse enough
#: to not be boilerplate. Ratios are single int/int double divisions,
#: so the thresholds compare bit-identically across engines.
MIN_TOKENS = 20
MIN_DISTINCT_RATIO = 0.35


@query(
    "pipeline_pretrain",
    oracle=f"""
    WITH q AS (
        SELECT doc_id, text
        FROM documents
        WHERE len(string_split(text, ' ')) >= {MIN_TOKENS}
          AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / len(string_split(text, ' ')) >= {MIN_DISTINCT_RATIO}
    ), kept AS (
        SELECT MIN(doc_id) AS doc_id, text FROM q GROUP BY text
    ), dup_b AS (
        SELECT DISTINCT doc_b FROM (
            {_SQL_PAIR_BASE}
            WHERE p.n_inter::DOUBLE / (len(sa.sh) + len(sb.sh) - p.n_inter)
                  >= {JACCARD_THRESHOLD}
        )
    ), survivors AS (
        SELECT doc_id, text FROM kept
        WHERE doc_id NOT IN (SELECT doc_b FROM dup_b)
    ), toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM survivors
    ), starts AS (
        SELECT doc_id, t,
               unnest(range(0, greatest(len(t), 1), {CHUNK_STRIDE})) AS i
        FROM toks
    )
    SELECT doc_id,
           i // {CHUNK_STRIDE} AS chunk_id,
           array_to_string(list_slice(t, i + 1, i + {CHUNK_TOKENS}), ' ')
               AS chunk_text,
           least(i + {CHUNK_TOKENS}, len(t)) - i AS n_tokens
    FROM starts
    """,
)
def pipeline_pretrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter → exact-dedup → near-dup-drop → chunk, composed.

    Near-dup removal uses the keep-first rule: any doc appearing as
    the HIGHER id of an exact-verified near-dup pair is dropped (its
    lower-id twin survives) — the cheap non-transitive heuristic;
    `dedup_clusters` is the transitive-closure upgrade when cluster
    identity matters. The final output is the training-ready chunk
    stream of the surviving corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks_c = tokens("text")
    n = F.size(toks_c)
    quality = docs.where(
        (n >= MIN_TOKENS)
        & (F.size(F.array_distinct(toks_c)).cast("double") / n >= MIN_DISTINCT_RATIO)
    )
    kept = quality.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    dup_b = dedup_ngram_jaccard(spark, sf_dir).select("doc_b").distinct()
    survivors = kept.join(
        dup_b, kept["doc_id"] == dup_b["doc_b"], "left_anti"
    )
    t = F.split(F.col("text"), " ")
    return (
        survivors.select(
            "doc_id",
            t.alias("t"),
            F.sequence(
                F.lit(0),
                F.greatest(F.size(t) - 1, F.lit(0)),
                F.lit(CHUNK_STRIDE),
            ).alias("starts"),
        )
        .select("doc_id", "t", F.explode("starts").alias("i"))
        .select(
            "doc_id",
            (F.col("i") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
            F.array_join(
                F.slice(F.col("t"), F.col("i") + 1, CHUNK_TOKENS), " "
            ).alias("chunk_text"),
            (
                F.least(F.col("i") + CHUNK_TOKENS, F.size("t")) - F.col("i")
            ).alias("n_tokens"),
        )
    )
