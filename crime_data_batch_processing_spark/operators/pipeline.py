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

from pyspark.storagelevel import StorageLevel

from crime_data_batch_processing_spark.cachekit import track
from crime_data_batch_processing_spark.functions.textkit import (
    shingles_of,
    sql_shingles,
    tokens,
)
from crime_data_batch_processing_spark.operators.filters import (
    _SQL_MIXTURE_CASE,
    MIXTURE_BP,
    MIXTURE_BUDGET_DEN,
    MIXTURE_BUDGET_NUM,
    SAMPLE_M,
    SPLIT_TRAIN_HI,
    SPLIT_VAL_HI,
    sample_hash32,
    sql_sample_hash32,
)
from crime_data_batch_processing_spark.operators.text_analysis import (
    QM_BIAS,
    QM_THRESHOLD,
    QM_W_DISTINCT,
    QM_W_LONG,
    QM_W_STOP,
    QM_W_TOKENS,
    _bm25_ranked,
    sql_bm25_ctes,
)
from crime_data_batch_processing_spark.operators.chunking import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
)
from crime_data_batch_processing_spark.operators.llm_dedup import (
    _SQL_PAIR_BASE,
    BENCH_MOD,
    COSINE_THRESHOLD,
    DECON_K,
    JACCARD_THRESHOLD,
    dedup_ngram_jaccard,
    semantic_verdict,
    sql_semantic_witness_cte,
    text_decontaminate,
)
from crime_data_batch_processing_spark.registry import query
from crime_data_batch_processing_spark.functions.exact import (
    with_scalars,
)
from crime_data_batch_processing_spark.sources.tables import (
    load_table,
    spread,
    spread_table,
)

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
    docs = spread_table(spark, sf_dir, "documents")
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


_SQL_CURATE = f"""
    WITH bg AS (
        SELECT DISTINCT unnest({sql_shingles('text', DECON_K)}) AS g
        FROM documents WHERE doc_id % {BENCH_MOD} = 0
    ), corpus AS (
        SELECT doc_id, text, lang FROM documents
        WHERE doc_id % {BENCH_MOD} <> 0
    ), hits AS (
        SELECT DISTINCT e.doc_id
        FROM (SELECT doc_id,
                     unnest({sql_shingles('text', DECON_K)}) AS g
              FROM corpus) e
        JOIN bg ON e.g = bg.g
    ), clean AS (
        SELECT c.* FROM corpus c
        WHERE c.doc_id NOT IN (SELECT doc_id FROM hits)
    ), q AS (
        SELECT * FROM clean
        WHERE len(string_split(text, ' ')) >= {MIN_TOKENS}
          AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / len(string_split(text, ' ')) >= {MIN_DISTINCT_RATIO}
    ), kept AS (
        SELECT d.doc_id, d.lang
        FROM q d JOIN (SELECT MIN(doc_id) AS m FROM q GROUP BY text) k
          ON d.doc_id = k.m
    ), counts AS (
        SELECT lang, COUNT(*) AS cnt FROM kept GROUP BY lang
    ), tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM counts
    ), rates AS (
        SELECT lang,
               {SAMPLE_M} * LEAST(10000,
                   10000 * ((total * {MIXTURE_BUDGET_NUM}
                             // {MIXTURE_BUDGET_DEN})
                            * (CASE lang {_SQL_MIXTURE_CASE} ELSE 0 END)
                            // 10000)
                   // cnt) // 10000 AS thr
        FROM counts, tot
    )
    SELECT d.doc_id, d.lang
    FROM kept d JOIN rates r ON d.lang = r.lang
    WHERE {sql_sample_hash32('d.doc_id')} < r.thr
"""


@query("pipeline_curate", oracle=_SQL_CURATE)
def pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full curation chain: decontaminate → quality-filter →
    exact-dedup → mixture-targeted sample, composed lazily.

    `pipeline_pretrain` proves the dedup/chunking stages compose; this
    one proves the ROUND-3 stages do — benchmark decontamination
    first (an eval-overlapping doc must not survive into any later
    stage), Gopher-style quality rules, keep-first exact dedup, then
    language-mixture rebalancing whose keep rates are computed from
    the counts of the corpus that SURVIVED the earlier stages (the
    order production pipelines use: rates computed pre-filter would
    overshoot the budget).

    One lazy plan end-to-end: the decontamination anti-join and the
    dedup aggregate are the only corpus-sized shuffles; the mixture
    stage adds a tiny count aggregate broadcast back onto the
    survivors. Stage semantics are the registered operators'
    (`text_decontaminate`, `pipeline_pretrain`'s quality rules,
    `dedup_exact` keep-first, `sample_mixture` rate algebra), so each
    piece is also independently driver-verified.
    """
    docs = spread_table(spark, sf_dir, "documents")
    verdicts = text_decontaminate(spark, sf_dir)
    clean = (
        docs.join(
            verdicts.where(~F.col("contaminated")).select("doc_id"), "doc_id"
        )
    )
    toks_c = tokens("text")
    n = F.size(toks_c)
    q = clean.where(
        (n >= MIN_TOKENS)
        & (F.size(F.array_distinct(toks_c)).cast("double") / n >= MIN_DISTINCT_RATIO)
    )
    winners = q.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    # persisted: the curated spine feeds the rate computation AND the
    # final sampled join — un-persisted, each branch re-runs the
    # decontamination join + quality filter + dedup aggregate
    kept = (
        q.join(winners.select("doc_id"), "doc_id")
        .select("doc_id", "lang")
        .persist(StorageLevel.MEMORY_AND_DISK)
        .transform(track)
    )

    counts = kept.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    w_bp = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in MIXTURE_BP.items()],
        F.lit(0),
    ).cast("long")
    rates = (
        with_scalars(counts, total)
        .withColumn("w_bp", w_bp)
        .withColumn(
            "thr",
            F.expr(
                f"{SAMPLE_M}L * least(10000L, "
                f"10000L * ((total * {MIXTURE_BUDGET_NUM} "
                f"div {MIXTURE_BUDGET_DEN}) * w_bp div 10000) "
                f"div cnt) div 10000"
            ),
        )
        .select("lang", "thr")
    )
    return (
        kept.join(F.broadcast(rates), "lang")
        .where(sample_hash32(F.col("doc_id")) < F.col("thr"))
        .select("doc_id", "lang")
    )


def _sql_collapse() -> str:
    from crime_data_batch_processing_spark.operators.llm_dedup import (
        _SQL_CLUSTERS,
    )

    return f"""
    WITH clusters AS ({_SQL_CLUSTERS})
    SELECT c.cluster_id AS doc_id,
           COUNT(*)::BIGINT AS n_merged,
           CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
           CAST(MAX(CASE WHEN c.is_canonical THEN d.n_chars END) AS BIGINT)
               AS kept_chars
    FROM clusters c JOIN documents d USING (doc_id)
    GROUP BY c.cluster_id
    """


@query("pipeline_collapse", oracle=_sql_collapse())
def pipeline_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The user-facing end of the dedup family: collapse every
    near-dup cluster onto its canonical document and report what was
    merged away — one row per SURVIVING doc with its cluster size,
    the total characters the cluster held, and the characters kept.

    Composes the verified kernels end-to-end: exact-Jaccard pairs →
    min-label connected components → canonical projection → one
    aggregate join against the corpus. Everything stays one lazy plan
    downstream of the (iterative, checkpointed) clustering; the only
    corpus-sized shuffles are the pair join inside clustering and the
    final cluster_id aggregate. `n_merged = 1` rows are the
    untouched corpus majority — at 100 TB the output IS the cleaned
    dataset manifest (keep `doc_id`, drop the rest of each cluster),
    which is why it's registered as a pipeline, not a diagnostic.
    """
    from crime_data_batch_processing_spark.operators.llm_dedup import (
        dedup_clusters,
    )

    labels = dedup_clusters(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (
        labels.join(docs, "doc_id")
        .groupBy(F.col("cluster_id").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_merged"),
            F.sum("n_chars").alias("total_chars"),
            F.max(F.when(F.col("is_canonical"), F.col("n_chars"))).alias(
                "kept_chars"
            ),
        )
    )


@query(
    "pipeline_dataset_card",
    oracle="""
    WITH flags AS (
        SELECT lang,
               len(string_split(text, ' ')) AS ntok,
               doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text))
                   AS is_dup
        FROM documents
    ),
    per AS (
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_exact_dups,
               CAST(SUM(ntok) AS BIGINT) AS total_tokens
        FROM flags GROUP BY lang
    )
    SELECT lang, n_docs, n_exact_dups, total_tokens,
           CAST(n_docs AS DOUBLE)
               / CAST(SUM(n_docs) OVER () AS DOUBLE) AS doc_share
    FROM per
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card: the per-language summary a curated corpus
    ships with — document counts, exact-duplicate counts, token
    totals, and corpus share — composed as ONE lazy plan.

    Composition of the engine's own primitives: `multimodal_dedup`'s
    digest-window dup flag, `text_token_count`'s whitespace
    tokenization, and a two-level aggregation. Plan shape: one scan →
    one digest shuffle (window min) → one lang aggregation
    (map-side combined) → a broadcast of the single grand-total row
    back onto the per-language rows. Every number is exact integer
    arithmetic except `doc_share`, which is ONE division of two
    exact integers — bit-identical across engines. At 100 TB this is
    the report you run once per corpus release; its cost is the
    digest shuffle, shared with the dedup pass that precedes it in
    `pipeline_curate`.
    """
    from pyspark.sql import Window

    from crime_data_batch_processing_spark.functions.textkit import tokens

    # no _spread here: measured NEGATIVE on this key (r14: 0.371s →
    # 0.753s builder, 0.579s driver — the added Exchange costs more
    # than the parallelism buys on this tokenize-then-tiny-agg shape;
    # the digest window shuffles anyway, which already spreads the
    # aggregation stages). Reverted per r15, same discipline as
    # text_tfidf.
    docs = load_table(spark, sf_dir, "documents")
    flags = docs.select(
        "lang",
        F.size(tokens("text")).alias("ntok"),
        (
            F.col("doc_id")
            != F.min("doc_id").over(
                Window.partitionBy(F.md5(F.encode("text", "UTF-8")))
            )
        ).alias("is_dup"),
    )
    per = flags.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
        .cast("long")
        .alias("n_exact_dups"),
        F.sum("ntok").cast("long").alias("total_tokens"),
    )
    total = per.agg(F.sum("n_docs").alias("grand_total"))
    return with_scalars(per, total).select(
        "lang",
        "n_docs",
        "n_exact_dups",
        "total_tokens",
        (
            F.col("n_docs").cast("double")
            / F.col("grand_total").cast("double")
        ).alias("doc_share"),
    )


#: Training-manifest geometry: shards per split; the quality gate
#: reuses the linear model's weights/threshold (text_analysis).
MANIFEST_SHARDS = 8


@query(
    "pipeline_train_manifest",
    oracle=f"""
    WITH kept AS (
        SELECT doc_id, text,
               len(string_split(text, ' ')) AS n_toks
        FROM documents
        WHERE ({QM_BIAS}
               + {QM_W_TOKENS} * len(string_split(text, ' '))
               + {QM_W_STOP} * len(list_filter(string_split(text, ' '),
                                               t -> t IN ('the', 'a')))
               + {QM_W_DISTINCT}
                   * len(list_distinct(string_split(text, ' ')))
               + {QM_W_LONG} * len(list_filter(string_split(text, ' '),
                                               t -> len(t) > 12)))
              >= {QM_THRESHOLD}
    ), dedup AS (
        SELECT k.doc_id, k.n_toks FROM kept k
        WHERE k.doc_id = (SELECT MIN(k2.doc_id) FROM kept k2
                          WHERE md5(k2.text) = md5(k.text))
    )
    SELECT CASE WHEN h < {SPLIT_TRAIN_HI} THEN 'train'
                WHEN h < {SPLIT_VAL_HI} THEN 'val'
                ELSE 'test' END AS split,
           CAST(doc_id % {MANIFEST_SHARDS} AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens
    FROM (SELECT doc_id, n_toks,
                 {sql_sample_hash32('doc_id')} AS h
          FROM dedup)
    GROUP BY 1, 2
    """,
)
def pipeline_train_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deliverable at the end of the curation ladder: the training
    SHARD MANIFEST — per (split, shard): document and token counts —
    what actually gets handed to the trainer and pinned in the run
    config.

    Composes verified kernels in ONE lazy plan: the linear quality
    gate (`text_quality_model`'s integer logit as a pushed filter),
    exact keep-first dedup (md5 digest, min-id wins), the
    key-deterministic 80/10/10 split (`sample_split`'s hash — co-keyed
    tables land on the same side), and id-based sharding. Counts and
    token totals per (split, shard) are the checksum a release ships:
    two runs — or two ENGINES — must produce identical manifests,
    which is exactly what the oracle asserts. One corpus-sized shuffle
    (the dedup digest aggregate); everything else is map-only.
    """
    # no _spread here: measured NEGATIVE on this key (r14: 0.829s →
    # 0.97s builder, 0.86s driver — the dedup digest aggregate
    # shuffles right after the map stage, so the extra Exchange buys
    # nothing). Reverted per r15, same discipline as text_tfidf.
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    logit = (
        F.lit(QM_BIAS)
        + F.lit(QM_W_TOKENS) * F.size(toks)
        + F.lit(QM_W_STOP)
        * F.size(F.filter(toks, lambda t: t.isin("the", "a")))
        + F.lit(QM_W_DISTINCT) * F.size(F.array_distinct(toks))
        + F.lit(QM_W_LONG)
        * F.size(F.filter(toks, lambda t: F.length(t) > 12))
    )
    kept = docs.where(logit >= QM_THRESHOLD).select(
        "doc_id",
        F.md5("text").alias("digest"),
        F.size(tokens("text")).alias("n_toks"),
    )
    first = kept.groupBy("digest").agg(F.min("doc_id").alias("keep_id"))
    dedup = (
        kept.join(first, "digest")
        .where(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "n_toks")
    )
    h = sample_hash32(F.col("doc_id"))
    split = (
        F.when(h < SPLIT_TRAIN_HI, "train")
        .when(h < SPLIT_VAL_HI, "val")
        .otherwise("test")
    )
    return (
        dedup.groupBy(
            split.alias("split"),
            (F.col("doc_id") % MANIFEST_SHARDS).alias("shard"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )


#: Retrieval-audit pool depth for eval decontamination: how deep a
#: BM25 retrieval pass per eval query is probed when auditing whether
#: retrieval alone would have caught each contaminated document. IR
#: audit pools run topk-hundreds; on this vocabulary-saturated
#: synthetic corpus BM25 discrimination is weak (every query term
#: posts to every document — text_bm25's workload note), so hits land
#: deep in the pool; real corpora post sparsely and hit at top-10.
EVAL_RETRIEVAL_POOL = 400
#: The audit runs over a FIXED-SIZE panel of eval queries (the first
#: EVAL_AUDIT_QUERIES bench doc_ids), the `sim_search_rrf` workload
#: discipline: a real eval suite is constant-sized while the corpus
#: grows, and BM25 scoring is O(corpus) PER QUERY on a saturated
#: vocabulary — letting the panel grow with the corpus (every
#: BENCH_MOD-th doc) makes the audit quadratic, measured 7.3 s → 209 s
#: warm across the s1→s10 decade before this bound. The GATE is not
#: affected: the 5-gram verdict always covers every eval doc.
EVAL_AUDIT_QUERIES = 32


@query(
    "pipeline_eval_decontaminate",
    oracle=f"""
    WITH {sql_bm25_ctes(
        f"t.doc_id % {BENCH_MOD} = 0"
        f" AND t.doc_id < {BENCH_MOD * EVAL_AUDIT_QUERIES}",
        EVAL_RETRIEVAL_POOL,
        candidate_pred=f"c.doc_id % {BENCH_MOD} <> 0",
    )},
    kept AS (
        SELECT doc_id, text,
               len(string_split(text, ' ')) AS n_toks
        FROM documents
        WHERE doc_id % {BENCH_MOD} <> 0
          AND ({QM_BIAS}
               + {QM_W_TOKENS} * len(string_split(text, ' '))
               + {QM_W_STOP} * len(list_filter(string_split(text, ' '),
                                               t -> t IN ('the', 'a')))
               + {QM_W_DISTINCT}
                   * len(list_distinct(string_split(text, ' ')))
               + {QM_W_LONG} * len(list_filter(string_split(text, ' '),
                                               t -> len(t) > 12)))
              >= {QM_THRESHOLD}
    ), dedup AS (
        SELECT k.doc_id, k.n_toks FROM kept k
        WHERE k.doc_id = (SELECT MIN(k2.doc_id) FROM kept k2
                          WHERE md5(k2.text) = md5(k.text))
    ), qsh AS (
        SELECT doc_id AS query_id,
               unnest({sql_shingles('text', DECON_K)}) AS g
        FROM documents WHERE doc_id % {BENCH_MOD} = 0
    ), cpairs AS (
        SELECT DISTINCT e.doc_id, q.query_id
        FROM (SELECT doc_id, unnest({sql_shingles('text', DECON_K)}) AS g
              FROM documents WHERE doc_id % {BENCH_MOD} <> 0) e
        JOIN qsh q ON e.g = q.g
    ), flagged AS (
        SELECT doc_id,
               MAX(CASE WHEN r.query_id IS NOT NULL THEN 1 ELSE 0 END)
                   AS hit_retrieved
        FROM cpairs p LEFT JOIN lexranked r USING (query_id, doc_id)
        GROUP BY doc_id
    )
    SELECT CASE WHEN h < {SPLIT_TRAIN_HI} THEN 'train'
                WHEN h < {SPLIT_VAL_HI} THEN 'val'
                ELSE 'test' END AS split,
           CAST(doc_id % {MANIFEST_SHARDS} AS BIGINT) AS shard,
           CAST(SUM(CASE WHEN NOT fl THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs,
           CAST(SUM(CASE WHEN NOT fl THEN n_toks ELSE 0 END) AS BIGINT)
               AS n_tokens,
           CAST(SUM(CASE WHEN fl THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flagged,
           CAST(SUM(CASE WHEN fl THEN n_toks ELSE 0 END) AS BIGINT)
               AS n_flagged_tokens,
           CAST(SUM(COALESCE(hr, 0)) AS BIGINT) AS n_flagged_retrieved
    FROM (SELECT d.doc_id, d.n_toks,
                 (f.doc_id IS NOT NULL) AS fl,
                 f.hit_retrieved AS hr,
                 {sql_sample_hash32('d.doc_id')} AS h
          FROM dedup d LEFT JOIN flagged f USING (doc_id))
    GROUP BY 1, 2
    """,
)
def pipeline_eval_decontaminate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The release gate a pretraining run actually ships: the
    DECONTAMINATED shard manifest plus the contamination audit — per
    (split, shard): documents/tokens kept, documents/tokens removed
    because they share a 5-gram with the held-out eval set, and how
    many of the removed documents a per-query BM25 retrieval pass
    (top-EVAL_RETRIEVAL_POOL) would also have surfaced.

    Composes three verified kernels into ONE lazy plan (the r9
    verdict's suggested composition):

    - the exact 5-gram membership verdict (`text_decontaminate`'s
      broadcast shape) is the GATE — eval-set grams are tiny relative
      to the corpus, so the (query_id, gram) table broadcasts and the
      corpus streams map-only through explode → broadcast hash join.
      Full recall by construction; this is the correct 100 TB shape.
    - `_bm25_ranked` (the `text_bm25` body, candidate universe
      restricted to the train slice) is the AUDIT — it measures, per
      flagged doc, whether cheap lexical retrieval from its
      contaminating query would have caught it. Retrieval-gated
      decontamination (verdict only on retrieved candidates) is the
      tempting cheaper design; this column is exactly its measured
      recall, and on this corpus it shows why the broadcast gate must
      stay primary. The audit runs over a FIXED panel of
      EVAL_AUDIT_QUERIES eval queries (constant at scale — see the
      constant's note; BM25 is O(corpus) per query, so a
      corpus-proportional panel is quadratic), while the gate always
      covers every eval doc.
    - `pipeline_train_manifest`'s quality gate + exact keep-first
      dedup + hash split/shard kernels produce the manifest
      coordinates, restricted to the train slice (the bench slice is
      the eval set — it is never trained on).

    Scale shape: three corpus passes (tf for BM25, shingles for the
    verdict, quality/digest for the manifest), each one scan; the
    only corpus-sized shuffles are BM25's posting aggregate/top-k
    window and the dedup digest aggregate. The gram probe and the
    flag join-back move eval-suite-sized and flagged-doc-sized rows
    only. Two engines — or two runs — must emit bit-identical
    manifests; that is what the oracle asserts.
    """
    docs = spread_table(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % BENCH_MOD == 0

    ranked = _bm25_ranked(
        spark,
        sf_dir,
        (F.col("doc_id") % BENCH_MOD == 0)
        & (F.col("doc_id") < BENCH_MOD * EVAL_AUDIT_QUERIES),
        EVAL_RETRIEVAL_POOL,
        candidate_pred=F.col("doc_id") % BENCH_MOD != 0,
    )

    # ONE persisted corpus pass for shingles AND quality/dedup columns
    # (r15: the separate quality scan re-tokenized the corpus; see
    # _decon_quality_profile). An un-persisted explode would
    # re-evaluate the whole shingle transform per OUTPUT gram (the
    # text_decontaminate lesson — measured 10x).
    prof = _decon_quality_profile(docs)
    qsh = prof.where(is_bench).select(
        F.col("doc_id").alias("query_id"), F.explode("sh").alias("g")
    )
    cpairs = (
        prof.where(~is_bench)
        .select("doc_id", F.explode("sh").alias("g"))
        .join(F.broadcast(qsh), "g")
        .select("doc_id", "query_id")
        .distinct()
    )
    flagged = (
        cpairs.join(
            ranked.select("query_id", "doc_id", F.lit(1).alias("hit")),
            ["query_id", "doc_id"],
            "left",
        )
        .groupBy("doc_id")
        .agg(F.max(F.coalesce("hit", F.lit(0))).alias("hit_retrieved"))
    )

    kept = prof.where(~is_bench & F.col("q_ok")).select(
        "doc_id", "digest", "n_toks"
    )
    first = kept.groupBy("digest").agg(F.min("doc_id").alias("keep_id"))
    dedup = (
        kept.join(first, "digest")
        .where(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "n_toks")
    )

    audit = dedup.join(flagged, "doc_id", "left").select(
        "doc_id",
        "n_toks",
        F.col("hit_retrieved").isNotNull().alias("fl"),
        F.coalesce("hit_retrieved", F.lit(0)).alias("hr"),
    )
    h = sample_hash32(F.col("doc_id"))
    split = (
        F.when(h < SPLIT_TRAIN_HI, "train")
        .when(h < SPLIT_VAL_HI, "val")
        .otherwise("test")
    )
    return (
        audit.groupBy(
            split.alias("split"),
            (F.col("doc_id") % MANIFEST_SHARDS).alias("shard"),
        )
        .agg(
            F.sum(F.when(~F.col("fl"), 1).otherwise(0))
            .cast("long")
            .alias("n_docs"),
            F.sum(F.when(~F.col("fl"), F.col("n_toks")).otherwise(0))
            .cast("long")
            .alias("n_tokens"),
            F.sum(F.when(F.col("fl"), 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
            F.sum(F.when(F.col("fl"), F.col("n_toks")).otherwise(0))
            .cast("long")
            .alias("n_flagged_tokens"),
            F.sum("hr").cast("long").alias("n_flagged_retrieved"),
        )
    )


def _sql_release_card_over(src: str) -> str:
    """Release-card SQL — quality gate → exact keep-first dedup →
    decontamination gate → per-language card + digest — over an
    arbitrary corpus select `src` (must yield doc_id, lang, text).
    ONE rebuild definition serves `pipeline_release` (the natural
    corpus) and `pipeline_release_inc` (the re-upload-planted corpus
    — whose oracle being the FULL REBUILD makes the driver compare
    itself the card-equals-rebuild proof)."""
    return f"""
    WITH docsrc AS ({src}
    ), qsh AS (
        SELECT DISTINCT unnest({sql_shingles('text', DECON_K)}) AS g
        FROM docsrc WHERE doc_id % {BENCH_MOD} = 0
    ), contaminated AS (
        SELECT DISTINCT e.doc_id
        FROM (SELECT doc_id, unnest({sql_shingles('text', DECON_K)}) AS g
              FROM docsrc WHERE doc_id % {BENCH_MOD} <> 0) e
        JOIN qsh q ON e.g = q.g
    ), kept AS (
        SELECT doc_id, lang, text,
               len(string_split(text, ' ')) AS n_toks
        FROM docsrc
        WHERE doc_id % {BENCH_MOD} <> 0
          AND ({QM_BIAS}
               + {QM_W_TOKENS} * len(string_split(text, ' '))
               + {QM_W_STOP} * len(list_filter(string_split(text, ' '),
                                               t -> t IN ('the', 'a')))
               + {QM_W_DISTINCT}
                   * len(list_distinct(string_split(text, ' ')))
               + {QM_W_LONG} * len(list_filter(string_split(text, ' '),
                                               t -> len(t) > 12)))
              >= {QM_THRESHOLD}
    ), dedup AS (
        SELECT k.doc_id, k.lang, k.n_toks FROM kept k
        WHERE k.doc_id = (SELECT MIN(k2.doc_id) FROM kept k2
                          WHERE md5(k2.text) = md5(k.text))
    ), clean AS (
        SELECT d.doc_id, d.lang, d.n_toks,
               (d.doc_id IN (SELECT doc_id FROM contaminated)) AS fl
        FROM dedup d
    ), per AS (
        SELECT lang,
               CAST(SUM(CASE WHEN NOT fl THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_docs,
               CAST(SUM(CASE WHEN NOT fl THEN n_toks ELSE 0 END)
                    AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN fl THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_flagged
        FROM clean GROUP BY lang
    ), tot AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS grand_total,
               md5(string_agg(
                   lang || ':' || n_docs || ':' || n_tokens, '|'
                   ORDER BY lang)) AS release_digest
        FROM per
    )
    SELECT lang, n_docs, n_tokens, n_flagged,
           CAST(n_docs AS DOUBLE) / CAST(grand_total AS DOUBLE)
               AS doc_share,
           release_digest
    FROM per, tot
    """


_SQL_RELEASE_CARD = _sql_release_card_over(
    "SELECT doc_id, lang, text FROM documents"
)


@query("pipeline_release", oracle=_SQL_RELEASE_CARD)
def pipeline_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The artifact set a corpus RELEASE ships (the r10 verdict's
    stretch composition): the per-language dataset card of the fully
    cleaned release — quality gate → exact keep-first dedup →
    decontamination gate — plus a content-derived RELEASE DIGEST
    pinning the whole card, all as ONE lazy plan.

    Per language: documents and tokens in the release, documents the
    decontamination gate removed, and the language's share of the
    release — `pipeline_dataset_card`'s report recomputed over the
    RELEASE survivors instead of the raw corpus, so the card describes
    what ships, not what was scanned. The `release_digest` column is
    md5 over the (lang, n_docs, n_tokens) rows concatenated in lang
    order — the version pin a release manifest records: two runs, two
    engines, or two sites must produce the identical digest or the
    release is not reproducible (dated publication of the pinned
    artifact is the `sink_partitioned`/`snapshot_*` family's job —
    this key produces the thing worth pinning). The digest is a pure
    function of the card, so the DuckDB oracle replays it exactly
    (string_agg ORDER BY lang == sort_array over the collected
    structs; integers render identically in both engines' string
    casts).

    Composition of verified kernels only: the quality logit and
    keep-first dedup are `pipeline_train_manifest`'s, the broadcast
    5-gram gate is `text_decontaminate`'s (eval grams are
    eval-suite-sized — broadcast; the corpus streams map-only through
    the probe), the card aggregation is `pipeline_dataset_card`'s,
    and the single-row digest/total broadcast is the `with_scalars`
    scalar idiom. Scale shape: two corpus passes (shingles for the
    gate, quality/digest for the manifest — the card aggregates the
    second), one corpus-sized shuffle (the dedup digest aggregate),
    one gram-probe shuffle bounded by the contaminated-doc count, a
    language-sized final aggregate, and a 1-row broadcast back onto
    ~|langs| rows.
    """
    docs = spread_table(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % BENCH_MOD == 0

    # ONE persisted corpus pass for shingles AND quality/dedup columns
    # (r15: the separate _quality_kept scan re-tokenized the corpus;
    # see _decon_quality_profile)
    prof = _decon_quality_profile(docs)
    qgrams = (
        prof.where(is_bench)
        .select(F.explode("sh").alias("g"))
        .distinct()
    )
    contaminated = (
        prof.where(~is_bench)
        .select("doc_id", F.explode("sh").alias("g"))
        .join(F.broadcast(qgrams), "g")
        .select("doc_id")
        .distinct()
    )

    kept = prof.where(~is_bench & F.col("q_ok")).select(
        "doc_id", "lang", "digest", "n_toks"
    )
    first = kept.groupBy("digest").agg(F.min("doc_id").alias("keep_id"))
    dedup = (
        kept.join(first, "digest")
        .where(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "lang", "n_toks")
    )
    clean = dedup.join(
        contaminated.withColumn("fl_", F.lit(True)), "doc_id", "left"
    ).select(
        "lang", "n_toks", F.coalesce("fl_", F.lit(False)).alias("fl")
    )
    return _card_finish(_card_counters(clean))


def _quality_kept(docs: DataFrame) -> DataFrame:
    """Release candidacy, shared by `pipeline_release*` and the
    incremental fold: quality-logit gate over the given documents,
    projected to the dedup universe (doc_id, lang, digest, n_toks).
    The caller supplies the slice (full corpus minus eval suite for
    the rebuild; one ingest batch for the fold)."""
    toks = tokens("text")
    logit = (
        F.lit(QM_BIAS)
        + F.lit(QM_W_TOKENS) * F.size(toks)
        + F.lit(QM_W_STOP)
        * F.size(F.filter(toks, lambda t: t.isin("the", "a")))
        + F.lit(QM_W_DISTINCT) * F.size(F.array_distinct(toks))
        + F.lit(QM_W_LONG)
        * F.size(F.filter(toks, lambda t: F.length(t) > 12))
    )
    return docs.where(logit >= QM_THRESHOLD).select(
        "doc_id",
        "lang",
        F.md5("text").alias("digest"),
        F.size(tokens("text")).alias("n_toks"),
    )


def _decon_quality_profile(docs: DataFrame) -> DataFrame:
    """ONE persisted corpus pass carrying BOTH derived families the
    release/decontamination keys consume: the DECON_K shingle arrays
    (eval-gram branch + corpus probe) AND the quality/dedup columns
    (md5 digest, token count, quality-gate verdict). Until r15 these
    were two independent full scans per key — the persisted shingle
    frame plus a separate tokenize+quality scan of the same documents
    (guide §1 redundant passes; tokenize is the expensive map work
    here: the extra pass measured ~0.75 s warm at sf0.1 per release
    key). Every column is the EXACT expression the split branches
    evaluated (`_quality_kept`'s logit and projection, the shingle
    frame's `shingles_of(tokens(text), DECON_K)`), so consumers are
    bit-identical; downstream InMemoryTableScans prune to the columns
    each branch reads, so the gram branches never deserialize the
    quality columns."""
    toks = F.col("toks")
    logit = (
        F.lit(QM_BIAS)
        + F.lit(QM_W_TOKENS) * F.size(toks)
        + F.lit(QM_W_STOP)
        * F.size(F.filter(toks, lambda t: t.isin("the", "a")))
        + F.lit(QM_W_DISTINCT) * F.size(F.array_distinct(toks))
        + F.lit(QM_W_LONG)
        * F.size(F.filter(toks, lambda t: F.length(t) > 12))
    )
    return (
        docs.select("doc_id", "lang", "text", tokens("text").alias("toks"))
        .select(
            "doc_id",
            "lang",
            shingles_of(toks, DECON_K).alias("sh"),
            F.md5("text").alias("digest"),
            F.size(toks).alias("n_toks"),
            (logit >= QM_THRESHOLD).alias("q_ok"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
        .transform(track)
    )


def _card_counters(clean: DataFrame) -> DataFrame:
    """Per-language card counters over flagged survivors (lang,
    n_toks, fl) — the additive half of the card: pure sums, so a
    batch delta merges into persisted counters by one more sum."""
    return clean.groupBy("lang").agg(
        F.sum(F.when(~F.col("fl"), 1).otherwise(0))
        .cast("long")
        .alias("n_docs"),
        F.sum(F.when(~F.col("fl"), F.col("n_toks")).otherwise(0))
        .cast("long")
        .alias("n_tokens"),
        F.sum(F.when(F.col("fl"), 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
    )


def _card_finish(per: DataFrame) -> DataFrame:
    """The release-card tail shared by `pipeline_release*` and the
    incremental fold: given per-language counters (lang, n_docs,
    n_tokens, n_flagged), attach the grand-total share and the
    content-derived release digest (md5 over lang:n_docs:n_tokens
    rows in lang order) via the 1-row `with_scalars` broadcast. The
    digest is a pure function of the CARD — which is what lets an
    incremental release recompute it from merged counters without
    touching the corpus."""
    tot = per.agg(
        F.sum("n_docs").cast("long").alias("grand_total"),
        F.md5(
            F.encode(
                F.concat_ws(
                    "|",
                    F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.struct("lang", "n_docs", "n_tokens")
                            )
                        ),
                        lambda s: F.concat_ws(
                            ":",
                            s["lang"],
                            s["n_docs"].cast("string"),
                            s["n_tokens"].cast("string"),
                        ),
                    ),
                ),
                "UTF-8",
            )
        ).alias("release_digest"),
    )
    return with_scalars(per, tot).select(
        "lang",
        "n_docs",
        "n_tokens",
        "n_flagged",
        (
            F.col("n_docs").cast("double")
            / F.col("grand_total").cast("double")
        ).alias("doc_share"),
        "release_digest",
    )


#: `pipeline_release_inc`'s ingest split: the batch is every document
#: with doc_id ≡ RESIDUE (mod MOD) — ~10% of the corpus, id-interleaved
#: with the base on purpose. Interleaving is the hard case for an
#: incremental keep-first dedup (a batch id can undercut an
#: already-released duplicate's id), and the card survives it because
#: a digest group's card contribution (lang, n_toks, contamination
#: flag) is a pure function of the TEXT, identical for every member —
#: WHICH member ships can differ from the rebuild, what the card says
#: cannot. The residue avoids 0 so the batch is not the eval suite's
#: own residue class under BENCH_MOD.
RELEASE_INC_MOD = 10
RELEASE_INC_RESIDUE = 3

#: Planted re-uploads for the ingest batch: the testdata corpus has
#: ZERO exact-duplicate texts below sf0.1, so without planting the
#: fold's index anti-join would pass VACUOUSLY at the driver's
#: correctness SF (the round-4 cluster_assign lesson). Every base doc
#: with doc_id ≡ 6 (mod 20) is re-collected once (and ≡ 6 (mod 40) a
#: second time, exercising within-batch keep-first) at
#: BASE + 970·doc_id + 3. The arithmetic pins the planted ids into
#: exactly the right classes: 970 ≡ 0 (mod 10) and (mod 97) and the
#: bases are multiples of 970, so every plant is ≡ 3 (mod 10) —
#: always in the ingest batch — and ≡ 3 (mod 97) — never in the eval
#: suite (a re-upload must not grow the gate that would then flag its
#: own source; the pipeline_release_semantic_prod discipline).
DOCPLANT_EVERY = 20
DOCPLANT_EVERY2 = 40
DOCPLANT_RESIDUE = 6
DOCPLANT_STRIDE = 970
DOCPLANT_BASE1 = 10_670_000  # 970 × 11 000
DOCPLANT_BASE2 = 21_340_000  # 970 × 22 000


def _docs_planted(docs: DataFrame) -> DataFrame:
    """documents (doc_id, lang, text) augmented with the planted
    re-upload generations (see DOCPLANT_*) — the corpus
    `pipeline_release_inc` releases. Pure column arithmetic, replayed
    exactly by `_sql_release_inc`'s UNION arms."""
    base = docs.select("doc_id", "lang", "text")

    def gen(every: int, plant_base: int) -> DataFrame:
        return base.where(
            F.col("doc_id") % every == DOCPLANT_RESIDUE
        ).select(
            (
                F.lit(plant_base)
                + F.lit(DOCPLANT_STRIDE) * F.col("doc_id")
                + F.lit(3)
            ).alias("doc_id"),
            "lang",
            "text",
        )

    return base.unionByName(
        gen(DOCPLANT_EVERY, DOCPLANT_BASE1)
    ).unionByName(gen(DOCPLANT_EVERY2, DOCPLANT_BASE2))


def _sql_release_inc() -> str:
    """Full-value DuckDB oracle for `pipeline_release_inc`: the card
    FULL REBUILD (`_sql_release_card_over`) over the re-upload-planted
    corpus — the incremental fold must reproduce it bit-for-bit,
    digest included."""
    arm = (
        "SELECT {b} + {s} * doc_id + 3 AS doc_id, lang, text "
        "FROM documents WHERE doc_id % {e} = {r}"
    )
    return _sql_release_card_over(
        "SELECT doc_id, lang, text FROM documents UNION ALL "
        + arm.format(
            b=DOCPLANT_BASE1,
            s=DOCPLANT_STRIDE,
            e=DOCPLANT_EVERY,
            r=DOCPLANT_RESIDUE,
        )
        + " UNION ALL "
        + arm.format(
            b=DOCPLANT_BASE2,
            s=DOCPLANT_STRIDE,
            e=DOCPLANT_EVERY2,
            r=DOCPLANT_RESIDUE,
        )
    )


def _release_inc_dirs(sf_dir: str) -> dict[str, str]:
    """`pipeline_release_inc`'s persisted state layout, shared with
    tests: the fixed eval-suite gram set, the released-digest index,
    and the per-language card counters — everything ingest N+1 needs,
    none of it corpus-sized except the digest index (one column,
    scanned map-only under a broadcast probe)."""
    from crime_data_batch_processing_spark.fixtures import scratch_dir

    base = scratch_dir(
        f"relinc_m{RELEASE_INC_MOD}r{RELEASE_INC_RESIDUE}"
        f"_q{QM_THRESHOLD}k{DECON_K}b{BENCH_MOD}"
        f"_p{DOCPLANT_EVERY}s{DOCPLANT_STRIDE}_v1",
        sf_dir,
        "documents",
    )
    return {
        "base": base,
        "qgrams": f"{base}/qgrams",
        "index": f"{base}/index",
        "card": f"{base}/card",
    }


@query("pipeline_release_inc", oracle=_sql_release_inc())
def pipeline_release_inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INCREMENTAL release (r13 verdict item 2): maintain the
    user-facing release deliverable — `pipeline_release`'s
    per-language card + content digest — per ingest, instead of
    recomputing the corpus. The incremental ladder already covered
    exact digests (`dedup_incremental`), graph edges
    (`sim_search_knn_inc_prod`), curation verdicts
    (`dedup_semantic_inc`), media (`multimodal_dedup_semantic_inc`),
    and index maintenance (`sim_search_index_append`/`_maintain`);
    this key closes it at the artifact users actually consume.

    Persisted state (fixture = "the release as of ingest N"): the
    fixed eval-suite gram set (eval suites are curated upfront — the
    gate never grows with crawl data, which is what keeps base card
    rows immutable), the released-digest index, and the per-language
    card counters. The ingest fold over batch B (the
    RELEASE_INC_MOD/RESIDUE slice) runs: quality gate → within-batch
    keep-first dedup → digest-index anti-join (broadcast the BATCH's
    digests, scan the index's one pruned column map-only — the
    parquet-honest equivalent of a bucketed index lookup) →
    broadcast gram decon probe → per-language delta → one additive
    merge into the persisted counters → `_card_finish` recomputes
    share + digest from |langs| rows. Total per-ingest cost:
    O(batch) compute + one single-column index scan; the corpus's
    text is never re-read.

    CARD-EQUALS-REBUILD is the whole contract, and it is checked
    twice: the registered oracle IS the full-corpus rebuild SQL over
    the same planted corpus (the driver compare proves the fold
    reproduces the rebuild, digest included), and tests pin the
    output against a Spark full rebuild tuple-exact. The corpus
    carries planted re-uploads (DOCPLANT_*) because the natural
    testdata has zero exact duplicates below sf0.1 — without them
    the fold's defining move (the index anti-join dropping an
    already-released text) would pass vacuously. Why equality holds
    under id-interleaving: see RELEASE_INC_MOD — a displaced
    survivor has identical text, hence identical (lang, n_toks,
    flag), hence identical card. Reference analog: the reference
    recomputes its one summary from the full catalog every run
    (/root/reference/spark_process_script.py:35-39); this is the
    shape that survives when the catalog is 100 TB and the day's
    crawl is 0.1% of it.
    """
    from pyspark.sql import Window

    from crime_data_batch_processing_spark.fixtures import build_once

    dirs = _release_inc_dirs(sf_dir)
    docs = spread(
        _docs_planted(load_table(spark, sf_dir, "documents")),
        spark,
        probe_key=f"{sf_dir}/documents#planted",
    )
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    is_batch = (
        F.col("doc_id") % RELEASE_INC_MOD == RELEASE_INC_RESIDUE
    )

    def build() -> None:
        # the release as of ingest N: eval grams over the FULL corpus
        # (fixed suite), then pipeline_release's stages over the base
        # slice only
        with_sh = (
            docs.select("doc_id", tokens("text").alias("toks"))
            .select(
                "doc_id", shingles_of(F.col("toks"), DECON_K).alias("sh")
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            qgrams = (
                with_sh.where(is_bench)
                .select(F.explode("sh").alias("g"))
                .distinct()
            )
            qgrams.write.mode("overwrite").parquet(dirs["qgrams"])
            kept = _quality_kept(
                docs.where(~is_batch & ~is_bench)
            ).persist(StorageLevel.MEMORY_AND_DISK)
            try:
                first = kept.groupBy("digest").agg(
                    F.min("doc_id").alias("keep_id")
                )
                dedup = (
                    kept.join(first, "digest")
                    .where(F.col("doc_id") == F.col("keep_id"))
                    .select("digest", "doc_id", "lang", "n_toks")
                    .persist(StorageLevel.MEMORY_AND_DISK)
                )
                try:
                    dedup.select("digest", "doc_id").write.mode(
                        "overwrite"
                    ).parquet(dirs["index"])
                    contaminated = (
                        with_sh.where(~is_bench & ~is_batch)
                        .select("doc_id", F.explode("sh").alias("g"))
                        .join(
                            F.broadcast(
                                spark.read.parquet(dirs["qgrams"])
                            ),
                            "g",
                        )
                        .select("doc_id")
                        .distinct()
                    )
                    clean = dedup.join(
                        contaminated.withColumn("fl_", F.lit(True)),
                        "doc_id",
                        "left",
                    ).select(
                        "lang",
                        "n_toks",
                        F.coalesce("fl_", F.lit(False)).alias("fl"),
                    )
                    _card_counters(clean).write.mode(
                        "overwrite"
                    ).parquet(dirs["card"])
                finally:
                    dedup.unpersist()
            finally:
                kept.unpersist()
        finally:
            with_sh.unpersist()

    build_once(dirs["base"], build)

    # ---- the per-ingest fold: O(batch) + one pruned index scan ----
    batch = docs.where(is_batch)
    dedup_b = track(
        _quality_kept(batch.where(~is_bench))
        .withColumn(
            "keep_id",
            F.min("doc_id").over(
                Window.partitionBy("digest")
            ),
        )
        .where(F.col("doc_id") == F.col("keep_id"))
        .select("digest", "doc_id", "lang", "n_toks")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # broadcast the batch's digests AT the index, never the reverse:
    # the index is corpus-sized, the batch is an ingest
    matched = (
        spark.read.parquet(dirs["index"])
        .join(F.broadcast(dedup_b.select("digest")), "digest")
        .select("digest")
        .distinct()
    )
    new_b = dedup_b.join(F.broadcast(matched), "digest", "left_anti")
    batch_sh = track(
        batch.where(~is_bench)
        .select("doc_id", tokens("text").alias("toks"))
        .select(
            "doc_id", shingles_of(F.col("toks"), DECON_K).alias("sh")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    contaminated_b = (
        batch_sh.select("doc_id", F.explode("sh").alias("g"))
        .join(F.broadcast(spark.read.parquet(dirs["qgrams"])), "g")
        .select("doc_id")
        .distinct()
    )
    clean_b = new_b.join(
        contaminated_b.withColumn("fl_", F.lit(True)), "doc_id", "left"
    ).select(
        "lang", "n_toks", F.coalesce("fl_", F.lit(False)).alias("fl")
    )
    merged = (
        spark.read.parquet(dirs["card"])
        .unionByName(_card_counters(clean_b))
        .groupBy("lang")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("n_flagged").cast("long").alias("n_flagged"),
        )
    )
    return _card_finish(merged)


#: Semantic-dedup threshold for the RELEASE pipeline: this corpus's
#: semantic-duplicate regime sits at cosine 0.4-0.6 (the same
#: adjudication behind `dedup_embedding`'s COSINE_THRESHOLD and the
#: weak band geometry's existence) — at the production SEMDEDUP_TAU
#: of 0.9 NOT ONE real document pairs up (corpus max true cosine
#: 0.60), so a release gated there would ship a vacuous semantic
#: stage. The verdict kernel and the keep-first witness rule are
#: identical at both thresholds; only the regime constant flips,
#: exactly as the band geometry does between the weak and prod kNN
#: keys.
RELEASE_SEMDEDUP_TAU = COSINE_THRESHOLD


def _sql_release_semantic() -> str:
    """Full-value DuckDB oracle for `pipeline_release_semantic`: the
    weak-geometry kNN-graph chain + the shared SemDeDup witness CTE
    (the drop verdict), then `pipeline_release`'s quality → exact
    keep-first dedup → decon-gate → per-language card CTEs with the
    semantic stage spliced between dedup and the gate."""
    from crime_data_batch_processing_spark.operators.similarity import (
        sql_knn_graph_ctes,
    )

    return f"""
    WITH {sql_knn_graph_ctes()},
    {sql_semantic_witness_cte(RELEASE_SEMDEDUP_TAU)},
    qsh AS (
        SELECT DISTINCT unnest({sql_shingles('text', DECON_K)}) AS g
        FROM documents WHERE doc_id % {BENCH_MOD} = 0
    ), contaminated AS (
        SELECT DISTINCT e.doc_id
        FROM (SELECT doc_id, unnest({sql_shingles('text', DECON_K)}) AS g
              FROM documents WHERE doc_id % {BENCH_MOD} <> 0) e
        JOIN qsh q ON e.g = q.g
    ), kept AS (
        SELECT doc_id, lang, text,
               len(string_split(text, ' ')) AS n_toks
        FROM documents
        WHERE doc_id % {BENCH_MOD} <> 0
          AND ({QM_BIAS}
               + {QM_W_TOKENS} * len(string_split(text, ' '))
               + {QM_W_STOP} * len(list_filter(string_split(text, ' '),
                                               t -> t IN ('the', 'a')))
               + {QM_W_DISTINCT}
                   * len(list_distinct(string_split(text, ' ')))
               + {QM_W_LONG} * len(list_filter(string_split(text, ' '),
                                               t -> len(t) > 12)))
              >= {QM_THRESHOLD}
    ), dedup AS (
        SELECT k.doc_id, k.lang, k.n_toks FROM kept k
        WHERE k.doc_id = (SELECT MIN(k2.doc_id) FROM kept k2
                          WHERE md5(k2.text) = md5(k.text))
    ), clean AS (
        SELECT d.doc_id, d.lang, d.n_toks,
               (d.doc_id IN (SELECT vec_id FROM witness)) AS sem,
               (d.doc_id IN (SELECT doc_id FROM contaminated)) AS fl
        FROM dedup d
    ), per AS (
        SELECT lang,
               CAST(SUM(CASE WHEN NOT sem AND NOT fl THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN NOT sem AND NOT fl THEN n_toks
                             ELSE 0 END) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN NOT sem AND fl THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_flagged,
               CAST(SUM(CASE WHEN sem THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_semantic
        FROM clean GROUP BY lang
    ), tot AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS grand_total,
               md5(string_agg(
                   lang || ':' || n_docs || ':' || n_tokens, '|'
                   ORDER BY lang)) AS release_digest
        FROM per
    )
    SELECT lang, n_docs, n_tokens, n_flagged, n_semantic,
           CAST(n_docs AS DOUBLE) / CAST(grand_total AS DOUBLE)
               AS doc_share,
           release_digest
    FROM per, tot
    """


@query("pipeline_release_semantic", oracle=_sql_release_semantic())
def pipeline_release_semantic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """`pipeline_release` with the SEMANTIC dedup stage a SemDeDup
    curation pass actually ships (the r11 verdict's item 3): quality
    gate → exact keep-first dedup → **semantic keep/drop verdict**
    (`semantic_verdict`, the `dedup_semantic` kernel, consumed over
    the corpus kNN graph at the corpus's semantic-duplicate regime —
    see RELEASE_SEMDEDUP_TAU) → decontamination gate → per-language
    dataset card + release digest, ONE lazy plan.

    Stage order is the curation pipeline's: semantic drops are
    removed BEFORE the decon gate (a semantically-deduplicated doc
    never reaches the gate, so n_flagged counts semantic survivors
    only), and the card gains an `n_semantic` column — per language,
    how many exact-dedup survivors the semantic verdict removed.
    At sf0.01 the verdict drops 40 of 500 docs (measured, not
    incidental): the semantic stage does real work on driver data,
    which is what makes this key's oracle non-vacuous. The digest
    stays md5 over (lang, n_docs, n_tokens) in lang order — the pin
    now covers WHAT SHIPS AFTER semantic curation, so two engines or
    two sites disagreeing on one drop verdict produce different
    digests (the reproducibility property the digest exists for).

    Composition of verified kernels only: the weak-geometry corpus
    kNN graph (`sim_search_knn_graph` — the SemDeDup input shape),
    the shared `semantic_verdict` kernel (llm_dedup), and
    `pipeline_release`'s quality/dedup/gate/card/digest stages.
    Scale shape adds ONE k·N-bounded branch to `pipeline_release`'s:
    the graph build (linear in corpus + band collisions), the O(k·N)
    verdict window, and a broadcast-sized semantic-drop join against
    the manifest — the card aggregate and digest broadcast are
    unchanged.
    """
    from crime_data_batch_processing_spark.operators.similarity import (
        sim_search_knn_graph,
    )

    docs = spread_table(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % BENCH_MOD == 0

    # ONE persisted corpus pass for shingles AND quality/dedup columns
    # (r15: the separate quality scan re-tokenized the corpus; see
    # _decon_quality_profile)
    prof = _decon_quality_profile(docs)
    qgrams = (
        prof.where(is_bench)
        .select(F.explode("sh").alias("g"))
        .distinct()
    )
    contaminated = (
        prof.where(~is_bench)
        .select("doc_id", F.explode("sh").alias("g"))
        .join(F.broadcast(qgrams), "g")
        .select("doc_id")
        .distinct()
    )

    kept = prof.where(~is_bench & F.col("q_ok")).select(
        "doc_id", "lang", "digest", "n_toks"
    )
    first = kept.groupBy("digest").agg(F.min("doc_id").alias("keep_id"))
    dedup = (
        kept.join(first, "digest")
        .where(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "lang", "n_toks")
    )

    # the SEMANTIC stage: the dedup_semantic keep/drop verdict over
    # the corpus kNN graph, consumed as a broadcast-sized drop list
    # (drops are a small fraction of the corpus by construction —
    # they are the duplicates)
    verdict = semantic_verdict(
        sim_search_knn_graph(spark, sf_dir),
        load_table(spark, sf_dir, "embeddings").select("vec_id"),
        RELEASE_SEMDEDUP_TAU,
    )
    sem_drops = (
        verdict.where(~F.col("kept"))
        .select(F.col("vec_id").alias("doc_id"))
        .withColumn("sem_", F.lit(True))
    )

    clean = (
        dedup.join(F.broadcast(sem_drops), "doc_id", "left")
        .join(
            contaminated.withColumn("fl_", F.lit(True)), "doc_id", "left"
        )
        .select(
            "lang",
            "n_toks",
            F.coalesce("sem_", F.lit(False)).alias("sem"),
            F.coalesce("fl_", F.lit(False)).alias("fl"),
        )
    )
    per = clean.groupBy("lang").agg(
        F.sum(F.when(~F.col("sem") & ~F.col("fl"), 1).otherwise(0))
        .cast("long")
        .alias("n_docs"),
        F.sum(
            F.when(~F.col("sem") & ~F.col("fl"), F.col("n_toks"))
            .otherwise(0)
        )
        .cast("long")
        .alias("n_tokens"),
        F.sum(F.when(~F.col("sem") & F.col("fl"), 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
        F.sum(F.when(F.col("sem"), 1).otherwise(0))
        .cast("long")
        .alias("n_semantic"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("long").alias("grand_total"),
        F.md5(
            F.encode(
                F.concat_ws(
                    "|",
                    F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.struct("lang", "n_docs", "n_tokens")
                            )
                        ),
                        lambda s: F.concat_ws(
                            ":",
                            s["lang"],
                            s["n_docs"].cast("string"),
                            s["n_tokens"].cast("string"),
                        ),
                    ),
                ),
                "UTF-8",
            )
        ).alias("release_digest"),
    )
    return with_scalars(per, tot).select(
        "lang",
        "n_docs",
        "n_tokens",
        "n_flagged",
        "n_semantic",
        (
            F.col("n_docs").cast("double")
            / F.col("grand_total").cast("double")
        ).alias("doc_share"),
        "release_digest",
    )


#: Deterministic text mutation for the planted RE-UPLOAD documents of
#: the prod-regime semantic release: appending one token changes the
#: md5 digest (so EXACT dedup cannot catch the copy — only the
#: semantic stage can) while both engines replay the mutated text
#: bit-identically. Models the real near-identical-rewrite scenario
#: SemDeDup exists for.
RELEASE_PLANT_SUFFIX = " reupload"


def _sql_release_semantic_prod() -> str:
    """Full-value DuckDB oracle for `pipeline_release_semantic_prod`:
    the PRODUCTION-geometry kNN-graph chain over the planted
    embeddings corpus + the shared SemDeDup witness CTE at the
    production SEMDEDUP_TAU, then `pipeline_release`'s quality →
    exact keep-first dedup → semantic stage → decon-gate →
    per-language card CTEs over the AUGMENTED document corpus (base
    docs plus a deterministically mutated re-upload copy of every
    embedding-covered PLANT_EVERY-th doc). The eval/bench set is the
    BASE corpus's only (doc_id < PLANT_OFFSET in qsh): a planted
    re-upload must never become an eval query, or its grams would
    contaminate its own source and every near-dup of it."""
    from crime_data_batch_processing_spark.operators.llm_dedup import (
        _sql_knn_graph_prod_ctes,
        PLANT_EVERY,
        PLANT_OFFSET,
        SEMDEDUP_TAU,
    )

    return f"""
    WITH {_sql_knn_graph_prod_ctes()},
    {sql_semantic_witness_cte(SEMDEDUP_TAU)},
    docaug AS (
        SELECT doc_id, lang, text FROM documents
        UNION ALL
        SELECT doc_id + {PLANT_OFFSET} AS doc_id, lang,
               text || '{RELEASE_PLANT_SUFFIX}' AS text
        FROM documents
        WHERE doc_id % {PLANT_EVERY} = 0
          AND doc_id IN (SELECT vec_id FROM embeddings)
    ),
    qsh AS (
        SELECT DISTINCT unnest({sql_shingles('text', DECON_K)}) AS g
        FROM docaug
        WHERE doc_id % {BENCH_MOD} = 0 AND doc_id < {PLANT_OFFSET}
    ), contaminated AS (
        SELECT DISTINCT e.doc_id
        FROM (SELECT doc_id, unnest({sql_shingles('text', DECON_K)}) AS g
              FROM docaug
              WHERE doc_id % {BENCH_MOD} <> 0
                 OR doc_id >= {PLANT_OFFSET}) e
        JOIN qsh q ON e.g = q.g
    ), kept AS (
        SELECT doc_id, lang, text,
               len(string_split(text, ' ')) AS n_toks
        FROM docaug
        WHERE (doc_id % {BENCH_MOD} <> 0 OR doc_id >= {PLANT_OFFSET})
          AND ({QM_BIAS}
               + {QM_W_TOKENS} * len(string_split(text, ' '))
               + {QM_W_STOP} * len(list_filter(string_split(text, ' '),
                                               t -> t IN ('the', 'a')))
               + {QM_W_DISTINCT}
                   * len(list_distinct(string_split(text, ' ')))
               + {QM_W_LONG} * len(list_filter(string_split(text, ' '),
                                               t -> len(t) > 12)))
              >= {QM_THRESHOLD}
    ), dedup AS (
        SELECT k.doc_id, k.lang, k.n_toks FROM kept k
        WHERE k.doc_id = (SELECT MIN(k2.doc_id) FROM kept k2
                          WHERE md5(k2.text) = md5(k.text))
    ), clean AS (
        SELECT d.doc_id, d.lang, d.n_toks,
               (d.doc_id IN (SELECT vec_id FROM witness)) AS sem,
               (d.doc_id IN (SELECT doc_id FROM contaminated)) AS fl
        FROM dedup d
    ), per AS (
        SELECT lang,
               CAST(SUM(CASE WHEN NOT sem AND NOT fl THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN NOT sem AND NOT fl THEN n_toks
                             ELSE 0 END) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN NOT sem AND fl THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_flagged,
               CAST(SUM(CASE WHEN sem THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_semantic
        FROM clean GROUP BY lang
    ), tot AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS grand_total,
               md5(string_agg(
                   lang || ':' || n_docs || ':' || n_tokens, '|'
                   ORDER BY lang)) AS release_digest
        FROM per
    )
    SELECT lang, n_docs, n_tokens, n_flagged, n_semantic,
           CAST(n_docs AS DOUBLE) / CAST(grand_total AS DOUBLE)
               AS doc_share,
           release_digest
    FROM per, tot
    """


@query(
    "pipeline_release_semantic_prod",
    oracle=_sql_release_semantic_prod(),
)
def pipeline_release_semantic_prod(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The semantic release at the PRODUCTION regime (the r12
    verdict's item 1): `pipeline_release_semantic`'s composition with
    the semantic stage run at the production 64-bit/8×8 band geometry
    and SEMDEDUP_TAU 0.9, over a corpus where that regime is
    NON-VACUOUS — the planted embeddings corpus `dedup_semantic`
    decides over, joined to documents by the identity doc↔vec fixture
    mapping.

    Why this key exists: `pipeline_release_semantic` runs its graph
    branch at the weak 18-bit/6×3 geometry and tau 0.4 because the
    natural documents corpus tops out at cosine 0.60 — honest, but
    the weak geometry's measured FLAT ~55% candidate mass makes its
    banded self-join effectively quadratic (s100 soak DNF). Here the
    DOCUMENT corpus itself is augmented to carry the production
    semantic regime: every embedding-covered PLANT_EVERY-th document
    gains a deterministic RE-UPLOAD copy (id + PLANT_OFFSET, text +
    RELEASE_PLANT_SUFFIX) whose embedding is the jittered planted
    vector at cos ≈ 0.9999. The suffix changes the md5, so EXACT
    dedup cannot catch the re-upload — only the semantic verdict can,
    and at tau 0.9 the verdict drops exactly the planted copies
    (nothing natural reaches 0.60). The shipped release artifact is
    therefore curated at prod constants end-to-end, and every stage
    scales: the graph branch holds the measured 3.7–3.8% candidate
    ratio that COMPLETES the s100 soak tier where the weak branch
    DNFs.

    Composition of verified kernels only: the full `dedup_semantic`
    verdict frame (prod graph + shared `semantic_verdict` kernel) is
    consumed as the drop list; quality gate, exact keep-first dedup,
    broadcast decon gate, per-language card, and the md5 release
    digest are `pipeline_release`'s stages over the augmented corpus.
    Scale shape vs `pipeline_release`: one extra corpus-sized
    semi-join (docs ⋈ embedding ids — the doc↔vec mapping), the
    linear signature pass + 3.7%-candidate banded join of the prod
    graph, the O(k·N) verdict window, and a broadcast-sized semantic
    drop join; the card aggregate and 1-row digest broadcast are
    unchanged.
    """
    from crime_data_batch_processing_spark.operators.llm_dedup import (
        PLANT_EVERY,
        PLANT_OFFSET,
        dedup_semantic,
    )

    docs = spread_table(spark, sf_dir, "documents")
    # the doc↔vec fixture mapping is identity over the embedding-
    # covered prefix; plant re-uploads ONLY for covered docs so the
    # semantic drop set covers the planted set exactly (at sf0.1 the
    # doc corpus outnumbers the vectors)
    vec_ids = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.col("vec_id").alias("doc_id"))
    )
    planted_docs = (
        docs.where(F.col("doc_id") % PLANT_EVERY == 0)
        .join(vec_ids, "doc_id", "semi")
        .select(
            (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
            "lang",
            F.concat("text", F.lit(RELEASE_PLANT_SUFFIX)).alias("text"),
        )
    )
    docaug = docs.select("doc_id", "lang", "text").unionByName(
        planted_docs
    )
    # the eval/bench set is the BASE corpus's only: a planted
    # re-upload must never become an eval query (its grams would
    # contaminate its own source and every near-dup of it)
    is_bench = (F.col("doc_id") % BENCH_MOD == 0) & (
        F.col("doc_id") < PLANT_OFFSET
    )

    # ONE persisted corpus pass for shingles AND quality/dedup columns
    # over the AUGMENTED corpus (r15: the separate quality scan
    # re-tokenized it; see _decon_quality_profile)
    prof = _decon_quality_profile(docaug)
    qgrams = (
        prof.where(is_bench)
        .select(F.explode("sh").alias("g"))
        .distinct()
    )
    contaminated = (
        prof.where(~is_bench)
        .select("doc_id", F.explode("sh").alias("g"))
        .join(F.broadcast(qgrams), "g")
        .select("doc_id")
        .distinct()
    )

    kept = prof.where(~is_bench & F.col("q_ok")).select(
        "doc_id", "lang", "digest", "n_toks"
    )
    first = kept.groupBy("digest").agg(F.min("doc_id").alias("keep_id"))
    dedup = (
        kept.join(first, "digest")
        .where(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "lang", "n_toks")
    )

    # the SEMANTIC stage at PROD constants: the full dedup_semantic
    # verdict frame (prod graph over the planted corpus, tau 0.9),
    # consumed as a broadcast-sized drop list — drops are exactly the
    # planted re-uploads, a small fraction by construction
    sem_drops = (
        dedup_semantic(spark, sf_dir)
        .where(~F.col("kept"))
        .select(F.col("vec_id").alias("doc_id"))
        .withColumn("sem_", F.lit(True))
    )

    clean = (
        dedup.join(F.broadcast(sem_drops), "doc_id", "left")
        .join(
            contaminated.withColumn("fl_", F.lit(True)), "doc_id", "left"
        )
        .select(
            "lang",
            "n_toks",
            F.coalesce("sem_", F.lit(False)).alias("sem"),
            F.coalesce("fl_", F.lit(False)).alias("fl"),
        )
    )
    per = clean.groupBy("lang").agg(
        F.sum(F.when(~F.col("sem") & ~F.col("fl"), 1).otherwise(0))
        .cast("long")
        .alias("n_docs"),
        F.sum(
            F.when(~F.col("sem") & ~F.col("fl"), F.col("n_toks"))
            .otherwise(0)
        )
        .cast("long")
        .alias("n_tokens"),
        F.sum(F.when(~F.col("sem") & F.col("fl"), 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
        F.sum(F.when(F.col("sem"), 1).otherwise(0))
        .cast("long")
        .alias("n_semantic"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("long").alias("grand_total"),
        F.md5(
            F.encode(
                F.concat_ws(
                    "|",
                    F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.struct("lang", "n_docs", "n_tokens")
                            )
                        ),
                        lambda s: F.concat_ws(
                            ":",
                            s["lang"],
                            s["n_docs"].cast("string"),
                            s["n_tokens"].cast("string"),
                        ),
                    ),
                ),
                "UTF-8",
            )
        ).alias("release_digest"),
    )
    return with_scalars(per, tot).select(
        "lang",
        "n_docs",
        "n_tokens",
        "n_flagged",
        "n_semantic",
        (
            F.col("n_docs").cast("double")
            / F.col("grand_total").cast("double")
        ).alias("doc_share"),
        "release_digest",
    )


#: `pipeline_release_media`'s exact-re-upload generation: every
#: PLANT_EVERY-th payload re-crawled BYTE-IDENTICAL under a new id at
#: +2·PLANT_OFFSET (the near-dup generation sits at +PLANT_OFFSET
#: with the single-space suffix, multimodal.MEDIA_PLANT_SUFFIX) — so
#: each planted source exercises BOTH drop paths: its exact copy dies
#: at the digest stage, its near copy at the semantic stage.
MEDIA_RELEASE_EXACT_MULT = 2


def _sql_release_media() -> str:
    """Full-value DuckDB oracle for `pipeline_release_media`: replay
    the three-generation corpus (base ∪ near-dup plants ∪ exact
    plants), the validity gate, the byte-digest keep-first dedup, the
    wide-geometry semantic witness (the shared media chain — its
    `pay` corpus equals the exact stage's survivors because every
    exact plant shares its source's digest and loses keep-first,
    which this replay re-derives rather than assumes), and the
    per-language asset card + digest."""
    from crime_data_batch_processing_spark.operators.llm_dedup import (
        PLANT_EVERY,
        PLANT_OFFSET,
        sql_semantic_witness_cte,
    )
    from crime_data_batch_processing_spark.operators.multimodal import (
        MEDIA_COSINE_THRESHOLD,
        MEDIA_GRAM_K,
        MEDIA_PLANT_SUFFIX,
        MEDIA_WIDE_BAND_BITS,
        MEDIA_WIDE_BANDS,
        MEDIA_WIDE_BITS,
        _sql_media_ctes,
    )

    exact_off = MEDIA_RELEASE_EXACT_MULT * PLANT_OFFSET
    return f"""
    WITH {_sql_media_ctes(
        MEDIA_WIDE_BITS,
        MEDIA_WIDE_BANDS,
        MEDIA_WIDE_BAND_BITS,
        materialized=True,
    )}, ranked AS (
        SELECT vec_a AS src, 1 AS rank, vec_b AS dst, cos_sim
        FROM scored WHERE cos_sim >= {MEDIA_COSINE_THRESHOLD}
        UNION ALL
        SELECT vec_b AS src, 1 AS rank, vec_a AS dst, cos_sim
        FROM scored WHERE cos_sim >= {MEDIA_COSINE_THRESHOLD}
    ), {sql_semantic_witness_cte(MEDIA_COSINE_THRESHOLD)},
    corpus3 AS (
        SELECT doc_id, lang, text FROM documents
        UNION ALL
        SELECT doc_id + {PLANT_OFFSET} AS doc_id, lang,
               text || '{MEDIA_PLANT_SUFFIX}' AS text
        FROM documents WHERE doc_id % {PLANT_EVERY} = 0
        UNION ALL
        SELECT doc_id + {exact_off} AS doc_id, lang, text
        FROM documents WHERE doc_id % {PLANT_EVERY} = 0
    ), valid AS (
        SELECT * FROM corpus3 WHERE length(text) >= {MEDIA_GRAM_K}
    ), surv AS (
        SELECT doc_id, lang, length(text) AS blen FROM (
            SELECT doc_id, lang, text,
                   MIN(doc_id) OVER (PARTITION BY md5(text)) AS m
            FROM valid
        ) WHERE doc_id = m
    ), clean AS (
        SELECT s.lang, s.blen, (w.vec_id IS NOT NULL) AS fl
        FROM surv s LEFT JOIN witness w ON s.doc_id = w.vec_id
    ), per AS (
        SELECT lang,
               CAST(SUM(CASE WHEN NOT fl THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_assets,
               CAST(SUM(CASE WHEN NOT fl THEN blen ELSE 0 END)
                    AS BIGINT) AS n_bytes,
               CAST(SUM(CASE WHEN fl THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dropped_semantic
        FROM clean GROUP BY lang
    ), tot AS (
        SELECT CAST(SUM(n_assets) AS BIGINT) AS grand_total,
               md5(string_agg(
                   lang || ':' || n_assets || ':' || n_bytes, '|'
                   ORDER BY lang)) AS release_digest
        FROM per
    )
    SELECT lang, n_assets, n_bytes, n_dropped_semantic,
           CAST(n_assets AS DOUBLE) / CAST(grand_total AS DOUBLE)
               AS asset_share,
           release_digest
    FROM per, tot
    """


@query("pipeline_release_media", oracle=_sql_release_media())
def pipeline_release_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RELEASE pipeline's multimodal twin (r13 verdict stretch
    item 8), closing the release family across both corpora: the
    per-language dataset card of a shipped MEDIA release — validity
    gate → exact byte-digest dedup → wide-geometry SEMANTIC dedup —
    plus the content-derived release digest, all the release-card
    discipline of `pipeline_release` applied to the envelope chain of
    `pipeline_media_ingest`.

    The corpus plants BOTH re-upload classes a crawler produces (see
    MEDIA_RELEASE_EXACT_MULT): byte-identical re-crawls die at the
    digest stage (`multimodal_dedup`'s window kernel), single-space
    near-dups at cos ≈ 0.9999 die at the semantic stage
    (`multimodal_dedup_semantic_wide`'s banded machinery +
    `semantic_verdict` at the media threshold) with their source as
    witness, and natural ≥ 0.97 byte-space groups are curated
    identically. Card semantics: n_assets/n_bytes are what SHIPS,
    n_dropped_semantic is the semantic audit trail (the text card's
    n_flagged seat), and the digest pins the card exactly as
    `_card_finish` does for text.

    Scale shape: one digest window (uniform shuffle — cryptographic
    key), the one Arrow embed pass, the banded wide-geometry machinery
    (0.042% measured candidate mass), a language-sized aggregate, and
    the 1-row digest broadcast. The embed seam
    (`_media_corpus_embedded`) covers exactly the exact-stage
    survivors — every exact plant shares its source's digest and
    loses keep-first (asserted in tests; the oracle re-derives rather
    than assumes it) — so the semantic stage never embeds a payload
    the digest stage already dropped, the ordering
    `pipeline_media_ingest` documents as the whole cost story with
    real decoders.
    """
    from pyspark.sql import Window

    from crime_data_batch_processing_spark.operators.llm_dedup import (
        PLANT_EVERY,
        PLANT_OFFSET,
        semantic_verdict,
    )
    from crime_data_batch_processing_spark.operators.multimodal import (
        MEDIA_COSINE_THRESHOLD,
        MEDIA_GRAM_K,
        MEDIA_PLANT_SUFFIX,
        MEDIA_WIDE_BAND_BITS,
        MEDIA_WIDE_BANDS,
        MEDIA_WIDE_BITS,
        _media_corpus_embedded,
    )
    from crime_data_batch_processing_spark.operators.similarity import (
        banded_scored_pairs,
        signature_frame,
    )

    docs = spread_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    planted_src = F.col("doc_id") % PLANT_EVERY == 0
    near = docs.where(planted_src).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
        "lang",
        F.concat("text", F.lit(MEDIA_PLANT_SUFFIX)).alias("text"),
    )
    exact = docs.where(planted_src).select(
        (
            F.col("doc_id") + MEDIA_RELEASE_EXACT_MULT * PLANT_OFFSET
        ).alias("doc_id"),
        "lang",
        "text",
    )
    valid = (
        docs.unionByName(near)
        .unionByName(exact)
        .where(F.length("text") >= MEDIA_GRAM_K)
    )
    w = Window.partitionBy(F.md5(F.encode("text", "UTF-8")))
    surv = (
        valid.withColumn("m", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("m"))
        .select(
            F.col("doc_id").alias("vec_id"),
            "lang",
            # chars == bytes on this ASCII corpus — the documented
            # multimodal-oracle contract
            F.length("text").cast("long").alias("blen"),
        )
    )
    emb = _media_corpus_embedded(spark, sf_dir)
    pairs = banded_scored_pairs(
        signature_frame(emb, bits=MEDIA_WIDE_BITS),
        MEDIA_WIDE_BANDS,
        MEDIA_WIDE_BAND_BITS,
    ).where(F.col("cos_sim") >= MEDIA_COSINE_THRESHOLD)
    # one explode, not a self-union: `pairs` is the whole banded
    # chain (bucket join → distinct → cosine join-backs) and a union
    # of two selects over it would plan that chain twice (the
    # knn_rank_directed lesson, r14)
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("vec_a").alias("src"),
                    F.lit(1).alias("rank"),
                    F.col("vec_b").alias("dst"),
                    F.col("cos_sim"),
                ),
                F.struct(
                    F.col("vec_b").alias("src"),
                    F.lit(1).alias("rank"),
                    F.col("vec_a").alias("dst"),
                    F.col("cos_sim"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.rank", "e.dst", "e.cos_sim")
    verdict = semantic_verdict(
        directed, surv.select("vec_id"), MEDIA_COSINE_THRESHOLD
    )
    clean = surv.join(verdict, "vec_id").select(
        "lang", "blen", (~F.col("kept")).alias("fl")
    )
    per = clean.groupBy("lang").agg(
        F.sum(F.when(~F.col("fl"), 1).otherwise(0))
        .cast("long")
        .alias("n_assets"),
        F.sum(F.when(~F.col("fl"), F.col("blen")).otherwise(0))
        .cast("long")
        .alias("n_bytes"),
        F.sum(F.when(F.col("fl"), 1).otherwise(0))
        .cast("long")
        .alias("n_dropped_semantic"),
    )
    tot = per.agg(
        F.sum("n_assets").cast("long").alias("grand_total"),
        F.md5(
            F.encode(
                F.concat_ws(
                    "|",
                    F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.struct("lang", "n_assets", "n_bytes")
                            )
                        ),
                        lambda s: F.concat_ws(
                            ":",
                            s["lang"],
                            s["n_assets"].cast("string"),
                            s["n_bytes"].cast("string"),
                        ),
                    ),
                ),
                "UTF-8",
            )
        ).alias("release_digest"),
    )
    return with_scalars(per, tot).select(
        "lang",
        "n_assets",
        "n_bytes",
        "n_dropped_semantic",
        (
            F.col("n_assets").cast("double")
            / F.col("grand_total").cast("double")
        ).alias("asset_share"),
        "release_digest",
    )
