"""User-defined function surface: vectorized scalar UDFs + grouped UDAFs.

The reference defines no UDFs (SURVEY.md §2.2). This module provides
the two shapes that matter, both on the Arrow path:

* `pandas_udf` scalar — batched columnar transfer, ~10-100× the
  throughput of row-at-a-time `F.udf` (which this engine bans from
  hot paths; see the plan test asserting no BatchEvalPython in
  registered queries).
* `applyInPandas` grouped map — per-group pandas DataFrame in/out,
  the UDAF workhorse for logic genuinely outside the built-in
  aggregate algebra.

Scale notes: a pandas UDF still serializes every batch across the
JVM↔Python boundary — use it only for logic `pyspark.sql.functions`
cannot express (the examples here are SQL-expressible on purpose, so
the oracle can check the machinery; real uses are the dedup /
similarity / multimodal operators). For applyInPandas, a single group
must fit in one worker's memory: group by keys with bounded
cardinality per key, never by a skewed key without salting.
"""

from __future__ import annotations

# module level (not inside the function): PEP-563 stringified hints
# are resolved against the function's GLOBALS by pandas_udf's
# signature inspection — a locally-imported name is invisible there
# (udf_model_iter's Iterator hint selects the iterator evaluation
# mode, so it must resolve)
from collections.abc import Iterator  # noqa: F401

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crime_data_batch_processing_spark.registry import query
from crime_data_batch_processing_spark.sources.tables import load_table

# returnType as type OBJECTS, not DDL strings: string types are parsed
# through the active SparkSession, which doesn't exist at import time.


@F.pandas_udf(T.LongType())
def _token_count(text: pd.Series) -> pd.Series:
    """Whitespace token count, vectorized over an Arrow batch."""
    return text.str.split(" ").str.len().astype("int64")


@F.pandas_udf(T.StringType())
def _normalize_text(text: pd.Series) -> pd.Series:
    """Lowercase + trim — the canonical pre-dedup normalization."""
    return text.str.strip().str.lower()


@query(
    "udf_scalar",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           SUBSTRING(LOWER(TRIM(text)), 1, 40) AS norm_prefix,
           n_chars * 2 AS chars_doubled
    FROM documents
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDFs whose logic the oracle re-expresses in SQL.

    The point under test is the Arrow batch machinery (types, nulls,
    batch boundaries), not the arithmetic.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        _token_count("text").alias("n_tokens"),
        F.substring(_normalize_text("text"), 1, 40).alias("norm_prefix"),
        (F.col("n_chars") * 2).alias("chars_doubled"),
    )


@query(
    "udaf_grouped",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS first_doc
    FROM documents
    GROUP BY lang
    """,
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF via applyInPandas (one output row per group).

    Integer-only outputs so the oracle comparison is exact. `lang` has
    ~5 distinct values with even sizes — the bounded-group-size
    requirement applyInPandas imposes at scale.

    The grouped function is NESTED so cloudpickle serializes it by
    VALUE: a module-level function is pickled by reference and the
    Python workers would need this package on their PYTHONPATH (true
    for nothing the driver guarantees — it imports us from an
    arbitrary cwd).
    """

    def _lang_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        # per-language corpus stats — arbitrary pandas logic per group
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [len(pdf)],
                "min_chars": [int(pdf["n_chars"].min())],
                "max_chars": [int(pdf["n_chars"].max())],
                "total_chars": [int(pdf["n_chars"].sum())],
                "first_doc": [int(pdf["doc_id"].min())],
            }
        )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return docs.groupBy("lang").applyInPandas(
        _lang_stats,
        schema=(
            "lang string, n_docs long, min_chars long, max_chars long, "
            "total_chars long, first_doc long"
        ),
    )


@query(
    "udf_arrow",
    oracle="""
    SELECT doc_id,
           lang || ':' || CAST(doc_id % 7 AS VARCHAR) AS shard_key,
           CAST(floor(n_chars / 100) AS BIGINT) AS size_bucket
    FROM documents
    """,
)
def udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (`useArrow=True`, Spark 3.5+) — the
    third rung of the UDF surface.

    Same row-wise authoring model as the legacy `F.udf` (scalar in,
    scalar out — no pandas vocabulary needed), but batched over Arrow
    instead of pickled row-by-row, so it plans as ArrowEvalPython and
    clears this engine's no-BatchEvalPython gate (tests/test_plans.py).
    The niche between the modes: logic too row-oriented to vectorize
    comfortably as a `pandas_udf`, yet hot enough that pickle-per-row
    would dominate. Defined NESTED so cloudpickle ships it by value
    (workers don't have this package importable).
    """
    import pyspark.sql.functions as SF

    @SF.udf(returnType=T.StringType(), useArrow=True)
    def _shard_key(lang: str, doc_id: int) -> str:
        # arbitrary per-row Python — replayed exactly by the oracle
        return f"{lang}:{doc_id % 7}"

    @SF.udf(returnType=T.LongType(), useArrow=True)
    def _size_bucket(n_chars: int) -> int:
        return n_chars // 100

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        _shard_key("lang", "doc_id").alias("shard_key"),
        _size_bucket("n_chars").alias("size_bucket"),
    )


@query(
    "udtf_token_spans",
    # Token spans are reconstructible in SQL for THIS tokenizer
    # (single-space split): start offset = running sum of
    # len(token)+1 over the preceding tokens. The UDTF earns its keep
    # when the segmenter is a real library call; the SQL-expressible
    # stand-in is what makes the machinery oracle-checkable.
    oracle="""
    WITH s AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), e AS (
        SELECT doc_id, toks, unnest(range(len(toks))) AS p FROM s
    )
    SELECT doc_id,
           CAST(p AS INTEGER) AS pos,
           toks[p + 1] AS token,
           CAST(CASE WHEN p = 0 THEN 0
                ELSE LEN(array_to_string(toks[1 : p], ' ')) + 1
                END AS INTEGER) AS start_off
    FROM e
    """,
)
def udtf_token_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function) through a LATERAL join:
    one input document row expands to one row per token WITH its
    character offset — the span-preserving tokenizer shape that PII
    redaction and chunk-alignment pipelines need, and the one UDF
    rung (table-valued) the scalar/grouped/arrow keys don't cover.

    The UDTF runs on the Arrow path (`useArrow=True`); the lateral
    join is planned per-partition — each task expands its own rows,
    no shuffle is introduced by the expansion itself. Same policy as
    every UDF key: the example logic is deliberately SQL-expressible
    so the ORACLE can check the machinery (argument passing, lateral
    correlation, multi-row yield, schema enforcement); real users put
    a spaCy/ICU segmenter in `eval` where SQL genuinely can't follow.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string, start_off int", useArrow=True)
    class TokenSpans:
        def eval(self, text: str):  # noqa: ANN001 — UDTF contract
            if text is None:
                return
            off = 0
            for i, tok in enumerate(text.split(" ")):
                yield i, tok, off
                off += len(tok) + 1

    from crime_data_batch_processing_spark.sources.tables import (
        spread_table,
    )

    spark.udtf.register("token_spans", TokenSpans)
    # _spread: the one-row-group documents scan would otherwise feed
    # the per-row Arrow UDTF from a single input split (one core)
    spread_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token, t.start_off
        FROM udtf_docs d, LATERAL token_spans(d.text) t
        """
    )


#: Deterministic integer "model" for the iterator-UDF key: weights
#: over four text features. The values are arbitrary; what matters is
#: that scoring is pure int64 arithmetic both engines replay exactly.
MODEL_W_CHARS = 3
MODEL_W_TOKENS = 7
MODEL_W_DIGITS = 11
MODEL_W_UPPER = 13


@query(
    "udf_model_iter",
    oracle=f"""
    SELECT doc_id,
           {MODEL_W_CHARS} * length(text)
           + {MODEL_W_TOKENS} * (length(text)
                - length(replace(text, ' ', '')) + 1)
           + {MODEL_W_DIGITS} * (length(text)
                - length(regexp_replace(text, '[0-9]', '', 'g')))
           + {MODEL_W_UPPER} * (length(text)
                - length(regexp_replace(text, '[A-Z]', '', 'g')))
               AS model_score
    FROM documents
    """,
)
def udf_model_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form pandas UDF (`Iterator[pd.Series] →
    Iterator[pd.Series]`) — the batch-inference shape of the UDF
    surface: expensive state (a model, a tokenizer, an ONNX session)
    is initialized ONCE per worker before the loop, then every Arrow
    batch of the task streams through it. The plain scalar
    `pandas_udf` re-enters Python per batch with no place to hang
    state; at 100 TB the difference is loading a model once per
    executor vs once per batch — the pattern every LLM
    scoring/embedding pass over a corpus uses.

    The "model" here is a deterministic integer-weighted feature
    scorer (chars / tokens / digits / uppercase counts) so the ORACLE
    can check the machinery — argument streaming, per-batch yield,
    init-before-loop — by replaying the identical int64 arithmetic;
    real users put the un-SQL-able model in `_load_model`. Feature
    extraction is vectorized pandas `.str` ops; counts are exact
    integers on both engines (the [0-9]/[A-Z] classes have identical
    semantics in Python re and DuckDB's RE2).

    Defined NESTED so cloudpickle ships it by value (Iterator itself
    is imported at MODULE level — PEP-563 string hints resolve
    against the function's globals, and the Iterator hint is what
    selects pandas_udf's iterator evaluation mode); plans as ONE
    ArrowEvalPython over a pruned 2-column scan, map-only, zero
    shuffle (plan-asserted).
    """

    @F.pandas_udf(T.LongType())
    def _score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # once-per-worker init: real pipelines load the model here
        def _load_model() -> dict[str, int]:
            return {
                "chars": MODEL_W_CHARS,
                "tokens": MODEL_W_TOKENS,
                "digits": MODEL_W_DIGITS,
                "upper": MODEL_W_UPPER,
            }

        w = _load_model()
        for texts in batches:
            n_chars = texts.str.len().astype("int64")
            n_tokens = texts.str.count(" ").astype("int64") + 1
            n_digits = texts.str.count("[0-9]").astype("int64")
            n_upper = texts.str.count("[A-Z]").astype("int64")
            yield (
                w["chars"] * n_chars
                + w["tokens"] * n_tokens
                + w["digits"] * n_digits
                + w["upper"] * n_upper
            )

    return load_table(spark, sf_dir, "documents").select(
        "doc_id", _score(F.col("text")).alias("model_score")
    )
