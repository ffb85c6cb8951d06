"""Collection function library: array / map / JSON (P30-P31).

No nested type appears anywhere in the reference (SURVEY.md §1.1) —
this is new surface for the LLM-pipeline workloads, where embeddings
are `array<float>` columns and event payloads are JSON strings.

Scale notes: array lambdas (`transform`/`aggregate`/`zip_with`) are
Catalyst HigherOrderFunctions — JVM-evaluated per row, no Python, no
shuffle. `explode` multiplies rows (here 64× for embeddings): always
project to the minimal columns *before* exploding so the blow-up
carries keys, not payloads. JSON extraction of a handful of fields
uses get_json_object; extracting many fields should use from_json
once per row instead (single parse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crime_data_batch_processing_spark.functions.exact import DEC
from crime_data_batch_processing_spark.registry import query
from crime_data_batch_processing_spark.sources.tables import load_table


@query(
    "array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           embedding[1] AS first_val,
           embedding[len(embedding)] AS last_val,
           array_to_string(list_transform(embedding[1:4],
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)), ',')
               AS head4,
           list_min(embedding) AS vmin,
           list_max(embedding) AS vmax,
           list_contains(embedding, 0.0) AS has_zero,
           (SELECT CAST(SUM(CAST(CAST(u AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE)
            FROM unnest(embedding) AS t(u)) AS vsum
    FROM embeddings
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/slice/min/max/contains + exact array sum.

    The sum uses a DECIMAL accumulator inside `F.aggregate` — decimal
    addition is exact, hence order-independent, hence identical to the
    oracle's unnest+SUM regardless of either engine's traversal order.
    """
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).cast("long").alias("dim"),
        F.element_at(emb, 1).alias("first_val"),
        F.element_at(emb, -1).alias("last_val"),
        # slice is still exercised, but the OUTPUT is scalar (driver's
        # canonicalizer can't hash list cells): exact integer
        # micro-units, floor (not round — half-case conventions differ
        # across engines), joined to one string
        F.array_join(
            F.transform(
                F.slice(emb, 1, 4),
                lambda x: F.floor(x.cast("double") * 1000000)
                .cast("long")
                .cast("string"),
            ),
            ",",
        ).alias("head4"),
        F.array_min(emb).alias("vmin"),
        F.array_max(emb).alias("vmax"),
        F.array_contains(emb, F.lit(0.0).cast("float")).alias("has_zero"),
        F.aggregate(
            emb,
            F.lit(0).cast(DEC),
            # float→double first (see exact.dcol); re-cast the addition
            # because decimal + widens to (29,6) and F.aggregate requires
            # the accumulator type to stay fixed
            lambda acc, x: (acc + x.cast("double").cast(DEC)).cast(DEC),
        )
        .cast("double")
        .alias("vsum"),
    )


@query(
    "array_explode",
    oracle="""
    SELECT vec_id,
           unnest(range(len(embedding))) AS pos,
           unnest(embedding) AS val
    FROM embeddings
    WHERE vec_id < 20
    """,
)
def array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: one row per (vector, position, value).

    DuckDB zips parallel unnests positionally, mirroring posexplode's
    0-based position column.
    """
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return e.select("vec_id", F.posexplode("embedding").alias("pos", "val")).select(
        "vec_id", F.col("pos").cast("long").alias("pos"), "val"
    )


@query(
    "map_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS k_doubled,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_roundtrip,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS k_missing
    FROM events
    """,
)
def map_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction + map construction round trip.

    `k_roundtrip` goes through a real MapType column
    (create_map → element_at) to exercise map ops while keeping the
    output scalar — map-typed outputs have engine-specific collection
    representations that an oracle hash can't compare fairly.
    Missing JSON paths yield NULL in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_id", k.alias("k_val"), "props")
        .withColumn("k_doubled", F.col("k_val") * 2)
        .withColumn("m", F.create_map(F.lit("k"), F.col("k_val")))
        .withColumn("k_roundtrip", F.element_at(F.col("m"), "k"))
        .withColumn(
            "k_missing", F.get_json_object("props", "$.missing").cast("long")
        )
        .drop("m", "props")
    )


@query(
    "json_variant",
    # The oracle derives every extraction from the ORIGINAL columns —
    # matching proves construct -> parse_json -> variant_get is a
    # lossless round trip (double survives via shortest-repr JSON
    # printing; the missing path must be NULL, not an error).
    oracle="""
    SELECT event_id,
           event_type AS vtype,
           value AS vval,
           CAST(props->>'$.k' AS INTEGER) AS vk,
           CAST(NULL AS INTEGER) AS vmissing
    FROM events
    """,
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT handling (Spark 4): parse once, extract
    many — the modern replacement for repeated `get_json_object`.

    `map_json_funcs` shows the classic per-extraction string parsing;
    VARIANT changes the cost model: `parse_json` pays the parse ONCE
    into a binary offset-indexed encoding, and every `variant_get` is
    a typed offset lookup — the open-format (Parquet Variant / Delta /
    Iceberg v3) answer to JSONB. The fixture nests event fields into
    one JSON document per row, parses it to VARIANT, and extracts a
    string, a double, a nested int, and a MISSING path
    (`try_variant_get` → NULL, never a job-killing error — the
    schema-drift posture semi-structured ingest needs). The oracle
    recomputes everything from the original columns, so any loss in
    construct→parse→extract (double repr, nested paths, null
    semantics) is a hash mismatch. Map-only, codegen'd, no shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("event_type").alias("t"),
            F.col("value").alias("v"),
            F.from_json("props", "k int").alias("p"),
        )
    )
    v = ev.select("event_id", F.parse_json(doc).alias("var"))
    return v.select(
        "event_id",
        F.variant_get("var", "$.t", "string").alias("vtype"),
        F.variant_get("var", "$.v", "double").alias("vval"),
        F.variant_get("var", "$.p.k", "int").alias("vk"),
        F.try_variant_get("var", "$.missing", "int").alias("vmissing"),
    )
