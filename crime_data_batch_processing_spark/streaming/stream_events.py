"""Structured Streaming over events (P37): source → watermark →
tumbling aggregate → sink.

The reference is pure batch on a daily Airflow schedule
(/root/reference/da-capstone-emr-airflow.py:94); this is the native
streaming generalization: the SAME window aggregate as the batch
`window_tumbling` operator, run through `readStream` with a watermark.
Batch/stream equivalence is therefore by construction, and the
registered query's oracle is the same SQL as the batch one.

Scale notes: the file source here stands in for Kafka — swap
`.format("parquet").load(dir)` for `.format("kafka")...` and nothing
else changes. The watermark bounds state: windows older than
(max event time − delay) are finalized and evicted; without it a
100 TB stream accumulates unbounded window state. Checkpointing gives
exactly-once sink semantics across restarts — the watermark-drop test
exercises a restart against the same checkpoint.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crime_data_batch_processing_spark.functions.exact import dsum, sql_dsum
from crime_data_batch_processing_spark.registry import query

#: Physical schema of events.parquet — ts is int64 NANOS on disk
#: (Spark's µs TimestampType can't be declared for a nanos column;
#: see sources/tables.py).
EVENTS_FILE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def streaming_events(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """readStream over a directory of events parquet files.

    ``max_files_per_trigger=1`` (default) makes each file its own
    micro-batch — the shape the incremental/watermark tests need;
    ``None`` lets AvailableNow take everything in one batch.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(EVENTS_FILE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.parquet(src_dir)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def hourly_agg(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """The tumbling aggregate shared with the batch operator."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_memory(
    spark: SparkSession,
    src_dir: str,
    query_name: str,
    output_mode: str = "complete",
    checkpoint: str | None = None,
) -> DataFrame:
    """Run the streaming aggregate to completion (AvailableNow) and
    return the memory-sink table. Synchronous; stops the query."""
    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()
    agg = hourly_agg(streaming_events(spark, src_dir))
    writer = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return spark.table(query_name)


def run_stream_to_parquet(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint: str,
) -> DataFrame:
    """Run the streaming aggregate to a parquet sink (append mode) and
    return the sink contents. Unlike the memory sink, a file sink
    RECOVERS from its checkpoint — this is the restart path the
    watermark-drop test exercises, and the production topology (the
    memory sink exists only for in-process inspection)."""
    agg = hourly_agg(streaming_events(spark, src_dir))
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


@query(
    "stream_events",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling aggregate, checked against the BATCH oracle.

    Runs the file stream to completion with Trigger.AvailableNow in
    complete mode — the final streaming state over a bounded source
    must equal the batch answer exactly (the strongest form of the
    batch-equivalence check SURVEY.md §5.2 item 2 asks for; the
    watermark late-drop behavior is exercised separately in
    tests/test_streaming.py where data arrives across restarts).
    """
    # the file stream source requires a DIRECTORY; expose the single
    # events.parquet through a symlink in a scratch dir (copy-free)
    src = f"/tmp/cdbp_stream_src/{os.path.basename(sf_dir.rstrip('/'))}"
    os.makedirs(src, exist_ok=True)
    link = os.path.join(src, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    ckpt = tempfile.mkdtemp(prefix="cdbp_stream_ckpt_")
    return run_stream_to_memory(
        spark, src, query_name="cdbp_stream_events", checkpoint=ckpt
    )
