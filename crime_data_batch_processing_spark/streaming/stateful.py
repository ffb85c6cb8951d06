"""Custom stateful streaming: per-key running aggregates via
`applyInPandasWithState` (the P37 extension for logic outside the
built-in windowed-aggregation algebra).

Built-in streaming aggregates cover windowed counts/sums; anything
with bespoke state transitions (per-entity accumulators, custom
eviction, model-ish running statistics) needs the arbitrary-stateful
operator. This module implements the canonical shape: per-user running
event count + exact value sum, state carried across micro-batches,
arbitrary Python logic per group per batch.

Scale notes: state lives in the state store, partitioned by key —
bounded by distinct users, not events. The Arrow path batches whole
key-groups per micro-batch into pandas. A timeout
(`GroupStateTimeout.NoTimeout` here; processing/event-time timeouts in
production) is how state gets evicted for dead keys — without eviction
a 100 TB stream's key space grows without bound.

Exactness: `value` is quantized to int64 (×10^6, same scheme as
functions/veckit) in a JVM-side projection BEFORE entering Python, so
the running sum is integer arithmetic — order-independent across
micro-batch boundaries and bit-identical to the oracle's DECIMAL sum.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from crime_data_batch_processing_spark.functions.exact import sql_dsum
from crime_data_batch_processing_spark.registry import query
from crime_data_batch_processing_spark.streaming.stream_events import (
    streaming_events,
)

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, s long"
_SCALE = 10**6


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """Attach the quantized value column and run the stateful op.

    The state function is NESTED so cloudpickle ships it by value —
    module-level functions pickle by reference and require this
    package on worker PYTHONPATH, which the driver contract does not
    guarantee.
    """

    def _user_stats(key, pdfs, state):
        # fold this micro-batch's rows for one user into running
        # state, emit the updated totals
        n, s = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            s += int(pdf["vq"].sum())  # int64 column — exact
        state.update((n, s))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [s / float(_SCALE)],
            }
        )

    quantized = events.select(
        "user_id",
        (F.col("value").cast("double").cast("decimal(18,6)") * _SCALE)
        .cast("long")
        .alias("vq"),
    )
    return quantized.groupBy("user_id").applyInPandasWithState(
        _user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_to_memory(
    spark: SparkSession, src_dir: str, query_name: str
) -> DataFrame:
    """Run the stateful stream to completion (AvailableNow) against a
    file source and return the memory-sink table."""
    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()
    out = stateful_user_stats(
        streaming_events(spark, src_dir, max_files_per_trigger=None)
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


@query(
    "stream_stateful",
    oracle=f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-stateful streaming aggregate, checked against the
    batch oracle.

    The whole file arrives as ONE micro-batch (no maxFilesPerTrigger
    throttle), so each user emits exactly one final-state row and the
    result must equal the batch GROUP BY bit-for-bit (integer-sum
    exactness). Multi-batch incremental state transitions are
    exercised in tests/test_streaming.py.
    """
    from crime_data_batch_processing_spark.streaming.stream_events import (
        _stream_src,
    )

    return run_stateful_to_memory(
        spark, _stream_src(sf_dir), query_name="cdbp_stream_stateful"
    )
