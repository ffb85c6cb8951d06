"""Structured Streaming semantics: watermark late-data handling across
restarts (the P37 correctness area SURVEY.md §7 calls the hardest).

The registered `stream_events` query proves batch-equivalence in
complete mode; these tests prove the *streaming-only* behaviors:
append-mode finalization and watermark-based late drop, using a file
source fed across two runs against one checkpoint.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from crime_data_batch_processing_spark.streaming.stream_events import (
    EVENTS_FILE_SCHEMA,
    run_stream_to_memory,
    run_stream_to_parquet,
)

HOUR_NS = 3_600 * 10**9
BASE_NS = 1_704_067_200 * 10**9  # 2024-01-01 00:00:00 UTC


def _event(i: int, hour: float, etype: str = "click", value: float = 1.0):
    return (i, BASE_NS + int(hour * HOUR_NS), 1, etype, value, "{}")


def _write_batch(spark, rows, stream_dir: str, name: str) -> None:
    """Materialize one 'arrival' as a single parquet file in the source dir."""
    stage = os.path.join(stream_dir, "_stage", name)
    df = spark.createDataFrame(rows, EVENTS_FILE_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.copy(part, os.path.join(stream_dir, f"{name}.parquet"))


@pytest.fixture()
def stream_dirs(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    return str(src), str(ckpt)


def test_append_mode_emits_only_finalized_windows(spark, stream_dirs):
    src, ckpt = stream_dirs
    # hours 0,1,2 plus a head event at hour 5 that advances the watermark
    rows = [_event(0, 0.5), _event(1, 1.5), _event(2, 2.5), _event(3, 5.5)]
    _write_batch(spark, rows, src, "b0")
    out = run_stream_to_memory(
        spark, src, "t_append", output_mode="append", checkpoint=ckpt
    )
    got = {(str(r.window_start), r.n_events) for r in out.collect()}
    # watermark after the batch = 5:30 - 1h = 4:30 → windows ending ≤4:30
    # are final: hours 0,1,2. The hour-5 window stays open (not emitted).
    assert got == {
        ("2024-01-01 00:00:00", 1),
        ("2024-01-01 01:00:00", 1),
        ("2024-01-01 02:00:00", 1),
    }


def test_watermark_drops_late_data_across_restart(spark, stream_dirs, tmp_path):
    src, ckpt = stream_dirs
    out = str(tmp_path / "out")
    _write_batch(
        spark,
        [_event(0, 0.5), _event(1, 1.5), _event(2, 5.5)],
        src,
        "b0",
    )
    first = run_stream_to_parquet(spark, src, out, ckpt)
    first_windows = {str(r.window_start) for r in first.collect()}
    assert "2024-01-01 00:00:00" in first_windows  # hour 0 finalized

    # restart with a LATE arrival for hour 0 (watermark is 4:30) plus a
    # fresh event at hour 7 that closes the hour-5 window
    _write_batch(
        spark,
        [_event(10, 0.6, value=99.0), _event(11, 7.5)],
        src,
        "b1",
    )
    second = run_stream_to_parquet(spark, src, out, ckpt)
    emitted = {(str(r.window_start), r.n_events) for r in second.collect()}
    # the late hour-0 row must NOT resurface hour 0 (state was evicted,
    # row dropped); the previously-open hour-5 window is now final.
    # The file sink is append-only, so the hour-0 row from run 1 is
    # still present exactly once with its original count — the late row
    # must not have produced a second hour-0 output row.
    hour0 = [(w, n) for (w, n) in emitted if w.startswith("2024-01-01 00:")]
    assert hour0 == [("2024-01-01 00:00:00", 1)], emitted
    assert ("2024-01-01 05:00:00", 1) in emitted


def test_stream_batch_equivalence_complete_mode(spark, stream_dirs):
    src, ckpt = stream_dirs
    rows = [_event(i, 0.1 * i, "view", float(i)) for i in range(40)]
    _write_batch(spark, rows, src, "b0")
    out = run_stream_to_memory(
        spark, src, "t_complete", output_mode="complete", checkpoint=ckpt
    )
    stream_total = sum(r.n_events for r in out.collect())
    assert stream_total == 40
