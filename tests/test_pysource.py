"""Unit tests for the Python Data Source connector's planning layer
(sources/pydatasource.py): row-group statistics pruning and exact
re-application of pushed filters, independent of Spark."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, IsNotNull

from crime_data_batch_processing_spark.sources.pydatasource import (
    RowGroupParquetReader,
)


def _fixture(tmp_path) -> str:
    path = str(tmp_path / "docs.parquet")
    # 4 row groups with disjoint n_chars ranges: [0,99], [100,199], ...
    table = pa.table(
        {
            "doc_id": list(range(400)),
            "lang": ["en" if i % 2 == 0 else "fr" for i in range(400)],
            "source": [f"s{i % 3}" for i in range(400)],
            "n_chars": list(range(400)),
        }
    )
    pq.write_table(table, path, row_group_size=100)
    return path


def test_stats_pruning_drops_excluded_row_groups(tmp_path):
    path = _fixture(tmp_path)
    r = RowGroupParquetReader(path)
    residual = list(r.pushFilters([GreaterThanOrEqual(("n_chars",), 250)]))
    assert residual == [], "single-column comparison must be consumed"
    parts = r.partitions()
    # groups [0,99] and [100,199] are excluded by max-stat; [200,299]
    # survives (max 299 >= 250) and [300,399] survives
    assert sorted(p.index for p in parts) == [2, 3]


def test_pushed_filters_reapplied_exactly(tmp_path):
    path = _fixture(tmp_path)
    r = RowGroupParquetReader(path)
    list(r.pushFilters([GreaterThanOrEqual(("n_chars",), 250), EqualTo(("lang",), "en")]))
    rows = []
    for p in r.partitions():
        for batch in r.read(p):
            rows.extend(batch.to_pylist())
    assert all(x["n_chars"] >= 250 and x["lang"] == "en" for x in rows)
    assert len(rows) == 75  # 150 ids in [250,399], half even

    
def test_unsupported_filters_returned_to_spark(tmp_path):
    path = _fixture(tmp_path)
    r = RowGroupParquetReader(path)
    unsupported = IsNotNull(("lang",))
    residual = list(r.pushFilters([unsupported, EqualTo(("lang",), "fr")]))
    assert residual == [unsupported]
    assert len(r.partitions()) == 4  # string stats keep all groups


def _write_one(writer, n: int):
    table = pa.table({"x": list(range(n))})
    return writer.write(iter(table.to_batches()))


def test_sink_append_merges_prior_manifest(tmp_path):
    from crime_data_batch_processing_spark.sources.pydatasource import (
        FileCommit,
        ManifestParquetWriter,
        manifest_files,
    )

    path = str(tmp_path / "sink")
    w1 = ManifestParquetWriter(path, overwrite=False)
    w1.commit([_write_one(w1, 3)])
    assert len(manifest_files(path)) == 1

    # second APPEND write must keep the first write's file visible
    w2 = ManifestParquetWriter(path, overwrite=False)
    w2.commit([_write_one(w2, 2), FileCommit("", 0)])  # + empty task
    assert len(manifest_files(path)) == 2

    # OVERWRITE replaces the manifest wholesale
    w3 = ManifestParquetWriter(path, overwrite=True)
    w3.commit([_write_one(w3, 1)])
    assert len(manifest_files(path)) == 1


def test_sink_empty_task_writes_no_file(tmp_path):
    from crime_data_batch_processing_spark.sources.pydatasource import (
        ManifestParquetWriter,
    )

    path = str(tmp_path / "sink2")
    w = ManifestParquetWriter(path, overwrite=False)
    msg = w.write(iter([]))
    assert msg.filename == "" and msg.n_rows == 0
    import os

    assert not [f for f in os.listdir(path) if f.endswith(".parquet")]


def test_stream_reader_offset_protocol(tmp_path):
    from crime_data_batch_processing_spark.sources.pydatasource import (
        ChunkedParquetStreamReader,
    )

    path = str(tmp_path / "events.parquet")
    table = pa.table(
        {
            "event_id": list(range(10)),
            "event_type": ["a"] * 10,
            "value": [float(i) for i in range(10)],
            "extra": list(range(10)),  # must be projected away
        }
    )
    pq.write_table(table, path)
    r = ChunkedParquetStreamReader(
        path, columns=["event_id", "event_type", "value"]
    )
    off = r.initialOffset()
    seen = []
    for _ in range(10):  # bounded: must catch up within CHUNKS reads
        rows, nxt = r.read(off)
        rows = list(rows)
        if nxt == off:
            assert rows == []  # caught-up contract
            break
        seen.extend(rows)
        off = nxt
    assert [x[0] for x in seen] == list(range(10))
    assert all(len(x) == 3 for x in seen)
    # replay of a committed range returns exactly that slice
    replay = list(r.readBetweenOffsets({"row": 3}, {"row": 7}))
    assert [x[0] for x in replay] == [3, 4, 5, 6]


def test_sink_commit_breaks_orphaned_lock(tmp_path):
    """A committer killed before its finally-unlink must not wedge
    every future commit: a lock older than the stale threshold is
    broken (same-inode guarded) and the commit proceeds."""
    import os

    from crime_data_batch_processing_spark.sources.pydatasource import (
        ManifestParquetWriter,
        manifest_files,
    )

    path = str(tmp_path / "sink3")
    os.makedirs(path)
    lock = os.path.join(path, "_manifest.json.lock")
    open(lock, "w").close()
    old = os.stat(lock).st_mtime - 3600
    os.utime(lock, (old, old))  # orphan: created an hour ago, no holder

    w = ManifestParquetWriter(path, overwrite=False)
    w.commit([_write_one(w, 2)])
    assert len(manifest_files(path)) == 1
    assert not os.path.exists(lock), "commit must release the lock"


def test_sink_commit_live_lock_blocks_until_released(tmp_path):
    """A FRESH lock (live committer) is honored: the second committer
    waits rather than breaking it, and proceeds once released."""
    import os
    import threading
    import time

    from crime_data_batch_processing_spark.sources.pydatasource import (
        ManifestParquetWriter,
        manifest_files,
    )

    path = str(tmp_path / "sink4")
    os.makedirs(path)
    lock = os.path.join(path, "_manifest.json.lock")
    open(lock, "w").close()  # fresh mtime = live holder

    w = ManifestParquetWriter(path, overwrite=False)
    msg = _write_one(w, 2)
    t = threading.Thread(target=lambda: w.commit([msg]))
    t.start()
    time.sleep(0.3)
    assert t.is_alive(), "fresh lock must block the commit"
    os.unlink(lock)  # holder releases
    t.join(timeout=10)
    assert not t.is_alive() and len(manifest_files(path)) == 1


def test_stream_sink_per_batch_commit_protocol(tmp_path):
    """The streaming writer's per-batch commit logs: each batchId owns
    one atomic log; a retried batch idempotently overwrites its own
    log (re-run's files win); readers union logs in batch order and
    never see files no log names."""
    import os

    from crime_data_batch_processing_spark.sources.pydatasource import (
        ManifestParquetStreamWriter,
        stream_manifest_files,
    )

    path = str(tmp_path / "ssink")
    w = ManifestParquetStreamWriter(path)
    m0 = _write_one(w, 3)
    w.commit([m0, None], batchId=0)
    m1a = _write_one(w, 2)
    w.commit([m1a], batchId=1)
    # batch 1 retried after a failure: new attempt's files replace the
    # old attempt's in the log
    m1b = _write_one(w, 2)
    w.commit([m1b], batchId=1)

    files = stream_manifest_files(path)
    names = [os.path.basename(f) for f in files]
    assert names == [m0.filename, m1b.filename], names
    assert m1a.filename not in names, "failed attempt must be unlisted"
    # the failed attempt's data file may linger on disk — readers must
    # not see it, which is exactly why directory listings are banned
    assert os.path.exists(os.path.join(path, m1a.filename))


def test_stream_sink_abort_removes_batch_files(tmp_path):
    import os

    from crime_data_batch_processing_spark.sources.pydatasource import (
        ManifestParquetStreamWriter,
        stream_manifest_files,
    )

    path = str(tmp_path / "ssink2")
    w = ManifestParquetStreamWriter(path)
    msg = _write_one(w, 4)
    w.abort([msg, None], batchId=0)
    assert not os.path.exists(os.path.join(path, msg.filename))
    assert stream_manifest_files(path) == []


def test_stream_sink_log_order_is_numeric_not_lexical(tmp_path):
    """Batch 10's log must sort after batch 2's — lexical sorting of
    _batch_*.json would interleave file order once batchId hits two
    digits."""
    import os

    from crime_data_batch_processing_spark.sources.pydatasource import (
        ManifestParquetStreamWriter,
        stream_manifest_files,
    )

    path = str(tmp_path / "ssink3")
    w = ManifestParquetStreamWriter(path)
    msgs = {}
    for bid in (2, 10, 1):
        msgs[bid] = _write_one(w, 1)
        w.commit([msgs[bid]], batchId=bid)
    names = [os.path.basename(f) for f in stream_manifest_files(path)]
    assert names == [msgs[1].filename, msgs[2].filename, msgs[10].filename]


def test_partitioned_stream_reader_row_group_slicing(tmp_path):
    """The executor-side read() must return EXACTLY rows [lo, hi)
    across row-group boundaries — only overlapping row groups touched,
    partial overlaps sliced, no row lost or doubled when a partition
    straddles several groups or starts/ends mid-group."""
    from crime_data_batch_processing_spark.sources.pydatasource import (
        PartitionedParquetStreamReader,
        RowRangePartition,
    )

    path = str(tmp_path / "events.parquet")
    table = pa.table(
        {
            "event_id": list(range(100)),
            "event_type": ["a"] * 100,
            "value": [float(i) for i in range(100)],
        }
    )
    pq.write_table(table, path, row_group_size=30)  # groups: 30/30/30/10

    r = PartitionedParquetStreamReader(path)

    def ids(lo, hi):
        out = []
        for batch in r.read(RowRangePartition(lo, hi)):
            out.extend(batch.column(0).to_pylist())
        return out

    assert ids(0, 100) == list(range(100))        # whole file
    assert ids(10, 20) == list(range(10, 20))     # inside one group
    assert ids(25, 65) == list(range(25, 65))     # straddles two edges
    assert ids(30, 60) == list(range(30, 60))     # exactly one group
    assert ids(95, 100) == list(range(95, 100))   # tail group
    assert ids(60, 60) == []                      # empty range

    # full micro-batch grid: union of all partitions over all offsets
    # reproduces every row exactly once
    got = []
    start = r.initialOffset()
    for _ in range(r.CHUNKS):
        end = r.latestOffset()
        for p in r.partitions(start, end):
            got.extend(ids(p.lo, p.hi))
        start = end
    assert got == list(range(100))


def test_partitioned_stream_reader_durable_cursor_restart(tmp_path):
    """The durable cursor must make restarts safe BY CONSTRUCTION:
    a fresh instance sharing the cursor_dir reports a tail at (or
    past) the persisted committed offset — the offset log can never
    regress — while partitions(start, end) stays a PURE function of
    its arguments so a crash-replay of a WAL'd batch on yet another
    fresh instance plans the identical row set."""
    from crime_data_batch_processing_spark.sources.pydatasource import (
        PartitionedParquetStreamReader,
    )

    path = str(tmp_path / "events.parquet")
    table = pa.table(
        {
            "event_id": list(range(100)),
            "event_type": ["a"] * 100,
            "value": [float(i) for i in range(100)],
        }
    )
    pq.write_table(table, path)
    cursor = str(tmp_path / "cursor")

    # run A: serve and COMMIT [0, 50), then plan-but-crash (50, 75)
    r1 = PartitionedParquetStreamReader(path, cursor)
    start = r1.initialOffset()
    for _ in range(2):
        end = r1.latestOffset()
        assert r1.partitions(start, end)
        r1.commit(end)
        start = end
    assert start == {"row": 50}
    wal_end = r1.latestOffset()          # planned, never committed
    first_plan = [(p.lo, p.hi) for p in r1.partitions(start, wal_end)]

    # crash-replay: a FRESH instance re-plans the WAL'd batch — must
    # produce the identical row set (purity), not a clipped/shifted one
    r2 = PartitionedParquetStreamReader(path, cursor)
    replay = [(p.lo, p.hi) for p in r2.partitions(start, wal_end)]
    assert replay == first_plan

    # clean restart: the fresh instance's tail starts from the
    # persisted committed floor — never behind it (no inverted batch,
    # no offset-log regression, no re-serving of committed rows)
    r3 = PartitionedParquetStreamReader(path, cursor)
    tail = r3.latestOffset()
    assert tail["row"] > 50
    assert all(p.lo >= 50 for p in r3.partitions({"row": 50}, tail))

    # commit monotone guard: a stale commit cannot move the floor back
    r3.commit({"row": 10})
    assert PartitionedParquetStreamReader(path, cursor)._committed_floor() >= 50


def test_partitioned_stream_reader_stateless_without_cursor(tmp_path):
    """Without cursor_dir the reader is stateless: the tail is the
    file end (restart-trivially-safe), served as ONE multi-task
    batch; commit() is a no-op."""
    from crime_data_batch_processing_spark.sources.pydatasource import (
        PartitionedParquetStreamReader,
    )

    path = str(tmp_path / "events.parquet")
    table = pa.table(
        {
            "event_id": list(range(40)),
            "event_type": ["a"] * 40,
            "value": [float(i) for i in range(40)],
        }
    )
    pq.write_table(table, path)
    r = PartitionedParquetStreamReader(path)
    assert r.latestOffset() == {"row": 40}
    assert r.latestOffset() == {"row": 40}  # no cursor advance
    parts = r.partitions({"row": 0}, {"row": 40})
    assert len(parts) == r.TASKS
    r.commit({"row": 40})  # no-op, no cursor file anywhere
    assert not list(tmp_path.glob("**/offset.json"))


def test_commit_lock_release_spares_peer_lock(tmp_path):
    """Regression pin for the ownership-checked commit-lock release
    (round-7 advisor fix): a holder that stalls past the staleness
    horizon gets its lock BROKEN by a peer, which then holds its own
    lock file at the same path. The stalled holder's release must be
    a no-op (different inode), never an unconditional unlink that
    would delete the peer's live lock and re-open the concurrent
    read-merge-write window. An unconditional `os.unlink(lock)`
    release fails this test."""
    import os

    from crime_data_batch_processing_spark.sources.pydatasource import (
        _acquire_commit_lock,
        _release_commit_lock,
    )

    lock = str(tmp_path / "_manifest.json.lock")

    # holder A elects, then stalls WITH a dead heartbeat (the one
    # case the ownership check still guards): backdate its lock
    fd_a = _acquire_commit_lock(lock, stale_s=60.0, heartbeat=False)
    past = os.stat(lock).st_mtime - 3600
    os.utime(lock, (past, past))

    # peer B judges A's lock stale, breaks it, holds its OWN lock
    fd_b = _acquire_commit_lock(lock, stale_s=60.0)
    assert os.stat(lock).st_ino == os.fstat(fd_b.fd).st_ino
    assert os.stat(lock).st_ino != os.fstat(fd_a.fd).st_ino

    # A's (late) release must leave B's live lock intact
    _release_commit_lock(lock, fd_a)
    assert os.path.exists(lock)
    assert os.stat(lock).st_ino == os.fstat(fd_b.fd).st_ino

    # B's release removes its own lock; the path is then free again
    _release_commit_lock(lock, fd_b)
    assert not os.path.exists(lock)
    fd_c = _acquire_commit_lock(lock, stale_s=60.0)
    _release_commit_lock(lock, fd_c)
    assert not os.path.exists(lock)


def test_commit_lock_heartbeat_keeps_stalled_holder_live(tmp_path):
    """A holder that legitimately stalls past `stale_s` (slow FS,
    huge manifest merge) must KEEP its lock: the heartbeat refreshes
    the lock's mtime from the held fd, so peers keep judging it live
    and wait (then time out) instead of breaking it mid-critical-
    section. Without the heartbeat, the same stall gets the lock
    broken (asserted as the contrast case)."""
    import os
    import time

    import pytest

    from crime_data_batch_processing_spark.sources.pydatasource import (
        _acquire_commit_lock,
        _release_commit_lock,
    )

    # margins: stale_s=2.0 → 0.5s beats; the heartbeat thread would
    # need a >2.0s scheduler stall (vs >0.4s at the old margins) for
    # the peer to wrongly judge the lock stale on a loaded CI host
    lock = str(tmp_path / "_manifest.json.lock")
    h = _acquire_commit_lock(lock, stale_s=2.0)
    ino_a = os.fstat(h.fd).st_ino
    time.sleep(2.4)  # stall 1.2x past the staleness horizon
    # peer judges by the SAME stale_s: the heartbeat must have kept
    # the mtime fresh, so the peer waits and times out
    with pytest.raises(TimeoutError):
        _acquire_commit_lock(lock, stale_s=2.0, timeout_s=0.5)
    assert os.stat(lock).st_ino == ino_a  # still holder A's lock
    _release_commit_lock(lock, h)
    assert not os.path.exists(lock)

    # contrast: the SAME stall with a dead heartbeat is broken
    h2 = _acquire_commit_lock(lock, stale_s=2.0, heartbeat=False)
    time.sleep(2.4)
    h3 = _acquire_commit_lock(lock, stale_s=2.0, timeout_s=0.5)
    assert os.fstat(h3.fd).st_ino != os.fstat(h2.fd).st_ino
    _release_commit_lock(lock, h3)
    _release_commit_lock(lock, h2)  # ownership check: no-op unlink


def test_commit_lock_release_leaks_fd_on_stuck_heartbeat(tmp_path):
    """A heartbeat thread that never confirms exit (stuck in
    `os.utime` on a hung network FS) must make release LEAK the fd
    rather than close it: closing would recycle the fd number, and
    the still-running thread's later utime would touch an unrelated
    file. The lock file itself is still unlinked (path-level)."""
    import os
    import threading

    from crime_data_batch_processing_spark.sources.pydatasource import (
        _acquire_commit_lock,
        _CommitLockHandle,
        _release_commit_lock,
    )

    lock = str(tmp_path / "_manifest.json.lock")
    h = _acquire_commit_lock(lock, stale_s=60.0, heartbeat=False)

    # swap in a "stuck" heartbeat: ignores the stop event, exits only
    # on its own private release event (simulates a hung utime)
    release = threading.Event()
    t = threading.Thread(target=release.wait, daemon=True)
    t.start()
    h._stop = threading.Event()
    h._thread = t
    h.JOIN_TIMEOUT_S = 0.2  # don't pay the production join wait

    _release_commit_lock(lock, h)
    assert not os.path.exists(lock)  # unlink still happened
    os.fstat(h.fd)  # fd deliberately leaked: still valid, raises if closed

    # once the thread really exits, stop_heartbeat confirms and the
    # (re-called) release path may close; emulate the cleanup
    release.set()
    t.join(timeout=2.0)
    assert h.stop_heartbeat() is True
    os.close(h.fd)

    # sanity: normal handles still close their fd on release
    h2 = _acquire_commit_lock(lock, stale_s=60.0)
    _release_commit_lock(lock, h2)
    try:
        os.fstat(h2.fd)
    except OSError:
        pass
    else:  # pragma: no cover - fd must be closed
        raise AssertionError("normal release must close the fd")
    assert isinstance(h2, _CommitLockHandle)


def test_commit_lock_waits_for_live_holder(tmp_path):
    """A LIVE (fresh-mtime) lock is waited on, not broken: a second
    acquirer with a short timeout must raise TimeoutError while the
    holder persists, and elect immediately once the holder releases."""
    import pytest

    from crime_data_batch_processing_spark.sources.pydatasource import (
        _acquire_commit_lock,
        _release_commit_lock,
    )

    lock = str(tmp_path / "_manifest.json.lock")
    fd_a = _acquire_commit_lock(lock)
    with pytest.raises(TimeoutError):
        _acquire_commit_lock(lock, timeout_s=0.3)
    _release_commit_lock(lock, fd_a)
    fd_b = _acquire_commit_lock(lock, timeout_s=0.3)
    _release_commit_lock(lock, fd_b)


def test_commit_runs_without_repo_on_sys_path(tmp_path):
    """Spark executes a Python data source's commit() in a
    JVM-spawned worker that does NOT have this repo on sys.path — the
    writer and everything it calls arrive by cloudpickle VALUE.
    Regression pin for the round-8 latent bug: the commit-lock helper
    did a call-time package import (`fixtures._break_if_still_stale`)
    that raised ModuleNotFoundError in that worker the first time a
    fresh fixture build ran outside a repo cwd. Replays the exact
    context: pickle the writer here, unpickle and commit in a
    subprocess whose sys.path cannot see the repo."""
    import subprocess
    import sys
    from pathlib import Path

    from pyspark import cloudpickle

    import crime_data_batch_processing_spark
    from crime_data_batch_processing_spark.sources.pydatasource import (
        FileCommit,
        ManifestParquetWriter,
    )

    # the ACTUAL directory the package imports from (r8 advisor fix:
    # a substring filter like `"repo" not in p` removes nothing in a
    # checkout whose path lacks the word, passing vacuously)
    repo_root = str(Path(crime_data_batch_processing_spark.__file__).resolve().parents[1])

    writer = ManifestParquetWriter(str(tmp_path), overwrite=False)
    blob = tmp_path / "writer.pkl"
    with open(blob, "wb") as f:
        cloudpickle.dump((writer, [FileCommit("data-x.parquet", 1)]), f)

    script = f"""
import os.path, sys
root = {repo_root!r}
sys.path[:] = [
    p for p in sys.path
    if os.path.realpath(p or ".") != root
    and not os.path.realpath(p or ".").startswith(root + os.sep)
]
for mod in [m for m in sys.modules if m.split(".")[0] == "crime_data_batch_processing_spark"]:
    del sys.modules[mod]
try:
    import crime_data_batch_processing_spark  # noqa: F401
    print("PKG_STILL_IMPORTABLE")  # filter failed: test would be vacuous
except ImportError:
    pass
from pyspark import cloudpickle
with open({str(blob)!r}, "rb") as f:
    writer, msgs = cloudpickle.load(f)
writer.commit(msgs)
print("COMMIT_OK")
"""
    r = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, cwd="/",
    )
    assert "PKG_STILL_IMPORTABLE" not in r.stdout, (
        "sys.path filter failed to hide the repo — the regression "
        "context (module-less worker) was not reproduced"
    )
    assert "COMMIT_OK" in r.stdout, (r.stdout, r.stderr[-2000:])
    assert (tmp_path / "_manifest.json").exists()
