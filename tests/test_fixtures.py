"""Unit tests for the shared fixture machinery (no Spark session).

The build-once election guards every derived fixture (CSV/JSON/ORC
copies, Derby, rollup/zone-map/sketch tables); these tests pin its
contract: exactly-once builds, marker short-circuit, stale-lock
healing, and generation-fingerprinted scratch keys.
"""

from __future__ import annotations

import os

import pytest

from crime_data_batch_processing_spark import fixtures


def test_build_once_runs_exactly_once(tmp_path):
    base = str(tmp_path / "fx")
    calls = []
    fixtures.build_once(base, lambda: calls.append(1))
    fixtures.build_once(base, lambda: calls.append(1))
    assert calls == [1]
    assert os.path.exists(f"{base}/_BUILD_OK")


def test_build_once_does_not_mark_failed_build(tmp_path):
    base = str(tmp_path / "fx")

    def boom():
        raise RuntimeError("builder died")

    with pytest.raises(RuntimeError):
        fixtures.build_once(base, boom)
    # no completion marker, no leftover lock — the next call rebuilds
    assert not os.path.exists(f"{base}/_BUILD_OK")
    assert not os.path.exists(f"{base}/_BUILD_LOCK")
    calls = []
    fixtures.build_once(base, lambda: calls.append(1))
    assert calls == [1]


def test_build_once_breaks_stale_lock(tmp_path, monkeypatch):
    base = str(tmp_path / "fx")
    os.makedirs(base)
    lock = f"{base}/_BUILD_LOCK"
    open(lock, "w").close()
    # age the lock past the staleness threshold
    old = os.stat(lock).st_mtime - (fixtures.STALE_LOCK_S + 60)
    os.utime(lock, (old, old))
    calls = []
    fixtures.build_once(base, lambda: calls.append(1))
    assert calls == [1], "stale lock must be broken, not waited on forever"
    assert os.path.exists(f"{base}/_BUILD_OK")


def test_scratch_dir_keys_on_generation(tmp_path):
    sf = tmp_path / "sfX"
    sf.mkdir()
    f = sf / "orders.parquet"
    f.write_bytes(b"generation-one")
    k1 = fixtures.scratch_dir("t", str(sf), "orders")
    # same path, same content → same key
    assert fixtures.scratch_dir("t", str(sf), "orders") == k1
    # regenerated file (different size) → different key
    f.write_bytes(b"generation-two-larger")
    k2 = fixtures.scratch_dir("t", str(sf), "orders")
    assert k2 != k1


def test_probe_ts_unit_handles_missing_dir(tmp_path):
    from crime_data_batch_processing_spark.streaming.stream_events import (
        _probe_ts_unit,
    )

    assert _probe_ts_unit(str(tmp_path / "does-not-exist")) == "ns"
    empty = tmp_path / "empty"
    empty.mkdir()
    assert _probe_ts_unit(str(empty)) == "ns"
