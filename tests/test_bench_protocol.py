"""Protocol-level tests for bench.py (no Spark session needed).

Round 10's permanent record was contaminated by two protocol bugs the
judge adjudicated (VERDICT r10 "What's wrong"): the even-count median
picked the UPPER element (a 2-pass run enshrined the worst pass as
the headline), and the per-run budget let one slow loaded pass eat
the room the median needed to recover. These tests pin the fixes.
"""

from __future__ import annotations

import importlib
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

bench = importlib.import_module("bench")


def test_median_odd_is_middle_element():
    assert bench.median([3.0, 1.0, 2.0]) == 2.0


def test_median_even_is_mean_of_middles():
    """The round-10 bug: sorted[n//2] on [331.7, 614.4] returned
    614.4 — the single worst pass. A true median averages the two
    middles."""
    assert bench.median([614.4, 331.7]) == (331.7 + 614.4) / 2.0
    assert bench.median([4.0, 1.0, 3.0, 2.0]) == 2.5


def test_median_single_sample():
    assert bench.median([7.0]) == 7.0


def test_total_reps_clamped_to_at_least_one():
    """TOTAL_REPS=0 via env must not produce an empty totals list and
    an IndexError at the summary line (r10 advisor)."""
    assert bench.TOTAL_REPS >= 1
    assert bench.REPS >= 1


def test_failed_key_vanishes_from_every_pass_total():
    """Failure consistency (r10 advisor): a key that fails in pass 2
    is wiped from per_key, so pass 1's total must no longer include
    its pass-1 sample — totals within one run always cover the
    identical key set, and a transient single-pass failure can never
    silently deflate the headline relative to earlier passes."""
    per_key = {
        "a": [1.0, 1.1, 1.2],
        "b": [],  # failed in pass 2 → wiped retroactively
        "c": [2.0, 2.1, 2.2],
    }
    assert bench.pass_totals_over_common_keys(per_key, 3) == [
        3.0,
        3.2,
        3.4,
    ]


def test_pass_totals_with_zero_passes_is_empty():
    assert bench.pass_totals_over_common_keys({"a": []}, 0) == []


def test_budget_gate_two_pass_floor_and_min_comparison():
    """The round-10 replay (code-review finding): a 614s loaded pass 1
    under a 900s budget MUST still get its recovery pass — a
    single-pass median IS the contaminated pass. And the gate for
    pass 3+ compares against the CHEAPEST pass (can an uncontaminated
    pass still fit?), not the most expensive one."""
    # pass 2 always starts, however slow pass 1 was
    assert bench.should_start_pass([614.4], remaining_s=285.6)
    # first pass trivially starts
    assert bench.should_start_pass([], remaining_s=0.0)
    # pass 3: gate on the cheapest pass so far
    assert bench.should_start_pass([614.4, 331.7], remaining_s=332.0)
    assert not bench.should_start_pass([614.4, 331.7], remaining_s=300.0)


def test_infer_round_prefers_env(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ROUND", "42")
    assert bench.infer_round() == 42


def test_infer_round_is_newest_record_plus_one(monkeypatch):
    """At run time the newest BENCH_r{N}.json on disk is the PREVIOUS
    round's — the driver writes the current round's file after this
    run — so the sidecar belongs to N+1."""
    monkeypatch.delenv("SPARK_GRAFT_BENCH_ROUND", raising=False)
    import re

    # mirror infer_round's strict pattern: variant records like
    # BENCH_r14_c8.json (the driver's low-core scaling run) are not
    # round headliners and must not advance the inferred round
    newest = max(
        int(m.group(1))
        for p in REPO.glob("BENCH_r*.json")
        if (m := re.match(r"BENCH_r(\d+)\.json$", p.name))
    )
    assert bench.infer_round() == newest + 1


def test_two_pass_floor_bounded_by_max_wall(monkeypatch):
    """The floor is bounded (r11 advisor): a pass 1 already past the
    absolute wall ceiling forfeits its forced recovery pass instead
    of pushing total wall to ~2x the pathological pass and past the
    external runner's kill window — the no-record failure mode the
    budget exists to prevent."""
    monkeypatch.setattr(bench, "MAX_WALL_S", 1800.0)
    # under the ceiling: the floor holds, however slow pass 1 was
    assert bench.should_start_pass([1700.0], remaining_s=-800.0,
                                   elapsed_s=1700.0)
    # at/over the ceiling: no forced pass 2
    assert not bench.should_start_pass([1850.0], remaining_s=-950.0,
                                       elapsed_s=1850.0)
    # the ceiling gates only the floor — pass 3+ stays on the
    # cheapest-pass budget rule regardless of elapsed
    assert bench.should_start_pass([600.0, 200.0], remaining_s=250.0,
                                   elapsed_s=1900.0)


def test_max_wall_defaults_to_twice_budget(monkeypatch):
    """Re-derive the default under a clean env instead of asserting
    on import-time globals (r12 advisor): the old form broke under
    any environment exporting SPARK_GRAFT_BENCH_MAX_WALL_S or a
    custom budget with an explicit wall."""
    monkeypatch.delenv("SPARK_GRAFT_BENCH_MAX_WALL_S", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_BENCH_BUDGET_S", raising=False)
    fresh = importlib.reload(bench)
    try:
        assert fresh.MAX_WALL_S == 2 * fresh.BUDGET_S
        assert fresh.BUDGET_S == 900.0
    finally:
        importlib.reload(bench)


def test_max_wall_nonpositive_means_unbounded(monkeypatch):
    """SPARK_GRAFT_BENCH_MAX_WALL_S <= 0 is a plausible 'disable'
    attempt (mirrors LOAD_GATE's documented semantics); it must mean
    UNBOUNDED, never 'refuse pass 1 and record nothing' (r12
    advisor)."""
    monkeypatch.setenv("SPARK_GRAFT_BENCH_MAX_WALL_S", "0")
    fresh = importlib.reload(bench)
    try:
        assert fresh.MAX_WALL_S == float("inf")
        # the forced pass 2 is never forfeited under a disabled wall
        assert fresh.should_start_pass(
            [9999.0], remaining_s=-9000.0, elapsed_s=9999.0
        )
    finally:
        monkeypatch.delenv("SPARK_GRAFT_BENCH_MAX_WALL_S")
        importlib.reload(bench)


def test_pass_one_always_starts(monkeypatch):
    """Zero passes means zero record — pass 1 starts regardless of
    the wall ceiling's configuration (r12 advisor)."""
    monkeypatch.setattr(bench, "MAX_WALL_S", 0.0)
    assert bench.should_start_pass([], remaining_s=-100.0,
                                   elapsed_s=100.0)


def test_wait_for_quiet_waits_then_proceeds(monkeypatch):
    """The between-pass gate (r12 verdict item 4): waits in 15s steps
    while loaded, returns once quiet; a host that never quiets exits
    at the bound (a stamped record beats no record)."""
    monkeypatch.setattr(bench, "LOAD_GATE", 2.0)
    loads = iter([8.6, 8.0, 1.2])
    slept: list[float] = []
    load0, waited = bench.wait_for_quiet(
        120.0, label="pass 2",
        getload=lambda: next(loads), sleep=slept.append,
    )
    assert load0 == 8.6
    assert waited == 30.0 and slept == [15.0, 15.0]
    # never-quiet host: exits at the bound, not an infinite stall
    load0, waited = bench.wait_for_quiet(
        45.0, getload=lambda: 9.9, sleep=lambda s: None,
    )
    assert waited == 45.0
    # quiet host: no wait at all
    load0, waited = bench.wait_for_quiet(
        120.0, getload=lambda: 0.5, sleep=slept.append,
    )
    assert waited == 0.0 and len(slept) == 2


def test_sidecar_diverts_instead_of_clobbering(monkeypatch, tmp_path):
    """An inferred-round run must never overwrite an existing (i.e.
    committed) BENCH_PERKEY_r{N}.json — it diverts to the _new
    sibling; an explicit SPARK_GRAFT_BENCH_ROUND keeps the canonical
    target (the builder's headline protocol)."""
    monkeypatch.setattr(bench, "REPO", tmp_path)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ROUND", "12")
    committed = tmp_path / "BENCH_PERKEY_r12.json"
    # explicit round, nothing on disk -> canonical name
    assert bench.sidecar_path() == committed
    committed.write_text("{}\n")
    # explicit round may overwrite its own record
    assert bench.sidecar_path() == committed
    # inferred round with the record already committed -> divert
    monkeypatch.delenv("SPARK_GRAFT_BENCH_ROUND")
    (tmp_path / "BENCH_r11.json").write_text("{}\n")
    assert bench.sidecar_path().name == "BENCH_PERKEY_r12_new.json"
    # inferred round, no existing record -> canonical name
    committed.unlink()
    assert bench.sidecar_path() == committed


def test_sidecar_divert_is_uniquified(monkeypatch, tmp_path):
    """A SECOND inferred-round run in the same round must not clobber
    the FIRST diverted record (r12 advisor): the divert target
    uniquifies (_new, _new2, _new3, ...)."""
    monkeypatch.setattr(bench, "REPO", tmp_path)
    monkeypatch.delenv("SPARK_GRAFT_BENCH_ROUND", raising=False)
    (tmp_path / "BENCH_r12.json").write_text("{}\n")
    (tmp_path / "BENCH_PERKEY_r13.json").write_text("{}\n")
    assert bench.sidecar_path().name == "BENCH_PERKEY_r13_new.json"
    (tmp_path / "BENCH_PERKEY_r13_new.json").write_text("{}\n")
    assert bench.sidecar_path().name == "BENCH_PERKEY_r13_new2.json"
    (tmp_path / "BENCH_PERKEY_r13_new2.json").write_text("{}\n")
    assert bench.sidecar_path().name == "BENCH_PERKEY_r13_new3.json"


def test_query_chunks_deterministic_bounded_complete():
    """r14 verdict item 2: the driver records only the last ~2000
    chars of stdout, so per-query data must reach it as bounded,
    deterministically-packed chunk lines — same keys + same budget
    must give identical boundaries round over round, every line must
    fit the budget, and the union must lose no key."""
    import json

    timings = {f"query_{i:03d}_some_longish_name": i / 1000 for i in range(244)}
    chunks = bench.query_chunks(timings)
    # complete and disjoint
    seen: dict[str, float] = {}
    for c in chunks:
        assert not (set(c) & set(seen))
        seen.update(c)
    assert seen == timings
    # every serialized line fits the budget
    for i, c in enumerate(chunks, 1):
        line = json.dumps(
            {
                "metric": "total_query_wall_part",
                "part": i,
                "parts": len(chunks),
                "unit": "sec",
                "sf": 0.1,
                "queries": c,
            },
            separators=(",", ":"),
        )
        assert len(line) <= bench.CHUNK_LINE_CHARS, (i, len(line))
    # deterministic: a second pass over the same inputs packs the same
    assert bench.query_chunks(dict(reversed(list(timings.items())))) == chunks
    # keys are in sorted order within and across chunks
    flat = [k for c in chunks for k in c]
    assert flat == sorted(timings)
