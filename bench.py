#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR.

Prints, in order (a parser must select by FIELD, not line position):

    {"metric": "total_query_wall", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1, ...}      # full payload
    {"metric": "total_query_wall_part", "part": i, "parts": n,
     "queries": {...}, ...}                            # n chunk lines
    {"metric": "total_query_wall", "value": N, "unit": "sec",
     "sf": 0.1, "keys": 226, "failed": [], "totals": [...], ...}

The first line is the complete per-query payload (the historical
one-JSON-line contract — unchanged, still carries every key). The
driver, however, records only the LAST ~2000 chars of stdout, which
the full payload outgrew at ~215 keys: its head is cut and the
round-over-round per-query diff then ran on two DIFFERENTLY truncated
fragments, fabricating dozens of "dropped" queries (r14 verdict
item 2). The chunk lines fix that: each is a self-contained JSON line
bounded to CHUNK_LINE_CHARS with a DETERMINISTIC key range (sorted
keys, greedy byte packing), so whichever chunk(s) land inside the
driver's tail cover the SAME keys every round and always parse. The
short summary line stays LAST so the tail's final fragment is the
headline. The COMPLETE per-query payload is additionally written to a
repo sidecar file (BENCH_PERKEY_r{N}.json, N inferred from the newest
BENCH_r*.json already on disk, overridable via
SPARK_GRAFT_BENCH_ROUND) so all per-key figures survive in git even
when the driver's stdout tail truncates the long line.

Headline protocol: the suite runs SPARK_GRAFT_BENCH_TOTAL_REPS full
passes (default 3) and reports "value" = MEDIAN of the pass totals,
with every pass total in "totals" and the first (coldest) pass in
"value_rep1". For an EVEN pass count the median is the MEAN of the
two middle elements — round 10 recorded sorted[n//2] (the UPPER
element), which for a 2-pass run enshrined the single worst pass as
the headline. Same-host re-runs of identical code historically read
±15% under VM-neighbor load (BASELINE.md's variance note); a
median-of-3 headline stops round-over-round comparisons from reading
that noise as regression. Per-query timings are the per-key median
across passes (same even-count rule).

Budget is PER-PASS, not per-run, with a two-pass floor: pass 2
always runs when TOTAL_REPS >= 2 — a single loaded pass must never
stand alone as a median-of-1 headline (round 10's failure mode: a
614s loaded pass 1; with the floor plus the true even-N median the
record becomes mean(614, recovery-pass), not the worst pass) — and
pass N>=3 starts only while the remaining budget
(SPARK_GRAFT_BENCH_BUDGET_S, default 900) covers the CHEAPEST pass
so far (the optimistic estimate: can an uncontaminated pass still
fit? comparing against the most expensive pass would let one slow
pass both contaminate the record and block its own correction).
Passes are never cut midway, so every reported total is a complete
suite; the floor bounds worst-case wall at ~2x the slowest pass, and
is itself bounded by SPARK_GRAFT_BENCH_MAX_WALL_S (default 2x
budget): a pass-1 wall already past the ceiling forfeits the forced
recovery pass instead of overrunning the external runner's timeout.

Provenance: both JSON lines carry "recorded_utc" and an "origin"
marker ("explicit-round" when SPARK_GRAFT_BENCH_ROUND was set — the
builder's headline protocol — else "inferred-round"), and an
inferred-round run never overwrites an existing round sidecar: it
diverts to BENCH_PERKEY_r{N}_new.json so the committed record and
the later (e.g. driver post-commit) record both survive in git.

Load honesty: os.getloadavg() is stamped into both JSON lines —
"load_at_launch" plus a per-pass "loads" list — so a contaminated
record is self-describing. If the 1-min load exceeds
SPARK_GRAFT_BENCH_LOAD_GATE (default 2.0) at launch, the harness
waits in 15s steps up to SPARK_GRAFT_BENCH_LOAD_WAIT_S (default 300)
for the host to go quiet before starting; it then proceeds either
way (a stamped record beats no record) and the stamp plus
"load_gate_waited_s" makes the conditions part of the permanent
record. The gate is also applied BETWEEN passes (r12: the driver's
record proceeded into a load-8.6 pass 2): before each pass >= 2 the
harness waits up to SPARK_GRAFT_BENCH_PASS_LOAD_WAIT_S (default 120)
for the same LOAD_GATE bound, stamping per-pass waits in
"pass_gate_waits". Gate waits are EXCLUDED from the elapsed time the
budget rule sees (they are host noise, not measurement cost, so a
wait never forfeits a pass an instantly-quiet host would have kept)
but deliberately INCLUDED in the MAX_WALL_S ceiling, which bounds
the external runner's real kill window (r13 advisor).

Failure consistency: once a key fails, it is excluded from EVERY
pass total, including passes that already completed — otherwise the
totals inside one run cover different key sets and a transient
single-pass failure silently deflates the headline. Failed keys are
named in "failed" and carry -1.0 in "queries".

Each query executes end-to-end through the `noop` sink so the full
physical plan runs JVM-side (scan → compute → materialize) with no
driver-side collect cost polluting the timing.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
#: inner repetitions per query WITHIN a pass; >1 reports the per-query
#: MEDIAN (used when re-recording BASELINE.md rows so the 2x gate
#: compares medians, not a single sample subject to scheduling noise).
#: Setting REPS>1 is the per-key BASELINE protocol — it implies a
#: single pass unless TOTAL_REPS is set explicitly.
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "1")))
#: full-suite passes for the median-of-N headline (see module
#: docstring); defaults to 1 when REPS>1 (the two protocols measure
#: different things and should not be mixed implicitly); clamped to
#: >=1 so an env-var 0 cannot produce an empty totals list
TOTAL_REPS = max(
    1,
    int(
        os.environ.get(
            "SPARK_GRAFT_BENCH_TOTAL_REPS", "1" if REPS > 1 else "3"
        )
    ),
)
#: comma-separated subset of query keys to bench (default: all) — for
#: clean isolated re-runs of individual outliers per the BASELINE.md
#: protocol (timings contend hard with concurrent Spark work)
KEYS = [k for k in os.environ.get("SPARK_GRAFT_BENCH_KEYS", "").split(",") if k]
#: wall-clock budget, applied PER-PASS with a two-pass floor (see
#: module docstring): pass 2 always runs; pass N>=3 starts iff
#: remaining >= min(cost of passes so far) — the median-of-3 headline
#: must degrade to median-of-fewer rather than risk an external
#: runner's timeout producing NO record at all
BUDGET_S = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "900"))
#: absolute wall ceiling for the two-pass floor (r11 advisor): the
#: floor exists so a loaded pass 1 cannot stand alone as a
#: median-of-1 headline, but unbounded it could push total wall to
#: ~2x a pathological pass and past an external runner's kill window
#: — the exact no-record failure the budget prevents. Pass 2 is
#: forced only while elapsed < MAX_WALL_S (default 2x budget).
#: <=0 means UNBOUNDED (mirrors LOAD_GATE's documented <=0-disables
#: semantics, r12 advisor): a literal <=0 ceiling would refuse pass 1
#: itself and produce the exact no-record failure the mechanism
#: exists to prevent — and pass 1 always starts regardless (see
#: should_start_pass).
_MAX_WALL_RAW = float(
    os.environ.get("SPARK_GRAFT_BENCH_MAX_WALL_S", str(2 * BUDGET_S))
)
MAX_WALL_S = _MAX_WALL_RAW if _MAX_WALL_RAW > 0 else float("inf")
#: 1-min loadavg above which the harness delays the start (module
#: docstring "Load honesty"); <=0 disables the gate
LOAD_GATE = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_GATE", "2.0"))
LOAD_WAIT_S = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT_S", "300"))
#: per-PASS load gate (r12 verdict item 4): the launch gate only
#: gated pass 1, so the driver's r12 record proceeded into a load-8.6
#: pass 2 and recorded 356.8s on a tree whose quiet-host truth is
#: ~253s. Before each pass AFTER the first, the harness waits (in the
#: same 15s steps, up to this many seconds) for the 1-min load to
#: drop under LOAD_GATE, then proceeds either way — the per-pass
#: "loads" stamp plus "pass_gate_waits" keeps the record
#: self-describing. Bounded smaller than the launch wait: mid-run the
#: JVM is warm and a long stall risks the external runner's timeout.
PASS_LOAD_WAIT_S = float(
    os.environ.get("SPARK_GRAFT_BENCH_PASS_LOAD_WAIT_S", "120")
)
#: per-query CHUNK line budget (module docstring): the driver's tail
#: window is ~2000 chars and the short summary line (~450 chars,
#: printed last) must share it with the final chunk line, so a chunk
#: line is bounded well under the difference — the last chunk then
#: always sits WHOLE inside the tail
CHUNK_LINE_CHARS = 1400


def query_chunks(
    timings: dict[str, float], budget: int = CHUNK_LINE_CHARS
) -> list[dict[str, float]]:
    """Split per-query timings into deterministic bounded chunks:
    sorted keys, greedy byte packing against the serialized-line
    budget. Same key set + same budget → identical chunk boundaries,
    which is what makes the driver's tail-window fragment comparable
    across rounds (module docstring)."""
    overhead = len(
        '{"metric":"total_query_wall_part","part":00,"parts":00,'
        '"unit":"sec","sf":0.001,"queries":{}}'
    )
    chunks: list[dict[str, float]] = []
    cur: dict[str, float] = {}
    cur_len = overhead
    for k in sorted(timings):
        item = len(json.dumps({k: timings[k]}, separators=(",", ":")))
        if cur and cur_len + item > budget:
            chunks.append(cur)
            cur, cur_len = {}, overhead
        cur[k] = timings[k]
        cur_len += item
    if cur:
        chunks.append(cur)
    return chunks


def sf_from_dir(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else float("nan")


def median(values: list[float]) -> float:
    """True median: mean of the two middles for even counts — never
    the upper element alone (the round-10 headline bug)."""
    s = sorted(values)
    n = len(s)
    if n % 2:
        return s[n // 2]
    return (s[n // 2 - 1] + s[n // 2]) / 2.0


def should_start_pass(
    pass_costs: list[float], remaining_s: float, elapsed_s: float = 0.0
) -> bool:
    """Budget gate for the NEXT pass (module docstring "Budget"):
    passes 1 and 2 always start — a single (possibly loaded) pass
    must never stand alone as a median-of-1 headline — and pass N>=3
    starts only while the remaining budget covers the CHEAPEST pass
    so far. Comparing against the most expensive pass would let one
    slow contaminated pass both become the record and block the
    recovery pass that corrects it (the round-10 replay: 614s loaded
    pass 1 with a 900s budget must still get its second pass).

    The floor is BOUNDED by MAX_WALL_S (r11 advisor): a pathological
    pass 1 longer than the absolute ceiling forfeits its recovery
    pass rather than pushing total wall past the external runner's
    kill window — a stamped single-pass record beats no record.

    Pass 1 starts UNCONDITIONALLY (r12 advisor): however the ceiling
    is configured, zero passes means zero record, which is strictly
    worse than any stamped record."""
    if not pass_costs:
        return True
    if len(pass_costs) < 2:
        return elapsed_s < MAX_WALL_S
    return remaining_s >= min(pass_costs)


def pass_totals_over_common_keys(
    per_key: dict[str, list[float]], n_passes: int
) -> list[float]:
    """Per-pass totals over the IDENTICAL (non-failed) key set: a key
    that fails in pass N has been wiped from per_key, so it vanishes
    from every pass's total — totals within one run always cover the
    same keys (module docstring "Failure consistency"). A key with
    fewer samples than the pass index contributes nothing to that
    pass (it can only happen by failure-wipe, which empties the list
    entirely)."""
    return [
        round(sum(v[i] for v in per_key.values() if len(v) > i), 3)
        for i in range(n_passes)
    ]


def infer_round() -> int:
    """Sidecar round number: env override, else newest BENCH_r*.json
    on disk + 1 (the driver writes BENCH_r{N}.json AFTER this run, so
    at run time the newest existing file is round N-1)."""
    env = os.environ.get("SPARK_GRAFT_BENCH_ROUND")
    if env:
        return int(env)
    seen = [
        int(m.group(1))
        for p in REPO.glob("BENCH_r*.json")
        if (m := re.match(r"BENCH_r(\d+)\.json$", p.name))
    ]
    return (max(seen) + 1) if seen else 0


def sidecar_path() -> Path:
    """Target for the per-key sidecar, clobber-guarded (r11 verdict
    item 5 / advisor): an existing round sidecar is someone's
    committed record — only a run that set SPARK_GRAFT_BENCH_ROUND
    explicitly may overwrite it; an inferred-round run (the driver's
    post-commit bench) diverts to a "_new" sibling so both records
    survive in the tree. A SECOND inferred-round run in the same
    round must not clobber the first diverted record either (r12
    advisor) — the divert target is uniquified (_new, _new2, _new3,
    ...) so EVERY record survives."""
    sidecar = REPO / f"BENCH_PERKEY_r{infer_round():02d}.json"
    if sidecar.exists() and not os.environ.get(
        "SPARK_GRAFT_BENCH_ROUND"
    ):
        diverted = sidecar.with_name(
            sidecar.name.replace(".json", "_new.json")
        )
        n = 2
        while diverted.exists():
            diverted = sidecar.with_name(
                sidecar.name.replace(".json", f"_new{n}.json")
            )
            n += 1
        print(
            f"# bench sidecar: {sidecar.name} exists and "
            "SPARK_GRAFT_BENCH_ROUND is unset — writing "
            f"{diverted.name} instead of clobbering the committed "
            "record",
            file=sys.stderr,
        )
        return diverted
    return sidecar


def wait_for_quiet(
    max_wait_s: float,
    label: str = "launch",
    getload=lambda: os.getloadavg()[0],
    sleep=time.sleep,
) -> tuple[float, float]:
    """Return (load_at_entry, seconds_waited). Delays while the 1-min
    load exceeds LOAD_GATE, up to max_wait_s — then proceeds
    regardless (a stamped record beats no record). Used at launch
    (max LOAD_WAIT_S) and before every pass >= 2 (max
    PASS_LOAD_WAIT_S, r12 verdict item 4). getload/sleep are
    injectable for tests."""
    load0 = getload()
    waited = 0.0
    load = load0
    while LOAD_GATE > 0 and load > LOAD_GATE and waited < max_wait_s:
        step = min(15.0, max_wait_s - waited)
        print(
            f"# bench {label} load gate: 1-min load {load:.2f} > "
            f"{LOAD_GATE:.1f}, waiting {step:.0f}s "
            f"({waited:.0f}/{max_wait_s:.0f}s used)",
            file=sys.stderr,
        )
        sleep(step)
        waited += step
        load = getload()
    return load0, waited


def wait_for_quiet_host() -> tuple[float, float]:
    """Launch-time gate (module docstring "Load honesty")."""
    return wait_for_quiet(LOAD_WAIT_S, label="launch")


def main() -> None:
    from crime_data_batch_processing_spark import cachekit, registry
    from crime_data_batch_processing_spark.session import get_spark

    load_at_launch, gate_waited = wait_for_quiet_host()

    registry.load_all_operators()
    spark = get_spark(app_name="cdbp-bench")

    # warm the JVM (executor threads, codegen compiler, parquet
    # footer cache) with one throwaway job so the alphabetically-first
    # query doesn't absorb ~4s of session spin-up in its timing
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    keys = KEYS or sorted(registry.QUERIES)
    per_key: dict[str, list[float]] = {k: [] for k in keys}
    failed: set[str] = set()
    pass_loads: list[float] = []
    pass_gate_waits: list[float] = []
    pass_costs: list[float] = []  # wall cost incl. failed-key time
    t_start = time.monotonic()
    for _pass in range(TOTAL_REPS):
        elapsed = time.monotonic() - t_start
        # budget headroom excludes between-pass gate waits (r13
        # advisor): time spent waiting for a quiet host is not
        # measurement cost and must not forfeit a pass an
        # instantly-quiet host would have kept. The WALL ceiling
        # check keeps TRUE elapsed — it bounds the external runner's
        # real kill window, waits included (see "Load honesty").
        remaining = BUDGET_S - (elapsed - sum(pass_gate_waits))
        if not should_start_pass(pass_costs, remaining, elapsed):
            # name the actual stop cause (r12 advisor): the forced
            # pass 2 is forfeited only by the wall CEILING, where the
            # budget-rule message would print a nonsense negative
            # remaining-vs-cheapest comparison
            if len(pass_costs) < 2:
                print(
                    f"# bench wall ceiling: elapsed {elapsed:.0f}s >= "
                    f"MAX_WALL_S {MAX_WALL_S:.0f}s; forfeiting the "
                    f"forced recovery pass at {len(pass_costs)} "
                    "pass(es)",
                    file=sys.stderr,
                )
            else:
                print(
                    f"# bench budget: {remaining:.0f}s left < best "
                    f"pass {min(pass_costs):.0f}s; stopping at "
                    f"{len(pass_costs)} pass(es)",
                    file=sys.stderr,
                )
            break
        # between-pass load gate (r12 verdict item 4): pass 1 is
        # covered by the launch gate; later passes wait out any
        # VM-neighbor spike so a contaminated pass is avoided, not
        # merely stamped
        if pass_costs:
            _, gate_waited_pass = wait_for_quiet(
                PASS_LOAD_WAIT_S, label=f"pass {len(pass_costs) + 1}"
            )
            pass_gate_waits.append(round(gate_waited_pass, 1))
        else:
            pass_gate_waits.append(0.0)
        pass_loads.append(round(os.getloadavg()[0], 2))
        t_pass = time.monotonic()
        for key in keys:
            if key in failed:
                continue
            fn = registry.QUERIES[key]
            samples: list[float] = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                try:
                    df = fn(spark, SF_DIR)
                    df.write.format("noop").mode("overwrite").save()
                    samples.append(time.perf_counter() - t0)
                except Exception as exc:  # keep benching; surface it
                    samples = []
                    # drop the key from EVERY pass (module docstring
                    # "Failure consistency") — per_key[key] is wiped
                    # so prior-pass contributions vanish from the
                    # recomputed totals below
                    failed.add(key)
                    per_key[key] = []
                    print(
                        f"# bench FAILED {key}: {exc}", file=sys.stderr
                    )
                    break
                finally:
                    # drop this query's cached signature/corpus state
                    # so later runs aren't timed against a shrinking
                    # executor-memory pool
                    cachekit.release_all()
            if samples:
                per_key[key].append(median(samples))
        pass_costs.append(round(time.monotonic() - t_pass, 3))

    # pass totals recomputed from per_key AFTER all passes, so every
    # total covers the identical (non-failed) key set
    pass_totals = pass_totals_over_common_keys(per_key, len(pass_costs))
    timings = {
        k: (-1.0 if k in failed or not v else round(median(v), 3))
        for k, v in per_key.items()
    }
    total = round(median(pass_totals), 3)
    stamp = {
        "load_at_launch": round(load_at_launch, 2),
        "load_gate_waited_s": round(gate_waited, 1),
        "loads": pass_loads,
        "pass_gate_waits": pass_gate_waits,
        # provenance: who wrote this record and when (r11 verdict —
        # the driver's post-commit run was indistinguishable from the
        # builder's committed headline). "origin" is explicit only
        # when the runner set SPARK_GRAFT_BENCH_ROUND (the builder's
        # headline protocol); an unattributed run stamps "inferred".
        "recorded_utc": time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
        ),
        "origin": (
            "explicit-round"
            if os.environ.get("SPARK_GRAFT_BENCH_ROUND")
            else "inferred-round"
        ),
    }
    # compact separators + 3-decimal seconds: the driver records only a
    # bounded tail of stdout, and the ~226-key payload must fit inside
    # it whole or the per-query timings are unparseable (round 2's
    # BENCH capture lost the head of the line)
    long_line = json.dumps(
        {
            "metric": "total_query_wall",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf_from_dir(SF_DIR),
            **stamp,
        },
        separators=(",", ":"),
    )
    print(long_line)
    # durable sidecar: the full per-query record, committed per round,
    # so the driver's stdout tail can truncate the long line without
    # losing two-thirds of the per-key history (round-10 verdict).
    # Guarded twice: only a full-suite run AT THE HEADLINE SF (0.1)
    # may overwrite the round record — a full run at another scale
    # (sf0.001 validation, a soak tier) must not clobber the
    # committed sf0.1 per-key history — and a write failure must
    # never kill the process between the two protocol print()s (the
    # short line below is the record of last resort).
    if not KEYS and sf_from_dir(SF_DIR) == 0.1:
        try:
            sidecar_path().write_text(long_line + "\n")
        except OSError as exc:
            print(f"# bench sidecar write failed: {exc}", file=sys.stderr)
    # bounded per-query chunk lines (module docstring; r14 verdict
    # item 2): deterministic key ranges so the fragment inside the
    # driver's ~2000-char stdout tail parses and covers the same keys
    # every round
    chunks = query_chunks(timings)
    for i, chunk in enumerate(chunks, 1):
        print(
            json.dumps(
                {
                    "metric": "total_query_wall_part",
                    "part": i,
                    "parts": len(chunks),
                    "unit": "sec",
                    "sf": sf_from_dir(SF_DIR),
                    "queries": chunk,
                },
                separators=(",", ":"),
            )
        )
    # short always-fits summary line (see module docstring)
    print(
        json.dumps(
            {
                "metric": "total_query_wall",
                "value": total,
                "unit": "sec",
                "sf": sf_from_dir(SF_DIR),
                "keys": len(timings),
                "failed": sorted(failed),
                "totals": pass_totals,
                "pass_costs": pass_costs,
                "value_rep1": pass_totals[0] if pass_totals else -1.0,
                **stamp,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
