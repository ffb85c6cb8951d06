#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR.

Prints exactly TWO JSON lines (a parser must select by FIELD, not by
line position — take the line whose object has a "queries" key for
per-query timings; the other line is a short always-fits summary):

    {"metric": "total_query_wall", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1, ...}
    {"metric": "total_query_wall", "value": N, "unit": "sec",
     "sf": 0.1, "keys": 217, "failed": [], "totals": [...], ...}

The driver records only a bounded TAIL of stdout; the full per-query
line outgrew it at ~215 keys, so the short second line exists to keep
the headline in the permanent record even when the long line is cut.

Headline protocol: the suite runs SPARK_GRAFT_BENCH_TOTAL_REPS full
passes (default 3) and reports "value" = MEDIAN of the pass totals,
with every pass total in "totals" and the first (coldest) pass in
"value_rep1". Same-host re-runs of identical code historically read
±15% under VM-neighbor load (BASELINE.md's variance note); a
median-of-3 headline stops round-over-round comparisons from reading
that noise as regression. Per-query timings are the per-key median
across passes. A wall-clock budget (SPARK_GRAFT_BENCH_BUDGET_S,
default 900) stops STARTING new passes once crossed, so the headline
degrades to median-of-fewer instead of risking an external runner's
timeout losing the record entirely; "totals" shows how many passes
actually ran.

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
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "1"))
#: full-suite passes for the median-of-N headline (see module
#: docstring); defaults to 1 when REPS>1 (the two protocols measure
#: different things and should not be mixed implicitly)
TOTAL_REPS = int(
    os.environ.get(
        "SPARK_GRAFT_BENCH_TOTAL_REPS", "1" if REPS > 1 else "3"
    )
)
#: comma-separated subset of query keys to bench (default: all) — for
#: clean isolated re-runs of individual outliers per the BASELINE.md
#: protocol (timings contend hard with concurrent Spark work)
KEYS = [k for k in os.environ.get("SPARK_GRAFT_BENCH_KEYS", "").split(",") if k]
#: wall-clock budget for the multi-pass loop: once a FINISHED pass
#: crosses this, no further pass starts and the medians come from the
#: passes done — the median-of-3 headline must degrade to
#: median-of-fewer rather than risk an external runner's timeout
#: producing NO record at all (passes are never cut mid-way, so every
#: reported pass total is a complete suite)
BUDGET_S = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "900"))


def sf_from_dir(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else float("nan")


def main() -> None:
    from crime_data_batch_processing_spark import cachekit, registry
    from crime_data_batch_processing_spark.session import get_spark

    registry.load_all_operators()
    spark = get_spark(app_name="cdbp-bench")

    # warm the JVM (executor threads, codegen compiler, parquet
    # footer cache) with one throwaway job so the alphabetically-first
    # query doesn't absorb ~4s of session spin-up in its timing
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    keys = KEYS or sorted(registry.QUERIES)
    per_key: dict[str, list[float]] = {k: [] for k in keys}
    failed: set[str] = set()
    pass_totals: list[float] = []
    t_start = time.monotonic()
    for _pass in range(TOTAL_REPS):
        if pass_totals and time.monotonic() - t_start > BUDGET_S:
            print(
                f"# bench budget ({BUDGET_S:.0f}s) reached after "
                f"{len(pass_totals)} pass(es); skipping the rest",
                file=sys.stderr,
            )
            break
        pass_total = 0.0
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
                    failed.add(key)
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
                med = sorted(samples)[len(samples) // 2]
                per_key[key].append(med)
                pass_total += med
        pass_totals.append(round(pass_total, 3))

    timings = {
        k: (-1.0 if k in failed or not v
            else round(sorted(v)[len(v) // 2], 3))
        for k, v in per_key.items()
    }
    totals_sorted = sorted(pass_totals)
    total = totals_sorted[len(totals_sorted) // 2]
    # compact separators + 3-decimal seconds: the driver records only a
    # bounded tail of stdout, and the ~220-key payload must fit inside
    # it whole or the per-query timings are unparseable (round 2's
    # BENCH capture lost the head of the line)
    print(
        json.dumps(
            {
                "metric": "total_query_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_from_dir(SF_DIR),
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
                "value_rep1": pass_totals[0],
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
