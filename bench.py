#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line:
    {"metric": "total_query_wall", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

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
#: repetitions per query; >1 reports the per-query MEDIAN (used when
#: re-recording BASELINE.md so the 2x gate compares medians, not a
#: single sample subject to job-scheduling noise)
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "1"))
#: comma-separated subset of query keys to bench (default: all) — for
#: clean isolated re-runs of individual outliers per the BASELINE.md
#: protocol (timings contend hard with concurrent Spark work)
KEYS = [k for k in os.environ.get("SPARK_GRAFT_BENCH_KEYS", "").split(",") if k]


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

    timings: dict[str, float] = {}
    for key in (KEYS or sorted(registry.QUERIES)):
        fn = registry.QUERIES[key]
        samples: list[float] = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            try:
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            except Exception as exc:  # keep benching; surface the failure
                samples = []
                print(f"# bench FAILED {key}: {exc}", file=sys.stderr)
                break
            finally:
                # drop this query's cached signature/corpus state so
                # later runs aren't timed against a shrinking pool
                cachekit.release_all()
        timings[key] = (
            round(sorted(samples)[len(samples) // 2], 3) if samples else -1.0
        )

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # compact separators + 3-decimal seconds: the driver records only a
    # bounded tail of stdout, and the ~90-key payload must fit inside
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
    # The driver records only a bounded TAIL of stdout, and the full
    # per-query line above outgrew it (~6 kB at 215 keys) — every
    # BENCH_r*.json since then has "parsed": null. Emit a second,
    # SHORT summary line after the big one so the permanent record
    # always contains the headline even when the long line is cut.
    print(
        json.dumps(
            {
                "metric": "total_query_wall",
                "value": total,
                "unit": "sec",
                "sf": sf_from_dir(SF_DIR),
                "keys": len(timings),
                "failed": sorted(k for k, t in timings.items() if t < 0),
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
