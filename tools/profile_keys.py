#!/usr/bin/env python
"""Per-key profiler for the optimization rounds: times each key's
DRIVER-SIDE build (fn(spark, sf_dir) — includes any eager fixture
jobs, persist+count materializations, and Py4J plan construction)
separately from the EXECUTION of the returned frame through the noop
sink (guide §1.4), and optionally dumps `.explain("formatted")` to
plans/<round>/<key>_{before,after}.txt for the judge's plan-claim audit.

Usage:
    python tools/profile_keys.py --keys text_bm25,sim_search_rrf \
        [--sf-dir /root/testdata/sf0.1] [--reps 2] [--dump before]

Timings print one line per key: key, build_s, exec_s (first rep),
warm_exec_s (median of later reps when --reps > 1), n_jobs.
Uses the SAME session factory as bench.py so numbers are comparable.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--keys", required=True)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--dump", default="",
                    help="suffix (before/after): write plans/<round>/"
                         "<key>_<suffix>.txt with explain('formatted')")
    args = ap.parse_args()

    from crime_data_batch_processing_spark import cachekit, registry
    from crime_data_batch_processing_spark.plans import physical_plan
    from crime_data_batch_processing_spark.session import get_spark

    registry.load_all_operators()
    spark = get_spark(app_name="cdbp-profile")
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()

    plans_dir = REPO / "plans" / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15")
    if args.dump:
        plans_dir.mkdir(parents=True, exist_ok=True)

    print(
        f"{'key':42s} {'build1':>7s} {'exec1':>7s} {'total1':>7s} "
        f"{'warmbld':>7s} {'warmexc':>7s} {'warmtot':>7s}"
    )
    for key in args.keys.split(","):
        fn = registry.QUERIES[key]
        sc = spark.sparkContext
        builds, execs = [], []
        for rep in range(max(1, args.reps)):
            sc.setJobDescription(f"profile:{key}:rep{rep}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            if rep == 0 and args.dump:
                (plans_dir / f"{key}_{args.dump}.txt").write_text(
                    physical_plan(df)
                )
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            cachekit.release_all()

        def med(v: list[float]) -> float:
            s = sorted(v)
            return s[len(s) // 2] if s else -1.0

        wb, we = med(builds[1:]), med(execs[1:])
        print(
            f"{key:42s} {builds[0]:7.3f} {execs[0]:7.3f} "
            f"{builds[0] + execs[0]:7.3f} {wb:7.3f} {we:7.3f} "
            f"{(wb + we if builds[1:] else -1.0):7.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
