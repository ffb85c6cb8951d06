#!/usr/bin/env python
"""Soak-tier runner: time registered query keys on a generated tier.

Companion to tools/gen_soak.py. Runs each key twice in one fresh
session (local[N], one warmup job first): run 1 is cold (includes any
derived-fixture build for the tier), run 2 is the steady-state query
path (fixtures built, cachekit released between runs). Growth
exponents are fit on run-2 times — the per-query cost a production
deployment pays after its indexes exist — with run-1 recorded so
index-build growth is visible too.

Usage (cwd outside the repo):
    python /root/repo/tools/soak.py --sf-dir /tmp/cdbp_soak/s10 \
        --cpus 32 --keys dedup_minhash,sim_search_lsh
Prints one JSON line: {"sf_dir": ..., "times": {key: [cold, warm]}}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--keys", required=True)
    ap.add_argument("--driver-mem", default="16g",
                    help="local-mode JVM heap; the bench default (1g) "
                         "OOMs above the sf0.1-equivalent tier")
    ap.add_argument("--materialize", choices=["collect", "noop"],
                    default="collect",
                    help="collect (default; row count = len) or noop "
                         "sink write + count() — for keys whose tier "
                         "output is too wide to ship to the Python "
                         "driver (the timing then measures the full "
                         "JVM-side plan, same as bench.py)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from crime_data_batch_processing_spark import cachekit, registry

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.driver.memory", args.driver_mem)
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    entrymod.entry(spark).collect()  # JVM/codegen warmup

    times: dict[str, list[float]] = {}
    for k in args.keys.split(","):
        runs = []
        for rep in range(2):
            t0 = time.time()
            df = registry.QUERIES[k](spark, args.sf_dir)
            if args.materialize == "noop":
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.time() - t0, 3))
                # row count reported but NOT timed; computed once, on
                # the warm rep, to avoid doubling the cold run
                n = df.count() if rep == 1 else None
            else:
                n = len(df.collect())
                runs.append(round(time.time() - t0, 3))
            cachekit.release_all()
        times[k] = runs
        print(f"# {k}: cold={runs[0]}s warm={runs[1]}s rows={n}",
              file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "cpus": args.cpus,
                      "times": times}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
