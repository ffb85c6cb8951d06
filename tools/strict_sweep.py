#!/usr/bin/env python
"""Strict cross-engine sweep: every registered query vs its DuckDB
oracle, bit-exact, in one fresh process walking the driver's key order.

This is the repo-checked-in form of the driver-replica harness the
round workflow uses (stricter than tests/oracle_harness.py's
12-sig-digit normalization — cells are compared by exact repr).
Running it at MULTIPLE scale factors and parallelism configs is the
point: the sf0.1 sweep is what surfaced the 1-ULP JVM-vs-libm log
drift in text_tfidf that the sf0.01 gate could never see.

Usage (ALWAYS from a cwd outside the repo — a repo cwd lands on
worker sys.path and masks by-reference pickling bugs in UDF closures):

    cd /tmp
    python /root/repo/tools/strict_sweep.py                   # sf0.01, local[8]
    python /root/repo/tools/strict_sweep.py --sf-dir /root/testdata/sf0.1 \
        --cpus 32 --keys text_tfidf,join_dpp
"""

from __future__ import annotations

import argparse
import datetime as dt
import decimal
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v: object) -> str:
    """Exact canonical cell: repr round-trips doubles bit-for-bit."""
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, float):
        return repr(v)
    return repr(v)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=8,
                    help="local[N] master AND shuffle partition count")
    ap.add_argument("--keys", default="",
                    help="comma-separated subset (default: all, driver order)")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from crime_data_batch_processing_spark import cachekit

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    assert len(entrymod.entry(spark).collect()) > 0, "entry smoke failed"
    qs, osql = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    keys = args.keys.split(",") if args.keys else list(qs)
    fails: list[str] = []
    for k in keys:
        t0 = time.time()
        try:
            df = qs[k](spark, args.sf_dir)
            scols, srows = df.columns, df.collect()
            rel = con.execute(osql[k])
            dcols = [c[0] for c in rel.description]
            drows = rel.fetchall()
            assert sorted(scols) == sorted(dcols), (
                f"cols {sorted(scols)} vs {sorted(dcols)}"
            )
            so = sorted(range(len(scols)), key=lambda i: scols[i])
            do = sorted(range(len(dcols)), key=lambda i: dcols[i])
            sn = sorted(tuple(canon(r[i]) for i in so) for r in srows)
            dn = sorted(tuple(canon(r[i]) for i in do) for r in drows)
            assert len(sn) == len(dn), f"rows {len(sn)} vs {len(dn)}"
            assert sn == dn, "value mismatch, first diff: " + repr(
                next((a, b) for a, b in zip(sn, dn) if a != b)
            )
            assert len(sn) > 0, "0-row result — vacuous-oracle hazard"
            print(f"OK   {k} ({len(sn)} rows, {time.time() - t0:.1f}s)",
                  flush=True)
        except Exception as ex:  # keep sweeping; report at the end
            fails.append(k)
            print(f"FAIL {k}: {type(ex).__name__}: {str(ex)[:300]}",
                  flush=True)
        finally:
            cachekit.release_all()
    print("STRICT_FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
