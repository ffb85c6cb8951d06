"""Generate builder-owned soak tiers above the driver's sf0.1.

The driver's testdata tops out at sf0.1 (TESTDATA.md), so growth
claims for the superlinear-risk families (ANN ladder, dedup banding,
graph keys) extrapolate one decade beyond the largest measured tier.
This tool generates that missing decade — documents x10, embeddings
x4, the driver's own per-decade scaling convention — into a
builder-owned directory (NEVER /root/testdata), with the same
distributions as the driver data, measured from it:

documents (probed on /root/testdata/sf0.1):
  - 30-word uniform vocabulary (the observed vocab minus the marker);
  - uniform 10..100 words per doc, space-joined; n_chars=len(text);
  - lang ~ {en: .42, de/es/fr/zh: .145} (observed 41.2%/~14.9%);
  - source uniform over src0..src19;
  - 5% of docs are NEAR-DUP COPIES: a uniformly chosen earlier doc's
    text + " dup" appended, same lang, source re-drawn (measured:
    250/5000 docs carry the marker; copies share the full prefix;
    copy-of-copy collisions reproduce the ~8 exact dups).

embeddings: iid unit-normalized 64-dim float32 vectors (measured:
intra-label mean cosine == inter-label == ~0, global max 0.60 at
sf0.1 — no cluster structure, no planted near-dup pairs), label
uniform 0..9.

Tiers (docs, embeddings): s1 (5000, 2000) — the sf0.1-equivalent
rung, used to cross-check the generator reproduces driver-tier
runtimes; s3 (15811, 4000) — half-decade; s10 (50000, 8000) — the
full extra decade. Seeded, deterministic, regenerable.

Usage: python tools/gen_soak.py [--base /tmp/cdbp_soak]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.42, 0.145, 0.145, 0.145, 0.145]
COPY_RATE = 0.05
DIM = 64

#: documents/embeddings tiers; s100 (two decades above sf0.1, text
#: family only — REL_TIERS stops at s10) exists to give the banded
#: dedup/graph/ANN rungs a FOUR-point, two-decade growth fit.
TIERS = {
    "s1": (5000, 2000),
    "s3": (15811, 4000),
    "s10": (50000, 8000),
    "s100": (500000, 32000),
}


def gen_documents(n: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts: list[str] = []
    langs: list[str] = []
    sources: list[str] = []
    for i in range(n):
        if i > 0 and rng.random() < COPY_RATE:
            j = int(rng.integers(0, i))
            texts.append(texts[j] + " dup")
            langs.append(langs[j])
        else:
            length = int(rng.integers(10, 101))
            texts.append(" ".join(rng.choice(VOCAB, size=length)))
            langs.append(str(rng.choice(LANGS, p=LANG_P)))
        sources.append(f"src{int(rng.integers(0, 20))}")
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(n: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed + 1)
    v = rng.standard_normal((n, DIM))
    v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(v), pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(0, 10, size=n).astype(np.int32), pa.int32()
            ),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/tmp/cdbp_soak")
    ap.add_argument("--seed", type=int, default=1042)
    ap.add_argument("--skip-text", action="store_true",
                    help="only (re)generate the relational tables")
    ap.add_argument("--skip-relational", action="store_true",
                    help="only (re)generate documents/embeddings")
    ap.add_argument("--tiers", default="",
                    help="comma-separated tier subset (default: all) — "
                         "generation is seeded/deterministic, so "
                         "regenerating an existing tier is harmless "
                         "but wasteful")
    args = ap.parse_args()
    only = set(args.tiers.split(",")) if args.tiers else None
    if only is not None:
        known = set(TIERS) | set(REL_TIERS)
        unknown = sorted(only - known)
        if unknown:
            # a typo'd tier silently generating nothing would leave a
            # soak run pointed at missing data — fail loudly instead
            ap.error(
                f"unknown tier(s) {unknown}; known: {sorted(known)}"
            )
    for tier in sorted(set(TIERS) | set(REL_TIERS)):
        if only is not None and tier not in only:
            continue
        d = os.path.join(args.base, tier)
        os.makedirs(d, exist_ok=True)
        if not args.skip_text and tier in TIERS:
            n_docs, n_emb = TIERS[tier]
            pq.write_table(
                gen_documents(n_docs, args.seed),
                os.path.join(d, "documents.parquet"),
            )
            pq.write_table(
                gen_embeddings(n_emb, args.seed),
                os.path.join(d, "embeddings.parquet"),
            )
            print(f"{d}: documents={n_docs} embeddings={n_emb}")
        if not args.skip_relational and tier in REL_TIERS:
            tables = gen_relational(tier, args.seed)
            for name, table in tables.items():
                pq.write_table(table, os.path.join(d, f"{name}.parquet"))
            print(f"{d}: " + " ".join(
                f"{k}={v.num_rows}" for k, v in tables.items()
            ))


# ---------------------------------------------------------------------------
# Relational decade (round 8, second half): the TPC-H-ish star schema
# one decade above sf0.1 — lineitem x10 per decade, the driver's own
# convention. Distributions measured from /root/testdata/sf0.1:
# every key dense or uniform over its observed range, prices uniform
# 2-decimal (retailprice 1-decimal 900..1000, extendedprice
# independent uniform 900..105000 — unit-price range check matches),
# quantity integer-valued 1..50, discount 0..0.10 step .01, tax
# 0..0.08, dates uniform over the observed day ranges (orderdate
# 1995-01-01..2001-08-01, shipdate 1995-01-02..2001-11-04,
# INDEPENDENT of orderdate — measured gaps -2399..+2496 days),
# o_totalprice independent of the line sum (measured), events ts
# uniform microseconds over 2024-01, value ~ Exponential(50) rounded
# to cents (measured median 34.77 == 50 ln 2), props {"k": 0..99},
# users = customers/10. region/nation are the fixed 5/25-row dims.
# ---------------------------------------------------------------------------

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
P_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
P_TYPE = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
E_TYPES = ["click", "error", "purchase", "signup", "view"]

#: (customer, supplier, part, orders, lineitem, events) rows per tier;
#: s1 matches sf0.1 exactly (the generator-validation rung), s10 is
#: the sf1-equivalent decade; s30 (round 9) extends the relational
#: span a further half-decade (19M lineitem / 3.2M events) for the
#: near-linear sort shapes the round-8 verdict flagged
#: (agg_weighted_median 0.78, cdc_upsert 0.72, window_sessionize
#: 0.71 — a third point either confirms sort-bound or exposes a
#: constant). Relational-only: no text/embedding s30 (TIERS covers
#: the text family through s100).
REL_TIERS = {
    "s1": (15_000, 1_000, 20_000, 150_000, 600_000, 100_000),
    "s3": (47_434, 3_162, 63_245, 474_341, 1_897_366, 316_227),
    "s10": (150_000, 10_000, 200_000, 1_500_000, 6_000_000, 1_000_000),
    "s30": (474_342, 31_623, 632_456, 4_743_416, 18_973_666, 3_162_277),
}


def _days(rng, n, lo, hi):
    import numpy as _np

    d0 = _np.datetime64(lo)
    span = int((_np.datetime64(hi) - d0) / _np.timedelta64(1, "D"))
    return (d0 + rng.integers(0, span + 1, n).astype("timedelta64[D]")).astype(
        "datetime64[us]"
    )


def gen_relational(tier: str, seed: int) -> dict:
    n_cust, n_supp, n_part, n_ord, n_line, n_evt = REL_TIERS[tier]
    rng = np.random.default_rng(seed + 7)
    t = {}
    t["region"] = pa.table(
        {
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
        }
    )
    t["nation"] = pa.table(
        {
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        }
    )
    t["customer"] = pa.table(
        {
            "c_custkey": pa.array(range(n_cust), pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": pa.array(
                rng.integers(0, 25, n_cust).astype(np.int32), pa.int32()
            ),
            "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
            "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
        }
    )
    t["supplier"] = pa.table(
        {
            "s_suppkey": pa.array(range(n_supp), pa.int64()),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": pa.array(
                rng.integers(0, 25, n_supp).astype(np.int32), pa.int32()
            ),
            "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
        }
    )
    adj = np.array(P_ADJ)[rng.integers(0, 8, n_part)]
    noun = np.array(P_NOUN)[rng.integers(0, 8, n_part)]
    t["part"] = pa.table(
        {
            "p_partkey": pa.array(range(n_part), pa.int64()),
            "p_name": np.char.add(np.char.add(adj, " "), noun),
            "p_brand": np.array(
                [f"Brand#{b}" for b in range(1, 26)]
            )[rng.integers(0, 25, n_part)],
            "p_type": np.array(P_TYPE)[rng.integers(0, 6, n_part)],
            "p_size": pa.array(
                rng.integers(1, 51, n_part).astype(np.int32), pa.int32()
            ),
            "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 1),
        }
    )
    t["orders"] = pa.table(
        {
            "o_orderkey": pa.array(range(n_ord), pa.int64()),
            "o_custkey": pa.array(
                rng.integers(0, n_cust, n_ord), pa.int64()
            ),
            "o_orderstatus": np.array(["F", "O", "P"])[
                rng.integers(0, 3, n_ord)
            ],
            "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
            "o_orderdate": _days(rng, n_ord, "1995-01-01", "2001-08-01"),
            "o_orderpriority": np.array(PRIORITIES)[
                rng.integers(0, 5, n_ord)
            ],
        }
    )
    t["lineitem"] = pa.table(
        {
            "l_orderkey": pa.array(rng.integers(0, n_ord, n_line), pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n_part, n_line), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n_supp, n_line), pa.int64()),
            "l_linenumber": pa.array(
                rng.integers(1, 8, n_line).astype(np.int32), pa.int32()
            ),
            "l_quantity": rng.integers(1, 51, n_line).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105000, n_line), 2),
            "l_discount": np.round(rng.integers(0, 11, n_line) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, n_line) / 100.0, 2),
            "l_returnflag": np.array(["A", "N", "R"])[
                rng.integers(0, 3, n_line)
            ],
            "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_line)],
            "l_shipdate": _days(rng, n_line, "1995-01-02", "2001-11-04"),
        }
    )
    ts0 = np.datetime64("2024-01-01T00:00:00.000000")
    span_us = 30 * 24 * 3600 * 1_000_000
    t["events"] = pa.table(
        {
            "event_id": pa.array(range(n_evt), pa.int64()),
            "ts": ts0 + rng.integers(0, span_us, n_evt).astype("timedelta64[us]"),
            "user_id": pa.array(
                rng.integers(0, n_cust // 10, n_evt), pa.int64()
            ),
            "event_type": np.array(E_TYPES)[rng.integers(0, 5, n_evt)],
            "value": np.round(rng.exponential(50.0, n_evt), 2),
            "props": [
                '{"k": %d}' % k for k in rng.integers(0, 100, n_evt)
            ],
        }
    )
    return t


if __name__ == "__main__":
    main()
