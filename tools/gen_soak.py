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

TIERS = {"s1": (5000, 2000), "s3": (15811, 4000), "s10": (50000, 8000)}


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
    args = ap.parse_args()
    for tier, (n_docs, n_emb) in TIERS.items():
        d = os.path.join(args.base, tier)
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            gen_documents(n_docs, args.seed), os.path.join(d, "documents.parquet")
        )
        pq.write_table(
            gen_embeddings(n_emb, args.seed), os.path.join(d, "embeddings.parquet")
        )
        print(f"{d}: documents={n_docs} embeddings={n_emb}")


if __name__ == "__main__":
    main()
