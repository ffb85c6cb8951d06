"""Property-based tests (hypothesis): the engine's deterministic
primitives must agree with independent pure-Python reference
implementations on arbitrary inputs — not just the fixture corpus.

Kept to a handful of examples per property: each example is a Spark
job (~0.3 s), and the properties are exact equalities, so a few
adversarial draws (hypothesis shrinks toward edge cases: empty-ish
docs, negative floats, repeated tokens) buy most of the assurance.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crime_data_batch_processing_spark.functions.textkit import (
    SHINGLE_K,
    shingles_of,
    tokens,
)
from crime_data_batch_processing_spark.functions.veckit import (
    descale,
    idot,
    quantize,
)
from crime_data_batch_processing_spark.operators.text_analysis import FP_MOD, FP_P

WORDS = st.text(alphabet="abcdefg", min_size=1, max_size=5)
DOCS = st.lists(WORDS, min_size=1, max_size=12).map(" ".join)
VECS = st.lists(
    st.floats(min_value=-10.0, max_value=10.0, allow_nan=False, width=32),
    min_size=1,
    max_size=16,
)


def _py_shingles(text: str, k: int = SHINGLE_K) -> list[str]:
    toks = text.split(" ")
    if len(toks) < k:
        return []
    seen, out = set(), []
    for i in range(len(toks) - k + 1):
        g = " ".join(toks[i : i + k])
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def _py_fingerprint(text: str) -> int:
    h = 0
    for t in text.split(" "):
        h = (h * FP_P + (ord(t[0]) * 131 + len(t))) % FP_MOD
    return h


def _py_dot(a: list[float], b: list[float]) -> float:
    q = lambda x: int(  # noqa: E731 — mirror quantize(): double → 6dp HALF_UP
        (Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP))
        * 10**6
    )
    return sum(q(x) * q(y) for x, y in zip(a, b)) / 1e12


@settings(max_examples=8, deadline=None)
@given(DOCS)
def test_shingles_match_reference(spark, doc):
    df = spark.createDataFrame([(doc,)], "text string")
    got = (
        df.select(tokens("text").alias("t"))
        .select(shingles_of(F.col("t")).alias("sh"))
        .collect()[0]
        .sh
    )
    assert got == _py_shingles(doc)


@settings(max_examples=8, deadline=None)
@given(DOCS)
def test_fingerprint_matches_reference(spark, doc):
    tok_codes = F.transform(
        tokens("text"), lambda t: (F.ascii(t) * 131 + F.length(t)).cast("long")
    )
    fp = F.aggregate(
        tok_codes, F.lit(0).cast("long"), lambda acc, x: (acc * FP_P + x) % FP_MOD
    )
    df = spark.createDataFrame([(doc,)], "text string")
    assert df.select(fp.alias("f")).collect()[0].f == _py_fingerprint(doc)


@settings(max_examples=8, deadline=None)
@given(VECS, st.data())
def test_quantized_dot_matches_reference(spark, a, data):
    b = data.draw(
        st.lists(
            st.floats(min_value=-10.0, max_value=10.0, allow_nan=False, width=32),
            min_size=len(a),
            max_size=len(a),
        )
    )
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    got = df.select(
        descale(idot(quantize(F.col("a")), quantize(F.col("b")))).alias("d")
    ).collect()[0].d
    assert got == _py_dot(a, b)


class TestStratifiedSample:
    def test_rates_and_extension_property(self, spark, sf_dir):
        """Each stratum is kept at ~its configured rate, and the
        stratified sample of the 10% hash sample equals the
        intersection (consistent co-sampling)."""
        from crime_data_batch_processing_spark.operators.filters import (
            STRATA_KEEP,
            SAMPLE_M,
            sample_stratified,
        )
        from crime_data_batch_processing_spark.sources.tables import load_table

        got = {
            r["event_type"]: r["n"]
            for r in sample_stratified(spark, sf_dir)
            .groupBy("event_type")
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        }
        total = {
            r["event_type"]: r["count"]
            for r in load_table(spark, sf_dir, "events")
            .groupBy("event_type")
            .count()
            .collect()
        }
        for k, keep in STRATA_KEEP.items():
            frac = keep / SAMPLE_M
            if frac == 1.0:
                assert got.get(k, 0) == total[k], k
            else:
                # ~200 rows/stratum at sf0.001: loose 3-sigma-ish bound
                assert abs(got.get(k, 0) / total[k] - frac) < 0.12, (
                    k,
                    got.get(k, 0),
                    total[k],
                )


class TestChunkingPacking:
    def test_chunks_reconstruct_documents(self, spark, sf_dir):
        """Taking the first CHUNK_STRIDE tokens of every chunk except
        the last, plus the last chunk whole, must reproduce each
        document's token sequence exactly — i.e. the windows tile the
        doc with the declared stride and lose nothing."""
        from crime_data_batch_processing_spark.operators.chunking import (
            CHUNK_STRIDE,
            doc_chunks,
        )
        from crime_data_batch_processing_spark.sources.tables import load_table

        chunks: dict[int, list[tuple[int, str]]] = {}
        for r in doc_chunks(spark, sf_dir).collect():
            chunks.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
        docs = {
            r.doc_id: r.text.split(" ")
            for r in load_table(spark, sf_dir, "documents").collect()
        }
        assert set(chunks) == set(docs)
        for doc_id, parts in chunks.items():
            parts.sort()
            rebuilt: list[str] = []
            for k, (_, text) in enumerate(parts):
                toks = text.split(" ")
                rebuilt.extend(toks if k == len(parts) - 1 else toks[:CHUNK_STRIDE])
            assert rebuilt == docs[doc_id], doc_id

    def test_pack_offsets_within_capacity(self, spark, sf_dir):
        """Every doc starts inside its pack's budget, and within a
        shard the packed docs are contiguous in doc_id order with
        offsets equal to the running total mod capacity."""
        from crime_data_batch_processing_spark.operators.chunking import (
            PACK_CAPACITY,
            pack_sequences,
        )

        rows = pack_sequences(spark, sf_dir).collect()
        assert rows
        by_shard: dict[int, list] = {}
        for r in rows:
            assert 0 <= r.pack_offset < PACK_CAPACITY
            by_shard.setdefault(r.shard, []).append(r)
        for shard, rs in by_shard.items():
            rs.sort(key=lambda r: r.doc_id)
            cum = 0
            for r in rs:
                assert r.pack_id == shard * 1000000 + cum // PACK_CAPACITY
                assert r.pack_offset == cum % PACK_CAPACITY
                cum += r.n_tokens


def test_pii_scrub_actually_redacts(spark, sf_dir):
    """The oracle compare can't distinguish 'both engines scrubbed'
    from 'both engines identically failed to scrub' — assert the
    redaction really fired: every planted email/phone is counted,
    markers appear, and no raw PII survives."""
    from crime_data_batch_processing_spark.operators.text_analysis import (
        text_pii_scrub,
    )

    rows = text_pii_scrub(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_emails >= 1 and r.n_phones >= 1, r
        assert "<EMAIL>" in r.scrubbed and "<PHONE>" in r.scrubbed, r.scrubbed[-80:]
        assert "@example.com" not in r.scrubbed, r.scrubbed[-80:]
        assert "call 555-" not in r.scrubbed, r.scrubbed[-80:]


@settings(max_examples=30, deadline=None)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=8
    )
)
def test_sample_hash32_overflow_safe_and_cross_engine(spark, keys):
    """The split-multiply hash must equal (k·A) mod 2^32 computed in
    unbounded Python arithmetic for ANY non-negative int64 key — the
    naive int64 product overflows past ~3.47e9, which is exactly the
    key range a 100 TB table reaches — and DuckDB must agree using the
    SQL rendering."""
    import duckdb

    from crime_data_batch_processing_spark.operators.filters import (
        SAMPLE_A,
        SAMPLE_M,
        sample_hash32,
        sql_sample_hash32,
    )

    expected = [(k * SAMPLE_A) % SAMPLE_M for k in keys]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got_spark = [
        r.h for r in df.select(sample_hash32(F.col("k")).alias("h")).collect()
    ]
    assert got_spark == expected
    con = duckdb.connect()
    got_duck = [
        con.execute(f"SELECT {sql_sample_hash32(str(k))}").fetchone()[0]
        for k in keys
    ]
    assert got_duck == expected


class TestRound4Algebra:
    """Pure-algebra identities the round-4 operators rest on — checked
    against naive reference implementations on generated inputs."""

    @given(
        st.lists(
            st.integers(min_value=-50_000, max_value=50_000),
            min_size=1,
            max_size=60,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_cusum_unroll_equals_recursion(self, deltas):
        """window_cusum's closed form — S_i = C_i − min(0, min_{j≤i}
        C_j) over prefix sums — must equal the textbook recursion
        S_i = max(0, S_{i-1} + d_i) for every input sequence."""
        s_rec, seq_rec = 0, []
        for d in deltas:
            s_rec = max(0, s_rec + d)
            seq_rec.append(s_rec)
        c, cmin, seq_closed = 0, 0, []
        for d in deltas:
            c += d
            cmin = min(cmin, c)
            seq_closed.append(c - min(0, cmin))
        assert seq_closed == seq_rec

    @given(
        st.lists(
            st.integers(min_value=0, max_value=5_000),
            min_size=0,
            max_size=300,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_bitmap_word_popcount_is_exact_distinct(self, ids):
        """agg_bitmap_distinct's 63-bit-word mapping: OR-ing masks per
        word and summing popcounts must equal the exact distinct count
        for ANY id multiset (dupes collapse, words partition ids)."""
        words: dict[int, int] = {}
        for i in ids:
            w, b = i // 63, i % 63
            words[w] = words.get(w, 0) | (1 << b)
        assert sum(bin(v).count("1") for v in words.values()) == len(set(ids))

    def test_morton_interleave_matches_reference(self, spark):
        """sink_zorder's 16-term shift/mask expression must equal the
        textbook bit interleave for every 8-bit pair (exhaustive over
        a stride-sampled grid, bijectivity over the full 2^16 space
        implied by per-pair equality + injectivity of the reference)."""
        from crime_data_batch_processing_spark.operators.sinks import _morton8

        def ref(bx: int, by: int) -> int:
            z = 0
            for i in range(8):
                z |= ((bx >> i) & 1) << (2 * i + 1)
                z |= ((by >> i) & 1) << (2 * i)
            return z

        pairs = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 13)]
        df = spark.createDataFrame(pairs, "bx int, by int")
        got = {
            (r.bx, r.by): r.z
            for r in df.select(
                "bx", "by", _morton8(F.col("bx"), F.col("by")).alias("z")
            ).collect()
        }
        for x, y in pairs:
            assert got[(x, y)] == ref(x, y), (x, y)


class TestKeysetPagination:
    """Keyset continuation must reproduce offset pagination at EVERY
    depth — the invariant that makes the cursor form a drop-in for
    the offset form. Exercised on a deliberately tie-heavy frame so
    page boundaries fall inside runs of equal sort keys."""

    def test_keyset_pages_equal_offset_pages(self, spark):
        from pyspark.sql import functions as F

        # 100 rows, only 7 distinct prices → ~14-row tie runs; the
        # unique id tie-break is what keeps pages stable
        df = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("price")
        )
        order = [F.col("price").desc(), F.col("k").asc()]
        page_size = 10
        for page in range(1, 9):
            offset_page = [
                (r["k"], r["price"])
                for r in df.orderBy(*order)
                .offset(page * page_size)
                .limit(page_size)
                .collect()
            ]
            cursor = (
                df.orderBy(*order).limit(page * page_size).tail(1)[0]
            )
            beyond = (F.col("price") < cursor["price"]) | (
                (F.col("price") == cursor["price"])
                & (F.col("k") > cursor["k"])
            )
            keyset_page = [
                (r["k"], r["price"])
                for r in df.where(beyond)
                .orderBy(*order)
                .limit(page_size)
                .collect()
            ]
            assert keyset_page == offset_page, f"page {page} diverged"


class TestRetentionPolicy:
    """snapshot_expire's retention rule is a pure function over the
    run-date list — property-tested against its two invariants."""

    @given(
        runs=st.lists(
            st.integers(min_value=20200101, max_value=20301231),
            min_size=1,
            max_size=12,
            unique=True,
        ),
        cutoff=st.integers(min_value=20200101, max_value=20301231),
        keep_last=st.integers(min_value=0, max_value=5),
    )
    @settings(max_examples=200, deadline=None)
    def test_partition_and_floor_invariants(self, runs, cutoff, keep_last):
        from crime_data_batch_processing_spark.operators.sinks import (
            retention_policy,
        )

        retained, expired = retention_policy(runs, cutoff, keep_last)
        # exact partition of the input, both halves sorted
        assert sorted(retained + expired) == sorted(runs)
        assert retained == sorted(retained) and expired == sorted(expired)
        # age rule: nothing at/after the cutoff ever expires
        assert all(r < cutoff for r in expired)
        # count floor: the newest keep_last runs always survive
        assert set(sorted(runs)[len(runs) - min(keep_last, len(runs)):]) <= set(
            retained
        )
        # no over-retention: every retained run is justified by one of
        # the two rules
        floor = set(sorted(runs)[len(runs) - min(keep_last, len(runs)):])
        assert all(r >= cutoff or r in floor for r in retained)

    def test_all_stale_table_keeps_floor(self):
        from crime_data_batch_processing_spark.operators.sinks import (
            retention_policy,
        )

        retained, expired = retention_policy(
            [20200101, 20200102, 20200103], 20300101, 2
        )
        assert retained == [20200102, 20200103]
        assert expired == [20200101]


class TestBigramLmScore:
    """text_lm_score's quantized-likelihood algebra vs an independent
    pure-Python reference on arbitrary corpora."""

    @staticmethod
    def _reference(corpus):
        from collections import Counter

        c_bi, c_uni = Counter(), Counter()
        for toks in corpus:
            for a, b in zip(toks, toks[1:]):
                c_bi[(a, b)] += 1
                c_uni[a] += 1
        out = {}
        for doc_id, toks in enumerate(corpus):
            grams = list(zip(toks, toks[1:]))
            if not grams:
                continue
            score = sum(
                (1_000_000 * c_bi[g]) // c_uni[g[0]] for g in grams
            )
            out[doc_id] = (len(grams), score)
        return out

    @given(
        corpus=st.lists(
            st.lists(
                st.sampled_from("a b c d aa bb".split()),
                min_size=0,
                max_size=8,
            ),
            min_size=1,
            max_size=6,
        )
    )
    @settings(max_examples=6, deadline=None)
    def test_engine_matches_reference(self, spark, corpus):
        from crime_data_batch_processing_spark import cachekit
        from crime_data_batch_processing_spark.operators.text_analysis import (
            text_lm_score,
        )

        import os
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            spark.createDataFrame(
                [
                    (i, " ".join(toks), "en", "test", len(" ".join(toks)))
                    for i, toks in enumerate(corpus)
                ],
                "doc_id bigint, text string, lang string, source string,"
                " n_chars bigint",
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(d, "documents.parquet")
            )
            try:
                got = {
                    r["doc_id"]: (r["n_bigrams"], r["lm_score"])
                    for r in text_lm_score(spark, d).collect()
                }
            finally:
                cachekit.release_all()
        assert got == self._reference(corpus)


def test_bfs_distances_are_valid_hop_counts(spark, sf_dir):
    """Every BFS output distance must be consistent with the graph:
    seeds at 0, every non-seed's dist = 1 + min over neighbors' dists
    (within the hop bound), nothing beyond BFS_HOPS, and the result
    keyed uniquely per node."""
    from crime_data_batch_processing_spark.operators.graph import (
        BFS_HOPS,
        BFS_SEED_MOD,
        graph_bfs,
    )
    from crime_data_batch_processing_spark.operators.llm_dedup import (
        dedup_ngram_jaccard,
    )

    dist = {
        r["doc_id"]: r["dist"] for r in graph_bfs(spark, sf_dir).collect()
    }
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in dedup_ngram_jaccard(spark, sf_dir)
        .where(F.col("doc_a") != F.col("doc_b"))
        .collect()
    ]
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert dist, "vacuous BFS result"
    assert all(0 <= d <= BFS_HOPS for d in dist.values())
    for n, d in dist.items():
        if d == 0:
            assert n % BFS_SEED_MOD == 0
        else:
            assert n % BFS_SEED_MOD != 0
            best = min(
                (dist.get(m) for m in adj[n] if m in dist and dist[m] < d),
                default=None,
            )
            assert best == d - 1, (n, d, best)
    # reference BFS agrees exactly
    frontier = {n for n in adj if n % BFS_SEED_MOD == 0}
    ref = {n: 0 for n in frontier}
    for h in range(1, BFS_HOPS + 1):
        frontier = {
            m for n in frontier for m in adj[n] if m not in ref
        }
        ref.update({m: h for m in frontier})
    assert ref == dist


def test_entropy_bounds_and_exact_identity(spark, sf_dir):
    """Per-user entropy must sit in [0, ln(n_types)] and reproduce the
    pure-Python H = ln(n) - sum(c*ln c)/n over the same counts."""
    import math

    from crime_data_batch_processing_spark.operators.aggregates import (
        agg_entropy,
    )
    from crime_data_batch_processing_spark.sources.tables import load_table

    rows = agg_entropy(spark, sf_dir).collect()
    assert rows, "vacuous entropy result"
    counts: dict = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .count()
        .collect()
    ):
        counts.setdefault(r["user_id"], []).append(r["count"])
    for r in rows:
        cs = counts[r["user_id"]]
        n = sum(cs)
        assert r["n_events"] == n and r["n_types"] == len(cs)
        expect = math.log(n) - sum(c * math.log(c) for c in cs) / n
        assert abs(r["entropy"] - expect) < 5e-7, (r, expect)
        # bound slack must cover the same decimal(28,6) quantization
        # the identity assert above tolerates: a single-type user's
        # true H=0 can come back as low as -5e-7/n after rounding
        assert -5e-7 <= r["entropy"] <= math.log(len(cs)) + 5e-7


def test_bpe_train_matches_pure_python_replay(spark, sf_dir):
    """The distributed BPE rounds must equal a single-process replay:
    same word counts, same one-pass left-to-right merge semantics,
    same (weight DESC, l, r) argmax with chosen-pair exclusion."""
    import re as _re

    from crime_data_batch_processing_spark.operators.text_analysis import (
        BPE_ROUNDS,
        text_bpe_train,
    )
    from crime_data_batch_processing_spark.sources.tables import load_table

    got = [
        (r["round"], r["l"], r["r"], r["weight"], r["n_words"])
        for r in text_bpe_train(spark, sf_dir).collect()
    ]

    freq: dict = {}
    for row in load_table(spark, sf_dir, "documents").select("text").collect():
        for w in _re.split(r"\s+", row["text"].lower()):
            if _re.fullmatch(r"[a-z]+", w):
                freq[w] = freq.get(w, 0) + 1
    vocab = {"·" + "·".join(w) + "·": f for w, f in freq.items()}

    def one_pass_replace(s, pat, rep):
        # non-overlapping left-to-right, same as SQL replace()
        return s.replace(pat, rep)

    chosen, expect = set(), []
    for rnd in range(1, BPE_ROUNDS + 1):
        counts: dict = {}
        for s, f in vocab.items():
            a = s.strip("·").split("·")
            for i in range(len(a) - 1):
                k = (a[i], a[i + 1])
                wgt, nw = counts.get(k, (0, 0))
                counts[k] = (wgt + f, nw + 1)
        cands = [
            (-wgt, l, r, wgt, nw)
            for (l, r), (wgt, nw) in counts.items()
            if (l, r) not in chosen
        ]
        _, l, r, wgt, nw = min(cands)
        chosen.add((l, r))
        expect.append((rnd, l, r, wgt, nw))
        nv: dict = {}
        for s, f in vocab.items():
            ns = one_pass_replace(s, f"·{l}·{r}·", f"·{l}{r}·")
            nv[ns] = nv.get(ns, 0) + f
        vocab = nv

    assert got == expect, (got, expect)


def test_bpe_apply_matches_pure_python_tokenize(spark, sf_dir):
    """Applying the learned merges must equal the pure-Python
    tokenize: same word filter, same in-order one-pass replaces,
    same per-doc word and subword counts."""
    import re as _re

    from crime_data_batch_processing_spark.operators.text_analysis import (
        _learn_merges,
        text_bpe_apply,
    )
    from crime_data_batch_processing_spark.sources.tables import load_table

    merges = [(l, r) for l, r, _, _ in _learn_merges(spark, sf_dir)]
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in text_bpe_apply(spark, sf_dir).collect()
    }
    expect: dict = {}
    for row in (
        load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    ):
        nw = nt = 0
        for w in _re.split(r"\s+", row["text"].lower()):
            if not _re.fullmatch(r"[a-z]+", w):
                continue
            s = "·" + "·".join(w) + "·"
            for l, r in merges:
                s = s.replace(f"·{l}·{r}·", f"·{l}{r}·")
            nw += 1
            nt += len(s.strip("·").split("·"))
        if nw:
            expect[row["doc_id"]] = (nw, nt)
    assert got == expect


def test_bpe_ten_rounds_cross_engine_and_oracle_generators(spark, sf_dir):
    """BPE is parameterized over the round count (round-7 advisor +
    verdict item 5): at n_rounds=10 — 3x the registered constant —
    the Spark training loop must still match the GENERATED unrolled
    DuckDB CTE oracle bit-for-bit, and the generated apply-side
    replace chain must reproduce the per-doc token counts. Proves
    (a) `_sql_bpe_parts` / `_sql_bpe_apply_parts` generate correct
    SQL for arbitrary rounds, not just the hand-checked 3, and
    (b) the unrolled-CTE oracle stays tractable at real-tokenizer
    round counts."""
    from oracle_harness import duck_connection

    from crime_data_batch_processing_spark.operators.text_analysis import (
        _learn_merges,
        _sql_bpe_apply_parts,
        _sql_bpe_parts,
    )

    N = 10
    prefix, readout = _sql_bpe_parts(N)
    con = duck_connection(sf_dir)

    merges = _learn_merges(spark, sf_dir, n_rounds=N)
    got = [
        (i + 1, l, r, int(w), int(nw))
        for i, (l, r, w, nw) in enumerate(merges)
    ]
    expect = [
        (int(rnd), l, r, int(w), int(nw))
        for rnd, l, r, w, nw in con.execute(
            f"WITH {prefix}{readout}"
        ).fetchall()
    ]
    assert got == expect, (got, expect)
    # 10 distinct merges actually learned (not a vacuous short list)
    assert len(got) == N and len({(l, r) for _, l, r, _, _ in got}) == N

    # apply side: generated nested-replace chain at N rounds vs a
    # pure-Python in-order replay of the learned merges
    expr, from_list = _sql_bpe_apply_parts(N)
    apply_sql = f"""
    WITH {prefix}, dw AS (
        SELECT doc_id,
               '·' || array_to_string(string_split(word, ''), '·') || '·'
                   AS s
        FROM (SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\\s+')) AS word
              FROM documents) t
        WHERE regexp_matches(word, '^[a-z]+$')
    ), applied AS (
        SELECT doc_id, {expr} AS s FROM {from_list}
    )
    SELECT doc_id,
           COUNT(*)::BIGINT AS n_words,
           CAST(SUM(len(string_split(trim(s, '·'), '·'))) AS BIGINT)
               AS n_tokens
    FROM applied GROUP BY doc_id
    """
    duck_apply = {
        d: (int(nw), int(nt))
        for d, nw, nt in con.execute(apply_sql).fetchall()
    }

    import re as _re

    from crime_data_batch_processing_spark.sources.tables import load_table

    expect_apply: dict = {}
    pairs = [(l, r) for l, r, _, _ in merges]
    for row in (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    ):
        nw = nt = 0
        for w in _re.split(r"\s+", row["text"].lower()):
            if not _re.fullmatch(r"[a-z]+", w):
                continue
            s = "·" + "·".join(w) + "·"
            for l, r in pairs:
                s = s.replace(f"·{l}·{r}·", f"·{l}{r}·")
            nw += 1
            nt += len(s.strip("·").split("·"))
        if nw:
            expect_apply[row["doc_id"]] = (nw, nt)
    assert duck_apply == expect_apply
