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
