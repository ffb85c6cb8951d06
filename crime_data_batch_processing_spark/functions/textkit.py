"""Shared text primitives: tokens, shingles, exact n-gram Jaccard.

The reference never touches document text (its one string-heavy column
is `block_value`, carried verbatim — /root/reference/create&Load.sql:9);
this kit is the foundation for the LLM-pipeline operators (dedup,
text analysis) over the `documents` table.

Everything here is a Catalyst expression — higher-order array lambdas
evaluated JVM-side, no Python in the row path. That is what makes the
dedup family viable at 100 TB: shingling 1e9 documents must not pay a
per-row interpreter round-trip.

Cross-engine exactness: tokenization is a plain split on single
spaces and shingles are space-joined token windows, so the DuckDB
oracle can reproduce them byte-for-byte (`string_split` +
`list_transform` over `range`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SHINGLE_K = 3  # token-trigram shingles — the classic near-dup unit


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of a document, order-preserving."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def shingles_of(toks: Column, k: int = SHINGLE_K) -> Column:
    """Distinct k-token shingles (space-joined) of a BOUND token-array
    column.

    Bind the tokenization to a named column before calling this:
    Catalyst does not common-subexpression-eliminate inside
    higher-order-function lambdas, so an inline `split()` here would
    re-tokenize the document for every element_at — 3·(n-k) times per
    row (measured ~6× slower end-to-end on the dedup operators).

    A document with fewer than k tokens yields an empty array (the
    `sequence` would be descending, so guard with CASE).
    """
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
        ),
    )
    return F.when(n >= k, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def sql_shingles(text_expr: str, k: int = SHINGLE_K) -> str:
    """DuckDB rendering of :func:`shingles` (1-based list indexing)."""
    toks = f"string_split({text_expr}, ' ')"
    parts = " || ' ' || ".join(f"{toks}[i + {j + 1}]" for j in range(k))
    return (
        f"CASE WHEN len({toks}) >= {k} THEN "
        f"list_distinct(list_transform(range(len({toks}) - {k - 1}), i -> {parts})) "
        f"ELSE [] END"
    )


def raw_shingles_of(toks: Column, k: int = SHINGLE_K) -> Column:
    """k-token shingles WITH duplicates, order-preserving — the
    multiset view that repetition metrics need (``shingles_of`` is the
    distinct set view that dedup needs). Same <k-token empty guard."""
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
        ),
    )
    return F.when(n >= k, grams).otherwise(F.array().cast("array<string>"))


def sql_raw_shingles(text_expr: str, k: int = SHINGLE_K) -> str:
    """DuckDB rendering of :func:`raw_shingles_of`."""
    toks = f"string_split({text_expr}, ' ')"
    parts = " || ' ' || ".join(f"{toks}[i + {j + 1}]" for j in range(k))
    return (
        f"CASE WHEN len({toks}) >= {k} THEN "
        f"list_transform(range(len({toks}) - {k - 1}), i -> {parts}) "
        f"ELSE [] END"
    )


def jaccard(inter: Column, size_a: Column, size_b: Column) -> Column:
    """|A∩B| / |A∪B| as a double.

    Integer counts divided once — both engines perform the identical
    IEEE division, so the result is bit-exact cross-engine.
    """
    return (
        inter.cast("double") / (size_a + size_b - inter).cast("double")
    ).alias("jaccard")
