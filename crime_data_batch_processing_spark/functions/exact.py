"""Cross-engine-exact numeric aggregation helpers.

Summing IEEE doubles is order-dependent: Spark's partial/final
aggregation tree and DuckDB's vectorized accumulation can legally
differ in the last ulp, which breaks bit-exact oracle comparison (and,
worse, breaks *run-to-run* determinism at scale, where partition
boundaries move). The fix used throughout this engine: accumulate in
DECIMAL, which is exact and therefore associative/commutative —
order-independent by construction — then cast the final value back to
double.

The same pattern is what you want at 100 TB for money-like columns
anyway (TPC-H prices are conceptually DECIMAL(15,2)); the decimal
aggregation path in Spark is codegen'd JVM arithmetic, not a UDF.

Scale choice: the accumulation scale must sit WELL ABOVE the binary
noise floor of the input doubles. Spark casts double→decimal through
the shortest decimal string (`BigDecimal.valueOf`), DuckDB through the
exact binary expansion; at scale 10 those two roundings disagree in
the last digit for values around 1e3–1e5 (observed: a 4e-8 drift on a
40k-row sum). At scale 6 the double's representation noise (~1e-11
absolute at these magnitudes) is orders of magnitude below the
rounding step, so both engines round every summand to the identical
decimal and the sums match bit-for-bit.

DuckDB oracle-side equivalents (keep in sync with the SQL strings):
    dsum(x)  ->  CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)
    davg(x)  ->  CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(x)

FLOAT columns must be widened through DOUBLE on BOTH sides before the
decimal cast: DuckDB's direct FLOAT→DECIMAL rounds through float
arithmetic and disagrees with the correctly-rounded double path for
~0.2% of values (measured on the embeddings table). Spark-side
`dcol()` always widens; oracle SQL over float columns must spell
CAST(CAST(x AS DOUBLE) AS DECIMAL(28,6)).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(28,6)"


def dcol(col: Column | str) -> Column:
    """Column cast to the exact accumulation type.

    Widens to double FIRST: Spark's float→decimal cast goes through
    the float's shortest string repr, whose ~7 significant digits land
    *exactly* on a half at scale 6 often enough to diverge from
    DuckDB's binary-expansion rounding. float→double is exact, and the
    double's 17-digit repr never sits on a 1e-6 half boundary in
    practice. No-op for columns already double.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("double").cast(DEC)


def dsum(col: Column | str) -> Column:
    """Order-independent sum of a double column, returned as double."""
    return F.sum(dcol(col)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent mean: exact decimal sum / count, as double.

    Both engines then perform one identical double division, so the
    result is bit-identical.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dcol(c)).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    """DuckDB-side rendering of :func:`dsum` for oracle strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB-side rendering of :func:`davg` for oracle strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) / COUNT({expr})"


def dsum_merge(col: Column | str) -> Column:
    """Re-combine already-decimal-summed doubles exactly.

    Partial sums produced by :func:`dsum` are exact decimals cast to
    double — a value-preserving cast while the total stays under ~2^53
    scale-6 quanta (the engine's columns are chosen to). Re-casting
    each partial back to DECIMAL(28,6) recovers the exact partial, and
    the decimal re-sum is order-independent, so a merge of partials
    (rollup + tail, delta folds) equals the one-pass :func:`dsum` of
    the raw rows bit-for-bit. Used by the continuous-aggregate
    operators (timeseries.rollup_hypertable,
    streaming.stream_rollup_incremental).
    """
    from pyspark.sql.types import DecimalType

    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DecimalType(28, 6))).cast("double")


def with_scalars(df, scalars):
    """Scalar-broadcast prelude: attach a SINGLE-ROW (or bounded
    few-row) aggregate frame to every row of `df`.

    The standard decorrelation of a scalar subquery threshold
    (`WHERE x > (SELECT agg FROM ...)`): compute the aggregate ONCE as
    a 1-row frame, then cross-join it broadcast so the comparison is a
    map-side expression. Catalyst plans this as a
    BroadcastNestedLoopJoin whose build side is one row — effectively
    free at any probe-side scale, and the plan-test suite's
    CartesianProduct/BNLJ bans carve out exactly this shape. The same
    helper serves bounded few-row builds (centroid tables, merge
    lists) where every probe row genuinely needs every build row.

    One definition for the pattern previously hand-rolled across
    filters/aggregates/quality/pipeline/scale_patterns/analytics/
    similarity/clustering (round-7 verdict item 6).
    """
    return df.crossJoin(F.broadcast(scalars))
