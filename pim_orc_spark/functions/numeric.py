"""Deterministic numeric aggregation helpers.

Floating-point SUM is order-dependent; Spark's partial/final aggregation
(two-phase HashAggregateExec ≈ reference reader.cc:60-63 + 156-160) sums
in a partition-dependent order, so a double SUM is not bit-comparable
with any other engine. The fix is the classical one: aggregate in exact
decimal, then present as double. DECIMAL addition is associative, so the
result is identical regardless of partitioning — on 32 local threads or
1000 executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 18 digits / 2 decimal places covers every monetary fixture column;
# Spark widens the sum to decimal(28,2) internally — no overflow until
# ~1e26, far past 100 TB of rows.
_DEC = "decimal(18,2)"


def _sum_cents(c: Column) -> Column:
    """Exact Σ of a 2-dp column as total CENTS in decimal(38,0),
    ACCUMULATED AS A PRIMITIVE LONG (r16 optimization, guide §1.2
    per-task work): Spark widens a decimal(18,2) SUM to a
    decimal(28,2) buffer, which no longer fits the compact long-backed
    representation — every row's add goes through java.math.BigDecimal
    (measured ~0.5 µs/row; the q04 slot halved when this moved to long
    adds). ``cents`` is the repo's one rounding authority and equals
    the old per-row ``CAST(x AS DECIMAL(18,2))`` on every value in the
    2-dp monetary domain; the long accumulator is exact up to 2⁶³−1
    total cents ≈ 9.2e16 dollars per group — ~6× the TOTAL
    extendedprice of 100 TB of TPC-H in ONE group, and growing
    workloads past that take the split-accumulator form
    ``exact_revenue`` uses (two long sums recombined in decimal).
    The single cast decimal(38,0) → /100 → double at the END converts
    the exact integer once, so the presented double is bit-identical
    to the old decimal-sum cast (both correctly round the same exact
    rational)."""
    return F.sum(cents(c)).cast("decimal(38,0)")


def exact_sum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM of a 2-decimal monetary double."""
    c = F.col(col) if isinstance(col, str) else col
    return (_sum_cents(c) / 100).cast("double").alias(alias)


def exact_sum_sql(expr: str, alias: str) -> str:
    """DuckDB fragment computing the identical exact sum."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}"


def exact_avg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum ÷ count, divided in
    double (IEEE division is deterministic given identical operands)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        (_sum_cents(c) / 100).cast("double") / F.count(c)
    ).alias(alias)


def exact_avg_sql(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def cents(col: Column | str) -> Column:
    """A 2-dp monetary/ratio double as exact integer hundredths —
    THE rounding contract (HALF_UP via round, long cast). Every
    integer-exact monetary expression derives from this one site."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def cents_sql(expr: str) -> str:
    """DuckDB fragment for the identical hundredths conversion."""
    return f"CAST(round({expr} * 100) AS BIGINT)"


def revenue_item(
    price_col: str = "l_extendedprice",
    disc_col: str = "l_discount",
) -> Column:
    """The PER-ROW exact revenue term: price-cents × (100 −
    discount-points) as decimal(38,0) hundredths-of-cents — the single
    authority for the revenue contract, consumed by ``exact_revenue``
    and by conditional-revenue queries (q42) that need the raw item
    inside a CASE."""
    return (cents(price_col) * (F.lit(100) - cents(disc_col))).cast(
        "decimal(38,0)"
    )


def revenue_item_sql(
    price: str = "l_extendedprice", disc: str = "l_discount"
) -> str:
    """DuckDB fragment for the identical per-row revenue term."""
    return f"{cents_sql(price)} * (100 - {cents_sql(disc)})"


def exact_revenue(
    price_col: str = "l_extendedprice",
    disc_col: str = "l_discount",
    alias: str = "revenue",
) -> Column:
    """The TPC-H revenue aggregate SUM(price × (1 − discount)) in exact
    integer-cents arithmetic: both factors are 2-dp values, so price in
    cents × (100 − discount in percent-points) is an exact int64
    product per row, summed exactly and presented as double ÷ 1e4.
    Order-independent and hash-comparable — the q08 round-2 fix,
    shared by every revenue query so the contract lives in ONE place
    (``revenue_item`` defines the per-row term).

    SPLIT LONG ACCUMULATOR (r16 optimization, guide §1.2): summing the
    decimal(38,0) per-row term pays a java.math.BigDecimal add per row
    (the sum buffer exceeds the compact-long precision). The same
    exact total comes from two PRIMITIVE long sums — the term split as
    hi = term div 10⁴ and lo = term rem 10⁴ (an exact identity,
    truncating div/rem pair, valid for negatives) — recombined ONCE at
    the end in decimal(38,0): Σterm = 10⁴·Σhi + Σlo with no per-row
    BigDecimal. Overflow-safe far past 100 TB (Σhi ≤ rows × 10⁵:
    ~4e16 at 4e11 rows, 2⁶³ ≈ 9.2e18), where a single long sum of the
    raw ~1e9-magnitude terms would wrap near 9e9 rows/group. The final
    cast-to-double and IEEE ÷ 1e4 are unchanged, so the presented
    value is bit-identical to the decimal-sum form."""
    term = cents(price_col) * (F.lit(100) - cents(disc_col))
    lo = term % F.lit(10000)
    # (term - lo) is exactly divisible; the double division is exact
    # for |term| < 2⁵³ (per-row terms are ≲1e9 by the 2-dp contract)
    hi = ((term - lo) / F.lit(10000)).cast("long")
    total = F.sum(hi).cast("decimal(38,0)") * 10000 + F.sum(lo)
    return (total.cast("double") / F.lit(10000.0)).alias(alias)


def exact_revenue_sql(
    price: str = "l_extendedprice",
    disc: str = "l_discount",
    alias: str = "revenue",
) -> str:
    """DuckDB fragment computing the identical exact revenue."""
    return (
        f"CAST(SUM({revenue_item_sql(price, disc)})"
        f" AS DOUBLE) / 10000.0 AS {alias}"
    )
