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


def exact_sum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM of a 2-decimal monetary double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double").alias(alias)


def exact_sum_sql(expr: str, alias: str) -> str:
    """DuckDB fragment computing the identical exact sum."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}"


def exact_avg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum ÷ count, divided in
    double (IEEE division is deterministic given identical operands)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(_DEC)).cast("double") / F.count(c)
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
    product per row, summed into decimal(38,0) (overflow-safe past
    ~9e9 rows/group) and presented as double ÷ 1e4. Order-independent
    and hash-comparable — the q08 round-2 fix, shared by every revenue
    query so the contract lives in ONE place (``revenue_item``)."""
    return (
        F.sum(revenue_item(price_col, disc_col)).cast("double")
        / F.lit(10000.0)
    ).alias(alias)


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
