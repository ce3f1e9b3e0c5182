"""Embedding vector math — JVM-side, no Python in the hot path.

float32 inputs are cast to double before any arithmetic: the product of
two float32 values is exact in double (24-bit mantissas), so dot
products differ between engines only by summation-order rounding at
~1e-16 relative — far below the 1e-4 comparison tolerance.

At 100 TB the cosine kernel runs inside whole-stage codegen per row;
no shuffle is induced by the scalar math itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_vec(col: Column | str, expected_dim: int | None = None) -> Column:
    """Cast an embedding column to array<double>; with ``expected_dim``,
    raise per-row if the stored dimension disagrees. The unrolled
    kernels below bake the dimension into codegen — on a regenerated
    fixture with a different dim they would silently truncate the dot
    product, so consumers pass the dim they are about to unroll and get
    a loud SparkRuntimeException instead of wrong similarities (one int
    compare per row; noise next to the 64-term kernels)."""
    c = F.col(col) if isinstance(col, str) else col
    v = c.cast("array<double>")
    if expected_dim is None:
        return v
    # NULL embeddings pass through as NULL (dropped by downstream math,
    # the pre-guard behavior) — only a NON-null vector of the wrong
    # length is a dim-drift error. Without the isNull arm the when()
    # condition evaluates NULL, the raise fires, and the message reads
    # as dim drift for what is actually a null row.
    return (
        F.when(v.isNull(), v)
        .when(F.size(v) == expected_dim, v)
        .otherwise(
            F.raise_error(
                F.format_string(
                    f"embedding dim %s != expected {expected_dim}",
                    F.size(v),
                )
            )
        )
    )


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Dot product unrolled over a known dimension: ``dim``
    multiply-adds of flat codegen arithmetic. The HOF form (``dot``)
    interprets ~3 expression nodes per element per evaluation; unrolled,
    a 12M-pair cosine join at dim=64 drops from interpreted lambda
    stepping to straight-line arithmetic. Only valid when every vector
    has exactly ``dim`` elements (fixture contract)."""
    acc = None
    for i in range(dim):
        term = a.getItem(i) * b.getItem(i)
        acc = term if acc is None else acc + term
    return acc


def dot_unrolled_sql(a: str, b: str, dim: int) -> str:
    """The same unrolled dot product as ``dot_unrolled``, but as ONE
    Spark-SQL expression string over column NAMES. Building the
    unrolled form with Column algebra costs ~3·dim py4j round-trips
    PER DOT (~0.6 s at dim=64 — measured dominating iterative plans
    that construct many dots, e.g. k-means' three-dot distance built
    three times per run); parsing one string is a single gateway call
    with identical semantics — left-associated adds, element_at null
    behavior — so results are bit-identical to the Column form."""
    return "(" + " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(dim)) + ")"


def unit_vec(a: Column, dim: int) -> Column:
    """L2-normalized copy of ``a``, norm evaluated ONCE per row: the
    scalar 1/‖a‖ is let-bound through a single-element-array transform
    (referenced directly inside the per-element lambda it would be
    re-folded per element — see textfns.char_ngrams)."""
    inv = 1.0 / F.sqrt(dot_unrolled(a, a, dim))
    return F.transform(
        F.array(inv), lambda s: F.transform(a, lambda x: x * s)
    ).getItem(0)


def cosine_sql(a: str, b: str) -> str:
    """DuckDB fragment; list_dot_product on DOUBLE[] matches the Spark
    fold to within summation-order rounding."""
    da, db = f"CAST({a} AS DOUBLE[])", f"CAST({b} AS DOUBLE[])"
    return (
        f"(list_dot_product({da}, {db}) / "
        f"(sqrt(list_dot_product({da}, {da})) * sqrt(list_dot_product({db}, {db}))))"
    )
