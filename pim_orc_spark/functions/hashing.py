"""Engine-portable deterministic hashing.

Spark's xxhash64/murmur and DuckDB's hash() disagree, so any hash that
participates in an oracle-checked result is computed from first
principles in both engines: a 31-polynomial rolling hash over ASCII
codes, mod the Mersenne prime 2^31-1. Each fold step stays < 2^36, so
no 64-bit overflow in either engine.

This is also the document-fingerprinting primitive (rolling hash) for
the text-analysis operator family.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 2_147_483_647  # 2^31 - 1


def poly_hash(col: Column | str) -> Column:
    """hash31(s) = fold(ascii chars): h = (h*31 + code) % (2^31-1).

    Catalyst-only (sequence/transform/aggregate) — runs in codegen.
    """
    c = F.col(col) if isinstance(col, str) else col

    # Let-bind the input through a single-element-array transform so an
    # EXPRESSION argument (e.g. the normalized-text concat) is evaluated
    # once per row — referenced directly inside the per-character lambda
    # it would be re-evaluated |s| times (see textfns.char_ngrams).
    def hash_of(s: Column) -> Column:
        codes = F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
            lambda i: F.ascii(F.substring(s, i, 1)),
        )
        return F.when(F.length(s) == 0, F.lit(0)).otherwise(
            F.aggregate(
                codes,
                F.lit(0).cast("bigint"),
                lambda acc, x: (acc * 31 + x) % MOD,
            )
        )

    return F.transform(F.array(c), hash_of).getItem(0)


def poly_hash_sql(expr: str) -> str:
    """DuckDB fragment computing the identical hash (list_reduce folds
    left with the first element as accumulator, so prepend the 0 seed)."""
    return (
        f"CASE WHEN len({expr}) = 0 THEN 0 ELSE "
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, len({expr}) + 1), i -> CAST(ascii({expr}[i:i]) AS BIGINT))), "
        f"(a, b) -> (a * 31 + b) % {MOD}) END"
    )


def minhash_perm(h: Column, a: int, b: int) -> Column:
    """One universal-hash permutation h_i(x) = (a*x + b) mod p over a
    poly_hash value; a,b are per-permutation constants."""
    return (h * a + b) % MOD


def minhash_perm_sql(expr: str, a: int, b: int) -> str:
    return f"(({expr}) * {a} + {b}) % {MOD}"


def minhash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for k permutations — a simple LCG so
    both engines (and any future round) regenerate the same family."""
    params = []
    state = seed
    for _ in range(k):
        state = (state * 1_103_515_245 + 12_345) % MOD
        a = (state % (MOD - 1)) + 1
        state = (state * 1_103_515_245 + 12_345) % MOD
        b = state % MOD
        params.append((a, b))
    return params
