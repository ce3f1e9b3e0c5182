"""Fuzz the shared Spark↔DuckDB kernel contract.

Every dedup/text oracle rests on three deterministic kernels producing
IDENTICAL results in both engines: the tokenizer, char n-grams, and the
rolling poly hash. This test drives all three with adversarial strings
(unicode, punctuation runs, empties, long repeats) through both engines
and diffs row-for-row — a divergence here would silently skew every
downstream oracle comparison.
"""

from __future__ import annotations

import random
import string

import duckdb
import pytest

from pim_orc_spark.functions.hashing import poly_hash, poly_hash_sql
from pim_orc_spark.functions.textfns import (
    char_ngrams,
    char_ngrams_sql,
    tokens,
    tokens_sql,
)

_ALPHABETS = [
    string.ascii_letters,
    string.digits,
    " \t\n.,;:!?()[]{}#@$%^&*-_=+|\\/\"'",
    "äöüßéèñçπΩλ中文日本語한국어",  # non-ASCII: must tokenize out
    "aaaaaaaaaaaaaaaaaaaaaaaa",
]


def _fuzz_strings(n: int = 300, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    out = ["", " ", "a", "A B", "  leading", "trailing  ", "ÄÖÜ", "123"]
    for _ in range(n):
        alpha = rng.choice(_ALPHABETS)
        length = rng.randint(0, 120)
        out.append("".join(rng.choice(alpha) for _ in range(length)))
    # mixed-alphabet strings
    for _ in range(n // 3):
        length = rng.randint(0, 200)
        out.append(
            "".join(
                rng.choice(rng.choice(_ALPHABETS)) for _ in range(length)
            )
        )
    return out


@pytest.fixture(scope="module")
def fuzz_df(spark):
    rows = [(i, s) for i, s in enumerate(_fuzz_strings())]
    df = spark.createDataFrame(rows, "id long, s string")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (id BIGINT, s VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    return df, con


def _diff(spark_rows, duck_rows):
    assert len(spark_rows) == len(duck_rows)
    for a, b in zip(spark_rows, duck_rows):
        assert tuple(a) == tuple(b), f"spark={tuple(a)} duck={tuple(b)}"


def test_tokenizer_contract(fuzz_df):
    df, con = fuzz_df
    sp = df.select("id", tokens("s").alias("v")).orderBy("id").collect()
    dk = con.execute(
        f"SELECT id, {tokens_sql('s')} AS v FROM t ORDER BY id"
    ).fetchall()
    _diff([(r["id"], tuple(r["v"])) for r in sp], [(i, tuple(v)) for i, v in dk])


def test_char_ngrams_contract(fuzz_df):
    """Set equality, not order: DuckDB's list_distinct does not preserve
    first-occurrence order (Spark's array_distinct does). Every
    consumer treats grams as a SET — intersection sizes, min-hash,
    dictionary encoding — so the contract is the set."""
    df, con = fuzz_df
    sp = df.select("id", char_ngrams("s", 3).alias("v")).orderBy("id").collect()
    dk = con.execute(
        f"SELECT id, {char_ngrams_sql('s', 3)} AS v FROM t ORDER BY id"
    ).fetchall()
    _diff(
        [(r["id"], tuple(sorted(r["v"]))) for r in sp],
        [(i, tuple(sorted(v))) for i, v in dk],
    )


def test_poly_hash_contract(fuzz_df):
    df, con = fuzz_df
    # hash the normalized token join (ASCII by construction after
    # tokenize) — the exact shape dedup uses
    from pyspark.sql import functions as F

    norm = F.concat_ws(" ", tokens("s"))
    sp = df.select("id", poly_hash(norm).alias("h")).orderBy("id").collect()
    norm_sql = f"list_aggregate({tokens_sql('s')}, 'string_agg', ' ')"
    dk = con.execute(
        f"SELECT id, {poly_hash_sql(f'coalesce({norm_sql}, ' + chr(39) + chr(39) + ')')} AS h"
        " FROM t ORDER BY id"
    ).fetchall()
    _diff([(r["id"], r["h"]) for r in sp], dk)


def test_list_dot_product_is_sequential_fold():
    """The entire vector-oracle suite (cosine_sql, the SQ/RP/PQ unit
    vectors, the LM micro-nats) rests on ONE cross-engine assumption:
    DuckDB's list_dot_product accumulates LEFT-TO-RIGHT, bit-identical
    to Catalyst's aggregate() fold and Python's sequential sum. This
    pins that assumption as a checked contract — if a DuckDB upgrade
    switches to SIMD/pairwise summation, THIS fails loudly instead of
    an ANN rank flipping silently. Values are adversarial: mixed
    magnitudes (1e16 vs 1e-16) where summation ORDER changes the
    result by far more than an ulp."""
    import math
    import random

    import duckdb

    rng = random.Random(7)
    cases = []
    for _ in range(50):
        n = rng.randrange(1, 65)
        a = [rng.uniform(-1, 1) * 10 ** rng.randrange(-16, 17) for _ in range(n)]
        b = [rng.uniform(-1, 1) * 10 ** rng.randrange(-16, 17) for _ in range(n)]
        cases.append((a, b))
    con = duckdb.connect()
    for a, b in cases:
        expected = 0.0
        for x, y in zip(a, b):
            expected += x * y  # sequential left-to-right fold
        got = con.execute(
            "SELECT list_dot_product(CAST(? AS DOUBLE[]), CAST(? AS DOUBLE[]))",
            [a, b],
        ).fetchone()[0]
        assert got == expected or (
            math.isnan(got) and math.isnan(expected)
        ), f"list_dot_product diverged from the sequential fold: {got} != {expected}"
