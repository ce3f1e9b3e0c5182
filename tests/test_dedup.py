from __future__ import annotations

import pytest

from pim_orc_spark.operators import dedup
from pim_orc_spark.oracle import compare


@pytest.mark.parametrize("name", sorted(dedup.QUERIES))
def test_dedup_matches_oracle(spark, sf_dir, name):
    df = dedup.QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, dedup.ORACLES[name], sf_dir)
    assert ok, f"{name}: {msg}"


def test_minhash_lsh_equals_exact_baseline(spark, sf_dir):
    """The LSH path must reproduce the exact all-pairs result (recall
    bound (1-J^4)^32 ≈ 5e-8 at the 0.8 threshold)."""
    lsh = {
        tuple(r)
        for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    }
    exact = {
        tuple(r)
        for r in dedup.dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    assert lsh == exact
