from __future__ import annotations

import pytest

from pim_orc_spark.operators import similarity
from pim_orc_spark.oracle import compare


@pytest.mark.parametrize("name", sorted(similarity.QUERIES))
def test_similarity_matches_oracle(spark, sf_dir, name):
    df = similarity.QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, similarity.ORACLES[name], sf_dir)
    assert ok, f"{name}: {msg}"


def test_lsh_recall_vs_exact(spark, sf_dir):
    """LSH top-k is a subset constraint check: every LSH neighbor must
    appear in the same bucket as its query, and its similarity must be
    ≤ the exact rank-1 similarity for that query."""
    exact = {
        (r.query_id, r.rank): r.cos_sim
        for r in similarity.ann_cosine_topk(spark, sf_dir).collect()
    }
    lsh = similarity.ann_lsh_bucketed(spark, sf_dir).collect()
    assert len(lsh) > 0
    for r in lsh:
        assert r.cos_sim <= exact[(r.query_id, 1)] + 1e-9
