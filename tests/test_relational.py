"""Differential tests: every relational query vs its DuckDB oracle."""

from __future__ import annotations

import pytest

from pim_orc_spark.operators import relational
from pim_orc_spark.oracle import compare


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = relational.QUERIES[name](spark, sf_dir)
    sql = relational.ORACLES[name]
    ok, msg = compare(df, sql, sf_dir)
    assert ok, f"{name}: {msg}"
