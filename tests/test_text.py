from __future__ import annotations

import pytest

from pim_orc_spark.operators import text
from pim_orc_spark.oracle import compare


@pytest.mark.parametrize("name", sorted(text.QUERIES))
def test_text_matches_oracle(spark, sf_dir, name):
    df = text.QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, text.ORACLES[name], sf_dir)
    assert ok, f"{name}: {msg}"
