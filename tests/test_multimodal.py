from __future__ import annotations

import pytest

from pim_orc_spark.operators import multimodal
from pim_orc_spark.oracle import compare


def test_multimodal_features_matches_oracle(spark, sf_dir):
    df = multimodal.multimodal_features(spark, sf_dir)
    ok, msg = compare(df, multimodal.ORACLES["multimodal_features"], sf_dir)
    assert ok, msg


def test_binary_payload_schema(spark, sf_dir):
    from pim_orc_spark.catalog import load_table

    d = multimodal.with_binary_payload(load_table(spark, sf_dir, "documents"))
    types = dict(d.dtypes)
    assert types["payload"] == "binary"
    assert types["meta"].startswith("struct<mime:string,declared_len:bigint")


def test_decode_image_is_stub():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")
