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


def test_vectorized_checksum_matches_scalar_reference():
    """The numpy polynomial fold the kernels use must stay bit-identical
    to the scalar fake_decode fold (which is what the SQL oracle
    models), including empty and length-1 payloads."""
    import numpy as np

    payloads = [b"", b"\x00", b"a", b"hello world", bytes(range(256)) * 7]
    pows = multimodal._pow31(max(len(p) for p in payloads))
    for p in payloads:
        codes = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
        assert multimodal._checksum_np(codes, pows) == multimodal.fake_decode(p)[1]
