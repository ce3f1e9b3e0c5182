from __future__ import annotations

import pytest

from pim_orc_spark.operators import multimodal
from pim_orc_spark.oracle import compare


@pytest.mark.parametrize("name", sorted(multimodal.QUERIES))
def test_multimodal_matches_oracle(spark, sf_dir, name):
    """EVERY multimodal query vs its oracle — the PYTEST_ONLY demotion
    contract ('tests/ still runs each against its oracle every round')
    requires the full parametrization, not just the features op
    (round-5 fix: frame_sample/resize previously had no pytest oracle
    row, only their driver attestation)."""
    assert name in multimodal.ORACLES, f"{name} is missing its oracle SQL"
    df = multimodal.QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, multimodal.ORACLES[name], sf_dir)
    assert ok, f"{name}: {msg}"


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
