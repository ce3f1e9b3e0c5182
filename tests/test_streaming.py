"""Streaming operators: run-to-completion results vs batch DuckDB
oracles (the streaming analogue of the reference's CPU-vs-PIM
differential check, README.md:5-7)."""

from __future__ import annotations

import pytest

from pim_orc_spark.oracle import compare
from pim_orc_spark.streaming import stream_events


@pytest.mark.parametrize("name", sorted(stream_events.QUERIES))
def test_stream_matches_batch_oracle(spark, sf_dir, name):
    df = stream_events.QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, stream_events.ORACLES[name], sf_dir)
    assert ok, f"{name}: {msg}"


def test_repeat_invocation_isolated(spark, sf_dir):
    """Memory-sink table names must not collide across invocations in
    one session (the driver sweeps queries() repeatedly)."""
    a = stream_events.stream_grouped_totals(spark, sf_dir).count()
    b = stream_events.stream_grouped_totals(spark, sf_dir).count()
    assert a == b == 5
