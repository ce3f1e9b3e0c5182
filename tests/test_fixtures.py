"""Fixture schema contract — fails FIRST and loudly on testdata drift.

The driver regenerates /root/testdata between rounds and physical
storage details are not stable (round 3: events.ts changed from INT64
TIMESTAMP(NANOS) to TIMESTAMP(MICROS)/NTZ, breaking every epoch cast at
analysis time). These assertions turn the next drift into one pointed
failure instead of a pile of deep operator errors. On failure: inspect
the parquet footer (pyarrow.parquet.read_schema) and adjust
catalog.normalize_event_ts / the dim constants before touching
operators.
"""

from __future__ import annotations

import pytest

from pim_orc_spark.catalog import TABLE_NAMES, load_table

REQUIRED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey"},
    "supplier": {"s_suppkey", "s_nationkey"},
    "part": {"p_partkey"},
    "orders": {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_returnflag",
        "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


@pytest.mark.parametrize("name", sorted(TABLE_NAMES))
def test_required_columns_present(spark, sf_dir, name):
    cols = set(load_table(spark, sf_dir, name).columns)
    missing = REQUIRED_COLUMNS[name] - cols
    assert not missing, (
        f"fixture drift: {name} lost columns {sorted(missing)} "
        f"(has {sorted(cols)}) — check the regenerated parquet footer"
    )


def test_events_ts_normalizes_to_timestamp(spark, sf_dir):
    """Whatever the storage form (int64 nanos, micros-NTZ, ...),
    catalog.normalize_event_ts must hand operators a session-tz
    TIMESTAMP — epoch casts reject anything else at analysis time."""
    dtype = dict(load_table(spark, sf_dir, "events").dtypes)["ts"]
    assert dtype == "timestamp", (
        f"fixture drift: events.ts normalized to {dtype!r}, expected "
        "'timestamp' — extend catalog.normalize_event_ts for the new "
        "storage form"
    )


def test_embedding_dim_matches_constants(spark, sf_dir):
    """The unrolled cosine kernels bake the dim into codegen; a dim
    drift must be caught here (and per-row by as_double_vec), not by
    silently-truncated dot products."""
    from pyspark.sql import functions as F

    from pim_orc_spark.operators.dedup import EMB_DIM
    from pim_orc_spark.operators.similarity import DIM

    got = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.size("embedding").alias("d"))
        .distinct()
        .collect()
    )
    dims = sorted(r["d"] for r in got)
    assert dims == [DIM] and DIM == EMB_DIM, (
        f"fixture drift: embedding dims {dims} vs constants "
        f"similarity.DIM={DIM}, dedup.EMB_DIM={EMB_DIM}"
    )
