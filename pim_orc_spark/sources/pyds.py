"""Custom connector surface: the Python Data Source API (Spark 4).

The reference's source layer is a hand-written columnar reader
(orc-parser/reader.cc:30-67 walks stripes and hands batches to the
engine); Spark's modern answer for "a format/feed the built-ins don't
speak" is a DataSource V2 implementation, and since Spark 4 one can be
written in PURE PYTHON (pyspark.sql.datasource) — partition planning
on the driver, per-partition iteration on executors, Arrow-batched
back into the JVM. This module ships a deterministic synthetic-corpus
source demonstrating the full contract:

- ``partitions()`` plans real splits (the scan parallelizes across
  executors exactly like a file source's splits — verified by a
  partition-count assert in tests/test_sources.py);
- ``read(partition)`` yields rows closed-form from the row index, so a
  SQL oracle regenerates the same relation arithmetically and every
  aggregate is hash-comparable across engines;
- options (``n``, ``parts``) flow through the standard reader-options
  channel.

A production deployment swaps the row generator for its actual feed
(an internal RPC, a bespoke format, a message queue snapshot); the
planning/iteration/registration shape is exactly this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

# Knuth's multiplicative hash constant and a prime modulus: a per-row
# value that is trivially closed-form yet not order-correlated, so a
# partial aggregate over it detects lost/duplicated rows.
PYDS_MULT = 2654435761
PYDS_MOD = 997
PYDS_N = 5000
PYDS_PARTS = 8
PYDS_BUCKETS = 16


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", PYDS_N))
        self.parts = int(options.get("parts", PYDS_PARTS))

    def partitions(self):
        if self.n <= 0:
            # an empty plan is not "no partitions": Spark substitutes a
            # None partition for an empty list and hands it to read();
            # one explicit empty split keeps the contract total
            return [_RangePartition(0, 0)]
        step = max(1, (self.n + self.parts - 1) // self.parts)
        return [
            _RangePartition(i, min(i + step, self.n))
            for i in range(0, self.n, step)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield (i, i % PYDS_BUCKETS, (i * PYDS_MULT) % PYDS_MOD)


class SyntheticDocsSource(DataSource):
    """``spark.read.format("synthetic_docs")`` after registration."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id long, bucket long, h long"

    def reader(self, schema):
        return SyntheticDocsReader(self.options)


def register(spark: SparkSession) -> None:
    """Idempotent registration (re-register overwrites by name)."""
    spark.dataSource.register(SyntheticDocsSource)


def source_python_datasource(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Read through the registered pure-Python source and reduce to
    per-bucket integer facts (count + hash sum + id checksum): a lost,
    duplicated, or reordered-partition row flips at least one value.
    ``sf_dir`` is unused — the connector is corpus-independent by
    construction (its contract is the SOURCE API, not the fixture);
    the oracle regenerates the identical relation from ``range()``."""
    register(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n", str(PYDS_N))
        .option("parts", str(PYDS_PARTS))
        .load()
    )
    return (
        df.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("h").alias("sum_h"),
            F.sum("doc_id").alias("sum_id"),
        )
        .orderBy("bucket")
    )


QUERIES = {
    "source_python_datasource": source_python_datasource,
}

ORACLES = {
    "source_python_datasource": f"""
    SELECT i % {PYDS_BUCKETS} AS bucket,
           COUNT(*) AS n_rows,
           CAST(SUM((i * {PYDS_MULT}) % {PYDS_MOD}) AS BIGINT) AS sum_h,
           CAST(SUM(i) AS BIGINT) AS sum_id
    FROM (SELECT unnest(range(0, {PYDS_N})) AS i)
    GROUP BY bucket ORDER BY bucket
    """,
}
