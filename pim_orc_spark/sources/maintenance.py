"""Lakehouse table-maintenance operators — the storage-side jobs every
100 TB deployment schedules beside its queries:

- ``maintenance_compact_sum`` — SMALL-FILE COMPACTION. Streaming
  ingest and over-parallel writes leave directories with thousands of
  KB-sized files; scan cost is then dominated by per-file open/footer
  overhead and driver split planning. Compaction rewrites the
  directory at a target file size. The exported result is the
  integrity proof (row count + exact sum over the compacted copy must
  equal the source oracle); the file-count collapse is asserted in
  pytest from the filesystem.
- ``maintenance_clustered_sum`` — CLUSTERED (sorted) REWRITE for
  data skipping. A range-partitioned, within-partition-sorted layout
  gives every parquet row group a narrow min/max envelope on the sort
  key, so a predicate on that key skips whole row groups at scan time
  (the ORC row-index-stride idea — reader.cc:43's stride batches — on
  the parquet side). The exported result proves a key-range query
  over the clustered copy matches the source oracle; pytest reads the
  parquet FOOTERS (pyarrow) and asserts the row-group envelopes are
  actually narrow/disjoint — the property skipping needs — rather
  than trusting scan-time internals.

Both rewrites are distributed (``df.write`` from executors); the
caches follow the atomic temp-dir + rename build of ``evolved_table``
so racing sessions cannot interleave half-built directories.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pim_orc_spark.catalog import load_table
from pim_orc_spark.fsutil import atomic_build as _atomic_build
from pim_orc_spark.fsutil import versioned_cache_dir as _versioned_cache_dir
from pim_orc_spark.functions.numeric import exact_sum, exact_sum_sql

_CACHE_ROOT = os.environ.get(
    "SPARK_GRAFT_MAINT_CACHE", "/tmp/pim_orc_spark/maintenance"
)

FRAGMENT_FILES = 64  # the "bad" ingest layout: 64 tiny files
COMPACT_TARGET_BYTES = 32 * 1024 * 1024  # target file size after compaction
CLUSTER_BUCKETS = 8  # range buckets on the sort key


def fragmented_table(spark: SparkSession, sf_dir: str) -> str:
    """A deliberately fragmented parquet copy of lineitem (the
    many-small-files ingest pathology compaction exists to fix)."""
    path = _versioned_cache_dir(_CACHE_ROOT, sf_dir, "lineitem_fragmented")

    def build(tmp: str) -> None:
        li = load_table(spark, sf_dir, "lineitem")
        li.repartition(FRAGMENT_FILES).write.mode("overwrite").parquet(tmp)

    return _atomic_build(path, build)


def compacted_table(spark: SparkSession, sf_dir: str) -> str:
    """Compact the fragmented copy to ~COMPACT_TARGET_BYTES files.

    Sizing reads the SOURCE bytes from the filesystem (what a real
    compactor reads from the table manifest) — never a row count scan.
    At 100 TB this runs per-partition-subtree with the same two lines;
    the rewrite itself is a distributed shuffle-free coalesce."""
    frag = fragmented_table(spark, sf_dir)
    path = _versioned_cache_dir(_CACHE_ROOT, sf_dir, "lineitem_compacted")

    def build(tmp: str) -> None:
        total = sum(
            e.stat().st_size
            for e in os.scandir(frag)
            if e.name.endswith(".parquet")
        )
        n_files = max(1, -(-total // COMPACT_TARGET_BYTES))  # ceil
        df = spark.read.parquet(frag)
        # coalesce, not repartition: compaction must not pay a shuffle
        df.coalesce(n_files).write.mode("overwrite").parquet(tmp)

    return _atomic_build(path, build)


def clustered_table(spark: SparkSession, sf_dir: str) -> str:
    """Range-partitioned + sorted-within-partition rewrite of lineitem
    on l_shipdate: every row group's (min, max) shipdate envelope is
    narrow, so shipdate predicates skip row groups at scan time."""
    path = _versioned_cache_dir(_CACHE_ROOT, sf_dir, "lineitem_clustered")

    def build(tmp: str) -> None:
        li = load_table(spark, sf_dir, "lineitem")
        (
            li.repartitionByRange(CLUSTER_BUCKETS, "l_shipdate")
            .sortWithinPartitions("l_shipdate")
            .write.mode("overwrite")
            .parquet(tmp)
        )

    return _atomic_build(path, build)


ZORDER_BITS = 8  # bits per dimension → 16-bit z-values (256×256 cells)


def _zcell(col: str, mn: str, mx: str) -> F.Column:
    """Min-max scale an integer key into [0, 2^ZORDER_BITS) — integer
    arithmetic only, so the cell id is exactly reproducible."""
    span = F.col(mx) - F.col(mn) + F.lit(1)
    return F.floor(
        (F.col(col) - F.col(mn)) * F.lit(1 << ZORDER_BITS) / span
    ).cast("long")


def _zinterleave(a: F.Column, b: F.Column) -> F.Column:
    """Bit-interleave two ZORDER_BITS-wide cell ids into the Morton
    (Z-curve) value: a's bit i lands at 2i+1, b's at 2i. Unrolled to
    2×ZORDER_BITS flat shift/mask terms — whole-stage-codegen
    arithmetic, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(ZORDER_BITS):
        z = (
            z
            + F.shiftleft(F.shiftrightunsigned(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftrightunsigned(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def zordered_table(spark: SparkSession, sf_dir: str) -> str:
    """Z-ORDER (Morton-curve) clustered rewrite of lineitem on
    (l_partkey, l_suppkey): multi-dimensional data skipping. A 1-d sort
    (clustered_table) gives narrow envelopes on ONE key and leaves
    every other column's row-group envelope spanning ~the full range;
    interleaving the bits of both keys and range-partitioning + sorting
    on the Morton value bounds EVERY row group in BOTH dimensions, so
    2-d box predicates skip row groups on either key (the layout Delta
    Lake's OPTIMIZE ZORDER BY produces). Key→cell scaling is min-max
    integer arithmetic from a 1-row broadcast aggregate; the z-value is
    unrolled shift/mask Catalyst arithmetic (no UDF); the rewrite is a
    distributed range-partitioned sorted write, same as the 1-d path."""
    path = _versioned_cache_dir(_CACHE_ROOT, sf_dir, "lineitem_zordered")

    def build(tmp: str) -> None:
        li = load_table(spark, sf_dir, "lineitem")
        mm = li.agg(
            F.min("l_partkey").alias("pmin"),
            F.max("l_partkey").alias("pmax"),
            F.min("l_suppkey").alias("smin"),
            F.max("l_suppkey").alias("smax"),
        )
        z = _zinterleave(
            _zcell("l_partkey", "pmin", "pmax"),
            _zcell("l_suppkey", "smin", "smax"),
        )
        (
            li.crossJoin(F.broadcast(mm))
            .withColumn("__z", z)
            .repartitionByRange(CLUSTER_BUCKETS, "__z")
            .sortWithinPartitions("__z")
            .drop("__z", "pmin", "pmax", "smin", "smax")
            .write.mode("overwrite")
            .parquet(tmp)
        )

    return _atomic_build(path, build)


# 2-d box predicate (exists at every fixture SF: part/supplier keys
# start at 0/1); the z-ordered layout skips row groups on BOTH bounds
_ZQ_PART_MAX = 100
_ZQ_SUPP_MAX = 5


def maintenance_zorder_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-d box query over the z-ordered rewrite: must equal the same
    box query on the unsorted source (the oracle) — reordering never
    drops rows. The multi-dimensional skippable-statistics property
    (bounded row-group envelopes in BOTH key dimensions) is asserted
    from the parquet footers in pytest."""
    t = spark.read.parquet(zordered_table(spark, sf_dir))
    return t.filter(
        (F.col("l_partkey") <= _ZQ_PART_MAX)
        & (F.col("l_suppkey") <= _ZQ_SUPP_MAX)
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        exact_sum("l_extendedprice", "sum_price"),
    )


def partitioned_table(spark: SparkSession, sf_dir: str) -> str:
    """Hive-partitioned rewrite of lineitem by ship month — the layout
    that turns a time predicate into DIRECTORY pruning (no file even
    opened), one level coarser than the row-group skipping the
    clustered/z-ordered rewrites buy. This is the parquet-side analogue
    of the reference's SARG linkage (orc-parser/Makefile:37 links the
    ORC search-argument machinery so scans can skip strides): there the
    skip unit is a row-index stride, here it is a partition directory."""
    path = _versioned_cache_dir(_CACHE_ROOT, sf_dir, "lineitem_by_month")

    def build(tmp: str) -> None:
        li = load_table(spark, sf_dir, "lineitem")
        (
            li.withColumn(
                "ship_month", F.date_format("l_shipdate", "yyyy-MM")
            )
            .write.mode("overwrite")
            .partitionBy("ship_month")
            .parquet(tmp)
        )

    return _atomic_build(path, build)


def month_dim_table(spark: SparkSession, sf_dir: str) -> str:
    """Derived calendar dimension (ship_month, qtr) — the standard
    warehouse date-dim, built once from the data (distinct months ×
    quarter label) so pruning queries filter a ~100-row relation
    instead of recomputing date arithmetic against the fact table."""
    path = _versioned_cache_dir(_CACHE_ROOT, sf_dir, "month_dim")

    def build(tmp: str) -> None:
        li = load_table(spark, sf_dir, "lineitem")
        (
            li.select(
                F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
                F.concat(
                    F.year("l_shipdate"),
                    F.lit("Q"),
                    F.quarter("l_shipdate"),
                ).alias("qtr"),
            )
            .distinct()
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )

    return _atomic_build(path, build)


_DPP_QTR = "1997Q1"  # the quarter the pruning query selects


def maintenance_dpp_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNTIME-FILTERED SEMI-JOIN PUSHDOWN (dynamic partition pruning):
    the fact scan's partition set is decided at RUNTIME by the keys
    surviving the dimension filter — Catalyst plants a dynamicpruning
    subquery in the fact scan's PartitionFilters, executes the
    broadcast dim side first, and the scan then lists only the
    matching ship_month directories. The declarative form (semi join
    on the partition column, selective filter on the dim) is all it
    takes; no key collection, no driver-side IN-list building — the
    same runtime-statistics flow the reference gets from linking ORC's
    SARG machinery (orc-parser/Makefile:37), at directory granularity.

    100 TB shape: the dim side is a ~100-row calendar relation
    (always broadcast); the fact side reads ~3 of ~84 month
    directories — the scan-time skip IS the plan, asserted from the
    executed scan's own metrics in pytest (numFiles/numPartitions read
    vs staticFilesNum planned — see plans.executed_scan_metrics), not
    inferred from the plan string alone."""
    fact = spark.read.parquet(partitioned_table(spark, sf_dir))
    dim = (
        spark.read.parquet(month_dim_table(spark, sf_dir))
        .filter(F.col("qtr") == _DPP_QTR)
        .select("ship_month")
    )
    return (
        fact.join(F.broadcast(dim), "ship_month", "left_semi")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            exact_sum("l_extendedprice", "sum_price"),
        )
    )


def maintenance_compact_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integrity proof of compaction: the compacted directory must hold
    exactly the source's rows (count + exact decimal sum). The
    file-count collapse (64 → size-targeted) is asserted in pytest."""
    t = spark.read.parquet(compacted_table(spark, sf_dir))
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        exact_sum("l_extendedprice", "sum_price"),
    )


def maintenance_clustered_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-range query over the clustered rewrite: must equal the same
    query on the unsorted source (the oracle) — clustering reorders,
    never drops. The skippable-statistics property (narrow row-group
    envelopes) is asserted from the parquet footers in pytest."""
    t = spark.read.parquet(clustered_table(spark, sf_dir))
    return t.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-02-01")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        exact_sum("l_extendedprice", "sum_price"),
    )


QUERIES = {
    "maintenance_compact_sum": maintenance_compact_sum,
    "maintenance_clustered_sum": maintenance_clustered_sum,
    "maintenance_zorder_sum": maintenance_zorder_sum,
    "maintenance_dpp_sum": maintenance_dpp_sum,
}

ORACLES = {
    "maintenance_compact_sum": (
        "SELECT COUNT(*) AS n_rows, "
        f"{exact_sum_sql('l_extendedprice', 'sum_price')} FROM lineitem"
    ),
    "maintenance_clustered_sum": (
        "SELECT COUNT(*) AS n_rows, "
        f"{exact_sum_sql('l_extendedprice', 'sum_price')} FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-02-01'"
    ),
    "maintenance_zorder_sum": (
        "SELECT COUNT(*) AS n_rows, "
        f"{exact_sum_sql('l_extendedprice', 'sum_price')} FROM lineitem "
        f"WHERE l_partkey <= {_ZQ_PART_MAX} AND l_suppkey <= {_ZQ_SUPP_MAX}"
    ),
    # the semi join against the derived month dim is value-identical to
    # filtering the fact's own quarter (every dim month comes FROM the
    # fact, so membership == predicate)
    "maintenance_dpp_sum": (
        "SELECT COUNT(*) AS n_rows, "
        f"{exact_sum_sql('l_extendedprice', 'sum_price')} FROM lineitem "
        f"WHERE year(l_shipdate) || 'Q' || quarter(l_shipdate)"
        f" = '{_DPP_QTR}'"
    ),
}
