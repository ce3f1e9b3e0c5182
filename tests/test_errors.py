"""Error-path coverage: corrupted / truncated files and schema
mismatches must surface as clean Spark exceptions, never hangs or
silent wrong answers.

The reference validates its inputs the same way: corrupt Snappy streams
and varint overruns are detected and rejected
(snappy/pim-snappy/dpu_decompress.c:174-178,269-284,
pim-snappy/pim_snappy.c:507-510); a truncated stream cannot produce a
partial result. Spark's ORC/parquet readers enforce the equivalent
invariants via footer magic, stream lengths, and codec checksums; these
tests pin that behavior, plus the recovery mode a 100 TB ingest of
externally-produced files actually runs with (ignoreCorruptFiles: skip
and continue, never crash the job on one bad file).
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from pim_orc_spark.catalog import load_table
from pim_orc_spark.fsutil import versioned_cache_dir
from pim_orc_spark.sources import orc_io


def _one_orc_file(spark, sf_dir, tmp_path):
    """A private copy of the materialized ORC region table (never the
    shared cache — these tests mutate bytes)."""
    orc_io.orc_table(spark, sf_dir, "region")  # ensure materialized
    # resolve the SAME version-stamped path orc_table writes — the old
    # unversioned join silently copied a stale pre-round-9 cache dir
    src = versioned_cache_dir(orc_io._ORC_CACHE_ROOT, sf_dir, "region")
    dst = str(tmp_path / "region_orc")
    shutil.copytree(src, dst)
    # drop Hadoop's .crc sidecars: corruption must be caught by the ORC
    # reader's own validation (footer magic, stream lengths, codec),
    # the layer the reference's snappy checks live at — not by the
    # local-FS checksum wrapper that real object stores don't have
    for crc in glob.glob(os.path.join(dst, ".*.crc")):
        os.remove(crc)
    files = glob.glob(os.path.join(dst, "*.orc"))
    assert files
    return dst, files[0]


def test_truncated_orc_raises(spark, sf_dir, tmp_path):
    """Footer torn off → the read fails fast with an exception, not a
    hang or an empty result."""
    path, f = _one_orc_file(spark, sf_dir, tmp_path)
    size = os.path.getsize(f)
    with open(f, "r+b") as fh:
        fh.truncate(size // 2)
    with pytest.raises(Exception) as ei:
        spark.read.orc(path).collect()
    # footer validation error (protobuf parse / malformed-file), surfaced
    # at read time — never a partial result
    msg = str(ei.value)
    assert (
        "Malformed ORC" in msg
        or "InvalidProtocolBuffer" in msg
        or "Checksum" in msg
    ), msg[:400]


def test_corrupt_orc_body_raises(spark, sf_dir, tmp_path):
    """Valid footer, garbage data bytes → decode error at scan time (the
    reference's corrupt-Snappy-stream class of failure)."""
    path, f = _one_orc_file(spark, sf_dir, tmp_path)
    size = os.path.getsize(f)
    with open(f, "r+b") as fh:
        fh.seek(size // 4)
        fh.write(bytes(0xFF ^ b for b in fh.read(64)))
    with pytest.raises(Exception):
        spark.read.orc(path).collect()


def test_ignore_corrupt_files_skips_bad_orc(spark, sf_dir, tmp_path):
    """Recovery mode for external ingest: with ignoreCorruptFiles the
    truncated file is skipped and the job completes on what remains.

    The schema is declared explicitly, as a production 100 TB ingest
    would: scan-time recovery (FileScanRDD skips IOExceptions under
    ignoreCorruptFiles) is the contract under test. Schema INFERENCE is
    deliberately kept off the corrupt file — Spark's ORC inference only
    tolerates FileFormatException, so a truncation that lands mid-
    protobuf (InvalidProtocolBufferException) escapes it regardless of
    the flag; where the cut lands depends on file bytes, which made an
    inference-based version of this test flaky."""
    path, f = _one_orc_file(spark, sf_dir, tmp_path)
    schema = spark.read.orc(path).schema  # inferred from the good file only
    # keep one good file, add one truncated sibling
    bad = os.path.join(path, "zz_truncated.orc")
    shutil.copy(f, bad)
    with open(bad, "r+b") as fh:
        fh.truncate(os.path.getsize(bad) // 2)
    for crc in glob.glob(os.path.join(path, ".*.crc")):
        os.remove(crc)
    prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        rows = spark.read.schema(schema).orc(path).collect()
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)
    expected = load_table(spark, sf_dir, "region").count()
    assert len(rows) == expected


def test_not_a_parquet_file_raises(spark, tmp_path):
    """A file without the parquet magic fails footer validation."""
    p = tmp_path / "fake"
    p.mkdir()
    (p / "part-00000.parquet").write_bytes(b"this is not parquet data" * 64)
    with pytest.raises(Exception) as ei:
        spark.read.parquet(str(p)).collect()
    msg = str(ei.value).lower()
    assert "parquet" in msg or "footer" in msg or "magic" in msg


def test_truncated_parquet_raises(spark, sf_dir, tmp_path):
    """Parquet footer lives at the tail; truncation must be detected."""
    src = os.path.join(sf_dir, "region.parquet")
    p = tmp_path / "trunc"
    p.mkdir()
    dst = str(p / "region.parquet")
    shutil.copy(src, dst)
    with open(dst, "r+b") as fh:
        fh.truncate(os.path.getsize(dst) // 2)
    with pytest.raises(Exception):
        spark.read.parquet(str(p)).collect()


def test_schema_mismatch_raises(spark, sf_dir):
    """Declaring an incompatible type for a stored column (string read
    as int) must raise a conversion error, not silently coerce."""
    with pytest.raises(Exception):
        (
            spark.read.schema("r_regionkey bigint, r_name int")
            .parquet(os.path.join(sf_dir, "region.parquet"))
            .collect()
        )


def test_missing_column_is_null_not_error(spark, sf_dir):
    """Schema evolution contract: a declared-but-absent column reads as
    NULL (additive evolution is safe); only type CONFLICTS are errors."""
    rows = (
        spark.read.schema("r_regionkey bigint, r_new_col string")
        .parquet(os.path.join(sf_dir, "region.parquet"))
        .collect()
    )
    assert rows and all(r["r_new_col"] is None for r in rows)


def test_round9_text_operators_handle_empty_corpus(spark, tmp_path):
    """An empty documents table must yield empty results, not crashes
    — the zero-input corner every scheduled pipeline job eventually
    hits (a partition with no new data). Covers the round-9 map-only
    operators and the span report's windowed-aggregate plan."""
    import os

    from pim_orc_spark.operators.dedup import dedup_span_report
    from pim_orc_spark.operators.text import (
        text_pii_redact,
        text_url_filter,
    )

    sf = str(tmp_path)
    (
        spark.createDataFrame(
            [],
            "doc_id: long, text: string, lang: string, "
            "source: string, n_chars: long",
        ).write.parquet(os.path.join(sf, "documents.parquet"))
    )
    assert text_pii_redact(spark, sf).count() == 0
    assert text_url_filter(spark, sf).count() == 0
    assert dedup_span_report(spark, sf).count() == 0


def test_task_retry_yields_exactly_once_results():
    """FAULT TOLERANCE: on a 1000-executor cluster task attempts FAIL
    routinely (preemption, OOM-killed executors, flaky disks) and the
    engine's results must be attempt-count-invariant. Inject a
    first-attempt failure into EVERY task of a Python map stage (via
    TaskContext.attemptNumber) under a retry-enabled master
    (local[4,3]) and prove the downstream shuffle aggregate equals the
    closed-form answer — no lost rows, no duplicated rows, from
    re-executed map tasks feeding a shuffle. Runs in a subprocess: the
    shared test session is local[8] (maxFailures=1 — any task failure
    is fatal there by design), and one JVM allows one SparkContext."""
    import subprocess
    import sys

    script = r"""
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[4, 3]").appName("retry-proof")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
N, K, PARTS = 100_000, 97, 8
df = spark.range(0, N, 1, PARTS).selectExpr("id", f"id % {K} AS k")

def flaky(batches):
    from pyspark import TaskContext

    if TaskContext.get().attemptNumber() == 0:
        raise RuntimeError("injected first-attempt failure")
    for pdf in batches:
        yield pdf

flaked = df.mapInPandas(flaky, "id long, k long")
agg = flaked.groupBy("k").agg(
    F.count(F.lit(1)).alias("n"), F.sum("id").alias("s")
)
rows = {r["k"]: (r["n"], r["s"]) for r in agg.collect()}
exp = {}
for k in range(K):
    n = (N - 1 - k) // K + 1  # ids k, k+K, ... < N
    s = n * k + K * (n * (n - 1) // 2)
    exp[k] = (n, s)
assert rows == exp, "task retries changed the aggregate"
print("RETRY_OK", len(rows))
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "RETRY_OK 97" in out.stdout, (out.stdout, out.stderr[-2000:])
    # the injected failures really happened (every task lost attempt 0)
    assert "injected first-attempt failure" in out.stderr


def test_variant_and_pyds_edge_inputs(spark):
    """Edge contracts of the round-11 surfaces: try_parse_json returns
    NULL (never an error) on malformed JSON — the lenient ingest gate
    a 100 TB pipeline needs before q78's typed extraction; parse_json
    raises loudly on the same input (the strict twin); the Python
    data source yields an empty, well-typed relation at n=0."""
    import pytest as pt
    from pyspark.sql import functions as F

    from pim_orc_spark.sources import pyds

    rows = [("ok", '{"k": 1}'), ("bad", '{"k": oops'), ("null", None)]
    df = spark.createDataFrame(rows, "tag string, js string")
    out = {
        r["tag"]: r["v"]
        for r in df.select(
            "tag",
            F.try_variant_get(
                F.try_parse_json("js"), "$.k", "long"
            ).alias("v"),
        ).collect()
    }
    assert out == {"ok": 1, "bad": None, "null": None}
    with pt.raises(Exception, match="MALFORMED_RECORD_IN_PARSING|JSON"):
        df.select(F.parse_json("js").alias("v")).collect()

    pyds.register(spark)
    empty = (
        spark.read.format("synthetic_docs")
        .option("n", "0")
        .option("parts", "4")
        .load()
    )
    assert empty.count() == 0
    assert empty.columns == ["doc_id", "bucket", "h"]


def test_cbo_confs_restored_even_when_the_query_fails(spark, sf_dir):
    """q76 flips session-global CBO switches for the duration of its
    materialization; a mid-flight failure must not leave cost-based
    planning silently enabled for every later query in the session."""
    import pytest as pt

    from pim_orc_spark.operators.relational import _cbo_confs

    before = spark.conf.get("spark.sql.cbo.enabled")
    old = _cbo_confs(spark, True)
    try:
        assert spark.conf.get("spark.sql.cbo.enabled") == "true"
        raise RuntimeError("injected")
    except RuntimeError:
        pass
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    assert spark.conf.get("spark.sql.cbo.enabled") == before
