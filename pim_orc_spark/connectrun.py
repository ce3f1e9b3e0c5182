"""Spark Connect execution harness (r15 verdict #1).

The operator surface is lint-proven free of py4j handles
(`tests/test_entry_contract.py::test_operator_surface_is_connect_clean`:
no py4j handles outside the `plans/` capability guard, no SparkContext
access outside `session.py`'s transport-tolerant helpers). This
module converts that lint-level guarantee into an EXECUTED witness
wherever the environment provides the Connect client dependencies:
run a representative export subset through a ``--remote local``
session — the same DataFrame plans, a second transport — and compare
row-for-row with the classic-session results. The reference's
analogous discipline is its CPU-vs-PIM differential oracle
(README.md:5-7): identical semantics proven through a second
execution path.

This container ships the SERVER jar (``jars/spark-connect_2.13``) but
not the Python client deps (grpcio, protobuf, grpcio-status —
re-probed round 16; importing ``pyspark.sql.connect.session`` raises
``PySparkImportError [PACKAGE_NOT_INSTALLED] grpcio >= 1.48.1``), so
in-container this is an env gate under the same policy as the Avro
connector and ``transformWithStateInPandas``: the gate test asserts
the NAMED error, and the live path below runs unchanged the day the
deps exist.
"""

from __future__ import annotations

import os

# Representative subset spanning the §2 families: reference-parity
# scan-agg, grouped agg, broadcast join + top-k, window frames, sketch
# certification, Arrow-kernel dedup + iterative clustering, ANN,
# all-JVM text scoring, the ORC source path, and the Python DataSource
# (the one surface with its own worker model).
CONNECT_SUBSET = [
    "q01_flagship_sum",
    "q04_pricing_summary",
    "q31_tpch_q3_shipping_priority",
    "q71_rolling_window_1h",
    "q91_quantile_sketch_rollup",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "ann_recall",
    "text_quality",
    "orc_roundtrip_sum",
    "source_python_datasource",
]


def connect_gate_error() -> str | None:
    """None when the Spark Connect client can load; otherwise the named
    error string (Spark's own dependency check — the authority on what
    the client needs, currently grpcio/grpcio-status/protobuf)."""
    try:
        import pyspark.sql.connect.session  # noqa: F401

        return None
    except Exception as e:  # PySparkImportError in practice
        return f"{type(e).__name__}: {e}"


def rows_fingerprint(rows) -> list[str]:
    """Transport-comparable form of a collected result: one repr per
    row (exports are scalar-only columns by the entry contract, so
    repr is total and deterministic), sorted — row order is not part
    of any export's contract unless the plan sorts, and a sorted
    comparison is strict for sorted plans too."""
    return sorted(repr(tuple(r)) for r in rows)


def run_subset_under_connect(
    sf_dir: str,
    queries: dict,
    names: list[str] | None = None,
    cpus: int | None = None,
    remote: str | None = None,
) -> dict[str, list[str]]:
    """Execute ``names`` (default ``CONNECT_SUBSET``) through a Spark
    Connect session and return {name: rows_fingerprint}. ``queries``
    is the `(spark, sf_dir) -> DataFrame` registry (pass
    ``__spark_entry__.all_queries()``); the callables receive the
    CONNECT session, so any py4j/SparkContext reliance in an operator
    fails here — that failure is this harness's entire point.

    ``remote`` defaults to ``$SPARK_REMOTE`` or ``local[cpus]`` (the
    in-process server the pyspark distribution's connect jar backs).
    Raises ``NotImplementedError`` naming the missing dependency when
    the client cannot load (the documented env-gate pattern)."""
    gate = connect_gate_error()
    if gate is not None:
        raise NotImplementedError(
            "Spark Connect client dependencies are unavailable in this "
            f"environment ({gate}); install grpcio + grpcio-status + "
            "protobuf to execute the engine over Connect"
        )
    from pyspark.sql import SparkSession

    from pim_orc_spark.session import ensure_parity_confs

    names = CONNECT_SUBSET if names is None else names
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    remote = remote or os.environ.get("SPARK_REMOTE", f"local[{cpus}]")
    spark = SparkSession.builder.remote(remote).getOrCreate()
    try:
        # parity confs are all RUNTIME confs, settable over Connect RPC
        ensure_parity_confs(spark)
        return {
            name: rows_fingerprint(queries[name](spark, sf_dir).collect())
            for name in names
        }
    finally:
        spark.stop()
