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
    repr is total and deterministic), sorted. NOTE: sorting certifies
    SET equality — an ordering difference on a sorted/top-k plan is
    deliberately not this harness's concern (the membership of a
    top-k result already pins the sort's effect; per-row ordering is
    certified transport-independently by the driver's oracle hash)."""
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
    the client cannot load (the documented env-gate pattern), and
    ``RuntimeError`` when a CLASSIC session is already active in this
    process — pyspark refuses to open a Connect session beside one
    (SESSION_ALREADY_EXIST), so a comparison harness must collect its
    classic results and then run this in a FRESH process
    (``run_subset_in_subprocess`` below does exactly that).

    The Connect session is stopped on exit only when this call created
    it; a pre-existing active Connect session (a caller already
    running over Connect) is left running."""
    _require_connect()
    from pyspark.sql import SparkSession

    from pim_orc_spark.session import ensure_parity_confs

    classic = None
    try:
        classic = SparkSession.getActiveSession()
    except Exception:
        pass
    if classic is not None:
        raise RuntimeError(
            "a classic SparkSession is active in this process; pyspark "
            "cannot open a Connect session beside it "
            "(SESSION_ALREADY_EXIST) — stop it first or use "
            "run_subset_in_subprocess"
        )
    names = CONNECT_SUBSET if names is None else names
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    remote = remote or os.environ.get("SPARK_REMOTE", f"local[{cpus}]")
    preexisting = False
    try:
        from pyspark.sql.connect.session import SparkSession as CS

        preexisting = CS.getActiveSession() is not None
    except Exception:
        pass
    spark = SparkSession.builder.remote(remote).getOrCreate()
    try:
        # parity confs are all RUNTIME confs, settable over Connect RPC
        ensure_parity_confs(spark)
        return {
            name: rows_fingerprint(queries[name](spark, sf_dir).collect())
            for name in names
        }
    finally:
        if not preexisting:
            spark.stop()


def _require_connect() -> None:
    """Raise the documented env-gate error when the Connect client
    cannot load — shared by both entry points so they gate
    identically."""
    gate = connect_gate_error()
    if gate is not None:
        raise NotImplementedError(
            "Spark Connect client dependencies are unavailable in this "
            f"environment ({gate}); install grpcio + grpcio-status + "
            "protobuf to execute the engine over Connect"
        )


def run_subset_in_subprocess(
    sf_dir: str,
    names: list[str] | None = None,
    repo_root: str | None = None,
    timeout: int = 1800,
) -> dict[str, list[str]]:
    """Execute the Connect subset in a FRESH Python process (no classic
    session to collide with) and return its fingerprints. The child
    imports ``__spark_entry__.all_queries()`` from ``repo_root``
    (default: this package's parent) and prints one JSON object; the
    parent — typically holding the classic session whose results it
    wants to compare against — parses it. This is the comparison
    protocol the live test uses. Gates identically to
    ``run_subset_under_connect`` (the parent shares the child's env,
    so the dependency probe is checked here without paying a process
    spawn)."""
    import json
    import subprocess
    import sys

    _require_connect()
    names = CONNECT_SUBSET if names is None else names
    repo_root = repo_root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    child = (
        "import json, sys\n"
        f"sys.path.insert(0, {repo_root!r})\n"
        "import __spark_entry__ as entry\n"
        "from pim_orc_spark.connectrun import run_subset_under_connect\n"
        f"out = run_subset_under_connect({sf_dir!r}, entry.all_queries(), "
        f"names={names!r})\n"
        "print('CONNECT_FP ' + json.dumps(out))\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", child],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=repo_root,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("CONNECT_FP "):
            return json.loads(line[len("CONNECT_FP "):])
    raise RuntimeError(
        f"Connect subprocess produced no fingerprints (rc={proc.returncode});"
        f" stderr tail: {proc.stderr[-2000:]}"
    )
