"""Execution profiling helper (SURVEY.md §2.1 S8).

The reference ships a perf-based profiling workflow: per-stage runtime
bins (scripts/parse_stackcollapse.py:5-10,31-42) and on-device cycle
counters rolled up per rank (pim-snappy/pim_snappy.c:449-467). Spark
records the same information natively as SQL metrics on every physical
operator; ``explain_profile`` executes a DataFrame and returns the
final (post-AQE) physical plan annotated with those metrics — rows
output, spill sizes, shuffle bytes, scan time — the engine's analogue
of the reference's runtime-breakdown report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_profile(df: DataFrame, execute: bool = True) -> str:
    """Return the formatted physical plan of ``df``; with ``execute``
    (default) the query runs first (noop sink — full execution, nothing
    collected) so the explain shows the final AQE-re-planned form with
    runtime statistics attached.

    Uses the public ``DataFrame.explain`` API (stdout-captured — it
    prints the same explainString the JVM builds for this DataFrame's
    queryExecution), so no py4j JVM-handle class lookup is needed."""
    import contextlib
    import io

    if execute:
        df.write.format("noop").mode("overwrite").save()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


# Stage bins mirroring the reference's stackcollapse breakdown
# (scripts/parse_stackcollapse.py:5-10 bins samples into Init /
# ColumnReader / RLE / Snappy); Spark's equivalent cost centers are the
# scan, the exchanges, the aggregates, joins, and sorts. First match
# wins, so exchange-reads are tested before scans.
_BINS = (
    ("exchange", ("Exchange", "ShuffleQueryStage", "BroadcastQueryStage",
                  "AQEShuffleRead", "ShuffleRead")),
    ("scan", ("Scan", "ColumnarToRow", "InMemoryTableScan")),
    ("agg", ("HashAggregate", "ObjectHashAggregate", "SortAggregate")),
    ("join", ("Join", "CartesianProduct")),
    ("sort", ("Sort", "TakeOrderedAndProject")),
)


def _bin_for(node_name: str) -> str:
    for bin_name, keys in _BINS:
        if any(k in node_name for k in keys):
            return bin_name
    return "other"


def _iter_nodes(jnode):
    """Depth-first walk of an executed SparkPlan via py4j, descending
    through AQE roots (final re-planned form) and materialized query
    stages (whose children() are empty — the real subtree hangs off
    .plan())."""
    cls = jnode.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        yield from _iter_nodes(jnode.executedPlan())
        return
    if cls.endswith("QueryStageExec"):
        yield from _iter_nodes(jnode.plan())
        return
    yield jnode
    children = jnode.children()
    for i in range(children.length()):
        yield from _iter_nodes(children.apply(i))


def stage_profile(df: DataFrame) -> dict:
    """Execute ``df`` and roll its per-operator SQL metrics up into
    stage bins — the engine's analogue of the reference's per-stage
    runtime report (parse_stackcollapse.py:31-42: % of samples per
    stage, total = sum of bins).

    Executes via ``queryExecution().toRdd().count()`` so the metrics
    land on THIS DataFrame's executed plan (a sink write would execute
    a separate wrapping query whose metrics this df never sees) without
    moving a row to Python. Returns::

        {"wall_sec": ..., "binned_total_ms": ...,
         "bins": {bin: {"nodes", "rows", "time_ms", "frac"}}}

    ``time_ms`` sums every timing metric the bin's operators report
    (scan time, shuffle write/fetch wait, agg/sort/codegen time —
    executor-side, so on local[32] the binned total can exceed wall
    clock); ``frac`` is the bin's share of ``binned_total_ms``, which
    equals the sum over bins by construction."""
    import time

    from pim_orc_spark.plans import require_query_execution

    t0 = time.perf_counter()
    jqe = require_query_execution(df).queryExecution()
    jqe.toRdd().count()
    wall = time.perf_counter() - t0

    bins: dict[str, dict] = {}
    for node in _iter_nodes(jqe.executedPlan()):
        rec = bins.setdefault(
            _bin_for(node.nodeName()),
            {"nodes": 0, "rows": 0, "time_ms": 0.0},
        )
        rec["nodes"] += 1
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            key, metric = kv._1(), kv._2()
            v = metric.value()
            if v < 0:  # unset sentinel
                continue
            mtype = metric.metricType()
            if key == "numOutputRows":
                rec["rows"] += v
            elif mtype == "timing":
                rec["time_ms"] += float(v)
            elif mtype == "nsTiming":
                rec["time_ms"] += v / 1e6
    total_ms = sum(r["time_ms"] for r in bins.values())
    for r in bins.values():
        r["frac"] = (r["time_ms"] / total_ms) if total_ms else 0.0
    return {
        "wall_sec": round(wall, 4),
        "binned_total_ms": round(total_ms, 3),
        "bins": bins,
    }


def scan_summary(df: DataFrame) -> dict:
    """Scan-shape facts a reviewer checks first: pushed filters and the
    read schema, parsed out of the formatted plan. Empty strings mean
    the plan has no file scan (e.g. an in-memory relation)."""
    text = explain_profile(df, execute=False)
    out = {"pushed_filters": "", "read_schema": ""}
    for line in text.splitlines():
        s = line.strip()
        if s.startswith("PushedFilters:"):
            out["pushed_filters"] = s.removeprefix("PushedFilters:").strip()
        elif s.startswith("ReadSchema:"):
            out["read_schema"] = s.removeprefix("ReadSchema:").strip()
    return out
