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
    """
    if execute:
        df.write.format("noop").mode("overwrite").save()
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


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
