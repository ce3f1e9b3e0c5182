"""Differential-oracle comparator: Spark result vs DuckDB SQL.

Mirrors the driver's correctness gate (row count + schema + column-name-
sorted, order-insensitive value comparison) so every operator is
validated locally before the driver ever sees it — the engine-level
analogue of the reference's CPU-build-vs-PIM-build dual-backend oracle
(reference README.md:5-7).
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
from typing import Any

import duckdb

from pim_orc_spark.catalog import TABLE_NAMES

# Tight enough to catch cross-engine decimal-rounding divergences the
# driver's exact hash would flag (round 1's q08 bug was 5e-10 relative
# and slipped under 1e-9), while still absorbing summation-order noise
# in intentionally-floating kernels (cosine: ~1e-16 relative).
REL_TOL = 1e-12
ABS_TOL = 1e-12


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(v: Any) -> Any:
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _sort_key(row: tuple) -> tuple:
    return tuple(
        (0, "") if v is None else (1, repr(v)) if not isinstance(v, float) else (2, v)
        for v in row
    )


def _values_match(a: Any, b: Any) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is b
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=REL_TOL, abs_tol=ABS_TOL)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_match(x, y) for x, y in zip(a, b))
    return a == b


def compare(spark_df, sql: str, sf_dir: str) -> tuple[bool, str]:
    """Return (ok, message). Columns sorted by name, rows order-insensitive,
    floats compared with tight tolerance (exact-decimal aggregates should
    match bitwise; the tolerance only absorbs summation-order rounding in
    intentionally-floating kernels like cosine)."""
    con = duckdb_connection(sf_dir)
    try:
        res = con.execute(sql)
        d_cols = [c[0] for c in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()

    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]

    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"

    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    d_idx = [d_cols.index(c) for c in sorted(d_cols)]
    s_norm = sorted(
        (tuple(_canon(r[i]) for i in s_idx) for r in s_rows), key=_sort_key
    )
    d_norm = sorted(
        (tuple(_canon(r[i]) for i in d_idx) for r in d_rows), key=_sort_key
    )
    for i, (sr, dr) in enumerate(zip(s_norm, d_norm)):
        if not _values_match(sr, dr):
            return False, (
                f"value mismatch at sorted row {i} (cols {sorted(s_cols)}):\n"
                f"  spark : {sr}\n  duckdb: {dr}"
            )
    return True, f"ok ({len(s_rows)} rows)"
