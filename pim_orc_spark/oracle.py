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


_SPARK_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}


def _hash_divergent_types(
    spark_dtypes: dict[str, str], arrow_types: dict[str, str]
) -> list[str]:
    """Columns where the driver's type-sensitive exact hash WILL
    diverge even though the values are equal.

    Round-8 postmortem (VERDICT r8 #1/#5): DuckDB's ``SUM(int)``
    returns HUGEINT, which arrives through Arrow as
    ``decimal128(38,0)`` while Spark emits bigint; the driver hashes
    the typed Arrow values, so ``rows_match``/``schema_match`` pass
    and ``hash_match`` fails — and the old ``Decimal → float``
    canonicalization here made the local gate blind to exactly that
    class. Fail loudly instead: any column that is decimal on one
    side and integral on the other needs an explicit
    ``CAST(... AS BIGINT)`` in the oracle SQL (the repo convention).
    """
    bad = []
    for col, a_type in arrow_types.items():
        s_type = spark_dtypes.get(col)
        if s_type is None:
            continue
        a_decimal = a_type.startswith("decimal")
        s_decimal = s_type.startswith("decimal")
        if a_decimal and s_type in _SPARK_INTEGRAL:
            bad.append(
                f"{col}: duckdb {a_type} vs spark {s_type} — un-cast"
                " integer aggregate in the oracle? CAST(... AS BIGINT)"
            )
        elif s_decimal and a_type in {"int8", "int16", "int32", "int64"}:
            bad.append(
                f"{col}: spark {s_type} vs duckdb {a_type} — cast the"
                " Spark column or the oracle so both sides agree"
            )
        elif a_decimal and s_type in {"float", "double"}:
            # same driver failure mode as the HUGEINT class: a Decimal
            # arrives as a pandas object column, a double as float64 —
            # equal values, different hash. The local float tolerance
            # would silently absorb it; fail loudly instead.
            bad.append(
                f"{col}: duckdb {a_type} vs spark {s_type} — cast the"
                " oracle column to DOUBLE (or the Spark side to"
                " decimal) so both sides agree"
            )
        elif s_decimal and a_type == "double":
            bad.append(
                f"{col}: spark {s_type} vs duckdb double — cast one"
                " side so both agree (driver hash is type-sensitive)"
            )
    return bad


def compare(spark_df, sql: str, sf_dir: str) -> tuple[bool, str]:
    """Return (ok, message). Columns sorted by name, rows order-insensitive,
    floats compared with tight tolerance (exact-decimal aggregates should
    match bitwise; the tolerance only absorbs summation-order rounding in
    intentionally-floating kernels like cosine).

    The DuckDB side is fetched through Arrow so the comparator sees
    the same typed values the driver hashes — a decimal128 oracle
    column facing an integral Spark column fails here even when the
    Python values are equal (the round-8 HUGEINT class)."""
    con = duckdb_connection(sf_dir)
    try:
        tbl = con.execute(sql).fetch_arrow_table()
    finally:
        con.close()
    d_cols = list(tbl.column_names)
    arrow_types = {
        name: str(t) for name, t in zip(tbl.schema.names, tbl.schema.types)
    }
    d_rows = [tuple(rec[c] for c in d_cols) for rec in tbl.to_pylist()]

    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]

    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    divergent = _hash_divergent_types(dict(spark_df.dtypes), arrow_types)
    if divergent:
        return False, "driver-hash type divergence:\n  " + "\n  ".join(divergent)
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
