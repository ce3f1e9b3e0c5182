"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke at sf0.001.
``queries()`` — name → Callable[(spark, sf_dir), DataFrame], one per
implemented operator (SURVEY.md §2 + north-star extensions).
``oracle_sql()`` — name → DuckDB ANSI SQL equivalent (absent only for
non-SQL-expressible operators → driver runs a rows-only check).

All query logic lives in the ``pim_orc_spark`` package; this module is
only the contract adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may import this module from anywhere; make the package
# importable from the repo root.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _modules():
    from pim_orc_spark.operators import (
        dedup,
        multimodal,
        relational,
        similarity,
        text,
    )
    from pim_orc_spark.sources import orc_io
    from pim_orc_spark.streaming import stream_events

    return [relational, text, dedup, similarity, multimodal, orc_io, stream_events]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's whole program (scan → project col → null-skip →
    partial SUM → final SUM, reader.cc:50-63,156-161) as one Spark agg.
    """
    from pim_orc_spark.operators.relational import q01_flagship_sum

    return q01_flagship_sum(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _modules():
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        out.update(m.ORACLES)
    return out
