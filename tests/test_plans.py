"""Plan-shape assertions: the optimizations SURVEY.md §4 claims must be
visible in the physical plans (pushdown, pruning, broadcast), via the
S8 profiling helper."""

from __future__ import annotations

from pyspark.sql import functions as F

from pim_orc_spark.catalog import load_table
from pim_orc_spark.plans.profile import explain_profile, scan_summary


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    from pim_orc_spark.operators.relational import q03_pushdown_range_filter

    s = scan_summary(q03_pushdown_range_filter(spark, sf_dir))
    assert "l_quantity" in s["pushed_filters"]
    assert "l_shipdate" in s["pushed_filters"]


def test_projection_prunes_read_schema(spark, sf_dir):
    """A 1-column aggregate must read exactly 1 column (P1: the
    reference consumes only fields[0], reader.cc:50)."""
    from pim_orc_spark.operators.relational import q01_flagship_sum

    s = scan_summary(q01_flagship_sum(spark, sf_dir))
    assert s["read_schema"] == "struct<l_extendedprice:double>"


def test_star_join_broadcasts(spark, sf_dir):
    from pim_orc_spark.operators.relational import q07_broadcast_star_join

    plan = explain_profile(q07_broadcast_star_join(spark, sf_dir), execute=False)
    assert "BroadcastHashJoin" in plan


def test_profile_includes_runtime_plan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    text = explain_profile(li.agg(F.sum("l_quantity").alias("s")))
    assert "HashAggregate" in text
