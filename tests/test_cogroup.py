"""Cogrouped-map / Arrow grouped-map UDx cells (SURVEY.md §2.8;
ROTATIONS.md round 13)."""

from __future__ import annotations

import pytest

from pim_orc_spark.operators import cogroup
from pim_orc_spark.oracle import compare


@pytest.mark.parametrize("name", sorted(cogroup.QUERIES))
def test_cogroup_matches_oracle(spark, sf_dir, name):
    df = cogroup.QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, cogroup.ORACLES[name], sf_dir)
    assert ok, f"{name}: {msg}"


def test_pandas_and_arrow_cogroup_bit_equal(spark, sf_dir):
    """The applyInArrow twin must reproduce the applyInPandas entry
    row-for-row (same kernel logic through the two §2.8 cogroup APIs)
    — this equality is what lets the exported pandas entry's driver
    attestation cover the pytest-only Arrow twin."""
    a = cogroup.cogroup_balance_align(spark, sf_dir).collect()
    b = cogroup.cogroup_arrow_align(spark, sf_dir).collect()
    assert a == b and len(a) > 0


def test_cogroup_exercises_one_sided_groups(spark):
    """At sf0.001 the supplier book is 10 rows over 25 nations, so
    some nations have customers but NO suppliers — the cogroup kernel
    must receive and handle empty right-hand groups (supp_name NULL at
    every rank, bal_gap = customer balance)."""
    from pyspark.sql import functions as F

    df = cogroup.cogroup_balance_align(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    lonely = {
        r.n_name
        for r in rows
        if r.supp_name is None and r.rnk == 1 and r.cust_name is not None
    }
    assert lonely, "expected at least one customer-only nation"
    # and the padded ranks beyond the shallower side exist
    assert any(r.supp_name is None for r in rows)


def test_cogroup_input_is_pruned_before_python(spark, sf_dir):
    """Scale contract: the JVM-side rank window prunes each side to
    TOP_K rows per nation BEFORE the cogroup ships rows to Python —
    the exported result can never exceed 2 sides × 25 nations × TOP_K
    rows, and the physical plan carries the cogroup operator (the API
    cell genuinely executes, not a join rewrite)."""
    df = cogroup.cogroup_balance_align(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan, plan[:2000]
    assert df.count() <= 25 * cogroup.TOP_K
    arrow_plan = (
        cogroup.cogroup_arrow_align(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapCoGroupsInArrow" in arrow_plan, arrow_plan[:2000]


def test_grouped_arrow_stats_plan_uses_arrow_grouped_map(spark, sf_dir):
    df = cogroup.grouped_arrow_stats(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInArrow" in plan, plan[:2000]
