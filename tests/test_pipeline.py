from __future__ import annotations

import pytest

from pim_orc_spark.operators import pipeline
from pim_orc_spark.oracle import compare


@pytest.mark.parametrize("name", sorted(pipeline.QUERIES))
def test_pipeline_matches_oracle(spark, sf_dir, name):
    df = pipeline.QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, pipeline.ORACLES[name], sf_dir)
    assert ok, f"{name}: {msg}"


def test_curate_funnel_is_monotone(spark, sf_dir):
    """Each curation stage can only remove documents, and every source
    present in the corpus appears in the report."""
    rows = pipeline.pipeline_curate(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_raw >= r.n_quality >= r.n_exact >= r.n_kept >= 0


def test_curate_has_no_allpairs_join(spark, sf_dir):
    """The composed funnel must stay on the bucketed near-dedup plan:
    no cartesian / broadcast-nested-loop join anywhere in the physical
    plan, or the pipeline dies at 100 TB."""
    plan = (
        pipeline.pipeline_curate(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
