"""Tests for the analytics operators without an exact oracle, plus
plan-shape assertions for the ones whose scale story depends on the
physical plan."""

from __future__ import annotations

from overturelink_data_pipeline_spark import registry

registry.load_all()


def test_approx_sketches_accuracy(spark, sf_dir):
    """HLL++ distinct within 5% of exact; GK median within 2% of the
    exact interpolated percentile (different definitions: GK returns a
    data point, percentile_cont interpolates). Direct call since r6 —
    agg_approx_sketches was deregistered (the rows-only slot); this
    accuracy pin IS its verification now."""
    from overturelink_data_pipeline_spark.operators.analytics import (
        agg_approx_sketches,
    )

    exact = {
        r["l_returnflag"]: r
        for r in registry.QUERIES["agg_percentiles_exact"](spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: r for r in agg_approx_sketches(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for flag in exact:
        e, a = exact[flag], approx[flag]
        assert abs(a["approx_parts"] - e["distinct_parts"]) <= 0.05 * e["distinct_parts"]
        assert abs(a["approx_p50"] - e["p50"]) <= 0.02 * e["p50"]


def test_asof_join_lag_nonnegative(spark, sf_dir):
    out = registry.QUERIES["join_asof_last_signup"](spark, sf_dir).toPandas()
    matched = out[out.signup_id.notna()]
    assert (matched.lag_s >= 0).all()  # signup at or before the purchase
    # purchases before any signup stay unmatched (LEFT asof semantics)
    assert out.purchase_id.is_unique


def test_rollup_subtotals_consistent(spark, sf_dir):
    out = registry.QUERIES["agg_rollup_nation_region"](spark, sf_dir).toPandas()
    grand = out[(out.region == "__ALL__") & (out.nation == "__ALL__")]
    assert len(grand) == 1
    leaf = out[(out.region != "__ALL__") & (out.nation != "__ALL__")]
    assert leaf.n_cust.sum() == grand.n_cust.iloc[0]
    region_rows = out[(out.region != "__ALL__") & (out.nation == "__ALL__")]
    assert region_rows.n_cust.sum() == grand.n_cust.iloc[0]


def test_broadcast_in_range_join_plan(spark, sf_dir):
    """The band side must broadcast — a shuffled nested-loop over the
    fact side would be the 100 TB failure mode."""
    df = registry.QUERIES["join_range_price_band"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_rank_filter_before_output(spark, sf_dir):
    out = registry.QUERIES["window_rank_suppliers_per_nation"](spark, sf_dir).toPandas()
    assert out.rnk.max() <= 3
    assert (out.groupby("nation").rnk.min() == 1).all()
