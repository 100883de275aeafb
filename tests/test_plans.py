"""Physical-plan assertions: the properties the 100 TB scale story rests
on must be visible in the plan, not just assumed — filter pushdown into
the parquet scan, column pruning, broadcast joins for dimension sides,
and shuffle reuse across stacked windows (SURVEY.md §4)."""

import pytest

from shared_etl_pipelines_spark.queries import REGISTRY


def phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def sf(sf_dir):
    return sf_dir


def test_pricing_summary_pushdown_and_pruning(spark, sf):
    plan = phys(REGISTRY["pricing_summary"].fn(spark, sf))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read columns the query never uses
    assert "l_partkey" not in plan.split("ReadSchema")[-1]


def test_zonal_stats_broadcasts_dimension(spark, sf):
    plan = phys(REGISTRY["zonal_stats"].fn(spark, sf))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # the big side must never shuffle


def test_multiply_join_broadcasts_weights(spark, sf):
    plan = phys(REGISTRY["multiply_join"].fn(spark, sf))
    assert "BroadcastHashJoin" in plan


def test_value_mask_no_shuffle(spark, sf):
    plan = phys(REGISTRY["value_mask"].fn(spark, sf))
    assert "Exchange" not in plan  # narrow projection only


def test_rolling_sums_single_window_shuffle(spark, sf):
    # three stacked trailing windows share partitionBy(user_id)+orderBy:
    # one Exchange (plus one optional AQE read), not three
    plan = phys(REGISTRY["rolling_sums"].fn(spark, sf))
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 window shuffle, saw {n_exchanges}"


def test_clip_semi_join_is_semi(spark, sf):
    plan = phys(REGISTRY["clip_semi_join"].fn(spark, sf))
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan


def test_range_join_is_hash_join_not_nested_loop(spark, sf):
    # the bucketed rewrite must plan as an equi-join on _bucket; a naive
    # theta join would appear as BroadcastNestedLoopJoin (quadratic work)
    plan = phys(REGISTRY["range_join_campaigns"].fn(spark, sf))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan


def test_hypertable_cascade_reuses_partials(spark, sf):
    # all three union branches must read the cached hour-level partials,
    # not re-derive from the raw parquet scan (lineage recompute)
    plan = phys(REGISTRY["hypertable_rollup"].fn(spark, sf))
    assert plan.count("InMemoryTableScan") == 3


def test_regional_revenue_all_broadcast(spark, sf):
    # 5-way star join: every dim side broadcast, fact side never shuffles
    # for the joins (the only exchange is the final groupBy)
    plan = phys(REGISTRY["regional_revenue"].fn(spark, sf))
    assert plan.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in plan


def test_anti_join_is_left_anti(spark, sf):
    plan = phys(REGISTRY["anti_join_inactive_customers"].fn(spark, sf))
    assert "LeftAnti" in plan
