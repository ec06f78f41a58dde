"""Physical-plan assertions: the properties that make these queries scale
(pushdown, pruning, top-k short-circuit, optimizer-chosen joins) are pinned
as tests so a regression is visible before a benchmark run."""

from __future__ import annotations

import pytest

from gofeed_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name):
    return QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_filter_pushed_to_parquet_scan(spark):
    plan = plan_of(spark, "q02_filter_ineq_time")
    assert "PushedFilters:" in plan
    assert "event_type" in plan.split("PushedFilters:")[1][:300]


def test_column_pruning_in_scan(spark):
    plan = plan_of(spark, "q01_scan_project")
    schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderkey" in schema and "o_orderpriority" not in schema


def test_sort_limit_is_take_ordered(spark):
    assert "TakeOrderedAndProject" in plan_of(spark, "q04_sort_limit")


def test_join_strategy_left_to_optimizer(spark):
    # no user hint survives into the optimized plan for the SF-scaled join
    df = QUERIES["q10_inner_join"](spark, SF)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in optimized and "UnresolvedHint" not in optimized


def test_agg_has_map_side_partial(spark):
    # partial_sum before the exchange = map-side combine; the shuffle moves
    # one row per (group, partition), not one per input row
    plan = plan_of(spark, "q06_groupby_multiagg")
    assert "partial_sum" in plan and plan.index("partial_sum") > plan.index("Exchange")


def test_no_cartesian_anywhere_in_primary_pair_search(spark):
    plan = plan_of(spark, "q58_topk_pairs_lsh")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
