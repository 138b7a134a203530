"""Plan-shape assertions for the TPC-H long-tail queries (queries/tpch_tail.py).

Correctness is covered by the registry smoke test (tests/test_queries.py) and
the DuckDB oracle (tools/verify_local.py); here we assert that the subquery
decorrelations compile to the distributed plan shapes their docstrings claim —
semi/anti joins on co-partitioned keys, broadcast one-row scalars, pushed
disjunctions — not per-row subqueries or single-partition funnels.
"""

from __future__ import annotations

from spark_iceberg_jobs_spark.plans.explain import (
    formatted_plan,
    has_broadcast_hash_join,
    pushed_filters,
)
from spark_iceberg_jobs_spark.queries.tpch_tail import (
    q2_min_cost_supplier,
    q17_small_quantity_revenue,
    q19_disjunctive_revenue,
    q21_waiting_suppliers,
    q22_dormant_customers,
)


def test_q2_correlated_min_decorrelates_without_funnel(spark, sf_dir):
    """The correlated-min must become grouped-min + equality join: no
    SinglePartition exchange, no unpartitioned Window over the fact."""
    plan = formatted_plan(q2_min_cost_supplier(spark, sf_dir))
    assert "SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q17_correlated_avg_prunes_before_aggregating(spark, sf_dir):
    """The inner per-part average must aggregate only the brand's partkeys
    (semi-join-pruned input), never the whole lineitem corpus."""
    plan = formatted_plan(q17_small_quantity_revenue(spark, sf_dir))
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q19_disjunction_pushes_quantity_to_scan(spark, sf_dir):
    """Catalyst must factor the join key out of the OR-of-ANDs and push the
    per-table residual disjunctions down to the scans."""
    q = q19_disjunctive_revenue(spark, sf_dir)
    pf = pushed_filters(q)
    assert "l_quantity" in pf, pf
    assert has_broadcast_hash_join(q), formatted_plan(q)


def test_q21_exists_pair_decorrelates_to_orderkey_windows(spark, sf_dir):
    """The EXISTS/NOT-EXISTS pair must decorrelate into per-order
    collect_set windows partitioned by orderkey (single scan of the fact)
    — never a per-row subquery, nested-loop product, or a global window."""
    plan = formatted_plan(q21_waiting_suppliers(spark, sf_dir))
    assert ", [l_orderkey#" in plan, plan  # Window partitioned by orderkey
    assert "SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q22_scalar_average_is_broadcast_one_row(spark, sf_dir):
    """The average-balance scalar joins as a broadcast (one row), and the
    dormancy check is an anti join keyed on custkey."""
    plan = formatted_plan(q22_dormant_customers(spark, sf_dir))
    assert "BroadcastNestedLoopJoin Cross" in plan, plan
    assert "LeftAnti" in plan, plan
