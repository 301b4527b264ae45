"""Plan-shape regression tests: pushdown, pruning, broadcast, top-k
physical operator — the scale properties SURVEY.md §4.3 relies on."""

from __future__ import annotations

from dataingestionplayground_spark.plans import (
    has_broadcast_join,
    physical_plan,
    pushed_filters,
    read_schema_columns,
)
from dataingestionplayground_spark.queries import all_queries
from dataingestionplayground_spark.session import load_table


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    q = all_queries()["scan_filter_project"]
    pushed = pushed_filters(q.fn(spark, sf_dir))
    assert any("l_discount" in p for p in pushed)
    assert any("l_shipdate" in p for p in pushed)


def test_column_pruning(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    cols = read_schema_columns(df)
    assert cols == [["l_orderkey", "l_quantity"]]  # 2 of 11 columns read


def test_star_join_broadcasts_dims(spark, sf_dir):
    q = all_queries()["join_star_broadcast"]
    assert has_broadcast_join(q.fn(spark, sf_dir))


def test_topk_uses_take_ordered(spark, sf_dir):
    q = all_queries()["sort_limit_topk"]
    plan = physical_plan(q.fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort


def test_agg_has_partial_phase(spark, sf_dir):
    """Decimal-routed sums must still do map-side partial aggregation."""
    q = all_queries()["agg_pricing_summary"]
    plan = physical_plan(q.fn(spark, sf_dir))
    assert "partial_" in plan.lower() or "HashAggregate" in plan


def test_knn_broadcasts_queries_not_corpus(spark, sf_dir):
    q = all_queries()["vector_knn_bruteforce"]
    plan = physical_plan(q.fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_registry_contract():
    qs = all_queries()
    assert len(qs) >= 50
    for name, q in qs.items():
        assert q.name == name
        assert callable(q.fn)
        if q.oracle is not None:
            assert "SELECT" in q.oracle.upper()
