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


def test_knn_partial_topk_bounds_the_shuffle(spark, sf_dir):
    """Two-phase top-k: the per-partition partial (mapInPandas / Arrow
    eval) must sit BELOW the final window's Exchange, so the shuffle
    carries only survivors — never the raw corpus x queries product."""
    q = all_queries()["vector_knn_bruteforce"]
    plan = physical_plan(q.fn(spark, sf_dir))
    arrow = plan.find("ArrowEvalPython") if "ArrowEvalPython" in plan else plan.find("MapInPandas")
    assert arrow != -1, plan
    win = plan.find("Window")
    # formatted plans list operators leaves-last; the window (final rank)
    # must appear ABOVE the Arrow stage in the operator tree dump
    assert win != -1 and win < arrow, plan


def test_q6_predicates_push_to_scan(spark, sf_dir):
    q = all_queries()["tpch_q6_forecast_revenue"]
    pushed = pushed_filters(q.fn(spark, sf_dir))
    joined = " ".join(pushed)
    assert "l_shipdate" in joined and "l_discount" in joined and "l_quantity" in joined
    # column pruning: the scan reads only the 4 referenced columns
    cols = read_schema_columns(q.fn(spark, sf_dir))
    assert sorted(cols[0]) == ["l_discount", "l_extendedprice", "l_quantity", "l_shipdate"]


def test_stratified_sample_filter_pushes_no_shuffle(spark, sf_dir):
    q = all_queries()["sample_stratified_by_source"]
    plan = physical_plan(q.fn(spark, sf_dir))
    assert "Exchange" not in plan  # pure scan+filter+project: no shuffle at any scale


def test_decontaminate_broadcasts_eval_grams(spark, sf_dir):
    """The eval-gram (benchmark-sized) side must broadcast; the train
    side's only Exchange is the per-doc overlap hash agg."""
    q = all_queries()["dedup_decontaminate"]
    plan = physical_plan(q.fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pq_encode_no_corpus_exchange(spark, sf_dir):
    """PQ encoding is a per-row expression: the only exchanges allowed
    are the tiny codebook build (SinglePartition over <= k seed rows)
    and its broadcast — never a corpus-wide shuffle."""
    q = all_queries()["vector_pq_encode"]
    plan = physical_plan(q.fn(spark, sf_dir))
    import re

    exchanges = re.findall(r"Exchange (\w+)", plan)
    assert all(kind in ("SinglePartition,", "SinglePartition") for kind in exchanges), exchanges


def test_quantize_is_pure_projection(spark, sf_dir):
    q = all_queries()["vector_int8_quantize"]
    plan = physical_plan(q.fn(spark, sf_dir))
    assert "Exchange" not in plan


def test_language_balance_broadcasts_counts(spark, sf_dir):
    """Corpus side never shuffles: counts + min are broadcast back."""
    q = all_queries()["sample_language_balanced"]
    plan = physical_plan(q.fn(spark, sf_dir))
    assert plan.count("BroadcastExchange") >= 2
    assert "SortMergeJoin" not in plan


def test_train_val_test_split_no_shuffle(spark, sf_dir):
    q = all_queries()["sample_train_val_test"]
    plan = physical_plan(q.fn(spark, sf_dir))
    assert "Exchange" not in plan


def test_entry_wrapper_pins_timezone(spark, sf_dir):
    """The driver's session TZ is unknown — queries() must produce
    identical results under any ambient session timezone (the wrapper
    pins UTC before running)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    q = E.queries()["date_functions"]
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        tokyo = sorted(tuple(str(v) for v in r) for r in q(spark, sf_dir).collect())
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny = sorted(tuple(str(v) for v in r) for r in q(spark, sf_dir).collect())
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert tokyo == ny and len(tokyo) > 0


def test_semdedup_single_shuffle_into_grouped_pandas(spark, sf_dir):
    """r6 shape pin: SemDeDup's only shuffle over the corpus is the cell
    Exchange feeding the grouped-pandas dominance stage; the assignment
    (checkpointed, so upstream of this plan) never shuffles and no
    interpreted higher-order lambda scores pairs."""
    q = all_queries()["vector_semdedup"]
    plan = physical_plan(q.fn(spark, "/root/testdata/sf0.001"), "simple")
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange") == 1
    assert "aggregate(sequence" not in plan  # the old interpreted cosine


def test_token_budget_has_no_single_reducer_window(spark, sf_dir):
    """r6 shape pin: both token-budget variants avoid the unpartitioned
    WindowExec (exact: sharded prefix sum; bucketed: driver-side
    threshold from the histogram)."""
    for name in ("sample_token_budget", "sample_token_budget_bucketed"):
        plan = physical_plan(all_queries()[name].fn(spark, "/root/testdata/sf0.001"), "simple")
        assert "Window" not in plan, name


def test_lsh_verify_keeps_shingle_sets_packed(spark, sf_dir):
    """r6 shape pin: the Jaccard verify joins candidate pairs against
    per-doc PACKED sets (array_intersect) — no exploded candidate x
    shingle generator feeds a group-count."""
    q = all_queries()["dedup_lsh_verified_pairs"]
    plan = physical_plan(q.fn(spark, "/root/testdata/sf0.001"), "simple")
    assert "array_intersect" in plan
