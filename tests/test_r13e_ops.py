"""Round-13 wave-9 operator pins (anomaly consensus, dedup-aware
mixture, dedup impact stats, retriever agreement)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from dataingestionplayground_spark.session import get_spark

    return get_spark()


def test_anomaly_consensus_recomputes_from_members(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    z = {r["event_id"] for r in REGISTRY["events_anomaly_zscore"].fn(spark, SF).collect()}
    m = {r["event_id"] for r in REGISTRY["events_anomaly_mad"].fn(spark, SF).collect()}
    s = {r["event_id"] for r in
         REGISTRY["events_anomaly_seasonal_zscore"].fn(spark, SF).collect()}
    expect = {}
    for eid in z | m | s:
        votes = (eid in z) + (eid in m) + (eid in s)
        if votes >= 2:
            expect[eid] = (int(eid in z), int(eid in m), int(eid in s), votes)
    got = {r["event_id"]: (r["f_z"], r["f_mad"], r["f_seasonal"], r["votes"])
           for r in REGISTRY["events_anomaly_consensus"].fn(spark, SF).collect()}
    assert got == expect


def test_dedup_weighted_mixture_composes_and_normalizes(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    mix = {r["source"]: r for r in
           REGISTRY["sample_dedup_weighted_mixture"].fn(spark, SF).collect()}
    card = {r["source"]: r for r in
            REGISTRY["pipeline_data_card"].fn(spark, SF).collect()}
    assert set(mix) == set(card)
    for src, r in mix.items():
        assert r["raw_tokens"] == card[src]["total_tokens"]
        assert 0 < r["unique_tokens"] <= r["raw_tokens"]
    # both weight columns are distributions
    assert abs(sum(r["w_raw"] for r in mix.values()) - 1.0) < 1e-6
    assert abs(sum(r["w_dedup"] for r in mix.values()) - 1.0) < 1e-6
    # the exact integer-sqrt temperature weight recomputes
    isq = {s: math.floor(math.sqrt(r["raw_tokens"] * 1e6)) for s, r in mix.items()}
    t = sum(isq.values())
    for s, r in mix.items():
        assert r["w_raw"] == round(isq[s] / t, 9)


def test_dedup_impact_stats_composes_vocab_and_dedup(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    rows = {r["stage"]: r for r in
            REGISTRY["text_dedup_impact_stats"].fn(spark, SF).collect()}
    assert set(rows) == {"raw", "deduped"}
    raw, dd = rows["raw"], rows["deduped"]
    # raw totals equal the vocab-coverage query's corpus totals
    cov = REGISTRY["text_vocab_coverage"].fn(spark, SF).collect()[0]
    assert raw["vocab_size"] == cov["vocab_size"]
    assert raw["total_tokens"] == cov["total"]
    # deduped keeps exactly one doc per fingerprint group
    n_groups = REGISTRY["dedup_exact"].fn(spark, SF).count()
    assert dd["n_docs"] == n_groups
    assert dd["n_docs"] <= raw["n_docs"]
    assert dd["total_tokens"] <= raw["total_tokens"]
    assert dd["vocab_size"] <= raw["vocab_size"]


def test_retriever_agreement_recomputes_from_members(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    bm = {r["doc_id"]: r["rk"] for r in
          REGISTRY["text_bm25_topk"].fn(spark, SF).collect()}
    ql = {r["doc_id"]: r["rk"] for r in
          REGISTRY["retrieval_query_likelihood"].fn(spark, SF).collect()}
    got = REGISTRY["retrieval_bm25_ql_agreement"].fn(spark, SF).collect()[0]
    shared = set(bm) & set(ql)
    assert got["n_overlap"] == len(shared)
    assert got["overlap_at_10"] == round(len(shared) / 10.0, 6)
    assert got["total_rank_displacement"] == sum(
        abs(bm[d] - ql[d]) for d in shared
    )
    top_bm = [d for d, r in bm.items() if r == 1]
    top_ql = [d for d, r in ql.items() if r == 1]
    assert got["same_top1"] == (1 if top_bm == top_ql else 0)
