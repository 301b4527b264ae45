"""Round-13 wave-7 operator pins (cross-source near-dup matrix,
language purity, new-vs-returning, session stats, image hamming
sweep)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from dataingestionplayground_spark.session import get_spark

    return get_spark()


def test_cross_source_matrix_partitions_cross_source_candidates(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    mat = REGISTRY["dedup_cross_source_matrix"].fn(spark, SF).collect()
    cand = REGISTRY["dedup_minhash_lsh_pairs"].fn(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "source")
    s_a = docs.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa"))
    s_b = docs.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb"))
    n_cross = (
        cand.join(s_a, "id_a").join(s_b, "id_b")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert sum(r["n_candidate_pairs"] for r in mat) == n_cross
    for r in mat:
        assert r["source_a"] < r["source_b"]
        assert 0 <= r["n_verified_pairs"] <= r["n_candidate_pairs"]


def test_language_purity_composes_language_id(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    pur = {r["source"]: r for r in
           REGISTRY["text_language_purity_by_source"].fn(spark, SF).collect()}
    pred = {r["doc_id"]: r["is_match"] for r in
            REGISTRY["text_language_id"].fn(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    by_src: dict[str, list[int]] = {}
    for d in docs:
        by_src.setdefault(d["source"], []).append(pred[d["doc_id"]])
    assert set(pur) == set(by_src)
    for src, flags in by_src.items():
        assert pur[src]["n_docs"] == len(flags)
        assert pur[src]["n_match"] == sum(flags)
        assert pur[src]["purity"] == round(sum(flags) / len(flags), 6)


def test_new_vs_returning_matches_python_reimplementation(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    evs = spark.read.parquet(f"{SF}/events.parquet").collect()
    activity = {(e["user_id"], int(e["ts"].timestamp() // 86400)) for e in evs}
    first = {}
    for u, d in activity:
        if u not in first or d < first[u]:
            first[u] = d
    got = {r["day"]: r for r in
           REGISTRY["events_new_vs_returning"].fn(spark, SF).collect()}
    days = {d for (_, d) in activity}
    assert set(got) == days
    for d in days:
        active = [u for (u, dd) in activity if dd == d]
        new = [u for u in active if first[u] == d]
        assert got[d]["n_active"] == len(active)
        assert got[d]["n_new"] == len(new)
        assert got[d]["n_returning"] == len(active) - len(new)
    # every user is new exactly once across all days
    assert sum(r["n_new"] for r in got.values()) == len(first)


def test_session_stats_composes_sessionize(spark):
    from dataingestionplayground_spark.operators.sessionize import sessionize
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    stats = REGISTRY["events_session_stats"].fn(spark, SF).collect()[0]
    e = spark.read.parquet(f"{SF}/events.parquet")
    per = (
        sessionize(e, "user_id", "ts", gap_seconds=1800)
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n_sessions = len(per)
    bounces = sum(1 for r in per if r["n"] == 1)
    total_events = sum(r["n"] for r in per)
    assert stats["n_sessions"] == n_sessions
    assert stats["bounce_rate"] == round(bounces / n_sessions, 6)
    assert stats["avg_events"] == round(total_events / n_sessions, 6)
    assert 0.0 <= stats["p50_dur_s"] <= stats["p90_dur_s"]
    # sessionize sanity: as many sessions as events from the count view
    assert total_events == e.count()


def test_hamming_sweep_monotone_and_caps_at_shipped_bound(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    rows = {r["threshold"]: r for r in
            REGISTRY["multimodal_hamming_threshold_sweep"].fn(spark, SF).collect()}
    assert set(rows) == {0, 2, 4, 6}
    for lo, hi in [(0, 2), (2, 4), (4, 6)]:
        assert rows[lo]["n_pairs"] <= rows[hi]["n_pairs"]
        assert rows[lo]["n_images"] <= rows[hi]["n_images"]
    # the radius-6 point IS the shipped multimodal_ahash_pairs output
    assert rows[6]["n_pairs"] == REGISTRY["multimodal_ahash_pairs"].fn(spark, SF).count()


def test_signal_correlation_matrix_matches_numpy(spark):
    import numpy as np

    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    q = {r["doc_id"]: round(r["quality"], 6)
         for r in REGISTRY["text_quality_score"].fn(spark, SF).collect()}
    p = {r["doc_id"]: r["ppl"]
         for r in REGISTRY["text_unigram_perplexity"].fn(spark, SF).collect()}
    e = {r["doc_id"]: r["entropy"]
         for r in REGISTRY["text_char_entropy"].fn(spark, SF).collect()}
    g = {r["doc_id"]: r["mean_word_len"]
         for r in REGISTRY["text_gopher_quality_rules"].fn(spark, SF).collect()}
    ids = sorted(set(q) & set(p) & set(e) & set(g))
    sig = {"quality": q, "ppl": p, "entropy": e, "mean_word_len": g}
    got = {(r["sig_a"], r["sig_b"]): r
           for r in REGISTRY["text_signal_correlation_matrix"].fn(spark, SF).collect()}
    assert len(got) == 6
    for (a, b), r in got.items():
        assert r["n"] == len(ids)
        xa = np.array([sig[a][i] for i in ids])
        xb = np.array([sig[b][i] for i in ids])
        expect = float(np.corrcoef(xa, xb)[0, 1])
        # numpy uses a different (mean-centered) formula — agree to 1e-9
        assert abs(r["pearson"] - expect) < 1e-6
        assert -1.0 <= r["pearson"] <= 1.0


def test_semantic_sweep_monotone_and_matches_embedding_cosine(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    rows = {r["threshold"]: r for r in
            REGISTRY["dedup_semantic_threshold_sweep"].fn(spark, SF).collect()}
    assert set(rows) == {0.9, 0.95, 0.99}
    assert rows[0.99]["n_pairs"] <= rows[0.95]["n_pairs"] <= rows[0.9]["n_pairs"]
    assert rows[0.99]["n_vectors"] <= rows[0.95]["n_vectors"] <= rows[0.9]["n_vectors"]
    # the 0.95 point counts the SHIPPED dedup_embedding_cosine pairs
    # (that query compares the unrounded dot; the sweep compares the
    # 6dp round — they can only differ if a dot lands within 5e-7 of
    # the threshold, so allow that single-pair epsilon class)
    shipped = REGISTRY["dedup_embedding_cosine"].fn(spark, SF).count()
    assert abs(rows[0.95]["n_pairs"] - shipped) <= 1
