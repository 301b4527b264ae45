"""Round-13 wave-6 operator pins (threshold sweep, quality-dup
crosstab, stickiness, PQ codebook-size curve)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from dataingestionplayground_spark.session import get_spark

    return get_spark()


def test_threshold_sweep_monotone_and_consistent_with_verified_pairs(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    rows = {
        r["threshold"]: r
        for r in REGISTRY["dedup_threshold_sweep"].fn(spark, SF).collect()
    }
    assert set(rows) == {0.5, 0.7, 0.8, 0.9}
    # tightening the threshold can only remove pairs/docs
    for lo, hi in [(0.5, 0.7), (0.7, 0.8), (0.8, 0.9)]:
        assert rows[hi]["n_pairs"] <= rows[lo]["n_pairs"]
        assert rows[hi]["n_docs"] <= rows[lo]["n_docs"]
    # the 0.5 operating point IS dedup_lsh_verified_pairs' keep rule:
    # same banding, same exact-Jaccard bar
    verified = (
        REGISTRY["dedup_lsh_verified_pairs"].fn(spark, SF)
        .filter(F.col("jaccard") >= 0.5)
        .count()
    )
    assert rows[0.5]["n_pairs"] == verified
    n_corpus = spark.read.parquet(f"{SF}/documents.parquet").count()
    for r in rows.values():
        assert r["frac_docs"] == round(r["n_docs"] / n_corpus, 6)


def test_quality_dup_crosstab_partitions_scored_docs(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    cells = REGISTRY["pipeline_quality_dup_crosstab"].fn(spark, SF).collect()
    scored = REGISTRY["text_quality_score"].fn(spark, SF).count()
    assert sum(r["n_docs"] for r in cells) == scored
    # per-class shares sum to 1
    by_class: dict[bool, float] = {}
    for r in cells:
        by_class[r["is_dup"]] = by_class.get(r["is_dup"], 0.0) + r["frac_of_class"]
    for share in by_class.values():
        assert abs(share - 1.0) < 1e-5
    # dup-class doc count is bounded by the exact-dedup fingerprint
    # groups (dedup_exact counts ALL docs including zero-token ones;
    # the crosstab only scores n_toks > 0 docs, so <=)
    dup_docs = sum(r["n_docs"] for r in cells if r["is_dup"])
    exact = REGISTRY["dedup_exact"].fn(spark, SF).collect()
    assert dup_docs <= sum(r["n_dups"] for r in exact if r["n_dups"] > 1)


def test_stickiness_matches_python_reimplementation(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    evs = spark.read.parquet(f"{SF}/events.parquet").collect()
    activity = {(e["user_id"], int(e["ts"].timestamp() // 86400)) for e in evs}
    days = sorted({d for (_, d) in activity})
    dau = {d: sum(1 for (_, dd) in activity if dd == d) for d in days}
    wau = {
        d: len({u for (u, dd) in activity if d - 6 <= dd <= d}) for d in days
    }
    got = {r["day"]: r for r in REGISTRY["events_stickiness"].fn(spark, SF).collect()}
    assert set(got) == set(days)
    for d in days:
        assert got[d]["dau"] == dau[d]
        assert got[d]["wau"] == wau[d]
        assert got[d]["stickiness"] == round(dau[d] / wau[d], 6)
        assert got[d]["dau"] <= got[d]["wau"]


def test_pq_k_sweep_monotone_in_codebook_size(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    rows = REGISTRY["vector_pq_k_sweep"].fn(spark, SF).collect()
    by_sub: dict[int, dict[int, tuple]] = {}
    for r in rows:
        by_sub.setdefault(r["subspace"], {})[r["k"]] = (
            r["mean_sq_err"],
            r["max_sq_err"],
        )
    assert set(by_sub) == {0, 1, 2, 3}
    for sub, ks in by_sub.items():
        assert set(ks) == {4, 8, 16}
        # seeded codebooks are nested (lowest-id k vectors), so the
        # min-distance — and both distortion stats — cannot increase
        assert ks[16][0] <= ks[8][0] <= ks[4][0]
        assert ks[16][1] <= ks[8][1] <= ks[4][1]
    # the k=8 leg IS vector_pq_distortion (same frozen configuration)
    base = {
        r["subspace"]: (r["mean_sq_err"], r["max_sq_err"])
        for r in REGISTRY["vector_pq_distortion"].fn(spark, SF).collect()
    }
    for sub in by_sub:
        assert by_sub[sub][8] == base[sub]
