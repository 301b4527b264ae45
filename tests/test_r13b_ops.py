"""Round-13 wave-5 operator pins.

Each new registry query gets either a full Python/numpy reimplementation
(conversion lag, ccnet buckets) or a compositional invariant against the
member queries it builds on (data card vs dedup_rate_by_source, MRR vs
nDCG's relevance frame, nprobe sweep vs vector_ivf_ann) — the
test_r13_ops convention.
"""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from dataingestionplayground_spark.session import get_spark

    return get_spark()


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").collect()


def test_ccnet_buckets_match_python_reimplementation(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    rows = _docs(spark)
    toks = {r["doc_id"]: [w for w in re.split(r"\s+", r["text"].lower()) if w] for r in rows}
    lang = {r["doc_id"]: r["lang"] for r in rows}
    vocab: dict[str, int] = {}
    for ws in toks.values():
        for w in ws:
            vocab[w] = vocab.get(w, 0) + 1
    n = sum(vocab.values())

    def dec6(x):
        return round(x, 6)

    ppl = {}
    for d, ws in toks.items():
        if not ws:
            continue
        s = sum(dec6(math.log(n) - math.log(vocab[w])) for w in ws)
        ppl[d] = dec6(math.exp(round(s, 6) / len(ws)))

    def quantile(vals, p):
        vals = sorted(vals)
        idx = (len(vals) - 1) * p
        lo, hi = int(math.floor(idx)), int(math.ceil(idx))
        return vals[lo] + (idx - lo) * (vals[hi] - vals[lo])

    expected: dict[tuple, list] = {}
    langs = sorted({lg for lg in lang.values()})
    for lg in langs:
        ids = [d for d in ppl if lang[d] == lg]
        if not ids:
            continue
        b1 = dec6(quantile([ppl[d] for d in ids], 1.0 / 3.0))
        b2 = dec6(quantile([ppl[d] for d in ids], 2.0 / 3.0))
        for d in ids:
            b = "head" if ppl[d] <= b1 else ("middle" if ppl[d] <= b2 else "tail")
            expected.setdefault((lg, b), []).append(d)

    got = {
        (r["lang"], r["bucket"]): (r["n_docs"], r["total_tokens"])
        for r in REGISTRY["text_ccnet_lm_buckets"].fn(spark, SF).collect()
    }
    exp = {
        k: (len(v), sum(len(toks[d]) for d in v)) for k, v in expected.items()
    }
    assert got == exp


def test_minhash_calibration_consistent_with_lsh_pairs(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    cal = REGISTRY["dedup_minhash_calibration"].fn(spark, SF).collect()
    n_pairs_total = sum(r["n_pairs"] for r in cal)
    n_cand = REGISTRY["dedup_minhash_lsh_pairs"].fn(spark, SF).count()
    # every candidate pair lands in exactly one match-count bin
    assert n_pairs_total == n_cand and n_cand > 0
    for r in cal:
        # banded candidates (2 rows/band) share at least one full band
        assert 2 <= r["n_match"] <= 8
        assert 0.0 <= r["avg_true_jaccard"] <= 1.0
        # the estimator error is bounded by 1 by construction
        assert 0.0 <= r["avg_abs_err"] <= 1.0


def test_data_card_composes_member_signals(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    card = {r["source"]: r for r in REGISTRY["pipeline_data_card"].fn(spark, SF).collect()}
    dup = {
        r["source"]: r
        for r in REGISTRY["dedup_rate_by_source"].fn(spark, SF).collect()
    }
    assert set(card) == set(dup)
    for src, r in card.items():
        assert r["n_docs"] == dup[src]["n_docs"]
        assert r["dup_rate"] == dup[src]["dup_rate"]
    # token shares partition the corpus
    assert abs(sum(r["token_share"] for r in card.values()) - 1.0) < 1e-4
    rows = _docs(spark)
    by_src: dict[str, list] = {}
    for d in rows:
        by_src.setdefault(d["source"], []).append(d)
    for src, ds in by_src.items():
        langs = [d["lang"] for d in ds]
        counts = {lg: langs.count(lg) for lg in set(langs)}
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        assert card[src]["top_lang"] == top
        assert card[src]["n_langs"] == len(counts)
        assert card[src]["total_tokens"] == sum(
            len([w for w in re.split(r"\s+", d["text"]) if w]) for d in ds
        )


def test_mrr_recall_agrees_with_ndcg_relevance(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    mrr = REGISTRY["retrieval_mrr_recall"].fn(spark, SF).collect()[0]
    ndcg = REGISTRY["retrieval_eval_ndcg"].fn(spark, SF).collect()[0]
    assert mrr["n_relevant"] == ndcg["n_relevant"]
    if mrr["n_relevant"] > 0:
        assert mrr["recall_at_10"] == round(
            mrr["n_rel_top"] / mrr["n_relevant"], 6
        )
    if mrr["first_rel_rank"] > 0:
        assert mrr["mrr"] == round(1.0 / mrr["first_rel_rank"], 6)
        assert mrr["hit_at_1"] == (1 if mrr["first_rel_rank"] == 1 else 0)
    else:
        assert mrr["mrr"] == 0.0 and mrr["n_rel_top"] == 0


def test_conversion_lag_matches_python_reimplementation(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    evs = spark.read.parquet(f"{SF}/events.parquet").collect()
    sig: dict[int, object] = {}
    for e in evs:
        if e["event_type"] == "signup":
            if e["user_id"] not in sig or e["ts"] < sig[e["user_id"]]:
                sig[e["user_id"]] = e["ts"]
    buy: dict[int, object] = {}
    for e in evs:
        u = e["user_id"]
        if e["event_type"] == "purchase" and u in sig and e["ts"] > sig[u]:
            if u not in buy or e["ts"] < buy[u]:
                buy[u] = e["ts"]
    lags = sorted(
        int((buy[u] - sig[u]).total_seconds() * 1_000_000) for u in buy
    )

    def quantile(p):
        idx = (len(lags) - 1) * p
        lo, hi = int(math.floor(idx)), int(math.ceil(idx))
        return lags[lo] + (idx - lo) * (lags[hi] - lags[lo])

    got = REGISTRY["events_conversion_lag"].fn(spark, SF).collect()[0]
    assert got["n_signup_users"] == len(sig)
    assert got["n_converted"] == len(lags)
    assert got["p50_s"] == round(quantile(0.5) / 1e6, 6)
    assert got["p90_s"] == round(quantile(0.9) / 1e6, 6)
    assert got["avg_lag_s"] == round(
        float(sum(lags)) / len(lags) / 1e6, 6
    )


def test_nprobe_sweep_monotone_and_consistent_with_shipped_ivf(spark):
    from dataingestionplayground_spark.operators.similarity import (
        ivf_ann,
        knn_brute_force,
    )
    from dataingestionplayground_spark.queries import all_queries
    from dataingestionplayground_spark.queries.vectorq import _queries_df

    REGISTRY = all_queries()
    rows = REGISTRY["vector_ivf_nprobe_sweep"].fn(spark, SF).collect()
    by_q: dict[int, dict[int, float]] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["n_probe"]] = r["recall_at_10"]
    assert len(by_q) == 5
    for q, recs in by_q.items():
        assert set(recs) == {1, 2, 4}
        # probing more cells can only add candidates -> recall monotone
        assert recs[1] <= recs[2] <= recs[4]
    # the p=4 leg grades EXACTLY the shipped vector_ivf_ann configuration
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = _queries_df(spark, SF)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in knn_brute_force(e, q, k=10).filter(F.col("rank") <= 10).collect()
    }
    ivf4 = {
        (r["query_id"], r["vec_id"])
        for r in ivf_ann(e, q, k=10, n_centroids=16, n_probe=4)
        .filter(F.col("rank") <= 10)
        .collect()
    }
    for qid, recs in by_q.items():
        hits = sum(1 for (a, b) in exact if a == qid and (a, b) in ivf4)
        assert recs[4] == round(hits / 10.0, 6)


def test_nprobe_sweep_oracle_substitution_point_unique():
    # the sweep's oracle parameterizes the REGISTERED IVF oracle by
    # replacing its single "crk <= 4" probe bound; if a refactor of
    # vector_ivf_ann's oracle changes that spelling, fail HERE with a
    # clear message instead of silently grading a different index
    import dataingestionplayground_spark.queries as Q

    Q.all_queries()
    ivf = Q.REGISTRY["vector_ivf_ann"].oracle
    assert ivf.count("crk <= 4") == 1, (
        "vector_ivf_nprobe_sweep substitutes the probe bound textually; "
        "update _nprobe_sweep_oracle alongside this oracle"
    )
    assert ivf.count("crk = 1") == 1
