"""Semantics tests for the round-10 operators: ACF, Markov stationary
distribution, weighted reservoir sampling, k-center coreset, and the
nDCG retrieval eval. The DuckDB oracle already pins SQL parity; these
pin the MEANING against independent plain-Python re-derivations or the
algorithms' defining invariants.
"""

from __future__ import annotations

import math
from collections import defaultdict

from dataingestionplayground_spark.queries import all_queries

QS = all_queries()


def test_autocorrelation_matches_python_acf(spark, sf_dir):
    rows = QS["events_autocorrelation"].fn(spark, sf_dir).collect()
    from dataingestionplayground_spark.session import load_table

    raw = (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            "event_type",
            "cast(floor(cast(cast(ts as timestamp) as double) / 86400) as long) as day",
        )
        .collect()
    )
    counts = defaultdict(int)
    for r in raw:
        counts[(r["event_type"], r["day"])] += 1
    days = [d for _, d in counts]
    lo, hi = min(days), max(days)
    types = {t for t, _ in counts}
    for typ in types:
        y = [counts.get((typ, d), 0) for d in range(lo, hi + 1)]
        mu = sum(y) / len(y)
        dv = [v - mu for v in y]
        ss = sum(round(d * d, 6) for d in dv)
        for lag in range(1, 8):
            sp = sum(round(dv[i] * dv[i - lag], 6) for i in range(lag, len(dv)))
            want = round(sp / ss, 6)
            got = [
                r["acf"] for r in rows if r["event_type"] == typ and r["lag"] == lag
            ]
            assert len(got) == 1
            assert math.isclose(got[0], want, abs_tol=2e-6), (typ, lag, got[0], want)
            assert abs(got[0]) <= 1.000001  # Cauchy-Schwarz bound


def test_markov_stationary_is_a_distribution_and_respects_counts(spark, sf_dir):
    rows = QS["events_markov_stationary"].fn(spark, sf_dir).collect()
    assert rows, "no states"
    total = sum(r["pi"] for r in rows)
    assert math.isclose(total, 1.0, abs_tol=1e-4)  # renormalized each iter
    assert all(0.0 <= r["pi"] <= 1.0 for r in rows)
    assert all(r["n_out"] > 0 for r in rows)  # closed state set
    assert len({r["event_type"] for r in rows}) == len(rows)


def test_weighted_reservoir_prefers_heavy_docs(spark, sf_dir):
    out = QS["sample_reservoir_weighted"].fn(spark, sf_dir).collect()
    assert len(out) == 100
    assert len({r["doc_id"] for r in out}) == 100  # without replacement
    # keys descend with rank (ln u / w is negative; larger = better)
    keys = [r["res_key"] for r in sorted(out, key=lambda r: r["rk"])]
    assert all(a >= b for a, b in zip(keys, keys[1:]))
    assert all(k <= 0.0 for k in keys)
    # A-ES inclusion is weight-biased: the sampled mean n_chars must
    # exceed the corpus mean (deterministic hash, fixed data -> stable)
    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    mean_all = sum(r["n_chars"] for r in corpus) / len(corpus)
    mean_sample = sum(r["n_chars"] for r in out) / len(out)
    assert mean_sample > mean_all


def test_kcenter_gaps_shrink_and_radius_covers(spark, sf_dir):
    rows = sorted(
        QS["vector_coreset_kcenter"].fn(spark, sf_dir).collect(),
        key=lambda r: r["sel_order"],
    )
    assert [r["sel_order"] for r in rows] == list(range(1, 9))
    assert len({r["vec_id"] for r in rows}) == 8
    gaps = [r["gap"] for r in rows[1:]]  # seed gap is 0 by definition
    # greedy farthest-point: each new center's gap can never exceed the
    # previous one (it maximized the SAME min-distance function, which
    # only shrinks as centers are added)
    assert all(a >= b for a, b in zip(gaps, gaps[1:])), gaps
    radius = rows[0]["coverage_radius"]
    # the next pick after the k-th would be <= the last gap; the final
    # coverage radius IS that next gap, so it cannot exceed gap_k
    assert 0.0 <= radius <= gaps[-1] + 1e-6


def test_ndcg_bounds_and_components(spark, sf_dir):
    row = QS["retrieval_eval_ndcg"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= row["ndcg10"] <= 1.000001
    assert row["idcg10"] >= row["dcg10"] >= 0.0
    assert 0.0 <= row["precision10"] <= 1.0
    assert row["n_relevant"] >= 0
    # the fixed corpus words occur at every SF: the eval must be dense
    assert row["n_relevant"] > 0 and row["idcg10"] > 0.0
