"""Semantics tests for the round-10 continuation operators: incremental
batch-vs-corpus LSH screening, the forward as-of tolerance join, the
in-row hierarchy rollup, and Poisson PPS inclusion probabilities. The
DuckDB oracle pins SQL parity; these pin the MEANING on constructed
inputs where the expected answer is derivable by hand.
"""

from __future__ import annotations


from dataingestionplayground_spark.operators.asof import asof_join
from dataingestionplayground_spark.operators.dedup import (
    minhash_lsh_pairs_between,
)
from dataingestionplayground_spark.queries import all_queries

QS = all_queries()

_LOREM = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm stove and the rain falls softly on the old tin roof "
    "of the quiet house by the river bend where children play"
)


def test_incremental_lsh_finds_planted_copy(spark):
    # corpus holds the original; the arriving batch holds a verbatim
    # copy and an unrelated document — banding must pair the copy with
    # the original and must not pair the unrelated doc with anything.
    old = spark.createDataFrame(
        [(1, _LOREM), (2, "completely different text about spark shuffles "
                          "and broadcast joins in distributed query engines "
                          "running columnar scans over parquet files today")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, _LOREM),
         (101, "unrelated gibberish zeta omega kappa lambda iota theta "
               "epsilon delta gamma beta alpha sigma tau upsilon phi chi "
               "psi words never seen anywhere else in this tiny corpus")],
        "doc_id long, text string",
    )
    pairs = {
        (r["new_id"], r["old_id"])
        for r in minhash_lsh_pairs_between(new, old, "doc_id", "text").collect()
    }
    assert (100, 1) in pairs
    assert all(n != 101 for n, _ in pairs)


def test_incremental_lsh_is_asymmetric(spark):
    # old-old and new-new pairs must NOT appear: the whole point of the
    # between-form is that the corpus is never re-paired with itself.
    dup = _LOREM
    old = spark.createDataFrame(
        [(1, dup), (2, dup)], "doc_id long, text string"
    )
    new = spark.createDataFrame([(100, dup)], "doc_id long, text string")
    pairs = {
        (r["new_id"], r["old_id"])
        for r in minhash_lsh_pairs_between(new, old, "doc_id", "text").collect()
    }
    assert pairs == {(100, 1), (100, 2)}


def test_forward_asof_tolerance_semantics(spark):
    # left row L at t=0: nearest forward right row is at t=100 (kept,
    # within tol applied by caller); left row M at t=0 with nearest
    # right at t=5000 (caller's 1000-unit tolerance nulls it); left
    # row N with no forward right row at all.
    left = spark.createDataFrame(
        [("L", 0.0), ("M", 0.0), ("N", 9000.0)], "k string, lt double"
    )
    right = spark.createDataFrame(
        [("L", 100.0, 11), ("L", 200.0, 12), ("M", 5000.0, 21)],
        "k string, rt double, rid long",
    )
    out = {
        r["k"]: (r["rid"], r["rt"])
        for r in asof_join(
            left, right, on=["k"], left_ts="lt", right_ts="rt",
            value_cols=["rid", "rt"], direction="forward", tie_col="rid",
        ).collect()
    }
    assert out["L"] == (11, 100.0)      # earliest forward match, not 12
    assert out["M"] == (21, 5000.0)     # matched; tolerance is caller policy
    assert out["N"] == (None, None)     # no forward row


def test_hierarchy_rollup_node_sums(spark, sf_dir):
    rows = QS["hierarchy_rollup_ancestors"].fn(spark, sf_dir).collect()
    got = {r["node"]: (r["n_desc"], r["total_price"]) for r in rows}
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_retailprice"
    ).collect()
    # independent re-derivation: brute-force every ancestor chain
    from collections import defaultdict

    n = defaultdict(int)
    s = defaultdict(float)
    for r in part:
        k = r["p_partkey"]
        while k > 0:
            n[k] += 1
            s[k] += float(r["p_retailprice"])
            k //= 10
    assert set(got) == set(n)
    for node in n:
        assert got[node][0] == n[node]
        assert abs(got[node][1] - s[node]) < 1e-4


def test_poisson_inclusion_calibration(spark, sf_dir):
    rows = QS["sample_poisson_inclusion"].fn(spark, sf_dir).collect()
    # expected sample size = sum of inclusion probabilities = target
    # whenever no document hits the pi=1 cap (each capped doc can only
    # LOWER the expectation, never raise it).
    total_pi = sum(r["pi"] for r in rows)  # each pi rounded to 6dp
    assert total_pi <= 100 + len(rows) * 5e-7
    if all(r["pi"] < 1.0 for r in rows):
        assert abs(total_pi - 100) < 0.01
    for r in rows:
        assert 0.0 < r["pi"] <= 1.0
        # ht_weight is 1/pi from the UNROUNDED pi; reconstructing from
        # the 6dp-rounded pi is off by up to ~5e-7 / pi^2
        assert abs(r["ht_weight"] - 1.0 / r["pi"]) < 5e-7 / r["pi"] ** 2 + 1e-6


def test_km_survival_invariants(spark, sf_dir):
    rows = sorted(
        QS["events_survival_km"].fn(spark, sf_dir).collect(),
        key=lambda r: r["duration_days"],
    )
    assert rows
    # at-risk pool and survival are both non-increasing in duration;
    # survival stays a probability
    for a, b in zip(rows, rows[1:]):
        assert a["n_at_risk"] >= b["n_at_risk"]
        assert a["survival"] >= b["survival"] - 1e-9
    for r in rows:
        assert 0.0 <= r["survival"] <= 1.0
        assert 0 <= r["n_churned"] <= r["n_at_risk"]
