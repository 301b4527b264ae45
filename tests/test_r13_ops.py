"""Round-13 operator pins:

* the grouped drift decomposition must DEGENERATE to the ungrouped
  operator when every row carries one group (the generalization cannot
  change the math);
* dedup_snapshot_delta's status classes partition the delta and agree
  with the member operators they compose.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from dataingestionplayground_spark.session import get_spark

    return get_spark()


def test_drift_by_group_degenerates_to_ungrouped(spark):
    from dataingestionplayground_spark.operators.drift import (
        embedding_drift,
        embedding_drift_by_group,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    ref = e.filter(F.col("vec_id") % 2 == 0)
    cur = e.filter(F.col("vec_id") % 2 == 1)
    plain = {
        r["cell"]: (r["ref_n"], r["cur_n"], r["psi_term"], r["centroid_shift"])
        for r in embedding_drift(ref, cur, n_cells=8).collect()
    }
    one = F.lit("all").alias("source")
    grouped = {
        r["cell"]: (r["ref_n"], r["cur_n"], r["psi_term"], r["centroid_shift"])
        for r in embedding_drift_by_group(
            ref.select("vec_id", "embedding", one),
            cur.select("vec_id", "embedding", one),
            n_cells=8,
        ).collect()
    }
    assert grouped == plain and len(plain) > 0


def test_drift_by_group_psi_totals_are_per_group(spark):
    """Each group's smoothed p/q distributions must sum its OWN
    occupancy (not the corpus total): reconstruct one group's psi_term
    from its rows and the group totals."""
    import math

    from dataingestionplayground_spark.operators.drift import (
        embedding_drift_by_group,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").alias("vec_id"), "source"
    )
    j = e.join(d, "vec_id").select("vec_id", "embedding", "source")
    out = embedding_drift_by_group(
        j.filter(F.col("vec_id") % 2 == 0),
        j.filter(F.col("vec_id") % 2 == 1),
        n_cells=8,
    ).collect()
    assert len({r["source"] for r in out}) > 1
    by_group: dict = {}
    for r in out:
        by_group.setdefault(r["source"], []).append(r)
    for src, rows in by_group.items():
        ref_total = sum(r["ref_n"] for r in rows)
        cur_total = sum(r["cur_n"] for r in rows)
        for r in rows:
            p = (r["ref_n"] + 1) / (ref_total + 8)
            q = (r["cur_n"] + 1) / (cur_total + 8)
            want = round((p - q) * math.log(p / q), 6)
            assert abs(r["psi_term"] - want) <= 1e-6, (src, r)


def test_snapshot_delta_statuses_partition_and_compose(spark):
    from dataingestionplayground_spark.queries import all_queries

    out = all_queries()["dedup_snapshot_delta"].fn(spark, SF).collect()
    d = spark.read.parquet(f"{SF}/documents.parquet")
    n_delta = d.filter(F.col("doc_id") % 5 == 4).count()
    assert len(out) == n_delta > 0  # one row per B-only document
    for r in out:
        if r["status"] == "exact":
            assert r["is_exact"]
        elif r["status"] == "near_dup":
            assert not r["is_exact"] and r["best_jaccard"] >= 0.5
        else:
            assert r["status"] == "novel" and not r["is_exact"]
            assert r["best_jaccard"] is None or r["best_jaccard"] < 0.5
    # composition sanity: an exact-dup's fingerprint really is in A
    from dataingestionplayground_spark.functions import text as TX

    fps_a = {
        r["fp"]
        for r in d.filter(F.col("doc_id") % 5 != 4)
        .select(TX.fingerprint("text").alias("fp"))
        .distinct()
        .collect()
    }
    fp_delta = {
        r["doc_id"]: r["fp"]
        for r in d.filter(F.col("doc_id") % 5 == 4)
        .select("doc_id", TX.fingerprint("text").alias("fp"))
        .collect()
    }
    for r in out:
        assert r["is_exact"] == (fp_delta[r["doc_id"]] in fps_a)


# ---- wave-4 pins (BPE training, contamination, PQ distortion, ----
# ---- vocab coverage, per-source dup rate) ------------------------


def _bpe_python(vocab, n_merges=3):
    """Reference BPE trainer: freq-weighted adjacent-pair counts over the
    word-frequency table, ties (count desc, a asc, b asc), merge
    left-to-right non-overlapping — the same total order both engines
    implement via replace()."""
    from collections import Counter

    seqs = [(tuple(w), n) for w, n in vocab.items()]
    merges = []
    for _ in range(n_merges):
        cnt = Counter()
        for sy, n in seqs:
            for i in range(len(sy) - 1):
                cnt[(sy[i], sy[i + 1])] += n
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, a + b, c))
        out = []
        for sy, n in seqs:
            m, i = [], 0
            while i < len(sy):
                if i + 1 < len(sy) and sy[i] == a and sy[i + 1] == b:
                    m.append(a + b)
                    i += 2
                else:
                    m.append(sy[i])
                    i += 1
            out.append((tuple(m), n))
        seqs = out
    return merges


def test_bpe_train_merges_matches_python_reimplementation(spark):
    import re
    from collections import Counter

    from dataingestionplayground_spark.queries import all_queries

    out = {
        r["step"]: r
        for r in all_queries()["text_bpe_train_merges"].fn(spark, SF).collect()
    }
    assert sorted(out) == [1, 2, 3]
    d = spark.read.parquet(f"{SF}/documents.parquet")
    vocab: Counter = Counter()
    for row in d.select("text").collect():
        for w in row["text"].lower().split():
            if re.fullmatch("[a-z]+", w):
                vocab[w] += 1
    for step, (a, b, merged, c) in enumerate(_bpe_python(vocab), start=1):
        r = out[step]
        assert (r["sym_a"], r["sym_b"], r["merged"], r["pair_count"]) == (
            a,
            b,
            merged,
            c,
        ), step
    # merging the max pair can only create pairs bounded by its count
    assert out[1]["pair_count"] >= out[2]["pair_count"] >= out[3]["pair_count"]


def test_contamination_report_python_recompute(spark):
    from dataingestionplayground_spark.queries import all_queries

    out = {
        r["doc_id"]: r
        for r in all_queries()["text_contamination_report"].fn(spark, SF).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()

    def grams(text):
        tk = [t for t in text.split() if t]
        return {" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)}

    train = [(r["doc_id"], grams(r["text"])) for r in docs if r["doc_id"] % 25 != 0]
    train_grams = set().union(*(g for _, g in train)) if train else set()
    n_eval = 0
    for r in docs:
        if r["doc_id"] % 25 != 0:
            continue
        g = grams(r["text"])
        if not g:
            assert r["doc_id"] not in out  # no distinct grams -> no row
            continue
        n_eval += 1
        row = out[r["doc_id"]]
        hit = len(g & train_grams)
        assert row["n_grams"] == len(g)
        assert row["n_hit"] == hit
        assert abs(row["contamination_rate"] - round(hit / len(g), 6)) <= 1e-9
        assert row["n_train_docs"] == sum(1 for _, tg in train if g & tg)
    assert n_eval == len(out) > 0


def test_pq_distortion_matches_numpy(spark):
    import numpy as np

    from dataingestionplayground_spark.queries import all_queries
    from dataingestionplayground_spark.queries.vectorq import (
        _PQ_DSUB,
        _PQ_K,
        _PQ_M,
    )

    out = {
        r["subspace"]: r
        for r in all_queries()["vector_pq_distortion"].fn(spark, SF).collect()
    }
    assert sorted(out) == list(range(_PQ_M))
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    seeds = X[:_PQ_K]
    for s in range(_PQ_M):
        sub = X[:, s * _PQ_DSUB : (s + 1) * _PQ_DSUB]
        cents = seeds[:, s * _PQ_DSUB : (s + 1) * _PQ_DSUB]
        d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).min(axis=1)
        r = out[s]
        assert r["n_vecs"] == len(X)
        assert abs(r["mean_sq_err"] - np.round(d2, 6).mean()) <= 1e-5
        assert abs(r["max_sq_err"] - round(float(d2.max()), 6)) <= 1e-5
        assert 0.0 <= r["mean_sq_err"] <= r["max_sq_err"]


def test_vocab_coverage_python_recompute(spark):
    from collections import Counter

    from dataingestionplayground_spark.queries import all_queries

    out = {
        r["k"]: r for r in all_queries()["text_vocab_coverage"].fn(spark, SF).collect()
    }
    assert sorted(out) == [10, 100, 1000]
    d = spark.read.parquet(f"{SF}/documents.parquet")
    vocab: Counter = Counter()
    for row in d.select("text").collect():
        for w in row["text"].lower().split():
            vocab[w] += 1
    ranked = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(vocab.values())
    for k in (10, 100, 1000):
        covered = sum(c for _, c in ranked[:k])
        r = out[k]
        assert r["vocab_size"] == len(vocab) and r["total"] == total
        assert r["covered"] == covered
        assert abs(r["coverage"] - round(covered / total, 6)) <= 1e-9
    # curve is monotone non-decreasing in k
    assert out[10]["covered"] <= out[100]["covered"] <= out[1000]["covered"]


def test_dedup_rate_by_source_composes_with_fingerprint(spark):
    from dataingestionplayground_spark.functions import text as TX
    from dataingestionplayground_spark.queries import all_queries

    out = {
        r["source"]: r
        for r in all_queries()["dedup_rate_by_source"].fn(spark, SF).collect()
    }
    d = spark.read.parquet(f"{SF}/documents.parquet")
    want = {
        r["source"]: (r["n"], r["u"])
        for r in d.select("source", TX.fingerprint("text").alias("f"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("f").alias("u"),
        )
        .collect()
    }
    assert set(out) == set(want) and len(out) > 1
    for src, (n, u) in want.items():
        r = out[src]
        assert (r["n_docs"], r["n_unique"], r["n_dups"]) == (n, u, n - u)
        assert abs(r["dup_rate"] - round((n - u) / n, 6)) <= 1e-9
