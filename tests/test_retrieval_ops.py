"""Crafted-input tests for the retrieval-surface queries (retrievalq):
BM25 score sanity, global first-occurrence segment dedup semantics,
containment vs jaccard on subset duplicates, and MMR parity against an
independent NumPy reference over the full corpus.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataingestionplayground_spark.queries import all_queries

QS = all_queries()


# ---------------------------------------------------------------- BM25


def test_bm25_matches_hand_computation(spark, sf_dir):
    """Recompute BM25 in plain Python from the same tokenization and
    compare the engine's top-10 exactly (ids, scores, ranks)."""
    from dataingestionplayground_spark.queries.retrievalq import _B, _BM25_TERMS, _K1

    docs = {
        r["doc_id"]: r["text"].split()
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    n_docs = len(docs)
    avgdl = sum(len(tk) for tk in docs.values()) / n_docs
    df = {
        term: sum(1 for tk in docs.values() if term in tk) for term in _BM25_TERMS
    }
    scores = {}
    for doc_id, tk in docs.items():
        total = 0.0
        matched = False
        for term in _BM25_TERMS:
            tf = float(tk.count(term))
            if tf == 0:
                continue
            matched = True
            idf = math.log(1.0 + (n_docs - df[term] + 0.5) / (df[term] + 0.5))
            total += idf * tf * (_K1 + 1.0) / (tf + _K1 * (1.0 - _B + _B * len(tk) / avgdl))
        if matched:
            scores[doc_id] = round(total, 6)
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = [
        (r["doc_id"], r["score"], r["rk"])
        for r in QS["text_bm25_topk"].fn(spark, sf_dir).orderBy("rk").collect()
    ]
    assert got == [(d, s, i + 1) for i, (d, s) in enumerate(expect)]


# ------------------------------------------- global first-segment dedup


def _first_seg_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_global_first_segment_keeps_exactly_one_copy(spark, sf_dir, tmp_path):
    # 12-token repeated block shared by three docs, plus unique tails.
    blk = " ".join(f"w{i}" for i in range(12))
    uniq = lambda tag: " ".join(f"{tag}{i}" for i in range(12))
    rows = [
        (1, f"{blk} {uniq('a')}"),
        (2, f"{blk} {uniq('b')}"),
        (3, f"{uniq('c')} {blk}"),
    ]
    d = _first_seg_df(spark, rows)
    d.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in QS["dedup_global_first_segment"].fn(spark, str(tmp_path)).collect()
    }
    # doc 1 holds the first (doc_id, pos) occurrence -> keeps both segs;
    # docs 2 and 3 lose only the shared block.
    assert (out[1]["n_segs_total"], out[1]["n_segs_kept"]) == (2, 2)
    assert (out[2]["n_segs_total"], out[2]["n_segs_kept"]) == (2, 1)
    assert (out[3]["n_segs_total"], out[3]["n_segs_kept"]) == (2, 1)
    assert blk in out[1]["clean_text"]
    assert blk not in out[2]["clean_text"] and blk not in out[3]["clean_text"]
    assert out[2]["clean_text"] == uniq("b")
    assert out[3]["clean_text"] == uniq("c")


def test_global_first_segment_totals_match_sum_of_group_sizes(spark, sf_dir):
    out = QS["dedup_global_first_segment"].fn(spark, sf_dir)
    agg = out.agg(
        F.sum("n_segs_total").alias("t"), F.sum("n_segs_kept").alias("k")
    ).collect()[0]
    # kept == number of DISTINCT segments corpus-wide (exactly one
    # survivor per segment value).
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from dataingestionplayground_spark.functions import text as TX

    tk = d.select("doc_id", TX.tokens("text").alias("tk")).filter(F.size("tk") > 0)
    seg = lambda i: F.array_join(F.slice(F.col("tk"), (i - 1) * 12 + 1, 12), " ")
    segs = tk.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.ceil(F.size("tk") / 12.0).cast("int")), seg
            )
        ).alias("line")
    ).filter(F.trim("line") != "")
    assert agg["t"] == segs.count()
    assert agg["k"] == segs.distinct().count()


# -------------------------------------------------- containment pairs


def test_containment_flags_subset_duplicate(spark, tmp_path):
    """A short doc fully contained in a long one: containment == 1.0
    while jaccard stays well under it."""
    base = [f"tok{i}" for i in range(24)]  # 22 distinct 3-shingles
    long_doc = " ".join(base + [f"pad{i}" for i in range(60)])
    short_doc = " ".join(base)
    # exact copy pair so LSH banding certainly proposes it
    rows = [(1, long_doc), (2, short_doc), (3, short_doc)]
    _first_seg_df(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in QS["dedup_containment_pairs"].fn(spark, str(tmp_path)).collect()
    }
    assert (2, 3) in out and out[(2, 3)]["containment"] == pytest.approx(1.0)
    if (1, 2) in out:  # banding is probabilistic on the subset pair
        r = out[(1, 2)]
        assert r["containment"] == pytest.approx(1.0)
        assert r["jaccard"] < 0.5


def test_containment_at_least_jaccard_everywhere(spark, sf_dir):
    rows = QS["dedup_containment_pairs"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["containment"] >= r["jaccard"] - 1e-12
        assert 0.3 - 1e-12 <= r["containment"] <= 1.0 + 1e-12


# ------------------------------------------- cluster keep-best policy


def test_cluster_keep_best_picks_max_quality_per_cluster(spark, sf_dir):
    """Exactly one survivor per cluster, and in every multi-member
    cluster the survivor is the (quality desc, doc_id asc) argmax —
    i.e. the policy actually differs from dedup_clusters' min-id pick
    whenever qualities differ."""
    rows = QS["dedup_cluster_keep_best"].fn(spark, sf_dir).collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert sum(1 for r in rows if r["kept"]) == len(by_cluster)
    multi = 0
    for members in by_cluster.values():
        best = sorted(members, key=lambda r: (-r["quality"], r["doc_id"]))[0]
        kept = [r for r in members if r["kept"]]
        assert len(kept) == 1 and kept[0]["doc_id"] == best["doc_id"]
        if len(members) > 1:
            multi += 1
    assert multi > 0  # the corpus contains real near-dup clusters


# ------------------------------------------------------------------ MMR


def test_mmr_matches_numpy_reference(spark, sf_dir):
    """Full independent reimplementation: exact cosine over the WHOLE
    corpus (no two-phase machinery), then greedy MMR — selection order,
    ids, and scores must match the engine exactly."""
    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.linalg.norm(mat, axis=1)
    safe = np.where(norms == 0.0, 1.0, norms)
    unit = mat / safe[:, None]
    q = unit[ids == 0][0]
    rel = unit @ q
    rel[norms == 0.0] = -np.inf  # zero vectors: nulled by the engine
    n_cand, k, lam = 32, 10, 0.7
    cand_idx = sorted(
        range(len(ids)), key=lambda i: (-rel[i], ids[i])
    )[:n_cand]
    cunit = unit[cand_idx]
    crel = rel[cand_idx]
    cids = ids[cand_idx]
    sim = cunit @ cunit.T
    scan = np.argsort(cids)
    selected, expect = [], []
    for step in range(k):
        best_j, best_score = -1, -np.inf
        for j in scan:
            if j in selected:
                continue
            pen = max(sim[j][s] for s in selected) if selected else 0.0
            sc = lam * crel[j] - (1 - lam) * pen
            if sc > best_score + 1e-12:
                best_j, best_score = j, sc
        selected.append(best_j)
        expect.append(
            (step + 1, int(cids[best_j]), round(float(crel[best_j]), 6), round(float(best_score), 6))
        )

    got = [
        (r["select_rank"], r["vec_id"], r["relevance"], r["mmr_score"])
        for r in QS["vector_mmr_diversify"].fn(spark, sf_dir).orderBy("select_rank").collect()
    ]
    assert [g[:2] for g in got] == [e[:2] for e in expect]
    for g, e in zip(got, expect):
        assert g[2] == pytest.approx(e[2], abs=1e-6)
        assert g[3] == pytest.approx(e[3], abs=1e-6)


def test_mmr_diversifies_vs_pure_relevance(spark, sf_dir):
    """The MMR list must not simply equal the relevance top-k when the
    candidate pool contains near-duplicates of the query (vec_id 0 is its
    own best match; its near-dups should be pushed down)."""
    out = QS["vector_mmr_diversify"].fn(spark, sf_dir).orderBy("select_rank").collect()
    assert len(out) == 10
    assert out[0]["vec_id"] == 0  # the query itself is the most relevant
    ranks = [r["select_rank"] for r in out]
    assert ranks == list(range(1, 11))
    # mmr_score of later picks is relevance minus a diversity penalty
    for r in out[1:]:
        assert r["mmr_score"] <= 0.7 * r["relevance"] + 1e-9


# ------------------------------------------------- hybrid RRF fusion


def test_rrf_fusion_recomputes_from_components(spark, sf_dir):
    bm = {
        r["doc_id"]: r["rk"]
        for r in QS["text_bm25_topk"].fn(spark, sf_dir).collect()
    }
    knn = {
        r["vec_id"]: r["rank"]
        for r in QS["vector_knn_bruteforce"].fn(spark, sf_dir).collect()
        if r["query_id"] == 0
    }
    got = QS["retrieval_hybrid_rrf"].fn(spark, sf_dir).collect()
    # candidates are exactly the union of the two component top-10s
    assert {r["doc_id"] for r in got} == set(bm) | set(knn)
    expect = {
        d: round(
            (1.0 / (60 + bm[d]) if d in bm else 0.0)
            + (1.0 / (60 + knn[d]) if d in knn else 0.0),
            6,
        )
        for d in set(bm) | set(knn)
    }
    order = sorted(expect, key=lambda d: (-expect[d], d))
    for r in got:
        assert r["rrf"] == pytest.approx(expect[r["doc_id"]], abs=1e-9)
        assert order[r["rk"] - 1] == r["doc_id"]


def test_rrf_doc_in_both_lists_outranks_single_list(spark, sf_dir):
    got = sorted(
        QS["retrieval_hybrid_rrf"].fn(spark, sf_dir).collect(),
        key=lambda r: r["rk"],
    )
    # fusion property: any doc present in BOTH lists (rrf > 1/61 max of a
    # single top-1) must outrank every single-list straggler (rrf <= 1/61)
    both = [r for r in got if r["rrf"] > 1.0 / 61 + 1e-9]
    single = [r for r in got if r["rrf"] <= 1.0 / 61 + 1e-9]
    if both and single:
        assert max(r["rk"] for r in both) < min(r["rk"] for r in single)


# -------------------------------------------- Matryoshka prefix search


def test_matryoshka_recall_and_exactness_on_shortlist(spark, sf_dir):
    exact = defaultdict(set)
    for r in QS["vector_knn_bruteforce"].fn(spark, sf_dir).collect():
        exact[r["query_id"]].add(r["vec_id"])
    got = defaultdict(dict)
    for r in QS["vector_matryoshka_search"].fn(spark, sf_dir).collect():
        got[r["query_id"]][r["vec_id"]] = r
    assert set(got) == set(exact)
    hits = total = 0
    for qid, truth in exact.items():
        assert len(got[qid]) == 10
        # scores are FULL-dimension cosine: any returned vec also in the
        # exact top-10 must carry the same rank-ordering position source
        hits += len(truth & set(got[qid]))
        total += len(truth)
        # self-match: the query vector itself survives the prefix pass
        assert qid in got[qid] and got[qid][qid]["rank"] == 1
    # the synthetic embeddings are hash-random, so unlike real MRL
    # models the prefix carries no concentrated signal; a random 50-of-500
    # shortlist would land ~0.1 recall, so 0.25+ shows the prefix scoring
    # (not chance) drives the shortlist
    assert hits / total >= 0.25, hits / total
