"""Round-13 wave-10 operator pins (LM gate table, recall-at-k sweep,
cluster-size histogram, seasonality strength)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from dataingestionplayground_spark.session import get_spark

    return get_spark()


def test_lm_gate_table_recomputes_from_members(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    got = {r["lm"]: r for r in REGISTRY["text_lm_gate_table"].fn(spark, SF).collect()}
    assert set(got) == {"unigram", "bigram", "interpolated", "kneser_ney"}
    for lm, has_keep in (("unigram", True), ("bigram", True),
                         ("interpolated", True), ("kneser_ney", False)):
        rows = REGISTRY[f"text_{lm}_perplexity"].fn(spark, SF).collect()
        assert got[lm]["n_docs"] == len(rows)
        if has_keep:
            n_keep = sum(1 for r in rows if r["keep"])
            assert got[lm]["n_keep"] == n_keep
            assert got[lm]["keep_rate"] == round(n_keep / len(rows), 6)
        else:
            assert got[lm]["n_keep"] is None and got[lm]["keep_rate"] is None


def test_recall_at_k_sweep_monotone_structure(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    rows = REGISTRY["vector_recall_at_k_sweep"].fn(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["k"]] = r
    assert len(by_q) == 5
    exact = {(r["query_id"], r["vec_id"]): r["rank"] for r in
             REGISTRY["vector_knn_bruteforce"].fn(spark, SF).collect()}
    approx = {(r["query_id"], r["vec_id"]): r["rank"] for r in
              REGISTRY["vector_lsh_ann"].fn(spark, SF).collect()}
    for q, ks in by_q.items():
        assert set(ks) == {1, 5, 10}
        for k, r in ks.items():
            hits = sum(
                1 for (qq, v), rk in exact.items()
                if qq == q and rk <= k and approx.get((qq, v), 99) <= k
            )
            assert r["n_hits"] == hits
            assert r["recall_at_k"] == round(hits / k, 6)
        # n_hits can only grow with depth
        assert ks[1]["n_hits"] <= ks[5]["n_hits"] <= ks[10]["n_hits"]
    # the k=10 leg IS vector_ann_recall_eval
    base = {r["query_id"]: r["n_hits"] for r in
            REGISTRY["vector_ann_recall_eval"].fn(spark, SF).collect()}
    for q, ks in by_q.items():
        assert ks[10]["n_hits"] == base[q]


def test_cluster_histogram_partitions_corpus(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    hist = REGISTRY["dedup_cluster_size_histogram"].fn(spark, SF).collect()
    clusters = REGISTRY["dedup_clusters"].fn(spark, SF).collect()
    n_docs = len(clusters)
    assert sum(r["n_docs"] for r in hist) == n_docs
    assert abs(sum(r["doc_frac"] for r in hist) - 1.0) < 1e-5
    sizes = {}
    for r in clusters:
        sizes[r["cluster_id"]] = sizes.get(r["cluster_id"], 0) + 1
    from collections import Counter

    expect = Counter(sizes.values())
    got = {r["cluster_size"]: r["n_clusters"] for r in hist}
    assert got == dict(expect)
    for r in hist:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]


def test_seasonality_strength_matches_python(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    evs = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_type = {}
    for e in evs:
        dow = int(e["ts"].timestamp() // 86400) % 7
        by_type.setdefault(e["event_type"], []).append((dow, e["value"]))
    got = {r["event_type"]: r for r in
           REGISTRY["events_seasonality_strength"].fn(spark, SF).collect()}
    for et, pts in by_type.items():
        n = len(pts)
        means = {}
        for d, v in pts:
            means.setdefault(d, []).append(v)
        means = {d: sum(vs) / len(vs) for d, vs in means.items()}
        sv = sum(round(v, 6) for _, v in pts)
        svv = sum(round(v * v, 6) for _, v in pts)
        srr = sum(round((v - means[d]) ** 2, 6) for d, v in pts)
        var_total = svv / n - (sv / n) ** 2
        r = got[et]
        assert r["n"] == n
        assert abs(r["var_total"] - var_total) < 1e-4
        assert abs(r["var_resid"] - srr / n) < 1e-4
        # explained variance is a valid fraction (allowing tiny float slack)
        assert -1e-6 <= r["r2_seasonal"] <= 1.0 + 1e-6
        assert r["var_resid"] <= r["var_total"] + 1e-6


def test_quality_league_composes_ensemble(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    league = {r["source"]: r for r in
              REGISTRY["pipeline_quality_league"].fn(spark, SF).collect()}
    ens = {r["doc_id"]: r for r in
           REGISTRY["text_quality_ensemble"].fn(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    by_src = {}
    for d in docs:
        if d["doc_id"] in ens:
            by_src.setdefault(d["source"], []).append(ens[d["doc_id"]])
    assert set(league) == set(by_src)
    for src, rows in by_src.items():
        assert league[src]["n_scored"] == len(rows)
        n_keep = sum(1 for r in rows if r["keep"])
        assert league[src]["n_keep"] == n_keep
        assert league[src]["keep_rate"] == round(n_keep / len(rows), 6)


def test_phash_confirm_covers_every_ahash_pair(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    conf = REGISTRY["multimodal_phash_confirm"].fn(spark, SF).collect()
    n_pairs = REGISTRY["multimodal_ahash_pairs"].fn(spark, SF).count()
    assert sum(r["n_pairs"] for r in conf) == n_pairs
    for r in conf:
        assert 0 <= r["n_confirmed"] <= r["n_pairs"]
        assert r["confirm_rate"] == round(r["n_confirmed"] / r["n_pairs"], 6)
        assert 0 <= r["ahash_hamming"] <= 6


def test_mixture_realization_check_is_deterministic_and_sound(spark):
    import hashlib
    import math

    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    rows = {r["source"]: r for r in
            REGISTRY["sample_mixture_realization_check"].fn(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    by_src = {}
    for d in docs:
        by_src.setdefault(d["source"], []).append(d["doc_id"])
    # recompute thresholds and the md5 coin exactly
    isq = {s: math.floor(math.sqrt(len(ids) * 1e6)) for s, ids in by_src.items()}
    total_docs = sum(len(v) for v in by_src.values())
    total_isqrt = sum(isq.values())
    for s, ids in by_src.items():
        thr = min((isq[s] * 300000 * total_docs) // (total_isqrt * len(ids)), 10**6)
        sampled = [
            i for i in ids
            if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10**6 < thr
        ]
        r = rows[s]
        assert r["n_docs"] == len(ids)
        assert r["n_sampled"] == len(sampled)
        assert r["planned_rate"] == round(thr / 1e6, 6)
        assert r["realized_rate"] == round(len(sampled) / len(ids), 6)
    # run twice -> byte-identical realization (deterministic coin)
    again = {r["source"]: r["n_sampled"] for r in
             REGISTRY["sample_mixture_realization_check"].fn(spark, SF).collect()}
    assert again == {s: r["n_sampled"] for s, r in rows.items()}


def test_release_report_composes_data_card(spark):
    import math

    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    rep = REGISTRY["pipeline_release_report"].fn(spark, SF).collect()[0]
    card = REGISTRY["pipeline_data_card"].fn(spark, SF).collect()
    assert rep["n_sources"] == len(card)
    assert rep["total_tokens"] == sum(r["total_tokens"] for r in card)
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    assert rep["n_docs"] == len(docs)
    langs = {}
    for d in docs:
        langs[d["lang"]] = langs.get(d["lang"], 0) + 1
    assert rep["n_langs"] == len(langs)
    t = sum(langs.values())
    ent = sum(round(-(c / t) * math.log2(c / t), 6) for c in langs.values())
    assert rep["lang_entropy"] == round(ent, 6)
    assert 0.0 <= rep["dup_rate"] < 1.0


def test_kpi_daily_matches_python(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    evs = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_day = {}
    for e in evs:
        by_day.setdefault(int(e["ts"].timestamp() // 86400), []).append(e)
    got = {r["day"]: r for r in REGISTRY["events_kpi_daily"].fn(spark, SF).collect()}
    assert set(got) == set(by_day)
    for d, es in by_day.items():
        r = got[d]
        assert r["n_events"] == len(es)
        assert r["dau"] == len({e["user_id"] for e in es})
        assert r["n_purchases"] == sum(1 for e in es if e["event_type"] == "purchase")
        errs = sum(1 for e in es if e["event_type"] == "error")
        assert r["error_rate"] == round(errs / len(es), 6)
        assert r["events_per_user"] == round(len(es) / r["dau"], 6)


def test_ppl_quality_calibration_partitions_joined_docs(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    cal = REGISTRY["text_ppl_quality_calibration"].fn(spark, SF).collect()
    p = {r["doc_id"] for r in REGISTRY["text_unigram_perplexity"].fn(spark, SF).collect()}
    q = {r["doc_id"] for r in REGISTRY["text_quality_score"].fn(spark, SF).collect()}
    assert sum(r["n_docs"] for r in cal) == len(p & q)
    assert {r["decile"] for r in cal} <= set(range(1, 11))
    # mean ppl must rise strictly with the ppl decile (by construction)
    by_dec = sorted(cal, key=lambda r: r["decile"])
    for a, b in zip(by_dec, by_dec[1:]):
        assert a["avg_ppl"] < b["avg_ppl"]


def test_softdedup_effect_bounds_and_composition(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    eff = REGISTRY["dedup_softdedup_effect"].fn(spark, SF).collect()[0]
    w = REGISTRY["dedup_soft_weights"].fn(spark, SF).collect()
    assert eff["n_docs"] == len(w)
    assert 0 < eff["hard_tokens"] <= eff["raw_tokens"]
    # soft mass sits between hard-dedup mass and the raw corpus
    # (every cluster contributes its mean tokens >= its min member's
    # contribution under keep-min... not in general — just bound by raw)
    assert 0 < eff["soft_token_mass"] <= eff["raw_tokens"] + 1e-6
    assert eff["hard_retention"] == round(eff["hard_tokens"] / eff["raw_tokens"], 6)
    # singleton-only corpora collapse all three to equality
    sizes = {}
    for r in w:
        sizes[r["cluster_id"]] = sizes.get(r["cluster_id"], 0) + 1
    if all(v == 1 for v in sizes.values()):
        assert eff["hard_tokens"] == eff["raw_tokens"]
        assert abs(eff["soft_token_mass"] - eff["raw_tokens"]) < 1e-3


def test_contamination_by_source_composes_report(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    rep = {r["doc_id"]: r for r in
           REGISTRY["text_contamination_report"].fn(spark, SF).collect()}
    docs = {d["doc_id"]: d["source"] for d in
            spark.read.parquet(f"{SF}/documents.parquet").collect()}
    got = {r["source"]: r for r in
           REGISTRY["text_contamination_by_source"].fn(spark, SF).collect()}
    by_src = {}
    for doc_id, r in rep.items():
        by_src.setdefault(docs[doc_id], []).append(r)
    assert set(got) == set(by_src)
    for src, rows in by_src.items():
        assert got[src]["n_eval_docs"] == len(rows)
        n_cont = sum(1 for r in rows if r["n_hit"] > 0)
        assert got[src]["n_contaminated"] == n_cont
        assert got[src]["contaminated_frac"] == round(n_cont / len(rows), 6)


def test_cell_balance_sweep_composes_and_n16_matches_registered(spark):
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    rows = {r["n_cells"]: r for r in
            REGISTRY["vector_cell_balance_sweep"].fn(spark, SF).collect()}
    assert set(rows) == {8, 16, 32}
    base = REGISTRY["vector_cell_balance"].fn(spark, SF).collect()[0]
    r16 = rows[16]
    assert (r16["n_vecs"], r16["n_cells_occupied"], r16["max_n"],
            r16["cv"], r16["max_over_mean"]) == (
        base["n_vecs"], base["n_cells_occupied"], base["max_n"],
        base["cv"], base["max_over_mean"])
    for n, r in rows.items():
        assert r["n_cells_occupied"] <= n
        assert r["n_vecs"] == rows[8]["n_vecs"]  # every leg covers the corpus
        assert r["max_n"] * r["n_cells_occupied"] >= r["n_vecs"]
