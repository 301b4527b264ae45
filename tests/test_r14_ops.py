"""Round-14 registry pins: the maintained-IVF occupancy rows are
internally consistent and the retrain signal provably grades the same
frame; the release gate's verdicts are the conjunction of its member
signals and the gate actually catches the leaking feed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def REGISTRY(spark):
    from dataingestionplayground_spark.queries import all_queries

    return all_queries()


def test_ivf_maintenance_rows_partition_the_corpus(spark, REGISTRY):
    rows = REGISTRY["vector_ivf_merge_maintenance"].fn(spark, SF).collect()
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r["n_total"] for r in rows) == n_vecs
    for r in rows:
        assert r["n_base"] + r["n_new"] == r["n_total"]
        assert 0.0 <= r["share"] <= 1.0
        assert 0.0 <= r["new_frac"] <= 1.0
    # shares sum to ~1 (each 6dp-rounded)
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4


def test_ivf_retrain_signal_matches_maintenance_frame(spark, REGISTRY):
    occ = REGISTRY["vector_ivf_merge_maintenance"].fn(spark, SF).collect()
    sig = REGISTRY["vector_ivf_retrain_signal"].fn(spark, SF).collect()[0]
    totals = [r["n_total"] for r in occ]
    assert sig["n_cells_occupied"] == len(occ)
    assert sig["n_assigned"] == sum(totals)
    assert sig["max_n"] == max(totals)
    assert sig["skew"] == round(max(totals) * 16.0 / sum(totals), 6)
    assert sig["retrain"] == (max(totals) * 16 >= 2 * sum(totals))


def test_release_gate_is_conjunction_of_member_verdicts(spark, REGISTRY):
    g = REGISTRY["pipeline_release_gate"].fn(spark, SF).collect()[0]
    assert g["ship"] == (
        g["pass_dup"] and g["pass_quality"]
        and g["pass_contam"] and g["pass_novelty"]
    )
    assert 0 <= g["n_novel"] <= g["n_delta"]
    # the member signals really are the registered members' values
    rep = REGISTRY["pipeline_release_report"].fn(spark, SF).collect()[0]
    assert g["dup_rate"] == rep["dup_rate"]
    assert g["avg_quality"] == rep["avg_quality"]
    cbs = REGISTRY["text_contamination_by_source"].fn(spark, SF).collect()
    assert g["max_contaminated_frac"] == max(r["contaminated_frac"] for r in cbs)
    assert g["n_contaminated"] == sum(r["n_contaminated"] for r in cbs)


def test_release_gate_blocks_on_the_leaking_feed(spark, REGISTRY):
    # the synthetic corpus plants a fully-contaminated source (the
    # dedup_decontaminate eval slice leaks whole documents): the WORST
    # feed must be over the 0.25 bar and the gate must not ship it,
    # even though the corpus-mean signals (dup, quality) look fine
    g = REGISTRY["pipeline_release_gate"].fn(spark, SF).collect()[0]
    assert g["max_contaminated_frac"] > 0.25
    assert g["pass_contam"] is False
    assert g["ship"] is False
    assert g["pass_dup"] is True and g["pass_quality"] is True


def test_rep_first_verified_pairs_equals_member_level(spark, REGISTRY, tmp_path):
    # equivalence pin for the r14 representatives-first rewrite of
    # dedup_lsh_verified_pairs: on seeded corpora with planted exact
    # REPLICAS and near-dups, the rep-first plan (collapse -> band ->
    # verify -> expand) must equal the member-level computation it
    # replaced, pair-for-pair — including the J=1.0 intra-group pairs,
    # the cross-group expansion, and the empty-shingle guards.
    import random

    from dataingestionplayground_spark.functions import text as TX
    from dataingestionplayground_spark.operators.dedup import minhash_lsh_pairs

    rng = random.Random(4242)
    words = [f"w{i}" for i in range(40)]
    rows = []
    doc_id = 0
    for g in range(10):
        base = [rng.choice(words) for _ in range(rng.randint(4, 25))]
        # exact replicas (the crawl-duplication shape rep-first targets)
        for _ in range(rng.randint(2, 5)):
            rows.append((doc_id, " ".join(base)))
            doc_id += 1
        # near-dup mutations
        for _ in range(rng.randint(0, 3)):
            mut = list(base)
            for _ in range(rng.randint(1, 3)):
                mut[rng.randrange(len(mut))] = rng.choice(words)
            rows.append((doc_id, " ".join(mut)))
            doc_id += 1
    # guard shapes: empty texts and sub-shingle-length texts must
    # produce no pairs on either side (0/0 jaccard was NULL in the old
    # plan; rep-first excludes empty-set groups from the intra leg)
    for txt in ("", "", "one two", "one two"):
        rows.append((doc_id, txt))
        doc_id += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.write.parquet(str(tmp_path / "documents.parquet"))

    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in REGISTRY["dedup_lsh_verified_pairs"]
        .fn(spark, str(tmp_path))
        .collect()
    }

    # member-level reference: band ALL docs, verify every candidate
    cand = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=8, rows_per_band=2
    ).localCheckpoint(eager=True)
    sets_ = docs.select(
        "doc_id",
        F.array_distinct(TX.word_shingles("text", 3)).alias("sset"),
    ).withColumn("sz", F.size("sset"))
    sa = sets_.select(
        F.col("doc_id").alias("id_a"), F.col("sset").alias("set_a"),
        F.col("sz").alias("sz_a"),
    )
    sb = sets_.select(
        F.col("doc_id").alias("id_b"), F.col("sset").alias("set_b"),
        F.col("sz").alias("sz_b"),
    )
    inter = F.size(F.array_intersect("set_a", "set_b")).cast("long")
    want = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            inter.cast("double")
            / (F.col("sz_a") + F.col("sz_b") - inter).cast("double"),
        )
        .filter(F.col("jaccard") >= 0.3)
        .collect()
    }
    assert got == want
    assert len(got) > 20  # replicas guarantee a dense pair set
    assert any(j == 1.0 for j in got.values())  # intra-group leg hit
    assert any(j < 1.0 for j in got.values())   # cross-group leg hit
