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
