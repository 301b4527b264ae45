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
