"""Round-16 operator tests: the sub-linear multimodal dedup card and
the shared banded-fingerprint helpers it rests on."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_multimodal_dedup_card_shape_and_invariants(spark):
    """The rewritten card (sub-linear in pair mass): one row per
    modality; n_dup_items counts verified members of >=2-member band
    groups, est_pairs is the densest single-band m*(m-1)/2 fold, and
    the rate is the exact rounded quotient. The corpus is built with
    near-dup groups in every modality, so all three legs are
    non-trivial."""
    from dataingestionplayground_spark.queries import all_queries

    rows = {
        r["modality"]: r
        for r in all_queries()["multimodal_dedup_card"].fn(spark, SF).collect()
    }
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert set(rows) == {"image", "audio", "video"}
    for r in rows.values():
        assert r["n_items"] == n_docs
        assert 0 < r["n_dup_items"] <= n_docs
        assert r["est_pairs"] > 0
        assert r["dup_item_rate"] == round(r["n_dup_items"] / n_docs, 6)


def test_card_video_dup_items_match_exact_collision_groups(spark):
    """Video band groups are exact (scene, keyframe-hash) keys, so the
    card's verified-member count must equal the number of docs sharing
    at least one exact keyframe collision — recomputed here the naive
    way (self-join on the hash frame) at sf0.001."""
    from dataingestionplayground_spark.queries import all_queries
    from dataingestionplayground_spark.queries.ingestq import (
        _V_SCENE,
        _video_frame_hashes,
    )

    card = {
        r["modality"]: r
        for r in all_queries()["multimodal_dedup_card"].fn(spark, SF).collect()
    }
    fps = (
        _video_frame_hashes(spark, SF, keyframes_only=True)
        .select(
            "doc_id",
            F.expr(f"frame_idx div {_V_SCENE}").alias("slot"),
            "w_lo",
            "w_hi",
        )
        .localCheckpoint(eager=True)
    )
    other = fps.select(
        F.col("doc_id").alias("other_id"), "slot", "w_lo", "w_hi"
    )
    collided = (
        fps.join(other, ["slot", "w_lo", "w_hi"])
        .filter(F.col("doc_id") != F.col("other_id"))
        .select("doc_id")
        .distinct()
        .count()
    )
    assert card["video"]["n_dup_items"] == collided
