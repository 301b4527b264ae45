"""Round-13 dup-rate maintainer pins: replay idempotence, batch
parity with dedup_rate_by_source, seed-then-maintain composition,
and compaction identity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from dataingestionplayground_spark.session import get_spark

    return get_spark()


def _snapshot(spark, path):
    from dataingestionplayground_spark.operators.incremental import dup_rate_over

    return {
        r["source"]: (r["n_docs"], r["n_unique"], r["n_dups"], r["dup_rate"])
        for r in dup_rate_over(spark, path).collect()
    }


def test_dup_rate_maintainer_replay_and_parity(spark, tmp_path):
    from dataingestionplayground_spark.operators.incremental import (
        compact_dup_rate_state,
        merge_dup_rate_state,
    )
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    path = str(tmp_path / "duprate")
    d = spark.read.parquet(f"{SF}/documents.parquet")
    b1 = d.filter(F.col("doc_id") % 3 == 0)
    b2 = d.filter(F.col("doc_id") % 3 == 1)
    b3 = d.filter(F.col("doc_id") % 3 == 2)
    merge_dup_rate_state(spark, b1, path, epoch_id=1)
    merge_dup_rate_state(spark, b2, path, epoch_id=2)
    merge_dup_rate_state(spark, b3, path, epoch_id=3)
    full = _snapshot(spark, path)

    # parity: the maintained view equals the registered batch query
    # over the union of all batches (= the whole table)
    batch = {
        r["source"]: (r["n_docs"], r["n_unique"], r["n_dups"], r["dup_rate"])
        for r in REGISTRY["dedup_rate_by_source"].fn(spark, SF).collect()
    }
    assert full == batch

    # replay epoch 2 (foreachBatch retry) -> table unchanged
    merge_dup_rate_state(spark, b2, path, epoch_id=2)
    assert _snapshot(spark, path) == full

    # compaction folds epochs without changing the view
    compact_dup_rate_state(spark, path)
    assert _snapshot(spark, path) == full
    state = spark.read.option("mergeSchema", "true").parquet(path)
    assert state.filter(F.col("epoch_id").isNotNull()).count() == 0


def test_dup_rate_seed_then_maintain_composes(spark, tmp_path):
    from dataingestionplayground_spark.operators.incremental import (
        build_dup_rate_state,
        merge_dup_rate_state,
    )
    from dataingestionplayground_spark.queries import all_queries

    REGISTRY = all_queries()
    path = str(tmp_path / "duprate_seeded")
    d = spark.read.parquet(f"{SF}/documents.parquet")
    seed = d.filter(F.col("doc_id") % 2 == 0)
    late = d.filter(F.col("doc_id") % 2 == 1)
    # batch seed (epoch NULL), then one streaming epoch on top
    build_dup_rate_state(seed).withColumn(
        "epoch_id", F.lit(None).cast("long")
    ).select("fingerprint", "cnt", "epoch_id", "source").write.partitionBy(
        "source"
    ).parquet(path)
    merge_dup_rate_state(spark, late, path, epoch_id=7)
    batch = {
        r["source"]: (r["n_docs"], r["n_unique"], r["n_dups"], r["dup_rate"])
        for r in REGISTRY["dedup_rate_by_source"].fn(spark, SF).collect()
    }
    assert _snapshot(spark, path) == batch
    # replaying the late epoch never disturbs the NULL-epoch seed rows
    merge_dup_rate_state(spark, late, path, epoch_id=7)
    assert _snapshot(spark, path) == batch
