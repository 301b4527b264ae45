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


def test_packed_pair_jaccard_equals_exploded_join(spark):
    # equivalence pin for the r13 packed-set refactor: on seeded
    # corpora with planted near-dups, _packed_pair_jaccard must equal
    # the exploded (pair x shingle) equi-join computation it replaced,
    # pair-for-pair — the shape changed, the math must not
    import random

    from dataingestionplayground_spark.functions import text as TX
    from dataingestionplayground_spark.operators.dedup import minhash_lsh_pairs
    from dataingestionplayground_spark.queries.dedupq import _packed_pair_jaccard

    rng = random.Random(1337)
    words = [f"w{i}" for i in range(40)]
    rows = []
    doc_id = 0
    for g in range(12):
        base = [rng.choice(words) for _ in range(rng.randint(4, 25))]
        for _ in range(rng.randint(1, 4)):
            mut = list(base)
            for _ in range(rng.randint(0, 3)):
                mut[rng.randrange(len(mut))] = rng.choice(words)
            rows.append((doc_id, " ".join(mut)))
            doc_id += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cand = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=8, rows_per_band=2
    ).localCheckpoint(eager=True)
    if cand.count() == 0:
        return
    packed = {
        (r["id_a"], r["id_b"]): r["j"]
        for r in _packed_pair_jaccard(docs, cand).collect()
    }
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(TX.word_shingles("text", 3))).alias("shingle"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    common = (
        cand.join(sh.select(F.col("doc_id").alias("id_a"), "shingle"), "id_a")
        .join(sh.select(F.col("doc_id").alias("id_b"), "shingle"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    exploded = {
        (r["id_a"], r["id_b"]): round(
            (r["n_common"] or 0) / (r["sa"] + r["sb"] - (r["n_common"] or 0)), 6
        )
        for r in cand.join(common, ["id_a", "id_b"], "left")
        .join(sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sa")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sb")), "id_b")
        .collect()
    }
    assert packed == exploded and len(packed) > 0
