"""Round-12 fixes: ADVICE r11 pins.

* SCD2 maintained state — mergeSchema read over mixed legacy/r11 bucket
  schemas (legacy rows are change rows; NULL is_change coalesces true).
* SCD2 retention compaction: max_lateness_s rejects beyond-horizon late
  rows and compacts beyond-horizon repeats, equal to a full rebuild for
  everything inside the horizon.
* agg_approx_top_users exactness guard raises when the sketch truncates.
"""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest

from pyspark.sql import functions as F

UTC = dt.timezone.utc
T0 = int(dt.datetime(2024, 1, 1, tzinfo=UTC).timestamp())


def _batch(spark, rows):
    """rows: (event_id, offset_s, user_id, status)."""
    data = [
        (eid, dt.datetime.fromtimestamp(T0 + off, UTC), uid, st)
        for eid, off, uid, st in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _dim(spark, path):
    from dataingestionplayground_spark.operators.incremental import (
        read_scd2_dimension,
    )

    return {
        (r["user_id"], r["version"]): (
            r["status"],
            r["valid_from"],
            r["valid_to"],
            r["is_current"],
        )
        for r in read_scd2_dimension(spark, path).collect()
    }


def _state_rows(spark, path):
    return spark.read.option("mergeSchema", "true").parquet(path).count()


def test_scd2_retention_compacts_repeats_and_rejects_beyond_horizon(
    spark, tmp_path
):
    from dataingestionplayground_spark.operators.incremental import (
        merge_scd2_dimension,
    )

    path = str(tmp_path / "dim")
    lateness = 1000

    # view@+10 (change), view@+100 (repeat), click@+200 (change):
    # horizon = 200 - 1000 < 0, nothing compacts — all 3 observations
    # retained, matching the retain-everything semantics
    merge_scd2_dimension(
        spark,
        _batch(spark, [(1, 10, 1, "view"), (2, 100, 1, "view"), (3, 200, 1, "click")]),
        path,
        max_lateness_s=lateness,
    )
    assert _dim(spark, path) == {
        (1, 1): ("view", T0 + 10, T0 + 200, False),
        (1, 2): ("click", T0 + 200, None, True),
    }
    assert _state_rows(spark, path) == 3

    # watermark jumps to +5000: horizon = +4000, the view@+100 repeat is
    # older and compacts away; change rows (dimension history) are
    # permanent
    merge_scd2_dimension(
        spark, _batch(spark, [(4, 5000, 1, "view")]), path, max_lateness_s=lateness
    )
    assert _dim(spark, path) == {
        (1, 1): ("view", T0 + 10, T0 + 200, False),
        (1, 2): ("click", T0 + 200, T0 + 5000, False),
        (1, 3): ("view", T0 + 5000, None, True),
    }
    assert _state_rows(spark, path) == 3  # 3 change rows, repeat gone

    # beyond-horizon late row (+150 < +4000) is REJECTED: the dimension
    # and the state are bit-identical before/after
    before = _dim(spark, path)
    merge_scd2_dimension(
        spark, _batch(spark, [(5, 150, 1, "click")]), path, max_lateness_s=lateness
    )
    assert _dim(spark, path) == before
    assert _state_rows(spark, path) == 3

    # within-horizon late row still splices exactly like a full rebuild:
    # click@+4500 is a same-status repeat of click@+200 (non-change,
    # retained), so the dimension is unchanged but state grows by 1
    merge_scd2_dimension(
        spark, _batch(spark, [(6, 4500, 1, "click")]), path, max_lateness_s=lateness
    )
    assert _dim(spark, path) == before
    assert _state_rows(spark, path) == 4

    # ... and a later within-horizon change between +4500 and +5000 must
    # re-open the retained repeat — the reason repeats inside the
    # horizon are kept (watermark stays +5000, horizon +4000 <= +4500)
    merge_scd2_dimension(
        spark, _batch(spark, [(7, 4700, 1, "view")]), path, max_lateness_s=lateness
    )
    # full-rebuild order over retained observations {view@10, click@200,
    # click@4500(repeat), view@4700, view@5000(repeat now)}: three
    # versions — view@10, click@200..4700, view@4700 current; the old
    # view@5000 version is correctly revealed as a same-status repeat
    assert _dim(spark, path) == {
        (1, 1): ("view", T0 + 10, T0 + 200, False),
        (1, 2): ("click", T0 + 200, T0 + 4700, False),
        (1, 3): ("view", T0 + 4700, None, True),
    }


def test_scd2_backfill_batch_wider_than_lateness_window_keeps_all_rows(
    spark, tmp_path
):
    """ADVICE r12: the rejection watermark is computed from STORED state
    only (Spark-streaming style). A single backfill batch spanning far
    more than the lateness window must keep ALL its observations —
    judging the batch against its own max silently amputated the older
    half of the backfill, diverging from a full rebuild."""
    from dataingestionplayground_spark.operators.incremental import (
        merge_scd2_dimension,
    )

    # one batch spanning 9000s with a 1000s lateness window: the old
    # behavior (horizon = own max - lateness = +8000) rejected the
    # first three rows; stored-only watermark keeps everything
    rows = [
        (1, 10, 1, "view"),
        (2, 500, 1, "click"),
        (3, 900, 1, "click"),
        (4, 9000, 1, "view"),
    ]
    path = str(tmp_path / "dim")
    merge_scd2_dimension(
        spark, _batch(spark, rows), path, max_lateness_s=1000
    )
    full = str(tmp_path / "full")
    merge_scd2_dimension(spark, _batch(spark, rows), full)  # no lateness
    assert _dim(spark, path) == _dim(spark, full) == {
        (1, 1): ("view", T0 + 10, T0 + 500, False),
        (1, 2): ("click", T0 + 500, T0 + 9000, False),
        (1, 3): ("view", T0 + 9000, None, True),
    }
    # a FOLLOW-UP merge is still horizon-gated by the now-stored
    # watermark (+9000 - 1000 = +8000): the late row is rejected and
    # the dimension is unchanged
    before = _dim(spark, path)
    merge_scd2_dimension(
        spark, _batch(spark, [(5, 700, 1, "view")]), path, max_lateness_s=1000
    )
    assert _dim(spark, path) == before


def test_scd2_compaction_equals_full_rebuild_inside_horizon(spark, tmp_path):
    """Property pin: merging batch-by-batch WITH compaction equals one
    all-at-once rebuild, as long as every observation arrives inside the
    lateness horizon."""
    from dataingestionplayground_spark.operators.incremental import (
        merge_scd2_dimension,
    )

    rows = [
        (1, 10, 1, "view"),
        (2, 50, 2, "view"),
        (3, 120, 1, "view"),
        (4, 180, 1, "click"),
        (5, 200, 2, "view"),
        (6, 260, 2, "click"),
        (7, 300, 1, "view"),
        (8, 340, 2, "click"),
    ]
    inc = str(tmp_path / "inc")
    for i in range(0, len(rows), 2):
        merge_scd2_dimension(
            spark, _batch(spark, rows[i : i + 2]), inc, max_lateness_s=10_000
        )
    full = str(tmp_path / "full")
    merge_scd2_dimension(spark, _batch(spark, rows), full)
    assert _dim(spark, inc) == _dim(spark, full)


def test_scd2_legacy_bucket_schema_upgrade_read(spark, tmp_path):
    """ADVICE r11 (medium): a table written by the r10 format (change
    rows only, NO is_change column), later merged into by the r11 format
    (dynamic overwrite touches only the new batch's buckets), has MIXED
    bucket schemas. read_scd2_dimension must return BOTH the legacy
    bucket's rows (is_change NULL coalesces true — legacy rows are
    change rows by construction) and the new bucket's change rows."""
    from dataingestionplayground_spark.operators.incremental import (
        _SCD2_BUCKETS,
        merge_scd2_dimension,
    )

    path = str(tmp_path / "dim")

    def bucket_of(uid: int) -> int:
        return int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16) % _SCD2_BUCKETS

    # pick two users in DIFFERENT buckets so the merge never rewrites
    # the legacy user's partition
    legacy_uid = 1
    new_uid = next(
        u for u in range(2, 500) if bucket_of(u) != bucket_of(legacy_uid)
    )

    # legacy r10-format table: change rows only, no is_change column
    legacy = spark.createDataFrame(
        [
            (legacy_uid, "view", T0 + 10, 1, T0 + 100, 1, False),
            (legacy_uid, "click", T0 + 100, 2, None, 2, True),
        ],
        "user_id long, status string, valid_from long, event_id long,"
        " valid_to long, version long, is_current boolean",
    ).withColumn(
        "bucket",
        F.expr(
            f"cast(conv(substring(md5(cast(user_id as string)), 1, 8), 16, 10)"
            f" as bigint) % {_SCD2_BUCKETS}"
        ),
    )
    legacy.write.partitionBy("bucket").parquet(path)

    # r11-format merge touching only new_uid's bucket
    merge_scd2_dimension(
        spark,
        _batch(spark, [(10, 20, new_uid, "view"), (11, 90, new_uid, "click")]),
        path,
    )

    assert _dim(spark, path) == {
        (legacy_uid, 1): ("view", T0 + 10, T0 + 100, False),
        (legacy_uid, 2): ("click", T0 + 100, None, True),
        (new_uid, 1): ("view", T0 + 20, T0 + 90, False),
        (new_uid, 2): ("click", T0 + 90, None, True),
    }


def test_approx_top_users_guard_raises_on_truncated_sketch(spark):
    """The exactness guard (ADVICE r11): when the sketch's returned item
    list hits the requested 4096, the exact-counts oracle contract is
    no longer sound and the query must FAIL LOUDLY (assert_true), not
    flake the hash gate."""
    wide = spark.range(5000).select(F.col("id").alias("user_id"))
    tk = wide.agg(F.expr("approx_top_k(user_id, 4096, 100000)").alias("tk"))
    guarded = tk.filter(
        F.assert_true(
            F.size("tk") < F.lit(4096), F.lit("sketch truncated")
        ).isNull()
    )
    with pytest.raises(Exception) as ei:
        guarded.collect()
    assert "sketch truncated" in str(ei.value)


def test_pq_auto_centroid_policy(spark, tmp_path):
    """r11 verdict item 3: n_centroids='auto' sizes the codebook from
    the corpus at build time (16 / 64 / 256 steps, one byte max) and
    meta-records that the policy chose it; a small corpus resolves to
    16 and behaves exactly like an explicit k=16 build."""
    from dataingestionplayground_spark.ingest import CollectionStore
    from dataingestionplayground_spark.ingest.ann_index import (
        _auto_centroids,
        build_pq_index,
        pq_search_indexed,
    )

    assert _auto_centroids(1_000) == 16
    assert _auto_centroids(49_999) == 16
    assert _auto_centroids(50_000) == 64
    assert _auto_centroids(499_999) == 64
    assert _auto_centroids(500_000) == 256
    assert _auto_centroids(10_000_000) == 256

    from dataingestionplayground_spark.ingest.embed import hash_embed

    store = CollectionStore(str(tmp_path))
    rows = [
        (
            f"k{i}",
            hash_embed(f"document number {i}"),
            f"text {i}",
            None,
            f"d{i}",
            0,
        )
        for i in range(40)
    ]
    chunks = spark.createDataFrame(
        rows,
        "key string, embedding array<float>, content string,"
        " context string, documentid string, chunk_idx int",
    )
    store.write(chunks, "docs")
    meta = build_pq_index(
        spark, store, "docs", m=4, n_centroids="auto", dims=384
    )
    assert meta["n_centroids"] == 16
    assert meta["n_centroids_policy"] == "auto"
    q = spark.createDataFrame(
        [("q0", hash_embed("document number 3"))],
        "query_id string, query_vec array<float>",
    )
    assert pq_search_indexed(spark, store, "docs", q, k=3).count() == 3


def test_cms_exactness_window_pins_gate_corpora(spark, sf_dir):
    """agg_countmin_point_freq's r12 oracle (exact counts) is sound
    only while the CMS (width 2719, depth 5, seed 42) is collision-free
    over the event user domain — measured true at both gate SFs. This
    pin re-measures it over the FULL domain so a corpus change that
    introduces a collision fails here before it can flake the driver
    gate. (At sf0.1's 1500 users collisions exist by design — the
    approximate regime tests/test_sketches.py bounds.)"""
    import os

    from dataingestionplayground_spark.session import load_table

    dirs = [sf_dir]
    big = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    if os.path.isdir(big):
        dirs.append(big)
    for d in dirs:
        e = load_table(spark, d, "events")
        row = e.agg(
            F.expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").alias("cms")
        ).first()
        jvm = spark.sparkContext._jvm
        cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            jvm.java.io.ByteArrayInputStream(bytes(row["cms"]))
        )
        exact = {
            r["user_id"]: r["n"]
            for r in e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        mism = [
            (u, int(cms.estimateCount(u)), n)
            for u, n in exact.items()
            if int(cms.estimateCount(u)) != n
        ]
        assert not mism, f"CMS exactness window broken at {d}: {mism[:5]}"


def test_stream_embedding_drift_matches_batch_twin(spark, sf_dir, tmp_path):
    """Streaming drift maintenance replays the oracle-checked batch
    twin exactly: freeze the reference (even vec_ids) via
    drift_reference, stream the odd vec_ids in two micro-batches, and
    read_embedding_drift must equal vector_embedding_drift's one-shot
    output row-for-row (decimal epoch sums are associative, so the
    cross-epoch combine IS the batch aggregation). A second run over
    the same watch dir + checkpoint is a no-op (exactly-once)."""
    import json as _json

    from dataingestionplayground_spark.queries import all_queries

    QS = all_queries()
    from dataingestionplayground_spark.session import load_table
    from dataingestionplayground_spark.streaming.ingest import (
        drift_reference,
        read_embedding_drift,
        stream_embedding_drift,
    )

    watch = tmp_path / "watch"
    watch.mkdir()
    log = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")

    odd = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 2 == 1)
        .select("vec_id", "embedding")
        .collect()
    )
    assert len(odd) > 10
    half = len(odd) // 2
    for name, chunk in (("b0.json", odd[:half]), ("b1.json", odd[half:])):
        with open(watch / name, "w") as f:
            for r in chunk:
                f.write(
                    _json.dumps(
                        {
                            "vec_id": r["vec_id"],
                            "embedding": [float(x) for x in r["embedding"]],
                        }
                    )
                    + "\n"
                )

    ref = drift_reference(spark, sf_dir)
    stream_embedding_drift(spark, str(watch), ref, log, ckpt).awaitTermination(60)

    def rows(df):
        return sorted(
            (
                r["cell"],
                r["ref_n"],
                r["cur_n"],
                r["psi_term"],
                r["centroid_shift"],
            )
            for r in df.collect()
        )

    got = rows(read_embedding_drift(spark, log, ref))
    want = rows(QS["vector_embedding_drift"].fn(spark, sf_dir))
    assert got == want

    # exactly-once: a second availableNow pass over the same files and
    # checkpoint adds nothing and changes nothing
    stream_embedding_drift(spark, str(watch), ref, log, ckpt).awaitTermination(60)
    assert rows(read_embedding_drift(spark, log, ref)) == want


def test_collection_drift_between_stores(spark, tmp_path):
    """operators/drift.py: collection_drift runs the oracle-checked
    drift math between two NAMED store collections. Identical
    collections drift nowhere (psi_term 0 everywhere, centroid_shift
    0); a shifted current collection shows positive total PSI and a
    non-zero shift in at least one cell."""
    from dataingestionplayground_spark.ingest import CollectionStore
    from dataingestionplayground_spark.ingest.embed import hash_embed
    from dataingestionplayground_spark.operators.drift import collection_drift

    store = CollectionStore(str(tmp_path))

    def chunks(texts, tag):
        rows = [
            (f"{tag}{i:03d}", hash_embed(t), t, None, f"d{i}", 0)
            for i, t in enumerate(texts)
        ]
        return spark.createDataFrame(
            rows,
            "key string, embedding array<float>, content string,"
            " context string, documentid string, chunk_idx int",
        )

    base = [f"stable document number {i}" for i in range(48)]
    store.write(chunks(base, "a"), "snap_ref")
    store.write(chunks(base, "a"), "snap_same")
    drifted = base[:24] + [f"totally different topic {i}" for i in range(24)]
    store.write(chunks(drifted, "a"), "snap_cur")

    same = collection_drift(spark, store, "snap_ref", "snap_same", n_cells=8)
    rows = same.collect()
    assert sum(r["ref_n"] for r in rows) == 48
    assert all(r["ref_n"] == r["cur_n"] for r in rows)
    assert all(abs(r["psi_term"]) < 1e-9 for r in rows)
    assert all(
        r["centroid_shift"] is None or abs(r["centroid_shift"]) < 1e-9
        for r in rows
    )

    moved = collection_drift(spark, store, "snap_ref", "snap_cur", n_cells=8)
    mrows = moved.collect()
    assert sum(r["psi_term"] for r in mrows if r["psi_term"] is not None) > 0.01
    assert any(
        r["centroid_shift"] is not None and r["centroid_shift"] > 1e-6
        for r in mrows
    )


def test_scd2_watermark_is_per_bucket_monotone(spark, tmp_path):
    """r12 review: a merge-GLOBAL watermark lets one bucket's recent
    data compact ANOTHER bucket's repeats against a horizon that a
    later single-bucket merge no longer enforces — a late row then
    splices against amputated state and a version is silently lost.
    With the per-bucket watermark, bucket X's repeat survives batch 2
    (X's own watermark stays 1500) and batch 3's in-horizon late change
    re-opens it exactly like a full rebuild."""
    from dataingestionplayground_spark.operators.incremental import (
        _SCD2_BUCKETS,
        merge_scd2_dimension,
    )

    def bucket_of(uid: int) -> int:
        return int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16) % _SCD2_BUCKETS

    a = 1
    b = next(u for u in range(2, 500) if bucket_of(u) != bucket_of(a))
    path = str(tmp_path / "dim")
    lat = 1000

    # batch 1 (bucket X only): change + same-status repeat
    merge_scd2_dimension(
        spark,
        _batch(spark, [(1, 1000, a, "view"), (2, 1500, a, "view")]),
        path,
        max_lateness_s=lat,
    )
    # batch 2 touches X (a beyond-X-horizon late row, rejected) AND Y
    # (fresh data at +9000): under a global watermark this batch would
    # compact X's repeat@1500 against Y's horizon 8000
    merge_scd2_dimension(
        spark,
        _batch(spark, [(3, 100, a, "click"), (4, 9000, b, "view")]),
        path,
        max_lateness_s=lat,
    )
    # batch 3 (X only): click@1200 is INSIDE X's real lateness window
    # (X watermark 1500, horizon 500) and must re-open the repeat@1500
    merge_scd2_dimension(
        spark, _batch(spark, [(5, 1200, a, "click")]), path, max_lateness_s=lat
    )
    assert _dim(spark, path) == {
        (a, 1): ("view", T0 + 1000, T0 + 1200, False),
        (a, 2): ("click", T0 + 1200, T0 + 1500, False),
        (a, 3): ("view", T0 + 1500, None, True),
        (b, 1): ("view", T0 + 9000, None, True),
    }
