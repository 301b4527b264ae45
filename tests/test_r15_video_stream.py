"""Streaming video near-dup screen (the binary-media twin of
stream_lsh_screen): keyframe fingerprints maintained across batches,
candidate log per epoch, replay identity, per-item error isolation."""

from __future__ import annotations

import base64
import hashlib
import json
import struct

from pyspark.sql import functions as F


def _bmp(px):
    """8x8 24-bpp bottom-up BMP from 64 pixel values (the corpus
    builder's layout)."""
    rows = b"".join(
        bytes(b for c in range(8) for b in (px[r * 8 + c],) * 3)
        for r in range(7, -1, -1)
    )
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 8, 8, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
        + rows
    )


def _clip(seed: str, n_frames: int = 9) -> bytes:
    """A VID0 clip whose every frame is the same md5-derived still —
    two keyframe slots at every=8 (frames 0 and 8)."""
    from dataingestionplayground_spark.sources.multimodal import pack_video_frames

    px = [
        int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16) % 256
        for i in range(64)
    ]
    return pack_video_frames([_bmp(px)] * n_frames)


def _drop(watch, name: str, items) -> None:
    with open(watch / name, "w") as f:
        for doc_id, payload in items:
            f.write(
                json.dumps(
                    {
                        "doc_id": doc_id,
                        "content_b64": base64.b64encode(payload).decode(),
                    }
                )
                + "\n"
            )


def test_stream_video_screen_cross_batch_replay_and_isolation(spark, tmp_path):
    """A later batch's copy of an earlier clip is flagged against the
    TABLE (the earlier batch is never re-decoded); a corrupt container
    isolates (no fingerprints, no crash); a checkpoint-wiped replay
    converges to the identical log and fingerprint table."""
    import shutil

    from dataingestionplayground_spark.streaming.ingest import stream_video_screen

    watch = tmp_path / "watch"
    watch.mkdir()
    fps = str(tmp_path / "fps")
    log = str(tmp_path / "pairs_log")
    ckpt = str(tmp_path / "ckpt")

    def read_pairs():
        import glob

        if not glob.glob(f"{log}/epoch_id=*/*.parquet"):
            return spark.createDataFrame(
                [],
                "new_id string, old_id string, hamming long,"
                " would_drop boolean, epoch_id long",
            )
        return spark.read.parquet(log)

    _drop(watch, "b0.json", [(1, _clip("A")), (2, _clip("B"))])
    stream_video_screen(spark, str(watch), fps, log, ckpt).awaitTermination(60)
    assert read_pairs().count() == 0
    table = spark.read.parquet(fps)
    # 2 clips x 2 keyframe slots (frames 0 and 8 of 9)
    assert table.count() == 4
    assert {r["media_id"] for r in table.select("media_id").distinct().collect()} == {"1", "2"}

    # batch 2: a dup of clip 1, a fresh clip, and a corrupt payload
    _drop(
        watch,
        "b1.json",
        [(100, _clip("A")), (101, _clip("C")), (102, b"garbage-not-vid0")],
    )
    # lines whose content_b64 is not valid base64 must isolate (the
    # structural gate), not fail the micro-batch under ANSI unbase64:
    # 103 violates the alphabet, 104 has length % 4 != 0 ('abc'), 105
    # has padding in a 3-char tail ('A==') — the last two pass a
    # naive alphabet-only check yet still throw under strict decode
    with open(watch / "b1x.json", "a") as f:
        import json as _json

        f.write(_json.dumps({"doc_id": 103, "content_b64": "@@not-base64!!"}) + "\n")
        f.write(_json.dumps({"doc_id": 104, "content_b64": "abc"}) + "\n")
        f.write(_json.dumps({"doc_id": 105, "content_b64": "A=="}) + "\n")
    stream_video_screen(spark, str(watch), fps, log, ckpt).awaitTermination(60)
    logged = read_pairs().collect()
    pairs = {(r["new_id"], r["old_id"]) for r in logged}
    assert ("100", "1") in pairs
    assert all(n != "101" for n, _ in pairs)
    # the verify leg: an identical clip has aligned Hamming 0 and is
    # flagged for auto-drop, exactly as the batch twin grades it
    dup = next(r for r in logged if (r["new_id"], r["old_id"]) == ("100", "1"))
    assert dup["hamming"] == 0 and dup["would_drop"] is True
    table = spark.read.parquet(fps)
    ids = {r["media_id"] for r in table.select("media_id").distinct().collect()}
    assert ids == {"1", "2", "100", "101"}  # 102-105 isolated, not stored

    first_log = sorted(map(tuple, read_pairs().drop("epoch_id").collect()))
    first_table = sorted(map(tuple, table.collect()))

    # replay from a wiped checkpoint: anti-join appends nothing; each
    # epoch screens against table-minus-batch -> identical artifacts
    shutil.rmtree(ckpt)
    stream_video_screen(spark, str(watch), fps, log, ckpt).awaitTermination(60)
    assert sorted(map(tuple, spark.read.parquet(fps).collect())) == first_table
    assert sorted(map(tuple, read_pairs().drop("epoch_id").collect())) == first_log


def test_stream_video_screen_same_batch_duplicate_doc_id(spark, tmp_path):
    """A doc_id arriving in TWO files of one availableNow batch lands
    ONCE in the fingerprint table, with the deterministic min-payload
    pick (the stream_lsh_screen in-batch dedup rule)."""
    from dataingestionplayground_spark.streaming.ingest import stream_video_screen

    watch = tmp_path / "watch"
    watch.mkdir()
    fps = str(tmp_path / "fps")
    log = str(tmp_path / "pairs_log")
    ckpt = str(tmp_path / "ckpt")

    _drop(watch, "f1.json", [(7, _clip("A")), (2, _clip("B"))])
    _drop(watch, "f2.json", [(7, _clip("C"))])
    stream_video_screen(spark, str(watch), fps, log, ckpt).awaitTermination(60)

    stored = spark.read.parquet(fps)
    per_doc = {
        r["media_id"]: r["n"]
        for r in stored.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # one fingerprint set per id: 2 slots each, no duplicated rows
    assert per_doc == {"7": 2, "2": 2}
    # the canonical payload is deterministic: min(content_b64)
    expected_b64 = min(
        base64.b64encode(_clip("A")).decode(),
        base64.b64encode(_clip("C")).decode(),
    )
    expected_seed = "A" if expected_b64 == base64.b64encode(_clip("A")).decode() else "C"
    from dataingestionplayground_spark.sources.multimodal import (
        video_keyframe_hashes,
    )

    ref = video_keyframe_hashes(
        spark.createDataFrame(
            [("7", bytearray(_clip(expected_seed)))], "media_id string, content binary"
        )
    )
    want = sorted(map(tuple, ref.collect()))
    got = sorted(map(tuple, stored.filter(F.col("media_id") == "7").collect()))
    assert got == want


def test_stream_video_screen_batch_parity(spark, tmp_path):
    """Row-for-row parity with the batch twin on the SAME input: stream
    the sf0.001 corpus clips (doc_id % 7 != 0) into the fingerprint
    table, then the arriving slice (doc_id % 7 == 0) as a second batch
    — the streamed candidate log must equal multimodal_video_fp_
    incremental's (new_id, old_id, hamming, would_drop) exactly, the
    discipline every other streaming twin in the repo already meets."""
    from dataingestionplayground_spark.queries import all_queries
    from dataingestionplayground_spark.sources.multimodal import synth_video_clip

    multimodal_video_fp_incremental = all_queries()[
        "multimodal_video_fp_incremental"
    ].fn
    from dataingestionplayground_spark.streaming.ingest import stream_video_screen

    sf = "/root/testdata/sf0.001"
    doc_ids = [r["doc_id"] for r in spark.read.parquet(f"{sf}/documents.parquet").select("doc_id").collect()]

    watch = tmp_path / "watch"
    watch.mkdir()
    fps = str(tmp_path / "fps")
    log = str(tmp_path / "pairs_log")
    ckpt = str(tmp_path / "ckpt")

    cache: dict = {}
    corpus = [(int(d), synth_video_clip(d, cache)) for d in doc_ids if d % 7 != 0]
    arriving = [(int(d), synth_video_clip(d, cache)) for d in doc_ids if d % 7 == 0]

    _drop(watch, "corpus.json", corpus)
    stream_video_screen(spark, str(watch), fps, log, ckpt).awaitTermination(120)
    _drop(watch, "arriving.json", arriving)
    stream_video_screen(spark, str(watch), fps, log, ckpt).awaitTermination(120)

    got = sorted(
        (int(r["new_id"]), int(r["old_id"]), r["hamming"], r["would_drop"])
        for r in spark.read.parquet(log).collect()
    )
    want = sorted(
        (r["new_id"], r["old_id"], r["hamming"], r["would_drop"])
        for r in multimodal_video_fp_incremental(spark, sf).collect()
    )
    assert got == want and len(want) > 0
