"""Structured Streaming twins driven to completion with a file source +
memory sink (bounded input == batch semantics, SURVEY.md §2.10)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataingestionplayground_spark.streaming import (
    stream_dedup_within_watermark,
    stream_session_windows,
    stream_stateful_running_max,
    stream_tumbling_counts,
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """Small bounded event set written as parquet for readStream."""
    p = tmp_path_factory.mktemp("events_stream")
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 10:04:00", 1, "click", 2.0, "{}"),
        (3, "2024-01-01 10:11:00", 1, "view", 3.0, "{}"),
        (2, "2024-01-01 10:04:00", 1, "click", 2.0, "{}"),  # duplicate event_id
        (4, "2024-01-01 12:00:00", 2, "click", 9.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(str(p))
    return str(p)


def _run(stream_df, name, mode):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name


def test_stream_tumbling(spark, stream_dir):
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(stream_dir)
    name = _run(stream_tumbling_counts(events, "10 minutes"), "t_tumble", "complete")
    rows = {(r.window_start.isoformat(), r.event_type): r.n_events
            for r in spark.sql(f"select * from {name}").collect()}
    assert rows[("2024-01-01T10:00:00", "click")] == 3  # incl. duplicate row
    assert rows[("2024-01-01T10:10:00", "view")] == 1


def test_stream_sessions(spark, stream_dir):
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(stream_dir)
    name = _run(stream_session_windows(events, gap="30 minutes"), "t_sess", "complete")
    rows = spark.sql(f"select * from {name}").collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r.n_events)
    assert sorted(per_user[1]) == [4]  # one session (max gap 7 min)
    assert per_user[2] == [1]


def test_stream_dedup(spark, stream_dir):
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(stream_dir)
    name = _run(stream_dedup_within_watermark(events), "t_dedup", "append")
    ids = [r.event_id for r in spark.sql(f"select * from {name}").collect()]
    assert sorted(ids) == [1, 2, 3, 4]  # duplicate event_id 2 dropped


def test_stream_stateful_running_max(spark, stream_dir):
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(stream_dir)
    name = _run(stream_stateful_running_max(events), "t_state", "update")
    rows = {r.user_id: r for r in spark.sql(f"select * from {name}").collect()}
    assert rows[1].max_value == 3.0 and rows[1].n_seen == 4
    assert rows[2].max_value == 9.0


def test_stream_ingest_markdown_exactly_once(spark, tmp_path):
    """Streaming ingest: files arrive -> chunks appear in the collection;
    restart/replay does not duplicate documents (idempotent sink)."""
    import json

    from dataingestionplayground_spark.ingest.store import CollectionStore
    from dataingestionplayground_spark.streaming.ingest import stream_ingest_markdown

    watch = tmp_path / "incoming"
    watch.mkdir()
    (watch / "b1.jsonl").write_text(
        json.dumps({"doc_id": "d1", "content": "# T1\n\nalpha beta gamma delta"}) + "\n"
        + json.dumps({"doc_id": "d2", "content": "# T2\n\nepsilon zeta eta theta"}) + "\n"
    )
    store = CollectionStore(str(tmp_path / "store"))
    ckpt = str(tmp_path / "ckpt")

    q = stream_ingest_markdown(spark, str(watch), store, "live", ckpt, max_tokens=8, overlap=0)
    q.awaitTermination()
    first = store.read(spark, "live").collect()
    docs = {r.documentid for r in first}
    assert docs == {"d1", "d2"}
    assert all(len(r.embedding) == 384 for r in first)

    # second batch arrives + an already-seen document re-delivered
    (watch / "b2.jsonl").write_text(
        json.dumps({"doc_id": "d3", "content": "# T3\n\niota kappa"}) + "\n"
        + json.dumps({"doc_id": "d1", "content": "# T1\n\nalpha beta gamma delta"}) + "\n"
    )
    q2 = stream_ingest_markdown(spark, str(watch), store, "live", ckpt, max_tokens=8, overlap=0)
    q2.awaitTermination()
    rows = store.read(spark, "live").collect()
    assert {r.documentid for r in rows} == {"d1", "d2", "d3"}
    n_d1 = sum(1 for r in rows if r.documentid == "d1")
    assert n_d1 == sum(1 for r in first if r.documentid == "d1")  # no dupes


def test_batch_stream_tumbling_parity(spark, stream_dir):
    """The streaming tumbling window and the batch epoch-bucket query
    produce identical aggregates on bounded input."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(stream_dir)
    name = _run(stream_tumbling_counts(events, "10 minutes"), "t_parity", "complete")
    stream_rows = {
        (int(r.window_start.timestamp()), r.event_type): (r.n_events, round(r.total_value, 6))
        for r in spark.sql(f"select * from {name}").collect()
    }
    batch_df = spark.read.schema(EVENTS_SCHEMA).parquet(stream_dir)
    batch_rows = {}
    import pyspark.sql.functions as F

    agg = (
        batch_df.withColumn("ws", (F.floor(F.unix_timestamp("ts") / 600) * 600).cast("long"))
        .groupBy("ws", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )
    for r in agg.collect():
        batch_rows[(r.ws, r.event_type)] = (r.n, round(r.v, 6))
    assert stream_rows == batch_rows


def test_stream_stream_interval_join(spark, stream_dir):
    """Purchases attribute to same-user clicks within the interval."""
    from dataingestionplayground_spark.streaming import stream_stream_interval_join

    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(stream_dir)
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "view")  # stand-in stage
    joined = stream_stream_interval_join(clicks, purchases, within="1 hour")
    name = _run(joined, "t_ssj", "append")
    rows = spark.sql(f"select * from {name}").collect()
    # user 1: view @10:11 attributes to clicks @10:00 and @10:04 (dup click
    # event_id 2 appears twice in the fixture -> 3 joined rows)
    assert len(rows) == 3
    assert all(r.p_user == 1 for r in rows)
    assert all(r.click_ts <= r.purchase_ts for r in rows)


def test_stream_sliding(spark, stream_dir):
    from dataingestionplayground_spark.streaming import stream_sliding_counts

    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(stream_dir)
    name = _run(stream_sliding_counts(events, "10 minutes", "5 minutes"), "t_slide", "complete")
    rows = {r.window_start.isoformat(): r.n_events for r in spark.sql(f"select * from {name}").collect()}
    # events at 10:00,10:04(x2),10:11 -> window 10:00-10:10 holds 3,
    # window 09:55-10:05 holds 3, window 10:05-10:15 holds 1
    assert rows["2024-01-01T10:00:00"] == 3
    assert rows["2024-01-01T09:55:00"] == 3
    assert rows["2024-01-01T10:05:00"] == 1


def test_batch_stream_session_parity(spark, stream_dir):
    """Gap-based batch sessionization and streaming session_window produce
    the same session partitioning on bounded input."""
    from dataingestionplayground_spark.operators.sessionize import sessionize

    batch = spark.read.schema(EVENTS_SCHEMA).parquet(stream_dir)
    b = (
        sessionize(batch, "user_id", "ts", gap_seconds=1800)
        .groupBy("user_id", "session_id")
        .count()
        .collect()
    )
    batch_sizes = {}
    for r in b:
        batch_sizes.setdefault(r.user_id, []).append(r["count"])

    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(stream_dir)
    name = _run(stream_session_windows(events, gap="30 minutes"), "t_sess_par", "complete")
    stream_sizes = {}
    for r in spark.sql(f"select * from {name}").collect():
        stream_sizes.setdefault(r.user_id, []).append(r.n_events)

    assert {k: sorted(v) for k, v in batch_sizes.items()} == {
        k: sorted(v) for k, v in stream_sizes.items()
    }


def test_stream_running_stats_transform_with_state(spark, stream_dir):
    # runs only where protobuf exists (Spark 4's transformWithState
    # protocol dependency); skipped in this container
    pytest.importorskip("google.protobuf")
    from dataingestionplayground_spark.streaming import stream_running_stats_tws

    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(stream_dir)
    name = _run(stream_running_stats_tws(events), "t_tws", "update")
    rows = {r.user_id: r for r in spark.sql(f"select * from {name}").collect()}
    # user 1: values 1,2,3,2 (dup event ids NOT deduped here) -> sum 8, n 4, max 3
    assert rows[1].total == 8.0 and rows[1].n_seen == 4 and rows[1].max_value == 3.0
    assert rows[2].total == 9.0 and rows[2].n_seen == 1 and rows[2].max_value == 9.0


def test_stream_running_stats_degrades_gracefully(spark, stream_dir):
    """Without protobuf, stream_running_stats_tws must ROUTE to the
    applyInPandasWithState twin and produce the same answers — never a
    user-facing raise on stock Spark 4 (round-2 verdict item 8)."""
    from dataingestionplayground_spark.streaming.windows import (
        stream_running_stats_tws,
        tws_available,
    )

    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(stream_dir)
    # force_fallback pins the twin even where protobuf exists; without
    # protobuf the plain call takes the same path
    q = stream_running_stats_tws(events) if not tws_available() else (
        stream_running_stats_tws(events, force_fallback=True)
    )
    name = _run(q, "t_tws_fb", "update")
    rows = {r.user_id: r for r in spark.sql(f"select * from {name}").collect()}
    assert rows[1].total == 8.0 and rows[1].n_seen == 4 and rows[1].max_value == 3.0
    assert rows[2].total == 9.0 and rows[2].n_seen == 1 and rows[2].max_value == 9.0


def test_stream_tws_parity_with_fallback(spark, stream_dir):
    """Where the Spark 4 state API CAN run, both implementations must
    agree row-for-row (skipped without protobuf)."""
    pytest.importorskip("google.protobuf")
    from dataingestionplayground_spark.streaming import stream_running_stats_tws

    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(stream_dir)
    a = _run(stream_running_stats_tws(events), "t_tws_real", "update")
    b = _run(stream_running_stats_tws(events, force_fallback=True), "t_tws_twin", "update")
    ra = sorted(map(tuple, spark.sql(f"select * from {a}").collect()))
    rb = sorted(map(tuple, spark.sql(f"select * from {b}").collect()))
    assert ra == rb

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

DOCS_SF_FILE = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs_stream_dir(tmp_path_factory):
    """FileStreamSource wants a directory; link the single testdata
    parquet file into one."""
    import os

    d = tmp_path_factory.mktemp("docs_stream")
    os.symlink(DOCS_SF_FILE, str(d / "documents.parquet"))
    return str(d)


def test_stream_quality_scores_batch_parity(spark, docs_stream_dir):
    """Stateless quality scoring: streaming result == batch query result
    on bounded input (same Catalyst expressions by construction)."""
    from dataingestionplayground_spark.streaming import stream_quality_scores
    from dataingestionplayground_spark.queries.textq import quality_scores

    docs = spark.readStream.schema(DOCS_SCHEMA).parquet(docs_stream_dir)
    name = _run(stream_quality_scores(docs), "t_quality", "append")
    stream_rows = {
        r.doc_id: (r.n_toks, r.n_stop, round(r.quality, 9))
        for r in spark.sql(f"select * from {name}").collect()
    }
    batch_rows = {
        r.doc_id: (r.n_toks, r.n_stop, round(r.quality, 9))
        for r in quality_scores(spark.read.parquet(DOCS_SF_FILE)).collect()
    }
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


def test_stream_pack_sequences_batch_parity(spark, docs_stream_dir):
    """Stateful packing: one bounded micro-batch packs exactly like the
    batch window query (doc_id order within each shard)."""
    from dataingestionplayground_spark.queries.pipelineq import ingest_pack_sequences
    from dataingestionplayground_spark.streaming import stream_pack_sequences

    docs = spark.readStream.schema(DOCS_SCHEMA).parquet(docs_stream_dir)
    name = _run(stream_pack_sequences(docs), "t_pack", "update")
    stream_rows = {
        r.doc_id: (r.source, r.n_toks, r.bin_id, r.bin_offset)
        for r in spark.sql(f"select * from {name}").collect()
    }
    batch_rows = {
        r.doc_id: (r.source, r.n_toks, r.bin_id, r.bin_offset)
        for r in ingest_pack_sequences(spark, "/root/testdata/sf0.001").collect()
    }
    assert stream_rows == batch_rows
    assert len(stream_rows) == 500


def test_stream_pack_sequences_state_carries_across_batches(spark, tmp_path):
    """A shard's running token count survives micro-batch boundaries: with
    maxFilesPerTrigger=1 each file is its own micro-batch, and the second
    batch's doc starts at the first batch's cumulative offset."""
    import os
    import time

    from dataingestionplayground_spark.streaming import stream_pack_sequences

    d = tmp_path / "docs"
    d.mkdir()
    b1 = spark.createDataFrame([(1, "alpha beta gamma", "en", "s1", 16)], DOCS_SCHEMA)
    b1.write.parquet(str(d / "b1.parquet"))
    time.sleep(1.1)  # FileStreamSource batches by mtime order
    b2 = spark.createDataFrame(
        [(2, "delta epsilon zeta eta theta", "en", "s1", 28)], DOCS_SCHEMA
    )
    b2.write.parquet(str(d / "b2.parquet"))

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*.parquet"))
    )
    q = (
        stream_pack_sequences(stream, capacity=4)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_pack_multi")
        .start()
    )
    q.processAllAvailable()
    n_batches = q.lastProgress["batchId"] + 1
    q.stop()
    rows = {r.doc_id: r for r in spark.sql("select * from t_pack_multi").collect()}
    assert n_batches >= 2  # the two files really were separate micro-batches
    # doc 1: 3 tokens from offset 0; doc 2 resumes at cum=3 -> bin 0 offset 3
    assert rows[1].bin_id == 0 and rows[1].bin_offset == 0
    assert rows[2].bin_id == 0 and rows[2].bin_offset == 3 and rows[2].n_toks == 5


def test_stream_decontaminate_matches_batch(spark, docs_stream_dir):
    """Stream-static decontamination: streaming overlap counts on bounded
    input equal the batch query's non-zero rows."""
    from pyspark.sql import functions as F

    from dataingestionplayground_spark.functions import text as TX
    from dataingestionplayground_spark.queries.pipelineq import dedup_decontaminate
    from dataingestionplayground_spark.streaming import stream_decontaminate

    static_docs = spark.read.schema(DOCS_SCHEMA).parquet(DOCS_SF_FILE)
    eval_grams = (
        static_docs.filter(F.col("doc_id") % 25 == 0)
        .select(TX.tokens("text").alias("__tk"))
        .select(F.explode(F.array_distinct(TX.shingles_from_tokens("__tk", 3))).alias("g"))
        .distinct()
    )
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .parquet(docs_stream_dir)
        .filter(F.col("doc_id") % 25 != 0)
    )
    name = _run(stream_decontaminate(stream, eval_grams), "t_decon", "update")
    stream_rows = {
        r.doc_id: r.n_overlap for r in spark.sql(f"select * from {name}").collect()
    }
    batch_rows = {
        r.doc_id: r.n_overlap
        for r in dedup_decontaminate(spark, "/root/testdata/sf0.001").collect()
        if r.n_overlap > 0
    }
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


def test_stream_nb_score_batch_parity(spark, docs_stream_dir):
    """Train-batch / apply-stream: the NB model trained by the batch
    registry query, applied to a document STREAM via the stateless
    map-literal scorer, reproduces the batch log-odds exactly."""
    from dataingestionplayground_spark.queries import all_queries
    from dataingestionplayground_spark.streaming.documents import (
        nb_classifier_model,
        stream_nb_score,
    )

    weights, prior = nb_classifier_model(spark, "/root/testdata/sf0.001")
    assert 0 < len(weights) <= 256
    docs = spark.readStream.schema(DOCS_SCHEMA).parquet(docs_stream_dir)
    name = _run(
        stream_nb_score(docs.select("doc_id", "text"), weights, prior),
        "t_nb_score",
        "append",
    )
    stream_rows = {
        r.doc_id: (r.n_toks, round(r.log_odds, 9), r.pred_pos)
        for r in spark.sql(f"select * from {name}").collect()
    }
    batch_rows = {
        r.doc_id: (r.n_toks, round(r.log_odds, 9), r.pred_pos)
        for r in all_queries()["text_nb_quality_classifier"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


def test_stream_cusum_batch_parity(spark, tmp_path):
    """Train-batch / apply-stream CUSUM: a bounded stream delivered as
    one micro-batch must reproduce the batch changepoint query's alarm
    set exactly (all-integer arithmetic, same scan)."""
    import os

    from dataingestionplayground_spark.queries import all_queries
    from dataingestionplayground_spark.streaming.windows import (
        cusum_user_stats,
        stream_cusum_alarms,
    )

    sf = "/root/testdata/sf0.001"
    d = tmp_path / "events_sf_stream"
    d.mkdir()
    os.symlink(f"{sf}/events.parquet", str(d / "events.parquet"))
    stats = cusum_user_stats(spark, sf)
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(d))
    name = _run(stream_cusum_alarms(events, stats), "t_cusum", "update")
    stream_rows = {
        (r.user_id, r.event_id): (r.cusum4, r.threshold4)
        for r in spark.sql(f"select * from {name}").collect()
    }
    batch_rows = {
        (r.user_id, r.event_id): (r.cusum4, r.threshold4)
        for r in all_queries()["events_changepoint_cusum"].fn(spark, sf).collect()
    }
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


def test_stream_nb_score_empty_model(spark):
    """Zero trained weights (r8 ADVICE): the empty map literal must be
    typed map<bigint,decimal> so the bigint element_at still ANALYZES —
    every lookup misses and the n_toks>0 gate drops every row."""
    from dataingestionplayground_spark.streaming.documents import stream_nb_score

    docs = spark.createDataFrame(
        [(1, "some words here"), (2, "")], "doc_id long, text string"
    )
    out = stream_nb_score(docs, [], "0")  # batch frame: same expression tree
    assert out.count() == 0


def test_stream_quality_gate_batch_parity(spark, docs_stream_dir):
    """r12 verdict item 5a: the frozen-model streaming quality gate,
    applied to the SAME corpus the model was frozen from, reproduces
    the oracle-checked batch ensemble row-for-row (NB log-odds, frozen-
    LM perplexity, Gopher fraction, blend, keep)."""
    from dataingestionplayground_spark.queries import all_queries
    from dataingestionplayground_spark.streaming.documents import (
        quality_gate_model,
        stream_quality_gate,
    )

    sf = "/root/testdata/sf0.001"
    model = quality_gate_model(spark, sf)
    assert 0 < len(model["nb_weights"]) <= 256
    assert model["lm_total"] > 0 and len(model["vocab"]) > 0
    docs = spark.readStream.schema(DOCS_SCHEMA).parquet(docs_stream_dir)
    name = _run(
        stream_quality_gate(docs.select("doc_id", "text"), model),
        "t_qgate",
        "append",
    )
    stream_rows = {
        r.doc_id: (r.nb_score, r.ppl_score, r.gopher_score, r.quality, r.keep)
        for r in spark.sql(f"select * from {name}").collect()
    }
    batch_rows = {
        r.doc_id: (r.nb_score, r.ppl_score, r.gopher_score, r.quality, r.keep)
        for r in all_queries()["text_quality_ensemble"].fn(spark, sf).collect()
    }
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


def test_stream_quality_gate_unseen_tokens(spark):
    """Post-training documents: unseen NB buckets contribute 0 weight,
    LM-unknown tokens are excluded from the perplexity mean (the batch
    inner-join semantics), and a doc with NO model-known token drops
    instead of erroring."""
    from dataingestionplayground_spark.streaming.documents import (
        quality_gate_model,
        stream_quality_gate,
    )

    model = quality_gate_model(spark, "/root/testdata/sf0.001")
    known = model["vocab"][0][0]
    docs = spark.createDataFrame(
        [
            (1, " ".join([known] * 12 + ["zzqqxx"] * 3)),  # mixed
            (2, "zzqqxx wwvvuu ttrrss"),  # nothing the model knows
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in stream_quality_gate(docs, model).collect()}
    assert set(rows) == {1}  # the all-unseen doc drops, no error
    r = rows[1]
    for v in (r.nb_score, r.ppl_score, r.gopher_score, r.quality):
        assert v is not None


def test_stream_cusum_carries_state_across_microbatches(spark, tmp_path):
    """Split the events by time into two files delivered as two
    micro-batches (maxFilesPerTrigger=1): the carried per-user S state
    must make the two-batch run reproduce the batch alarm set exactly."""
    import os

    from dataingestionplayground_spark.queries import all_queries
    from dataingestionplayground_spark.streaming.windows import (
        cusum_user_stats,
        stream_cusum_alarms,
    )

    sf = "/root/testdata/sf0.001"
    full = spark.read.parquet(f"{sf}/events.parquet")
    cut = full.selectExpr("percentile(unix_micros(cast(ts as timestamp)), 0.5) c").first()["c"]
    d = tmp_path / "events_2files"
    d.mkdir()
    # one file per half; per-user events in file 0 all precede file 1
    early = full.filter(F.expr("unix_micros(cast(ts as timestamp))") <= cut)
    late = full.filter(F.expr("unix_micros(cast(ts as timestamp))") > cut)
    early.coalesce(1).write.parquet(str(d / "f0"))
    late.coalesce(1).write.parquet(str(d / "f1"))
    src = tmp_path / "stream_src"
    src.mkdir()
    n = 0
    for sub in ("f0", "f1"):
        for fn in sorted(os.listdir(d / sub)):
            if fn.endswith(".parquet"):
                target = d / sub / fn
                # FileStreamSource orders candidate files by mtime; the
                # two targets are written milliseconds apart and an mtime
                # TIE would leave delivery order to listing tie-breaks —
                # pin strictly increasing mtimes so f0 always precedes f1
                # (r8 ADVICE)
                os.utime(target, (1_700_000_000 + n, 1_700_000_000 + n))
                os.symlink(str(target), str(src / f"part-{n}.parquet"))
                n += 1
    assert n == 2
    stats = cusum_user_stats(spark, sf)
    events = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    name = _run(stream_cusum_alarms(events, stats), "t_cusum2", "update")
    stream_rows = {
        (r.user_id, r.event_id): (r.cusum4, r.threshold4)
        for r in spark.sql(f"select * from {name}").collect()
    }
    batch_rows = {
        (r.user_id, r.event_id): (r.cusum4, r.threshold4)
        for r in all_queries()["events_changepoint_cusum"].fn(spark, sf).collect()
    }
    assert stream_rows == batch_rows and len(stream_rows) > 0


def test_stream_psi_monitor_matches_batch_and_is_epoch_keyed(spark, tmp_path):
    """Train-batch / monitor-stream drift detection: delivering the
    batch query's exact current window (Jan 16-30) as one micro-batch
    must reproduce events_psi_drift's per-type PSI bit-for-bit (the
    two paths compute counts independently and share only
    psi_from_dense); a restart processes only new files and earlier
    epoch partitions stay byte-stable."""
    import json as _json

    from dataingestionplayground_spark.queries import all_queries
    from dataingestionplayground_spark.streaming.ingest import (
        psi_reference,
        stream_psi_monitor,
    )

    sf = "/root/testdata/sf0.001"
    ref = psi_reference(spark, sf)
    assert len(ref) == 5 * 10 and all(n >= 0 for _, _, n in ref)

    from dataingestionplayground_spark.session import load_table

    cur = (
        load_table(spark, sf, "events")
        .filter(F.col("ts") >= F.lit("2024-01-16").cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type", "value")
        .collect()
    )
    watch = tmp_path / "watch"
    watch.mkdir()

    def drop(name, rows):
        with open(watch / name, "w") as f:
            for r in rows:
                f.write(
                    _json.dumps(
                        {
                            "event_id": r["event_id"],
                            "ts": r["ts"].isoformat(),
                            "user_id": r["user_id"],
                            "event_type": r["event_type"],
                            "value": r["value"],
                        }
                    )
                    + "\n"
                )

    drop("cur.json", cur)
    log = str(tmp_path / "drift_log")
    ckpt = str(tmp_path / "ckpt")
    q = stream_psi_monitor(spark, str(watch), ref, log, ckpt)
    q.awaitTermination(60)

    got = {
        r["event_type"]: (r["psi"], r["drifted"], r["cur_total"])
        for r in spark.read.parquet(log).collect()
    }
    want = {
        r["event_type"]: (r["psi"], r["drifted"], r["cur_total"])
        for r in all_queries()["events_psi_drift"].fn(spark, sf).collect()
    }
    assert got == want and len(got) == 5

    # second drop -> only the NEW file becomes an epoch; epoch-0 rows
    # (keyed partitions) are untouched by the restart
    import os

    epoch0_files = sorted(os.listdir(os.path.join(log, "epoch_id=0")))
    drop("more.json", cur[:50])
    q2 = stream_psi_monitor(spark, str(watch), ref, log, ckpt)
    q2.awaitTermination(60)
    log_df = spark.read.parquet(log)
    assert log_df.select("epoch_id").distinct().count() == 2
    assert sorted(os.listdir(os.path.join(log, "epoch_id=0"))) == epoch0_files
    got0 = {
        r["event_type"]: (r["psi"], r["drifted"], r["cur_total"])
        for r in log_df.filter(F.col("epoch_id") == 0).collect()
    }
    assert got0 == want


def _psi_drop(watch, name, rows):
    import json as _json

    with open(watch / name, "w") as f:
        for r in rows:
            f.write(
                _json.dumps(
                    {
                        "event_id": r[0],
                        "ts": r[1],
                        "user_id": r[2],
                        "event_type": r[3],
                        "value": r[4],
                    }
                )
                + "\n"
            )


def test_stream_psi_monitor_replay_identity_and_negative_control(spark, tmp_path):
    """PSI drift-log exactly-once (r9 verdict item 8 — same evidence
    grade as the frequency rollup): replaying epoch 0 from a wiped
    checkpoint rewrites its own epoch partition to the identical rows
    (dynamic partition overwrite, not append), while the SAME events
    re-delivered as a NEW file land under a fresh epoch and add rows —
    proving the retry safety is the epoch keying, not the data."""
    import shutil

    from dataingestionplayground_spark.streaming.ingest import stream_psi_monitor

    ref = [("click", b, 10) for b in range(10)]
    watch = tmp_path / "watch"
    watch.mkdir()
    rows = [(i, "2024-02-01T00:00:00", 1, "click", 470.0 + i) for i in range(20)]
    _psi_drop(watch, "b0.json", rows)
    log = str(tmp_path / "drift_log")
    ckpt = str(tmp_path / "ckpt")
    q = stream_psi_monitor(spark, str(watch), ref, log, ckpt)
    q.awaitTermination(60)
    first = sorted(map(tuple, spark.read.parquet(log).collect()))
    assert len(first) == 1 and first[0][-1] == 0  # one type, epoch 0

    # replay identity: wipe the checkpoint so the SAME file re-runs as
    # epoch 0 again — the epoch-keyed dynamic overwrite converges to
    # the identical log (an append-mode log would now hold 2 rows)
    shutil.rmtree(ckpt)
    q2 = stream_psi_monitor(spark, str(watch), ref, log, ckpt)
    q2.awaitTermination(60)
    assert sorted(map(tuple, spark.read.parquet(log).collect())) == first

    # negative control: identical events under a NEW epoch add rows
    _psi_drop(watch, "b1.json", rows)
    q3 = stream_psi_monitor(spark, str(watch), ref, log, ckpt)
    q3.awaitTermination(60)
    log_df = spark.read.parquet(log)
    assert log_df.count() == 2
    assert log_df.select("epoch_id").distinct().count() == 2
    # both epochs carry the same PSI for the same data
    psis = {r["epoch_id"]: r["psi"] for r in log_df.collect()}
    assert psis[min(psis)] == psis[max(psis)]


def test_stream_psi_monitor_surfaces_unseen_event_types(spark, tmp_path):
    """A type the frozen reference never saw must surface as maximal
    drift, not vanish (r9 ADVICE: the old ref-LEFT-join densification
    dropped it from the log entirely — a monitoring blind spot)."""
    from dataingestionplayground_spark.streaming.ingest import stream_psi_monitor

    ref = [("click", b, 10) for b in range(10)]
    watch = tmp_path / "watch"
    watch.mkdir()
    rows = [(i, "2024-02-01T00:00:00", 1, "brand_new", 470.0) for i in range(30)]
    _psi_drop(watch, "b0.json", rows)
    log = str(tmp_path / "drift_log")
    q = stream_psi_monitor(spark, str(watch), ref, log, str(tmp_path / "ckpt"))
    q.awaitTermination(60)
    got = {r["event_type"]: r for r in spark.read.parquet(log).collect()}
    assert set(got) == {"click", "brand_new"}
    new = got["brand_new"]
    assert new["ref_total"] == 0 and new["cur_total"] == 30
    assert new["drifted"] and new["psi"] > 0.25
    # the known-but-absent type stays in the log too; with a UNIFORM
    # reference its add-one-smoothed zero counts are also uniform, so
    # its PSI is exactly 0 — absence of data is not distribution drift
    assert got["click"]["cur_total"] == 0 and got["click"]["psi"] == 0.0


def test_stream_ema_carries_ring_buffer_across_microbatches(spark, tmp_path):
    """Two time-split micro-batches must reproduce the batch EMA's exact
    integers (ema_num/ema_den) for every event: the carried <=19-value
    ring buffer supplies exactly the history the 20-event window needs
    at the batch boundary."""
    import os

    from dataingestionplayground_spark.queries import all_queries
    from dataingestionplayground_spark.streaming.windows import stream_ema_smooth

    sf = "/root/testdata/sf0.001"
    full = spark.read.parquet(f"{sf}/events.parquet")
    cut = full.selectExpr(
        "percentile(unix_micros(cast(ts as timestamp)), 0.5) c"
    ).first()["c"]
    d = tmp_path / "ema_2files"
    d.mkdir()
    early = full.filter(F.expr("unix_micros(cast(ts as timestamp))") <= cut)
    late = full.filter(F.expr("unix_micros(cast(ts as timestamp))") > cut)
    early.coalesce(1).write.parquet(str(d / "f0"))
    late.coalesce(1).write.parquet(str(d / "f1"))
    src = tmp_path / "ema_src"
    src.mkdir()
    n = 0
    for sub in ("f0", "f1"):
        for fn in sorted(os.listdir(d / sub)):
            if fn.endswith(".parquet"):
                target = d / sub / fn
                os.utime(target, (1_700_000_000 + n, 1_700_000_000 + n))
                os.symlink(str(target), str(src / f"part-{n}.parquet"))
                n += 1
    assert n == 2
    events = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    name = _run(stream_ema_smooth(events), "t_ema2", "update")
    stream_rows = {
        r.event_id: (r.n_window, r.ema_num, r.ema_den, r.ema)
        for r in spark.sql(f"select * from {name}").collect()
    }
    batch_rows = {
        r.event_id: (r.n_window, r.ema_num, r.ema_den, r.ema)
        for r in all_queries()["events_ema_smooth"].fn(spark, sf).collect()
    }
    assert stream_rows == batch_rows
    assert len(stream_rows) == full.count()
    # at least one user genuinely spans the cut with a non-full window
    # (otherwise the carried state was never exercised)
    spanning = [
        eid for eid, (m, *_rest) in stream_rows.items() if 1 < m <= 19
    ]
    assert spanning


def test_stream_bot_regularity_parity_across_split(spark, tmp_path):
    """Two time-split micro-batches must leave every user's LAST
    emission bit-identical to the batch events_bot_regularity row: the
    carried (prev_us, n, sum, sum-of-squares) state supplies exactly
    the boundary gap and the decimal-exact totals."""
    import os

    from dataingestionplayground_spark.queries import all_queries
    from dataingestionplayground_spark.streaming.windows import stream_bot_regularity

    sf = "/root/testdata/sf0.001"
    full = spark.read.parquet(f"{sf}/events.parquet")
    cut = full.selectExpr(
        "percentile(unix_micros(cast(ts as timestamp)), 0.5) c"
    ).first()["c"]
    d = tmp_path / "bot_2files"
    d.mkdir()
    early = full.filter(F.expr("unix_micros(cast(ts as timestamp))") <= cut)
    late = full.filter(F.expr("unix_micros(cast(ts as timestamp))") > cut)
    early.coalesce(1).write.parquet(str(d / "f0"))
    late.coalesce(1).write.parquet(str(d / "f1"))
    src = tmp_path / "bot_src"
    src.mkdir()
    n = 0
    for fname in ("f0", "f1"):
        for fn in sorted(os.listdir(d / fname)):
            if fn.endswith(".parquet"):
                target = d / fname / fn
                os.utime(target, (1_700_000_000 + n, 1_700_000_000 + n))
                os.symlink(str(target), str(src / f"part-{n}.parquet"))
                n += 1
    assert n == 2
    events = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    name = _run(stream_bot_regularity(events), "t_bot2", "update")
    # update mode emits one row per user per touching batch — the
    # monotone n_gaps picks each user's LAST (cumulative) emission
    emitted = spark.sql(f"select * from {name}").collect()
    last = {}
    for r in emitted:
        if r.user_id not in last or r.n_gaps > last[r.user_id].n_gaps:
            last[r.user_id] = r
    stream_rows = {
        u: (r.n_gaps, r.mean_gap, r.cv_gap, r.bot_like) for u, r in last.items()
    }
    batch_rows = {
        r.user_id: (r.n_gaps, r.mean_gap, r.cv_gap, r.bot_like)
        for r in all_queries()["events_bot_regularity"].fn(spark, sf).collect()
    }
    assert stream_rows == batch_rows and len(stream_rows) > 0
    # the split must genuinely exercise the carry: some user has events
    # on both sides of the cut
    both = (
        early.select("user_id").distinct().join(
            late.select("user_id").distinct(), "user_id"
        ).count()
    )
    assert both > 0


def test_stream_ingest_with_index_keeps_codes_fresh_and_replay_safe(spark, tmp_path):
    """Streaming ingest + index maintenance: after each drop the PQ code
    table covers exactly the collection's chunks (search never lags the
    stream by more than a batch), and a checkpoint-wiped replay finds
    nothing to encode — no duplicate code rows."""
    import json as _json
    import shutil

    from dataingestionplayground_spark.ingest.ann_index import (
        index_staleness,
        pq_search_indexed,
        read_pq_codes,
    )
    from dataingestionplayground_spark.ingest.store import CollectionStore
    from dataingestionplayground_spark.streaming.ingest import stream_ingest_with_index

    watch = tmp_path / "incoming"
    watch.mkdir()
    (watch / "b1.jsonl").write_text(
        _json.dumps({"doc_id": "d1", "content": "# T1\n\nalpha beta gamma delta"})
        + "\n"
        + _json.dumps({"doc_id": "d2", "content": "# T2\n\nepsilon zeta eta theta"})
        + "\n"
    )
    store = CollectionStore(str(tmp_path / "store"))
    ckpt = str(tmp_path / "ckpt")
    q = stream_ingest_with_index(
        spark, str(watch), store, "live", ckpt, max_tokens=8, overlap=0
    )
    q.awaitTermination()
    n_chunks = store.read(spark, "live").count()
    codes = read_pq_codes(spark, store, "live")
    assert codes.count() == n_chunks > 0
    stale = index_staleness(spark, store, "live")
    assert stale["missing"] == 0 and stale["orphaned"] == 0

    # second drop: index grows with the collection, by exactly the delta
    (watch / "b2.jsonl").write_text(
        _json.dumps({"doc_id": "d3", "content": "# T3\n\niota kappa lambda mu"}) + "\n"
    )
    q2 = stream_ingest_with_index(
        spark, str(watch), store, "live", ckpt, max_tokens=8, overlap=0
    )
    q2.awaitTermination()
    n_chunks2 = store.read(spark, "live").count()
    codes2 = read_pq_codes(spark, store, "live")
    assert n_chunks2 > n_chunks and codes2.count() == n_chunks2
    assert codes2.select("key").distinct().count() == n_chunks2

    # replay both files from a wiped checkpoint: the anti-join legs find
    # nothing to ingest or encode — counts unchanged, keys still unique
    shutil.rmtree(ckpt)
    q3 = stream_ingest_with_index(
        spark, str(watch), store, "live", ckpt, max_tokens=8, overlap=0
    )
    q3.awaitTermination()
    codes3 = read_pq_codes(spark, store, "live")
    assert store.read(spark, "live").count() == n_chunks2
    assert codes3.count() == n_chunks2
    assert codes3.select("key").distinct().count() == n_chunks2

    # and the maintained index actually searches
    from pyspark.sql import functions as F

    qv = (
        store.read(spark, "live")
        .limit(1)
        .select(
            F.lit("q0").alias("query_id"), F.col("embedding").alias("query_vec")
        )
    )
    hits = pq_search_indexed(spark, store, "live", qv, k=3).collect()
    assert len(hits) > 0


def _lsh_drop(watch, name, docs):
    import json as _json

    with open(watch / name, "w") as f:
        for doc_id, text in docs:
            f.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")


_LSH_A = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm stove and the rain falls softly on the old tin roof "
    "of the quiet house by the river bend where children play"
)
_LSH_B = (
    "completely different text about spark shuffles and broadcast "
    "joins in distributed query engines running columnar scans over "
    "parquet files stored across many partitioned directories today"
)
_LSH_C = (
    "unrelated gibberish zeta omega kappa lambda iota theta epsilon "
    "delta gamma beta alpha sigma tau upsilon phi chi psi words never "
    "seen anywhere else in this tiny corpus of test documents"
)


def test_stream_lsh_screen_cross_batch_and_replay(spark, tmp_path):
    """The maintained-bands near-dup screen: a later batch's copy of an
    earlier document is flagged against the TABLE (the earlier batch is
    never re-banded); a checkpoint-wiped replay converges to the
    identical log and an identical bands table (keyed anti-join + the
    screen-against-table-minus-batch rule)."""
    import shutil

    from dataingestionplayground_spark.streaming.ingest import stream_lsh_screen

    watch = tmp_path / "watch"
    watch.mkdir()
    bands = str(tmp_path / "bands")
    log = str(tmp_path / "pairs_log")
    ckpt = str(tmp_path / "ckpt")

    def read_pairs():
        import glob

        if not glob.glob(f"{log}/epoch_id=*/*.parquet"):
            return spark.createDataFrame(
                [], "new_id long, old_id long, epoch_id long"
            )
        return spark.read.parquet(log)

    _lsh_drop(watch, "b0.json", [(1, _LSH_A), (2, _LSH_B)])
    stream_lsh_screen(spark, str(watch), bands, log, ckpt).awaitTermination(60)
    # nothing to screen against: a zero-pair epoch writes no partition
    assert read_pairs().count() == 0
    assert (
        spark.read.parquet(bands).select("doc_id").distinct().count() == 2
    )

    _lsh_drop(watch, "b1.json", [(100, _LSH_A), (101, _LSH_C)])
    stream_lsh_screen(spark, str(watch), bands, log, ckpt).awaitTermination(60)
    pairs = {
        (r["new_id"], r["old_id"]) for r in read_pairs().collect()
    }
    assert (100, 1) in pairs
    assert all(n != 101 for n, _ in pairs)
    assert (
        spark.read.parquet(bands).select("doc_id").distinct().count() == 4
    )
    first_log = sorted(
        map(tuple, read_pairs().drop("epoch_id").collect())
    )
    first_bands = sorted(map(tuple, spark.read.parquet(bands).collect()))

    # replay both files from a wiped checkpoint: every doc is already
    # in the bands table (anti-join appends nothing) and each replayed
    # epoch screens against the table minus its own batch, so the log
    # partitions rewrite to the same pair set
    shutil.rmtree(ckpt)
    stream_lsh_screen(spark, str(watch), bands, log, ckpt).awaitTermination(60)
    assert (
        sorted(map(tuple, spark.read.parquet(bands).collect())) == first_bands
    )
    assert (
        sorted(map(tuple, read_pairs().drop("epoch_id").collect()))
        == first_log
    )


def test_stream_lsh_screen_same_batch_duplicate_doc_id(spark, tmp_path):
    """ADVICE r10 (low): a doc_id arriving in TWO files of the same
    micro-batch must land ONCE in the maintained bands table (the
    anti-join only screens against the pre-existing table, so without
    in-batch dedup both copies append — bloat, and conflicting band rows
    when the payloads differ). The canonical pick is deterministic
    (min(text)), so the surviving bands are the min-payload's."""
    from dataingestionplayground_spark.streaming.ingest import stream_lsh_screen

    watch = tmp_path / "watch"
    watch.mkdir()
    bands = str(tmp_path / "bands")
    log = str(tmp_path / "pairs_log")
    ckpt = str(tmp_path / "ckpt")

    # same doc_id in two files of one availableNow batch, different text
    _lsh_drop(watch, "f1.json", [(7, _LSH_A), (2, _LSH_B)])
    _lsh_drop(watch, "f2.json", [(7, _LSH_C)])
    stream_lsh_screen(spark, str(watch), bands, log, ckpt).awaitTermination(60)

    stored = spark.read.parquet(bands)
    per_doc = {
        r["doc_id"]: r["n"]
        for r in stored.groupBy("doc_id")
        .agg(F.countDistinct("band", "band_key").alias("n_keys"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(per_doc) == {7, 2}
    # one band set per doc: no duplicated (band, band_key) rows for 7
    dup = (
        stored.groupBy("doc_id", "band")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    # deterministic representative: doc 7's bands equal a fresh banding
    # of min(_LSH_A, _LSH_C)
    from dataingestionplayground_spark.operators.dedup import minhash_bands

    expect = minhash_bands(
        spark.createDataFrame([(7, min(_LSH_A, _LSH_C))], "doc_id long, text string"),
        "doc_id",
        "text",
    )
    got7 = sorted(
        map(tuple, stored.filter(F.col("doc_id") == 7).select("band", "band_key").collect())
    )
    want7 = sorted(map(tuple, expect.select("band", "band_key").collect()))
    assert got7 == want7


def _scd2_read(spark, dim):
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
        for r in read_scd2_dimension(spark, dim).collect()
    }


def test_stream_scd2_maintain_cross_batch_and_late_data(spark, tmp_path):
    """The maintained dimension equals the full-history SCD2 build after
    every batch — including a LATE batch whose observation lands between
    two already-stored versions and reveals one of them as a non-change
    (the case close-and-append merges get wrong)."""
    from dataingestionplayground_spark.streaming.ingest import stream_scd2_maintain

    watch = tmp_path / "watch"
    watch.mkdir()
    dim = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")

    # batch 0: user 1 goes view -> click; user 2 stays view
    _psi_drop(
        watch,
        "b0.json",
        [
            (1, "2024-01-01T00:00:10", 1, "view", 1.0),
            (2, "2024-01-01T00:01:40", 1, "click", 1.0),
            (3, "2024-01-01T00:00:20", 2, "view", 1.0),
            (4, "2024-01-01T00:02:00", 2, "view", 1.0),
        ],
    )
    stream_scd2_maintain(spark, str(watch), dim, ckpt).awaitTermination(60)
    t0 = 1704067200  # 2024-01-01T00:00:00 UTC
    assert _scd2_read(spark, dim) == {
        (1, 1): ("view", t0 + 10, t0 + 100, False),
        (1, 2): ("click", t0 + 100, None, True),
        (2, 1): ("view", t0 + 20, None, True),
    }

    # batch 1: user 1 returns to view; user 2 finally clicks
    _psi_drop(
        watch,
        "b1.json",
        [
            (5, "2024-01-01T00:05:00", 1, "view", 1.0),
            (6, "2024-01-01T00:06:00", 2, "click", 1.0),
        ],
    )
    stream_scd2_maintain(spark, str(watch), dim, ckpt).awaitTermination(60)
    assert _scd2_read(spark, dim) == {
        (1, 1): ("view", t0 + 10, t0 + 100, False),
        (1, 2): ("click", t0 + 100, t0 + 300, False),
        (1, 3): ("view", t0 + 300, None, True),
        (2, 1): ("view", t0 + 20, t0 + 360, False),
        (2, 2): ("click", t0 + 360, None, True),
    }

    # LATE batch: user 1 was already 'click' at 00:00:50 — the stored
    # version 2 (click @ +100) becomes a non-change and must DISAPPEAR,
    # with the click interval re-opened at +50. A full rebuild over all
    # six observations gives exactly this.
    _psi_drop(watch, "b2.json", [(7, "2024-01-01T00:00:50", 1, "click", 1.0)])
    stream_scd2_maintain(spark, str(watch), dim, ckpt).awaitTermination(60)
    assert _scd2_read(spark, dim) == {
        (1, 1): ("view", t0 + 10, t0 + 50, False),
        (1, 2): ("click", t0 + 50, t0 + 300, False),
        (1, 3): ("view", t0 + 300, None, True),
        (2, 1): ("view", t0 + 20, t0 + 360, False),
        (2, 2): ("click", t0 + 360, None, True),
    }


def test_stream_scd2_maintain_late_change_reopens_same_status_repeat(
    spark, tmp_path
):
    """ADVICE r10 (medium): a same-status repeat (view@t1, view@t2) is a
    non-change TODAY, but a late intervening change (click@t1.5) must
    re-open it as a fresh version — a store that keeps only change rows
    has discarded view@t2 and can never rebuild this. The maintained set
    now retains every observation, so the recompute equals a full
    rebuild over {view@+10, click@+60, view@+120}: three versions, with
    the user CURRENT on view, not click."""
    from dataingestionplayground_spark.streaming.ingest import stream_scd2_maintain

    watch = tmp_path / "watch"
    watch.mkdir()
    dim = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    t0 = 1704067200  # 2024-01-01T00:00:00 UTC

    # batch 0: user 1 views twice — the second observation is a
    # non-change and used to be discarded
    _psi_drop(
        watch,
        "b0.json",
        [
            (1, "2024-01-01T00:00:10", 1, "view", 1.0),
            (2, "2024-01-01T00:02:00", 1, "view", 1.0),
        ],
    )
    stream_scd2_maintain(spark, str(watch), dim, ckpt).awaitTermination(60)
    assert _scd2_read(spark, dim) == {(1, 1): ("view", t0 + 10, None, True)}

    # LATE batch: click@+60 lands BETWEEN the two views
    _psi_drop(watch, "b1.json", [(3, "2024-01-01T00:01:00", 1, "click", 1.0)])
    stream_scd2_maintain(spark, str(watch), dim, ckpt).awaitTermination(60)
    assert _scd2_read(spark, dim) == {
        (1, 1): ("view", t0 + 10, t0 + 60, False),
        (1, 2): ("click", t0 + 60, t0 + 120, False),
        (1, 3): ("view", t0 + 120, None, True),
    }


def test_stream_scd2_maintain_replay_identity_and_negative_control(spark, tmp_path):
    """Checkpoint-wiped replay of every batch converges to the identical
    dimension (keyed union + canonicalization); the negative control
    shows the dedup key is load-bearing — without it a replayed batch
    inflates the change-row set."""
    import shutil

    from pyspark.sql import functions as F

    from dataingestionplayground_spark.streaming.ingest import stream_scd2_maintain

    watch = tmp_path / "watch"
    watch.mkdir()
    dim = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")

    rows = [
        (1, "2024-01-01T00:00:10", 1, "view", 1.0),
        (2, "2024-01-01T00:01:40", 1, "click", 1.0),
        (3, "2024-01-01T00:00:20", 2, "view", 1.0),
    ]
    _psi_drop(watch, "b0.json", rows)
    stream_scd2_maintain(spark, str(watch), dim, ckpt).awaitTermination(60)
    first = _scd2_read(spark, dim)

    shutil.rmtree(ckpt)
    stream_scd2_maintain(spark, str(watch), dim, ckpt).awaitTermination(60)
    assert _scd2_read(spark, dim) == first

    # negative control: the standard close-and-APPEND SCD2 merge (no
    # recanonicalization) replays a batch by appending its change rows a
    # second time — (user_id, version) keys collide and the row count
    # doubles. Build that table and prove the keyed read CAN see the
    # corruption the maintained table never exhibits.
    stored = spark.read.parquet(dim).drop("bucket")
    naive = stored.unionByName(stored)  # append-only replay
    n_keys = naive.select("user_id", "version").distinct().count()
    assert naive.count() == 2 * len(first)  # replay doubled the rows
    assert n_keys < naive.count()  # (user, version) keys collide
    maintained = spark.read.parquet(dim)
    assert (
        maintained.select("user_id", "version").distinct().count()
        == maintained.count()
        == len(first)
    )


def test_stream_decay_counters_parity_replay_and_epoch_guard(spark, tmp_path):
    """Streaming the sf0.001 events table in two batches reproduces the
    oracle-checked events_decay_counters output bit-for-bit; a
    foreachBatch RETRY (same epoch id, same data — the crash-recovery
    semantic epoch-keyed staging guarantees, per the topk-rollup
    contract; a checkpoint WIPE re-batches and is out of contract)
    replaces rather than re-adds; compaction preserves the combine; and
    the negative control shows the guard is the epoch key — the same
    data under a DIFFERENT epoch id double-counts."""
    from dataingestionplayground_spark.operators.incremental import (
        compact_decay_rollup,
        merge_decay_rollup,
        read_decay_rollup,
    )
    from dataingestionplayground_spark.queries import all_queries
    from dataingestionplayground_spark.session import load_table
    from dataingestionplayground_spark.streaming.ingest import stream_decay_counters

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    rows = ev.collect()
    half = len(rows) // 2

    watch = tmp_path / "watch"
    watch.mkdir()
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    def drop(name, chunk):
        _psi_drop(
            watch,
            name,
            [
                (
                    r["event_id"],
                    r["ts"].isoformat(),
                    r["user_id"],
                    r["event_type"],
                    r["value"],
                )
                for r in chunk
            ],
        )

    drop("b0.json", rows[:half])
    stream_decay_counters(spark, str(watch), rollup, ckpt).awaitTermination(120)
    drop("b1.json", rows[half:])
    stream_decay_counters(spark, str(watch), rollup, ckpt).awaitTermination(120)

    def table(df):
        return {
            (r["user_id"], r["event_type"]): (r["n"], r["decayed_n"])
            for r in df.collect()
        }

    batch = table(all_queries()["events_decay_counters"].fn(spark, sf))
    assert table(read_decay_rollup(spark, rollup)) == batch

    # foreachBatch retry: re-merge batch 1 under its ORIGINAL epoch id
    # (what a crash between the write and the checkpoint commit causes)
    # — the staging rows are replaced, the table is unchanged
    b1 = spark.read.schema(ev.schema).json(str(watch / "b1.json"))
    merge_decay_rollup(spark, b1, rollup, epoch_id=1)
    assert table(read_decay_rollup(spark, rollup)) == batch

    # compaction folds epochs without changing the combine
    compact_decay_rollup(spark, rollup)
    assert table(read_decay_rollup(spark, rollup)) == batch

    # negative control: the same data under a NEW epoch id is "new" by
    # design — counts inflate, proving the retry identity above really
    # came from the epoch key, not from accidental idempotence
    b0 = spark.read.schema(ev.schema).json(str(watch / "b0.json"))
    merge_decay_rollup(spark, b0, rollup, epoch_id=999)
    doubled = table(read_decay_rollup(spark, rollup))
    assert doubled != batch
    k0 = {
        (r["user_id"], r["event_type"])
        for r in b0.select("user_id", "event_type").distinct().collect()
    }
    for key in k0:
        assert doubled[key][0] > batch[key][0]  # counts inflated
