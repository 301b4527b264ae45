"""Streaming twins of the training-data document pipeline (SURVEY.md
§2.10 extended to the LLM-pipeline surface): quality scoring and
sequence packing over an unbounded document stream.

Quality scoring is stateless (pure Catalyst expressions shared with the
batch query, so parity is by construction). Packing is genuinely
stateful — a document's bin depends on every token that came before it
in its shard — carried across micro-batches with
``applyInPandasWithState`` keyed by shard (``source``): state is ONE
bigint per shard (the running token count), so memory is bounded by the
shard count no matter how many documents flow through.

Determinism contract: within a micro-batch, documents pack in
``doc_id`` order; across batches, in arrival order. Bounded input
delivered as one batch therefore matches the batch window query
(``queries/pipelineq.py ingest_pack_sequences``) exactly — that parity
is tested in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataingestionplayground_spark.functions import text as TX
from dataingestionplayground_spark.queries.textq import quality_scores


def stream_quality_scores(docs: DataFrame) -> DataFrame:
    """Per-document quality score on a streaming (doc_id, text, n_chars)
    frame — same expressions as the batch `text_quality_score` query
    (append-mode safe: no aggregation, no watermark needed)."""
    return quality_scores(docs)


def stream_pack_sequences(docs: DataFrame, capacity: int = 256) -> DataFrame:
    """Streaming sequence packing: assign each arriving document its
    (bin_id, bin_offset) in its shard's concat-and-split token stream.

    The cumulative token count per shard lives in group state (a single
    bigint), updated once per micro-batch; token counting itself stays
    JVM-side (the same `TX.token_count` expression as the batch query)
    so the Python stage only does the tiny running-sum bookkeeping.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    sized = docs.select(
        "doc_id", "source", TX.token_count("text").cast("long").alias("n_toks")
    )

    def fn(key, pdfs, state: GroupState):
        cum = state.get[0] if state.exists else 0
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("doc_id")
        bins, offs = [], []
        for n in pdf["n_toks"]:
            bins.append(cum // capacity)
            offs.append(cum % capacity)
            cum += int(n)
        state.update((cum,))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "source": key[0],
                "n_toks": pdf["n_toks"].astype("int64"),
                "bin_id": pd.Series(bins, dtype="int64"),
                "bin_offset": pd.Series(offs, dtype="int64"),
            }
        )

    return sized.groupBy("source").applyInPandasWithState(
        fn,
        outputStructType="doc_id long, source string, n_toks long, bin_id long, bin_offset long",
        stateStructType="cum bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_decontaminate(docs: DataFrame, eval_grams: DataFrame) -> DataFrame:
    """Streaming decontamination: flag arriving documents that share any
    word trigram with a STATIC eval-set gram table (stream-static join —
    the eval side is fixed per run and broadcast to every micro-batch).

    Per-doc overlap counting is an update-mode aggregation keyed by
    doc_id; state is one counter per in-flight document. The batch twin
    is ``queries/pipelineq.py dedup_decontaminate`` — same gram
    expressions, same broadcast shape.
    """
    from pyspark.sql import functions as F

    tr = docs.select("doc_id", TX.tokens("text").alias("__tk")).select(
        "doc_id",
        F.explode(
            F.array_distinct(TX.shingles_from_tokens("__tk", 3))
        ).alias("g"),
    )
    hits = tr.join(F.broadcast(eval_grams), "g")
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlap")
    )


def nb_classifier_model(spark, sf) -> tuple[list[tuple[int, str]], str]:
    """TRAIN the naive-Bayes quality model in batch — by calling the
    registry query's OWN weight builder (queries/pipelineq.py
    nb_weight_table, so batch and stream can never drift) — and return
    it as driver-side literals: <= 256 (bucket, weight) rows plus the
    class-prior term, all DECIMAL strings so the streaming scorer
    reproduces the batch log-odds bit-for-bit. Bounded driver state —
    the codebook pattern."""
    from dataingestionplayground_spark.queries.pipelineq import nb_weight_table

    wb, _toks = nb_weight_table(spark, sf)
    rows = wb.select(
        "bucket",
        F.col("w").cast("string").alias("w"),
        F.col("prior").cast("string").alias("prior"),
    ).collect()  # <= 256 rows: the model
    weights = [(int(r["bucket"]), r["w"]) for r in rows]
    prior = rows[0]["prior"] if rows else "0"
    return weights, prior


def stream_nb_score(docs: DataFrame, weights, prior: str) -> DataFrame:
    """Score a STREAMING (doc_id, text) frame with a batch-trained NB
    model — train batch / apply stream. Entirely stateless and
    append-safe: the <=256-entry weight table rides as a MAP literal
    and both per-document sums are in-row `aggregate`s over the token
    array (no explode, no aggregation state, no watermark), so the same
    expression works on bounded batch frames (the parity test) and
    unbounded streams alike. n_toks counts only tokens whose hash
    bucket exists in the trained table — the same semantics as the
    batch query's inner join onto the weight frame — so the twins agree
    even on post-training documents with unseen buckets."""
    from dataingestionplayground_spark.queries.pipelineq import _md5_mod

    entries = []
    for b, w in weights:
        entries.append(F.lit(b))
        entries.append(F.lit(w).cast("decimal(38,6)"))
    # empty-model edge (r8 ADVICE): a bare create_map() is typed
    # map<string,string>, so element_at(__nb_w, bigint) would fail
    # analysis — cast the empty literal to the trained map's exact type
    # (every lookup misses, n_toks stays 0, zero rows survive the gate)
    m = (
        F.create_map(*entries)
        if entries
        else F.create_map().cast("map<bigint,decimal(38,6)>")
    )
    toks_expr = f"filter(split(text, '{TX.WS}'), x -> x != '')"
    buckets = f"transform({toks_expr}, t -> {_md5_mod('t', 256)})"
    score = F.expr(
        f"aggregate({buckets}, cast(0 as decimal(38,6)), "
        f"(acc, b) -> acc + coalesce(element_at(__nb_w, b), "
        f"cast(0 as decimal(38,6))))"
    )
    n_known = F.expr(
        f"aggregate({buckets}, 0L, (acc, b) -> acc + "
        f"(case when element_at(__nb_w, b) is null then 0L else 1L end))"
    )
    return (
        docs.withColumn("__nb_w", m)
        .withColumn("n_toks", n_known)
        .filter(F.col("n_toks") > 0)
        .withColumn(
            "log_odds",
            (score + F.lit(prior).cast("decimal(38,6)")).cast("double"),
        )
        .withColumn("pred_pos", F.col("log_odds") >= 0.0)
        .select("doc_id", "n_toks", "log_odds", "pred_pos")
    )
