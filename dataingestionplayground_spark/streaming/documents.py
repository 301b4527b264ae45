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


def _nb_weight_map(weights):
    """The <=256-entry (bucket -> decimal weight) MAP literal the NB
    scorers ride on; typed even when empty (r8 ADVICE: a bare
    create_map() is map<string,string> and element_at(_, bigint) fails
    analysis)."""
    entries = []
    for b, w in weights:
        entries.append(F.lit(b))
        entries.append(F.lit(w).cast("decimal(38,6)"))
    return (
        F.create_map(*entries)
        if entries
        else F.create_map().cast("map<bigint,decimal(38,6)>")
    )


def _nb_score_exprs():
    """(log-odds sum, known-token count) expressions over a ``text``
    column against the ``__nb_w`` map literal — shared by
    stream_nb_score and the streaming quality gate."""
    from dataingestionplayground_spark.queries.pipelineq import _md5_mod

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
    return score, n_known


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
    m = _nb_weight_map(weights)
    score, n_known = _nb_score_exprs()
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


def quality_gate_model(spark, sf) -> dict:
    """FREEZE the quality ensemble's trained state from a reference
    corpus (r12 verdict item 5a — the psi_reference/codebook pattern
    applied to text_quality_ensemble): the NB weight table trained by
    the registry's OWN builder against the SAME perplexity labels the
    ensemble uses, the unigram LM (vocab counts + total token count),
    and the corpus min-max extrema that calibrate the [0,1] scores.
    Everything returns as driver-side literals: the weight table is
    <= 256 rows, the extrema are four doubles, and the vocab is the
    corpus token domain — bounded here; at warehouse scale the LM
    would stay a maintained (w, c) table stream-static-joined per
    batch instead of riding as a literal (the eval_grams discipline),
    with identical semantics."""
    from dataingestionplayground_spark.queries import REGISTRY as _R
    from dataingestionplayground_spark.queries.pipelineq import nb_weight_table
    from dataingestionplayground_spark.session import load_table

    ppl_frame = (
        _R["text_unigram_perplexity"]
        .fn(spark, sf)
        .select("doc_id", "ppl", F.col("keep").alias("pos"))
        .localCheckpoint(eager=True)
    )
    wb, toks = nb_weight_table(spark, sf, lab=ppl_frame.select("doc_id", "pos"))
    wrows = wb.select(
        "bucket",
        F.col("w").cast("string").alias("w"),
        F.col("prior").cast("string").alias("prior"),
    ).collect()
    nb = (
        toks.join(F.broadcast(wb), "bucket")
        .groupBy("doc_id")
        .agg(
            (F.sum(F.col("c") * F.col("w")) + F.min("prior"))
            .cast("double")
            .alias("log_odds")
        )
    )
    lo = nb.agg(
        F.min("log_odds").alias("lo_min"), F.max("log_odds").alias("lo_max")
    ).first()
    pp = ppl_frame.agg(
        F.min("ppl").alias("p_min"), F.max("ppl").alias("p_max")
    ).first()
    d = load_table(spark, sf, "documents")
    vocab = (
        d.select(F.explode(TX.tokens("lower(text)")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    )
    # An unusable reference corpus (no doc survives the perplexity
    # member's joins, or no token hits a trained bucket) leaves the
    # extrema rows NULL / the weight table empty; fail with the cause
    # instead of an opaque float(None) TypeError downstream
    # (post-ledger review finding).
    if not wrows or lo["lo_min"] is None or pp["p_min"] is None:
        raise ValueError(
            "quality_gate_model: reference corpus produced no usable "
            "signal rows (empty NB weight table or NULL score extrema) — "
            "the frozen gate cannot be calibrated from it"
        )
    return {
        "nb_weights": [(int(r["bucket"]), r["w"]) for r in wrows],
        "nb_prior": wrows[0]["prior"],
        "vocab": [(r["w"], int(r["c"])) for r in vocab],
        "lm_total": int(sum(r["c"] for r in vocab)),
        "lo_min": float(lo["lo_min"]),
        "lo_max": float(lo["lo_max"]),
        "p_min": float(pp["p_min"]),
        "p_max": float(pp["p_max"]),
    }


def stream_quality_gate(docs: DataFrame, model: dict) -> DataFrame:
    """LIVE quality gate on a document stream: the frozen-model form of
    ``text_quality_ensemble`` — per arriving (doc_id, text) row, the NB
    log-odds (map-literal model, the stream_nb_score expressions), the
    unigram perplexity against the FROZEN reference LM, and the Gopher
    rule fraction (gopher_metric_frame — the batch query's own
    expressions), blended 0.4/0.3/0.3 after min-max normalization
    against the FROZEN reference extrema.

    Entirely STATELESS and append-safe: all three signals are in-row
    expressions on the same row (no stream-stream join, no aggregation
    state, no watermark), so the gate is a narrow projection that
    scales to any stream rate — and the same expression tree runs on a
    bounded batch frame, which is how the parity test pins it
    row-for-row against the oracle-checked batch ensemble when the
    model is frozen from the same corpus. Documents with no
    model-known NB bucket or no LM-known token drop — exactly the rows
    the batch ensemble's inner joins drop.
    """
    from dataingestionplayground_spark.queries.textq import (
        gopher_metric_frame,
        gopher_n_rules_expr,
    )

    lm_entries = []
    for w, c in model["vocab"]:
        lm_entries.append(F.lit(w))
        lm_entries.append(F.lit(int(c)))
    lm = (
        F.create_map(*lm_entries)
        if lm_entries
        else F.create_map().cast("map<string,bigint>")
    )
    score, n_known = _nb_score_exprs()
    # frozen-LM perplexity: per-token 6dp-rounded (ln N - ln c) terms
    # folded as DECIMAL over the LM-known tokens of lower(text) — the
    # batch member's exact arithmetic (its inner join onto vocab ==
    # this filter on map membership)
    lm_toks = (
        f"filter(filter(split(lower(text), '{TX.WS}'), x -> x != ''), "
        f"t -> element_at(__lm, t) is not null)"
    )
    n_lm = F.expr(f"size({lm_toks})")
    lnN = f"ln(cast({int(model['lm_total'])} as double))"
    ppl = F.round(
        F.exp(
            F.expr(
                f"cast(aggregate({lm_toks}, cast(0 as decimal(38,6)), "
                f"(acc, t) -> acc + cast(round({lnN} - "
                f"ln(cast(element_at(__lm, t) as double)), 6) as decimal(38,6))) "
                f"as double)"
            )
            / n_lm.cast("double")
        ),
        6,
    )
    scored = (
        docs.withColumn("__nb_w", _nb_weight_map(model["nb_weights"]))
        .withColumn("__lm", lm)
        .withColumn("__nb_n", n_known)
        .filter(F.col("__nb_n") > 0)
        .withColumn(
            "__lo",
            (score + F.lit(model["nb_prior"]).cast("decimal(38,6)")).cast(
                "double"
            ),
        )
        .withColumn("__n_lm", n_lm)
        .filter(F.col("__n_lm") > 0)
        .withColumn("__ppl", ppl)
    )
    g = gopher_metric_frame(scored, extra=("__lo", "__ppl"))
    nb_score = F.round(
        (F.col("__lo") - F.lit(model["lo_min"]))
        / F.nullif(F.lit(model["lo_max"]) - F.lit(model["lo_min"]), F.lit(0.0)),
        6,
    )
    ppl_score = F.round(
        (F.lit(model["p_max"]) - F.col("__ppl"))
        / F.nullif(F.lit(model["p_max"]) - F.lit(model["p_min"]), F.lit(0.0)),
        6,
    )
    gopher_score = F.round(
        gopher_n_rules_expr().cast("double") / F.lit(6.0), 6
    )
    comp = g.select(
        "doc_id",
        nb_score.alias("nb_score"),
        ppl_score.alias("ppl_score"),
        gopher_score.alias("gopher_score"),
    )
    quality = F.round(
        F.lit(0.4) * F.col("nb_score")
        + F.lit(0.3) * F.col("ppl_score")
        + F.lit(0.3) * F.col("gopher_score"),
        6,
    )
    return comp.select(
        "doc_id",
        "nb_score",
        "ppl_score",
        "gopher_score",
        quality.alias("quality"),
        (quality >= F.lit(0.5)).alias("keep"),
    )
