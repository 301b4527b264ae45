"""Text-analysis query surface over ``documents``: language-ID, quality
scoring, token statistics, fingerprinting, per-source top-k. All pure
Catalyst expressions (functions.text) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dataingestionplayground_spark.functions import text as TX
from dataingestionplayground_spark.functions.portable import davg, davg_expr, md5_mod, md5_mod_sql
from dataingestionplayground_spark.queries import register
from dataingestionplayground_spark.session import load_table as t

_LANGS = ["en", "es", "fr", "de", "zh"]


def _lang_score_cols():
    return [TX.stopword_hits("text", lg).alias(f"s_{lg}") for lg in _LANGS]


def _lang_score_sqls():
    return ", ".join(f"{TX.stopword_hits_sql('text', lg)} AS s_{lg}" for lg in _LANGS)


# argmax with fixed tie-break order: first language in _LANGS order wins ties.
_PRED_CASE = (
    "CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en >= s_zh THEN 'en' "
    "WHEN s_es >= s_fr AND s_es >= s_de AND s_es >= s_zh THEN 'es' "
    "WHEN s_fr >= s_de AND s_fr >= s_zh THEN 'fr' "
    "WHEN s_de >= s_zh THEN 'de' ELSE 'zh' END"
)


@register(
    "text_language_id",
    oracle=f"""
    WITH scored AS (SELECT doc_id, lang, {_lang_score_sqls()} FROM documents)
    SELECT doc_id, {_PRED_CASE} AS pred_lang,
           CASE WHEN {_PRED_CASE} = lang THEN 1 ELSE 0 END AS is_match
    FROM scored
    """,
)
def text_language_id(spark, sf):
    # n-gram/stopword-ratio heuristic language classifier.
    d = t(spark, sf, "documents")
    scored = d.select("doc_id", "lang", *_lang_score_cols())
    return scored.select(
        "doc_id",
        F.expr(_PRED_CASE).alias("pred_lang"),
        F.expr(f"CASE WHEN {_PRED_CASE} = lang THEN 1 ELSE 0 END").alias("is_match"),
    )


# Quality score: weighted blend of length saturation, stopword ratio,
# mean token length band. All ratios are exact-int divisions -> portable.
# Denominators go through nullif(.., 0): consumers filter n_toks > 0, but
# inside a larger fused plan Spark may evaluate this projection on rows the
# filter will discard (ANSI mode then throws DIVIDE_BY_ZERO). nullif is a
# no-op on surviving rows and identical in DuckDB, so oracle parity holds.
_QUALITY_SQL = (
    "0.4 * least(CAST(n_chars AS DOUBLE) / 400.0, 1.0) "
    "+ 0.4 * (CAST(n_stop AS DOUBLE) / nullif(CAST(n_toks AS DOUBLE), 0.0)) "
    "+ 0.2 * (CASE WHEN (CAST(len_sum AS DOUBLE) / nullif(CAST(n_toks AS DOUBLE), 0.0)) "
    "BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.0 END)"
)


def quality_scores(docs):
    """(doc_id, n_toks, n_stop, quality) for any frame with
    (doc_id, text, n_chars) — pure Catalyst expressions, so it works
    unchanged on BATCH and STREAMING frames (streaming/documents.py wraps
    it as the stream twin; the oracle checks the batch side)."""
    feats = docs.select(
        "doc_id",
        "n_chars",
        TX.token_count("text").alias("n_toks"),
        TX.stopword_hits("text", "en").alias("n_stop"),
        F.length(F.expr("replace(text, ' ', '')")).alias("len_sum"),
    )
    return feats.filter(F.col("n_toks") > 0).select(
        "doc_id", "n_toks", "n_stop", F.expr(_QUALITY_SQL).alias("quality")
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, n_chars,
             CAST(len({TX.tokens_sql('text')}) AS INTEGER) AS n_toks,
             {TX.stopword_hits_sql('text', 'en')} AS n_stop,
             CAST(len(replace(text, ' ', '')) AS INTEGER) AS len_sum
      FROM documents
    )
    SELECT doc_id, n_toks, n_stop, {_QUALITY_SQL} AS quality
    FROM feats WHERE n_toks > 0
    """,
)
def text_quality_score(spark, sf):
    return quality_scores(t(spark, sf, "documents"))


@register(
    "text_token_stats",
    oracle=f"""
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM({TX.token_count_sql('text')}) AS BIGINT) AS total_tokens,
           CAST(SUM({TX.bpe_token_count_sql('text')}) AS BIGINT) AS total_bpe_tokens,
           {davg_expr(f"CAST({TX.token_count_sql('text')} AS DOUBLE)")} AS avg_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY source, lang
    """,
)
def text_token_stats(spark, sf):
    from dataingestionplayground_spark.functions.portable import davg

    d = t(spark, sf, "documents")
    return d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(TX.token_count("text")).alias("total_tokens"),
        F.sum(TX.bpe_token_count("text")).alias("total_bpe_tokens"),
        davg(TX.token_count("text").cast("double")).alias("avg_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id, {TX.fingerprint_sql('text')} AS fingerprint,
           list_min(list_transform({TX.char_shingles_sql('text', 16)}, s -> md5(s))) AS min_shingle_hash
    FROM documents
    """,
)
def text_fingerprint(spark, sf):
    # Whole-doc fingerprint + min rolling-hash over 16-char shingles. The
    # min is computed INSIDE the projection (array_min over the shingle
    # array) — no explode, no shuffle: one pass over documents instead of
    # aggregating |text| rows per document.
    d = t(spark, sf, "documents")
    shingles = TX.char_shingles("text", 16)
    return d.select(
        "doc_id",
        TX.fingerprint("text").alias("fingerprint"),
        F.array_min(F.transform(shingles, lambda s: F.md5(s))).alias("min_shingle_hash"),
    )


@register(
    "text_topk_per_source",
    oracle="""
    SELECT source, doc_id, n_chars, rk FROM (
      SELECT source, doc_id, n_chars,
             CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS INTEGER) AS rk
      FROM documents) WHERE rk <= 5
    """,
)
def text_topk_per_source(spark, sf):
    # Two-phase partial top-k (the operators/similarity.py pattern):
    # `source` has a handful of values, so a single row_number window
    # partitioned by it would sort each source's ENTIRE row set on one
    # reducer to keep 5 rows. Phase 1 ranks within (source, hash shard)
    # — every reducer sees at most 1/32 of a source — and keeps 5 per
    # shard; phase 2 re-ranks the <= 5*32 survivors per source. Shards
    # are a deterministic doc_id hash (stable under task retries).
    d = t(spark, sf, "documents")
    sharded = d.withColumn("__shard", F.pmod(F.xxhash64("doc_id"), F.lit(32)))
    w1 = W.partitionBy("source", "__shard").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    partial = (
        sharded.withColumn("prk", F.row_number().over(w1))
        .filter(F.col("prk") <= 5)
        .select("source", "doc_id", "n_chars")
    )
    w2 = W.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        partial.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= 5)
        .select("source", "doc_id", "n_chars", "rk")
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
           COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
    """,
)
def json_extract_props(spark, sf):
    # Semi-structured extraction (SURVEY §2.8 date/array/map/json row).
    e = t(spark, sf, "events")
    return (
        e.select(
            F.get_json_object("props", "$.k").cast("int").alias("k_value"), "user_id"
        )
        .groupBy("k_value")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("n_users"))
    )


# Char-trigram profiles (public-knowledge frequent trigrams per language).
# Score = total occurrences of profile trigrams in the lowercased text
# (counted via length-delta of replace, no regex) — the classic n-gram
# language-ID heuristic, complementary to the stopword classifier above.
_TRIGRAMS = {
    "en": ["the", "and", "ing", "ion", "ent"],
    "es": ["que", "ent", "con", "ado", "cio"],
    "fr": ["les", "ent", "ion", "que", "our"],
    "de": ["der", "ein", "sch", "ich", "und"],
    "zh": ["ang", "eng", "ong", "ian", "uan"],
}


def _tri_score(col: str, lang: str) -> str:
    # occurrences*3 of each profile trigram, summed (no division needed
    # for argmax); identical expression on both engines.
    terms = [
        f"(length({col}) - length(replace({col}, '{g}', '')))" for g in _TRIGRAMS[lang]
    ]
    return "(" + " + ".join(terms) + ")"


_TRI_PRED = (
    "CASE WHEN t_en >= t_es AND t_en >= t_fr AND t_en >= t_de AND t_en >= t_zh THEN 'en' "
    "WHEN t_es >= t_fr AND t_es >= t_de AND t_es >= t_zh THEN 'es' "
    "WHEN t_fr >= t_de AND t_fr >= t_zh THEN 'fr' "
    "WHEN t_de >= t_zh THEN 'de' ELSE 'zh' END"
)


@register(
    "text_language_id_ngram",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {', '.join(f"CAST({_tri_score('lower(text)', lg)} AS INTEGER) AS t_{lg}" for lg in _TRIGRAMS)}
      FROM documents
    )
    SELECT doc_id, {_TRI_PRED} AS pred_lang, t_en, t_es,
           CASE WHEN {_TRI_PRED} = lang THEN 1 ELSE 0 END AS is_match
    FROM scored
    """,
)
def text_language_id_ngram(spark, sf):
    d = t(spark, sf, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        *[
            F.expr(f"CAST({_tri_score('lower(text)', lg)} AS INT)").alias(f"t_{lg}")
            for lg in _TRIGRAMS
        ],
    )
    return scored.select(
        "doc_id",
        F.expr(_TRI_PRED).alias("pred_lang"),
        "t_en",
        "t_es",
        F.expr(f"CASE WHEN {_TRI_PRED} = lang THEN 1 ELSE 0 END").alias("is_match"),
    )


@register(
    "text_quality_calibrated_filter",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, n_chars,
             CAST(len({TX.tokens_sql('text')}) AS INTEGER) AS n_toks,
             {TX.stopword_hits_sql('text', 'en')} AS n_stop,
             CAST(len(replace(text, ' ', '')) AS INTEGER) AS len_sum
      FROM documents
    ), scored AS (
      SELECT doc_id, {_QUALITY_SQL} AS quality FROM feats WHERE n_toks > 0
    ), thr AS (
      SELECT quantile_cont(quality, 0.25) AS q25 FROM scored
    )
    SELECT doc_id, quality, q25 AS threshold, quality >= q25 AS keep
    FROM scored CROSS JOIN thr
    """,
)
def text_quality_calibrated_filter(spark, sf):
    # Corpus-calibrated quality gate: instead of a magic absolute cutoff,
    # keep documents at or above the corpus's own 25th percentile of
    # quality — the threshold adapts to each crawl/shard. Two passes:
    # one agg to a single-row threshold (exact interpolated percentile,
    # bitwise equal to DuckDB quantile_cont; percentile_approx at
    # 100 TB), broadcast back over one more corpus scan. Zero shuffles
    # on the corpus side either pass.
    scored = quality_scores(t(spark, sf, "documents")).select("doc_id", "quality")
    thr = scored.agg(F.expr("percentile(quality, 0.25)").alias("threshold"))
    return scored.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "quality",
        "threshold",
        (F.col("quality") >= F.col("threshold")).alias("keep"),
    )


@register(
    "text_bpe_pair_merge",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({TX.tokens_sql('lower(text)')}) AS w FROM documents
    ), pairs AS (
      SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                                   i -> substr(w, i, 2))) AS pair
      FROM toks WHERE len(w) >= 2
    ), counted AS (
      SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY pair
    )
    SELECT pair, n, rk FROM (
      SELECT pair, n,
             CAST(row_number() OVER (ORDER BY n DESC, pair ASC) AS INTEGER) AS rk
      FROM counted) WHERE rk <= 20
    """,
)
def text_bpe_pair_merge(spark, sf):
    # One BPE-training merge step: count adjacent symbol pairs across
    # every token occurrence (frequency-weighted, as BPE requires) and
    # rank the top merge candidates. Explode -> hash agg (map-side
    # partial) -> TakeOrderedAndProject: the same single-shuffle shape
    # at 100 TB; iterating merges = re-running with the merged symbol
    # table applied.
    d = t(spark, sf, "documents")
    toks = d.select(F.explode(TX.tokens("lower(text)")).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    from dataingestionplayground_spark.operators.prefix import bounded_rank

    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).cast("long").alias("n"))
    top = counted.orderBy(F.desc("n"), F.asc("pair")).limit(20)
    # bounded by the limit above — rank the 20 survivors window-free
    return bounded_rank(top, [("n", False), ("pair", True)], "rk").select(
        "pair", "n", "rk"
    )


@register(
    "text_unigram_perplexity",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({TX.tokens_sql('lower(text)')}) AS w FROM documents
    ), vocab AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY w
    ), total AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n FROM vocab
    ), scored AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_toks,
             round(exp(CAST(SUM(CAST(round(ln(CAST(n AS DOUBLE))
                                - ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(38,6))) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE)), 6) AS ppl
      FROM toks t JOIN vocab v ON t.w = v.w CROSS JOIN total
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_toks, ppl, ppl <= 30.25 AS keep FROM scored
    """,
)
def text_unigram_perplexity(spark, sf):
    # CCNet-style perplexity filter with the corpus's own unigram LM:
    # ppl(d) = exp(-mean log p(w)), p(w) = c_w / N. High perplexity =
    # the doc's tokens are rare corpus-wide (gibberish / wrong-language
    # candidates). Two hash aggs (vocab count, per-doc mean) + a
    # vocabulary-sized broadcast join: the corpus shuffles once. ppl is
    # rounded to 6 dp before the keep comparison so the flag is stable
    # cross-engine (sum-of-logs can differ by ~1 ulp).
    # r17: body hoisted into _unigram_ppl_frame so text_lm_gate_table
    # can run the IDENTICAL plan over a shared tokenized frame.
    return _unigram_ppl_frame(_lm_tokens_frame(t(spark, sf, "documents")))


def _lm_tokens_frame(d):
    """(doc_id, tk) lowercase token arrays — the single tokenization the
    four corpus LMs share. text_lm_gate_table localCheckpoints this ONCE
    so its four member legs stop re-tokenizing the corpus (r16 VERDICT
    item 1); the standalone queries pass it through lazily, which
    Catalyst collapses back into the member plan unchanged."""
    return d.select("doc_id", TX.tokens("lower(text)").alias("tk"))


def _bigram_stream(tkall):
    """(doc_id, w1, w2) bigram occurrences over >=2-token docs — the
    scoring stream all three bigram LMs read."""
    docs = tkall.where(F.size("tk") >= 2)
    return docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 1), "
                "i -> struct(element_at(tk, i) AS w1, element_at(tk, i + 1) AS w2))"
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")


def _bigram_counts(bigr):
    """The (w1, w2, c12) bigram-type table — every count table of the
    bigram/interpolated/Kneser-Ney LMs is a rollup of this one frame.

    r17 (r16 VERDICT item 1, guide §2.3/§2.4): the LM frames
    localCheckpoint this ONCE and derive c1/n1f/n1b/nb from the cached
    blocks. As lazy frames, Catalyst re-inlined the corpus scan into
    every rollup consumer — the Kneser-Ney plan tokenized and exploded
    the whole corpus once per broadcast side (4 Scan parquet chains for
    one logical pass; no ReusedExchange fires because each rollup's
    pruned projections canonicalize differently). The JOIN SHAPE of the
    scoring stream is deliberately unchanged — the r16 A/B showed
    pre-joining the count tables with each other is near-occurrence-
    sized mass at real vocabularies (2.4x slower at sf0.5, reverted in
    1a74218); only the redundant scans are removed here."""
    return bigr.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )


def _unigram_ppl_frame(tkall):
    toks = tkall.select("doc_id", F.explode("tk").alias("w"))
    # vocab feeds both the broadcast join side and the corpus total —
    # materialize the vocabulary-sized table once instead of letting
    # each consumer re-inline the corpus scan (r17, guide §2.4)
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    total = vocab.agg(F.sum("c").cast("long").alias("n"))
    scored = (
        toks.join(F.broadcast(vocab), "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.round(
                F.exp(
                    F.sum(
                        F.round(
                            F.log(F.col("n").cast("double"))
                            - F.log(F.col("c").cast("double")),
                            6,
                        ).cast("decimal(38,6)")
                    ).cast("double")
                    / F.count(F.lit(1)).cast("double")
                ),
                6,
            ).alias("ppl"),
        )
    )
    return scored.select(
        "doc_id", "n_toks", "ppl", (F.col("ppl") <= 30.25).alias("keep")
    )


@register(
    "text_char_entropy",
    oracle="""
    WITH s AS (
      SELECT doc_id, substr(lower(text), 1, 512) AS cs FROM documents
      WHERE length(substr(lower(text), 1, 512)) > 0
    ), dist AS (
      SELECT doc_id, cs, CAST(length(cs) AS DOUBLE) AS n,
             unnest(list_distinct(list_transform(generate_series(1, length(cs)),
                                                 i -> substr(cs, i, 1)))) AS c
      FROM s
    ), terms AS (
      SELECT doc_id, n,
             round(-((length(cs) - length(replace(cs, c, ''))) / n)
                   * log2((length(cs) - length(replace(cs, c, ''))) / n), 6) AS term
      FROM dist
    ), ent AS (
      SELECT doc_id, CAST(n AS INTEGER) AS n_chars_sampled,
             round(CAST(SUM(CAST(term AS DECIMAL(38,6))) AS DOUBLE), 6) AS entropy
      FROM terms GROUP BY doc_id, n
    )
    SELECT doc_id, n_chars_sampled, entropy,
           entropy BETWEEN 2.0 AND 5.5 AS keep
    FROM ent
    """,
)
def text_char_entropy(spark, sf):
    # Character-level Shannon entropy gate (the classic gibberish /
    # binary-spill / repeated-char filter in C4/RefinedWeb-style
    # pipelines): natural language sits ~3.5-4.8 bits/char; encrypted or
    # base64 blobs push toward 6, "aaaa..." runs toward 0. Sampled on
    # the first 512 chars (standard practice — entropy stabilizes fast
    # and the cost stays bounded per row).
    #
    # Entirely IN-ROW Catalyst expressions — per-char counts via the
    # replace() length-delta trick over the distinct-char array, the
    # term sum folded as decimal(38,6) (order-exact, kills the -0.0 of
    # single-char docs) — so the whole query is a narrow projection:
    # ZERO shuffles at any scale. Each log2 term rounds to 6 dp before
    # the fold (the perplexity query's cross-engine libm convention).
    d = t(spark, sf, "documents")
    s = d.select(
        "doc_id", F.expr("substr(lower(text), 1, 512)").alias("cs")
    ).filter(F.length("cs") > 0)
    p = "((length(cs) - length(replace(cs, c, ''))) / cast(length(cs) as double))"
    ent = (
        "round(cast(aggregate("
        "  transform("
        "    array_distinct(transform(sequence(1, length(cs)), i -> substr(cs, i, 1))),"
        f"    c -> cast(round(-{p} * log2({p}), 6) as decimal(38,6))"
        "  ),"
        "  cast(0 as decimal(38,6)),"
        "  (acc, t) -> cast(acc + t as decimal(38,6))"
        ") as double), 6)"
    )
    return s.select(
        "doc_id",
        F.length("cs").cast("int").alias("n_chars_sampled"),
        F.expr(ent).alias("entropy"),
    ).withColumn("keep", F.col("entropy").between(2.0, 5.5))


def gopher_metric_frame(d, extra: tuple = ()):
    """The six 6dp-rounded Gopher metrics over a (doc_id, text, ...)
    frame — in-row Catalyst only, so it runs identically on batch
    tables and unbounded document streams (the streaming quality gate
    reuses this verbatim: parity is structural). ``extra`` names
    pass-through columns to keep alongside doc_id. Docs with zero
    tokens are dropped (the batch query's own guard)."""
    feats = d.select(
        "doc_id",
        *extra,
        TX.tokens("text").alias("tk"),
        F.expr("split(text, '\n')").alias("ln"),
        (
            (F.length("text") - F.length(F.expr("replace(text, '#', '')")))
            + (F.length("text") - F.length(F.expr("replace(text, '...', '')"))) / 3
        ).cast("bigint").alias("n_sym"),
    ).filter(F.expr("size(tk) > 0"))
    nw = F.expr("cast(size(tk) as double)")
    m = feats.select(
        "doc_id",
        *extra,
        F.expr("cast(size(tk) as int)").alias("n_words"),
        (F.expr("cast(aggregate(tk, 0L, (a, x) -> a + length(x)) as double)") / nw).alias(
            "mean_word_len"
        ),
        (F.expr("cast(size(filter(tk, x -> x rlike '[a-zA-Z]')) as double)") / nw).alias(
            "alpha_word_ratio"
        ),
        (F.col("n_sym").cast("double") / nw).alias("symbol_to_word"),
        (
            F.expr("cast(size(filter(ln, l -> trim(l) rlike '^[-*•]')) as double)")
            / F.expr("cast(size(ln) as double)")
        ).alias("bullet_line_frac"),
        (
            F.expr("cast(size(filter(ln, l -> endswith(trim(l), '...'))) as double)")
            / F.expr("cast(size(ln) as double)")
        ).alias("ellipsis_line_frac"),
    )
    return m.select(
        "doc_id",
        *extra,
        "n_words",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("alpha_word_ratio", 6).alias("alpha_word_ratio"),
        F.round("symbol_to_word", 6).alias("symbol_to_word"),
        F.round("bullet_line_frac", 6).alias("bullet_line_frac"),
        F.round("ellipsis_line_frac", 6).alias("ellipsis_line_frac"),
    )


def gopher_n_rules_expr():
    """Count of passed Gopher rules over the 6dp-rounded metric columns
    — ONE definition for the quality ensemble (batch) and the streaming
    gate, so the two can never disagree on the rule panel."""
    return (
        F.col("n_words").between(10, 100000).cast("int")
        + F.col("mean_word_len").between(3.0, 10.0).cast("int")
        + (F.col("alpha_word_ratio") >= 0.8).cast("int")
        + (F.col("symbol_to_word") <= 0.1).cast("int")
        + (F.col("bullet_line_frac") <= 0.9).cast("int")
        + (F.col("ellipsis_line_frac") <= 0.3).cast("int")
    )


@register(
    "text_gopher_quality_rules",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id,
             {TX.tokens_sql('text')} AS tk,
             regexp_split_to_array(text, '\n') AS ln,
             CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
               + CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT)
               AS n_sym
      FROM documents
    ), m AS (
      SELECT doc_id,
             CAST(len(tk) AS INTEGER) AS n_words,
             CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)
               / CAST(len(tk) AS DOUBLE) AS mean_word_len,
             CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
               / CAST(len(tk) AS DOUBLE) AS alpha_word_ratio,
             CAST(n_sym AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS symbol_to_word,
             CAST(len(list_filter(ln, l -> regexp_matches(trim(l), '^[-*•]')))
                  AS DOUBLE) / CAST(len(ln) AS DOUBLE) AS bullet_line_frac,
             CAST(len(list_filter(ln, l -> ends_with(trim(l), '...'))) AS DOUBLE)
               / CAST(len(ln) AS DOUBLE) AS ellipsis_line_frac
      FROM feats WHERE len(tk) > 0
    )
    SELECT doc_id, n_words, round(mean_word_len, 6) AS mean_word_len,
           round(alpha_word_ratio, 6) AS alpha_word_ratio,
           round(symbol_to_word, 6) AS symbol_to_word,
           round(bullet_line_frac, 6) AS bullet_line_frac,
           round(ellipsis_line_frac, 6) AS ellipsis_line_frac,
           (n_words BETWEEN 10 AND 100000)
             AND (mean_word_len BETWEEN 3.0 AND 10.0)
             AND alpha_word_ratio >= 0.8
             AND symbol_to_word <= 0.1
             AND bullet_line_frac <= 0.9
             AND ellipsis_line_frac <= 0.3 AS keep
    FROM m
    """,
)
def text_gopher_quality_rules(spark, sf):
    # Gopher-style (Rae et al. 2021, "Scaling Language Models") document
    # quality rules: word-count bounds, mean word length in [3, 10],
    # >=80% words with an alphabetic char, symbol-to-word ratio (# and
    # ellipses), bullet-started and ellipsis-ended line fractions. Like
    # text_char_entropy this is ENTIRELY in-row Catalyst arithmetic over
    # the token/line arrays — a narrow projection, ZERO shuffles at any
    # scale. Ratios use IEEE double division only (+ - * /), which is
    # bit-portable across engines (no libm calls). Metric expressions
    # live in gopher_metric_frame (r13: shared with the streaming
    # quality gate).
    m = gopher_metric_frame(t(spark, sf, "documents"))
    return m.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "alpha_word_ratio",
        "symbol_to_word",
        "bullet_line_frac",
        "ellipsis_line_frac",
        (
            F.col("n_words").between(10, 100000)
            & F.col("mean_word_len").between(3.0, 10.0)
            & (F.col("alpha_word_ratio") >= 0.8)
            & (F.col("symbol_to_word") <= 0.1)
            & (F.col("bullet_line_frac") <= 0.9)
            & (F.col("ellipsis_line_frac") <= 0.3)
        ).alias("keep"),
    )


@register(
    "text_bigram_perplexity",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, {TX.tokens_sql('lower(text)')} AS tk FROM documents
      WHERE len({TX.tokens_sql('lower(text)')}) >= 2
    ), idx AS (
      SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM docs
    ), bigr AS (
      SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2 FROM idx
    ), ctx AS (
      SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bigr GROUP BY w1
    ), bc AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bigr GROUP BY w1, w2
    ), vocab AS (
      SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM (
        SELECT unnest(tk) AS w FROM docs)
    ), scored AS (
      SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             round(exp(CAST(SUM(CAST(round(
                     ln(CAST(c.c1 + v.v AS DOUBLE))
                     - ln(CAST(k.c12 + 1 AS DOUBLE)), 6) AS DECIMAL(38,6)))
                   AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)), 6) AS ppl
      FROM bigr b
      JOIN ctx c ON b.w1 = c.w1
      JOIN bc k ON b.w1 = k.w1 AND b.w2 = k.w2
      CROSS JOIN vocab v
      GROUP BY b.doc_id
    )
    SELECT doc_id, n_bigrams, ppl, ppl <= 31.25 AS keep FROM scored
    """,
)
def text_bigram_perplexity(spark, sf):
    # Bigram upgrade of text_unigram_perplexity: add-one-smoothed
    # p(w2|w1) = (c(w1,w2)+1) / (c(w1)+V) from the corpus's own LM, ppl =
    # exp(-mean log p). A sharper fluency/gibberish gate than unigram —
    # scrambled word order scores high here but identically under the
    # unigram model. Shapes: one token explode feeds three hash aggs
    # (context, bigram, vocab counts — all map-side partial); the bigram
    # stream then equi-joins its two count tables ((w1), (w1,w2) keys —
    # hot function words are AQE-splittable join keys, never window
    # partitions) and one per-doc agg. log terms round to 6 dp and sum
    # as DECIMAL(38,6), the module's cross-engine determinism rule.
    return _bigram_ppl_frame(_lm_tokens_frame(t(spark, sf, "documents")))


def _bigram_ppl_frame(tkall, bc=None):
    bigr = _bigram_stream(tkall)
    if bc is None:
        bc = _bigram_counts(bigr).localCheckpoint(eager=True)
    # c1 (occurrences of w1 as a left word) = sum over w2 of c12 — a
    # rollup of the materialized type table, not a third corpus scan
    ctx = bc.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    # vocab stays its own map-side-partial countDistinct over the token
    # scan: deriving it from bigrams pushes 2x the occurrence mass
    # through the distinct (the measured r16 regression, 1a74218)
    vocab = (
        tkall.where(F.size("tk") >= 2)
        .select(F.explode("tk").alias("w"))
        .agg(F.countDistinct("w").cast("long").alias("v"))
    )
    scored = (
        bigr.join(ctx, "w1")
        .join(bc, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.exp(
                    F.sum(
                        F.round(
                            F.log((F.col("c1") + F.col("v")).cast("double"))
                            - F.log((F.col("c12") + 1).cast("double")),
                            6,
                        ).cast("decimal(38,6)")
                    ).cast("double")
                    / F.count(F.lit(1)).cast("double")
                ),
                6,
            ).alias("ppl"),
        )
    )
    return scored.select(
        "doc_id", "n_bigrams", "ppl", (F.col("ppl") <= 31.25).alias("keep")
    )


# RAKE stoplist — a compact fixed English function-word set; part of the
# query's definition on both engines (like the BM25 terms).
_RAKE_STOP = (
    "a an and are as at be but by for from has he in is it its of on or "
    "that the to was were will with this they their not have had i you "
    "we she his her them our your all can"
).split()


def _rake_stop_sql() -> str:
    return ", ".join(f"'{w}'" for w in _RAKE_STOP)


@register(
    "text_rake_keywords",
    oracle=f"""
    WITH segs AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(array_to_string(
               list_transform({TX.tokens_sql('lower(text)')},
                 w -> CASE WHEN regexp_matches(w, '[^a-z]')
                            OR w IN ({_rake_stop_sql()})
                           THEN '|' ELSE w END), ' '), '|'),
               s -> trim(s)), s -> s <> '') AS ps
      FROM documents
    ), cands AS (
      SELECT doc_id, unnest(ps) AS phrase FROM segs
    ), cands2 AS (
      SELECT doc_id, phrase, len(string_split(phrase, ' ')) AS plen
      FROM cands WHERE len(string_split(phrase, ' ')) <= 3
    ), words_all AS (
      SELECT doc_id, plen, unnest(string_split(phrase, ' ')) AS w FROM cands2
    ), stats AS (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(plen) AS BIGINT) AS deg
      FROM words_all GROUP BY doc_id, w
    ), dphr AS (
      SELECT DISTINCT doc_id, phrase FROM cands2
    ), pw AS (
      SELECT doc_id, phrase, unnest(string_split(phrase, ' ')) AS w FROM dphr
    ), scored AS (
      SELECT p.doc_id, p.phrase,
             round(CAST(SUM(CAST(round(CAST(s.deg AS DOUBLE) / CAST(s.freq AS DOUBLE), 6)
                   AS DECIMAL(38,6))) AS DOUBLE), 6) AS score
      FROM pw p JOIN stats s ON p.doc_id = s.doc_id AND p.w = s.w
      GROUP BY p.doc_id, p.phrase
    )
    SELECT doc_id, phrase, score, "rank" FROM (
      SELECT doc_id, phrase, score,
             CAST(row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, phrase ASC) AS INTEGER)
               AS "rank"
      FROM scored) WHERE "rank" <= 3
    """,
)
def text_rake_keywords(spark, sf):
    # RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    # maximal runs of content words (stopwords and non-alphabetic tokens
    # delimit), each word scores degree/frequency over the doc's own
    # phrase co-occurrence graph, a phrase scores the sum of its words,
    # top-3 per doc. Phrase extraction is pure in-row array algebra
    # (mark-delimiters -> join -> split, no UDF); the two stats aggs and
    # the score join key on (doc_id, word) — high-cardinality,
    # skew-free; the final window partitions by doc_id with
    # doc-length-bounded rows per key. Word scores round to 6 dp and
    # sum as DECIMAL(38,6) (module determinism rule).
    stop_arr = ", ".join(f"'{w}'" for w in _RAKE_STOP)
    d = t(spark, sf, "documents")
    segs = d.select(
        "doc_id",
        F.expr(
            f"filter(transform(split(array_join(transform("
            f"filter(split(lower(text), '{TX.WS}'), x -> x != ''), "
            f"w -> CASE WHEN w rlike '[^a-z]' OR w IN ({stop_arr}) "
            f"THEN '|' ELSE w END), ' '), '\\\\|'), s -> trim(s)), s -> s != '')"
        ).alias("ps"),
    )
    cands = (
        segs.select("doc_id", F.explode("ps").alias("phrase"))
        .withColumn("plen", F.size(F.split("phrase", " ")))
        .where(F.col("plen") <= 3)
    )
    words_all = cands.select(
        "doc_id", "plen", F.explode(F.split("phrase", " ")).alias("w")
    )
    stats = words_all.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("plen").cast("long").alias("deg"),
    )
    dphr = cands.select("doc_id", "phrase").distinct()
    pw = dphr.select("doc_id", "phrase", F.explode(F.split("phrase", " ")).alias("w"))
    scored = (
        pw.join(stats, ["doc_id", "w"])
        .groupBy("doc_id", "phrase")
        .agg(
            F.round(
                F.sum(
                    F.round(
                        F.col("deg").cast("double") / F.col("freq").cast("double"), 6
                    ).cast("decimal(38,6)")
                ).cast("double"),
                6,
            ).alias("score")
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("phrase"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("doc_id", "phrase", "score", "rank")
    )


_BPE_N_MERGES = 8


@register(
    "text_bpe_segment",
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, unnest({TX.tokens_sql('lower(text)')}) AS w FROM documents
    ), pairs AS (
      SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                                   i -> substr(w, i, 2))) AS pair
      FROM toks WHERE len(w) >= 2
    ), merges AS (
      SELECT pair,
             CAST(row_number() OVER (ORDER BY COUNT(*) DESC, pair ASC)
                  AS INTEGER) AS rk
      FROM pairs GROUP BY pair
      QUALIFY rk <= {_BPE_N_MERGES}
    ), n_merges AS (
      SELECT CAST(COUNT(*) AS INTEGER) AS k FROM merges
    ), vocab AS (
      SELECT DISTINCT w FROM toks
    ), seed AS (
      SELECT w, ' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' ' AS seq
      FROM vocab
    ), appl(w, seq, step) AS (
      SELECT w, seq, 0 FROM seed
      UNION ALL
      SELECT a.w,
             replace(a.seq,
                     ' ' || substr(m.pair, 1, 1) || ' ' || substr(m.pair, 2, 1) || ' ',
                     ' ' || m.pair || ' '),
             a.step + 1
      FROM appl a JOIN merges m ON m.rk = a.step + 1
    ), seg AS (
      SELECT w, CAST(len(string_split(trim(seq), ' ')) AS BIGINT) AS pieces
      FROM appl CROSS JOIN n_merges WHERE step = k
    )
    SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(s.pieces) AS BIGINT) AS n_pieces,
           round(CAST(SUM(s.pieces) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS pieces_per_word
    FROM toks t JOIN seg s ON s.w = t.w
    GROUP BY t.doc_id
    """,
)
def text_bpe_segment(spark, sf):
    # Tokenizer TRAIN + APPLY in-engine: learn the top-8 BPE merges from
    # corpus char-bigram counts (the text_bpe_pair_merge trainer), then
    # segment every vocabulary word by applying the merges in rank order
    # as space-delimited literal replacements (one left-to-right
    # non-overlapping pass per merge — the greedy variant; both engines
    # share replace() semantics exactly, and the DuckDB oracle replays
    # the same algorithm with a recursive CTE). Scale shape: merge
    # learning is one hash agg over the token stream; the SEGMENTATION
    # runs over DISTINCT words only (tokenizer cost ∝ vocabulary, not
    # corpus), with the bounded merge table (<=8 rows, like a PQ
    # codebook) collected driver-side to unroll the replace chain; one
    # equi-join fans the per-word piece counts back onto the stream.
    d = t(spark, sf, "documents")
    toks = d.select("doc_id", F.explode(TX.tokens("lower(text)")).alias("w"))
    pairs = toks.filter(F.length("w") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    ranked = (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(_BPE_N_MERGES)
    )
    # bounded driver-side state: <= 8 merge rows, the tokenizer "model"
    merges = [r["pair"] for r in ranked.collect()]
    vocab = toks.select("w").distinct()
    seq = F.concat(
        F.lit(" "), F.trim(F.regexp_replace("w", "(.)", "$1 ")), F.lit(" ")
    )
    for p in merges:
        seq = F.replace(
            seq, F.lit(f" {p[0]} {p[1]} "), F.lit(f" {p} ")
        )
    seg = vocab.select("w", seq.alias("seq")).select(
        "w", F.size(F.split(F.trim("seq"), " ")).cast("long").alias("pieces")
    )
    return (
        toks.join(seg, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("pieces").cast("long").alias("n_pieces"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_pieces",
            F.round(
                F.col("n_pieces").cast("double") / F.col("n_words").cast("double"), 6
            ).alias("pieces_per_word"),
        )
    )


@register(
    "text_inverted_index",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, u.t AS term
      FROM documents,
           UNNEST({TX.tokens_sql('lower(text)')}) AS u(t)
    )
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
    FROM tok
    WHERE length(term) >= 3
    GROUP BY term
    HAVING COUNT(*) >= 2
    """,
)
def text_inverted_index(spark, sf):
    # Inverted-index build (the retrieval-infra sibling of text_bm25_topk,
    # which scores on the fly): term -> document-frequency + an ordered
    # posting list for every term seen in >=2 documents (singletons
    # index nothing useful; a production build would also stop-band
    # df > ~60% of the corpus, but this synthetic vocabulary is nearly
    # all high-df so the cap stays out of the contract). Plan: per-doc
    # DISTINCT terms in-row (array_distinct BEFORE explode, so the
    # shuffle carries each (doc, term) once), one hash agg; the posting
    # list is array_sort + array_join — deterministic and identical to
    # the oracle's ORDER BY string_agg. At 100 TB the df band bounds
    # posting-list width, and the agg is partial-aggregatable.
    d = t(spark, sf, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(f"filter(split(lower(text), '{TX.WS}'), x -> x != '')")
            )
        ).alias("term"),
    ).filter(F.length("term") >= 3)
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.array_join(
                F.expr("transform(array_sort(collect_list(doc_id)), x -> cast(x as string))"),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") >= 2)
    )


@register(
    "text_ngram_novelty",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, unnest({TX.word_shingles_sql('text', 3)}) AS shingle
      FROM documents
    ), first_seen AS (
      SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
             AS BIGINT) AS n_novel,
           ROUND(CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                   AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
    FROM sh s JOIN first_seen f ON f.shingle = s.shingle
    GROUP BY s.doc_id
    """,
)
def text_ngram_novelty(spark, sf):
    # Per-document n-gram novelty: the fraction of a document's distinct
    # word trigrams that NO lower-id document contains — the curation
    # signal that separates genuinely new content from recombinations
    # of what the corpus already holds (the doc-level view of what
    # dedup_global_first_segment decides line-by-line). Plan: in-row
    # shingling + per-doc distinct (array ops before the explode), one
    # hash agg for the global first-seen owner per shingle, one
    # equi-join back, one per-doc count agg — two shuffles total, both
    # on the shingle/doc hash, no windows. At 100 TB the shingle agg is
    # the same shape the MinHash pipeline already scales.
    d = t(spark, sf, "documents")
    toks = f"filter(split(text, '{TX.WS}'), x -> x != '')"
    sh = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(TX.shingles_from_tokens(toks, 3))
        ).alias("shingle"),
    )
    first_seen = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    joined = sh.join(first_seen, "shingle")
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    ).cast("long")
    n = F.count(F.lit(1)).cast("long")
    return joined.groupBy("doc_id").agg(
        n.alias("n_shingles"),
        novel.alias("n_novel"),
        F.round(novel.cast("double") / n.cast("double"), 6).alias("novelty"),
    )


def _textrank_oracle() -> str:
    # 5 UNROLLED power-iteration stages (v1..v5), each one join of the
    # edge list with the previous scores — per-contribution 6dp-decimal
    # rounding keeps the sums order-independent across engines
    it = """
    , v{k} AS (
      SELECT e.w2 AS term,
             ROUND(0.15 / (SELECT n FROM nn)
                   + 0.85 * CAST(SUM(CAST(ROUND(
                       e.w / d.deg * v.score, 6) AS DECIMAL(38,6))) AS DOUBLE),
             6) AS score
      FROM edges e
      JOIN deg d ON d.term = e.w1
      JOIN v{p} v ON v.term = e.w1
      GROUP BY e.w2
    )"""
    its = "".join(it.format(k=k, p=k - 1) for k in range(1, 6))
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '{TX.WS_D}'),
                         x -> x != '') AS l
      FROM documents
    ), pairs AS (
      SELECT u.p[1] AS w1, u.p[2] AS w2
      FROM toks, UNNEST(list_transform(generate_series(1, greatest(len(l) - 1, 0)),
           i -> [l[i], l[i + 1]])) AS u(p)
      WHERE length(u.p[1]) >= 3 AND length(u.p[2]) >= 3 AND u.p[1] != u.p[2]
    ), edges AS (
      SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS w FROM (
        SELECT w1, w2 FROM pairs UNION ALL SELECT w2, w1 FROM pairs
      ) GROUP BY w1, w2
    ), deg AS (
      SELECT w1 AS term, CAST(SUM(w) AS DOUBLE) AS deg FROM edges GROUP BY w1
    ), nn AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg
    ), v0 AS (
      SELECT term, ROUND(1.0 / (SELECT n FROM nn), 6) AS score FROM deg
    ){its}
    SELECT term, score, rk FROM (
      SELECT term, score,
             CAST(row_number() OVER (ORDER BY score DESC, term ASC) AS INTEGER) AS rk
      FROM v5
    ) WHERE rk <= 20
    """


@register("text_textrank_keywords", oracle=_textrank_oracle())
def text_textrank_keywords(spark, sf):
    # TextRank keyword centrality (Mihalcea & Tarau 2004): random-walk
    # scores over the corpus co-occurrence graph (adjacent token pairs,
    # undirected, count-weighted), 5 damped power iterations
    # (d = 0.85), top-20 terms. An ITERATIVE algorithm hash-matched by
    # an iteration-UNROLLED SQL oracle (the BPE/CUSUM proof pattern):
    # every contribution w_uv/deg_u * v_u is rounded to 6 dp and summed
    # as DECIMAL, so both engines walk identical numbers. Scale shape:
    # edge extraction is one explode + hash agg over the corpus; every
    # iteration after that joins frames bounded by the VOCABULARY (the
    # graph), not the corpus — 5 tiny joins, then a TakeOrdered top-20
    # with a window-free bounded rank.
    from dataingestionplayground_spark.operators.prefix import bounded_rank

    d = t(spark, sf, "documents")
    toks = d.select(
        F.expr(f"filter(split(lower(text), '{TX.WS}'), x -> x != '')").alias("l")
    )
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(l) - 1, 0)), "
                "i -> struct(element_at(l, i) as w1, element_at(l, i + 1) as w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2").filter(
        (F.length("w1") >= 3) & (F.length("w2") >= 3) & (F.col("w1") != F.col("w2"))
    )
    edges = (
        pairs.unionByName(pairs.select(F.col("w2").alias("w1"), F.col("w1").alias("w2")))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    deg = edges.groupBy(F.col("w1").alias("term")).agg(F.sum("w").alias("deg"))
    n = deg.count()  # vocabulary-bounded (graph nodes), never corpus-sized
    v = deg.select("term", F.round(F.lit(1.0 / n), 6).alias("score"))
    ed = edges.join(deg.withColumnRenamed("term", "w1"), "w1")
    for _ in range(5):
        v = (
            ed.join(v.withColumnRenamed("term", "w1"), "w1")
            .select(
                F.col("w2").alias("term"),
                F.round(F.col("w") / F.col("deg") * F.col("score"), 6)
                .cast("decimal(38,6)")
                .alias("c"),
            )
            .groupBy("term")
            .agg(
                F.round(
                    F.lit(0.15 / n) + 0.85 * F.sum("c").cast("double"), 6
                ).alias("score")
            )
        )
    top = v.orderBy(F.desc("score"), F.asc("term")).limit(20)
    return bounded_rank(top, [("score", False), ("term", True)], "rk")


@register(
    "text_collocation_pmi",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, {TX.tokens_sql('lower(text)')} AS tk FROM documents
      WHERE len({TX.tokens_sql('lower(text)')}) >= 2
    ), idx AS (
      SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM docs
    ), bigr AS (
      SELECT tk[i] AS w1, tk[i + 1] AS w2 FROM idx
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM bigr
    ), lm AS (
      SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bigr GROUP BY w1
    ), rm AS (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bigr GROUP BY w2
    ), bc AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bigr GROUP BY w1, w2
    )
    SELECT bc.w1, bc.w2, bc.c12,
           round(ln(CAST(bc.c12 AS DOUBLE) * CAST(n.nb AS DOUBLE)
               / (CAST(lm.c1 AS DOUBLE) * CAST(rm.c2 AS DOUBLE))), 6) AS pmi
    FROM bc JOIN lm ON bc.w1 = lm.w1 JOIN rm ON bc.w2 = rm.w2 CROSS JOIN n
    WHERE bc.c12 >= 3
    ORDER BY pmi DESC, bc.w1 ASC, bc.w2 ASC LIMIT 100
    """,
)
def text_collocation_pmi(spark, sf):
    # Pointwise-mutual-information collocation extraction (Church &
    # Hanks 1990): PMI(w1,w2) = ln(c12*N / (c1*c2)) over adjacent-token
    # bigrams with margin counts as the unigram model, min support
    # c12 >= 3 to kill the low-count PMI explosion. The classic
    # phrase-mining pass of a corpus pipeline (multi-word expressions,
    # tokenizer vocab candidates). Shapes: one bigram explode feeds
    # three hash aggs (pair + two margins, all map-side partial); the
    # pair table equi-joins its two margin tables on word keys (hot
    # function words are AQE-splittable JOIN keys, never window
    # partitions); top-100 is a TakeOrdered with a total-order
    # tie-break, not a global window. The ln argument is assembled with
    # the same expression tree on both engines (module float rule).
    d = t(spark, sf, "documents")
    docs = d.select("doc_id", TX.tokens("lower(text)").alias("tk")).where(
        F.size("tk") >= 2
    )
    bigr = docs.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 1), "
                "i -> struct(element_at(tk, i) AS w1, element_at(tk, i + 1) AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    n = bigr.agg(F.count(F.lit(1)).cast("long").alias("nb"))
    lm = bigr.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    rm = bigr.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("c2"))
    bc = (
        bigr.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .filter(F.col("c12") >= 3)
    )
    pmi = F.round(
        F.log(
            F.col("c12").cast("double")
            * F.col("nb").cast("double")
            / (F.col("c1").cast("double") * F.col("c2").cast("double"))
        ),
        6,
    )
    return (
        bc.join(lm, "w1")
        .join(rm, "w2")
        .crossJoin(F.broadcast(n))
        .select("w1", "w2", "c12", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(100)
    )


@register(
    "text_interpolated_perplexity",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, {TX.tokens_sql('lower(text)')} AS tk FROM documents
      WHERE len({TX.tokens_sql('lower(text)')}) >= 2
    ), idx AS (
      SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM docs
    ), bigr AS (
      SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2 FROM idx
    ), ctx AS (
      SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bigr GROUP BY w1
    ), bc AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bigr GROUP BY w1, w2
    ), uni AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cw
      FROM (SELECT unnest(tk) AS w FROM docs) GROUP BY w
    ), tot AS (
      SELECT CAST(SUM(cw) AS BIGINT) AS nt, CAST(COUNT(*) AS BIGINT) AS v FROM uni
    ), scored AS (
      SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             round(exp(-CAST(SUM(CAST(round(ln(
                     0.7 * (CAST(k.c12 + 1 AS DOUBLE) / CAST(c.c1 + t.v AS DOUBLE))
                   + 0.3 * (CAST(u.cw + 1 AS DOUBLE) / CAST(t.nt + t.v AS DOUBLE))
                   ), 6) AS DECIMAL(38,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)),
             6) AS ppl
      FROM bigr b
      JOIN ctx c ON b.w1 = c.w1
      JOIN bc k ON b.w1 = k.w1 AND b.w2 = k.w2
      JOIN uni u ON b.w2 = u.w
      CROSS JOIN tot t
      GROUP BY b.doc_id
    )
    SELECT doc_id, n_bigrams, ppl, ppl <= 25.0 AS keep FROM scored
    """,
)
def text_interpolated_perplexity(spark, sf):
    # Jelinek-Mercer interpolated LM perplexity: p(w2|w1) =
    # 0.7 * p_bigram + 0.3 * p_unigram (both add-one smoothed) — the
    # classic backoff that keeps the bigram model's word-order
    # sensitivity (text_bigram_perplexity) without its cliff on unseen
    # bigrams, where pure add-one collapses to ~1/V and one rare
    # transition dominates a short doc's score.
    #
    # Plan (r10 verdict item 4, ADJUDICATED BY MEASUREMENT in r11): the
    # stream joins its three count tables directly — all three are
    # vocab-sized, so they BROADCAST (AQE demotes to shuffled joins only
    # if a 100TB vocab outgrows the threshold) and the only corpus-scale
    # shuffles are the count aggs + the per-doc reduction. The driver's
    # r10 8.27x step flagged this shape; r11 built and head-to-head
    # timed both suggested alternatives on idle-host bench replicas:
    # (a) pre-aggregating the stream to (doc_id, w1, w2, n) first —
    # 2.7x SLOWER (wide near-unique keys, no collapse, and the shuffle
    # replaces broadcasts, not shuffles); (b) folding the three count
    # tables into one (w1,w2) dimension joined once — 1.7x slower
    # (the dim build adds serial stages and defeats exchange reuse).
    # This original shape measured best ABSOLUTE and best STEP
    # (sf0.5->sf1.0 2x rows: 1.34 min / 1.52 median, vs 2.31/3.39 and
    # 2.49/2.58 for the alternatives) — the r10 8.27x reads as the
    # driver-host event its own canary pattern suggested, not a plan
    # defect. Kept: per-term ln is 6dp-rounded and decimal-summed per
    # doc; the mixed probability evaluates with the identical
    # expression tree on both engines before the single rounded log.
    return _interpolated_ppl_frame(_lm_tokens_frame(t(spark, sf, "documents")))


def _interpolated_ppl_frame(tkall, bc=None):
    bigr = _bigram_stream(tkall)
    if bc is None:
        bc = _bigram_counts(bigr).localCheckpoint(eager=True)
    ctx = bc.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    # unigram counts must include first-token positions, so uni cannot
    # derive from bc — but it IS read twice (join side + the nt/v
    # total), so materialize the vocabulary-sized table once too
    uni = (
        tkall.where(F.size("tk") >= 2)
        .select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cw"))
        .localCheckpoint(eager=True)
    )
    tot = uni.agg(
        F.sum("cw").cast("long").alias("nt"), F.count(F.lit(1)).cast("long").alias("v")
    )
    p_mix = F.lit(0.7) * (
        (F.col("c12") + 1).cast("double") / (F.col("c1") + F.col("v")).cast("double")
    ) + F.lit(0.3) * (
        (F.col("cw") + 1).cast("double") / (F.col("nt") + F.col("v")).cast("double")
    )
    scored = (
        bigr.join(ctx, "w1")
        .join(bc, ["w1", "w2"])
        .join(uni.withColumnRenamed("w", "w2"), "w2")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.exp(
                    -F.sum(F.round(F.log(p_mix), 6).cast("decimal(38,6)")).cast(
                        "double"
                    )
                    / F.count(F.lit(1)).cast("double")
                ),
                6,
            ).alias("ppl"),
        )
    )
    return scored.select(
        "doc_id", "n_bigrams", "ppl", (F.col("ppl") <= 25.0).alias("keep")
    )


@register(
    "text_flesch_readability",
    oracle=f"""
    WITH counts AS (
      SELECT doc_id,
             CAST(len({TX.tokens_sql('text')}) AS BIGINT) AS n_words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS BIGINT) AS n_sentences,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
               AS BIGINT) AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           round(206.835
                 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                 - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)),
                 4) AS flesch
    FROM counts WHERE n_words > 0
    """,
)
def text_flesch_readability(spark, sf):
    # Flesch reading-ease per document — the classic readability prior
    # a curation pipeline mixes into quality scoring (very low scores
    # flag legalese/boilerplate, implausibly high ones flag word-salad).
    # Syllables use the standard large-corpus approximation (count of
    # vowel-group runs, y vocalic) — exact hyphenation is dictionary
    # work; the approximation is the published way to run Flesch at
    # corpus scale and is pinned as the contract here. All three counts
    # are per-row JVM regexps (no shuffle at all until the driver
    # collects); sentence count floors at 1 so fragment-only docs stay
    # defined. Integer counts -> one final double expression, rounded.
    d = t(spark, sf, "documents")
    counts = d.select(
        "doc_id",
        F.size(TX.tokens("text")).cast("long").alias("n_words"),
        F.greatest(
            F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")),
            F.lit(1),
        )
        .cast("long")
        .alias("n_sentences"),
        F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
        .cast("long")
        .alias("n_syllables"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("n_words").cast("double") / F.col("n_sentences").cast("double"))
        - F.lit(84.6)
        * (F.col("n_syllables").cast("double") / F.col("n_words").cast("double"))
    )
    return counts.filter(F.col("n_words") > 0).select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(flesch, 4).alias("flesch"),
    )


@register(
    "text_feature_hashing",
    oracle=f"""
    SELECT doc_id, {md5_mod_sql('term', 64)} AS bucket, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT doc_id, unnest({TX.tokens_sql('lower(text)')}) AS term FROM documents)
    GROUP BY 1, 2
    """,
)
def text_feature_hashing(spark, sf):
    # The hashing trick (Weinberger et al. 2009): project an unbounded
    # vocabulary onto a FIXED 64-dim count vector by hashing each token
    # to a bucket — the no-vocabulary feature extractor for linear
    # quality/language classifiers at corpus scale. There is no term
    # dictionary to build, broadcast, or keep consistent across runs:
    # the feature space is defined by the hash alone, so two corpora
    # (or two dates of the same corpus) are featurized independently
    # and remain comparable. One explode + one hash-agg (map-side
    # partial) — the same shape as a token count, no join anywhere.
    # md5-derived buckets (functions/portable.md5_mod) keep the vector
    # reproducible across engines, unlike Spark's hash()/xxhash64().
    d = t(spark, sf, "documents")
    toks = d.select(
        "doc_id", F.explode(TX.tokens("lower(text)")).alias("term")
    )
    return (
        toks.withColumn("bucket", F.expr(md5_mod("term", 64)))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "text_kneser_ney_perplexity",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, {TX.tokens_sql('lower(text)')} AS tk FROM documents
      WHERE len({TX.tokens_sql('lower(text)')}) >= 2
    ), idx AS (
      SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM docs
    ), bigr AS (
      SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2 FROM idx
    ), bc AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bigr GROUP BY w1, w2
    ), ctx AS (
      SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1, CAST(COUNT(*) AS BIGINT) AS n1f
      FROM bc GROUP BY w1
    ), bwd AS (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b FROM bc GROUP BY w2
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM bc
    ), scored AS (
      SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             round(exp(-CAST(SUM(CAST(round(ln(
                 (CAST(k.c12 AS DOUBLE) - 0.75) / CAST(c.c1 AS DOUBLE)
               + (0.75 * CAST(c.n1f AS DOUBLE) / CAST(c.c1 AS DOUBLE))
                 * (CAST(d2.n1b AS DOUBLE) / CAST(t.nb AS DOUBLE))
               ), 6) AS DECIMAL(38,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)),
             6) AS ppl
      FROM bigr b
      JOIN ctx c ON b.w1 = c.w1
      JOIN bc k ON b.w1 = k.w1 AND b.w2 = k.w2
      JOIN bwd d2 ON b.w2 = d2.w2
      CROSS JOIN tot t
      GROUP BY b.doc_id
    )
    SELECT doc_id, n_bigrams, ppl FROM scored
    """,
)
def text_kneser_ney_perplexity(spark, sf):
    # Interpolated Kneser-Ney bigram perplexity (Kneser & Ney 1995,
    # absolute discount D = 0.75) — the LM-smoothing gold standard the
    # Jelinek-Mercer query approximates: instead of backing off to raw
    # unigram frequency, the lower-order model is the CONTINUATION
    # probability n1+(.w2)/|bigram types| ("in how many contexts does
    # w2 complete a bigram"), which stops high-frequency-but-
    # context-bound words (the "San Francisco" effect: 'francisco' is
    # frequent yet predicts almost nothing outside one context) from
    # inflating backoff mass. p(w2|w1) = (c12 - D)/c1 +
    # (D * n1+(w1.)/c1) * p_cont(w2). Every term comes from the SAME
    # bigram-type table the JM query already builds — c1 and the two
    # type counts are rollups of bc, so the plan is one bigram explode,
    # one (w1,w2) hash-agg, two tiny rollup aggs, three
    # vocabulary-sized (broadcastable) equi-joins. Scored bigrams all
    # have c12 >= 1 > D, so the discounted term stays positive and the
    # rounded-ln/decimal-sum determinism discipline applies unchanged.
    return _kn_ppl_frame(_lm_tokens_frame(t(spark, sf, "documents")))


def _kn_ppl_frame(tkall, bc=None):
    bigr = _bigram_stream(tkall)
    # all three count tables (and the type total) are rollups of the
    # ONE materialized bigram-type table — see _bigram_counts; the gate
    # table passes its shared copy in
    if bc is None:
        bc = _bigram_counts(bigr).localCheckpoint(eager=True)
    ctx = bc.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1f"),
    )
    bwd = bc.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n1b"))
    tot = bc.agg(F.count(F.lit(1)).cast("long").alias("nb"))
    p_kn = (F.col("c12").cast("double") - F.lit(0.75)) / F.col("c1").cast(
        "double"
    ) + (
        F.lit(0.75) * F.col("n1f").cast("double") / F.col("c1").cast("double")
    ) * (
        F.col("n1b").cast("double") / F.col("nb").cast("double")
    )
    return (
        bigr.join(ctx, "w1")
        .join(bc, ["w1", "w2"])
        .join(bwd, "w2")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.exp(
                    -F.sum(F.round(F.log(p_kn), 6).cast("decimal(38,6)")).cast(
                        "double"
                    )
                    / F.count(F.lit(1)).cast("double")
                ),
                6,
            ).alias("ppl"),
        )
    )


@register(
    "text_vocab_overlap_sources",
    oracle=f"""
    WITH tv AS (
      SELECT DISTINCT source, unnest({TX.tokens_sql('lower(text)')}) AS term
      FROM documents
    ), sz AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS v FROM tv GROUP BY source
    ), inter AS (
      SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS both
      FROM tv a JOIN tv b ON a.term = b.term AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT i.src_a, i.src_b, sa.v AS v_a, sb.v AS v_b, i.both,
           round(CAST(i.both AS DOUBLE)
                 / CAST(sa.v + sb.v - i.both AS DOUBLE), 6) AS jaccard
    FROM inter i
    JOIN sz sa ON sa.source = i.src_a
    JOIN sz sb ON sb.source = i.src_b
    """,
)
def text_vocab_overlap_sources(spark, sf):
    # Pairwise vocabulary Jaccard between corpus sources — the "how
    # different are these datasets really" diagnostic you run before
    # choosing mixture weights (two crawls with 0.9 vocabulary overlap
    # add less diversity than their row counts suggest). The corpus is
    # scanned ONCE into a (source, term) distinct table; after that,
    # every join is vocabulary-sized: per-source sizes are a tiny agg,
    # and the pairwise intersection is a self-equi-join ON TERM (never
    # a doc-level cross product) whose output is bounded by
    # |vocab| x |sources choose 2|. At 100 TB sources is a handful and
    # vocab is df-capped, so this stays a broadcast-class analysis.
    d = t(spark, sf, "documents")
    # in-row dedup BEFORE the explode (the inverted-index discipline):
    # the cross-doc distinct still shuffles, but on per-doc term SETS
    # rather than raw token occurrences
    tv = d.select(
        "source",
        F.explode(F.array_distinct(TX.tokens("lower(text)"))).alias("term"),
    ).distinct()
    sz = tv.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("v"))
    a = tv.alias("a")
    b = tv.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("both"))
    )
    sa = sz.select(F.col("source").alias("src_a"), F.col("v").alias("v_a"))
    sb = sz.select(F.col("source").alias("src_b"), F.col("v").alias("v_b"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "v_a",
            "v_b",
            "both",
            F.round(
                F.col("both").cast("double")
                / (F.col("v_a") + F.col("v_b") - F.col("both")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "text_lang_confusion_matrix",
    oracle=f"""
    WITH scored AS (SELECT doc_id, lang, {_lang_score_sqls()} FROM documents),
    pred AS (SELECT lang AS actual, {_PRED_CASE} AS pred FROM scored),
    cm AS (
      SELECT actual, pred, CAST(COUNT(*) AS BIGINT) AS n
      FROM pred GROUP BY actual, pred
    ), per_actual AS (
      SELECT actual, CAST(SUM(n) AS BIGINT) AS n_actual FROM cm GROUP BY actual
    ), per_pred AS (
      SELECT pred, CAST(SUM(n) AS BIGINT) AS n_pred FROM cm GROUP BY pred
    )
    SELECT cm.actual, cm.pred, cm.n,
           round(CAST(cm.n AS DOUBLE) / CAST(a.n_actual AS DOUBLE), 6) AS recall_share,
           round(CAST(cm.n AS DOUBLE) / CAST(p.n_pred AS DOUBLE), 6) AS precision_share
    FROM cm
    JOIN per_actual a ON a.actual = cm.actual
    JOIN per_pred p ON p.pred = cm.pred
    """,
)
def text_lang_confusion_matrix(spark, sf):
    # The eval harness for the language-ID heuristic: full confusion
    # matrix (actual x predicted) with per-cell recall and precision
    # shares — grading the PRODUCTION classifier expression (the same
    # _PRED_CASE text_language_id ships) against the labeled lang
    # column, the retrieval_eval_ndcg pattern applied to
    # classification. One scan scores every doc; everything after is
    # |langs|^2-sized (the matrix and both marginals broadcast at any
    # corpus scale).
    d = t(spark, sf, "documents")
    scored = d.select("lang", *_lang_score_cols())
    pred = scored.select(
        F.col("lang").alias("actual"), F.expr(_PRED_CASE).alias("pred")
    )
    cm = pred.groupBy("actual", "pred").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    pa = cm.groupBy("actual").agg(F.sum("n").cast("long").alias("n_actual"))
    pp = cm.groupBy("pred").agg(F.sum("n").cast("long").alias("n_pred"))
    return (
        cm.join(F.broadcast(pa), "actual")
        .join(F.broadcast(pp), "pred")
        .select(
            "actual",
            "pred",
            "n",
            F.round(
                F.col("n").cast("double") / F.col("n_actual").cast("double"), 6
            ).alias("recall_share"),
            F.round(
                F.col("n").cast("double") / F.col("n_pred").cast("double"), 6
            ).alias("precision_share"),
        )
    )


_ZIPF_TOP = 1000


@register(
    "text_zipf_fit",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT unnest({TX.tokens_sql('lower(text)')}) AS w FROM documents
    ), vocab AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY w
    ), top AS MATERIALIZED (
      SELECT w, cnt FROM vocab ORDER BY cnt DESC, w ASC LIMIT {_ZIPF_TOP}
    ), rk AS MATERIALIZED (
      SELECT cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, w ASC) AS BIGINT) AS rnk
      FROM top
    ), xy AS MATERIALIZED (
      SELECT round(ln(CAST(rnk AS DOUBLE)), 6) AS x,
             round(ln(CAST(cnt AS DOUBLE)), 6) AS y
      FROM rk
    ), s AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(round(x * y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(round(x * x, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxx
      FROM xy
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           round((sy - round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) * sx)
                 / n, 6) AS intercept
    FROM s
    """,
)
def text_zipf_fit(spark, sf):
    # Zipf's-law fit over the corpus unigram distribution: OLS slope of
    # ln(frequency) on ln(rank) over the top-1000 terms — the classic
    # corpus-health diagnostic (natural language sits near slope -1;
    # boilerplate-heavy or synthetic corpora bend the curve). Rank is
    # GlobalLimit-bounded (orderBy + limit then bounded_rank — never an
    # unpartitioned window over the unbounded vocabulary); the OLS
    # sufficient statistics are 6dp-rounded decimal sums (order-free),
    # the slope/intercept each ONE division of settled doubles, and the
    # intercept reuses the ROUNDED slope so both engines walk the same
    # number. Plan shape: token explode -> one vocab hash agg ->
    # 1000-row everything.
    from dataingestionplayground_spark.operators.prefix import bounded_rank

    d = t(spark, sf, "documents")
    toks = d.select(F.explode(TX.tokens("lower(text)")).alias("w"))
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    top = vocab.orderBy(F.desc("cnt"), F.asc("w")).limit(_ZIPF_TOP)
    rk = bounded_rank(top, [("cnt", False), ("w", True)], "rnk")
    xy = rk.select(
        F.round(F.log(F.col("rnk").cast("double")), 6).alias("x"),
        F.round(F.log(F.col("cnt").cast("double")), 6).alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast("decimal(38,6)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,6)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxx"),
    )
    slope = F.round(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
        6,
    )
    return s.select(
        F.col("n").cast("long").alias("n_terms"),
        slope.alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


@register(
    "text_burstiness",
    oracle=f"""
    WITH dc AS MATERIALIZED (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest({TX.tokens_sql('lower(text)')}) AS w
            FROM documents)
      GROUP BY doc_id, w
    ), stats AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(c) AS BIGINT) AS sc,
             CAST(SUM(c * c) AS BIGINT) AS sc2
      FROM dc GROUP BY w
    ), vmr AS MATERIALIZED (
      SELECT w, df, sc,
             round(CAST(df * sc2 - sc * sc AS DOUBLE)
                   / CAST((df - 1) * sc AS DOUBLE), 6) AS vmr
      FROM stats WHERE df >= 10
    ), top AS MATERIALIZED (
      SELECT w, df, sc, vmr FROM vmr ORDER BY vmr DESC, w ASC LIMIT 20
    )
    SELECT w AS term, df, sc AS n_occurrences, vmr,
           CAST(row_number() OVER (ORDER BY vmr DESC, w ASC) AS INTEGER) AS rnk
    FROM top
    """,
)
def text_burstiness(spark, sf):
    # Term burstiness (Church & Gale 1995): variance-to-mean ratio of
    # per-document counts over the documents CONTAINING the term —
    # VMR ~ 1 is Poisson scatter (function words), VMR >> 1 means the
    # term clumps into few documents (topical/boilerplate signal; the
    # feature behind burst-aware TF weighting and boilerplate screens).
    # Every sufficient statistic (df, sum c, sum c^2) is EXACT integer
    # arithmetic — VMR = (df*sc2 - sc^2) / ((df-1)*sc) is ONE double
    # division of exact BIGINTs, rounded 6dp, so the hash match is
    # trivial. Plan shape: token explode -> (doc, term) hash agg ->
    # term hash agg (both map-side partial) -> GlobalLimit top-20 ->
    # bounded rank. df floor 10 keeps the estimator out of the
    # small-sample regime.
    from dataingestionplayground_spark.operators.prefix import bounded_rank

    d = t(spark, sf, "documents")
    dc = (
        d.select("doc_id", F.explode(TX.tokens("lower(text)")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    stats = dc.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sc2"),
    )
    vmr = stats.filter(F.col("df") >= 10).select(
        "w",
        "df",
        "sc",
        F.round(
            (F.col("df") * F.col("sc2") - F.col("sc") * F.col("sc")).cast("double")
            / ((F.col("df") - 1) * F.col("sc")).cast("double"),
            6,
        ).alias("vmr"),
    )
    top = vmr.orderBy(F.desc("vmr"), F.asc("w")).limit(20)
    ranked = bounded_rank(top, [("vmr", False), ("w", True)], "rnk")
    return ranked.select(
        F.col("w").alias("term"),
        "df",
        F.col("sc").alias("n_occurrences"),
        "vmr",
        "rnk",
    )


@register(
    "text_token_fertility",
    oracle=f"""
    WITH scored AS MATERIALIZED (
      SELECT doc_id, text, {_lang_score_sqls()} FROM documents
    ), pred AS MATERIALIZED (
      SELECT {_PRED_CASE} AS pred_lang,
             CAST(len({TX.tokens_sql('text')}) AS BIGINT) AS n_toks,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
      FROM scored
    )
    SELECT pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(n_bytes) AS BIGINT) AS n_bytes,
           round(CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(n_toks) AS DOUBLE), 6)
             AS chars_per_token,
           round(CAST(SUM(n_bytes) AS DOUBLE) / CAST(SUM(n_toks) AS DOUBLE), 6)
             AS bytes_per_token
    FROM pred WHERE n_toks > 0 GROUP BY pred_lang
    """,
)
def text_token_fertility(spark, sf):
    # Tokenizer fertility by (predicted) language — chars/token and
    # bytes/token per language bucket, the number a multilingual token
    # budget is actually priced in (CJK text costs ~3 bytes/char in
    # UTF-8 and whitespace tokenization under-segments it; fertility
    # tables are how mixture weights get converted between doc counts,
    # bytes, and tokens). Language is the in-row stopword-ratio
    # predictor (same expression the oracle-checked text_language_id
    # uses), so the whole query is ONE projection + ONE 5-key hash agg
    # with exact BIGINT sums — zero joins, zero corpus shuffles beyond
    # the map-side-partial agg; ratios are one double division each.
    d = t(spark, sf, "documents")
    scored = d.select("doc_id", "text", *_lang_score_cols())
    pred = scored.select(
        F.expr(_PRED_CASE).alias("pred_lang"),
        F.size(TX.tokens("text")).cast("long").alias("n_toks"),
        F.length("text").cast("long").alias("n_chars"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    ).filter(F.col("n_toks") > 0)
    return pred.groupBy("pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.sum("n_bytes").cast("long").alias("n_bytes"),
        F.round(
            F.sum("n_chars").cast("double") / F.sum("n_toks").cast("double"), 6
        ).alias("chars_per_token"),
        F.round(
            F.sum("n_bytes").cast("double") / F.sum("n_toks").cast("double"), 6
        ).alias("bytes_per_token"),
    )


@register(
    "text_type_token_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({TX.tokens_sql('lower(text)')}) AS w FROM documents
    ), wc AS (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY doc_id, w
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           round(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS ttr,
           round(CAST(COUNT(*) FILTER (c = 1) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS hapax_frac
    FROM wc GROUP BY doc_id
    """,
)
def text_type_token_stats(spark, sf):
    # Lexical-diversity diagnostics per document: type-token ratio and
    # hapax-legomenon fraction — the standard "is this doc repetitive
    # template churn or real prose" signals a curation pipeline reads
    # next to perplexity (low TTR = boilerplate/spam; hapax-heavy = OCR
    # noise / gibberish vocabulary). Plan shape: token explode -> ONE
    # (doc, word) hash agg (map-side partials collapse repeats) -> ONE
    # doc-keyed agg; both aggs key on corpus-scaling columns, no
    # windows, no skew (per-doc type counts are bounded by doc length).
    # All ratios divide two exact integers as one double op — bit-
    # portable; rounded to 6dp per the repo rule.
    d = t(spark, sf, "documents")
    toks = d.select("doc_id", F.explode(TX.tokens("lower(text)")).alias("w"))
    wc = toks.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return wc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.sum("c").cast("double"), 6
        ).alias("ttr"),
        F.round(
            F.count_if(F.col("c") == 1).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("hapax_frac"),
    )


def _bpe_train_oracle(n_merges: int = 3) -> str:
    # unrolled BPE training (the PCA/Markov fixed-iteration proof
    # pattern): per iteration, count adjacent symbol pairs over the
    # WORD-FREQUENCY table, pick the (count desc, lex) best, and merge
    # it everywhere via replace() — left-to-right non-overlapping in
    # both engines, which IS the BPE merge rule. Symbol sequences ride
    # as '<sym>' token strings (alpha-only vocab, so the delimiters
    # cannot collide with symbol text).
    toks = TX.tokens_sql("lower(text)")
    ctes = [
        f"""toks AS (
      SELECT unnest({toks}) AS w FROM documents
    ), vocab AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM toks
      WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w
    ), s0 AS (
      SELECT '<' || array_to_string(
               list_transform(generate_series(1, length(w)),
                              i -> substr(w, i, 1)), '><') || '>' AS seq,
             n
      FROM vocab
    )"""
    ]
    for k in range(1, n_merges + 1):
        prev = f"s{k - 1}"
        ctes.append(
            f"""sy{k} AS (
      SELECT n, string_split(trim(seq, '<>'), '><') AS sy FROM {prev}
    ), p{k} AS (
      SELECT sy[i] AS a, sy[i + 1] AS b, CAST(SUM(n) AS BIGINT) AS cnt
      FROM sy{k}, unnest(generate_series(1, len(sy) - 1)) AS u(i)
      GROUP BY sy[i], sy[i + 1]
    ), b{k} AS (
      SELECT a, b, cnt FROM p{k} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
    ), s{k} AS (
      SELECT replace(seq, '<' || b{k}.a || '><' || b{k}.b || '>',
                     '<' || b{k}.a || b{k}.b || '>') AS seq, n
      FROM {prev} CROSS JOIN b{k}
    )"""
        )
    unions = "\n    UNION ALL ".join(
        f"SELECT CAST({k} AS INTEGER) AS step, a AS sym_a, b AS sym_b, "
        f"a || b AS merged, cnt AS pair_count FROM b{k}"
        for k in range(1, n_merges + 1)
    )
    return "WITH " + ", ".join(ctes) + "\n    " + unions


@register("text_bpe_train_merges", oracle=_bpe_train_oracle())
def text_bpe_train_merges(spark, sf):
    # BPE tokenizer TRAINING, three merge iterations unrolled — the
    # iterative-algorithm oracle pattern (PCA power iteration, Markov
    # stationary, TextRank) applied to subword induction. Where
    # text_bpe_pair_merge ranks ONE round's candidates, this actually
    # TRAINS: per iteration the most frequent adjacent symbol pair
    # (frequency-weighted, ties broken lexicographically — total and
    # deterministic) merges everywhere and the next round counts over
    # the updated sequences. Sequences are '<sym>' token strings;
    # merge = one replace() per word, whose left-to-right
    # non-overlapping semantics (identical in Spark and DuckDB) is
    # exactly the BPE merge rule, so no per-row fold state is needed.
    # Scale shape: ONE corpus token scan builds the word-frequency
    # table; every iteration after that runs on the VOCAB (distinct
    # words), the standard BPE-training trick — pair counting is a
    # (vocab x word-length)-row explode into a map-side-partial agg,
    # the argmax is a 1-row TakeOrdered, and the merge is a broadcast
    # crossjoin + per-row replace. Nothing corpus-sized after the
    # first scan; vocab frames localCheckpoint so each of the three
    # rounds runs once.
    d = t(spark, sf, "documents")
    toks = d.select(F.explode(TX.tokens("lower(text)")).alias("w")).filter(
        F.col("w").rlike("^[a-z]+$")
    )
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("n"))
    enc = (
        "concat('<', array_join(transform(sequence(1, length(w)), "
        "i -> substring(w, i, 1)), '><'), '>')"
    )
    cur = vocab.select(F.expr(enc).alias("seq"), "n").localCheckpoint(
        eager=True
    )
    syms = "split(trim(BOTH '<>' FROM seq), '><')"
    # Spark sequence(1, 0) DESCENDS (yields [1, 0]) — guard single-
    # symbol sequences explicitly (DuckDB generate_series(1, 0) is
    # empty, so both sides skip them)
    pair_expr = (
        f"case when size({syms}) >= 2 then "
        f"transform(sequence(1, size({syms}) - 1), "
        f"i -> struct(element_at({syms}, i) as a, element_at({syms}, i + 1) as b)) "
        f"else array() end"
    )
    outs = []
    for step in (1, 2, 3):
        counted = (
            cur.select("n", F.explode(F.expr(pair_expr)).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").cast("long").alias("cnt"))
        )
        best = (
            counted.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .localCheckpoint(eager=True)  # consumed twice: output + merge
        )
        outs.append(
            best.select(
                F.lit(step).cast("int").alias("step"),
                F.col("a").alias("sym_a"),
                F.col("b").alias("sym_b"),
                F.concat("a", "b").alias("merged"),
                F.col("cnt").alias("pair_count"),
            )
        )
        if step < 3:
            cur = (
                cur.crossJoin(F.broadcast(best))
                .select(
                    F.expr(
                        "replace(seq, concat('<', a, '><', b, '>'), "
                        "concat('<', a, b, '>'))"
                    ).alias("seq"),
                    "n",
                )
                .localCheckpoint(eager=True)
            )
    return outs[0].unionByName(outs[1]).unionByName(outs[2])


@register(
    "text_vocab_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({TX.tokens_sql('lower(text)')}) AS w FROM documents
    ), vocab AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY w
    ), tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS vocab_size
      FROM vocab
    ), ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) AS rk FROM vocab
    )
    SELECT CAST(k AS INTEGER) AS k, vocab_size, total,
           CAST(coalesce(SUM(c) FILTER (rk <= k), 0) AS BIGINT) AS covered,
           round(CAST(coalesce(SUM(c) FILTER (rk <= k), 0) AS DOUBLE)
                 / CAST(total AS DOUBLE), 6) AS coverage
    FROM ranked
    CROSS JOIN (SELECT unnest([10, 100, 1000]) AS k)
    CROSS JOIN tot
    GROUP BY k, vocab_size, total
    """,
)
def text_vocab_coverage(spark, sf):
    # Vocabulary coverage curve — what fraction of all token
    # occurrences the top-k most frequent types cover, at k = 10 / 100
    # / 1000: the table a tokenizer/vocab-size decision reads (Zipfian
    # corpora saturate fast; a flat curve says the corpus is
    # template-churn or multi-lingual). Ties broken (count desc, word
    # asc) — total and deterministic on both engines. Plan shape: one
    # corpus token scan -> vocab hash agg (map-side partials), then
    # per k a TakeOrdered(k) + 1-row agg on the VOCAB table — no
    # unpartitioned window, nothing corpus-sized after the first agg.
    d = t(spark, sf, "documents")
    vocab = (
        d.select(F.explode(TX.tokens("lower(text)")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)  # consumed 1 + |ks| times
    )
    tot = vocab.agg(
        F.sum("c").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
    )
    outs = []
    for k in (10, 100, 1000):
        cov = (
            vocab.orderBy(F.desc("c"), F.asc("w"))
            .limit(k)
            .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("covered"))
        )
        outs.append(
            cov.crossJoin(F.broadcast(tot)).select(
                F.lit(k).cast("int").alias("k"),
                "vocab_size",
                "total",
                "covered",
                F.round(
                    F.col("covered").cast("double") / F.col("total").cast("double"),
                    6,
                ).alias("coverage"),
            )
        )
    return outs[0].unionByName(outs[1]).unionByName(outs[2])


def _ccnet_oracle() -> str:
    # compose the REGISTERED unigram-LM oracle so the bucketing can
    # never drift from the perplexity it buckets (the ann_recall_eval
    # composition rule applied to the text family)
    from dataingestionplayground_spark.queries import REGISTRY as _R

    return f"""
    WITH ppl AS MATERIALIZED (
      SELECT doc_id, n_toks, ppl FROM ({_R['text_unigram_perplexity'].oracle})
    ), j AS (
      SELECT d.lang, p.doc_id, p.n_toks, p.ppl
      FROM ppl p JOIN documents d USING (doc_id)
    ), b AS (
      SELECT lang,
             round(quantile_cont(ppl, 1.0/3.0), 6) AS b1,
             round(quantile_cont(ppl, 2.0/3.0), 6) AS b2
      FROM j GROUP BY lang
    ), tagged AS (
      SELECT j.lang,
             CASE WHEN j.ppl <= b.b1 THEN 'head'
                  WHEN j.ppl <= b.b2 THEN 'middle'
                  ELSE 'tail' END AS bucket,
             j.n_toks, j.ppl
      FROM j JOIN b USING (lang)
    )
    SELECT lang, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           round({davg_expr('ppl')}, 6) AS avg_ppl
    FROM tagged GROUP BY lang, bucket
    """


@register("text_ccnet_lm_buckets", oracle=_ccnet_oracle())
def text_ccnet_lm_buckets(spark, sf):
    # CCNet-style LM bucketing (Wenzek et al. 2020): within each
    # language, split documents into head / middle / tail thirds by LM
    # perplexity — the canonical crawl-curation shard labels ("train on
    # head+middle, drop tail" is the CCNet recipe). The perplexity is
    # the REGISTERED text_unigram_perplexity function itself (composed,
    # not re-implemented), so this bucketing grades the production LM
    # score. Tercile boundaries are exact interpolated per-language
    # percentiles, 6dp-rounded on BOTH engines before the <= comparison
    # (the sample_quality_curriculum decile rule — a 1-ulp interpolation
    # divergence must not flip a doc's bucket; ppl itself is already
    # 6dp-rounded by the member query).
    # Scale shape: the LM's two hash aggs + one doc-keyed join to pull
    # lang, ONE per-language quantile agg (|langs| rows, broadcast
    # back), one final (lang, bucket)-keyed agg — nothing new shuffles
    # the corpus beyond the member query's own plan. At 100 TB the
    # boundary agg stays |langs|-sized and the bucket tag is a narrow
    # broadcast-join projection.
    from dataingestionplayground_spark.queries import REGISTRY as _R

    p = (
        _R["text_unigram_perplexity"]
        .fn(spark, sf)
        .select("doc_id", "n_toks", "ppl")
    )
    d = t(spark, sf, "documents").select("doc_id", "lang")
    j = p.join(d, "doc_id")
    b = j.groupBy("lang").agg(
        F.round(F.expr("percentile(ppl, 1.0/3.0)"), 6).alias("b1"),
        F.round(F.expr("percentile(ppl, 2.0/3.0)"), 6).alias("b2"),
    )
    tagged = j.join(F.broadcast(b), "lang").select(
        "lang",
        F.when(F.col("ppl") <= F.col("b1"), F.lit("head"))
        .when(F.col("ppl") <= F.col("b2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
        "n_toks",
        "ppl",
    )
    return tagged.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
        F.round(davg("ppl"), 6).alias("avg_ppl"),
    )


def _lang_purity_oracle() -> str:
    from dataingestionplayground_spark.queries import REGISTRY as _R

    return f"""
    WITH pred AS MATERIALIZED (
      SELECT doc_id, is_match FROM ({_R['text_language_id'].oracle})
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p.is_match) AS BIGINT) AS n_match,
           round(CAST(SUM(p.is_match) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS purity
    FROM pred p JOIN documents d USING (doc_id)
    GROUP BY d.source
    """


@register("text_language_purity_by_source", oracle=_lang_purity_oracle())
def text_language_purity_by_source(spark, sf):
    # Per-source language purity: how often the PRODUCTION language-ID
    # classifier (composed registered query, never re-implemented)
    # agrees with the source's declared label — the feed-health column
    # that routes a source to per-language splitting or to the CCNet
    # bucketing before its mislabeled docs poison per-language LM
    # stats. Plan: the classifier's narrow projection + one doc-keyed
    # join to pull source + ONE source-keyed agg.
    from dataingestionplayground_spark.queries import REGISTRY as _R

    pred = _R["text_language_id"].fn(spark, sf).select("doc_id", "is_match")
    d = t(spark, sf, "documents").select("doc_id", "source")
    return (
        pred.join(d, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("is_match").cast("long").alias("n_match"),
            F.round(
                F.sum("is_match").cast("double") / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("purity"),
        )
    )


_CORR_SIGS = ("quality", "ppl", "entropy", "mean_word_len")
_CORR_PAIRS = [
    (a, b)
    for i, a in enumerate(_CORR_SIGS)
    for b in _CORR_SIGS[i + 1 :]
]


def _corr_matrix_oracle() -> str:
    # compose the three registered per-doc signal oracles + the quality
    # formula; the correlation layer is exact decimal sums of
    # 6dp-rounded signals (12dp products), so both engines derive
    # Pearson from BIT-IDENTICAL sufficient statistics
    from dataingestionplayground_spark.queries import REGISTRY as _R

    sums = ", ".join(
        f"CAST(SUM(CAST({s} AS DECIMAL(18,6))) AS DOUBLE) AS sx_{s}, "
        f"CAST(SUM(CAST({s} AS DECIMAL(18,6)) * CAST({s} AS DECIMAL(18,6))) AS DOUBLE) AS sxx_{s}"
        for s in _CORR_SIGS
    )
    psums = ", ".join(
        f"CAST(SUM(CAST({a} AS DECIMAL(18,6)) * CAST({b} AS DECIMAL(18,6))) AS DOUBLE) AS sxy_{a}_{b}"
        for a, b in _CORR_PAIRS
    )
    legs = "\n    UNION ALL ".join(
        f"""SELECT '{a}' AS sig_a, '{b}' AS sig_b, n,
           round((CAST(n AS DOUBLE) * sxy_{a}_{b} - sx_{a} * sx_{b})
                 / nullif(sqrt(CAST(n AS DOUBLE) * sxx_{a} - sx_{a} * sx_{a})
                    * sqrt(CAST(n AS DOUBLE) * sxx_{b} - sx_{b} * sx_{b}), 0.0), 6)
             AS pearson
    FROM stats"""
        for a, b in _CORR_PAIRS
    )
    return f"""
    WITH q AS MATERIALIZED (
      SELECT doc_id, round(quality, 6) AS quality
      FROM ({_R['text_quality_score'].oracle})
    ), p AS MATERIALIZED (
      SELECT doc_id, ppl FROM ({_R['text_unigram_perplexity'].oracle})
    ), e AS MATERIALIZED (
      SELECT doc_id, entropy FROM ({_R['text_char_entropy'].oracle})
    ), g AS MATERIALIZED (
      SELECT doc_id, mean_word_len
      FROM ({_R['text_gopher_quality_rules'].oracle})
    ), joined AS (
      SELECT q.quality, p.ppl, e.entropy, g.mean_word_len
      FROM q JOIN p USING (doc_id) JOIN e USING (doc_id) JOIN g USING (doc_id)
    ), stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, {sums}, {psums} FROM joined
    )
    {legs}
    """


@register("text_signal_correlation_matrix", oracle=_corr_matrix_oracle())
def text_signal_correlation_matrix(spark, sf):
    # Are the quality signals REDUNDANT? Pairwise Pearson correlation
    # among the four per-doc curation signals (heuristic quality score,
    # unigram-LM perplexity, char entropy, Gopher alpha-word ratio) —
    # the table that decides whether the quality ensemble's three
    # components earn their scan cost or collapse into one (feature-
    # selection for filters, run on the filters themselves). Every
    # signal is the REGISTERED query's own output (composed, never
    # re-derived); correlations come from ONE single-row agg of exact
    # DECIMAL sufficient statistics: 6dp signals enter as DECIMAL(18,6)
    # so products land at DECIMAL(37,12) WITHOUT precision overflow —
    # a (38,12)x(38,12) product would exceed precision 38 and Spark
    # silently rounds the scale down, which is exactly the 1-ulp class
    # of divergence the repo bans. Exact and associative, so Spark's
    # partial aggregation and DuckDB's sequential scan produce
    # bit-identical sums; then six in-row
    # Pearson evaluations in fixed operation order. Scale shape: the
    # member scans + three doc-keyed joins + one single-row agg; the
    # 6-row output assembles from a broadcast of that single row.
    from dataingestionplayground_spark.queries import REGISTRY as _R

    q = (
        _R["text_quality_score"].fn(spark, sf)
        .select("doc_id", F.round("quality", 6).alias("quality"))
    )
    p = _R["text_unigram_perplexity"].fn(spark, sf).select("doc_id", "ppl")
    e = _R["text_char_entropy"].fn(spark, sf).select("doc_id", "entropy")
    g = (
        _R["text_gopher_quality_rules"].fn(spark, sf)
        .select("doc_id", "mean_word_len")
    )
    joined = q.join(p, "doc_id").join(e, "doc_id").join(g, "doc_id")
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for s in _CORR_SIGS:
        aggs.append(
            F.sum(F.col(s).cast("decimal(18,6)")).cast("double").alias(f"sx_{s}")
        )
        aggs.append(
            F.sum(
                F.col(s).cast("decimal(18,6)") * F.col(s).cast("decimal(18,6)")
            ).cast("double").alias(f"sxx_{s}")
        )
    for a, b in _CORR_PAIRS:
        aggs.append(
            F.sum(
                F.col(a).cast("decimal(18,6)") * F.col(b).cast("decimal(18,6)")
            ).cast("double").alias(f"sxy_{a}_{b}")
        )
    stats = joined.agg(*aggs)
    legs = []
    for a, b in _CORR_PAIRS:
        nn = F.col("n").cast("double")
        num = nn * F.col(f"sxy_{a}_{b}") - F.col(f"sx_{a}") * F.col(f"sx_{b}")
        den = F.sqrt(nn * F.col(f"sxx_{a}") - F.col(f"sx_{a}") * F.col(f"sx_{a}")) * F.sqrt(
            nn * F.col(f"sxx_{b}") - F.col(f"sx_{b}") * F.col(f"sx_{b}")
        )
        legs.append(
            stats.select(
                F.lit(a).alias("sig_a"),
                F.lit(b).alias("sig_b"),
                "n",
                F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("pearson"),
            )
        )
    out = legs[0]
    for l in legs[1:]:
        out = out.unionByName(l)
    return out


@register(
    "text_dedup_impact_stats",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, {TX.fingerprint_sql('text')} AS f,
             {TX.tokens_sql('lower(text)')} AS tk
      FROM documents
    ), keepers AS (
      SELECT f, min(doc_id) AS keep_id FROM fp GROUP BY f
    ), tagged AS (
      SELECT fp.doc_id, fp.tk, k.keep_id = fp.doc_id AS kept
      FROM fp JOIN keepers k ON k.f = fp.f
    ), toks AS (
      SELECT doc_id, kept, unnest(tk) AS w FROM tagged
    ), stages AS (
      SELECT 'raw' AS stage,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM tagged) AS n_docs,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM toks) AS total_tokens,
             (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) FROM toks) AS vocab_size
      UNION ALL
      SELECT 'deduped',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM tagged WHERE kept),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM toks WHERE kept),
             (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) FROM toks WHERE kept)
    )
    SELECT stage, n_docs, total_tokens, vocab_size,
           round(CAST(total_tokens AS DOUBLE) / CAST(vocab_size AS DOUBLE), 6)
             AS tokens_per_type
    FROM stages
    """,
)
def text_dedup_impact_stats(spark, sf):
    # WHAT DID DEDUP ACTUALLY CHANGE: corpus statistics before and
    # after exact keep-first dedup — doc count, token count, vocabulary
    # size, tokens-per-type — as two comparable rows. The vocab row is
    # the interesting one: exact dedup removes tokens but nearly no
    # TYPES (duplicates add no new vocabulary), so tokens_per_type
    # falling toward the raw corpus's type-token curve is the measured
    # evidence dedup removed redundancy rather than content (the
    # text_type_token_stats signal at corpus grain, made before/after).
    # Plan shape: one corpus scan, the dedup_exact fingerprint agg
    # joined back, then conditional aggs over one token explode —
    # the 'deduped' leg is a FILTER of the same frames, not a second
    # scan; both distinct counts plan as two-phase expands.
    d = t(spark, sf, "documents")
    fp = d.select(
        "doc_id",
        TX.fingerprint("text").alias("f"),
        TX.tokens("lower(text)").alias("tk"),
    )
    keepers = fp.groupBy("f").agg(F.min("doc_id").alias("keep_id"))
    tagged = fp.join(keepers, "f").select(
        "doc_id", "tk", (F.col("keep_id") == F.col("doc_id")).alias("kept")
    ).localCheckpoint(eager=True)  # consumed by both stage legs
    toks = tagged.select("kept", F.explode("tk").alias("w"))
    legs = []
    for stage, cond in (("raw", F.lit(True)), ("deduped", F.col("kept"))):
        nd = tagged.filter(cond).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs")
        )
        tk = toks.filter(cond).agg(
            F.count(F.lit(1)).cast("long").alias("total_tokens"),
            F.count_distinct("w").cast("long").alias("vocab_size"),
        )
        legs.append(
            nd.crossJoin(F.broadcast(tk)).select(
                F.lit(stage).alias("stage"),
                "n_docs",
                "total_tokens",
                "vocab_size",
                F.round(
                    F.col("total_tokens").cast("double")
                    / F.col("vocab_size").cast("double"),
                    6,
                ).alias("tokens_per_type"),
            )
        )
    return legs[0].unionByName(legs[1])


def _lm_gate_table_oracle() -> str:
    from dataingestionplayground_spark.queries import REGISTRY as _R

    legs = []
    for lm, has_keep in (
        ("unigram", True),
        ("bigram", True),
        ("interpolated", True),
        ("kneser_ney", False),
    ):
        o = _R[f"text_{lm}_perplexity"].oracle
        keep_cnt = (
            "CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)"
            if has_keep
            else "CAST(NULL AS BIGINT)"
        )
        keep_rate = (
            "round(CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)"
            " / CAST(COUNT(*) AS DOUBLE), 6)"
            if has_keep
            else "CAST(NULL AS DOUBLE)"
        )
        legs.append(
            f"""SELECT '{lm}' AS lm,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round({davg_expr('ppl')}, 6) AS avg_ppl,
           {keep_cnt} AS n_keep,
           {keep_rate} AS keep_rate
    FROM ({o})"""
        )
    return "\n    UNION ALL ".join(legs)


@register("text_lm_gate_table", oracle=_lm_gate_table_oracle())
def text_lm_gate_table(spark, sf):
    # WHICH LM ORDER DO WE GATE WITH: one row per registered language
    # model (unigram / add-one bigram / Jelinek-Mercer interpolated /
    # Kneser-Ney) with doc count, mean perplexity, and the keep rate at
    # each model's shipped threshold (KN ships no gate — NULLs). The
    # CCNet-style filtering decision (smoother LM = sharper separation
    # of gibberish from rare-topic prose) usually gets made from
    # exactly this table; here it composes the four REGISTERED
    # perplexity queries so the table can never drift from the gates
    # the pipeline actually runs. Scale shape: the four member plans
    # (each: token scan + count-table joins) + four single-row aggs;
    # nothing new shuffles the corpus.
    #
    # r17 (r16 VERDICT item 1): the members compose through their
    # registered single-source frame helpers (_unigram_ppl_frame & co —
    # the exact bodies the registered rows execute, the release-gate
    # discipline) over ONE localCheckpoint-ed tokenized frame, instead
    # of re-running each member against its own scan: the four legs
    # re-tokenized the corpus ~9x between them (each leg pays the
    # regex-split again on the map side of every one of its own
    # exchanges), which dominated the gate's big-block rows.
    tkall = _lm_tokens_frame(t(spark, sf, "documents")).localCheckpoint(
        eager=True
    )
    # r17 session 2: the three bigram legs share ONE materialized
    # bigram-type table (each used to checkpoint its own identical copy)
    bc = _bigram_counts(_bigram_stream(tkall)).localCheckpoint(eager=True)
    members = {
        "unigram": lambda tk: _unigram_ppl_frame(tk),
        "bigram": lambda tk: _bigram_ppl_frame(tk, bc),
        "interpolated": lambda tk: _interpolated_ppl_frame(tk, bc),
        "kneser_ney": lambda tk: _kn_ppl_frame(tk, bc),
    }
    legs = []
    for lm, has_keep in (
        ("unigram", True),
        ("bigram", True),
        ("interpolated", True),
        ("kneser_ney", False),
    ):
        df = members[lm](tkall)
        aggs = [
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(davg("ppl"), 6).alias("avg_ppl"),
        ]
        if has_keep:
            aggs.append(
                F.sum(F.when(F.col("keep"), 1).otherwise(0))
                .cast("long")
                .alias("n_keep")
            )
            aggs.append(
                F.round(
                    F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("double")
                    / F.count(F.lit(1)).cast("double"),
                    6,
                ).alias("keep_rate")
            )
        else:
            aggs.append(F.lit(None).cast("long").alias("n_keep"))
            aggs.append(F.lit(None).cast("double").alias("keep_rate"))
        legs.append(df.agg(*aggs).select(F.lit(lm).alias("lm"), "*"))
    out = legs[0]
    for l in legs[1:]:
        out = out.unionByName(l)
    return out


def _ppl_quality_calibration_oracle() -> str:
    from dataingestionplayground_spark.queries import REGISTRY as _R

    return f"""
    WITH p AS MATERIALIZED (
      SELECT doc_id, ppl FROM ({_R['text_unigram_perplexity'].oracle})
    ), q AS MATERIALIZED (
      SELECT doc_id, round(quality, 6) AS quality
      FROM ({_R['text_quality_score'].oracle})
    ), j AS (
      SELECT p.doc_id, p.ppl, q.quality FROM p JOIN q USING (doc_id)
    ), b AS (
      SELECT list_transform(
               quantile_cont(ppl, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
               x -> round(x, 6)) AS bs
      FROM j
    ), dec AS (
      SELECT j.ppl, j.quality,
             1 + len(list_filter(b.bs, x -> j.ppl > x)) AS decile
      FROM j CROSS JOIN b
    )
    SELECT CAST(decile AS INTEGER) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round({davg_expr('ppl')}, 6) AS avg_ppl,
           round({davg_expr('quality')}, 6) AS avg_quality
    FROM dec GROUP BY decile
    """


@register(
    "text_ppl_quality_calibration", oracle=_ppl_quality_calibration_oracle()
)
def text_ppl_quality_calibration(spark, sf):
    # SIGNAL CALIBRATION CURVE between the two primary gates: mean
    # heuristic quality per unigram-perplexity decile — the binned
    # view of the single Pearson number text_signal_correlation_matrix
    # reports (a monotone-falling curve says the LM gate and the
    # heuristic agree on ORDER even where the correlation is modest; a
    # U-shape says they disagree exactly in the tails the gates act
    # on). Composes the two registered per-doc signals; decile
    # boundaries are exact interpolated percentiles 6dp-rounded on
    # both engines before the strict > (the curriculum rule). Plan:
    # member scans + one doc-keyed join + ONE quantile agg broadcast
    # back + a 10-key agg.
    from dataingestionplayground_spark.queries import REGISTRY as _R

    p = _R["text_unigram_perplexity"].fn(spark, sf).select("doc_id", "ppl")
    q = (
        _R["text_quality_score"].fn(spark, sf)
        .select("doc_id", F.round("quality", 6).alias("quality"))
    )
    j = p.join(q, "doc_id")
    bs = j.agg(
        F.expr(
            "transform(percentile(ppl, array(0.1, 0.2, 0.3, 0.4, 0.5,"
            " 0.6, 0.7, 0.8, 0.9)), x -> round(x, 6))"
        ).alias("bs")
    )
    dec = j.crossJoin(F.broadcast(bs)).select(
        "ppl",
        "quality",
        (F.lit(1) + F.expr("size(filter(bs, x -> ppl > x))"))
        .cast("int")
        .alias("decile"),
    )
    return dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(davg("ppl"), 6).alias("avg_ppl"),
        F.round(davg("quality"), 6).alias("avg_quality"),
    )

