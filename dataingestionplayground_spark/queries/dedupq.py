"""Deduplication query surface over the ``documents`` table — exact,
MinHash signature + LSH banding, SimHash, n-gram Jaccard, embedding-cosine
near-dup. Spark side = operators.dedup; oracles replicate the same
portable md5-based pipeline in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataingestionplayground_spark.functions import text as TX
from dataingestionplayground_spark.functions.portable import davg, davg_expr
from dataingestionplayground_spark.operators.dedup import (
    _lane_expr_duck,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_oracle_sql,
)
from dataingestionplayground_spark.queries import register
from dataingestionplayground_spark.queries.textq import _QUALITY_SQL
from dataingestionplayground_spark.session import fan_out_small_scan
from dataingestionplayground_spark.session import load_table as t

_TOKS = TX.tokens_sql("text")
_SHINGLES = TX.word_shingles_sql("text", 3)


@register(
    "dedup_exact",
    oracle=f"""
    SELECT {TX.fingerprint_sql('text')} AS fingerprint,
           min(doc_id) AS keep_id, COUNT(*) AS n_dups
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark, sf):
    return exact_dedup(t(spark, sf, "documents"), "doc_id", "text")


_WIDE_SIG = f"""
    sh AS (
      SELECT DISTINCT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
    ), wide AS (
      SELECT doc_id,
             {', '.join(f'min({_lane_expr_duck(i)}) AS mh{i}' for i in range(8))}
      FROM sh GROUP BY doc_id
    )"""

_SIG_UNPIVOT = " UNION ALL ".join(
    f"SELECT doc_id, {i} AS h, mh{i} AS minhash FROM wide" for i in range(8)
)

_BANDS = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, concat_ws('|', mh{2 * b}, mh{2 * b + 1}) AS band_key FROM wide"
    for b in range(4)
)


@register(
    "dedup_minhash_signatures",
    oracle=f"""
    WITH {_WIDE_SIG}
    SELECT doc_id, CAST(h AS INTEGER) AS h, minhash FROM ({_SIG_UNPIVOT})
    """,
)
def dedup_minhash_signatures(spark, sf):
    return minhash_signatures(t(spark, sf, "documents"), "doc_id", "text", num_hashes=8)


@register(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
    WITH {_WIDE_SIG}, bands AS ({_BANDS})
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh_pairs(spark, sf):
    return minhash_lsh_pairs(
        t(spark, sf, "documents"), "doc_id", "text", num_hashes=8, rows_per_band=2
    )


@register(
    "dedup_simhash",
    oracle=simhash_oracle_sql("documents", "doc_id", "text", _TOKS, bits=63),
)
def dedup_simhash(spark, sf):
    return simhash(t(spark, sf, "documents"), "doc_id", "text", bits=63)


@register(
    "dedup_jaccard_pairs",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, source, shingle
      FROM (SELECT doc_id, source, unnest({_SHINGLES}) AS shingle FROM documents)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, n_common,
           CAST(n_common AS DOUBLE) / CAST(sa.sz + sb.sz - n_common AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_common AS DOUBLE) / CAST(sa.sz + sb.sz - n_common AS DOUBLE) >= 0.05
    """,
)
def dedup_jaccard_pairs(spark, sf):
    return ngram_jaccard_pairs(
        t(spark, sf, "documents"), "doc_id", "text", shingle_n=3, threshold=0.05, block_col="source"
    )


_DOT_DUCK = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(generate_series(1, len(a.u)), i -> a.u[i] * b.u[i])), "
    "(acc, v) -> acc + v)"
)


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH units AS (
      SELECT vec_id, label,
             list_transform(embedding, v -> CAST(v AS DOUBLE) / n) AS u
      FROM (SELECT vec_id, label, embedding,
                   sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                        list_transform(generate_series(1, len(embedding)), i ->
                          CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
                        (acc, v) -> acc + v)) AS n
            FROM embeddings)
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_DOT_DUCK} AS cos_sim
    FROM units a JOIN units b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_DOT_DUCK} >= 0.95
    """,
)
def dedup_embedding_cosine(spark, sf):
    # Embedding near-dup with label blocking. Norms are computed ONCE per
    # vector (unit-normalize pass), so each candidate pair costs one dot
    # product instead of dot + two norms — 3x less per-pair work; at scale
    # LSH buckets replace the label block (operators.similarity).
    e = t(spark, sf, "embeddings")
    units = e.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x -> cast(x as double) / "
            "sqrt(aggregate(sequence(1, size(embedding)), cast(0.0 as double), "
            "(acc, i) -> acc + cast(element_at(embedding, i) as double) * "
            "cast(element_at(embedding, i) as double))))"
        ).alias("u"),
    )
    a, b = units.alias("a"), units.alias("b")
    dot = F.expr(
        "aggregate(sequence(1, size(a.u)), cast(0.0 as double), "
        "(acc, i) -> acc + element_at(a.u, i) * element_at(b.u, i))"
    )
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            dot.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.95)
    )


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_WIDE_SIG.strip().rstrip(')')}
    ), bands AS ({_BANDS}),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), walk(id, comp) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, w.comp FROM edges e JOIN walk w ON w.id = e.dst
    ), comp AS (
      SELECT id, min(comp) AS component FROM walk GROUP BY id
    )
    SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster_id,
           d.doc_id = coalesce(c.component, d.doc_id) AS is_kept
    FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    """,
)
def dedup_clusters(spark, sf):
    # pairs -> connected components (iterative min-label propagation) ->
    # one kept representative per duplicate cluster. The DuckDB oracle
    # computes true components with a recursive CTE; the distributed
    # fixed-point converges to the same min-reachable-id labeling.
    from dataingestionplayground_spark.operators.graph import dedup_clusters as dc

    d = t(spark, sf, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", num_hashes=8, rows_per_band=2)
    return dc(d, pairs, "doc_id")


@register(
    "dedup_lsh_verified_pairs",
    oracle=f"""
    WITH {_WIDE_SIG}, bands AS ({_BANDS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ), csh AS (
      SELECT DISTINCT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
      WHERE doc_id IN (SELECT id_a FROM cand UNION SELECT id_b FROM cand)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS sz FROM csh GROUP BY doc_id
    ), inter AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS n_common
      FROM cand c
      JOIN csh x ON x.doc_id = c.id_a
      JOIN csh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
      GROUP BY c.id_a, c.id_b
    )
    SELECT i.id_a, i.id_b,
           CAST(i.n_common AS DOUBLE) / CAST(sa.sz + sb.sz - i.n_common AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE CAST(i.n_common AS DOUBLE) / CAST(sa.sz + sb.sz - i.n_common AS DOUBLE) >= 0.3
    """,
)
def dedup_lsh_verified_pairs(spark, sf):
    # The canonical two-stage near-dup pipeline, with REPRESENTATIVES
    # BEFORE PAIRING (r13 verdict item 1, the standing perf watch): exact
    # replica groups (md5 text fingerprint) collapse to one representative
    # BEFORE LSH banding, so the quadratic band/verify stages run on
    # unique texts only; verified rep pairs then expand back to member
    # pairs. This is EXACT, not approximate:
    # * identical texts have identical shingle sets, so J(any member of
    #   A, any member of B) == J(rep_A, rep_B) — the cross-group
    #   expansion carries the rep jaccard verbatim;
    # * every intra-group pair has J == 1.0 exactly (n_common == sz, so
    #   sz/(2sz-sz)), emitted directly from the group member list —
    #   guarded on a non-empty shingle set, matching the old plan where
    #   empty-set pairs produced NULL (0/0) and failed the threshold;
    # * banding candidates are signature-determined, so a rep-pair
    #   candidate exists iff every member-pair candidate did.
    # Previous rounds proved the per-pair work is already minimal (the
    # r12 PPJoin prune measured dead: 83.5% of banded candidates pass the
    # final filter) and the 4.36x candidate growth at 2x rows is
    # corpus-inherent (quadratic within replica groups) — so the ONLY
    # lever left was to stop paying banding+verify for pairs whose
    # jaccard is known by construction. At 100 TB this is the standard
    # exact-dedup-then-near-dedup staging: the fingerprint groupBy is one
    # text-sized shuffle, after which band/verify cost scales with
    # UNIQUE content, not crawl replication.
    # Measured trade (BENCH_LOCAL_r14 + BENCH_ADJUDICATE_r14): on a
    # replica-FREE corpus (sf0.1 raw: every group is a singleton) the
    # fingerprint stage is pure overhead, ~+0.5 s (2.26 -> 2.79); at the
    # replica-dense scales it pays 13.2 -> 1.5 s (sf1.0, -89%) and turns
    # the 2x-rows step 2.19 -> 0.89. Real corpora at scale are
    # replica-heavy (that is why this query exists), so the trade is
    # taken deliberately.
    d = t(spark, sf, "documents")
    groups = (
        d.select("doc_id", "text")
        .withColumn("fp", F.md5(F.coalesce(F.col("text"), F.lit(""))))
        .groupBy("fp")
        .agg(
            F.sort_array(F.collect_list("doc_id")).alias("members"),
            F.min("doc_id").alias("rep"),
            F.min_by("text", "doc_id").alias("text"),
        )
        # consumed 4x (banding corpus, verify docsets, both expansion
        # sides, intra pairs) — materialize the fingerprint agg once
        .localCheckpoint(eager=True)
    )
    reps = groups.select(F.col("rep").alias("doc_id"), "text")
    cand = minhash_lsh_pairs(
        reps, "doc_id", "text", num_hashes=8, rows_per_band=2
    ).localCheckpoint(eager=True)
    ids = cand.select(F.col("id_a").alias("doc_id")).union(
        cand.select(F.col("id_b").alias("doc_id"))
    ).distinct()
    # shingle SETS stay packed per rep (array_distinct is a per-row JVM
    # dedup); the intersection count is a per-pair array_intersect, so
    # the verify stage shuffles only candidate rep PAIRS plus packed
    # sets, never exploded (pair x shingle) rows.
    docsets = (
        reps.join(ids, "doc_id", "left_semi")
        .select(F.col("doc_id"), TX.tokens("text").alias("__w"))
        .select(
            "doc_id",
            F.array_distinct(TX.shingles_from_tokens("__w", 3)).alias("sset"),
        )
        .withColumn("sz", F.size("sset"))
        .localCheckpoint(eager=True)  # consumed by both pair sides
    )
    sa = docsets.select(
        F.col("doc_id").alias("id_a"), F.col("sset").alias("set_a"), F.col("sz").alias("sz_a")
    )
    sb = docsets.select(
        F.col("doc_id").alias("id_b"), F.col("sset").alias("set_b"), F.col("sz").alias("sz_b")
    )
    # Free Jaccard upper bound (r10 verdict item 5): J(a,b) <= min(sz)/
    # max(sz) — prune below-threshold size ratios BEFORE the per-pair
    # array_intersect. Lossless by construction.
    rep_pairs = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            F.least("sz_a", "sz_b").cast("double")
            >= F.lit(0.3) * F.greatest("sz_a", "sz_b").cast("double")
        )
        .withColumn("n_common", F.size(F.array_intersect("set_a", "set_b")).cast("long"))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= 0.3)
        .select("id_a", "id_b", "jaccard")
    )
    # cross-group expansion: each verified rep pair fans out to all
    # member pairs (disjoint groups, so least/greatest just restores the
    # id_a < id_b orientation) — pure output-sized explode, no shuffle
    ga = groups.select(F.col("rep").alias("id_a"), F.col("members").alias("ms_a"))
    gb = groups.select(F.col("rep").alias("id_b"), F.col("members").alias("ms_b"))
    cross = (
        rep_pairs.join(ga, "id_a")
        .join(gb, "id_b")
        .select(F.explode("ms_a").alias("ma"), "ms_b", "jaccard")
        .select("ma", F.explode("ms_b").alias("mb"), "jaccard")
        .select(
            F.least("ma", "mb").alias("id_a"),
            F.greatest("ma", "mb").alias("id_b"),
            "jaccard",
        )
    )
    # intra-group pairs: C(g,2) per replica group, jaccard 1.0 by
    # construction; the sorted member list keeps id_a < id_b in-row
    intra = (
        groups.filter(F.size("members") >= 2)
        .select("members", TX.tokens("text").alias("__w"))
        .filter(F.size(F.array_distinct(TX.shingles_from_tokens("__w", 3))) >= 1)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(members, (x, i) -> "
                    "transform(slice(members, i + 2, size(members) - i - 1), "
                    "y -> struct(x AS id_a, y AS id_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b", F.lit(1.0).alias("jaccard"))
    )
    return cross.unionByName(intra)


@register(
    "dedup_pipeline_stats",
    oracle=f"""
    WITH RECURSIVE {_WIDE_SIG.strip().rstrip(')')}
    ), bands AS ({_BANDS}),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), walk(id, comp) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, w.comp FROM edges e JOIN walk w ON w.id = e.dst
    ), comp AS (
      SELECT id, min(comp) AS component FROM walk GROUP BY id
    )
    SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
           (SELECT COUNT(DISTINCT {TX.fingerprint_sql('text')}) FROM documents)
             AS n_exact_groups,
           (SELECT COUNT(*) FROM pairs) AS n_candidate_pairs,
           (SELECT COUNT(*) FROM documents d
            WHERE d.doc_id = (SELECT coalesce(min(c.component), d.doc_id)
                              FROM comp c WHERE c.id = d.doc_id)) AS n_kept
    """,
)
def dedup_pipeline_stats(spark, sf):
    # the whole dedup funnel as one row: corpus size -> exact groups ->
    # LSH candidate pairs -> near-dup cluster representatives kept.
    # Each stat is a 1-row aggregate; they meet via broadcast cross joins
    # (no data shuffle beyond each stage's own aggregation).
    from dataingestionplayground_spark.operators.dedup import exact_dedup as ed
    from dataingestionplayground_spark.operators.graph import dedup_clusters as dc

    d = t(spark, sf, "documents")
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    n_exact = ed(d, "doc_id", "text").agg(F.count(F.lit(1)).alias("n_exact_groups"))
    pairs = minhash_lsh_pairs(d, "doc_id", "text", num_hashes=8, rows_per_band=2)
    pairs = pairs.localCheckpoint(eager=True)  # consumed twice (count + clustering)
    n_pairs = pairs.agg(F.count(F.lit(1)).alias("n_candidate_pairs"))
    n_kept = dc(d, pairs, "doc_id").agg(
        F.sum(F.col("is_kept").cast("long")).alias("n_kept")
    )
    return (
        n_docs.crossJoin(F.broadcast(n_exact))
        .crossJoin(F.broadcast(n_pairs))
        .crossJoin(F.broadcast(n_kept))
    )


@register(
    "dedup_exact_keep_best",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, {TX.fingerprint_sql('text')} AS fp,
             n_chars,
             CAST(len({TX.tokens_sql('text')}) AS INTEGER) AS n_toks,
             {TX.stopword_hits_sql('text', 'en')} AS n_stop,
             CAST(len(replace(text, ' ', '')) AS INTEGER) AS len_sum
      FROM documents
    ), scored AS (
      SELECT doc_id, fp, {_QUALITY_SQL} AS quality FROM feats WHERE n_toks > 0
    )
    SELECT doc_id, fp, quality, kept FROM (
      SELECT doc_id, fp, quality,
             row_number() OVER (PARTITION BY fp
                                ORDER BY quality DESC, doc_id ASC) = 1 AS kept
      FROM scored)
    """,
)
def dedup_exact_keep_best(spark, sf):
    # Exact-dup resolution with a QUALITY policy: inside each normalized-
    # text fingerprint group, keep the highest-quality copy (ties to the
    # lowest id) instead of blindly the lowest id — the policy real
    # pipelines want when duplicates differ in cleanliness. One window
    # over the fingerprint hash; same single-shuffle shape as exact
    # dedup.
    from pyspark.sql import Window as W2

    from dataingestionplayground_spark.queries.textq import quality_scores

    d = t(spark, sf, "documents")
    scored = quality_scores(d).select("doc_id", "quality")
    fps = d.select("doc_id", TX.fingerprint("text").alias("fp"))
    j = fps.join(scored, "doc_id")
    w = W2.partitionBy("fp").orderBy(F.desc("quality"), F.asc("doc_id"))
    return j.select(
        "doc_id", "fp", "quality", (F.row_number().over(w) == 1).alias("kept")
    )


@register(
    "dedup_exact_substring_signal",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {TX.tokens_sql('lower(text)')} AS tk FROM documents
      WHERE len({TX.tokens_sql('lower(text)')}) >= 8
    ), wins AS (
      SELECT doc_id, md5(array_to_string(tk[i:i+7], ' ')) AS w
      FROM base, unnest(generate_series(1, len(tk) - 7)) AS u(i)
    ), dfreq AS (
      SELECT w, COUNT(DISTINCT doc_id) AS df FROM wins GROUP BY w
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           round(CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS shared_ratio,
           round(CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) <= 0.5 AS keep
    FROM wins JOIN dfreq USING (w)
    GROUP BY doc_id
    """,
)
def dedup_exact_substring_signal(spark, sf):
    # Cross-document EXACT-SUBSTRING duplication signal (the Lee et al.
    # "Deduplicating Training Data" exact-substring criterion, at token-
    # 8-gram granularity): for every sliding 8-token window, how many
    # documents contain that exact window; a document whose text is
    # mostly windows shared with OTHER documents is a near-copy even
    # when no single line or full fingerprint matches. Distinct from
    # text_repetition_filter (within-doc) and dedup_line_boilerplate
    # (line-granular): this catches verbatim spans at arbitrary offsets.
    #
    # Plan: explode windows (hashed to fixed-width md5, never the raw
    # 8-gram text) -> one hash agg for document frequency -> equi-join
    # back -> per-doc agg. Two shuffles on the window hash + one on
    # doc_id, all map-side partial; no window functions, no driver
    # state. Hot windows (boilerplate shared by thousands of docs) are
    # just large count groups — AQE splits the skewed join keys.
    # r16 (optimization): three provably-lossless plan cuts. (1) Only
    # "df >= 2 distinct docs" is ever consumed, and min(doc_id) <
    # max(doc_id) is equivalent to countDistinct(doc_id) >= 2 — dropping
    # the distinct-aggregate removes a whole (w, doc_id)-keyed exchange
    # of window mass (guide §2.4). (2) The window key shuffles as the
    # 16-byte binary md5 (unhex of the hex string is a bijection — same
    # equality classes) instead of 32 hex chars: half the key bytes in
    # every exchange (guide §2.3, narrower types). (3) Windows
    # pre-aggregate to (doc_id, w, c) occurrence counts before the
    # df join, so the join carries distinct windows per doc and the
    # per-doc counts regroup exactly (n_windows = Σ c, n_shared =
    # Σ c over shared rows).
    d = t(spark, sf, "documents")
    tk = TX.tokens("lower(text)")
    base = d.select("doc_id", tk.alias("tk")).filter(F.size("tk") >= 8)
    wins = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 7),"
                " i -> unhex(md5(array_join(slice(tk, i, 8), ' '))))"
            )
        ).alias("w"),
    ).groupBy("doc_id", "w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    dfreq = wins.groupBy("w").agg(
        (F.min("doc_id") < F.max("doc_id")).alias("shared")
    )
    per_doc = (
        wins.join(dfreq, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_windows"),
            F.sum(F.when(F.col("shared"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_shared"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_windows",
        "n_shared",
        F.round(F.col("n_shared").cast("double") / F.col("n_windows"), 6).alias(
            "shared_ratio"
        ),
    ).withColumn("keep", F.col("shared_ratio") <= 0.5)


@register(
    "dedup_cluster_keep_best",
    oracle=f"""
    WITH RECURSIVE {_WIDE_SIG.strip().rstrip(')')}
    ), bands AS ({_BANDS}),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), walk(id, comp) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, w.comp FROM edges e JOIN walk w ON w.id = e.dst
    ), comp AS (
      SELECT id, min(comp) AS component FROM walk GROUP BY id
    ), feats AS (
      SELECT doc_id, n_chars,
             CAST(len({_TOKS}) AS INTEGER) AS n_toks,
             {{stop}} AS n_stop,
             CAST(len(replace(text, ' ', '')) AS INTEGER) AS len_sum
      FROM documents
    ), scored AS (
      SELECT doc_id, {_QUALITY_SQL} AS quality FROM feats WHERE n_toks > 0
    )
    SELECT s.doc_id,
           coalesce(c.component, s.doc_id) AS cluster_id,
           s.quality,
           row_number() OVER (PARTITION BY coalesce(c.component, s.doc_id)
                              ORDER BY s.quality DESC, s.doc_id ASC) = 1 AS kept
    FROM scored s LEFT JOIN comp c ON c.id = s.doc_id
    """.replace("{stop}", TX.stopword_hits_sql("text", "en")),
)
def dedup_cluster_keep_best(spark, sf):
    # NEAR-dup cluster resolution with a quality policy: connected
    # components over the LSH pair graph pick the cluster, then the
    # highest-quality member (ties -> lowest id) survives — vs
    # dedup_clusters' min-id representative (arbitrary) and
    # dedup_exact_keep_best (exact fingerprint groups only). The window
    # partitions by cluster_id: high-cardinality (almost every doc is a
    # singleton cluster, near-dup groups are small by construction), so
    # no reducer hot-spots at any scale; a pathological mass-duplicate
    # cluster is one AQE-splittable group.
    from dataingestionplayground_spark.operators.graph import dedup_clusters as dc
    from dataingestionplayground_spark.queries.textq import quality_scores

    d = t(spark, sf, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", num_hashes=8, rows_per_band=2)
    clusters = dc(d, pairs, "doc_id").select("doc_id", "cluster_id")
    scored = quality_scores(d).select("doc_id", "quality")
    from pyspark.sql import Window as W2

    j = clusters.join(scored, "doc_id")
    w = W2.partitionBy("cluster_id").orderBy(F.desc("quality"), F.asc("doc_id"))
    return j.select(
        "doc_id",
        "cluster_id",
        "quality",
        (F.row_number().over(w) == 1).alias("kept"),
    )


def _soft_weights_oracle() -> str:
    # compose the registered clusters query's own oracle so the weights
    # can never drift from the clustering they downweight
    from dataingestionplayground_spark.queries import REGISTRY as _R

    return f"""
    WITH cl AS ({_R['dedup_clusters'].oracle}),
    sizes AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM cl GROUP BY cluster_id
    )
    SELECT c.doc_id, c.cluster_id, s.cluster_size,
           round(1.0 / s.cluster_size, 6) AS weight
    FROM cl c JOIN sizes s USING (cluster_id)
    """


@register("dedup_soft_weights", oracle=_soft_weights_oracle())
def dedup_soft_weights(spark, sf):
    # SoftDeDup: instead of DROPPING near-duplicates (dedup_clusters'
    # is_kept), keep every document but downweight duplicated content by
    # 1/cluster_size — the training loader then samples by weight, so a
    # 40-way duplicate contributes one document's worth of gradient
    # signal without discarding any unique spans. Composes the
    # registered clustering (its Spark frame here, its recursive-CTE
    # oracle above). Plan shape: the CC labeling is materialized ONCE
    # (localCheckpoint) and feeds both the size agg and the final join;
    # both are keyed on cluster_id — high-cardinality (most docs are
    # singleton clusters), no skewed reducer, no window.
    from dataingestionplayground_spark.queries import REGISTRY as _R

    cl = _R["dedup_clusters"].fn(spark, sf).select("doc_id", "cluster_id")
    cl = cl.localCheckpoint(eager=True)
    sizes = cl.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return cl.join(sizes, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        F.round(F.lit(1.0) / F.col("cluster_size"), 6).alias("weight"),
    )


@register(
    "dedup_eval_lsh_pr",
    oracle=f"""
    WITH {_WIDE_SIG}, bands AS ({_BANDS}), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
    ), truth AS (
      SELECT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
      ) i JOIN sizes sa ON sa.doc_id = i.id_a JOIN sizes sb ON sb.doc_id = i.id_b
      WHERE CAST(i.n_common AS DOUBLE)
            / CAST(sa.sz + sb.sz - i.n_common AS DOUBLE) >= 0.5
    ), m AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
             (SELECT CAST(COUNT(*) AS BIGINT)
              FROM cand c JOIN truth t ON t.id_a = c.id_a AND t.id_b = c.id_b) AS tp
    )
    SELECT n_candidates, n_truth, tp,
           round(CAST(tp AS DOUBLE) / nullif(CAST(n_candidates AS DOUBLE), 0.0), 6)
             AS precision,
           round(CAST(tp AS DOUBLE) / nullif(CAST(n_truth AS DOUBLE), 0.0), 6)
             AS recall,
           round(2.0 * CAST(tp AS DOUBLE)
                 / nullif(CAST(n_candidates + n_truth AS DOUBLE), 0.0), 6) AS f1
    FROM m
    """,
)
def dedup_eval_lsh_pr(spark, sf):
    # Candidate-quality evaluation of the PRODUCTION MinHash/LSH
    # blocking stage (same minhash_lsh_pairs call, same 8x2-banded
    # config as dedup_minhash_lsh_pairs) against exact shingle-Jaccard
    # >= 0.5 ground truth: precision / recall / F1 of the banding as a
    # retrieval problem — the dedup counterpart of retrieval_eval_ndcg
    # (an operator is only done when its quality is MEASURED next to
    # its latency). F1's usual 2PR/(P+R) is computed as the equivalent
    # 2*tp/(n_cand + n_truth) — exact integer inputs, one division.
    # Scale shape: ground truth comes from the shingle EQUI-join (only
    # pairs sharing a shingle can clear any positive Jaccard bar), not
    # an all-pairs scan, so both legs are hash joins; at eval time this
    # runs on a corpus slice the same way the recall floors sample.
    docs = t(spark, sf, "documents")
    cand = minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=8, rows_per_band=2)
    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(TX.word_shingles("text", 3))).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    truth = (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sa"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sb"), "id_b")
        .filter(
            F.col("n_common").cast("double")
            / (F.col("sa") + F.col("sb") - F.col("n_common")).cast("double")
            >= 0.5
        )
        .select("id_a", "id_b")
    )
    n_cand = cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    n_truth = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    tp = (
        cand.join(truth, ["id_a", "id_b"])
        .agg(F.count(F.lit(1)).cast("long").alias("tp"))
    )
    out = n_cand.crossJoin(F.broadcast(n_truth)).crossJoin(F.broadcast(tp))
    p = F.col("tp").cast("double") / F.nullif(F.col("n_candidates").cast("double"), F.lit(0.0))
    r = F.col("tp").cast("double") / F.nullif(F.col("n_truth").cast("double"), F.lit(0.0))
    f1 = (F.lit(2.0) * F.col("tp").cast("double")) / F.nullif(
        (F.col("n_candidates") + F.col("n_truth")).cast("double"), F.lit(0.0)
    )
    return out.select(
        "n_candidates",
        "n_truth",
        "tp",
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


@register(
    "dedup_lsh_incremental",
    oracle=f"""
    WITH nsh AS (
      SELECT DISTINCT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
      WHERE doc_id % 10 = 0
    ), osh AS (
      SELECT DISTINCT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
      WHERE doc_id % 10 <> 0
    ), nw AS (
      SELECT doc_id,
             {', '.join(f'min({_lane_expr_duck(i)}) AS mh{i}' for i in range(8))}
      FROM nsh GROUP BY doc_id
    ), ow AS (
      SELECT doc_id,
             {', '.join(f'min({_lane_expr_duck(i)}) AS mh{i}' for i in range(8))}
      FROM osh GROUP BY doc_id
    ), nb AS (
      {' UNION ALL '.join(f"SELECT doc_id, {b} AS band, concat_ws('|', mh{2 * b}, mh{2 * b + 1}) AS band_key FROM nw" for b in range(4))}
    ), ob AS (
      {' UNION ALL '.join(f"SELECT doc_id, {b} AS band, concat_ws('|', mh{2 * b}, mh{2 * b + 1}) AS band_key FROM ow" for b in range(4))}
    ), cand AS (
      SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
      FROM nb n JOIN ob o ON n.band = o.band AND n.band_key = o.band_key
    ), sizes_n AS (
      SELECT doc_id, COUNT(*) AS sz FROM nsh GROUP BY doc_id
    ), sizes_o AS (
      SELECT doc_id, COUNT(*) AS sz FROM osh GROUP BY doc_id
    ), inter AS (
      SELECT c.new_id, c.old_id, COUNT(*) AS n_common
      FROM cand c
      JOIN nsh x ON x.doc_id = c.new_id
      JOIN osh y ON y.doc_id = c.old_id AND y.shingle = x.shingle
      GROUP BY c.new_id, c.old_id
    )
    SELECT i.new_id, i.old_id,
           CAST(i.n_common AS DOUBLE)
             / CAST(sn.sz + so.sz - i.n_common AS DOUBLE) AS jaccard,
           CAST(i.n_common AS DOUBLE)
             / CAST(sn.sz + so.sz - i.n_common AS DOUBLE) >= 0.5 AS would_drop
    FROM inter i
    JOIN sizes_n sn ON sn.doc_id = i.new_id
    JOIN sizes_o so ON so.doc_id = i.old_id
    WHERE CAST(i.n_common AS DOUBLE)
          / CAST(sn.sz + so.sz - i.n_common AS DOUBLE) >= 0.3
    """,
)
def dedup_lsh_incremental(spark, sf):
    # Incremental near-dup screening: an ARRIVING batch (doc_id % 10
    # == 0, the 10% "new" slice) banded-joined against the EXISTING
    # corpus — the asymmetric form an ingest pipeline runs per batch,
    # where the self-join would re-pair the whole corpus against
    # itself every time. Candidates verify by exact packed-set Jaccard
    # (>= 0.3 reported, >= 0.5 flagged for drop), so the expensive
    # stage touches only banded collisions. Scale: the batch-side band
    # table is O(batch); the corpus side shuffles once on the band key
    # (as a maintained signature table at warehouse scale, zero per-run
    # corpus work); verify shuffles candidate PAIRS with packed sets,
    # never exploded shingles.
    from dataingestionplayground_spark.operators.dedup import (
        minhash_lsh_pairs_between,
    )

    d = t(spark, sf, "documents")
    new = d.filter(F.col("doc_id") % 10 == 0)
    old = d.filter(F.col("doc_id") % 10 != 0)
    cand = minhash_lsh_pairs_between(
        new, old, "doc_id", "text", num_hashes=8, rows_per_band=2
    ).localCheckpoint(eager=True)

    j = (
        cand.join(_packed_side(cand, new, "new_id"), "new_id")
        .join(_packed_side(cand, old, "old_id"), "old_id")
        .withColumn(
            "n_common", F.size(F.array_intersect("set_new_id", "set_old_id"))
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("sz_new_id") + F.col("sz_old_id") - F.col("n_common")).cast(
                "double"
            ),
        )
        .filter(F.col("jaccard") >= 0.3)
    )
    return j.select(
        "new_id", "old_id", "jaccard", (F.col("jaccard") >= 0.5).alias("would_drop")
    )


@register(
    "dedup_normalized_exact",
    oracle="""
    WITH norm AS (
      SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(regexp_replace(
                 lower(text), '\\s+', ' ', 'g'), '[^a-z ]', '', 'g'),
                 ' +', ' ', 'g'))) AS fp
      FROM documents
    )
    SELECT doc_id, fp,
           CAST(COUNT(*) OVER (PARTITION BY fp) AS BIGINT) AS group_n,
           doc_id = MIN(doc_id) OVER (PARTITION BY fp) AS keep
    FROM norm
    """,
)
def dedup_normalized_exact(spark, sf):
    # CCNet/Gopher-style AGGRESSIVE normalization dedup: lowercase, strip
    # everything but letters and spaces (punctuation, digits), collapse
    # whitespace — then hash-group. Catches reformatted copies (changed
    # dates, renumbered lists, re-punctuated text) that the conservative
    # whitespace-only fingerprint of dedup_exact treats as distinct; the
    # coarser sibling of MinHash near-dup, at exact-dedup cost. Plan:
    # per-row JVM regexps + md5, then ONE window sort-shuffle keyed by
    # the fingerprint — key cardinality grows with the corpus and
    # rows-per-key is the duplicate-group size (bounded), so the shape
    # survives 100 TB (plan-lint rule 2 measures exactly this).
    d = t(spark, sf, "documents")
    fp = F.md5(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.lower(F.col("text")), r"\s+", " "),
                    r"[^a-z ]",
                    "",
                ),
                r" +",
                " ",
            )
        )
    )
    from pyspark.sql import Window as W

    wfp = W.partitionBy("fp")
    return (
        d.select("doc_id", fp.alias("fp"))
        .select(
            "doc_id",
            "fp",
            F.count(F.lit(1)).over(wfp).cast("long").alias("group_n"),
            (F.col("doc_id") == F.min("doc_id").over(wfp)).alias("keep"),
        )
    )


def _snapshot_delta_oracle() -> str:
    # the dedup_lsh_incremental banding SQL re-pointed at the snapshot
    # predicates (A = doc_id % 5 <> 4, B = doc_id % 5 <> 0, so the
    # B-only delta is doc_id % 5 = 4), plus the exact-fingerprint CTE
    nw = ", ".join(f"min({_lane_expr_duck(i)}) AS mh{i}" for i in range(8))
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, concat_ws('|', mh{2 * b}, mh{2 * b + 1})"
        f" AS band_key FROM {{side}}"
        for b in range(4)
    )
    return f"""
    WITH dsh AS MATERIALIZED (
      SELECT DISTINCT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
      WHERE doc_id % 5 = 4
    ), ash AS MATERIALIZED (
      SELECT DISTINCT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
      WHERE doc_id % 5 <> 4
    ), dw AS MATERIALIZED (
      SELECT doc_id, {nw} FROM dsh GROUP BY doc_id
    ), aw AS MATERIALIZED (
      SELECT doc_id, {nw} FROM ash GROUP BY doc_id
    ), db AS ({bands.format(side='dw')}), ab AS ({bands.format(side='aw')}),
    cand AS MATERIALIZED (
      SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
      FROM db n JOIN ab o ON n.band = o.band AND n.band_key = o.band_key
    ), sizes_d AS (
      SELECT doc_id, COUNT(*) AS sz FROM dsh GROUP BY doc_id
    ), sizes_a AS (
      SELECT doc_id, COUNT(*) AS sz FROM ash GROUP BY doc_id
    ), inter AS MATERIALIZED (
      SELECT c.new_id, c.old_id, COUNT(*) AS n_common
      FROM cand c
      JOIN dsh x ON x.doc_id = c.new_id
      JOIN ash y ON y.doc_id = c.old_id AND y.shingle = x.shingle
      GROUP BY c.new_id, c.old_id
    ), best AS MATERIALIZED (
      SELECT new_id AS doc_id, MAX(j) AS best_jaccard FROM (
        SELECT i.new_id,
               CAST(i.n_common AS DOUBLE)
                 / CAST(sd.sz + sa.sz - i.n_common AS DOUBLE) AS j
        FROM inter i
        JOIN sizes_d sd ON sd.doc_id = i.new_id
        JOIN sizes_a sa ON sa.doc_id = i.old_id
      ) WHERE j >= 0.3 GROUP BY new_id
    ), afp AS MATERIALIZED (
      SELECT DISTINCT {TX.fingerprint_sql('text')} AS fp FROM documents
      WHERE doc_id % 5 <> 4
    )
    SELECT d.doc_id,
           (SELECT COUNT(*) FROM afp
            WHERE afp.fp = {TX.fingerprint_sql('d.text')}) > 0 AS is_exact,
           b.best_jaccard,
           CASE WHEN (SELECT COUNT(*) FROM afp
                      WHERE afp.fp = {TX.fingerprint_sql('d.text')}) > 0
                  THEN 'exact'
                WHEN b.best_jaccard >= 0.5 THEN 'near_dup'
                ELSE 'novel' END AS status
    FROM documents d LEFT JOIN best b USING (doc_id)
    WHERE d.doc_id % 5 = 4
    """


@register("dedup_snapshot_delta", oracle=_snapshot_delta_oracle())
def dedup_snapshot_delta(spark, sf):
    from dataingestionplayground_spark.session import load_table as _t

    return _snapshot_delta_frame(_t(spark, sf, "documents"))


def _snapshot_delta_frame(d):
    # Cross-snapshot dedup delta (r12 verdict item 5b): snapshot B's
    # NEW documents (ids absent from snapshot A — the anti-join, not id
    # arithmetic, so real snapshot manifests plug in) classified
    # against A's CONTENT: 'exact' (normalized fingerprint already in
    # A), 'near_dup' (best verified Jaccard vs A >= 0.5), or 'novel' —
    # with the best >= 0.3 Jaccard reported. This is the question a
    # recrawl answers before paying to process snapshot B: "how much of
    # the new crawl is actually new?" Composes dedup_lsh_incremental's
    # asymmetric banded screen (batch-side bands are O(delta); the A
    # side is a maintained signature table at warehouse scale) with the
    # exact-dedup fingerprint as a first-pass marker join. Plan shape:
    # one anti-join on doc_id, one fingerprint equi-join (marker
    # column, no fan-out: A's fingerprint set is distinct), the banded
    # candidate join, and a packed-set verify that shuffles candidate
    # PAIRS only — never exploded shingles, never A x B.
    # (r15, verdict item 5: body hoisted to a frame helper so
    # pipeline_release_gate can feed its shared checkpointed documents
    # frame.)
    a = d.filter(F.col("doc_id") % 5 != 4)
    b = d.filter(F.col("doc_id") % 5 != 0)
    # consumed three times (candidate banding, packed verify side, the
    # final fingerprint select): checkpoint so the anti-join runs once
    delta = b.join(a.select("doc_id"), "doc_id", "left_anti").localCheckpoint(
        eager=True
    )
    return _classify_delta(delta, a)


def _classify_delta(delta, a):
    """Classify every ``delta`` document against snapshot ``a``'s
    content — the single-source body behind dedup_snapshot_delta,
    hoisted (r15 verdict item 6) so the streaming ship-readiness
    maintainer classifies each arriving micro-batch with the identical
    fingerprint + banded-verify logic the batch gate runs."""
    from dataingestionplayground_spark.operators.dedup import (
        minhash_lsh_pairs_between,
    )

    afp = (
        a.select(TX.fingerprint("text").alias("fp"))
        .distinct()
        .withColumn("__ex", F.lit(True))
    )
    cand = minhash_lsh_pairs_between(
        delta, a, "doc_id", "text", num_hashes=8, rows_per_band=2
    ).localCheckpoint(eager=True)

    best = (
        cand.join(_packed_side(cand, delta, "new_id"), "new_id")
        .join(_packed_side(cand, a, "old_id"), "old_id")
        .withColumn(
            "n_common", F.size(F.array_intersect("set_new_id", "set_old_id"))
        )
        .withColumn(
            "j",
            F.col("n_common").cast("double")
            / (
                F.col("sz_new_id") + F.col("sz_old_id") - F.col("n_common")
            ).cast("double"),
        )
        .filter(F.col("j") >= 0.3)
        .groupBy(F.col("new_id").alias("doc_id"))
        .agg(F.max("j").alias("best_jaccard"))
    )
    return (
        delta.select("doc_id", TX.fingerprint("text").alias("fp"))
        .join(afp, "fp", "left")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("__ex"), F.lit(False)).alias("is_exact"),
            "best_jaccard",
            F.when(F.coalesce(F.col("__ex"), F.lit(False)), F.lit("exact"))
            .when(F.col("best_jaccard") >= 0.5, F.lit("near_dup"))
            .otherwise(F.lit("novel"))
            .alias("status"),
        )
    )


@register(
    "dedup_rate_by_source",
    oracle=f"""
    WITH fp AS (
      SELECT source, {TX.fingerprint_sql('text')} AS f FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT f) AS BIGINT) AS n_unique,
           CAST(COUNT(*) - COUNT(DISTINCT f) AS BIGINT) AS n_dups,
           round(CAST(COUNT(*) - COUNT(DISTINCT f) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate
    FROM fp GROUP BY source
    """,
)
def dedup_rate_by_source(spark, sf):
    # Per-source exact-duplication rate — the first column of any
    # crawl-quality dashboard ("which feed is reposting itself"), and
    # the signal that routes a source to aggressive dedup before it
    # poisons the mixture weights (pipeline_mixture_plan reads token
    # counts that double-count duplicates). One fingerprint projection
    # + one (source)-keyed agg with a distinct count — Spark plans the
    # count-distinct as the standard two-phase partial-distinct
    # expand, no windows, no skew (sources are the natural partition).
    d = t(spark, sf, "documents")
    fp = d.select("source", TX.fingerprint("text").alias("f"))
    n = F.count(F.lit(1))
    u = F.count_distinct("f")
    return fp.groupBy("source").agg(
        n.cast("long").alias("n_docs"),
        u.cast("long").alias("n_unique"),
        (n - u).cast("long").alias("n_dups"),
        F.round((n - u).cast("double") / n.cast("double"), 6).alias("dup_rate"),
    )


def _packed_pair_jaccard(docs, cand):
    """(id_a, id_b, j): exact distinct-shingle Jaccard for each candidate
    pair via the dedup_lsh_verified_pairs packed-set plan — per-doc
    shingle SETS stay packed (array_distinct is an in-row JVM dedup),
    shingle sets are built ONLY for documents that appear in a candidate
    pair (left-semi), and the intersection count is a per-pair
    array_intersect, so the verify stage shuffles candidate pairs plus
    their packed sets, never exploded (pair x shingle) rows — the first
    bench run of the r13 calibration/matrix rows used the exploded
    equi-join and paid 9.5s each at sf0.5 for what this shape does as
    part of a 5s row. j is 6dp-rounded (exact-decimal sweep thresholds
    can never flip cross-engine). Callers localCheckpoint `cand` first
    (it is consumed three times here)."""
    ids = (
        cand.select(F.col("id_a").alias("doc_id"))
        .union(cand.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    docsets = (
        docs.join(ids, "doc_id", "left_semi")
        .select(
            "doc_id",
            F.array_distinct(TX.word_shingles("text", 3)).alias("sset"),
        )
        .withColumn("sz", F.size("sset"))
        .localCheckpoint(eager=True)  # consumed by both pair sides
    )
    sa = docsets.select(
        F.col("doc_id").alias("id_a"),
        F.col("sset").alias("set_a"),
        F.col("sz").alias("sz_a"),
    )
    sb = docsets.select(
        F.col("doc_id").alias("id_b"),
        F.col("sset").alias("set_b"),
        F.col("sz").alias("sz_b"),
    )
    inter = F.size(F.array_intersect("set_a", "set_b")).cast("long")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                inter.cast("double")
                / (F.col("sz_a") + F.col("sz_b") - inter).cast("double"),
                6,
            ).alias("j"),
        )
    )


def _packed_side(cand, side, idn):
    """One side of an ASYMMETRIC packed-set verify (the two-table form
    of _packed_pair_jaccard, shared by dedup_lsh_incremental and
    dedup_snapshot_delta — previously two byte-identical closures, a
    post-ledger review finding): the side's packed distinct-shingle
    set, built only for docs that appear in a candidate pair."""
    ids = cand.select(F.col(idn).alias("doc_id")).distinct()
    return (
        side.join(ids, "doc_id", "left_semi")
        .select("doc_id", TX.tokens("text").alias("__w"))
        .select(
            F.col("doc_id").alias(idn),
            F.array_distinct(TX.shingles_from_tokens("__w", 3)).alias(
                f"set_{idn}"
            ),
        )
        .withColumn(f"sz_{idn}", F.size(f"set_{idn}"))
    )


def _mh_calibration_oracle() -> str:
    # wide-signature CTEs are byte-for-byte dedup_minhash_signatures' /
    # dedup_minhash_lsh_pairs' oracle fragments; the calibration table
    # stacks exact shingle-Jaccard on top of them
    match_sum = " + ".join(
        f"(CASE WHEN wa.mh{i} = wb.mh{i} THEN 1 ELSE 0 END)" for i in range(8)
    )
    return f"""
    WITH {_WIDE_SIG}, bands AS ({_BANDS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ), m AS (
      SELECT c.id_a, c.id_b, ({match_sum}) AS n_match
      FROM cand c
      JOIN wide wa ON wa.doc_id = c.id_a
      JOIN wide wb ON wb.doc_id = c.id_b
    ), sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id
    ), common AS (
      SELECT c.id_a, c.id_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY c.id_a, c.id_b
    ), pairs AS (
      SELECT m.n_match,
             round(CAST(m.n_match AS DOUBLE) / 8.0, 6) AS est,
             round(CAST(coalesce(cm.n_common, 0) AS DOUBLE)
                   / CAST(sa.sz + sb.sz - coalesce(cm.n_common, 0) AS DOUBLE), 6)
               AS tru
      FROM m
      LEFT JOIN common cm ON cm.id_a = m.id_a AND cm.id_b = m.id_b
      JOIN sizes sa ON sa.doc_id = m.id_a
      JOIN sizes sb ON sb.doc_id = m.id_b
    )
    SELECT CAST(n_match AS INTEGER) AS n_match,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round({davg_expr('tru')}, 6) AS avg_true_jaccard,
           round({davg_expr('round(abs(est - tru), 6)')}, 6) AS avg_abs_err
    FROM pairs GROUP BY n_match
    """


@register("dedup_minhash_calibration", oracle=_mh_calibration_oracle())
def dedup_minhash_calibration(spark, sf):
    # MinHash CALIBRATION table: on the production LSH candidate pairs
    # (same 8x2-banded config as dedup_minhash_lsh_pairs), compare the
    # signature-estimated Jaccard (matching components / 8 — the
    # unbiased MinHash estimator) against the exact shingle Jaccard,
    # grouped by matching-component count. This is the "are 8 hashes
    # enough" / "where do I set the verify threshold" decision table
    # every MinHash deployment reads (Broder 1997's estimator, graded
    # against its own ground truth) — dedup_eval_lsh_pr grades the
    # BLOCKING stage, this grades the ESTIMATOR the verify threshold
    # trusts. Scale shape: everything is candidate-bounded — the
    # match-count join carries 8 signature rows per side, the exact-
    # Jaccard legs are shingle equi-joins SEMI-restricted to candidate
    # ids; the output is <= 9 rows. est is an exact multiple of 0.125
    # and tru is 6dp-rounded before the subtraction on both engines,
    # so the error terms are bit-identical.
    docs = t(spark, sf, "documents")
    cand = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=8, rows_per_band=2
    ).localCheckpoint(eager=True)  # consumed by the match join + verify legs
    sig = minhash_signatures(docs, "doc_id", "text", num_hashes=8)
    sa = sig.select(
        F.col("doc_id").alias("id_a"), "h", F.col("minhash").alias("mh_a")
    )
    sb = sig.select(
        F.col("doc_id").alias("id_b"), "h", F.col("minhash").alias("mh_b")
    )
    m = (
        cand.join(sa, "id_a")
        .join(sb, ["id_b", "h"])
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(F.when(F.col("mh_a") == F.col("mh_b"), 1).otherwise(0)).alias(
                "n_match"
            )
        )
    )
    jac = _packed_pair_jaccard(docs, cand)
    pairs = m.join(jac, ["id_a", "id_b"]).select(
        "n_match",
        F.round(F.col("n_match").cast("double") / F.lit(8.0), 6).alias("est"),
        F.col("j").alias("tru"),
    )
    return pairs.groupBy(F.col("n_match").cast("int").alias("n_match")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(davg("tru"), 6).alias("avg_true_jaccard"),
        F.round(davg(F.round(F.abs(F.col("est") - F.col("tru")), 6)), 6).alias(
            "avg_abs_err"
        ),
    )


def _threshold_sweep_oracle() -> str:
    # same candidate + exact-Jaccard CTEs as the calibration table; the
    # sweep stacks a threshold grid on top
    return f"""
    WITH {_WIDE_SIG}, bands AS ({_BANDS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ), sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id
    ), common AS (
      SELECT c.id_a, c.id_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY c.id_a, c.id_b
    ), jac AS (
      SELECT c.id_a, c.id_b,
             round(CAST(coalesce(cm.n_common, 0) AS DOUBLE)
                   / CAST(sa.sz + sb.sz - coalesce(cm.n_common, 0) AS DOUBLE), 6)
               AS j
      FROM cand c
      LEFT JOIN common cm ON cm.id_a = c.id_a AND cm.id_b = c.id_b
      JOIN sizes sa ON sa.doc_id = c.id_a
      JOIN sizes sb ON sb.doc_id = c.id_b
    ), thr AS (
      SELECT CAST(unnest([0.5, 0.7, 0.8, 0.9]) AS DOUBLE) AS threshold
    ), hits AS (
      SELECT t.threshold,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM thr t JOIN jac ON jac.j >= t.threshold
      GROUP BY t.threshold
    ), docs_hit AS (
      SELECT threshold, CAST(COUNT(DISTINCT d) AS BIGINT) AS n_docs
      FROM (
        SELECT t.threshold, jac.id_a AS d FROM thr t JOIN jac ON jac.j >= t.threshold
        UNION
        SELECT t.threshold, jac.id_b AS d FROM thr t JOIN jac ON jac.j >= t.threshold
      ) GROUP BY threshold
    ), corpus AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM documents
    )
    SELECT t.threshold,
           coalesce(h.n_pairs, 0) AS n_pairs,
           coalesce(d.n_docs, 0) AS n_docs,
           round(CAST(coalesce(d.n_docs, 0) AS DOUBLE)
                 / CAST(c.n_corpus AS DOUBLE), 6) AS frac_docs
    FROM thr t
    LEFT JOIN hits h ON h.threshold = t.threshold
    LEFT JOIN docs_hit d ON d.threshold = t.threshold
    CROSS JOIN corpus c
    """


@register("dedup_threshold_sweep", oracle=_threshold_sweep_oracle())
def dedup_threshold_sweep(spark, sf):
    # The VERIFY-THRESHOLD operating-point table: on the production LSH
    # candidates (same banded config), how many pairs — and how many
    # distinct documents — clear exact-Jaccard thresholds 0.5/0.7/0.8/
    # 0.9. Read next to dedup_minhash_calibration: the calibration says
    # what the estimator thinks, this says what each cutoff actually
    # removes — the "how aggressive can we dedup before we eat real
    # data" slider every curation run sweeps before committing
    # (Lee et al. 2022's dedup-threshold ablation as a relational
    # output). Scale shape: everything downstream of the banding is
    # candidate-pair bounded; the threshold grid is a 4-row broadcast
    # theta-join; doc counts explode each qualifying pair into two id
    # rows before a per-threshold distinct agg. Jaccard is 6dp-rounded
    # before the >= comparison (exact-decimal thresholds -> the flag
    # can never flip cross-engine).
    docs = t(spark, sf, "documents")
    cand = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=8, rows_per_band=2
    ).localCheckpoint(eager=True)
    # the grid join consumes jac twice (pair counts + doc counts):
    # checkpoint the candidate-sized frame so banding + verify run once
    jac = _packed_pair_jaccard(docs, cand).localCheckpoint(eager=True)
    thr = spark.createDataFrame(
        [(0.5,), (0.7,), (0.8,), (0.9,)], "threshold double"
    )
    qual = jac.crossJoin(F.broadcast(thr)).filter(F.col("j") >= F.col("threshold"))
    hits = qual.groupBy("threshold").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    docs_hit = (
        qual.select("threshold", F.explode(F.array("id_a", "id_b")).alias("d"))
        .groupBy("threshold")
        .agg(F.count_distinct("d").cast("long").alias("n_docs"))
    )
    corpus = docs.agg(F.count(F.lit(1)).cast("long").alias("n_corpus"))
    return (
        thr.join(F.broadcast(hits), "threshold", "left")
        .join(F.broadcast(docs_hit), "threshold", "left")
        .crossJoin(F.broadcast(corpus))
        .select(
            "threshold",
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
            F.round(
                F.coalesce(F.col("n_docs"), F.lit(0)).cast("double")
                / F.col("n_corpus").cast("double"),
                6,
            ).alias("frac_docs"),
        )
    )


def _cross_source_oracle() -> str:
    # the calibration/threshold-sweep candidate + exact-Jaccard CTEs,
    # restricted to cross-source pairs and keyed by the unordered
    # source pair
    return f"""
    WITH {_WIDE_SIG}, bands AS ({_BANDS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ), sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id
    ), common AS (
      SELECT c.id_a, c.id_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY c.id_a, c.id_b
    ), xsrc AS (
      SELECT least(da.source, db.source) AS source_a,
             greatest(da.source, db.source) AS source_b,
             round(CAST(coalesce(cm.n_common, 0) AS DOUBLE)
                   / CAST(sa.sz + sb.sz - coalesce(cm.n_common, 0) AS DOUBLE), 6)
               AS j
      FROM cand c
      JOIN documents da ON da.doc_id = c.id_a
      JOIN documents db ON db.doc_id = c.id_b
      LEFT JOIN common cm ON cm.id_a = c.id_a AND cm.id_b = c.id_b
      JOIN sizes sa ON sa.doc_id = c.id_a
      JOIN sizes sb ON sb.doc_id = c.id_b
      WHERE da.source <> db.source
    )
    SELECT source_a, source_b,
           CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
           CAST(SUM(CASE WHEN j >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_verified_pairs
    FROM xsrc GROUP BY source_a, source_b
    """


@register("dedup_cross_source_matrix", oracle=_cross_source_oracle())
def dedup_cross_source_matrix(spark, sf):
    # The WHO-COPIES-WHOM matrix: for every unordered source pair, how
    # many NEAR-DUP candidate pairs the production LSH banding links
    # across them, and how many survive the exact-Jaccard >= 0.5 verify
    # — the cross-feed mirror/syndication signal next to
    # dedup_rate_by_source's within-feed rate (a crawl pipeline reads
    # this to pick ONE canonical feed per mirror cluster before paying
    # near-dup cost on syndicated copies). Plan shape: everything
    # downstream of the banding is candidate-pair bounded — two
    # doc-keyed joins pull the sources, the verify legs are the
    # calibration query's shingle equi-joins, and the output is
    # <= |sources|^2/2 rows. least/greatest normalizes the unordered
    # pair identically on both engines.
    docs = t(spark, sf, "documents")
    cand = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=8, rows_per_band=2
    ).localCheckpoint(eager=True)
    src = docs.select("doc_id", "source")
    xsrc = (
        _packed_pair_jaccard(docs, cand)
        .join(src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("src_a")), "id_a")
        .join(src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("src_b")), "id_b")
        .filter(F.col("src_a") != F.col("src_b"))
        .select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
            "j",
        )
    )
    return xsrc.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"),
        F.sum(F.when(F.col("j") >= 0.5, 1).otherwise(0))
        .cast("long")
        .alias("n_verified_pairs"),
    )


@register(
    "dedup_semantic_threshold_sweep",
    oracle=f"""
    WITH units AS (
      SELECT vec_id, label,
             list_transform(embedding, v -> CAST(v AS DOUBLE) / n) AS u
      FROM (SELECT vec_id, label, embedding,
                   sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                        list_transform(generate_series(1, len(embedding)), i ->
                          CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
                        (acc, v) -> acc + v)) AS n
            FROM embeddings)
    ), scored AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round({_DOT_DUCK}, 6) AS cos_sim
      FROM units a JOIN units b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE {_DOT_DUCK} >= 0.9
    ), thr AS (
      SELECT CAST(unnest([0.9, 0.95, 0.99]) AS DOUBLE) AS threshold
    ), hits AS (
      SELECT t.threshold, CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM thr t JOIN scored s ON s.cos_sim >= t.threshold
      GROUP BY t.threshold
    ), vecs AS (
      SELECT threshold, CAST(COUNT(DISTINCT v) AS BIGINT) AS n_vectors
      FROM (
        SELECT t.threshold, s.id_a AS v FROM thr t JOIN scored s ON s.cos_sim >= t.threshold
        UNION
        SELECT t.threshold, s.id_b AS v FROM thr t JOIN scored s ON s.cos_sim >= t.threshold
      ) GROUP BY threshold
    )
    SELECT t.threshold,
           coalesce(h.n_pairs, 0) AS n_pairs,
           coalesce(v.n_vectors, 0) AS n_vectors
    FROM thr t
    LEFT JOIN hits h ON h.threshold = t.threshold
    LEFT JOIN vecs v ON v.threshold = t.threshold
    """,
)
def dedup_semantic_threshold_sweep(spark, sf):
    # The SemDeDup operating-point slider: pairs and distinct vectors
    # linked at cosine >= 0.9 / 0.95 / 0.99 — the embedding-space twin
    # of dedup_threshold_sweep (text) and
    # multimodal_hamming_threshold_sweep (image), completing the sweep
    # family across all three modalities. Same unit-normalize-once +
    # label-blocked pair scan as the registered dedup_embedding_cosine
    # (0.95 is its shipped point), widened to the 0.9 floor so the
    # sweep sees both sides of the shipped threshold. cos_sim is
    # 6dp-rounded before the >= comparisons (exact-decimal thresholds
    # — the flag can never flip cross-engine); the UNROUNDED dot
    # gates the 0.9 prefilter identically in both engines. Scale
    # shape: pair stage is block-bounded (labels here, LSH cells in
    # the production path); the sweep adds a 3-row broadcast
    # theta-join on a pair frame that never leaves candidate scale.
    e = t(spark, sf, "embeddings")
    units = e.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x -> cast(x as double) / "
            "sqrt(aggregate(sequence(1, size(embedding)), cast(0.0 as double), "
            "(acc, i) -> acc + cast(element_at(embedding, i) as double) * "
            "cast(element_at(embedding, i) as double))))"
        ).alias("u"),
    )
    a, b = units.alias("a"), units.alias("b")
    dot = F.expr(
        "aggregate(sequence(1, size(a.u)), cast(0.0 as double), "
        "(acc, i) -> acc + element_at(a.u, i) * element_at(b.u, i))"
    )
    scored = (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(dot >= 0.9)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(dot, 6).alias("cos_sim"),
        )
    )
    thr = spark.createDataFrame([(0.9,), (0.95,), (0.99,)], "threshold double")
    # scored is consumed twice (pair + vector counts): checkpoint the
    # (small, >=0.9-filtered) pair frame so the blocked scan runs once
    scored = scored.localCheckpoint(eager=True)
    qual = scored.crossJoin(F.broadcast(thr)).filter(
        F.col("cos_sim") >= F.col("threshold")
    )
    hits = qual.groupBy("threshold").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    vecs = (
        qual.select("threshold", F.explode(F.array("id_a", "id_b")).alias("v"))
        .groupBy("threshold")
        .agg(F.count_distinct("v").cast("long").alias("n_vectors"))
    )
    return (
        thr.join(F.broadcast(hits), "threshold", "left")
        .join(F.broadcast(vecs), "threshold", "left")
        .select(
            "threshold",
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce(F.col("n_vectors"), F.lit(0)).cast("long").alias("n_vectors"),
        )
    )


def _cluster_histogram_oracle() -> str:
    # compose the registered connected-components oracle
    from dataingestionplayground_spark.queries import REGISTRY as _R

    return f"""
    WITH clusters AS MATERIALIZED (
      SELECT doc_id, cluster_id FROM ({_R['dedup_clusters'].oracle})
    ), sizes AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM clusters GROUP BY cluster_id
    ), hist AS (
      SELECT cluster_size,
             CAST(COUNT(*) AS BIGINT) AS n_clusters,
             CAST(SUM(cluster_size) AS BIGINT) AS n_docs
      FROM sizes GROUP BY cluster_size
    ), tot AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS corpus FROM hist
    )
    SELECT h.cluster_size, h.n_clusters, h.n_docs,
           round(CAST(h.n_docs AS DOUBLE) / CAST(t.corpus AS DOUBLE), 6)
             AS doc_frac
    FROM hist h CROSS JOIN tot t
    """


@register("dedup_cluster_size_histogram", oracle=_cluster_histogram_oracle())
def dedup_cluster_size_histogram(spark, sf):
    # HOW DUPLICATED IS THE CORPUS, as a curve: the size distribution
    # of near-dup connected components (1 = unique doc, 2 = a pair,
    # big sizes = template farms / mirror clusters) with the document
    # fraction each size class holds — the first chart of any dedup
    # report, and the input to the "representatives before pairing"
    # lever the r13 ledger names for dedup_lsh_verified_pairs if its
    # candidate growth ever crosses threshold. Composes the REGISTERED
    # dedup_clusters (banded edges, iterative min-label CC); everything
    # after it is |clusters|-sized: one size agg, one histogram agg,
    # a 1-row total broadcast.
    from dataingestionplayground_spark.queries import REGISTRY as _R

    clusters = _R["dedup_clusters"].fn(spark, sf).select("doc_id", "cluster_id")
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    hist = sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum("cluster_size").cast("long").alias("n_docs"),
    )
    tot = hist.agg(F.sum("n_docs").cast("long").alias("corpus"))
    return hist.crossJoin(F.broadcast(tot)).select(
        "cluster_size",
        "n_clusters",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / F.col("corpus").cast("double"), 6
        ).alias("doc_frac"),
    )


def _softdedup_effect_oracle() -> str:
    from dataingestionplayground_spark.queries import REGISTRY as _R

    return f"""
    WITH w AS MATERIALIZED (
      SELECT doc_id, cluster_id, weight
      FROM ({_R['dedup_soft_weights'].oracle})
    ), toks AS (
      SELECT doc_id, CAST(len({TX.tokens_sql('text')}) AS BIGINT) AS n_toks
      FROM documents
    ), j AS (
      SELECT w.doc_id, w.cluster_id, w.weight, t.n_toks
      FROM w JOIN toks t USING (doc_id)
    ), keepers AS (
      SELECT cluster_id, min(doc_id) AS keep_id FROM j GROUP BY cluster_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS raw_tokens,
           CAST(SUM(CASE WHEN k.keep_id = j.doc_id THEN n_toks ELSE 0 END)
                AS BIGINT) AS hard_tokens,
           round(CAST(SUM(CAST(round(j.weight * j.n_toks, 6)
                 AS DECIMAL(38,6))) AS DOUBLE), 6) AS soft_token_mass,
           round(CAST(SUM(CASE WHEN k.keep_id = j.doc_id THEN n_toks ELSE 0 END)
                      AS DOUBLE) / CAST(SUM(n_toks) AS DOUBLE), 6)
             AS hard_retention,
           round(CAST(SUM(CAST(round(j.weight * j.n_toks, 6)
                 AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(SUM(n_toks) AS DOUBLE), 6) AS soft_retention
    FROM j JOIN keepers k USING (cluster_id)
    """


@register("dedup_softdedup_effect", oracle=_softdedup_effect_oracle())
def dedup_softdedup_effect(spark, sf):
    # HARD vs SOFT dedup, measured in token mass: raw corpus tokens,
    # tokens surviving hard keep-one-per-cluster dedup, and the
    # SoftDeDup effective token mass (each doc reweighted 1/cluster-
    # size — the registered dedup_soft_weights), with both retention
    # ratios. The table that decides between dropping duplicates and
    # downweighting them (soft keeps tail variants at reduced mass —
    # soft_retention >= hard_retention exactly when near-dup clusters
    # are internally diverse). Composes the registered weights; one
    # doc-keyed token join, a |clusters|-row keepers agg, ONE
    # single-row agg with a 6dp-rounded decimal fold for the
    # fractional mass.
    from dataingestionplayground_spark.queries import REGISTRY as _R

    w = (
        _R["dedup_soft_weights"].fn(spark, sf)
        .select("doc_id", "cluster_id", "weight")
    )
    toks = t(spark, sf, "documents").select(
        "doc_id", TX.token_count("text").cast("long").alias("n_toks")
    )
    j = w.join(toks, "doc_id")
    keepers = j.groupBy("cluster_id").agg(F.min("doc_id").alias("keep_id"))
    jk = j.join(keepers, "cluster_id")
    hard = F.sum(
        F.when(F.col("keep_id") == F.col("doc_id"), F.col("n_toks")).otherwise(0)
    )
    soft = F.sum(
        F.round(F.col("weight") * F.col("n_toks"), 6).cast("decimal(38,6)")
    ).cast("double")
    return jk.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("raw_tokens"),
        hard.cast("long").alias("hard_tokens"),
        F.round(soft, 6).alias("soft_token_mass"),
        F.round(hard.cast("double") / F.sum("n_toks").cast("double"), 6).alias(
            "hard_retention"
        ),
        F.round(soft / F.sum("n_toks").cast("double"), 6).alias("soft_retention"),
    )


@register(
    "dedup_rep_collapse_stats",
    oracle="""
    WITH g AS (
      SELECT md5(coalesce(text, '')) AS fp, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM documents GROUP BY 1
    )
    SELECT CAST(SUM(cnt) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT)
             AS n_replica_docs,
           CAST(MAX(cnt) AS BIGINT) AS max_group,
           round(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6)
             AS collapse_ratio,
           round(CAST(SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(cnt) AS DOUBLE), 6) AS replica_mass
    FROM g
    """,
)
def dedup_rep_collapse_stats(spark, sf):
    # The instrument for the r14 representatives-first near-dup plan:
    # how far would exact-fingerprint collapsing shrink the banding
    # input on THIS corpus? Uses the identical grouping key as
    # dedup_lsh_verified_pairs (raw md5 of the text — replicas, not the
    # normalized-dedup fingerprint). collapse_ratio near 1.0 means a
    # replica-free corpus where rep-first only adds its fingerprint
    # overhead (the measured +0.5 s at sf0.1); replica_mass near 1.0
    # means the quadratic band/verify stages shrink by ~1/collapse_ratio
    # (the measured -89 % at the sf1.0 replica density) — the cheap gate
    # a curation run reads before choosing the pipeline variant. Plan:
    # ONE fingerprint hash agg (map-side partials, key cardinality grows
    # with unique content) + one single-row rollup; exact integers, two
    # divisions at 6dp.
    d = t(spark, sf, "documents")
    g = (
        d.select(F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    rep = F.sum(F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(0))
    return g.agg(
        F.sum("cnt").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        rep.cast("long").alias("n_replica_docs"),
        F.max("cnt").cast("long").alias("max_group"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.sum("cnt").cast("double"), 6
        ).alias("collapse_ratio"),
        F.round(rep.cast("double") / F.sum("cnt").cast("double"), 6).alias(
            "replica_mass"
        ),
    )
