"""Retrieval-pipeline query surface: BM25 lexical ranking, corpus-wide
first-occurrence segment dedup (the Lee-et-al "remove later copies"
semantic, vs the df>=2 boilerplate drop and the intra-doc variant in
pipelineq), containment-verified near-dup pairs (catches subset
duplicates whose Jaccard stays low), and MMR diversified vector search.

Reference parity: the reference's search surface is embedding-only
(``VectorStoreCommands.cs:83-139``); BM25/MMR extend it with the lexical
and diversity legs a production retrieval stack pairs with it, per the
LLM-pipeline mandate. All hot paths are Catalyst built-ins; the only
driver-side state is MMR's k-bounded candidate table.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dataingestionplayground_spark.functions import text as TX
from dataingestionplayground_spark.operators.prefix import bounded_rank
from dataingestionplayground_spark.queries import register
from dataingestionplayground_spark.session import fan_out_small_scan
from dataingestionplayground_spark.session import load_table as t

# Fixed query for the BM25 demo — frequent corpus words so every scale
# factor produces a dense result. Part of the query's definition (like
# vec_id < 5 for the vector queries), identical on both engines.
_BM25_TERMS = ("spark", "merge", "vector")
_K1 = 1.2
_B = 0.75


def _bm25_term_score(tf, dl):
    """BM25 per-(doc,term) partial: idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)).

    idf is the robust ln(1 + (N-df+0.5)/(df+0.5)) variant (always > 0).
    Expects columns tf, df, n_docs, avgdl in scope.
    """
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = tf + F.lit(_K1) * (F.lit(1.0 - _B) + F.lit(_B) * dl / F.col("avgdl"))
    return idf * tf * F.lit(_K1 + 1.0) / norm


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {TX.tokens_sql('text')} AS tk FROM documents
    ), dl AS (
      SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl FROM base
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ), toks AS (
      SELECT b.doc_id, u.term FROM base b, unnest(b.tk) AS u(term)
      WHERE u.term IN {str(tuple(_BM25_TERMS))}
    ), tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM toks GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
    ), parts AS (
      SELECT tf.doc_id, tf.term,
             ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * tf.tf * {_K1 + 1.0}
               / (tf.tf + {_K1} * ({1.0 - _B} + {_B} * l.dl / s.avgdl)) AS part
      FROM tf
      JOIN dfreq d ON d.term = tf.term
      JOIN dl l ON l.doc_id = tf.doc_id
      CROSS JOIN stats s
    ), scored AS (
      SELECT doc_id,
             round(  coalesce(SUM(CASE WHEN term = '{_BM25_TERMS[0]}' THEN part END), 0)
                   + coalesce(SUM(CASE WHEN term = '{_BM25_TERMS[1]}' THEN part END), 0)
                   + coalesce(SUM(CASE WHEN term = '{_BM25_TERMS[2]}' THEN part END), 0), 6)
               AS score
      FROM parts GROUP BY doc_id
    )
    SELECT doc_id, score, rk FROM (
      SELECT doc_id, score,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rk
      FROM scored) WHERE rk <= 10
    """,
)
def text_bm25_topk(spark, sf):
    # Distributed BM25 for a fixed 3-term query. Shuffle shape at any
    # corpus scale: the posting rows are filtered to the query terms
    # BEFORE the tf aggregation (the only corpus-sized shuffle is keyed
    # by doc_id — high-cardinality, no skew), df and the corpus stats
    # are 3-row / 1-row broadcasts, and the final top-10 is
    # TakeOrderedAndProject (partial top-k per partition, no global
    # sort). Per-doc summation runs in FIXED term order (one conditional
    # sum per query term, each over <= 1 row) so double addition is
    # order-deterministic and hash-matches the sequential oracle.
    d = t(spark, sf, "documents").select("doc_id", TX.tokens("text").alias("tk"))
    dl = d.select("doc_id", F.size("tk").cast("double").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    toks = d.select(
        "doc_id",
        F.size("tk").cast("double").alias("dl"),
        F.explode("tk").alias("term"),
    ).filter(F.col("term").isin(*_BM25_TERMS))
    tf = toks.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    parts = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            _bm25_term_score(F.col("tf"), F.col("dl")).alias("part"),
        )
    )
    per_term = [
        F.coalesce(
            F.sum(F.when(F.col("term") == term, F.col("part"))), F.lit(0.0)
        )
        for term in _BM25_TERMS
    ]
    total = per_term[0]
    for p in per_term[1:]:
        total = total + p
    scored = parts.groupBy("doc_id").agg(F.round(total, 6).alias("score"))
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)
    return bounded_rank(top, [("score", False), ("doc_id", True)], "rk")


_SEG = 12  # tokens per synthetic "line", same stand-in as pipelineq


@register(
    "dedup_global_first_segment",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {TX.tokens_sql('text')} AS tk FROM documents
      WHERE len({TX.tokens_sql('text')}) > 0
    ), segs AS (
      SELECT doc_id, i AS pos,
             array_to_string(tk[(i-1)*{_SEG}+1:i*{_SEG}], ' ') AS line
      FROM base, unnest(generate_series(1, CAST(ceil(len(tk)/{_SEG}.0) AS INTEGER))) AS u(i)
    ), nz AS (
      SELECT doc_id, pos, line,
             CAST(row_number() OVER (PARTITION BY md5(trim(line))
                                     ORDER BY doc_id, pos) AS BIGINT) AS occurrence
      FROM segs WHERE trim(line) <> ''
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segs_total,
           CAST(SUM(CASE WHEN occurrence = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_segs_kept,
           coalesce(string_agg(CASE WHEN occurrence = 1 THEN line END, chr(10) ORDER BY pos), '')
             AS clean_text
    FROM nz GROUP BY doc_id
    """,
)
def dedup_global_first_segment(spark, sf):
    # Corpus-wide duplicate-segment REMOVAL, keep-first semantics (Lee et
    # al., "Deduplicating Training Data Makes Language Models Better"):
    # exactly ONE copy of every repeated segment survives, at its first
    # (doc_id, pos) occurrence — distinct from dedup_line_boilerplate
    # (drops ALL copies once df >= 2) and dedup_intra_doc_lines (first
    # per doc, cross-doc copies untouched). Scale shape: the occurrence
    # window partitions by the segment HASH — a high-cardinality key
    # (most segments are unique, dup groups are small), so no reducer
    # hot-spots — then one per-doc rebuild agg. Two shuffles total.
    d = t(spark, sf, "documents").withColumn("tk", TX.tokens("text"))
    d = d.filter(F.size("tk") > 0)
    seg = lambda i: F.array_join(F.slice(F.col("tk"), (i - 1) * _SEG + 1, _SEG), " ")
    lines = (
        d.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.ceil(F.size("tk") / float(_SEG)).cast("int")),
                    seg,
                )
            ).alias("pos0", "line"),
        )
        .filter(F.trim("line") != "")
        .withColumn("pos", F.col("pos0") + 1)
    )
    w = W.partitionBy(F.md5(F.trim("line"))).orderBy("doc_id", "pos")
    flagged = lines.withColumn("occurrence", F.row_number().over(w).cast("long"))
    first = F.col("occurrence") == 1
    ordered = F.array_sort(F.collect_list(F.when(first, F.struct("pos", "line"))))
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segs_total"),
        F.sum(first.cast("long")).cast("long").alias("n_segs_kept"),
        F.array_join(F.transform(ordered, lambda x: x["line"]), "\n").alias("clean_text"),
    )


def _containment_oracle() -> str:
    # Reuses dedupq's minhash/banding SQL fragments so the candidate set
    # is definitionally identical to dedup_minhash_lsh_pairs.
    from dataingestionplayground_spark.queries.dedupq import _BANDS, _SHINGLES, _WIDE_SIG

    return f"""
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
    SELECT i.id_a, i.id_b, CAST(i.n_common AS BIGINT) AS n_common,
           CAST(i.n_common AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE) AS containment,
           CAST(i.n_common AS DOUBLE) / CAST(sa.sz + sb.sz - i.n_common AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE CAST(i.n_common AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE) >= 0.3
    """


@register("dedup_containment_pairs", oracle=_containment_oracle())
def dedup_containment_pairs(spark, sf):
    # Containment-verified near-dup pairs: |A n B| / min(|A|, |B|).
    # Jaccard under-scores subset duplicates (a doc embedded inside a
    # much longer one scores |A|/|B| -> 0 even when A is fully
    # contained); containment is the standard fix (Broder's resemblance
    # vs containment split). Same two-stage shape as
    # dedup_lsh_verified_pairs: LSH banding proposes candidates, packed
    # shingle sets verify with one array_intersect per PAIR — the verify
    # stage never shuffles exploded (pair x shingle) rows, and shingle
    # sets are built only for candidate docs (a vanishing corpus
    # fraction at scale).
    from dataingestionplayground_spark.operators.dedup import minhash_lsh_pairs

    d = t(spark, sf, "documents")
    cand = minhash_lsh_pairs(
        d, "doc_id", "text", num_hashes=8, rows_per_band=2
    ).localCheckpoint(eager=True)
    ids = (
        cand.select(F.col("id_a").alias("doc_id"))
        .union(cand.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    docsets = (
        d.join(ids, "doc_id", "left_semi")
        .select(F.col("doc_id"), TX.tokens("text").alias("__w"))
        .select(
            "doc_id",
            F.array_distinct(TX.shingles_from_tokens("__w", 3)).alias("sset"),
        )
        .withColumn("sz", F.size("sset"))
        .localCheckpoint(eager=True)
    )
    sa = docsets.select(
        F.col("doc_id").alias("id_a"), F.col("sset").alias("set_a"), F.col("sz").alias("sz_a")
    )
    sb = docsets.select(
        F.col("doc_id").alias("id_b"), F.col("sset").alias("set_b"), F.col("sz").alias("sz_b")
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_common", F.size(F.array_intersect("set_a", "set_b")).cast("long"))
        .withColumn(
            "containment",
            F.col("n_common").cast("double") / F.least("sz_a", "sz_b").cast("double"),
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("containment") >= 0.3)
        .select("id_a", "id_b", "n_common", "containment", "jaccard")
    )


_MMR_CAND, _MMR_K = 32, 10
# lam and (1-lam) as SEPARATE literals: 1 - 0.7 is 0.30000000000000004 in
# binary64, so deriving the penalty weight would silently diverge from an
# oracle writing 0.3 — both engines get the literal pair instead.
_MMR_W_REL, _MMR_W_PEN = 0.7, 0.3


def _mmr_oracle() -> str:
    # k-1 UNROLLED greedy stages (the k-center oracle pattern): cand is
    # the brute-force top-32 for vec_id=0 (same contract the hash-green
    # vector_knn_bruteforce pins), sims the candidate-candidate cosines;
    # m{j} carries each unpicked candidate's running max-sim penalty, and
    # s{j+1} is the argmax of 0.7*rel - 0.3*pen (exact double compare,
    # ties -> lowest vec_id). Every cosine is the same sequential
    # left-fold as Spark's aggregate(), so scores are bit-identical and
    # only the REPORTED columns are rounded. Every CTE is MATERIALIZED:
    # DuckDB inlines plain CTEs, and each stage references its
    # predecessor ~3x, so the unrolled chain would otherwise expand
    # 3^k subtrees and reopen the parquet thousands of times.
    from dataingestionplayground_spark.functions.vector import cosine_sql

    parts = [
        """
    WITH q AS MATERIALIZED (
      SELECT embedding AS query_vec FROM embeddings WHERE vec_id = 0
    ), scored AS MATERIALIZED (
      SELECT e.vec_id, e.embedding, {cs} AS rel
      FROM embeddings e CROSS JOIN q
    ), cand AS MATERIALIZED (
      SELECT vec_id, embedding, rel FROM scored
      ORDER BY rel DESC, vec_id ASC LIMIT {n}
    ), sims AS MATERIALIZED (
      SELECT a.vec_id AS ia, b.vec_id AS ib, {ab} AS sim
      FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
    ), s1 AS MATERIALIZED (
      SELECT vec_id, rel,
             CAST({wr} AS DOUBLE) * rel - CAST({wp} AS DOUBLE) * CAST(0.0 AS DOUBLE) AS mmr
      FROM cand ORDER BY rel DESC, vec_id ASC LIMIT 1
    ), m1 AS MATERIALIZED (
      SELECT c.vec_id, c.rel, s.sim AS pen
      FROM cand c JOIN sims s
        ON s.ia = c.vec_id AND s.ib = (SELECT vec_id FROM s1)
    )""".format(
            cs=cosine_sql("e.embedding", "q.query_vec"),
            ab=cosine_sql("a.embedding", "b.embedding"),
            n=_MMR_CAND,
            wr=_MMR_W_REL,
            wp=_MMR_W_PEN,
        )
    ]
    for j in range(2, _MMR_K + 1):
        parts.append(
            """
    , s{j} AS MATERIALIZED (
      SELECT vec_id, rel,
             CAST({wr} AS DOUBLE) * rel - CAST({wp} AS DOUBLE) * pen AS mmr
      FROM m{p} ORDER BY mmr DESC, vec_id ASC LIMIT 1
    ), m{j} AS MATERIALIZED (
      SELECT m.vec_id, m.rel, greatest(m.pen, s.sim) AS pen
      FROM m{p} m JOIN sims s
        ON s.ia = m.vec_id AND s.ib = (SELECT vec_id FROM s{j})
      WHERE m.vec_id <> (SELECT vec_id FROM s{j})
    )""".format(j=j, p=j - 1, wr=_MMR_W_REL, wp=_MMR_W_PEN)
        )
    sel = " UNION ALL ".join(
        f"SELECT CAST({j} AS INTEGER) AS select_rank, vec_id, "
        f"round(rel, 6) AS relevance, round(mmr, 6) AS mmr_score FROM s{j}"
        for j in range(1, _MMR_K + 1)
    )
    return "".join(parts) + sel


# r11 (r10 verdict item 9): converted from rows-only to oracle-checked.
# The greedy loop itself runs driver-side on the k-bounded candidate
# table, but every NUMBER it compares (relevance + pairwise cosines) is
# computed ENGINE-side with the sequential-fold cosine both engines share
# bit-for-bit (the numpy matmul it replaces had BLAS summation order), so
# the unrolled-CTE oracle reproduces the selection exactly.
@register("vector_mmr_diversify", oracle=_mmr_oracle())
def vector_mmr_diversify(spark, sf):
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
    of the brute-force top-32 for query vec_id=0.

    MMR_i = 0.7 * cos(q, d_i) - 0.3 * max_{s in S} cos(d_s, d_i),
    greedily picking argmax (ties -> lowest vec_id) until 10 selections.

    Scale split: candidate generation is the DISTRIBUTED part (two-phase
    partial top-k over the full corpus — knn_brute_force, shuffle bounded
    by k x n_partitions); the pairwise-cosine table is a broadcast
    self-join of the 32-row candidate set; the greedy selection is
    inherently sequential but only ever touches those bounded tables, so
    it runs driver-side regardless of corpus size — the same
    bounded-collect contract as the centroid/codebook tables. Both
    bounded tables are computed JVM-side with the portable fold-order
    cosine, so the driver-side doubles are bit-identical to the oracle's.
    """
    from dataingestionplayground_spark.functions import vector as V
    from dataingestionplayground_spark.operators.similarity import knn_brute_force

    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = knn_brute_force(e, q, k=_MMR_CAND)
    # bounded collects: 32 candidate rows + their 32x31 cosine pairs
    cset = top.join(e.select("vec_id", "embedding"), "vec_id").select(
        "vec_id", "score", "embedding"
    )
    cand = cset.select("vec_id", "score").collect()
    ca = cset.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    cb = cset.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    sim_rows = (
        ca.join(F.broadcast(cb), F.col("ia") != F.col("ib"))
        .select("ia", "ib", V.cosine_similarity("ea", "eb").alias("sim"))
        .collect()
    )
    sim = {(r["ia"], r["ib"]): r["sim"] for r in sim_rows}
    rel = {r["vec_id"]: r["score"] for r in cand}
    ids = sorted(rel)  # ascending scan order = lowest-id tie-break

    selected: list[int] = []
    rows = []
    for step in range(min(_MMR_K, len(ids))):
        best_v, best_score = None, None
        for v in ids:
            if v in selected:
                continue
            pen = max(sim[(v, s)] for s in selected) if selected else 0.0
            score = _MMR_W_REL * rel[v] - _MMR_W_PEN * pen
            # strict > on raw doubles (no epsilon): both engines computed
            # these exact bits, so the oracle's ORDER BY mmr DESC,
            # vec_id ASC picks the same row
            if best_score is None or score > best_score:
                best_v, best_score = v, score
        selected.append(best_v)
        rows.append((step + 1, best_v, rel[best_v], best_score))
    out = spark.createDataFrame(
        rows, "select_rank INT, vec_id BIGINT, relevance DOUBLE, mmr_score DOUBLE"
    )
    # round ENGINE-side (Spark round == DuckDB round on identical bits)
    return out.select(
        "select_rank",
        "vec_id",
        F.round("relevance", 6).alias("relevance"),
        F.round("mmr_score", 6).alias("mmr_score"),
    )


def _rrf_oracle() -> str:
    # compose the registered BM25 oracle so the fusion can never drift
    # from the lexical ranking it consumes
    from dataingestionplayground_spark.functions.vector import cosine_sql
    from dataingestionplayground_spark.queries import REGISTRY as _R

    return f"""
    WITH bm AS ({_R['text_bm25_topk'].oracle}),
    q AS (
      SELECT vec_id AS query_id, embedding AS query_vec
      FROM embeddings WHERE vec_id < 1
    ), vs AS (
      SELECT vec_id, v_rank FROM (
        SELECT e.vec_id,
               CAST(row_number() OVER (
                 ORDER BY {cosine_sql('e.embedding', 'q.query_vec')} DESC,
                          e.vec_id ASC) AS INTEGER) AS v_rank
        FROM embeddings e CROSS JOIN q) WHERE v_rank <= 10
    ), fused AS (
      SELECT coalesce(b.doc_id, v.vec_id) AS doc_id,
             round(coalesce(1.0 / (60 + b.rk), 0.0)
                   + coalesce(1.0 / (60 + v.v_rank), 0.0), 6) AS rrf
      FROM bm b FULL OUTER JOIN vs v ON v.vec_id = b.doc_id
    )
    SELECT doc_id, rrf,
           CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC)
                AS INTEGER) AS rk
    FROM fused
    """


@register("retrieval_hybrid_rrf", oracle=_rrf_oracle())
def retrieval_hybrid_rrf(spark, sf):
    # Hybrid lexical+vector retrieval fused by Reciprocal Rank Fusion
    # (Cormack et al. 2009, the standard used by Elasticsearch/Vespa
    # hybrid search): take the BM25 top-10 (text_bm25_topk, composed) and
    # the cosine top-10 for the query embedding, score each candidate
    # 1/(60+rank) per list, sum, and re-rank the union. RRF needs no
    # score calibration between the two retrievers — only ranks — which
    # is why it is the default fusion at scale. Plan shape: both
    # retrievers end in bounded top-10s (TakeOrdered / two-phase
    # partial top-k), so the fusion join + final rank touch <= 20 rows
    # no matter the corpus size.
    from dataingestionplayground_spark.operators.similarity import knn_brute_force
    from dataingestionplayground_spark.queries import REGISTRY as _R
    from dataingestionplayground_spark.queries.vectorq import _queries_df

    bm = (
        _R["text_bm25_topk"]
        .fn(spark, sf)
        .select("doc_id", F.col("rk").alias("t_rank"))
    )
    vs = knn_brute_force(
        t(spark, sf, "embeddings"), _queries_df(spark, sf, n=1), k=10
    ).select(F.col("vec_id").alias("doc_id"), F.col("rank").alias("v_rank"))
    fused = bm.join(vs, "doc_id", "full").select(
        "doc_id",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("t_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("v_rank")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    # <= 20 fused candidates by construction -> bounded rank, no window
    return bounded_rank(
        fused.orderBy(F.desc("rrf"), F.asc("doc_id")),
        [("rrf", False), ("doc_id", True)],
        "rk",
    )


def _ndcg_oracle() -> str:
    # the ranking CTEs are byte-for-byte the text_bm25_topk oracle's;
    # rel/dcg/idcg are stacked on top (graded relevance = how many of
    # the fixed query's terms the document contains at all)
    terms_list = "[" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + "]"
    return f"""
    WITH base AS (
      SELECT doc_id, {TX.tokens_sql('text')} AS tk FROM documents
    ), dl AS (
      SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl FROM base
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ), toks AS (
      SELECT b.doc_id, u.term FROM base b, unnest(b.tk) AS u(term)
      WHERE u.term IN {str(tuple(_BM25_TERMS))}
    ), tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM toks GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
    ), parts AS (
      SELECT tf.doc_id, tf.term,
             ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * tf.tf * {_K1 + 1.0}
               / (tf.tf + {_K1} * ({1.0 - _B} + {_B} * l.dl / s.avgdl)) AS part
      FROM tf
      JOIN dfreq d ON d.term = tf.term
      JOIN dl l ON l.doc_id = tf.doc_id
      CROSS JOIN stats s
    ), scored AS (
      SELECT doc_id,
             round(  coalesce(SUM(CASE WHEN term = '{_BM25_TERMS[0]}' THEN part END), 0)
                   + coalesce(SUM(CASE WHEN term = '{_BM25_TERMS[1]}' THEN part END), 0)
                   + coalesce(SUM(CASE WHEN term = '{_BM25_TERMS[2]}' THEN part END), 0), 6)
               AS score
      FROM parts GROUP BY doc_id
    ), ranked AS (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
      FROM scored
    ), rel AS (
      SELECT doc_id,
             CAST(len(list_intersect(list_distinct(tk), {terms_list})) AS BIGINT) AS rel
      FROM base
    ), dcg AS (
      SELECT CAST(SUM(CAST(round(
               (power(2.0, r.rel) - 1.0) / log2(CAST(k.rk + 1 AS DOUBLE)), 6)
             AS DECIMAL(38,6))) AS DOUBLE) AS dcg10,
             CAST(SUM(CASE WHEN r.rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_top
      FROM ranked k JOIN rel r ON r.doc_id = k.doc_id WHERE k.rk <= 10
    ), ideal AS (
      SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id ASC) AS rk FROM rel
    ), idcg AS (
      SELECT CAST(SUM(CAST(round(
               (power(2.0, rel) - 1.0) / log2(CAST(rk + 1 AS DOUBLE)), 6)
             AS DECIMAL(38,6))) AS DOUBLE) AS idcg10
      FROM ideal WHERE rk <= 10
    ), nrel AS (
      SELECT CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_relevant
      FROM rel
    )
    SELECT round(d.dcg10, 6) AS dcg10, round(i.idcg10, 6) AS idcg10,
           round(d.dcg10 / i.idcg10, 6) AS ndcg10,
           round(CAST(d.n_rel_top AS DOUBLE) / 10.0, 6) AS precision10,
           n.n_relevant
    FROM dcg d CROSS JOIN idcg i CROSS JOIN nrel n
    """


@register("retrieval_eval_ndcg", oracle=_ndcg_oracle())
def retrieval_eval_ndcg(spark, sf):
    # Ranking-quality evaluation of the BM25 retriever: nDCG@10,
    # precision@10, and the DCG/IDCG components against a graded
    # relevance label (how many of the fixed query's terms the document
    # contains, 0..3) — the standard eval harness every retrieval stack
    # runs next to its index (Jarvelin & Kekalainen 2002). The ranking
    # is text_bm25_topk's own (same function), so the metric grades the
    # production scorer, not a re-implementation. Scale shape: BM25's
    # shuffles (term-filtered tf agg + broadcast df/stats + TakeOrdered
    # top-10) plus ONE relevance agg over in-row token intersection;
    # DCG terms are 6dp-rounded and decimal-summed over <= 10 rows, the
    # ideal ranking is a TakeOrdered over the (tiny) relevance frame.
    top = text_bm25_topk(spark, sf)  # (doc_id, score, rk) — k-bounded
    d = t(spark, sf, "documents").select("doc_id", TX.tokens("text").alias("tk"))
    terms_arr = F.array(*[F.lit(x) for x in _BM25_TERMS])
    rel = d.select(
        "doc_id",
        F.size(F.array_intersect(F.array_distinct("tk"), terms_arr))
        .cast("long")
        .alias("rel"),
    )
    gain = (F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0)) / F.log2(
        F.col("rk").cast("double") + F.lit(1.0)
    )
    dcg = (
        top.join(rel, "doc_id")
        .agg(
            F.sum(F.round(gain, 6).cast("decimal(38,6)")).cast("double").alias("dcg10"),
            F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).cast("long").alias("n_rel_top"),
        )
    )
    ideal_top = rel.orderBy(F.desc("rel"), F.asc("doc_id")).limit(10)
    from dataingestionplayground_spark.operators.prefix import bounded_rank

    ideal = bounded_rank(ideal_top, [("rel", False), ("doc_id", True)], "rk")
    idcg = ideal.agg(
        F.sum(F.round(gain, 6).cast("decimal(38,6)")).cast("double").alias("idcg10")
    )
    nrel = rel.agg(
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).cast("long").alias("n_relevant")
    )
    return (
        dcg.crossJoin(F.broadcast(idcg))
        .crossJoin(F.broadcast(nrel))
        .select(
            F.round("dcg10", 6).alias("dcg10"),
            F.round("idcg10", 6).alias("idcg10"),
            F.round(F.col("dcg10") / F.col("idcg10"), 6).alias("ndcg10"),
            F.round(F.col("n_rel_top").cast("double") / 10.0, 6).alias("precision10"),
            "n_relevant",
        )
    )


_QL_MU = 300.0  # Dirichlet prior mass (Zhai & Lafferty 2001 ballpark)


@register(
    "retrieval_query_likelihood",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {TX.tokens_sql('text')} AS tk FROM documents
    ), dl AS (
      SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl FROM base
    ), coll AS (
      SELECT CAST(SUM(dl) AS DOUBLE) AS total_toks FROM dl
    ), toks AS (
      SELECT b.doc_id, u.term FROM base b, unnest(b.tk) AS u(term)
      WHERE u.term IN {str(tuple(_BM25_TERMS))}
    ), cf AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS cf FROM toks GROUP BY term
    ), tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM toks GROUP BY doc_id, term
    ), grid AS (
      SELECT d.doc_id, d.dl, c.term, c.cf, coalesce(t.tf, 0.0) AS tf
      FROM dl d CROSS JOIN cf c
      LEFT JOIN tf t ON t.doc_id = d.doc_id AND t.term = c.term
    ), parts AS (
      SELECT g.doc_id, g.term,
             ln((g.tf + {_QL_MU} * g.cf / s.total_toks) / (g.dl + {_QL_MU}))
               AS part
      FROM grid g CROSS JOIN coll s
    ), scored AS (
      SELECT doc_id,
             round(  coalesce(SUM(CASE WHEN term = '{_BM25_TERMS[0]}' THEN part END), 0)
                   + coalesce(SUM(CASE WHEN term = '{_BM25_TERMS[1]}' THEN part END), 0)
                   + coalesce(SUM(CASE WHEN term = '{_BM25_TERMS[2]}' THEN part END), 0), 6)
               AS score
      FROM parts GROUP BY doc_id
    )
    SELECT doc_id, score, rk FROM (
      SELECT doc_id, score,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rk
      FROM scored) WHERE rk <= 10
    """,
)
def retrieval_query_likelihood(spark, sf):
    # Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty 2001)
    # — the language-model leg of lexical retrieval, next to BM25's
    # probabilistic-relevance leg: score(d) = sum over query terms of
    # ln((tf + mu*p(t|C)) / (|d| + mu)). Unlike BM25, ABSENT terms
    # still contribute (the smoothed collection probability), so the
    # score grid is docs x query-terms — built by cross-joining the
    # corpus-sized dl table with the 3-row broadcast cf table (bounded
    # side, lint rule 3) and LEFT-joining tf, never by densifying the
    # vocabulary. Collection stats are one-row broadcasts; the final
    # top-10 is TakeOrderedAndProject. Per-doc summation runs in fixed
    # term order (bm25's determinism pattern) so double addition
    # hash-matches the sequential oracle.
    d = t(spark, sf, "documents").select("doc_id", TX.tokens("text").alias("tk"))
    dl = d.select("doc_id", F.size("tk").cast("double").alias("dl"))
    coll = dl.agg(F.sum("dl").alias("total_toks"))
    toks = d.select("doc_id", F.explode("tk").alias("term")).filter(
        F.col("term").isin(*_BM25_TERMS)
    )
    cf = toks.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("cf"))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    grid = (
        dl.crossJoin(F.broadcast(cf))
        .join(tf, ["doc_id", "term"], "left")
        .select(
            "doc_id", "dl", "term", "cf", F.coalesce("tf", F.lit(0.0)).alias("tf")
        )
    )
    parts = grid.crossJoin(F.broadcast(coll)).select(
        "doc_id",
        "term",
        F.log(
            (F.col("tf") + F.lit(_QL_MU) * F.col("cf") / F.col("total_toks"))
            / (F.col("dl") + F.lit(_QL_MU))
        ).alias("part"),
    )
    per_term = [
        F.coalesce(
            F.sum(F.when(F.col("term") == term, F.col("part"))), F.lit(0.0)
        )
        for term in _BM25_TERMS
    ]
    total = per_term[0]
    for p in per_term[1:]:
        total = total + p
    scored = parts.groupBy("doc_id").agg(F.round(total, 6).alias("score"))
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)
    return bounded_rank(top, [("score", False), ("doc_id", True)], "rk")


_RM3_LAMBDA = 0.5  # original-query mass; 1-lambda goes to the feedback model
_RM3_EXP = 5       # expansion terms kept from the relevance model


def _rm3_oracle() -> str:
    from dataingestionplayground_spark.queries import REGISTRY as _R

    terms_in = str(tuple(_BM25_TERMS))
    terms_list = ", ".join(f"'{x}'" for x in _BM25_TERMS)
    return f"""
    WITH bm AS ({_R['text_bm25_topk'].oracle}),
    fbsum AS (
      SELECT CAST(SUM(CAST(score AS DECIMAL(38,6))) AS DOUBLE) AS s FROM bm
    ), base AS (
      SELECT doc_id, {TX.tokens_sql('text')} AS tk FROM documents
    ), dl AS (
      SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl FROM base
    ), fbtoks AS (
      SELECT b.doc_id, u.term
      FROM base b JOIN bm USING (doc_id), unnest(b.tk) AS u(term)
      WHERE len(u.term) >= 3
    ), fbtf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM fbtoks GROUP BY doc_id, term
    ), prm AS (
      SELECT term,
             CAST(SUM(CAST(round((t.tf / l.dl) * (f.score / s.s), 9)
                           AS DECIMAL(38,9))) AS DOUBLE) AS p_rm
      FROM fbtf t
      JOIN dl l USING (doc_id)
      JOIN bm f USING (doc_id)
      CROSS JOIN fbsum s
      GROUP BY term
    ), exp5 AS (
      SELECT term, p_rm FROM (
        SELECT term, p_rm,
               row_number() OVER (ORDER BY p_rm DESC, term ASC) AS erk
        FROM prm WHERE term NOT IN {terms_in})
      WHERE erk <= {_RM3_EXP}
    ), qterms AS (
      SELECT q.term,
             {_RM3_LAMBDA} / 3.0 + {1.0 - _RM3_LAMBDA} * coalesce(p.p_rm, 0.0) AS wt
      FROM (SELECT unnest([{terms_list}]) AS term) q
      LEFT JOIN prm p ON p.term = q.term
      UNION ALL
      SELECT term, {1.0 - _RM3_LAMBDA} * p_rm AS wt FROM exp5
    ), coll AS (
      SELECT CAST(SUM(dl) AS DOUBLE) AS total_toks FROM dl
    ), toks AS (
      SELECT b.doc_id, u.term FROM base b, unnest(b.tk) AS u(term)
      WHERE u.term IN (SELECT term FROM qterms)
    ), cf AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS cf FROM toks GROUP BY term
    ), tf2 AS (
      SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM toks GROUP BY doc_id, term
    ), grid AS (
      SELECT d.doc_id, d.dl, q.term, q.wt, c.cf, coalesce(t.tf, 0.0) AS tf
      FROM dl d
      CROSS JOIN qterms q
      JOIN cf c ON c.term = q.term
      LEFT JOIN tf2 t ON t.doc_id = d.doc_id AND t.term = q.term
    ), parts AS (
      SELECT g.doc_id,
             round(g.wt * round(ln((g.tf + {_QL_MU} * g.cf / s.total_toks)
                                   / (g.dl + {_QL_MU})), 6), 9) AS part
      FROM grid g CROSS JOIN coll s
    ), scored AS (
      SELECT doc_id,
             round(CAST(SUM(CAST(part AS DECIMAL(38,9))) AS DOUBLE), 6)
               AS rm3_score
      FROM parts GROUP BY doc_id
    )
    SELECT doc_id, rm3_score, rk FROM (
      SELECT doc_id, rm3_score,
             CAST(row_number() OVER (ORDER BY rm3_score DESC, doc_id ASC)
               AS INTEGER) AS rk
      FROM scored) WHERE rk <= 10
    """


@register("retrieval_rm3_expansion", oracle=_rm3_oracle())
def retrieval_rm3_expansion(spark, sf):
    # RM3 pseudo-relevance feedback (Lavrenko & Croft 2001 relevance
    # models, the classic query-expansion loop): (1) BM25 retrieves 10
    # feedback docs; (2) their tokens induce a relevance model
    # p(w|R) = sum_D p(w|D) * score_D / sum(score) — rank-weighted
    # maximum-likelihood term distributions; (3) the top-5 non-query
    # terms join the original query, original mass lambda = 0.5; (4)
    # the EXPANDED query re-ranks the whole corpus with Dirichlet QL
    # scoring. Scale shapes: the feedback side is 10-docs-bounded
    # (every prm/expansion table broadcasts), the corpus-side rescan
    # filters tokens against the 8-row expanded-term broadcast before
    # any agg, and the docs x 8 grid is the lint-safe bounded
    # cross-join the QL query already uses. Determinism with a
    # DATA-DEPENDENT term set: per-(doc, term) parts are rounded then
    # DECIMAL(38,9)-summed, so no fixed-order case-sum is needed —
    # the discipline that lets the term list come from the data.
    d = t(spark, sf, "documents").select("doc_id", TX.tokens("text").alias("tk"))
    dl = d.select("doc_id", F.size("tk").cast("double").alias("dl"))
    fb = text_bm25_topk(spark, sf).select("doc_id", "score")
    fbsum = fb.agg(
        F.sum(F.col("score").cast("decimal(38,6)")).cast("double").alias("s")
    )
    fbtoks = (
        d.join(F.broadcast(fb.select("doc_id")), "doc_id")
        .select("doc_id", F.explode("tk").alias("term"))
        .filter(F.length("term") >= 3)
    )
    fbtf = fbtoks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    prm = (
        fbtf.join(F.broadcast(dl), "doc_id")
        .join(F.broadcast(fb), "doc_id")
        .crossJoin(F.broadcast(fbsum))
        .groupBy("term")
        .agg(
            F.sum(
                F.round(
                    (F.col("tf") / F.col("dl")) * (F.col("score") / F.col("s")), 9
                ).cast("decimal(38,9)")
            )
            .cast("double")
            .alias("p_rm")
        )
    )
    exp5 = bounded_rank(
        prm.filter(~F.col("term").isin(*_BM25_TERMS))
        .orderBy(F.desc("p_rm"), F.asc("term"))
        .limit(_RM3_EXP),
        [("p_rm", False), ("term", True)],
        "erk",
    ).drop("erk")
    orig = spark.createDataFrame([(x,) for x in _BM25_TERMS], "term string")
    qterms = (
        orig.join(prm, "term", "left")
        .select(
            "term",
            (
                F.lit(_RM3_LAMBDA / 3.0)
                + F.lit(1.0 - _RM3_LAMBDA) * F.coalesce("p_rm", F.lit(0.0))
            ).alias("wt"),
        )
        .unionByName(
            exp5.select(
                "term", (F.lit(1.0 - _RM3_LAMBDA) * F.col("p_rm")).alias("wt")
            )
        )
    )
    coll = dl.agg(F.sum("dl").alias("total_toks"))
    toks = d.select("doc_id", F.explode("tk").alias("term")).join(
        F.broadcast(qterms.select("term")), "term"
    )
    cf = toks.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("cf"))
    tf2 = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    grid = (
        dl.crossJoin(F.broadcast(qterms))
        .join(F.broadcast(cf), "term")
        .join(tf2, ["doc_id", "term"], "left")
        .select(
            "doc_id", "dl", "term", "wt", "cf",
            F.coalesce("tf", F.lit(0.0)).alias("tf"),
        )
    )
    parts = grid.crossJoin(F.broadcast(coll)).select(
        "doc_id",
        F.round(
            F.col("wt")
            * F.round(
                F.log(
                    (F.col("tf") + F.lit(_QL_MU) * F.col("cf") / F.col("total_toks"))
                    / (F.col("dl") + F.lit(_QL_MU))
                ),
                6,
            ),
            9,
        ).alias("part"),
    )
    scored = parts.groupBy("doc_id").agg(
        F.round(
            F.sum(F.col("part").cast("decimal(38,9)")).cast("double"), 6
        ).alias("rm3_score")
    )
    top = scored.orderBy(F.desc("rm3_score"), F.asc("doc_id")).limit(10)
    return bounded_rank(top, [("rm3_score", False), ("doc_id", True)], "rk")


def _mrr_oracle() -> str:
    # compose the REGISTERED BM25 oracle (the ann_recall_eval rule: the
    # eval must grade the production ranking, never a re-implementation)
    from dataingestionplayground_spark.queries import REGISTRY as _R

    terms_list = "[" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + "]"
    return f"""
    WITH top AS MATERIALIZED (
      SELECT doc_id, rk FROM ({_R['text_bm25_topk'].oracle})
    ), rel AS MATERIALIZED (
      SELECT doc_id,
             CAST(len(list_intersect(list_distinct({TX.tokens_sql('text')}),
                                     {terms_list})) AS BIGINT) AS rel
      FROM documents
    ), j AS (
      SELECT t.rk, r.rel FROM top t JOIN rel r USING (doc_id)
    ), hits AS (
      SELECT CAST(coalesce(MIN(CASE WHEN rel > 0 THEN rk END), 0) AS INTEGER)
               AS first_rel_rank,
             CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_top,
             CAST(MAX(CASE WHEN rk = 1 AND rel > 0 THEN 1 ELSE 0 END) AS INTEGER)
               AS hit_at_1
      FROM j
    ), nrel AS (
      SELECT CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_relevant
      FROM rel
    )
    SELECT h.first_rel_rank,
           round(CASE WHEN h.first_rel_rank > 0
                      THEN 1.0 / CAST(h.first_rel_rank AS DOUBLE)
                      ELSE 0.0 END, 6) AS mrr,
           h.hit_at_1, h.n_rel_top, n.n_relevant,
           round(CAST(h.n_rel_top AS DOUBLE)
                 / nullif(CAST(n.n_relevant AS DOUBLE), 0.0), 6) AS recall_at_10
    FROM hits h CROSS JOIN nrel n
    """


@register("retrieval_mrr_recall", oracle=_mrr_oracle())
def retrieval_mrr_recall(spark, sf):
    # The binary-relevance side of the eval harness next to
    # retrieval_eval_ndcg: MRR (reciprocal rank of the first relevant
    # hit), hit@1, and recall@10 over the PRODUCTION BM25 top-10 (same
    # registered function), with relevance = "contains any query term"
    # (rel > 0 binarizes the ndcg eval's graded label, Voorhees 1999's
    # TREC convention). Scale shape: the ranking is k-bounded (<= 10
    # rows) so the eval joins/aggs after BM25's own plan are
    # broadcast-trivial; n_relevant is ONE corpus agg over an in-row
    # token intersection.
    top = text_bm25_topk(spark, sf).select("doc_id", "rk")
    d = t(spark, sf, "documents").select("doc_id", TX.tokens("text").alias("tk"))
    terms_arr = F.array(*[F.lit(x) for x in _BM25_TERMS])
    rel = d.select(
        "doc_id",
        F.size(F.array_intersect(F.array_distinct("tk"), terms_arr))
        .cast("long")
        .alias("rel"),
    )
    j = top.join(rel, "doc_id")
    hits = j.agg(
        F.coalesce(
            F.min(F.when(F.col("rel") > 0, F.col("rk"))), F.lit(0)
        ).cast("int").alias("first_rel_rank"),
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).cast("long").alias("n_rel_top"),
        F.max(
            F.when((F.col("rk") == 1) & (F.col("rel") > 0), 1).otherwise(0)
        ).cast("int").alias("hit_at_1"),
    )
    nrel = rel.agg(
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).cast("long").alias("n_relevant")
    )
    return hits.crossJoin(F.broadcast(nrel)).select(
        "first_rel_rank",
        F.round(
            F.when(
                F.col("first_rel_rank") > 0,
                F.lit(1.0) / F.col("first_rel_rank").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("mrr"),
        "hit_at_1",
        "n_rel_top",
        "n_relevant",
        F.round(
            F.col("n_rel_top").cast("double")
            / F.nullif(F.col("n_relevant").cast("double"), F.lit(0.0)),
            6,
        ).alias("recall_at_10"),
    )


def _retriever_agreement_oracle() -> str:
    from dataingestionplayground_spark.queries import REGISTRY as _R

    return f"""
    WITH bm AS MATERIALIZED (
      SELECT doc_id, rk AS rk_bm25 FROM ({_R['text_bm25_topk'].oracle})
    ), ql AS MATERIALIZED (
      SELECT doc_id, rk AS rk_ql FROM ({_R['retrieval_query_likelihood'].oracle})
    ), j AS (
      SELECT coalesce(bm.doc_id, ql.doc_id) AS doc_id, rk_bm25, rk_ql
      FROM bm FULL OUTER JOIN ql ON ql.doc_id = bm.doc_id
    )
    SELECT CAST(SUM(CASE WHEN rk_bm25 IS NOT NULL AND rk_ql IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
           round(CAST(SUM(CASE WHEN rk_bm25 IS NOT NULL AND rk_ql IS NOT NULL
                               THEN 1 ELSE 0 END) AS DOUBLE) / 10.0, 6)
             AS overlap_at_10,
           CAST(coalesce(SUM(CASE WHEN rk_bm25 IS NOT NULL AND rk_ql IS NOT NULL
                             THEN abs(rk_bm25 - rk_ql) END), 0) AS BIGINT)
             AS total_rank_displacement,
           CAST(MAX(CASE WHEN rk_bm25 = 1 AND rk_ql = 1 THEN 1 ELSE 0 END)
                AS INTEGER) AS same_top1
    FROM j
    """


@register("retrieval_bm25_ql_agreement", oracle=_retriever_agreement_oracle())
def retrieval_bm25_ql_agreement(spark, sf):
    # RETRIEVER-AGREEMENT diagnostic: overlap@10, total rank
    # displacement on the shared docs, and top-1 agreement between the
    # two production lexical retrievers (BM25 and Dirichlet query
    # likelihood, composed registered queries). High agreement means
    # RRF fusion adds little over either alone; low agreement is the
    # signal fusion earns its second scan — the decision
    # retrieval_hybrid_rrf's cost rests on, made queryable. Both
    # inputs are k-bounded (<= 10 rows each), so everything after the
    # member plans is broadcast-trivial.
    from dataingestionplayground_spark.queries import REGISTRY as _R

    bm = (
        _R["text_bm25_topk"].fn(spark, sf)
        .select("doc_id", F.col("rk").alias("rk_bm25"))
    )
    ql = (
        _R["retrieval_query_likelihood"].fn(spark, sf)
        .select("doc_id", F.col("rk").alias("rk_ql"))
    )
    j = bm.join(ql, "doc_id", "full")
    both = F.col("rk_bm25").isNotNull() & F.col("rk_ql").isNotNull()
    return j.agg(
        F.sum(F.when(both, 1).otherwise(0)).cast("long").alias("n_overlap"),
        F.round(
            F.sum(F.when(both, 1).otherwise(0)).cast("double") / F.lit(10.0), 6
        ).alias("overlap_at_10"),
        F.coalesce(
            F.sum(F.when(both, F.abs(F.col("rk_bm25") - F.col("rk_ql")))),
            F.lit(0),
        ).cast("long").alias("total_rank_displacement"),
        F.max(
            F.when((F.col("rk_bm25") == 1) & (F.col("rk_ql") == 1), 1).otherwise(0)
        ).cast("int").alias("same_top1"),
    )


def _tfidf_cosine_oracle() -> str:
    terms = _BM25_TERMS
    cases = " + ".join(
        f"coalesce(SUM(CASE WHEN term = '{tm}' THEN num_part END), 0)"
        for tm in terms
    )
    qn = " + ".join(
        f"coalesce(SUM(CASE WHEN term = '{tm}'"
        f" THEN CAST(round(idf * idf, 6) AS DECIMAL(38,6)) END), 0)"
        for tm in terms
    )
    return f"""
    WITH base AS (
      SELECT doc_id, {TX.tokens_sql('text')} AS tk FROM documents
    ), n AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM base
    ), tf AS (
      SELECT doc_id, u.term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM base b, unnest(b.tk) AS u(term) GROUP BY doc_id, u.term
    ), dfreq AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
    ), w AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * (ln((1.0 + n.n_docs) / (1.0 + d.df)) + 1.0) AS w,
             ln((1.0 + n.n_docs) / (1.0 + d.df)) + 1.0 AS idf
      FROM tf JOIN dfreq d USING (term) CROSS JOIN n
    ), norms AS (
      SELECT doc_id,
             sqrt(CAST(SUM(CAST(round(w * w, 6) AS DECIMAL(38,6))) AS DOUBLE))
               AS dnorm
      FROM w GROUP BY doc_id
    ), qnorm AS (
      SELECT sqrt(CAST({qn} AS DOUBLE)) AS qnorm
      FROM (SELECT DISTINCT term, idf FROM w
            WHERE term IN {str(tuple(terms))})
    ), nums AS (
      SELECT doc_id, CAST({cases} AS DOUBLE) AS num FROM (
        SELECT doc_id, term, w * idf AS num_part FROM w
        WHERE term IN {str(tuple(terms))}
      ) GROUP BY doc_id
    ), scored AS (
      SELECT nm.doc_id,
             round(nm.num / nullif(no.dnorm * q.qnorm, 0.0), 6) AS score
      FROM nums nm JOIN norms no USING (doc_id) CROSS JOIN qnorm q
    )
    SELECT doc_id, score, rk FROM (
      SELECT doc_id, score,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rk
      FROM scored) WHERE rk <= 10
    """


@register("retrieval_tfidf_cosine", oracle=_tfidf_cosine_oracle())
def retrieval_tfidf_cosine(spark, sf):
    # Vector-space-model retrieval (Salton tf-idf cosine) for the fixed
    # 3-term query — the classic lexical leg next to text_bm25_topk
    # (probabilistic) and retrieval_query_likelihood (LM). Unlike BM25,
    # cosine needs each document's FULL-vocabulary tf-idf norm, so the
    # plan has one extra corpus-shaped stage: (doc, term) tf agg ->
    # vocab-keyed df join (NOT broadcast: vocabulary scales with the
    # corpus; it is a plain shuffle join on a high-cardinality key) ->
    # per-doc norm agg. Portability: per-term w^2 is 6dp-rounded into
    # DECIMAL(38,6) before the per-doc sum (order-free), the query-side
    # numerator folds in FIXED term order via conditional sums (<= 1 row
    # per term per doc), sqrt/division are single IEEE ops, score 6dp.
    # idf is the sklearn smooth variant ln((1+N)/(1+df)) + 1 (> 0, so no
    # zero-weight degeneracies). Top-10 via TakeOrdered + bounded rank.
    terms = _BM25_TERMS
    base = t(spark, sf, "documents").select(
        "doc_id", TX.tokens("text").alias("tk")
    )
    n = base.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    # r16 (optimization): the full-vocab w frame (tf ⋈ df) previously fed
    # THREE consumers (norms, qnorm, nums), so the token explode and the
    # vocab-keyed join each ran ~3x. Materialize tf once ((doc, term)
    # grain — the smallest frame everything derives from), run the
    # corpus-shaped join ONCE for the norm stage, and build the
    # query-term legs from tf/df FILTERED to the 3 fixed terms (a
    # broadcast join over <= 3 x |docs| rows) — the same rows the old
    # post-join filter kept, with identical expressions.
    tf = (
        base.select("doc_id", F.explode("tk").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)
    w = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", (F.col("tf") * idf).alias("w"), idf.alias("idf"))
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(
            F.sum(F.round(F.col("w") * F.col("w"), 6).cast("decimal(38,6)"))
            .cast("double")
        ).alias("dnorm")
    )
    qterms = (
        tf.filter(F.col("term").isin(*terms))
        .join(F.broadcast(dfreq.filter(F.col("term").isin(*terms))), "term")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", (F.col("tf") * idf).alias("w"), idf.alias("idf"))
    )
    qn_parts = [
        F.coalesce(
            F.sum(
                F.when(
                    F.col("term") == tm,
                    F.round(F.col("idf") * F.col("idf"), 6).cast("decimal(38,6)"),
                )
            ),
            F.lit(0).cast("decimal(38,6)"),
        )
        for tm in terms
    ]
    qn_total = qn_parts[0]
    for p in qn_parts[1:]:
        qn_total = qn_total + p
    qnorm = (
        qterms.select("term", "idf")
        .distinct()
        .agg(F.sqrt(qn_total.cast("double")).alias("qnorm"))
    )
    num_parts = [
        F.coalesce(
            F.sum(F.when(F.col("term") == tm, F.col("w") * F.col("idf"))),
            F.lit(0.0),
        )
        for tm in terms
    ]
    num_total = num_parts[0]
    for p in num_parts[1:]:
        num_total = num_total + p
    nums = qterms.groupBy("doc_id").agg(num_total.cast("double").alias("num"))
    scored = (
        nums.join(norms, "doc_id")
        .crossJoin(F.broadcast(qnorm))
        .select(
            "doc_id",
            F.round(
                F.col("num")
                / F.nullif(F.col("dnorm") * F.col("qnorm"), F.lit(0.0)),
                6,
            ).alias("score"),
        )
    )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)
    return bounded_rank(top, [("score", False), ("doc_id", True)], "rk")
