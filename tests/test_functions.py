"""Unit tests for the column-expression library (functions/*)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dataingestionplayground_spark.functions import text as TX
from dataingestionplayground_spark.functions.portable import davg, dsum
from dataingestionplayground_spark.functions.vector import cosine_similarity, l2_norm, normalize


def test_tokens_and_counts(spark):
    df = spark.createDataFrame([("  a  b\tc\nd  ",), ("",), ("single",)], "t string")
    rows = df.select(TX.tokens("t").alias("w"), TX.token_count("t").alias("n")).collect()
    assert rows[0].w == ["a", "b", "c", "d"] and rows[0].n == 4
    assert rows[1].w == [] and rows[1].n == 0
    assert rows[2].n == 1


def test_bpe_token_count(spark):
    df = spark.createDataFrame([("hello world42, ok!",)], "t string")
    n = df.select(TX.bpe_token_count("t").alias("n")).collect()[0].n
    # hello | world | 42 | , | ok | !
    assert n == 6


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "t string")
    rows = df.select(TX.word_shingles("t", 3).alias("s")).collect()
    assert rows[0].s == ["a b c", "b c d"]
    assert rows[1].s == []  # shorter than n -> empty, not sequence(1,0)


def test_char_shingles(spark):
    df = spark.createDataFrame([("abcdef",), ("ab",)], "t string")
    rows = df.select(TX.char_shingles("t", 4).alias("s")).collect()
    assert rows[0].s == ["abcd", "bcde", "cdef"]
    assert rows[1].s == []


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame([("Hello   World",), ("hello world",)], "t string")
    fps = [r.f for r in df.select(TX.fingerprint("t").alias("f")).collect()]
    assert fps[0] == fps[1]  # case + whitespace insensitive
    assert len(fps[0]) == 32


def test_stopword_hits(spark):
    df = spark.createDataFrame([("the cat and the dog",)], "t string")
    n = df.select(TX.stopword_hits("t", "en").alias("n")).collect()[0].n
    assert n == 3  # the, and, the


def test_dsum_davg_exactness(spark):
    # shuffle-order independence: same values, different partitioning
    vals = [(float(i) * 0.1,) for i in range(1, 1001)]
    a = spark.createDataFrame(vals, "x double").repartition(1)
    b = spark.createDataFrame(vals, "x double").repartition(16)
    sa = a.agg(dsum("x").alias("s"), davg("x").alias("m")).collect()[0]
    sb = b.agg(dsum("x").alias("s"), davg("x").alias("m")).collect()[0]
    assert sa.s == sb.s and sa.m == sb.m
    assert sa.s == 50050.0  # exact: sum(i)/10 for 1..1000


def test_cosine_and_norm(spark):
    df = spark.createDataFrame(
        [([3.0, 4.0], [3.0, 4.0]), ([1.0, 0.0], [0.0, 1.0]), ([0.0, 0.0], [1.0, 1.0])],
        "a array<float>, b array<float>",
    )
    rows = df.select(
        cosine_similarity("a", "b").alias("cos"), l2_norm("a").alias("na")
    ).collect()
    assert abs(rows[0].cos - 1.0) < 1e-12 and rows[0].na == 5.0
    assert abs(rows[1].cos) < 1e-12
    assert rows[2].cos is None  # zero vector -> NULL, not DIVIDE_BY_ZERO


def test_normalize_unit_length(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], "a array<float>")
    out = df.select(normalize("a").alias("u")).collect()[0].u
    assert abs(math.hypot(*out) - 1.0) < 1e-6
    assert abs(out[0] - 0.6) < 1e-6


def test_approx_distinct_error_bound(spark):
    # the one rows-only registry query: make its check meaningful by
    # bounding the HLL++ estimate against DuckDB's exact COUNT(DISTINCT)
    # (default rsd = 5%; assert a loose 3-sigma-ish 15% envelope) and the
    # approx median against the exact percentile neighborhood.
    import duckdb

    from dataingestionplayground_spark.queries import all_queries

    sf = "/root/testdata/sf0.01"
    got = {
        r.l_returnflag: (r.approx_orders, r.approx_p50)
        for r in all_queries()["agg_approx_distinct"].fn(spark, sf).collect()
    }
    con = duckdb.connect()
    exact = {
        flag: (n, p50)
        for flag, n, p50 in con.execute(
            f"""
            SELECT l_returnflag, COUNT(DISTINCT l_orderkey),
                   quantile_cont(l_extendedprice, 0.5)
            FROM read_parquet('{sf}/lineitem.parquet') GROUP BY l_returnflag
            """
        ).fetchall()
    }
    assert set(got) == set(exact)
    for flag, (n_exact, p50_exact) in exact.items():
        n_approx, p50_approx = got[flag]
        assert abs(n_approx - n_exact) <= 0.15 * n_exact, (flag, n_approx, n_exact)
        assert abs(p50_approx - p50_exact) <= 0.10 * p50_exact, (flag, p50_approx, p50_exact)


def test_language_id_on_real_sentences(spark):
    """The stopword classifier must identify genuine short sentences in
    its supported European languages (zh is latinized-pinyin-profile
    only — excluded from the golden set)."""
    from pyspark.sql import functions as F

    from dataingestionplayground_spark.queries.textq import _PRED_CASE, _lang_score_cols

    samples = [
        ("en", "the quick brown fox jumps over the lazy dog and runs away from the farm"),
        ("en", "this is a simple sentence that should be classified as english with ease"),
        ("es", "el perro corre por la calle y salta sobre la mesa porque quiere comer algo"),
        ("es", "la casa es muy grande y tiene un jardin con flores de muchos colores"),
        ("fr", "le chien court dans la rue et il saute sur la table pour manger quelque chose"),
        ("fr", "la maison est tres grande et elle a un jardin avec des fleurs magnifiques"),
        ("de", "der Hund läuft auf der Straße und er springt über den Tisch und das ist gut"),
        ("de", "das Haus ist sehr groß und es hat einen Garten mit vielen schönen Blumen"),
    ]
    df = spark.createDataFrame(samples, "lang string, text string").select(
        "lang", "text", *_lang_score_cols()
    )
    rows = df.select("lang", F.expr(_PRED_CASE).alias("pred")).collect()
    correct = sum(1 for r in rows if r.lang == r.pred)
    assert correct == len(samples), [(r.lang, r.pred) for r in rows]


def test_text_functions_survive_unicode_extremes(spark):
    """Emoji, CJK, RTL, combining marks, and whitespace-only input must
    flow through tokenization, fingerprinting, shingling, and the
    quality expression without errors or NULL poisoning."""
    from pyspark.sql import functions as F

    from dataingestionplayground_spark.functions import text as TX
    from dataingestionplayground_spark.queries.textq import quality_scores

    rows = [
        (1, "Hello 👋 world 🌍 this has emoji", "en", "s", 31),
        (2, "这是一个中文句子 没有空格的部分也在这里", "zh", "s", 20),
        (3, "مرحبا بالعالم هذه جملة عربية", "ar", "s", 28),
        (4, "étude française déjà vu", "fr", "s", 25),
        (5, "   \t\n  ", "en", "s", 7),
        (6, "", "en", "s", 0),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    got = d.select(
        "doc_id",
        TX.token_count("text").alias("n_toks"),
        TX.fingerprint("text").alias("fp"),
        F.size(TX.word_shingles("text", 2)).alias("n_shingles"),
    ).collect()
    by_id = {r.doc_id: r for r in got}
    assert by_id[1].n_toks == 7  # emoji are tokens, not errors
    assert by_id[2].n_toks == 2  # CJK splits on spaces only
    assert by_id[3].n_toks == 5
    assert by_id[5].n_toks == 0 and by_id[5].n_shingles == 0
    assert all(len(r.fp) == 32 for r in got)  # md5 always produced
    # quality flows (docs with zero tokens are filtered, never divide-by-zero)
    q = quality_scores(d).collect()
    assert {r.doc_id for r in q} == {1, 2, 3, 4}
    assert all(r.quality is not None for r in q)


def test_gopher_quality_rules_crafted_docs(spark, tmp_path):
    """Exercise every Gopher-rule branch the synthetic corpus never
    hits: bullet-started lines, ellipsis-ended lines, symbol-heavy
    text, short docs, and long-word gibberish — with hand-computed
    expected values (the oracle gate only proves Spark==DuckDB; this
    pins Spark==intent)."""
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    docs = [
        # 11 clean words, 47 chars total -> mean len 47/11 ~ 4.27 -> keep
        (1, "good clean prose text here that reads fine and looks real", "en", "s", 0),
        # every line is a bullet -> bullet_line_frac = 1.0 -> drop
        (2, "- one two three\n- four five six\n- seven eight nine ten eleven", "en", "s", 0),
        # both lines end with '...' -> ellipsis_line_frac = 1.0 -> drop
        (3, "this trails off into nothing at all...\nand so does this line too...", "en", "s", 0),
        # '#'-spam: 12 words, 13 hashes -> symbol_to_word > 1 -> drop
        (4, "### ## heading spam ## ### with many markdown hash marks all over here", "en", "s", 0),
        # 5 words -> below the 10-word floor -> drop
        (5, "way too short to keep", "en", "s", 0),
        # 11 'words' of length 22 -> mean_word_len > 10 -> drop
        (6, " ".join(["a" * 22] * 11), "en", "s", 0),
        # numeric tokens: 12 words, only 2 alphabetic -> alpha ratio < 0.8 -> drop
        (7, "1 2 3 4 5 6 7 8 9 10 eleven twelve", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in E.queries()["text_gopher_quality_rules"](spark, str(tmp_path)).collect()
    }
    assert rows[1]["keep"] is True
    assert rows[1]["mean_word_len"] == round(47 / 11, 6)
    assert rows[2]["keep"] is False and rows[2]["bullet_line_frac"] == 1.0
    assert rows[3]["keep"] is False and rows[3]["ellipsis_line_frac"] == 1.0
    assert rows[4]["keep"] is False and rows[4]["symbol_to_word"] > 0.1
    assert rows[5]["keep"] is False and rows[5]["n_words"] == 5
    assert rows[6]["keep"] is False and rows[6]["mean_word_len"] == 22.0
    assert rows[7]["keep"] is False and rows[7]["alpha_word_ratio"] < 0.8


def test_dsir_importance_prefers_target_tokens(spark, tmp_path):
    """Docs made of target-corpus-only tokens must out-rank docs made
    of source-only tokens (the entire point of importance resampling),
    and the integer scores must be identical for identical docs."""
    import __spark_entry__ as E

    target = [(i, "alpha beta gamma delta epsilon", "en", f"src{i % 3}", 0) for i in range(30)]
    other = [(100 + i, "zeta eta theta iota kappa", "en", f"src{3 + i % 3}", 0) for i in range(30)]
    probe = [
        (900, "alpha beta gamma delta epsilon", "en", "src9", 0),  # target-like
        (901, "zeta eta theta iota kappa", "en", "src9", 0),  # source-like
    ]
    df = spark.createDataFrame(
        target + other + probe,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in E.queries()["sample_dsir_importance"](spark, str(tmp_path)).collect()
    }
    assert rows[900]["importance"] > rows[901]["importance"]
    assert rows[900]["keep"] is True and rows[901]["keep"] is False
    # identical text -> identical integer score (pure function of corpus)
    assert rows[900]["importance"] == rows[0]["importance"]
