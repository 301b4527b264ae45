"""Deduplication operators for large-scale training-data pipelines.

Four families, all shuffle-conscious:

* **exact**: fingerprint (md5 of normalized text) + min-id-per-group.
  One shuffle on the fingerprint; partial aggregation applies.
* **MinHash + LSH**: shingle -> k portable min-hashes -> band -> bucket
  equi-join. The candidate join is an equi-join on (band, key): at 100 TB
  this is the standard near-dup pipeline (the band join shuffles only
  signature rows, ~k strings per doc, not document text).
* **SimHash**: 63-bit sign-aggregated fingerprint; near-dups = small
  Hamming distance (checked on candidate pairs).
* **n-gram Jaccard**: exact pairwise similarity via shingle-equi-join +
  group count — the verification stage after LSH candidate generation.

Hashing is *portable* (md5-based, no engine-specific hash) so every stage
is reproducible in the DuckDB correctness oracle and across engine
versions — a property Spark's ``hash()``/``xxhash64()`` does not give.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataingestionplayground_spark.functions import text as TX


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the lowest-id row per exact (normalized) text fingerprint.

    Returns (fingerprint, keep_id, n_dups). Equivalent of the reference's
    incremental-ingestion dedup intent (``VectorStoreCommands.cs:159``)
    done set-wide: one hash-shuffle, map-side partial agg.
    """
    return (
        df.select(TX.fingerprint(text_col).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def _shingle_rows(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle) distinct rows — the unit of MinHash/Jaccard work."""
    return (
        df.select(F.col(id_col), F.explode(TX.word_shingles(text_col, n)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 8, shingle_n: int = 3
) -> DataFrame:
    """MinHash signature rows (id, h, minhash).

    Hash family h_i(s) = md5(i || ':' || s); the minimum is taken over the
    *hex string* (fixed width, so lexicographic order == numeric order).
    Fully portable across engines.
    """
    shingles = _shingle_rows(df, id_col, text_col, shingle_n)
    hashed = shingles.select(
        id_col,
        F.explode(F.expr(f"sequence(0, {num_hashes - 1})")).alias("h"),
        F.col("shingle"),
    ).select(
        id_col, "h", F.md5(F.concat_ws(":", F.col("h"), F.col("shingle"))).alias("hv")
    )
    return hashed.groupBy(id_col, "h").agg(F.min("hv").alias("minhash"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    Signature -> bands of ``rows_per_band`` hashes -> band-key equi-join.
    The only shuffle over pairs is on (band, band_key) — skew-safe because
    identical band keys mean near-identical docs (AQE skew-join splits the
    rare hot bucket).
    """
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    bands = (
        sig.withColumn("band", (F.col("h") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.expr("concat_ws('|', transform(array_sort(collect_list(struct(h, minhash))), s -> s.minhash))").alias(
                "band_key"
            )
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 63) -> DataFrame:
    """63-bit SimHash per document (positive BIGINT; portable md5 bit source).

    Token t contributes +1/-1 to each bit position according to bit b of
    md5(t); the sign of the per-bit sum becomes the fingerprint bit.
    Implemented as explode(tokens) x explode(bits) -> two-level hash agg —
    pure shuffle-and-count, scales with corpus token count.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(TX.tokens(text_col))).alias("tok")
    )
    # bit b of the 64-bit prefix of md5: hex digit b//4, bit 3-(b%4).
    contrib = toks.select(
        id_col,
        F.explode(F.expr(f"sequence(0, {bits - 1})")).alias("b"),
        F.md5("tok").alias("hx"),
    ).select(
        id_col,
        "b",
        F.expr(
            "CASE WHEN shiftright(instr('0123456789abcdef', substring(hx, (b div 4) + 1, 1)) - 1, "
            "3 - (b % 4)) % 2 = 1 THEN 1 ELSE -1 END"
        ).alias("sign"),
    )
    per_bit = contrib.groupBy(id_col, "b").agg(F.sum("sign").alias("s"))
    return per_bit.groupBy(id_col).agg(
        F.expr(
            "sum(case when s > 0 then shiftleft(cast(1 as bigint), b) else cast(0 as bigint) end)"
        ).alias("simhash")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.2,
    block_col: str | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard similarity for pairs sharing >=1 shingle.

    |A∩B| via shingle equi-join, |A∪B| = |A|+|B|-|A∩B|. ``block_col``
    optionally restricts pairs to a blocking key (e.g. same source) to
    bound the candidate space — at scale you run this *after* LSH.
    Jaccard is a ratio of exact integers -> portable across engines.
    """
    sh = _shingle_rows(df, id_col, text_col, shingle_n)
    if block_col is not None:
        blocks = df.select(F.col(id_col), F.col(block_col))
        sh = sh.join(blocks, id_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    cond = (F.col("a.shingle") == F.col("b.shingle")) & (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    if block_col is not None:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    inter = (
        a.join(b, cond)
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )
