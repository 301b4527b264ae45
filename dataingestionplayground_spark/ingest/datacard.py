"""Dataset cards: the JSON summary that ships with a curated corpus —
what's in it, where it came from, how clean it is. Every number comes
from the same oracle-verified expressions the registry queries use
(token counts, quality scores, exact-dup fingerprints), aggregated in
one pass per section.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataingestionplayground_spark.functions import text as TX

DATACARD_NAME = "_DATACARD.json"


def build_datacard(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> dict:
    """Summarize a (id, text[, source][, lang]) corpus: sizes, token
    totals, quality quartiles, per-source/per-lang distribution, and the
    exact-duplicate rate. Four aggregation jobs total, each a single
    map-side-combinable pass — the same cost class at any corpus size.
    """
    has_source = "source" in docs.columns
    has_lang = "lang" in docs.columns

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        *([F.col("source")] if has_source else []),
        *([F.col("lang")] if has_lang else []),
    ).withColumn("n_toks", TX.token_count("text").cast("long"))

    totals = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
        F.min("n_toks").cast("long").alias("min_tokens"),
        F.max("n_toks").cast("long").alias("max_tokens"),
        F.expr("percentile(n_toks, 0.5)").alias("median_tokens"),
        F.countDistinct(TX.fingerprint("text")).cast("long").alias("n_unique_texts"),
    ).collect()[0]

    scored = base.filter(F.col("n_toks") > 0).withColumn(
        "n_chars", F.length("text")
    )
    from dataingestionplayground_spark.queries.textq import quality_scores

    q = quality_scores(scored).agg(
        F.round(F.expr("percentile(quality, 0.25)"), 6).alias("q25"),
        F.round(F.expr("percentile(quality, 0.5)"), 6).alias("q50"),
        F.round(F.expr("percentile(quality, 0.75)"), 6).alias("q75"),
    ).collect()[0]

    card = {
        "n_docs": totals["n_docs"],
        "total_tokens": totals["total_tokens"],
        "tokens": {
            "min": totals["min_tokens"],
            "median": totals["median_tokens"],
            "max": totals["max_tokens"],
        },
        "quality_quartiles": {"q25": q["q25"], "q50": q["q50"], "q75": q["q75"]},
        "exact_duplicate_rate": round(
            1.0 - totals["n_unique_texts"] / totals["n_docs"], 6
        )
        if totals["n_docs"]
        else 0.0,
    }
    if has_source:
        card["by_source"] = {
            r["source"]: r["n"]
            for r in base.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        }
    if has_lang:
        card["by_lang"] = {
            r["lang"]: r["n"]
            for r in base.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        }
    return card


def write_datacard(docs: DataFrame, path: str, **kwargs) -> dict:
    card = build_datacard(docs, **kwargs)
    with open(os.path.join(path, DATACARD_NAME), "w") as f:
        json.dump(card, f, indent=2, sort_keys=True)
    return card
