"""Reusable DataFrame-level operators.

Each operator is a pure function DataFrame -> DataFrame built from
Catalyst-native primitives (joins/windows/higher-order functions), so
plans stay declarative and the optimizer keeps pushdown/pruning/AQE.
"""

from dataingestionplayground_spark.operators.dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
    ngram_jaccard_pairs,
)
from dataingestionplayground_spark.operators.similarity import ivf_ann, knn_brute_force, lsh_bucket_ann
from dataingestionplayground_spark.operators.asof import asof_join, range_join
from dataingestionplayground_spark.operators.sessionize import sessionize
from dataingestionplayground_spark.operators.graph import connected_components, dedup_clusters
from dataingestionplayground_spark.operators.skew import (
    salted_agg,
    salted_skew_join,
    write_bucketed,
    bucketed_join,
)

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "ngram_jaccard_pairs",
    "knn_brute_force",
    "lsh_bucket_ann",
    "ivf_ann",
    "asof_join",
    "range_join",
    "sessionize",
    "connected_components",
    "dedup_clusters",
    "salted_agg",
    "salted_skew_join",
    "write_bucketed",
    "bucketed_join",
]
