"""Partitioning-invariance: the engine's core determinism claim, tested.

Every float aggregate routes through DECIMAL(38,6) and every ranking
carries a total-order tie-break precisely so that results are identical
under ANY physical partitioning. This suite runs representative
float-heavy / ranking-heavy queries under three different shuffle
partition counts (changing partial-aggregation grouping and merge
order) and asserts bit-identical stringified results — the property the
DuckDB hash-match gate silently relies on, made explicit.
"""

from __future__ import annotations

import pytest

from dataingestionplayground_spark.queries import all_queries

SF = "/root/testdata/sf0.001"

# float sums/means, trained centroids, log sums, window ranks — the
# shapes that WOULD drift under reordering if the routing were wrong
QUERIES = [
    "agg_pricing_summary",
    "agg_variance_moments",
    "events_anomaly_zscore",
    "text_unigram_perplexity",
    "vector_ivf_kmeans",
    "vector_pq_kmeans_encode",
    "sample_temperature_mix",
    "window_topk_per_group",
]


def _canon(df):
    rows = [tuple(str(v) for v in r) for r in df.collect()]
    return sorted(rows)


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_under_shuffle_partitioning(spark, name):
    q = all_queries()[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for parts in ("2", "7", "29"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            results.append(_canon(q.fn(spark, SF)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert results[0] == results[1] == results[2]
    assert len(results[0]) > 0
