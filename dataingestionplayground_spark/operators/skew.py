"""Skew mitigation: salted two-phase aggregation and bucketed co-located
joins.

AQE handles most skew automatically (skew-join splitting, runtime
coalescing — enabled in session.get_spark). These operators cover the
cases AQE cannot: a heavy-hitter groupBy key whose *aggregation state*
(not join partition) explodes, and repeated large joins on the same key
where the shuffle itself should be eliminated.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# agg spec -> (partial fn, final fn): every entry is algebraic, so the
# two-phase rewrite is exact.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt: groupBy(keys+salt)
    partial -> groupBy(keys) final.

    Use when one group dominates (power-law keys): phase 1 spreads the hot
    group over ``salt_buckets`` reducers, phase 2 combines the tiny
    partials. ``aggs`` maps column -> one of sum|count|min|max (algebraic,
    so the rewrite is exact — the same reason Spark's own partial
    aggregation is exact).
    """
    for col, kind in aggs.items():
        if kind not in _ALGEBRAIC:
            raise ValueError(f"non-algebraic agg {kind!r} for {col!r}")
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[_ALGEBRAIC[kind][0](col).alias(f"__p_{col}") for col, kind in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[kind][1](f"__p_{col}").alias(f"{kind}_{col}")
            for col, kind in aggs.items()
        ]
    )


def salted_skew_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join with hot-key salting: the (large, skewed) left side gets a
    random salt; the (smaller) right side is replicated across all salts.

    Turns one giant reducer into ``salt_buckets`` even ones. Prefer AQE's
    skew-join first; this is the manual fallback for engines/paths where
    AQE can't split (e.g. bucketed tables, aggregations downstream).
    """
    lsalted = left.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    rreplicated = right.withColumn(
        "__salt", F.explode(F.expr(f"sequence(0, {salt_buckets - 1})"))
    )
    return lsalted.join(rreplicated, [key, "__salt"]).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 8,
    sort_by: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by the join key.

    Subsequent equi-joins between tables bucketed the same way co-locate:
    no Exchange on either side (test_plans asserts this). At 100 TB this
    is how repeated fact-fact joins avoid reshuffling per query.
    """
    w = df.write.mode("overwrite").bucketBy(num_buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), key)
