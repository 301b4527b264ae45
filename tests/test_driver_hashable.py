"""Every registry query must expose driver-hashable (atomic) columns.

The driver's correctness harness canonicalizes Spark/DuckDB results with
pandas (sort_values + factorize), which raises ``unhashable type`` on
list/dict cells — see CORRECTNESS_r01.json's array_agg_functions row.
Guard: build each query's plan (no execution) and assert no output column
is array/map/struct/binary.
"""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

SF = "/root/testdata/sf0.001"

BAD = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)


def _registry():
    import __spark_entry__ as entry

    return entry.queries()


def test_all_query_outputs_are_atomic(spark):
    qs = _registry()
    offenders = {}
    for name, fn in sorted(qs.items()):
        df = fn(spark, SF)
        flagged = [
            (f.name, f.dataType.simpleString())
            for f in df.schema.fields
            if isinstance(f.dataType, BAD)
        ]
        if flagged:
            offenders[name] = flagged
    assert not offenders, f"non-atomic output columns: {offenders}"


def test_oracle_exists_for_all_but_known_rows_only(spark):
    import __spark_entry__ as entry

    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    missing = qs - oracles
    # Sanctioned rows-only rows, each non-SQL-expressible by design:
    # the three sketch queries (HLL/t-digest, theta top-k, KLL) produce
    # approximate values that cannot hash-match an exact oracle, and MMR
    # is an iterative greedy selection with no ANSI-SQL equivalent.
    sanctioned = {
        "agg_approx_distinct",
        "agg_approx_top_users",
        "agg_kll_quantiles",
        "vector_mmr_diversify",
        # r8: PCA projection — eigendecomposition has no ANSI-SQL form;
        # pinned against an independent NumPy PCA instead
        "vector_pca_project",
        # r9: count-min point frequencies — the sketch is a JVM binary
        # DuckDB cannot replay; the CMS never-under/eps*N-over bound is
        # pinned against exact counts in tests/test_sketches.py instead
        "agg_countmin_point_freq",
    }
    assert missing <= sanctioned, f"unexpected rows-only: {missing}"
