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


@pytest.mark.slow
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
    # Sanctioned rows-only rows, each non-SQL-expressible by design.
    # r11 conversions (r10 verdict item 9): vector_mmr_diversify gained
    # an unrolled-CTE greedy oracle (fold-order cosines are bit-identical
    # across engines) and agg_approx_top_users an exact-counts oracle
    # (ApproxTopK is exact below maxItemsTracked; requesting the full
    # tracked list removes the boundary-tie hazard) — the remaining four
    # are genuinely approximate/non-SQL:
    # r12 closed vector_pca_project (fixed-iteration decimal-routed
    # power iteration — no eigendecomposition needed — hash-matched by
    # an unrolled-CTE oracle; the eigh production path stays pinned in
    # pytest) and agg_countmin_point_freq (the CMS is measured
    # collision-free over the full user domain at both gate SFs, so
    # its probe estimates ARE the exact counts; the exactness window
    # is pinned in pytest). The remaining two are genuinely randomized.
    sanctioned = {
        # HLL/t-digest estimates cannot hash-match an exact oracle
        "agg_approx_distinct",
        # KLL compaction is randomized above retained capacity
        "agg_kll_quantiles",
    }
    assert missing == sanctioned, f"rows-only drift: {missing ^ sanctioned}"
