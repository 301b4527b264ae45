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


# round-5 verdict item 6: naive parquet timestamp[us] (isAdjustedToUTC=
# false -> TIMESTAMP_NTZ under Spark 4's default inference) must produce
# oracle-identical results from the timestamp-driven queries, and must
# keep doing so on a NON-UTC session timezone (the driver's session is
# not built by get_spark). load_table guarantees this by disabling NTZ
# inference for the events read; this pins that behavior.
NTZ_QUERIES = ["events_sessionize", "events_cohort_retention", "events_rolling_dau"]


@pytest.fixture(scope="module")
def ntz_events_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("ntz_sf")
    src = pq.read_table(f"{SF}/events.parquet")
    ts = src.column("ts").cast(pa.timestamp("us"))  # drop nanos AND tz -> naive
    pq.write_table(src.set_column(src.schema.get_field_index("ts"), "ts", ts),
                   str(out / "events.parquet"))
    meta = pq.read_metadata(str(out / "events.parquet")).schema
    assert "isAdjustedToUTC=false" in str(meta) or "timestamp(isAdjustedToUTC=false" in str(meta)
    return str(out)


@pytest.mark.parametrize("name", NTZ_QUERIES)
def test_ntz_parquet_matches_oracle_on_non_utc_session(spark, ntz_events_dir, name):
    import duckdb

    q = all_queries()[name]
    assert q.oracle is not None
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = q.fn(spark, ntz_events_dir)
        cols = sorted(got.columns)
        got_canon = sorted(
            "|".join(str(r[got.columns.index(c)]) for c in cols) for r in got.collect()
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{ntz_events_dir}/events.parquet'"
    )
    res = con.execute(q.oracle)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()
    assert sorted(o_cols) == cols
    want_canon = sorted(
        "|".join(str(r[o_cols.index(c)]) for c in cols) for r in o_rows
    )
    assert got_canon == want_canon
