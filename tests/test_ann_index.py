"""Store-backed incremental PQ index (round-2 verdict item 5): codes
persist as a collection-side artifact, refresh touches only new/deleted
chunks, and search scans the prebuilt code table."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from dataingestionplayground_spark.ingest import CollectionStore, ingest_corpus
from dataingestionplayground_spark.ingest.ann_index import (
    build_pq_index,
    index_staleness,
    pq_search_indexed,
    read_pq_codes,
    refresh_pq_index,
)
from dataingestionplayground_spark.ingest.embed import DIMS, hash_embed
from dataingestionplayground_spark.sources.markdown import parse_markdown_df, read_markdown_dir

M, K = 4, 8


@pytest.fixture(scope="module")
def md_elements(spark, md_fixture_dir):
    raw = read_markdown_dir(spark, md_fixture_dir)
    return parse_markdown_df(raw).cache()


def _queries_df(spark, texts):
    rows = [(f"q{i}", hash_embed(t)) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "query_id string, query_vec array<float>")


def test_build_and_search_matches_direct_adc(spark, md_elements, tmp_path):
    """Index-backed search == computing ADC from the raw collection (the
    index is a cache, not an approximation on top of one)."""
    from dataingestionplayground_spark.operators.similarity import pq_adc_search

    store = CollectionStore(str(tmp_path))
    ingest_corpus(md_elements, store, "docs", max_tokens=8, overlap=0)
    assert store.read(spark, "docs").count() >= K  # codebook fully seeded
    meta = build_pq_index(spark, store, "docs", m=M, n_centroids=K, dims=DIMS)
    assert len(meta["cents"]) == M * K and meta["n_centroids"] == K

    q = _queries_df(spark, ["machine learning algorithms", "the roman empire"])
    got = pq_search_indexed(spark, store, "docs", q, k=5).collect()
    chunks = store.read(spark, "docs").select("key", "embedding")
    want = pq_adc_search(
        chunks, q, k=5, m=M, n_centroids=K, dims=DIMS, corpus_id="key"
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # collection listing is not polluted by the index artifact
    assert store.list_collections() == ["docs"]


def test_incremental_refresh_appends_only_new(spark, md_elements, tmp_path):
    store = CollectionStore(str(tmp_path))
    # first 4 docs, then the rest arrive later
    ids = sorted(r.doc_id for r in md_elements.select("doc_id").distinct().collect())
    first, later = ids[:4], ids[4:]
    ingest_corpus(md_elements.filter(F.col("doc_id").isin(first)), store, "inc")
    build_pq_index(spark, store, "inc", m=M, n_centroids=K, dims=DIMS)
    base_codes = {r.key: tuple(r)[2:] for r in read_pq_codes(spark, store, "inc").collect()}

    ingest_corpus(
        md_elements.filter(F.col("doc_id").isin(later)), store, "inc", incremental=True
    )
    st = index_staleness(spark, store, "inc")
    assert st["missing"] > 0 and st["orphaned"] == 0

    res = refresh_pq_index(spark, store, "inc")
    assert res["appended"] == st["missing"] and res["removed"] == 0
    assert index_staleness(spark, store, "inc") == {"missing": 0, "orphaned": 0}

    after = {r.key: tuple(r)[2:] for r in read_pq_codes(spark, store, "inc").collect()}
    # old codes byte-unchanged: new vectors encoded against the FROZEN codebook
    for key, codes in base_codes.items():
        assert after[key] == codes
    assert len(after) == store.read(spark, "inc").count()
    # refreshed index is searchable over old + new content
    q = _queries_df(spark, ["statistical machine learning algorithms"])
    top = pq_search_indexed(spark, store, "inc", q, k=3)
    assert top.count() == 3


def test_refresh_drops_codes_of_deleted_documents(spark, md_elements, tmp_path):
    store = CollectionStore(str(tmp_path))
    ingest_corpus(md_elements, store, "del", max_tokens=32, overlap=0)
    build_pq_index(spark, store, "del", m=M, n_centroids=K, dims=DIMS)
    victim = store.read(spark, "del").select("documentid").distinct().collect()[0][0]
    store.delete_documents(spark, "del", [victim])

    st = index_staleness(spark, store, "del")
    assert st["orphaned"] > 0
    res = refresh_pq_index(spark, store, "del")
    assert res["removed"] == st["orphaned"]
    codes = read_pq_codes(spark, store, "del")
    assert codes.filter(F.col("documentid") == victim).count() == 0
    assert index_staleness(spark, store, "del") == {"missing": 0, "orphaned": 0}


def test_search_without_index_raises(spark, md_elements, tmp_path):
    store = CollectionStore(str(tmp_path))
    ingest_corpus(md_elements, store, "noidx")
    q = _queries_df(spark, ["anything"])
    with pytest.raises(FileNotFoundError, match="build_pq_index"):
        pq_search_indexed(spark, store, "noidx", q)


def test_index_scan_reads_codes_not_vectors(spark, md_elements, tmp_path):
    """The search plan's corpus side scans the codes parquet (int
    columns), not the collection's embedding column — the 100 TB win."""
    store = CollectionStore(str(tmp_path))
    ingest_corpus(md_elements, store, "scan")
    build_pq_index(spark, store, "scan", m=M, n_centroids=K, dims=DIMS)
    q = _queries_df(spark, ["x"])
    qe = pq_search_indexed(spark, store, "scan", q, k=2)._jdf.queryExecution()
    plan = qe.toString()  # analyzed + optimized + physical
    assert "code_0" in plan and "embedding" not in plan
    # the one file scan in the plan is the codes parquet, not the collection
    assert "parquet" in plan.lower()
    files = pq_search_indexed(spark, store, "scan", q, k=2).inputFiles()
    assert files and all(os.path.join("pq", "codes") in f for f in files)
