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
    meta = build_pq_index(
        spark, store, "docs", m=M, n_centroids=K, dims=DIMS, codebook_mode="seed"
    )
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

    # rerank mode: ADC prunes, exact cosine over only the shortlisted
    # keys decides — must equal the non-indexed pq_adc_rerank operator
    from dataingestionplayground_spark.operators.similarity import pq_adc_rerank

    got_rr = pq_search_indexed(spark, store, "docs", q, k=3, rerank=10).collect()
    want_rr = pq_adc_rerank(
        chunks, q, k=3, shortlist=10, m=M, n_centroids=K, dims=DIMS, corpus_id="key"
    ).collect()
    assert sorted(map(tuple, got_rr)) == sorted(map(tuple, want_rr))
    assert {r["rank"] for r in got_rr} <= {1, 2, 3}


def test_incremental_refresh_appends_only_new(spark, md_elements, tmp_path):
    store = CollectionStore(str(tmp_path))
    # first 4 docs, then the rest arrive later
    ids = sorted(r.doc_id for r in md_elements.select("doc_id").distinct().collect())
    first, later = ids[:4], ids[4:]
    ingest_corpus(md_elements.filter(F.col("doc_id").isin(first)), store, "inc")
    build_pq_index(
        spark, store, "inc", m=M, n_centroids=K, dims=DIMS, codebook_mode="seed"
    )
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
    build_pq_index(
        spark, store, "del", m=M, n_centroids=K, dims=DIMS, codebook_mode="seed"
    )
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
    build_pq_index(
        spark, store, "scan", m=M, n_centroids=K, dims=DIMS, codebook_mode="seed"
    )
    q = _queries_df(spark, ["x"])
    qe = pq_search_indexed(spark, store, "scan", q, k=2)._jdf.queryExecution()
    plan = qe.toString()  # analyzed + optimized + physical
    assert "code_0" in plan and "embedding" not in plan
    # the one file scan in the plan is the codes parquet, not the collection
    assert "parquet" in plan.lower()
    files = pq_search_indexed(spark, store, "scan", q, k=2).inputFiles()
    assert files and all(os.path.join("pq", "codes") in f for f in files)


# --- IVF index (round 6): partition-pruned probed-cells search ----------


def _ivf_fixture(spark, md_elements, tmp_path, coll="ivf"):
    from dataingestionplayground_spark.ingest.ann_index import build_ivf_index

    store = CollectionStore(str(tmp_path))
    ingest_corpus(md_elements, store, coll, max_tokens=8, overlap=0)
    meta = build_ivf_index(spark, store, coll, n_cells=4)
    return store, meta


def test_ivf_search_matches_probed_cells_bruteforce(spark, md_elements, tmp_path):
    """Index search == exact cosine top-k restricted to the probed cells
    of the PERSISTED assignment (the index is a pruning structure, not an
    approximation beyond cell probing)."""
    import numpy as np

    from dataingestionplayground_spark.functions import vector as V
    from dataingestionplayground_spark.ingest.ann_index import (
        ivf_search_indexed,
        read_ivf_assignments,
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    store, meta = _ivf_fixture(spark, md_elements, tmp_path)
    q = _queries_df(spark, ["machine learning algorithms", "the roman empire"])
    got = ivf_search_indexed(spark, store, "ivf", q, k=5, n_probe=2).collect()

    # expected: per query, numpy-probe the 2 nearest frozen centroids,
    # then exact cosine over assignment rows in those cells only
    C = np.asarray(meta["cents"], dtype=np.float64)
    cn = np.sqrt((C * C).sum(axis=1))
    rows = []
    for r in q.collect():
        e = np.asarray(r["query_vec"], dtype=np.float64)
        sims = (e @ C.T) / (np.sqrt(e @ e) * cn)
        cells = [int(c) for c in np.argsort(-sims, kind="stable")[:2]]
        rows.extend((r["query_id"], c) for c in cells)
    probe = spark.createDataFrame(rows, "query_id string, cell int")
    cand = read_ivf_assignments(spark, store, "ivf").join(probe, "cell").select("query_id", "key")
    scored = (
        store.read(spark, "ivf")
        .select("key", "embedding")
        .join(cand, "key")
        .join(q, "query_id")
        .withColumn("score", V.cosine_similarity("embedding", "query_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc_nulls_last("score"), F.asc("key"))
    want = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "key", "score", "rank")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) > 0


def test_ivf_search_scan_is_partition_pruned(spark, md_elements, tmp_path):
    """The probed-cells filter must reach the assignment scan as a
    PartitionFilter (literal isin over the partition column) and the
    assignment scan must not read embeddings."""
    from dataingestionplayground_spark.ingest.ann_index import ivf_search_indexed
    from dataingestionplayground_spark.plans import physical_plan

    store, _ = _ivf_fixture(spark, md_elements, tmp_path)
    q = _queries_df(spark, ["machine learning algorithms"])
    plan = physical_plan(ivf_search_indexed(spark, store, "ivf", q, k=3, n_probe=1), "formatted")
    assert "PartitionFilters: [cell" in plan.replace("#", " #").replace("  ", " ") or (
        "PartitionFilters" in plan and "cell" in plan
    )


def test_ivf_refresh_appends_only_new_and_drops_orphans(spark, md_elements, tmp_path):
    from dataingestionplayground_spark.ingest.ann_index import (
        ivf_search_indexed,
        read_ivf_assignments,
        refresh_ivf_index,
    )
    from pyspark.sql import functions as F

    store, _ = _ivf_fixture(spark, md_elements, tmp_path)
    n0 = read_ivf_assignments(spark, store, "ivf").count()
    # no-op refresh
    assert refresh_ivf_index(spark, store, "ivf") == {"appended": 0, "removed": 0}

    # ingest one more document incrementally -> refresh appends only it
    extra = md_elements.withColumn("doc_id", F.concat(F.col("doc_id"), F.lit("-copy2")))
    ingest_corpus(extra, store, "ivf", max_tokens=8, overlap=0, incremental=True)
    r = refresh_ivf_index(spark, store, "ivf")
    assert r["appended"] > 0 and r["removed"] == 0
    n1 = read_ivf_assignments(spark, store, "ivf").count()
    assert n1 == n0 + r["appended"]

    # delete the new document -> refresh rewrites only affected cells
    gone = [
        r["documentid"]
        for r in store.read(spark, "ivf")
        .select("documentid")
        .filter(F.col("documentid").endswith("-copy2"))
        .distinct()
        .collect()
    ]
    store.delete_documents(spark, "ivf", gone)
    r2 = refresh_ivf_index(spark, store, "ivf")
    assert r2["removed"] > 0
    assigned = read_ivf_assignments(spark, store, "ivf")
    assert assigned.count() == n0
    # index-backed search still healthy after the churn
    q = _queries_df(spark, ["machine learning algorithms"])
    assert ivf_search_indexed(spark, store, "ivf", q, k=3).count() > 0


def test_ivf_refresh_drops_fully_emptied_cell(spark, md_elements, tmp_path):
    """Deleting EVERY chunk of a cell must drop the cell's partition:
    dynamic partition overwrite only rewrites partitions present in the
    surviving rows, so an emptied cell would otherwise keep its stale
    assignment rows forever (`removed` re-reported on every refresh, and
    a deleted-then-re-ingested key pinned to its old-embedding cell)."""
    from dataingestionplayground_spark.ingest.ann_index import (
        ivf_search_indexed,
        read_ivf_assignments,
        refresh_ivf_index,
    )
    from pyspark.sql import functions as F

    store, _ = _ivf_fixture(spark, md_elements, tmp_path)
    assigned = read_ivf_assignments(spark, store, "ivf")
    # pick the smallest cell and delete every document with a chunk in it
    cell = assigned.groupBy("cell").count().orderBy("count", "cell").first()["cell"]
    victims = [
        r["documentid"]
        for r in assigned.filter(F.col("cell") == cell)
        .select("documentid")
        .distinct()
        .collect()
    ]
    store.delete_documents(spark, "ivf", victims)
    r1 = refresh_ivf_index(spark, store, "ivf")
    assert r1["removed"] > 0
    after = read_ivf_assignments(spark, store, "ivf")
    assert after.filter(F.col("cell") == cell).count() == 0
    # the stale partition is truly gone: a second refresh is a no-op
    assert refresh_ivf_index(spark, store, "ivf") == {"appended": 0, "removed": 0}
    # re-ingest a victim -> its chunks get FRESH assignments via the
    # anti-join (no stale rows shadowing them)
    back = md_elements.filter(F.col("doc_id").isin(victims))
    if back.take(1):
        ingest_corpus(back, store, "ivf", max_tokens=8, overlap=0, incremental=True)
        r2 = refresh_ivf_index(spark, store, "ivf")
        assert r2["appended"] > 0 and r2["removed"] == 0
        keys = {r["key"] for r in store.read(spark, "ivf").select("key").collect()}
        idx_keys = {
            r["key"]
            for r in read_ivf_assignments(spark, store, "ivf").select("key").collect()
        }
        assert keys == idx_keys
    q = _queries_df(spark, ["machine learning algorithms"])
    assert ivf_search_indexed(spark, store, "ivf", q, k=3).count() > 0


def test_ivf_refresh_survives_total_deletion(spark, md_elements, tmp_path):
    """ADVICE r7: deleting EVERY chunk rmtree's every cell partition,
    leaving cells/ with no data files — the next read (staleness, search,
    refresh) must behave as an empty index, not fail schema inference;
    and re-ingesting afterwards must rebuild assignments from scratch."""
    from dataingestionplayground_spark.ingest.ann_index import (
        ivf_index_staleness,
        ivf_search_indexed,
        read_ivf_assignments,
        refresh_ivf_index,
    )
    from pyspark.sql import functions as F

    store, _ = _ivf_fixture(spark, md_elements, tmp_path)
    victims = [
        r["documentid"]
        for r in store.read(spark, "ivf").select("documentid").distinct().collect()
    ]
    store.delete_documents(spark, "ivf", victims)
    r1 = refresh_ivf_index(spark, store, "ivf")
    assert r1["removed"] > 0
    # every reader path behaves as an EMPTY index
    assert read_ivf_assignments(spark, store, "ivf").count() == 0
    assert ivf_index_staleness(spark, store, "ivf") == {"missing": 0, "orphaned": 0}
    q = _queries_df(spark, ["machine learning algorithms"])
    assert ivf_search_indexed(spark, store, "ivf", q, k=3).count() == 0
    assert refresh_ivf_index(spark, store, "ivf") == {"appended": 0, "removed": 0}
    # re-ingest -> assignments come back through the normal refresh path
    ingest_corpus(md_elements, store, "ivf", max_tokens=8, overlap=0, incremental=True)
    r2 = refresh_ivf_index(spark, store, "ivf")
    assert r2["appended"] > 0 and r2["removed"] == 0
    assert ivf_search_indexed(spark, store, "ivf", q, k=3).count() > 0
    assert (
        read_ivf_assignments(spark, store, "ivf").filter(F.col("cell").isNull()).count()
        == 0
    )


def _ivfpq_fixture(spark, md_elements, tmp_path, coll="ivfpq", **kw):
    from dataingestionplayground_spark.ingest.ann_index import build_ivfpq_index

    store = CollectionStore(str(tmp_path))
    ingest_corpus(md_elements, store, coll, max_tokens=8, overlap=0)
    kw.setdefault("n_cells", 4)
    kw.setdefault("m", M)
    kw.setdefault("n_centroids", K)
    kw.setdefault("dims", DIMS)
    meta = build_ivfpq_index(spark, store, coll, **kw)
    return store, meta


def test_ivfpq_rerank_recall_vs_bruteforce_and_adc_shortlist(spark, md_elements, tmp_path):
    """Reranked IVFADC search over ALL cells (n_probe = n_cells) must
    return exactly the brute-force cosine top-k: with every cell probed
    and a shortlist >= corpus, ADC pruning removes nothing and the
    exact-cosine rerank decides everything — validating LUT alignment,
    residual encode, and the fetch-join end to end."""
    from dataingestionplayground_spark.ingest.ann_index import ivfpq_search_indexed
    from dataingestionplayground_spark.operators.similarity import knn_brute_force

    store, meta = _ivfpq_fixture(spark, md_elements, tmp_path)
    assert meta["n_cells"] == 4 and meta["n_centroids"] == K
    q = _queries_df(spark, ["machine learning algorithms", "the roman empire"])
    n = store.read(spark, "ivfpq").count()
    got = ivfpq_search_indexed(
        spark, store, "ivfpq", q, k=5, n_probe=4, rerank=n
    ).collect()
    chunks = store.read(spark, "ivfpq").select("key", "embedding")
    want = knn_brute_force(
        chunks, q, k=5, corpus_id="key", corpus_vec="embedding"
    ).collect()
    assert sorted((r["query_id"], r["key"], r["rank"]) for r in got) == sorted(
        (r["query_id"], r["key"], r["rank"]) for r in want
    )
    # ADC-only mode returns distances ascending, depth k
    adc = ivfpq_search_indexed(
        spark, store, "ivfpq", q, k=5, n_probe=4, rerank=None
    ).collect()
    assert len(adc) > 0 and all(r["adc_dist"] >= 0 for r in adc)
    assert store.list_collections() == ["ivfpq"]


def test_ivfpq_scan_is_partition_pruned_and_code_only(spark, md_elements, tmp_path):
    """The probed-cells literal must reach the codes scan as a
    PartitionFilter, and the ADC scan must read codes, never embeddings."""
    from dataingestionplayground_spark.ingest.ann_index import ivfpq_search_indexed
    from dataingestionplayground_spark.plans import physical_plan

    store, _ = _ivfpq_fixture(spark, md_elements, tmp_path)
    q = _queries_df(spark, ["machine learning algorithms"])
    plan = physical_plan(
        ivfpq_search_indexed(spark, store, "ivfpq", q, k=3, n_probe=1, rerank=None),
        "formatted",
    )
    assert "PartitionFilters" in plan and "cell" in plan
    scan_lines = [
        ln for ln in plan.splitlines() if "Scan parquet" in ln or "ReadSchema" in ln
    ]
    assert any("code_0" in ln for ln in scan_lines)
    assert not any("embedding" in ln for ln in scan_lines)


def test_ivfpq_refresh_appends_only_new_drops_orphans_and_ensure(
    spark, md_elements, tmp_path
):
    """Refresh encodes ONLY anti-joined new chunks against the frozen
    quantizers; deletions rewrite only affected cells; ensure_index
    routes the ivfpq kind through build -> refresh -> no-op."""
    from dataingestionplayground_spark.ingest.ann_index import (
        ensure_index,
        ivfpq_index_staleness,
        ivfpq_search_indexed,
        read_ivfpq_codes,
    )

    ids = sorted(r.doc_id for r in md_elements.select("doc_id").distinct().collect())
    first, later = ids[:4], ids[4:]
    store = CollectionStore(str(tmp_path))
    ingest_corpus(
        md_elements.filter(F.col("doc_id").isin(first)), store, "inc",
        max_tokens=8, overlap=0,
    )
    r = ensure_index(
        spark, store, "inc", "ivfpq", n_cells=4, m=M, n_centroids=K,
        codebook_mode="seed", centroid_mode="seed",
    )
    assert r["built"] is True
    n0 = read_ivfpq_codes(spark, store, "inc").count()
    base = {
        (row["key"], tuple(row[f"code_{s}"] for s in range(M)))
        for row in read_ivfpq_codes(spark, store, "inc").collect()
    }

    # later docs arrive: refresh appends, existing codes byte-stable
    ingest_corpus(
        md_elements.filter(F.col("doc_id").isin(later)), store, "inc",
        max_tokens=8, overlap=0, incremental=True,
    )
    r2 = ensure_index(spark, store, "inc", "ivfpq")
    assert r2["built"] is False and r2["appended"] > 0 and r2["removed"] == 0
    after = {
        (row["key"], tuple(row[f"code_{s}"] for s in range(M)))
        for row in read_ivfpq_codes(spark, store, "inc").collect()
    }
    assert base <= after and len(after) == n0 + r2["appended"]
    st = ivfpq_index_staleness(spark, store, "inc")
    assert st == {"missing": 0, "orphaned": 0}
    # a fresh index is a no-op
    r3 = ensure_index(spark, store, "inc", "ivfpq")
    assert r3 == {"built": False, "appended": 0, "removed": 0}

    # deletion: drop one document's chunks -> its code rows disappear
    victim = later[0] if later else first[0]
    store.delete_documents(spark, "inc", [victim])
    r4 = ensure_index(spark, store, "inc", "ivfpq")
    assert r4["removed"] > 0
    keys_left = {row["key"] for row in read_ivfpq_codes(spark, store, "inc").collect()}
    live = {row["key"] for row in store.read(spark, "inc").select("key").collect()}
    assert keys_left == live
    # search still works over the maintained table
    q = _queries_df(spark, ["machine learning algorithms"])
    assert len(ivfpq_search_indexed(spark, store, "inc", q, k=3).collect()) > 0
