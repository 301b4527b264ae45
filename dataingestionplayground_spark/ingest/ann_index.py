"""Store-backed, incrementally-maintained PQ index (round-2 verdict
item 5): instead of re-deriving codebooks and re-encoding the whole
corpus on every search call, the product-quantization codes become a
COLLECTION-SIDE ARTIFACT — built once, appended incrementally as
documents ingest (the same anti-join-on-key pattern the chunk sink
uses), and read directly by search.

Layout, under the collection store's base path (underscore-prefixed so
collection listings skip it, mirroring Spark's ``_``-file convention)::

    <base>/_indexes/<collection>/pq/codes/   parquet: key, documentid, code_0..m-1
    <base>/_indexes/<collection>/pq/pq.json  params + the frozen codebook

The codebook is FROZEN at build time and stored in ``pq.json``:
incremental refresh encodes new vectors against the original centroids
(codes from different codebooks are incomparable — this is how every
production PQ index behaves; rebuild when drift warrants it). At scale
the refresh cost is O(new chunks), the search scan reads ``m`` int
codes per chunk instead of the float vectors, and deletions rewrite
only the codes table.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataingestionplayground_spark.ingest.store import CollectionStore
from dataingestionplayground_spark.operators.similarity import (
    _pq_codebook,
    pq_adc_rank,
    pq_encode_with_codebook,
)

_CENTS_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("s", T.IntegerType(), False),
            T.StructField("cid", T.IntegerType(), False),
            T.StructField("v", T.ArrayType(T.DoubleType()), False),
        ]
    )
)


def _index_dir(store: CollectionStore, collection: str) -> str:
    # _path validates the collection name (and runs crash recovery)
    store._path(collection)
    return os.path.join(store.base_path, "_indexes", collection, "pq")


def _codebook_df(spark: SparkSession, meta: dict) -> DataFrame:
    row = [tuple(c) for c in meta["cents"]]
    return spark.createDataFrame([(row,)], T.StructType([T.StructField("cents", _CENTS_SCHEMA)]))


def build_pq_index(
    spark: SparkSession,
    store: CollectionStore,
    collection: str,
    m: int = 4,
    n_centroids: int = 8,
    dims: int = 384,
    codebook_mode: str = "seed",
) -> dict:
    """Derive the codebook from the collection's current chunks, encode
    every chunk, persist codes + frozen codebook. Returns the metadata
    dict. Encoding is the zero-shuffle broadcast-codebook expression;
    the only cluster work is one corpus scan + the parquet write."""
    if dims % m != 0:
        raise ValueError(f"dims {dims} not divisible by m {m}")
    chunks = store.read(spark, collection).select("key", "documentid", "embedding")
    codebook = _pq_codebook(chunks, m, n_centroids, dims, "key", "embedding", codebook_mode)
    cents = [
        {"s": c["s"], "cid": c["cid"], "v": [float(x) for x in c["v"]]}
        for c in codebook.collect()[0]["cents"]
    ]
    # seeds come from the k lowest-id vectors: a collection smaller than
    # n_centroids underfills the codebook, and the ADC LUT stride must
    # match the ACTUAL per-subspace centroid count or lookups misalign
    effective = len(cents) // m
    meta = {
        "m": m,
        "n_centroids": effective,
        "dims": dims,
        "codebook_mode": codebook_mode,
        "cents": [(c["s"], c["cid"], c["v"]) for c in cents],
    }
    idx = _index_dir(store, collection)
    codes = pq_encode_with_codebook(
        chunks, _codebook_df(spark, meta), m, dims, "key", "embedding",
        extra_cols=("documentid",),
    )
    (
        codes.repartition("documentid")
        .write.mode("overwrite")
        .option("compression", "zstd")
        .parquet(os.path.join(idx, "codes"))
    )
    os.makedirs(idx, exist_ok=True)
    with open(os.path.join(idx, "pq.json"), "w") as f:
        json.dump(meta, f)
    return meta


def _load_meta(store: CollectionStore, collection: str) -> dict:
    idx = _index_dir(store, collection)
    path = os.path.join(idx, "pq.json")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no PQ index for collection {collection!r}; run build_pq_index first"
        )
    return json.load(open(path))


def read_pq_codes(spark: SparkSession, store: CollectionStore, collection: str) -> DataFrame:
    return spark.read.parquet(os.path.join(_index_dir(store, collection), "codes"))


def index_staleness(spark: SparkSession, store: CollectionStore, collection: str) -> dict:
    """(missing, orphaned) chunk-key counts: missing = chunks with no
    code row (ingested after the last refresh); orphaned = code rows
    whose chunk no longer exists (deleted documents)."""
    keys = store.read(spark, collection).select("key")
    codes = read_pq_codes(spark, store, collection).select("key")
    return {
        "missing": keys.join(codes, "key", "left_anti").count(),
        "orphaned": codes.join(keys, "key", "left_anti").count(),
    }


def refresh_pq_index(spark: SparkSession, store: CollectionStore, collection: str) -> dict:
    """Incremental maintenance: encode ONLY chunks without a code row
    (anti-join on key) against the frozen codebook and append; drop
    code rows for deleted chunks (filtered rewrite, only when needed).
    Returns {"appended": n, "removed": n}."""
    meta = _load_meta(store, collection)
    m, dims = meta["m"], meta["dims"]
    idx = _index_dir(store, collection)
    codes_path = os.path.join(idx, "codes")
    chunks = store.read(spark, collection).select("key", "documentid", "embedding")
    codes = spark.read.parquet(codes_path)

    new = chunks.join(codes.select("key"), "key", "left_anti")
    appended = new.count()
    if appended:
        (
            pq_encode_with_codebook(
                new, _codebook_df(spark, meta), m, dims, "key", "embedding",
                extra_cols=("documentid",),
            )
            .repartition("documentid")
            .write.mode("append")
            .option("compression", "zstd")
            .parquet(codes_path)
        )
        codes = spark.read.parquet(codes_path)

    orphaned = codes.join(chunks.select("key"), "key", "left_anti").count()
    if orphaned:
        kept = codes.join(chunks.select("key"), "key", "left_semi")
        kept = kept.localCheckpoint(eager=True)  # sever lineage before rewrite
        tmp = codes_path + ".rewrite-tmp"
        kept.repartition("documentid").write.mode("overwrite").option(
            "compression", "zstd"
        ).parquet(tmp)
        old = codes_path + ".old"
        os.rename(codes_path, old)
        os.rename(tmp, codes_path)
        shutil.rmtree(old)
    return {"appended": appended, "removed": orphaned}


def pq_search_indexed(
    spark: SparkSession,
    store: CollectionStore,
    collection: str,
    queries: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """ADC top-k straight off the persisted code table: the corpus-side
    scan reads (key, code_0..m-1) — no embeddings, no codebook
    derivation, no encode. Returns (query_id, key, adc_dist, rank)."""
    meta = _load_meta(store, collection)
    codes = read_pq_codes(spark, store, collection)
    return pq_adc_rank(
        codes,
        _codebook_df(spark, meta),
        queries,
        k,
        meta["m"],
        meta["n_centroids"],
        meta["dims"],
        corpus_id="key",
        query_id=query_id,
        query_vec=query_vec,
    )
