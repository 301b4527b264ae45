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


def _auto_centroids(n_rows: int) -> int:
    """Codebook-resolution scaling policy (r11 verdict item 3): a
    FROZEN fixed-k codebook's ADC code space saturates as the corpus
    grows — driver-measured raw ADC recall@10 at the bench config fell
    0.70 (sf0.5, 10k rows) -> 0.36 (sf1.0, 20k rows) while the exact
    rerank held 0.88. Auto mode steps per-subspace centroid count with
    corpus size so raw-shortlist quality degrades by policy, not by
    accident; each step 4x's the distinguishable code points per
    subspace while codes stay one byte (k <= 256)."""
    if n_rows < 50_000:
        return 16
    if n_rows < 500_000:
        return 64
    return 256


def build_pq_index(
    spark: SparkSession,
    store: CollectionStore,
    collection: str,
    m: int = 8,
    n_centroids: int | str = 16,
    dims: int = 384,
    codebook_mode: str = "kmeans",
) -> dict:
    """Derive the codebook from the collection's current chunks, encode
    every chunk, persist codes + frozen codebook. Returns the metadata
    dict. Encoding is the zero-shuffle broadcast-codebook expression;
    the only cluster work is one corpus scan + the parquet write.

    Defaults (r8 verdict item 2): 8 subspaces x 16 kmeans-refined
    centroids — the old 4x8 seeded codebook carried 12 bits/vector,
    too coarse for a usable ADC shortlist (bench recall@10 0.12 raw /
    0.38 at rerank=50); 8x16 kmeans + 'auto' rerank depth clears the
    0.8 recall floor the bench comparator now gates.

    ``n_centroids='auto'`` applies the resolution policy
    (:func:`_auto_centroids`): k tracks the corpus size at BUILD time
    and is meta-recorded. The fixed-resolution contract is otherwise
    explicit: the codebook is frozen, refresh never rescales it, so as
    the collection grows the RAW ADC shortlist coarsens (measured:
    recall@10 0.70 -> 0.36 over a 2x corpus at k=16) and the exact
    rerank stage is what holds the gated >=0.8 recall floor
    (scripts/bench_compare.py enforces it on every scale block,
    including sf1.0). Rebuild — getting a fresh auto k — when
    index_staleness or a recall probe warrants it."""
    if dims % m != 0:
        raise ValueError(f"dims {dims} not divisible by m {m}")
    chunks = store.read(spark, collection).select("key", "documentid", "embedding")
    policy = None
    if n_centroids == "auto":
        n_centroids = _auto_centroids(chunks.count())
        policy = "auto"
    n_centroids = int(n_centroids)
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
    if policy:
        # the resolved k is recorded so a later reader can tell whether
        # this index was sized by the policy or pinned by hand
        meta["n_centroids_policy"] = policy
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


def _pq_staging_dir(store: CollectionStore, collection: str) -> str:
    return os.path.join(_index_dir(store, collection), "codes_epochs")


def _has_parquet(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for _, _, files in os.walk(path) for f in files
    )


def _swap_live_dir(tmp: str, live: str) -> None:
    """Crash-recoverable table swap (r15 ADVICE): promote the fully
    written ``tmp`` (which MUST be ``live + ".new"``) to ``live``. The
    old two-rename dance had a window — after ``rename(live, old)`` and
    before ``rename(tmp, live)`` a crash left NO live directory at all.
    Here the complete ``.new`` directory exists on disk before ``live``
    is ever touched, so every crash point is recoverable by
    :func:`_recover_live_dir` (run by readers): live missing + ``.new``
    present → finish the promotion; leftover ``.old`` → clear it."""
    assert tmp == live + ".new", "swap tmp must be the recoverable .new name"
    old = live + ".old"
    if os.path.exists(old):  # leftover from an interrupted prior swap
        shutil.rmtree(old)
    os.rename(live, old)
    os.rename(tmp, live)
    shutil.rmtree(old)


def _recover_live_dir(live: str) -> None:
    """Finish an interrupted :func:`_swap_live_dir`. Only promotes
    ``.new`` when ``live`` is MISSING — that state is reachable solely
    after the writer finished ``.new`` and renamed ``live`` away, so a
    partial ``.new`` (crash mid-write, ``live`` intact) is never
    promoted; the next rewrite simply overwrites it."""
    new = live + ".new"
    old = live + ".old"
    if not os.path.exists(live):
        if os.path.isdir(new):
            os.rename(new, live)
        elif os.path.isdir(old):  # defense in depth: unreachable via
            os.rename(old, live)  # _swap_live_dir, but never strand data
    if os.path.exists(live) and os.path.exists(old):
        shutil.rmtree(old)


def read_pq_codes(spark: SparkSession, store: CollectionStore, collection: str) -> DataFrame:
    """The logical code table: the base build/refresh table plus any
    epoch-staged merge batches (``merge_pq_codes``), deduplicated by
    chunk key with the NEWEST epoch winning (a re-encoded chunk's fresh
    code shadows its base row; base rows read as epoch NULL and lose
    ties last). Search and staleness both read through here, so staged
    codes are searchable before compaction."""
    codes_path = os.path.join(_index_dir(store, collection), "codes")
    _recover_live_dir(codes_path)  # finish any interrupted compaction swap
    base = spark.read.parquet(codes_path)
    staging = _pq_staging_dir(store, collection)
    if not _has_parquet(staging):
        return base
    from pyspark.sql import Window

    cols = base.columns
    staged = spark.read.parquet(staging)
    both = (
        base.withColumn("__ep", F.lit(None).cast("long"))
        .select(*cols, "__ep")
        .unionByName(
            staged.withColumn("__ep", F.col("epoch_id").cast("long")).select(
                *cols, "__ep"
            )
        )
    )
    w = Window.partitionBy("key").orderBy(F.desc_nulls_last("__ep"))
    return (
        both.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__ep", "__rn")
    )


def merge_pq_codes(
    spark: SparkSession,
    store: CollectionStore,
    collection: str,
    batch: DataFrame,
    epoch_id: int,
) -> int:
    """Epoch-staged code APPEND for the PQ index (the other half of r13
    verdict item 5): encode a chunk batch against the FROZEN codebook
    and stage it as the epoch's own partition — a foreachBatch retry
    rewrites exactly its own epoch directory (the drift-log discipline),
    so replays converge byte-identically, and a key re-delivered across
    epochs is shadowed at read time (newest epoch wins). Fold committed
    epochs into the base table with :func:`compact_pq_codes`. Returns
    rows staged."""
    meta = _load_meta(store, collection)
    codes = pq_encode_with_codebook(
        batch.select("key", "documentid", "embedding"),
        _codebook_df(spark, meta),
        meta["m"],
        meta["dims"],
        "key",
        "embedding",
        extra_cols=("documentid",),
    ).withColumn("epoch_id", F.lit(int(epoch_id)).cast("long"))
    codes = codes.localCheckpoint(eager=True)  # counted + written once
    n = codes.count()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            codes.write.mode("overwrite")
            .partitionBy("epoch_id")
            .option("compression", "zstd")
            .parquet(_pq_staging_dir(store, collection))
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return n


def compact_pq_codes(spark: SparkSession, store: CollectionStore, collection: str) -> int:
    """Fold staged epoch partitions into the base code table (the
    refresh rewrite pattern: write to ``codes.new``, then the
    crash-recoverable :func:`_swap_live_dir` — r15 ADVICE closed the
    window where a crash between the two renames left no ``codes``
    directory at all) and clear the staging area. Run only AFTER the
    maintaining stream's checkpoint has committed those epochs. Returns
    staged rows folded."""
    staging = _pq_staging_dir(store, collection)
    if not _has_parquet(staging):
        return 0
    n = spark.read.parquet(staging).count()
    merged = read_pq_codes(spark, store, collection).localCheckpoint(eager=True)
    codes_path = os.path.join(_index_dir(store, collection), "codes")
    tmp = codes_path + ".new"
    merged.repartition("documentid").write.mode("overwrite").option(
        "compression", "zstd"
    ).parquet(tmp)
    _swap_live_dir(tmp, codes_path)
    shutil.rmtree(staging)
    return n


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
    Staged merge epochs (``merge_pq_codes``) are folded into the base
    first, so the reconcile below sees one authoritative table.
    Returns {"appended": n, "removed": n}."""
    compact_pq_codes(spark, store, collection)
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
        tmp = codes_path + ".new"
        kept.repartition("documentid").write.mode("overwrite").option(
            "compression", "zstd"
        ).parquet(tmp)
        _swap_live_dir(tmp, codes_path)
    return {"appended": appended, "removed": orphaned}


def pq_search_indexed(
    spark: SparkSession,
    store: CollectionStore,
    collection: str,
    queries: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    rerank: int | str | None = None,
) -> DataFrame:
    """ADC top-k straight off the persisted code table: the corpus-side
    scan reads (key, code_0..m-1) — no embeddings, no codebook
    derivation, no encode. Returns (query_id, key, adc_dist, rank).

    With ``rerank=N``, the code-only ADC pass prunes to an N-deep
    shortlist per query, then full-precision vectors are fetched for
    ONLY the shortlisted keys (broadcast join into the collection) and
    exact cosine picks the final top-k — the amortized, store-backed
    twin of :func:`~...operators.similarity.pq_adc_rerank`: ADC's
    quantization recall loss is largely recovered while the scan stays
    code-only. ``rerank='auto'`` uses the production depth 16*k (r8
    verdict item 2: a fixed shallow depth starves recall when the code
    resolution is coarse relative to the corpus; recall@10 is monotone
    in depth — a deeper ADC shortlist is a superset, and exact-cosine
    top-k over a superset can only keep or gain true neighbors — so
    16*k trades a slightly larger broadcast for the recall floor the
    bench gates at >=0.8). Returns (query_id, key, score, rank)."""
    from pyspark.sql import Window

    from dataingestionplayground_spark.functions import vector as V

    if rerank == "auto":
        rerank = 16 * k
    meta = _load_meta(store, collection)
    codes = read_pq_codes(spark, store, collection)
    adc = pq_adc_rank(
        codes,
        _codebook_df(spark, meta),
        queries,
        max(k, rerank) if rerank else k,
        meta["m"],
        meta["n_centroids"],
        meta["dims"],
        corpus_id="key",
        query_id=query_id,
        query_vec=query_vec,
    )
    if not rerank:
        return adc
    short = adc.select(query_id, "key")  # shortlist x |queries|: tiny
    scored = (
        store.read(spark, collection)
        .select("key", "embedding")
        .join(F.broadcast(short), "key")
        .join(F.broadcast(queries.select(query_id, query_vec)), query_id)
        .withColumn("score", V.cosine_similarity("embedding", query_vec))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc_nulls_last("score"), F.asc("key"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "key", "score", "rank")
    )


# ---------------------------------------------------------------------------
# IVF index: the second member of the store-backed index family. Where the
# PQ index persists compressed CODES (scan cost), the IVF index persists
# the coarse CELL ASSIGNMENT, partitioned by cell — so a search with
# n_probe cells triggers parquet PARTITION PRUNING and never reads the
# other cells' files at all: the index turns top-k from a corpus scan
# into a probed-cells scan. Same lifecycle as PQ: centroids FROZEN at
# build time (ivf.json), refresh encodes only new chunks (anti-join),
# deletion rewrites only the affected cell partitions.
# ---------------------------------------------------------------------------

_IVF_META = "ivf.json"


def _ivf_dir(store: CollectionStore, collection: str) -> str:
    store._path(collection)
    return os.path.join(store.base_path, "_indexes", collection, "ivf")


def _ivf_cents_df(spark: SparkSession, meta: dict) -> DataFrame:
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(meta["cents"])]
    return spark.createDataFrame(rows, "centroid_id int, cent_vec array<float>")


def build_ivf_index(
    spark: SparkSession,
    store: CollectionStore,
    collection: str,
    n_cells: int = 16,
    centroid_mode: str = "kmeans",
    kmeans_iters: int = 2,
    assign_top: int = 1,
    assign_margin: float | None = None,
) -> dict:
    """Derive ``n_cells`` centroids (``'seed'``: the lowest-key chunks;
    ``'kmeans'`` — the default — refines them with the deterministic
    decimal-routed Lloyd iterations; ``'sampled'`` converges on a
    bounded driver-side sample first and spends the distributed
    iterations refining), assign every chunk to its argmax-cosine cell
    with the Arrow matmul stage, and persist the assignment partitioned
    BY CELL. One corpus scan per kmeans iteration + one partitioned
    write — all one-time build cost.

    kmeans centroids matter here (r9): raw lowest-key seeds land inside
    the corpus's natural clusters unevenly (the bench embeddings are
    label-clustered), measured at recall@10 0.68 with n_probe=2 of 8
    seeded cells vs ~1.0 with 16 kmeans cells probing the same corpus
    fraction (4).

    ``assign_top`` (r14 verdict item 2) is SOFT assignment: each chunk
    is stored in its ``assign_top`` nearest cells, so a neighborhood
    that straddles a cell boundary stays reachable from both sides.
    This is the structural recall lever for a k-means partition whose
    boundaries cut query neighborhoods — measured on the sf0.1 bench
    embeddings (16 cells, n_probe=4): recall@10 0.66 at assign_top=1 vs
    0.86 at assign_top=2, robust across seedings, where centroid-
    training improvements alone moved recall by seed luck (0.58-0.91).
    Cost: the assignment table and each probed cell hold ``assign_top``x
    rows (the full-precision vectors are NOT duplicated — candidates
    semi-join into the collection). Recorded in the meta; merge/refresh
    maintain it so maintained == rebuilt parity holds.

    ``assign_margin`` (r16 verdict item 3, boundary-only fan-out):
    with ``assign_top > 1``, store a secondary copy ONLY when its
    cosine similarity is within ``assign_margin`` of the chunk's best
    cell — chunks deep inside a cell stay single-assigned, so the
    assignment table grows by the measured boundary fraction instead
    of a flat ``assign_top``x while boundary-straddling neighborhoods
    keep their second entry point (the recall lever). Frozen into the
    meta like assign_top: merge/refresh reproduce the same fan-out
    rule, so maintained == rebuilt still holds."""
    from dataingestionplayground_spark.operators.similarity import (
        _assign_cells_matmul,
        _seed_centroids,
        kmeans_centroids,
    )

    chunks = store.read(spark, collection).select("key", "documentid", "embedding")
    if centroid_mode == "kmeans":
        cents = kmeans_centroids(chunks, n_cells, kmeans_iters, "key", "embedding")
    elif centroid_mode == "sampled":
        from dataingestionplayground_spark.operators.similarity import (
            sampled_kmeans_centroids,
        )

        cents = sampled_kmeans_centroids(
            chunks, n_cells, kmeans_iters, "key", "embedding"
        )
    elif centroid_mode == "seed":
        cents = _seed_centroids(chunks, "key", "embedding", n_cells)
    else:
        raise ValueError(
            f"centroid_mode must be 'seed', 'kmeans', or 'sampled': {centroid_mode!r}"
        )
    meta = {
        "n_cells": cents.count(),
        "centroid_mode": centroid_mode,
        "assign_top": max(1, int(assign_top)),
        "assign_margin": (
            float(assign_margin) if assign_margin is not None else None
        ),
        "cents": [
            [float(x) for x in r["cent_vec"]]
            for r in cents.orderBy("centroid_id").collect()
        ],
    }
    soft = meta["assign_top"] > 1
    assigned = _assign_cells_matmul(
        chunks, _ivf_cents_df(spark, meta), "key", "embedding",
        extra_cols=("documentid",), keep=meta["assign_top"], emit_rank=soft,
        soft_margin=meta["assign_margin"],
    ).select(
        "key", "documentid", *(("cell_rank", "cell_1") if soft else ()), "cell"
    )
    idx = _ivf_dir(store, collection)
    (
        assigned.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .option("compression", "zstd")
        .parquet(os.path.join(idx, "cells"))
    )
    os.makedirs(idx, exist_ok=True)
    with open(os.path.join(idx, _IVF_META), "w") as f:
        json.dump(meta, f)
    return meta


def _load_ivf_meta(store: CollectionStore, collection: str) -> dict:
    path = os.path.join(_ivf_dir(store, collection), _IVF_META)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no IVF index for collection {collection!r}; run build_ivf_index first"
        )
    return json.load(open(path))


# assignment-table schema, used to synthesize an EMPTY frame when every
# cell partition has been deleted (refresh rmtree's emptied partitions;
# a dir with no data files would otherwise fail schema inference)
_IVF_ASSIGN_SCHEMA = "key string, documentid string, cell int"


def read_ivf_assignments(
    spark: SparkSession, store: CollectionStore, collection: str
) -> DataFrame:
    cells = os.path.join(_ivf_dir(store, collection), "cells")
    has_data = any(
        f.endswith(".parquet")
        for _, _, files in os.walk(cells)
        for f in files
    )
    if not has_data:
        return spark.createDataFrame([], _IVF_ASSIGN_SCHEMA)
    # mergeSchema: merge_ivf_assignments stages epoch-tagged rows next to
    # epoch-less base/refresh rows (read back as epoch_id NULL)
    return spark.read.option("mergeSchema", "true").parquet(cells)


def ivf_index_staleness(
    spark: SparkSession, store: CollectionStore, collection: str
) -> dict:
    """(missing, orphaned) chunk-key counts for the IVF assignment table
    — the IVF twin of ``index_staleness``."""
    keys = store.read(spark, collection).select("key")
    assigned = read_ivf_assignments(spark, store, collection).select("key")
    return {
        "missing": keys.join(assigned, "key", "left_anti").count(),
        "orphaned": assigned.join(keys, "key", "left_anti").count(),
    }


def ensure_index(
    spark: SparkSession,
    store: CollectionStore,
    collection: str,
    kind: str,
    **build_kwargs,
) -> dict:
    """Front door for index-backed search (the CLI path): build the
    ``kind`` index if absent, refresh it if stale, no-op if current.
    Returns {"built": bool, "appended": n, "removed": n}."""
    if kind not in ("pq", "ivf", "ivfpq"):
        raise ValueError(
            f"unknown index kind {kind!r} (expected 'pq', 'ivf', or 'ivfpq')"
        )
    load = {"pq": _load_meta, "ivf": _load_ivf_meta, "ivfpq": _load_ivfpq_meta}[kind]
    try:
        load(store, collection)
    except FileNotFoundError:
        if kind in ("pq", "ivfpq"):
            first = store.read(spark, collection).select("embedding").first()
            dims = len(first["embedding"]) if first else 384
            build_kwargs.setdefault("dims", dims)
            build = build_pq_index if kind == "pq" else build_ivfpq_index
            build(spark, store, collection, **build_kwargs)
        else:
            build_ivf_index(spark, store, collection, **build_kwargs)
        return {"built": True, "appended": 0, "removed": 0}
    stale = {
        "pq": index_staleness,
        "ivf": ivf_index_staleness,
        "ivfpq": ivfpq_index_staleness,
    }[kind](spark, store, collection)
    if stale["missing"] or stale["orphaned"]:
        refresh = {
            "pq": refresh_pq_index,
            "ivf": refresh_ivf_index,
            "ivfpq": refresh_ivfpq_index,
        }[kind]
        return {"built": False, **refresh(spark, store, collection)}
    return {"built": False, "appended": 0, "removed": 0}


def refresh_ivf_index(spark: SparkSession, store: CollectionStore, collection: str) -> dict:
    """Incremental maintenance against the FROZEN centroids: assign only
    chunks without an assignment row (anti-join on key) and append into
    their cell partitions; drop rows for deleted chunks by rewriting only
    the cell partitions that contained them."""
    from dataingestionplayground_spark.operators.similarity import _assign_cells_matmul

    meta = _load_ivf_meta(store, collection)
    idx = _ivf_dir(store, collection)
    cells_path = os.path.join(idx, "cells")
    chunks = store.read(spark, collection).select("key", "documentid", "embedding")
    assigned = read_ivf_assignments(spark, store, collection)

    new = chunks.join(assigned.select("key"), "key", "left_anti")
    appended = new.count()
    if appended:
        soft = int(meta.get("assign_top", 1)) > 1
        (
            _assign_cells_matmul(
                new, _ivf_cents_df(spark, meta), "key", "embedding",
                extra_cols=("documentid",), keep=int(meta.get("assign_top", 1)),
                emit_rank=soft,
                soft_margin=meta.get("assign_margin"),
            )
            .select(
                "key", "documentid",
                *(("cell_rank", "cell_1") if soft else ()), "cell",
            )
            .repartition("cell")
            .write.mode("append")
            .partitionBy("cell")
            .option("compression", "zstd")
            .parquet(cells_path)
        )
        assigned = read_ivf_assignments(spark, store, collection)

    orphans = assigned.join(chunks.select("key"), "key", "left_anti")
    removed = orphans.count()
    if removed:
        # dynamic partition overwrite: ONLY the cells that lost a chunk
        # are rewritten — the untouched partitions' files stay in place
        hot_cells = [r["cell"] for r in orphans.select("cell").distinct().collect()]
        non_null = [c for c in hot_cells if c is not None]
        cond = F.col("cell").isin(non_null)
        if len(non_null) < len(hot_cells):  # null cell: isin never matches it
            cond = cond | F.col("cell").isNull()
        kept = (
            assigned.filter(cond)
            .join(chunks.select("key"), "key", "left_semi")
            .localCheckpoint(eager=True)
        )
        survivors = {r["cell"] for r in kept.select("cell").distinct().collect()}
        if survivors:
            (
                kept.repartition("cell")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("cell")
                .option("compression", "zstd")
                .parquet(cells_path)
            )
        # dynamic overwrite only rewrites partitions PRESENT in `kept`:
        # a cell whose every chunk was deleted has zero surviving rows,
        # so its partition would never be rewritten and the stale rows
        # would be re-reported as `removed` on every refresh — drop the
        # emptied partition directories explicitly
        for c in hot_cells:
            if c not in survivors:
                part = (
                    "cell=__HIVE_DEFAULT_PARTITION__"
                    if c is None
                    else f"cell={c}"
                )
                shutil.rmtree(os.path.join(cells_path, part), ignore_errors=True)
    return {"appended": appended, "removed": removed}


def merge_ivf_assignments(
    spark: SparkSession,
    store: CollectionStore,
    collection: str,
    batch: DataFrame,
    epoch_id: int,
) -> int:
    """Epoch-staged streaming maintenance of the IVF assignment table —
    the merge_dup_rate_state discipline applied to the vector index
    (r13 verdict item 5: at 100 TB a full IVF retrain per crawl
    increment is the textbook scale-killer; the index must ingest
    increments like every other maintained artifact).

    Each batch of chunk rows (key, documentid, embedding) is assigned
    against the FROZEN centroids from the index metadata (one broadcast
    Arrow matmul stage — the corpus never shuffles) and staged into the
    touched cell partitions tagged with ``epoch_id``. Exactly-once under
    foreachBatch retries: merging epoch E first drops rows already
    tagged E in the touched cells, then drops stored rows whose key
    re-arrives in this batch (same-embedding cross-epoch redelivery
    upserts in place — identical embedding lands in the identical cell),
    then writes kept + fresh via dynamic partition overwrite, so a
    replay converges to the identical table. Base rows from
    :func:`build_ivf_index` (no epoch column, read as epoch NULL) are
    never replaced — batch seed + streaming maintenance composes.

    Contract: APPEND/UPSERT ingest. An embedding UPDATE that moves a key
    to a different cell, and deletions, reconcile through
    :func:`refresh_ivf_index` (which anti-joins the store both ways) —
    the maintainer never reads untouched cell partitions, that is the
    point. Retrain is a SIGNAL, not a side effect: read
    :func:`ivf_retrain_signal` after merging. Returns cell partitions
    touched."""
    from dataingestionplayground_spark.operators.similarity import (
        _assign_cells_matmul,
    )

    meta = _load_ivf_meta(store, collection)
    cells_path = os.path.join(_ivf_dir(store, collection), "cells")
    soft = int(meta.get("assign_top", 1)) > 1
    rank_cols = ("cell_rank", "cell_1") if soft else ()
    fresh = (
        _assign_cells_matmul(
            batch.select("key", "documentid", "embedding"),
            _ivf_cents_df(spark, meta),
            "key",
            "embedding",
            extra_cols=("documentid",),
            # soft assignment is part of the frozen quantizer contract:
            # the maintainer must store each key in the same assign_top
            # cells (and the same boundary margin) the builder would,
            # or maintained != rebuilt
            keep=int(meta.get("assign_top", 1)),
            emit_rank=soft,
            soft_margin=meta.get("assign_margin"),
        )
        .select("key", "documentid", *rank_cols, "cell")
        .withColumn("epoch_id", F.lit(int(epoch_id)).cast("long"))
        .localCheckpoint(eager=True)  # consumed for cells, keys, and the write
    )
    hot = [r["cell"] for r in fresh.select("cell").distinct().collect()]
    if not hot:
        return 0
    existing = read_ivf_assignments(spark, store, collection)
    if "epoch_id" not in existing.columns:
        existing = existing.withColumn("epoch_id", F.lit(None).cast("long"))
    non_null = [c for c in hot if c is not None]
    cond = F.col("cell").isin(non_null)
    if len(non_null) < len(hot):  # null cell: isin never matches it
        cond = cond | F.col("cell").isNull()
    out_cols = ["key", "documentid", *rank_cols, "epoch_id", "cell"]
    for rc in rank_cols:
        if rc not in existing.columns:  # pre-r15 soft table: no rank info
            existing = existing.withColumn(rc, F.lit(None).cast("int"))
    kept = (
        existing.filter(cond)
        .filter(F.col("epoch_id").isNull() | (F.col("epoch_id") != int(epoch_id)))
        .join(fresh.select("key"), "key", "left_anti")
        .select(*out_cols)
    )
    merged = kept.unionByName(fresh.select(*out_cols)).localCheckpoint(
        eager=True
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.repartition("cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .option("compression", "zstd")
            .parquet(cells_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return len(hot)


def compact_ivf_assignments(
    spark: SparkSession, store: CollectionStore, collection: str
) -> int:
    """Fold per-epoch assignment rows down to epoch-NULL rows (one per
    key — assignments are facts, not counts, so the fold is just
    dropping the epoch tag). Run only AFTER the maintaining stream's
    checkpoint has committed those epochs (the compact_topk_rollup
    caveat: a replayed compacted-away epoch can no longer find its rows
    and would re-append them). Returns cell partitions rewritten.

    r15 ADVICE: only cells that actually HOLD epoch-tagged rows are
    rewritten (dynamic partition overwrite of the touched cells), and a
    table with nothing staged short-circuits to 0 — repeated compaction
    of a quiet index used to be a full-table rewrite every call."""
    assigned = read_ivf_assignments(spark, store, collection)
    if "epoch_id" not in assigned.columns:
        return 0
    staged_cells = [
        r["cell"]
        for r in assigned.filter(F.col("epoch_id").isNotNull())
        .select("cell")
        .distinct()
        .collect()
    ]
    if not staged_cells:
        return 0
    non_null = [c for c in staged_cells if c is not None]
    cond = F.col("cell").isin(non_null)
    if len(non_null) < len(staged_cells):  # isin never matches NULL
        cond = cond | F.col("cell").isNull()
    rank_cols = [c for c in ("cell_rank", "cell_1") if c in assigned.columns]
    merged = (
        assigned.filter(cond)
        .withColumn("epoch_id", F.lit(None).cast("long"))
        .select("key", "documentid", *rank_cols, "epoch_id", "cell")
        .localCheckpoint(eager=True)
    )
    cells = staged_cells
    cells_path = os.path.join(_ivf_dir(store, collection), "cells")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.repartition("cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .option("compression", "zstd")
            .parquet(cells_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return len(cells)


def ivf_retrain_signal(
    spark: SparkSession,
    store: CollectionStore,
    collection: str,
    skew_threshold: float = 2.0,
) -> dict:
    """Drift-triggered retrain signal over the MAINTAINED assignment
    table — the vector_cell_balance diagnostic pointed at the live
    index instead of an ad-hoc quantization. The frozen centroids go
    stale as the corpus drifts; the cheap tell is occupancy skew:
    ``skew = max cell share / ideal share (1/n_cells)``. When it
    crosses ``skew_threshold`` the hottest probe melts a reducer and
    ADC/rerank cost concentrates — retrain (re-run build_ivf_index)
    instead of merging further. Reading the signal costs one
    assignment-table agg (cell counts), never a corpus scan."""
    meta = _load_ivf_meta(store, collection)
    counts = (
        read_ivf_assignments(spark, store, collection)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )
    n_assigned = sum(r["n"] for r in counts)
    max_cell = max((r["n"] for r in counts), default=0)
    n_cells = int(meta["n_cells"])
    max_share = (max_cell / n_assigned) if n_assigned else 0.0
    skew = max_share * n_cells
    return {
        "n_cells": n_cells,
        "n_assigned": n_assigned,
        "max_cell_share": round(max_share, 6),
        "skew": round(skew, 6),
        "retrain": bool(skew >= skew_threshold),
    }


def ivfpq_retrain_signal(
    spark: SparkSession,
    store: CollectionStore,
    collection: str,
    skew_threshold: float = 2.0,
) -> dict:
    """The IVFADC twin of :func:`ivf_retrain_signal` (r15 ADVICE: the
    CLI used to route ``signal --kind ivfpq`` to the IVF metadata and
    report the wrong index's skew). Occupancy is read from the
    maintained CODE table's coarse-cell column — one cell-count agg,
    never a corpus scan. Skew here degrades both the probe balance AND
    the residual codebook fit (residuals are trained per the original
    cell geometry), so the same threshold semantics apply."""
    meta = _load_ivfpq_meta(store, collection)
    counts = (
        read_ivfpq_codes(spark, store, collection)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )
    n_assigned = sum(r["n"] for r in counts)
    max_cell = max((r["n"] for r in counts), default=0)
    n_cells = int(meta["n_cells"])
    max_share = (max_cell / n_assigned) if n_assigned else 0.0
    skew = max_share * n_cells
    return {
        "n_cells": n_cells,
        "n_assigned": n_assigned,
        "max_cell_share": round(max_share, 6),
        "skew": round(skew, 6),
        "retrain": bool(skew >= skew_threshold),
    }


def ivf_search_indexed(
    spark: SparkSession,
    store: CollectionStore,
    collection: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k over only the ``n_probe`` nearest cells per
    query. Probe cells are computed driver-side from the (tiny) query set
    against the frozen centroid matrix, so the assignment scan carries a
    LITERAL cell filter — static parquet partition pruning, visible as
    PartitionFilters in the plan; full-precision vectors are then read
    for candidate keys only (semi-join into the collection).
    Returns (query_id, key, score, rank)."""
    import numpy as np

    from dataingestionplayground_spark.functions import vector as V

    meta = _load_ivf_meta(store, collection)
    C = np.asarray(meta["cents"], dtype=np.float64)
    from pyspark.sql import types as T

    qid_field = queries.schema[query_id]
    q_rows = queries.select(query_id, query_vec).collect()  # query set: tiny by contract
    if not q_rows:
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    qid_field,
                    T.StructField("key", T.StringType(), True),
                    T.StructField("score", T.DoubleType(), True),
                    T.StructField("rank", T.IntegerType(), True),
                ]
            ),
        )
    E = np.vstack([np.asarray(r[query_vec], dtype=np.float64) for r in q_rows])
    cn = np.sqrt((C * C).sum(axis=1))
    en = np.sqrt((E * E).sum(axis=1))
    with np.errstate(divide="ignore", invalid="ignore"):
        sims = (E @ C.T) / (en[:, None] * cn[None, :])
    sims = np.where(np.isfinite(sims), sims, -np.inf)
    order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]  # ties -> lowest cell
    probes = [
        (r[query_id], [int(c) for c in order[i]]) for i, r in enumerate(q_rows)
    ]
    all_cells = sorted({c for _, cs in probes for c in cs})
    assigned = read_ivf_assignments(spark, store, collection).filter(
        F.col("cell").isin(all_cells)  # literal -> static partition pruning
    )
    probe_df = F.broadcast(
        spark.createDataFrame(
            [(qid, c) for qid, cs in probes for c in cs],
            T.StructType([qid_field, T.StructField("cell", T.IntegerType(), False)]),
        )
    )
    if int(meta.get("assign_top", 1)) > 1:
        # soft assignment stores a key in several cells; a (query, key)
        # pair reachable through two probed cells must score once, not
        # occupy two of the k result slots. With rank info stored
        # (r15 schema: cell_rank + cell_1) the duplicate copy is
        # dropped by a broadcast FILTER — keep a secondary copy only
        # when this query did NOT probe the key's primary cell — so no
        # (query, key)-keyed dedup Exchange is added (measured: the
        # shuffle was +1.1 s on the sf1.0 bench row). Tables written
        # before the rank schema fall back to the dedup shuffle.
        if "cell_rank" in assigned.columns:
            marker = F.broadcast(
                probe_df.select(
                    query_id, F.col("cell").alias("cell_1")
                ).withColumn("__pp", F.lit(True))
            )
            cand = (
                assigned.join(probe_df, "cell")
                .join(marker, [query_id, "cell_1"], "left")
                .filter(
                    (F.coalesce(F.col("cell_rank"), F.lit(1)) == 1)
                    | F.col("__pp").isNull()
                )
                .select(query_id, "key")
            )
        else:
            cand = (
                assigned.join(probe_df, "cell")
                .select(query_id, "key")
                .dropDuplicates([query_id, "key"])
            )
    else:
        cand = assigned.join(probe_df, "cell").select(query_id, "key")
    vecs = store.read(spark, collection).select("key", "embedding")
    # `cand` is ~n_probe/n_cells of the whole corpus — distributed-sized,
    # NEVER broadcast it; only probe_df and the query frame are tiny by
    # contract. AQE still picks a broadcast join at runtime when the
    # probed cells happen to be small.
    scored = (
        vecs.join(cand, "key")
        .join(F.broadcast(queries.select(query_id, query_vec)), query_id)
        .withColumn("score", V.cosine_similarity("embedding", query_vec))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(F.desc_nulls_last("score"), F.asc("key"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "key", "score", "rank")
    )


# ---------------------------------------------------------------------------
# IVFPQ index: the third member — the IVFADC composition (Jégou et al.
# 2011) as a PERSISTED artifact. Where the PQ index compresses the scan
# and the IVF index prunes it, IVFPQ does both: the stored table holds
# residual-PQ codes PARTITIONED BY COARSE CELL, so a probed search
# partition-prunes to n_probe cells AND reads only int codes inside
# them. Same lifecycle contract: centroids + residual codebook FROZEN
# at build (ivfpq.json); refresh assigns/encodes only new chunks
# against the frozen quantizers (anti-join); deletion rewrites only the
# affected cell partitions.
# ---------------------------------------------------------------------------

_IVFPQ_META = "ivfpq.json"


def _ivfpq_dir(store: CollectionStore, collection: str) -> str:
    store._path(collection)
    return os.path.join(store.base_path, "_indexes", collection, "ivfpq")


def _residualize(
    chunks: DataFrame, cents_df: DataFrame, dims: int, keep: int = 1
) -> DataFrame:
    """(key, documentid, cell, res) — L2 nearest coarse cell(s) (ties
    to the lowest id) + the double-valued residual, via the broadcast
    expression assigner shared with the batch operator. ``keep > 1`` is
    the IVFADC face of soft assignment (r15): a key is residual-encoded
    against EACH of its ``keep`` nearest cells (the residual, and so
    the stored code, is per-cell)."""
    from dataingestionplayground_spark.operators.similarity import _l2_assign

    cents = cents_df.select("centroid_id", "cent_vec")
    asg = _l2_assign(
        chunks.select("key", "documentid", "embedding"),
        cents,
        "embedding",
        "key",
        dims,
        keep=max(1, int(keep)),
    )
    ids = chunks.select("key", "documentid")
    return (
        asg.withColumnRenamed("__res", "res")
        .withColumnRenamed("centroid_id", "cell")
        .join(ids, "key")
    )


def build_ivfpq_index(
    spark: SparkSession,
    store: CollectionStore,
    collection: str,
    n_cells: int = 8,
    m: int = 8,
    n_centroids: int = 16,
    dims: int = 384,
    centroid_mode: str = "kmeans",
    kmeans_iters: int = 2,
    codebook_mode: str = "kmeans",
    assign_top: int = 1,
) -> dict:
    """Derive coarse centroids, PQ-train the RESIDUAL codebook, encode
    every chunk, persist codes partitioned by cell + frozen quantizers.
    Residual training is the accuracy step: after subtracting the cell
    centroid the codebook models a zero-centered ball, so the same m x k
    budget spends its precision on local structure.

    ``assign_top`` (r15): soft coarse assignment — each chunk is
    residual-encoded into its N nearest cells (a per-cell residual, so
    a per-cell code), the IVFADC twin of build_ivf_index's recall
    lever; the codebook itself trains on the argmax residuals only
    (keep=1), so assign_top changes WHERE codes live, never the frozen
    quantizers. Meta-recorded; merge/refresh maintain the same
    fan-out; search keeps each key's best ADC distance."""
    from dataingestionplayground_spark.operators.similarity import (
        _pq_codebook,
        _seed_centroids,
        kmeans_centroids,
    )

    if dims % m != 0:
        raise ValueError(f"dims {dims} not divisible by m {m}")
    chunks = store.read(spark, collection).select("key", "documentid", "embedding")
    if centroid_mode == "kmeans":
        cents = kmeans_centroids(chunks, n_cells, kmeans_iters, "key", "embedding")
    elif centroid_mode == "sampled":
        from dataingestionplayground_spark.operators.similarity import (
            sampled_kmeans_centroids,
        )

        cents = sampled_kmeans_centroids(
            chunks, n_cells, kmeans_iters, "key", "embedding"
        )
    elif centroid_mode == "seed":
        cents = _seed_centroids(chunks, "key", "embedding", n_cells)
    else:
        raise ValueError(
            f"centroid_mode must be 'seed', 'kmeans', or 'sampled': {centroid_mode!r}"
        )
    coarse = [
        [float(x) for x in r["cent_vec"]]
        for r in cents.orderBy("centroid_id").collect()
    ]
    cents_df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(coarse)], "centroid_id int, cent_vec array<float>"
    )
    residuals = _residualize(chunks, cents_df, dims)
    codebook = _pq_codebook(residuals, m, n_centroids, dims, "key", "res", codebook_mode)
    cb_rows = codebook.collect()[0]["cents"]
    # kmeans refinement DROPS a seed that wins no vectors, and residual
    # distributions (concentrated near zero) make that common — so the
    # codebook can be RAGGED across subspaces. Codes index into each
    # subspace's cid-sorted PRESENT entries (that is what the encoder's
    # filtered array_position produces), so search must address the flat
    # LUT with per-subspace cumulative offsets, not a fixed m x k stride.
    sub_counts = [0] * m
    for c in cb_rows:
        sub_counts[int(c["s"])] += 1
    if any(n == 0 for n in sub_counts):
        raise ValueError(f"subspace with empty codebook: counts {sub_counts}")
    meta = {
        "n_cells": len(coarse),
        "m": m,
        "n_centroids": max(sub_counts),
        "sub_counts": sub_counts,
        "dims": dims,
        "centroid_mode": centroid_mode,
        "codebook_mode": codebook_mode,
        "assign_top": max(1, int(assign_top)),
        "coarse": coarse,
        "cents": [(c["s"], c["cid"], [float(x) for x in c["v"]]) for c in cb_rows],
    }
    if meta["assign_top"] > 1:
        # re-residualize with the soft fan-out for the STORED codes
        # (codebook training above stays on the argmax residuals)
        residuals = _residualize(chunks, cents_df, dims, keep=meta["assign_top"])
    codes = pq_encode_with_codebook(
        residuals, _codebook_df(spark, meta), m, dims, "key", "res",
        extra_cols=("documentid", "cell"),
    )
    idx = _ivfpq_dir(store, collection)
    (
        codes.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .option("compression", "zstd")
        .parquet(os.path.join(idx, "codes"))
    )
    os.makedirs(idx, exist_ok=True)
    with open(os.path.join(idx, _IVFPQ_META), "w") as f:
        json.dump(meta, f)
    return meta


def _load_ivfpq_meta(store: CollectionStore, collection: str) -> dict:
    path = os.path.join(_ivfpq_dir(store, collection), _IVFPQ_META)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no IVFPQ index for collection {collection!r}; run build_ivfpq_index first"
        )
    return json.load(open(path))


def read_ivfpq_codes(
    spark: SparkSession, store: CollectionStore, collection: str
) -> DataFrame:
    codes = os.path.join(_ivfpq_dir(store, collection), "codes")
    has_data = any(
        f.endswith(".parquet") for _, _, files in os.walk(codes) for f in files
    )
    if not has_data:
        meta = _load_ivfpq_meta(store, collection)
        cols = ", ".join(f"code_{s} int" for s in range(meta["m"]))
        return spark.createDataFrame([], f"key string, documentid string, {cols}, cell int")
    # mergeSchema: merge_ivfpq_codes stages epoch-tagged rows next to
    # epoch-less base/refresh rows (read back as epoch_id NULL)
    return spark.read.option("mergeSchema", "true").parquet(codes)


def merge_ivfpq_codes(
    spark: SparkSession,
    store: CollectionStore,
    collection: str,
    batch: DataFrame,
    epoch_id: int,
) -> int:
    """Epoch-staged streaming maintenance for the IVFADC index — the
    third member of the maintained-index family (IVF assignments, PQ
    codes, and now their composition): each chunk batch is assigned to
    its FROZEN coarse cell, residual-encoded against the FROZEN PQ
    codebook, and epoch-staged into the touched cell partitions with
    the merge_ivf_assignments discipline (same-epoch retries replace
    their own rows; cross-epoch key redelivery upserts in place; base
    rows from build_ivfpq_index read as epoch NULL and are never
    replaced). Updates that MOVE a key across cells, and deletions,
    reconcile through :func:`refresh_ivfpq_index`. Returns cell
    partitions touched."""
    meta = _load_ivfpq_meta(store, collection)
    codes_path = os.path.join(_ivfpq_dir(store, collection), "codes")
    cents_df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(meta["coarse"])],
        "centroid_id int, cent_vec array<float>",
    )
    residuals = _residualize(
        batch.select("key", "documentid", "embedding"), cents_df, meta["dims"],
        keep=int(meta.get("assign_top", 1)),  # frozen-quantizer contract
    )
    code_cols = [f"code_{s}" for s in range(meta["m"])]
    fresh = (
        pq_encode_with_codebook(
            residuals, _codebook_df(spark, meta), meta["m"], meta["dims"],
            "key", "res", extra_cols=("documentid", "cell"),
        )
        .select("key", "documentid", *code_cols, "cell")
        .withColumn("epoch_id", F.lit(int(epoch_id)).cast("long"))
        .localCheckpoint(eager=True)  # consumed for cells, keys, the write
    )
    hot = [r["cell"] for r in fresh.select("cell").distinct().collect()]
    if not hot:
        return 0
    existing = read_ivfpq_codes(spark, store, collection)
    if "epoch_id" not in existing.columns:
        existing = existing.withColumn("epoch_id", F.lit(None).cast("long"))
    non_null = [c for c in hot if c is not None]
    cond = F.col("cell").isin(non_null)
    if len(non_null) < len(hot):
        cond = cond | F.col("cell").isNull()
    out_cols = ["key", "documentid", *code_cols, "epoch_id", "cell"]
    kept = (
        existing.filter(cond)
        .filter(F.col("epoch_id").isNull() | (F.col("epoch_id") != int(epoch_id)))
        .join(fresh.select("key"), "key", "left_anti")
        .select(*out_cols)
    )
    merged = kept.unionByName(fresh.select(*out_cols)).localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.repartition("cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .option("compression", "zstd")
            .parquet(codes_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return len(hot)


def compact_ivfpq_codes(
    spark: SparkSession, store: CollectionStore, collection: str
) -> int:
    """Fold per-epoch IVFADC code rows down to epoch-NULL rows (codes
    are facts keyed by chunk — the fold just drops the tag). Run only
    AFTER the maintaining stream's checkpoint has committed those
    epochs. Returns cell partitions rewritten.

    r15 ADVICE: same touched-cells-only discipline as
    :func:`compact_ivf_assignments` — nothing staged short-circuits to
    0, and only cells holding epoch-tagged rows are rewritten."""
    codes = read_ivfpq_codes(spark, store, collection)
    if "epoch_id" not in codes.columns:
        return 0
    staged_cells = [
        r["cell"]
        for r in codes.filter(F.col("epoch_id").isNotNull())
        .select("cell")
        .distinct()
        .collect()
    ]
    if not staged_cells:
        return 0
    non_null = [c for c in staged_cells if c is not None]
    cond = F.col("cell").isin(non_null)
    if len(non_null) < len(staged_cells):  # isin never matches NULL
        cond = cond | F.col("cell").isNull()
    merged = (
        codes.filter(cond)
        .withColumn("epoch_id", F.lit(None).cast("long"))
        .localCheckpoint(eager=True)
    )
    cells = staged_cells
    codes_path = os.path.join(_ivfpq_dir(store, collection), "codes")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.repartition("cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .option("compression", "zstd")
            .parquet(codes_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return len(cells)


def ivfpq_index_staleness(
    spark: SparkSession, store: CollectionStore, collection: str
) -> dict:
    keys = store.read(spark, collection).select("key")
    codes = read_ivfpq_codes(spark, store, collection).select("key")
    return {
        "missing": keys.join(codes, "key", "left_anti").count(),
        "orphaned": codes.join(keys, "key", "left_anti").count(),
    }


def refresh_ivfpq_index(
    spark: SparkSession, store: CollectionStore, collection: str
) -> dict:
    """Incremental maintenance against BOTH frozen quantizers: new
    chunks (anti-join on key) are assigned to their frozen coarse cell,
    residual-encoded with the frozen codebook, and appended into their
    cell partitions; deleted chunks rewrite only the cells that held
    them (the IVF deletion pattern, emptied partitions dropped)."""
    meta = _load_ivfpq_meta(store, collection)
    idx = _ivfpq_dir(store, collection)
    codes_path = os.path.join(idx, "codes")
    chunks = store.read(spark, collection).select("key", "documentid", "embedding")
    codes = read_ivfpq_codes(spark, store, collection)

    new = chunks.join(codes.select("key"), "key", "left_anti")
    appended = new.count()
    if appended:
        cents_df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(meta["coarse"])],
            "centroid_id int, cent_vec array<float>",
        )
        residuals = _residualize(
            new, cents_df, meta["dims"], keep=int(meta.get("assign_top", 1))
        )
        (
            pq_encode_with_codebook(
                residuals, _codebook_df(spark, meta), meta["m"], meta["dims"],
                "key", "res", extra_cols=("documentid", "cell"),
            )
            .repartition("cell")
            .write.mode("append")
            .partitionBy("cell")
            .option("compression", "zstd")
            .parquet(codes_path)
        )
        codes = read_ivfpq_codes(spark, store, collection)

    orphans = codes.join(chunks.select("key"), "key", "left_anti")
    removed = orphans.count()
    if removed:
        hot_cells = [r["cell"] for r in orphans.select("cell").distinct().collect()]
        kept = (
            codes.filter(F.col("cell").isin(hot_cells))
            .join(chunks.select("key"), "key", "left_semi")
            .localCheckpoint(eager=True)
        )
        survivors = {r["cell"] for r in kept.select("cell").distinct().collect()}
        if survivors:
            (
                kept.repartition("cell")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("cell")
                .option("compression", "zstd")
                .parquet(codes_path)
            )
        for c in hot_cells:
            if c not in survivors:
                shutil.rmtree(
                    os.path.join(codes_path, f"cell={c}"), ignore_errors=True
                )
    return {"appended": appended, "removed": removed}


def ivfpq_search_indexed(
    spark: SparkSession,
    store: CollectionStore,
    collection: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    rerank: int | str | None = "auto",
) -> DataFrame:
    """IVFADC search off the persisted index: probe cells and the
    per-(query, cell) residual ADC lookup tables are computed
    DRIVER-SIDE from the tiny query set against the frozen quantizers
    (queries x n_probe x m x k doubles), the code scan carries a
    LITERAL cell filter (static parquet partition pruning), and scoring
    is m array lookups per code row. ``rerank='auto'`` (16*k) fetches
    full-precision vectors for the shortlist only and reranks by exact
    cosine — the same recall-recovery contract as pq_search_indexed.
    Returns (query_id, key, score, rank) with rerank, else
    (query_id, key, adc_dist, rank)."""
    import numpy as np

    from pyspark.sql import Window
    from pyspark.sql import types as T

    from dataingestionplayground_spark.functions import vector as V

    if rerank == "auto":
        rerank = 16 * k
    meta = _load_ivfpq_meta(store, collection)
    m, dims = meta["m"], meta["dims"]
    dsub = dims // m
    C = np.asarray(meta["coarse"], dtype=np.float64)
    # codebook per subspace: cid-SORTED present entries — codes index
    # into this list (the encoder's filtered array_position), and the
    # flat LUT is addressed by per-subspace cumulative offsets because
    # kmeans refinement can leave the codebook ragged
    sub_entries: list[list] = [[] for _ in range(m)]
    for s, cid, v in sorted(meta["cents"], key=lambda c: (int(c[0]), int(c[1]))):
        sub_entries[int(s)].append(np.asarray(v, dtype=np.float64))
    cb = [np.vstack(e) for e in sub_entries]
    offs = [0] * m
    for s in range(1, m):
        offs[s] = offs[s - 1] + len(cb[s - 1])

    qid_field = queries.schema[query_id]
    q_rows = queries.select(query_id, query_vec).collect()
    if not q_rows:
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    qid_field,
                    T.StructField("key", T.StringType(), True),
                    T.StructField("score" if rerank else "adc_dist", T.DoubleType(), True),
                    T.StructField("rank", T.IntegerType(), True),
                ]
            ),
        )
    lut_rows = []
    for r in q_rows:
        q = np.asarray(r[query_vec], dtype=np.float64)
        d2 = ((C - q[None, :]) ** 2).sum(axis=1)
        order = np.argsort(d2, kind="stable")[:n_probe]  # ties -> lowest cell
        for c in order:
            qres = q - C[int(c)]
            lut = []
            for s in range(m):
                sub = qres[s * dsub : (s + 1) * dsub]
                lut.extend(((cb[s] - sub[None, :]) ** 2).sum(axis=1).tolist())
            lut_rows.append((r[query_id], int(c), lut))  # flat, offs-addressed
    all_cells = sorted({c for _, c, _ in lut_rows})
    lut_df = F.broadcast(
        spark.createDataFrame(
            lut_rows,
            T.StructType(
                [
                    qid_field,
                    T.StructField("cell", T.IntegerType(), False),
                    T.StructField("lut", T.ArrayType(T.DoubleType()), False),
                ]
            ),
        )
    )
    codes = read_ivfpq_codes(spark, store, collection).filter(
        F.col("cell").isin(all_cells)  # literal -> static partition pruning
    )
    score = " + ".join(
        f"element_at(lut, {offs[s]} + code_{s} + 1)" for s in range(m)
    )
    depth = max(k, rerank) if rerank else k
    scored = codes.join(lut_df, "cell").withColumn("adc_dist", F.expr(score))
    if int(meta.get("assign_top", 1)) > 1:
        # soft assignment stores a key's code in several cells; a key
        # reachable through two probed cells scores once (its best ADC
        # estimate), not twice
        scored = scored.groupBy(query_id, "key").agg(
            F.min("adc_dist").alias("adc_dist")
        )
    w = Window.partitionBy(query_id).orderBy(F.asc("adc_dist"), F.asc("key"))
    adc = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= depth)
        .select(query_id, "key", F.round("adc_dist", 9).alias("adc_dist"), "rank")
    )
    if not rerank:
        return adc
    short = adc.select(query_id, "key")
    rescored = (
        store.read(spark, collection)
        .select("key", "embedding")
        .join(F.broadcast(short), "key")
        .join(F.broadcast(queries.select(query_id, query_vec)), query_id)
        .withColumn("score", V.cosine_similarity("embedding", query_vec))
    )
    w2 = Window.partitionBy(query_id).orderBy(F.desc_nulls_last("score"), F.asc("key"))
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(query_id, "key", "score", "rank")
    )
