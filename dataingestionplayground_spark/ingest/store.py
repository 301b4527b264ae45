"""Collection store (S5/S6 in SURVEY.md §2.1): named chunk collections as
parquet tables under a base path.

Mirrors the reference's vector store surface: write a collection
(``CreateVectorStoreWriter``, ``VectorStoreCommands.cs:153-161``), list
collections (``:141-148``), read one back with its declared schema
(``GetDynamicCollection``, ``:106``). ``incremental=True`` implements the
``IncrementalIngestion`` option the reference leaves off (``:159``):
only documents not yet present are appended (anti-join on documentid —
Delta MERGE territory; emulated since no Delta jars in this image).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestionplayground_spark.sources.schemas import CHUNK_SCHEMA


_FORMATS = ("parquet", "orc")


def reassemble_documents(chunks: DataFrame, sep: str = " ") -> DataFrame:
    """Rebuild ``(documentid, text)`` from chunk rows in chunk order.

    ``collect_list`` order is partition-dependent, so the aggregate
    collects ``(chunk_idx, key, content)`` structs and sorts them before
    joining: ``chunk_idx`` is the true ordinal; ``key`` breaks ties and
    orders legacy rows (collections written before ``chunk_idx`` existed
    read the column as null — coalesced last, then by key, so the output
    is still deterministic run-to-run).
    """
    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                F.coalesce(F.col("chunk_idx"), F.lit(2**31 - 1)).alias("chunk_idx"),
                F.col("key").alias("key"),
                F.col("content").alias("content"),
            )
        )
    )
    return chunks.groupBy("documentid").agg(
        F.array_join(F.transform(ordered, lambda x: x["content"]), sep).alias("text")
    )


class CollectionStore:
    """``fmt`` picks the on-disk columnar format for NEW collections:
    ``parquet`` (default) or ``orc`` — both JVM-native writers, both
    zstd-compressed, identical plan shapes (columnar scan with pushdown).
    Reads auto-detect from the data files' extension, so one store can
    hold collections in either format and a format migration is just
    ``compact()`` under a store constructed with the new ``fmt``.
    """

    def __init__(self, base_path: str, fmt: str = "parquet"):
        if fmt not in _FORMATS:
            raise ValueError(f"fmt must be one of {_FORMATS}: {fmt!r}")
        self.base_path = base_path
        self.fmt = fmt

    # must start alphanumeric: excludes '.', '..', dotfiles, and any
    # separator — drop('..') would rmtree the PARENT of base_path and
    # write(mode=overwrite) would clobber it, so names are allow-listed,
    # not deny-listed.
    _NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")

    def _path(self, collection: str) -> str:
        if not collection or not self._NAME_RE.match(collection):
            raise ValueError(f"bad collection name: {collection!r}")
        path = os.path.join(self.base_path, collection)
        # defense in depth: the resolved path must stay inside base_path
        base = os.path.realpath(self.base_path)
        real = os.path.realpath(path)
        if os.path.commonpath([real, base]) != base:
            raise ValueError(f"collection escapes base path: {collection!r}")
        self._recover(path)
        return path

    @staticmethod
    def _swap_in(path: str, tmp: str) -> None:
        """Atomic-enough replace of ``path`` by ``tmp``: the old dir is
        renamed aside BEFORE the new one moves in, so there is no window
        where the collection's data exists only under a temp name. A crash
        at any point is repaired by ``_recover``.
        """
        old = path + ".old"
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)

    @staticmethod
    def _recover(path: str) -> None:
        """Repair a crash mid-``_swap_in``. Invariants: ``.old`` only
        exists once the replacement dir is fully written; ``path`` missing
        with ``.old`` present means the crash hit between the two renames,
        so the completed replacement (whichever ``*-tmp`` dir exists) is
        promoted — else ``.old`` is restored. Leftover dirs from a crash
        BEFORE the swap (incomplete rewrites) are ignored; the next
        compact/delete overwrites them.
        """
        old = path + ".old"
        if not os.path.exists(old):
            return
        if not os.path.exists(path):
            for suffix in (".compact-tmp", ".delete-tmp"):
                tmp = path + suffix
                if os.path.exists(tmp):
                    os.rename(tmp, path)
                    break
            else:
                os.rename(old, path)
        if os.path.exists(old) and os.path.exists(path):
            shutil.rmtree(old)

    def list_collections(self) -> list[str]:
        """S6: enumerate collection names (catalog listing). Dot- and
        underscore-prefixed dirs are store internals (e.g. ``_indexes``,
        in-flight swap dirs), not collections — same convention as
        Spark's ``_``-prefixed data files."""
        if not os.path.isdir(self.base_path):
            return []
        return sorted(
            d for d in os.listdir(self.base_path)
            if os.path.isdir(os.path.join(self.base_path, d))
            and self._NAME_RE.match(d)
        )

    def exists(self, collection: str) -> bool:
        return os.path.isdir(self._path(collection))

    def _detect_fmt(self, path: str) -> str:
        """Format of an existing collection, from its data files' extension
        (falls back to the store default for empty/new dirs)."""
        if os.path.isdir(path):
            for f in os.listdir(path):
                if f.startswith(".") or f.startswith("_"):
                    continue
                for fmt in _FORMATS:
                    if f.endswith("." + fmt) or ("." + fmt + ".") in f:
                        return fmt
        return self.fmt

    def read(self, spark: SparkSession, collection: str) -> DataFrame:
        path = self._path(collection)
        return (
            spark.read.schema(CHUNK_SCHEMA).format(self._detect_fmt(path)).load(path)
        )

    def write(self, chunks: DataFrame, collection: str, incremental: bool = False) -> None:
        """S5: chunk sink. Full re-ingest (reference default) overwrites;
        incremental appends only chunks of unseen documentids.

        Chunks are repartitioned by documentid so a document's chunks
        co-locate — reads that reassemble a document touch one partition.
        """
        path = self._path(collection)
        out = chunks.select([f.name for f in CHUNK_SCHEMA.fields])
        if incremental and self.exists(collection):
            spark = chunks.sparkSession
            existing = self.read(spark, collection).select("documentid").distinct()
            out = out.join(existing, "documentid", "left_anti")
            # append in the collection's EXISTING format — a store default
            # flipped mid-life must not produce a mixed-format directory
            (
                out.repartition("documentid")
                .write.option("compression", "zstd")
                .mode("append")
                .format(self._detect_fmt(path))
                .save(path)
            )
        else:
            (
                out.repartition("documentid")
                .write.option("compression", "zstd")
                .mode("overwrite")
                .format(self.fmt)
                .save(path)
            )

    def compact(self, spark: SparkSession, collection: str, num_files: int = 1) -> int:
        """Rewrite a collection into ``num_files`` parquet files (still
        co-located by documentid) — the small-files answer for a sink fed
        by many incremental appends: at scale, thousands of tiny appended
        files dominate scan planning time. Returns the data file count
        after compaction. The rewrite goes to a sibling temp dir first so
        a crash mid-compact never loses the collection.
        """
        path = self._path(collection)
        df = self.read(spark, collection)
        tmp = path + ".compact-tmp"
        # compaction rewrites in the STORE's format — so it doubles as the
        # format-migration path (construct a store with the target fmt)
        (
            df.repartition(num_files, "documentid")
            .write.option("compression", "zstd")
            .mode("overwrite")
            .format(self.fmt)
            .save(tmp)
        )
        self._swap_in(path, tmp)
        return sum(
            1
            for f in os.listdir(path)
            if f.endswith("." + self.fmt) and not f.startswith(".")
        )

    def drop(self, collection: str) -> None:
        if self.exists(collection):
            shutil.rmtree(self._path(collection))

    def delete_documents(self, spark: SparkSession, collection: str, doc_ids) -> int:
        """Remove every chunk of the given documentids (the collection-
        side right-to-be-forgotten). Atomic like compact(): the filtered
        collection lands in a sibling temp dir first. Returns chunks
        removed. Collections are not hive-partitioned by documentid
        (values are unbounded), so this is a filtered rewrite — at scale
        prefer the sharded export layout for deletion-heavy data."""
        from pyspark.sql import functions as F

        path = self._path(collection)
        fmt = self._detect_fmt(path)
        df = self.read(spark, collection)
        before = df.count()
        kept = df.filter(~F.col("documentid").isin(list(doc_ids)))
        kept = kept.localCheckpoint(eager=True)  # sever lineage before rmtree
        after = kept.count()
        tmp = path + ".delete-tmp"
        (
            kept.repartition("documentid")
            .write.option("compression", "zstd")
            .mode("overwrite")
            .format(fmt)
            .save(tmp)
        )
        self._swap_in(path, tmp)
        return before - after
