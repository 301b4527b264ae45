"""Storage-layout utilities: the small-files / giant-files problem.

At 100 TB, output file sizing is a first-order cost: thousands of tiny
files swamp scan planning and metadata stores, while multi-GB files
serialize task scheduling and retries. Spark sizes *input* splits
(``spark.sql.files.maxPartitionBytes``) but writes one file per output
partition, so output sizing must be chosen by the writer.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dir_bytes(path: str, suffix: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(suffix) and not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(dirpath, f))
    return total


def write_target_sized(
    df: DataFrame,
    path: str,
    target_mb: float = 256.0,
    fmt: str = "parquet",
    sample_rows: int = 10_000,
    compression: str = "zstd",
) -> int:
    """Write ``df`` to ``path`` aiming for ~``target_mb`` per data file.

    Bytes-per-row is measured, not guessed: a bounded sample is written
    to a scratch directory in the SAME format+compression, so the
    estimate reflects real encoded size (dictionary + zstd), which can
    be 10-50x off from in-memory size. File count =
    ceil(total_rows x bytes_per_row / target). Returns the number of
    data files written.

    Cost: one extra count + one sample write — trivial next to the main
    write at any scale. Rows are round-robined (`repartition(n)`), so
    files come out uniformly sized; to co-locate by a key at the same
    time, repartition by (key, n) upstream instead.
    """
    total_rows = df.count()
    if total_rows == 0:
        df.write.mode("overwrite").format(fmt).option("compression", compression).save(path)
        return 1

    scratch = tempfile.mkdtemp(prefix="sizer_")
    try:
        sample = df.limit(min(sample_rows, total_rows)).coalesce(1)
        sample_path = os.path.join(scratch, "sample")
        sample.write.mode("overwrite").format(fmt).option(
            "compression", compression
        ).save(sample_path)
        sampled = min(sample_rows, total_rows)
        bytes_per_row = max(1.0, _dir_bytes(sample_path, "." + fmt) / sampled)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    est_total = total_rows * bytes_per_row
    n_files = max(1, round(est_total / (target_mb * 1024 * 1024)))
    (
        df.repartition(n_files)
        .write.mode("overwrite")
        .format(fmt)
        .option("compression", compression)
        .save(path)
    )
    return sum(
        1
        for f in os.listdir(path)
        if f.endswith("." + fmt) and not f.startswith(("_", "."))
    )


# ------------------------------------------------------------- Z-order

# Magic-number bit spreading (Morton/"interleave" encoding, the standard
# public bit-twiddling identity): spread a 16-bit value so its bits land
# on even positions of a 32-bit word, in 4 shift+mask steps instead of 16
# per-bit extractions. All BIGINT arithmetic -> identical on Spark and
# DuckDB.
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16_sql(expr: str) -> str:
    x = f"(({expr}) & 65535)"
    for shift, mask in _SPREAD_STEPS:
        x = f"((({x} | ({x} << {shift})) & {mask}))"
    return x


def morton2(xcol: str, ycol: str) -> Column:
    """Z-order (Morton) code of two non-negative integer columns, 16 bits
    each -> one BIGINT whose bit i comes from x (even i) / y (odd i).

    Sorting by this code gives multi-dimensional locality: rows close in
    BOTH dimensions land in the same files, so parquet min/max stats
    prune 2-d box predicates — the clustering trick behind Delta/Iceberg
    OPTIMIZE ZORDER, expressed as a plain Catalyst expression (no UDF,
    codegen-friendly). Callers quantize wider domains to 16 bits first
    (e.g. ``pmod(key, 65536)`` or a range-rank bucket).
    """
    return F.expr(f"{_spread16_sql(xcol)} | ({_spread16_sql(ycol)} << 1)").cast("long")


def morton2_sql(xexpr: str, yexpr: str) -> str:
    """DuckDB oracle twin of :func:`morton2` (same shift/mask tree)."""
    return f"CAST({_spread16_sql(xexpr)} | ({_spread16_sql(yexpr)} << 1) AS BIGINT)"


def zorder_write(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    n_files: int,
    fmt: str = "parquet",
    compression: str = "zstd",
) -> int:
    """Write ``df`` clustered on the Z-order curve of (xcol, ycol).

    ``repartitionByRange`` on the z-code splits the curve into
    ``n_files`` contiguous segments (one sort-shuffle; range bounds come
    from Spark's reservoir sampling), and ``sortWithinPartitions`` makes
    every file a contiguous curve interval, so each file's parquet
    min/max footer covers a tight 2-d tile: a box predicate on the two
    source columns prunes most files at planning time. This is the
    at-rest half of the locality story — the scan half is free
    (DataSourceScan reads the footers). Returns the data-file count.
    """
    z = morton2(xcol, ycol).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(max(1, n_files), "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .format(fmt)
        .option("compression", compression)
        .save(path)
    )
    return sum(
        1
        for f in os.listdir(path)
        if f.endswith("." + fmt) and not f.startswith(("_", "."))
    )
