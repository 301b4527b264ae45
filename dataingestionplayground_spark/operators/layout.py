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

from pyspark.sql import DataFrame


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
