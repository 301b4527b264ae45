"""Batch sessionization: gap-based session ids via lag + running count.

Single sort-shuffle on (user, ts); the streaming twin is
``session_window`` in dataingestionplayground_spark.streaming.windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataingestionplayground_spark.functions.portable import epoch_seconds


def sessionize(
    df: DataFrame, user_col: str, ts_col: str, gap_seconds: int = 1800
) -> DataFrame:
    """Assign ``session_id`` (1-based per user): a new session starts when
    the gap to the previous event exceeds ``gap_seconds``."""
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col))
    # epoch seconds incl. microsecond fraction (matches DuckDB's epoch(ts),
    # so gap comparisons agree at full precision); NTZ-safe
    gap = epoch_seconds(ts_col) - F.lag(epoch_seconds(ts_col)).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn("__new", is_new).withColumn(
        "session_id", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("__new")
