"""As-of and range joins — operators Spark lacks natively, composed from
built-ins (SURVEY.md §2.3: engine surface beyond the reference's implicit
chunk->document association).

The as-of join uses the union+window formulation: one sort-shuffle on
(key, ts) total — strictly better at scale than per-key ``merge_asof`` in
Python (no Arrow transfer, no per-group materialization) and immune to key
skew beyond what the sort itself sees.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
    tie_col: str | None = None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For each left row attach the latest right row with
    right_ts <= left_ts ('backward'; 'forward' takes the earliest >=),
    matching on equality of ``on`` keys. Unmatched left rows keep NULLs.
    ``allow_exact_matches=False`` makes the comparison strict (< / >),
    mirroring the pandas ``merge_asof`` knob.

    Ties on right_ts are broken by ``tie_col`` (the max wins for backward,
    min for forward) so results are deterministic.

    Plan shape: union(tagged left, tagged right) -> one window
    last(struct, ignoreNulls) over (keys ORDER BY ts, side, tie) -> filter
    left side. Exactly one sort-shuffle; values travel as a struct so the
    matched row is atomic even when some value columns are NULL.

    NULL timestamps: right rows with a NULL ``right_ts`` are dropped (they
    can never be an as-of match — pandas ``merge_asof`` rejects them);
    left rows with a NULL ``left_ts`` get NULL values (they sort before
    every real right row in both directions, so their frame is empty).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    on = list(on)
    right = right.filter(F.col(right_ts).isNotNull())
    value_cols = list(value_cols)
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")
    tie = tie_col if tie_col is not None else value_cols[0]

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(right.schema[tie].dataType).alias("__tie"),
        F.lit(None)
        .cast("struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols) + ">")
        .alias("__v"),
    )
    rhs = right.select(
        *[
            F.col(c) if c in on else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        F.col(tie).alias("__tie"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__v"),
    )
    unioned = lhs.unionByName(rhs)

    # side ordering encodes inclusivity: right(0) before left(1) at equal
    # ts => <= / >=; flipping puts equal-ts right rows after the left row,
    # outside its unbounded-preceding frame => strict < / >.
    side_order = F.asc("__side") if allow_exact_matches else F.desc("__side")
    if direction == "backward":
        # among equal (ts): max tie wins (last in asc order). asc is
        # NULLS FIRST: NULL-ts left rows land before any right row.
        order = [F.asc("__ts"), side_order, F.asc_nulls_first("__tie")]
    else:
        # desc_nulls_first so NULL-ts left rows still sort before every
        # right row (plain desc is NULLS LAST -> they would wrongly
        # adopt the final right row as a match).
        order = [F.desc_nulls_first("__ts"), side_order, F.desc_nulls_first("__tie")]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("__m", F.last("__v", ignorenulls=True).over(w))
    return filled.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col("__m").getField(c).alias(c) for c in value_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    extra_on: Sequence[str] = (),
) -> DataFrame:
    """Point-in-interval join (lo <= point < hi) via bucketization.

    A naive theta join is a broadcast-nested-loop at scale; bucketizing the
    point and exploding each interval over the buckets it covers turns it
    into an equi-join on (bucket, *extra_on) + residual filter —
    shuffle-partitionable and AQE-skew-splittable. ``bucket_width`` should
    approximate the typical interval width (1-2 buckets per interval).
    """
    lb = left.withColumn("__bucket", F.floor(F.col(left_point) / bucket_width))
    rb = right.filter(F.col(right_hi) >= F.col(right_lo)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / bucket_width),
                F.floor(F.col(right_hi) / bucket_width),
            )
        ),
    )  # inverted intervals match nothing (and would make sequence() descend)
    on = ["__bucket", *extra_on]
    return (
        lb.join(rb, on=on, how="inner")
        .filter((F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) < F.col(right_hi)))
        .drop("__bucket")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    extra_on: Sequence[str] = (),
) -> DataFrame:
    """Interval-interval overlap join (half-open: lo <= other < hi on
    either side) via grid bucketization.

    Both sides explode over the buckets their interval covers; candidate
    pairs meet on (bucket, *extra_on) and the exact overlap predicate
    filters residuals. A pair whose overlap spans several buckets would
    match in each — the dedup assigns every pair to the single bucket
    containing the overlap's start (max of the two lo-buckets), so each
    surviving pair is emitted exactly once WITHOUT a distinct shuffle.
    Same scale posture as range_join: equi-join on the grid key,
    AQE-skew-splittable; size ``bucket_width`` near the typical interval.
    """
    def burst(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.filter(F.col(hi) >= F.col(lo)).withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / bucket_width),
                    F.floor(F.col(hi) / bucket_width),
                )
            ),
        )

    lb = burst(left, left_lo, left_hi)
    rb = burst(right, right_lo, right_hi)
    on = ["__bucket", *extra_on]
    overlap = (F.col(left_lo) < F.col(right_hi)) & (F.col(right_lo) < F.col(left_hi))
    anchor = F.col("__bucket") == F.floor(
        F.greatest(F.col(left_lo), F.col(right_lo)) / bucket_width
    )
    return lb.join(rb, on=on, how="inner").filter(overlap & anchor).drop("__bucket")
