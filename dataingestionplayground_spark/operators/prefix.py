"""Sharded exact rank / ntile — distributed prefix counts without a
single-reducer (or low-cardinality-skewed) WindowExec.

The textbook two-pass distributed prefix pattern already used by
``sample_token_budget`` / ``ingest_pack_sequences`` (queries/pipelineq.py),
factored for rank-style windows:

1. ``repartitionByRange`` on (partition_cols + order spec) makes the
   physical partition id a contiguous key range — rows of one logical
   group may span several shards, but each shard holds a contiguous
   rank range of it.
2. Per-(shard, group) row counts are collected driver-side (n_shards x
   n_groups rows — bounded and tiny) and cumulative offsets computed.
3. A narrow ``mapInPandas`` pass over the already-sorted shards adds the
   broadcast offset to a local running count: exact 1-based rank, and
   from it the SQL-standard ntile bucket, with zero skewed reducers.

The reference has no windows at all (SURVEY.md §2.5); this is the
100 TB-shaped realization of the rank/ntile surface the engine adds.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Hard cap on the driver-collected (shard, group) count table. The
# pattern's contract is a BOUNDED partition-key domain (25 brands, a few
# sources, n_shards ~ cores); a high-cardinality key would collect
# n_shards x n_groups rows driver-side and OOM it — fail fast instead.
MAX_COLLECTED_GROUPS = 200_000


def _norm_key(v):
    """Canonicalize one partition-key value so the driver side (py4j Row
    scalars) and the Arrow side (pandas batch scalars) agree as dict keys:
    nulls (None / NaN / NaT) -> None, numpy scalars -> Python scalars,
    integral floats -> int (pandas promotes an int column containing
    nulls to float64, so driver-side ``2`` must match Arrow-side ``2.0``).
    Symmetric on both sides, so genuinely-float keys cannot collide with
    int keys (a column has one type; both sides normalize identically)."""
    if v is None:
        return None
    try:
        if v != v:  # NaN / NaT — the only values unequal to themselves
            return None
    except (TypeError, ValueError):
        pass
    if hasattr(v, "item"):  # numpy scalar -> Python scalar
        v = v.item()
    if isinstance(v, float) and v.is_integer():
        return int(v)
    return v


def _ntile_buckets(rank, n: int, k: int):
    """Vectorized SQL-standard ntile: the first ``n % k`` buckets get
    ``n // k + 1`` rows, the rest ``n // k`` (rank is 1-based)."""
    import numpy as np

    q, r = divmod(n, k)
    big = r * (q + 1)
    return np.where(
        rank <= big,
        (rank - 1) // (q + 1) + 1,
        r + (rank - big - 1) // max(q, 1) + 1,
    ).astype("int32")


def bounded_rank(
    df: DataFrame,
    order_spec: Sequence[tuple[str, bool]],
    out_col: str = "rk",
) -> DataFrame:
    """``row_number()`` over a PROVABLY BOUNDED input (a post-``limit``
    top-k, a <=n-row seed table) without any WindowExec.

    An unpartitioned window prints Spark's single-partition warning even
    when the input is 10 rows, and a constant partition key is stripped
    by the optimizer (EliminateWindowPartitions) — so for bounded inputs
    the rank is attached explicitly: coalesce to the one partition the
    input already occupies, sort within it, arange in a narrow Arrow
    pass. NEVER use on unbounded input; for that see ``sharded_ntile``'s
    prefix-count pattern.
    """
    from pyspark.sql import types as T

    spec = [F.asc(c) if asc else F.desc(c) for c, asc in order_spec]
    out_schema = T.StructType(
        [f for f in df.schema.fields]
        + [T.StructField(out_col, T.IntegerType(), False)]
    )

    def add_rank(batches):
        import numpy as np

        base = 0
        for pdf in batches:
            res = pdf.copy()
            res[out_col] = np.arange(base + 1, base + len(pdf) + 1, dtype="int32")
            base += len(pdf)
            yield res

    return df.coalesce(1).sortWithinPartitions(*spec).mapInPandas(add_rank, out_schema)


def _sharded_rank_apply(
    df: DataFrame,
    order_spec: Sequence[tuple[str, bool]],
    partition_cols: Sequence[str],
    out_col: str,
    out_type,
    np_dtype: str,
    rank_fn,
) -> DataFrame:
    """Shared machinery for rank-derived window stats: range-partition on
    (partition_cols + order_spec), collect per-(shard, group) counts
    (n_shards x n_groups rows — tiny), then a narrow Arrow pass turns
    local cumcounts + broadcast offsets into exact 1-based ranks and
    applies ``rank_fn(ranks, n_group) -> np.ndarray`` per segment.

    ``order_spec`` is ``[(col, ascending), ...]`` and must be a total
    order within each group (include a unique tie-break column) for the
    result to be deterministic. Partition-column values must be hashable
    scalars (strings / ints / null); they become driver-side dict keys,
    canonicalized by :func:`_norm_key` on both sides of the Arrow
    boundary. The key domain must be BOUNDED: the collected count table
    is capped at :data:`MAX_COLLECTED_GROUPS` rows and the call raises
    past it (a high-cardinality key needs a different pattern — e.g. an
    ordinary partitioned window, which is skew-free when keys are many).
    """
    import pandas as pd  # noqa: F401 — mapInPandas batches
    from pyspark.sql import types as T

    spark = df.sparkSession
    n_shards = min(
        max(2, spark.sparkContext.defaultParallelism),
        max(2, df.rdd.getNumPartitions()),
    )
    pcols = list(partition_cols)
    spec = [F.col(c) for c in pcols] + [
        F.asc(c) if asc else F.desc(c) for c, asc in order_spec
    ]
    ranged = (
        df.repartitionByRange(n_shards, *spec)
        .withColumn("__pid", F.spark_partition_id())
        .sortWithinPartitions(*spec)
        .localCheckpoint(eager=True)
    )
    totals = (
        ranged.groupBy("__pid", *pcols).count().limit(MAX_COLLECTED_GROUPS + 1).collect()
    )
    if len(totals) > MAX_COLLECTED_GROUPS:
        raise ValueError(
            f"sharded prefix rank over {pcols}: more than "
            f"{MAX_COLLECTED_GROUPS} (shard, group) combinations — the "
            "partition key is not bounded-cardinality; use an ordinary "
            "partitioned window instead (many keys => no reducer skew)"
        )
    by_group = defaultdict(list)
    for r in totals:
        by_group[tuple(_norm_key(r[c]) for c in pcols)].append((r["__pid"], r["count"]))
    offsets, n_by_group = {}, {}
    for g, shard_counts in by_group.items():
        acc = 0
        for pid, c in sorted(shard_counts):
            offsets[(pid, g)] = acc
            acc += c
        n_by_group[g] = acc
    out_schema = T.StructType(
        [f for f in df.schema.fields] + [T.StructField(out_col, out_type, False)]
    )

    def compute(batches):
        import numpy as np

        run, pid = {}, None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pid is None:
                pid = int(pdf["__pid"].iloc[0])
            out = np.empty(len(pdf), dtype=np_dtype)
            if pcols:
                # contiguous group segments (rows arrive sorted by
                # pcols); a false boundary (e.g. None != None) is
                # harmless — `run` carries the count across segments
                change = pdf[pcols].ne(pdf[pcols].shift()).any(axis=1).to_numpy()
                change[0] = True
                starts = np.flatnonzero(change)
            else:
                starts = np.array([0])
            bounds = np.append(starts, len(pdf))
            for i, s in enumerate(starts):
                e = bounds[i + 1]
                g = tuple(_norm_key(pdf[c].iloc[s]) for c in pcols)
                base = run.get(g, offsets.get((pid, g), 0))
                ranks = base + np.arange(1, e - s + 1, dtype="int64")
                run[g] = base + (e - s)
                out[s:e] = rank_fn(ranks, n_by_group[g])
            res = pdf.drop(columns=["__pid"]).copy()
            res[out_col] = out
            yield res

    return ranged.mapInPandas(compute, schema=out_schema)


def sharded_ntile(
    df: DataFrame,
    k: int,
    order_spec: Sequence[tuple[str, bool]],
    partition_cols: Sequence[str] = (),
    out_col: str = "ntile",
) -> DataFrame:
    """``ntile(k) OVER (PARTITION BY partition_cols ORDER BY order_spec)``
    as a sharded two-pass prefix count. Output is IntegerType, matching
    built-in ``ntile``; see :func:`_sharded_rank_apply` for contract."""
    from pyspark.sql import types as T

    return _sharded_rank_apply(
        df,
        order_spec,
        partition_cols,
        out_col,
        T.IntegerType(),
        "int32",
        lambda ranks, n: _ntile_buckets(ranks, n, k),
    )


def sharded_row_number(
    df: DataFrame,
    order_spec: Sequence[tuple[str, bool]],
    partition_cols: Sequence[str] = (),
    out_col: str = "rn",
) -> DataFrame:
    """``row_number() OVER (PARTITION BY partition_cols ORDER BY
    order_spec)`` as a sharded two-pass prefix count (exact 1-based,
    IntegerType like the built-in); see :func:`_sharded_rank_apply`."""
    from pyspark.sql import types as T

    return _sharded_rank_apply(
        df,
        order_spec,
        partition_cols,
        out_col,
        T.IntegerType(),
        "int32",
        lambda ranks, n: ranks.astype("int32"),
    )


def sharded_prefix_sum(
    df: DataFrame,
    order_spec: Sequence[tuple[str, bool]],
    val_col: str,
    out_col: str = "prefix_before",
) -> DataFrame:
    """EXCLUSIVE global running sum of ``val_col`` in ``order_spec``
    order, without an unpartitioned WindowExec: the textbook two-pass
    distributed prefix sum. Pass 1: ``repartitionByRange`` on the order
    key (partition id == rank range) and per-shard totals collected to
    the driver (n_shards rows — never data-sized); pass 2: a narrow
    Arrow cumsum per shard plus its broadcast offset. Returns the input
    columns plus ``out_col`` (LongType). Generalized out of
    sample_token_budget (r9) so every global-cumulative-weight shape
    (token budgets, PPS sampling grids, quota fills) shares one audited
    implementation.
    """
    from pyspark.sql import types as T

    sort_exprs = [
        F.asc(c) if asc else F.desc(c) for c, asc in order_spec
    ]
    n_shards = min(
        max(2, df.sparkSession.sparkContext.defaultParallelism),
        max(2, df.rdd.getNumPartitions()),
    )
    ranged = (
        df.repartitionByRange(n_shards, *sort_exprs)
        .withColumn("__pid", F.spark_partition_id())
        .sortWithinPartitions(*sort_exprs)
        .localCheckpoint(eager=True)
    )
    totals = {
        r["__pid"]: r["t"] or 0
        for r in ranged.groupBy("__pid").agg(F.sum(val_col).alias("t")).collect()
    }
    offsets, acc = {}, 0
    for p in sorted(totals):
        offsets[p] = acc
        acc += totals[p]
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType(), True)]
    )
    in_cols = [f.name for f in df.schema.fields]

    def local_prefix(batches):
        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = offsets.get(int(pdf["__pid"].iloc[0]), 0)
            v = pdf[val_col].to_numpy(dtype="int64")
            csum = v.cumsum()
            out = pdf[in_cols].copy()
            out[out_col] = run + csum - v
            run = int(run + csum[-1]) if len(csum) else run
            yield out

    return ranged.mapInPandas(local_prefix, schema=out_schema)
