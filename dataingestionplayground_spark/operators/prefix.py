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

from collections import defaultdict, deque
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Hard cap on the driver-collected (shard, group) count table. The
# pattern's contract is a BOUNDED partition-key domain (25 brands, a few
# sources, n_shards ~ cores); a high-cardinality key would collect
# n_shards x n_groups rows driver-side and OOM it — fail fast instead.
MAX_COLLECTED_GROUPS = 200_000

# Live persisted range-shuffled frames (ADVICE r10 low: SQL persist()
# registers in the CacheManager with a strong reference, so without
# explicit unpersist the cached/spilled blocks of EVERY sharded-prefix
# call accumulate for the session lifetime — a bench run executes
# hundreds). A bounded FIFO evicts the oldest cache as new calls arrive,
# and release_prefix_caches() drops them all (bench/oracle loops call it
# between queries). Early unpersist is CORRECTNESS-safe, not just
# probably-fine: the repartitionByRange SHUFFLE FILES are the stable
# materialization (recompute re-reads them — range bounds are not
# resampled), and the post-shuffle sortWithinPartitions is deterministic
# under the contract's total order, so a result consumed after its cache
# was evicted recomputes bit-identical ranks and merely pays a re-sort.
_LIVE_CACHES: deque = deque()
_MAX_LIVE_CACHES = 8


def _track_cache(df: DataFrame) -> None:
    _LIVE_CACHES.append(df)
    while len(_LIVE_CACHES) > _MAX_LIVE_CACHES:
        _LIVE_CACHES.popleft().unpersist(blocking=False)


def release_prefix_caches() -> int:
    """Unpersist every live sharded-prefix cache; returns how many were
    released. Call between queries in long-lived sessions (bench and the
    oracle checker do); results not yet consumed stay correct — see the
    _LIVE_CACHES note."""
    n = 0
    while _LIVE_CACHES:
        _LIVE_CACHES.popleft().unpersist(blocking=False)
        n += 1
    return n


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
    # persist, NOT localCheckpoint: the totals collect below materializes
    # the cache in the same job (localCheckpoint(eager) burned one extra
    # full-data pass just to write blocks, and its lineage-severed blocks
    # are only freed when the ContextCleaner catches up — the suspected
    # source of the r9 sf1.0 min/median variance). MEMORY_AND_DESER
    # blocks spill to disk under pressure, never recompute-with-resample,
    # so the collected offsets always describe the data the final Arrow
    # pass reads.
    ranged = (
        df.repartitionByRange(n_shards, *spec)
        .withColumn("__pid", F.spark_partition_id())
        .sortWithinPartitions(*spec)
        .persist()
    )
    _track_cache(ranged)
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

    # val_col must be integral: the Arrow pass accumulates into int64 and
    # the driver-side offsets use exact F.sum — a float weight column
    # would be silently truncated per-row but not in the offsets,
    # producing inconsistent prefixes (r9 ADVICE). Fail fast instead;
    # scale fractional weights to integers (e.g. micro-units) upstream.
    vt = df.schema[val_col].dataType
    if not isinstance(vt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        raise TypeError(
            f"sharded_prefix_sum({val_col!r}): integral column required, "
            f"got {vt.simpleString()} — scale fractional weights to "
            "integer units before the prefix pass"
        )

    sort_exprs = [
        F.asc(c) if asc else F.desc(c) for c, asc in order_spec
    ]
    n_shards = min(
        max(2, df.sparkSession.sparkContext.defaultParallelism),
        max(2, df.rdd.getNumPartitions()),
    )
    # persist (materialized by the totals job), not eager localCheckpoint
    # — see _sharded_rank_apply for the rationale
    ranged = (
        df.repartitionByRange(n_shards, *sort_exprs)
        .withColumn("__pid", F.spark_partition_id())
        .sortWithinPartitions(*sort_exprs)
        .persist()
    )
    _track_cache(ranged)
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


def sharded_rank_multi(
    df: DataFrame,
    order_spec: Sequence[tuple[str, bool]],
    tasks: Sequence[tuple[Sequence[str], object, str, object, str]],
) -> DataFrame:
    """Several rank-derived window columns over ONE range shuffle.

    Each task is ``(partition_cols, rank_fn, out_col, out_type,
    np_dtype)`` — e.g. a global ntile(4) and a per-status ntile(10) —
    all sharing the same ``order_spec``. Where :func:`_sharded_rank_apply`
    range-partitions on (pcols + order) and so needs one shuffle PER
    distinct pcols, this partitions on the order key alone: within a
    shard, a task's groups interleave, but the global order restricted
    to any group is still monotone in shard id, so per-(shard, group)
    counts give exact offsets and a grouped cumcount gives local ranks.
    One shuffle + one tiny count collect + one Arrow pass replaces N of
    each (window_ntile_buckets at sf1.0 was paying the chained version's
    double materialization — the r9 scaling flag).

    Same bounded-key contract as :func:`_sharded_rank_apply`: the count
    table is (n_shards x product of all partition-key domains) rows,
    capped at :data:`MAX_COLLECTED_GROUPS`.
    """
    import pandas as pd  # noqa: F401
    from pyspark.sql import types as T

    spark = df.sparkSession
    n_shards = min(
        max(2, spark.sparkContext.defaultParallelism),
        max(2, df.rdd.getNumPartitions()),
    )
    spec = [F.asc(c) if asc else F.desc(c) for c, asc in order_spec]
    all_pcols: list[str] = []
    for pcols, *_ in tasks:
        for c in pcols:
            if c not in all_pcols:
                all_pcols.append(c)
    ranged = (
        df.repartitionByRange(n_shards, *spec)
        .withColumn("__pid", F.spark_partition_id())
        .sortWithinPartitions(*spec)
        .persist()
    )
    _track_cache(ranged)
    totals = (
        ranged.groupBy("__pid", *all_pcols)
        .count()
        .limit(MAX_COLLECTED_GROUPS + 1)
        .collect()
    )
    if len(totals) > MAX_COLLECTED_GROUPS:
        raise ValueError(
            f"sharded_rank_multi over {all_pcols}: more than "
            f"{MAX_COLLECTED_GROUPS} (shard, group) combinations — "
            "partition keys must be bounded-cardinality"
        )
    # per task: group -> [(pid, count)] -> offsets + group totals
    offsets: list[dict] = []
    n_by_group: list[dict] = []
    for pcols, *_ in tasks:
        by_group = defaultdict(lambda: defaultdict(int))
        for r in totals:
            g = tuple(_norm_key(r[c]) for c in pcols)
            by_group[g][r["__pid"]] += r["count"]
        offs, nbg = {}, {}
        for g, shard_counts in by_group.items():
            acc = 0
            for pid in sorted(shard_counts):
                offs[(pid, g)] = acc
                acc += shard_counts[pid]
            nbg[g] = acc
        offsets.append(offs)
        n_by_group.append(nbg)
    out_schema = T.StructType(
        [f for f in df.schema.fields]
        + [T.StructField(oc, ot, False) for _, _, oc, ot, _ in tasks]
    )

    def compute(batches):
        import numpy as np

        runs = [dict() for _ in tasks]
        pid = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pid is None:
                pid = int(pdf["__pid"].iloc[0])
            res = pdf.drop(columns=["__pid"]).copy()
            for ti, (pcols, rank_fn, out_col, _, np_dtype) in enumerate(tasks):
                out = np.empty(len(pdf), dtype=np_dtype)
                if not pcols:
                    base = runs[ti].get((), offsets[ti].get((pid, ()), 0))
                    ranks = base + np.arange(1, len(pdf) + 1, dtype="int64")
                    runs[ti][()] = base + len(pdf)
                    out[:] = rank_fn(ranks, n_by_group[ti][()])
                else:
                    # groups interleave within the shard: grouped
                    # cumcount + per-group broadcast offset; order
                    # within each group is preserved by pandas groupby
                    gb = pdf.groupby(list(pcols), sort=False, dropna=False)
                    cum = gb.cumcount().to_numpy()
                    for key, idx in gb.indices.items():
                        if not isinstance(key, tuple):
                            key = (key,)
                        g = tuple(_norm_key(k) for k in key)
                        base = runs[ti].get(g, offsets[ti].get((pid, g), 0))
                        ranks = base + cum[idx] + 1
                        runs[ti][g] = base + len(idx)
                        out[idx] = rank_fn(ranks, n_by_group[ti][g])
                res[out_col] = out
            yield res

    return ranged.mapInPandas(compute, schema=out_schema)


def sharded_prefix_multi(
    df: DataFrame,
    order_spec: Sequence[tuple[str, bool]],
    val_cols: Sequence[str],
    out_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Several EXCLUSIVE global running sums over ONE range shuffle —
    the N-column generalization of :func:`sharded_prefix_sum` (same
    two-pass scheme: per-shard totals collected once per column, narrow
    Arrow cumsums + broadcast offsets; same integral-type contract).
    The shape every rank-statistic needs: a two-sample KS/Mann-Whitney
    pass wants cumulative counts of BOTH groups at every sorted point,
    and running the single-column operator twice would pay the range
    exchange twice."""
    import pandas as pd  # noqa: F401
    from pyspark.sql import types as T

    if out_cols is None:
        out_cols = [f"cum_{c}_before" for c in val_cols]
    if len(out_cols) != len(val_cols):
        raise ValueError("out_cols must match val_cols")
    for c in val_cols:
        vt = df.schema[c].dataType
        if not isinstance(vt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            raise TypeError(
                f"sharded_prefix_multi({c!r}): integral column required, "
                f"got {vt.simpleString()}"
            )
    sort_exprs = [F.asc(c) if asc else F.desc(c) for c, asc in order_spec]
    n_shards = min(
        max(2, df.sparkSession.sparkContext.defaultParallelism),
        max(2, df.rdd.getNumPartitions()),
    )
    ranged = (
        df.repartitionByRange(n_shards, *sort_exprs)
        .withColumn("__pid", F.spark_partition_id())
        .sortWithinPartitions(*sort_exprs)
        .persist()
    )
    _track_cache(ranged)
    totals = {
        r["__pid"]: [r[f"t{i}"] or 0 for i in range(len(val_cols))]
        for r in ranged.groupBy("__pid")
        .agg(*[F.sum(c).alias(f"t{i}") for i, c in enumerate(val_cols)])
        .collect()
    }
    offsets: dict[int, list[int]] = {}
    acc = [0] * len(val_cols)
    for p in sorted(totals):
        offsets[p] = list(acc)
        for i, t in enumerate(totals[p]):
            acc[i] += t
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(oc, T.LongType(), True) for oc in out_cols]
    )
    in_cols = [f.name for f in df.schema.fields]

    def local_prefix(batches):
        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = list(offsets.get(int(pdf["__pid"].iloc[0]), [0] * len(val_cols)))
            out = pdf[in_cols].copy()
            for i, (c, oc) in enumerate(zip(val_cols, out_cols)):
                v = pdf[c].to_numpy(dtype="int64")
                csum = v.cumsum()
                out[oc] = run[i] + csum - v
                run[i] = int(run[i] + csum[-1]) if len(csum) else run[i]
            yield out

    return ranged.mapInPandas(local_prefix, schema=out_schema)
