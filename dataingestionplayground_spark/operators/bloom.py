"""Distributed Bloom-filter join pruning (sideways information passing).

At 100 TB the dominant cost of a selective dim->fact join is shuffling
fact rows that cannot survive the join. A Bloom filter built over the dim
side's join keys and applied to the fact scan drops most non-matching
rows BEFORE the Exchange, so the shuffle carries ~|matching| rows instead
of |fact|. Spark's optimizer injects this itself when statistics allow
(``spark.sql.optimizer.runtime.bloomFilter.enabled``); this operator makes
the technique explicit, guaranteed, and testable — the same shape Spark's
``BloomFilterAggregate`` / ``BloomFilterMightContain`` pair produces.

Everything is distributed and JVM-side:

* **Build** — each dim key maps to ``k`` bit positions via
  ``xxhash64(key, seed)``; positions group to 64-bit words with a
  ``bit_or`` aggregate. The bitmap materializes as ONE row holding a
  ``map<int, bigint>`` of at most ``m_bits/64`` entries (a few KB) — no
  driver collect, no Python.
* **Probe** — the one-row bitmap broadcasts to the fact scan; a row
  survives iff all ``k`` of its bits are set (pure shift/mask
  expressions inside whole-stage codegen).

Bloom filters admit false positives but never false negatives, so an
exact join AFTER the prefilter returns exactly the unfiltered join's
rows — correctness never depends on the hash functions, only the pruning
rate does.

Reference parity: the reference joins chunks back to documents in
memory (``VectorStoreCommands.cs:120-133``); this is the scale-path
equivalent for selective fact-side joins, per the 100 TB mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2^17 bits (16 KiB) / 5 probes => <1% false positives up to ~10k keys.
# The bitmap stays a broadcast-sized single row until m_bits is raised
# into the hundreds of millions, at which point switch the probe side to
# Spark's native runtime bloom filter instead.
DEFAULT_M_BITS = 1 << 17
DEFAULT_K = 5


def _positions(key, m_bits: int, k: int):
    """The k bit positions of ``key`` — xxhash64(key, seed) mod m."""
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits)) for seed in range(k)
    ]


def bloom_bitmap(
    dim: DataFrame, key: str, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> DataFrame:
    """One-row DataFrame ``(bloom: map<int,bigint>)`` over dim[key].

    Distributed build: explode each key's k positions, bit_or per 64-bit
    word (<= m_bits/64 groups — a bounded shuffle regardless of |dim|),
    then fold the word table into a single map row for broadcast.
    """
    pos = dim.select(
        F.explode(F.array(*_positions(F.col(key), m_bits, k))).alias("pos")
    )
    words = pos.select(
        (F.col("pos") / 64).cast("int").alias("w"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
        ).alias("bit"),
    ).groupBy("w").agg(F.bit_or("bit").alias("bits"))
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("bloom")
    )


def bloom_prefilter(
    fact: DataFrame,
    bitmap: DataFrame,
    key: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Rows of ``fact`` whose key might be in the filter (no false negatives).

    The one-row bitmap broadcasts; the membership test is k shift/mask
    expressions evaluated in-row at the scan, before any shuffle.
    """
    cond = None
    for pos in _positions(F.col(key), m_bits, k):
        # element_at on a MAP is key lookup (null when absent) — not the
        # 1-based array indexing its array overload uses.
        word = F.coalesce(
            F.try_element_at("bloom", (pos / 64).cast("int")), F.lit(0).cast("long")
        )
        hit = word.bitwiseAND(
            F.call_function("shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int"))
        ) != F.lit(0)
        cond = hit if cond is None else (cond & hit)
    return fact.crossJoin(F.broadcast(bitmap)).where(cond).drop("bloom")
