"""Build the larger bench scale point (default 5 copies of sf0.1, i.e.
an sf0.5-equivalent) under the repo's .benchdata/ dir.

local[32] at sf0.1 finishes most headline queries in under ~2 s — too
small for shuffle regressions to show (round-2 verdict item 7). This
replicates the DRIVER'S OWN testdata (never regenerates it) with
join-consistent key offsets: every bigint entity key in copy ``i``
shifts by ``i * 10^9`` so intra-copy joins (orders↔lineitem,
customer↔orders, …) still match and copies never collide; the tiny
region/nation dims stay single-copy (their int keys are referenced by
unshifted nationkey columns). Text and embeddings repeat verbatim
across copies — a deliberately dup-heavy corpus, which is exactly the
workload shape the dedup/ANN queries exist for.

Deterministic (pure projections, no RNG): the same input always builds
byte-identical content, so round-over-round big-bench numbers compare.
"""

from __future__ import annotations

import os
import sys
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataingestionplayground_spark.session import load_table  # noqa: E402

OFFSET = 1_000_000_000

# bigint keys to shift per copy; [] = single-copy dimension table
KEYS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build(spark, src_dir: str, out_dir: str, copies: int = 5) -> None:
    for name, keys in KEYS.items():
        df = load_table(spark, src_dir, name)
        if keys:
            parts = []
            for i in range(copies):
                p = df
                for k in keys:
                    p = p.withColumn(k, (F.col(k) + F.lit(i * OFFSET)).cast("long"))
                parts.append(p)
            out = reduce(lambda a, b: a.unionByName(b), parts)
        else:
            out = df
        (
            out.write.mode("overwrite")
            .option("compression", "zstd")
            .parquet(os.path.join(out_dir, f"{name}.parquet"))
        )


def build_zipf_events(spark, src_dir: str, out_dir: str, copies: int = 5) -> None:
    """Hot-key variant of the events table ONLY (r8 verdict item 4):
    same row count and copy layout as the uniform ``build`` output, but
    every 5th event (by event_id, so deterministically and uniformly
    over time) is reassigned to GLOBAL user 1 — one user owns ~20% of
    all rows across every copy. This is the measured-skew fixture: the
    per-user window/sessionize/CUSUM shapes run here vs the uniform
    sf-equivalent, and the bench archives the hot/uniform ratio (claimed
    <=2x in SCALE.md, now evidence instead of assertion)."""
    df = load_table(spark, src_dir, "events")
    parts = []
    for i in range(copies):
        p = df
        for k in ("event_id", "user_id"):
            p = p.withColumn(k, (F.col(k) + F.lit(i * OFFSET)).cast("long"))
        parts.append(p)
    out = reduce(lambda a, b: a.unionByName(b), parts)
    out = out.withColumn(
        "user_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(1).cast("long")).otherwise(
            F.col("user_id")
        ),
    )
    (
        out.write.mode("overwrite")
        .option("compression", "zstd")
        .parquet(os.path.join(out_dir, "events.parquet"))
    )


def main() -> None:
    from dataingestionplayground_spark.session import get_spark

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".benchdata", "sf0.5"
    )
    copies = int(os.environ.get("SPARK_GRAFT_BIG_COPIES", "5"))
    spark = get_spark("bench-scale")
    build(spark, src, out, copies)
    print(f"built {out} ({copies}x {src})")


if __name__ == "__main__":
    main()
