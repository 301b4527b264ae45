"""Cross-engine deterministic aggregates.

Floating-point SUM/AVG over a shuffled dataset is order-dependent: Spark
sums partials per partition while a single-threaded engine sums in row
order, so the low bits differ and an order-insensitive value hash breaks.

Fix: route double aggregation through DECIMAL(38,6). Decimal arithmetic is
exact and associative, so partial aggregation (Spark) and sequential
aggregation (DuckDB) produce the *same* decimal; casting the final decimal
back to DOUBLE is then bit-identical on both engines. The per-row
double->decimal cast rounds identically (ties to a 6-decimal boundary do
not occur for IEEE-754 doubles in practice).

This also matters at 100 TB: partial (map-side) aggregation stays enabled —
we never trade scalability for determinism.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def epoch_seconds(col: Column | str) -> Column:
    """Seconds since epoch (incl. fractional part) as DOUBLE, for both
    TIMESTAMP and TIMESTAMP_NTZ inputs.

    Parquet `timestamp[us]` without a UTC adjustment reads as TIMESTAMP_NTZ
    on Spark 4, which refuses a direct numeric cast; routing through a
    TIMESTAMP cast first (a no-op for LTZ inputs) interprets the wall clock
    in the session timezone. ``load_table`` removes the NTZ case at the
    source (``spark.sql.parquet.inferTimestampNTZ.enabled=false``: naive
    micros read as LTZ-as-UTC, matching DuckDB's epoch(ts) on ANY session
    timezone); an NTZ column reaching this helper from elsewhere is only
    correct under a UTC session timezone — pinned by the session factory.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("double")


def dsum(col: Column | str) -> Column:
    """Order-independent SUM over doubles (exact via decimal), as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent AVG over doubles: exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c).cast("double")


def dsum_expr(sql_expr: str) -> str:
    """DuckDB/ANSI oracle twin of :func:`dsum`."""
    return f"CAST(SUM(CAST(({sql_expr}) AS DECIMAL(38,6))) AS DOUBLE)"


def davg_expr(sql_expr: str) -> str:
    """DuckDB/ANSI oracle twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST(({sql_expr}) AS DECIMAL(38,6))) AS DOUBLE)"
        f" / CAST(COUNT({sql_expr}) AS DOUBLE)"
    )


def md5_mod(expr: str, mod: int) -> str:
    """Spark SQL: first 32 bits of md5 as a BIGINT, mod ``mod`` — the
    engine-portable deterministic hash split (Spark's hash() and xxhash64()
    are not reproducible in other engines; md5 is everywhere)."""
    return f"cast(conv(substring(md5({expr}), 1, 8), 16, 10) as bigint) % {mod}"


def md5_mod_sql(expr: str, mod: int) -> str:
    """DuckDB twin of :func:`md5_mod` — polynomial nibble decode (DuckDB
    has no conv)."""
    terms = " + ".join(
        f"CAST(instr('0123456789abcdef', substr(md5({expr}), {j + 1}, 1)) - 1 AS BIGINT) * {16 ** (7 - j)}"
        for j in range(8)
    )
    return f"(({terms}) % {mod})"
