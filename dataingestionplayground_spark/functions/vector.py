"""Vector math over ARRAY<FLOAT> embedding columns — pure Catalyst expressions.

The reference stores 384-d float vectors and searches by cosine distance
(``/root/reference/DataIngestionPlayground/VectorStoreCommands.cs:96-99,158``
— 384 dims from ``VectorStoreOptions.cs:17``). Here vectors are ordinary
``ARRAY<FLOAT>`` columns and similarity is a higher-order-function
expression: JVM-side, codegen-friendly, no UDF, no data leaves the executor.

Determinism note: reductions iterate the array left-to-right with element
values cast to DOUBLE first, which makes the result bit-identical to a
sequential engine (the DuckDB oracle) evaluating the same reduction order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> str:
    if isinstance(col, Column):
        raise TypeError("vector fns take column *names* (they build SQL expressions)")
    return col


def dot_product(a: str, b: str) -> Column:
    """Sum_i a[i]*b[i], left-to-right, double precision."""
    return F.expr(
        f"aggregate(sequence(1, size({_c(a)})), cast(0.0 as double), "
        f"(acc, i) -> acc + cast(element_at({_c(a)}, i) as double) * cast(element_at({_c(b)}, i) as double))"
    )


def l2_norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate(sequence(1, size({_c(a)})), cast(0.0 as double), "
            f"(acc, i) -> acc + cast(element_at({_c(a)}, i) as double) * cast(element_at({_c(a)}, i) as double))"
        )
    )


def cosine_similarity(a: str, b: str) -> Column:
    """Cosine similarity of two ARRAY<FLOAT> columns (1 - cosine distance).

    Zero-norm vectors yield NULL (nullif guard: ANSI mode would otherwise
    raise DIVIDE_BY_ZERO); NULL scores sort last under desc ordering.
    """
    return dot_product(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


def normalize(a: str) -> Column:
    """Unit-normalize a vector column (for LSH / dot-product-as-cosine)."""
    return F.expr(
        f"transform({_c(a)}, x -> cast(cast(x as double) / "
        f"sqrt(aggregate(sequence(1, size({_c(a)})), cast(0.0 as double), "
        f"(acc, i) -> acc + cast(element_at({_c(a)}, i) as double) * cast(element_at({_c(a)}, i) as double))) as float))"
    )


def _dot_sql(x: str, y: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, len({x})), i -> "
        f"CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE))), (acc, v) -> acc + v)"
    )


def l2_norm_sql(a: str) -> str:
    """DuckDB oracle twin of :func:`l2_norm`."""
    return f"sqrt({_dot_sql(a, a)})"


def cosine_sql(a: str, b: str) -> str:
    """DuckDB oracle twin of :func:`cosine_similarity` — same reduction order.

    DuckDB's ``list_reduce`` folds left starting from the first element;
    prepending an explicit 0.0 makes it identical to Spark's ``aggregate``
    with a 0.0 init.
    """
    return f"({_dot_sql(a, b)} / nullif(sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)}), 0.0))"
