"""Column-expression library: vector math, text analysis, portable aggregates.

Everything here is a *JVM-side* Column expression (whole-stage codegen,
no Python in the hot path). The ``portable`` module additionally guarantees
cross-engine determinism so the DuckDB correctness oracle hash-matches.
"""

from dataingestionplayground_spark.functions.portable import dsum, davg, dsum_expr, davg_expr
from dataingestionplayground_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
    normalize,
)
from dataingestionplayground_spark.functions.text import (
    tokens,
    token_count,
    char_shingles,
    word_shingles,
)

__all__ = [
    "dsum",
    "davg",
    "dsum_expr",
    "davg_expr",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "normalize",
    "tokens",
    "token_count",
    "char_shingles",
    "word_shingles",
]
