"""Distributed PCA: fit by partition-partial sufficient statistics
(count, sum vector, Gram matrix) reduced driver-side, eigendecomposition
on the tiny d x d covariance, projection broadcast back as a literal.

The scale shape is the classic big-data PCA: every executor compresses
its partition to ONE (n, Σx, XᵀX) row in an Arrow pass — d + d² doubles
regardless of partition size — so the driver reduce touches
n_partitions rows, never the data. The eigh runs on d x d (64 x 64
here), the same bounded-driver-state pattern as the PQ/IVF codebooks.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_pca(df: DataFrame, vec_col: str = "embedding", k: int = 8):
    """Return (mu, components, explained_ratio) for the top-``k``
    principal axes of ``df[vec_col]``.

    mu: list[d] column means; components: k x d row-major list of
    unit eigenvectors (descending eigenvalue, sign-fixed so each
    vector's max-|coefficient| entry is positive — eigh's sign is
    otherwise arbitrary); explained_ratio: k variance fractions.

    Deterministic: partials are reduced in a canonical sort order, so
    the float sums do not depend on collect order.
    """
    def partials(it):
        n, s, g = 0, None, None
        for pdf in it:
            if not len(pdf):
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            n += X.shape[0]
            s = X.sum(0) if s is None else s + X.sum(0)
            gg = X.T @ X
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, "n long, s array<double>, g array<double>")
        .collect()  # <= one row per partition: d + d^2 doubles each
    )
    if not rows:
        raise ValueError("fit_pca: empty input")
    rows.sort(key=lambda r: (r["n"], tuple(r["s"][:4])))
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:
        s += np.array(r["s"])
        g += np.array(r["g"]).reshape(d, d)
    mu = s / n
    cov = (g - n * np.outer(mu, mu)) / max(n - 1, 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # k x d
    for i in range(comps.shape[0]):  # canonical sign
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total = float(vals.sum()) or 1.0
    ratio = [float(vals[o]) / total for o in order]
    return mu.tolist(), comps.tolist(), ratio


def pca_project(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
) -> DataFrame:
    """Project every vector onto the top-``k`` principal axes.

    Returns (id_col, z1..zk atomic DOUBLE columns, z_norm). The model
    (mu + k x d components) rides to executors as broadcast literals in
    an iterator pandas_udf — one matmul per Arrow batch, no shuffle:
    the projection is a pure map at any scale.
    """
    from pyspark.sql.functions import pandas_udf

    mu, comps, _ = fit_pca(df, vec_col, k)
    mu_a = np.array(mu)
    w = np.array(comps)  # k x d

    @pandas_udf("array<double>")
    def project(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for v in it:
            # reshape(-1, d) keeps an empty Arrow batch a (0, d) matrix
            # instead of a shape-(0,) array that breaks the broadcast
            # against mu (r8 ADVICE)
            X = np.array(v.tolist(), dtype=np.float64).reshape(-1, len(mu_a))
            Z = np.round((X - mu_a) @ w.T, 6)
            yield pd.Series(list(Z))

    out = df.select(id_col, project(F.col(vec_col)).alias("z"))
    return out.select(
        id_col,
        *[F.col("z").getItem(i).alias(f"z{i + 1}") for i in range(k)],
        F.round(
            F.sqrt(F.expr("aggregate(z, 0.0d, (a, x) -> a + x * x)")), 6
        ).alias("z_norm"),
    )
