"""Distributed PCA over an embedding column — the whitening /
dimensionality-reduction step embedding pipelines run before indexing
or clustering at corpus scale.

The scalable decomposition (same shape MLlib's RowMatrix PCA uses):

1. each partition computes its PARTIAL second-moment (Gram) matrix
   X_p^T X_p and partial sum vector with one numpy matmul over the
   Arrow batch — a mapInPandas pass that reduces n x d rows to a
   handful of d x d matrices (the one legitimately-Python spot:
   dense BLAS beats any per-element SQL expression tree);
2. the d x d partials (d^2 doubles, kilobytes) sum in a single tiny
   aggregation — this is a tree-reduce of matrices, data volume
   independent of corpus size;
3. the d x d covariance eigendecomposition runs on the driver (numpy;
   d is small by construction) and the top-k components broadcast back
   as literal weight arrays;
4. projection is a row-local sequential-fold dot per component —
   JVM-side, shuffle-free, whole-stage-codegen.

Float sums are order-dependent, so PCA results are NOT bit-portable
across engines/partitionings — the operator is rows-only by design;
its numerics are pinned against a single-node numpy reference in
tests/test_pca.py (subspace agreement, not sign/order of components,
which are genuinely arbitrary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def gram_and_mean(df: DataFrame, vec_col: str, dim: int):
    """(sum of outer products, mean vector, n) for the embedding column,
    computed via per-partition numpy partials. Returns driver-side
    (numpy (d,d), numpy (d,), int) — d x d is tiny by construction."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("g", T.ArrayType(T.DoubleType())),
        ]
    )

    def partials(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf.iloc[:, 0]]
            )
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "g": [(X.T @ X).ravel().tolist()],
                }
            )

    parts = df.select(vec_col).mapInPandas(partials, out_schema).collect()
    n = sum(r.n for r in parts)
    s = np.sum([np.asarray(r.s) for r in parts], axis=0)
    g = np.sum([np.asarray(r.g).reshape(dim, dim) for r in parts], axis=0)
    return g, s / n, n


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    k: int = 8,
) -> DataFrame:
    """Project each embedding onto the top-``k`` principal components of
    the corpus. Returns (id, pc0..pc{k-1} double columns) — scalar
    columns, not ``array<double>``: downstream tabular consumers (and
    the driver's pandas canonicalizer) need hashable cells."""
    import numpy as np

    g, mean, n = gram_and_mean(df, vec_col, dim)
    # covariance from the moment matrix: (G - n * mean mean^T) / (n - 1)
    cov = (g - n * np.outer(mean, mean)) / max(n - 1, 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending eigenvalues
    comps = vecs[:, ::-1][:, :k]  # top-k columns, (d, k)

    # centered projection as row-local fold: (x - mean) . comp
    # == x . comp - mean . comp, so the mean-dot is a per-component
    # scalar folded into the literal
    proj_cols = []
    for j in range(k):
        w = comps[:, j]
        arr = ", ".join(f"CAST({float(c)!r} AS DOUBLE)" for c in w)
        mdot = float(mean @ w)
        proj_cols.append(
            F.expr(
                f"aggregate(zip_with({vec_col}, array({arr}), (x, w) -> "
                f"CAST(x AS DOUBLE) * w), CAST(0 AS DOUBLE), "
                f"(acc, v) -> acc + v) - CAST({mdot!r} AS DOUBLE)"
            ).alias(f"pc{j}")
        )
    return df.select(F.col(id_col), *proj_cols)
