"""PCA / whitening projections for embedding columns — the standard
preprocessing in front of ANN and semantic dedup (the SemDeDup paper
itself clusters dimensionality-reduced embeddings; whitening is the
anisotropy fix `plans/vectors_qa.py:embedding_covariance` diagnoses).

Scale shape: the covariance accumulation is fully distributed (one
exploded-dims pass, grouped integer-exact sums — linear in corpus
size); only the dim x dim eigensolve runs on the driver (64 x 64 here
— microseconds, and bounded by EMBEDDING dimensionality, never corpus
size), and the projection itself is a per-row native expression
(n_components dot products of codegen arithmetic, no UDF, no shuffle).

Determinism: covariance sums quantize components to 1e-6 integer
units (exact integer aggregation, order-independent — the
``embedding_covariance`` module discipline); eigenvectors fix their
sign so the largest-|.|-magnitude entry is positive (numpy's sign is
otherwise arbitrary) and round to 9dp before broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _cov_and_mean(emb: DataFrame, vec_col: str, dim: int):
    """(mean vector, covariance matrix) as numpy arrays, accumulated
    distributed-side with exact integer sums (1e-6 quantization), then
    assembled on the driver from dim + dim*(dim+1)/2 scalar rows."""
    import numpy as np

    comp = emb.select(
        "vec_id",
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x"),
    ).select(
        "vec_id", "i", F.round(F.col("x") * 1e6, 0).cast("long").alias("e6")
    )
    a, b = comp.alias("a"), comp.alias("b")
    sums = (
        a.join(b, (F.col("a.vec_id") == F.col("b.vec_id"))
               & (F.col("a.i") <= F.col("b.i")))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("a.e6") * F.col("b.e6")).alias("sxy"),
            F.sum(F.col("a.e6")).alias("sx"),
            F.sum(F.col("b.e6")).alias("sy"),
        )
        .collect()
    )
    mean = np.zeros(dim)
    cov = np.zeros((dim, dim))
    for r in sums:
        i, j, n = r["i"], r["j"], r["n"]
        c = r["sxy"] / n / 1e12 - (r["sx"] / n / 1e6) * (r["sy"] / n / 1e6)
        cov[i, j] = cov[j, i] = c
        if i == j:
            mean[i] = r["sx"] / n / 1e6
    return mean, cov


def pca_components(
    emb: DataFrame,
    n_components: int = 8,
    vec_col: str = "embedding",
    dim: int = 64,
):
    """(mean, eigenvalues, components): top principal axes of the
    embedding cloud, eigenvalue-descending, sign-fixed and 9dp-rounded
    for run-to-run determinism. Driver cost is the dim x dim eigensolve
    only."""
    import numpy as np

    mean, cov = _cov_and_mean(emb, vec_col, dim)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:n_components]
    vals, vecs = vals[order], vecs[:, order]
    for c in range(vecs.shape[1]):
        pivot = int(np.argmax(np.abs(vecs[:, c])))
        if vecs[pivot, c] < 0:
            vecs[:, c] = -vecs[:, c]
    return (
        np.round(mean, 9),
        np.round(vals, 9),
        np.round(vecs, 9),
    )


def pca_project(
    emb: DataFrame,
    n_components: int = 8,
    vec_col: str = "embedding",
    dim: int = 64,
    whiten: bool = False,
    min_eigval: float = 1e-9,
) -> DataFrame:
    """(vec_id, projection): center on the corpus mean and project
    onto the top ``n_components`` principal axes; ``whiten=True``
    additionally scales each coordinate by 1/sqrt(eigenvalue)
    (identity covariance out, the cosine-geometry fix for anisotropic
    encoders), with tiny eigenvalues floored at ``min_eigval``.

    The projection is a per-row SELECT of ``n_components`` literal dot
    products (zip_with + aggregate over the broadcast-as-literal
    component vectors) — whole-stage codegen, no UDF, no join, no
    shuffle: the plan a 100 TB projection pass needs."""
    mean, vals, vecs = pca_components(emb, n_components, vec_col, dim)
    v = F.col(vec_col).cast("array<double>")

    def dot(c: int):
        scale = 1.0
        if whiten:
            scale = 1.0 / max(vals[c], min_eigval) ** 0.5
        axis = F.array(*[F.lit(float(vecs[d, c])) for d in range(dim)])
        centered = F.zip_with(
            v,
            F.array(*[F.lit(float(mean[d])) for d in range(dim)]),
            lambda x, m: x - m,
        )
        return F.round(
            F.aggregate(
                F.zip_with(centered, axis, lambda x, a: x * a),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
            * F.lit(float(scale)),
            6,
        )

    return emb.select(
        "vec_id", F.array(*[dot(c) for c in range(n_components)]).alias("projection")
    )
