"""PCA over embedding columns — the data-dependent complement of the JL
random projection in ``operators/similarity_search.py``.

SemDeDup/D4-style curation pipelines PCA-reduce (often whiten) embedding
corpora before clustering and near-dup search: unlike the
data-independent JL matrix, the principal axes concentrate variance, so
k PCA dims preserve cosine structure that JL needs several-fold more
dims to match. No reference analog (the reference has no embedding
operators at all) — LLM-pipeline extension; the nearest reference idea
is the similarity scorer matrix (src/analysis/text_distance_analysis.py)
which also reduces pairwise structure to a small dense model.

Three entry points, mirroring the IVF trainer family's posture
(similarity_search.py::train_ivf_centroids / _local):

- ``pca_fit``            — deterministic md5-ordered sample (TakeOrdered,
                           no shuffle) + driver-side numpy eigh; bit-
                           reproducible, the oracle-checkable form.
- ``pca_fit_local``      — Spark-free twin (pyarrow + numpy): same
                           sample rule, same kernel, bit-identical
                           model. Embeds the model as DuckDB literals.
- ``pca_fit_moments``    — fully distributed moments (one pass over ALL
                           rows, Arrow-batched partial sums, driver
                           eigh of the d x d covariance). The at-scale
                           estimator; value-deterministic but not
                           bit-pinned across repartitionings (float
                           partial-sum order), the refine_ivf_centroids
                           posture.

``pca_project`` is a pure map with two bit-identical physical forms
(``np`` Arrow-batched / ``expr`` JVM fold), the project_embeddings
contract: both accumulate in input-dim order in float64 so the DuckDB
oracle's list_reduce agrees bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _pca_np(mat, k: int, center: bool = True):
    """Shared PCA kernel: eigh of the (biased, /n) covariance of the
    sample matrix, top-k axes, sign-pinned so each component's
    largest-|x| coordinate is positive (np.argmax tie-break: first).

    Returns ``(mean, components, eigenvalues)`` — mean ``(d,)``,
    components ``(k, d)`` row-major, eigenvalues ``(k,)`` descending.
    Deterministic for a fixed sample on a fixed platform (the _kmeans_np
    contract): the oracle generator and the Spark job share this exact
    code path on the exact same sample, so the literals match.
    """
    import numpy as np

    X = np.asarray(mat, dtype=np.float64)
    if X.ndim != 2 or X.shape[0] == 0:
        raise ValueError("pca: empty or malformed sample")
    n, d = X.shape
    if not 1 <= k <= d:
        raise ValueError(f"pca: k={k} out of range for d={d}")
    mean = X.mean(axis=0) if center else np.zeros(d)
    Xc = X - mean
    cov = (Xc.T @ Xc) / n
    w, V = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = V[:, order].T.copy()
    eig = np.maximum(w[order], 0.0)
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    return mean, comps, eig


def pca_fit(
    corpus: DataFrame,
    k: int = 8,
    vec: str = "embedding",
    id_col: str = "vec_id",
    sample_cap: int = 65536,
    center: bool = True,
):
    """Fit PCA on a deterministic sample of the corpus.

    Scale shape: the sample is the first ``sample_cap`` rows ordered by
    ``md5(id)`` — Spark executes the orderBy+limit as TakeOrdered
    (per-partition partial top-k + driver merge, NO full shuffle), so
    sampling 64k rows out of 100 TB moves ~sample_cap rows total. The
    eigh itself is a d x d driver-side problem (d = embedding width,
    KBs). For an all-rows estimate use ``pca_fit_moments``.

    Returns ``(mean, components, eigenvalues)`` as numpy arrays —
    bit-identical to ``pca_fit_local`` on the same parquet.
    """
    rows = (
        corpus.select(F.col(id_col), F.col(vec))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_cap)
        .collect()
    )
    return _pca_np([list(r[vec]) for r in rows], k, center)


def pca_fit_local(
    parquet_path: str,
    k: int = 8,
    vec: str = "embedding",
    id_col: str = "vec_id",
    sample_cap: int = 65536,
    center: bool = True,
):
    """Spark-free twin of ``pca_fit`` (pyarrow + numpy): same sample
    rule (md5-of-id order), same kernel, bit-identical model. Used to
    embed the trained mean/components as literals in DuckDB oracle SQL
    (the train_ivf_centroids_local pattern)."""
    import pyarrow.parquet as pq

    from ncbi_analysis_spark.operators.similarity_search import (
        _sample_order_key,
    )

    t = pq.read_table(parquet_path, columns=[id_col, vec])
    ids = t[id_col].to_pylist()
    vecs = t[vec].to_pylist()
    order = sorted(range(len(ids)), key=lambda i: _sample_order_key(ids[i]))
    return _pca_np([vecs[i] for i in order[:sample_cap]], k, center)


def pca_fit_moments(
    corpus: DataFrame,
    k: int = 8,
    vec: str = "embedding",
    center: bool = True,
):
    """Fit PCA from exact full-corpus moments — the at-scale estimator.

    One Arrow-batched pass: each partition folds its rows into
    ``(n, sum_v, sum_vvT)`` partials (d + d^2 doubles per partition, NOT
    per row), the driver sums the per-partition rows (numPartitions
    rows collected — bounded) and eigh-decomposes the d x d covariance.
    No vector ever crosses a shuffle; the reduce state is O(d^2)
    regardless of corpus size.

    Value-deterministic but not bit-reproducible across repartitionings
    (float addition order in the partials — the refine_ivf_centroids
    posture); use ``pca_fit`` when bit-pinning matters (oracles).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("ss", T.ArrayType(T.DoubleType())),
        ]
    )

    def partials(batches):
        n = 0
        s = None
        ss = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(list(pdf[vec]), dtype=np.float64)
            n += X.shape[0]
            if s is None:
                s = X.sum(axis=0)
                ss = X.T @ X
            else:
                s += X.sum(axis=0)
                ss += X.T @ X
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s], "ss": [ss.reshape(-1)]}
            )

    rows = corpus.select(vec).mapInPandas(partials, schema).collect()
    if not rows:
        raise ValueError("pca_fit_moments: empty corpus")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    d = s.shape[0]
    ss = np.sum(
        [np.asarray(r["ss"]).reshape(d, d) for r in rows], axis=0
    )
    mean = s / n if center else np.zeros(d)
    cov = ss / n - np.outer(mean, mean)
    if not 1 <= k <= d:
        raise ValueError(f"pca: k={k} out of range for d={d}")
    w, V = np.linalg.eigh((cov + cov.T) / 2.0)
    order = np.argsort(w)[::-1][:k]
    comps = V[:, order].T.copy()
    eig = np.maximum(w[order], 0.0)
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    return mean, comps, eig


def pca_project(
    corpus: DataFrame,
    mean,
    components,
    vec: str = "embedding",
    id_col: str = "vec_id",
    whiten: bool = False,
    eigenvalues=None,
    eps: float = 1e-9,
    method: str = "np",
) -> DataFrame:
    """Project the embedding column onto the fitted axes — pure map, no
    shuffle; shrinks every downstream shuffle byte count by k/d.

    ``proj_j = (fold_t v_t * comp[j][t]) - (mean . comp[j])`` — the
    centering is applied as one precomputed-scalar subtraction AFTER the
    fold (algebraically (v-m).c, arithmetically pinned to this exact
    order), and the fold accumulates in input-dim order in float64 on
    BOTH physical forms (``np`` Arrow-batched loop / ``expr`` JVM
    zip_with+aggregate fold), the project_embeddings bit-parity
    contract — so the DuckDB oracle's list_reduce over the same
    literals agrees bit-for-bit.

    ``whiten=True`` rescales each output dim by ``1/sqrt(eig_j + eps)``
    (unit variance along each axis — the SemDeDup preprocing); one
    multiply AFTER the fold, same order both forms.

    Output: ``(id_col, proj array<double>)``.
    """
    import numpy as np

    M = np.asarray(mean, dtype=np.float64)
    C = np.asarray(components, dtype=np.float64)
    k, d = C.shape
    if M.shape != (d,):
        raise ValueError(f"pca_project: mean dim {M.shape} vs d={d}")
    if whiten:
        if eigenvalues is None:
            raise ValueError("pca_project: whiten=True needs eigenvalues")
        scale = 1.0 / np.sqrt(np.asarray(eigenvalues, np.float64) + eps)
    else:
        scale = np.ones(k)

    if method == "expr":
        cols = [
            (
                F.aggregate(
                    F.zip_with(
                        F.transform(F.col(vec), lambda x: x.cast("double")),
                        F.lit([float(x) for x in C[j]]),
                        lambda x, c: x * c,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                - F.lit(float(np.dot(M, C[j])))
            )
            * F.lit(float(scale[j]))
            for j in range(k)
        ]
        return corpus.select(F.col(id_col), F.array(*cols).alias("proj"))
    if method != "np":
        raise ValueError(f"unknown pca_project method: {method!r}")

    import pandas as pd
    from pyspark.sql import types as T

    # (v - m) . c == (v . c) - (m . c): fold v.c in input-dim order and
    # subtract the precomputed m.c scalar — identical arithmetic to the
    # expr form above, and one subtraction instead of d
    mc = np.array([float(np.dot(M, C[j])) for j in range(k)])
    bc = corpus.sparkSession.sparkContext.broadcast((C.T.copy(), mc, scale))
    fields = {f.name: f for f in corpus.schema.fields}
    schema = T.StructType(
        [
            T.StructField(id_col, fields[id_col].dataType),
            T.StructField("proj", T.ArrayType(T.DoubleType())),
        ]
    )

    def gen(batches):
        CT_, mc_, sc_ = bc.value  # (d, k): row t = every axis's t-coord
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(list(pdf[vec]), dtype=np.float64)
            out = np.zeros((len(X), CT_.shape[1]))
            # input-dim-order accumulation: bit-identical to the expr
            # fold and the oracle's list_reduce
            for t in range(CT_.shape[0]):
                out += X[:, t, None] * CT_[None, t, :]
            out = (out - mc_[None, :]) * sc_[None, :]
            yield pd.DataFrame({id_col: pdf[id_col], "proj": list(out)})

    return corpus.select(id_col, vec).mapInPandas(gen, schema)


def pca_fit_moments_local(
    parquet_path: str,
    k: int,
    vec: str = "embedding",
    center: bool = True,
):
    """Spark-free twin of ``pca_fit_moments`` (pyarrow + numpy): the
    same exact-moments covariance (``ss/n - outer(mean, mean)``) from
    one local pass over ALL rows, same eigh kernel. Used to embed the
    moments-fit model (eigen spectrum) as literals in DuckDB oracle SQL
    (the pca_fit_local pattern).

    Summation order differs from the distributed partials (numpy
    pairwise over the whole table vs per-partition partials), so the
    twin is VALUE-equal (~1e-15 relative), not bit-equal — oracled
    queries must reduce its outputs to comparison-robust integers
    (threshold ranks, ppm floors), never raw doubles.
    """
    import numpy as np
    import pyarrow.parquet as pq

    X = np.array(
        pq.read_table(parquet_path, columns=[vec])[vec].to_pylist(),
        dtype=np.float64,
    )
    n, d = X.shape
    if not 1 <= k <= d:
        raise ValueError(f"pca: k={k} out of range for d={d}")
    s = X.sum(axis=0)
    ss = X.T @ X
    mean = s / n if center else np.zeros(d)
    cov = ss / n - np.outer(mean, mean)
    w, V = np.linalg.eigh((cov + cov.T) / 2.0)
    order = np.argsort(w)[::-1][:k]
    comps = V[:, order].T.copy()
    eig = np.maximum(w[order], 0.0)
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    return mean, comps, eig


def explained_variance_ratio(eigenvalues, total_variance: float):
    """Per-axis fraction of total variance captured (diagnostic for
    choosing k). ``total_variance`` = trace of the covariance — returned
    eigenvalue sum is a lower bound; pass ``float(np.trace(cov))`` or
    the sum of ALL eigenvalues when available."""
    import numpy as np

    e = np.asarray(eigenvalues, dtype=np.float64)
    if total_variance <= 0:
        raise ValueError("total_variance must be positive")
    return e / float(total_variance)
