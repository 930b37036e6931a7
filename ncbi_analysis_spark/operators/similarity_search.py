"""Approximate-nearest-neighbor search over embedding columns
(BASELINE.json north-star extension).

- ``brute_force_topk``: exact cosine top-k of every query against the
  corpus. Queries are a small set -> broadcast; the corpus streams; per
  (query, corpus-partition) partial top-k then a final merge — Spark's
  window TopK gives exactly the partial/merge physical shape.
- ``ivf_topk``: IVF-style two-stage search — corpus rows are assigned to
  their nearest centroid (the coarse quantizer); a query probes only the
  ``nprobe`` closest centroid buckets. At 100 TB the corpus is
  partitioned/bucketed by centroid id so a probe touches ~nprobe/k of the
  data. Centroids come from ``train_ivf_centroids`` (a seeded spherical
  kmeans over a deterministic TakeOrdered sample — the offline index-build
  job) or are caller-provided; the operator contract is bucket-prune +
  exact re-rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ncbi_analysis_spark.functions.vectors import cosine
from ncbi_analysis_spark.operators.topk import topk_per_group


from ncbi_analysis_spark.operators.spread import (  # noqa: E402
    spread_narrow as _spread_scoring,
    spread_parallelism as _scoring_parallelism,
)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec: str = "embedding",
    id_col: str = "vec_id",
    q_id: str = "q_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Output: (q_id, vec_id, cos_sim, rk) — deterministic ordering with
    vec_id as tiebreaker.
    """
    # queries are the small side -> broadcast; the corpus never moves
    # (the _spread_scoring round-robin only fires when the corpus scan
    # is narrower than the session's parallelism — tiny-input case)
    joined = _spread_scoring(
        corpus.select(F.col(id_col), F.col(vec).alias("__cv"))
    ).join(
        F.broadcast(queries.select(F.col(q_id), F.col(vec).alias("__qv"))),
        how="cross",
    )
    scored = joined.select(
        q_id, id_col, F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim")
    )
    return topk_per_group(
        scored, [q_id], [F.desc("cos_sim"), F.asc(id_col)], k, rank_col="rk"
    )


def brute_force_topk_np(
    corpus: DataFrame,
    queries: DataFrame,
    vec: str = "embedding",
    id_col: str = "vec_id",
    q_id: str = "q_id",
    k: int = 10,
) -> DataFrame:
    """Vectorized brute-force top-k: per Arrow batch, one BLAS matmul of
    the corpus block against the broadcast query matrix.

    This is the production path at 100 TB (the expression-fold variant
    ``brute_force_topk`` is kept as the bit-reproducible oracle-checked
    form): ~10-100x less per-row overhead, identical ranking up to
    float-summation order. Emits per-partition partial top-k, then the
    global window merge — the same partial/merge shape.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    q_rows = queries.select(q_id, vec).collect()
    q_ids = [r[q_id] for r in q_rows]
    q_mat = np.array([r[vec] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    q_norm[q_norm == 0] = 1.0
    bq = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat, q_norm))

    schema = T.StructType([
        T.StructField("q_id", T.LongType()),
        T.StructField(id_col, T.LongType()),
        T.StructField("cos_sim", T.DoubleType()),
    ])

    def gen(batches):
        q_ids_, q_mat_, q_norm_ = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_mat = np.array(list(pdf[vec]), dtype=np.float64)
            c_norm = np.linalg.norm(c_mat, axis=1)
            c_norm[c_norm == 0] = 1.0
            sims = (c_mat @ q_mat_.T) / (c_norm[:, None] * q_norm_[None, :])
            ids = pdf[id_col].to_numpy()
            out = []
            # partial top-k per batch per query: only k rows per query
            # leave the executor
            for qi, qid in enumerate(q_ids_):
                col = sims[:, qi]
                if len(col) > k:
                    part = np.argpartition(-col, k)[:k]
                else:
                    part = np.arange(len(col))
                for ci in part:
                    out.append((qid, int(ids[ci]), round(float(col[ci]), 6)))
            yield pd.DataFrame(out, columns=["q_id", id_col, "cos_sim"])

    partial = corpus.select(id_col, vec).mapInPandas(gen, schema)
    return topk_per_group(
        partial, [q_id], [F.desc("cos_sim"), F.asc(id_col)], k, rank_col="rk"
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    vec: str = "embedding",
    id_col: str = "vec_id",
    c_id: str = "c_id",
    method: str = "auto",
    max_expr_centroids: int = 100,
) -> DataFrame:
    """Nearest-centroid assignment as a PURE MAP — no join, no window, no
    shuffle anywhere between the corpus scan and whatever consumes the
    assignment. This is the index-build step; at 100 TB its output is
    written bucketed by ``c_id`` so searches prune to buckets with no
    further shuffle.

    Two physical forms, same logical op:

    - ``method='expr'``: centroids are embedded as plan literals and the
      argmax is a column expression (sequential left-fold dot product —
      bit-identical to the DuckDB oracle's ``list_reduce``). Right for
      small centroid tables; a k x d literal array stops being viable
      well before k ~ 10^4 (Catalyst plan/codegen size scales with k*d).
    - ``method='np'``: the centroid matrix is broadcast and each Arrow
      batch does one BLAS matmul + argmax in ``mapInPandas`` (the
      ``brute_force_topk_np`` pattern). Plan size is O(1) in k — this is
      the production path for realistic coarse quantizers (k ~ 10^4-10^5).
      Scores differ from the expr form only in float-summation order.

    ``method='auto'`` (default) picks ``expr`` up to ``max_expr_centroids``
    centroids and ``np`` past that, keeping the bit-reproducible form on
    oracle-sized inputs and the O(1)-plan form at scale.

    Tie-break is identical in both forms: highest score first, then lowest
    centroid id (centroids are evaluated in ascending-id order and both
    ``array_position`` and ``np.argmax`` take the FIRST maximum).

    Output: (id_col, __cv [the vector], c_id).
    """
    import math

    rows = sorted(
        centroids.select(F.col(c_id), F.col(vec)).collect(), key=lambda r: r[c_id]
    )
    if not rows:
        raise ValueError("centroids must be non-empty")
    if method == "auto":
        method = "expr" if len(rows) <= max_expr_centroids else "np"
    if method == "np":
        return _ivf_assign_np(corpus, rows, vec, id_col, c_id)
    if method != "expr":
        raise ValueError(f"unknown ivf_assign method: {method!r}")

    # centroid norms are constants -> computed ONCE on the driver with the
    # same sequential left-fold the SQL oracle uses (0.0 + x0*x0 + ... is
    # bit-identical to DuckDB's list_reduce), so per corpus row the score
    # is a single dot fold per centroid: dot(v, c) / ||c||. Dividing by
    # ||v|| is skipped — it's a positive per-row constant, so the argmax
    # (and its first-max tie-break) is unchanged.
    def _norm(v) -> float:
        acc = 0.0
        for x in v:
            acc += float(x) * float(x)
        return math.sqrt(acc)

    # single Literal nodes, not CreateArray-of-k*d-children: every
    # Catalyst rule pass walks each child, so hundreds of literal
    # children add seconds of planning per query (same doubles either
    # way — the oracle fold is unchanged)
    cent_arr = F.lit([[float(x) for x in r[vec]] for r in rows])
    norm_arr = F.lit([_norm(r[vec]) for r in rows])
    ids_arr = F.lit([int(r[c_id]) for r in rows]).cast("array<long>")
    cvd = F.transform(F.col("__cv"), lambda x: x.cast("double"))
    sims = F.zip_with(
        cent_arr, norm_arr,
        lambda cv, nc: F.when(nc == 0, F.lit(0.0)).otherwise(
            F.aggregate(
                F.zip_with(F.col("__cvd"), cv, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ) / nc
        ),
    )
    return (
        corpus.select(F.col(id_col), F.col(vec).alias("__cv"))
        .withColumn("__cvd", cvd)
        .withColumn("__sims", sims)
        .withColumn(
            c_id,
            F.element_at(
                ids_arr,
                F.array_position(F.col("__sims"), F.array_max("__sims")).cast("int"),
            ),
        )
        .drop("__sims", "__cvd")
    )


def _ivf_assign_np(
    corpus: DataFrame,
    rows,
    vec: str,
    id_col: str,
    c_id: str,
) -> DataFrame:
    """Broadcast-matrix assignment: one (batch x d) @ (d x k) matmul per
    Arrow batch, ``np.argmax`` for the first-max tie-break. Plan size is
    independent of centroid count, so k ~ 10^5 coarse quantizers work
    where the literal-expression form would blow Catalyst limits.

    Score matches the expr form's contract: dot(v, c) / ||c|| (dividing
    by ||v|| is skipped — a positive per-row constant never changes the
    argmax); zero-norm centroids score 0.0 everywhere.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    ids = np.array([int(r[c_id]) for r in rows], dtype=np.int64)
    mat = np.array([list(r[vec]) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    nz = norms != 0
    bc = corpus.sparkSession.sparkContext.broadcast((ids, mat, norms, nz))

    fields = {f.name: f for f in corpus.schema.fields}
    schema = T.StructType([
        T.StructField(id_col, fields[id_col].dataType),
        T.StructField("__cv", fields[vec].dataType),
        T.StructField(c_id, T.LongType()),
    ])

    def gen(batches):
        ids_, mat_, norms_, nz_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c_mat = np.array(list(pdf[vec]), dtype=np.float64)
            sims = c_mat @ mat_.T
            sims[:, nz_] /= norms_[nz_][None, :]
            sims[:, ~nz_] = 0.0
            best = np.argmax(sims, axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "__cv": pdf[vec], c_id: ids_[best]}
            )

    return corpus.select(id_col, vec).mapInPandas(gen, schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    vec: str = "embedding",
    id_col: str = "vec_id",
    q_id: str = "q_id",
    c_id: str = "c_id",
    k: int = 10,
    nprobe: int = 2,
    assigned: DataFrame | None = None,
    prefilter_partitions: bool = False,
) -> DataFrame:
    """IVF bucket-pruned top-k: assign corpus rows to nearest centroid
    (map-side argmax, see ivf_assign), probe the ``nprobe`` nearest
    centroid buckets per query, exact re-rank inside the probed buckets.

    Pass ``assigned`` (a prebuilt ivf_assign output) to search an
    existing index — the production shape, where the index is built once
    offline and queries pay only probe + re-rank. With an index opened
    from ``write_ivf_index`` (parquet partitioned by ``c_id``), add
    ``prefilter_partitions=True`` so unprobed bucket directories are
    never read (static partition pruning).

    The probe set (queries x nprobe) is tiny -> broadcast into the bucket
    join, so the corpus side never shuffles before the bucket prune; the
    only corpus-scale movement is the final per-query top-k window over
    the ~nprobe/k_centroids fraction of rows that survive the prune.
    """
    if assigned is None:
        # spread the corpus first so the assign fold itself (k dots per
        # row) parallelizes on narrow scans — no-op at corpus scale
        assigned = ivf_assign(_spread_scoring(corpus), centroids, vec,
                              id_col, c_id)

    cent = centroids.select(F.col(c_id), F.col(vec).alias("__cent"))
    probes = (
        queries.select(F.col(q_id), F.col(vec).alias("__qv"))
        .join(F.broadcast(cent), how="cross")
        .select(q_id, "__qv", c_id, cosine(F.col("__qv"), F.col("__cent")).alias("__sim"))
    )
    probes = topk_per_group(probes, [q_id], [F.desc("__sim"), F.asc(c_id)], nprobe).select(
        q_id, "__qv", c_id
    )

    if prefilter_partitions:
        # The union of probed bucket ids is bounded by the centroid count
        # (tiny by IVF contract), so collecting it is a scalar-sized
        # driver hop — and the isin filter it produces reaches a
        # c_id-PARTITIONED index (write_ivf_index) as a static
        # PartitionFilter: unprobed bucket directories are never read.
        # Without it the same prune happens only logically (rows dropped
        # by the broadcast join after being scanned) or via dynamic
        # partition pruning when the runtime enables it; the explicit
        # filter makes the physical skip unconditional.
        probe_ids = [r[c_id] for r in probes.select(c_id).distinct().collect()]
        assigned = assigned.filter(F.col(c_id).isin(probe_ids))

    # the exact re-rank fold runs on `assigned`'s partitioning — a
    # bucket-pruned index read (or cached assign) is often 1-2 tiny
    # partitions while the per-row fold is the stage's entire cost
    scored = _spread_scoring(assigned) \
        .join(F.broadcast(probes), on=c_id, how="inner").select(
        q_id, id_col, F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim")
    )
    return topk_per_group(scored, [q_id], [F.desc("cos_sim"), F.asc(id_col)], k, rank_col="rk")


def _kmeans_np(mat, k: int, n_iter: int, seed: int):
    """Seeded spherical k-means on an in-memory sample (numpy, driver-side).

    Spherical (unit-normalized rows, dot-product assignment, re-normalized
    means) because the IVF search metric is cosine — euclidean kmeans on
    unnormalized vectors optimizes the wrong partition. kmeans++ init from
    a fixed RandomState; fully deterministic given (mat row order, k,
    n_iter, seed), which is what lets the DuckDB oracle re-derive the
    exact same centroids (see train_ivf_centroids_local).

    Returns a (k x d) float64 ndarray. Empty clusters keep their previous
    centroid (deterministic, no re-seeding).
    """
    import numpy as np

    X = np.asarray(mat, dtype=np.float64)
    n = len(X)
    if n == 0:
        raise ValueError("kmeans sample is empty")
    k = min(k, n)
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    Xn = X / norms[:, None]

    rng = np.random.RandomState(seed)
    first = int(rng.randint(n))
    chosen = [first]
    # kmeans++ on cosine distance 1 - dot (clipped at 0 for fp noise)
    d = np.maximum(1.0 - Xn @ Xn[first], 0.0)
    for _ in range(1, k):
        tot = d.sum()
        if tot <= 0:
            nxt = int(rng.randint(n))
        else:
            nxt = int(rng.choice(n, p=d / tot))
        chosen.append(nxt)
        d = np.minimum(d, np.maximum(1.0 - Xn @ Xn[nxt], 0.0))

    C = Xn[chosen].copy()
    for _ in range(n_iter):
        assign = np.argmax(Xn @ C.T, axis=1)
        for j in range(k):
            mask = assign == j
            if mask.any():
                c = Xn[mask].mean(axis=0)
                nc = np.linalg.norm(c)
                if nc > 0:
                    C[j] = c / nc
    return C


def _sample_order_key(id_val) -> tuple:
    """md5-of-string pseudo-random-but-stable ordering key; the local twin
    of Spark's ``orderBy(md5(cast(id as string)), id)``."""
    import hashlib

    return (hashlib.md5(str(id_val).encode()).hexdigest(), id_val)


def train_ivf_centroids(
    corpus: DataFrame,
    k: int = 8,
    vec: str = "embedding",
    id_col: str = "vec_id",
    c_id: str = "c_id",
    sample_cap: int = 65536,
    n_iter: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Train the IVF coarse quantizer on a deterministic sample — the
    offline index-build job the ivf_topk docstring promises.

    Scale shape: the sample is the first ``sample_cap`` rows ordered by
    ``md5(id)`` — a uniform-but-stable pseudo-random order that Spark
    executes as TakeOrdered (per-partition partial top-k + driver merge,
    NO full shuffle), so sampling 100k rows out of 100 TB moves only
    ~sample_cap rows per partition boundary. Training itself is seeded
    numpy on the driver (a 100k x d matrix is MBs); the output centroid
    DataFrame feeds ivf_assign / write_ivf_index unchanged.

    Fully deterministic: same corpus + params -> bit-identical centroids,
    which is what makes the trained-IVF driver query oracle-checkable
    (train_ivf_centroids_local re-derives the same floats without Spark).
    """
    rows = (
        corpus.select(F.col(id_col), F.col(vec))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_cap)
        .collect()
    )
    C = _kmeans_np([list(r[vec]) for r in rows], k, n_iter, seed)
    return corpus.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(C)],
        schema=f"{c_id} bigint, {vec} array<double>",
    )


def refine_ivf_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    n_iter: int = 2,
    vec: str = "embedding",
    c_id: str = "c_id",
) -> DataFrame:
    """Distributed Lloyd refinement of a coarse quantizer over the FULL
    corpus — the at-scale half of a kmeans||-style pipeline
    (train_ivf_centroids seeds from a sample; this polishes against all
    the data the index will actually hold).

    Per iteration, per Arrow batch: one BLAS matmul argmax (broadcast
    centroid matrix, the _ivf_assign_np shape) + per-centroid partial
    sums — each batch emits at most k rows of (centroid, count, d-float
    sum), so the shuffle per iteration is O(batches x k x d) numbers, not
    the corpus. The k x d aggregate collects to the driver (bytes), new
    unit-normalized means broadcast back. Empty clusters keep their
    centroid. Spherical update identical to _kmeans_np (normalized rows,
    renormalized means), so refined centroids drop into ivf_assign /
    write_ivf_index unchanged.

    Determinism note: the per-centroid fold adds per-batch partial sums
    in collect_list arrival order, which depends on partitioning and
    task scheduling — refined centroids are therefore deterministic in
    VALUE up to float addition order, i.e. not bit-reproducible across
    runs or repartitionings (unlike the seeded train_ivf_centroids,
    whose output IS pinned and oracle-checked). Sort the partials by a
    batch key before folding if bit-reproducibility is ever required.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = corpus.sparkSession
    rows = sorted(centroids.select(c_id, vec).collect(), key=lambda r: r[c_id])
    ids = [int(r[c_id]) for r in rows]
    C = np.array([list(r[vec]) for r in rows], dtype=np.float64)

    schema = T.StructType([
        T.StructField("j", T.IntegerType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("sums", T.ArrayType(T.DoubleType())),
    ])

    for _ in range(n_iter):
        bc = spark.sparkContext.broadcast(C)

        def gen(batches, _bc=bc):
            Cb = _bc.value
            norms = np.linalg.norm(Cb, axis=1)
            norms[norms == 0] = 1.0
            Cn = Cb / norms[:, None]
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.array(list(pdf[vec]), dtype=np.float64)
                xn = np.linalg.norm(X, axis=1)
                xn[xn == 0] = 1.0
                Xn = X / xn[:, None]
                a = np.argmax(Xn @ Cn.T, axis=1)
                out = []
                for j in np.unique(a):
                    m = a == j
                    out.append((int(j), int(m.sum()), Xn[m].sum(axis=0).tolist()))
                yield pd.DataFrame(out, columns=["j", "cnt", "sums"])

        part = corpus.select(vec).mapInPandas(gen, schema)
        # one pass: per-centroid count + element-wise array sum (the
        # collect_list holds at most one row per (batch, centroid) —
        # scalar-scale next to the corpus)
        d = C.shape[1]
        zero = F.array(*[F.lit(0.0)] * d)
        agg = part.groupBy("j").agg(
            F.sum("cnt").alias("n"),
            F.aggregate(
                F.collect_list("sums"), zero,
                lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
            ).alias("s"),
        ).collect()
        bc.destroy()
        newC = C.copy()
        for r in agg:
            if r["n"] > 0:
                v = np.array(r["s"]) / r["n"]
                nv = np.linalg.norm(v)
                if nv > 0:
                    newC[r["j"]] = v / nv
        C = newC

    return spark.createDataFrame(
        [(ids[j], [float(x) for x in C[j]]) for j in range(len(ids))],
        schema=f"{c_id} bigint, {vec} array<double>",
    )


def train_ivf_centroids_local(
    parquet_path: str,
    k: int = 8,
    vec: str = "embedding",
    id_col: str = "vec_id",
    sample_cap: int = 65536,
    n_iter: int = 8,
    seed: int = 0,
):
    """Spark-free twin of train_ivf_centroids (pyarrow + numpy): same
    sample rule, same kernel, bit-identical centroids. Used to embed the
    trained centroids as literals in the DuckDB oracle SQL."""
    import pyarrow.parquet as pq

    t = pq.read_table(parquet_path, columns=[id_col, vec])
    ids = t[id_col].to_pylist()
    vecs = t[vec].to_pylist()
    order = sorted(range(len(ids)), key=lambda i: _sample_order_key(ids[i]))
    mat = [vecs[i] for i in order[:sample_cap]]
    return _kmeans_np(mat, k, n_iter, seed)


# ---------------------------------------------------------------------------
# Random projection (Johnson-Lindenstrauss dimensionality reduction)
# ---------------------------------------------------------------------------


def random_projection_matrix(d_in: int, d_out: int, seed: int = 0):
    """Seeded Gaussian projection matrix (d_in x d_out), scaled by
    1/sqrt(d_out) so expected norms are preserved (the JL estimator).
    Deterministic — the same floats regenerate anywhere, which is what
    lets the DuckDB oracle embed them as literals."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.standard_normal((d_in, d_out)) / np.sqrt(d_out)


def project_embeddings(
    corpus: DataFrame,
    d_out: int,
    vec: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 0,
    method: str = "np",
) -> DataFrame:
    """JL random projection of an embedding column to ``d_out`` dims —
    the cheap pre-filter that shrinks ANN/cluster inputs (distances
    preserved within (1±eps) at d_out ~ 8 ln n / eps^2) and the shuffle
    bytes of everything downstream by d_out/d_in.

    Pure map, no shuffle. Two physical forms with BIT-IDENTICAL output:
    ``np`` (default — broadcast matrix, per-Arrow-batch accumulation
    looping input dims in order) and ``expr`` (fold expressions, stays
    JVM-side, the DuckDB-oracle twin). Both accumulate in input-dim
    order in float64, so they and the oracle's list_reduce agree
    bit-for-bit.

    Output: ``(id_col, proj array<double>)``.
    """
    import numpy as np

    first = corpus.select(vec).first()
    if first is None:
        d_in = 0
    else:
        d_in = len(first[0])
    R = random_projection_matrix(d_in, d_out, seed)

    if method == "expr":
        cols = [
            F.aggregate(
                F.zip_with(
                    F.transform(F.col(vec), lambda x: x.cast("double")),
                    F.lit([float(R[t][j]) for t in range(d_in)]),
                    lambda x, r: x * r,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for j in range(d_out)
        ]
        return corpus.select(F.col(id_col), F.array(*cols).alias("proj"))
    if method != "np":
        raise ValueError(f"unknown project_embeddings method: {method!r}")

    import pandas as pd
    from pyspark.sql import types as T

    bc = corpus.sparkSession.sparkContext.broadcast(R)
    fields = {f.name: f for f in corpus.schema.fields}
    schema = T.StructType([
        T.StructField(id_col, fields[id_col].dataType),
        T.StructField("proj", T.ArrayType(T.DoubleType())),
    ])

    def gen(batches):
        R_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(list(pdf[vec]), dtype=np.float64)
            out = np.zeros((len(X), R_.shape[1]))
            # input-dim-order accumulation: bit-identical to the expr
            # form's sequential fold (and the oracle's list_reduce)
            for t in range(R_.shape[0]):
                out += X[:, t, None] * R_[None, t, :]
            yield pd.DataFrame({id_col: pdf[id_col], "proj": list(out)})

    return corpus.select(id_col, vec).mapInPandas(gen, schema)


# ---------------------------------------------------------------------------
# Product quantization (PQ): compressed-domain ANN
# ---------------------------------------------------------------------------


def _kmeans_euclid(mat, k: int, n_iter: int, seed: int):
    """Seeded euclidean Lloyd kmeans (kmeans++ init) on an in-memory
    sample — the subspace-codebook trainer for PQ (subvectors are NOT
    unit vectors, so the spherical kernel doesn't apply)."""
    import numpy as np

    X = np.asarray(mat, dtype=np.float64)
    n = len(X)
    if n == 0:
        raise ValueError("kmeans sample is empty")
    k = min(k, n)
    rng = np.random.RandomState(seed)
    first = int(rng.randint(n))
    chosen = [first]
    d2 = ((X - X[first]) ** 2).sum(axis=1)
    for _ in range(1, k):
        tot = d2.sum()
        nxt = int(rng.choice(n, p=d2 / tot)) if tot > 0 else int(rng.randint(n))
        chosen.append(nxt)
        d2 = np.minimum(d2, ((X - X[nxt]) ** 2).sum(axis=1))
    C = X[chosen].copy()
    for _ in range(n_iter):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return C


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    codewords: int = 256,
    vec: str = "embedding",
    id_col: str = "vec_id",
    sample_cap: int = 65536,
    n_iter: int = 8,
    seed: int = 0,
):
    """Train PQ codebooks on the same deterministic md5-ordered sample as
    train_ivf_centroids: rows are unit-normalized (the search metric is
    cosine, and normalizing first makes inner product == cosine), split
    into ``m`` equal subspaces, and each subspace gets its own euclidean
    kmeans codebook. Returns an (m, codewords, d//m) float64 ndarray —
    kilobytes, broadcast to every encode/search task.

    Why PQ at 100 TB: a d=768 float32 embedding is 3 KB/row; m=96 8-bit
    codes are 96 B — a 32x memory cut that lets a whole shard's codes sit
    in executor RAM for compressed-domain scanning, with exact re-rank
    only on the short candidate list.
    """
    import numpy as np

    rows = (
        corpus.select(F.col(id_col), F.col(vec))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_cap)
        .collect()
    )
    return _pq_train_mat([list(r[vec]) for r in rows], m, codewords, n_iter, seed)


def _pq_train_mat(mat, m: int, codewords: int, n_iter: int, seed: int):
    """Shared PQ training kernel — both the Spark sampler and the
    pyarrow twin (oracle-literal generation) call this on the same
    row-ordered matrix, so codebooks are bit-identical by construction."""
    import numpy as np

    X = np.asarray(mat, dtype=np.float64)
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    Xn = X / norms[:, None]
    d = Xn.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    sub = d // m
    return np.stack([
        _kmeans_euclid(Xn[:, i * sub:(i + 1) * sub], codewords, n_iter, seed + i)
        for i in range(m)
    ])


def train_pq_codebooks_local(
    parquet_path: str,
    m: int = 4,
    codewords: int = 256,
    vec: str = "embedding",
    id_col: str = "vec_id",
    sample_cap: int = 65536,
    n_iter: int = 8,
    seed: int = 0,
):
    """Spark-free twin of train_pq_codebooks (same sample rule, same
    kernel) — generates the codebook literals for the DuckDB oracle."""
    import pyarrow.parquet as pq

    t = pq.read_table(parquet_path, columns=[id_col, vec])
    ids = t[id_col].to_pylist()
    vecs = t[vec].to_pylist()
    order = sorted(range(len(ids)), key=lambda i: _sample_order_key(ids[i]))
    return _pq_train_mat([vecs[i] for i in order[:sample_cap]], m, codewords, n_iter, seed)


def pq_encode(
    corpus: DataFrame,
    codebooks,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode every row as ``m`` small codes (nearest codeword per
    subspace, on the unit-normalized vector). Pure map — broadcast
    codebooks, per-Arrow-batch vectorized distance argmin; output
    ``(id, codes array<int>)`` is the compressed index (write it
    partitioned/bucketed like write_ivf_index for bucket-local scans)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    bc = corpus.sparkSession.sparkContext.broadcast(np.asarray(codebooks))
    fields = {f.name: f for f in corpus.schema.fields}
    schema = T.StructType([
        T.StructField(id_col, fields[id_col].dataType),
        T.StructField("codes", T.ArrayType(T.IntegerType())),
    ])

    def gen(batches):
        B = bc.value
        m, ncode, sub = B.shape
        # All dot/norm accumulations below are explicit sequential loops
        # over dimensions (vectorized across rows) rather than BLAS
        # matmuls: float64 adds in dimension order are bit-identical to
        # the DuckDB oracle's list_reduce folds, which is what lets the
        # PQ candidate set exact-match (the repo's determinism rule).
        cn2 = np.zeros((m, ncode))
        for i in range(m):
            for t in range(sub):
                cn2[i] += B[i][:, t] * B[i][:, t]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(list(pdf[vec]), dtype=np.float64)
            n2 = np.zeros(len(X))
            for t in range(X.shape[1]):
                n2 += X[:, t] * X[:, t]
            norms = np.sqrt(n2)
            norms[norms == 0] = 1.0
            Xn = X / norms[:, None]
            codes = np.empty((len(Xn), m), dtype=np.int64)
            for i in range(m):
                Xi = Xn[:, i * sub:(i + 1) * sub]
                # ||x - c||^2 argmin == (||c||^2 - 2 x.c) argmin
                acc = np.zeros((len(Xi), ncode))
                for t in range(sub):
                    acc += Xi[:, t, None] * B[i][None, :, t]
                d2 = cn2[i][None, :] - 2.0 * acc
                codes[:, i] = np.argmin(d2, axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})

    return corpus.select(id_col, vec).mapInPandas(gen, schema)


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks,
    corpus: DataFrame | None = None,
    k: int = 10,
    rerank: int = 0,
    vec: str = "embedding",
    id_col: str = "vec_id",
    q_id: str = "q_id",
) -> DataFrame:
    """Compressed-domain top-k by asymmetric distance computation (ADC):
    per query, an m x codewords lookup table of subspace inner products
    is built once; each row's approximate cosine is m table lookups
    summed — no float vector is touched during the scan. Per-batch
    partial top-k keeps only k (or ``rerank``) rows per query per batch
    (the brute_force_topk_np shape).

    With ``rerank > 0`` and the original ``corpus``, the top-``rerank``
    PQ candidates per query are re-scored EXACTLY (broadcast semi-join on
    candidate ids — a k-scale list — then the standard cosine), fixing
    quantization error where it matters: the final ranking. This is the
    standard IVF-PQ recall recipe; at 100 TB the exact re-rank touches
    ~rerank/corpus of the float data.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    take = max(k, rerank)
    q_rows = queries.select(q_id, vec).collect()
    q_ids = [r[q_id] for r in q_rows]
    Q = np.array([r[vec] for r in q_rows], dtype=np.float64)
    # sequential-fold norms and LUT dots (see pq_encode for why)
    qn2 = np.zeros(len(Q))
    for t in range(Q.shape[1]):
        qn2 += Q[:, t] * Q[:, t]
    qn = np.sqrt(qn2)
    qn[qn == 0] = 1.0
    Qn = Q / qn[:, None]
    B = np.asarray(codebooks)
    m, ncode, sub = B.shape
    # LUT[q, i, j] = dot(q_sub_i, codeword_ij); approx score = sum_i LUT
    lut = np.zeros((len(Qn), m, ncode))
    for i in range(m):
        Qi = Qn[:, i * sub:(i + 1) * sub]
        for t in range(sub):
            lut[:, i, :] += Qi[:, t, None] * B[i][None, :, t]
    bc = codes.sparkSession.sparkContext.broadcast((q_ids, lut))

    schema = T.StructType([
        T.StructField("q_id", T.LongType()),
        T.StructField(id_col, T.LongType()),
        T.StructField("pq_score", T.DoubleType()),
    ])

    def gen(batches):
        q_ids_, lut_ = bc.value
        nq = len(q_ids_)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.array(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            ids = pdf[id_col].to_numpy()
            # scores[n, q] = sum_i lut[q, i, C[n, i]]
            scores = np.zeros((len(C), nq))
            for i in range(m):
                scores += lut_[:, i, C[:, i]].T
            out = []
            for qi, qid in enumerate(q_ids_):
                col = scores[:, qi]
                if len(col) > take:
                    # tie-safe partial selection: keep EVERY row tying the
                    # take-th score, so the global merge (score desc, id
                    # asc) sees the same candidate pool the oracle ranks —
                    # argpartition alone would break boundary ties by
                    # array position, not by id
                    thr = np.partition(col, len(col) - take)[len(col) - take]
                    sel = np.where(col >= thr)[0]
                else:
                    sel = np.arange(len(col))
                # full-precision score: candidate selection must rank on
                # the exact float64 the oracle computes (rounding here
                # could flip near-boundary order differently per engine)
                for ci in sel:
                    out.append((qid, int(ids[ci]), float(col[ci])))
            yield pd.DataFrame(out, columns=["q_id", id_col, "pq_score"])

    partial = codes.select(id_col, "codes").mapInPandas(gen, schema)
    if rerank and corpus is not None:
        cands = topk_per_group(
            partial, [q_id], [F.desc("pq_score"), F.asc(id_col)], rerank
        ).select(q_id, id_col)
        scored = (
            corpus.select(F.col(id_col), F.col(vec).alias("__cv"))
            .join(F.broadcast(cands), id_col)
            .join(F.broadcast(queries.select(F.col(q_id), F.col(vec).alias("__qv"))), q_id)
            .select(q_id, id_col,
                    F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"))
        )
        return topk_per_group(
            scored, [q_id], [F.desc("cos_sim"), F.asc(id_col)], k, rank_col="rk"
        )
    return topk_per_group(
        partial, [q_id], [F.desc("pq_score"), F.asc(id_col)], k, rank_col="rk"
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    codebooks,
    k: int = 10,
    nprobe: int = 2,
    rerank: int = 50,
    vec: str = "embedding",
    id_col: str = "vec_id",
    q_id: str = "q_id",
    c_id: str = "c_id",
    assigned: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """FAISS-style IVF-PQ search — the full 100 TB ANN shape composed
    from the audited pieces: coarse bucket prune (ivf_assign + nprobe
    probes), compressed-domain ADC scoring INSIDE probed buckets only
    (pq codes, per-query lookup tables), exact cosine re-rank of the
    short candidate list.

    Cost model at scale: the scan touches ~nprobe/k_centroids of the
    CODES (m bytes/row, in executor RAM when the index is persisted
    bucketed by ``c_id``); float vectors are read only for the
    ~rerank x |queries| re-rank rows via a broadcast semi-join. Pass
    prebuilt ``assigned``/``codes`` to search a persisted index.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if assigned is None:
        assigned = ivf_assign(corpus, centroids, vec, id_col, c_id)
    if codes is None:
        codes = pq_encode(corpus, codebooks, vec, id_col)
    index = assigned.select(id_col, c_id).join(codes, id_col)

    # probe selection: identical to ivf_topk
    cent = centroids.select(F.col(c_id), F.col(vec).alias("__cent"))
    probes = (
        queries.select(F.col(q_id), F.col(vec).alias("__qv"))
        .join(F.broadcast(cent), how="cross")
        .select(q_id, c_id, cosine(F.col("__qv"), F.col("__cent")).alias("__sim"))
    )
    probes = topk_per_group(
        probes, [q_id], [F.desc("__sim"), F.asc(c_id)], nprobe
    ).select(q_id, c_id)

    # per-query ADC lookup tables (sequential folds, as in pq_topk)
    q_rows = queries.select(q_id, vec).collect()
    q_ids = [r[q_id] for r in q_rows]
    Q = np.array([r[vec] for r in q_rows], dtype=np.float64)
    qn2 = np.zeros(len(Q))
    for t in range(Q.shape[1]):
        qn2 += Q[:, t] * Q[:, t]
    qn = np.sqrt(qn2)
    qn[qn == 0] = 1.0
    Qn = Q / qn[:, None]
    B = np.asarray(codebooks)
    m, ncode, sub = B.shape
    lut = np.zeros((len(Qn), m, ncode))
    for i in range(m):
        Qi = Qn[:, i * sub:(i + 1) * sub]
        for t in range(sub):
            lut[:, i, :] += Qi[:, t, None] * B[i][None, :, t]
    qindex = {qid: i for i, qid in enumerate(q_ids)}
    bc = corpus.sparkSession.sparkContext.broadcast((qindex, lut))

    # bucket-pruned candidate rows: (q_id, id, codes) — only probed
    # buckets survive the broadcast join, so the ADC scan below sees
    # ~nprobe/k_centroids of the index
    cand = index.join(F.broadcast(probes), c_id).select(q_id, id_col, "codes")

    schema = T.StructType([
        T.StructField("q_id", T.LongType()),
        T.StructField(id_col, T.LongType()),
        T.StructField("pq_score", T.DoubleType()),
    ])

    def gen(batches):
        qindex_, lut_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.array(list(pdf["codes"]), dtype=np.int64)
            qi = pdf[q_id].map(qindex_).to_numpy(dtype=np.int64)
            scores = np.zeros(len(C))
            for i in range(m):
                scores += lut_[qi, i, C[:, i]]
            yield pd.DataFrame({
                "q_id": pdf[q_id], id_col: pdf[id_col], "pq_score": scores,
            })

    scored = cand.mapInPandas(gen, schema)
    cands = topk_per_group(
        scored, [q_id], [F.desc("pq_score"), F.asc(id_col)], max(k, rerank)
    ).select(q_id, id_col)
    exact = (
        corpus.select(F.col(id_col), F.col(vec).alias("__cv"))
        .join(F.broadcast(cands), id_col)
        .join(F.broadcast(queries.select(F.col(q_id), F.col(vec).alias("__qv"))), q_id)
        .select(q_id, id_col,
                F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"))
    )
    return topk_per_group(
        exact, [q_id], [F.desc("cos_sim"), F.asc(id_col)], k, rank_col="rk"
    )


_IVF_PARAMS_FILE = "_ivf_params.json"


def _centroid_digest(centroids: DataFrame, vec: str, c_id: str) -> str:
    """Deterministic fingerprint of a coarse quantizer: md5 over the
    canonically-ordered (c_id, exact-double vector) rows. Centroid
    tables are k-sized (they broadcast everywhere else), so the collect
    is bounded; ``repr`` of a Python float is its exact shortest form,
    so identical doubles always digest identically."""
    import hashlib

    rows = centroids.select(c_id, vec).collect()
    canon = sorted(
        (str(r[c_id]), tuple(float(x) for x in r[vec])) for r in rows
    )
    return hashlib.md5(repr(canon).encode()).hexdigest()


def _ivf_params_guard(spark, path: str, centroids: DataFrame, vec: str,
                      c_id: str, write: bool) -> None:
    """Bucket assignments are only comparable under the SAME frozen
    coarse quantizer; appending with drifted centroids silently builds
    an index whose buckets disagree with the probe-time assignment
    (searches quietly miss). The index directory records its centroid
    digest (Hadoop FS API via ``sources.fsutil`` — scheme-safe on
    object stores); appends validate it and fail loudly on drift.
    Validation is skipped for pre-guard directories with no marker
    (the documented by-contract mode)."""
    import json

    from ncbi_analysis_spark.sources import fsutil

    marker = path.rstrip("/") + "/" + _IVF_PARAMS_FILE
    params = {"centroid_digest": _centroid_digest(centroids, vec, c_id)}
    if write:
        fsutil.write_text(spark, marker, json.dumps(params))
        return
    if not fsutil.exists(spark, marker):
        return
    stored = json.loads(fsutil.read_text(spark, marker))
    if stored != params:
        raise ValueError(
            f"IVF index at {path!r} was built with centroid digest "
            f"{stored['centroid_digest']}, append uses "
            f"{params['centroid_digest']}: the coarse quantizer drifted — "
            "retrain + rebuild, or append with the index's centroids"
        )


def write_ivf_index(assigned: DataFrame, path: str, c_id: str = "c_id",
                    centroids: DataFrame | None = None,
                    vec: str = "embedding") -> None:
    """Persist an ivf_assign output partitioned by centroid id: each
    bucket is its own parquet directory, so a search that probes
    ``nprobe`` buckets (``ivf_topk(assigned=..., prefilter_partitions=
    True)``) physically reads only those directories. This is the
    100 TB index layout — probe cost scales with nprobe/k_centroids of
    the corpus regardless of total index size.

    Pass ``centroids`` to stamp the directory with the quantizer's
    digest so later ``append_to_ivf_index`` calls fail loudly on
    centroid drift instead of silently mis-bucketing."""
    # REBALANCE(c_id): file count tracks per-bucket data size, not
    # upstream task count (tasks × buckets tiny files otherwise; AQE
    # still splits a hot bucket across writers at scale)
    assigned.hint("rebalance", F.col(c_id)) \
        .write.mode("overwrite").partitionBy(c_id).parquet(path)
    if centroids is not None:
        _ivf_params_guard(assigned.sparkSession, path, centroids, vec,
                          c_id, write=True)


def read_ivf_index(spark, path: str, id_col: str = "vec_id") -> DataFrame:
    """Open a write_ivf_index directory for searching — the LIVE view:
    ids tombstoned by ``delete_from_ivf_index`` are anti-joined out
    (broadcast small side), so partition-pruned probes honor deletes
    without a rebuild. Never-deleted indexes get the bare scan."""
    from ncbi_analysis_spark.operators import tombstones as ts

    return ts.apply_tombstones(spark.read.parquet(path), path, id_col)


def verify_ivf_index(spark, path: str, centroids: DataFrame | None = None,
                     id_col: str = "vec_id", c_id: str = "c_id",
                     vec: str = "embedding") -> list[dict]:
    """Integrity audit (fsck) of a ``write_ivf_index`` directory —
    read-only, run after a restore/migration before trusting searches.
    Returns ``[{check, ok, detail}, ...]``. Checks: the id and bucket
    columns exist and are never null; with ``centroids`` given, the
    directory's digest marker matches them (the append drift guard,
    replayed on demand — a mismatch means probes assign queries to
    buckets the data was not bucketed by, so searches quietly miss) and
    every stored bucket id actually exists in the quantizer; plus the
    shared maintenance-state legs. Never repairs."""
    import json

    from ncbi_analysis_spark.operators import tombstones as ts
    from ncbi_analysis_spark.sources import fsutil

    # maintenance-state legs FIRST: a half-swapped root is exactly when
    # fsck runs, and there the data scan fails loudly by design
    out = ts.shared_integrity_checks(spark, path, id_col)
    try:
        rows = spark.read.parquet(path)
    except Exception as exc:  # noqa: BLE001 — report, never crash fsck
        out.append({"check": "readable", "ok": False,
                    "detail": str(exc).split("\n")[0][:200]})
        return out
    out.append({"check": "readable", "ok": True, "detail": ""})
    have = set(rows.columns)
    out.append({
        "check": "schema",
        "ok": {id_col, c_id} <= have,
        "detail": ("" if {id_col, c_id} <= have else
                   f"columns {sorted(have)} missing {id_col!r}/{c_id!r}"),
    })
    if {id_col, c_id} <= have:
        bad = rows.filter(
            F.col(id_col).isNull() | F.col(c_id).isNull()).count()
        out.append({"check": "null_keys", "ok": bad == 0,
                    "detail": "" if bad == 0 else f"{bad} null-keyed rows"})
    marker = path.rstrip("/") + "/" + _IVF_PARAMS_FILE
    if centroids is not None:
        if fsutil.exists(spark, marker):
            stored = json.loads(fsutil.read_text(spark, marker))
            want = _centroid_digest(centroids, vec, c_id)
            out.append({
                "check": "centroid_digest",
                "ok": stored.get("centroid_digest") == want,
                "detail": ("" if stored.get("centroid_digest") == want else
                           "quantizer drifted from the one the index was "
                           "built with — searches quietly miss; retrain + "
                           "rebuild"),
            })
        else:
            out.append({"check": "centroid_digest", "ok": False,
                        "detail": "no digest marker to validate against "
                                  "(pre-guard directory)"})
        known = {r[c_id] for r in centroids.select(c_id).collect()}
        orphans = rows.filter(~F.col(c_id).isin(*known)).count() \
            if known else rows.count()
        out.append({
            "check": "buckets_known",
            "ok": orphans == 0,
            "detail": "" if orphans == 0 else
                      f"{orphans} rows in buckets absent from the "
                      "quantizer — unreachable by any probe",
        })
    return out


def delete_from_ivf_index(ids: DataFrame, path: str,
                          id_col: str = "vec_id") -> int:
    """Remove vectors from a persisted IVF index without rewriting it:
    append the ids to the index's tombstone table. ``read_ivf_index``
    then serves exactly the index a rebuild without those vectors would
    produce (staged ``ivf_delete_search`` oracle); run
    ``compact_ivf_index`` periodically. Idempotent — re-deletes and
    never-indexed ids are no-ops. Returns the batch's distinct-id
    count. Raises on a directory that was never ``write_ivf_index``-
    stamped with a marker (un-guarded legacy dirs can still be deleted
    from by writing the marker first — the same opt-in as append's
    drift guard)."""
    from ncbi_analysis_spark.operators import tombstones as ts
    from ncbi_analysis_spark.sources import fsutil

    spark = ids.sparkSession
    if not fsutil.exists(spark, path.rstrip("/") + "/" + _IVF_PARAMS_FILE):
        raise ValueError(
            f"{path!r} has no {_IVF_PARAMS_FILE} marker; stamp it with "
            "write_ivf_index(..., centroids=...) before deleting"
        )
    with ts.maintenance_lock(spark, path, "delete_from_ivf_index") as lk:
        lk.assert_owned()  # fence before the tombstone-append commit
        n = ts.append_tombstones(ids.select(F.col(id_col)), path, id_col)
    ts.warn_if_tombstones_large(spark, path)
    return n


def compact_ivf_index(spark, path: str, id_col: str = "vec_id",
                      c_id: str = "c_id") -> None:
    """Fold accumulated tombstones into the IVF bucket files and
    coalesce each bucket to one file (rewrite live view to a hidden tmp
    dir, swap, clear tombstones — ``tombstones.swap_partition_dirs``).
    Searches are identical before/after; the centroid-digest marker is
    untouched, so append's drift guard keeps working."""
    from ncbi_analysis_spark.operators import tombstones as ts

    with ts.maintenance_lock(spark, path, "compact_ivf_index") as lk:
        ts.resume_pending_swap(spark, path)
        live = ts.apply_tombstones(spark.read.parquet(path), path, id_col)
        tmp = "_compact_tmp"
        live.repartition(c_id).write.mode("overwrite").partitionBy(
            c_id).parquet(path.rstrip("/") + "/" + tmp)
        lk.assert_owned()  # fence before the swap commit
        ts.swap_partition_dirs(spark, path, tmp)


def append_to_ivf_index(
    new_vectors: DataFrame,
    centroids: DataFrame,
    path: str,
    vec: str = "embedding",
    id_col: str = "vec_id",
    c_id: str = "c_id",
    method: str = "auto",
) -> DataFrame:
    """Incremental IVF index maintenance: assign ``new_vectors`` to the
    EXISTING coarse quantizer and append them to a ``write_ivf_index``
    directory — the crawl-ingest path, where a 100 TB index must absorb
    a day's new documents without the full re-index it previously
    required.

    Because assignment depends only on the (frozen) centroids, the
    appended index is EXACTLY the index a full rebuild over
    base ∪ new with the same centroids would produce — searches over
    either are identical (the staged ``ann_index_append`` oracle
    asserts this end-to-end). Parquet partition-append touches only the
    bucket directories that received new vectors: untouched buckets
    keep their existing files byte-for-byte (layout test), so ingest
    I/O scales with the batch, not the index.

    Caveats by contract: ids are not deduplicated against the base
    index (append the delta only), and centroid drift is not repaired —
    after enough appends, retrain with ``train_ivf_centroids`` /
    ``refine_ivf_centroids`` and rebuild (the standard IVF posture).
    Drift is however DETECTED when the index was built with
    ``write_ivf_index(..., centroids=...)``: the directory's centroid
    digest is validated before any write and a mismatch raises.

    Returns the per-bucket appended counts ``(c_id, n_appended)`` —
    bounded by the centroid count, so the extra aggregation job is
    scalar-sized; the assignment itself is computed once (persisted
    across the write and the count, then released).
    """
    from ncbi_analysis_spark.operators import tombstones as ts

    spark = new_vectors.sparkSession
    _ivf_params_guard(spark, path, centroids, vec, c_id, write=False)
    with ts.maintenance_lock(spark, path, "append_to_ivf_index") as lk:
        # tombstone check INSIDE the lock: a concurrent delete landing
        # between check and append would silently mask the batch
        tomb = ts.read_tombstones(spark, path)
        if tomb is not None:
            # a tombstoned id re-appended would be silently masked by
            # the read_ivf_index anti-join until compaction — refuse
            n_bad = new_vectors.select(id_col).join(
                F.broadcast(tomb), id_col, "left_semi").count()
            if n_bad:
                raise ValueError(
                    f"append batch contains {n_bad} id(s) tombstoned in "
                    f"{path!r}; run compact_ivf_index first, then append"
                )
        assigned = ivf_assign(new_vectors, centroids, vec, id_col, c_id,
                              method=method)
        assigned = assigned.persist()
        try:
            lk.assert_owned()  # fence before the parquet-append commit
            # rebalance: the cached partitioning would fan out
            # cached-partitions × buckets tiny files per append
            assigned.hint("rebalance", F.col(c_id)) \
                .write.mode("append").partitionBy(c_id).parquet(path)
            counts = (
                assigned.groupBy(c_id)
                .agg(F.count(F.lit(1)).alias("n_appended"))
                .collect()
            )
        finally:
            assigned.unpersist()
    return spark.createDataFrame(
        [(int(r[c_id]), int(r["n_appended"])) for r in counts],
        f"{c_id} long, n_appended long",
    )


def reduced_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    mean,
    components,
    k: int = 10,
    shortlist: int = 40,
    vec: str = "embedding",
    id_col: str = "vec_id",
    q_id: str = "q_id",
) -> DataFrame:
    """Dimension-reduced shortlist + exact re-rank — the search tier
    between brute force and IVF: project corpus and queries onto the
    fitted PCA axes (``operators.embeddings.pca_project``, expr form —
    bit-pinned), take each query's ``shortlist`` nearest in the
    REDUCED space, then score only those candidates with the exact
    full-dimension cosine and keep top-``k``.

    Scale shape: the corpus-sized leg runs at k/d the bytes and FLOPs
    of full-dimension brute force (k=8 of d=64 → 8x less memory
    bandwidth, the scan's real cost at 100 TB); the exact leg touches
    ``shortlist`` rows per query. Unlike IVF there are no buckets to
    mis-probe — recall loss comes only from shortlist truncation in
    the reduced space, measurable per query with ``ann_recall_audit``'s
    pattern. Deterministic end to end (cos rounded to 6dp, id
    tiebreaks — the family convention).

    Applicability check FIRST: this tier pays off only when the
    spectrum concentrates (real embedding corpora do; near-isotropic
    vectors don't) — read ``pca_variance_gate`` /
    ``explained_variance_ratio`` before choosing it, and size
    ``shortlist`` off the measured recall, not folklore.

    Output: ``(q_id, vec_id, cos_sim, rk)`` — exact cosines, so rows
    are directly comparable with ``brute_force_topk``'s.
    """
    from ncbi_analysis_spark.operators.embeddings import pca_project

    pc = pca_project(
        corpus, mean, components, vec=vec, id_col=id_col, method="expr"
    ).withColumnRenamed("proj", vec)
    pq = pca_project(
        queries, mean, components, vec=vec, id_col=q_id, method="expr"
    ).withColumnRenamed("proj", vec)
    short = brute_force_topk(
        pc, pq, vec=vec, id_col=id_col, q_id=q_id, k=shortlist
    ).select(q_id, id_col)
    cv = corpus.select(F.col(id_col), F.col(vec).alias("__cv"))
    qv = queries.select(F.col(q_id), F.col(vec).alias("__qv"))
    scored = (
        short.join(cv, id_col)
        .join(F.broadcast(qv), q_id)
        .select(
            q_id,
            id_col,
            F.round(
                cosine(F.col("__qv"), F.col("__cv")), 6
            ).alias("cos_sim"),
        )
    )
    return topk_per_group(
        scored, [q_id], [F.desc("cos_sim"), F.asc(id_col)], k,
        rank_col="rk",
    )


def ann_recall_audit(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    vec: str = "embedding",
    id_col: str = "vec_id",
    q_id: str = "q_id",
    k: int = 10,
    nprobe: int = 2,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Measured per-query recall@k of the IVF index against the exact
    brute-force top-k — the ANN twin of ``dedup.lsh_recall_audit``:
    nprobe/k_centroids trade-offs are usually tuned by rules of thumb;
    this measures what the probe setting actually recalls on YOUR
    vector distribution, per query, before the index ships.

    Output: one row per query — ``n_exact`` (true top-k size, < k only
    when the corpus itself is smaller), ``n_approx`` (IVF result size,
    < k when the probed buckets hold fewer rows), ``n_hit`` (overlap),
    ``recall`` = n_hit / n_exact (6dp). Aggregate to taste downstream
    (the per-query rows are the useful artifact: a single bad query
    vector near a bucket boundary is invisible in a mean).

    Scale shape: both legs are the standing operators (broadcast query
    batch, corpus never shuffles; IVF leg additionally bucket-pruned);
    the comparison joins two (queries x k)-sized results — trivially
    small however big the corpus — then one groupBy on q_id. Audit cost
    is dominated by the brute-force leg, so run it on a sampled query
    batch, exactly like the LSH audit's hash-sample.
    """
    exact = brute_force_topk(
        corpus, queries, vec=vec, id_col=id_col, q_id=q_id, k=k
    ).select(q_id, id_col, F.lit(1).alias("in_exact"))
    approx = ivf_topk(
        corpus, queries, centroids, vec=vec, id_col=id_col, q_id=q_id,
        k=k, nprobe=nprobe, assigned=assigned,
    ).select(q_id, id_col, F.lit(1).alias("in_approx"))
    joined = exact.join(approx, [q_id, id_col], "full_outer")
    per = joined.groupBy(q_id).agg(
        F.coalesce(F.sum("in_exact"), F.lit(0)).cast("long").alias("n_exact"),
        F.coalesce(F.sum("in_approx"), F.lit(0)).cast("long").alias("n_approx"),
        F.coalesce(F.sum(F.col("in_exact") * F.col("in_approx")), F.lit(0))
        .cast("long").alias("n_hit"),
    )
    return per.select(
        q_id, "n_exact", "n_approx", "n_hit",
        F.when(F.col("n_exact") > 0,
               F.round(F.col("n_hit") / F.col("n_exact"), 6)).alias("recall"),
    )



# ---------------------------------------------------------------------------
# Scalar quantization (SQ8) — the FAISS-style middle tier between IVF-flat
# and IVF-PQ (r15)
# ---------------------------------------------------------------------------

def train_sq_bounds(corpus: DataFrame, vec: str = "embedding") -> DataFrame:
    """Per-dimension [min, max] training for SQ8 — one pass, one shuffle
    of exactly d rows (posexplode feeds a map-side-combined min/max agg,
    so the exchange carries d * n_partitions partials, never corpus
    rows). Output: (pos, lo, hi), pos 0-based.

    This is the trained-quantizer analogue of ``train_pq_codebooks``:
    run offline on the corpus (or a sample — bounds only need coverage,
    not precision), persist the d-row table next to the index, feed it
    to ``sq8_encode_index`` / ``ivf_sq8_topk``.
    """
    return (
        corpus.select(
            F.posexplode(F.transform(F.col(vec), lambda x: x.cast("double")))
            .alias("pos", "val"))
        .groupBy("pos")
        .agg(F.min("val").alias("lo"), F.max("val").alias("hi"))
    )


def _sq_bounds_lists(bounds: DataFrame):
    """Collect the d-row bounds table to literal lists (pos-sorted).
    Bounded by the embedding dimension — a scalar-sized driver hop, same
    contract as the centroid collect in ivf_assign."""
    rows = sorted(bounds.select("pos", "lo", "hi").collect(),
                  key=lambda r: r["pos"])
    if not rows:
        raise ValueError("train_sq_bounds produced no rows")
    return [float(r["lo"]) for r in rows], [float(r["hi"]) for r in rows]


def sq_encode_expr(vec_col, los: list, his: list):
    """uint8 code per dimension: floor(clip01((x-lo)/(hi-lo))*255+0.5)
    (floor(+0.5), never round() — engines' round() differ on
    representation edges; constant dimensions (hi==lo) code to 0).
    Returns array<int>; 4x smaller than float32 / 8x smaller than the
    float64 arrays Spark materializes, which is the point of storing the
    INDEX in codes."""
    lo_arr = F.lit(los)
    hi_arr = F.lit(his)
    return F.transform(
        vec_col,
        lambda x, i: F.when(
            F.element_at(hi_arr, i + 1) == F.element_at(lo_arr, i + 1),
            F.lit(0),
        ).otherwise(
            F.floor(
                F.least(
                    F.greatest(
                        (x.cast("double") - F.element_at(lo_arr, i + 1))
                        / (F.element_at(hi_arr, i + 1)
                           - F.element_at(lo_arr, i + 1)),
                        F.lit(0.0)),
                    F.lit(1.0))
                * F.lit(255.0) + F.lit(0.5))
        ).cast("int"),
    )


def sq_dequantize_expr(code_col, los: list, his: list):
    """Reconstruction: lo + code * ((hi-lo)/255.0) — the exact IEEE
    op order the DuckDB oracle mirrors (step computed once, then one
    multiply-add), so dequantized doubles are bit-identical across
    engines."""
    lo_arr = F.lit(los)
    hi_arr = F.lit(his)
    return F.transform(
        code_col,
        lambda c, i: F.element_at(lo_arr, i + 1)
        + c.cast("double")
        * ((F.element_at(hi_arr, i + 1) - F.element_at(lo_arr, i + 1))
           / F.lit(255.0)),
    )


def sq8_encode_index(
    assigned: DataFrame,
    bounds: DataFrame,
    id_col: str = "vec_id",
    c_id: str = "c_id",
    code_col: str = "sq_code",
) -> DataFrame:
    """ivf_assign output -> the SQ8 index representation:
    (id_col, c_id, code_col) with the float vector DROPPED. Feed this to
    ``write_ivf_index`` for the persisted form — the c_id partitioning
    (probe-side pruning) is unchanged, the payload is 4-8x smaller."""
    los, his = _sq_bounds_lists(bounds)
    return assigned.select(
        F.col(id_col), F.col(c_id),
        sq_encode_expr(F.col("__cv"), los, his).alias(code_col),
    )


def ivf_sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    bounds: DataFrame | None = None,
    vec: str = "embedding",
    id_col: str = "vec_id",
    q_id: str = "q_id",
    c_id: str = "c_id",
    k: int = 10,
    nprobe: int = 2,
    rerank: int = 0,
    assigned: DataFrame | None = None,
    index: DataFrame | None = None,
) -> DataFrame:
    """IVF probe + SQ8 asymmetric scoring: queries stay full-precision,
    probed-bucket candidates are scored against their DEQUANTIZED codes
    (classic asymmetric distance — half the quantization error of
    code-vs-code). ``rerank`` > 0 takes the top ``rerank`` SQ candidates
    per query and re-scores them EXACTLY against the float corpus
    (bounded join: |Q| * rerank ids, broadcast into the corpus scan).

    Scale posture mirrors ivf_topk: the probe set broadcasts, the coded
    index never shuffles before the bucket prune — but the scanned bytes
    per probe are 4-8x smaller than IVF-flat, which is the regime where
    the 100 TB index stops fitting the page cache. Output without
    rerank: (q_id, id_col, sq_sim, rk); with rerank: (q_id, id_col,
    cos_sim, rk) — exact scores, SQ only picked the candidates.
    """
    if bounds is None:
        bounds = train_sq_bounds(corpus, vec)
    los, his = _sq_bounds_lists(bounds)
    if index is None:
        if assigned is None:
            assigned = ivf_assign(_spread_scoring(corpus), centroids,
                                  vec, id_col, c_id)
        index = sq8_encode_index(assigned, bounds, id_col, c_id)

    cent = centroids.select(F.col(c_id), F.col(vec).alias("__cent"))
    probes = (
        queries.select(F.col(q_id), F.col(vec).alias("__qv"))
        .join(F.broadcast(cent), how="cross")
        .select(q_id, "__qv", c_id,
                cosine(F.col("__qv"), F.col("__cent")).alias("__sim"))
    )
    probes = topk_per_group(
        probes, [q_id], [F.desc("__sim"), F.asc(c_id)], nprobe
    ).select(q_id, "__qv", c_id)

    # dequantize + cosine is the interpreted-HOF CPU-dense shape the
    # guarded spread exists for (profiled r15: a 1.66s single-task
    # scoring job inside ann_ivf_sq8) — no-op once the coded index scan
    # is wider than the session parallelism
    scored = (
        _spread_scoring(index.join(F.broadcast(probes), on=c_id,
                                   how="inner"))
        .withColumn("__dv", sq_dequantize_expr(F.col("sq_code"), los, his))
        .select(q_id, id_col,
                F.round(cosine(F.col("__qv"), F.col("__dv")), 6)
                .alias("sq_sim"))
    )
    if not rerank:
        return topk_per_group(
            scored, [q_id], [F.desc("sq_sim"), F.asc(id_col)], k,
            rank_col="rk")

    cands = topk_per_group(
        scored, [q_id], [F.desc("sq_sim"), F.asc(id_col)], rerank
    ).select(q_id, id_col)
    qv = queries.select(F.col(q_id), F.col(vec).alias("__qv"))
    cv = corpus.select(F.col(id_col), F.col(vec).alias("__xv"))
    exact = (
        _spread_scoring(cv.join(F.broadcast(cands), on=id_col,
                                how="inner"))
        .join(F.broadcast(qv), on=q_id, how="inner")
        .select(q_id, id_col,
                F.round(cosine(F.col("__qv"), F.col("__xv")), 6)
                .alias("cos_sim"))
    )
    return topk_per_group(
        exact, [q_id], [F.desc("cos_sim"), F.asc(id_col)], k, rank_col="rk")


# --- persisted SQ8 lifecycle: the coded index rides the same directory
# discipline (c_id partitions, tombstones, lock, digest guards) as the
# float IVF index; delete_from_ivf_index / compact_ivf_index are
# schema-agnostic and work on it unchanged -------------------------------

_SQ_PARAMS_FILE = "_sq8_params.json"
_SQ_BOUNDS_DIR = "_sq_bounds"


def _sq_bounds_digest(los: list, his: list) -> str:
    """Deterministic fingerprint of the trained quantizer bounds —
    repr of exact shortest-form doubles, same convention as
    ``_centroid_digest``."""
    import hashlib

    return hashlib.md5(repr((tuple(los), tuple(his))).encode()).hexdigest()


def write_sq8_index(
    assigned: DataFrame,
    bounds: DataFrame,
    path: str,
    id_col: str = "vec_id",
    c_id: str = "c_id",
    centroids: DataFrame | None = None,
    vec: str = "embedding",
) -> None:
    """Persist the SQ8-coded form of an ivf_assign output: codes-only
    c_id partitions (the 0.29x-bytes layout measured in SCALING.md),
    the d-row bounds table under ``_sq_bounds/`` (underscore-hidden
    from index scans — the index is self-contained at search time), and
    a bounds-digest marker so appends encoded under DRIFTED bounds fail
    loudly (codes from different bounds are not comparable — the SQ
    analogue of centroid drift). Pass ``centroids`` to also stamp the
    standard IVF centroid digest."""
    import json

    from ncbi_analysis_spark.sources import fsutil

    spark = assigned.sparkSession
    los, his = _sq_bounds_lists(bounds)
    coded = sq8_encode_index(assigned, bounds, id_col, c_id)
    # REBALANCE(c_id): see write_ivf_index — files track bucket size
    coded.hint("rebalance", F.col(c_id)) \
        .write.mode("overwrite").partitionBy(c_id).parquet(path)
    bounds.coalesce(1).write.mode("overwrite").parquet(
        path.rstrip("/") + "/" + _SQ_BOUNDS_DIR)
    fsutil.write_text(
        spark, path.rstrip("/") + "/" + _SQ_PARAMS_FILE,
        json.dumps({"bounds_digest": _sq_bounds_digest(los, his)}))
    if centroids is not None:
        _ivf_params_guard(spark, path, centroids, vec, c_id, write=True)


def read_sq8_bounds(spark, path: str) -> DataFrame:
    """The index's own trained bounds (verified against the marker —
    a hand-replaced bounds table fails loudly rather than silently
    mis-decoding every stored code)."""
    import json

    from ncbi_analysis_spark.sources import fsutil

    bounds = spark.read.parquet(path.rstrip("/") + "/" + _SQ_BOUNDS_DIR)
    marker = path.rstrip("/") + "/" + _SQ_PARAMS_FILE
    if fsutil.exists(spark, marker):
        los, his = _sq_bounds_lists(bounds)
        stored = json.loads(fsutil.read_text(spark, marker))
        got = _sq_bounds_digest(los, his)
        if stored.get("bounds_digest") != got:
            raise ValueError(
                f"SQ8 index at {path!r}: persisted bounds digest "
                f"{got} != marker {stored.get('bounds_digest')} — the "
                "bounds table was modified after the codes were written; "
                "rebuild with write_sq8_index")
    return bounds


def read_sq8_index(spark, path: str, id_col: str = "vec_id") -> DataFrame:
    """LIVE view of a write_sq8_index directory (tombstone-aware, same
    as read_ivf_index). Feed to ``ivf_sq8_topk(index=..., bounds=
    read_sq8_bounds(...))``."""
    return read_ivf_index(spark, path, id_col)


def append_to_sq8_index(
    new_vectors: DataFrame,
    centroids: DataFrame,
    path: str,
    vec: str = "embedding",
    id_col: str = "vec_id",
    c_id: str = "c_id",
    method: str = "auto",
) -> DataFrame:
    """Crawl-ingest for the coded index: assign to the FROZEN coarse
    quantizer, encode under the index's OWN persisted bounds, append.
    Same lock/tombstone/fencing discipline as ``append_to_ivf_index``;
    additionally the bounds digest is re-verified first, so an index
    whose bounds table drifted refuses the append.

    Out-of-range values in the new batch CLIP to the trained [lo, hi]
    by the encode contract — the standard SQ posture (bounds are
    trained once on a representative corpus; a distribution that walks
    off the trained range warrants a bounds retrain + rebuild, which
    the recall audit catches, not a silent per-batch re-scale that
    would make old and new codes incomparable)."""
    from ncbi_analysis_spark.operators import tombstones as ts

    spark = new_vectors.sparkSession
    bounds = read_sq8_bounds(spark, path)  # digest-verified
    _ivf_params_guard(spark, path, centroids, vec, c_id, write=False)
    with ts.maintenance_lock(spark, path, "append_to_sq8_index") as lk:
        tomb = ts.read_tombstones(spark, path)
        if tomb is not None:
            n_bad = new_vectors.select(id_col).join(
                F.broadcast(tomb), id_col, "left_semi").count()
            if n_bad:
                raise ValueError(
                    f"append batch contains {n_bad} id(s) tombstoned in "
                    f"{path!r}; run compact_ivf_index first, then append")
        assigned = ivf_assign(new_vectors, centroids, vec, id_col, c_id,
                              method=method)
        coded = sq8_encode_index(assigned, bounds, id_col, c_id).persist()
        try:
            lk.assert_owned()  # fence before the parquet-append commit
            # rebalance: see append_to_ivf_index
            coded.hint("rebalance", F.col(c_id)) \
                .write.mode("append").partitionBy(c_id).parquet(path)
            counts = (
                coded.groupBy(c_id)
                .agg(F.count(F.lit(1)).alias("n_appended"))
                .collect()
            )
        finally:
            coded.unpersist()
    return spark.createDataFrame(
        [(int(r[c_id]), int(r["n_appended"])) for r in counts],
        f"{c_id} long, n_appended long",
    )


def verify_sq8_index(spark, path: str, centroids: DataFrame | None = None,
                     id_col: str = "vec_id", c_id: str = "c_id",
                     vec: str = "embedding",
                     code_col: str = "sq_code") -> list[dict]:
    """fsck for a ``write_sq8_index`` directory — the coded family's
    audit, completing the per-family set (LSH/IVF/BM25/CC-labels/SQ8).
    Runs every ``verify_ivf_index`` leg (the directory IS an IVF layout)
    plus the SQ-specific ones: the code column exists with every value
    in [0, 255] (out-of-range codes mean the bounds table and the data
    files disagree — decode would extrapolate silently), the persisted
    bounds table exists with lo <= hi per dimension, and its digest
    matches the marker (the ``read_sq8_bounds`` guard, replayed here as
    a report instead of a raise). Read-only; never repairs."""
    out = verify_ivf_index(spark, path, centroids, id_col, c_id, vec)
    try:
        rows = spark.read.parquet(path)
    except Exception:  # noqa: BLE001 — verify_ivf_index already reported
        return out
    have = set(rows.columns)
    out.append({
        "check": "code_column",
        "ok": code_col in have,
        "detail": "" if code_col in have else
                  f"columns {sorted(have)} missing {code_col!r}",
    })
    if code_col in have:
        bad = rows.filter(
            F.col(code_col).isNull()
            | F.exists(F.col(code_col),
                       lambda x: (x < 0) | (x > 255))).count()
        out.append({
            "check": "codes_in_range",
            "ok": bad == 0,
            "detail": "" if bad == 0 else
                      f"{bad} rows with null or out-of-[0,255] codes — "
                      "bounds/data mismatch, rebuild with write_sq8_index",
        })
    try:
        read_sq8_bounds(spark, path)
        out.append({"check": "bounds_digest", "ok": True, "detail": ""})
    except Exception as exc:  # noqa: BLE001 — report, never crash fsck
        out.append({"check": "bounds_digest", "ok": False,
                    "detail": str(exc).split("\n")[0][:200]})
        return out
    bounds = spark.read.parquet(path.rstrip("/") + "/" + _SQ_BOUNDS_DIR)
    n_bad = bounds.filter(F.col("lo") > F.col("hi")).count()
    out.append({
        "check": "bounds_ordered",
        "ok": n_bad == 0,
        "detail": "" if n_bad == 0 else
                  f"{n_bad} dimensions with lo > hi",
    })
    return out
