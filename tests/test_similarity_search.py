"""ANN operator tests: the numpy/BLAS fast path must rank identically to
the expression-fold oracle path."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ncbi_analysis_spark.operators import similarity_search as ss


def _emb(spark, n=200, dim=16):
    rnd = random.Random(4)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_np_matches_fold_ranking(spark):
    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("q_id"), "embedding")
    fold = ss.brute_force_topk(e, q, k=10).collect()
    fast = ss.brute_force_topk_np(e, q, k=10).collect()
    key = lambda rows: sorted((r["q_id"], r["vec_id"], r["rk"]) for r in rows)  # noqa: E731
    assert key(fold) == key(fast)
    # scores agree to rounding (different float summation order)
    f = {(r["q_id"], r["vec_id"]): r["cos_sim"] for r in fold}
    for r in fast:
        assert abs(f[(r["q_id"], r["vec_id"])] - r["cos_sim"]) <= 2e-6


def test_ivf_recall_vs_exact(spark):
    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("q_id"), "embedding")
    cents = e.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("c_id"), "embedding")
    exact = ss.brute_force_topk(e, q, k=10).collect()
    ivf = ss.ivf_topk(e, q, cents, k=10, nprobe=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    hit = total = 0
    for r in ivf:
        total += 1
        hit += r["vec_id"] in exact_sets[r["q_id"]]
    # bucket pruning trades recall for cost; expect substantial overlap
    assert hit / total >= 0.3
    # and the probed self-bucket must contain the query itself at rank 1
    by_q = {}
    for r in ivf:
        if r["rk"] == 1:
            by_q[r["q_id"]] = r["vec_id"]
    assert all(by_q[qid] == qid for qid in by_q)


def test_trained_centroids_deterministic_and_spark_free_twin(spark, tmp_path):
    """train_ivf_centroids is bit-deterministic and its pyarrow twin
    (used to generate the DuckDB oracle literals) reproduces the exact
    same centroids from the same parquet."""
    e = _emb(spark, n=300)
    a = ss.train_ivf_centroids(e, k=6, sample_cap=256, n_iter=5, seed=3)
    b = ss.train_ivf_centroids(e, k=6, sample_cap=256, n_iter=5, seed=3)
    rows_a = sorted((r["c_id"], tuple(r["embedding"])) for r in a.collect())
    rows_b = sorted((r["c_id"], tuple(r["embedding"])) for r in b.collect())
    assert rows_a == rows_b

    p = str(tmp_path / "emb.parquet")
    e.coalesce(1).write.parquet(p)
    local = ss.train_ivf_centroids_local(p, k=6, sample_cap=256, n_iter=5, seed=3)
    for (cid, vec), lc in zip(rows_a, local):
        assert vec == tuple(float(x) for x in lc), f"centroid {cid} differs"


def test_trained_ivf_recall_and_bucket_balance(spark):
    """End-to-end trainer value. Two properties, both load-bearing at
    100 TB: (1) recall@10 at nprobe=2 clears a floor; (2) the trained
    quantizer BALANCES buckets — naive first-k-vector centroids leave a
    dominant hot bucket (which inflates recall by accident but makes
    probe cost ~ the whole corpus), while kmeans spreads the corpus so
    nprobe/k bounds the data a probe touches."""
    e = _emb(spark, n=400)
    q = e.filter(F.col("vec_id") < 12).select(F.col("vec_id").alias("q_id"), "embedding")
    exact_sets = {}
    for r in ss.brute_force_topk(e, q, k=10).collect():
        exact_sets.setdefault(r["q_id"], set()).add(r["vec_id"])

    trained = ss.train_ivf_centroids(e, k=8, sample_cap=400, n_iter=8, seed=7)
    hit = total = 0
    for r in ss.ivf_topk(e, q, trained, k=10, nprobe=2).collect():
        total += 1
        hit += r["vec_id"] in exact_sets[r["q_id"]]
    assert hit / total >= 0.3

    def max_bucket_frac(cents):
        sizes = [
            r["n"] for r in ss.ivf_assign(e, cents)
            .groupBy("c_id").agg(F.count(F.lit(1)).alias("n")).collect()
        ]
        return max(sizes) / sum(sizes)

    naive = e.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("c_id"), "embedding")
    assert max_bucket_frac(trained) < max_bucket_frac(naive)
    # and the trained buckets are genuinely bounded: no bucket holds more
    # than half the corpus (k=8 -> perfectly balanced would be 1/8)
    assert max_bucket_frac(trained) <= 0.5


def test_refine_centroids_improves_quantization(spark):
    """Distributed Lloyd refinement over the full corpus must improve
    (or hold) the spherical kmeans objective — mean max-cosine of each
    normalized row to its centroid — versus the sample-only seed, and
    its output must drop into ivf_topk unchanged."""
    import numpy as np

    e = _emb(spark, n=500)
    X = np.array([r["embedding"] for r in e.orderBy("vec_id").collect()])
    Xn = X / np.linalg.norm(X, axis=1)[:, None]

    def objective(cents_df):
        C = np.array([r["embedding"] for r in cents_df.orderBy("c_id").collect()])
        Cn = C / np.maximum(np.linalg.norm(C, axis=1)[:, None], 1e-12)
        return float(np.max(Xn @ Cn.T, axis=1).mean())

    # weak seed: tiny sample so full-data refinement has room to help
    seed = ss.train_ivf_centroids(e, k=8, sample_cap=32, n_iter=2, seed=11)
    refined = ss.refine_ivf_centroids(e, seed, n_iter=3)
    assert objective(refined) >= objective(seed) - 1e-9

    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("q_id"), "embedding")
    out = ss.ivf_topk(e, q, refined, k=5, nprobe=2).collect()
    assert len(out) == 25  # 5 queries x top-5


def test_pq_encode_shapes_and_determinism(spark):
    e = _emb(spark, n=200, dim=16)
    B = ss.train_pq_codebooks(e, m=4, codewords=32, sample_cap=200, n_iter=5, seed=1)
    assert B.shape == (4, 32, 4)
    B2 = ss.train_pq_codebooks(e, m=4, codewords=32, sample_cap=200, n_iter=5, seed=1)
    assert (B == B2).all()
    codes = {r["vec_id"]: r["codes"] for r in ss.pq_encode(e, B).collect()}
    assert len(codes) == 200
    assert all(len(c) == 4 and all(0 <= x < 32 for x in c) for c in codes.values())
    again = {r["vec_id"]: r["codes"] for r in ss.pq_encode(e, B).collect()}
    assert codes == again


def test_pq_topk_with_rerank_recall(spark):
    """Compressed-domain ADC scan + exact re-rank must recover most of
    the exact top-10 (the IVF-PQ recall recipe); the PQ-only scan must
    at least put each query's own row in its candidate list."""
    e = _emb(spark, n=200, dim=16)
    q = e.filter(F.col("vec_id") < 6).select(F.col("vec_id").alias("q_id"), "embedding")
    B = ss.train_pq_codebooks(e, m=4, codewords=32, sample_cap=200, n_iter=5, seed=1)
    codes = ss.pq_encode(e, B)

    exact_sets = {}
    for r in ss.brute_force_topk(e, q, k=10).collect():
        exact_sets.setdefault(r["q_id"], set()).add(r["vec_id"])

    rr = ss.pq_topk(codes, q, B, corpus=e, k=10, rerank=50).collect()
    hit = sum(r["vec_id"] in exact_sets[r["q_id"]] for r in rr)
    assert hit / len(rr) >= 0.6
    # re-ranked scores are EXACT cosines: rank-1 is the query itself
    r1 = {r["q_id"]: r["vec_id"] for r in rr if r["rk"] == 1}
    assert all(r1[qid] == qid for qid in r1)

    pq_only = ss.pq_topk(codes, q, B, k=20).collect()
    by_q = {}
    for r in pq_only:
        by_q.setdefault(r["q_id"], set()).add(r["vec_id"])
    assert all(qid in by_q[qid] for qid in by_q)


def test_project_embeddings_paths_bit_identical(spark):
    """The numpy and expression forms of the JL projection must agree
    bit-for-bit (both accumulate in input-dim order in float64) — the
    property the generated DuckDB oracle relies on."""
    e = _emb(spark, n=100, dim=16)
    a = sorted((r["vec_id"], tuple(r["proj"])) for r in
               ss.project_embeddings(e, 4, seed=3, method="np").collect())
    b = sorted((r["vec_id"], tuple(r["proj"])) for r in
               ss.project_embeddings(e, 4, seed=3, method="expr").collect())
    assert a == b
    # deterministic across runs and repartitioning
    c = sorted((r["vec_id"], tuple(r["proj"])) for r in
               ss.project_embeddings(e.repartition(7), 4, seed=3).collect())
    assert a == c


def test_ivf_pq_topk_end_to_end(spark):
    """The composed IVF-PQ pipeline: candidates only come from probed
    buckets, the exact re-rank puts each query's own row at rank 1, and
    recall against brute force clears a floor sensible for
    bucket-pruned + quantized search."""
    e = _emb(spark, n=300, dim=16)
    q = e.filter(F.col("vec_id") < 6).select(F.col("vec_id").alias("q_id"), "embedding")
    cents = ss.train_ivf_centroids(e, k=6, sample_cap=300, n_iter=5, seed=2)
    B = ss.train_pq_codebooks(e, m=4, codewords=32, sample_cap=300, n_iter=5, seed=2)

    out = ss.ivf_pq_topk(e, q, cents, B, k=10, nprobe=3, rerank=60).collect()
    assert len(out) == 60  # 6 queries x 10
    r1 = {r["q_id"]: r["vec_id"] for r in out if r["rk"] == 1}
    assert all(r1[qid] == qid for qid in r1)

    # every returned id must live in a bucket its query probed
    import numpy as np

    assign = {r["vec_id"]: r["c_id"] for r in ss.ivf_assign(e, cents)
              .select(F.col("vec_id"), "c_id").collect()}
    C = {r["c_id"]: np.array(r["embedding"]) for r in cents.collect()}
    qv = {r["q_id"]: np.array(r["embedding"]) for r in q.collect()}

    def probed(qid):
        v = qv[qid]
        sims = {cid: float(v @ c / (np.linalg.norm(v) * np.linalg.norm(c)))
                for cid, c in C.items()}
        return set(sorted(sims, key=lambda cid: (-sims[cid], cid))[:3])

    for r in out:
        assert assign[r["vec_id"]] in probed(r["q_id"])

    exact_sets = {}
    for r in ss.brute_force_topk(e, q, k=10).collect():
        exact_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    hit = sum(r["vec_id"] in exact_sets[r["q_id"]] for r in out)
    assert hit / len(out) >= 0.3


def test_ivf_pq_with_persisted_index(spark, tmp_path):
    """The composed search must produce identical results when the
    assignment and codes come from disk (the production index layout)
    instead of being rebuilt inline."""
    e = _emb(spark, n=250, dim=16)
    q = e.filter(F.col("vec_id") < 4).select(F.col("vec_id").alias("q_id"), "embedding")
    cents = ss.train_ivf_centroids(e, k=5, sample_cap=250, n_iter=4, seed=9)
    B = ss.train_pq_codebooks(e, m=4, codewords=16, sample_cap=250, n_iter=4, seed=9)

    inline = ss.ivf_pq_topk(e, q, cents, B, k=8, nprobe=2, rerank=32).collect()

    idx_path = str(tmp_path / "ivf_index")
    ss.write_ivf_index(ss.ivf_assign(e, cents), idx_path)
    codes_path = str(tmp_path / "pq_codes")
    ss.pq_encode(e, B).write.parquet(codes_path)
    persisted = ss.ivf_pq_topk(
        e, q, cents, B, k=8, nprobe=2, rerank=32,
        assigned=ss.read_ivf_index(spark, idx_path),
        codes=spark.read.parquet(codes_path),
    ).collect()

    key = lambda rows: sorted((r["q_id"], r["vec_id"], r["rk"], r["cos_sim"]) for r in rows)  # noqa: E731
    assert key(inline) == key(persisted)


def test_ivf_assign_np_matches_expr(spark):
    """The broadcast-numpy assignment must bucket identically to the
    literal-expression form on the oracle-sized fixture (well-separated
    scores; both take the first maximum on ties)."""
    e = _emb(spark)
    cents = e.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("c_id"), "embedding")
    expr = ss.ivf_assign(e, cents, method="expr").select("vec_id", "c_id").collect()
    nump = ss.ivf_assign(e, cents, method="np").select("vec_id", "c_id").collect()
    assert sorted(map(tuple, expr)) == sorted(map(tuple, nump))


def test_ivf_assign_np_scales_past_literal_ceiling(spark):
    """1,000+ centroids: the literal form would embed k*d plan literals;
    the np form's plan is O(1) in k. Verify it runs, assigns every row,
    and agrees with a local numpy argmax."""
    import numpy as np

    rnd = random.Random(11)
    dim, k = 16, 1000
    cent_rows = [(i, [rnd.uniform(-1, 1) for _ in range(dim)]) for i in range(k)]
    cents = spark.createDataFrame(cent_rows, ["c_id", "embedding"])
    e = _emb(spark, n=300, dim=dim)

    # auto must pick the np path past max_expr_centroids
    out = ss.ivf_assign(e, cents, method="auto").select("vec_id", "c_id").collect()
    assert len(out) == 300

    mat = np.array([v for _, v in cent_rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    local = {}
    for r in e.collect():
        v = np.array(r["embedding"], dtype=np.float64)
        local[r["vec_id"]] = int(np.argmax((mat @ v) / norms))
    assert {r["vec_id"]: r["c_id"] for r in out} == local

    # plan stays O(1) in k: a mapInPandas stage, no k*d literal array
    plan = (
        ss.ivf_assign(e, cents, method="np")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan


def test_ivf_persisted_index_partition_pruning(spark, tmp_path):
    """write_ivf_index lays buckets out as c_id partitions; a prefiltered
    search must (a) return exactly the in-memory results, (b) carry a
    static PartitionFilter on c_id, and (c) physically read only the
    probed bucket directories."""
    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("q_id"), "embedding")
    cents = e.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("c_id"), "embedding")

    path = str(tmp_path / "ivf_index")
    ss.write_ivf_index(ss.ivf_assign(e, cents), path)
    index = ss.read_ivf_index(spark, path)

    mem = ss.ivf_topk(e, q, cents, k=10, nprobe=2).collect()
    idx = ss.ivf_topk(e, q, cents, k=10, nprobe=2,
                      assigned=index, prefilter_partitions=True)
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "c_id" in plan
    got = idx.collect()
    assert {tuple(r) for r in got} == {tuple(r) for r in mem}

    # physical layout: one directory per bucket on disk, and a bucket
    # filter lands in the scan's PartitionFilters (directory-level skip,
    # not a post-scan row filter — inputFiles() can't show this because
    # it lists the relation's files pre-pruning)
    import glob as _glob
    assert len(_glob.glob(path + "/c_id=*")) == 8
    two = index.filter(F.col("c_id").isin([0, 1]))
    plan2 = two._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan2 and "IN (0,1)" in plan2
    assert two.count() == index.count() - index.filter(~F.col("c_id").isin([0, 1])).count()


def test_append_to_ivf_index_layout_and_equivalence(spark, tmp_path):
    """Incremental index maintenance: appending a delta batch (a) only
    touches the bucket directories that received vectors — untouched
    buckets keep their exact file lists, (b) yields an index whose
    search results equal a full rebuild over base ∪ delta with the same
    centroids, and (c) reports per-bucket appended counts."""
    import glob as _glob
    import os as _os

    e = _emb(spark, n=200)
    base = e.filter(F.col("vec_id") < 150)
    delta = e.filter(F.col("vec_id") >= 150)
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"), "embedding")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), "embedding")

    path = str(tmp_path / "ivf_index")
    ss.write_ivf_index(ss.ivf_assign(base, cents), path)
    files_before = {
        d: sorted(_os.listdir(d)) for d in _glob.glob(path + "/c_id=*")
    }

    counts = {r["c_id"]: r["n_appended"]
              for r in ss.append_to_ivf_index(delta, cents, path).collect()}
    assert sum(counts.values()) == delta.count()
    # the delta's true assignment says which buckets must have changed
    want_touched = {r["c_id"] for r in ss.ivf_assign(delta, cents)
                    .select("c_id").distinct().collect()}
    assert set(counts) == want_touched

    files_after = {
        d: sorted(_os.listdir(d)) for d in _glob.glob(path + "/c_id=*")
    }
    for d, before in files_before.items():
        cid = int(d.rsplit("=", 1)[1])
        after = files_after[d]
        if cid in want_touched:
            assert set(before) < set(after), f"bucket {cid} must gain files"
        else:
            assert before == after, f"untouched bucket {cid} was rewritten"

    # search over the appended index == search over a full rebuild
    rebuilt_path = str(tmp_path / "ivf_rebuilt")
    ss.write_ivf_index(ss.ivf_assign(e, cents), rebuilt_path)
    kw = dict(k=10, nprobe=2, prefilter_partitions=True)
    got = ss.ivf_topk(e, q, cents,
                      assigned=ss.read_ivf_index(spark, path), **kw).collect()
    want = ss.ivf_topk(e, q, cents,
                       assigned=ss.read_ivf_index(spark, rebuilt_path),
                       **kw).collect()
    assert {tuple(r) for r in got} == {tuple(r) for r in want}


def test_reduced_rerank_full_shortlist_equals_brute_force(spark):
    """With shortlist = corpus size the reduced stage prunes nothing,
    so the exact re-rank must reproduce brute force row-for-row —
    pins that re-rank scoring and ordering are brute_force_topk's."""
    from ncbi_analysis_spark.operators import embeddings as em

    e = _emb(spark, n=120, dim=16)
    q = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), "embedding")
    mean, comps, _ = em.pca_fit(e, k=6, sample_cap=1000)
    got = ss.reduced_rerank_topk(
        e, q, mean, comps, k=10, shortlist=120).collect()
    want = ss.brute_force_topk(e, q, k=10).collect()
    assert sorted(tuple(r) for r in got) == sorted(tuple(r) for r in want)


def test_reduced_rerank_recall_and_exactness(spark):
    """A 6-of-16-dim shortlist of 30 over 200 vectors: recall@10 must
    clear a floor even on THIS worst case (uniform-random vectors have
    a flat spectrum, so PCA concentrates no variance — real embedding
    corpora recall far higher; measured 0.77 here), and every returned
    score must equal the exact brute-force score for that pair (the
    re-rank is full-dimension by construction)."""
    from ncbi_analysis_spark.operators import embeddings as em

    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("q_id"), "embedding")
    mean, comps, _ = em.pca_fit(e, k=6, sample_cap=1000)
    got = ss.reduced_rerank_topk(
        e, q, mean, comps, k=10, shortlist=30).collect()
    exact = ss.brute_force_topk(e, q, k=10).collect()
    ex = {(r["q_id"], r["vec_id"]): r["cos_sim"] for r in exact}
    hits = sum(1 for r in got if (r["q_id"], r["vec_id"]) in ex)
    assert hits / len(ex) >= 0.7, hits
    all_scores = {
        (r["q_id"], r["vec_id"]): r["cos_sim"]
        for r in ss.brute_force_topk(e, q, k=200).collect()
    }
    for r in got:
        assert r["cos_sim"] == all_scores[(r["q_id"], r["vec_id"])]



# ---------------------------------------------------------------------------
# SQ8 scalar quantization (r15)
# ---------------------------------------------------------------------------

def test_sq_bounds_and_codes_in_range(spark):
    e = _emb(spark)
    bounds = ss.train_sq_bounds(e)
    rows = bounds.collect()
    assert len(rows) == 16 and all(r["lo"] <= r["hi"] for r in rows)
    los, his = ss._sq_bounds_lists(bounds)
    coded = e.select(
        "vec_id", ss.sq_encode_expr(F.col("embedding"), los, his).alias("c"))
    for r in coded.collect():
        assert all(0 <= c <= 255 for c in r["c"]), r
    # reconstruction error bounded by half a step per dimension
    deq = e.select(
        "embedding",
        ss.sq_dequantize_expr(
            ss.sq_encode_expr(F.col("embedding"), los, his), los, his
        ).alias("d"))
    steps = [(hi - lo) / 255.0 for lo, hi in zip(los, his)]
    for r in deq.collect():
        for x, xhat, st in zip(r["embedding"], r["d"], steps):
            assert abs(float(x) - xhat) <= st / 2 + 1e-12


def test_sq_constant_dimension_codes_zero(spark):
    rows = [(i, [1.5, float(i)]) for i in range(4)]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    bounds = ss.train_sq_bounds(e)
    los, his = ss._sq_bounds_lists(bounds)
    out = e.select(
        ss.sq_encode_expr(F.col("embedding"), los, his).alias("c"),
        ss.sq_dequantize_expr(
            ss.sq_encode_expr(F.col("embedding"), los, his), los, his
        ).alias("d")).collect()
    assert all(r["c"][0] == 0 and r["d"][0] == 1.5 for r in out)


def test_ivf_sq8_recall_and_rerank_exactness(spark):
    """Pure SQ8 scoring keeps high overlap with the float IVF ranking;
    with a rerank shortlist the output EQUALS the exact IVF top-k
    (same probes, exact scores — SQ only picked candidates)."""
    e = _emb(spark)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), "embedding")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("c_id"), "embedding")
    exact = ss.ivf_topk(e, q, cents, k=10, nprobe=4).collect()
    sq = ss.ivf_sq8_topk(e, q, cents, k=10, nprobe=4).collect()
    a = {(r["q_id"], r["vec_id"]) for r in exact}
    b = {(r["q_id"], r["vec_id"]) for r in sq}
    assert len(a & b) / len(a) >= 0.8
    rr = ss.ivf_sq8_topk(e, q, cents, k=10, nprobe=4, rerank=40)
    got = sorted((r["q_id"], r["vec_id"], r["rk"], r["cos_sim"])
                 for r in rr.collect())
    want = sorted((r["q_id"], r["vec_id"], r["rk"], r["cos_sim"])
                  for r in exact)
    assert got == want


def test_sq8_persisted_index_smaller_and_searchable(spark, tmp_path):
    """The coded index round-trips through write_ivf_index/parquet with
    the same c_id partition layout (probe pruning intact) and is
    materially smaller on disk than the float index at identical rows."""
    import os

    e = _emb(spark, n=400, dim=32)
    cents = e.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("c_id"), "embedding")
    assigned = ss.ivf_assign(e, cents)
    bounds = ss.train_sq_bounds(e)
    coded = ss.sq8_encode_index(assigned, bounds)

    p_flat = str(tmp_path / "flat")
    p_sq = str(tmp_path / "sq")
    assigned.write.partitionBy("c_id").parquet(p_flat)
    coded.write.partitionBy("c_id").parquet(p_sq)

    def du(path):
        return sum(os.path.getsize(os.path.join(r, f))
                   for r, _, fs in os.walk(path) for f in fs
                   if f.endswith(".parquet"))

    assert du(p_sq) < du(p_flat) * 0.6, (du(p_sq), du(p_flat))

    index = spark.read.parquet(p_sq)
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), "embedding")
    out = ss.ivf_sq8_topk(e, q, cents, bounds=bounds, k=5, nprobe=3,
                          index=index).collect()
    direct = ss.ivf_sq8_topk(e, q, cents, bounds=bounds, k=5,
                             nprobe=3).collect()
    key = lambda rows: sorted((r["q_id"], r["vec_id"], r["rk"]) for r in rows)  # noqa: E731
    assert key(out) == key(direct)


def test_sq8_persisted_lifecycle(spark, tmp_path):
    """write -> read-bounds -> append -> delete -> compact on the coded
    index: append ≡ rebuild-over-union (same frozen quantizer + bounds),
    delete/compact are the schema-agnostic IVF machinery, the bounds
    marker catches a hand-modified bounds table, and drifted-centroid
    appends refuse."""
    import pytest as _pytest

    from ncbi_analysis_spark.operators import similarity_search as ss2

    e = _emb(spark, n=240, dim=12)
    base = e.filter(F.col("vec_id") < 200)
    new = e.filter(F.col("vec_id") >= 200)
    cents = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("c_id"), "embedding")
    bounds = ss2.train_sq_bounds(e)  # trained on the full distribution
    path = str(tmp_path / "sq8idx")

    ss2.write_sq8_index(ss2.ivf_assign(base, cents), bounds, path,
                        centroids=cents)
    counts = ss2.append_to_sq8_index(new, cents, path)
    assert sum(r["n_appended"] for r in counts.collect()) == 40

    # append ≡ full rebuild over base ∪ new
    idx = ss2.read_sq8_index(spark, path)
    full = ss2.sq8_encode_index(ss2.ivf_assign(e, cents), bounds)
    got = sorted((r["vec_id"], r["c_id"], tuple(r["sq_code"]))
                 for r in idx.collect())
    want = sorted((r["vec_id"], r["c_id"], tuple(r["sq_code"]))
                  for r in full.collect())
    assert got == want

    # search over the persisted index == direct computation
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), "embedding")
    b2 = ss2.read_sq8_bounds(spark, path)
    via_idx = ss2.ivf_sq8_topk(e, q, cents, bounds=b2, index=idx,
                               k=5, nprobe=2).collect()
    direct = ss2.ivf_sq8_topk(e, q, cents, bounds=bounds, k=5,
                              nprobe=2).collect()
    key = lambda rows: sorted((r["q_id"], r["vec_id"], r["rk"]) for r in rows)  # noqa: E731
    assert key(via_idx) == key(direct)

    # delete + compact (the generic IVF machinery) keep codes intact
    ids = spark.createDataFrame([(205,), (206,)], ["vec_id"])
    assert ss2.delete_from_ivf_index(ids, path) == 2
    live = ss2.read_sq8_index(spark, path)
    assert live.filter(F.col("vec_id").isin(205, 206)).count() == 0
    ss2.compact_ivf_index(spark, path)
    after = ss2.read_sq8_index(spark, path)
    assert after.count() == 238
    # bounds survive compaction and still digest-verify
    ss2.read_sq8_bounds(spark, path)

    # drifted centroids refuse
    drifted = cents.withColumn(
        "embedding", F.transform("embedding", lambda x: x * 2))
    with _pytest.raises(ValueError, match="drift"):
        ss2.append_to_sq8_index(new, drifted, path)

    # hand-modified bounds table fails the digest check
    bounds.withColumn("hi", F.col("hi") + 1).coalesce(1).write.mode(
        "overwrite").parquet(path + "/_sq_bounds")
    with _pytest.raises(ValueError, match="bounds digest"):
        ss2.read_sq8_bounds(spark, path)
