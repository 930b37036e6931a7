"""Relational operator-kit tests on tiny synthetic frames (SURVEY.md §2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ncbi_analysis_spark.operators import asof, cluster, dedup, distribution, intervals
from ncbi_analysis_spark.operators.suppression import local_max_suppress
from ncbi_analysis_spark.operators.topk import topk_per_group


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0)],
        ["g", "id", "score"],
    )
    out = topk_per_group(df, ["g"], [F.desc("score"), F.asc("id")], 2)
    got = {(r["g"], r["id"], r["rk"]) for r in out.collect()}
    assert got == {("a", 2, 1), ("a", 3, 2), ("b", 4, 1)}


def test_local_max_suppress(spark):
    # reference deque semantics: strictly-lower neighbors suppressed, ties
    # within distance both survive, nonpositive dropped
    # (src/analysis/gene_similarity_match.py:259-277)
    df = spark.createDataFrame(
        [("g", 100, 5.0), ("g", 103, 7.0), ("g", 104, 7.0), ("g", 120, 3.0),
         ("g", 125, -1.0)],
        ["k", "pos", "score"],
    )
    out = local_max_suppress(df, ["k"], "pos", "score", distance=5)
    got = sorted(r["pos"] for r in out.collect())
    assert got == [103, 104, 120]


def test_cluster_by_key(spark):
    # J1: upper-cased equality, representative = first member
    # (src/analysis/cluster_match.py:83-114)
    df = spark.createDataFrame(
        [("AAB", 1), ("aab", 2), ("ccg", 3)], ["seq", "no"]
    )
    out = cluster.cluster_by_key(df, F.upper(F.col("seq")), F.col("no"))
    rows = {r["cluster_key"]: r for r in out.collect()}
    assert rows["AAB"]["cluster_size"] == 2
    assert rows["AAB"]["members"] == "1,2"
    assert rows["AAB"]["representative"] == 1


def test_distribution(spark):
    df = spark.createDataFrame([("x",), ("x",), ("y",)], ["k"])
    out = distribution.value_distribution(df, ["k"]).collect()
    assert out[0]["k"] == "x" and out[0]["cnt"] == 2
    assert abs(out[0]["ratio"] - 0.666667) < 1e-9


def test_asof_backward_and_forward(spark):
    probe = spark.createDataFrame([(1, 10), (1, 20), (2, 5)], ["k", "t"])
    build = spark.createDataFrame(
        [(1, 8, "a"), (1, 15, "b"), (2, 9, "c")], ["k", "bt", "v"]
    )
    out = asof.asof_join(probe, build, ["k"], "t", "bt", ["v"], "backward")
    got = {(r["k"], r["t"]): r["asof_v"] for r in out.collect()}
    assert got == {(1, 10): "a", (1, 20): "b", (2, 5): None}
    out = asof.asof_join(probe, build, ["k"], "t", "bt", ["v"], "forward")
    got = {(r["k"], r["t"]): r["asof_v"] for r in out.collect()}
    assert got == {(1, 10): "b", (1, 20): None, (2, 5): "c"}


def test_asof_empty_keys_raises_unless_opted_in(spark):
    """on=[] degenerates to a single-partition window — must raise unless
    explicitly allowed (round-5 verdict ask #5)."""
    import pytest

    probe = spark.createDataFrame([(1, 10)], ["k", "t"])
    build = spark.createDataFrame([(1, 8, "a")], ["k", "bt", "v"])
    with pytest.raises(ValueError, match="single-partition"):
        asof.asof_join(probe, build, [], "t", "bt", ["v"])
    out = asof.asof_join(probe, build, [], "t", "bt", ["v"],
                         allow_single_partition=True)
    assert out.collect()[0]["asof_v"] == "a"


def test_asof_inclusive_tie(spark):
    probe = spark.createDataFrame([(1, 10)], ["k", "t"])
    build = spark.createDataFrame([(1, 10, "x")], ["k", "bt", "v"])
    out = asof.asof_join(probe, build, ["k"], "t", "bt", ["v"], "backward")
    assert out.collect()[0]["asof_v"] == "x"


def test_nearest_neighbors(spark):
    # J4: nearest gene wholly left / wholly right of an interval
    # (src/analysis/neighbor_analysis.py:171-199)
    probe = spark.createDataFrame([("n1", 100, 110)], ["acc", "left", "right"])
    genes = spark.createDataFrame(
        [("n1", 10, 50, "gA"), ("n1", 60, 95, "gB"), ("n1", 130, 150, "gC")],
        ["acc", "left", "right", "gene"],
    )
    out = asof.nearest_neighbors(probe, genes, ["acc"]).collect()[0]
    assert out["left_gene"] == "gB" and out["right_gene"] == "gC"


def test_interval_join_binned_matches_naive(spark):
    import random

    random.seed(3)
    rows = [(i, random.randint(0, 500), 0) for i in range(80)]
    rows = [(i, s, s + random.randint(0, 80)) for i, s, _ in rows]
    left = spark.createDataFrame(rows, ["lid", "ls", "le"])
    right = spark.createDataFrame(
        [(100 + i, s, e) for i, s, e in rows], ["rid", "rs", "re"]
    )
    binned = intervals.interval_join_binned(left, right, "ls", "le", "rs", "re", bin_size=64)
    naive = left.join(
        right, (F.col("ls") <= F.col("re")) & (F.col("le") >= F.col("rs"))
    )
    got = {(r["lid"], r["rid"]) for r in binned.collect()}
    want = {(r["lid"], r["rid"]) for r in naive.collect()}
    assert got == want


def test_interval_join_binned_matches_broadcast(spark):
    """Verdict r5 ask #6: the binned big x big path must return exactly
    the broadcast path's pairs — including with equality partition keys
    and intervals spanning many bins."""
    import random

    random.seed(9)
    accs = ["c1", "c2"]

    def mk(base):
        rows = []
        for i in range(150):
            s = random.randint(0, 2000)
            rows.append((base + i, random.choice(accs), s, s + random.randint(0, 300)))
        return rows

    lrows, rrows = mk(0), mk(500)
    left = spark.createDataFrame(lrows, ["lid", "acc", "ls", "le"])
    right = spark.createDataFrame(rrows, ["rid", "acc", "rs", "re"])
    same_acc = F.col("acc") == F.col("__r_acc")
    bcast = intervals.interval_join_broadcast(
        left, right.withColumnRenamed("acc", "__r_acc"),
        "ls", "le", "rs", "re", extra_cond=same_acc)
    want = {(r["lid"], r["rid"]) for r in bcast.collect()}
    for bin_size in (64, 1000):
        binned = intervals.interval_join_binned(
            left, right, "ls", "le", "rs", "re",
            bin_size=bin_size, partition_keys=["acc"])
        got = {(r["lid"], r["rid"]) for r in binned.collect()}
        assert got == want, bin_size


def test_gap_regions(spark):
    df = spark.createDataFrame(
        [("a", 10, 20), ("a", 22, 30), ("a", 50, 60), ("a", 90, 95)],
        ["acc", "s", "e"],
    )
    out = intervals.gap_regions(df, ["acc"], "s", "e", min_gap=5).collect()
    got = [(r["gap_start"], r["gap_end"], r["region_name"]) for r in out]
    assert got == [(31, 49, "region_1"), (61, 89, "region_2")]


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other")], ["id", "text"]
    )
    out = dedup.exact_dedup(df, "text", "id")
    assert sorted(r["id"] for r in out.collect()) == [1, 3]


def test_minhash_lsh_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    near = base.replace("lazy", "sleepy")
    far = "completely different words in this sentence about spark engines"
    df = spark.createDataFrame([(1, base), (2, near), (3, far)], ["id", "text"])
    pairs = dedup.minhash_lsh_pairs(df, "text", "id", num_perm=16, bands=8)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_band_cap_drops_hot_bucket_observably(spark):
    """max_band_freq drops a degenerate bucket (identical docs all
    colliding) and the drop is observable — the plan carries a
    CollectMetrics node counting dropped buckets/members (ADVICE r02:
    capped recall loss must not be silent)."""
    df = spark.createDataFrame(
        [(i, "same text every time ok") for i in range(6)], ["id", "text"]
    )
    uncapped = dedup.minhash_lsh_pairs(df, "text", "id", num_perm=4, bands=2,
                                       max_band_freq=None)
    assert uncapped.count() == 15  # 6 choose 2
    capped = dedup.minhash_lsh_pairs(df, "text", "id", num_perm=4, bands=2,
                                     max_band_freq=5)
    assert capped.count() == 0
    plan = capped._jdf.queryExecution().analyzed().toString()
    assert "dropped_buckets" in plan and "dropped_members" in plan
    # two capped stages in one query must not collide on metric names
    both = capped.unionByName(
        dedup.simhash_pairs(df, "text", "id", max_band_freq=5)
        .select("id_a", "id_b")
    )
    assert both.count() == 0


def test_ngram_jaccard(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x y z w v")], ["id", "text"]
    )
    out = dedup.ngram_jaccard_pairs(df, "text", "id", shingle_n=3, threshold=0.5)
    rows = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert rows == {(1, 2): 1.0}


def test_ngram_jaccard_cap_default_on(spark):
    """The skew cap defaults ON (VERDICT r04 #4): a hot shingle shared by
    every doc is dropped when its frequency exceeds max_shingle_freq, the
    drop is observable via the CollectMetrics node, and passing None
    restores exact all-pairs behavior."""
    # 8 docs whose ONLY common 3-gram is the hot shingle "a b c"
    df = spark.createDataFrame(
        [(i, f"a b c u{i} v{i}") for i in range(8)], ["id", "text"]
    )
    exact = dedup.ngram_jaccard_pairs(df, "text", "id", shingle_n=3,
                                      threshold=0.01, max_shingle_freq=None)
    assert exact.count() == 28  # 8 choose 2, all joined via the hot shingle
    capped = dedup.ngram_jaccard_pairs(df, "text", "id", shingle_n=3,
                                       threshold=0.01, max_shingle_freq=5)
    assert capped.count() == 0
    plan = capped._jdf.queryExecution().analyzed().toString()
    assert "dropped_buckets" in plan and "dropped_members" in plan
    # the signature default itself must be a finite cap
    import inspect

    assert inspect.signature(dedup.ngram_jaccard_pairs).parameters[
        "max_shingle_freq"].default == 1000


def test_bloom_decon_no_false_negatives_and_low_fpr(spark):
    """The Bloom probe must report AT LEAST every gram the exact
    operator finds (no false negatives, per-doc), and on a
    disjoint-vocabulary corpus its false-positive contamination stays
    far below any realistic decon threshold."""
    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today ok fine")],
        ["id", "text"],
    )
    # doc 1 shares grams with bench; docs 2-4 use a disjoint vocabulary
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over nothing"), *[
            (i, " ".join(f"w{i}x{j}" for j in range(40))) for i in range(2, 5)
        ]],
        ["id", "text"],
    )
    bloom = dedup.build_ngram_bloom(bench, "text", "id", n=3, n_bits=1 << 16, n_hashes=4)
    approx = {r["id"]: r for r in dedup.bloom_ngram_overlap(corpus, bloom, "text", "id").collect()}
    exact = {r["id"]: r for r in dedup.benchmark_ngram_overlap(corpus, bench, "text", "id").collect()}
    assert set(approx) == set(exact)
    for i in exact:
        assert approx[i]["n_grams"] == exact[i]["n_grams"]
        assert approx[i]["n_shared"] >= exact[i]["n_shared"]  # no false negatives
    assert approx[1]["n_shared"] >= 4  # the truly-shared grams
    fp = sum(approx[i]["n_shared"] for i in (2, 3, 4))
    total = sum(approx[i]["n_grams"] for i in (2, 3, 4))
    assert fp / total < 0.05


def test_simhash_near_dup_pairs(spark):
    base = "spark sql window functions are great for analytics " * 3
    near = base.replace("great", "good", 1)
    df = spark.createDataFrame([(1, base), (2, near)], ["id", "text"])
    out = dedup.simhash_pairs(df, "text", "id", max_hamming=6)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["hamming"] <= 6


def test_embedding_dup_pairs(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.999, 0.01]), (3, [0.0, 1.0])], ["id", "v"]
    )
    out = dedup.embedding_dup_pairs(df, "v", "id", threshold=0.95)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got == {(1, 2)}


def test_embedding_exact_mode_guard(spark):
    """bucket_planes=0 is the oracle all-pairs path; past the row cap it
    must fail fast instead of silently going quadratic."""
    import pytest as _pytest

    df = spark.range(0, 20).selectExpr("id", "array(cast(id as double), 1.0) as v")
    with _pytest.raises(ValueError, match="max_exact_rows"):
        dedup.embedding_dup_pairs(df, "v", "id", max_exact_rows=10)
    # under the cap it still works, as does the LSH path above it
    assert dedup.embedding_dup_pairs(df, "v", "id", max_exact_rows=100).count() >= 0
    assert dedup.embedding_dup_pairs(
        df, "v", "id", bucket_planes=2, max_exact_rows=10
    ).count() >= 0


def test_connected_components(spark):
    """Min-label CC with pointer jumping: a diameter-7 path collapses to
    its min id, disjoint components stay disjoint, and component_dups
    keeps exactly one representative per cluster."""
    from ncbi_analysis_spark.operators.components import (
        component_dups, connected_components)

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)] + [(100, 101)], ["id_a", "id_b"]
    )
    comp = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert all(comp[i] == 1 for i in range(1, 9))
    assert comp[100] == comp[101] == 100
    assert set(comp) == set(range(1, 9)) | {100, 101}  # isolated ids absent
    dups = {r["id"] for r in component_dups(edges).collect()}
    assert dups == set(range(2, 9)) | {101}


def test_connected_components_convergence_guard(spark):
    """A diameter-7 path cannot converge in one round — the guard must
    raise rather than return wrong labels."""
    import pytest as _pytest

    from ncbi_analysis_spark.operators.components import connected_components

    edges = spark.createDataFrame([(i, i + 1) for i in range(1, 8)], ["id_a", "id_b"])
    with _pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iter=1)
    # string ids work too (min is lexicographic)
    sedges = spark.createDataFrame([("b", "a"), ("b", "c")], ["id_a", "id_b"])
    comp = {r["id"]: r["component"]
            for r in connected_components(sedges).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a"}


def test_connected_components_unpersists_superseded_checkpoints(spark):
    """Each round's localCheckpoint supersedes the previous round's;
    without explicit unpersists a long chain accretes one cached RDD per
    round. After the run exactly ONE new persistent RDD may remain (the
    returned labels — the caller still reads them); the per-round label
    checkpoints and the edge-set checkpoint must all be freed."""
    from ncbi_analysis_spark.operators.components import connected_components

    def n_persistent():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    before = n_persistent()
    # diameter-39 path: needs several pointer-jump rounds, so the no-
    # cleanup behavior would leave >5 checkpoints behind
    edges = spark.createDataFrame([(i, i + 1) for i in range(40)], ["id_a", "id_b"])
    comp = connected_components(edges)
    assert comp.count() == 41
    assert n_persistent() - before <= 1


def test_connected_components_random_vs_union_find(spark):
    """300 random edges over 120 nodes (guaranteed multi-node chains and
    cycles) must produce exactly the labels of a reference union-find."""
    import random

    from ncbi_analysis_spark.operators.components import connected_components

    rnd = random.Random(7)
    edges = [(rnd.randrange(120), rnd.randrange(120)) for _ in range(300)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(120))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    want = {n: find(n) for n in nodes}
    # union-find roots are not guaranteed minimal; canonicalize to the
    # min node id per root
    rep = {}
    for n, r in want.items():
        rep.setdefault(r, n)
        rep[r] = min(rep[r], n)
    want = {n: rep[r] for n, r in want.items()}

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == want


def test_connected_components_incremental_basic(spark):
    """A new edge merging two prior components relabels BOTH to the
    union's min id; untouched components keep their labels; brand-new
    nodes get labeled; a batch edge internal to one prior component
    changes nothing."""
    from ncbi_analysis_spark.operators.components import (
        connected_components, connected_components_incremental)

    old = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], ["id_a", "id_b"]
    )
    prior = connected_components(old)
    batch = spark.createDataFrame(
        [(3, 10),     # merges {1,2,3} with {10,11} -> all label 1
         (20, 21),    # internal to an existing component — no-op
         (30, 31)],   # brand-new nodes
        ["id_a", "id_b"],
    )
    got = {r["id"]: r["component"]
           for r in connected_components_incremental(prior, batch).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1,
                   20: 20, 21: 20, 30: 30, 31: 30}


def test_connected_components_incremental_folds_match_full(spark):
    """Random edges split into 3 arbitrary batches: CC(E1) folded with
    E2 then E3 must equal CC(E1 ∪ E2 ∪ E3) exactly — including chains
    that only connect ACROSS batches and min-ids that live in a
    component only reachable through the last batch."""
    import random

    from ncbi_analysis_spark.operators.components import (
        connected_components, connected_components_incremental)

    for seed in (3, 11):
        rnd = random.Random(seed)
        edges = [(rnd.randrange(80), rnd.randrange(80)) for _ in range(150)]
        edges = [(a, b) for a, b in edges if a != b]
        cut1, cut2 = len(edges) // 3, 2 * len(edges) // 3
        e1, e2, e3 = edges[:cut1], edges[cut1:cut2], edges[cut2:]

        full = connected_components(
            spark.createDataFrame(edges, ["id_a", "id_b"]))
        want = {r["id"]: r["component"] for r in full.collect()}

        labels = connected_components(
            spark.createDataFrame(e1, ["id_a", "id_b"]))
        for batch in (e2, e3):
            labels = connected_components_incremental(
                labels, spark.createDataFrame(batch, ["id_a", "id_b"]))
        got = {r["id"]: r["component"] for r in labels.collect()}
        assert got == want


def test_connected_components_incremental_empty_batch(spark):
    """An empty batch is an identity fold."""
    from ncbi_analysis_spark.operators.components import (
        connected_components, connected_components_incremental)

    prior = connected_components(
        spark.createDataFrame([(1, 2), (5, 6)], ["id_a", "id_b"]))
    empty = spark.createDataFrame([], "id_a long, id_b long")
    got = {r["id"]: r["component"]
           for r in connected_components_incremental(prior, empty).collect()}
    assert got == {1: 1, 2: 1, 5: 5, 6: 5}


def test_benchmark_ngram_overlap(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"),      # grams: "a b c","b c d","c d e"
         (2, "x y z w")],       # grams: "x y z","y z w"
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "b c d e f")],   # grams: "b c d","c d e","d e f"
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.benchmark_ngram_overlap(docs, bench, "text", "doc_id", n=3).collect()
    }
    assert out[1]["n_grams"] == 3 and out[1]["n_shared"] == 2
    assert out[1]["contamination"] == 2 / 3
    assert out[2]["n_grams"] == 2 and out[2]["n_shared"] == 0
    assert out[2]["contamination"] == 0.0


def test_repetition_signals(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b"),        # tokens 4, distinct 2, top 3; 2-grams: "a a","a a","a b" -> 3 total 2 distinct
         (2, "p q r s")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.repetition_signals(docs, "text", "doc_id").collect()
    }
    assert out[1]["n_tokens"] == 4
    assert out[1]["distinct_frac"] == 0.5
    assert out[1]["top_token_frac"] == 0.75
    assert out[1]["dup_2gram_frac"] == 1.0 - 2 / 3
    assert out[2]["distinct_frac"] == 1.0
    assert out[2]["dup_2gram_frac"] == 0.0


def test_char_window_dup_pairs(spark):
    shared = "the quick brown fox jumps over the lazy dog again and again 1234"
    docs = spark.createDataFrame(
        [(1, shared + " tail one goes here"),
         (2, "completely different content with no overlap whatsoever at all"),
         (3, shared + " another distinct tail")],
        ["doc_id", "text"],
    )
    out = dedup.char_window_dup_pairs(docs, "text", "doc_id", window=32, stride=16)
    rows = {(r["id_a"], r["id_b"]): r["n_shared_windows"] for r in out.collect()}
    # docs 1 and 3 share the aligned 64-char prefix -> windows at 0/16/32
    assert rows.get((1, 3), 0) >= 2
    assert all(p == (1, 3) for p in rows)


def test_sessionize_gap_semantics(spark):
    from ncbi_analysis_spark.operators import sessions

    ev = spark.createDataFrame(
        [("u", 1, 0), ("u", 2, 100), ("u", 3, 5000), ("u", 4, 5100), ("v", 5, 0)],
        ["user_id", "event_id", "tsu"],
    )
    out = sessions.session_stats(ev, ["user_id"], "tsu", gap=1000, tiebreak="event_id")
    rows = {(r["user_id"], r["session_no"]): r.asDict() for r in out.collect()}
    assert rows[("u", 1)]["n_events"] == 2 and rows[("u", 1)]["session_end"] == 100
    assert rows[("u", 2)]["session_start"] == 5000 and rows[("u", 2)]["n_events"] == 2
    assert rows[("v", 1)]["n_events"] == 1


def _sem_centroids(spark):
    # two obvious cluster directions in 2-d
    return spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        schema="c_id bigint, v array<double>",
    )


def test_semantic_dedup_keep_outlier(spark):
    """SemDeDup keep rule: within a near-dup component the survivor is
    the member LEAST similar to its centroid (diversity-preserving),
    ties by smallest id; rows with no near-dup always keep."""
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),      # cluster 0, cent_sim = 1.0
            (2, [0.999, 0.04]),   # cluster 0, near-dup of 1, farther out
            (3, [0.0, 1.0]),      # cluster 1, no dup
        ],
        schema="id bigint, v array<float>",
    )
    out = {r["id"]: r.asDict() for r in dedup.semantic_dedup(
        df, "v", "id", _sem_centroids(spark), threshold=0.95
    ).collect()}
    assert len(out) == 3
    # 1 and 2 form one component labeled by the min member id
    assert out[1]["component"] == 1 and out[2]["component"] == 1
    # 2 is the outlier (lower cent_sim) -> kept; 1 dropped
    assert out[2]["keep"] and not out[1]["keep"]
    assert out[2]["cent_sim"] < out[1]["cent_sim"]
    # the singleton keeps, component NULL
    assert out[3]["keep"] and out[3]["component"] is None


def test_semantic_dedup_edges_stay_within_clusters(spark):
    """Identical-direction vectors assigned to DIFFERENT centroids are
    never paired: the pair join is cluster-bucketed by construction."""
    df = spark.createDataFrame(
        [(3, [0.7, 0.7142]), (4, [0.7142, 0.7])],
        schema="id bigint, v array<float>",
    )
    out = {r["id"]: r.asDict() for r in dedup.semantic_dedup(
        df, "v", "id", _sem_centroids(spark), threshold=0.99
    ).collect()}
    # 3 -> centroid 1 (y-leaning), 4 -> centroid 0 (x-leaning): despite
    # cosine(3,4) ~ 0.9996 >= 0.99 they are in different buckets -> no edge
    assert out[3]["c_id"] != out[4]["c_id"]
    assert out[3]["component"] is None and out[4]["component"] is None
    assert out[3]["keep"] and out[4]["keep"]


def test_semantic_dedup_cluster_cap(spark):
    """max_cluster_rows drops over-cap clusters from PAIRING only — the
    rows still come back labeled and kept (observable via _capped)."""
    rows = [(i, [1.0, 0.001 * i]) for i in range(5)] + [(10, [0.0, 1.0])]
    df = spark.createDataFrame(rows, schema="id bigint, v array<float>")
    cents = _sem_centroids(spark)
    capped = {r["id"]: r.asDict() for r in dedup.semantic_dedup(
        df, "v", "id", cents, threshold=0.9, max_cluster_rows=3
    ).collect()}
    assert len(capped) == 6
    # the 5-row cluster is over the cap: no components, everyone kept
    assert all(r["component"] is None and r["keep"] for r in capped.values())
    uncapped = dedup.semantic_dedup(
        df, "v", "id", cents, threshold=0.9, max_cluster_rows=None
    ).toPandas()
    assert uncapped["component"].notna().sum() == 5
    assert int(uncapped["keep"].sum()) == 2  # one survivor + the singleton


def test_semantic_dedup_np_pairs_match_expr(spark):
    """The blocked-BLAS pair stage must produce the same edge set (and
    therefore identical labels) as the expr fold on well-separated
    cosines — fixture sims are nowhere near the float-order boundary."""
    import random

    rnd = random.Random(11)
    rows = []
    for i in range(60):
        base = [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0]
        rows.append((i, [base[0] + rnd.uniform(-0.02, 0.02),
                         base[1] + rnd.uniform(-0.02, 0.02)]))
    df = spark.createDataFrame(rows, schema="id bigint, v array<float>")
    cents = _sem_centroids(spark)
    kw = dict(threshold=0.999, max_cluster_rows=None)
    expr = dedup.semantic_dedup(df, "v", "id", cents, pair_method="expr", **kw).toPandas()
    npp = dedup.semantic_dedup(df, "v", "id", cents, pair_method="np", **kw).toPandas()
    key = ["id", "c_id", "component", "keep"]
    a = expr[key].sort_values("id").reset_index(drop=True)
    b = npp[key].sort_values("id").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert expr["component"].notna().sum() > 0  # the edges actually exist


def test_fuzzy_decon_pairs_cross_corpus(spark):
    """Cross-corpus LSH contamination: a paraphrase-level near-dup of a
    benchmark doc is flagged, an unrelated doc is not, and within-corpus
    near-dups do NOT pair with each other (cross only)."""
    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog again and again ok")],
        ["bench_id", "text"])
    corpus = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the sleepy dog again and again ok"),
         (11, "completely different words in this sentence about spark engines"),
         (12, "totally unrelated content third document text body")],
        ["doc_id", "text"])
    got = {(r["doc_id"], r["bench_id"]) for r in dedup.fuzzy_decon_pairs(
        corpus, bench, "text", "doc_id", bench_id_col="bench_id",
        num_perm=16, bands=8).collect()}
    assert (10, 0) in got
    assert all(d != 11 and d != 12 for d, _ in got)


def test_source_quality_report_and_blocklist(spark):
    from ncbi_analysis_spark.operators import domains

    # src_dup: 4 docs, 2 exact dups (normalized: case/whitespace drift)
    # src_rep: repetitive word-salad docs      src_ok: clean prose
    rows = [
        (1, "src_dup", "alpha beta gamma delta"),
        (2, "src_dup", "Alpha  beta GAMMA delta"),   # dup of 1 normalized
        (3, "src_dup", "something else entirely here"),
        (4, "src_dup", "SOMETHING ELSE ENTIRELY HERE"),  # dup of 3
        (5, "src_rep", "spam spam spam spam spam spam"),
        (6, "src_rep", "ham ham ham ham ham ham ham"),
        (7, "src_ok", "the quick brown fox jumps over the lazy dog"),
        (8, "src_ok", "a wholly distinct and readable sentence is here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    rep = {r["source"]: r.asDict()
           for r in domains.source_quality_report(df).collect()}
    assert rep["src_dup"]["n_docs"] == 4
    assert rep["src_dup"]["dup_frac"] == 0.5          # 2 distinct of 4
    assert rep["src_ok"]["dup_frac"] == 0.0
    assert rep["src_rep"]["repetitive_frac"] == 1.0   # all mono-word docs
    assert rep["src_ok"]["repetitive_frac"] == 0.0
    assert rep["src_ok"]["mean_quality"] > rep["src_rep"]["mean_quality"]

    report_df = domains.source_quality_report(df)
    bl = domains.derive_source_blocklist(
        report_df, max_dup_frac=0.4, max_repetitive_frac=0.9)
    assert {r["source"] for r in bl.collect()} == {"src_dup", "src_rep"}

    kept = domains.filter_by_source_blocklist(df, bl)
    assert {r["doc_id"] for r in kept.collect()} == {7, 8}
    # the corpus side must not shuffle: blocklist joins broadcast
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_topk_per_group_pruned_matches_window(spark):
    """The two-phase form must equal the window form — rows AND ranks —
    across partition layouts (the exactness argument: every group's
    true top-k survives its partition's local top-k)."""
    import pytest as _pytest

    from ncbi_analysis_spark.operators.topk import topk_per_group_pruned

    rows = [(i % 5, i, (i * 37) % 101) for i in range(500)]
    for parts in (1, 3, 13):
        df = spark.createDataFrame(
            rows, "g long, id long, score long").repartition(parts)
        want = sorted(map(tuple, topk_per_group(
            df, ["g"], [F.desc("score"), F.asc("id")], 4).collect()))
        got = sorted(map(tuple, topk_per_group_pruned(
            df, ["g"], [("score", False), ("id", True)], 4).collect()))
        assert got == want, parts
    # sub-k groups keep everything; keep_rank=False drops the column
    small = spark.createDataFrame(
        [(0, 1, 9), (0, 2, 8), (1, 3, 7)], "g long, id long, score long")
    out = topk_per_group_pruned(
        small, ["g"], [("score", False), ("id", True)], 5,
        keep_rank=False).collect()
    assert len(out) == 3 and "rk" not in out[0].asDict()
    with _pytest.raises(ValueError, match="k=0"):
        topk_per_group_pruned(small, ["g"], [("score", False)], 0)
    with _pytest.raises(ValueError, match="order_by"):
        topk_per_group_pruned(small, ["g"], [], 2)


def test_topk_per_group_pruned_null_group_keys(spark):
    """NULL group keys form their own group in both phases
    (dropna=False in the pandas leg, standard grouping in the window)."""
    from ncbi_analysis_spark.operators.topk import topk_per_group_pruned

    df = spark.createDataFrame(
        [(None, 1, 5), (None, 2, 9), ("a", 3, 1)],
        "g string, id long, score long").repartition(2)
    want = {tuple(r) for r in topk_per_group(
        df, ["g"], [F.desc("score"), F.asc("id")], 1).collect()}
    got = {tuple(r) for r in topk_per_group_pruned(
        df, ["g"], [("score", False), ("id", True)], 1).collect()}
    assert got == want and len(got) == 2


def test_cc_labels_artifact_fold_and_crash_recovery(spark, tmp_path,
                                                    monkeypatch):
    """Persisted labels loop: write + two folds ≡ full CC; a concurrent
    fold is refused by the maintenance lock; fault injection — crash
    the fold at the k-th rename for every k, re-fold, and require the
    artifact to equal the never-crashed result (replay idempotence +
    swap recovery together)."""
    from ncbi_analysis_spark.operators import tombstones as ts
    from ncbi_analysis_spark.operators.components import (
        connected_components, fold_into_cc_labels, read_cc_labels,
        write_cc_labels)
    from ncbi_analysis_spark.sources import fsutil

    e1 = [(1, 2), (10, 11)]
    e2 = [(2, 3), (20, 21)]
    e3 = [(3, 10)]  # merges {1,2,3} with {10,11}
    df = lambda es: spark.createDataFrame(es, ["id_a", "id_b"])  # noqa: E731
    want = {r["id"]: r["component"]
            for r in connected_components(df(e1 + e2 + e3)).collect()}

    path = str(tmp_path / "labels")
    write_cc_labels(df(e1), path)
    fold_into_cc_labels(df(e2), path)
    fold_into_cc_labels(df(e3), path)
    got = {r["id"]: r["component"]
           for r in read_cc_labels(spark, path).collect()}
    assert got == want

    # lock enforcement
    import pytest as _pytest
    with ts.maintenance_lock(spark, path, "other"):
        with _pytest.raises(ts.ConcurrentMaintenanceError):
            fold_into_cc_labels(df([(50, 51)]), path)

    # marker guard
    with _pytest.raises(ValueError, match="not a write_cc_labels"):
        read_cc_labels(spark, str(tmp_path / "nope"))

    # fault injection on the versioned publish: crash at every k-th
    # delete (the only post-commit mutation) and once BEFORE commit
    # (uncommitted v{n+1} dir with no _SUCCESS); in every case the
    # artifact must read as a complete labeling — prior OR folded,
    # never partial — and break-lock + re-fold must converge
    from ncbi_analysis_spark.sources import fsutil as _fs

    real_delete = _fs.delete
    k = 0
    while True:
        p2 = str(tmp_path / f"labels_{k}")
        # seed v0 + v1 so the injected fold (publishing v2) actually
        # reaches the retire path — with the one-grace-version retire,
        # a fold over a single-version artifact deletes nothing
        write_cc_labels(df(e1), p2)
        fold_into_cc_labels(df(e2), p2)
        calls = {"n": 0}

        def crashing(spark_, p, recursive=True, _k=k):
            if calls["n"] >= _k:
                raise RuntimeError("injected crash")
            calls["n"] += 1
            return real_delete(spark_, p, recursive)

        monkeypatch.setattr(_fs, "delete", crashing)
        try:
            fold_into_cc_labels(df(e3), p2)
            crashed = False
        except RuntimeError:
            crashed = True
        finally:
            monkeypatch.setattr(_fs, "delete", real_delete)
        # WHATEVER happened, the artifact must read as a complete
        # labeling right now (reader-consistency: prior or folded)
        mid = {r["id"]: r["component"]
               for r in read_cc_labels(spark, p2).collect()}
        assert mid in ({r["id"]: r["component"] for r in
                        connected_components(df(e1 + e2)).collect()},
                       want)
        if not crashed:
            break
        ts.break_maintenance_lock(spark, p2)
        fold_into_cc_labels(df(e3), p2)  # recover + replay
        k += 1
    assert k >= 1  # the injection actually fired at least once
    for i in list(range(k)) + [k]:
        p2 = str(tmp_path / f"labels_{i}")
        got = {r["id"]: r["component"]
               for r in read_cc_labels(spark, p2).collect()}
        assert got == want, f"crash at delete {i} diverged"

    # uncommitted version (crash mid-write, before _SUCCESS): readers
    # ignore it, the next fold overwrites it
    p3 = str(tmp_path / "labels_uncommitted")
    write_cc_labels(df(e1 + e2), p3)
    fsutil.write_text(spark, f"{p3}/v1/part-bogus.parquet", "junk")
    got = {r["id"]: r["component"]
           for r in read_cc_labels(spark, p3).collect()}
    assert got == {r["id"]: r["component"] for r in
                   connected_components(df(e1 + e2)).collect()}
    fold_into_cc_labels(df(e3), p3)
    got = {r["id"]: r["component"]
           for r in read_cc_labels(spark, p3).collect()}
    assert got == want


def test_cc_labels_grace_version_and_rebuild(spark, tmp_path):
    """ADVICE r13 items: (a) a LAZY reader opened before a fold still
    collects after the fold commits (the retire keeps one grace
    version); (b) write_cc_labels into an EXISTING artifact lands at
    max_committed+1 so readers actually see the rebuild (a v0 write
    under v{n>0} would be silently invisible)."""
    from ncbi_analysis_spark.operators.components import (
        _cc_current_version, connected_components, fold_into_cc_labels,
        read_cc_labels, write_cc_labels)

    df = lambda es: spark.createDataFrame(es, ["id_a", "id_b"])  # noqa: E731
    path = str(tmp_path / "labels")
    write_cc_labels(df([(1, 2)]), path)
    fold_into_cc_labels(df([(2, 3)]), path)  # commits v1

    # (a) open lazily at v1, then fold again (commits v2, retires <1);
    # the pinned reader must still be collectable
    pinned = read_cc_labels(spark, path)
    fold_into_cc_labels(df([(3, 4)]), path)
    assert _cc_current_version(spark, path) == 2
    got = {r["id"]: r["component"] for r in pinned.collect()}
    want_v1 = {r["id"]: r["component"]
               for r in connected_components(df([(1, 2), (2, 3)])).collect()}
    assert got == want_v1

    # (b) rebuild into the existing artifact from scratch edges: the
    # new labeling must be what read_cc_labels returns (landed at v3,
    # not an invisible v0)
    write_cc_labels(df([(7, 8)]), path)
    assert _cc_current_version(spark, path) == 3
    got = {r["id"]: r["component"]
           for r in read_cc_labels(spark, path).collect()}
    assert got == {r["id"]: r["component"]
                   for r in connected_components(df([(7, 8)])).collect()}


def test_cc_labels_parted_fold_crash_and_grace(spark, tmp_path,
                                               monkeypatch):
    """Partition-versioned labels: write + folds ≡ full CC; a fold
    rewrites ONLY touched partitions (untouched version dirs stay
    referenced, byte-identical); replay is a manifest-level no-op;
    crash injected at EVERY rename leaves the artifact reading as a
    complete labeling (prior or folded) and break-lock + re-fold
    converges; a lazy reader opened before a fold survives it (grace
    manifest); n_parts drift and concurrent folds are refused."""
    import pytest as _pytest

    from ncbi_analysis_spark.operators import tombstones as ts
    from ncbi_analysis_spark.operators.components import (
        _ccp_current_manifest, connected_components,
        fold_into_cc_labels_parted, read_cc_labels_parted,
        write_cc_labels_parted)
    from ncbi_analysis_spark.sources import fsutil

    df = lambda es: spark.createDataFrame(es, ["id_a", "id_b"])  # noqa: E731
    e1 = [(1, 2), (10, 11), (20, 21)]
    e2 = [(2, 3)]
    e3 = [(3, 10), (30, 31)]
    want = {r["id"]: r["component"]
            for r in connected_components(df(e1 + e2 + e3)).collect()}

    p = str(tmp_path / "labels")
    write_cc_labels_parted(df(e1), p, n_parts=8)
    fold_into_cc_labels_parted(df(e2), p)
    _, m1 = _ccp_current_manifest(spark, p)
    pinned = read_cc_labels_parted(spark, p)  # lazy, pinned to m1
    fold_into_cc_labels_parted(df(e3), p)
    seq2, m2 = _ccp_current_manifest(spark, p)
    got = {r["id"]: r["component"]
           for r in read_cc_labels_parted(spark, p).collect()}
    assert got == want
    # grace: the pinned reader still collects after one fold
    want_m1 = {r["id"]: r["component"]
               for r in connected_components(df(e1 + e2)).collect()}
    assert {r["id"]: r["component"] for r in pinned.collect()} == want_m1
    # only touched partitions bumped
    untouched = [h for h, v in m1.items() if m2.get(h) == v]
    assert untouched, "some partition should be untouched by the fold"
    # replay: manifest seq unchanged
    fold_into_cc_labels_parted(df(e3), p)
    assert _ccp_current_manifest(spark, p)[0] == seq2

    # guards: n_parts drift on rebuild; concurrent fold
    with _pytest.raises(ValueError, match="n_parts"):
        write_cc_labels_parted(df(e1), p, n_parts=16)
    with ts.maintenance_lock(spark, p, "other"):
        with _pytest.raises(ts.ConcurrentMaintenanceError):
            fold_into_cc_labels_parted(df([(50, 51)]), p)
    with _pytest.raises(ValueError, match="not a write_cc_labels_parted"):
        read_cc_labels_parted(spark, str(tmp_path / "nope"))

    # fault injection: crash at the k-th rename of the fold (partition
    # moves AND the manifest commit) for every k; after every crash the
    # artifact must read as a complete labeling, and break-lock +
    # re-fold must converge to `want`
    real_rename = fsutil.rename
    k = 0
    while True:
        p2 = str(tmp_path / f"labels_{k}")
        write_cc_labels_parted(df(e1), p2, n_parts=8)
        fold_into_cc_labels_parted(df(e2), p2)
        calls = {"n": 0}

        def crashing(spark_, src, dst, _k=k):
            if calls["n"] >= _k:
                raise RuntimeError("injected crash")
            calls["n"] += 1
            return real_rename(spark_, src, dst)

        monkeypatch.setattr(fsutil, "rename", crashing)
        try:
            fold_into_cc_labels_parted(df(e3), p2)
            crashed = False
        except RuntimeError:
            crashed = True
        finally:
            monkeypatch.setattr(fsutil, "rename", real_rename)
        mid = {r["id"]: r["component"]
               for r in read_cc_labels_parted(spark, p2).collect()}
        assert mid in (want_m1, want), f"crash at rename {k}: torn read"
        if not crashed:
            break
        ts.break_maintenance_lock(spark, p2)
        fold_into_cc_labels_parted(df(e3), p2)
        assert {r["id"]: r["component"]
                for r in read_cc_labels_parted(spark, p2).collect()} == want
        k += 1
    assert k >= 2  # partition renames + manifest rename all exercised


def test_cc_labels_parted_shrinking_rebuild(spark, tmp_path):
    """ADVICE r14 (medium): rebuilding a parted artifact with a
    DISJOINT, SMALLER edge set must not union stale ids from
    partitions the new labeling no longer populates — _ccp_publish
    drops a touched-but-unstaged partition from the manifest instead
    of inheriting the previous version. The parted analogue of
    test_cc_labels_grace_version_and_rebuild case (b)."""
    from ncbi_analysis_spark.operators.components import (
        _ccp_current_manifest, connected_components,
        read_cc_labels_parted, write_cc_labels_parted)

    df = lambda es: spark.createDataFrame(es, ["id_a", "id_b"])  # noqa: E731
    # wide first build so many partitions hold rows
    e1 = [(i, i + 100) for i in range(40)]
    path = str(tmp_path / "labels")
    write_cc_labels_parted(df(e1), path, n_parts=8)
    _, m0 = _ccp_current_manifest(spark, path)
    assert len(m0) >= 2, "first build should populate several partitions"

    # shrinking rebuild: two ids, disjoint from e1
    write_cc_labels_parted(df([(1000, 1001)]), path, n_parts=8)
    seq1, m1 = _ccp_current_manifest(spark, path)
    got = {r["id"]: r["component"]
           for r in read_cc_labels_parted(spark, path).collect()}
    want = {r["id"]: r["component"]
            for r in connected_components(df([(1000, 1001)])).collect()}
    assert got == want, "stale ids served from unpublished partitions"
    # manifest must only list partitions the new labeling populates
    assert set(got) == {1000, 1001}
    assert len(m1) <= 2
    # a second rebuild retires the now-unreferenced stale version dirs:
    # the read stays correct and the manifest seq advances
    write_cc_labels_parted(df([(1000, 1001)]), path, n_parts=8)
    seq2, _ = _ccp_current_manifest(spark, path)
    assert seq2 == seq1 + 1
    got2 = {r["id"]: r["component"]
            for r in read_cc_labels_parted(spark, path).collect()}
    assert got2 == want
