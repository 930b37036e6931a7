"""Batch randomized property tests for the round-12 operator families
(quantile sketch, Count-Min, heavy hitters, priority sampling) against
from-scratch pure-Python models — the test_property_batch.py pattern:
seeded-random inputs, one Spark job, every row checked against a model
written here (not a re-import of engine code)."""

from __future__ import annotations

import hashlib
import random
from collections import Counter

from pyspark.sql import functions as F

from ncbi_analysis_spark.operators import heavy_hitters as hh
from ncbi_analysis_spark.operators import sketches as sk
from ncbi_analysis_spark.operators.scale import priority_sample


def _h52(s) -> int:
    """Python twin of the engine's md5-52bit hash (_kmv_h52)."""
    return int(hashlib.md5(str(s).encode()).hexdigest()[:13], 16)


def _h32(s: str, salt: str = "") -> int:
    """Python twin of functions.text._hash32."""
    return int(hashlib.md5((salt + s).encode()).hexdigest()[:8], 16)


def test_quantile_sketch_random_splits_merge_to_whole(spark):
    """Any split of the corpus, merged in any tree shape, equals the
    whole-corpus sketch — and both equal the Python bottom-k model."""
    rnd = random.Random(41)
    rows = [(i, rnd.randrange(-50, 1000)) for i in range(600)]
    d = spark.createDataFrame(rows, "id long, v long")
    k = 48
    whole = {(r["h"], r["v"])
             for r in sk.quantile_sketch(d, "v", "id", k=k).collect()}
    # python model: k smallest (h52(id), v)
    model = set(sorted(((_h52(i), v) for i, v in rows))[:k])
    assert whole == model
    # random 3-way split, two merge tree shapes
    part = [rnd.randrange(3) for _ in rows]
    frames = [
        spark.createDataFrame(
            [r for r, p in zip(rows, part) if p == j] or [(None, None)],
            "id long, v long").filter(F.col("id").isNotNull())
        for j in range(3)
    ]
    s0, s1, s2 = (sk.quantile_sketch(f, "v", "id", k=k) for f in frames)
    left = sk.quantile_sketch_merge(
        sk.quantile_sketch_merge(s0, s1, k), s2, k)
    right = sk.quantile_sketch_merge(
        s0, sk.quantile_sketch_merge(s1, s2, k), k)
    assert {(r["h"], r["v"]) for r in left.collect()} == whole
    assert {(r["h"], r["v"]) for r in right.collect()} == whole


def test_quantile_sketch_estimates_match_python_model(spark):
    rnd = random.Random(43)
    rows = [(i, rnd.randrange(0, 10_000)) for i in range(500)]
    d = spark.createDataFrame(rows, "id long, v long")
    k = 64
    s = sk.quantile_sketch(d, "v", "id", k=k)
    got = {r["q_ppm"]: (r["n_sample"], r["est_v"])
           for r in sk.quantile_sketch_estimate(
               s, [0.1, 0.5, 0.77, 1.0]).collect()}
    sample = sorted(
        sorted(((_h52(i), v) for i, v in rows))[:k],
        key=lambda hv: (hv[1], hv[0]))
    n = len(sample)
    for q in (0.1, 0.5, 0.77, 1.0):
        q_ppm = int(round(q * 1_000_000))
        idx = (q_ppm * n + 999_999) // 1_000_000  # ceil in ppm ints
        assert got[q_ppm] == (n, sample[idx - 1][1]), q


def test_cm_sketch_matches_python_registers(spark):
    """Register table == the Python dict model; estimates == the
    min-over-rows of the model (never under the true count)."""
    rnd = random.Random(47)
    toks = [f"t{rnd.randrange(60)}" for _ in range(2000)]
    d = spark.createDataFrame([(t,) for t in toks], "g string").repartition(7)
    W, D = 128, 3
    got = {(r["row"], r["bucket"]): r["cnt"]
           for r in hh.cm_sketch(d, "g", W, D).collect()}
    model: dict = {}
    for t in toks:
        for i in range(D):
            key = (i, _h32(t, f"cm{i}|") % W)
            model[key] = model.get(key, 0) + 1
    assert got == model
    true = Counter(toks)
    items = spark.createDataFrame(
        [(t,) for t in sorted(true)], "g string")
    est = {r["item"]: r["est_cnt"]
           for r in hh.cm_estimate(
               hh.cm_sketch(d, "g", W, D), items, "g", W, D).collect()}
    for t, c in true.items():
        want = min(model[(i, _h32(t, f"cm{i}|") % W)] for i in range(D))
        assert est[t] == want >= c, t


def test_heavy_hitters_random_zipf_matches_counter(spark):
    """Across random partition layouts, top-n by exact recount equals
    the Python Counter top-n under the same (count desc, token asc)
    order whenever the candidate guarantee holds (m sized generously)."""
    rnd = random.Random(53)
    toks = []
    for r in range(40):
        toks.extend([f"tok{r:02d}"] * (1 + (40 - r) ** 2 // 4))
    rnd.shuffle(toks)
    true = Counter(toks)
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
    for parts in (2, 9):
        d = spark.createDataFrame(
            [(t,) for t in toks], "g string").repartition(parts)
        got = [(r["token"], r["cnt"])
               for r in hh.heavy_hitters_topn(d, "g", n=8, m=64).collect()]
        assert got == want, parts


def test_priority_sample_matches_python_model(spark):
    """Membership, tau and est_weight bit-equal a from-scratch Python
    priority-sampling model with the same md5-uniform."""
    rnd = random.Random(59)
    rows = [(i, rnd.randrange(1, 500)) for i in range(300)]
    d = spark.createDataFrame(rows, "id long, w long").repartition(5)
    k = 40
    got = {r["id"]: (r["est_weight"], r["tau"])
           for r in priority_sample(d, "w", k, "id", salt="pp").collect()}
    pri = []
    for i, w in rows:
        u = (_h52(f"pp|{i}") + 1) / float(1 << 52)
        pri.append((float(w) / u, i, w))
    pri.sort(key=lambda t: (-t[0], t[1]))
    tau = pri[k][0] if len(pri) > k else 0.0
    want = {i: (max(float(w), tau), tau) for _, i, w in pri[:k]}
    assert got == want


def test_priority_sample_inclusion_probability(spark):
    """Frequentist check of the design: over many independent salts,
    a heavy item's inclusion rate approaches min(1, w/tau) and exceeds
    a light item's."""
    rows = [(i, 1) for i in range(200)] + [(999, 200)]
    d = spark.createDataFrame(rows, "id long, w long")
    heavy = light = 0
    for t in range(25):
        ids = {r["id"] for r in
               priority_sample(d, "w", 20, "id", salt=f"s{t}").collect()}
        heavy += 999 in ids
        light += 0 in ids
    # w=200 vs total 400, k=20 -> tau ~ 20, heavy included ~always
    assert heavy >= 22
    assert light <= 10
