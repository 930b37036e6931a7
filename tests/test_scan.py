"""Flagship similarity-scan pipeline tests (SURVEY.md §3.1, §7.3).

Validated two ways: against a brute-force single-machine scan using the
(fuzz-verified) kernels, and for chunking invariance — results must not
depend on chunk size (the overlap layout owns every offset exactly once).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ncbi_analysis_spark.plans.similarity_scan import chunk_genome, similarity_scan
from ncbi_analysis_spark.similarity.scorers import (
    consistency_score,
    direct_score,
    weighted_similarity,
)

random.seed(11)
GENOME = "".join(random.choice("acgt") for _ in range(3000))
QUERIES = [("q1", "acgtacgtta"), ("q2", "ttgacagcta")]
WEIGHTS = {"direct": 1.0, "consistency": 2.0}
PATIENCE = 2
DIST = 3
TOPK = 5


def revcomp_py(s: str) -> str:
    return s[::-1].translate(str.maketrans("acgt", "tgca"))


def brute_force():
    """Reference-shaped scan: both strands, all offsets, drop <=0, W2
    strict-dominance suppression, top-k by weighted desc.

    Suppression radius is DIST - 1: the reference deque
    (update_candidate_list, gene_similarity_match.py:262-265) pops
    entries at distance >= candidate_distance BEFORE comparing, so only
    pairs at distance <= candidate_distance - 1 interact."""
    out = {}
    for name, gene in QUERIES:
        cands = []
        for strand, db in (("+", GENOME), ("-", revcomp_py(GENOME))):
            strand_cands = []
            for off in range(len(db) - len(gene) + 1):
                win = db[off:off + len(gene)]
                w, _ = weighted_similarity(gene, win, WEIGHTS, patience=PATIENCE)
                if w > 0:
                    strand_cands.append((off, w))
            for off, w in strand_cands:
                dominated = any(
                    w2 > w for o2, w2 in strand_cands if abs(o2 - off) < DIST
                )
                if not dominated:
                    cands.append((strand, off, w))
        cands.sort(key=lambda c: (-c[2], c[0], c[1]))
        out[name] = cands[:TOPK]
    return out


@pytest.fixture(scope="module")
def scan_result(spark):
    genome_df = spark.createDataFrame([("acc", GENOME)], ["accession", "seq"])
    queries_df = spark.createDataFrame(QUERIES, ["name", "gene"])
    return similarity_scan(
        genome_df, queries_df, WEIGHTS, top_k=TOPK,
        candidate_distance=DIST, patience=PATIENCE, chunk_size=512,
    ).collect()


def test_scan_matches_brute_force(spark, scan_result):
    want = brute_force()
    got = {}
    for r in scan_result:
        got.setdefault(r["name"], []).append(
            (r["strand"], r["offset"], r["weighted_similarity"])
        )
    for name in got:
        got[name].sort(key=lambda c: (-c[2], c[0], c[1]))
    assert set(got) == set(want)
    for name in want:
        assert got[name] == want[name], name


def test_scan_chunk_invariance(spark, scan_result):
    genome_df = spark.createDataFrame([("acc", GENOME)], ["accession", "seq"])
    queries_df = spark.createDataFrame(QUERIES, ["name", "gene"])
    one_chunk = similarity_scan(
        genome_df, queries_df, WEIGHTS, top_k=TOPK,
        candidate_distance=DIST, patience=PATIENCE, chunk_size=100_000,
    ).collect()
    key = lambda rows: sorted(  # noqa: E731
        (r["name"], r["strand"], r["offset"], round(r["weighted_similarity"], 9))
        for r in rows
    )
    assert key(one_chunk) == key(scan_result)


def test_scan_coordinates(spark, scan_result):
    L = len(QUERIES[0][1])
    n = len(GENOME)
    for r in scan_result:
        if r["strand"] == "+":
            assert r["start"] == r["offset"] + 1 and r["end"] == r["offset"] + L
            assert r["start"] <= r["end"]
        else:
            assert r["start"] == n - r["offset"] and r["end"] == n - r["offset"] - L + 1
            assert r["start"] > r["end"]  # strand encoded by coordinate order


def test_chunk_genome_covers_everything(spark):
    genome_df = spark.createDataFrame([("acc", GENOME)], ["accession", "seq"])
    chunks = chunk_genome(genome_df, 500, 9, both_strands=False).collect()
    assert all(len(c["chunk_seq"]) <= 509 for c in chunks)
    rebuilt = "".join(
        c["chunk_seq"][:500] for c in sorted(chunks, key=lambda c: c["base_offset"])
    )
    assert rebuilt == GENOME


def test_scan_textedit_weights_match_brute_force(spark):
    """F5 in the pipeline: text-edit DP with mismatch limit, mixed with
    direct, must match a brute-force scan using the same kernels."""
    genome = GENOME[:600]
    weights = {"direct": 1.0, "text_edit": 1.0}
    g_df = spark.createDataFrame([("acc", genome)], ["accession", "seq"])
    q_df = spark.createDataFrame(QUERIES[:1], ["name", "gene"])
    got = similarity_scan(
        g_df, q_df, weights, top_k=4, candidate_distance=DIST,
        patience=PATIENCE, continuous_mismatch_limit=3, chunk_size=256,
    ).collect()

    name, gene = QUERIES[0]
    want = []
    for strand, db in (("+", genome), ("-", revcomp_py(genome))):
        cands = []
        for off in range(len(db) - len(gene) + 1):
            w, _ = weighted_similarity(
                gene, db[off:off + len(gene)], weights,
                continuous_mismatch_limit=3,
            )
            if w > 0:
                cands.append((off, w))
        for off, w in cands:
            if not any(w2 > w for o2, w2 in cands if abs(o2 - off) < DIST):
                want.append((strand, off, w))
    want.sort(key=lambda c: (-c[2], c[0], c[1]))
    got_t = sorted(
        ((r["strand"], r["offset"], r["weighted_similarity"]) for r in got),
        key=lambda c: (-c[2], c[0], c[1]),
    )
    assert got_t == want[:4]


def test_scan_ascending_all_positive_is_empty(spark):
    """W4 parity: OrderType.Increment negates the score BEFORE the deque
    (gene_similarity_match.py:188-189), and candidates whose (negated)
    score is <= 0 are marked should_ignore — so with all-positive weights
    the reference emits nothing, and so must we."""
    genome_df = spark.createDataFrame([("acc", GENOME[:800])], ["accession", "seq"])
    queries_df = spark.createDataFrame(QUERIES[:1], ["name", "gene"])
    asc = similarity_scan(
        genome_df, queries_df, WEIGHTS, top_k=3, candidate_distance=DIST,
        patience=PATIENCE, chunk_size=512, ascending=True,
    ).collect()
    assert asc == []


def test_scan_ascending_negate_before_suppress(spark):
    """W4: ascending=True must suppress on the NEGATED score (keep local
    minima of the raw score), not merely flip the top-k ordering. Uses a
    mixed-sign weight set (total weight -1, as the reference's
    count_similarity allows) so raw scores take both signs:
    w = (direct - 2*cons) / -1 = 2*cons - direct."""
    weights = {"direct": 1.0, "consistency": -2.0}
    genome = GENOME[:800]
    genome_df = spark.createDataFrame([("acc", genome)], ["accession", "seq"])
    queries_df = spark.createDataFrame(QUERIES[:1], ["name", "gene"])
    topk = 6
    got = similarity_scan(
        genome_df, queries_df, weights, top_k=topk, candidate_distance=DIST,
        patience=PATIENCE, chunk_size=256, ascending=True,
    ).collect()

    name, gene = QUERIES[0]
    want = []
    for strand, db in (("+", genome), ("-", revcomp_py(genome))):
        cands = []
        for off in range(len(db) - len(gene) + 1):
            w, _ = weighted_similarity(gene, db[off:off + len(gene)], weights,
                                       patience=PATIENCE)
            if -w > 0:  # reference ignores negated score <= 0
                cands.append((off, w))
        for off, w in cands:
            # suppression on the negated score, radius DIST - 1
            if not any(-w2 > -w for o2, w2 in cands if abs(o2 - off) < DIST):
                want.append((strand, off, w))
    want.sort(key=lambda c: (c[2], c[0], c[1]))  # raw score ASC
    got_t = sorted(
        ((r["strand"], r["offset"], r["weighted_similarity"]) for r in got),
        key=lambda c: (c[2], c[0], c[1]),
    )
    assert got_t == want[:topk]


def test_scan_chunk_invariance_fuzz(spark):
    """Chunk-boundary regression (round-2 advice): pre-suppression must
    make the same keep/drop decision a single-chunk scan would — a
    candidate near a chunk edge can be dominated by, or dominate, a
    neighbor in the adjacent chunk. The halo makes this exact; many tiny
    chunks maximize boundary pressure."""
    rnd = random.Random(7)
    queries_df = spark.createDataFrame(QUERIES, ["name", "gene"])
    genome = "".join(rnd.choice("acgt") for _ in range(900))
    genome_df = spark.createDataFrame([("acc", genome)], ["accession", "seq"])

    def run(csize):
        out = similarity_scan(
            genome_df, queries_df, WEIGHTS, top_k=100_000,
            candidate_distance=5, patience=PATIENCE, chunk_size=csize,
        )
        return sorted(
            (r["name"], r["strand"], r["offset"],
             round(r["weighted_similarity"], 9))
            for r in out.collect()
        )

    whole = run(10**6)
    for csize in (37, 64, 256):
        assert run(csize) == whole, f"chunk_size={csize} diverges"


def test_fast_skip_prune_keeps_results(spark):
    genome_df = spark.createDataFrame([("acc", GENOME)], ["accession", "seq"])
    queries_df = spark.createDataFrame(QUERIES, ["name", "gene"])
    pruned = similarity_scan(
        genome_df, queries_df, WEIGHTS, top_k=TOPK, candidate_distance=DIST,
        patience=PATIENCE, chunk_size=512, fast_skip_cut=3,
    ).collect()
    # fast-skip at a low cut must not change the top-k (scores there are high)
    full = similarity_scan(
        genome_df, queries_df, WEIGHTS, top_k=TOPK, candidate_distance=DIST,
        patience=PATIENCE, chunk_size=512,
    ).collect()
    key = lambda rows: sorted((r["name"], r["strand"], r["offset"]) for r in rows)  # noqa: E731
    assert key(pruned) == key(full)


def test_scan_multi_accession_is_per_accession_union(spark):
    """Scanning two genomes in one call must equal the union of scanning
    each alone (per-accession chunking, suppression, and coordinate
    mapping never mix accessions). Top-k is per (query, accession) rank
    here, so use a k larger than any single result set."""
    import random

    rnd = random.Random(42)
    g1 = "".join(rnd.choice("acgt") for _ in range(700))
    g2 = "".join(rnd.choice("acgt") for _ in range(1100))
    queries_df = spark.createDataFrame(QUERIES, ["name", "gene"])

    def run(rows):
        df = spark.createDataFrame(rows, ["accession", "seq"])
        out = similarity_scan(
            df, queries_df, WEIGHTS, top_k=100000,
            candidate_distance=DIST, patience=PATIENCE, chunk_size=256,
        )
        return {
            (r["name"], r["accession"], r["strand"], r["offset"],
             r["start"], r["end"], r["weighted_similarity"])
            for r in out.collect()
        }

    both = run([("g1", g1), ("g2", g2)])
    single = run([("g1", g1)]) | run([("g2", g2)])
    assert both == single


def test_scan_full_weight_mix_matches_brute_force(spark):
    """The reference flagship mix — all four scorers with pattern
    conditions and the text-edit abort — through the full pipeline, now
    running on the batched kernels (no per-offset Python)."""
    from ncbi_analysis_spark.similarity.pattern import MatchPattern, pattern_score

    genome = GENOME[:700]
    weights = {"direct": 1.0, "consistency": 1.0, "text_edit": 1.0, "pattern": 1.0}
    conds = {"must": [{"offset": 0, "length": 3}, {"offset": -3, "length": 3}],
             "optional": [{"offset": 3, "length": 1}]}
    g_df = spark.createDataFrame([("acc", genome)], ["accession", "seq"])
    q_df = spark.createDataFrame(QUERIES, ["name", "gene"])
    topk = 6
    got = similarity_scan(
        g_df, q_df, weights, top_k=topk, candidate_distance=DIST,
        patience=PATIENCE, continuous_mismatch_limit=4,
        pattern_conditions=conds, chunk_size=128,
    ).collect()

    want = {}
    for name, gene in QUERIES:
        pat = MatchPattern(gene, conds)
        cands_all = []
        for strand, db in (("+", genome), ("-", revcomp_py(genome))):
            cands = []
            for off in range(len(db) - len(gene) + 1):
                w, _ = weighted_similarity(
                    gene, db[off:off + len(gene)], weights, patience=PATIENCE,
                    continuous_mismatch_limit=4, pattern=pat,
                )
                if w > 0:
                    cands.append((off, w))
            for off, w in cands:
                if not any(w2 > w for o2, w2 in cands if abs(o2 - off) < DIST):
                    cands_all.append((strand, off, w))
        cands_all.sort(key=lambda c: (-c[2], c[0], c[1]))
        want[name] = cands_all[:topk]

    got_m = {}
    for r in got:
        got_m.setdefault(r["name"], []).append(
            (r["strand"], r["offset"], r["weighted_similarity"])
        )
    for name in got_m:
        got_m[name].sort(key=lambda c: (-c[2], c[0], c[1]))
    assert set(got_m) == {n for n, g in QUERIES if want[n]} or set(got_m) <= set(want)
    for name in want:
        assert got_m.get(name, []) == want[name], name


def test_chunk_genome_from_windows_matches_single_row(spark):
    """The pre-split reader path must produce bit-identical chunk rows to
    chunk_genome on the assembled sequence — including reverse-strand
    remapping, halo leads and the ragged last window/chunk."""
    from ncbi_analysis_spark.plans.similarity_scan import (
        chunk_genome_from_windows,
        split_genome_windows,
    )

    genome_df = spark.createDataFrame(
        [("a1", GENOME), ("a2", GENOME[:733])], ["accession", "seq"]
    )
    for window_size in (100, 257):
        windows = split_genome_windows(genome_df, window_size)
        for csize, overlap, halo in ((512, 9, 4), (200, 5, 0), (4096, 9, 2)):
            want = sorted(
                (r["accession"], r["strand"], r["chunk_id"], r["base_offset"],
                 r["lead_"], r["chunk_seq"])
                for r in chunk_genome(genome_df, csize, overlap, halo=halo).collect()
            )
            got = sorted(
                (r["accession"], r["strand"], r["chunk_id"], r["base_offset"],
                 r["lead_"], r["chunk_seq"])
                for r in chunk_genome_from_windows(
                    windows, csize, overlap, halo=halo).collect()
            )
            assert got == want, (window_size, csize, overlap, halo)


def test_scan_windowed_matches_single_row_path(spark):
    """Verdict ask #3 done-criterion: scan results on a pre-split
    accession are hash-identical to the single-row path at two chunk
    sizes."""
    from ncbi_analysis_spark.plans.similarity_scan import (
        similarity_scan_windowed,
        split_genome_windows,
    )

    genome_df = spark.createDataFrame([("acc", GENOME)], ["accession", "seq"])
    queries_df = spark.createDataFrame(QUERIES, ["name", "gene"])
    windows = split_genome_windows(genome_df, 311)

    def key(rows):
        return sorted(
            (r["name"], r["accession"], r["strand"], r["offset"],
             r["start"], r["end"], round(r["weighted_similarity"], 9))
            for r in rows
        )

    for csize in (256, 1024):
        want = similarity_scan(
            genome_df, queries_df, WEIGHTS, top_k=100_000,
            candidate_distance=DIST, patience=PATIENCE, chunk_size=csize,
        ).collect()
        got = similarity_scan_windowed(
            windows, queries_df, WEIGHTS, top_k=100_000,
            candidate_distance=DIST, patience=PATIENCE, chunk_size=csize,
        ).collect()
        assert key(got) == key(want), csize


def test_scan_full_mix_with_floor_matches_brute_force(spark):
    """score_floor > 0 with ALL four kernels: the staged branch-and-bound
    (pat_max bound, then exact-cheap-scores refined bound before the DP)
    must drop nothing the brute force keeps."""
    from ncbi_analysis_spark.similarity.pattern import MatchPattern

    genome = GENOME[:900]
    weights = {"direct": 1.0, "consistency": 1.0, "text_edit": 1.0, "pattern": 1.0}
    conds = {"must": [{"offset": 0, "length": 2}],
             "optional": [{"offset": -2, "length": 2}]}
    floor = 6.0
    g_df = spark.createDataFrame([("acc", genome)], ["accession", "seq"])
    q_df = spark.createDataFrame(QUERIES, ["name", "gene"])
    got = similarity_scan(
        g_df, q_df, weights, top_k=100_000, candidate_distance=DIST,
        patience=PATIENCE, continuous_mismatch_limit=4,
        pattern_conditions=conds, chunk_size=192, score_floor=floor,
    ).collect()

    want = []
    for name, gene in QUERIES:
        pat = MatchPattern(gene, conds)
        for strand, db in (("+", genome), ("-", revcomp_py(genome))):
            cands = []
            for off in range(len(db) - len(gene) + 1):
                w, _ = weighted_similarity(
                    gene, db[off:off + len(gene)], weights, patience=PATIENCE,
                    continuous_mismatch_limit=4, pattern=pat,
                )
                if w > floor:
                    cands.append((off, w))
            for off, w in cands:
                if not any(w2 > w for o2, w2 in cands if abs(o2 - off) < DIST):
                    want.append((name, strand, off, round(w, 9)))
    got_t = sorted((r["name"], r["strand"], r["offset"],
                    round(r["weighted_similarity"], 9)) for r in got)
    assert got_t == sorted(want)


def test_scan_ascending_with_textedit_weights(spark):
    """W4 polarity through the unified batched path: mixed-sign weights
    including text_edit, ascending=True — suppression must act on the
    negated score with the DP values included."""
    weights = {"direct": 1.0, "text_edit": -2.0}
    genome = GENOME[:500]
    g_df = spark.createDataFrame([("acc", genome)], ["accession", "seq"])
    q_df = spark.createDataFrame(QUERIES[:1], ["name", "gene"])
    topk = 5
    got = similarity_scan(
        g_df, q_df, weights, top_k=topk, candidate_distance=DIST,
        patience=PATIENCE, continuous_mismatch_limit=3, chunk_size=128,
        ascending=True,
    ).collect()

    name, gene = QUERIES[0]
    want = []
    for strand, db in (("+", genome), ("-", revcomp_py(genome))):
        cands = []
        for off in range(len(db) - len(gene) + 1):
            w, _ = weighted_similarity(gene, db[off:off + len(gene)], weights,
                                       continuous_mismatch_limit=3)
            if -w > 0:
                cands.append((off, w))
        for off, w in cands:
            if not any(-w2 > -w for o2, w2 in cands if abs(o2 - off) < DIST):
                want.append((strand, off, w))
    want.sort(key=lambda c: (c[2], c[0], c[1]))
    got_t = sorted(((r["strand"], r["offset"], r["weighted_similarity"])
                    for r in got), key=lambda c: (c[2], c[0], c[1]))
    assert got_t == want[:topk]
