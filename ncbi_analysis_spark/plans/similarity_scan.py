"""Flagship similarity-scan pipeline (SURVEY.md §3.1, §7.3).

The reference pipeline (src/1-run_gene_similarity_match.py ->
src/analysis/gene_similarity_match.py): every query gene x every genome
offset x both strands, scored with a weighted similarity mix, locally
deduplicated (sliding deque), per-gene top-k, then location-annotated.
Parallelism there is 2 processes x 32 threads on one box.

Spark shape (one declarative plan, no intermediate text files):

  genome -> revcomp union (strand column)
         -> fixed-size chunks with (L_max - 1) overlap   [chunk_genome]
         -> cross join broadcast(query genes)
         -> mapInPandas scorer (numpy fast-skip + kernels) -> candidates
         -> W2 local-max suppression (window)             [operators.suppression]
         -> W1 per-gene top-k (window)                    [operators.topk]

Scale: chunks are the unit of parallelism — a 100 TB genome corpus scans
as (total_bases / chunk_size) independent tasks; the chunk overlap
guarantees every offset's full window lives in exactly one chunk (offsets
in the overlap tail are owned by the next chunk). The scorer is the only
Python stage (Arrow-batched); everything before/after is codegen + two
keyed shuffles (suppression, top-k).

Suppression parity notes (reference update_candidate_list,
src/analysis/gene_similarity_match.py:259-277):

* The deque pops entries at distance >= candidate_distance BEFORE
  comparing, so two candidates only ever suppress each other at distance
  <= candidate_distance - 1. All suppression windows here (chunk-local
  pre-suppression, W2) therefore use radius candidate_distance - 1.
* OrderType.Increment (ascending=True) negates the weighted score BEFORE
  the deque (gene_similarity_match.py:188-189), so suppression keeps
  local minima of the raw score and candidates with raw score >= 0 are
  all marked should_ignore (negated value <= 0). The raw score is
  restored for output (gene_similarity_match.py:108-110).
* Chunk-local pre-suppression is exact: each chunk scores a ``halo`` of
  radius (candidate_distance - 1) beyond its owned offsets on both
  sides, so every owned offset sees its complete +-r neighborhood and
  the local-max decision equals the global one — results are
  chunk-size-invariant by construction (the halo candidates themselves
  are emitted only by the chunk that owns them).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ncbi_analysis_spark.functions.sequence import encode_ascii_checked, revcomp
from ncbi_analysis_spark.operators.suppression import local_max_suppress
from ncbi_analysis_spark.operators.topk import topk_per_group

CANDIDATE_SCHEMA = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("accession", T.StringType()),
    T.StructField("strand", T.StringType()),
    T.StructField("offset", T.LongType()),        # 0-based, strand coords
    T.StructField("weighted_similarity", T.DoubleType()),
    T.StructField("direct_similarity", T.DoubleType()),
    T.StructField("consistency_similarity", T.DoubleType()),
    T.StructField("textedit_similarity", T.DoubleType()),
    T.StructField("pattern_similarity", T.DoubleType()),
])


def chunk_genome(genome_df: DataFrame, chunk_size: int, overlap: int,
                 both_strands: bool = True, halo: int = 0) -> DataFrame:
    """(accession, strand, base_offset, lead_, chunk_seq) — chunks of
    ``chunk_size`` plus an ``overlap`` tail so windows starting in
    [base_offset, base_offset + chunk_size) are fully contained.

    ``halo`` > 0 additionally extends each chunk by ``halo`` scoreable
    offsets on BOTH sides of the owned range (``lead_`` = number of
    leading halo offsets actually available, < halo near offset 0). The
    halo lets the scorer make exact local-suppression decisions for
    owned offsets without seeing other chunks; halo offsets are never
    emitted by this chunk.

    The reverse strand is the reverse complement sequence, chunked the
    same way in its own coordinate system (reference scans the revcomp
    database, src/analysis/gene_similarity_match.py:58-66).

    Scale ceiling: each input row holds one accession's sequence as a
    single JVM string, so an accession is bounded by the JVM's 2 GiB
    string/array limit (and practically by executor memory during the
    substring explode). Real genomes are far below this (~250 MB for the
    largest human chromosome); for longer single sequences use the
    pre-split path — split_genome_windows /
    chunk_genome_from_windows / similarity_scan_windowed below — whose
    stages are bounded by chunk_size, never accession length.
    """
    # Slice chunks from the BYTE form of the sequence: substr on a JVM
    # string is O(position) (UTF8String counts codepoints from offset 0
    # to find a char index), so string-slicing chunk i costs O(i x K)
    # and whole-genome chunking goes quadratic — measured 2.5s -> 22s
    # for a 4x genome (4 -> 16 Mbp). Byte substr is an O(len) array
    # slice at a direct offset. The genomic alphabet is ASCII, so byte
    # and char indices coincide; the encode happens ONCE per strand row
    # (below the explode, so it reaches the generator as a materialized
    # attribute, like the revcomp).
    strands = genome_df.select(
        "accession", F.lit("+").alias("strand"),
        encode_ascii_checked(F.col("seq"), "accession").alias("seq_b"))
    if both_strands:
        strands = strands.unionByName(
            genome_df.select(
                "accession", F.lit("-").alias("strand"),
                encode_ascii_checked(revcomp(F.col("seq")), "accession").alias("seq_b"))
        )
    n_chunks = F.greatest(F.ceil(F.length("seq_b") / chunk_size), F.lit(1)).cast("int")
    return (
        strands
        .select(
            "accession", "strand", "seq_b",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .withColumn("base_offset", F.col("chunk_id").cast("long") * chunk_size)
        .withColumn("lead_",
                    F.least(F.col("base_offset"), F.lit(halo)).cast("int"))
        .withColumn(
            "chunk_seq",
            F.decode(F.col("seq_b").substr(
                (F.col("base_offset") - F.col("lead_") + 1).cast("int"),
                (F.col("lead_") + chunk_size + halo + overlap).cast("int"),
            ), "UTF-8"),
        )
        .drop("seq_b")
        .filter(F.length("chunk_seq") > 0)
    )


def _np_window_view(chunk: np.ndarray, L: int) -> np.ndarray:
    """(n_offsets x L) sliding view over a uint8 char array."""
    n = len(chunk) - L + 1
    if n <= 0:
        return np.empty((0, L), dtype=np.uint8)
    return np.lib.stride_tricks.sliding_window_view(chunk, L)[:n]


def _match_matrix(gene_arr: np.ndarray, windows: np.ndarray) -> np.ndarray:
    """Bool matrix of the c->t char rule (F4) across all offsets."""
    eq = windows == gene_arr
    ct = (gene_arr == ord("c")) & (windows == ord("t"))
    return eq | ct


def _consistency_vec(mm: np.ndarray, patience: int) -> np.ndarray:
    """Consistency scores for every offset at once.

    The reference's patience merge (bridge adjacent runs while the merged
    span carries <= patience mismatches,
    src/analysis/similarities/consistency_similarity.py:35-64) is
    equivalent to: max number of matches in any window containing
    <= patience mismatches (each bridged gap costs >= 1 mismatch, so
    <= patience mismatches implies <= patience+1 runs automatically).
    Computed as an amortized two-pointer sweep vectorized across offsets
    — O(L) numpy passes instead of a Python loop per offset.
    Fuzz-verified against the exact kernel (which itself is fuzz-verified
    against the reference).
    """
    n, L = mm.shape
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    rows = np.arange(n)
    s = np.zeros(n, dtype=np.int64)       # window start per offset
    zeros_in = np.zeros(n, dtype=np.int64)
    ones_in = np.zeros(n, dtype=np.int64)
    best = np.zeros(n, dtype=np.int64)
    for e in range(L):
        col = mm[:, e]
        ones_in += col
        zeros_in += ~col
        while True:
            over = zeros_in > patience
            if not over.any():
                break
            idx = rows[over]
            head = mm[idx, s[idx]]
            ones_in[idx] -= head
            zeros_in[idx] -= ~head
            s[idx] += 1
        np.maximum(best, ones_in, out=best)
    return best.astype(np.float64)


def scan_candidates(
    chunks_df: DataFrame,
    queries_df: DataFrame,
    weights: dict[str, float],
    patience: int = 2,
    continuous_mismatch_limit: int | None = None,
    pattern_conditions: dict | None = None,
    fast_skip_cut: float | None = None,
    score_floor: float = 0.0,
    suppress_distance: int | None = None,
    ascending: bool = False,
) -> DataFrame:
    """Score every (chunk, query) pair at every offset; emit candidates
    whose SIGNED score (negated when ``ascending``, mirroring the
    reference's OrderType.Increment negate-before-suppress at
    gene_similarity_match.py:188-189) exceeds ``score_floor``.

    Python stage strategy (mirrors the reference's pruning order,
    src/analysis/gene_similarity_match.py:179-201,280-291):
    fast_skip histogram filter (vectorized) -> direct score (vectorized
    match matrix) -> exact consistency / text-edit / pattern kernels only
    at surviving offsets.

    ``suppress_distance`` is the suppression RADIUS (use
    candidate_distance - 1 for reference deque parity) and requires the
    chunks to carry a halo of at least that radius (chunk_genome
    ``halo=``) so the chunk-local suppression decision is exact.
    """
    from ncbi_analysis_spark.similarity.pattern import (
        MatchPattern,
        pattern_scores_chunk,
    )
    from ncbi_analysis_spark.similarity.scorers import text_edit_scores_batch

    w_direct = float(weights.get("direct", 0.0))
    w_cons = float(weights.get("consistency", 0.0))
    w_te = float(weights.get("text_edit", 0.0))
    w_pat = float(weights.get("pattern", 0.0))
    total_w = w_direct + w_cons + w_te + w_pat
    if total_w == 0:
        raise ValueError("similarity weights must not sum to zero")
    sgn = -1.0 if ascending else 1.0
    # the branch-and-bound prunes' upper bounds are only valid for
    # non-negative weights in maximizing (descending) mode; the pattern
    # score is bounded by its best case (must + all optional scores), so
    # w_pat > 0 no longer disables pruning
    can_bound = (not ascending and w_direct >= 0 and w_cons >= 0
                 and w_te >= 0 and w_pat >= 0 and total_w > 0)

    # one compiled pattern per distinct gene per executor — bounded by
    # the broadcast query-set size (genes ship as a broadcast side); a
    # future million-query caller inherits that bound, not an unbounded
    # per-row growth
    pat_cache: dict[str, MatchPattern] = {}

    def score_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows: list[tuple] = []
            has_lead = "lead_" in pdf.columns
            for row in pdf.itertuples(index=False):
                gene = row.gene
                L = len(gene)
                chunk = row.chunk_seq
                lead = int(row.lead_) if has_lead else 0
                limit = len(chunk) - L + 1
                # offsets in the overlap tail belong to the next chunk;
                # local offsets [lead, owned_end) are owned here
                owned_end = min(limit, lead + int(row.chunk_size_))
                if owned_end <= lead:
                    continue
                if suppress_distance is not None:
                    # score the halo too so the local-suppression decision
                    # for every owned offset sees its full +-d window
                    lo = 0
                    hi = min(limit, owned_end + int(suppress_distance))
                else:
                    lo, hi = lead, owned_end
                chunk_a = np.frombuffer(chunk.encode("ascii"), dtype=np.uint8)
                gene_a = np.frombuffer(gene.encode("ascii"), dtype=np.uint8)
                windows = _np_window_view(chunk_a, L)[lo:hi]

                mm = _match_matrix(gene_a, windows)
                direct = mm.sum(axis=1).astype(np.float64)

                pat = None
                pat_max = 0.0
                if w_pat > 0 and pattern_conditions is not None:
                    pat = pat_cache.get(gene)
                    if pat is None:
                        pat = MatchPattern(gene, pattern_conditions)
                        pat_cache[gene] = pat
                    pat_max = float(pat.must_score) + sum(
                        max(float(s), 0.0) for _p, s in pat.option_patterns
                    )
                keep = np.ones(len(mm), dtype=bool)
                if score_floor > 0 and can_bound:
                    # sound branch-and-bound prune: consistency <= direct,
                    # text-edit <= L and pattern <= its best case, so the
                    # weighted score is at most ((w_d + w_c) * direct +
                    # w_te * L + w_pat * pat_max) / W — offsets whose bound
                    # can't beat the floor never reach the exact kernels
                    # (negative/ascending weights break the bound, so
                    # pruning is disabled there)
                    bound = ((w_direct + w_cons) * direct + w_te * L
                             + w_pat * pat_max) / total_w
                    keep &= bound > score_floor
                if fast_skip_cut is not None:
                    # histogram prune: sum over bases of min(gene count,
                    # window count) >= cut (reference fast_skip)
                    same = np.zeros(len(mm), dtype=np.int64)
                    for b in b"acgt":
                        g_cnt = int((gene_a == b).sum())
                        if g_cnt == 0:
                            continue
                        is_b = (chunk_a == b).astype(np.int32)
                        cs = np.concatenate(([0], np.cumsum(is_b)))
                        win_cnt = cs[L:] - cs[:-L]
                        same += np.minimum(g_cnt, win_cnt[lo:hi])
                    keep &= same >= fast_skip_cut

                # exact kernels, batched across surviving offsets (no
                # per-offset Python): cheapest first — consistency (numpy
                # two-pointer sweep) and pattern (sliding-window block
                # plan) refine the branch-and-bound bound so the O(L^2)
                # text-edit DP only runs where the exact cheap scores
                # still allow beating the floor (te <= L is the only
                # remaining estimate in the refined bound)
                kidx = np.nonzero(keep)[0]
                cons = np.zeros(len(mm), dtype=np.float64)
                if w_cons != 0 and len(kidx):
                    cons[kidx] = _consistency_vec(mm[kidx], patience)
                pat_s = np.zeros(len(mm), dtype=np.float64)
                if w_pat != 0 and pat is not None and len(kidx):
                    pat_s[kidx] = pattern_scores_chunk(pat, chunk, lo + kidx, L)
                te = np.zeros(len(mm), dtype=np.float64)
                if w_te != 0:
                    if score_floor > 0 and can_bound:
                        refined = (w_direct * direct + w_cons * cons
                                   + w_pat * pat_s + w_te * L) / total_w
                        keep &= refined > score_floor
                        kidx = np.nonzero(keep)[0]
                    if len(kidx):
                        te[kidx] = text_edit_scores_batch(
                            gene_a, windows[kidx], continuous_mismatch_limit
                        )

                g0 = int(row.base_offset) - lead + lo  # global offset of local 0
                weighted_all = (
                    w_direct * direct + w_cons * cons + w_te * te + w_pat * pat_s
                ) / total_w
                score_s = sgn * weighted_all
                emit = keep & (score_s > score_floor)
                if suppress_distance is not None:
                    # exact local suppression: thanks to the halo, the
                    # +-d window of every owned offset is fully scored
                    # here, so "strictly dominated within d" is decided
                    # against the same candidate set the global W2 pass
                    # would see — results are chunk-invariant
                    d = int(suppress_distance)
                    if d > 0 and emit.any():
                        w_dom = np.where(emit, score_s, -np.inf)
                        padded = np.concatenate(
                            (np.full(d, -np.inf), w_dom, np.full(d, -np.inf))
                        )
                        local_max = np.lib.stride_tricks.sliding_window_view(
                            padded, 2 * d + 1
                        ).max(axis=1)
                        emit &= w_dom >= local_max
                    # halo offsets are scored for the decision only;
                    # they are owned (and emitted) by their own chunk
                    loc = lo + np.arange(len(emit))
                    emit &= (loc >= lead) & (loc < owned_end)
                sel = np.nonzero(emit)[0]
                out_rows.extend(
                    (row.name, row.accession, row.strand, g0 + int(off),
                     float(weighted_all[off]), float(direct[off]),
                     float(cons[off]), float(te[off]), float(pat_s[off]))
                    for off in sel
                )
            yield pd.DataFrame(out_rows, columns=[f.name for f in CANDIDATE_SCHEMA.fields])

    if "chunk_size_" not in chunks_df.columns:
        raise ValueError("chunks_df must carry a chunk_size_ column (see chunk_genome)")
    return (
        chunks_df.join(F.broadcast(queries_df.select("name", "gene")), how="cross")
        .mapInPandas(score_batch, CANDIDATE_SCHEMA)
    )


def _scorer_parallelism(spark) -> int:
    """Task count for the CPU-dense scorer stage: the larger of
    defaultParallelism and spark.sql.shuffle.partitions. On
    dynamic-allocation clusters defaultParallelism reflects only the
    executors registered at plan-build time (possibly a handful at
    submit), which would re-serialize the stage the numeric repartition
    exists to spread; shuffle.partitions is the deploy-time statement of
    intended shuffle width and serves as the floor."""
    sc = spark.sparkContext
    try:
        shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except (ValueError, TypeError):
        # platforms may set a non-numeric value (e.g. "auto" under
        # auto-optimized shuffle) — fall back to registered parallelism
        # rather than failing every scan at plan build
        shuffle = 0
    return max(sc.defaultParallelism, shuffle, 1)


def similarity_scan(
    genome_df: DataFrame,
    queries_df: DataFrame,
    weights: dict[str, float],
    top_k: int = 20,
    candidate_distance: int = 5,
    patience: int = 2,
    continuous_mismatch_limit: int | None = None,
    pattern_conditions: dict | None = None,
    fast_skip_cut: float | None = None,
    chunk_size: int = 8192,
    ascending: bool = False,
    score_floor: float = 0.0,
) -> DataFrame:
    """End-to-end flagship scan. Returns per-query top-k candidates with
    reference coordinate semantics: forward rows start=offset+1,
    end=offset+L; reverse rows start=db_len-offset, end=db_len-offset-L+1
    (start > end encodes the strand;
    src/analysis/models/match_candidate.py:16-22).

    ``ascending=True`` reproduces W4 order polarity (OrderType.Increment):
    the weighted score is negated BEFORE suppression and the non-positive
    drop (gene_similarity_match.py:188-189 negates before
    update_candidate_list), so suppression keeps local minima and only
    candidates with raw score < -score_floor survive — with all-positive
    weights that is the empty set, exactly as the reference behaves.
    """
    max_len_row = queries_df.select(F.max(F.length("gene")).alias("m")).collect()
    overlap = int(max_len_row[0]["m"] or 1) - 1

    # reference deque parity: candidates interact only at distance
    # <= candidate_distance - 1 (update_candidate_list pops at >= keep_size
    # before comparing, gene_similarity_match.py:262-265)
    radius = max(int(candidate_distance) - 1, 0)

    # chunks explode out of a tiny genome_df (rows = accessions x strands),
    # so without an explicit redistribution the whole scan would run in
    # |genome rows| tasks. The count must be EXPLICIT and NUMERIC:
    # a bare repartition(cols) is AQE-coalesced by BYTES (1 MiB min
    # partition), and chunk text is tiny relative to its O(len x L)
    # Python scoring cost — measured at 1 Mbp, byte-based coalescing
    # funneled all 32 chunks into ONE task, serializing the whole scorer
    # stage. Round-robin into defaultParallelism tasks (exact balance;
    # hash-by-chunk-id collides ~1/e of chunks into shared tasks).
    # Placement does not affect results: scoring is per-chunk pure, and
    # suppression/top-k re-shuffle by their own keys downstream.
    chunks = chunk_genome(genome_df, chunk_size, overlap, halo=radius) \
        .repartition(_scorer_parallelism(genome_df.sparkSession)) \
        .withColumn("chunk_size_", F.lit(chunk_size))

    db_len = genome_df.select("accession", F.length("seq").alias("db_len"))
    return _suppress_topk_annotate(
        scan_candidates(
            chunks, queries_df, weights, patience, continuous_mismatch_limit,
            pattern_conditions, fast_skip_cut, score_floor,
            suppress_distance=radius, ascending=ascending,
        ),
        queries_df, db_len, top_k, radius, ascending,
    )


def _suppress_topk_annotate(
    cands: DataFrame,
    queries_df: DataFrame,
    db_len: DataFrame,
    top_k: int,
    radius: int,
    ascending: bool,
) -> DataFrame:
    """Shared scan tail: W2 sliding local-max suppression per (query,
    accession, strand) on the SIGNED score (reference
    negate-before-suppress for Increment), W1 per-query top-k (W4
    polarity via ordering direction), then the reference coordinate
    mapping against per-accession database lengths."""
    signed = (
        (-F.col("weighted_similarity")) if ascending
        else F.col("weighted_similarity")
    )
    sup = local_max_suppress(
        cands, ["name", "accession", "strand"], "offset", signed, radius,
    )
    order = (
        F.asc("weighted_similarity") if ascending else F.desc("weighted_similarity")
    )
    top = topk_per_group(
        sup, ["name"], [order, F.asc("accession"), F.asc("strand"), F.asc("offset")],
        top_k, rank_col="rk",
    )
    gene_len = queries_df.select("name", F.length("gene").alias("gene_len"))
    return (
        top.join(F.broadcast(db_len), "accession")
        .join(F.broadcast(gene_len), "name")
        .withColumn(
            "start",
            F.when(F.col("strand") == "+", F.col("offset") + 1)
            .otherwise(F.col("db_len") - F.col("offset")),
        )
        .withColumn(
            "end",
            F.when(F.col("strand") == "+", F.col("offset") + F.col("gene_len"))
            .otherwise(F.col("db_len") - F.col("offset") - F.col("gene_len") + 1),
        )
        .drop("db_len", "gene_len")
    )


def split_genome_windows(genome_df: DataFrame, window_size: int) -> DataFrame:
    """Ingest-side pre-splitter: one accession row -> fixed-size window
    rows (accession, window_id, win_offset, seq). This is the upstream
    form that closes the single-JVM-string ceiling documented on
    chunk_genome — at ingest a giant accession is emitted as window rows
    directly (e.g. by a chunked file reader) and NO row ever holds the
    whole sequence; this helper exists so tests and small pipelines can
    produce the same layout from an in-memory genome."""
    # byte-sliced for the same reason as chunk_genome: string substr is
    # O(position), which makes window splitting quadratic in genome size
    n_win = F.greatest(F.ceil(F.length("seq") / window_size), F.lit(1)).cast("int")
    return (
        genome_df
        .select("accession",
                encode_ascii_checked(F.col("seq"), "accession").alias("seq_b"),
                F.explode(F.sequence(F.lit(0), n_win - 1)).alias("window_id"))
        .withColumn("win_offset", F.col("window_id").cast("long") * window_size)
        .withColumn("seq", F.decode(F.col("seq_b").substr(
            (F.col("win_offset") + 1).cast("int"), F.lit(window_size)), "UTF-8"))
        .filter(F.length("seq") > 0)
        .select("accession", "window_id", "win_offset", "seq")
    )


def chunk_genome_from_windows(
    windows_df: DataFrame, chunk_size: int, overlap: int,
    both_strands: bool = True, halo: int = 0,
    totals_df: DataFrame | None = None,
) -> DataFrame:
    """``chunk_genome`` over a PRE-SPLIT genome: input rows are
    (accession, win_offset, seq) windows (split_genome_windows layout, any
    window sizing); output rows are bit-identical to chunk_genome's on
    the assembled sequence — same (accession, strand, chunk_id,
    base_offset, lead_, chunk_seq) — without any operator ever holding a
    full accession in one JVM string.

    Shape: reverse-strand windows are per-window revcomps at remapped
    offsets (revcomp of forward span [o, o+l) is reverse-coordinate span
    [total-o-l, total-o)); each window row explodes to the chunk ids
    whose [base_offset - lead, base_offset + chunk + halo + overlap) span
    it intersects (a window meets ~1 + (halo+overlap)/window_size chunks,
    so the explode is ~1x the data), pieces are sliced JVM-side, and a
    groupBy(chunk) reassembles them in offset order. One extra shuffle
    (the regroup) versus the single-string path; every stage is bounded
    by chunk_size, never by accession length.

    ``totals_df`` (accession, total_len) lets a caller that already
    aggregated per-accession lengths share that scan instead of paying a
    second full pass over the window corpus (similarity_scan_windowed
    reuses its db_len aggregate here)."""
    totals = totals_df if totals_df is not None else windows_df.groupBy(
        "accession").agg(F.sum(F.length("seq")).alias("total_len"))
    w = windows_df.join(F.broadcast(totals), "accession")
    # strand fan-out is an explode over the ONE window scan, not a
    # union of two branches — a union duplicates the source scan (and
    # the totals broadcast subtree) in the physical plan, reading the
    # whole window corpus twice; the conditional revcomp only evaluates
    # on '-' rows
    strands = [F.lit("+"), F.lit("-")] if both_strands else [F.lit("+")]
    is_fwd = F.col("strand") == "+"
    sides = (
        w.select("accession", "total_len", "win_offset", "seq",
                 F.explode(F.array(*strands)).alias("strand"))
        .select(
            "accession", "strand", "total_len",
            F.when(is_fwd, F.col("win_offset"))
            .otherwise(F.col("total_len") - F.col("win_offset") - F.length("seq"))
            .alias("wo"),
            F.when(is_fwd, F.col("seq")).otherwise(revcomp(F.col("seq"))).alias("seq"),
        )
    )
    K = chunk_size
    tail = halo + overlap
    n_chunks = F.greatest(F.ceil(F.col("total_len") / K), F.lit(1)).cast("long")
    # over-approximate the chunk range by one on each side, then filter
    # on the exact span-overlap predicate (cheap; dodges floor/ceil edge
    # cases in the bound derivation)
    c_lo = F.greatest(
        F.lit(0).cast("long"),
        F.floor((F.col("wo") - F.lit(halo + tail)) / K).cast("long") - 1)
    c_hi = F.least(
        n_chunks - 1,
        F.floor((F.col("wo") + F.length("seq") + F.lit(halo)) / K).cast("long") + 1)
    pieces = (
        sides
        .filter(c_lo <= c_hi)
        .select("accession", "strand", "total_len", "wo", "seq",
                F.explode(F.sequence(c_lo, c_hi)).alias("chunk_id"))
        .withColumn("base_offset", F.col("chunk_id") * K)
        .withColumn("lead_", F.least(F.col("base_offset"), F.lit(halo)).cast("int"))
        .withColumn("span_start", F.col("base_offset") - F.col("lead_"))
        .withColumn("span_end", F.col("base_offset") + K + tail)
        .filter((F.col("wo") < F.col("span_end"))
                & (F.col("wo") + F.length("seq") > F.col("span_start")))
        .withColumn("cut_from", F.greatest(F.col("span_start") - F.col("wo"), F.lit(0)))
        .withColumn("piece", F.col("seq").substr(
            (F.col("cut_from") + 1).cast("int"),
            (F.least(F.col("span_end"), F.col("wo") + F.length("seq"))
             - F.col("wo") - F.col("cut_from")).cast("int")))
        .filter(F.length("piece") > 0)
    )
    return (
        pieces
        .groupBy("accession", "strand", "chunk_id", "base_offset", "lead_")
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("wo", "piece"))),
                lambda s: s["piece"],
            ), "").alias("chunk_seq"))
        .filter(F.length("chunk_seq") > 0)
        .withColumn("chunk_id", F.col("chunk_id").cast("int"))
    )


def similarity_scan_windowed(
    windows_df: DataFrame,
    queries_df: DataFrame,
    weights: dict[str, float],
    top_k: int = 20,
    candidate_distance: int = 5,
    patience: int = 2,
    continuous_mismatch_limit: int | None = None,
    pattern_conditions: dict | None = None,
    fast_skip_cut: float | None = None,
    chunk_size: int = 8192,
    ascending: bool = False,
    score_floor: float = 0.0,
) -> DataFrame:
    """``similarity_scan`` over a pre-split genome (split_genome_windows
    layout) — results are identical to the single-row path (pinned in
    tests/test_scan.py at two chunk sizes); use when an accession is too
    long for one JVM string (the chunk_genome docstring's ceiling)."""
    max_len_row = queries_df.select(F.max(F.length("gene")).alias("m")).collect()
    overlap = int(max_len_row[0]["m"] or 1) - 1
    radius = max(int(candidate_distance) - 1, 0)

    # one per-accession length aggregate feeds BOTH the chunk regroup
    # (broadcast totals) and the top-k annotation (db_len). Sharing the
    # lazy DataFrame alone does NOT share the computation — Spark
    # expands each reference into its own aggregation subtree (verified:
    # three sum(length(seq)) HashAggregates, zero ReusedExchange) — so
    # the tiny per-accession table is localCheckpoint'ed: one scan of
    # the window corpus computes it, every plan reference reads the
    # persisted RDD. Same executor-storage caveat as
    # operators/components.py: a lost executor fails the job instead of
    # recomputing lineage.
    totals = windows_df.groupBy("accession").agg(
        F.sum(F.length("seq")).alias("total_len")).localCheckpoint(eager=False)
    # numeric round-robin for the same reason as similarity_scan: the
    # regroup's groupBy output is byte-coalesced by AQE, and chunk bytes
    # say nothing about chunk scoring cost
    chunks = chunk_genome_from_windows(windows_df, chunk_size, overlap,
                                       halo=radius, totals_df=totals) \
        .repartition(_scorer_parallelism(windows_df.sparkSession)) \
        .withColumn("chunk_size_", F.lit(chunk_size))
    db_len = totals.select("accession", F.col("total_len").alias("db_len"))
    return _suppress_topk_annotate(
        scan_candidates(
            chunks, queries_df, weights, patience, continuous_mismatch_limit,
            pattern_conditions, fast_skip_cut, score_floor,
            suppress_distance=radius, ascending=ascending,
        ),
        queries_df, db_len, top_k, radius, ascending,
    )


# database chars blat may consume past the anchor beyond the gene length:
# mid gap (<= mid_limit) + skipped chars in each 4-mer walk (<= end_limit
# each side); 16 covers the defaults (10 + 2 + 2) with margin
_RENDER_SLACK = 16


def render_candidates(
    scan_df: DataFrame,
    genome_df: DataFrame,
    queries_df: DataFrame,
    scorers: list[str],
    patience: int = 2,
) -> DataFrame:
    """Attach per-candidate alignment triples (S13; reference
    render_similarity_for_candidates, gene_similarity_match.py:237-256):
    for each requested scorer, a ``{scorer}_render`` array<string> column
    [gene_format, target_format, match_format] from that scorer's
    rendering_sequence.

    Runs AFTER top-k, so the input is per-query top_k rows — the genome
    join is a lookup of the scoring-strand window at the candidate
    offset (substring JVM-side; only the window ships to Python), not a
    rescan. The reference renders against the same strand the candidate
    matched on (database = rev_dna_code when is_reverse) and renders
    text-edit WITHOUT the abort (rendering_sequence walks the full DP
    table even when scoring aborted to 0).
    """
    from ncbi_analysis_spark.similarity.udfs import (
        blat_render_udf,
        consistency_render_udf,
        direct_render_udf,
        pattern_render_udf,
        text_edit_render_udf,
    )

    # byte form for the same reason as chunk_genome: a string substr at
    # a mid-genome offset is an O(offset) codepoint scan per rendered
    # row; byte slicing is O(window). The encode happens once per strand
    # row, below the join.
    strands = genome_df.select(
        "accession", F.lit("+").alias("strand"),
        encode_ascii_checked(F.col("seq"), "accession").alias("seq_b")).unionByName(
        genome_df.select(
            "accession", F.lit("-").alias("strand"),
            encode_ascii_checked(revcomp(F.col("seq")), "accession").alias("seq_b"))
    )
    gene_len = F.length("gene")
    joined = (
        scan_df.join(F.broadcast(queries_df.select("name", "gene")), "name")
        .join(strands, ["accession", "strand"])
        .withColumn(
            "window_",
            F.decode(F.col("seq_b").substr(
                (F.col("offset") + 1).cast("int"),
                gene_len + F.lit(_RENDER_SLACK)), "UTF-8"),
        )
        .drop("seq_b")
    )
    out = joined
    for name in scorers:
        if name == "direct":
            col = direct_render_udf(F.col("gene"), F.col("window_"))
        elif name == "consistency":
            col = consistency_render_udf(F.col("gene"), F.col("window_"), F.lit(patience))
        elif name == "text_edit":
            col = text_edit_render_udf(F.col("gene"), F.col("window_"))
        elif name == "pattern":
            col = pattern_render_udf(F.col("gene"), F.col("window_"))
        elif name == "blat":
            col = blat_render_udf(F.col("gene"), F.col("window_"), F.lit(0))
        else:
            raise ValueError(f"unknown render scorer: {name}")
        out = out.withColumn(f"{name}_render", col)
    return out.drop("window_")
