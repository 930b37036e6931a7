"""DNA/RNA sequence expressions — the reference's scalar function surface
re-expressed as pure Spark Column expressions (SURVEY.md §2.7).

Every function here stays inside whole-stage codegen: no Python UDFs.

Coordinate semantics (reference parity, SURVEY.md §1.2): genomic positions
are **1-based, inclusive on both ends**; strand is encoded either as a
``+``/``-`` column or by coordinate order (start > end means reverse
strand). Sequence extraction is ``dna_code[left-1:right]`` in the reference
(src/utils/ncbi_database.py:156), which is exactly Spark's 1-based
``substring(seq, left, right-left+1)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def revcomp(seq: Column | str) -> Column:
    """Reverse complement of a lowercase DNA string.

    Reference: ``get_opposite_dna`` complement map a<->t / c<->g
    (src/utils/gene_util.py:1-8) composed with ``[::-1]`` by every caller
    (e.g. src/analysis/gene_similarity_match.py:66). Here: one
    ``translate`` + ``reverse``, both codegen'd JVM intrinsics.
    """
    return F.reverse(F.translate(F.col(seq) if isinstance(seq, str) else seq, "acgtACGT", "tgcaTGCA"))


def complement(seq: Column | str) -> Column:
    """Complement only (no reversal) — a<->t, c<->g, case preserved."""
    return F.translate(F.col(seq) if isinstance(seq, str) else seq, "acgtACGT", "tgcaTGCA")


def subseq_1based(seq: Column, left: Column, right: Column) -> Column:
    """1-based inclusive substring: ``dna_code[left-1:right]``.

    Reference: src/utils/ncbi_database.py:153-156, src/analysis/gene_extract.py:51.
    """
    return F.substring(seq, left.cast("int"), (right - left + 1).cast("int"))


def extract_strand_seq(seq: Column, start: Column, end: Column) -> Column:
    """Strand-aware extraction where coordinate order encodes strand:
    start <= end -> forward slice; start > end -> reverse complement of
    [end..start]. Reference: src/analysis/gene_extract.py:57-82.
    """
    fwd = subseq_1based(seq, start, end)
    rev = revcomp(subseq_1based(seq, end, start))
    return F.when(start <= end, fwd).otherwise(rev)


def encode_ascii_checked(seq: Column, context: Column | str) -> Column:
    """UTF-8 bytes of ``seq``, raising a labeled task error when the
    value contains non-ASCII characters. Guards every byte-sliced genome
    path: byte offsets silently corrupt slices on multibyte codepoints
    (replacement chars, shifted coordinates), so corrupt input must fail
    loudly with the offending key, not degrade. ``context`` names the
    row in the error (e.g. the accession column)."""
    ctx = F.col(context) if isinstance(context, str) else context
    return F.when(
        F.octet_length(seq) == F.length(seq), F.encode(seq, "UTF-8")
    ).otherwise(F.raise_error(F.concat(
        F.lit("non-ASCII character in sequence (byte-sliced genome paths "
              "require the ASCII genomic alphabet): "), ctx.cast("string"),
    )).cast("binary"))


def subseq_1based_bytes(seq_b: Column, left: Column, right: Column) -> Column:
    """``subseq_1based`` over a pre-encoded UTF-8 binary column. String
    ``substring`` is an O(position) codepoint scan on the JVM, so
    slicing genes out of a whole-genome string costs O(genome) per row;
    byte slicing is O(slice). Byte == char offsets because genomic
    alphabets are ASCII — encode the genome ONCE (e.g. on the broadcast
    side of a join) and slice rows from the bytes."""
    return F.decode(
        seq_b.substr(left.cast("int"), (right - left + 1).cast("int")), "UTF-8")


def extract_strand_seq_bytes(seq_b: Column, start: Column, end: Column) -> Column:
    """Byte-sliced ``extract_strand_seq`` (see subseq_1based_bytes); the
    revcomp runs on the extracted window, never the whole genome."""
    fwd = subseq_1based_bytes(seq_b, start, end)
    rev = revcomp(subseq_1based_bytes(seq_b, end, start))
    return F.when(start <= end, fwd).otherwise(rev)


def upstream_flank_bytes(seq_b: Column, start: Column, limit: Column | int) -> Column:
    """Byte-sliced ``upstream_flank`` (same clamp-at-start semantics)."""
    limit = F.lit(limit) if isinstance(limit, int) else limit
    lo = F.greatest(start - limit, F.lit(1))
    return subseq_1based_bytes(seq_b, lo, start - 1)


def downstream_flank_bytes(seq_b: Column, end: Column, limit: Column | int) -> Column:
    """Byte-sliced ``downstream_flank``."""
    limit = F.lit(limit) if isinstance(limit, int) else limit
    return subseq_1based_bytes(seq_b, end + 1, end + limit)


def upstream_flank(seq: Column, start: Column, limit: Column | int) -> Column:
    """``seq[start-limit-1 : start-1]`` — the ``limit`` bases before a gene.

    Reference "stream" analysis (src/analysis/gene_stream_analysis.py:30-45)
    — despite the name this is flanking-region extraction, not streaming.
    Clamped at the sequence start like Python slicing.
    """
    limit = F.lit(limit) if isinstance(limit, int) else limit
    lo = F.greatest(start - limit, F.lit(1))
    return subseq_1based(seq, lo, start - 1)


def downstream_flank(seq: Column, end: Column, limit: Column | int) -> Column:
    """``seq[end : end+limit]`` — the ``limit`` bases after a gene."""
    limit = F.lit(limit) if isinstance(limit, int) else limit
    return subseq_1based(seq, end + 1, end + limit)


def parse_locus(locus: Column) -> list[Column]:
    """Parse ``acc:left-right(+)`` into (accession, left, right, direction).

    Reference regex ``(.+):(\\d+)-(\\d+)\\((.)\\)``
    (src/analysis/gentamycin.py:87-93).
    Returns a list of aliased Columns ready for ``select``.
    """
    pat = r"^(.+):(\d+)-(\d+)\((.)\)$"
    return [
        F.regexp_extract(locus, pat, 1).alias("accession"),
        F.regexp_extract(locus, pat, 2).cast("long").alias("left"),
        F.regexp_extract(locus, pat, 3).cast("long").alias("right"),
        F.regexp_extract(locus, pat, 4).alias("direction"),
    ]


def overlap_size(a_left: Column, a_right: Column, b_left: Column, b_right: Column) -> Column:
    """Length of the overlap of two 1-based inclusive intervals (>=0).

    Reference ``count_coverage`` / ``get_overlap_size``
    (src/analysis/gene_location_analysis.py:267-275,
    src/utils/gene_position_helper.py:93-117).
    """
    return F.greatest(
        F.least(a_right, b_right) - F.greatest(a_left, b_left) + F.lit(1), F.lit(0)
    )


def gene_range_type(r_left: Column, r_right: Column,
                    g_left: Column, g_right: Column) -> Column:
    """The range-vs-gene classifier of the POSITION helper — distinct
    from :func:`overlap_class` (the location-analysis one): ``hit``
    only on exact interval equality, ``homology`` when the overlap
    covers >= 90% of the RANGE (checked BEFORE containment, so a
    covered range at >=90% is homology, not include), ``include`` when
    the gene contains the range, else ``related``. Reference
    ``get_gene_range_type`` (src/utils/gene_position_helper.py:93-107).

    The rate is ``overlap * 100.0 / range_len >= 90.0`` in doubles on
    both engines — identical IEEE ops, so the cut is cross-engine
    exact.

    PARITY QUIRK: the helper's ``get_overlap_size``
    (gene_position_helper.py:109-117) is NOT the intersection length —
    when the intervals overlap it returns ``range_right - gene_left +
    1`` (range ends first) else ``gene_right - range_left + 1``, which
    OVERSTATES the overlap under containment (range [55,58] inside
    gene [50,60] reads 9, not 4). Mirrored verbatim; do not "fix" to
    :func:`overlap_size` or homology/related classifications drift."""
    ov = (
        F.when((r_right < g_left) | (r_left > g_right), F.lit(0))
        .when(r_right < g_right, r_right - g_left + 1)
        .otherwise(g_right - r_left + 1)
    )
    rate = ov.cast("double") * F.lit(100.0) / (r_right - r_left + 1).cast("double")
    return (
        F.when((r_left == g_left) & (r_right == g_right), F.lit("hit"))
        .when(rate >= F.lit(90.0), F.lit("homology"))
        .when((g_left <= r_left) & (r_right <= g_right), F.lit("include"))
        .otherwise(F.lit("related"))
    )


def overlap_class(a_left: Column, a_right: Column, b_left: Column, b_right: Column,
                  threshold: float = 0.9) -> Column:
    """Classify interval A vs gene interval B like the reference's
    homology classifier (src/utils/gene_position_helper.py:93-117):

    - ``hit``      — overlap covers >= threshold of BOTH intervals
    - ``include``  — one interval contains the other
    - ``homology`` — overlap covers >= threshold of A
    - ``related``  — any positive overlap
    - ``none``     — disjoint
    """
    ov = overlap_size(a_left, a_right, b_left, b_right)
    alen = a_right - a_left + 1
    blen = b_right - b_left + 1
    return (
        F.when(ov <= 0, F.lit("none"))
        .when((ov >= threshold * alen) & (ov >= threshold * blen), F.lit("hit"))
        .when((a_left <= b_left) & (a_right >= b_right)
              | (b_left <= a_left) & (b_right >= a_right), F.lit("include"))
        .when(ov >= threshold * alen, F.lit("homology"))
        .otherwise(F.lit("related"))
    )


# The reference's 8-way interval relation enum
# (IntervalPositionStatus, src/analysis/gene_location_analysis.py:421-437).
def interval_relation(m_left: Column, m_right: Column, g_left: Column, g_right: Column) -> Column:
    """8-way relation of a match interval M vs a gene interval G.

    Values: TotallyLeft, LeftOverlap, Cover, CoveredBy, Same, RightOverlap,
    TotallyRight, Inside-variants collapse as in the reference enum
    (src/analysis/gene_location_analysis.py:278-304,421-437).
    """
    return (
        F.when(m_right < g_left, F.lit("TotallyLeft"))
        .when(m_left > g_right, F.lit("TotallyRight"))
        .when((m_left == g_left) & (m_right == g_right), F.lit("Same"))
        .when((m_left <= g_left) & (m_right >= g_right), F.lit("Cover"))
        .when((m_left >= g_left) & (m_right <= g_right), F.lit("CoveredBy"))
        .when(m_left < g_left, F.lit("LeftOverlap"))
        .otherwise(F.lit("RightOverlap"))
    )


def base_histogram(seq: Column) -> Column:
    """Map base -> count for a sequence window (reference ``count_acgt``,
    src/analysis/gene_similarity_match.py:294-301). Used by the fast-skip
    pruning predicate before expensive similarity scoring.

    Pure expression: aggregate over the exploded char array into a map.
    """
    chars = F.split(seq, "")

    def count_base(b: str):
        return F.size(F.filter(chars, lambda c: c == F.lit(b)))

    return F.map_from_arrays(
        F.array(F.lit("a"), F.lit("c"), F.lit("g"), F.lit("t")),
        F.array(*[count_base(b) for b in "acgt"]),
    )


def map_drop_empty(m: Column) -> Column:
    """P9 null/empty cleanup for open attribute maps (xref etc.): drop
    entries whose value is null/'' (reference recursive empty-dict drop,
    src/utils/gene_position_helper.py:68-75)."""
    return F.map_filter(m, lambda k, v: v.isNotNull() & (v != ""))


def alphabet_ok(seq: Column, alphabet: str = "AUCG") -> Column:
    """True iff every char of seq is in ``alphabet`` (reference AUCG filter,
    src/analysis/cluster_match.py:117-131)."""
    return seq.rlike(f"^[{alphabet}]+$")
