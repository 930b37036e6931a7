"""Reference entry-point pipelines re-expressed as DataFrame compositions
(SURVEY.md §3.2, §3.3 — cluster+neighbor analysis, gene extraction,
flanking regions, enrichment joins).

Each stage handoff that the reference serializes through block-text files
(S5/S6) is simply a DataFrame here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ncbi_analysis_spark.functions.sequence import (
    downstream_flank_bytes,
    encode_ascii_checked,
    extract_strand_seq_bytes,
    upstream_flank_bytes,
)
from ncbi_analysis_spark.operators.asof import nearest_neighbors
from ncbi_analysis_spark.operators.cluster import cluster_by_key
from ncbi_analysis_spark.operators.distribution import value_distribution
from ncbi_analysis_spark.operators.intervals import classify_overlaps, interval_join_broadcast


def cluster_sequences(elements: DataFrame) -> DataFrame:
    """§3.2 step 1 (J1/A2/A3): cluster parsed fna elements by upper-cased
    alignment sequence; emit size, member list, representative
    (reference src/analysis/cluster_match.py:83-114)."""
    return cluster_by_key(
        elements, F.upper(F.col("seq_align")), F.col("gene_no"), key_alias="seq_key"
    )


def aucg_filter_report(elements: DataFrame) -> DataFrame:
    """P3 alphabet filter + offender-character report
    (reference src/analysis/cluster_match.py:117-131)."""
    ok = F.col("seq_target").rlike("^[AUCG]+$")
    offenders = F.array_distinct(
        F.filter(
            F.split(F.col("seq_target"), ""),
            lambda c: ~c.isin(["A", "U", "C", "G"]),
        )
    )
    return elements.select(
        "record_no", "gene_no", "seq_target", ok.alias("aucg_only"),
        F.when(~ok, offenders).alias("offending_chars"),
    )


def neighbor_analysis(matches: DataFrame, genes: DataFrame) -> DataFrame:
    """§3.2 step 2 (J4 + J3): for each match interval, the nearest gene
    wholly left / right (as-of joins) plus all overlapping genes
    (broadcast interval join + relation classification)
    (reference src/analysis/neighbor_analysis.py:171-214)."""
    nn = nearest_neighbors(
        matches, genes, ["accession"],
        p_left="left", p_right="right", g_left="left", g_right="right",
    )
    overlaps = interval_join_broadcast(
        matches.select("accession", F.col("left").alias("m_left"), F.col("right").alias("m_right")),
        genes.select(F.col("accession").alias("g_acc"), F.col("left").alias("g_left"),
                     F.col("right").alias("g_right"), F.col("gene").alias("overlap_gene")),
        "m_left", "m_right", "g_left", "g_right",
        extra_cond=F.col("accession") == F.col("g_acc"),
    ).drop("g_acc")
    overlaps = classify_overlaps(overlaps, "m_left", "m_right", "g_left", "g_right")
    agg = overlaps.groupBy("accession", "m_left", "m_right").agg(
        F.array_join(F.sort_array(F.collect_list("overlap_gene")), ",").alias("overlap_genes")
    )
    return nn.join(
        agg,
        (nn.accession == agg.accession) & (nn.left == agg.m_left) & (nn.right == agg.m_right),
        "left",
    ).drop(agg.accession).drop("m_left", "m_right")


def source_distribution(neighbors: DataFrame, prefix_words: int = 2) -> DataFrame:
    """§3.2 step 3 (A1 + P8): distribution of organism-source prefixes and
    nearest-gene names (reference src/analysis/neighbor_analysis.py:120-153)."""
    pref = F.array_join(
        F.slice(F.split(F.trim(F.col("source")), r"\s+"), 1, prefix_words), " "
    ).alias("source_prefix")
    return value_distribution(neighbors.select(pref), ["source_prefix"])


def extract_gene_sequences(query_names: DataFrame, genes: DataFrame,
                           genome: DataFrame) -> DataFrame:
    """GeneExtract by name (J2 + F2): broadcast name-lookup join (one row
    per matching segment) + strand-aware sequence slice; unmatched names
    are reported via an anti-join flag
    (reference src/analysis/gene_extract.py:40-82)."""
    # genome pre-encoded to bytes ONCE on the broadcast side: a string
    # slice at a gene coordinate is an O(position) codepoint scan, so
    # per-gene extraction from the genome string would cost
    # O(genes x genome); the byte slice is O(gene length) per row
    hits = (
        query_names.join(F.broadcast(genes), "gene", "inner")
        .join(F.broadcast(genome.select(
            "accession",
            encode_ascii_checked(F.col("seq"), "accession").alias("seq_b"))),
            "accession")
        .withColumn(
            "sequence",
            F.when(
                F.col("strand") == "+",
                extract_strand_seq_bytes(F.col("seq_b"), F.col("left"), F.col("right")),
            ).otherwise(
                extract_strand_seq_bytes(F.col("seq_b"), F.col("right"), F.col("left"))
            ),
        )
        .drop("seq_b")
    )
    missing = query_names.join(F.broadcast(genes), "gene", "left_anti").select(
        "gene", F.lit("not found").alias("status")
    )
    return hits, missing


def extract_range_sequences(rows: DataFrame, genome: DataFrame,
                            left_col: str, right_col: str) -> DataFrame:
    """GeneExtract RANGE mode minus the file I/O (reference
    src/analysis/gene_extract.py:57-86 — the DEFAULT mode of the
    runnable driver src/run_gene_extraction_analysis.py:6): dynamic-
    header rows pass through unchanged except that an EMPTY
    ``sequence`` is filled from the genome at the row's
    ``(left_col, right_col)`` range. The reference's deliberate quirks,
    mirrored verbatim (SURVEY §7.5's parity trap):

    * coordinate ORDER encodes strand: ``a < b`` is forward; ``a >= b``
      — INCLUDING ``a == b`` — is reverse;
    * min/max-normalize, 0-index shift, then ``+= 1`` on BOTH ends only
      when reversed: the forward window is 1-based ``[min .. max-1]``
      and the reverse window ``[min+1 .. max]`` — each ONE BASE OFF
      from :func:`...sequence.extract_strand_seq`'s inclusive
      ``[min .. max]`` (gene mode), and ``a == b`` yields the empty
      window;
    * the reverse fill is the revcomp of its window
      (``get_opposite_dna(dna[::-1])``);
    * a non-integer coordinate (the reference's try/except around
      ``int()``) leaves the row untouched, it does not fail the job;
    * rows whose ``sequence`` is already non-empty are never touched
      (``result.get('sequence', '') == ''`` gate).

    Divergence (documented): the reference's ``get_opposite_dna`` DROPS
    characters outside acgt; ``revcomp`` maps them through unchanged
    (same note as ``nearby_genes_by_range``).

    ``rows`` needs a ``sequence`` column (its P1 dynamic-header model:
    all other columns pass through in place); when ``rows`` carries an
    ``accession`` column it keys the genome join, otherwise ``genome``
    must be the reference's single-genome shape (one row) and is
    cross-joined. Scale shape: the genome dim broadcasts byte-encoded
    ONCE (O(slice) per fill, see ``subseq_1based_bytes``); the fill is
    a map-side projection — no shuffle at any width."""
    from ncbi_analysis_spark.functions.sequence import (
        revcomp,
        subseq_1based_bytes,
    )

    cols = list(rows.columns)
    if "sequence" not in cols:
        raise ValueError(
            "extract_range_sequences: rows must carry a 'sequence' "
            "column (the reference only emits header columns, so a "
            "fill into a missing column would be dropped silently)"
        )
    g = genome.select(
        *(["accession"] if "accession" in cols else []),
        encode_ascii_checked(F.col("seq"), "accession").alias("__gb"),
    )
    joined = (rows.join(F.broadcast(g), "accession")
              if "accession" in cols else rows.crossJoin(F.broadcast(g)))
    a = F.col(left_col).try_cast("long")
    b = F.col(right_col).try_cast("long")
    lo, hi = F.least(a, b), F.greatest(a, b)
    fwd = subseq_1based_bytes(F.col("__gb"), lo, hi - 1)
    rev = revcomp(subseq_1based_bytes(F.col("__gb"), lo + 1, hi))
    keep = (
        (F.col("sequence").isNotNull() & (F.col("sequence") != ""))
        | a.isNull() | b.isNull()
    )
    return (
        joined.withColumn(
            "sequence",
            F.when(keep, F.col("sequence"))
            .otherwise(F.when(a < b, fwd).otherwise(rev)),
        )
        .select(*cols)
    )


def flanking_regions(query_names: DataFrame, genes: DataFrame, genome: DataFrame,
                     limit: int = 200) -> DataFrame:
    """'Gene stream' analysis (F3): up/downstream flanking regions,
    swapped + revcomp'd on the minus strand (the reference's misleadingly
    named GeneStreamAnalysis, src/analysis/gene_stream_analysis.py:30-45)."""
    from ncbi_analysis_spark.functions.sequence import revcomp

    # byte-sliced against the once-encoded broadcast genome (same
    # O(position)-substr reasoning as extract_gene_sequences)
    sb = F.col("seq_b")
    up = upstream_flank_bytes(sb, F.col("left"), limit)
    down = downstream_flank_bytes(sb, F.col("right"), limit)
    return (
        query_names.join(F.broadcast(genes), "gene", "inner")
        .join(F.broadcast(genome.select(
            "accession",
            encode_ascii_checked(F.col("seq"), "accession").alias("seq_b"))),
            "accession")
        .withColumn("upstream", F.when(F.col("strand") == "+", up).otherwise(revcomp(down)))
        .withColumn("downstream", F.when(F.col("strand") == "+", down).otherwise(revcomp(up)))
        .select("gene", "accession", "left", "right", "strand", "upstream", "downstream")
    )


def enrich_genes(genes: DataFrame, ecocyc_records: DataFrame | None = None,
                 kegg_pathways: DataFrame | None = None,
                 go_terms: DataFrame | None = None) -> DataFrame:
    """J9 enrichment joins over snapshot dimension tables (the engine
    never fetches: web sources S7-S10 are ingestion-time snapshots,
    reference src/analysis/ecocyc_analysis.py:196-275 et al.)."""
    out = genes
    if ecocyc_records is not None:
        out = out.join(
            F.broadcast(ecocyc_records.withColumnRenamed("product", "ecocyc_product")),
            "gene", "left",
        )
    if kegg_pathways is not None:
        out = out.join(F.broadcast(kegg_pathways), "gene", "left")
    if go_terms is not None:
        out = out.join(F.broadcast(go_terms), "gene", "left")
    return out


def gentamycin_report(gene_list: DataFrame, genome: DataFrame) -> DataFrame:
    """NCBI-mode ``GentamycinAnalysis.run`` minus the file I/O
    (reference src/analysis/gentamycin.py:33-41,76-93): parse each
    row's ``locus`` (``acc:left-right(dir)``, the F11 regex), slice
    ``genome[left-1:right]`` for that accession, reverse-complement on
    ``'-'``, and return the expanded report. The consistency twin the
    reference writes as a second TSV is the same frame renamed
    (``name`` = gene, ``gene`` = sequence) — emit both shapes' columns
    here so either file is a projection.

    Scale shape: the genome dim broadcasts with its sequence encoded
    ONCE to bytes (O(slice) extraction, not O(genome) — see
    ``subseq_1based_bytes``); everything else is a map-side
    projection of the gene list. No shuffle at any width.
    """
    from ncbi_analysis_spark.functions.sequence import (
        parse_locus,
        revcomp,
        subseq_1based_bytes,
    )

    parsed = gene_list.select(
        F.col("gene"), *parse_locus(F.col("locus"))
    )
    g = genome.select(
        F.col("accession"),
        encode_ascii_checked(F.col("seq"), F.col("accession")).alias("__gb"),
    )
    fwd = subseq_1based_bytes(F.col("__gb"), F.col("left"), F.col("right"))
    return (
        parsed.join(F.broadcast(g), "accession")
        .select(
            "gene",
            "accession",
            "left",
            "right",
            "direction",
            F.when(F.col("direction") == "-", revcomp(fwd))
            .otherwise(fwd).alias("sequence"),
        )
        .withColumn("name", F.col("gene"))
    )


def gentamycin_report_atcc(gene_list: DataFrame,
                           genes: DataFrame) -> DataFrame:
    """ATCC-mode ``GentamycinAnalysis.run`` minus the file I/O
    (reference src/analysis/gentamycin.py:44-75): rows whose ``Gene``
    starts with ``DR`` expand to their nearby genes via the position
    helper (``operators.genes.nearby_genes_by_range``) and gain the
    ``__atcc_expand_headers__`` columns ``related``/``hit``/
    ``sequence``; every other row gets the empty-string triple. The
    ``sequence`` column is the JSON tag→sequence dict that
    ``generate_consistency_df`` (lines 44-60) explodes into
    ``name-tag`` rows — see :func:`gentamycin_consistency_atcc`.

    Adjudication (documented): the reference's ATCC branch as written
    cannot run — ``expand_one_record_from_atcc`` calls the
    GENERATOR-returning ``get_nearby_gene_based_by_range`` and
    immediately ``.get()``s it (AttributeError on the first DR row),
    a leftover from before the helper became a generator. The twin
    implements the evident intent, consistent with the declared
    headers and the consistency JSON contract:

    * ``hit``: the first expanded gene (position-helper index order:
      ``gene_left``, then name) whose range type is ``'hit'``, else
      the empty string;
    * ``related``: the remaining expanded gene names in the same
      order, comma-joined;
    * ``sequence``: a JSON object ``{gene: sequence}`` over ALL
      expanded genes in the same order (sequences complemented
      WITHOUT reversal on ``'-'`` ranges — the position helper's
      ``generate_result`` quirk, inherited from
      ``nearby_genes_by_range``).

    ``Gene`` must be unique per row (it keys the expansion re-join).
    Scale shape: inherited from ``nearby_genes_by_range`` (broadcast
    annotation dim, output-sized shuffles only); the re-join
    aggregates the bounded expansion per row — no corpus-side width
    is ever duplicated."""
    from ncbi_analysis_spark.functions.sequence import parse_locus
    from ncbi_analysis_spark.operators.genes import nearby_genes_by_range

    cols = list(gene_list.columns)
    is_dr = F.col("Gene").startswith("DR")
    # the expansion emits a 'gene' column, which Spark's default
    # case-insensitive resolution would conflate with the reference's
    # 'Gene' header — run it under a temp id and restore after
    dr = gene_list.filter(is_dr).select(
        F.col("Gene").alias("__rid"), *parse_locus(F.trim(F.col("Locus")))
    )
    expanded = nearby_genes_by_range(
        dr, genes, r_id="__rid", r_left="left", r_right="right",
        direction="direction",
    )
    arr = F.sort_array(F.collect_list(F.struct(
        F.col("gene_left"), F.col("gene"), F.col("type"),
        F.col("sequence"),
    )))
    agg = expanded.groupBy("__rid").agg(arr.alias("__arr"))
    hits = F.filter(F.col("__arr"), lambda x: x["type"] == F.lit("hit"))
    hit = F.when(F.size(hits) > 0, hits[0]["gene"]).otherwise(F.lit(""))
    agg = agg.withColumn("__hit", hit).select(
        F.col("__rid").alias("Gene"),
        F.array_join(
            F.transform(
                F.filter(F.col("__arr"),
                         lambda x: x["gene"] != F.col("__hit")),
                lambda x: x["gene"],
            ),
            ",",
        ).alias("__related"),
        F.col("__hit"),
        F.to_json(F.map_from_entries(F.transform(
            F.col("__arr"),
            lambda x: F.struct(x["gene"].alias("key"),
                               x["sequence"].alias("value")),
        ))).alias("__seq_json"),
    )
    return (
        gene_list.join(F.broadcast(agg), "Gene", "left")
        .select(
            *cols,
            F.when(is_dr, F.coalesce("__related", F.lit("")))
            .otherwise(F.lit("")).alias("related"),
            F.when(is_dr, F.coalesce("__hit", F.lit("")))
            .otherwise(F.lit("")).alias("hit"),
            F.when(is_dr, F.coalesce("__seq_json", F.lit("")))
            .otherwise(F.lit("")).alias("sequence"),
        )
    )


def gentamycin_consistency_atcc(report: DataFrame) -> DataFrame:
    """The consistency twin of :func:`gentamycin_report_atcc`
    (reference ``generate_consistency_df``,
    src/analysis/gentamycin.py:44-60): rows with a non-empty
    ``sequence`` JSON dict explode into ``(name = Gene + '-' + tag,
    gene = sequence)`` rows, one per dict entry, in dict order."""
    m = F.from_json(F.col("sequence"), "map<string,string>")
    return (
        report.filter(F.col("sequence").isNotNull()
                      & (F.col("sequence") != ""))
        .select(F.col("Gene"), F.explode(m).alias("tag", "__s"))
        .select(
            F.concat(F.col("Gene"), F.lit("-"), F.col("tag"))
            .alias("name"),
            F.col("__s").alias("gene"),
        )
    )


def genes_near_range(ranges: DataFrame, genes: DataFrame) -> DataFrame:
    """``FoundGeneNameNearARange.run`` minus the file I/O (reference
    src/analysis/found_gene_name_near_a_range.py:10-33): coordinate
    order encodes strand (``start > end`` means ``'-'`` and swaps), the
    range length and the locus-parsed compare length ride along, and
    each range explodes to its nearby genes with the cover preference
    (``operators.genes.nearby_genes_by_range``).

    ``ranges`` needs ``(name, start, end, locus)``; extra columns are
    preserved. NOTE the reference swaps its own names here — its
    ``length`` comes from the LOCUS and ``compare_length`` from
    start/end; kept verbatim for parity."""
    from ncbi_analysis_spark.functions.sequence import parse_locus
    from ncbi_analysis_spark.operators.genes import nearby_genes_by_range

    locus_parsed = parse_locus(F.col("locus"))
    prepared = ranges.select(
        "*",
        F.least(F.col("start"), F.col("end")).alias("left"),
        F.greatest(F.col("start"), F.col("end")).alias("right"),
        F.when(F.col("start") > F.col("end"), F.lit("-"))
        .otherwise(F.lit("+")).alias("direction"),
        (locus_parsed[2] - locus_parsed[1] + F.lit(1)).alias("length"),
        (F.greatest(F.col("start"), F.col("end"))
         - F.least(F.col("start"), F.col("end"))
         + F.lit(1)).alias("compare_length"),
    )
    return nearby_genes_by_range(
        prepared, genes, r_id="name",
        r_left="left", r_right="right", direction="direction",
    )
