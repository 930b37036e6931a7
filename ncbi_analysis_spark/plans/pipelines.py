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
