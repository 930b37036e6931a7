"""Corpus term statistics: TF-IDF top terms per document.

Classic text-analysis operator over the ``documents`` table (the
"characteristic terms" report a curation pipeline uses to inspect what a
source/domain is about).

Scoring: ``tf × (n_docs + 1) / (df + 1)`` — a smoothed *rational* idf
weight rather than the conventional ``log`` form. Rationale: the score
must hash-match a DuckDB oracle bit-for-bit, and ``ln`` is not guaranteed
identically rounded across engines; the rational weight is a product and
one division of exact integers, which IEEE-754 rounds identically
everywhere. (Per-document top-k ranking differs from the log variant
only when two terms' tf ratio exactly offsets their df ratio — ties are
broken by term text anyway.)

Scale: explode → one shuffle on (doc, term) for tf; df comes from a
second aggregation keyed by term (vocabulary-sized, ≪ corpus) joined
back; top-k is a window on doc. At 100 TB the (doc, term) aggregation
dominates and is a plain map-side-combined hash agg; the df table is
vocabulary-sized and AQE will broadcast it when small enough.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` terms per document by smoothed rational TF-IDF.

    Returns ``(doc_id, term, tf, df, score, rk)``; ``rk`` ranks score
    descending with term-text tiebreak, so output is fully deterministic.
    Tokenization is lowercased whitespace splitting (the corpus
    convention of functions/text.py).
    """
    from ncbi_analysis_spark.functions.text import tokens

    terms = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).cast("long").alias("__n")
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tf") * (F.col("__n") + 1)).cast("double")
            / (F.col("df") + 1).cast("double"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rk")
    )


def token_rarity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token-rarity quality signals from corpus-wide
    document frequencies — integer-exact (no log), so the DuckDB oracle
    matches bit-for-bit:

    - ``n_tok``       distinct lowercased tokens in the document
    - ``sum_df``      sum of each distinct token's corpus df
    - ``mean_df``     sum_df / n_tok (double; one exact int division)
    - ``hapax_frac``  fraction of the doc's distinct tokens that occur
                      in no other document (df == 1)

    Low mean_df / high hapax_frac flags gibberish or OCR noise; high
    mean_df flags boilerplate. Scale: one (doc, token)-distinct shuffle
    + a vocabulary-sized df aggregation joined back (AQE broadcasts it
    when small), then one doc-keyed aggregation.
    """
    toks = (
        df.select(F.col(id_col), F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("tdf"))
    return (
        toks.join(dfreq, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum("tdf").cast("long").alias("sum_df"),
            F.sum((F.col("tdf") == 1).cast("long")).cast("long").alias("n_hapax"),
        )
        .select(
            id_col, "n_tok", "sum_df",
            (F.col("sum_df") / F.col("n_tok")).alias("mean_df"),
            (F.col("n_hapax") / F.col("n_tok")).alias("hapax_frac"),
        )
    )
