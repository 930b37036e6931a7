"""Text-analysis expressions for large-scale training-data pipelines.

All pure Column expressions (JVM-side, codegen). Hash-derived features use
md5 — chosen deliberately because md5 is bit-identical across engines
(Spark, DuckDB, Python), which makes every operator here verifiable
against an independent SQL oracle, and makes results reproducible across
cluster versions (Spark's builtin ``hash``/``xxhash64`` are fine too but
engine-specific).

Scale notes: everything is per-row expression work — embarrassingly
parallel, no shuffle. At 100 TB the cost is one linear scan; the
expressions stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram language-ID heuristic.
# Deterministic tie-break: languages are scored in this order; first wins.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "a", "in", "is", "that"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "una"],
}

EN_STOPWORDS = ["the", "of", "and", "to", "a", "in", "is", "that", "it", "for"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization: ``split(trim(text), '\\s+')``."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Number of whitespace tokens (empty string -> 0)."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(tokens(text)))


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-ish token estimate: count of word-piece units, where a word of
    length L contributes ceil(L/4) units (the common ~4-chars-per-token
    heuristic) and punctuation splits words.
    """
    words = F.split(F.lower(text), r"[^a-z0-9]+")
    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("long"),
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array of strings (space-joined).

    The shingle set is the input to MinHash / Jaccard dedup.
    """
    toks = tokens(text)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


def ascii_fast_grams(text: Column, char_form: Column, byte_form) -> Column:
    """Linear-time char-gram extraction: ``substr`` on a JVM string is
    O(position) (UTF8String counts codepoints from offset 0), so any
    every-offset gram transform over a document is O(L²) per document —
    measured 47x slower at 128 KB docs than 2 KB docs for the same total
    characters. For ASCII rows (byte length == char length, the common
    corpus case) grams are sliced from the UTF-8 BYTES at O(1) offsets
    instead; the encode is evaluated ONCE per row by let-binding it
    through a single-element-array transform (``byte_form`` receives the
    materialized binary column as its lambda argument — referencing
    ``encode(text)`` directly inside the gram lambda would re-encode per
    gram and stay quadratic). Non-ASCII rows keep the exact char-substr
    ``char_form`` (byte slicing would split multibyte codepoints)."""
    bg = F.transform(F.array(F.encode(text, "UTF-8")), byte_form).getItem(0)
    return F.when(F.octet_length(text) == F.length(text), bg).otherwise(char_form)


def char_shingles(text: Column, k: int = 8, stride: int = 1) -> Column:
    """Character k-gram shingles (for fingerprinting / near-dup on short
    text). ``stride`` > 1 samples every stride-th gram — the winnowing
    trade-off (stride-1 edits can shift the minimizer, cost drops by
    stride x). Linear in text length (see ascii_fast_grams)."""
    def starts(length_col):
        return F.sequence(
            F.lit(1), F.greatest(length_col - k + 1, F.lit(1)), F.lit(stride))

    return ascii_fast_grams(
        text,
        F.transform(starts(F.length(text)), lambda i: F.substring(text, i, k)),
        lambda tb: F.transform(
            starts(F.octet_length(text)),
            lambda i: F.decode(tb.substr(i, F.lit(k)), "UTF-8"),
        ),
    )


def _hash32(col: Column, salt: str = "") -> Column:
    """Deterministic 32-bit integer hash of a string via md5 prefix.

    Cross-engine reproducible: DuckDB ``('0x'||substr(md5(s),1,8))::BIGINT``
    computes the identical value.
    """
    return F.conv(F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 8), 16, 10).cast("long")


def minhash_signature(text: Column, num_perm: int = 16, shingle_n: int = 3) -> Column:
    """MinHash signature: array of ``num_perm`` hex-string minima.

    Each permutation i takes ``min over shingles of md5(i || '|' || shingle)``
    — the salted-hash formulation of MinHash (one hash function per salt).
    Lexicographic min over fixed-width hex == numeric min over the hash.

    Scale: per-row expression only. Signature width num_perm*32 bytes.
    """
    sh = word_shingles(text, shingle_n)

    # NB: single-arg lambdas only — a 2-arg lambda in a Spark higher-order
    # function receives the array index as its second argument.
    def perm_min(i: int):
        salt = f"{i}|"
        return F.array_min(F.transform(sh, lambda x: F.md5(F.concat(F.lit(salt), x))))

    return F.array(*[perm_min(i) for i in range(num_perm)])


def minhash_bands(sig: Column, bands: int, rows_per_band: int) -> Column:
    """LSH banding: array of ``bands`` (band_id, band_hash) structs.

    Two documents collide in a band iff their signatures agree on all
    ``rows_per_band`` rows of that band -> standard s-curve tuning.
    """
    return F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws(",", F.slice(sig, b * rows_per_band + 1, rows_per_band))).alias("band_hash"),
        )
        for b in range(bands)
    ])


def simhash32(text: Column) -> Column:
    """32-bit SimHash over whitespace tokens.

    Per token, a 32-bit hash (md5-derived); per bit, +1 if set else -1,
    summed over tokens; result bit j is 1 iff the sum is positive.
    Pure expression: array-accumulator fold, no shuffle.
    """
    toks = tokens(text)

    def bit_vec(t):
        h = _hash32(t)
        return F.array(*[
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))
            for j in range(32)
        ])

    acc = F.aggregate(
        toks,
        F.array_repeat(F.lit(0), 32),
        lambda a, t: F.zip_with(a, bit_vec(t), lambda x, y: x + y),
    )
    pow2 = F.array(*[F.lit(1 << j).cast("long") for j in range(32)])
    return F.aggregate(
        F.zip_with(acc, pow2, lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def hamming32(a: Column, b: Column) -> Column:
    """Hamming distance between two 32-bit ints stored as longs."""
    return F.bit_count(a.bitwiseXOR(b)).cast("int")


def _word_hits(lower_text: Column, ws: list[str]) -> Column:
    """Count of whitespace-delimited tokens exactly equal to one of
    ``ws`` — the codegen formulation. ``regexp_count`` with a leading
    boundary CONSUMED and the trailing boundary as a LOOKAHEAD counts
    consecutive markers correctly ('the the' = 2: only the leading
    separator is eaten, so the next token's boundary survives), and
    token-equality semantics are preserved exactly: a token like 'the,'
    fails the (?=\\s|$) lookahead just as it fails ``isin``. Replaces
    the interpreted higher-order ``filter(toks, isin)`` form —
    SCALING.md's last future-work item; the per-language array filters
    were the only interpreted expressions in the text_stats plan.
    (Java-regex lookahead is Spark-side only; the DuckDB oracles keep
    their token-based SQL and match on values.)"""
    pat = r"(?:^|\s)(?:" + "|".join(ws) + r")(?=\s|$)"
    return F.regexp_count(lower_text, F.lit(pat))


def lang_id(text: Column, lower_toks: Column | None = None) -> Column:
    """Language-ID heuristic: count marker-stopword hits per language,
    return the argmax (ties broken by LANG_MARKERS order), 'und' if no
    marker hits at all.

    ``lower_toks`` is accepted for signature compatibility (sibling
    expressions share the tokenization for their token counts) but the
    marker hits themselves are regexp_count over the lowered text —
    fully codegen, no interpreted higher-order filter per language.
    """
    lower_text = F.lower(text)

    def marker_hits(ws: list[str]):
        return _word_hits(lower_text, ws)

    scores = {lang: marker_hits(ws) for lang, ws in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    mx = F.greatest(*[scores[lang] for lang in langs])
    # first language (in LANG_MARKERS priority order) whose score equals the
    # positive maximum wins; no hits at all -> 'und'
    expr = None
    for lang in langs:
        cond = (scores[lang] > 0) & (scores[lang] == mx)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ascii letters or space."""
    clean = F.regexp_replace(F.lower(text), "[^a-z ]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        F.length(clean) / F.length(text)
    )


def stopword_ratio(text: Column, lower_toks: Column | None = None) -> Column:
    """Fraction of tokens that are common English stopwords (hit count
    via the codegen ``_word_hits`` form; the token array — shareable via
    ``lower_toks`` — supplies only the denominator)."""
    toks = lower_toks if lower_toks is not None else tokens(F.lower(text))
    n = F.size(toks)
    hits = _word_hits(F.lower(text), EN_STOPWORDS)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits / n)


def quality_score(text: Column, lower_toks: Column | None = None) -> Column:
    """Composite document-quality score in [0,1]:
    0.4 * min(1, tokens/64) + 0.3 * alpha_ratio + 0.3 * (1 - |stopword_ratio - 0.4|).

    The same formula (same operation order) is used by the DuckDB oracle, so
    results are bit-identical doubles.
    """
    tc = token_count(text).cast("double")
    return (
        F.lit(0.4) * F.least(F.lit(1.0), tc / F.lit(64.0))
        + F.lit(0.3) * alpha_ratio(text)
        + F.lit(0.3) * (F.lit(1.0) - F.abs(stopword_ratio(text, lower_toks) - F.lit(0.4)))
    )


def doc_fingerprint(text: Column, k: int = 8, stride: int = 4) -> Column:
    """Document fingerprint: minimum 32-bit hash over strided character
    k-grams (winnowing-lite / MinHash-of-char-shingles). Stable under
    small edits away from the minimizing k-gram; cross-engine
    reproducible; stride trades edit-shift sensitivity for a stride-x
    cost cut (the per-gram hash is the hot loop of text_stats).
    """
    return F.array_min(F.transform(char_shingles(text, k, stride), lambda s: _hash32(s)))


PII_PATTERNS = {
    # shared Spark(Java)/DuckDB(RE2) regex subset — no lookaround
    "email": r"[\w.+-]+@[\w.-]+\.[a-z]{2,}",
    "ip": r"\b\d{1,3}(\.\d{1,3}){3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}


def pii_counts(text: Column) -> list[Column]:
    """One count column per PII pattern (email/ip/phone)."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast("long").alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]


def redact_pii(text: Column) -> Column:
    """Replace every PII match with a typed placeholder (<EMAIL>, <IP>,
    <PHONE>) — corpus-scrubbing map, pure codegen, no shuffle."""
    out = text
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


# --- Gopher-style repetition metrics (Rae et al. 2021, table A1) --------
#
# The reference corpus here is single-line word streams, so the
# line/paragraph duplicate rules degenerate (every doc is one line);
# the word-level rules below are the meaningful subset, re-derived as
# pure Column expressions. Scale shape: array_sort + a run-length fold
# per row — O(L log L) per document, zero shuffle, whole-stage codegen.
# (The classic alternative — explode n-grams, groupBy(doc_id, gram),
# max(count) — costs two shuffles keyed by doc_id; the in-row fold
# needs none and the per-doc arrays are bounded by document length.)


def _max_run(sorted_arr: Column) -> Column:
    """Count of the most frequent element of a SORTED string array,
    computed as the longest run of equal adjacent elements via a
    single ``aggregate`` fold (struct accumulator: previous element,
    current run, best run). Empty array -> 0."""
    return F.aggregate(
        sorted_arr,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def word_ngrams_exact(toks: Column, n: int) -> Column:
    """Exact word n-grams (space-joined) — unlike ``word_shingles`` this
    emits NO short tail gram: fewer than n words -> empty array."""
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def dup_word_frac(toks: Column) -> Column:
    """1 - distinct/total words (0 for empty docs): the word-level twin
    of Gopher's duplicate-line fraction."""
    return F.when(F.size(toks) <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(toks)) / F.size(toks)
    )


def top_ngram_frac(toks: Column, n: int) -> Column:
    """Fraction of word n-grams accounted for by the single most
    frequent n-gram (Gopher's top-n-gram character fraction, re-based
    on gram counts — on a uniform-word-length corpus the two order
    documents identically). 0 when the doc has fewer than n words."""
    grams = word_ngrams_exact(toks, n)
    return F.when(F.size(grams) <= 0, F.lit(0.0)).otherwise(
        _max_run(F.array_sort(grams)).cast("double") / F.size(grams)
    )


def mean_word_len(toks: Column) -> Column:
    """Mean characters per word (0 for empty docs) — Gopher gates docs
    outside [3, 10]."""
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    return F.when(F.size(toks) <= 0, F.lit(0.0)).otherwise(
        total.cast("double") / F.size(toks)
    )


# --- Arrow-batched twin of the repetition metrics --------------------
#
# The Column forms above are oracle-exact but their inner loops
# (array_sort + `aggregate` folds) are CodegenFallback — interpreted
# per array element, the dominant cost of the repetition gate at bench
# scale. The `mapInPandas` twin below computes the SAME IEEE doubles
# (each metric is one double division of exactly-representable integer
# counts, so expr and np are bit-identical, not merely close) with
# C-speed Counter/str machinery. Same expr/np + bounded-probe `auto`
# pattern as `operators.dedup.semantic_dedup`.

REPETITION_METRIC_COLS = (
    "dup_word_frac",
    "top_bigram_frac",
    "top_trigram_frac",
    "mean_word_len",
)


_JAVA_WS = None


def _java_tokens(t):
    """Python replica of ``tokens()``'s JVM semantics (probed against
    Spark 4, see test_repetition_metrics_np_bit_parity): SQL ``trim``
    strips ONLY the space character (not tabs/controls — it is not Java
    ``String.trim``), and ``split(_, '\\s+')`` uses Java's ASCII-only
    ``\\s`` class ``[ \\t\\n\\x0b\\f\\r]`` (U+00A0 etc. are NOT
    separators) and KEEPS leading and trailing empty tokens (Spark calls
    ``split`` with limit -1): ``"\\t"`` -> ``["", ""]``, ``""`` ->
    ``[""]``."""
    global _JAVA_WS
    if _JAVA_WS is None:
        import re as _re

        _JAVA_WS = _re.compile(r"[ \t\n\x0b\f\r]+")
    return _JAVA_WS.split(t.strip(" "))


def repetition_metrics_np(
    df, text_col: str = "text", keep: tuple[str, ...] = ("doc_id",)
):
    """Per-document repetition metrics via one Arrow-batched
    ``mapInPandas`` pass: duplicate-word fraction, top bi-/tri-gram
    fraction, mean word length — bit-identical to the Column forms
    (``dup_word_frac`` / ``top_ngram_frac`` / ``mean_word_len``).

    Scale shape: map-only, zero shuffle, one Python worker pass per
    input partition; per-row state is O(doc length). Measured ~5x the
    expression form on the sf0.1 gate shape (SCALING.md round 9)."""
    from collections import Counter

    import pandas as pd

    id_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in keep
    )
    schema = id_schema + ", " + ", ".join(
        f"{c} double" for c in REPETITION_METRIC_COLS
    )

    def gen(batches):
        for pdf in batches:
            dup, b2, b3, mwl = [], [], [], []
            for t in pdf[text_col]:
                if t is None:
                    # Column forms propagate NULL text to NULL metrics
                    # (size(null) is NULL, so every when() falls through
                    # to a null-producing branch)
                    dup.append(None); b2.append(None); b3.append(None)
                    mwl.append(None)
                    continue
                ws = _java_tokens(t)
                n = len(ws)
                dup.append(1.0 - len(set(ws)) / n)
                mwl.append(sum(map(len, ws)) / n)
                for k, out in ((2, b2), (3, b3)):
                    m = n - (k - 1)
                    if m <= 0:
                        out.append(0.0)
                    else:
                        grams = Counter(zip(*(ws[i:] for i in range(k))))
                        out.append(max(grams.values()) / m)
            out_pdf = pdf[list(keep)].copy()
            # object dtype keeps None as a true Arrow null (a float64
            # series would smuggle it through as NaN, not NULL)
            for c, vals in zip(REPETITION_METRIC_COLS, (dup, b2, b3, mwl)):
                out_pdf[c] = pd.Series(vals, index=pdf.index, dtype="object")
            yield out_pdf

    cols = list(keep) + ([text_col] if text_col not in keep else [])
    return df.select(*cols).mapInPandas(gen, schema)


def repetition_metrics(
    df,
    text_col: str = "text",
    keep: tuple[str, ...] = ("doc_id",),
    engine: str = "auto",
    max_expr_rows: int = 1000,
):
    """Repetition metrics with physical-form selection (the
    ``semantic_dedup`` expr/np pattern): ``'expr'`` = the pure Column
    forms (oracle default), ``'np'`` = ``repetition_metrics_np``,
    ``'auto'`` = expr up to ``max_expr_rows`` input rows (one bounded
    ``limit().count()`` probe), np past it. Both forms produce
    bit-identical doubles; auto exists so small oracle runs stay on the
    all-JVM plan while bench/production corpora get the fast path."""
    if engine == "auto":
        over = df.limit(max_expr_rows + 1).count()
        engine = "expr" if over <= max_expr_rows else "np"
    if engine == "np":
        return repetition_metrics_np(df, text_col=text_col, keep=keep)
    toks = tokens(F.col(text_col))
    return df.select(
        *keep,
        dup_word_frac(toks).alias("dup_word_frac"),
        top_ngram_frac(toks, 2).alias("top_bigram_frac"),
        top_ngram_frac(toks, 3).alias("top_trigram_frac"),
        mean_word_len(toks).alias("mean_word_len"),
    )


# ---------------------------------------------------------------------------
# Unicode normalization (NFC/NFKC + accent folding). There is no Spark SQL
# builtin for Unicode normalization forms, so this is an inherently-Python
# stage — Arrow-batched mapInPandas, map-only, zero shuffle (the multimodal
# decode posture, not the row-at-a-time F.udf anti-pattern). DuckDB's
# independent utf8proc-backed nfc_normalize()/strip_accents() compute the
# identical strings (probed: composed/decomposed Latin, ligatures, ohm
# sign, fullwidth forms), which is what makes the oracle an actual
# cross-implementation check rather than a mirror.

NORMALIZE_COLS = ("text_norm", "changed", "n_before", "n_after")

# ASCII-only whitespace class, shared with the SQL oracle verbatim.
# Python's \s and DuckDB's RE2 \s disagree on U+00A0 and friends; an
# explicit class makes both engines run the same automaton. NBSP is
# treated as a word character by contract (the `_java_tokens` posture).
_ASCII_WS_RE = "[ \t\n\x0b\f\r]+"


def normalize_unicode_np(
    df,
    text_col: str = "text",
    keep: tuple[str, ...] = ("doc_id",),
    form: str = "NFC",
    strip_marks: bool = False,
    lower: bool = False,
    collapse_ws: bool = False,
):
    """Unicode-normalize a text column: ``form`` canonicalization
    (NFC/NFD/NFKC/NFKD), optional accent folding (NFD -> drop combining
    marks -> recompose: 'Café' and 'Cafe\\u0301' both become 'Cafe'),
    optional lowercasing, optional ASCII-whitespace collapse+trim —
    applied in that order. Emits ``keep`` + ``text_norm`` plus a
    ``changed`` 0/1 flag and codepoint counts before/after, so the
    downstream pipeline can quantify how much of the corpus was
    denormalized (a crawl-health signal).

    The canonical-equivalence property this buys at corpus scale:
    composed and decomposed spellings of the same string — which defeat
    exact dedup, shingle hashing, and token lookup alike — collapse to
    one representative BEFORE any hash-keyed operator runs. Run it
    first in a curation pipeline.

    Scale shape: one Arrow-batched map pass, zero shuffle; per-row cost
    is linear in codepoints. Oracle: DuckDB ``strip_accents(
    nfc_normalize(t))`` + the same explicit whitespace class.
    """
    import re
    import unicodedata

    import pandas as pd

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form: {form!r}")
    ws_re = re.compile(_ASCII_WS_RE)

    id_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in keep
    )
    schema = (
        id_schema
        + ", text_norm string, changed bigint, n_before bigint, n_after bigint"
    )

    def norm_one(t):
        s = unicodedata.normalize(form, t)
        if strip_marks:
            s = "".join(
                c
                for c in unicodedata.normalize("NFD", s)
                if not unicodedata.combining(c)
            )
            s = unicodedata.normalize(form, s)
        if lower:
            s = s.lower()
        if collapse_ws:
            s = ws_re.sub(" ", s).strip(" ")
        return s

    def gen(batches):
        for pdf in batches:
            norm, changed, n_before, n_after = [], [], [], []
            for t in pdf[text_col]:
                if t is None:
                    norm.append(None)
                    changed.append(None)
                    n_before.append(None)
                    n_after.append(None)
                    continue
                s = norm_one(t)
                norm.append(s)
                changed.append(1 if s != t else 0)
                n_before.append(len(t))
                n_after.append(len(s))
            out = pdf[list(keep)].copy()
            out["text_norm"] = pd.Series(norm, index=pdf.index, dtype="object")
            # object dtype keeps None a true Arrow null (not NaN)
            out["changed"] = pd.Series(changed, index=pdf.index, dtype="object")
            out["n_before"] = pd.Series(n_before, index=pdf.index, dtype="object")
            out["n_after"] = pd.Series(n_after, index=pdf.index, dtype="object")
            yield out

    cols = list(keep) + ([text_col] if text_col not in keep else [])
    return df.select(*cols).mapInPandas(gen, schema)
