"""Span-level exact-substring removal (operators/dedup.py::
remove_dup_spans / dup_span_windows) and the staged round-8 driver
queries, held to the driver's own bar: DuckDB oracle parity with
sorted-column / sorted-row exact-value comparison at sf0.001."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

from ncbi_analysis_spark.operators.dedup import dup_span_windows, remove_dup_spans

SF_DIR = "/root/testdata/sf0.001"

_spec = importlib.util.spec_from_file_location(
    "check_oracle",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "check_oracle.py"),
)
_co = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_co)


def _model(docs, window, min_docs, anchor_k=8, anchor_bits=4):
    """From-scratch Python model of remove_dup_spans (content-defined
    anchor geometry)."""
    import hashlib

    zeros = "0" * (anchor_bits // 4)
    wins = {}  # hash -> set of doc ids
    occ = []  # (doc_id, start, hash)
    for i, t in docs:
        t = t or ""
        if len(t) < window:
            continue
        for s in range(len(t) - window + 1):
            seed = hashlib.md5(t[s:s + anchor_k].encode()).hexdigest()
            if not seed.startswith(zeros):
                continue
            h = t[s:s + window]
            wins.setdefault(h, set()).add(i)
            occ.append((i, s, h))
    keeper = {h: min(ids) for h, ids in wins.items() if len(ids) >= min_docs}
    spans = {}
    for i, s, h in occ:
        if h in keeper and keeper[h] != i:
            spans.setdefault(i, []).append((s, s + window))
    out = {}
    for i, t in docs:
        t = t or ""
        sp = sorted(spans.get(i, []))
        merged = []
        for s, e in sp:
            if merged and merged[-1][1] >= s:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        pos, parts = 0, []
        for s, e in merged:
            parts.append(t[pos:s])
            pos = e
        parts.append(t[pos:])
        out[i] = ("".join(parts), len(merged), sum(e - s for s, e in merged))
    return out


def test_remove_dup_spans_semantics(spark):
    """The duplicated passage is cut from the non-keeper only — at
    DIFFERENT offsets in each document (the content-defined-anchor
    point); the keeper and unique text survive verbatim; overlapping
    anchored windows merge into one maximal span."""
    boiler = ("subscribe to our newsletter for updates and accept "
              "the cookie policy before you continue reading this")
    rows = [
        (0, f"alpha {boiler} omega"),
        (1, f"a very different beginning entirely {boiler} and another tail"),
        (2, "entirely unique text with no duplication anywhere at all"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           remove_dup_spans(df, "text", "doc_id", window=32).collect()}
    want = _model([(i, t) for i, t in rows], 32, 2)
    for i in range(4):
        assert (out[i]["text"], out[i]["n_spans_removed"],
                out[i]["n_chars_removed"]) == want[i], i
    # keeper (min doc_id) untouched, non-keeper lost the span
    assert out[0]["n_spans_removed"] == 0
    assert out[0]["text"] == rows[0][1]
    assert out[1]["n_spans_removed"] >= 1
    assert out[1]["n_chars_removed"] >= 32
    assert out[2]["text"] == rows[2][1]
    assert out[3]["text"] == ""


def test_dup_span_windows_keeper(spark):
    """Identical docs anchor identically; keeper is the corpus-wide min
    id; anchor positions are content-defined, so all three agree."""
    base = ("the shared press release body text that ends up on "
            "every mirror site with zero edits whatsoever here")
    rows = [(5, base), (9, base), (7, base)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = dup_span_windows(df, "text", "doc_id", window=32).collect()
    assert got, "fixture text must contain at least one anchor"
    assert {r["keeper"] for r in got} == {5}
    assert {r["doc_id"] for r in got} == {5, 7, 9}
    starts = {}
    for r in got:
        starts.setdefault(r["doc_id"], set()).add(r["span_start"])
    assert starts[5] == starts[7] == starts[9]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="anchor_bits"):
        dup_span_windows(df, "text", "doc_id", anchor_bits=3)


def test_remove_dup_spans_matches_python_model(spark):
    """Randomized corpora vs the from-scratch model, several geometries
    (window sizes and anchor densities); passages are injected at
    arbitrary unaligned offsets."""
    import random as _random

    rnd = _random.Random(83)
    passages = ["the quick brown fox jumps over the lazy dog again and again",
                "lorem ipsum dolor sit amet consectetur adipiscing elit sed do",
                "pack my box with five dozen liquor jugs before the dawn comes"]
    docs = []
    for i in range(60):
        parts = []
        for _ in range(rnd.randrange(4)):
            if rnd.random() < 0.5:
                parts.append(rnd.choice(passages))
            parts.append("u%d%s" % (i, "x" * rnd.randrange(30)))
        docs.append((i, " ".join(parts)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    removed_any = False
    for window, bits in ((32, 4), (24, 8), (16, 4)):
        want = _model(docs, window, 2, anchor_bits=bits)
        got = {r["doc_id"]: (r["text"], r["n_spans_removed"], r["n_chars_removed"])
               for r in remove_dup_spans(df, "text", "doc_id", window=window,
                                         anchor_bits=bits).collect()}
        assert got == want, (window, bits)
        removed_any = removed_any or any(v[1] > 0 for v in want.values())
    # something must actually have been removed for the test to mean much
    assert removed_any


def test_all_staged_r8_queries_duckdb_parity(spark):
    """Every staged round-8 entry must already clear the exact-match bar
    the driver will apply at registration — same comparator as
    scripts/check_oracle.py, no weaker check for staged queries."""
    from ncbi_analysis_spark.plans.driver_queries_r8 import (
        oracle_sql_r8,
        queries_r8,
    )

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
    try:
        qs, oracles = queries_r8(), oracle_sql_r8()
    finally:
        del os.environ["SPARK_GRAFT_ORACLE_SF_DIR"]
    assert set(qs) == set(oracles)
    con = duckdb.connect()
    for t in _co.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    for name, fn in qs.items():
        got = fn(spark, SF_DIR).toPandas()
        want = con.sql(oracles[name]).df()
        issues = _co.compare(name, got, want)
        assert not issues, f"{name}: {issues}"
        assert len(got) > 0, name


def test_dup_span_windows_xxhash64_fast_path(spark):
    """The production anchor method: structurally valid windows (width,
    bounds), offset-independent anchors across the two copies, and a
    loud error on a bogus method."""
    base = ("the shared press release body text that ends up on "
            "every mirror site with zero edits whatsoever here "
            "plus enough extra words to guarantee several anchors land")
    rows = [(1, "PREFIX " + base), (2, base + " SUFFIX TEXT")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = dup_span_windows(df, "text", "doc_id", window=32,
                           anchor_bits=4, anchor_method="xxhash64").collect()
    assert got, "shared passage must anchor under xxhash64 too"
    texts = dict(rows)
    for r in got:
        assert r["span_end"] - r["span_start"] == 32
        assert 0 <= r["span_start"] <= len(texts[r["doc_id"]]) - 32
        assert r["keeper"] == 1
    # same window content hashes regardless of which doc it sits in
    by_doc = {}
    for r in got:
        t = texts[r["doc_id"]]
        by_doc.setdefault(r["doc_id"], set()).add(
            t[r["span_start"]:r["span_end"]])
    assert by_doc[1] == by_doc[2]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="anchor_method"):
        dup_span_windows(df, "text", "doc_id", anchor_method="bogus")


def test_remove_dup_spans_plan_shape(spark):
    """No single-partition exchange anywhere in the span-removal plan —
    every shuffle keys on the digest or the doc id — and the anchor
    probe takes the byte-sliced branch on this ASCII corpus (the O(L^2)
    substr trap would show as a plain substring chain on text)."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    plan = (
        remove_dup_spans(d, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange SinglePartition" not in plan, plan[:2000]
    assert "encode(" in plan.lower()  # ascii_fast_grams byte branch present


def test_remove_bench_spans_semantics(spark):
    """Contaminated passage cut from the corpus doc at any offset; the
    corpus-only text survives; a benchmark-free doc is untouched; the
    bench side itself is never emitted."""
    from ncbi_analysis_spark.operators.dedup import remove_bench_spans

    passage = ("question: what is the airspeed velocity of an unladen "
               "swallow answer: an african or european one")
    corpus_rows = [
        (1, f"intro text before the leak {passage} and some trailing words"),
        (2, "a perfectly clean document with nothing from the benchmark"),
    ]
    bench_rows = [(100, f"benchmark item {passage}")]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "bench_id long, text string")
    out = {r["doc_id"]: r for r in
           remove_bench_spans(corpus, bench, "text", "doc_id",
                              window=32).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_spans_removed"] >= 1
    assert passage not in out[1]["text"]
    assert out[1]["text"].startswith("intro text before the leak")
    assert out[2]["text"] == corpus_rows[1][1]
    assert out[2]["n_spans_removed"] == 0


def test_remove_bench_spans_matches_python_model(spark):
    """Cross-corpus model: windows anchored in BOTH corpora are removed
    from the corpus side wherever they occur."""
    import hashlib
    import random as _random

    rnd = _random.Random(17)
    passages = ["the quick brown fox jumps over the lazy dog again and again",
                "pack my box with five dozen liquor jugs before the dawn comes"]
    corpus = []
    for i in range(40):
        parts = ["c%d%s" % (i, "y" * rnd.randrange(20))]
        if rnd.random() < 0.6:
            parts.append(rnd.choice(passages))
        parts.append("tail%d" % i)
        corpus.append((i, " ".join(parts)))
    bench = [(100 + j, "bench wrapper %s end" % p) for j, p in enumerate(passages)]

    window, k = 32, 8

    def wins(t):
        out = []
        for s in range(max(len(t) - window + 1, 0)):
            if hashlib.md5(t[s:s + k].encode()).hexdigest().startswith("0"):
                out.append((s, t[s:s + window]))
        return out

    bset = {w for _, t in bench for _, w in wins(t)}
    want = {}
    for i, t in corpus:
        spans = [(s, s + window) for s, w in wins(t) if w in bset]
        merged = []
        for s, e in sorted(spans):
            if merged and merged[-1][1] >= s:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        pos, parts = 0, []
        for s, e in merged:
            parts.append(t[pos:s]); pos = e
        parts.append(t[pos:])
        want[i] = ("".join(parts), len(merged), sum(e - s for s, e in merged))

    from ncbi_analysis_spark.operators.dedup import remove_bench_spans
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "bench_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_spans_removed"], r["n_chars_removed"])
           for r in remove_bench_spans(cdf, bdf, "text", "doc_id",
                                       window=window).collect()}
    assert got == want
    assert any(v[1] > 0 for v in want.values())


def test_corpus_diff_statuses_and_null_text(spark):
    """All four statuses; NULL-text docs are PRESENT (never masquerade
    as added/removed) and two NULL-text versions compare unchanged."""
    from ncbi_analysis_spark.operators.dedup import corpus_diff

    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "goes away"),
         (5, None), (6, None)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "Same   TEXT"),          # normalizes equal -> unchanged
         (2, "has changed"),          # changed
         (4, "brand new"),            # added
         (5, None),                   # NULL -> NULL : unchanged
         (6, "text now")],            # NULL -> text : changed
        "doc_id long, text string")
    got = {r["doc_id"]: r["status"]
           for r in corpus_diff(old, new, "text", "doc_id").collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "added", 5: "unchanged", 6: "changed"}


def test_nonascii_probe_cap_bounds_and_observes(spark):
    """The non-ASCII O(L²) corner is bounded (round-7 review ask): a
    long non-ASCII document's anchor probe stops at max_nonascii_probe,
    a duplicated passage inside the cap is still removed, one past the
    cap is missed BY CONTRACT (observable via the CollectMetrics node),
    cap=0 disables the bound, and ASCII rows are never truncated."""
    dup = ("käsekuchen rezept mit vanille und zitrone für alle " * 3)[:120]
    filler_a = "ä" * 600
    filler_b = "ö" * 600
    rows = [(1, filler_a[:200] + dup + filler_a[200:]),
            (2, filler_b[:250] + dup + filler_b[250:])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # cap above the dup position: doc 2's copy is removed
    out = {r["doc_id"]: r for r in remove_dup_spans(
        df, "text", "doc_id", window=32,
        max_nonascii_probe=1024).collect()}
    assert out[2]["n_chars_removed"] > 0
    # cap below the dup position: doc 2's copy is never probed
    out_lo = {r["doc_id"]: r for r in remove_dup_spans(
        df, "text", "doc_id", window=32,
        max_nonascii_probe=64).collect()}
    assert out_lo[2]["n_chars_removed"] == 0
    assert out_lo[2]["text"] == rows[1][1]
    # cap=0 disables the bound entirely
    out_off = {r["doc_id"]: r for r in remove_dup_spans(
        df, "text", "doc_id", window=32,
        max_nonascii_probe=0).collect()}
    assert out_off[2]["n_chars_removed"] == out[2]["n_chars_removed"]
    # the truncation is observable: the capped plan carries the
    # anchored_probe_cap CollectMetrics node, the uncapped plan doesn't
    from ncbi_analysis_spark.operators.dedup import _anchored_windows

    capped_plan = _anchored_windows(
        df, "text", "doc_id", 32, 8, 4, "md5", max_nonascii_probe=100
    )._jdf.queryExecution().analyzed().toString()
    assert "anchored_probe_cap_" in capped_plan
    uncapped_plan = _anchored_windows(
        df, "text", "doc_id", 32, 8, 4, "md5", max_nonascii_probe=0
    )._jdf.queryExecution().analyzed().toString()
    assert "anchored_probe_cap_" not in uncapped_plan
    # ASCII rows take the linear byte path and are never truncated: the
    # same shape in ASCII with a tiny cap still finds the shared
    # passage sitting far past the cap
    shared = ("THE SHARED ASCII PASSAGE COPIED VERBATIM ACROSS MIRRORS "
              "WITH MORE THAN ENOUGH LENGTH FOR SEVERAL ANCHOR SEEDS")
    arows = [(1, "x " * 300 + shared), (2, "y " * 350 + shared)]
    adf = spark.createDataFrame(arows, "doc_id long, text string")
    aout = {r["doc_id"]: r for r in remove_dup_spans(
        adf, "text", "doc_id", window=32,
        max_nonascii_probe=64).collect()}
    assert aout[2]["n_chars_removed"] > 0
