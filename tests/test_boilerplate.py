"""Line-level boilerplate removal (operators/dedup.py::
remove_repeated_lines / boilerplate_lines) and the staged round-7
driver query, held to the driver's own bar: DuckDB oracle parity with
sorted-column / sorted-row exact-value comparison at sf0.001."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pandas as pd
import pytest

from ncbi_analysis_spark.operators.dedup import (
    boilerplate_lines,
    remove_repeated_lines,
)

SF_DIR = "/root/testdata/sf0.001"

# reuse the oracle harness's own canonicalizer — a local re-implementation
# could drift from what the driver-mimicking gate actually compares
_spec = importlib.util.spec_from_file_location(
    "check_oracle",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "check_oracle.py"),
)
_co = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_co)
_canon = _co.canon


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "COOKIE BANNER\nreal content zero\nCOOKIE BANNER\nfooter"),
        (1, "COOKIE BANNER\nreal content one\nfooter"),
        (2, "unique article two\nno chrome here"),
        (3, "COOKIE BANNER\nfooter"),  # fully boilerplate
        (4, ""),  # empty doc: one empty line, unique -> survives as-is
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_boilerplate_lines_spread(docs):
    got = {r["line"]: r["n_docs"] for r in
           boilerplate_lines(docs, "text", "doc_id", min_docs=2).collect()}
    # within-doc repeats (doc 0 has the banner twice) count once per doc
    assert got == {"COOKIE BANNER": 3, "footer": 3}


def test_remove_repeated_lines_semantics(docs):
    out = {r["doc_id"]: r for r in
           remove_repeated_lines(docs, "text", "doc_id", min_docs=2).collect()}
    assert len(out) == 5
    assert out[0]["text"] == "real content zero"
    assert (out[0]["n_lines"], out[0]["n_removed"]) == (4, 3)
    assert out[1]["text"] == "real content one"
    assert out[2]["text"] == "unique article two\nno chrome here"
    assert out[2]["n_removed"] == 0
    # fully-boilerplate document survives as an empty row, not a dropped one
    assert out[3]["text"] == ""
    assert (out[3]["n_lines"], out[3]["n_removed"]) == (2, 2)
    # the empty doc's single empty line is unique -> kept verbatim
    assert out[4]["text"] == ""
    assert (out[4]["n_lines"], out[4]["n_removed"]) == (1, 0)


def test_remove_repeated_lines_order_preserved(spark):
    # surviving lines must come back in original positions, not sorted
    rows = [(0, "zz\nBOILER\naa"), (1, "BOILER\nmm")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["text"] for r in
           remove_repeated_lines(df, "text", "doc_id", min_docs=2).collect()}
    assert out[0] == "zz\naa"
    assert out[1] == "mm"


def test_staged_r7_boilerplate_scrub_duckdb_parity(spark):
    from ncbi_analysis_spark.plans.driver_queries_r7 import (
        BOILERPLATE_SQL,
        boilerplate_scrub,
    )

    got = _canon(boilerplate_scrub(spark, SF_DIR).toPandas())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = _canon(con.sql(BOILERPLATE_SQL).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    # the scrub must actually remove something on the fixture corpus
    assert (got["n_removed"] > 0).any()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_all_staged_r7_queries_duckdb_parity(spark):
    """Every staged round-7 entry must already clear the exact-match bar
    the driver will apply at registration — same comparator as
    scripts/check_oracle.py, no weaker check for staged queries."""
    from ncbi_analysis_spark.plans.driver_queries_r7 import (
        oracle_sql_r7,
        queries_r7,
    )

    # trained-literal oracles (semantic_dedup_prune) must re-derive their
    # model floats from the SAME corpus the Spark side trains on — the
    # driver's check_oracle harness exports this env var for exactly that
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
    try:
        qs, oracles = queries_r7(), oracle_sql_r7()
    finally:
        del os.environ["SPARK_GRAFT_ORACLE_SF_DIR"]
    assert set(qs) == set(oracles)
    con = duckdb.connect()
    for t in _co.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    for name, fn in qs.items():
        got = fn(spark, SF_DIR).toPandas()
        want = con.sql(oracles[name]).df()
        issues = _co.compare(name, got, want)
        assert not issues, f"{name}: {issues}"
        assert len(got) > 0, name


def test_remove_repeated_lines_matches_python_model(spark):
    """Randomized corpora vs a from-scratch Python model: small vocab of
    lines (so cross-document repeats actually occur), random separators
    appearing inside line text is impossible by construction, empty
    lines and empty documents included."""
    import random

    rnd = random.Random(47)
    vocab = ["alpha", "beta beta", "COOKIE", "", "x", "longer line txt"]
    trials = [("\n", 2, True), ("|", 3, True), ("\n", 2, False)]
    for trial, (sep, min_docs, protect_empty) in enumerate(trials):
        docs = []
        for i in range(40):
            n = rnd.choice([1, 1, 2, 3, 5, 8])
            docs.append((i, sep.join(rnd.choice(vocab) for _ in range(n))))

        # model: line -> set of docs; survivors rejoined in order
        from collections import defaultdict
        spread = defaultdict(set)
        for i, t in docs:
            for ln in t.split(sep):
                spread[ln].add(i)
        boiler = {ln for ln, s in spread.items() if len(s) >= min_docs
                  and not (protect_empty and ln == "")}
        want = {}
        for i, t in docs:
            lines = t.split(sep)
            kept = [ln for ln in lines if ln not in boiler]
            want[i] = (sep.join(kept), len(lines), len(lines) - len(kept))

        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = remove_repeated_lines(df, "text", "doc_id", sep=sep,
                                    min_docs=min_docs,
                                    protect_empty=protect_empty).collect()
        assert len(got) == len(docs), trial
        for r in got:
            assert (r["text"], r["n_lines"], r["n_removed"]) == want[r["doc_id"]], (
                trial, r["doc_id"])


def test_remove_repeated_lines_protects_blank_lines(spark):
    rows = [(0, "para one\n\nBOILER"), (1, "para two\n\nBOILER")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["text"] for r in
           remove_repeated_lines(df, "text", "doc_id", min_docs=2).collect()}
    # the blank paragraph separator occurs in both docs but survives;
    # only the real boilerplate line is removed
    assert out[0] == "para one\n"
    assert out[1] == "para two\n"
    off = {r["doc_id"]: r["text"] for r in
           remove_repeated_lines(df, "text", "doc_id", min_docs=2,
                                 protect_empty=False).collect()}
    assert off[0] == "para one"


def test_remove_repeated_lines_null_text(spark):
    """NULL text behaves as the empty document (chunk_documents'
    posture) — not a junk n_lines=-1 / n_removed=-1 row (review
    finding: size(split(NULL)) = -1)."""
    rows = [(0, None), (1, "BOILER\nkeep"), (2, "BOILER\nalso keep")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           remove_repeated_lines(df, "text", "doc_id", min_docs=2).collect()}
    assert (out[0]["text"], out[0]["n_lines"], out[0]["n_removed"]) == ("", 1, 0)
    assert out[1]["text"] == "keep"
    assert out[2]["text"] == "also keep"


def test_dsir_local_twin_null_text_parity(spark, tmp_path):
    """dsir_logratios_local must agree with the Spark weights on a
    corpus containing NULL text (review finding: local counted NULL as
    '' while Spark drops NULL-text docs)."""
    from ncbi_analysis_spark.operators.terms import (
        dsir_logratios,
        dsir_logratios_local,
    )

    rows = [(0, "alpha beta gamma"), (1, None), (2, "alpha beta beta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.parquet(p)
    target = df.filter("doc_id = 0")
    spark_w = {r["bucket"]: r["w"] for r in
               dsir_logratios(target, df, "text", "doc_id",
                              n_buckets=64).collect()}
    local_w = dict(dsir_logratios_local(
        p, target_pred=lambda r: r["doc_id"] == 0, n_buckets=64))
    assert spark_w == local_w


def test_run_to_memory_timeout_raises(spark, tmp_path):
    """An overrunning availableNow drain must raise, not hand back a
    partial memory table (review finding; matches stream_to_parquet)."""
    import pytest

    from ncbi_analysis_spark.streaming import events as sev

    src = str(tmp_path / "src")
    spark.createDataFrame([(1,)], "v long").write.json(src)
    stream = spark.readStream.schema("v long").json(src)
    with pytest.raises(TimeoutError, match="PARTIAL"):
        # a fresh streaming query cannot finish within ~0s
        sev.run_to_memory(stream, "t_timeout_raise", timeout_s=0.001)


def test_exact_dedup_against_reference(spark):
    from ncbi_analysis_spark.operators.dedup import exact_dedup_against

    ref = spark.createDataFrame(
        [(100, "Seen Before"), (101, "also   seen")], ["doc_id", "text"])
    new = spark.createDataFrame(
        [(0, "seen before"),          # normalized match -> dropped
         (1, "ALSO SEEN"),            # case/space-insensitive -> dropped
         (2, "genuinely new")],
        ["doc_id", "text"])
    kept = sorted(r["doc_id"] for r in
                  exact_dedup_against(new, ref, "text").collect())
    assert kept == [2]
    # digest-table form: same result without reference text in play
    from pyspark.sql import functions as F
    from ncbi_analysis_spark.operators.dedup import normalize_text
    digests = ref.select(F.md5(normalize_text(F.col("text"))).alias("__ref_hash"))
    kept2 = sorted(r["doc_id"] for r in
                   exact_dedup_against(new, digests, "text").collect())
    assert kept2 == [2]
