"""Round-11 staged driver queries.

New operators built in round 10 stage here (the ``--staged`` leg of
``scripts/check_oracle.py`` and the ahead-of-registration bench loop in
``bench.py``) and get wired into the main driver gate at round-11 start
— the standing one-round staging pattern (see driver_queries_r10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# HLL snapshot merge (round-10; r9 verdict stretch ask 8)
# ---------------------------------------------------------------------------


def hll_merge_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability contract of the HLL register tables, oracle-pinned
    (operators/sketches.py::hll_merge): split events into two disjoint
    "crawl snapshots" (event_id parity — the incremental-crawl shape
    where each snapshot publishes its own sketch), build each snapshot's
    per-event-type register table independently, merge with the
    register-wise max, and return the merged registers.

    The oracle computes the register table of the UNION directly (one
    pass over all events) — exact row match therefore proves
    ``merge(sketch(A), sketch(B)) == sketch(A ∪ B)`` register-for-
    register, the property that lets corpus-lifetime cardinality be a
    max-groupBy over published snapshot sketches with no re-scan of old
    data. Every value is integer (md5 carve + bin-length rho)."""
    from ncbi_analysis_spark.operators.sketches import (
        hll_merge,
        hll_registers,
    )
    from ncbi_analysis_spark.plans.driver_queries import _events

    ev = _events(spark, sf_dir).select("event_id", "event_type", "user_id")
    snap_a = ev.filter(F.col("event_id") % 2 == 0)
    snap_b = ev.filter(F.col("event_id") % 2 == 1)
    ra = hll_registers(snap_a, "user_id", p=8, group_by=["event_type"])
    rb = hll_registers(snap_b, "user_id", p=8, group_by=["event_type"])
    return hll_merge(ra, rb, group_by=["event_type"])


_HLL_MERGE_SQL = """
WITH vals AS (
  SELECT event_type, user_id FROM events WHERE user_id IS NOT NULL
),
hx AS (SELECT event_type, md5(user_id::VARCHAR) AS h FROM vals),
rr AS (
  SELECT event_type,
         ('0x' || substr(h, 1, 2))::BIGINT AS register,
         ('0x' || substr(h, 3, 13))::BIGINT AS w
  FROM hx
)
SELECT event_type, register::INT AS register,
       MAX(CASE WHEN w = 0 THEN 53
                ELSE 52 - length(bin(w)) + 1 END)::INT AS max_rho
FROM rr GROUP BY event_type, register
"""


# ---------------------------------------------------------------------------
# PCA variance gate on the moments fit (round-10; r9 verdict stretch 9)
# ---------------------------------------------------------------------------

_VARIANCE_THRESHOLDS_PPM = (250_000, 500_000, 750_000, 900_000)


def pca_variance_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle coverage for the distributed moments fit
    (operators/embeddings.py::pca_fit_moments — the at-scale all-rows
    estimator; only the sampled fit was oracled before): fit the FULL
    eigen spectrum (k = d) from the one-pass Arrow-batched moment
    partials, then answer the model-sizing question a curation pipeline
    asks before projecting — for each variance target, how many
    principal axes are needed (``k_star``) and what fraction is actually
    captured at that k (``captured_ppm``).

    The moments path is value-deterministic but not bit-pinned (float
    partial-sum order across partitions), so the oracled row reduces it
    to comparison-robust integers: threshold ranks over cumulative
    ratios (flip needs |cum - t| < ~1e-12) and a ppm floor (flip needs
    the 1e-15-relative engine gap to land within ~1e-9 of a ppm
    boundary). The oracle re-derives the spectrum with the independent
    single-pass local twin (``pca_fit_moments_local``) and computes the
    same gates in SQL over the eigenvalue literals."""
    from ncbi_analysis_spark.operators import embeddings as em

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = len(e.select("embedding").head()["embedding"])
    _, _, eig = em.pca_fit_moments(e, k=d)
    total = float(eig.sum())
    ratios = em.explained_variance_ratio(eig, total)
    cum = ratios.cumsum()
    rows = []
    for t_ppm in _VARIANCE_THRESHOLDS_PPM:
        t = t_ppm / 1_000_000.0
        k_star = 1 + int((cum < t).sum())  # first index with cum >= t
        rows.append(
            (t_ppm, k_star, int(cum[k_star - 1] * 1_000_000.0))
        )
    return spark.createDataFrame(
        rows, "threshold_ppm bigint, k_star bigint, captured_ppm bigint"
    )


def _pca_variance_gate_sql() -> str:
    from ncbi_analysis_spark.operators.embeddings import (
        pca_fit_moments_local,
    )
    from ncbi_analysis_spark.plans.driver_queries_r5 import (
        _dlit,
        _oracle_sf_dir,
    )

    import pyarrow.parquet as pq

    path = f"{_oracle_sf_dir()}/embeddings.parquet"
    d = len(pq.read_table(path, columns=["embedding"])["embedding"][0])
    _, _, eig = pca_fit_moments_local(path, k=d)
    e_lit = "[" + ", ".join(_dlit(x) for x in eig) + "]::DOUBLE[]"
    th = ", ".join(f"({t})" for t in _VARIANCE_THRESHOLDS_PPM)
    return f"""
WITH lit AS (SELECT {e_lit} AS e),
tot AS (SELECT list_reduce(e, (a, b) -> a + b) AS s FROM lit),
cum AS (
  SELECT j,
         list_reduce(e[1:j], (a, b) -> a + b) / s AS c
  FROM lit, tot, (SELECT unnest(range(1, {d + 1})) AS j)
),
th(t_ppm) AS (VALUES {th})
SELECT t_ppm::BIGINT AS threshold_ppm,
       min(j)::BIGINT AS k_star,
       floor(min_by(c, j) * 1000000.0)::BIGINT AS captured_ppm
FROM th JOIN cum ON c >= t_ppm / 1000000.0
GROUP BY t_ppm
"""


def queries_r11() -> dict:
    return {
        "hll_merge_snapshots": hll_merge_snapshots,
        "pca_variance_gate": pca_variance_gate,
    }


def oracle_sql_r11() -> dict[str, str]:
    return {
        "hll_merge_snapshots": _HLL_MERGE_SQL,
        "pca_variance_gate": _pca_variance_gate_sql(),
    }
