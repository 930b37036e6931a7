"""Exact-sequence clustering (SURVEY.md §2.3 J1, §2.4 A2/A3).

Reference: O(n^2) pairwise loop comparing ``seq.upper()`` equality; first
unmatched element seeds a cluster; members + a representative sample are
retained (src/analysis/cluster_match.py:83-114).

Spark-first: the quadratic self-join collapses into a single hash
aggregation ``groupBy(upper(seq))`` — O(n) with map-side combine. The
representative "first member" is ``min_by`` on the member id, which is
deterministic (the reference's "first in file order" == smallest record
number).

Scale: one shuffle keyed by the (possibly long) sequence; for very long
sequences cluster on ``md5(upper(seq))`` instead to shrink shuffle bytes
(collision probability negligible) — exposed via ``key_hash``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cluster_by_key(
    df: DataFrame,
    key: Column,
    member_id: Column,
    key_alias: str = "cluster_key",
    key_hash: bool = False,
) -> DataFrame:
    """Group rows by ``key``; emit cluster key, size, sorted member list
    (comma-joined for cross-engine comparability) and the representative
    (minimum) member id.
    """
    k = F.md5(key) if key_hash else key
    return df.groupBy(k.alias(key_alias)).agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.array_join(F.sort_array(F.collect_list(member_id)), ",").alias("members"),
        F.min(member_id).alias("representative"),
    )
