"""Connected components over near-duplicate pair edges.

The pair generators (``dedup.minhash_lsh_pairs`` / ``simhash_pairs`` /
``ngram_jaccard_pairs`` / ``embedding_dup_pairs``) emit edges; offline
corpus dedup clusters those edges into components and keeps one
representative per component (the pairwise smaller-id drop used by
``plans.curation`` is the streaming-friendly approximation — it can
over-drop on chains a-b, b-c where the component rule keeps only a).

Algorithm: iterative minimum-label propagation with pointer jumping —
each round sets ``label(u) <- min(label(u), min neighbor label,
label(label(u)))``. Plain propagation moves the minimum one hop per
round (O(diameter) rounds); the pointer-jump join halves the remaining
distance each round, giving O(log D) convergence, the same asymptotics
as the large-star/small-star map-reduce formulation with a simpler
fixpoint test.

Scale posture (100 TB corpus):
- Every round is two hash joins + one min aggregation, all keyed by
  node id — ordinary shuffles, no driver-side data.
- Labels are ``localCheckpoint``-ed each round: an iterative DataFrame
  loop otherwise doubles its lineage every round and re-executes the
  whole history at each action (the standard Spark iterative-algorithm
  discipline; on a cluster use ``checkpoint`` to reliable storage for
  fault tolerance instead).
- The fixpoint test is an observe() aggregate riding the checkpoint's
  own materializing job (a scalar to the driver, no extra join or scan
  per round).
- Near-dup components are overwhelmingly tiny — the generators cap hot
  buckets (``max_band_freq``/``max_shingle_freq``) precisely so no
  quadratic mega-component exists — so rounds ~= log(max diameter),
  single digits in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _unpersist_checkpoint(df: DataFrame) -> None:
    """Free the block-manager storage behind a ``localCheckpoint``-ed
    DataFrame.  Spark has no public API for this — the checkpoint RDD is
    reachable only through the analyzed ``LogicalRDD`` plan node — so any
    failure (plan shape change, Connect mode) is swallowed: the blocks
    then simply live until the context's GC-based cleaner drops them,
    which is the pre-cleanup behavior."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Label each node reachable through ``edges`` with the smallest
    node id in its component.

    Returns ``(id, component)`` for every node appearing in at least
    one edge (isolated rows never enter the edge list and need no
    label). Raises if the fixpoint is not reached within ``max_iter``
    rounds — with pointer jumping that bounds component diameter at
    ~2**max_iter, so hitting it means the edge set is degenerate.
    """
    sym = (
        edges.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .union(edges.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
    )
    # The edge set is static across rounds but its lineage (often a full
    # LSH pair-generation pipeline) is NOT: without materializing it
    # here, every round's join re-executes that upstream pipeline.
    # Measured at sf0.1 this checkpoint cut dedup_dup_clusters from
    # 5.3s to 2.8s min-of-3 (one pair generation instead of one per
    # round).
    sym = sym.localCheckpoint(eager=True)
    labels = sym.select(F.col("u").alias("id")).distinct() \
                .withColumn("label", F.col("id"))
    labels = labels.localCheckpoint(eager=True)

    from pyspark.sql import Observation

    for _ in range(max_iter):
        # min label among neighbors
        nbr = (
            sym.join(labels.withColumnRenamed("id", "v"), "v")
            .groupBy("u").agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("u", "id")
        )
        prop = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.col("label").alias("old_label"),
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            )
        )
        # pointer jump: also adopt the current label OF my label
        parent = prop.select(F.col("id").alias("label"), F.col("label").alias("parent_label"))
        jumped = (
            prop.join(parent, "label", "left")
            .select(
                "id",
                "old_label",
                F.least(F.col("label"), F.coalesce("parent_label", "label")).alias("label"),
            )
        )
        # fixpoint test rides the SAME job as the checkpoint: the old
        # label is threaded through the round so `changed` is an
        # observe() aggregate of the materializing action — the previous
        # formulation paid an extra join + count scan per round
        obs = Observation()
        jumped = jumped.observe(
            obs, F.sum((F.col("label") != F.col("old_label")).cast("long")).alias("n")
        ).select("id", "label")
        jumped = jumped.localCheckpoint(eager=True)
        changed = obs.get["n"] or 0
        # The previous round's label checkpoint is dead once `changed`
        # has been computed from it; without an explicit unpersist every
        # round's blocks accrete in the block manager until the session's
        # GC cleaner runs — harmless over single-digit rounds, real
        # storage pressure over long chains.
        _unpersist_checkpoint(labels)
        labels = jumped
        if changed == 0:
            _unpersist_checkpoint(sym)
            return labels.select("id", F.col("label").alias("component"))
    _unpersist_checkpoint(sym)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "the edge set has a pathological component; raise max_iter or "
        "cap the pair generators' bucket sizes"
    )


def component_dups(
    edges: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Ids to DROP under component dedup: every member of each
    component except its smallest id. Returns one ``(id)`` column.

    Compared to the pairwise smaller-id drop, this never removes a
    whole chain: for edges a-b, b-c the pairwise rule drops b and c;
    the component rule also drops b and c — but for a-b, b-c with the
    pairwise rule applied to (b,c) BEFORE (a,b) nothing protects b's
    survivor role; component dedup always keeps exactly one
    representative (the min id) per near-dup cluster.
    """
    comp = connected_components(edges, id_a, id_b)
    return comp.filter(F.col("id") != F.col("component")).select("id")


def connected_components_incremental(
    prior: DataFrame,
    new_edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Fold a NEW batch of edges into an existing component labeling
    without re-clustering the whole graph.

    ``prior`` is a correct ``(id, component)`` labeling of all edges
    seen so far (the output of :func:`connected_components` or of a
    previous incremental fold); ``new_edges`` is the incoming batch.
    Returns the ``(id, component)`` labeling of the UNION graph —
    exactly what ``connected_components(old_edges UNION new_edges)``
    would return, because a min-id component labeling is a star forest
    that preserves connectivity: CC(star(prior) ∪ new) = CC(old ∪ new).

    Only the AFFECTED region is re-clustered: components incident to a
    new-edge endpoint are pulled in (all their members, via the prior
    star edges, so a merged component's new minimum is found wherever
    it lives), everything else passes through one anti-join untouched —
    no new edge lands on an untouched component, so its label cannot
    change. The iterative loop therefore runs over
    O(|batch| + |touched members|) rows, not the full corpus: a daily
    crawl append re-clusters the day's near-dup neighborhoods, not the
    multi-billion-node history. Star edges have depth 1, so the
    pointer-jumping fixpoint converges in O(log(batch chain length))
    rounds regardless of how large the prior components are.

    Multi-batch folding composes: fold(fold(CC(E1), E2), E3) ≡
    CC(E1 ∪ E2 ∪ E3) (property-tested over random interleavings).
    """
    new_sym = (
        new_edges.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .union(new_edges.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
    )
    # One materialization of the batch: endpoints, touched components,
    # and the sub-clustering all reuse it (its lineage is often a full
    # LSH pair-generation pipeline — see connected_components).
    new_sym = new_sym.localCheckpoint(eager=True)
    ends = new_sym.select(F.col("u").alias("id")).distinct()
    # Materialized so the returned (lazy) result no longer reads the
    # batch checkpoint — one component id per touched component, the
    # small side of every join below.
    touched_comps = (
        prior.join(ends, "id").select("component").distinct()
        .localCheckpoint(eager=True)
    )
    affected = prior.join(touched_comps, "component")
    untouched = prior.join(touched_comps, "component", "left_anti")
    # Prior labeling as star edges (id -> component); self-loops of the
    # representatives carry no connectivity, but a representative with
    # no other member must still enter the subgraph — it does, either
    # as a new-edge endpoint (how else could its singleton component be
    # touched?) or via a member's star edge.
    star = (
        affected.filter(F.col("id") != F.col("component"))
        .select(F.col("id").alias("id_a"), F.col("component").alias("id_b"))
    )
    batch = new_sym.select(F.col("u").alias("id_a"), F.col("v").alias("id_b"))
    sub = connected_components(star.union(batch), "id_a", "id_b", max_iter)
    _unpersist_checkpoint(new_sym)
    return untouched.select("id", "component").union(
        sub.select("id", "component")
    )


# ---------------------------------------------------------------------------
# Persisted component-labels artifact — the production crawl loop, where
# yesterday's clustering is a durable table and each day FOLDS its new
# edges in rather than re-clustering history.
# ---------------------------------------------------------------------------

_CC_PARAMS_FILE = "_cc_params.json"


def write_cc_labels(edges: DataFrame, path: str,
                    id_a: str = "id_a", id_b: str = "id_b") -> None:
    """Cluster ``edges`` and persist the ``(id, component)`` labeling as
    a parquet artifact with a parameter marker — the starting point of
    the incremental loop (``fold_into_cc_labels`` thereafter). The
    labels table is two narrow columns, one row per noded id."""
    from ncbi_analysis_spark.sources import fsutil

    labels = connected_components(edges, id_a, id_b)
    labels.write.mode("overwrite").parquet(path)
    fsutil.write_text(edges.sparkSession, path.rstrip("/") + "/"
                      + _CC_PARAMS_FILE, '{"kind": "cc_labels"}')


def read_cc_labels(spark, path: str) -> DataFrame:
    """Open a ``write_cc_labels`` artifact (marker validated)."""
    from ncbi_analysis_spark.sources import fsutil

    if not fsutil.exists(spark, path.rstrip("/") + "/" + _CC_PARAMS_FILE):
        raise ValueError(
            f"{path!r} is not a write_cc_labels directory (missing "
            f"{_CC_PARAMS_FILE}); build it with write_cc_labels first"
        )
    return spark.read.parquet(path)


def fold_into_cc_labels(new_edges: DataFrame, path: str,
                        id_a: str = "id_a", id_b: str = "id_b",
                        max_iter: int = 25) -> None:
    """Fold a new edge batch into the persisted labels IN PLACE:
    read the artifact, run :func:`connected_components_incremental`
    (only components incident to the batch re-cluster), rewrite through
    the hidden-tmp + two-phase swap (``tombstones.swap_partition_dirs``
    — a crash at any rename is recovered by the next fold, and
    mid-crash readers fail loudly rather than see a partial table), all
    under the index family's maintenance lock (two concurrent folds
    would each base their rewrite on the same prior and lose one
    batch's merges).

    Folding is replay-idempotent (re-folding an already-folded batch is
    a semantic no-op — the property test), so an at-least-once crawl
    scheduler needs no dedup ledger around this call.

    Scale note: the FOLD touches only affected components, but the
    rewrite currently lands the whole labels table (two narrow columns;
    ~16 bytes/row of parquet before encoding). At billions of nodes,
    partition the artifact by a stable hash of ``id`` and rewrite only
    partitions containing touched ids — the layout is compatible with
    that upgrade; the contract (fold ≡ full recompute) is what the
    oracle pins either way."""
    from ncbi_analysis_spark.operators import tombstones as ts
    from ncbi_analysis_spark.sources import fsutil

    spark = new_edges.sparkSession
    # marker-only guard (NOT read_cc_labels): a half-swapped artifact —
    # exactly what a crashed fold leaves — has all its data files
    # retired, so a parquet read here would fail before the recovery
    # below could run
    if not fsutil.exists(spark, path.rstrip("/") + "/" + _CC_PARAMS_FILE):
        raise ValueError(
            f"{path!r} is not a write_cc_labels directory (missing "
            f"{_CC_PARAMS_FILE}); build it with write_cc_labels first"
        )
    with ts.maintenance_lock(spark, path, "fold_into_cc_labels"):
        ts.resume_pending_swap(spark, path)
        prior = spark.read.parquet(path)
        folded = connected_components_incremental(
            prior, new_edges, id_a, id_b, max_iter)
        tmp = "_compact_tmp"
        # the fold's plan reads the CURRENT files; materialize before
        # the swap replaces them underneath it
        folded = folded.localCheckpoint(eager=True)
        folded.write.mode("overwrite").parquet(
            path.rstrip("/") + "/" + tmp)
        ts.swap_partition_dirs(spark, path, tmp)
        _unpersist_checkpoint(folded)
