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


class _fixpoint_conf:
    """Scoped session conf for the label-propagation loop: AQE off and
    an explicit shuffle-partition count derived from the materialized
    edge set's own layout.

    AQE re-plans after every exchange, which turns each round's single
    action into ~5 sequentially-submitted stage-jobs; at any scale that
    is 5 scheduler round-trips per round for a plan whose shape never
    changes. The partition count is NOT a constant: it is the
    checkpointed edge set's partition count (small at small scale,
    hundreds at corpus scale), so the setting is scale-adaptive the way
    AQE coalescing would be — measured r15 on the CC-fixpoint query
    family (guide §1.2 step 3: config after algorithm, with the
    algorithm's partitioning derived from the data)."""

    def __init__(self, spark, n_parts: int):
        self.spark = spark
        self.n_parts = max(1, int(n_parts))
        self.saved: dict[str, str | None] = {}

    _KEYS = ("spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions")

    def __enter__(self):
        for k in self._KEYS:
            try:
                self.saved[k] = self.spark.conf.get(k)
            except Exception:  # noqa: BLE001 — unset key
                self.saved[k] = None
        self.spark.conf.set("spark.sql.adaptive.enabled", "false")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n_parts))
        return self

    def __exit__(self, *exc):
        for k, v in self.saved.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)
        return False


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

    spark = edges.sparkSession
    with _fixpoint_conf(spark, sym.rdd.getNumPartitions()):
        return _cc_loop(sym, labels, max_iter)


def _cc_loop(sym: DataFrame, labels: DataFrame, max_iter: int) -> DataFrame:
    """The label-propagation rounds of :func:`connected_components`.
    Runs under ``_fixpoint_conf``; raises on non-convergence."""
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


def _cc_marker_guard(spark, path: str) -> None:
    from ncbi_analysis_spark.sources import fsutil

    if not fsutil.exists(spark, path.rstrip("/") + "/" + _CC_PARAMS_FILE):
        raise ValueError(
            f"{path!r} is not a write_cc_labels directory (missing "
            f"{_CC_PARAMS_FILE}); build it with write_cc_labels first"
        )


def _cc_current_version(spark, path: str) -> int:
    """Highest COMMITTED version under the artifact: a ``v{n}`` child
    counts only once its ``_SUCCESS`` file exists (parquet's commit
    marker, written last — one atomic create is the publish point).
    Raises if no committed version exists (crash before the first
    commit; rebuild with write_cc_labels)."""
    import re

    from ncbi_analysis_spark.sources import fsutil

    root = path.rstrip("/")
    best = -1
    for d in fsutil.list_subdirs(spark, root):
        m = re.fullmatch(r"v(\d+)", d)
        if m and fsutil.exists(spark, f"{root}/{d}/_SUCCESS"):
            best = max(best, int(m.group(1)))
    if best < 0:
        raise ValueError(
            f"{path!r} has no committed v* version — the initial "
            "write_cc_labels never finished; rebuild it"
        )
    return best


def write_cc_labels(edges: DataFrame, path: str,
                    id_a: str = "id_a", id_b: str = "id_b") -> None:
    """Cluster ``edges`` and persist the ``(id, component)`` labeling as
    a VERSIONED parquet artifact — the starting point of the
    incremental loop (``fold_into_cc_labels`` thereafter). Layout:
    ``{path}/v{n}/`` parquet dirs plus the ``_cc_params.json`` marker;
    readers use the highest version whose ``_SUCCESS`` exists, so a
    reader NEVER sees a partially-written table (the flat-directory
    swap would expose a shrinking file set mid-rewrite; a versioned
    publish point — one atomic ``_SUCCESS`` create — cannot).

    Rebuilding INTO AN EXISTING artifact is supported and lands at
    version ``max_committed + 1`` (under the maintenance lock): readers
    always use the highest committed version, so a rebuild that wrote
    ``v0`` beneath a ``v{n>0}`` would be silently invisible — the
    inverse of what "rebuild it" recovery advice promises."""
    from ncbi_analysis_spark.operators import tombstones as ts
    from ncbi_analysis_spark.sources import fsutil

    spark = edges.sparkSession
    root = path.rstrip("/")
    labels = connected_components(edges, id_a, id_b)
    if fsutil.exists(spark, root + "/" + _CC_PARAMS_FILE):
        with ts.maintenance_lock(spark, root, "write_cc_labels") as lk:
            try:
                n = _cc_current_version(spark, root)
            except ValueError:
                n = -1  # marker exists, initial build crashed: v0 it is
            lk.assert_owned()  # fence before the versioned publish
            labels.write.mode("overwrite").parquet(f"{root}/v{n + 1}")
            import re as _re

            for d in fsutil.list_subdirs(spark, root):
                m = _re.fullmatch(r"v(\d+)", d)
                if m and int(m.group(1)) < n:
                    fsutil.delete(spark, f"{root}/{d}")
        return
    labels.write.mode("overwrite").parquet(root + "/v0")
    fsutil.write_text(spark, root + "/" + _CC_PARAMS_FILE,
                      '{"kind": "cc_labels"}')


def read_cc_labels(spark, path: str) -> DataFrame:
    """Open a ``write_cc_labels`` artifact: the highest COMMITTED
    version (marker validated). Concurrency scope: the returned frame
    is LAZY and pinned to the version current at open time; folds
    publish new versions atomically and retire with one grace version,
    so a read opened at v{n} stays valid while v{n+1} is published and
    breaks (loudly, FileNotFound — never silently partial) only once a
    SECOND fold commits v{n+2} and retires v{n}. Reads that complete
    within one fold cycle of being opened are always safe; pin a
    longer-lived snapshot by copying or re-opening."""
    _cc_marker_guard(spark, path)
    n = _cc_current_version(spark, path)
    return spark.read.parquet(f"{path.rstrip('/')}/v{n}")


def fold_into_cc_labels(new_edges: DataFrame, path: str,
                        id_a: str = "id_a", id_b: str = "id_b",
                        max_iter: int = 25) -> None:
    """Fold a new edge batch into the persisted labels: read the
    current version, run :func:`connected_components_incremental`
    (only components incident to the batch re-cluster), publish the
    result as version n+1, retire older versions. Runs under the index
    family's maintenance lock (two concurrent folds would each base
    their rewrite on the same prior and lose one batch's merges) —
    but READERS never lock and never see partial data: the publish
    point is ``v{n+1}/_SUCCESS`` (one atomic create), and the prior
    version's files are untouched until the new one is committed.

    Crash anywhere → the artifact still reads as version n (an
    uncommitted ``v{n+1}`` has no ``_SUCCESS`` and is ignored, then
    overwritten by the retry); crash between commit and retire → both
    versions committed, readers use n+1, the next fold cleans up.
    Folding is replay-idempotent (re-folding an already-folded batch is
    a semantic no-op — the property test), so an at-least-once crawl
    scheduler needs no dedup ledger around this call.

    Scale note: the FOLD touches only affected components, but the
    publish lands the whole labels table (two narrow columns;
    ~16 bytes/row of parquet before encoding). At billions of nodes,
    hash-partition the version dirs and republish only partitions
    containing touched ids — the versioned layout is compatible with
    that upgrade; the contract (fold ≡ full recompute) is what the
    oracle pins either way."""
    from ncbi_analysis_spark.operators import tombstones as ts
    from ncbi_analysis_spark.sources import fsutil

    spark = new_edges.sparkSession
    _cc_marker_guard(spark, path)
    root = path.rstrip("/")
    with ts.maintenance_lock(spark, root, "fold_into_cc_labels") as lk:
        n = _cc_current_version(spark, root)
        prior = spark.read.parquet(f"{root}/v{n}")
        folded = connected_components_incremental(
            prior, new_edges, id_a, id_b, max_iter)
        # overwrite clears any uncommitted v{n+1} a crashed fold left
        lk.assert_owned()  # fence before the versioned publish
        folded.write.mode("overwrite").parquet(f"{root}/v{n + 1}")
        # retire with ONE GRACE VERSION: keep v{n} alongside v{n+1}.
        # read_cc_labels returns a LAZY frame pinned to the version
        # current at open time; retiring v{n} here would break a
        # reader whose action runs after this fold commits. With the
        # grace version, a pinned read survives one full fold cycle —
        # see read_cc_labels' concurrency note for the exact scope.
        import re as _re

        for d in fsutil.list_subdirs(spark, root):
            m = _re.fullmatch(r"v(\d+)", d)
            if m and int(m.group(1)) < n:
                fsutil.delete(spark, f"{root}/{d}")


def verify_cc_labels(spark, path: str) -> list[dict]:
    """Integrity audit (fsck) of a ``write_cc_labels`` artifact — the
    read-only check you run after a restore/migration before trusting
    the labeling, completing the persisted-family fsck set
    (``verify_{lsh,ivf,bm25}_index``). Returns
    ``[{check, ok, detail}, ...]`` (driver-sized); raises only when the
    directory is not a labels artifact at all. Checks:

    * marker parseable with the expected kind;
    * at least one COMMITTED version, and no residue OLDER than the
      one grace version the fold retire keeps (older dirs mean a
      crashed retire — harmless to readers, flagged for cleanup);
    * lock state (live vs TTL-expired) via the shared legs;
    * current version's table shape: exactly ``(id, component)``, no
      NULLs, and EVERY component label is itself a member id — the
      min-label invariant (a label pointing at a non-member means the
      table was hand-edited or mixed across artifacts).

    Never repairs — a broken current version is recovered by
    re-running ``write_cc_labels`` (which lands at max_committed+1).
    """
    import re

    from ncbi_analysis_spark.operators import tombstones as ts
    from ncbi_analysis_spark.sources import fsutil

    _cc_marker_guard(spark, path)  # raises on non-artifact dirs
    root = path.rstrip("/")
    out = [{"check": "params_marker", "ok": True,
            "detail": fsutil.read_text(spark, f"{root}/{_CC_PARAMS_FILE}")}]
    out.extend(ts.shared_integrity_checks(spark, root, "id"))

    committed, uncommitted = [], []
    for d in fsutil.list_subdirs(spark, root):
        m = re.fullmatch(r"v(\d+)", d)
        if not m:
            continue
        (committed if fsutil.exists(spark, f"{root}/{d}/_SUCCESS")
         else uncommitted).append(int(m.group(1)))
    cur = max(committed) if committed else None
    out.append({
        "check": "committed_version",
        "ok": cur is not None,
        "detail": (f"current v{cur}; committed {sorted(committed)}, "
                   f"uncommitted {sorted(uncommitted)}"),
    })
    if cur is not None:
        stale = [v for v in committed if v < cur - 1]
        out.append({
            "check": "retire_residue",
            "ok": not stale,
            "detail": ("" if not stale else
                       f"versions older than the grace version remain: "
                       f"{sorted(stale)} — a crashed retire; safe to "
                       "delete, the next fold will"),
        })
        try:
            rows = spark.read.parquet(f"{root}/v{cur}")
            cols = sorted(rows.columns)
            out.append({"check": "schema", "ok": cols == ["component", "id"],
                        "detail": f"columns: {cols}"})
            n_null = rows.filter(
                F.col("id").isNull() | F.col("component").isNull()).count()
            out.append({"check": "no_nulls", "ok": n_null == 0,
                        "detail": f"{n_null} null id/component rows"})
            orphan = (
                rows.select(F.col("component").alias("id")).distinct()
                .join(rows.select("id").distinct(), "id", "left_anti")
                .count()
            )
            out.append({
                "check": "labels_are_members",
                "ok": orphan == 0,
                "detail": (f"{orphan} component labels that are not "
                           "member ids (min-label invariant)"),
            })
        except Exception as exc:  # noqa: BLE001 — report, never crash fsck
            out.append({"check": "readable", "ok": False,
                        "detail": str(exc).split("\n")[0][:200]})
    return out


# ---------------------------------------------------------------------------
# Partition-versioned labels artifact — the billions-of-nodes upgrade the
# flat artifact's docstring promises: a fold republishes ONLY partitions
# containing touched ids, with one atomic manifest rename as the
# cross-partition commit point.
# ---------------------------------------------------------------------------

_CCP_PARAMS_FILE = "_ccp_params.json"
_CCP_MANIFEST_RE = r"_manifest_m(\d+)\.json"


def _ccp_params(spark, path: str) -> dict:
    import json

    from ncbi_analysis_spark.sources import fsutil

    p = path.rstrip("/") + "/" + _CCP_PARAMS_FILE
    if not fsutil.exists(spark, p):
        raise ValueError(
            f"{path!r} is not a write_cc_labels_parted directory "
            f"(missing {_CCP_PARAMS_FILE}); build it with "
            "write_cc_labels_parted first"
        )
    return json.loads(fsutil.read_text(spark, p))


def _ccp_current_manifest(spark, path: str) -> tuple[int, dict[int, int]]:
    """Highest committed manifest ``(seq, {partition: version})``.
    Manifests commit via atomic rename, so any present file is
    complete; raises when none exists (crash before the first
    publish)."""
    import json
    import re

    from ncbi_analysis_spark.sources import fsutil

    root = path.rstrip("/")
    best = -1
    for c in fsutil.list_children(spark, root):
        m = re.fullmatch(_CCP_MANIFEST_RE, c)
        if m:
            best = max(best, int(m.group(1)))
    if best < 0:
        raise ValueError(
            f"{path!r} has no committed manifest — the initial "
            "write_cc_labels_parted never finished; rebuild it"
        )
    doc = json.loads(
        fsutil.read_text(spark, f"{root}/_manifest_m{best}.json"))
    return best, {int(k): int(v) for k, v in doc["parts"].items()}


def _ccp_part_col(id_col, n_parts: int):
    return F.pmod(F.hash(id_col), F.lit(n_parts)).cast("int")


def _ccp_publish(spark, root: str, labels: DataFrame,
                 touched: list[int], prev: dict[int, int],
                 seq: int, n_parts: int, fence=None) -> None:
    """Stage the touched partitions' rows, move each into place, then
    commit with one atomic manifest rename. Crash anywhere before the
    rename → the previous manifest still governs and every staged/
    half-moved version is an unreferenced orphan the retry overwrites
    and the next retire removes."""
    import json
    import uuid

    from ncbi_analysis_spark.sources import fsutil

    new_parts = dict(prev)
    if touched:
        stage = f"{root}/_stage_{uuid.uuid4().hex}"
        (labels.withColumn("__part", _ccp_part_col(F.col("id"), n_parts))
         .filter(F.col("__part").isin([int(h) for h in touched]))
         # REBALANCE(__part): cluster the staged write so file count
         # tracks per-partition data size, not upstream task count
         # (tasks × touched-partitions tiny files otherwise)
         .hint("rebalance", F.col("__part"))
         .write.partitionBy("__part").parquet(stage))
        staged = {int(d.split("=", 1)[1])
                  for d in fsutil.list_subdirs(spark, stage)
                  if d.startswith("__part=")}

        def _move(h: int) -> int:
            v = prev.get(h, -1) + 1
            dst = f"{root}/part={h}/v{v}"
            fsutil.delete(spark, dst)  # crashed-attempt residue
            fs, jdst, _ = fsutil._fs_path(spark, dst)
            parent = jdst.getParent()
            if parent is not None:
                fs.mkdirs(parent)
            fsutil.rename(spark, f"{stage}/__part={h}", dst)
            return v

        moved = [h for h in sorted(touched) if h in staged]
        for h in sorted(touched):
            if h not in staged:
                # a touched partition no current row hashes into (tiny
                # graphs, a sparse id space, or a rebuild whose new edge
                # set no longer covers ids that used to live here): drop
                # it from the manifest so readers don't serve the OLD
                # rows — the stale version dir becomes unreferenced and
                # the next retire sweeps it. Inheriting prev[h] here
                # would silently union stale ids into a shrinking
                # rebuild's result.
                new_parts.pop(h, None)
        # the per-partition moves touch DISJOINT dirs and nothing is
        # committed until the manifest rename below — overlap the
        # latency-bound FS round-trips (crash mid-moves leaves some
        # subset staged-in-place, exactly like the old sequential loop's
        # prefix; the retry overwrites and the next retire sweeps)
        from ncbi_analysis_spark.operators.concurrency import run_jobs

        for h, v in zip(moved, run_jobs(
                *[(lambda h=h: _move(h)) for h in moved])):
            new_parts[h] = v
        fsutil.delete(spark, stage)
    manifest = {"seq": seq, "parts": {str(h): v
                                      for h, v in new_parts.items()}}
    if fence is not None:
        # owner fence immediately before THE commit (the manifest
        # rename): a stolen-and-reclaimed lock aborts here with every
        # staged version dir unreferenced
        fence()
    tmp = f"{root}/_manifest_tmp_{uuid.uuid4().hex}"
    fsutil.write_text(spark, tmp, json.dumps(manifest))
    fsutil.rename(spark, tmp, f"{root}/_manifest_m{seq}.json")


def _ccp_retire(spark, root: str, keep: list[dict[int, int]],
                keep_seqs: list[int]) -> None:
    """Delete partition versions referenced by NO kept manifest, and
    manifests outside ``keep_seqs`` — the grace rule: the previous
    manifest's versions survive one fold, so a lazy reader opened
    before the fold stays valid through it."""
    import re

    from ncbi_analysis_spark.sources import fsutil

    from ncbi_analysis_spark.operators.concurrency import run_jobs

    live: dict[int, set[int]] = {}
    for parts in keep:
        for h, v in parts.items():
            live.setdefault(h, set()).add(v)

    def _sweep_part(child: str, h: int) -> None:
        # each partition's list+deletes are independent of every other
        # partition's — the sweeps overlap (latency-bound FS ops)
        for d in fsutil.list_subdirs(spark, f"{root}/{child}"):
            mv = re.fullmatch(r"v(\d+)", d)
            if mv and int(mv.group(1)) not in live.get(h, set()):
                fsutil.delete(spark, f"{root}/{child}/{d}")

    sweeps = []
    for child in fsutil.list_subdirs(spark, root):
        m = re.fullmatch(r"part=(\d+)", child)
        if m:
            sweeps.append(
                lambda child=child, h=int(m.group(1)):
                _sweep_part(child, h))
    run_jobs(*sweeps)
    for c in fsutil.list_children(spark, root):
        mm = re.fullmatch(_CCP_MANIFEST_RE, c)
        if mm and int(mm.group(1)) not in keep_seqs:
            fsutil.delete(spark, f"{root}/{c}")
        if c.startswith("_stage_") or c.startswith("_manifest_tmp_"):
            fsutil.delete(spark, f"{root}/{c}")


def write_cc_labels_parted(edges: DataFrame, path: str,
                           n_parts: int = 64,
                           id_a: str = "id_a", id_b: str = "id_b") -> None:
    """Cluster ``edges`` and persist ``(id, component)`` as a
    PARTITION-VERSIONED artifact: ``{path}/part={h}/v{k}/`` parquet
    dirs (h = pmod(hash(id), n_parts)) plus a manifest file naming the
    committed version of every partition — the commit point is ONE
    atomic manifest rename, so readers never see a torn cross-
    partition state.

    This is the flat :func:`write_cc_labels` layout upgraded for
    billions of nodes: a fold rewrites only partitions containing
    touched ids (see :func:`fold_into_cc_labels_parted`), so per-fold
    write IO scales with the BATCH's blast radius, not the corpus.
    Rebuilding into an existing artifact publishes every partition at
    its next version under the maintenance lock (never an invisible
    older manifest)."""
    import json

    from ncbi_analysis_spark.operators import tombstones as ts
    from ncbi_analysis_spark.sources import fsutil

    if n_parts <= 0:
        raise ValueError(f"n_parts must be > 0, got {n_parts}")
    spark = edges.sparkSession
    root = path.rstrip("/")
    labels = connected_components(edges, id_a, id_b)
    all_parts = list(range(n_parts))
    if fsutil.exists(spark, root + "/" + _CCP_PARAMS_FILE):
        params = _ccp_params(spark, root)
        if params.get("n_parts") != n_parts:
            raise ValueError(
                f"existing artifact at {path!r} has n_parts="
                f"{params.get('n_parts')}, rebuild requested "
                f"{n_parts} — delete the directory to change the "
                "partitioning"
            )
        with ts.maintenance_lock(spark, root,
                                 "write_cc_labels_parted") as lk:
            try:
                seq, prev = _ccp_current_manifest(spark, root)
            except ValueError:
                seq, prev = -1, {}
            _ccp_publish(spark, root, labels, all_parts, prev,
                         seq + 1, n_parts, fence=lk.assert_owned)
            _ccp_retire(spark, root, [
                dict(_ccp_current_manifest(spark, root)[1]), prev],
                [seq + 1, seq] if seq >= 0 else [seq + 1])
        return
    fsutil.write_text(spark, root + "/" + _CCP_PARAMS_FILE,
                      json.dumps({"kind": "cc_labels_parted",
                                  "n_parts": n_parts}))
    _ccp_publish(spark, root, labels, all_parts, {}, 0, n_parts)


def read_cc_labels_parted(spark, path: str) -> DataFrame:
    """Open a partition-versioned labels artifact at its current
    manifest: one multi-path scan of every partition's committed
    version dir. Same concurrency scope as :func:`read_cc_labels` —
    lazy, pinned to the manifest current at open time, valid through
    ONE subsequent fold (the retire keeps the previous manifest's
    versions)."""
    root = path.rstrip("/")
    _ccp_params(spark, root)
    _, parts = _ccp_current_manifest(spark, root)
    if not parts:
        return spark.createDataFrame([], "id long, component long")
    return spark.read.parquet(
        *[f"{root}/part={h}/v{v}" for h, v in sorted(parts.items())])


def fold_into_cc_labels_parted(new_edges: DataFrame, path: str,
                               id_a: str = "id_a", id_b: str = "id_b",
                               max_iter: int = 25) -> None:
    """Fold a new edge batch into the partition-versioned labels,
    rewriting ONLY partitions that contain a changed or new id: the
    incremental fold computes the union labeling lazily, the changed
    rows (anti-join against the prior labeling) name the touched
    hash partitions (a bounded <= n_parts collect), those partitions'
    FULL new content is staged and moved into place, and one atomic
    manifest rename commits the cross-partition cut. Untouched
    partitions are not read for writing, not rewritten, and keep
    their version dirs byte-identical.

    Crash anywhere before the manifest rename → the previous manifest
    still governs (orphan staged versions are overwritten by the retry
    and swept by the next retire); crash after → both manifests
    committed, readers use the newer, the next fold retires. Replay-
    idempotent: re-folding an already-folded batch touches zero
    partitions and publishes nothing. Runs under the maintenance lock;
    readers never lock.

    At 100 TB this is the difference between a fold writing the whole
    labels table and writing ~|touched components| rows: per-fold IO
    follows the batch's blast radius while the manifest keeps reads
    one atomic cut."""
    from ncbi_analysis_spark.operators import tombstones as ts

    spark = new_edges.sparkSession
    root = path.rstrip("/")
    params = _ccp_params(spark, root)
    n_parts = int(params["n_parts"])
    with ts.maintenance_lock(spark, root,
                             "fold_into_cc_labels_parted") as lk:
        seq, prev = _ccp_current_manifest(spark, root)
        prior = read_cc_labels_parted(spark, root)
        folded = connected_components_incremental(
            prior, new_edges, id_a, id_b, max_iter)
        folded = folded.localCheckpoint(eager=True)
        changed = folded.join(prior, ["id", "component"], "left_anti")
        touched = sorted(
            r["__part"] for r in changed.select(
                _ccp_part_col(F.col("id"), n_parts).alias("__part")
            ).distinct().collect()
        )
        if not touched:
            _unpersist_checkpoint(folded)
            return  # replay of an already-folded batch: true no-op
        _ccp_publish(spark, root, folded, touched, prev, seq + 1,
                     n_parts, fence=lk.assert_owned)
        _unpersist_checkpoint(folded)
        _ccp_retire(spark, root,
                    [dict(_ccp_current_manifest(spark, root)[1]), prev],
                    [seq + 1, seq])
