"""Tombstone deletion for the persisted index family.

The persisted indexes (``write_lsh_index``, ``write_ivf_index``,
``write_bm25_index``) are append-optimized: per-partition parquet
directories gain files, nothing is rewritten. Real crawl pipelines also
DELETE documents — takedowns, robots retro-opt-outs, licensing — and
rewriting a 100 TB index per takedown batch is not an option. The
standard shape (this module) is a **tombstone table**: deletes append
the doomed ids to a small side table under the index directory; every
probe anti-joins it out; a periodic **compaction** folds the tombstones
into the data files and clears them.

Layout: ``{index}/_tombstones/`` — an ordinary parquet directory whose
single column is the index's id column. The ``_`` prefix keeps it
invisible to the index's own ``spark.read.parquet(root)`` listing
(Hadoop's hidden-path filter skips ``_``/``.`` entries), the same
convention as the parameter markers.

Contract pinned by the staged r13 oracles and tests/test_index_delete.py:
for every family, ``delete(X)`` then search ≡ search over an index
rebuilt without X — before AND after compaction, byte-for-byte.

Scale notes:
- The tombstone side of the probe anti-join is broadcast: tombstone
  tables are delete *batches*, orders of magnitude smaller than the
  index. Compaction is the pressure valve — run it before the
  accumulated tombstones approach broadcast limits (the reader warns
  past ``BROADCAST_WARN_ROWS``).
- Deletes are idempotent: ids are distinct-ed per batch, and the
  anti-join makes a re-delete (or a delete of an id the index never
  had) a semantic no-op. Compaction is likewise idempotent — a crash
  between the data swap and the tombstone clear leaves tombstones that
  now match nothing.

Concurrency: every index MUTATION (append/delete/compact, all three
families) runs under :class:`maintenance_lock` — an atomic
create-if-absent marker file with owner/TTL. Readers never lock; two
writers serialize or fail loudly (``ConcurrentMaintenanceError``)
instead of corrupting each other (a compaction swap can drop a
concurrent append's files; BM25's marker stats are a read-modify-write).

Reference has no counterpart (its index files are rebuilt wholesale);
this is an LLM-pipeline/scale extension (SURVEY §2 extensions).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOMBSTONES_DIR = "_tombstones"

# a tombstone table past this size still works, but the broadcast
# anti-join starts to hurt — compact the index instead
BROADCAST_WARN_ROWS = 5_000_000


def tombstones_path(index_path: str) -> str:
    return index_path.rstrip("/") + "/" + TOMBSTONES_DIR


def has_tombstones(spark: SparkSession, index_path: str) -> bool:
    from ncbi_analysis_spark.sources import fsutil

    return fsutil.exists(spark, tombstones_path(index_path))


def append_tombstones(ids: DataFrame, index_path: str, id_col: str) -> int:
    """Append one delete batch (distinct ids, single column named
    ``id_col``) to the index's tombstone table. Returns the number of
    distinct ids in THIS batch (not the live-row count they remove —
    deletes of absent or already-deleted ids are fine and count here)."""
    batch = ids.select(F.col(id_col)).distinct().persist()
    try:
        batch.write.mode("append").parquet(tombstones_path(index_path))
        n = batch.count()
    finally:
        batch.unpersist()
    return int(n)


def read_tombstones(spark: SparkSession, index_path: str) -> DataFrame | None:
    """The accumulated tombstone ids (distinct), or None if no delete
    has ever landed.

    The read globs the data files rather than naming the directory:
    ``_``-prefixed paths are hidden from Spark's path resolution (that
    is WHY the dir is named ``_tombstones`` — the index's own root read
    must skip it), and passing a hidden directory as the read path
    works only through a deprecation-shaped "all paths were ignored"
    warning. The file glob names visible leaves, so it resolves
    cleanly."""
    if not has_tombstones(spark, index_path):
        return None
    try:
        df = spark.read.parquet(tombstones_path(index_path) + "/*.parquet")
    except Exception:
        # dir exists but no committed data file: a delete batch crashed
        # before its first file landed — by write-ordering that delete
        # never happened, so the live view correctly shows everything
        return None
    return df.distinct()


def apply_tombstones(rows: DataFrame, index_path: str, id_col: str) -> DataFrame:
    """The live view of an index's row table: anti-join the tombstones
    out (broadcast — see module notes). No tombstones → ``rows``
    unchanged, zero plan overhead for never-deleted indexes."""
    spark = rows.sparkSession
    ts = read_tombstones(spark, index_path)
    if ts is None:
        return rows
    ts_cols = ts.columns
    if ts_cols != [id_col]:
        raise ValueError(
            f"tombstone table at {tombstones_path(index_path)!r} holds "
            f"column(s) {ts_cols}, probe expected [{id_col!r}] — the "
            "index was deleted-from under a different id column"
        )
    return rows.join(F.broadcast(ts), on=id_col, how="left_anti")


def clear_tombstones(spark: SparkSession, index_path: str) -> None:
    from ncbi_analysis_spark.sources import fsutil

    fsutil.delete(spark, tombstones_path(index_path))


def warn_if_tombstones_large(spark: SparkSession, index_path: str) -> None:
    ts = read_tombstones(spark, index_path)
    if ts is not None and ts.limit(BROADCAST_WARN_ROWS + 1).count() > BROADCAST_WARN_ROWS:
        warnings.warn(
            f"index {index_path!r} carries >{BROADCAST_WARN_ROWS} "
            "tombstoned ids; probe anti-joins broadcast this table — "
            "compact the index",
            stacklevel=2,
        )


LOCK_FILE = "_maintenance_lock.json"


class ConcurrentMaintenanceError(RuntimeError):
    """Another process holds the index's maintenance lock."""


def _lock_path(index_path: str) -> str:
    return index_path.rstrip("/") + "/" + LOCK_FILE


def break_maintenance_lock(spark: SparkSession, index_path: str) -> bool:
    """Forcibly remove an index's maintenance lock — the manual
    override for a lock whose holder is KNOWN dead (crashed before its
    TTL ran out). Returns False if there was no lock. Never call this
    while the holder might still be running: two concurrent mutations
    are exactly what the lock exists to prevent."""
    from ncbi_analysis_spark.sources import fsutil

    return fsutil.delete(spark, _lock_path(index_path))


class maintenance_lock:
    """Mutual exclusion for index MUTATIONS (append / delete / compact
    — every ``append_to_*`` / ``delete_from_*`` / ``compact_*`` runs
    inside one). Readers never lock: probes see either the pre- or
    post-mutation file set (appends add whole files; compaction swaps
    behind hidden dirs), so only writers can corrupt each other —
    compaction's retire-and-swap can drop a file a concurrent append
    just landed, and BM25's marker stats are a read-modify-write that
    loses one of two concurrent updates.

    Claim = atomically creating ``{index}/_maintenance_lock.json``
    (create-if-absent; ``fsutil.create_exclusive``) holding owner id,
    operation name, acquire time, and TTL. A second writer fails with
    :class:`ConcurrentMaintenanceError` naming the holder — retry after
    it finishes. A lock whose TTL has lapsed is presumed crashed and is
    stolen (one delete + one re-claim; the claim stays atomic, so two
    stealers still serialize). ``ttl_s`` must comfortably exceed the
    longest mutation on the index — default one hour; a crashed
    holder's lock blocks mutations (never reads) until steal or
    ``break_maintenance_lock``.

    Scope note: on object stores without atomic create-if-absent the
    claim can race within one marker-write window; there, front the
    mutation path with a real coordinator (or rely on single-writer
    pipeline design). On HDFS/local — and any FS with atomic
    ``create(overwrite=false)`` — the claim is exact.
    """

    def __init__(self, spark: SparkSession, index_path: str, what: str,
                 ttl_s: int = 3600):
        self._spark = spark
        self._path = _lock_path(index_path)
        self._what = what
        self._ttl_s = ttl_s
        import uuid

        self._owner = uuid.uuid4().hex

    def _try_claim(self) -> bool:
        import json
        import time

        from ncbi_analysis_spark.sources import fsutil

        return fsutil.create_exclusive(
            self._spark, self._path,
            json.dumps({
                "owner": self._owner,
                "what": self._what,
                "acquired_unix": time.time(),
                "ttl_s": self._ttl_s,
            }),
        )

    def __enter__(self):
        import json
        import time

        from ncbi_analysis_spark.sources import fsutil

        if self._try_claim():
            return self
        try:
            held = json.loads(fsutil.read_text(self._spark, self._path))
        except Exception:
            # holder released (or broke) between our claim and read —
            # one immediate retry; a live holder fails it again
            held = None
        if held is not None:
            expired = (
                time.time()
                > held.get("acquired_unix", 0) + held.get("ttl_s", 0)
            )
            if not expired:
                raise ConcurrentMaintenanceError(
                    f"index maintenance lock at {self._path!r} is held "
                    f"by {held.get('what')!r} (owner "
                    f"{held.get('owner', '?')[:8]}, ttl "
                    f"{held.get('ttl_s')}s); concurrent index mutations "
                    "are unsafe — retry after it finishes, or "
                    "break_maintenance_lock() if the holder is known dead"
                )
            # TTL lapsed: presume the holder crashed and steal. The
            # steal must be atomic BETWEEN STEALERS: a bare delete
            # is not — stealer B's delete could land after stealer
            # A's delete+re-claim and remove A's fresh lock, letting
            # both proceed. Rename-to-unique first: local/HDFS rename
            # is atomic and the second stealer's rename fails (source
            # gone), so only the rename winner removes the expired
            # lock; every loser falls through to the claim below,
            # which exactly one process (winner or loser) wins via
            # create-if-absent.
            # `held` can be SECONDS stale by now (claim attempt + read +
            # scheduling under contention), and the expired lock we read
            # may have been stolen, released and re-claimed by a LIVE
            # writer in the meantime — renaming on stale evidence tombs
            # that live lock, and if its holder releases while tombed,
            # the restore below would RESURRECT a released lock that
            # then wedges the path for its full ttl (caught by the
            # 16-thread steal-race test under a loaded box). Re-read
            # immediately before the rename and steal only the exact
            # (owner, acquired_unix) lock we judged expired; anything
            # else is a fresh claimant — bow out and let retry re-judge.
            try:
                cur = json.loads(fsutil.read_text(self._spark, self._path))
            except Exception:
                cur = None
            if cur is not None and (
                    cur.get("owner") != held.get("owner")
                    or cur.get("acquired_unix")
                    != held.get("acquired_unix")):
                raise ConcurrentMaintenanceError(
                    f"index maintenance lock at {self._path!r} was "
                    "re-claimed while we prepared to steal the expired "
                    "one — retry later"
                )
            steal_tomb = f"{self._path}.steal.{self._owner}"
            try:
                fsutil.rename(self._spark, self._path, steal_tomb)
            except Exception:
                pass  # lost the steal race — claim below adjudicates
            else:
                # CLAIM FIRST, verify second: the rename leaves the
                # path empty, and verifying before re-claiming holds
                # that hole open for ~2 FS calls — long enough on a
                # loaded box for a NEW writer to claim while the
                # tombed (possibly live) lock's holder is still
                # inside (the 16-thread steal-race test observed the
                # double-holder). Claiming our own lock immediately
                # shrinks the hole to the single rename→create gap;
                # if verification then shows we tombed the WRONG lock
                # we undo (drop our claim, restore the tomb).
                claimed = self._try_claim()
                try:
                    tomb = json.loads(
                        fsutil.read_text(self._spark, steal_tomb))
                    same = (tomb.get("owner") == held.get("owner")
                            and tomb.get("acquired_unix")
                            == held.get("acquired_unix"))
                except Exception:
                    # ADVICE r14: only a VANISHED tomb is safely "the
                    # crashed lock" (delete is then a no-op). Any other
                    # read failure — permission blip, eventual-
                    # consistency read on an object store — could be
                    # hiding a freshly re-claimed LIVE lock; deleting
                    # on that evidence re-admits the double-holder the
                    # rename exists to prevent. Restore instead: worst
                    # case we put the expired lock back and fail the
                    # claim below (a retry steals it again).
                    same = not fsutil.exists(self._spark, steal_tomb)
                if same:
                    fsutil.delete(self._spark, steal_tomb)
                    if claimed:
                        return self
                else:
                    # we tombed a lock that is NOT the expired one we
                    # judged — a live writer's. Undo: release our claim
                    # (the FULL release: our own mid-steal claim can
                    # itself be renamed into ANOTHER stale stealer's
                    # tomb, and bowing out without sweeping left it as
                    # residue — observed in the 16-thread race) and put
                    # the live lock back. If its holder released while
                    # tombed, its release-sweep deletes the tomb and
                    # our restore fails harmlessly on the gone source.
                    if claimed:
                        self._release_own()
                    try:
                        fsutil.rename(self._spark, steal_tomb,
                                      self._path)
                    except Exception:
                        # restore failed: a third writer claimed the
                        # path, so the tombed lock can NEVER return to
                        # service (its holder proceeds lockless behind
                        # the commit fence and its release-sweep may
                        # already have run) — delete our tomb rather
                        # than leave permanent debris. Deleting here is
                        # safe precisely BECAUSE the restore failed:
                        # nothing can re-admit the tombed lock.
                        fsutil.delete(self._spark, steal_tomb)
                    raise ConcurrentMaintenanceError(
                        f"index maintenance lock at {self._path!r} was "
                        "re-claimed by a live writer during the steal — "
                        "restored it; retry later"
                    )
        if not self._try_claim():
            raise ConcurrentMaintenanceError(
                f"index maintenance lock at {self._path!r} was re-claimed "
                "by another writer during steal/retry — retry later"
            )
        return self

    def assert_owned(self) -> None:
        """Fencing check for mutation commits (r15, closes the
        documented triple-race): the lock file must still exist and
        hold OUR owner token. Mutators call this immediately before
        their commit point (manifest rename, tombstone append,
        partition swap, versioned parquet publish) so a lock that was
        TTL-stolen and re-claimed while we were doing the slow work
        turns into a loud abort with the index untouched, instead of
        two writers interleaving commits. The steal path's residual
        window (third writer claims between rename and restore) is
        harmless once every commit is fenced: the writer whose lock
        file vanished fails here and its staged work stays
        unreferenced."""
        import json

        from ncbi_analysis_spark.sources import fsutil

        try:
            held = json.loads(fsutil.read_text(self._spark, self._path))
        except Exception:
            held = None
        if held is None or held.get("owner") != self._owner:
            now = "<gone>" if held is None else str(
                held.get("owner", "?"))[:8]
            raise ConcurrentMaintenanceError(
                f"maintenance lock at {self._path!r} was lost before "
                f"commit (now {now}, we are {self._owner[:8]}) — "
                "aborting the mutation; the index is unchanged and the "
                "staged work is unreferenced"
            )

    def _release_own(self) -> None:
        """Delete OUR lock wherever it currently is — at its path or
        renamed into a stale stealer's tomb mid-verify.

        Release only what we own: after a TTL steal, deleting blindly
        could drop the STEALER's lock. Residual window (accepted): the
        read-check-delete is not atomic, so if OUR OWN TTL expires
        between the owner check and the delete AND a stealer claims
        inside that instant, we drop the stealer's lock — that requires
        the mutation to have already overrun ttl_s, the contract
        violation the ttl exists to bound.

        Our lock may not be AT its path: a stale-read stealer can hold
        it in a rename tomb mid-verify, and its restore would RESURRECT
        our released lock as an ownerless wedge that blocks the path
        for a full ttl. The lock file is always at exactly one of
        {path, some tomb} (renames are atomic), but it can MOVE between
        our checks — so alternate path-check and tomb-sweep a few
        rounds until a delete lands or a full round finds nothing of
        ours anywhere. A miss needs a perfectly timed rename per round
        on top of the pre-steal re-verify's ms window; the commit fence
        (assert_owned) remains the hard backstop."""
        import json
        import time as _time

        from ncbi_analysis_spark.sources import fsutil

        parent = self._path.rsplit("/", 1)[0]
        marker = self._path.rsplit("/", 1)[1] + ".steal."
        # backoff covers a stealer's IN-FLIGHT rename: under load a
        # py4j FS call takes 100ms+, so a tomb holding our lock can
        # materialize well after our first sweep round — miss it and
        # the stealer's restore resurrects our released lock
        backoff = [0.01, 0.03, 0.08, 0.15, 0.3, 0.5]
        for attempt, pause in enumerate(backoff):
            try:
                held = json.loads(
                    fsutil.read_text(self._spark, self._path))
                if held.get("owner") == self._owner:
                    if fsutil.delete(self._spark, self._path):
                        return
                # foreign owner at the path: ours is gone OR tombed by a
                # stale stealer while the foreigner claimed — fall
                # through and sweep the tombs for our content too
            except Exception:
                pass  # not at the path right now — check the tombs
            found_ours = False
            try:
                for child in fsutil.list_children(self._spark, parent):
                    if not child.startswith(marker):
                        continue
                    tomb = f"{parent}/{child}"
                    try:
                        t = json.loads(
                            fsutil.read_text(self._spark, tomb))
                    except Exception:
                        continue  # tomb vanished/moving — next round
                    if t.get("owner") == self._owner:
                        found_ours = True
                        if fsutil.delete(self._spark, tomb):
                            return
            except Exception:
                pass
            if not found_ours and attempt >= 2:
                # multiple rounds saw our lock nowhere — it was already
                # deleted (or never re-materialized)
                return
            _time.sleep(pause)

    def __exit__(self, exc_type, exc, tb):
        self._release_own()
        return False


def shared_integrity_checks(spark: SparkSession, index_path: str,
                            id_col: str,
                            swap_roots: list[str] | None = None,
                            ) -> list[dict]:
    """The family-independent legs of the ``verify_*_index`` fsck
    tools: maintenance-state findings every persisted index shares.
    Returns ``[{check, ok, detail}, ...]``; callers append their
    family-specific checks. Read-only — never repairs (compact_*
    resumes crashed swaps; break_maintenance_lock clears dead locks).
    ``swap_roots`` overrides where swap residue is looked for (BM25
    swaps inside its postings/ and doclens/ subdirs).
    """
    import json
    import time

    from ncbi_analysis_spark.sources import fsutil

    root = index_path.rstrip("/")
    out: list[dict] = []

    pending = []
    for sr in (swap_roots or [root]):
        for c in fsutil.list_children(spark, sr.rstrip("/")):
            if (c.startswith(("_retired_", "_compact_tmp"))
                    or c == SWAP_MOVING_MARKER):
                pending.append(f"{sr.rstrip('/')}/{c}")
    out.append({
        "check": "no_pending_swap",
        "ok": not pending,
        "detail": ("" if not pending else
                   f"crashed compaction state present: {sorted(pending)} "
                   "— reads of this root FAIL LOUDLY (retired dirs keep "
                   "their '=' and collide with the live partition column "
                   "— by design: the failure mode is noisy, never an "
                   "empty or partial view) until the next compact_* "
                   "resumes/rolls the swap back"),
    })

    lock = root + "/" + LOCK_FILE
    if fsutil.exists(spark, lock):
        try:
            held = json.loads(fsutil.read_text(spark, lock))
            expired = (time.time()
                       > held.get("acquired_unix", 0) + held.get("ttl_s", 0))
            detail = (f"maintenance lock held by {held.get('what')!r}"
                      + (" (TTL EXPIRED — holder presumed crashed; next "
                         "mutation steals it)" if expired else " (live)"))
        except Exception:
            expired, detail = True, "unparseable maintenance lock file"
        out.append({"check": "no_stale_lock", "ok": not expired,
                    "detail": detail})
    else:
        out.append({"check": "no_stale_lock", "ok": True, "detail": ""})

    ts = read_tombstones(spark, index_path)
    if ts is None:
        out.append({"check": "tombstones_schema", "ok": True,
                    "detail": "no tombstones"})
    else:
        cols = ts.columns
        out.append({
            "check": "tombstones_schema",
            "ok": cols == [id_col],
            "detail": ("" if cols == [id_col] else
                       f"tombstone table holds {cols}, index id column "
                       f"is {id_col!r} — probes will raise"),
        })
    return out


SWAP_MOVING_MARKER = "_SWAP_MOVING"


def resume_pending_swap(spark: SparkSession, index_path: str,
                        tmp_name: str = "_compact_tmp") -> bool:
    """Recover from a compaction swap a previous process crashed out
    of — called at the top of every ``compact_*`` so a re-run NEVER
    derives a live view from a half-swapped directory (which would
    silently compact away data). Returns True if there was anything to
    recover.

    Old and new partition children share names (``band=0`` exists in
    both), so recovery needs to know WHICH phase crashed; the
    ``_SWAP_MOVING`` marker (written only after every old child has
    been retired to a hidden ``_retired_*`` name) is that bit:

    - marker ABSENT, but retired children or a tmp dir exist: the
      retire phase crashed — nothing was moved yet, so every retired
      child's original name is free: restore them, drop the stale tmp,
      and let the caller redo the compaction from the intact index.
    - marker PRESENT: every old child is retired, the move phase (or
      cleanup) crashed — visible children are NEW; finish moving the
      remaining tmp children (their destinations are free: a completed
      rename removes its tmp source), then clean up.
    """
    from ncbi_analysis_spark.sources import fsutil

    root = index_path.rstrip("/")
    tmp = root + "/" + tmp_name
    moving = fsutil.exists(spark, root + "/" + SWAP_MOVING_MARKER)
    retired = [c for c in fsutil.list_children(spark, root)
               if c.startswith("_retired_")]
    if moving:
        if fsutil.exists(spark, tmp):
            for child in fsutil.list_children(spark, tmp):
                if child.startswith(("_", ".")):
                    continue
                if not fsutil.exists(spark, f"{root}/{child}"):
                    fsutil.rename(spark, f"{tmp}/{child}",
                                  f"{root}/{child}")
            fsutil.delete(spark, tmp)
        for c in retired:
            fsutil.delete(spark, f"{root}/{c}")
        clear_tombstones(spark, root)
        fsutil.delete(spark, root + "/" + SWAP_MOVING_MARKER)
        return True
    if retired or fsutil.exists(spark, tmp):
        for c in retired:
            fsutil.rename(spark, f"{root}/{c}",
                          f"{root}/{c[len('_retired_'):]}")
        fsutil.delete(spark, tmp)
        return True
    return False


def swap_partition_dirs(spark: SparkSession, index_path: str,
                        tmp_name: str) -> None:
    """Finish an in-place compaction: replace the index's VISIBLE
    children (partition dirs, data files, _SUCCESS) with the children
    of ``{index}/{tmp_name}``, then drop the tmp dir and the tombstones.

    The rewrite job writes to the ``_``-hidden tmp dir first, so probes
    reading the old files never race a half-written rewrite. The swap
    is crash-safe by a two-phase protocol: every old child is RETIRED
    (renamed hidden — never deleted before its replacement is in
    place), the ``_SWAP_MOVING`` marker is written, tmp children move
    in, and only then are the retired children, tmp, tombstones, and
    marker dropped. A crash at any point is recovered by
    ``resume_pending_swap`` (run automatically by every ``compact_*``):
    pre-marker crashes restore the index exactly as it was; post-marker
    crashes complete the swap. Data is never deleted until the
    replacement set is fully in place."""
    from ncbi_analysis_spark.operators.concurrency import run_jobs
    from ncbi_analysis_spark.sources import fsutil

    root = index_path.rstrip("/")
    tmp = root + "/" + tmp_name
    # each phase's per-child renames/deletes touch distinct paths and
    # may run in any order WITHIN the phase — only the phase boundaries
    # (all retires → marker → all moves → cleanup) carry the crash-
    # safety protocol, so each loop's FS round-trips overlap in a pool
    run_jobs(*[
        (lambda child=child: fsutil.rename(
            spark, f"{root}/{child}", f"{root}/_retired_{child}"))
        for child in fsutil.list_children(spark, root)
        if not child.startswith(("_", "."))
    ])
    fsutil.write_text(spark, root + "/" + SWAP_MOVING_MARKER, "")
    # the tmp job's _SUCCESS/. markers stay behind (the root keeps
    # its own _SUCCESS from the original build; renaming onto an
    # existing path is a Hadoop rename failure)
    run_jobs(*[
        (lambda child=child: fsutil.rename(
            spark, f"{tmp}/{child}", f"{root}/{child}"))
        for child in fsutil.list_children(spark, tmp)
        if not child.startswith(("_", "."))
    ])
    fsutil.delete(spark, tmp)
    run_jobs(*[
        (lambda child=child: fsutil.delete(spark, f"{root}/{child}"))
        for child in fsutil.list_children(spark, root)
        if child.startswith("_retired_")
    ])
    clear_tombstones(spark, index_path)
    fsutil.delete(spark, root + "/" + SWAP_MOVING_MARKER)
