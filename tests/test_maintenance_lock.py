"""Maintenance-lock tests: index mutations (append/delete/compact on
the persisted LSH/IVF/BM25 family) are mutually exclusive via an
atomic create-if-absent marker — a second writer fails loudly instead
of corrupting the index (compaction swaps can drop a concurrent
append's files; BM25's marker stats are a read-modify-write)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from ncbi_analysis_spark.operators import tombstones as ts
from ncbi_analysis_spark.sources import fsutil


def test_create_exclusive_is_single_winner(spark, tmp_path):
    p = str(tmp_path / "claim")
    assert fsutil.create_exclusive(spark, p, "a") is True
    assert fsutil.create_exclusive(spark, p, "b") is False
    assert fsutil.read_text(spark, p) == "a"  # loser wrote nothing


def test_lock_blocks_second_writer_and_releases(spark, tmp_path):
    idx = str(tmp_path / "idx")
    with ts.maintenance_lock(spark, idx, "compact_test"):
        with pytest.raises(ts.ConcurrentMaintenanceError,
                           match="compact_test"):
            with ts.maintenance_lock(spark, idx, "append_test"):
                pass
    # released on exit -> a new writer gets in
    with ts.maintenance_lock(spark, idx, "append_test"):
        pass


def test_lock_released_on_body_exception(spark, tmp_path):
    idx = str(tmp_path / "idx")
    with pytest.raises(RuntimeError, match="boom"):
        with ts.maintenance_lock(spark, idx, "op"):
            raise RuntimeError("boom")
    with ts.maintenance_lock(spark, idx, "op2"):
        pass


def test_expired_lock_is_stolen_but_live_lock_is_not(spark, tmp_path):
    idx = str(tmp_path / "idx")
    lock = idx + "/" + ts.LOCK_FILE
    # a holder whose TTL lapsed long ago (crashed process)
    fsutil.write_text(spark, lock, json.dumps(
        {"owner": "deadbeef", "what": "compact", "acquired_unix": 1.0,
         "ttl_s": 1}))
    with ts.maintenance_lock(spark, idx, "steal_test"):
        held = json.loads(fsutil.read_text(spark, lock))
        assert held["what"] == "steal_test"
    # gone after release
    assert not fsutil.exists(spark, lock)


def test_release_only_drops_own_lock(spark, tmp_path):
    idx = str(tmp_path / "idx")
    lock = idx + "/" + ts.LOCK_FILE
    m = ts.maintenance_lock(spark, idx, "victim", ttl_s=1)
    m.__enter__()
    # TTL lapses; a second writer steals
    import time

    time.sleep(1.1)
    m2 = ts.maintenance_lock(spark, idx, "stealer")
    m2.__enter__()
    # the victim's (late) release must NOT drop the stealer's lock
    m.__exit__(None, None, None)
    held = json.loads(fsutil.read_text(spark, lock))
    assert held["what"] == "stealer"
    m2.__exit__(None, None, None)
    assert not fsutil.exists(spark, lock)


def test_break_maintenance_lock(spark, tmp_path):
    idx = str(tmp_path / "idx")
    assert ts.break_maintenance_lock(spark, idx) is False
    m = ts.maintenance_lock(spark, idx, "dead")
    m.__enter__()
    assert ts.break_maintenance_lock(spark, idx) is True
    with ts.maintenance_lock(spark, idx, "next"):
        pass


def test_mutators_respect_held_lock(spark, tmp_path):
    """One representative per family: delete/append/compact raise
    while another writer holds the index's lock, and succeed after."""
    from ncbi_analysis_spark.operators.dedup import (
        append_to_lsh_index, compact_lsh_index, delete_from_lsh_index,
        write_lsh_index)

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string")
    idx = str(tmp_path / "lsh")
    kw = dict(num_perm=4, bands=2, shingle_n=3)
    write_lsh_index(df, "text", "doc_id", idx, **kw)

    holder = ts.maintenance_lock(spark, idx, "other_pipeline")
    holder.__enter__()
    try:
        one = spark.createDataFrame([(1,)], "id long")
        more = spark.createDataFrame([(3, "iota kappa lambda mu")],
                                     "doc_id long, text string")
        with pytest.raises(ts.ConcurrentMaintenanceError):
            delete_from_lsh_index(one, idx)
        with pytest.raises(ts.ConcurrentMaintenanceError):
            append_to_lsh_index(more, "text", "doc_id", idx, **kw)
        with pytest.raises(ts.ConcurrentMaintenanceError):
            compact_lsh_index(spark, idx)
    finally:
        holder.__exit__(None, None, None)
    delete_from_lsh_index(one, idx)
    compact_lsh_index(spark, idx)
    append_to_lsh_index(more, "text", "doc_id", idx, **kw)


def test_lock_claim_race_has_single_winner(spark, tmp_path):
    """16 threads race maintenance_lock on one index path; at every
    instant at most ONE holds it (tracked with a critical-section
    counter), every thread eventually gets a turn by retrying, and the
    lock file is gone at the end. Exercises the create-if-absent claim
    under real concurrency, not just sequential calls."""
    import random
    import threading
    import time

    idx = str(tmp_path / "idx")
    inside = []
    max_inside = []
    mu = threading.Lock()
    errors = []

    def worker(i):
        # time-based retry budget with jittered backoff: a fixed
        # 200 x 5ms cadence starves workers on a loaded box (py4j FS
        # round-trips stretch to ~100ms under a concurrent full-suite
        # run and the synchronized retry rhythm lets fast claimants
        # monopolize the lock) — the property under test is the claim's
        # MUTUAL EXCLUSION, not starvation-freedom at a 1s horizon
        deadline = time.time() + 120.0
        rng = random.Random(1000 + i)
        while time.time() < deadline:
            try:
                with ts.maintenance_lock(spark, idx, f"w{i}"):
                    with mu:
                        inside.append(i)
                        max_inside.append(len(inside))
                    time.sleep(0.01)
                    with mu:
                        inside.remove(i)
                return
            except ts.ConcurrentMaintenanceError:
                time.sleep(0.002 + rng.random() * 0.01)
            except Exception as e:  # noqa: BLE001
                errors.append(e)
                return
        errors.append(RuntimeError(f"worker {i} never acquired"))

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert max(max_inside) == 1  # never two holders at once
    assert len(max_inside) == 16  # everyone got a turn
    assert not fsutil.exists(spark, f"{idx}/{ts.LOCK_FILE}")


def test_expired_lock_steal_race_loses_no_work(spark, tmp_path):
    """16 threads race the TTL-STEAL path: an expired lock is planted,
    then every thread runs the PRODUCTION mutation shape under the
    lock — read shared state, work, FENCE (assert_owned), commit by
    atomic rename (the manifest pattern). Asserted contract:

    - **no lost update**: the counter ends at exactly 16. A steal
      protocol that lets two FENCED writers interleave (e.g. a bare
      delete-then-claim steal, which silently drops another stealer's
      fresh lock without its fence ever failing against the thief's)
      loses increments here.
    - every thread eventually commits (no wedge — the resurrect bug
      where a stale stealer's restore re-created a RELEASED lock
      blocked this path for a full ttl),
    - the lock file is gone and no steal-tomb residue remains.

    Instantaneous two-in-the-section overlap is deliberately NOT
    asserted: a rename-based TTL steal on a filesystem without
    compare-and-swap necessarily has a one-FS-call window (the path is
    empty between tombing the expired lock and re-claiming) in which a
    fresh claimant can coexist with a tombed holder — that is exactly
    the documented lockless-holder residual, and the commit fence is
    the mechanism that makes it harmless: the tombed holder's fence
    fails and it retries, which this test exercises for real."""
    import random
    import threading
    import time

    idx = str(tmp_path / "idx")
    # plant an expired lock (acquired long ago, tiny ttl)
    fsutil.write_text(
        spark, f"{idx}/{ts.LOCK_FILE}",
        json.dumps({"owner": "dead", "what": "crashed_op",
                    "acquired_unix": time.time() - 1000, "ttl_s": 1}),
    )
    counter = f"{idx}/counter.json"
    fsutil.write_text(spark, counter, "0")
    commits = []
    errors = []
    mu = threading.Lock()

    def worker(i):
        deadline = time.time() + 120.0
        rng = random.Random(2000 + i)
        while time.time() < deadline:
            try:
                with ts.maintenance_lock(spark, idx, f"w{i}") as lk:
                    seen = int(fsutil.read_text(spark, counter))
                    time.sleep(0.01)  # the slow mutation
                    lk.assert_owned()  # fence immediately before commit
                    tmp = f"{idx}/_counter_tmp_{i}_{seen}"
                    fsutil.write_text(spark, tmp, str(seen + 1))
                    fsutil.rename(spark, counter, f"{idx}/_old_{i}_{seen}")
                    fsutil.rename(spark, tmp, counter)
                    fsutil.delete(spark, f"{idx}/_old_{i}_{seen}")
                with mu:
                    commits.append(i)
                return
            except ts.ConcurrentMaintenanceError:
                time.sleep(0.002 + rng.random() * 0.01)
            except Exception as e:  # noqa: BLE001
                errors.append(e)
                return
        errors.append(RuntimeError(f"worker {i} never committed"))

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert sorted(commits) == list(range(16))
    # THE mutual-exclusion consequence that matters: no lost updates
    assert int(fsutil.read_text(spark, counter)) == 16
    assert not fsutil.exists(spark, f"{idx}/{ts.LOCK_FILE}")
    # no steal-tomb residue left behind
    residue = [c for c in fsutil.list_children(spark, idx)
               if ".steal." in c]
    assert residue == []


def test_steal_verifies_tomb_and_restores_live_lock(spark, tmp_path,
                                                    monkeypatch):
    """If the expired lock is released and RE-CLAIMED by a live writer
    between the stealer's expired-read and its rename, the stealer
    must detect the foreign tomb, restore the live lock, and bow out —
    never proceed alongside the live holder."""
    import time

    idx = str(tmp_path / "idx")
    lockfile = f"{idx}/{ts.LOCK_FILE}"
    fsutil.write_text(
        spark, lockfile,
        json.dumps({"owner": "dead", "what": "crashed_op",
                    "acquired_unix": time.time() - 1000, "ttl_s": 1}))

    live = json.dumps({"owner": "live", "what": "fresh_op",
                       "acquired_unix": time.time(), "ttl_s": 3600})
    real_rename = fsutil.rename
    swapped = {"done": False}

    def racing_rename(spark_, src, dst):
        # just before the stealer's rename: the dead holder's lock is
        # replaced by a fresh LIVE claim (release + new writer)
        if not swapped["done"] and src == lockfile:
            swapped["done"] = True
            fsutil.delete(spark_, lockfile)
            fsutil.write_text(spark_, lockfile, live)
        return real_rename(spark_, src, dst)

    monkeypatch.setattr(fsutil, "rename", racing_rename)
    import pytest as _pytest
    with _pytest.raises(ts.ConcurrentMaintenanceError):
        with ts.maintenance_lock(spark, idx, "stealer"):
            pass
    monkeypatch.setattr(fsutil, "rename", real_rename)
    # the live lock survived the failed steal, byte-identical
    assert json.loads(fsutil.read_text(spark, lockfile)) == json.loads(live)
    # and no tomb residue
    assert [c for c in fsutil.list_children(spark, idx)
            if ".steal." in c] == []


def test_owner_fence_closes_triple_race(spark, tmp_path, monkeypatch):
    """r15 (verdict ask 7): the residual triple-race — stealer S
    renames a lock that a live writer W re-claimed, a third writer X
    claims between S's rename and S's restore — can no longer
    interleave commits. The restore fails (dst exists), S bows out,
    and W's pre-commit assert_owned() fence sees X's token and aborts;
    only X's fence passes. The scenario the tombstones docstring
    previously documented as 'closable only with compare-and-swap'."""
    import time

    idx = str(tmp_path / "idx")
    lockfile = f"{idx}/{ts.LOCK_FILE}"
    fsutil.write_text(
        spark, lockfile,
        json.dumps({"owner": "dead", "what": "crashed_op",
                    "acquired_unix": time.time() - 1000, "ttl_s": 1}))

    w_lock = ts.maintenance_lock(spark, idx, "live_writer_w")
    x_lock = ts.maintenance_lock(spark, idx, "third_writer_x")
    real_rename = fsutil.rename
    stage = {"n": 0}

    def racing_rename(spark_, src, dst):
        stage["n"] += 1
        if stage["n"] == 1 and src == lockfile:
            # between S's expired-read and its rename: dead holder
            # releases, W claims for real (W now owns the lock file
            # S is about to rename into the tomb)
            fsutil.delete(spark_, lockfile)
            monkeypatch.setattr(fsutil, "rename", real_rename)
            w_lock.__enter__()
            monkeypatch.setattr(fsutil, "rename", racing_rename)
        elif src != lockfile and dst == lockfile:
            # between S's rename and its restore: X claims the now-
            # empty lock path; the restore rename then fails naturally
            monkeypatch.setattr(fsutil, "rename", real_rename)
            x_lock.__enter__()
            monkeypatch.setattr(fsutil, "rename", racing_rename)
        return real_rename(spark_, src, dst)

    monkeypatch.setattr(fsutil, "rename", racing_rename)
    import pytest as _pytest
    with _pytest.raises(ts.ConcurrentMaintenanceError):
        with ts.maintenance_lock(spark, idx, "stealer_s"):
            pass
    monkeypatch.setattr(fsutil, "rename", real_rename)

    # X holds the actual lock file; W's lock was renamed away.
    held = json.loads(fsutil.read_text(spark, lockfile))
    assert held["what"] == "third_writer_x"
    # THE FENCE: W must abort before committing; X passes.
    with _pytest.raises(ts.ConcurrentMaintenanceError):
        w_lock.assert_owned()
    x_lock.assert_owned()
    # W's (late) release is a no-op against X's lock; X releases clean.
    w_lock.__exit__(None, None, None)
    assert json.loads(fsutil.read_text(spark, lockfile)) == held
    x_lock.__exit__(None, None, None)
    assert not fsutil.exists(spark, lockfile)


def test_fenced_mutator_aborts_on_lost_lock(spark, tmp_path):
    """End-to-end fence through a real mutator: a fold whose lock file
    is usurped mid-operation must abort at the commit point with the
    artifact unchanged (the prior manifest still governs)."""
    import pytest as _pytest

    from ncbi_analysis_spark.operators.components import (
        _ccp_current_manifest, fold_into_cc_labels_parted,
        read_cc_labels_parted, write_cc_labels_parted)

    df = lambda es: spark.createDataFrame(es, ["id_a", "id_b"])  # noqa: E731
    p = str(tmp_path / "labels")
    write_cc_labels_parted(df([(1, 2)]), p, n_parts=4)
    seq0, _ = _ccp_current_manifest(spark, p)
    before = {r["id"]: r["component"]
              for r in read_cc_labels_parted(spark, p).collect()}

    # usurp the lock the moment the fold's publish fences: simulate by
    # overwriting the lock file from "outside" via the connected-
    # components module's publish fence hook — monkeypatch-free, we
    # just overwrite the lock while the fold runs is racy; instead
    # patch _ccp_publish's fence invocation point by overwriting the
    # lock BEFORE the fold's commit via a wrapping fence
    import ncbi_analysis_spark.operators.components as comp

    real_publish = comp._ccp_publish

    def usurping_publish(spark_, root, labels, touched, prev, seq,
                         n_parts, fence=None):
        fsutil.write_text(
            spark_, f"{root}/{ts.LOCK_FILE}",
            json.dumps({"owner": "usurper", "what": "other_writer",
                        "acquired_unix": 0, "ttl_s": 1 << 30}))
        return real_publish(spark_, root, labels, touched, prev, seq,
                            n_parts, fence=fence)

    comp._ccp_publish = usurping_publish
    try:
        with _pytest.raises(ts.ConcurrentMaintenanceError,
                            match="lost before commit"):
            fold_into_cc_labels_parted(df([(2, 3)]), p)
    finally:
        comp._ccp_publish = real_publish
        fsutil.delete(spark, f"{p}/{ts.LOCK_FILE}")

    # prior manifest still governs; no torn state
    assert _ccp_current_manifest(spark, p)[0] == seq0
    got = {r["id"]: r["component"]
           for r in read_cc_labels_parted(spark, p).collect()}
    assert got == before
    # and the retried fold (lock free again) converges
    fold_into_cc_labels_parted(df([(2, 3)]), p)
    assert len({r["component"] for r in
                read_cc_labels_parted(spark, p).collect()}) == 1
