"""Driver-side concurrency for INDEPENDENT Spark actions (guide §2.6).

Spark's scheduler happily runs several jobs at once inside one
application; actions are sequential only because driver code calls them
sequentially. When one logical operation must materialize two frames
with no data dependency (an index's postings and its doclens table, two
query legs of an eval), submitting them from a small thread pool lets
the second job's tasks back-fill executors freed by the first job's
straggler tail — at toy scale it collapses two driver-gap-separated
job walls into one, at cluster scale it fills the tail (guide §2.6).

Spark job submission is thread-safe; job groups/descriptions are
thread-local, so each worker re-labels its own job.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable


def run_jobs(*thunks: Callable[[], Any],
             max_workers: int | None = None) -> list[Any]:
    """Run the given zero-arg ACTIONS concurrently and return their
    results in argument order. The first raised exception propagates
    (after every thunk has finished — no half-cancelled writes: each
    thunk is itself an atomic Spark action or a plain computation).

    Use ONLY for actions with no dependency on each other's effects:
    writes to disjoint paths, eager reads of independent frames, and
    driver-side FS metadata operations on distinct paths (the
    per-partition rename/delete loops of staged publishes and
    compaction swaps — latency-bound py4j round-trips that a small
    pool overlaps; Hadoop ``FileSystem`` handles are cached and
    thread-safe).
    """
    if not thunks:
        return []
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(
            max_workers=max_workers or min(len(thunks), 16)) as pool:
        futures = [pool.submit(t) for t in thunks]
        results, first_err = [], None
        for f in futures:
            try:
                results.append(f.result())
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                results.append(None)
                if first_err is None:
                    first_err = exc
        if first_err is not None:
            raise first_err
        return results
