"""Overlap independent Spark actions from the driver (guide §2.6).

Spark's scheduler happily runs several jobs at once inside one
application; actions are only sequential because driver code calls them
sequentially.  The nightly index/register flows submit 2-3 INDEPENDENT
durable batch writes (disjoint shard directories, no read-after-write
between them) — submitting them from a small thread pool lets the next
job's tasks back-fill executors freed by the current job's tail instead
of leaving the cluster idle behind each write's straggler, and overlaps
the fixed per-write costs (committer setup, file-system round trips,
Arrow worker spin-up) that dominate small batches.

Default FIFO scheduling is exactly the back-fill behaviour wanted: the
earlier job gets resources first, later jobs use what is left.  2-3 jobs
in flight is plenty (guide §2.6) — enough to fill the tail, not so many
that they fight for executors.

Correctness: only used where the writes are provably independent
(distinct ``batch=<id>`` dirs, no probe/read between them); any
read-after-write or replay-of-same-id step stays OUTSIDE the overlapped
group, after the barrier.  ``run_overlapped`` returns only when every
submitted action finished, re-raising the first failure.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence


def run_overlapped(
    fns: Sequence[Callable[[], object]], max_workers: int = 3
) -> list:
    """Run independent driver-submitted Spark actions concurrently.

    ``fns``: zero-arg callables, each typically one durable write.
    Returns their results in order; raises the first exception after all
    threads have been joined (the pool context manager waits), so a
    failure cannot leave a write racing the caller's cleanup."""
    if len(fns) <= 1:
        return [fn() for fn in fns]
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    # A queued-but-unstarted write must not run once any task has failed
    # (ADVICE r17: with len(fns) > max_workers a freed worker dequeues the
    # next callable the instant it finishes, beating any Future.cancel()
    # race) — each wrapper checks the abort flag before starting its fn.
    failed = threading.Event()

    def _guard(fn):
        def run():
            if failed.is_set():
                return None
            try:
                return fn()
            except BaseException:
                failed.set()
                raise

        return run

    with ThreadPoolExecutor(max_workers=min(max_workers, len(fns))) as pool:
        futures = [
            pool.submit(inheritable_thread_target(_guard(fn))) for fn in fns
        ]
        return [f.result() for f in futures]
