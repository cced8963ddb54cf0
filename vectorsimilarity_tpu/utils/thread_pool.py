"""Host worker pool implementing the reference's job-queue contract.

The reference ships this as test infrastructure only
(``tests/utils/mock_thread_pool.h:26-131``) because Redis owns the real
threads. Python users have no Redis, so the equivalent pool is part of the
library: a job queue + N worker threads + a quiescence barrier
(``thread_pool_wait``). Pass ``pool.submit_cb`` (plus ``pool`` as the job
queue) in ``TieredIndexParams`` to run background ingestion.
"""

from __future__ import annotations

import queue
import threading


class JobQueueThreadPool:
    """N worker threads draining a FIFO of (job, callback) pairs."""

    def __init__(self, num_threads: int = 4):
        self.num_threads = num_threads
        self._q: queue.Queue = queue.Queue()
        self._in_flight = 0
        self._cv = threading.Condition()
        self._stop = False
        self._threads = [
            threading.Thread(target=self._worker, daemon=True) for _ in range(num_threads)
        ]
        for t in self._threads:
            t.start()

    # The SubmitCB contract (vec_sim_common.h:135-137).
    def submit_cb(self, job_queue, job_queue_ctx, jobs, callbacks) -> int:
        with self._cv:
            self._in_flight += len(jobs)
        for job, cb in zip(jobs, callbacks):
            self._q.put((job, cb))
        return 0

    def _worker(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            job, cb = item
            try:
                cb(job)
            finally:
                with self._cv:
                    self._in_flight -= 1
                    if self._in_flight == 0:
                        self._cv.notify_all()

    def wait_for_quiescence(self, timeout: float | None = None) -> bool:
        """Block until every submitted job has finished (thread_pool_wait,
        mock_thread_pool.h:35-45)."""
        with self._cv:
            return self._cv.wait_for(lambda: self._in_flight == 0, timeout)

    def resize(self, new_size: int) -> None:
        """Grow or shrink the worker count (``VecSim_UpdateThreadPoolSize``,
        vec_sim.cpp:38-48; shrink uses the deferred-exit protocol — workers
        drain their current job then exit)."""
        new_size = max(new_size, 1)
        delta = new_size - len(self._threads)
        if delta > 0:
            for _ in range(delta):
                t = threading.Thread(target=self._worker, daemon=True)
                self._threads.append(t)
                t.start()
        elif delta < 0:
            for _ in range(-delta):
                self._q.put(None)  # poison one worker
            self._threads = self._threads[:new_size]
        self.num_threads = new_size

    def shutdown(self) -> None:
        with self._cv:
            self._stop = True
        for _ in self._threads:
            self._q.put(None)
        for t in self._threads:
            t.join(timeout=5)


# Charged per rentable slot by shared_allocation_size(): the slot object, its
# handoff queue, event, and the interpreter's thread bookkeeping.
_SLOT_BOOKKEEPING_BYTES = 1024


class _ThreadSlot:
    """One rentable worker (svs_utils.h ``ThreadSlot``): a dedicated thread
    waiting on a per-slot handoff, plus an occupancy flag claimed by CAS-like
    locking so concurrent renters take disjoint subsets."""

    def __init__(self) -> None:
        self.occupied = False  # guarded by the pool mutex for claim/release
        self._work: queue.Queue = queue.Queue(maxsize=1)
        self.error: BaseException | None = None
        self._done = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def assign(self, fn, part: int) -> None:
        self.error = None
        self._done.clear()
        self._work.put((fn, part))

    def join_work(self) -> None:
        self._done.wait()

    def _run(self) -> None:
        while True:
            item = self._work.get()
            if item is None:
                return
            fn, part = item
            try:
                fn(part)
            except BaseException as e:  # collected by the renter
                self.error = e
            finally:
                self._done.set()

    def stop(self) -> None:
        self._work.put(None)


class SharedSVSThreadPool:
    """Process-wide shared worker pool with the reference's rental protocol
    (``svs_utils.h:340-620`` ``VecSimSVSThreadPoolImpl``):

    - singleton shared by every SVS index; the calling thread always
      participates, so ``size() == len(slots) + 1``;
    - ``parallel_for(f, n)`` rents up to ``n-1`` disjoint worker slots,
      runs partition 0 on the caller, and releases the slots on return
      (the RAII ``RentedThreads`` guard);
    - **deferred resize**: a resize before any index attaches is recorded
      and applied on first :meth:`on_index_attached` (no threads are spawned
      in deployments that never create an SVS index); a *shrink* while
      scheduled jobs are in flight is recorded and applied when the pending
      count drops to zero (never destroys a slot a scheduled job will rent);
    - ``begin_scheduled_job``/``end_scheduled_job`` bracket each logical
      multi-thread job (the tiered ``SVSMultiThreadJob`` rendezvous,
      svs_tiered.h:35-215) and snapshot the parallelism it may use.
    """

    _instance: SharedSVSThreadPool | None = None
    _instance_lock = threading.Lock()

    def __init__(self) -> None:
        self._mutex = threading.Lock()
        self._slots: list[_ThreadSlot] = []
        self._deferred_size: int | None = None
        self._has_attached_index = False
        self._pending_jobs = 0

    # -- singleton ---------------------------------------------------------
    @classmethod
    def instance(cls) -> SharedSVSThreadPool:
        with cls._instance_lock:
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

    @classmethod
    def is_initialized(cls) -> bool:
        return cls._instance is not None

    # -- sizing ------------------------------------------------------------
    def size(self) -> int:
        with self._mutex:
            return len(self._slots) + 1

    def resize(self, new_size: int) -> None:
        new_size = max(int(new_size), 1)
        with self._mutex:
            if self._has_attached_index:
                self._resize_locked(new_size)
            else:
                self._deferred_size = new_size

    def _resize_locked(self, new_size: int) -> None:
        if self._pending_jobs > 0 and new_size - 1 < len(self._slots):
            self._deferred_size = new_size  # shrink deferred to quiescence
            return
        want = new_size - 1
        while len(self._slots) < want:
            self._slots.append(_ThreadSlot())
        while len(self._slots) > want:
            slot = self._slots.pop()
            if slot.occupied:  # pragma: no cover - guarded by pending_jobs
                self._slots.insert(0, slot)
                self._deferred_size = new_size
                return
            slot.stop()

    def on_index_attached(self) -> None:
        """First SVS index construction applies any earlier resize()
        (svs_utils.h:510-518 ``onIndexAttached``)."""
        with self._mutex:
            if self._has_attached_index:
                return
            self._has_attached_index = True
            if self._deferred_size is not None:
                self._resize_locked(self._deferred_size)
                self._deferred_size = None

    # -- memory accounting (svs_utils.h getSharedAllocationSize) ------------
    def shared_allocation_size(self) -> int:
        """Bytes attributable to the shared pool; 0 until an index attaches
        so non-SVS deployments report no shared memory."""
        with self._mutex:
            if not self._has_attached_index:
                return 0
            # Report per-slot bookkeeping the way the reference reports its
            # slot vector (thread stacks are lazily committed virtual memory
            # and not charged, matching the reference's accounting).
            return len(self._slots) * _SLOT_BOOKKEEPING_BYTES

    # -- scheduled-job protocol ---------------------------------------------
    def begin_scheduled_job(self) -> int:
        with self._mutex:
            self._pending_jobs += 1
            return len(self._slots) + 1

    def end_scheduled_job(self) -> None:
        with self._mutex:
            assert self._pending_jobs > 0, "unbalanced end_scheduled_job"
            self._pending_jobs -= 1
            if self._pending_jobs == 0 and self._deferred_size is not None:
                self._resize_locked(self._deferred_size)
                self._deferred_size = None

    # -- rental -------------------------------------------------------------
    def _rent(self, count: int) -> list[_ThreadSlot]:
        rented: list[_ThreadSlot] = []
        with self._mutex:
            for slot in self._slots:
                if not slot.occupied:
                    slot.occupied = True
                    rented.append(slot)
                    if len(rented) >= count:
                        break
        return rented

    def _release(self, rented: list[_ThreadSlot]) -> None:
        with self._mutex:
            for slot in rented:
                slot.occupied = False

    def parallel_for(self, fn, n: int) -> None:
        """Run ``fn(0..n-1)`` with partition 0 on the calling thread and the
        rest on rented workers (svs_utils.h:556-593). If fewer slots are
        free than requested, the caller runs the leftover partitions itself
        (degrades to serial instead of the reference's scheduling-bug
        exception: Python has no RediSearch reserve-job guarantee)."""
        if n <= 0:
            return
        if n == 1:
            fn(0)
            return
        rented = self._rent(n - 1)
        try:
            for i, slot in enumerate(rented):
                slot.assign(fn, i + 1)
            errors: list[BaseException] = []
            try:
                fn(0)
            except BaseException as e:
                errors.append(e)
            for i in range(len(rented) + 1, n):  # unrented leftovers
                try:
                    fn(i)
                except BaseException as e:
                    errors.append(e)
            for slot in rented:
                slot.join_work()
                if slot.error is not None:
                    errors.append(slot.error)
            if errors:
                raise errors[0]
        finally:
            self._release(rented)

    # -- test hook (svs_utils.h resetForTest) --------------------------------
    def reset_for_test(self) -> None:
        with self._mutex:
            assert self._pending_jobs == 0, "reset with jobs in flight"
            for slot in self._slots:
                slot.stop()
            self._slots.clear()
            self._deferred_size = None
            self._has_attached_index = False
