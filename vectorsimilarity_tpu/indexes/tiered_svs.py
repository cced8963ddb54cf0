"""Tiered SVS — flat frontend + Vamana backend with batch-migration jobs.

Reference: ``algorithms/svs/svs_tiered.h``. Unlike tiered HNSW's per-vector
insert jobs, SVS migrates in *batches*: the backend is only built once the
flat buffer reaches ``trainingTriggerThreshold`` (default 10x1024,
vec_sim_common.h:53), and afterwards an update job drains the flat buffer
whenever it reaches ``updateTriggerThreshold`` (default 1024). The
reference's swap/delete journals (svs_tiered.h:644-770) replay flat-buffer
mutations that raced the copy; the same protocol here: the backend batch
build runs outside the global lock (readers/writers keep flowing against
the flat tier), mid-copy deletes/overwrites land in the ``_superseded``
journal, and completion replays them by tombstoning the landed copies and
removing flat rows by op-id (every pre-submit vector stays queryable
throughout).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..types import (
    SVS_VAMANA_DEFAULT_TRAINING_THRESHOLD,
    SVS_VAMANA_DEFAULT_UPDATE_THRESHOLD,
    TieredIndexParams,
    VecSimWriteMode,
)
from ..core.interface import VecSimIndexBase
from ..utils.thread_pool import SharedSVSThreadPool
from .tiered import SVS_BATCH_UPDATE_JOB, SVS_GC_JOB, AsyncJob, TieredHNSWIndex


class TieredSVSIndex(TieredHNSWIndex):
    def __init__(self, params: TieredIndexParams, log_ctx: Any = None):
        super().__init__(params, log_ctx)
        sp = params.tieredSVSParams
        self.training_threshold = (
            sp.trainingTriggerThreshold or SVS_VAMANA_DEFAULT_TRAINING_THRESHOLD
        )
        self.update_threshold = sp.updateTriggerThreshold or SVS_VAMANA_DEFAULT_UPDATE_THRESHOLD
        self._update_scheduled = False

    def _make_backend(self, primary):
        from .svs import SVSIndex

        return SVSIndex(primary.svsParams, primary.logCtx), primary.svsParams

    # ------------------------------------------------------------------
    # Write path: batch-threshold migration (svs_tiered.h:35-215)
    # ------------------------------------------------------------------

    def add_vector(self, blob: np.ndarray, label: int) -> int:
        blob = np.asarray(blob)
        if VecSimIndexBase.write_mode == VecSimWriteMode.InPlace and self.backend.index_size:
            # Direct backend inserts serialize with migrations so the
            # completion journal can reason about the backend label set.
            with self._migrate_lock, self._glock:
                deleted = self.delete_vector(label) if not self.backend.multi else 0
                self.backend.add_vector_batch(blob.reshape(1, -1), [label])
                self.direct_hnsw_insertions += 1
                return 1 - deleted if not self.backend.multi else 1
        with self._glock:
            ret = 1
            if not self.backend.multi:
                if self._label_exists(label):
                    ret = 0
                if label in self._inflight:
                    # Mid-copy overwrite: journal it; the landed old copy is
                    # tombstoned at migration completion.
                    self._superseded.add(label)
                if label in self.frontend.labels:
                    self.frontend.delete_vector(label)
                if label in self.backend.labels:
                    self._mark_delete_backend(label)
            op = self._op_counter
            self._op_counter += 1
            self.frontend.add_vector(blob, label)
            if self.frontend.multi:
                fe = self.frontend
                fe.store.host["opid"][fe.store.count - 1] = op
            job = self._maybe_schedule_update()
        if job is not None:
            self._submit([job])
        return ret

    def _maybe_schedule_update(self):
        """Returns an update job when a threshold is crossed."""
        if self._update_scheduled:
            return None
        flat = self.frontend.index_size
        threshold = (
            self.training_threshold if self.backend.index_size == 0 else self.update_threshold
        )
        if flat >= threshold:
            self._update_scheduled = True
            return AsyncJob(SVS_BATCH_UPDATE_JOB, self)
        return None

    def _execute_job(self, job: AsyncJob) -> None:
        if job.job_type == SVS_BATCH_UPDATE_JOB:
            self._execute_batch_update()
        elif job.job_type == SVS_GC_JOB:
            self.run_gc()
        else:
            super()._execute_job(job)

    def _execute_batch_update(self) -> None:
        """Drain the flat buffer into the Vamana backend in one batch
        (svs_tiered.h:644-770 updateSVSIndex).

        The backend build runs OUTSIDE the global lock; mid-copy deletes
        and overwrites are journaled (the reference's swaps/deleted-labels
        journals) and replayed at completion: superseded labels get their
        just-landed copies tombstoned, and flat rows are removed by op-id
        so newer mid-copy rows survive.

        The migration is bracketed as one scheduled job on the shared SVS
        pool (svs_tiered.h:35-215 ``SVSMultiThreadJob`` rendezvous): while
        it is in flight a shrink of the pool is deferred, so worker slots
        the batch build's ``parallel_for`` may rent are never destroyed
        mid-job."""
        pool = SharedSVSThreadPool.instance()
        pool.begin_scheduled_job()
        try:
            self._execute_batch_update_job()
        finally:
            pool.end_scheduled_job()

    def _execute_batch_update_job(self) -> None:
        with self._migrate_lock:
            with self._glock:
                self._update_scheduled = False
                fe = self.frontend
                count = fe.store.count
                if count == 0 or fe.index_size == 0:
                    return
                vecs = fe.store.host["data"][:count].copy()
                labels = fe.store.host["label"][:count].copy()
                opids = fe.store.host["opid"][:count].copy() if fe.multi else None
                mig_labels = sorted({int(l) for l in labels})
                for lab in mig_labels:
                    self._inflight[lab] = self._inflight.get(lab, 0) + 1
            self.backend.add_vector_batch(vecs, labels.tolist())
            with self._glock:
                for lab in mig_labels:
                    self._inflight[lab] -= 1
                    if not self._inflight[lab]:
                        del self._inflight[lab]
                for lab in mig_labels:
                    if lab in self._superseded:
                        # Journal replay: deleted/overwritten mid-copy — the
                        # flat row (if any) holds a NEWER value; tombstone
                        # what we just landed and leave the flat tier alone.
                        self._superseded.discard(lab)
                        if lab in self.backend.labels:
                            self._mark_delete_backend(lab)
                        continue
                    if fe.multi:
                        for op in opids[labels == lab]:
                            self._remove_one_from_flat(lab, int(op))
                    else:
                        fe.delete_vector(lab)
        # Mid-copy adds may have refilled the flat buffer past a threshold;
        # re-check OUTSIDE the migrate lock (a synchronous submit callback
        # would re-enter _execute_batch_update).
        with self._glock:
            job = self._maybe_schedule_update()
        if job is not None:
            self._submit([job])

    def flush(self) -> None:
        """Test/ops hook: force-migrate pending flat vectors."""
        self._execute_batch_update()
