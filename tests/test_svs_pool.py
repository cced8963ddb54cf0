"""Shared SVS thread-pool rental protocol (svs_utils.h:340-620
``VecSimSVSThreadPoolImpl``): deferred sizing, slot rental, scheduled-job
quiescence, and the wiring through the C-API / SVS index / tiered SVS."""

import threading
import time

import numpy as np
import pytest

from vectorsimilarity_tpu import (
    SVSParams,
    TieredIndexParams,
    TieredSVSParams,
    VecSimAlgo,
    VecSimMetric,
    VecSimParams,
    VecSimSvsQuantBits,
    VecSimType,
    create_index,
)
from vectorsimilarity_tpu.utils.thread_pool import SharedSVSThreadPool


def _svs_params(dim=16, metric=VecSimMetric.Cosine,
                quant=VecSimSvsQuantBits.Scalar):
    return VecSimParams(
        algo=VecSimAlgo.SVS,
        svsParams=SVSParams(type=VecSimType.FLOAT32, dim=dim, metric=metric,
                            quantBits=quant, graph_max_degree=16,
                            construction_window_size=50,
                            search_window_size=20))


def _tiered_svs(dim=16, train_threshold=8):
    params = TieredIndexParams(
        primaryIndexParams=_svs_params(dim=dim, metric=VecSimMetric.L2,
                                       quant=VecSimSvsQuantBits.NONE),
        tieredSVSParams=TieredSVSParams(trainingTriggerThreshold=train_threshold,
                                        updateTriggerThreshold=4),
    )
    return create_index(VecSimParams(algo=VecSimAlgo.TIERED, tieredParams=params))


@pytest.fixture(autouse=True)
def fresh_pool():
    pool = SharedSVSThreadPool.instance()
    pool.reset_for_test()
    yield pool
    pool.reset_for_test()


def test_resize_deferred_until_first_index_attach(fresh_pool):
    """svs_utils.h:489-518: no OS threads are spawned in deployments that
    never create an SVS index; the first attach applies the recorded size."""
    fresh_pool.resize(4)
    assert fresh_pool.size() == 1  # recorded, not applied
    fresh_pool.on_index_attached()
    assert fresh_pool.size() == 4


def test_resize_immediate_once_attached(fresh_pool):
    fresh_pool.on_index_attached()
    fresh_pool.resize(3)
    assert fresh_pool.size() == 3
    fresh_pool.resize(6)
    assert fresh_pool.size() == 6
    fresh_pool.resize(2)
    assert fresh_pool.size() == 2
    fresh_pool.resize(0)  # clamped to 1 (vec_sim.cpp:38-48)
    assert fresh_pool.size() == 1


def test_parallel_for_covers_every_partition_once(fresh_pool):
    fresh_pool.on_index_attached()
    fresh_pool.resize(4)
    seen = [0] * 64
    lock = threading.Lock()

    def part(i):
        with lock:
            seen[i] += 1

    fresh_pool.parallel_for(part, 64)
    assert seen == [1] * 64


def test_parallel_for_uses_rented_threads(fresh_pool):
    fresh_pool.on_index_attached()
    fresh_pool.resize(4)
    tids = set()
    gate = threading.Barrier(4, timeout=10)

    def part(i):
        gate.wait()  # forces genuine concurrency across 4 threads
        tids.add(threading.get_ident())

    fresh_pool.parallel_for(part, 4)
    assert len(tids) == 4
    assert threading.get_ident() in tids  # caller runs partition 0


def test_parallel_for_degrades_serially_when_slots_busy(fresh_pool):
    """If fewer slots are free than requested the caller absorbs the
    leftover partitions instead of raising (svs_utils.h:573-580 deviation
    documented on parallel_for)."""
    fresh_pool.on_index_attached()  # size 1: no worker slots at all
    done = []
    fresh_pool.parallel_for(done.append, 5)
    assert sorted(done) == [0, 1, 2, 3, 4]


def test_parallel_for_propagates_worker_error(fresh_pool):
    fresh_pool.on_index_attached()
    fresh_pool.resize(3)

    def part(i):
        if i == 2:
            raise ValueError("partition 2 failed")

    with pytest.raises(ValueError, match="partition 2"):
        fresh_pool.parallel_for(part, 3)
    # Slots were released by the RAII guard: a follow-up run works.
    out = []
    fresh_pool.parallel_for(out.append, 3)
    assert sorted(out) == [0, 1, 2]


def test_shrink_deferred_while_scheduled_job_pending(fresh_pool):
    """svs_utils.h:520-550: a shrink never destroys a slot a scheduled job
    may rent; it is applied when the pending count drops to zero."""
    fresh_pool.on_index_attached()
    fresh_pool.resize(4)
    snapshot = fresh_pool.begin_scheduled_job()
    assert snapshot == 4
    fresh_pool.resize(2)
    assert fresh_pool.size() == 4  # shrink deferred
    fresh_pool.resize(6)
    assert fresh_pool.size() == 6  # grow applies immediately
    fresh_pool.resize(2)
    assert fresh_pool.size() == 6
    fresh_pool.end_scheduled_job()
    assert fresh_pool.size() == 2  # deferred shrink applied at quiescence


def test_concurrent_renters_take_disjoint_slots(fresh_pool):
    fresh_pool.on_index_attached()
    fresh_pool.resize(5)
    counts = {"a": 0, "b": 0}
    lock = threading.Lock()
    errs = []

    def renter(tag):
        try:
            def part(i):
                time.sleep(0.002)
                with lock:
                    counts[tag] += 1

            for _ in range(10):
                fresh_pool.parallel_for(part, 3)
        except BaseException as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=renter, args=(t,)) for t in ("a", "b")]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=30)
    assert not errs
    assert counts == {"a": 30, "b": 30}


def test_api_update_thread_pool_size_resizes_shared_pool(fresh_pool):
    from vectorsimilarity_tpu.api import VecSim_UpdateThreadPoolSize

    VecSim_UpdateThreadPoolSize(3)
    assert fresh_pool.size() == 1  # deferred: nothing attached yet
    fresh_pool.on_index_attached()
    assert fresh_pool.size() == 3


def test_svs_index_attaches_and_shared_memory_reported(fresh_pool):
    from vectorsimilarity_tpu.api import (
        VecSim_GetSharedMemory,
        VecSim_UpdateThreadPoolSize,
    )

    VecSim_UpdateThreadPoolSize(4)
    assert VecSim_GetSharedMemory() == 0
    idx = create_index(_svs_params(dim=16))
    assert fresh_pool.size() == 4  # index creation applied the deferred size
    assert VecSim_GetSharedMemory() > 0
    # Large batch insert exercises the parallel_for normalization partition.
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(4096, 16)).astype(np.float32)
    idx.add_vector_batch(vecs, list(range(4096)))
    assert idx.index_size == 4096
    rep = idx.topk_query(vecs[7], 1)
    assert int(rep.ids[0]) == 7


def test_tiered_svs_migration_is_one_scheduled_job(fresh_pool):
    """A shrink issued mid-migration only lands after the batch update
    finishes (the SVSMultiThreadJob rendezvous guarantee)."""
    from vectorsimilarity_tpu.indexes.tiered_svs import TieredSVSIndex

    fresh_pool.on_index_attached()
    fresh_pool.resize(4)

    events = []
    orig = TieredSVSIndex._execute_batch_update_job

    def spy(self):
        fresh_pool.resize(2)  # arrives while the job is pending
        events.append(fresh_pool.size())
        return orig(self)

    idx = _tiered_svs(dim=16, train_threshold=100)  # high: no auto-migrate
    rng = np.random.default_rng(1)
    for i in range(16):
        idx.add_vector(rng.normal(size=16).astype(np.float32), i)
    assert idx.frontend.index_size == 16
    try:
        TieredSVSIndex._execute_batch_update_job = spy
        idx.flush()
    finally:
        TieredSVSIndex._execute_batch_update_job = orig
    assert idx.backend.index_size == 16
    assert events and events[0] == 4  # shrink deferred during the job
    assert fresh_pool.size() == 2  # applied at end_scheduled_job
