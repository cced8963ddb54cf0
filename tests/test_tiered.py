"""Tiered index semantics — analog of ``tests/unit/test_hnsw_tiered.cpp``:
async insert via the job-queue contract, overwrite invalidation, delete with
tombstone + GC, merged queries, write modes, info composition.
"""

import numpy as np
import pytest

import vectorsimilarity_tpu as vs
from vectorsimilarity_tpu import (
    HNSWParams,
    TieredHNSWParams,
    TieredIndexParams,
    VecSimAlgo,
    VecSimMetric,
    VecSimParams,
    VecSimType,
    VecSimWriteMode,
    create_index,
)
from vectorsimilarity_tpu.utils.thread_pool import JobQueueThreadPool


def make_tiered(dim=8, multi=False, pool=None, flat_limit=0, swap_threshold=0):
    primary = VecSimParams(
        algo=VecSimAlgo.HNSWLIB,
        hnswParams=HNSWParams(
            type=VecSimType.FLOAT32, dim=dim, metric=VecSimMetric.L2, multi=multi,
            M=8, efConstruction=60, efRuntime=30,
        ),
    )
    params = TieredIndexParams(
        primaryIndexParams=primary,
        flatBufferLimit=flat_limit,
        tieredHnswParams=TieredHNSWParams(swapJobThreshold=swap_threshold),
    )
    if pool is not None:
        params.jobQueue = pool
        params.submitCb = pool.submit_cb
    return create_index(VecSimParams(algo=VecSimAlgo.TIERED, tieredParams=params))


def test_sync_mode_insert_and_query():
    idx = make_tiered()
    data = np.random.default_rng(0).standard_normal((50, 8)).astype(np.float32)
    for i, v in enumerate(data):
        idx.add_vector(v, i)
    # Without a job queue, jobs run synchronously: everything migrates to HNSW.
    assert idx.frontend.index_size == 0
    assert idx.backend.index_size == 50
    assert idx.index_size == 50
    rep = idx.topk_query(data[7], 1)
    assert rep.ids[0] == 7


def test_async_insert_with_thread_pool():
    pool = JobQueueThreadPool(3)
    try:
        idx = make_tiered(pool=pool)
        data = np.random.default_rng(1).standard_normal((64, 8)).astype(np.float32)
        for i, v in enumerate(data):
            idx.add_vector(v, i)
        # Reads must see all pre-submit vectors regardless of migration state
        # (vec_sim_tiered_index.h:38-40 guarantee).
        rep = idx.topk_query(data[11], 1)
        assert rep.ids[0] == 11
        assert pool.wait_for_quiescence(60)
        assert idx.frontend.index_size == 0
        assert idx.backend.index_size == 64
        rep = idx.topk_query(data[33], 1)
        assert rep.ids[0] == 33
    finally:
        pool.shutdown()


def test_overwrite_invalidates_pending_job():
    pool = JobQueueThreadPool(1)
    try:
        idx = make_tiered(pool=pool)
        v1 = np.full(8, 1.0, np.float32)
        v2 = np.full(8, 9.0, np.float32)
        assert idx.add_vector(v1, 5) == 1
        assert idx.add_vector(v2, 5) == 0  # overwrite
        pool.wait_for_quiescence(60)
        assert idx.index_label_count == 1
        rep = idx.topk_query(v2, 1)
        assert rep.ids[0] == 5 and rep.scores[0] == pytest.approx(0.0, abs=1e-5)
    finally:
        pool.shutdown()


def test_delete_tombstone_and_gc():
    idx = make_tiered(swap_threshold=100000)  # keep tombstones pending
    data = np.random.default_rng(2).standard_normal((40, 8)).astype(np.float32)
    for i, v in enumerate(data):
        idx.add_vector(v, i)
    assert idx.backend.index_size == 40
    assert idx.delete_vector(3) == 1
    # Tombstoned, not yet physically removed.
    assert idx.backend.num_marked_deleted == 1
    assert idx.stats_info().numberOfMarkedDeleted == 1
    rep = idx.topk_query(data[3], 5)
    assert 3 not in rep.ids.tolist()
    # GC applies the pending swap.
    vs_idx_size_before = idx.backend.store.count
    idx.run_gc()
    assert idx.backend.num_marked_deleted == 0
    assert idx.backend.store.count == vs_idx_size_before - 1
    rep = idx.topk_query(data[4], 1)
    assert rep.ids[0] == 4


def test_swap_threshold_triggers_gc():
    idx = make_tiered(swap_threshold=5)
    data = np.random.default_rng(3).standard_normal((30, 8)).astype(np.float32)
    for i, v in enumerate(data):
        idx.add_vector(v, i)
    for i in range(5):
        idx.delete_vector(i)
    # Threshold reached: physical removal happened automatically.
    assert idx.backend.num_marked_deleted == 0
    assert idx.backend.index_size == 25


def test_inplace_write_mode():
    vs.set_write_mode(VecSimWriteMode.InPlace)
    try:
        idx = make_tiered()
        v = np.ones(8, np.float32)
        idx.add_vector(v, 1)
        assert idx.frontend.index_size == 0
        assert idx.backend.index_size == 1
        assert idx.stats_info().directHNSWInsertions == 1
        assert idx.delete_vector(1) == 1
        assert idx.backend.index_size == 0
    finally:
        vs.set_write_mode(VecSimWriteMode.Async)


def test_flat_buffer_limit_direct_insert():
    pool = JobQueueThreadPool(1)
    try:
        # Stall the pool so the flat buffer stays occupied.
        import threading

        gate = threading.Event()
        blocker = type("B", (), {})()
        blocker.is_valid = True
        blocker.execute = lambda self=None: gate.wait(30)
        pool.submit_cb(None, None, [blocker], [lambda j: gate.wait(30)])
        idx = make_tiered(pool=pool, flat_limit=2)
        data = np.random.default_rng(4).standard_normal((5, 8)).astype(np.float32)
        for i, v in enumerate(data):
            idx.add_vector(v, i)
        assert idx.frontend.index_size == 2  # flat capped
        assert idx.stats_info().directHNSWInsertions == 3
        gate.set()
        pool.wait_for_quiescence(60)
        assert idx.index_size == 5
    finally:
        pool.shutdown()


def test_merged_query_prefers_best_tier_score():
    pool = JobQueueThreadPool(1)
    try:
        import threading

        gate = threading.Event()
        pool.submit_cb(None, None, [None], [lambda j: gate.wait(30)])  # stall
        idx = make_tiered(pool=pool)
        data = np.random.default_rng(5).standard_normal((10, 8)).astype(np.float32)
        for i, v in enumerate(data):
            idx.add_vector(v, i)
        # All vectors still in flat; query must find them.
        rep = idx.topk_query(data[6], 3)
        assert rep.ids[0] == 6
        assert len(set(rep.ids.tolist())) == 3
        gate.set()
    finally:
        pool.shutdown()


def test_tiered_batch_iterator_dedups():
    idx = make_tiered()
    data = np.random.default_rng(6).standard_normal((30, 8)).astype(np.float32)
    for i, v in enumerate(data):
        idx.add_vector(v, i)
    it = idx.new_batch_iterator(data[0])
    seen = []
    while not it.is_depleted():
        rep = it.get_next_results(7)
        if len(rep) == 0:
            break
        seen.extend(rep.ids.tolist())
    assert len(seen) == len(set(seen))
    assert len(seen) >= 27


def test_tiered_info():
    idx = make_tiered()
    info = idx.basic_info()
    assert info.isTiered
    assert info.algo == VecSimAlgo.HNSWLIB
    dbg = idx.debug_info()
    assert dbg.tieredInfo is not None
    assert dbg.tieredInfo.bufferLimit == idx.flat_buffer_limit
    st = idx.stats_info()
    assert st.memory > 0


def test_multi_tiered():
    idx = make_tiered(multi=True)
    idx.add_vector(np.array([1, 0, 0, 0, 0, 0, 0, 0], np.float32), 1)
    idx.add_vector(np.array([0, 1, 0, 0, 0, 0, 0, 0], np.float32), 1)
    idx.add_vector(np.array([0, 0, 1, 0, 0, 0, 0, 0], np.float32), 2)
    assert idx.index_size == 3
    assert idx.index_label_count == 2
    rep = idx.topk_query(np.array([1, 0, 0, 0, 0, 0, 0, 0], np.float32), 2)
    assert rep.ids[0] == 1
    assert sorted(rep.ids.tolist()) == [1, 2]
    assert idx.delete_vector(1) == 2
    assert idx.index_label_count == 1


def test_coalesced_drain_one_job_migrates_queue():
    """One executed insert job migrates every queued vector in a single
    backend batch (the queue is the natural batch); later jobs no-op."""
    import threading

    pool = JobQueueThreadPool(1)
    try:
        idx = make_tiered(pool=pool)
        gate = threading.Event()
        pool.submit_cb(None, None, [None], [lambda j: gate.wait(30)])  # stall
        data = np.random.default_rng(5).standard_normal((48, 8)).astype(np.float32)
        for i, v in enumerate(data):
            idx.add_vector(v, i)
        assert idx.frontend.index_size == 48
        gate.set()
        assert pool.wait_for_quiescence(60)
        assert idx.backend.index_size == 48
        assert idx.frontend.index_size == 0
        rep = idx.topk_query(data[17], 1)
        assert rep.ids[0] == 17
    finally:
        pool.shutdown()


def test_bulk_gc_many_tombstones():
    """run_gc removes ALL tombstones in one batched pass: repairs, label
    remap, compaction — and the survivor graph still answers correctly."""
    from vectorsimilarity_tpu.utils.serializer import check_integrity

    idx = make_tiered(swap_threshold=100000)
    n = 300
    data = np.random.default_rng(6).standard_normal((n, 8)).astype(np.float32)
    idx.backend.add_vector_batch(data, list(range(n)))
    for i in range(100):
        idx.delete_vector(i)
    assert idx.backend.num_marked_deleted == 100
    idx.run_gc()
    be = idx.backend
    assert be.num_marked_deleted == 0
    assert be.index_size == 200
    assert check_integrity(be)
    be._ensure_host_links()
    cnt = be.store.count
    l0 = be.store.host["links0"][:cnt]
    assert l0.max(initial=-1) < cnt
    rep = idx.topk_query(data[150], 1)
    assert rep.ids[0] == 150
    rep = idx.topk_query(data[3], 10)
    assert all(r >= 100 for r in rep.ids.tolist())
    # survivor recall vs brute force
    live = data[100:]
    q = live[:16]
    gt = np.argsort(((q[:, None] - live[None]) ** 2).sum(-1), axis=1)[:, :5] + 100
    hits = 0
    for b in range(16):
        rep = idx.topk_query(q[b], 5)
        hits += len(set(rep.ids.tolist()) & set(gt[b].tolist()))
    assert hits / 80 >= 0.9


def test_bulk_gc_multi_backend():
    """Bulk GC on a multi-value backend keeps per-label id sets coherent."""
    from vectorsimilarity_tpu.utils.serializer import check_integrity

    idx = make_tiered(multi=True, swap_threshold=100000)
    data = np.random.default_rng(7).standard_normal((120, 8)).astype(np.float32)
    idx.backend.add_vector_batch(data, [i // 2 for i in range(120)])  # 2 ids/label
    for lab in range(20):
        assert idx.delete_vector(lab) == 2
    idx.run_gc()
    be = idx.backend
    assert be.index_size == 80 and be.index_label_count == 40
    assert check_integrity(be)
    rep = idx.topk_query(data[80], 1)
    assert rep.ids[0] == 40
