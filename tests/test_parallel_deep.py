"""Deep concurrency suite — the ``test_hnsw_parallel.cpp:176-469`` /
``test_hnsw_tiered.cpp`` depth bar: repair-vs-search, insert-vs-delete churn
at thousands of vectors, tiered GC firing under live queries with
swap-threshold 1, batch-iterator-during-mutation, and a deterministic probe
that the tiered migration runs OUTSIDE the global lock with journaled
mid-copy deletes (the svs_tiered.h:644-770 analog).
"""

import threading
import time

import numpy as np
import pytest

import vectorsimilarity_tpu as vs
from vectorsimilarity_tpu.utils.thread_pool import JobQueueThreadPool


def _hnsw(dim=16, ef_c=40, ef_r=30, M=8):
    return vs.create_index(vs.VecSimParams(
        algo=vs.VecSimAlgo.HNSWLIB,
        hnswParams=vs.HNSWParams(type=vs.VecSimType.FLOAT32, dim=dim,
                                 metric=vs.VecSimMetric.L2, M=M,
                                 efConstruction=ef_c, efRuntime=ef_r)))


def _run_threads(fns, timeout=600):
    errors = []

    def wrap(fn):
        try:
            fn()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=wrap, args=(fn,)) for fn in fns]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout)
        assert not t.is_alive(), "thread deadlocked"
    assert not errors, errors


def test_searches_during_repair():
    """In-place deletes (mark + repair + swap) under concurrent queries
    (parallelRepairs shape, test_hnsw_parallel.cpp:306)."""
    rng = np.random.default_rng(0)
    n, dim = 4000, 16
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = _hnsw(dim)
    idx.add_vector_batch(data, list(range(n)))
    stop = threading.Event()

    def deleter():
        try:
            for lab in range(0, n // 2, 1):
                idx.delete_vector(lab)
        finally:
            stop.set()

    def reader():
        r = np.random.default_rng(11)
        while not stop.is_set():
            q = data[r.integers(n // 2, n)]
            rep = idx.topk_query(q, 5)
            assert len(rep) >= 1
            # deleted labels must never surface once delete returns; allow
            # labels mid-delete (we only assert on the stable upper half)
            assert all(l >= 0 for l in rep.ids.tolist())

    _run_threads([deleter, reader, reader])
    assert idx.index_size == n - n // 2
    # Surviving nodes stay reachable through the repaired graph.
    hits = 0
    for lab in range(n // 2, n, 97):
        rep = idx.topk_query(data[lab], 1)
        hits += int(rep.ids[0]) == lab
    want = len(range(n // 2, n, 97))
    assert hits >= want - 2, f"{hits}/{want} reachable after repair"


def test_insert_delete_churn():
    """Concurrent insert + delete + search (parallelRepairInsert shape,
    test_hnsw_parallel.cpp:371)."""
    rng = np.random.default_rng(1)
    n0, n1, dim = 3000, 5000, 16
    data = rng.standard_normal((n1, dim)).astype(np.float32)
    idx = _hnsw(dim)
    idx.add_vector_batch(data[:n0], list(range(n0)))
    stop = threading.Event()

    def writer():
        try:
            for i in range(n0, n1):
                idx.add_vector(data[i], i)
        finally:
            stop.set()

    def deleter():
        for lab in range(0, n0, 2):
            idx.delete_vector(lab)
            if stop.is_set() and lab > n0 // 2:
                break

    def reader():
        r = np.random.default_rng(12)
        while not stop.is_set():
            rep = idx.topk_query(data[r.integers(0, n1)], 3)
            assert rep.code == vs.VecSimQueryReplyCode.OK

    _run_threads([writer, deleter, reader])
    # Deterministic end state for the writer's range.
    for lab in (n0, n1 - 1, (n0 + n1) // 2):
        rep = idx.topk_query(data[lab], 1)
        assert int(rep.ids[0]) == lab


def test_tiered_gc_threshold_one_under_queries():
    """swapJobThreshold=1: every delete triggers physical GC compaction
    while queries and inserts keep flowing (test_hnsw_tiered GC shapes)."""
    pool = JobQueueThreadPool(3)
    try:
        dim = 12
        primary = vs.VecSimParams(
            algo=vs.VecSimAlgo.HNSWLIB,
            hnswParams=vs.HNSWParams(type=vs.VecSimType.FLOAT32, dim=dim,
                                     metric=vs.VecSimMetric.L2, M=8,
                                     efConstruction=30, efRuntime=20))
        idx = vs.create_index(vs.VecSimParams(
            algo=vs.VecSimAlgo.TIERED,
            tieredParams=vs.TieredIndexParams(
                primaryIndexParams=primary, jobQueue=pool,
                submitCb=pool.submit_cb,
                tieredHnswParams=vs.TieredHNSWParams(swapJobThreshold=1))))
        rng = np.random.default_rng(2)
        n = 600
        data = rng.standard_normal((n, dim)).astype(np.float32)
        stop = threading.Event()

        def churn():
            try:
                for i in range(n):
                    idx.add_vector(data[i], i)
                    if i % 3 == 2:
                        idx.delete_vector(i - 2)
            finally:
                stop.set()

        def reader():
            while not stop.is_set():
                rep = idx.topk_query(data[0], 3)
                assert rep.code == vs.VecSimQueryReplyCode.OK

        _run_threads([churn, reader, reader])
        assert pool.wait_for_quiescence(300)
        live = [i for i in range(n) if not (i % 3 == 0 and i + 2 < n)]
        assert idx.index_label_count == len(live)
        # GC actually compacted: no tombstones linger after quiescence.
        idx.run_gc()
        assert idx.backend.num_marked_deleted == 0
    finally:
        pool.shutdown()


def test_batch_iterator_during_mutation():
    """Paging while another thread inserts: served batches stay disjoint
    and valid (TieredHNSW_BatchIterator contract under mutation)."""
    rng = np.random.default_rng(3)
    n, dim = 3000, 16
    data = rng.standard_normal((n + 1000, dim)).astype(np.float32)
    idx = _hnsw(dim)
    idx.add_vector_batch(data[:n], list(range(n)))
    stop = threading.Event()
    served = []

    def writer():
        try:
            for i in range(n, n + 1000):
                idx.add_vector(data[i], i)
        finally:
            stop.set()

    def pager():
        it = idx.new_batch_iterator(data[5])
        while not it.is_depleted() and len(served) < 2000:
            rep = it.get_next_results(100)
            served.extend(rep.ids.tolist())
            if stop.is_set() and len(served) >= 1000:
                break

    _run_threads([writer, pager])
    assert len(served) == len(set(served)), "batches must stay disjoint"
    assert all(0 <= l < n + 1000 for l in served)


def test_tiered_svs_batch_migration_journal():
    """Tiered-SVS: mid-copy delete + overwrite during the batch migration
    are replayed from the journal (svs_tiered.h:644-770 semantics)."""
    pool = JobQueueThreadPool(1)
    try:
        dim = 8
        primary = vs.VecSimParams(
            algo=vs.VecSimAlgo.SVS,
            svsParams=vs.SVSParams(type=vs.VecSimType.FLOAT32, dim=dim,
                                   metric=vs.VecSimMetric.L2))
        idx = vs.create_index(vs.VecSimParams(
            algo=vs.VecSimAlgo.TIERED,
            tieredParams=vs.TieredIndexParams(
                primaryIndexParams=primary, jobQueue=pool,
                submitCb=pool.submit_cb,
                tieredSVSParams=vs.TieredSVSParams(
                    trainingTriggerThreshold=8, updateTriggerThreshold=4))))
        rng = np.random.default_rng(5)
        data = rng.standard_normal((16, dim)).astype(np.float32)

        entered = threading.Event()
        release = threading.Event()
        orig = idx.backend.add_vector_batch

        def slow_add(vecs, labels):
            entered.set()
            assert release.wait(60)
            return orig(vecs, labels)

        idx.backend.add_vector_batch = slow_add
        for i in range(8):
            idx.add_vector(data[i], i)
        assert entered.wait(60), "migration never started"

        # Mid-copy: delete label 2, overwrite label 3 with data[15].
        assert idx.delete_vector(2) == 1
        assert idx.add_vector(data[15], 3) == 0
        rep = idx.topk_query(data[15], 3)
        assert 3 in rep.ids.tolist()

        release.set()
        assert pool.wait_for_quiescence(120)
        idx.flush()  # drain the refilled flat buffer (label 3's new value)
        assert 2 not in idx.topk_query(data[2], 8).ids.tolist()
        # Label 3 resolves to the NEW value.
        assert idx.topk_query(data[15], 1).ids.tolist() == [3]
        assert idx.index_label_count == 7
    finally:
        pool.shutdown()


def test_tiered_migration_outside_lock_with_journal():
    """Deterministic probe of the migration protocol: while the backend
    batch-build is in flight (blocked), queries and deletes must proceed
    (the global lock is NOT held across the device dispatch), and a delete
    hitting a mid-copy label must win once the migration lands — the
    journal replay (svs_tiered.h:644-770 semantics)."""
    pool = JobQueueThreadPool(1)
    try:
        dim = 8
        primary = vs.VecSimParams(
            algo=vs.VecSimAlgo.HNSWLIB,
            hnswParams=vs.HNSWParams(type=vs.VecSimType.FLOAT32, dim=dim,
                                     metric=vs.VecSimMetric.L2, M=8,
                                     efConstruction=30, efRuntime=20))
        idx = vs.create_index(vs.VecSimParams(
            algo=vs.VecSimAlgo.TIERED,
            tieredParams=vs.TieredIndexParams(primaryIndexParams=primary,
                                              jobQueue=pool,
                                              submitCb=pool.submit_cb)))
        rng = np.random.default_rng(4)
        data = rng.standard_normal((8, dim)).astype(np.float32)

        entered = threading.Event()
        release = threading.Event()
        orig = idx.backend.add_vector_batch

        def slow_add(vecs, labels):
            entered.set()
            assert release.wait(60), "test release not signalled"
            return orig(vecs, labels)

        idx.backend.add_vector_batch = slow_add
        for i in range(4):
            idx.add_vector(data[i], i)
        assert entered.wait(60), "migration never started"

        # (1) Queries proceed while the device build is in flight.
        t0 = time.monotonic()
        rep = idx.topk_query(data[1], 2)
        assert rep.code == vs.VecSimQueryReplyCode.OK
        assert time.monotonic() - t0 < 5, "query blocked behind migration"
        assert len(rep) == 2

        # (2) A delete of a mid-copy label returns immediately and is
        # journaled.
        t0 = time.monotonic()
        assert idx.delete_vector(1) == 1
        assert time.monotonic() - t0 < 5, "delete blocked behind migration"
        assert 1 not in idx.topk_query(data[1], 4).ids.tolist()

        # (3) Release the migration; the journal tombstones the landed copy.
        release.set()
        assert pool.wait_for_quiescence(120)
        assert 1 not in idx.topk_query(data[1], 4).ids.tolist()
        assert idx.index_label_count == 3
        idx.run_gc()
        assert 1 not in idx.topk_query(data[1], 4).ids.tolist()
    finally:
        pool.shutdown()
