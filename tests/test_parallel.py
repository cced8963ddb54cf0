"""Concurrency tests — analog of ``test_hnsw_parallel.cpp``: concurrent
queries with concurrent inserts/deletes must stay consistent (no crashes, no
stale results past the guarantees). Single process, many threads, like the
reference's mock-pool stress tests.
"""

import threading

import numpy as np
import pytest

import vectorsimilarity_tpu as vs
from vectorsimilarity_tpu.utils.thread_pool import JobQueueThreadPool


def _hnsw(dim=16):
    return vs.create_index(vs.VecSimParams(
        algo=vs.VecSimAlgo.HNSWLIB,
        hnswParams=vs.HNSWParams(type=vs.VecSimType.FLOAT32, dim=dim,
                                 metric=vs.VecSimMetric.L2, M=8,
                                 efConstruction=50, efRuntime=30)))


def test_parallel_searches():
    rng = np.random.default_rng(0)
    n, dim = 300, 16
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = _hnsw(dim)
    idx.add_vector_batch(data, list(range(n)))
    errors = []

    def searcher(seed):
        try:
            r = np.random.default_rng(seed)
            for _ in range(10):
                q = data[r.integers(0, n)]
                rep = idx.topk_query(q, 5)
                assert len(rep) == 5
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=searcher, args=(s,)) for s in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errors


def test_parallel_insert_and_search():
    rng = np.random.default_rng(1)
    dim = 16
    data = rng.standard_normal((400, dim)).astype(np.float32)
    idx = _hnsw(dim)
    idx.add_vector_batch(data[:100], list(range(100)))
    errors = []
    stop = threading.Event()

    def writer():
        try:
            for i in range(100, 400):
                idx.add_vector(data[i], i)
        except Exception as e:  # pragma: no cover
            errors.append(e)
        finally:
            stop.set()

    def reader():
        try:
            r = np.random.default_rng(2)
            while not stop.is_set():
                q = data[r.integers(0, 100)]
                rep = idx.topk_query(q, 3)
                assert len(rep) == 3
        except Exception as e:  # pragma: no cover
            errors.append(e)

    tw = threading.Thread(target=writer)
    trs = [threading.Thread(target=reader) for _ in range(2)]
    tw.start()
    for t in trs:
        t.start()
    tw.join(300)
    stop.set()
    for t in trs:
        t.join(60)
    assert not errors
    assert idx.index_size == 400
    # Everything remains reachable.
    rep = idx.topk_query(data[399], 1)
    assert rep.ids[0] == 399


def test_parallel_tiered_churn():
    """Concurrent add/delete through the async tiered path + queries."""
    pool = JobQueueThreadPool(3)
    try:
        dim = 8
        primary = vs.VecSimParams(
            algo=vs.VecSimAlgo.HNSWLIB,
            hnswParams=vs.HNSWParams(type=vs.VecSimType.FLOAT32, dim=dim,
                                     metric=vs.VecSimMetric.L2, M=8,
                                     efConstruction=40, efRuntime=20))
        idx = vs.create_index(vs.VecSimParams(
            algo=vs.VecSimAlgo.TIERED,
            tieredParams=vs.TieredIndexParams(primaryIndexParams=primary,
                                              jobQueue=pool,
                                              submitCb=pool.submit_cb)))
        rng = np.random.default_rng(3)
        data = rng.standard_normal((120, dim)).astype(np.float32)
        errors = []

        def churn():
            try:
                for i, v in enumerate(data):
                    idx.add_vector(v, i)
                    if i % 5 == 4:
                        idx.delete_vector(i - 4)
            except Exception as e:  # pragma: no cover
                errors.append(e)

        def query():
            try:
                for _ in range(20):
                    idx.topk_query(data[0], 3)
            except Exception as e:  # pragma: no cover
                errors.append(e)

        t1 = threading.Thread(target=churn)
        t2 = threading.Thread(target=query)
        t1.start(); t2.start()
        t1.join(300); t2.join(300)
        assert not errors
        assert pool.wait_for_quiescence(120)
        assert idx.index_label_count == 120 - 24
    finally:
        pool.shutdown()


def test_pool_resize():
    pool = JobQueueThreadPool(2)
    try:
        pool.resize(5)
        assert pool.num_threads == 5
        done = []
        pool.submit_cb(None, None, list(range(10)), [lambda j: done.append(j)] * 10)
        assert pool.wait_for_quiescence(30)
        assert len(done) == 10
        pool.resize(1)
        done2 = []
        pool.submit_cb(None, None, list(range(5)), [lambda j: done2.append(j)] * 5)
        assert pool.wait_for_quiescence(30)
        assert len(done2) == 5
    finally:
        pool.shutdown()
