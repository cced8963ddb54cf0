"""Native host runtime: ctypes bridge, graph scans, worker pool, and the
pybind11-parity bindings surface.
"""

import numpy as np
import pytest

from vectorsimilarity_tpu import native_bridge


needs_native = pytest.mark.skipif(
    native_bridge.get_lib() is None, reason="native toolchain unavailable"
)


@needs_native
def test_find_referrers_matches_numpy():
    rng = np.random.default_rng(0)
    links = rng.integers(-1, 50, size=(200, 8)).astype(np.int32)
    got = native_bridge.find_referrers(links, 200, 7)
    want = np.nonzero((links == 7).any(axis=1))[0]
    np.testing.assert_array_equal(np.sort(got), want)


@needs_native
def test_rewrite_id():
    links = np.full((10, 4), 3, dtype=np.int32)
    n = native_bridge.rewrite_id(links, 10, 3, 9)
    assert n == 40
    assert (links == 9).all()


@needs_native
def test_native_pool_runs_python_jobs():
    pool = native_bridge.NativePool(3)
    try:
        hits = []
        jobs = list(range(20))
        pool.submit_cb(None, None, jobs, [lambda j: hits.append(j)] * 20)
        assert pool.wait_for_quiescence(30)
        assert sorted(hits) == jobs
    finally:
        pool.shutdown()


@needs_native
def test_native_pool_drives_tiered_index():
    import vectorsimilarity_tpu as vs

    pool = native_bridge.NativePool(2)
    try:
        primary = vs.VecSimParams(
            algo=vs.VecSimAlgo.HNSWLIB,
            hnswParams=vs.HNSWParams(type=vs.VecSimType.FLOAT32, dim=8,
                                     metric=vs.VecSimMetric.L2, M=8,
                                     efConstruction=60, efRuntime=30),
        )
        idx = vs.create_index(vs.VecSimParams(
            algo=vs.VecSimAlgo.TIERED,
            tieredParams=vs.TieredIndexParams(primaryIndexParams=primary,
                                              jobQueue=pool, submitCb=pool.submit_cb)))
        data = np.random.default_rng(1).standard_normal((40, 8)).astype(np.float32)
        for i, v in enumerate(data):
            idx.add_vector(v, i)
        assert pool.wait_for_quiescence(60)
        assert idx.backend.index_size == 40
        assert idx.topk_query(data[9], 1).ids[0] == 9
    finally:
        pool.shutdown()


def test_bindings_surface():
    import vectorsimilarity_tpu.bindings as vb
    from vectorsimilarity_tpu import BFParams, HNSWParams, VecSimMetric, VecSimType

    rng = np.random.default_rng(2)
    data = rng.standard_normal((50, 8)).astype(np.float32)

    bf = vb.BFIndex(BFParams(type=VecSimType.FLOAT32, dim=8, metric=VecSimMetric.L2))
    for i, v in enumerate(data):
        bf.add_vector(v, i)
    labels, dists = bf.knn_query(data[3], 5)
    assert labels.shape == (1, 5) and labels[0, 0] == 3
    labels, dists = bf.knn_parallel(data[:4], 3)
    assert labels.shape == (4, 3)
    assert (labels[:, 0] == np.arange(4)).all()

    hn = vb.HNSWIndex(HNSWParams(type=VecSimType.FLOAT32, dim=8, metric=VecSimMetric.L2,
                                 M=8, efConstruction=60, efRuntime=30))
    for i, v in enumerate(data):
        hn.add_vector(v, i)
    hn.set_ef(50)
    labels, _ = hn.knn_query(data[7], 1)
    assert labels[0, 0] == 7
    assert hn.check_integrity()
    it = hn.create_batch_iterator(data[0])
    l1, _ = it.get_next_results(10)
    assert it.has_next()
    assert len(l1[0]) == 10


def test_bindings_save_load(tmp_path):
    import vectorsimilarity_tpu.bindings as vb
    from vectorsimilarity_tpu import HNSWParams, VecSimMetric, VecSimType

    data = np.random.default_rng(3).standard_normal((60, 8)).astype(np.float32)
    hn = vb.HNSWIndex(HNSWParams(type=VecSimType.FLOAT32, dim=8,
                                 metric=VecSimMetric.L2, M=8, efConstruction=50))
    for i, v in enumerate(data):
        hn.add_vector(v, i)
    path = str(tmp_path / "b.v4")
    hn.save_index(path)
    hn2 = vb.HNSWIndex(location=path)
    assert hn2.index_size() == 60
    labels, _ = hn2.knn_query(data[11], 1)
    assert labels[0, 0] == 11


def test_bindings_tiered():
    import vectorsimilarity_tpu.bindings as vb
    from vectorsimilarity_tpu import HNSWParams, TieredIndexParams, VecSimMetric, VecSimType

    data = np.random.default_rng(4).standard_normal((30, 8)).astype(np.float32)
    t = vb.Tiered_HNSWIndex(
        HNSWParams(type=VecSimType.FLOAT32, dim=8, metric=VecSimMetric.L2,
                   M=8, efConstruction=50, efRuntime=30),
        TieredIndexParams(),
        num_threads=2,
    )
    for i, v in enumerate(data):
        t.add_vector(v, i)
    assert t.wait_for_index(60)
    assert t.get_curr_bf_size() == 0
    assert t.get_hnsw_index_size() == 30
    labels, _ = t.knn_query(data[5], 1)
    assert labels[0, 0] == 5
    t.pool.shutdown()
