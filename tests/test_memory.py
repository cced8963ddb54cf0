"""Memory accounting — ``test_allocator.cpp`` analog: per-index byte
accounting moves with adds/deletes and estimates are sane."""

import numpy as np

from vectorsimilarity_tpu import (
    BFParams,
    VecSimAlgo,
    VecSimMetric,
    VecSimParams,
    VecSimType,
    create_index,
    estimate_element_size,
    estimate_initial_size,
)


def _params(dim=32):
    return VecSimParams(
        algo=VecSimAlgo.BF,
        bfParams=BFParams(type=VecSimType.FLOAT32, dim=dim, metric=VecSimMetric.L2),
    )


def test_memory_grows_and_shrinks():
    idx = create_index(_params())
    base = idx.stats_info().memory
    assert base > 0
    rng = np.random.default_rng(0)
    for i in range(3000):
        idx.add_vector(rng.standard_normal(32).astype(np.float32), i)
    grown = idx.stats_info().memory
    assert grown > base
    for i in range(2900):
        idx.delete_vector(i)
    idx.store.maybe_shrink()
    shrunk = idx.stats_info().memory
    assert shrunk < grown


def test_estimates_track_reality():
    p = _params()
    est_init = estimate_initial_size(p)
    est_elem = estimate_element_size(p)
    assert est_init > 0 and est_elem >= 32 * 4
    idx = create_index(p)
    rng = np.random.default_rng(1)
    before = idx.stats_info().memory
    # Filling one full block should cost on the order of block * elem size.
    for i in range(1024):
        idx.add_vector(rng.standard_normal(32).astype(np.float32), i)
    after = idx.stats_info().memory
    # Host mirror only (device untouched): within 8x of the estimate.
    assert after - before < 8 * 1024 * est_elem


def test_debug_info_memory_nonzero_all_algos():
    from vectorsimilarity_tpu import HNSWParams, SVSParams

    for params in (
        _params(),
        VecSimParams(algo=VecSimAlgo.HNSWLIB, hnswParams=HNSWParams(
            type=VecSimType.FLOAT32, dim=16, metric=VecSimMetric.L2, M=8)),
        VecSimParams(algo=VecSimAlgo.SVS, svsParams=SVSParams(
            type=VecSimType.FLOAT32, dim=16, metric=VecSimMetric.L2)),
    ):
        idx = create_index(params)
        idx.add_vector(np.zeros(params.algo_params.dim, np.float32), 1)
        assert idx.debug_info().commonInfo.memory > 0
