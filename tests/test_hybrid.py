"""Hybrid (filtered) query engine — the RediSearch flow made standalone."""

import numpy as np
import pytest

from vectorsimilarity_tpu import (
    BFParams,
    HNSWParams,
    VecSearchMode,
    VecSimAlgo,
    VecSimMetric,
    VecSimParams,
    VecSimQueryParams,
    VecSimType,
    create_index,
)
from vectorsimilarity_tpu.core.hybrid import hybrid_topk


def _bf(dim=8):
    return create_index(VecSimParams(algo=VecSimAlgo.BF, bfParams=BFParams(
        type=VecSimType.FLOAT32, dim=dim, metric=VecSimMetric.L2)))


def _hnsw(dim=8):
    return create_index(VecSimParams(algo=VecSimAlgo.HNSWLIB, hnswParams=HNSWParams(
        type=VecSimType.FLOAT32, dim=dim, metric=VecSimMetric.L2,
        M=8, efConstruction=60, efRuntime=30)))


@pytest.mark.parametrize("make", [_bf, _hnsw])
def test_hybrid_matches_bruteforce_filter(make):
    rng = np.random.default_rng(0)
    n, dim, k = 400, 8, 7
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = make(dim)
    if hasattr(idx, "add_vector_batch"):
        idx.add_vector_batch(data, list(range(n)))
    else:
        for i, v in enumerate(data):
            idx.add_vector(v, i)
    q = rng.standard_normal(dim).astype(np.float32)
    allowed = set(range(0, n, 3))
    rep = hybrid_topk(idx, q, k, allowed)
    assert all(int(l) in allowed for l in rep.ids)
    # Ground truth among the allowed set.
    d = ((data - q) ** 2).sum(1)
    want = sorted(allowed, key=lambda i: d[i])[:k]
    got = rep.ids.tolist()
    assert len(set(got) & set(want)) >= k - 1  # graph index may miss <=1


def test_hybrid_forced_policies():
    rng = np.random.default_rng(1)
    n, dim, k = 100, 8, 5
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = _bf(dim)
    for i, v in enumerate(data):
        idx.add_vector(v, i)
    q = data[0]
    allowed = set(range(50))
    p_adhoc = VecSimQueryParams(searchMode=VecSearchMode.HYBRID_ADHOC_BF)
    rep1 = hybrid_topk(idx, q, k, allowed, p_adhoc)
    assert idx.last_mode == VecSearchMode.HYBRID_ADHOC_BF
    p_batches = VecSimQueryParams(searchMode=VecSearchMode.HYBRID_BATCHES)
    rep2 = hybrid_topk(idx, q, k, allowed, p_batches)
    assert rep1.ids.tolist() == rep2.ids.tolist()
    np.testing.assert_allclose(rep1.scores, rep2.scores, rtol=1e-5)


def test_hybrid_with_predicate_filter():
    idx = _bf(4)
    for i in range(50):
        idx.add_vector(np.full(4, i, np.float32), i)
    rep = hybrid_topk(idx, np.zeros(4, np.float32), 3, lambda lab: lab % 2 == 0)
    assert rep.ids.tolist() == [0, 2, 4]
