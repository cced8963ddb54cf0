"""Query-side search options: beam expansion and bf16 navigation rerank.

``config.search_beam_expand`` pops E candidates per beam iteration (E x
fewer while-loop iterations — the query-latency lever); every secondary pop
still requires improving the result window, so recall at equal ef must not
regress vs the E=1 searchLayer stepping (hnsw.h:664-703).

``config.search_nav_bf16`` ranks traversal with the bf16 shadow and
re-scores the returned window exactly (``graph_search.exact_rerank``) — the
reference reports true distances for every result (hnsw.h:1980-1987), so
reported scores must be bit-exact fp32 regardless of navigation precision.
"""

import numpy as np
import pytest

from vectorsimilarity_tpu import config
from vectorsimilarity_tpu.indexes.hnsw import HNSWIndex
from vectorsimilarity_tpu.types import HNSWParams, VecSimMetric, VecSimType
from common import recall


@pytest.fixture
def search_cfg():
    saved = (config.search_beam_expand, config.search_nav_bf16,
             config.search_sub_batch, config.search_sub_batch_min_ef)
    yield config
    (config.search_beam_expand, config.search_nav_bf16,
     config.search_sub_batch, config.search_sub_batch_min_ef) = saved


def _build(n=2000, dim=32, metric=VecSimMetric.L2, seed=3):
    rng = np.random.default_rng(seed)
    data = rng.standard_normal((n, dim), dtype=np.float32)
    idx = HNSWIndex(
        HNSWParams(type=VecSimType.FLOAT32, dim=dim, metric=metric,
                   M=16, efConstruction=100, initialCapacity=n)
    )
    idx.add_vector_batch(data, np.arange(n))
    q = rng.standard_normal((16, dim), dtype=np.float32)
    d2 = ((q[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :10]
    return idx, data, q, gt


def test_expand_auto_policy(search_cfg):
    """"auto" resolves to 1 below the ef threshold and 4 at/above it;
    an int forces that expansion (floored at 1)."""
    search_cfg.search_beam_expand = "auto"
    t = search_cfg.search_expand_auto_ef
    assert search_cfg.resolve_search_expand(t - 1) == 1
    assert search_cfg.resolve_search_expand(t) == 4
    search_cfg.search_beam_expand = 0
    assert search_cfg.resolve_search_expand(10) == 1


def test_sub_batch_policy(search_cfg):
    """"auto" follows the measured schedule (no split at tiny ef, 512 at
    mid ef, 256 at ef>=100); an int engages at/above the ef threshold and
    rounds down to a power of two; 0 disables."""
    search_cfg.search_sub_batch = "auto"
    assert search_cfg.resolve_search_sub_batch(10) == 0
    assert search_cfg.resolve_search_sub_batch(50) == 512
    assert search_cfg.resolve_search_sub_batch(100) == 256
    assert search_cfg.resolve_search_sub_batch(500) == 256
    search_cfg.search_sub_batch = 300
    t = search_cfg.search_sub_batch_min_ef
    assert search_cfg.resolve_search_sub_batch(t - 1) == 0
    assert search_cfg.resolve_search_sub_batch(t) == 256
    search_cfg.search_sub_batch = 0
    assert search_cfg.resolve_search_sub_batch(t) == 0


def test_sub_batch_results_identical(search_cfg):
    """Sub-dispatched searches return byte-identical per-query results:
    beam rows are independent, so chunking the batch is exact (the whole
    point — it only decouples while-loop stragglers)."""
    idx, data, q, gt = _build(n=1500)
    search_cfg.search_nav_bf16 = False
    search_cfg.search_beam_expand = 1
    search_cfg.search_sub_batch = 0
    d0, i0 = idx.search_knn(q, 10, 100)
    search_cfg.search_sub_batch = 4  # 16 queries -> 4 sub-dispatches
    search_cfg.search_sub_batch_min_ef = 0
    d1, i1 = idx.search_knn(q, 10, 100)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    # Device-staged entry point chunks (pipelined) with the same results.
    import jax.numpy as jnp

    qp, qn = idx.preprocess_queries(q)
    qd = jnp.asarray(qp)
    d2, i2 = idx.search_knn_device(qd, 10, 100)
    np.testing.assert_array_equal(np.asarray(i0), i2[: len(q)])
    search_cfg.search_sub_batch = 0
    d3, i3 = idx.search_knn_device(qd, 10, 100)
    np.testing.assert_array_equal(i2, i3)
    np.testing.assert_array_equal(d2, d3)


def test_expand_recall_no_regression(search_cfg):
    idx, data, q, gt = _build()
    search_cfg.search_nav_bf16 = False
    recalls = {}
    for e in (1, 4):
        search_cfg.search_beam_expand = e
        _, ids = idx.search_knn(q, 10, 100)
        recalls[e] = recall(np.asarray(ids)[:, :10], gt)
    # E>1 only broadens exploration; allow tiny per-query tie jitter.
    assert recalls[4] >= recalls[1] - 0.02, recalls


def test_nav_bf16_distances_exact(search_cfg):
    """With bf16 navigation, reported distances are exact fp32 scores."""
    idx, data, q, gt = _build()
    search_cfg.search_beam_expand = 4
    search_cfg.search_nav_bf16 = True
    dists, ids = idx.search_knn(q, 10, 100)
    dists, ids = np.asarray(dists), np.asarray(ids)
    for b in range(len(q)):
        v = ids[b] >= 0
        ref = ((data[ids[b][v]] - q[b]) ** 2).sum(-1)
        np.testing.assert_allclose(dists[b][v], ref, rtol=1e-5, atol=1e-5)
        # rerank sorts ascending (ties by id)
        assert np.all(np.diff(dists[b][v]) >= 0)


def test_nav_bf16_recall_parity(search_cfg):
    idx, data, q, gt = _build()
    search_cfg.search_beam_expand = 4
    out = {}
    for nav in (False, True):
        search_cfg.search_nav_bf16 = nav
        _, ids = idx.search_knn(q, 10, 100)
        out[nav] = recall(np.asarray(ids)[:, :10], gt)
    assert out[True] >= out[False] - 0.02, out


def test_nav_bf16_range_filter_exact(search_cfg):
    """Range query under bf16 nav: every returned score is exact and within
    the radius (the filter runs on reranked fp32 distances)."""
    idx, data, q, gt = _build(n=1000)
    search_cfg.search_nav_bf16 = True
    lab2row = {int(l): i for i, l in enumerate(range(len(data)))}
    radius = float(np.partition(((data - q[0]) ** 2).sum(-1), 30)[30])
    rep = idx.range_query(q[0], radius)
    assert len(rep) > 0
    for lab, score in zip(rep.ids, rep.scores):
        ref = float(((data[lab2row[int(lab)]] - q[0]) ** 2).sum())
        assert score <= radius + 1e-6
        np.testing.assert_allclose(score, ref, rtol=1e-5, atol=1e-6)


def test_batch_iterator_under_nav(search_cfg):
    """Deep paging with bf16 nav + expansion stays complete and exact."""
    idx, data, q, gt = _build(n=600)
    search_cfg.search_nav_bf16 = True
    search_cfg.search_beam_expand = 4
    it = idx.new_batch_iterator(q[0])
    seen = []
    while not it.is_depleted():
        rep = it.get_next_results(100)
        seen.extend(int(l) for l in rep.ids)
    assert len(seen) == len(set(seen)) == 600
