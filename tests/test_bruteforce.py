"""BF index semantics — analog of ``tests/unit/test_bruteforce.cpp`` and
``tests/flow/test_bruteforce.py``: exact KNN vs numpy ground truth, range,
delete/update with swap-with-last, batch iterator, ad-hoc heuristic, info.
"""

import numpy as np
import pytest

from vectorsimilarity_tpu import (
    BFParams,
    QueryReplyOrder,
    VecSimAlgo,
    VecSimMetric,
    VecSimParams,
    VecSimQueryReplyCode,
    VecSimType,
    create_index,
)
from common import gt_scores, gt_topk, recall


def make_bf(dim=16, metric=VecSimMetric.L2, vtype=VecSimType.FLOAT32, multi=False, block=None):
    p = BFParams(type=vtype, dim=dim, metric=metric, multi=multi)
    if block:
        p.blockSize = block
    return create_index(VecSimParams(algo=VecSimAlgo.BF, bfParams=p))


def test_empty_index():
    idx = make_bf()
    assert idx.index_size == 0
    assert len(idx.topk_query(np.zeros(16, np.float32), 5)) == 0
    assert np.isnan(idx.get_distance_from(7, np.zeros(16, np.float32)))


@pytest.mark.parametrize("metric", [VecSimMetric.L2, VecSimMetric.IP, VecSimMetric.Cosine])
def test_topk_exact_vs_numpy(metric):
    rng = np.random.default_rng(0)
    n, dim, k = 500, 24, 11
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = make_bf(dim=dim, metric=metric)
    for i, v in enumerate(data):
        idx.add_vector(v, 1000 + i)
    assert idx.index_size == n
    q = rng.standard_normal(dim).astype(np.float32)
    rep = idx.topk_query(q, k)
    # Ground truth honors the preprocessing: cosine compares normalized.
    d, qq = data, q[None]
    if metric == VecSimMetric.Cosine:
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        qq = qq / np.linalg.norm(qq)
    want = gt_topk(qq, d, metric if metric != VecSimMetric.Cosine else VecSimMetric.IP, k)
    assert recall([rep.ids - 1000], want) == 1.0
    # scores ascending
    assert (np.diff(rep.scores) >= 0).all()


def test_topk_k_larger_than_index():
    idx = make_bf(dim=4)
    for i in range(3):
        idx.add_vector(np.full(4, i, np.float32), i)
    rep = idx.topk_query(np.zeros(4, np.float32), 10)
    assert len(rep) == 3
    assert list(rep.ids) == [0, 1, 2]


def test_update_overwrite_single():
    idx = make_bf(dim=4)
    assert idx.add_vector(np.ones(4, np.float32), 5) == 1
    assert idx.add_vector(np.full(4, 9.0, np.float32), 5) == 0  # overwrite
    assert idx.index_size == 1
    assert idx.index_label_count == 1
    rep = idx.topk_query(np.full(4, 9.0, np.float32), 1)
    assert rep.ids[0] == 5 and rep.scores[0] == pytest.approx(0.0, abs=1e-5)


def test_delete_swap_semantics():
    idx = make_bf(dim=2)
    for i in range(10):
        idx.add_vector(np.full(2, i, np.float32), i)
    assert idx.delete_vector(3) == 1
    assert idx.delete_vector(3) == 0
    assert idx.index_size == 9
    # Every remaining label still resolves to its own vector.
    for i in [0, 1, 2, 4, 5, 6, 7, 8, 9]:
        assert idx.get_distance_from(i, np.full(2, i, np.float32)) == pytest.approx(0.0)
    rep = idx.topk_query(np.full(2, 9.0, np.float32), 9)
    assert set(rep.ids.tolist()) == {0, 1, 2, 4, 5, 6, 7, 8, 9}


def test_delete_and_shrink_blocks():
    idx = make_bf(dim=8, block=1024)
    rng = np.random.default_rng(1)
    data = rng.standard_normal((3000, 8)).astype(np.float32)
    for i, v in enumerate(data):
        idx.add_vector(v, i)
    for i in range(2900):
        idx.delete_vector(i)
    assert idx.index_size == 100
    rep = idx.topk_query(data[2950], 1)
    assert rep.ids[0] == 2950


def test_multi_label():
    idx = make_bf(dim=4, multi=True)
    idx.add_vector(np.array([10, 0, 0, 0], np.float32), 1)
    idx.add_vector(np.array([0, 10, 0, 0], np.float32), 1)
    idx.add_vector(np.array([5, 5, 0, 0], np.float32), 2)
    assert idx.index_size == 3
    assert idx.index_label_count == 2
    rep = idx.topk_query(np.array([10, 0, 0, 0], np.float32), 2)
    # label 1's best vector wins with distance 0; each label appears once.
    assert rep.ids[0] == 1 and rep.scores[0] == pytest.approx(0.0)
    assert sorted(rep.ids.tolist()) == [1, 2]
    assert idx.delete_vector(1) == 2
    assert idx.index_size == 1 and idx.index_label_count == 1


def test_multi_get_distance_is_min():
    idx = make_bf(dim=2, multi=True)
    idx.add_vector(np.array([0, 0], np.float32), 7)
    idx.add_vector(np.array([3, 4], np.float32), 7)
    assert idx.get_distance_from(7, np.array([3, 4], np.float32)) == pytest.approx(0.0)


def test_range_query():
    idx = make_bf(dim=1)
    for i in range(20):
        idx.add_vector(np.array([float(i)], np.float32), i)
    rep = idx.range_query(np.array([0.0], np.float32), radius=9.1)  # L2 squared
    assert sorted(rep.ids.tolist()) == [0, 1, 2, 3]
    rep = idx.range_query(np.array([0.0], np.float32), radius=9.1, order=QueryReplyOrder.BY_ID)
    assert list(rep.ids) == [0, 1, 2, 3]


@pytest.mark.parametrize("vtype,lo,hi", [(VecSimType.INT8, -50, 50), (VecSimType.UINT8, 0, 100)])
@pytest.mark.parametrize("metric", [VecSimMetric.L2, VecSimMetric.IP, VecSimMetric.Cosine])
def test_int_types(vtype, lo, hi, metric):
    rng = np.random.default_rng(4)
    n, dim, k = 200, 20, 7
    dt = np.int8 if vtype == VecSimType.INT8 else np.uint8
    data = rng.integers(lo, hi, size=(n, dim)).astype(dt)
    idx = make_bf(dim=dim, metric=metric, vtype=vtype)
    for i, v in enumerate(data):
        idx.add_vector(v, i)
    q = rng.integers(lo, hi, size=dim).astype(dt)
    rep = idx.topk_query(q, k)
    norms = np.sqrt((data.astype(np.int64) ** 2).sum(-1))
    qn = np.sqrt((q.astype(np.int64) ** 2).sum())
    want = gt_topk(q[None], data, metric, k, data_norms=norms, query_norms=np.array([qn]))
    assert recall([rep.ids], want) == 1.0


@pytest.mark.parametrize("vtype", [VecSimType.FLOAT16, VecSimType.BFLOAT16, VecSimType.FLOAT64])
def test_reduced_and_double_precision(vtype):
    rng = np.random.default_rng(6)
    n, dim, k = 300, 16, 5
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = make_bf(dim=dim, metric=VecSimMetric.L2, vtype=vtype)
    for i, v in enumerate(data):
        idx.add_vector(v, i)
    q = data[17]
    rep = idx.topk_query(q, k)
    assert rep.ids[0] == 17
    assert rep.scores[0] == pytest.approx(0.0, abs=1e-2)


def test_batch_iterator_covers_all_in_order():
    rng = np.random.default_rng(8)
    n, dim = 257, 8
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = make_bf(dim=dim)
    for i, v in enumerate(data):
        idx.add_vector(v, i)
    q = rng.standard_normal(dim).astype(np.float32)
    it = idx.new_batch_iterator(q)
    got_ids, last_best = [], -np.inf
    while not it.is_depleted():
        rep = it.get_next_results(50, QueryReplyOrder.BY_SCORE)
        if len(rep) == 0:
            break
        assert rep.scores[0] >= last_best  # batches are globally score-ordered
        last_best = rep.scores[-1]
        got_ids.extend(rep.ids.tolist())
    assert sorted(got_ids) == list(range(n))
    it.reset()
    assert len(it.get_next_results(10)) == 10


def test_batch_iterator_multi_dedups_labels():
    idx = make_bf(dim=2, multi=True)
    for i in range(10):
        idx.add_vector(np.array([i, 0], np.float32), i % 3)
    it = idx.new_batch_iterator(np.zeros(2, np.float32))
    rep = it.get_next_results(10)
    assert sorted(rep.ids.tolist()) == [0, 1, 2]
    assert it.is_depleted()


def test_prefer_adhoc_heuristic_small_index():
    idx = make_bf(dim=16)
    for i in range(10):
        idx.add_vector(np.zeros(16, np.float32), i)
    assert idx.prefer_adhoc_search(5, 3, True) is True  # <=5500 -> adhoc


def test_timeout_returns_timedout():
    import vectorsimilarity_tpu as vs

    idx = make_bf(dim=4)
    idx.add_vector(np.zeros(4, np.float32), 0)
    vs.set_timeout_callback(lambda ctx: 1)
    try:
        rep = idx.topk_query(np.zeros(4, np.float32), 1)
        assert rep.code == VecSimQueryReplyCode.TimedOut
        assert len(rep) == 0
    finally:
        vs.set_timeout_callback(lambda ctx: 0)


def test_info():
    idx = make_bf(dim=16, metric=VecSimMetric.Cosine)
    info = idx.basic_info()
    assert info.algo == VecSimAlgo.BF
    assert info.metric == VecSimMetric.Cosine
    assert info.dim == 16 and not info.isMulti and not info.isTiered
    idx.add_vector(np.ones(16, np.float32), 1)
    st = idx.stats_info()
    assert st.memory > 0
    dbg = idx.debug_info()
    assert dbg.commonInfo.indexSize == 1
    assert dbg.commonInfo.indexLabelCount == 1


def test_batched_queries_match_single():
    rng = np.random.default_rng(12)
    n, dim, k, B = 400, 12, 6, 5
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = make_bf(dim=dim)
    for i, v in enumerate(data):
        idx.add_vector(v, i)
    queries = rng.standard_normal((B, dim)).astype(np.float32)
    batch = idx.topk_query_batch(queries, k)
    for b in range(B):
        single = idx.topk_query(queries[b], k)
        assert batch[b].ids.tolist() == single.ids.tolist()
