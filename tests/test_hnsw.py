"""HNSW semantics + recall — analog of ``tests/unit/test_hnsw.cpp`` and
``tests/flow/test_hnsw.py`` (sanity, recall-with-deletion, batch iterator,
range, multi-value).
"""

import numpy as np
import pytest

from vectorsimilarity_tpu import (
    HNSWParams,
    QueryReplyOrder,
    VecSimAlgo,
    VecSimMetric,
    VecSimParams,
    VecSimType,
    create_index,
)
from common import gt_topk, recall


def make_hnsw(dim=16, metric=VecSimMetric.L2, vtype=VecSimType.FLOAT32, multi=False,
              M=16, efC=100, efR=10):
    p = HNSWParams(type=vtype, dim=dim, metric=metric, multi=multi,
                   M=M, efConstruction=efC, efRuntime=efR)
    return create_index(VecSimParams(algo=VecSimAlgo.HNSWLIB, hnswParams=p))


def test_empty():
    idx = make_hnsw()
    assert idx.index_size == 0
    assert len(idx.topk_query(np.zeros(16, np.float32), 5)) == 0


def test_sanity_small():
    idx = make_hnsw(dim=4)
    for i in range(10):
        idx.add_vector(np.full(4, i, np.float32), i)
    assert idx.index_size == 10
    rep = idx.topk_query(np.full(4, 4.2, np.float32), 3)
    assert rep.ids[0] == 4
    assert set(rep.ids.tolist()) == {3, 4, 5}


@pytest.mark.parametrize("metric", [VecSimMetric.L2, VecSimMetric.Cosine])
def test_recall_vs_ground_truth(metric):
    rng = np.random.default_rng(0)
    n, dim, k = 1000, 24, 10
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = make_hnsw(dim=dim, metric=metric, efC=150, efR=50)
    idx.add_vector_batch(data, list(range(n)))
    queries = rng.standard_normal((20, dim)).astype(np.float32)
    d, qq = data, queries
    m = metric
    if metric == VecSimMetric.Cosine:
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        qq = qq / np.linalg.norm(qq, axis=-1, keepdims=True)
        m = VecSimMetric.IP
    gt = gt_topk(qq, d, m, k)
    replies = idx.topk_query_batch(queries, k)
    r = recall([rep.ids for rep in replies], gt)
    assert r >= 0.95, f"recall {r}"


def test_incremental_insert_matches_batch_quality():
    rng = np.random.default_rng(1)
    n, dim, k = 400, 16, 5
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = make_hnsw(dim=dim, efC=100, efR=40)
    for i, v in enumerate(data):  # one-at-a-time inserts
        idx.add_vector(v, i)
    gt = gt_topk(data[:10], data, VecSimMetric.L2, k)
    replies = idx.topk_query_batch(data[:10], k)
    r = recall([rep.ids for rep in replies], gt)
    assert r >= 0.95, f"recall {r}"
    # self-query must find itself
    assert replies[3].ids[0] == 3


def test_delete_with_repair_preserves_recall():
    rng = np.random.default_rng(2)
    n, dim, k = 600, 16, 10
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = make_hnsw(dim=dim, efC=120, efR=60)
    idx.add_vector_batch(data, list(range(n)))
    # Delete a third of the index.
    deleted = list(range(0, n, 3))
    for label in deleted:
        assert idx.delete_vector(label) == 1
    assert idx.index_size == n - len(deleted)
    keep = np.asarray([i for i in range(n) if i % 3 != 0])
    queries = rng.standard_normal((10, dim)).astype(np.float32)
    gt = gt_topk(queries, data[keep], VecSimMetric.L2, k, labels=keep)
    replies = idx.topk_query_batch(queries, k)
    for rep in replies:
        assert not set(rep.ids.tolist()) & set(deleted)
    r = recall([rep.ids for rep in replies], gt)
    assert r >= 0.9, f"recall after deletes {r}"


def test_update_overwrite_single():
    idx = make_hnsw(dim=4)
    assert idx.add_vector(np.ones(4, np.float32), 5) == 1
    assert idx.add_vector(np.full(4, 9.0, np.float32), 5) == 0
    assert idx.index_size == 1
    rep = idx.topk_query(np.full(4, 9.0, np.float32), 1)
    assert rep.ids[0] == 5 and rep.scores[0] == pytest.approx(0.0, abs=1e-5)


def test_multi_label_dedup():
    idx = make_hnsw(dim=4, multi=True)
    idx.add_vector(np.array([10, 0, 0, 0], np.float32), 1)
    idx.add_vector(np.array([0, 10, 0, 0], np.float32), 1)
    idx.add_vector(np.array([5, 5, 0, 0], np.float32), 2)
    rep = idx.topk_query(np.array([10, 0, 0, 0], np.float32), 2)
    assert rep.ids[0] == 1 and rep.scores[0] == pytest.approx(0.0)
    assert sorted(rep.ids.tolist()) == [1, 2]
    assert idx.delete_vector(1) == 2
    assert idx.index_label_count == 1


def test_range_query():
    idx = make_hnsw(dim=1, efC=60, efR=30)
    for i in range(50):
        idx.add_vector(np.array([float(i)], np.float32), i)
    rep = idx.range_query(np.array([0.0], np.float32), radius=16.1)  # squared L2
    assert sorted(rep.ids.tolist()) == [0, 1, 2, 3, 4]
    rep = idx.range_query(np.array([25.0], np.float32), radius=4.1,
                          order=QueryReplyOrder.BY_ID)
    assert list(rep.ids) == [23, 24, 25, 26, 27]


def test_batch_iterator_depletes():
    rng = np.random.default_rng(3)
    n, dim = 120, 8
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = make_hnsw(dim=dim, efC=80, efR=20)
    idx.add_vector_batch(data, list(range(n)))
    it = idx.new_batch_iterator(rng.standard_normal(dim).astype(np.float32))
    got = []
    while not it.is_depleted():
        rep = it.get_next_results(25)
        if len(rep) == 0:
            break
        got.extend(rep.ids.tolist())
    assert len(got) == len(set(got))
    assert len(got) >= n * 0.9  # graph search should reach ~everything


def test_mark_delete_tombstones():
    rng = np.random.default_rng(4)
    n, dim = 200, 8
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = make_hnsw(dim=dim, efC=80, efR=40)
    idx.add_vector_batch(data, list(range(n)))
    idx.mark_delete(7)
    assert idx.num_marked_deleted == 1
    assert idx.index_label_count == n - 1
    rep = idx.topk_query(data[7], 5)
    assert 7 not in rep.ids.tolist()


def test_entry_point_delete():
    idx = make_hnsw(dim=2, efC=40)
    for i in range(30):
        idx.add_vector(np.full(2, i, np.float32), i)
    ep_label = int(idx.store.host["label"][idx.entry_id])
    idx.delete_vector(ep_label)
    rep = idx.topk_query(np.zeros(2, np.float32), 5)
    assert len(rep) == 5
    assert ep_label not in rep.ids.tolist()


def test_info_and_neighbors_debug():
    idx = make_hnsw(dim=8, M=8)
    for i in range(20):
        idx.add_vector(np.random.default_rng(i).standard_normal(8).astype(np.float32), i)
    info = idx.debug_info()
    assert info.hnswInfo.M == 8
    assert info.commonInfo.indexSize == 20
    nb = idx.get_element_neighbors(3)
    assert nb is not None and len(nb[0][0]) > 0


def test_int8_hnsw():
    rng = np.random.default_rng(5)
    n, dim, k = 300, 16, 5
    data = rng.integers(-50, 50, size=(n, dim)).astype(np.int8)
    idx = make_hnsw(dim=dim, vtype=VecSimType.INT8, metric=VecSimMetric.Cosine,
                    efC=100, efR=50)
    idx.add_vector_batch(data, list(range(n)))
    q = data[11]
    rep = idx.topk_query(q, k)
    assert rep.ids[0] == 11
