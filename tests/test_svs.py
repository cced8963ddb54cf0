"""SVS-Vamana semantics — analog of ``tests/flow/test_svs.py`` /
``test_svs_tiered.py``: recall vs ground truth, quantized modes, deletes,
batch iterator, tiered batch migration thresholds.
"""

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
from common import gt_topk, recall


def make_svs(dim=16, metric=VecSimMetric.L2, multi=False, quant=VecSimSvsQuantBits.NONE,
             R=32, L=100, ws=30):
    p = SVSParams(type=VecSimType.FLOAT32, dim=dim, metric=metric, multi=multi,
                  quantBits=quant, graph_max_degree=R,
                  construction_window_size=L, search_window_size=ws)
    return create_index(VecSimParams(algo=VecSimAlgo.SVS, svsParams=p))


def test_sanity():
    idx = make_svs(dim=4)
    for i in range(20):
        idx.add_vector(np.full(4, i, np.float32), i)
    rep = idx.topk_query(np.full(4, 7.2, np.float32), 3)
    assert rep.ids[0] == 7
    assert set(rep.ids.tolist()) == {6, 7, 8}


@pytest.mark.parametrize("metric", [VecSimMetric.L2, VecSimMetric.Cosine])
def test_recall(metric):
    rng = np.random.default_rng(0)
    n, dim, k = 800, 24, 10
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = make_svs(dim=dim, metric=metric, L=150, ws=60)
    idx.add_vector_batch(data, list(range(n)))
    queries = rng.standard_normal((15, dim)).astype(np.float32)
    d, qq, m = data, queries, metric
    if metric == VecSimMetric.Cosine:
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        qq = qq / np.linalg.norm(qq, axis=-1, keepdims=True)
        m = VecSimMetric.IP
    gt = gt_topk(qq, d, m, k)
    replies = idx.topk_query_batch(queries, k)
    r = recall([rep.ids for rep in replies], gt)
    assert r >= 0.9, f"recall {r}"


def test_sq8_quantized_recall():
    rng = np.random.default_rng(1)
    n, dim, k = 500, 32, 10
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = make_svs(dim=dim, quant=VecSimSvsQuantBits.Scalar, L=150, ws=60)
    assert idx.store_kind == "sq8"
    idx.add_vector_batch(data, list(range(n)))
    queries = rng.standard_normal((10, dim)).astype(np.float32)
    gt = gt_topk(queries, data, VecSimMetric.L2, k)
    replies = idx.topk_query_batch(queries, k)
    r = recall([rep.ids for rep in replies], gt)
    assert r >= 0.8, f"quantized recall {r}"  # quantization noise allowed
    # self-query: the quantized self is still nearest
    rep = idx.topk_query(data[42], 1)
    assert rep.ids[0] == 42


def test_quant_modes_are_native():
    # Every quantBits flavor instantiates its real storage mode (no
    # fallback): 4-bit packs two codes per byte, two-level adds residual
    # fields, LeanVec projects the primary space. Deep coverage lives in
    # test_svs_quant.py.
    idx = make_svs(dim=8, quant=VecSimSvsQuantBits.Q4x8_LeanVec)
    assert idx.quant == VecSimSvsQuantBits.Q4x8_LeanVec
    assert idx.is_leanvec and idx.primary_bits == 4 and idx.res_bits == 8
    assert idx.pdim == 4  # default leanvec_dim = dim/2
    assert idx.debug_info().svsInfo.quantBits == VecSimSvsQuantBits.Q4x8_LeanVec
    assert idx.debug_info().svsInfo.leanvecDim == 4
    q4 = make_svs(dim=8, quant=VecSimSvsQuantBits.Q4)
    assert q4.store_kind == "sq4"
    assert q4.store.fields["data"].shape == (4,)  # packed nibbles


def test_delete_and_repair():
    rng = np.random.default_rng(2)
    n, dim = 300, 16
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = make_svs(dim=dim, L=100, ws=50)
    idx.add_vector_batch(data, list(range(n)))
    for i in range(0, 100):
        assert idx.delete_vector(i) == 1
    assert idx.index_size == 200
    rep = idx.topk_query(data[150], 5)
    assert rep.ids[0] == 150
    assert all(x >= 100 for x in rep.ids.tolist())


def test_multi():
    idx = make_svs(dim=4, multi=True)
    idx.add_vector(np.array([9, 0, 0, 0], np.float32), 1)
    idx.add_vector(np.array([0, 9, 0, 0], np.float32), 1)
    idx.add_vector(np.array([4, 4, 0, 0], np.float32), 2)
    rep = idx.topk_query(np.array([9, 0, 0, 0], np.float32), 2)
    assert rep.ids[0] == 1
    assert sorted(rep.ids.tolist()) == [1, 2]
    assert idx.delete_vector(1) == 2


def test_range_query():
    idx = make_svs(dim=1, ws=30)
    for i in range(40):
        idx.add_vector(np.array([float(i)], np.float32), i)
    rep = idx.range_query(np.array([10.0], np.float32), radius=4.1)
    assert sorted(rep.ids.tolist()) == [8, 9, 10, 11, 12]


def test_batch_iterator():
    rng = np.random.default_rng(3)
    n, dim = 100, 8
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = make_svs(dim=dim, ws=25)
    idx.add_vector_batch(data, list(range(n)))
    it = idx.new_batch_iterator(rng.standard_normal(dim).astype(np.float32))
    got = []
    while not it.is_depleted():
        rep = it.get_next_results(30)
        if len(rep) == 0:
            break
        got.extend(rep.ids.tolist())
    assert len(got) == len(set(got))
    assert len(got) >= 90


def test_info():
    idx = make_svs(dim=8, R=24)
    info = idx.debug_info()
    assert info.svsInfo.graphMaxDegree == 24
    assert info.commonInfo.basicInfo.algo == VecSimAlgo.SVS


def test_tiered_svs_training_threshold():
    primary = VecSimParams(
        algo=VecSimAlgo.SVS,
        svsParams=SVSParams(type=VecSimType.FLOAT32, dim=8, metric=VecSimMetric.L2,
                            graph_max_degree=16, construction_window_size=50,
                            search_window_size=20),
    )
    params = TieredIndexParams(
        primaryIndexParams=primary,
        tieredSVSParams=TieredSVSParams(trainingTriggerThreshold=32,
                                        updateTriggerThreshold=8),
    )
    idx = create_index(VecSimParams(algo=VecSimAlgo.TIERED, tieredParams=params))
    rng = np.random.default_rng(4)
    data = rng.standard_normal((31, 8)).astype(np.float32)
    for i, v in enumerate(data):
        idx.add_vector(v, i)
    # Below training threshold: everything still flat, backend untrained.
    assert idx.backend.index_size == 0
    assert idx.frontend.index_size == 31
    rep = idx.topk_query(data[5], 1)
    assert rep.ids[0] == 5
    # Crossing the threshold triggers the batch build (sync mode: runs now).
    idx.add_vector(rng.standard_normal(8).astype(np.float32), 31)
    assert idx.backend.index_size == 32
    assert idx.frontend.index_size == 0
    # Subsequent adds migrate at the update threshold.
    more = rng.standard_normal((8, 8)).astype(np.float32)
    for i, v in enumerate(more):
        idx.add_vector(v, 100 + i)
    assert idx.frontend.index_size == 0  # 8 >= updateThreshold -> migrated
    assert idx.backend.index_size == 40
    rep = idx.topk_query(more[3], 1)
    assert rep.ids[0] == 103


def test_tiered_svs_info():
    primary = VecSimParams(
        algo=VecSimAlgo.SVS,
        svsParams=SVSParams(type=VecSimType.FLOAT32, dim=8, metric=VecSimMetric.L2),
    )
    params = TieredIndexParams(primaryIndexParams=primary)
    idx = create_index(VecSimParams(algo=VecSimAlgo.TIERED, tieredParams=params))
    info = idx.basic_info()
    assert info.isTiered and info.algo == VecSimAlgo.SVS
