"""Serialization round-trip — reference serializer test analog."""

import numpy as np
import pytest

from vectorsimilarity_tpu import (
    BFParams,
    HNSWParams,
    SVSParams,
    VecSimAlgo,
    VecSimMetric,
    VecSimParams,
    VecSimType,
    create_index,
)
from vectorsimilarity_tpu.utils.serializer import check_integrity, load_index, save_index


@pytest.mark.parametrize("algo", [VecSimAlgo.BF, VecSimAlgo.HNSWLIB, VecSimAlgo.SVS])
def test_roundtrip(tmp_path, algo):
    rng = np.random.default_rng(0)
    n, dim, k = 200, 12, 5
    data = rng.standard_normal((n, dim)).astype(np.float32)
    if algo == VecSimAlgo.BF:
        params = VecSimParams(algo=algo, bfParams=BFParams(
            type=VecSimType.FLOAT32, dim=dim, metric=VecSimMetric.L2))
    elif algo == VecSimAlgo.HNSWLIB:
        params = VecSimParams(algo=algo, hnswParams=HNSWParams(
            type=VecSimType.FLOAT32, dim=dim, metric=VecSimMetric.L2,
            M=8, efConstruction=60, efRuntime=30))
    else:
        params = VecSimParams(algo=algo, svsParams=SVSParams(
            type=VecSimType.FLOAT32, dim=dim, metric=VecSimMetric.L2,
            graph_max_degree=16, construction_window_size=60, search_window_size=30))
    idx = create_index(params)
    if hasattr(idx, "add_vector_batch"):
        idx.add_vector_batch(data, list(range(n)))
    else:
        for i, v in enumerate(data):
            idx.add_vector(v, i)
    idx.delete_vector(13)
    path = str(tmp_path / "index.npz")
    save_index(idx, path)
    assert check_integrity(idx)
    loaded = load_index(path)
    assert check_integrity(loaded)
    assert loaded.index_size == idx.index_size
    assert loaded.index_label_count == idx.index_label_count
    q = data[57]
    a = idx.topk_query(q, k)
    b = loaded.topk_query(q, k)
    assert a.ids.tolist() == b.ids.tolist()
    np.testing.assert_allclose(a.scores, b.scores, rtol=1e-6)


def test_roundtrip_multi(tmp_path):
    params = VecSimParams(algo=VecSimAlgo.BF, bfParams=BFParams(
        type=VecSimType.FLOAT32, dim=4, metric=VecSimMetric.L2, multi=True))
    idx = create_index(params)
    for i in range(20):
        idx.add_vector(np.full(4, i, np.float32), i % 5)
    path = str(tmp_path / "m.npz")
    save_index(idx, path)
    loaded = load_index(path)
    assert loaded.index_label_count == 5
    assert loaded.index_size == 20
    a = idx.topk_query(np.zeros(4, np.float32), 5)
    b = loaded.topk_query(np.zeros(4, np.float32), 5)
    assert a.ids.tolist() == b.ids.tolist()
