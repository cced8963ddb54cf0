"""Reference-format interop: load the reference's own committed V3 fixtures
and round-trip our V3/V4 exporter.
"""

import os

import numpy as np
import pytest

from vectorsimilarity_tpu.utils.hnsw_file_format import load_hnsw_file, save_hnsw_file
from vectorsimilarity_tpu.utils.serializer import check_integrity

REF_DATA = "/root/reference/tests/unit/data"
SINGLE = os.path.join(REF_DATA, "1k-d4-L2-M8-ef_c10_FLOAT32_single.v3")
MULTI = os.path.join(REF_DATA, "1k-d4-L2-M8-ef_c10_FLOAT32_multi_100labels.v3")

needs_fixtures = pytest.mark.skipif(
    not os.path.exists(SINGLE), reason="reference fixtures not available"
)


@needs_fixtures
def test_load_reference_single_v3():
    idx = load_hnsw_file(SINGLE)
    # The committed fixture holds 1001 vectors with blockSize=2.
    assert idx.index_size == 1001
    assert idx.index_label_count == 1001
    assert idx.dim == 4 and idx.M == 8 and idx.M0 == 16
    assert check_integrity(idx)
    # Search the imported graph: every stored vector must find itself.
    data = idx.store.host["data"][:1001]
    labels = idx.store.host["label"][:1001]
    hits = 0
    for probe in range(0, 1000, 97):
        rep = idx.topk_query(data[probe], 1)
        hits += rep.ids[0] == labels[probe]
    assert hits >= 10  # all 11 probes


@needs_fixtures
def test_load_reference_multi_v3():
    idx = load_hnsw_file(MULTI)
    assert idx.index_size == 1001
    assert idx.index_label_count == 100
    assert idx.multi
    rep = idx.topk_query(idx.store.host["data"][5], 10)
    assert len(set(rep.ids.tolist())) == 10  # labels deduped


@needs_fixtures
@pytest.mark.parametrize("version", [3, 4])
def test_roundtrip_reference_format(tmp_path, version):
    idx = load_hnsw_file(SINGLE)
    out = str(tmp_path / f"exported.v{version}")
    save_hnsw_file(idx, out, version=version)
    idx2 = load_hnsw_file(out)
    assert idx2.index_size == idx.index_size
    assert idx2.max_level == idx.max_level
    assert idx2.entry_id == idx.entry_id
    q = idx.store.host["data"][123]
    a = idx.topk_query(q, 5)
    b = idx2.topk_query(q, 5)
    assert a.ids.tolist() == b.ids.tolist()
    np.testing.assert_allclose(a.scores, b.scores, rtol=1e-6)


def test_export_own_build_and_reload(tmp_path):
    from vectorsimilarity_tpu import (
        HNSWParams, VecSimAlgo, VecSimMetric, VecSimParams, VecSimType, create_index,
    )

    rng = np.random.default_rng(0)
    data = rng.standard_normal((300, 8)).astype(np.float32)
    idx = create_index(VecSimParams(algo=VecSimAlgo.HNSWLIB, hnswParams=HNSWParams(
        type=VecSimType.FLOAT32, dim=8, metric=VecSimMetric.L2, M=8,
        efConstruction=60, efRuntime=30)))
    idx.add_vector_batch(data, list(range(300)))
    out = str(tmp_path / "own.v4")
    save_hnsw_file(idx, out)
    idx2 = load_hnsw_file(out)
    assert idx2.index_size == 300
    rep = idx2.topk_query(data[77], 1)
    assert rep.ids[0] == 77


@needs_fixtures
def test_search_reference_graph_recall():
    """Our beam search on the reference's OWN graph must reach full recall
    at small ef — validates searchLayer semantics against genuine hnswlib
    topology, independent of our construction."""
    from vectorsimilarity_tpu import VecSimQueryParams

    idx = load_hnsw_file(SINGLE)
    n = idx.store.count
    data = idx.store.host["data"][:n]
    labels = idx.store.host["label"][:n]
    rng = np.random.default_rng(0)
    q = data[rng.integers(0, n, 32)] + 0.01 * rng.standard_normal((32, 4)).astype(np.float32)
    gt_rows = np.argsort(((q[:, None, :] - data[None]) ** 2).sum(-1), axis=1)[:, :10]
    gt = labels[gt_rows]
    params = VecSimQueryParams()
    params.hnswRuntimeParams.efRuntime = 10
    reps = idx.topk_query_batch(q, 10, params)
    rec = np.mean([len(set(r.ids.tolist()) & set(g.tolist())) / 10 for r, g in zip(reps, gt)])
    assert rec >= 0.99, rec


def test_load_with_device_data(tmp_path):
    """device_data adoption: queries compute against the supplied device
    array while host mirrors keep the file's exact contents (the relay
    fast path — only links/labels upload)."""
    import jax.numpy as jnp

    from vectorsimilarity_tpu import (
        HNSWParams, VecSimAlgo, VecSimMetric, VecSimParams, VecSimType, create_index,
    )

    rng = np.random.default_rng(1)
    data = rng.standard_normal((300, 8)).astype(np.float32)
    idx = create_index(VecSimParams(algo=VecSimAlgo.HNSWLIB, hnswParams=HNSWParams(
        type=VecSimType.FLOAT32, dim=8, metric=VecSimMetric.L2, M=8,
        efConstruction=60, efRuntime=30)))
    idx.add_vector_batch(data, list(range(300)))
    out = str(tmp_path / "dev.v4")
    save_hnsw_file(idx, out)

    calls = {}

    def regen(cap, count, dim):
        calls["shape"] = (cap, count, dim)
        pad = np.zeros((cap, dim), np.float32)
        pad[:count] = data  # "regenerated" bytes identical to the store
        return jnp.asarray(pad)

    idx2 = load_hnsw_file(out, device_data=regen)
    assert calls["shape"][1:] == (300, 8)
    assert calls["shape"][0] == idx2.store.capacity
    # host mirror stays exact (not flagged stale by the adoption)
    np.testing.assert_array_equal(idx2.store.host["data"][:300], data)
    assert not idx2.store._host_stale
    rep = idx2.topk_query(data[77], 5)
    assert rep.ids[0] == 77
    ref = idx.topk_query(data[77], 5)
    assert rep.ids.tolist() == ref.ids.tolist()
    np.testing.assert_allclose(rep.scores, ref.scores, rtol=1e-6)
