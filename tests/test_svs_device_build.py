"""SVS-Vamana device-resident construction through the index API.

Covers the integration of ``ops/graph_build.vamana_connect`` into
``indexes/svs.py``: the default ``add_vector_batch`` path connects whole
batches in single device dispatches (beam from the medoid, alpha pruning,
sort-segment reverse edges), and host link mirrors are pulled lazily for
host-path operations (delete/repair, serialization).
"""

import numpy as np
import pytest

from vectorsimilarity_tpu import config
from vectorsimilarity_tpu.indexes.svs import SVSIndex
from vectorsimilarity_tpu.types import (
    SVSParams,
    SVSRuntimeParams,
    VecSimMetric,
    VecSimQueryParams,
    VecSimSvsQuantBits,
    VecSimType,
)
from vectorsimilarity_tpu.utils.serializer import check_integrity


def _mk(dim=32, degree=16, cws=60, metric=VecSimMetric.L2,
        quant=VecSimSvsQuantBits.NONE, multi=False):
    return SVSIndex(SVSParams(
        type=VecSimType.FLOAT32, dim=dim, metric=metric, multi=multi,
        quantBits=quant, graph_max_degree=degree,
        construction_window_size=cws))


def _recall(idx, data, k=10, nq=32, ws=60, seed=5, label_offset=0):
    rng = np.random.default_rng(seed)
    q = data[rng.integers(0, len(data), nq)] + 0.05 * rng.standard_normal(
        (nq, data.shape[1])).astype(np.float32)
    gt = np.argsort(((q[:, None] - data[None]) ** 2).sum(-1), axis=1)[:, :k]
    gt = gt + label_offset
    params = VecSimQueryParams(svsRuntimeParams=SVSRuntimeParams(windowSize=ws))
    hits = 0
    for b, reply in enumerate(idx.topk_query_batch(q, k, params)):
        hits += len(set(int(x) for x in reply.ids) & set(gt[b].tolist()))
    return hits / (nq * k)


def _graph_invariants(idx):
    idx._ensure_host_links()
    n = idx.store.count
    links = idx.store.host["links"][:n]
    nlinks = idx.store.host["nlinks"][:n]
    assert (nlinks <= idx.R).all()
    for i in range(n):
        row = links[i][: nlinks[i]]
        assert (row >= 0).all() and (row < n).all()
        assert i not in row and len(set(row.tolist())) == len(row)
        assert (links[i][nlinks[i]:] == -1).all()


def test_device_batch_build_recall_and_invariants():
    rng = np.random.default_rng(0)
    N, D = 2048, 32
    data = rng.standard_normal((N, D)).astype(np.float32)
    idx = _mk(dim=D)
    for off in range(0, N, 300):  # non-pow2 batch exercises chunking
        end = min(off + 300, N)
        idx.add_vector_batch(data[off:end], list(range(off, end)))
    assert idx.index_size == N
    assert idx._host_links_stale
    assert idx.build_dropped() == 0
    _graph_invariants(idx)
    assert _recall(idx, data, ws=60) >= 0.9
    assert check_integrity(idx)


def test_device_build_matches_host_build_quality():
    """Device and host construction paths land on statistically equivalent
    graphs (same candidate generation + alpha-prune semantics)."""
    rng = np.random.default_rng(1)
    N, D = 1024, 16
    data = rng.standard_normal((N, D)).astype(np.float32)
    recalls = {}
    old = config.graph_build_device
    try:
        for flag in (True, False):
            config.graph_build_device = flag
            idx = _mk(dim=D)
            for off in range(0, N, 256):
                idx.add_vector_batch(data[off:off + 256],
                                     list(range(off, off + 256)))
            recalls[flag] = _recall(idx, data, ws=60, nq=24)
    finally:
        config.graph_build_device = old
    assert recalls[True] >= 0.9
    assert recalls[True] >= recalls[False] - 0.08


def test_device_build_then_host_ops():
    """Delete after a device build must repair through lazily pulled host
    mirrors (referrer scan + alpha re-prune on fresh links)."""
    rng = np.random.default_rng(2)
    N, D = 600, 16
    data = rng.standard_normal((N, D)).astype(np.float32)
    idx = _mk(dim=D)
    idx.add_vector_batch(data, list(range(N)))
    assert idx._host_links_stale
    for lab in range(0, 60):
        assert idx.delete_vector(lab) == 1
    more = rng.standard_normal((80, D)).astype(np.float32)
    idx.add_vector_batch(more, list(range(N, N + 80)))
    assert idx.index_size == N - 60 + 80
    live = np.concatenate([data[60:], more])
    assert _recall(idx, live, ws=80, label_offset=60) >= 0.85
    assert check_integrity(idx)
    _graph_invariants(idx)


def test_stale_links_survive_capacity_growth():
    rng = np.random.default_rng(3)
    D = 8
    idx = _mk(dim=D, degree=8, cws=30)
    cap0 = idx.store.capacity
    data = rng.standard_normal((cap0, D)).astype(np.float32)
    idx.add_vector_batch(data, list(range(cap0)))
    assert idx._host_links_stale
    more = rng.standard_normal((cap0, D)).astype(np.float32)
    idx.add_vector_batch(more, list(range(cap0, 2 * cap0)))  # forces growth
    assert idx.store.capacity > cap0
    full = np.concatenate([data, more])
    assert _recall(idx, full, ws=60, nq=16) >= 0.85
    _graph_invariants(idx)


@pytest.mark.parametrize("quant", [
    VecSimSvsQuantBits.Scalar,   # SQ8 primary (sq8 kind)
    VecSimSvsQuantBits.Q4,       # packed LVQ4 primary (sq4 kind)
    VecSimSvsQuantBits.Q4x8,     # two-level: 4-bit primary + 8-bit residual
])
def test_device_build_quantized(quant):
    """Quantized stores build on device with primary-space decoded anchors
    (``graph_build.anchor_queries``) and keep rerank-corrected recall."""
    rng = np.random.default_rng(4)
    N, D = 768, 24
    data = rng.standard_normal((N, D)).astype(np.float32)
    idx = _mk(dim=D, quant=quant)
    for off in range(0, N, 256):
        idx.add_vector_batch(data[off:off + 256], list(range(off, off + 256)))
    assert idx.index_size == N
    _graph_invariants(idx)
    assert _recall(idx, data, ws=80, nq=24) >= 0.8


def test_device_build_cosine_multi():
    rng = np.random.default_rng(5)
    N, D = 512, 16
    data = rng.standard_normal((N, D)).astype(np.float32)
    idx = _mk(dim=D, metric=VecSimMetric.Cosine, multi=True)
    idx.add_vector_batch(data, [i // 2 for i in range(N)])  # 2 vectors/label
    reply = idx.topk_query(data[0], 10)
    assert len(set(int(x) for x in reply.ids)) == len(reply.ids) == 10


def test_bulk_build_device_matches_api():
    import jax
    import jax.numpy as jnp

    N, D = 2048, 24
    data_dev = jax.random.normal(jax.random.PRNGKey(7), (N, D), dtype=jnp.float32)
    data = np.asarray(data_dev)
    idx = _mk(dim=D)
    idx.bulk_build_device(data_dev, batch=256, scan_batches=4)
    assert idx.index_size == N
    assert idx.build_dropped() == 0
    assert idx.entry_id >= 0
    _graph_invariants(idx)
    assert _recall(idx, data, ws=60) >= 0.9
    assert check_integrity(idx)


def test_bulk_build_then_delete_pulls_host_mirrors():
    """swap-with-last after a device-adopted build must pull host mirrors
    first — otherwise unfilled host rows get marked dirty and clobber the
    device copy on the next sync."""
    import jax
    import jax.numpy as jnp

    N, D = 1100, 16
    data_dev = jax.random.normal(jax.random.PRNGKey(8), (N, D), dtype=jnp.float32)
    data = np.asarray(data_dev)
    idx = _mk(dim=D)
    idx.bulk_build_device(data_dev, batch=256, scan_batches=2)
    for lab in range(0, 100):
        assert idx.delete_vector(lab) == 1
    # Surviving vectors must still be found exactly (device data intact).
    rep = idx.topk_query(data[500], 10)
    assert int(rep.ids[0]) == 500 and rep.scores[0] <= 1e-5
    assert _recall(idx, data[100:], ws=80, label_offset=100) >= 0.85
    _graph_invariants(idx)
    # get_stored_vectors pulls the device-authoritative rows.
    got = idx.get_stored_vectors(500)[0]
    np.testing.assert_allclose(got, data[500], rtol=1e-6)


@pytest.mark.parametrize("quant", [
    VecSimSvsQuantBits.Scalar,
    VecSimSvsQuantBits.Q4x8_LeanVec,
])
def test_bulk_build_device_quantized(quant):
    """Device-side quantization pipeline (SQ8 / LeanVec PCA + secondary)
    inside bulk_build_device."""
    import jax
    import jax.numpy as jnp

    N, D = 1024, 32
    data_dev = jax.random.normal(jax.random.PRNGKey(9), (N, D), dtype=jnp.float32)
    data = np.asarray(data_dev)
    idx = _mk(dim=D, metric=VecSimMetric.Cosine, quant=quant)
    idx.bulk_build_device(data_dev, batch=256, scan_batches=2)
    assert idx.index_size == N
    _graph_invariants(idx)
    dn = data / np.linalg.norm(data, axis=1, keepdims=True)
    rng = np.random.default_rng(10)
    qi = rng.integers(0, N, 24)
    q = data[qi]
    gt = np.argsort(1.0 - dn @ dn[qi].T, axis=0).T[:, :10]
    params = VecSimQueryParams(svsRuntimeParams=SVSRuntimeParams(windowSize=80))
    hits = 0
    for b, reply in enumerate(idx.topk_query_batch(q, 10, params)):
        hits += len(set(int(x) for x in reply.ids) & set(gt[b].tolist()))
    assert hits / (24 * 10) >= 0.8
    # get_distance_from decodes through pulled host mirrors.
    d0 = idx.get_distance_from(int(qi[0]), q[0])
    assert np.isfinite(d0) and d0 <= 0.2


def test_svs_folder_serialization_after_device_build(tmp_path):
    """save_svs_folder pulls device-authoritative links before dumping."""
    from vectorsimilarity_tpu.utils.svs_file_format import (
        load_svs_folder, save_svs_folder)

    rng = np.random.default_rng(6)
    N, D = 400, 16
    data = rng.standard_normal((N, D)).astype(np.float32)
    idx = _mk(dim=D)
    idx.add_vector_batch(data, list(range(N)))
    assert idx._host_links_stale
    loc = str(tmp_path / "svs_folder")
    save_svs_folder(idx, loc)
    idx2 = _mk(dim=D)
    load_svs_folder(idx2, loc)
    assert idx2.index_size == N
    assert _recall(idx2, data, ws=60, nq=16) >= 0.85
