"""HNSW device-resident construction through the index API.

Covers the integration of ``ops/graph_build.py`` into ``indexes/hnsw.py``:
the default ``add_vector_batch`` path now connects whole batches in single
device dispatches, ``bulk_build_device`` builds from device-resident data
via ``build_scan``, and host link mirrors are pulled lazily for host-path
operations (delete/repair, serialization, debug dumps).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import vectorsimilarity_tpu as vs
from vectorsimilarity_tpu import config
from vectorsimilarity_tpu.indexes.hnsw import HNSWIndex
from vectorsimilarity_tpu.types import HNSWParams, VecSimMetric, VecSimType
from vectorsimilarity_tpu.utils.serializer import check_integrity, load_index, save_index


def _mk(n=0, dim=32, M=8, efc=60, metric=VecSimMetric.L2,
        vtype=VecSimType.FLOAT32, multi=False):
    return HNSWIndex(HNSWParams(
        type=vtype, dim=dim, metric=metric, multi=multi,
        M=M, efConstruction=efc, initialCapacity=n))


def _recall(idx, data, k=10, nq=32, ef=60, seed=5, label_offset=0):
    """recall@k of idx vs exact scan over ``data``; row i carries label
    ``i + label_offset``."""
    rng = np.random.default_rng(seed)
    q = data[rng.integers(0, len(data), nq)] + 0.05 * rng.standard_normal(
        (nq, data.shape[1])).astype(np.float32)
    gt = np.argsort(((q[:, None] - data[None]) ** 2).sum(-1), axis=1)[:, :k]
    gt = gt + label_offset
    params = vs.VecSimQueryParams()
    params.hnswRuntimeParams.efRuntime = ef
    hits = 0
    for b, reply in enumerate(idx.topk_query_batch(q, k, params)):
        hits += len(set(int(x) for x in reply.ids) & set(gt[b].tolist()))
    return hits / (nq * k)


def _graph_invariants(idx):
    idx._ensure_host_links()
    n = idx.store.count
    links0 = idx.store.host["links0"][:n]
    nlinks0 = idx.store.host["nlinks0"][:n]
    assert (nlinks0 <= idx.M0).all()
    for i in range(n):
        row = links0[i][: nlinks0[i]]
        assert (row >= 0).all() and (row < n).all()
        assert i not in row and len(set(row.tolist())) == len(row)
        assert (links0[i][nlinks0[i]:] == -1).all()
    for i in range(n):
        lvl = int(idx.store.host["level"][i])
        for l in range(1, lvl + 1):
            row = idx.get_links(i, l)
            assert len(row) <= idx.M and i not in row
            assert len(set(row)) == len(row)


def test_device_batch_build_recall_and_invariants():
    rng = np.random.default_rng(0)
    N, D = 2048, 32
    data = rng.standard_normal((N, D)).astype(np.float32)
    idx = _mk(n=N, dim=D)
    for off in range(0, N, 300):  # non-pow2 batch exercises chunking
        end = min(off + 300, N)
        idx.add_vector_batch(data[off:end], list(range(off, end)))
    assert idx.index_size == N
    assert idx.build_dropped() == 0
    _graph_invariants(idx)
    assert _recall(idx, data, ef=60) >= 0.9
    assert check_integrity(idx)


def test_device_build_then_host_ops():
    """Delete/re-add after a device build must repair through the lazily
    pulled host mirrors."""
    rng = np.random.default_rng(1)
    N, D = 600, 16
    data = rng.standard_normal((N, D)).astype(np.float32)
    idx = _mk(n=N, dim=D)
    idx.add_vector_batch(data, list(range(N)))
    assert idx._host_links_stale
    for lab in range(0, 60):
        assert idx.delete_vector(lab) == 1
    more = rng.standard_normal((80, D)).astype(np.float32)
    idx.add_vector_batch(more, list(range(N, N + 80)))
    assert idx.index_size == N - 60 + 80
    live = np.concatenate([data[60:], more])
    # live row i carries label i + 60 (labels 0..59 were deleted; the new
    # vectors continue at N..N+79 = offset 60 as well)
    assert _recall(idx, live, ef=80, label_offset=60) >= 0.85
    assert check_integrity(idx)


def test_bulk_build_device_matches_api(tmp_path):
    N, D = 3000, 24
    key = jax.random.PRNGKey(3)
    data_dev = jax.random.normal(key, (N, D), dtype=jnp.float32)
    data = np.asarray(data_dev)
    idx = _mk(dim=D)
    idx.bulk_build_device(data_dev, batch=256, scan_batches=4)
    assert idx.index_size == N
    assert idx.build_dropped() == 0
    assert idx.entry_id >= 0 and idx.max_level >= 0
    # entry bookkeeping host == device
    assert int(idx.store.host["level"][idx.entry_id]) == idx.max_level
    assert _recall(idx, data, ef=60) >= 0.9
    _graph_invariants(idx)
    # serialization pulls ALL device-authoritative fields (links, data,
    # sqnorm) into host mirrors before dumping
    p = str(tmp_path / "bulk.npz")
    save_index(idx, p)
    idx2 = load_index(p)
    assert check_integrity(idx2)
    assert _recall(idx2, data, ef=60) >= 0.9


def test_bulk_build_device_cosine_normalizes_on_device():
    N, D = 1024, 16
    data_dev = 3.0 * jax.random.normal(jax.random.PRNGKey(4), (N, D))
    idx = _mk(dim=D, metric=VecSimMetric.Cosine)
    idx.bulk_build_device(data_dev, batch=128, scan_batches=4)
    data = np.asarray(data_dev)
    norm = data / np.linalg.norm(data, axis=1, keepdims=True)
    q = norm[:16]
    gt = np.argsort(1.0 - q @ norm.T, axis=1)[:, :10]
    params = vs.VecSimQueryParams()
    params.hnswRuntimeParams.efRuntime = 80
    hits = 0
    for b, reply in enumerate(idx.topk_query_batch(data[:16], 10, params)):
        hits += len(set(int(x) for x in reply.ids) & set(gt[b].tolist()))
    assert hits / 160 >= 0.9


def test_device_build_int8_cosine():
    rng = np.random.default_rng(6)
    N, D = 512, 16
    data = rng.integers(-100, 100, size=(N, D)).astype(np.int8)
    idx = _mk(n=N, dim=D, metric=VecSimMetric.Cosine, vtype=VecSimType.INT8)
    idx.add_vector_batch(data, list(range(N)))
    f = data.astype(np.float32)
    f = f / np.linalg.norm(f, axis=1, keepdims=True)
    q = data[:16]
    gt = np.argsort(1.0 - (f[:16] @ f.T), axis=1)[:, :10]
    params = vs.VecSimQueryParams()
    params.hnswRuntimeParams.efRuntime = 80
    hits = 0
    for b, reply in enumerate(idx.topk_query_batch(q, 10, params)):
        hits += len(set(int(x) for x in reply.ids) & set(gt[b].tolist()))
    assert hits / 160 >= 0.85


def test_host_path_still_works():
    """config.graph_build_device=False keeps the host-orchestrated
    reference path alive (semantics baseline)."""
    rng = np.random.default_rng(7)
    N, D = 512, 16
    data = rng.standard_normal((N, D)).astype(np.float32)
    old = config.graph_build_device
    config.graph_build_device = False
    try:
        idx = _mk(n=N, dim=D)
        idx.add_vector_batch(data, list(range(N)))
        assert not idx._host_links_stale
        assert _recall(idx, data, ef=60, nq=16) >= 0.9
    finally:
        config.graph_build_device = old


def test_stale_links_survive_capacity_growth():
    """Appending past the capacity bucket while links live on device must
    pull them first (growth re-uploads stores from host mirrors)."""
    rng = np.random.default_rng(8)
    D = 8
    idx = _mk(dim=D, M=4, efc=20)
    cap0 = idx.store.capacity
    data = rng.standard_normal((cap0, D)).astype(np.float32)
    idx.add_vector_batch(data, list(range(cap0)))
    assert idx._host_links_stale
    more = rng.standard_normal((cap0, D)).astype(np.float32)
    idx.add_vector_batch(more, list(range(cap0, 2 * cap0)))  # forces growth
    assert idx.store.capacity > cap0
    full = np.concatenate([data, more])
    assert _recall(idx, full, ef=40, nq=16) >= 0.85
    _graph_invariants(idx)


def test_multi_device_build_dedup():
    rng = np.random.default_rng(9)
    N, D = 256, 8
    data = rng.standard_normal((N, D)).astype(np.float32)
    idx = _mk(n=N, dim=D, multi=True)
    idx.add_vector_batch(data, [i // 2 for i in range(N)])  # 2 vectors/label
    reply = idx.topk_query(data[0], 10)
    assert len(set(int(x) for x in reply.ids)) == len(reply.ids) == 10


def test_batched_overwrite_updates_labels():
    """Overwriting many labels in one batch takes the tombstone+bulk-removal
    path (updated-index workload) and leaves a clean, correct index."""
    rng = np.random.default_rng(12)
    N, D = 500, 16
    d1 = rng.standard_normal((N, D)).astype(np.float32)
    d2 = rng.standard_normal((N, D)).astype(np.float32)
    idx = _mk(n=N, dim=D)
    idx.add_vector_batch(d1, list(range(N)))
    ret = idx.add_vector_batch(d2, list(range(N)))  # overwrite every label
    assert ret == 0  # no net-new labels
    assert idx.index_size == N
    assert idx.num_marked_deleted == 0
    assert check_integrity(idx)
    assert _recall(idx, d2, ef=80) >= 0.85
    # mixed batch: 50 overwrites + 50 fresh labels
    d3 = rng.standard_normal((100, D)).astype(np.float32)
    ret = idx.add_vector_batch(d3, list(range(450, 550)))
    assert ret == 50
    assert idx.index_size == N + 50
    full = np.concatenate([d2[:450], d3])
    assert _recall(idx, full, ef=80) >= 0.85
    assert check_integrity(idx)


def test_bulk_build_then_delete_pulls_host_mirrors():
    """swap-with-last after bulk_build_device must pull the device-adopted
    host mirrors first (store.swap_delete guard) — otherwise unfilled host
    rows get marked dirty and clobber device data on the next sync."""
    N, D = 1100, 16
    data_dev = jax.random.normal(jax.random.PRNGKey(13), (N, D), dtype=jnp.float32)
    data = np.asarray(data_dev)
    idx = _mk(dim=D)
    idx.bulk_build_device(data_dev, batch=256, scan_batches=2)
    for lab in range(0, 100):
        assert idx.delete_vector(lab) == 1
    rep = idx.topk_query(data[500], 10)
    assert int(rep.ids[0]) == 500 and rep.scores[0] <= 1e-5
    assert _recall(idx, data[100:], ef=80, label_offset=100) >= 0.85
    _graph_invariants(idx)
    got = idx.get_stored_vectors(500)[0]
    np.testing.assert_allclose(got, data[500], rtol=1e-6)
    assert check_integrity(idx)
