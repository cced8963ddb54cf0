"""Distinct-label top-k guarantees for the graph indexes.

The reference's multi HNSW keeps an updatable max-heap keyed by LABEL
(hnsw_multi.h:105, utils/updatable_heap.h:24-120), so a query returns ef
distinct labels no matter how many copies one label has. Here the beam
ranks NODES; these adversarial cases pin the window-allowance + doubling
retry that restores the distinct-label (and tombstone-survivor) guarantee,
including on the sharded classes, where the device merge truncates before
the host-side filter.
"""

import numpy as np
import pytest

import jax

from vectorsimilarity_tpu.indexes.hnsw import HNSWIndex
from vectorsimilarity_tpu.indexes.svs import SVSIndex
from vectorsimilarity_tpu.types import (
    HNSWParams,
    SVSParams,
    VecSimMetric,
    VecSimQueryParams,
    VecSimType,
)


def crowded_dataset(rng, dim, n_dup, n_far):
    """One tight cluster at the query point (the crowd) + a ring of
    progressively farther distinct points."""
    center = rng.standard_normal(dim).astype(np.float32)
    dup = (center + 0.01 * rng.standard_normal((n_dup, dim))).astype(np.float32)
    far = (
        center
        + np.linspace(0.5, 3.0, n_far)[:, None]
        * rng.standard_normal((n_far, dim))
    ).astype(np.float32)
    return center, dup, far


def test_hnsw_multi_distinct_labels():
    rng = np.random.default_rng(11)
    dim, k = 16, 10
    center, dup, far = crowded_dataset(rng, dim, 64, 40)
    p = HNSWParams(
        type=VecSimType.FLOAT32, dim=dim, metric=VecSimMetric.L2,
        multi=True, M=8, efConstruction=80, efRuntime=k,
    )
    idx = HNSWIndex(p)
    # Label 0 owns every crowd copy; labels 1..40 are singletons.
    idx.add_vector_batch(dup, [0] * len(dup))
    idx.add_vector_batch(far, list(range(1, len(far) + 1)))
    rep = idx.topk_query(center, k)
    labs = rep.ids.tolist()
    assert len(labs) == k, labs
    assert len(set(labs)) == k
    assert 0 in labs  # the crowd label itself is the nearest
    assert (np.diff(rep.scores) >= -1e-6).all()


def test_svs_multi_distinct_labels():
    rng = np.random.default_rng(12)
    dim, k = 16, 10
    center, dup, far = crowded_dataset(rng, dim, 64, 40)
    p = SVSParams(
        type=VecSimType.FLOAT32, dim=dim, metric=VecSimMetric.L2,
        multi=True, graph_max_degree=16, construction_window_size=60,
        search_window_size=k,
    )
    idx = SVSIndex(p)
    idx.add_vector_batch(dup, [0] * len(dup))
    idx.add_vector_batch(far, list(range(1, len(far) + 1)))
    rep = idx.topk_query(center, k)
    labs = rep.ids.tolist()
    assert len(labs) == k, labs
    assert len(set(labs)) == k
    assert 0 in labs


def test_hnsw_tombstone_heavy_window():
    """Tombstone the ef nearest nodes: the window must grow past the old
    2x-ef allowance cap and still return k live labels."""
    rng = np.random.default_rng(13)
    dim, k = 16, 8
    center, near, far = crowded_dataset(rng, dim, 80, 30)
    p = HNSWParams(
        type=VecSimType.FLOAT32, dim=dim, metric=VecSimMetric.L2,
        M=8, efConstruction=80, efRuntime=k,
    )
    idx = HNSWIndex(p)
    idx.add_vector_batch(near, list(range(len(near))))
    idx.add_vector_batch(far, list(range(1000, 1000 + len(far))))
    for lab in range(len(near)):  # tombstone the whole near cluster
        assert idx.mark_delete(lab)
    rep = idx.topk_query(center, k)
    labs = rep.ids.tolist()
    assert len(labs) == k, labs
    assert all(l >= 1000 for l in labs), labs


def test_sharded_hnsw_distinct_and_tombstones():
    from vectorsimilarity_tpu.parallel.sharded_graph import ShardedHNSW
    from vectorsimilarity_tpu.parallel.sharding import make_mesh

    mesh = make_mesh(jax.devices()[:8])
    rng = np.random.default_rng(14)
    dim, k = 16, 8
    center, dup, far = crowded_dataset(rng, dim, 48, 64)
    p = HNSWParams(
        type=VecSimType.FLOAT32, dim=dim, metric=VecSimMetric.L2,
        multi=True, M=8, efConstruction=80, efRuntime=k,
    )
    idx = ShardedHNSW(p, mesh)
    idx.add_vector_batch(dup, [0] * len(dup))  # crowd colocates on one shard
    idx.add_vector_batch(far, list(range(1, len(far) + 1)))
    rep = idx.topk_query(center, k)
    labs = rep.ids.tolist()
    assert len(labs) == k, labs
    assert len(set(labs)) == k
    assert 0 in labs
    # Now tombstone a swath of the nearest distinct labels on their shards:
    # the sharded merge must widen past them too.
    order = np.argsort(np.linalg.norm(far - center, axis=1))
    doomed = [int(o) + 1 for o in order[: len(far) // 2]]
    for lab in doomed:
        s = idx._label_shard[lab]
        assert idx.shards[s].mark_delete(lab)
    rep = idx.topk_query(center, k)
    labs = rep.ids.tolist()
    assert len(labs) == k, labs
    assert len(set(labs)) == k
    assert not (set(labs) & set(doomed))
