"""Beam-search parity with the reference ``searchLayer`` heap semantics.

The north star (BASELINE.md): recall@10 parity with the reference HNSW at
equal ef. ``_ref_search_layer`` below reimplements the candidate-min-heap /
result-max-heap loop of ``hnsw.h:664-703`` verbatim (unbounded candidate
heap, result bounded at ef); the device beam (``ops/graph_search.py``)
approximates the candidate memory with a fixed window. These tests run both
on the SAME graph from the SAME entry points and require the device beam to
match the reference semantics' recall within 0.05 at low and mid ef.
"""

import heapq

import numpy as np
import jax.numpy as jnp
import pytest

from vectorsimilarity_tpu.indexes.hnsw import HNSWIndex
from vectorsimilarity_tpu.ops.graph_search import StoreCtx, beam_search
from vectorsimilarity_tpu.types import HNSWParams, VecSimMetric, VecSimType


def _ref_search_layer(links0, nlinks0, data, q, ep, ef):
    """hnsw.h:664-703: min-heap candidates, ef-bounded max-heap results."""
    def dist(i):
        d = data[i] - q
        return float(np.dot(d, d))

    d0 = dist(ep)
    visited = {ep}
    cand = [(d0, ep)]
    res = [(-d0, ep)]
    while cand:
        d, c = heapq.heappop(cand)
        if d > -res[0][0] and len(res) >= ef:
            break
        for e in links0[c][: nlinks0[c]]:
            e = int(e)
            if e in visited:
                continue
            visited.add(e)
            de = dist(e)
            if len(res) < ef or de < -res[0][0]:
                heapq.heappush(cand, (de, e))
                heapq.heappush(res, (-de, e))
                if len(res) > ef:
                    heapq.heappop(res)
    return sorted((-nd, i) for nd, i in res)


@pytest.fixture(scope="module")
def built_graph():
    rng = np.random.default_rng(11)
    N, D = 8192, 32
    data = rng.standard_normal((N, D)).astype(np.float32)
    idx = HNSWIndex(HNSWParams(
        type=VecSimType.FLOAT32, dim=D, metric=VecSimMetric.L2,
        M=16, efConstruction=100, initialCapacity=N))
    idx.add_vector_batch(data, list(range(N)))
    idx._ensure_host_links()
    queries = data[rng.integers(0, N, 64)] + 0.1 * rng.standard_normal(
        (64, D)).astype(np.float32)
    gt = np.argsort(((queries[:, None] - data[None]) ** 2).sum(-1), 1)[:, :10]
    return idx, data, queries, gt


@pytest.mark.parametrize("ef", [10, 50])
def test_low_ef_recall_matches_reference_semantics(built_graph, ef):
    idx, data, queries, gt = built_graph
    N = len(data)
    links0 = idx.store.host["links0"][:N]
    nlinks0 = idx.store.host["nlinks0"][:N]
    nq = len(queries)

    # Same entry point for both: the graph's level-0 entry after an exact
    # greedy descent is deterministic; use entry_id directly to isolate the
    # level-0 beam comparison.
    ep = idx.entry_id

    ref_hits = 0
    for b in range(nq):
        top = _ref_search_layer(links0, nlinks0, data, queries[b], ep, ef)
        ids = [i for _, i in top[:10]]
        ref_hits += len(set(ids) & set(gt[b].tolist()))
    ref_recall = ref_hits / (nq * 10)

    dev, udev, ctx = idx._device_ctx()
    q = jnp.asarray(queries)
    cur = jnp.full((nq,), ep, dtype=jnp.int32)
    cur_d = jnp.sum((q - ctx.data[cur]) ** 2, axis=1)
    bd, bi = beam_search(
        q, ctx, dev["links0"], None, cur, cur_d, idx.store.capacity,
        ef=ef, metric=VecSimMetric.L2, kind="float")
    ids = np.asarray(bi)[:, :10]
    our_hits = sum(
        len(set(ids[b].tolist()) & set(gt[b].tolist())) for b in range(nq)
    )
    our_recall = our_hits / (nq * 10)

    assert our_recall >= ref_recall - 0.05, (
        f"ef={ef}: device beam {our_recall:.3f} vs reference semantics "
        f"{ref_recall:.3f}"
    )
