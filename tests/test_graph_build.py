"""Device-resident HNSW construction kernels (ops/graph_build.py).

The analogs of the reference's insert-path unit tests: segment bookkeeping,
reverse-edge append/overflow-prune semantics
(``revisitNeighborConnections``, hnsw.h:781-868), and end-to-end graph
quality of the fully on-device builder vs brute-force ground truth.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vectorsimilarity_tpu.ops.graph_build import (
    GraphState,
    _segment_ranks,
    apply_reverse_edges_multi,
    build_scan,
    connect_batch,
)
from vectorsimilarity_tpu.ops.graph_search import StoreCtx, beam_search, greedy_level
from vectorsimilarity_tpu.types import VecSimMetric


def test_segment_ranks():
    key = jnp.asarray([2, 2, 2, 5, 7, 7, 9, 9, 9, 9], dtype=jnp.int32)
    is_start, rank, seg_count, seg_id = jax.jit(_segment_ranks)(key)
    np.testing.assert_array_equal(
        np.asarray(is_start), [1, 0, 0, 1, 1, 0, 1, 0, 0, 0])
    np.testing.assert_array_equal(np.asarray(rank), [0, 1, 2, 0, 0, 1, 0, 1, 2, 3])
    np.testing.assert_array_equal(
        np.asarray(seg_count), [3, 3, 3, 1, 2, 2, 4, 4, 4, 4])
    np.testing.assert_array_equal(np.asarray(seg_id), [0, 0, 0, 1, 2, 2, 3, 3, 3, 3])
    # sentinel tail forms its own segment and does not inflate the last run
    key2 = jnp.asarray([1, 1, 8, 8, 8], dtype=jnp.int32)  # 8 = R sentinel
    _, _, cnt2, _ = jax.jit(_segment_ranks)(key2)
    assert int(cnt2[0]) == 2 and int(cnt2[2]) == 3


def test_reverse_edges_residual_passes():
    """More than a_cap new edges into one row: pass 2 admits the surplus
    (reference processes every edge; nothing silently dropped)."""
    rng = np.random.default_rng(3)
    N, D, mcap = 64, 8, 8
    ctx = _mk_ctx(rng.standard_normal((N, D)).astype(np.float32))
    links = jnp.full((N, mcap), -1, dtype=jnp.int32)
    nlinks = jnp.zeros((N,), dtype=jnp.int32)
    P = 12  # all target row 5, a_cap=4 -> 3 passes worth of pairs
    rows = jnp.full((P,), 5, dtype=jnp.int32)
    srcs = jnp.arange(20, 20 + P, dtype=jnp.int32)
    l1, n1, d1 = jax.jit(lambda l, n: apply_reverse_edges_multi(
        l, n, rows, rows, srcs, ctx, m_cap=mcap, a_cap=4,
        metric=VecSimMetric.L2, kind="float", passes=3))(links, nlinks)
    assert int(d1) == 0
    out = np.asarray(l1[5])
    assert 0 < int(n1[5]) <= mcap
    assert set(out[out >= 0].tolist()) <= set(range(20, 32))
    # one pass with the same load drops the surplus and says so
    _, _, d2 = jax.jit(lambda l, n: apply_reverse_edges_multi(
        l, n, rows, rows, srcs, ctx, m_cap=mcap, a_cap=4,
        metric=VecSimMetric.L2, kind="float", passes=1))(links, nlinks)
    assert int(d2) == P - 4


def _mk_ctx(data):
    d = jnp.asarray(data)
    return StoreCtx(data=d, sqnorm=jnp.sum(d.astype(jnp.float32) ** 2, axis=1))


def test_reverse_edges_append_and_overflow():
    rng = np.random.default_rng(0)
    N, D, mcap = 32, 8, 4
    data = rng.standard_normal((N, D)).astype(np.float32)
    ctx = _mk_ctx(data)
    links = jnp.full((N, mcap), -1, dtype=jnp.int32)
    nlinks = jnp.zeros((N,), dtype=jnp.int32)
    # row 3 has two existing links (to 10, 11)
    links = links.at[3, :2].set(jnp.asarray([10, 11]))
    nlinks = nlinks.at[3].set(2)

    # two new edges into row 3 (fits: 2+2 <= 4), three into row 7 at cap 4
    # plus one more to overflow it.
    rows = jnp.asarray([3, 3, 7, 7, 7, 7, 7], dtype=jnp.int32)
    srcs = jnp.asarray([20, 21, 22, 23, 24, 25, 26], dtype=jnp.int32)
    dsts = rows
    fn = jax.jit(lambda l, n: apply_reverse_edges_multi(
        l, n, rows, dsts, srcs, ctx, m_cap=mcap, a_cap=8,
        metric=VecSimMetric.L2, kind="float"))
    links2, nlinks2, dropped = fn(links, nlinks)
    links2, nlinks2 = np.asarray(links2), np.asarray(nlinks2)
    assert int(dropped) == 0
    # row 3: appended in pair order
    assert nlinks2[3] == 4
    assert set(links2[3].tolist()) == {10, 11, 20, 21}
    # row 7: overflow -> pruned to <= mcap diverse neighbors from {22..26}
    assert 0 < nlinks2[7] <= mcap
    assert set(links2[7][: nlinks2[7]].tolist()) <= {22, 23, 24, 25, 26}
    # untouched rows stay empty
    assert nlinks2[0] == 0 and (links2[0] == -1).all()


def _device_build(data, M, efc, batch, metric=VecSimMetric.L2, seed=7, scan=False):
    """Drive connect_batch/build_scan directly at the ops level."""
    N, D = data.shape
    M0 = 2 * M
    LU = 4
    rng = np.random.default_rng(seed)
    mult = 1.0 / np.log(M)
    levels = np.minimum(
        (-np.log(np.maximum(rng.random(N), 1e-12)) * mult).astype(np.int32), LU
    )
    urows = np.full(N, -1, dtype=np.int32)
    urows[levels >= 1] = np.arange(int((levels >= 1).sum()), dtype=np.int32)
    ucap = max(int((levels >= 1).sum()), 1)

    ctx = _mk_ctx(data)
    state = GraphState(
        links0=jnp.full((N, M0), -1, dtype=jnp.int32),
        nlinks0=jnp.zeros((N,), dtype=jnp.int32),
        ulinks=jnp.full((ucap, LU, M), -1, dtype=jnp.int32),
        unlinks=jnp.zeros((ucap, LU), dtype=jnp.int32),
        upper_row=jnp.full((N,), -1, dtype=jnp.int32),
        entry=jnp.int32(-1),
        max_level=jnp.int32(-1),
    )
    kw = dict(efc=efc, M=M, M0=M0, metric=metric, kind="float")
    assert N % batch == 0
    if scan:
        T = N // batch
        offsets = jnp.arange(0, N, batch, dtype=jnp.int32)
        lv = jnp.asarray(levels.reshape(T, batch))
        ur = jnp.asarray(urows.reshape(T, batch))
        state, dropped = build_scan(state, ctx, offsets, lv, ur, **kw)
        total_dropped = int(np.asarray(dropped).sum())
    else:
        total_dropped = 0
        for off in range(0, N, batch):
            ids = jnp.arange(off, off + batch, dtype=jnp.int32)
            state, dropped = connect_batch(
                state, ctx, ids,
                jnp.asarray(levels[off : off + batch]),
                jnp.asarray(urows[off : off + batch]), **kw)
            total_dropped += int(dropped)
    return state, ctx, levels, total_dropped


def _graph_invariants(state, levels, M, M0):
    links0 = np.asarray(state.links0)
    nlinks0 = np.asarray(state.nlinks0)
    N = len(levels)
    assert (nlinks0[:N] <= M0).all()
    for i in range(N):
        row = links0[i][: nlinks0[i]]
        assert (row >= 0).all() and (row < N).all(), f"row {i} invalid ids"
        assert i not in row, f"self-link at {i}"
        assert len(set(row.tolist())) == len(row), f"duplicate links at {i}"
        assert (links0[i][nlinks0[i]:] == -1).all(), f"padding not -1 at {i}"
    ul = np.asarray(state.ulinks)
    un = np.asarray(state.unlinks)
    urow = np.asarray(state.upper_row)
    for i in range(N):
        if levels[i] >= 1:
            r = urow[i]
            assert r >= 0
            for l in range(1, levels[i] + 1):
                row = ul[r, l - 1][: un[r, l - 1]]
                assert (row >= 0).all() and i not in row
                assert len(set(row.tolist())) == len(row)


def _recall_at(state, ctx, data, ef, k=10, nq=64, seed=3):
    rng = np.random.default_rng(seed)
    q = data[rng.integers(0, len(data), nq)] + 0.05 * rng.standard_normal(
        (nq, data.shape[1])).astype(np.float32)
    q = jnp.asarray(q)
    gt = np.argsort(((np.asarray(q)[:, None] - data[None]) ** 2).sum(-1), 1)[:, :k]
    cur = jnp.full((nq,), int(state.entry), dtype=jnp.int32)
    cur_d = jnp.sum((q - ctx.data[cur]) ** 2, axis=1)
    for l in range(int(state.max_level), 0, -1):
        cur, cur_d = greedy_level(
            q, ctx, state.ulinks, state.upper_row, cur, cur_d, jnp.int32(l),
            metric=VecSimMetric.L2, kind="float")
    bd, bi = beam_search(
        q, ctx, state.links0, None, cur, cur_d, ctx.data.shape[0],
        ef=max(ef, k), metric=VecSimMetric.L2, kind="float")
    ids = np.asarray(bi)[:, :k]
    return np.mean([len(set(ids[b]) & set(gt[b])) / k for b in range(nq)])


def test_device_build_quality_and_invariants():
    rng = np.random.default_rng(1)
    N, D, M, efc = 2048, 32, 8, 60
    data = rng.standard_normal((N, D)).astype(np.float32)
    state, ctx, levels, dropped = _device_build(data, M, efc, batch=128)
    assert dropped == 0
    _graph_invariants(state, levels, M, 2 * M)
    rec = _recall_at(state, ctx, data, ef=60)
    assert rec >= 0.9, f"recall@10 ef=60: {rec}"
    rec10 = _recall_at(state, ctx, data, ef=10)
    assert rec10 >= 0.5, f"recall@10 ef=10: {rec10}"


def test_build_scan_matches_loop():
    """One lax.scan dispatch must produce the same graph as the per-batch
    loop (identical inputs -> identical links)."""
    rng = np.random.default_rng(2)
    N, D, M, efc = 512, 16, 6, 40
    data = rng.standard_normal((N, D)).astype(np.float32)
    s1, _, _, _ = _device_build(data, M, efc, batch=128, scan=False)
    s2, _, _, _ = _device_build(data, M, efc, batch=128, scan=True)
    np.testing.assert_array_equal(np.asarray(s1.links0), np.asarray(s2.links0))
    np.testing.assert_array_equal(np.asarray(s1.ulinks), np.asarray(s2.ulinks))
    assert int(s1.entry) == int(s2.entry) and int(s1.max_level) == int(s2.max_level)


def test_first_batch_empty_graph():
    rng = np.random.default_rng(4)
    N, D, M, efc = 64, 8, 4, 20
    data = rng.standard_normal((N, D)).astype(np.float32)
    state, ctx, levels, dropped = _device_build(data, M, efc, batch=64)
    _graph_invariants(state, levels, M, 2 * M)
    assert int(state.entry) >= 0
    rec = _recall_at(state, ctx, data, ef=32, nq=16)
    assert rec >= 0.95, rec


def test_prune_chunked_internal_dists_matches_precomputed():
    """cand_dists=None computes anchor→candidate distances inside the row
    chunks (the path that keeps large-M reverse-edge repruning out of a
    one-shot [rows, C, D] gather); results must match the precomputed-cd
    call bit-for-bit, chunked and unchunked, float and sq8 kinds."""
    import jax.numpy as jnp

    from vectorsimilarity_tpu.ops.graph_search import (
        StoreCtx, dists_to_ids, diversity_prune_chunked)
    from vectorsimilarity_tpu.ops.quantize import sq8_quantize
    from vectorsimilarity_tpu.types import VecSimMetric

    rng = np.random.default_rng(11)
    N, D, B, C, m = 600, 16, 384, 24, 6  # B=384 > min chunk 128 -> 3 chunks
    data = rng.standard_normal((N, D)).astype(np.float32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    cand = rng.integers(-1, N, (B, C)).astype(np.int32)

    ctx = StoreCtx(data=jnp.asarray(data), sqnorm=jnp.asarray((data ** 2).sum(-1)),
                   norm=None, vmin=None, delta=None, nav=None)
    kw = dict(m=m, metric=VecSimMetric.L2, kind="float", alpha=0.9)
    cd = dists_to_ids(jnp.asarray(q), jnp.asarray(cand), ctx,
                      metric=VecSimMetric.L2, kind="float")
    a = diversity_prune_chunked(jnp.asarray(q), jnp.asarray(cand), cd, ctx,
                                chunk=128, **kw)
    b = diversity_prune_chunked(jnp.asarray(q), jnp.asarray(cand), None, ctx,
                                chunk=128, **kw)
    c = diversity_prune_chunked(jnp.asarray(q), jnp.asarray(cand), None, ctx,
                                chunk=4096, **kw)  # unchunked fast path
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    # sq8 kind threads q_meta through the chunked map.
    codes, vmin, delta, _, psumsq = sq8_quantize(jnp.asarray(data))
    ctx8 = StoreCtx(data=codes, sqnorm=psumsq, norm=None, vmin=vmin,
                    delta=delta, nav=None)
    qm = (jnp.sum(jnp.asarray(q), axis=-1), jnp.sum(jnp.asarray(q) ** 2, axis=-1))
    kw8 = dict(m=m, metric=VecSimMetric.L2, kind="sq8", alpha=0.9)
    cd8 = dists_to_ids(jnp.asarray(q), jnp.asarray(cand), ctx8,
                       metric=VecSimMetric.L2, kind="sq8", q_meta=qm)
    a8 = diversity_prune_chunked(jnp.asarray(q), jnp.asarray(cand), cd8, ctx8,
                                 chunk=128, **kw8)
    b8 = diversity_prune_chunked(jnp.asarray(q), jnp.asarray(cand), None, ctx8,
                                 q_meta=qm, chunk=128, **kw8)
    np.testing.assert_array_equal(np.asarray(a8), np.asarray(b8))
