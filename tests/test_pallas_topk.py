"""Parity tests for the fused Pallas BF top-k kernel (interpret mode).

The kernel-vs-XLA-engine contract (the ``test_spaces.cpp`` analog for the
fused scan): identical selected sets at matching precision class, exact
ordering semantics (ascending distance, ties by lower id), dead-row masking
via ``count``, and the lexicographic multipass chain for k > 128.
Runs in Pallas interpret mode on CPU; the real-MXU path is exercised by
``bench.py --engine pallas`` and the driver bench.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vectorsimilarity_tpu.ops.pallas.bf_topk import pallas_topk
from vectorsimilarity_tpu.types import VecSimMetric


def _ref_topk(q, data, count, k, metric):
    qf = np.asarray(q, np.float64)
    df = np.asarray(data, np.float64)[:count]
    ip = qf @ df.T
    if metric == VecSimMetric.L2:
        s = (qf * qf).sum(1)[:, None] - 2 * ip + (df * df).sum(1)[None, :]
    else:
        s = 1.0 - ip
    # lexicographic (distance, id) ascending
    order = np.lexsort((np.arange(s.shape[1])[None, :].repeat(len(qf), 0), s), axis=1)
    idx = order[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


def _mk(n, d, b, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.standard_normal((n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return jnp.asarray(q, dtype), jnp.asarray(data, dtype)


@pytest.mark.parametrize("metric", [VecSimMetric.Cosine, VecSimMetric.L2])
def test_parity_small_k(metric):
    n, d, b, k = 512, 64, 8, 10
    q, data = _mk(n, d, b)
    sqn = jnp.sum(data.astype(jnp.float32) ** 2, axis=1)
    pd, pi = pallas_topk(q, data, sqn, jnp.int32(n), k,
                         metric=metric, tile_n=128, interpret=True)
    rd, ri = _ref_topk(q, data, n, k, metric)
    pd, pi = np.asarray(pd), np.asarray(pi)
    assert np.allclose(pd, rd, atol=5e-4)
    # id agreement except where fp64-vs-bf16_3x rounding flips near-ties
    flip = pi != ri
    if flip.any():
        assert np.abs(pd[flip] - rd[flip]).max() < 5e-4


def test_count_masking():
    n, d, b, k = 256, 32, 4, 8
    q, data = _mk(n, d, b, seed=1)
    count = 100
    pd, pi = pallas_topk(q, data, None, jnp.int32(count), k,
                         metric=VecSimMetric.Cosine, tile_n=64, interpret=True)
    assert int(np.asarray(pi).max()) < count
    rd, ri = _ref_topk(q, data, count, k, VecSimMetric.Cosine)
    assert np.allclose(np.asarray(pd), rd, atol=5e-4)


def test_k_exceeds_count():
    n, d, b, k = 128, 32, 4, 16
    q, data = _mk(n, d, b, seed=2)
    count = 10
    pd, pi = pallas_topk(q, data, None, jnp.int32(count), k,
                         metric=VecSimMetric.Cosine, tile_n=64, interpret=True)
    pd, pi = np.asarray(pd), np.asarray(pi)
    assert (pi[:, count:] == -1).all()
    assert np.isinf(pd[:, count:]).all()
    rd, _ = _ref_topk(q, data, count, count, VecSimMetric.Cosine)
    assert np.allclose(pd[:, :count], rd, atol=5e-4)


def test_multipass_large_k():
    # k > PASS_K exercises the lexicographic lower-bound chain.
    n, d, b, k = 512, 32, 4, 200
    q, data = _mk(n, d, b, seed=3)
    pd, pi = pallas_topk(q, data, None, jnp.int32(n), k,
                         metric=VecSimMetric.Cosine, tile_n=128, interpret=True)
    rd, ri = _ref_topk(q, data, n, k, VecSimMetric.Cosine)
    pd, pi = np.asarray(pd), np.asarray(pi)
    assert np.allclose(pd, rd, atol=5e-4)
    # ascending order within each row
    assert (np.diff(pd, axis=1) >= -1e-7).all()
    # no duplicate ids across the pass boundary
    for row in pi:
        assert len(set(row.tolist())) == k


def test_duplicate_vectors_tie_order():
    # Duplicated rows -> exact distance ties; selection must prefer lower id
    # and the multipass chain must not drop/duplicate any of them.
    rng = np.random.default_rng(4)
    base = rng.standard_normal((8, 16)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    data = jnp.asarray(np.tile(base, (16, 1)))  # 128 rows, every vector x16
    q = jnp.asarray(base[:2])
    pd, pi = pallas_topk(q, data, None, jnp.int32(128), 140 // 10 * 10,
                         metric=VecSimMetric.Cosine, tile_n=64, interpret=True)
    pi = np.asarray(pi)
    for row in pi:
        valid = row[row >= 0]
        assert len(set(valid.tolist())) == len(valid)


def test_bf16_store_native_lane():
    n, d, b, k = 256, 32, 4, 8
    q, data = _mk(n, d, b, dtype=jnp.bfloat16, seed=5)
    pd, pi = pallas_topk(q, data, None, jnp.int32(n), k,
                         metric=VecSimMetric.Cosine, tile_n=64, interpret=True)
    rd, _ = _ref_topk(np.asarray(q, np.float32), np.asarray(data, np.float32),
                      n, k, VecSimMetric.Cosine)
    assert np.allclose(np.asarray(pd), rd, atol=2e-2)  # bf16 storage error


def _mk_int8(n, d, b, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.integers(-127, 128, size=(n, d)).astype(np.int8)
    q = rng.integers(-127, 128, size=(b, d)).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(data)


def _ref_topk_int(q, data, count, k, metric, data_norms=None, query_norms=None):
    """Exact integer reference mirroring ops.distances.scores_int."""
    qi = np.asarray(q, np.int64)
    di = np.asarray(data, np.int64)[:count]
    ip = qi @ di.T
    if metric == VecSimMetric.L2:
        s = ((qi * qi).sum(1)[:, None] - 2 * ip + (di * di).sum(1)[None, :]).astype(
            np.float32
        )
    elif metric == VecSimMetric.Cosine:
        s = (1.0 - ip.astype(np.float64)
             / (np.asarray(query_norms, np.float64)[:, None]
                * np.asarray(data_norms, np.float64)[None, :count])).astype(np.float32)
    else:
        s = (1.0 - ip.astype(np.float64)).astype(np.float32)
    order = np.lexsort((np.arange(s.shape[1])[None, :].repeat(len(qi), 0), s), axis=1)
    idx = order[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


@pytest.mark.parametrize("metric", [VecSimMetric.L2, VecSimMetric.IP])
def test_int8_lane_parity(metric):
    n, d, b, k = 512, 64, 4, 10
    q, data = _mk_int8(n, d, b, seed=10)
    pd, pi = pallas_topk(q, data, None, jnp.int32(n), k,
                         metric=metric, tile_n=128, interpret=True)
    rd, ri = _ref_topk_int(q, data, n, k, metric)
    # Integer arithmetic is exact: ids and distances must match bit-for-bit
    # (L2 casts the identical int32 to f32; IP likewise).
    np.testing.assert_array_equal(np.asarray(pi), ri)
    np.testing.assert_array_equal(np.asarray(pd), rd)


def test_int8_cosine_parity():
    n, d, b, k = 512, 64, 4, 10
    q, data = _mk_int8(n, d, b, seed=11)
    dn = jnp.sqrt(jnp.sum(data.astype(jnp.int32) ** 2, axis=1).astype(jnp.float32))
    qn = jnp.sqrt(jnp.sum(q.astype(jnp.int32) ** 2, axis=1).astype(jnp.float32))
    pd, pi = pallas_topk(q, data, dn, jnp.int32(n), k,
                         metric=VecSimMetric.Cosine, tile_n=128, interpret=True,
                         query_norms=qn)
    rd, ri = _ref_topk_int(q, data, n, k, VecSimMetric.Cosine,
                           data_norms=dn, query_norms=qn)
    pd, pi = np.asarray(pd), np.asarray(pi)
    assert np.allclose(pd, rd, atol=1e-6)
    flip = pi != ri
    if flip.any():  # fp division rounding near-ties only
        assert np.abs(pd[flip] - rd[flip]).max() < 1e-6


def test_int8_count_masking():
    n, d, b, k = 256, 32, 2, 8
    q, data = _mk_int8(n, d, b, seed=12)
    count = 90
    pd, pi = pallas_topk(q, data, None, jnp.int32(count), k,
                         metric=VecSimMetric.L2, tile_n=64, interpret=True)
    assert int(np.asarray(pi).max()) < count
    rd, ri = _ref_topk_int(q, data, count, k, VecSimMetric.L2)
    np.testing.assert_array_equal(np.asarray(pi), ri)


# ---------------------------------------------------------------------------
# Big-k path: per-tile local top-c + XLA merge (pallas_topk_bigk)
# ---------------------------------------------------------------------------

from vectorsimilarity_tpu.ops.pallas.bf_topk import pallas_topk_bigk


@pytest.mark.parametrize("metric", [VecSimMetric.Cosine, VecSimMetric.L2])
def test_bigk_parity(metric):
    n, d, b, k = 2048, 32, 4, 300
    q, data = _mk(n, d, b, seed=6)
    sqn = jnp.sum(data.astype(jnp.float32) ** 2, axis=1)
    pd, pi, trunc = pallas_topk_bigk(q, data, sqn, jnp.int32(n), k,
                                     metric=metric, tile_n=128, local_c=64,
                                     interpret=True)
    assert not bool(np.asarray(trunc).any())
    rd, ri = _ref_topk(q, data, n, k, metric)
    pd, pi = np.asarray(pd), np.asarray(pi)
    assert np.allclose(pd, rd, atol=5e-4)
    assert (np.diff(pd, axis=1) >= -1e-7).all()
    for row in pi:
        assert len(set(row.tolist())) == k


def test_bigk_truncation_flag_fires():
    # Adversarial row order: the best k rows all land in ONE tile, so that
    # tile must contribute > local_c entries -> the flag must fire (the
    # caller falls back to the exact streaming path).
    rng = np.random.default_rng(7)
    d = 16
    target = rng.standard_normal(d).astype(np.float32)
    target /= np.linalg.norm(target)
    near = target[None, :] + 0.01 * rng.standard_normal((64, d)).astype(np.float32)
    far = rng.standard_normal((192, d)).astype(np.float32)
    data = np.concatenate([near, far]).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    q = jnp.asarray(target[None, :])
    pd, pi, trunc = pallas_topk_bigk(q, jnp.asarray(data), None, jnp.int32(256),
                                     40, metric=VecSimMetric.Cosine,
                                     tile_n=64, local_c=16, interpret=True)
    assert bool(np.asarray(trunc).any())


def test_bigk_count_mask_and_short_index():
    n, d, b, k = 512, 32, 2, 200
    q, data = _mk(n, d, b, seed=8)
    count = 150  # fewer live rows than k: exact prefix + trunc-or-inf tail
    pd, pi, trunc = pallas_topk_bigk(q, data, None, jnp.int32(count), k,
                                     metric=VecSimMetric.Cosine,
                                     tile_n=128, local_c=128, interpret=True)
    pd, pi = np.asarray(pd), np.asarray(pi)
    if not bool(np.asarray(trunc).any()):
        rd, _ = _ref_topk(q, data, count, count, VecSimMetric.Cosine)
        assert np.allclose(pd[:, :count], rd, atol=5e-4)
        assert (pi[:, count:] == -1).all()


def test_bigk_int8_parity():
    n, d, b, k = 1024, 32, 2, 200
    q, data = _mk_int8(n, d, b, seed=13)
    pd, pi, trunc = pallas_topk_bigk(q, data, None, jnp.int32(n), k,
                                     metric=VecSimMetric.L2, tile_n=128,
                                     local_c=64, interpret=True)
    assert not bool(np.asarray(trunc).any())
    rd, ri = _ref_topk_int(q, data, n, k, VecSimMetric.L2)
    np.testing.assert_array_equal(np.asarray(pi), ri)
    np.testing.assert_array_equal(np.asarray(pd), rd)


def test_bigk_engine_integration():
    """BruteForceIndex routes k>pallas_max_k through the big-k kernel when
    forced on (interpret on CPU is exercised at kernel level above; here we
    check the fallback correctness contract end-to-end on the CPU path)."""
    from vectorsimilarity_tpu import (
        BFParams, VecSimAlgo, VecSimMetric as M, VecSimParams, VecSimType,
        create_index,
    )

    rng = np.random.default_rng(9)
    n, dim, k = 3000, 24, 200
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx = create_index(VecSimParams(algo=VecSimAlgo.BF, bfParams=BFParams(
        type=VecSimType.FLOAT32, dim=dim, metric=M.L2)))
    idx.add_vector_batch(data, list(range(n)))
    q = rng.standard_normal(dim).astype(np.float32)
    rep = idx.topk_query(q, k)
    want = np.argsort(((data - q) ** 2).sum(1))[:k]
    assert rep.ids.tolist() == want.tolist()


# ---------------------------------------------------------------------------
# Group-min compact selection (group_n < tile_n): census + in-kernel repair
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("metric", [VecSimMetric.Cosine, VecSimMetric.L2])
def test_group_selection_parity(metric):
    # L = tile_n / group_n = 8: selection runs over the strided group view
    # with the exactness census; result must match the full-width merge.
    n, d, b, k = 2048, 32, 8, 16
    q, data = _mk(n, d, b, seed=20)
    sqn = jnp.sum(data.astype(jnp.float32) ** 2, axis=1)
    pd, pi = pallas_topk(q, data, sqn, jnp.int32(n), k,
                         metric=metric, tile_n=512, group_n=64, interpret=True)
    rd, ri = _ref_topk(q, data, n, k, metric)
    pd, pi = np.asarray(pd), np.asarray(pi)
    assert np.allclose(pd, rd, atol=5e-4)
    flip = pi != ri
    if flip.any():
        assert np.abs(pd[flip] - rd[flip]).max() < 5e-4


def test_group_repair_collisions():
    # Adversarial placement: ALL of the true top-k sit in ONE strided group
    # (ids k apart... here multiples of group_n within one tile), so the
    # group view can emit only one of them per merge — the census must
    # detect the hidden entries and the in-kernel repair must recover the
    # exact answer.
    rng = np.random.default_rng(21)
    n, d, b, k, G = 512, 32, 4, 8, 64
    data = rng.standard_normal((n, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    # rows 0, G, 2G, ... (k of them) = near-exact matches of query 0..b-1,
    # all in group 0 of tile 0 (tile_n = n = one tile).
    for t in range(k):
        src = q[t % b]
        data[t * G] = src + 1e-4 * rng.standard_normal(d).astype(np.float32)
        data[t * G] /= np.linalg.norm(data[t * G])
    qj, dj = jnp.asarray(q), jnp.asarray(data)
    pd, pi = pallas_topk(qj, dj, None, jnp.int32(n), k,
                         metric=VecSimMetric.Cosine, tile_n=512, group_n=G,
                         interpret=True)
    rd, ri = _ref_topk(q, data, n, k, VecSimMetric.Cosine)
    pd, pi = np.asarray(pd), np.asarray(pi)
    assert np.allclose(pd, rd, atol=5e-4)
    # the planted ids must all be found for their own query
    for b_i in range(b):
        planted = {t * G for t in range(k) if t % b == b_i}
        assert planted.issubset(set(pi[b_i].tolist()))


def test_group_multipass_large_k():
    # k > PASS_K with the group view active in every pass.
    n, d, b, k = 1024, 32, 4, 200
    q, data = _mk(n, d, b, seed=22)
    pd, pi = pallas_topk(q, data, None, jnp.int32(n), k,
                         metric=VecSimMetric.Cosine, tile_n=256, group_n=32,
                         interpret=True)
    rd, ri = _ref_topk(q, data, n, k, VecSimMetric.Cosine)
    pd, pi = np.asarray(pd), np.asarray(pi)
    assert np.allclose(pd, rd, atol=5e-4)
    assert (np.diff(pd, axis=1) >= -1e-7).all()
    for row in pi:
        assert len(set(row.tolist())) == k


def test_group_duplicate_ties_exactness():
    # Exact ties spread across groups and tiles: census equality on tie
    # boundaries must still produce the lex-exact (distance, id) set.
    rng = np.random.default_rng(23)
    base = rng.standard_normal((8, 16)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    data = jnp.asarray(np.tile(base, (64, 1)))  # 512 rows, every vector x64
    q = jnp.asarray(base[:2])
    pd, pi = pallas_topk(q, data, None, jnp.int32(512), 64,
                         metric=VecSimMetric.Cosine, tile_n=128, group_n=32,
                         interpret=True)
    rd, ri = _ref_topk(np.asarray(q), np.asarray(data), 512, 64,
                       VecSimMetric.Cosine)
    pd, pi = np.asarray(pd), np.asarray(pi)
    np.testing.assert_array_equal(pi, ri)  # ties resolve by lower id, exactly


# ---------------------------------------------------------------------------
# uint8 lane (in-kernel shift + exact int32 correction)
# ---------------------------------------------------------------------------


def _mk_uint8(n, d, b, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, size=(n, d)).astype(np.uint8)
    q = rng.integers(0, 256, size=(b, d)).astype(np.uint8)
    return jnp.asarray(q), jnp.asarray(data)


@pytest.mark.parametrize("metric", [VecSimMetric.L2, VecSimMetric.IP])
def test_uint8_lane_parity(metric):
    n, d, b, k = 512, 64, 4, 10
    q, data = _mk_uint8(n, d, b, seed=30)
    pd, pi = pallas_topk(q, data, None, jnp.int32(n), k,
                         metric=metric, tile_n=128, interpret=True)
    rd, ri = _ref_topk_int(q, data, n, k, metric)
    # Integer algebra is exact end-to-end: bit-identical to the reference.
    np.testing.assert_array_equal(np.asarray(pi), ri)
    np.testing.assert_array_equal(np.asarray(pd), rd)


def test_uint8_cosine_parity():
    n, d, b, k = 512, 64, 4, 10
    q, data = _mk_uint8(n, d, b, seed=31)
    dn = jnp.sqrt(jnp.sum(data.astype(jnp.int32) ** 2, axis=1).astype(jnp.float32))
    qn = jnp.sqrt(jnp.sum(q.astype(jnp.int32) ** 2, axis=1).astype(jnp.float32))
    pd, pi = pallas_topk(q, data, dn, jnp.int32(n), k,
                         metric=VecSimMetric.Cosine, tile_n=128, interpret=True,
                         query_norms=qn)
    rd, ri = _ref_topk_int(q, data, n, k, VecSimMetric.Cosine,
                           data_norms=dn, query_norms=qn)
    pd, pi = np.asarray(pd), np.asarray(pi)
    assert np.allclose(pd, rd, atol=1e-6)
    flip = pi != ri
    if flip.any():  # fp division rounding near-ties only
        assert np.abs(pd[flip] - rd[flip]).max() < 1e-6


def test_uint8_count_masking_and_groups():
    n, d, b, k = 512, 32, 2, 8
    q, data = _mk_uint8(n, d, b, seed=32)
    count = 300
    pd, pi = pallas_topk(q, data, None, jnp.int32(count), k,
                         metric=VecSimMetric.L2, tile_n=256, group_n=64,
                         interpret=True)
    assert int(np.asarray(pi).max()) < count
    rd, ri = _ref_topk_int(q, data, count, k, VecSimMetric.L2)
    np.testing.assert_array_equal(np.asarray(pi), ri)


# ---------------------------------------------------------------------------
# Group-min engine (pallas_topk_gm): per-tile group minima + suspect rescue
# ---------------------------------------------------------------------------

from vectorsimilarity_tpu.ops.pallas.bf_topk import pallas_topk_gm


@pytest.mark.parametrize("metric", [VecSimMetric.Cosine, VecSimMetric.L2])
def test_gm_parity_float(metric):
    n, d, b, k = 1024, 64, 8, 10
    q, data = _mk(n, d, b, seed=11)
    sqn = jnp.sum(data.astype(jnp.float32) ** 2, axis=1)
    gd, gi, unc = pallas_topk_gm(q, data, sqn, jnp.int32(n), k,
                                 metric=metric, tile_n=128, group_n=16,
                                 interpret=True)
    rd, ri = _ref_topk(q, data, n, k, metric)
    gd, gi, unc = np.asarray(gd), np.asarray(gi), np.asarray(unc)
    assert not unc.any(), "random data must be covered"
    assert np.allclose(gd, rd, atol=5e-4)
    flip = gi != ri
    if flip.any():
        assert np.abs(gd[flip] - rd[flip]).max() < 5e-4
    # ascending lex order
    assert (np.diff(gd, axis=1) >= -1e-7).all()


def test_gm_count_masking_and_small_count():
    n, d, b, k = 512, 32, 4, 8
    q, data = _mk(n, d, b, seed=12)
    count = 71
    gd, gi, unc = pallas_topk_gm(q, data, None, jnp.int32(count), k,
                                 metric=VecSimMetric.Cosine, tile_n=64,
                                 group_n=16, interpret=True)
    gd, gi = np.asarray(gd), np.asarray(gi)
    assert int(gi.max()) < count
    rd, _ = _ref_topk(q, data, count, k, VecSimMetric.Cosine)
    if not np.asarray(unc).any():
        assert np.allclose(gd, rd, atol=5e-4)


def test_gm_bf16_int8_uint8_lanes():
    n, d, b, k = 512, 32, 4, 8
    # bf16
    q, data = _mk(n, d, b, dtype=jnp.bfloat16, seed=13)
    gd, gi, unc = pallas_topk_gm(q, data, None, jnp.int32(n), k,
                                 metric=VecSimMetric.Cosine, tile_n=64,
                                 group_n=16, interpret=True)
    rd, _ = _ref_topk(np.asarray(q, np.float32), np.asarray(data, np.float32),
                      n, k, VecSimMetric.Cosine)
    assert not np.asarray(unc).any()
    assert np.allclose(np.asarray(gd), rd, atol=2e-2)
    # int8, L2 + cosine
    qi, di = _mk_int8(n, d, b, seed=14)
    gd, gi, unc = pallas_topk_gm(qi, di, None, jnp.int32(n), k,
                                 metric=VecSimMetric.L2, tile_n=64,
                                 group_n=16, interpret=True)
    rd, ri = _ref_topk_int(qi, di, n, k, VecSimMetric.L2)
    assert not np.asarray(unc).any()
    assert np.array_equal(np.asarray(gi), ri)  # integer lane: exact ids
    norms = jnp.sqrt(jnp.sum(jnp.asarray(di, jnp.int32) ** 2, axis=1).astype(jnp.float32))
    qnorms = jnp.sqrt(jnp.sum(jnp.asarray(qi, jnp.int32) ** 2, axis=1).astype(jnp.float32))
    gd, gi, unc = pallas_topk_gm(qi, di, norms, jnp.int32(n), k,
                                 metric=VecSimMetric.Cosine, tile_n=64,
                                 group_n=16, query_norms=qnorms, interpret=True)
    rd, ri = _ref_topk_int(qi, di, n, k, VecSimMetric.Cosine,
                           data_norms=norms, query_norms=qnorms)
    assert not np.asarray(unc).any()
    assert np.allclose(np.asarray(gd), rd, atol=1e-4)
    # uint8 L2
    rng = np.random.default_rng(15)
    du = jnp.asarray(rng.integers(0, 256, size=(n, d)).astype(np.uint8))
    qu = jnp.asarray(rng.integers(0, 256, size=(b, d)).astype(np.uint8))
    gd, gi, unc = pallas_topk_gm(qu, du, None, jnp.int32(n), k,
                                 metric=VecSimMetric.L2, tile_n=64,
                                 group_n=16, interpret=True)
    rd, ri = _ref_topk_int(qu, du, n, k, VecSimMetric.L2)
    assert not np.asarray(unc).any()
    assert np.array_equal(np.asarray(gi), ri)


def test_gm_uncovered_flag_on_adversarial_ties():
    # Every row identical -> every group min ties at the k-th boundary; the
    # suspect set cannot prove coverage and the flag must trip (the caller
    # then falls back to the streaming engine).
    base = np.ones((1, 32), np.float32) / np.sqrt(32)
    data = jnp.asarray(np.tile(base, (256, 1)))
    q = jnp.asarray(np.tile(base, (2, 1)))
    gd, gi, unc = pallas_topk_gm(q, data, None, jnp.int32(256), 8,
                                 metric=VecSimMetric.Cosine, tile_n=64,
                                 group_n=16, interpret=True)
    assert np.asarray(unc).all()


def test_gm_hidden_group_members():
    # Pack the true top-k into FEW groups (many top-k entries hide behind
    # one group min): rescoring the suspicious groups' membership must
    # recover all of them. Rows 0..L-1 of tile 0 share group 0 when
    # group_n == 16 and stride L == tile_n // 16 -- instead make the k
    # nearest all multiples of group-stride so they collapse into one
    # group: ids {0, 16, 32, ...} with group_n=16, tile_n=64 -> L=4;
    # group g holds {g, g+16, g+32, g+48}. Put the 4 closest at
    # {0, 16, 32, 48} (all group 0) and next-closest in group 1.
    d = 32
    rng = np.random.default_rng(16)
    data = rng.standard_normal((128, d)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    q = data[0:1].copy()
    for rank, rid in enumerate([0, 16, 32, 48, 1, 17, 33, 49]):
        v = q[0] + (rank + 1) * 1e-3 * rng.standard_normal(d).astype(np.float32)
        data[rid] = v / np.linalg.norm(v)
    data[0] = q[0]
    dj = jnp.asarray(data)
    qj = jnp.asarray(q)
    gd, gi, unc = pallas_topk_gm(qj, dj, None, jnp.int32(128), 8,
                                 metric=VecSimMetric.Cosine, tile_n=64,
                                 group_n=16, interpret=True)
    rd, ri = _ref_topk(qj, dj, 128, 8, VecSimMetric.Cosine)
    assert not np.asarray(unc).any()
    assert set(np.asarray(gi)[0].tolist()) == set(ri[0].tolist())


def test_gm_exact_fused_fallback():
    """pallas_topk_gm_exact: the in-program lax.cond fallback returns the
    exact streaming answer when coverage fails (all-ties adversarial) and
    the kernel answer when it holds — no host read either way."""
    from vectorsimilarity_tpu.ops.pallas.bf_topk import pallas_topk_gm_exact

    # Covered case: random data == kernel path.
    n, d, b, k = 1024, 64, 8, 10
    q, data = _mk(n, d, b, seed=21)
    gd, gi = pallas_topk_gm_exact(q, data, None, jnp.int32(n), k,
                                  metric=VecSimMetric.Cosine, kind="float",
                                  tile_n=128, group_n=16, interpret=True)
    rd, ri = _ref_topk(q, data, n, k, VecSimMetric.Cosine)
    assert np.allclose(np.asarray(gd), rd, atol=5e-4)

    # Uncovered case (every row identical): must fall back in-program and
    # still return k exact results (ids 0..k-1 by lex tie-break).
    base = np.ones((1, 32), np.float32) / np.sqrt(32)
    dat2 = jnp.asarray(np.tile(base, (256, 1)))
    q2 = jnp.asarray(np.tile(base, (2, 1)))
    fd, fi = pallas_topk_gm_exact(q2, dat2, None, jnp.int32(256), 8,
                                  metric=VecSimMetric.Cosine, kind="float",
                                  tile_n=64, group_n=16, interpret=True)
    fi = np.asarray(fi)
    assert np.allclose(np.asarray(fd), 0.0, atol=1e-6)
    assert (fi == np.arange(8)[None, :]).all(), fi


def test_bigk_exact_fused_fallback():
    from vectorsimilarity_tpu.ops.pallas.bf_topk import pallas_topk_bigk_exact

    n, d, b, k = 1024, 32, 4, 192
    q, data = _mk(n, d, b, seed=22)
    bd, bi = pallas_topk_bigk_exact(q, data, None, jnp.int32(n), k,
                                    metric=VecSimMetric.Cosine, kind="float",
                                    tile_n=128, local_c=32, interpret=True)
    rd, ri = _ref_topk(q, data, n, k, VecSimMetric.Cosine)
    assert np.allclose(np.asarray(bd), rd, atol=5e-4)

    # Truncation-forcing shape: all near-duplicates in one tile -> the
    # in-program streaming fallback must still return the exact answer.
    base = np.ones((1, 32), np.float32) / np.sqrt(32)
    dat2 = jnp.asarray(np.tile(base, (256, 1)))
    q2 = jnp.asarray(np.tile(base, (2, 1)))
    fd, fi = pallas_topk_bigk_exact(q2, dat2, None, jnp.int32(256), 48,
                                    metric=VecSimMetric.Cosine, kind="float",
                                    tile_n=64, local_c=16, interpret=True)
    fi = np.asarray(fi)
    assert np.allclose(np.asarray(fd), 0.0, atol=1e-6)
    assert (fi == np.arange(48)[None, :]).all()
