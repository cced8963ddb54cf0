"""SVS LVQ 4-bit / two-level / LeanVec quantization modes.

The reference delegates these modes to the Intel SVS library (an empty
submodule in the snapshot — cmake/svs.cmake); semantics follow the mode
names in ``vec_sim_common.h:170-179``: Q4 = 4-bit primary codes, Q4x4/Q4x8
= 4-bit primary + 4/8-bit residual rerank, *_LeanVec = PCA-projected
primary + full-dim SQ8 secondary rerank. Coverage model:
``tests/flow/test_svs.py`` parametrized compression sweeps.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vectorsimilarity_tpu import (
    SVSParams,
    VecSimAlgo,
    VecSimMetric,
    VecSimParams,
    VecSimSvsQuantBits,
    VecSimType,
    create_index,
)
from vectorsimilarity_tpu.indexes.factory import estimate_element_size
from vectorsimilarity_tpu.ops.quantize import (
    gathered_recon_dists,
    pack4,
    residual_quantize,
    sq4_quantize,
    sq4_reconstruct,
    unpack4,
)
from common import gt_topk, recall

ALL_QUANT = [
    VecSimSvsQuantBits.Q4,
    VecSimSvsQuantBits.Q4x4,
    VecSimSvsQuantBits.Q4x8,
    VecSimSvsQuantBits.Q4x8_LeanVec,
    VecSimSvsQuantBits.Q8x8_LeanVec,
]


def make(dim=32, metric=VecSimMetric.L2, quant=VecSimSvsQuantBits.Q4,
         R=32, L=120, ws=60, multi=False, leanvec_dim=0):
    p = SVSParams(type=VecSimType.FLOAT32, dim=dim, metric=metric, multi=multi,
                  quantBits=quant, graph_max_degree=R,
                  construction_window_size=L, search_window_size=ws,
                  leanvec_dim=leanvec_dim)
    return create_index(VecSimParams(algo=VecSimAlgo.SVS, svsParams=p))


def embedding_like_np(rng, n, dim, intrinsic=8):
    lat = rng.standard_normal((n, intrinsic)).astype(np.float32)
    proj = rng.standard_normal((intrinsic, dim)).astype(np.float32)
    x = lat @ proj + 0.05 * rng.standard_normal((n, dim)).astype(np.float32)
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


# ---------------------------------------------------------------------------
# Kernel-level properties
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dim", [8, 9, 17, 128])
def test_pack_unpack_roundtrip(dim):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, size=(5, dim), dtype=np.uint8)
    packed = np.asarray(pack4(jnp.asarray(codes)))
    assert packed.shape == (5, (dim + 1) // 2)
    back = np.asarray(unpack4(jnp.asarray(packed)))
    np.testing.assert_array_equal(back[:, :dim], codes)


def test_sq4_reconstruction_error_bound():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((20, 48)).astype(np.float32)
    packed, vmin, delta, _, _ = sq4_quantize(jnp.asarray(x))
    rec = np.asarray(sq4_reconstruct(packed, vmin, delta, 48))
    err = np.abs(rec - x)
    # Round-to-nearest on 15 steps: error <= delta/2 per component.
    bound = np.asarray(delta)[:, None] / 2 + 1e-6
    assert (err <= bound).all()


def test_two_level_decode_tightens_error():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((16, 64)).astype(np.float32)
    packed, vmin, delta, _, _ = sq4_quantize(jnp.asarray(x))
    rec1 = np.asarray(sq4_reconstruct(packed, vmin, delta, 64))
    for bits in (4, 8):
        res, rvmin, rdelta = residual_quantize(jnp.asarray(x), jnp.asarray(rec1), bits)
        res_np = np.asarray(res)
        if bits == 4:
            res_np = np.asarray(unpack4(jnp.asarray(res_np)))[:, :64]
        rec2 = rec1 + np.asarray(rvmin)[:, None] + np.asarray(rdelta)[:, None] * res_np
        assert np.abs(rec2 - x).max() < np.abs(rec1 - x).max() * 0.6


def test_gathered_recon_matches_dense_decode():
    rng = np.random.default_rng(3)
    n, dim, b, m = 40, 24, 6, 5
    x = rng.standard_normal((n, dim)).astype(np.float32)
    q = rng.standard_normal((b, dim)).astype(np.float32)
    packed, vmin, delta, _, xsumsq = sq4_quantize(jnp.asarray(x))
    rec1 = np.asarray(sq4_reconstruct(packed, vmin, delta, dim))
    res, rvmin, rdelta = residual_quantize(jnp.asarray(x), jnp.asarray(rec1), 8)
    ids = rng.integers(0, n, size=(b, m))
    d = np.asarray(gathered_recon_dists(
        jnp.asarray(q), jnp.asarray(ids),
        ((packed, vmin, delta), (res, rvmin, rdelta)),
        xsumsq, metric_is_l2=True, packed_flags=(True, False),
    ))
    rec2 = rec1 + np.asarray(rvmin)[:, None] + np.asarray(rdelta)[:, None] * np.asarray(res)
    for bi in range(b):
        for mi in range(m):
            xr = rec2[ids[bi, mi]]
            want = (x[ids[bi, mi]] ** 2).sum() - 2 * (q[bi] @ xr) + (q[bi] ** 2).sum()
            assert abs(d[bi, mi] - want) < 1e-2


# ---------------------------------------------------------------------------
# Index-level behavior per mode
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("quant", ALL_QUANT)
@pytest.mark.parametrize("metric", [VecSimMetric.L2, VecSimMetric.Cosine])
def test_quant_recall(quant, metric):
    rng = np.random.default_rng(4)
    n, dim, k = 600, 48, 10
    # Low intrinsic dimension: the realistic regime (and the one where a
    # LeanVec projection is nearly lossless).
    data = embedding_like_np(rng, n, dim)
    idx = make(dim=dim, metric=metric, quant=quant, L=150, ws=80)
    idx.add_vector_batch(data, list(range(n)))
    queries = embedding_like_np(rng, 12, dim)
    m = VecSimMetric.IP if metric == VecSimMetric.Cosine else metric
    gt = gt_topk(queries, data, m, k)
    replies = idx.topk_query_batch(queries, k)
    r = recall([rep.ids for rep in replies], gt)
    floor = 0.75 if quant == VecSimSvsQuantBits.Q4 else 0.85
    assert r >= floor, f"{quant.name} recall {r}"
    # Self-query sanity.
    rep = idx.topk_query(data[17], 1)
    assert rep.ids[0] == 17


def test_rerank_improves_over_primary():
    """The residual rerank must beat raw 4-bit primary ordering."""
    rng = np.random.default_rng(5)
    n, dim, k = 600, 48, 10
    data = embedding_like_np(rng, n, dim)
    queries = embedding_like_np(rng, 16, dim)
    gt = gt_topk(queries, data, VecSimMetric.L2, k)
    r = {}
    for quant in (VecSimSvsQuantBits.Q4, VecSimSvsQuantBits.Q4x8):
        idx = make(dim=dim, quant=quant, L=150, ws=80)
        idx.add_vector_batch(data, list(range(n)))
        replies = idx.topk_query_batch(queries, k)
        r[quant] = recall([rep.ids for rep in replies], gt)
    assert r[VecSimSvsQuantBits.Q4x8] >= r[VecSimSvsQuantBits.Q4] - 0.02, r
    # Refined distances must match the two-level decode, not the 4-bit one.
    idx = make(dim=dim, quant=VecSimSvsQuantBits.Q4x8, ws=80)
    idx.add_vector_batch(data, list(range(n)))
    rep = idx.topk_query(queries[0], 5)
    for lab, d in zip(rep.ids.tolist(), rep.scores.tolist()):
        want = idx.get_distance_from(int(lab), queries[0])
        assert abs(d - want) < 1e-3


@pytest.mark.parametrize("quant", [VecSimSvsQuantBits.Q4x8_LeanVec,
                                   VecSimSvsQuantBits.Q8x8_LeanVec])
def test_leanvec_projection(quant):
    idx = make(dim=64, quant=quant, leanvec_dim=16)
    assert idx.pdim == 16
    rng = np.random.default_rng(6)
    data = embedding_like_np(rng, 300, 64)
    idx.add_vector_batch(data, list(range(300)))
    # P trained on the first batch, orthonormal columns.
    p = idx._P_host
    assert p.shape == (64, 16)
    np.testing.assert_allclose(p.T @ p, np.eye(16), atol=1e-4)
    # Primary store is 16-dimensional (packed to 8 bytes for 4-bit).
    row = (16 + 1) // 2 if idx.primary_bits == 4 else 16
    assert idx.store.fields["data"].shape == (row,)
    # Reported distances come from the full-dim secondary decode.
    rep = idx.topk_query(data[3], 3)
    assert rep.ids[0] == 3
    want = idx.get_distance_from(int(rep.ids[1]), data[3])
    assert abs(rep.scores[1] - want) < 1e-3


def test_quant_modes_delete_and_update():
    rng = np.random.default_rng(7)
    dim = 32
    data = embedding_like_np(rng, 200, dim)
    for quant in ALL_QUANT:
        idx = make(dim=dim, quant=quant, L=100, ws=50)
        idx.add_vector_batch(data, list(range(200)))
        for i in range(0, 50):
            assert idx.delete_vector(i) == 1
        assert idx.index_size == 150
        rep = idx.topk_query(data[100], 5)
        assert rep.ids[0] == 100
        assert all(x >= 50 for x in rep.ids.tolist())
        #

        idx.add_vector(data[150], 777)  # new label, duplicate vector
        rep = idx.topk_query(data[150], 2)
        assert set(rep.ids.tolist()) == {150, 777}


def test_adhoc_exact_distances_two_level():
    rng = np.random.default_rng(8)
    dim = 24
    data = embedding_like_np(rng, 120, dim)
    for quant in (VecSimSvsQuantBits.Q4x8, VecSimSvsQuantBits.Q8x8_LeanVec):
        idx = make(dim=dim, quant=quant, ws=40)
        idx.add_vector_batch(data, list(range(120)))
        from vectorsimilarity_tpu.core.adhoc import AdhocBfCtx

        ctx = AdhocBfCtx(idx, data[7])
        d = ctx.get_exact_distances([5, 7, 99])
        want = [idx.get_distance_from(l, data[7]) for l in (5, 7, 99)]
        np.testing.assert_allclose(d, want, atol=1e-3)
        assert d[1] == min(d)  # self is nearest


def test_batch_iterator_quant():
    rng = np.random.default_rng(9)
    dim = 24
    data = embedding_like_np(rng, 150, dim)
    idx = make(dim=dim, quant=VecSimSvsQuantBits.Q4x8, ws=40)
    idx.add_vector_batch(data, list(range(150)))
    it = idx.new_batch_iterator(data[0])
    seen = []
    while not it.is_depleted() and len(seen) < 150:
        rep = it.get_next_results(25)
        seen.extend(rep.ids.tolist())
    assert seen[0] == 0
    assert len(set(seen)) == len(seen)
    assert len(seen) >= 140


def test_element_size_estimates_shrink():
    def est(quant, dim=256):
        p = SVSParams(type=VecSimType.FLOAT32, dim=dim, quantBits=quant,
                      graph_max_degree=32)
        return estimate_element_size(VecSimParams(algo=VecSimAlgo.SVS, svsParams=p))

    none, q8, q4 = (est(q) for q in (VecSimSvsQuantBits.NONE,
                                     VecSimSvsQuantBits.Q8, VecSimSvsQuantBits.Q4))
    lean = est(VecSimSvsQuantBits.Q4x8_LeanVec)
    assert q8 < none and q4 < q8
    # LeanVec primary is dim/2 at 4 bits + full-dim secondary.
    assert lean > q4 and lean < none


@pytest.mark.parametrize("quant", [VecSimSvsQuantBits.Q4,
                                   VecSimSvsQuantBits.Q4x8_LeanVec])
def test_svs_folder_roundtrip_quant(quant, tmp_path):
    from vectorsimilarity_tpu.utils.svs_file_format import (
        load_svs_folder,
        save_svs_folder,
    )

    rng = np.random.default_rng(10)
    dim = 32
    data = embedding_like_np(rng, 150, dim)
    idx = make(dim=dim, quant=quant, ws=50)
    idx.add_vector_batch(data, list(range(150)))
    loc = str(tmp_path / "svs_idx")
    save_svs_folder(idx, loc)

    idx2 = make(dim=dim, quant=quant, ws=50)
    load_svs_folder(idx2, loc)
    assert idx2.index_size == 150
    if idx._P_host is not None:
        np.testing.assert_array_equal(idx._P_host, idx2._P_host)
    q = embedding_like_np(rng, 3, dim)
    for a, b in zip(idx.topk_query_batch(q, 5), idx2.topk_query_batch(q, 5)):
        np.testing.assert_array_equal(a.ids, b.ids)
        np.testing.assert_allclose(a.scores, b.scores, rtol=1e-6)
