"""Distance-kernel parity tests — the ``test_spaces.cpp`` analog.

The reference brute-force-checks every SIMD kernel against a scalar
reference for every dim residual (``tests/unit/test_spaces.cpp``). Here the
jitted batched kernels are checked against float64 numpy for every metric,
dtype lane, and a spread of dims (including non-128-aligned residuals).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vectorsimilarity_tpu.ops import distances as D
from vectorsimilarity_tpu.ops import quantize as Q
from vectorsimilarity_tpu.ops.normalize import int_norms, normalize_batch, normalize_blob
from vectorsimilarity_tpu.types import VecSimMetric, VecSimType

from common import gt_scores

DIMS = [1, 3, 7, 16, 100, 128, 131, 768]
METRICS = [VecSimMetric.L2, VecSimMetric.IP, VecSimMetric.Cosine]


@pytest.mark.parametrize("dim", DIMS)
@pytest.mark.parametrize("metric", METRICS)
def test_scores_float_fp32(dim, metric):
    rng = np.random.default_rng(42 + dim)
    q = rng.standard_normal((4, dim)).astype(np.float32)
    v = rng.standard_normal((33, dim)).astype(np.float32)
    if metric == VecSimMetric.Cosine:
        # Storage and query are normalized at preprocess time.
        q = q / np.linalg.norm(q, axis=-1, keepdims=True)
        v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    got = np.asarray(D.scores_float(jnp.asarray(q), jnp.asarray(v), metric))
    want = gt_scores(q, v, metric)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("metric", METRICS)
def test_scores_float_precomputed_sqnorms(metric):
    rng = np.random.default_rng(7)
    q = rng.standard_normal((3, 50)).astype(np.float32)
    v = rng.standard_normal((17, 50)).astype(np.float32)
    sq = np.sum(v.astype(np.float32) ** 2, axis=-1)
    got = np.asarray(D.scores_float(jnp.asarray(q), jnp.asarray(v), metric, jnp.asarray(sq)))
    want = gt_scores(q, v, metric)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("dtype", [np.float16, "bfloat16"])
@pytest.mark.parametrize("metric", [VecSimMetric.L2, VecSimMetric.IP])
def test_scores_float_halfprec(dtype, metric):
    import ml_dtypes

    dt = np.dtype(ml_dtypes.bfloat16) if dtype == "bfloat16" else np.dtype(dtype)
    rng = np.random.default_rng(3)
    q = rng.standard_normal((2, 64)).astype(dt)
    v = rng.standard_normal((9, 64)).astype(dt)
    got = np.asarray(D.scores_float(jnp.asarray(q), jnp.asarray(v), metric), dtype=np.float64)
    want = gt_scores(q.astype(np.float32), v.astype(np.float32), metric)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("int_dtype", [np.int8, np.uint8])
@pytest.mark.parametrize("metric", METRICS)
def test_scores_int(int_dtype, metric):
    rng = np.random.default_rng(11)
    lo, hi = (-50, 50) if int_dtype == np.int8 else (0, 100)
    q = rng.integers(lo, hi, size=(3, 77)).astype(int_dtype)
    v = rng.integers(lo, hi, size=(21, 77)).astype(int_dtype)
    qn = np.sqrt((q.astype(np.int64) ** 2).sum(-1)).astype(np.float32)
    vn = np.sqrt((v.astype(np.int64) ** 2).sum(-1)).astype(np.float32)
    got = np.asarray(
        D.scores_int(jnp.asarray(q), jnp.asarray(v), metric, jnp.asarray(vn), jnp.asarray(qn))
    )
    want = gt_scores(q, v, metric, data_norms=vn, query_norms=qn)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_int_norms_match_reference_math():
    rng = np.random.default_rng(0)
    v = rng.integers(-128, 127, size=(5, 33)).astype(np.int8)
    got = np.asarray(int_norms(jnp.asarray(v)))
    want = np.sqrt((v.astype(np.int64) ** 2).sum(-1))
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("metric", METRICS)
def test_scores_sq8_asymmetric(metric):
    """SQ8 distance must equal the exact float distance on the RECONSTRUCTED
    vectors (the quantization identity, preprocessors.h:150-220)."""
    rng = np.random.default_rng(5)
    v = rng.standard_normal((19, 96)).astype(np.float32)
    q = rng.standard_normal((4, 96)).astype(np.float32)
    if metric == VecSimMetric.Cosine:
        v = v / np.linalg.norm(v, axis=-1, keepdims=True)
        q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    codes, vmin, delta, xsum, xsumsq = Q.sq8_quantize(jnp.asarray(v))
    got = np.asarray(
        D.scores_sq8(jnp.asarray(q), codes, vmin, delta, xsumsq, metric)
    )
    # Reference math on reconstructed storage vectors. Note: the reference's
    # x_sum/x_sum_squares metadata are over the ORIGINAL values, so the L2
    # identity mixes original norms with quantized dot — replicate that.
    recon = np.asarray(Q.sq8_reconstruct(codes, vmin, delta), dtype=np.float64)
    ip = np.asarray(vmin, np.float64)[None, :] * q.sum(-1, dtype=np.float64)[:, None] + np.asarray(
        delta, np.float64
    )[None, :] * (q.astype(np.float64) @ np.asarray(codes, np.float64).T)
    if metric == VecSimMetric.L2:
        want = (
            np.asarray(xsumsq, np.float64)[None, :]
            - 2 * ip
            + (q.astype(np.float64) ** 2).sum(-1)[:, None]
        )
    else:
        want = 1.0 - ip
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # And the implied error vs the true float distance is bounded by quant noise.
    true = gt_scores(q, v, VecSimMetric.IP if metric != VecSimMetric.L2 else metric)
    scale = max(1.0, np.abs(true).max())
    assert (np.abs(got - true) / scale).max() < 0.05


def test_sq8_quantize_roundtrip():
    rng = np.random.default_rng(1)
    v = rng.standard_normal((7, 50)).astype(np.float32) * 3
    codes, vmin, delta, xsum, xsumsq = Q.sq8_quantize(jnp.asarray(v))
    recon = np.asarray(Q.sq8_reconstruct(codes, vmin, delta))
    assert np.abs(recon - v).max() <= np.asarray(delta).max() * 0.51
    np.testing.assert_allclose(np.asarray(xsum), v.sum(-1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(xsumsq), (v * v).sum(-1), rtol=1e-4)


def test_sq8_constant_vector():
    v = np.full((1, 16), 2.5, dtype=np.float32)
    codes, vmin, delta, _, _ = Q.sq8_quantize(jnp.asarray(v))
    assert np.all(np.asarray(codes) == 0)
    recon = np.asarray(Q.sq8_reconstruct(codes, vmin, delta))
    np.testing.assert_allclose(recon, v)


def test_normalize_batch_float():
    rng = np.random.default_rng(2)
    v = rng.standard_normal((6, 40)).astype(np.float32) * 10
    out = np.asarray(normalize_batch(jnp.asarray(v)))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)


def test_normalize_blob_int8_appends_norm():
    v = np.array([3, 4, 0], dtype=np.int8)
    out = normalize_blob(v, VecSimType.INT8)
    assert out.nbytes == 3 + 4
    norm = np.frombuffer(out[3:].tobytes(), dtype=np.float32)[0]
    assert norm == pytest.approx(5.0)
    np.testing.assert_array_equal(out[:3].view(np.int8), v)


def test_streaming_topk_exact():
    rng = np.random.default_rng(9)
    n, dim, k = 5000, 32, 10
    v = rng.standard_normal((n, dim)).astype(np.float32)
    q = rng.standard_normal((3, dim)).astype(np.float32)
    dists, ids = D.streaming_topk(
        jnp.asarray(q),
        (jnp.asarray(v), None),
        jnp.int32(n),
        k,
        metric=VecSimMetric.L2,
        kind="float",
        chunk=512,
    )
    want = gt_scores(q, v, VecSimMetric.L2)
    order = np.argsort(want, axis=1)[:, :k]
    np.testing.assert_array_equal(np.sort(np.asarray(ids), axis=1), np.sort(order, axis=1))
    np.testing.assert_allclose(
        np.asarray(dists), np.take_along_axis(want, np.asarray(ids), 1), rtol=1e-4, atol=1e-4
    )


def test_streaming_topk_respects_count_mask():
    rng = np.random.default_rng(10)
    v = rng.standard_normal((100, 8)).astype(np.float32)
    v[50:] = 0  # padded region would win for IP if unmasked
    q = rng.standard_normal((1, 8)).astype(np.float32)
    dists, ids = D.streaming_topk(
        jnp.asarray(q), (jnp.asarray(v), None), jnp.int32(50), 60,
        metric=VecSimMetric.L2, kind="float", chunk=64,
    )
    ids = np.asarray(ids)[0]
    assert (ids[:50] < 50).all() and (ids[:50] >= 0).all()
    assert (ids[50:] == -1).all()
    assert not np.isfinite(np.asarray(dists)[0, 50:]).any()
