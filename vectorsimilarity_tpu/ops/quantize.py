"""SQ8 scalar quantization — TPU equivalent of ``QuantPreprocessor``.

Reference: ``spaces/computer/preprocessors.h:150-330``. Storage is quantized
to uint8 with per-vector (min, delta) and precomputed Σx (and Σx² for L2);
queries stay float with precomputed Σy (and Σy²). We keep the metadata as
separate SoA arrays rather than inline blob bytes — identical math, layout
that vectorizes on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def sq8_quantize(vecs: jax.Array, with_sumsq: bool = True):
    """Quantize float rows [B, D] -> (codes u8, vmin, delta, xsum, xsumsq).

    Mirrors the reference pass (``preprocessors.h:255-315``):
      delta = (max - min) / 255, or 1 when max == min
      q_i   = round((x_i - min) / delta)         (all values equal -> 0)
      xsum  = Σx_i, xsumsq = Σx_i² over the ORIGINAL fp32 values.
    ``xsumsq`` is only needed for L2 (``with_sumsq``); callers may discard it.
    """
    x = vecs.astype(jnp.float32)
    vmin = jnp.min(x, axis=-1)
    vmax = jnp.max(x, axis=-1)
    diff = vmax - vmin
    delta = jnp.where(diff == 0.0, 1.0, diff / 255.0)
    inv_delta = 1.0 / delta
    codes = jnp.round((x - vmin[:, None]) * inv_delta[:, None])
    codes = jnp.clip(codes, 0.0, 255.0).astype(jnp.uint8)
    xsum = jnp.sum(x, axis=-1)
    xsumsq = jnp.sum(x * x, axis=-1) if with_sumsq else None
    return codes, vmin, delta, xsum, xsumsq


def sq8_query_meta(queries: jax.Array):
    """Query metadata (Σy, Σy²) for asymmetric distance.

    Reference appends these after the query values
    (``preprocessors.h:175-180``); we return them as arrays.
    """
    q = queries.astype(jnp.float32)
    return jnp.sum(q, axis=-1), jnp.sum(q * q, axis=-1)


def sq8_reconstruct(codes: jax.Array, vmin: jax.Array, delta: jax.Array) -> jax.Array:
    """Dequantize: x_i ≈ min + delta · q_i (``preprocessors.h:164-166``)."""
    return vmin[:, None] + delta[:, None] * codes.astype(jnp.float32)


# ---------------------------------------------------------------------------
# LVQ-style 4-bit quantization (SVS quantBits Q4 / Q4x4 / Q4x8 families)
# ---------------------------------------------------------------------------
#
# The reference's SVS dep implements Intel LVQ: per-vector scalar
# quantization at 4 bits (two codes per byte), optionally with a second
# "residual" level re-quantizing the level-1 error at 4 or 8 bits for
# reranking (vec_sim_common.h:170-179 names the modes; the SVS submodule
# holding the kernels is empty in the snapshot). TPU-native layout: nibbles
# are packed SPLIT-wise — packed[i] = lo_half[i] | (hi_half[i] << 4) where
# lo_half = codes[:ceil(D/2)], hi_half = codes[ceil(D/2):] — so unpacking
# is one shift + one mask + a concatenate along the lane dimension (an
# interleave layout would force a cross-lane shuffle on every unpack).


def pack4(codes: jax.Array) -> jax.Array:
    """Pack u8 codes in [0,15] ([..., D] -> [..., ceil(D/2)]) split-wise.

    Odd D pads the tail with code 0 — harmless under the asymmetric
    kernels because queries are zero-padded in the same position and the
    ``vmin·Σy`` term uses the query's true Σy.
    """
    d = codes.shape[-1]
    half = (d + 1) // 2
    pad = 2 * half - d
    if pad:
        codes = jnp.pad(
            codes, [(0, 0)] * (codes.ndim - 1) + [(0, pad)], constant_values=0
        )
    lo = codes[..., :half]
    hi = codes[..., half:]
    return (lo | (hi << 4)).astype(jnp.uint8)


def unpack4(packed: jax.Array) -> jax.Array:
    """Unpack split-wise nibbles: [..., H] u8 -> [..., 2H] u8 in [0,15]."""
    lo = packed & jnp.uint8(0x0F)
    hi = packed >> 4
    return jnp.concatenate([lo, hi], axis=-1)


def sq4_quantize(vecs: jax.Array, with_sumsq: bool = True):
    """Quantize float rows [B, D] -> (packed u8 [B, ceil(D/2)], vmin, delta,
    xsum, xsumsq). Same per-vector min/delta scheme as ``sq8_quantize`` with
    15 steps instead of 255 (LVQ level-1 semantics)."""
    x = vecs.astype(jnp.float32)
    vmin = jnp.min(x, axis=-1)
    vmax = jnp.max(x, axis=-1)
    diff = vmax - vmin
    delta = jnp.where(diff == 0.0, 1.0, diff / 15.0)
    codes = jnp.round((x - vmin[:, None]) / delta[:, None])
    codes = jnp.clip(codes, 0.0, 15.0).astype(jnp.uint8)
    xsum = jnp.sum(x, axis=-1)
    xsumsq = jnp.sum(x * x, axis=-1) if with_sumsq else None
    return pack4(codes), vmin, delta, xsum, xsumsq


def sq4_reconstruct(packed: jax.Array, vmin: jax.Array, delta: jax.Array, dim: int) -> jax.Array:
    """Dequantize packed 4-bit rows back to float [B, dim]."""
    codes = unpack4(packed)[..., :dim]
    return vmin[:, None] + delta[:, None] * codes.astype(jnp.float32)


def residual_quantize(vecs: jax.Array, recon: jax.Array, bits: int):
    """Quantize the level-1 error ``vecs - recon`` at ``bits`` (4 or 8).

    Returns (codes, rvmin, rdelta): codes are packed u8 nibbles for 4 bits,
    plain u8 for 8 bits. Level-2 reconstruction adds
    ``rvmin + rdelta·c2`` on top of the level-1 value, so the two-level
    decode is x ≈ (vmin + delta·c1) + (rvmin + rdelta·c2).
    """
    r = vecs.astype(jnp.float32) - recon.astype(jnp.float32)
    levels = float((1 << bits) - 1)
    rvmin = jnp.min(r, axis=-1)
    rmax = jnp.max(r, axis=-1)
    diff = rmax - rvmin
    rdelta = jnp.where(diff == 0.0, 1.0, diff / levels)
    codes = jnp.round((r - rvmin[:, None]) / rdelta[:, None])
    codes = jnp.clip(codes, 0.0, levels).astype(jnp.uint8)
    if bits == 4:
        codes = pack4(codes)
    return codes, rvmin, rdelta


# ---------------------------------------------------------------------------
# LeanVec: learned orthonormal projection for primary (graph) space
# ---------------------------------------------------------------------------


def leanvec_train(sample: jax.Array, ldim: int) -> jax.Array:
    """PCA projection P [D, ldim] with orthonormal columns.

    LeanVec reduces dimensionality for the graph/primary representation and
    reranks with a full-dimension secondary quantization. The projection is
    the top-``ldim`` principal directions of the (uncentered) sample
    second-moment matrix — uncentered because stored vectors are
    cosine-normalized / IP-scored, where the origin is meaningful. A sample
    with fewer rows than ``ldim`` still yields a full-rank orthonormal P:
    ``eigh`` of the rank-deficient PSD moment matrix returns a complete
    orthonormal basis (null-space directions carry ~0 eigenvalues).
    """
    x = sample.astype(jnp.float32)
    cov = x.T @ x  # [D, D]
    _, vecs = jnp.linalg.eigh(cov)  # ascending eigenvalues
    p = vecs[:, ::-1][:, :ldim]  # top-ldim directions
    return p.astype(jnp.float32)


def leanvec_project(vecs: jax.Array, p: jax.Array) -> jax.Array:
    """Project rows into the primary space: [B, D] @ [D, L] -> [B, L]."""
    return (vecs.astype(jnp.float32) @ p).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Refinement (rerank) kernel shared by the two-level and LeanVec modes
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("metric_is_l2", "packed_flags"))
def gathered_recon_dists(
    q: jax.Array,  # [B, D] float queries in the LAYERS' space
    ids: jax.Array,  # [B, M] row indices (must be valid; mask outside)
    layers: tuple,  # ((codes [N,*], vmin [N], delta [N]), ...)
    xsumsq: jax.Array | None,  # [N] Σx² in q's space (L2 only)
    *,
    metric_is_l2: bool,
    packed_flags: tuple,  # per-layer: codes are 4-bit packed
) -> jax.Array:
    """Asymmetric distances against a multi-layer quantized decode.

    The decode of row r is Σ_layers (vmin_l[r] + delta_l[r]·codes_l[r]), so
    the inner product telescopes into per-layer ``vmin·Σy + delta·(c·y)``
    terms — one cheap gather+einsum per layer, never a materialized float
    reconstruction. One layer = plain SQ8/SQ4 rerank (LeanVec secondary);
    two layers = LVQ two-level rerank (Q4x4 / Q4x8).
    """
    qf = q.astype(jnp.float32)
    ysum = jnp.sum(qf, axis=-1)  # [B]
    ip = 0.0
    for (codes, vmin, delta), packed in zip(layers, packed_flags):
        c = jnp.take(codes, ids, axis=0)  # [B, M, *]
        if packed:
            c = unpack4(c)
        qp = qf
        if qp.shape[-1] != c.shape[-1]:  # odd-dim pack padding
            qp = jnp.pad(qp, ((0, 0), (0, c.shape[-1] - qp.shape[-1])))
        qdot = jnp.einsum(
            "bd,bmd->bm", qp, c.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        ip = ip + jnp.take(vmin, ids, axis=0) * ysum[:, None] \
            + jnp.take(delta, ids, axis=0) * qdot
    if not metric_is_l2:
        return 1.0 - ip
    ysumsq = jnp.sum(qf * qf, axis=-1)
    return jnp.take(xsumsq, ids, axis=0) - 2.0 * ip + ysumsq[:, None]
