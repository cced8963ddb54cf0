"""SQ8 scalar quantization — TPU equivalent of ``QuantPreprocessor``.

Reference: ``spaces/computer/preprocessors.h:150-330``. Storage is quantized
to uint8 with per-vector (min, delta) and precomputed Σx (and Σx² for L2);
queries stay float with precomputed Σy (and Σy²). We keep the metadata as
separate SoA arrays rather than inline blob bytes — identical math, layout
that vectorizes on TPU.
"""

from __future__ import annotations

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
