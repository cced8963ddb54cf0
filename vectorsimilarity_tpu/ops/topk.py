"""Top-k helpers, including per-label segment-min for multi-value indexes.

The reference's multi-value indexes keep "best score per label" with an
``updatable_max_heap`` (``utils/updatable_heap.h:24-120``). On TPU this
becomes a scatter-min over dense label slots followed by an ordinary top-k —
one fused device computation, no per-element heap updates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("slot_cap",))
def slot_min_scores(scores: jax.Array, slots: jax.Array, slot_cap: int) -> jax.Array:
    """Per-label-slot minimum distance.

    scores: [B, N] (+inf for masked/padded rows); slots: [N] int32 dense label
    slots, -1 for padded rows. Returns [B, slot_cap] with +inf for empty slots.
    """
    B = scores.shape[0]
    # Route padded rows (-1) to a scratch slot at index slot_cap.
    safe = jnp.where(slots < 0, slot_cap, slots)
    out = jnp.full((B, slot_cap + 1), jnp.inf, dtype=scores.dtype)
    out = out.at[:, safe].min(scores)
    return out[:, :slot_cap]


@functools.partial(jax.jit, static_argnames=("k", "slot_cap"))
def topk_by_slot(scores: jax.Array, slots: jax.Array, slot_cap: int, k: int):
    """Top-k (smallest) per-label distances -> (dists[B,k], slot_ids[B,k])."""
    per_slot = slot_min_scores(scores, slots, slot_cap)
    kk = min(k, slot_cap)
    neg, idx = jax.lax.top_k(-per_slot, kk)
    return -neg, idx
