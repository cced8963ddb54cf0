"""Batched distance computation — the TPU-native "spaces" layer.

The reference implements per-(dtype, metric, ISA, dim-residual) scalar/SIMD
kernels computing one pairwise distance per call (``src/VecSim/spaces/IP/*``,
``src/VecSim/spaces/L2/*``, ~13k LoC, dispatched by
``spaces::GetDistFunc`` at ``src/VecSim/spaces/spaces.h:18-65``). On TPU the
natural unit is a *batched score matrix*: ``scores(queries[B,D], data[N,D]) ->
[B,N]`` computed as a tiled matmul on the MXU. Per-ISA selection collapses to
dtype lanes; dim-residual template switches collapse to padding+masking.

Distance conventions match the reference exactly:
  - L2     -> squared L2 (no sqrt)          (``spaces/L2/L2.cpp``)
  - IP     -> 1 - <q, v>                    (``spaces/IP/IP.cpp``)
  - Cosine -> 1 - <q, v> on normalized data (floats are normalized at ingest;
              int8/uint8 divide by stored norms — ``IP.cpp:258-287``)
  - SQ8    -> asymmetric: IP(x,y) ≈ min·Σy + delta·Σ(q_i·y_i); L2 via
              ||x-y||² = Σx² - 2·IP + Σy²   (``spaces/computer/preprocessors.h``)

All functions are pure and jittable. Inputs may be smaller-than-capacity
views; masking of padded rows happens in the callers (index layer) via the
``count`` argument of the top-k helpers in ``topk.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import config
from ..types import VecSimMetric


def _acc_dtype(dtype) -> jnp.dtype:
    """Accumulation dtype: f64 stays f64 (when x64 is enabled), rest f32."""
    if dtype == jnp.float64:
        return jnp.float64
    return jnp.float32


def float_precision(dtype) -> jax.lax.Precision:
    """MXU precision for a float matmul lane.

    bf16/fp16 inputs take the native single-pass MXU path with fp32
    accumulation (DEFAULT) — exact for bf16, and within the fp16 test
    tolerance; HIGHEST would force a 6-pass fp32 emulation that made the
    bf16 lane *slower* than fp32. fp32/f64 follow
    ``config.fp32_matmul_precision``.
    """
    if dtype in (jnp.bfloat16, jnp.float16):
        return jax.lax.Precision.DEFAULT
    if config.fp32_matmul_precision == "highest":
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.HIGH


def _dot(queries: jax.Array, data: jax.Array) -> jax.Array:
    """<q_b, v_n> for all pairs -> [B, N], accumulated in fp32 (or f64)."""
    acc = _acc_dtype(queries.dtype)
    return jax.lax.dot_general(
        queries,
        data,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc,
        precision=float_precision(queries.dtype),
    )


# ---------------------------------------------------------------------------
# Float family: fp32 / fp64 / bf16 / fp16
# ---------------------------------------------------------------------------


def scores_float(
    queries: jax.Array,
    data: jax.Array,
    metric: VecSimMetric,
    data_sqnorms: jax.Array | None = None,
) -> jax.Array:
    """Distance matrix [B, N] for float-typed vectors.

    For L2 the identity ||q-v||² = ||q||² - 2<q,v> + ||v||² turns the scan
    into a single MXU matmul plus rank-1 updates; ``data_sqnorms`` ([N], f32)
    may be precomputed by the store to save a pass. For Cosine the *storage*
    is already normalized (ingest pipeline), and callers pass a normalized
    query, so Cosine == IP here (mirrors ``spaces/IP_space.cpp`` where Cosine
    dist fns alias IP on normalized input).
    """
    metric = VecSimMetric(metric)
    ip = _dot(queries, data)
    if metric in (VecSimMetric.IP, VecSimMetric.Cosine):
        return 1.0 - ip
    # L2
    acc = _acc_dtype(queries.dtype)
    q = queries.astype(acc)
    q_sq = jnp.sum(q * q, axis=-1, keepdims=True)  # [B, 1]
    if data_sqnorms is None:
        d = data.astype(acc)
        data_sqnorms = jnp.sum(d * d, axis=-1)  # [N]
    return q_sq - 2.0 * ip + data_sqnorms[None, :].astype(acc)


# ---------------------------------------------------------------------------
# Integer family: int8 / uint8 (with stored norms for Cosine)
# ---------------------------------------------------------------------------


_DIMS_BN = (((1,), (1,)), ((), ()))


def _int_dot(queries: jax.Array, data: jax.Array) -> jax.Array:
    """Exact integer dot [B, N] riding the MXU s8·s8→s32 path.

    int8 inputs feed the systolic array directly (upcasting to int32 first
    would force a slow 32-bit emulation). uint8 is shifted into s8 range and
    corrected exactly in int32:

        a·b = (a-128)·(b-128) + 128·Σa + 128·Σb - 128²·D

    No overflow: each term is < 2^27 for D ≤ 8192.
    """
    if queries.dtype == jnp.int8 and data.dtype == jnp.int8:
        return jax.lax.dot_general(
            queries, data, _DIMS_BN, preferred_element_type=jnp.int32
        )
    dim = queries.shape[-1]
    qs = (queries.astype(jnp.int16) - 128).astype(jnp.int8)
    ds = (data.astype(jnp.int16) - 128).astype(jnp.int8)
    raw = jax.lax.dot_general(qs, ds, _DIMS_BN, preferred_element_type=jnp.int32)
    qsum = jnp.sum(queries.astype(jnp.int32), axis=-1, keepdims=True)  # [B, 1]
    dsum = jnp.sum(data.astype(jnp.int32), axis=-1)  # [N]
    return raw + 128 * qsum + 128 * dsum[None, :] - (128 * 128) * dim


def scores_int(
    queries: jax.Array,
    data: jax.Array,
    metric: VecSimMetric,
    data_norms: jax.Array | None = None,
    query_norms: jax.Array | None = None,
) -> jax.Array:
    """Distance matrix [B, N] for int8/uint8 vectors.

    Integer dots ride the MXU int8 path (int32 accumulation), matching the
    reference's exact integer arithmetic (``spaces/IP/IP.cpp:258-287``).
    Cosine divides the integer dot by the product of the *stored* fp32 norms
    (the reference appends the norm after the int vector; we keep norms as a
    separate SoA array — same math, TPU-friendly layout).
    """
    metric = VecSimMetric(metric)
    ip = _int_dot(queries, data)
    if metric == VecSimMetric.IP:
        return 1.0 - ip.astype(jnp.float32)
    if metric == VecSimMetric.Cosine:
        denom = query_norms[:, None] * data_norms[None, :]
        return 1.0 - ip.astype(jnp.float32) / denom
    # L2: ||q-v||² with exact integer arithmetic.
    q = queries.astype(jnp.int32)
    d = data.astype(jnp.int32)
    q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
    d_sq = jnp.sum(d * d, axis=-1)
    return (q_sq - 2 * ip + d_sq[None, :]).astype(jnp.float32)


# ---------------------------------------------------------------------------
# SQ8 asymmetric: uint8 storage codes vs float queries
# ---------------------------------------------------------------------------


def scores_sq8(
    queries: jax.Array,
    codes: jax.Array,
    vmin: jax.Array,
    delta: jax.Array,
    xsumsq: jax.Array | None,
    metric: VecSimMetric,
) -> jax.Array:
    """Asymmetric SQ8 distance matrix [B, N].

    Storage: ``codes`` u8 [N, D], per-vector ``vmin``/``delta``/``xsumsq``
    (f32 [N]) — the SoA equivalent of the reference's inline
    ``[u8[dim] | min | delta | Σx | Σx²]`` blob layout
    (``spaces/computer/preprocessors.h:150-162``). Query stays float.

      IP(x, y)   = min·Σy + delta·Σ(q_i·y_i)       (IP.cpp:35-71)
      IP dist    = 1 - IP(x, y)
      L2 dist    = Σx² - 2·IP(x, y) + Σy²           (L2.cpp:30-46)
    """
    metric = VecSimMetric(metric)
    q = queries.astype(jnp.float32)
    qdot = jax.lax.dot_general(
        q,
        codes.astype(jnp.float32),
        dimension_numbers=_DIMS_BN,
        preferred_element_type=jnp.float32,
        precision=float_precision(jnp.float32),
    )  # [B, N] = Σ(q_i · y_i) with x as codes
    ysum = jnp.sum(q, axis=-1, keepdims=True)  # [B, 1]
    ip = vmin[None, :] * ysum + delta[None, :] * qdot
    if metric in (VecSimMetric.IP, VecSimMetric.Cosine):
        return 1.0 - ip
    ysumsq = jnp.sum(q * q, axis=-1, keepdims=True)
    return xsumsq[None, :] - 2.0 * ip + ysumsq


def scores_sq4(
    queries: jax.Array,
    packed: jax.Array,
    vmin: jax.Array,
    delta: jax.Array,
    xsumsq: jax.Array | None,
    metric: VecSimMetric,
) -> jax.Array:
    """Asymmetric 4-bit (LVQ level-1) distance matrix [B, N].

    Storage is two codes per byte (``quantize.pack4`` split layout); the
    unpack is one shift+mask on the VPU before the same MXU matmul as the
    SQ8 lane, so the HBM read per stored vector is HALF the SQ8 bytes —
    the whole point of the reference's LVQ4 mode.
    """
    from .quantize import unpack4

    codes = unpack4(packed)
    if queries.shape[-1] != codes.shape[-1]:  # odd dim: zero-pad the query
        pad = codes.shape[-1] - queries.shape[-1]
        queries = jnp.pad(queries, ((0, 0), (0, pad)))
    return scores_sq8(queries, codes, vmin, delta, xsumsq, metric)


# ---------------------------------------------------------------------------
# Pairwise distance between two single vectors (GetDistanceFrom parity)
# ---------------------------------------------------------------------------


def one_to_one(
    a: jax.Array,
    b: jax.Array,
    metric: VecSimMetric,
    a_norm: jax.Array | None = None,
    b_norm: jax.Array | None = None,
) -> jax.Array:
    """Single-pair distance matching ``VecSimIndex_GetDistanceFrom_Unsafe``."""
    if jnp.issubdtype(a.dtype, jnp.integer):
        return scores_int(
            a[None, :],
            b[None, :],
            metric,
            data_norms=None if b_norm is None else jnp.asarray(b_norm)[None],
            query_norms=None if a_norm is None else jnp.asarray(a_norm)[None],
        )[0, 0]
    return scores_float(a[None, :], b[None, :], metric)[0, 0]


# ---------------------------------------------------------------------------
# Streaming top-k over a large store (chunked scan; avoids [B, N] in HBM)
# ---------------------------------------------------------------------------


def _merge_topk(best_d, best_i, new_d, new_i, k):
    """Merge running top-k (smallest distances) with fresh candidates."""
    d = jnp.concatenate([best_d, new_d], axis=1)
    i = jnp.concatenate([best_i, new_i], axis=1)
    neg, idx = jax.lax.top_k(-d, k)  # top_k takes max; distances: smaller=better
    return -neg, jnp.take_along_axis(i, idx, axis=1)


_SMALL_TOPK_MAX = 16


def _lex_topk(d: jax.Array, k: int):
    """Exact smallest-k per row: one grouped-argmin pass + k cheap pops.

    ``lax.top_k`` on TPU costs ~90 ms per [1024, 64k] tile (sort-based
    lowering) — 30x the score matmul it follows. Here the tile is read ONCE
    (per-group argmin over L/128 groups); each of the k pops then takes the
    global min of the [B, G] group-min matrix and recomputes only the popped
    group's min (a [B, 128] gather) with the already-popped entries masked.
    Tie order (lower index first) matches top_k exactly. Returns
    (vals [B, k], positions [B, k]); exhausted slots are +inf.
    """
    B, L = d.shape
    Lg = min(128, L)
    pad = (-L) % Lg
    if pad:
        d = jnp.pad(d, ((0, 0), (0, pad)), constant_values=jnp.inf)
    G = d.shape[1] // Lg
    tile = d.reshape(B, G, Lg)
    gpos = jnp.argmin(tile, axis=2).astype(jnp.int32)  # [B, G] single full read
    gmin = jnp.take_along_axis(tile, gpos[:, :, None], axis=2)[:, :, 0]
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (B, G), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (B, Lg), 1)
    popped_g = jnp.full((B, k), -1, dtype=jnp.int32)
    popped_p = jnp.full((B, k), -1, dtype=jnp.int32)
    vals, poss = [], []
    for t in range(k):
        g = jnp.argmin(gmin, axis=1).astype(jnp.int32)  # ties: lowest group
        v = jnp.take_along_axis(gmin, g[:, None], axis=1)[:, 0]
        p = jnp.take_along_axis(gpos, g[:, None], axis=1)[:, 0]
        vals.append(v)
        poss.append(g * Lg + p)
        popped_g = popped_g.at[:, t].set(g)
        popped_p = popped_p.at[:, t].set(p)
        if t + 1 == k:
            break
        # Recompute the popped group's min, masking every entry already
        # popped from that group ([B, Lg, k] compare — tiny).
        grp = jnp.take_along_axis(tile, g[:, None, None], axis=1)[:, 0]  # [B, Lg]
        excl = jnp.any(
            (popped_g[:, None, :] == g[:, None, None])
            & (popped_p[:, None, :] == iota_l[:, :, None]),
            axis=2,
        )
        grp = jnp.where(excl, jnp.inf, grp)
        np_ = jnp.argmin(grp, axis=1).astype(jnp.int32)
        nv = jnp.take_along_axis(grp, np_[:, None], axis=1)[:, 0]
        hit = iota_g == g[:, None]
        gmin = jnp.where(hit, nv[:, None], gmin)
        gpos = jnp.where(hit, np_[:, None], gpos)
    return jnp.stack(vals, axis=1), jnp.stack(poss, axis=1)


@functools.partial(
    jax.jit, static_argnames=("k", "chunk", "metric", "kind", "seg_chunks")
)
def streaming_topk(
    queries: jax.Array,
    store: tuple,
    count: jax.Array,
    k: int,
    *,
    metric: VecSimMetric,
    kind: str,
    chunk: int = 1 << 16,
    query_norms: jax.Array | None = None,
    seg_chunks: int | None = None,
    start_chunk: jax.Array | None = None,
    best_init: tuple | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact k-NN over a device-resident store without materializing [B, N].

    Scans the store in ``chunk``-sized column tiles inside a ``lax.scan``;
    each step is one MXU matmul fused with a top-k merge, carrying the running
    ``(dists[B,k], ids[B,k])``. This is the TPU replacement for the
    reference's per-vector loop + bounded heap
    (``algorithms/brute_force/brute_force.h:242-291``).

    ``store`` is a tuple of SoA arrays, interpreted per ``kind``:
      - "float": (data[N,D], sqnorms[N] or None)
      - "int":   (data[N,D], norms[N] or None)
      - "sq8":   (codes[N,D], vmin[N], delta[N], xsumsq[N] or None)
    Rows with index >= count are masked to +inf. Returned ids of unfilled
    slots (k > count) are -1 with +inf distance.

    Timeout segmentation (the in-flight analog of the reference's
    ``VECSIM_TIMEOUT`` poll per vector, ``brute_force.h:265``): pass
    ``seg_chunks`` (static segment length) + ``start_chunk`` (traced chunk
    offset) + ``best_init`` (previous segment's carry) to scan one bounded
    slice per dispatch; the caller polls its timeout callback between
    dispatches and stops with partial results.
    """
    B = queries.shape[0]
    N = store[0].shape[0]
    n_chunks = max(1, -(-N // chunk))
    pad_n = n_chunks * chunk
    if seg_chunks is not None:
        n_chunks = min(seg_chunks, n_chunks)
    # fp64 stores under x64 carry double-precision scores end to end.
    sdtype = jnp.float64 if store[0].dtype == jnp.float64 else jnp.float32

    def pad_cols(x, fill=0):
        if x is None:
            return None
        pads = [(0, pad_n - N)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pads, constant_values=fill)

    padded = tuple(pad_cols(x) for x in store)

    def chunk_view(x, c):
        if x is None:
            return None
        return jax.lax.dynamic_slice_in_dim(x, c * chunk, chunk, axis=0)

    def score_chunk(c):
        if kind == "float":
            data, sqn = padded
            return scores_float(queries, chunk_view(data, c), metric, chunk_view(sqn, c))
        if kind == "int":
            data, norms = padded
            return scores_int(
                queries, chunk_view(data, c), metric, chunk_view(norms, c), query_norms
            )
        if kind == "sq8":
            codes, vmin, delta, xsumsq = padded
            return scores_sq8(
                queries,
                chunk_view(codes, c),
                chunk_view(vmin, c),
                chunk_view(delta, c),
                chunk_view(xsumsq, c),
                metric,
            )
        if kind == "sq4":
            codes, vmin, delta, xsumsq = padded
            return scores_sq4(
                queries,
                chunk_view(codes, c),
                chunk_view(vmin, c),
                chunk_view(delta, c),
                chunk_view(xsumsq, c),
                metric,
            )
        raise ValueError(f"unknown store kind {kind!r}")

    inf = jnp.inf

    def step(carry, c):
        best_d, best_i = carry
        d = score_chunk(c)  # [B, chunk]
        ids = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (B, chunk), 1)
        d = jnp.where(ids < count, d.astype(sdtype), inf)
        kk = min(k, chunk)
        if kk <= _SMALL_TOPK_MAX:
            vals, pos = _lex_topk(d, kk)
            local_ids = jnp.take_along_axis(ids, pos, axis=1)
            best_d, best_i = _merge_topk(best_d, best_i, vals, local_ids, k)
        else:
            neg, local = jax.lax.top_k(-d, kk)
            local_ids = jnp.take_along_axis(ids, local, axis=1)
            best_d, best_i = _merge_topk(best_d, best_i, -neg, local_ids, k)
        return (best_d, best_i), None

    if best_init is not None:
        init = best_init
    else:
        init = (
            jnp.full((B, k), inf, dtype=sdtype),
            jnp.full((B, k), -1, dtype=jnp.int32),
        )
    chunks = jnp.arange(n_chunks, dtype=jnp.int32)  # int32 also under x64
    if start_chunk is not None:
        chunks = chunks + start_chunk.astype(jnp.int32)
    (best_d, best_i), _ = jax.lax.scan(step, init, chunks)
    best_i = jnp.where(jnp.isfinite(best_d), best_i, -1)
    return best_d, best_i


@functools.partial(jax.jit, static_argnames=("metric", "kind", "chunk"))
def full_scores(
    queries: jax.Array,
    store: tuple,
    count: jax.Array,
    *,
    metric: VecSimMetric,
    kind: str,
    chunk: int = 1 << 16,
    query_norms: jax.Array | None = None,
) -> jax.Array:
    """All-pairs distance matrix [B, N] with padded rows masked to +inf.

    Used by the BF batch iterator (compute-all-scores-once design,
    ``bf_batch_iterator.h:176-199``) and range queries.
    """
    N = store[0].shape[0]
    B = queries.shape[0]
    if kind == "float":
        d = scores_float(queries, store[0], metric, store[1])
    elif kind == "int":
        d = scores_int(queries, store[0], metric, store[1], query_norms)
    elif kind == "sq8":
        codes, vmin, delta, xsumsq = store
        d = scores_sq8(queries, codes, vmin, delta, xsumsq, metric)
    elif kind == "sq4":
        codes, vmin, delta, xsumsq = store
        d = scores_sq4(queries, codes, vmin, delta, xsumsq, metric)
    else:
        raise ValueError(f"unknown store kind {kind!r}")
    ids = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    sdtype = jnp.float64 if store[0].dtype == jnp.float64 else jnp.float32
    return jnp.where(ids < count, d.astype(sdtype), jnp.inf)
