"""Device graph-search kernels: batched greedy descent, ef-beam search, and
diversity pruning.

TPU re-design of the HNSW hot loops (``algorithms/hnsw/hnsw.h``):

- ``greedySearchLevel`` (hnsw.h:1192, pointer-chase + one distance per hop)
  -> ``greedy_level``: a batched ``lax.while_loop`` where every step gathers
  the full neighbor row and evaluates all M distances at once on the VPU/MXU.
- ``searchLayer`` (hnsw.h:664-703, candidate min-heap + bounded result heap
  + visited-tag array) -> ``beam_search``: a fixed-capacity sorted beam with
  expanded flags carried through a ``lax.while_loop``; the two heaps collapse
  into one sorted array (equivalent semantics: a candidate is expanded iff it
  was ever within the best-ef frontier, and the loop stops when the best
  unexpanded candidate is worse than the worst beam entry). The visited-tag
  pool (visited_nodes_handler.h) becomes a per-query byte map scattered on
  device.
- ``getNeighborsByHeuristic2`` (hnsw.h:725-779, greedy diversity prune) ->
  ``diversity_prune``: the same greedy loop as a ``fori_loop`` over
  score-sorted candidates, batched over all inserted nodes at once.

All kernels take SoA device arrays and are shape-specialized by (capacity
bucket, ef, M, batch); recompiles are O(log N) per index lifetime.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..types import VecSimMetric
from .distances import float_precision


class StoreCtx(NamedTuple):
    """Device score context: data plus optional per-row extras.

    kind="float": data [N,D] float; sqnorm [N] f32 (L2 only, else None)
    kind="int":   data [N,D] int8/uint8; sqnorm [N] f32 (L2), norm [N] f32
                  (cosine), else None
    kind="sq8":   data [N,D] uint8 codes; sqnorm [N] = Σx² (L2 only);
                  vmin/delta [N] f32 quantization params; queries stay float
                  and carry (Σy, Σy²) via the kernels' ``q_meta`` argument
                  (asymmetric distance, spaces/IP/IP.cpp:35-71)
    kind="sq4":   data [N,ceil(D/2)] packed 4-bit codes (two per byte,
                  ``ops.quantize.pack4`` split layout); otherwise as sq8 —
                  gathers unpack in-kernel, halving HBM bytes per neighbor

    ``nav`` is an optional bf16 shadow of ``data`` (float kinds only): graph
    NAVIGATION gathers read it instead of the fp32 rows — random row
    gathers are the construction bottleneck (~100 GB/s effective on TPU)
    and bf16 halves the bytes; the ~1e-3 relative distance error only
    perturbs candidate ordering, never final scores (exact kernels rescore).
    """

    data: jax.Array
    sqnorm: jax.Array | None = None
    norm: jax.Array | None = None
    vmin: jax.Array | None = None
    delta: jax.Array | None = None
    nav: jax.Array | None = None


def gathered_dists(
    q: jax.Array,
    ids: jax.Array,
    ctx: StoreCtx,
    metric: VecSimMetric,
    kind: str,
    q_norm: jax.Array | None = None,
    q_meta: tuple | None = None,
) -> jax.Array:
    """Distances from per-query vectors to gathered rows.

    q: [B, D]; ids: [B, M] (must be valid row indices; mask afterwards).
    Returns [B, M] f32. Uses the same algebraic identities as
    ``ops.distances`` so beam scores match full-scan scores exactly.
    ``q_meta`` = (Σy [B], Σy² [B] or None) for the sq8 asymmetric kernels.
    """
    metric = VecSimMetric(metric)
    if ctx.nav is not None and kind == "float":
        vecs = jnp.take(ctx.nav, ids, axis=0)  # [B, M, D] bf16 shadow
        ip = jnp.einsum(
            "bd,bmd->bm",
            q.astype(vecs.dtype),
            vecs,
            preferred_element_type=jnp.float32,
        )
        if metric in (VecSimMetric.IP, VecSimMetric.Cosine):
            return 1.0 - ip
        qsq = jnp.sum(q.astype(jnp.float32) ** 2, axis=-1)
        vsq = jnp.take(ctx.sqnorm, ids, axis=0)
        return qsq[:, None] - 2.0 * ip + vsq
    vecs = jnp.take(ctx.data, ids, axis=0)  # [B, M, D]
    if kind in ("sq8", "sq4"):
        if kind == "sq4":
            from .quantize import unpack4

            vecs = unpack4(vecs)  # [B, M, 2H] codes in [0,15]
            if q.shape[-1] != vecs.shape[-1]:  # odd dim: zero-pad query
                q = jnp.pad(q, ((0, 0), (0, vecs.shape[-1] - q.shape[-1])))
        ysum, ysumsq = q_meta
        qdot = jnp.einsum(
            "bd,bmd->bm", q.astype(jnp.float32), vecs.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        vmin = jnp.take(ctx.vmin, ids, axis=0)
        delta = jnp.take(ctx.delta, ids, axis=0)
        ip = vmin * ysum[:, None] + delta * qdot
        if metric in (VecSimMetric.IP, VecSimMetric.Cosine):
            return 1.0 - ip
        xsumsq = jnp.take(ctx.sqnorm, ids, axis=0)
        return xsumsq - 2.0 * ip + ysumsq[:, None]
    if kind == "int":
        ip = jnp.einsum(
            "bd,bmd->bm",
            q.astype(jnp.int32),
            vecs.astype(jnp.int32),
            preferred_element_type=jnp.int32,
        )
        if metric == VecSimMetric.IP:
            return 1.0 - ip.astype(jnp.float32)
        if metric == VecSimMetric.Cosine:
            norms = jnp.take(ctx.norm, ids, axis=0)
            return 1.0 - ip.astype(jnp.float32) / (norms * q_norm[:, None])
        qsq = jnp.sum(q.astype(jnp.int32) * q.astype(jnp.int32), axis=-1)
        vsq = jnp.take(ctx.sqnorm, ids, axis=0)
        return qsq[:, None].astype(jnp.float32) - 2.0 * ip.astype(jnp.float32) + vsq
    acc = jnp.float32 if q.dtype != jnp.float64 else jnp.float64
    ip = jnp.einsum(
        "bd,bmd->bm",
        q,
        vecs,
        preferred_element_type=acc,
        precision=float_precision(q.dtype),
    )
    if metric in (VecSimMetric.IP, VecSimMetric.Cosine):
        return (1.0 - ip).astype(jnp.float32)
    qsq = jnp.sum(q.astype(acc) * q.astype(acc), axis=-1)
    vsq = jnp.take(ctx.sqnorm, ids, axis=0)
    return (qsq[:, None] - 2.0 * ip + vsq).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Greedy descent (one level)
# ---------------------------------------------------------------------------


def _neighbor_gather(links: jax.Array, row_of: jax.Array | None, level: jax.Array | None):
    """Neighbor-row gather for 2-D ([rows, M]) or 3-D ([rows, L, M] + level)
    link arrays. 3-D + traced ``level`` lets one compiled kernel serve every
    upper level (level l>=1 lives at index l-1)."""

    def nbrs_of(ids):
        rows = ids if row_of is None else jnp.take(row_of, ids, axis=0)
        x = jnp.take(links, rows, axis=0)
        if links.ndim == 3:
            x = jax.lax.dynamic_index_in_dim(x, level - 1, axis=1, keepdims=False)
        return x

    return nbrs_of


def greedy_level_impl(
    q: jax.Array,
    ctx: StoreCtx,
    links: jax.Array,  # [rows, M] or [rows, L, M] neighbor vector-ids, -1 padded
    row_of: jax.Array | None,  # [cap] vector-id -> row in `links` (None: identity)
    cur: jax.Array,  # [B] current vector ids
    cur_d: jax.Array,  # [B] their distances
    level: jax.Array | None = None,  # traced level for 3-D links
    active: jax.Array | None = None,  # [B] bool: queries to advance
    *,
    metric: VecSimMetric,
    kind: str,
    q_norm: jax.Array | None = None,
    q_meta: tuple | None = None,
):
    """Batched greedy hill-descent on one level until no query improves.

    Unjitted so fused construction/search programs can inline it; the jitted
    wrapper below serves standalone callers."""
    B = q.shape[0]
    nbrs_of = _neighbor_gather(links, row_of, level)
    if active is None:
        active = jnp.ones((B,), dtype=bool)

    def cond(state):
        _, _, improved = state
        return jnp.any(improved)

    def body(state):
        cur, cur_d, improved = state
        nbrs = nbrs_of(jnp.where(improved, cur, 0))  # [B, M]
        valid = (nbrs >= 0) & improved[:, None]
        safe = jnp.where(valid, nbrs, 0)
        nd = gathered_dists(q, safe, ctx, metric, kind, q_norm, q_meta)
        nd = jnp.where(valid, nd, jnp.inf)
        j = jnp.argmin(nd, axis=1)
        best_d = jnp.take_along_axis(nd, j[:, None], axis=1)[:, 0]
        best_i = jnp.take_along_axis(safe, j[:, None], axis=1)[:, 0]
        better = best_d < cur_d
        return (
            jnp.where(better, best_i, cur),
            jnp.where(better, best_d, cur_d),
            better,
        )

    init = (cur, cur_d, active)
    cur, cur_d, _ = jax.lax.while_loop(cond, body, init)
    return cur, cur_d


greedy_level = functools.partial(jax.jit, static_argnames=("metric", "kind"))(
    greedy_level_impl
)
greedy_level.__doc__ = "Jitted wrapper of greedy_level_impl."


# ---------------------------------------------------------------------------
# Beam search (searchLayer)
# ---------------------------------------------------------------------------


def beam_search_impl(
    q: jax.Array,  # [B, D]
    ctx: StoreCtx,
    links: jax.Array,  # [rows, M]
    row_of: jax.Array | None,  # [cap] or None
    entry_ids: jax.Array,  # [B] entry vector ids
    entry_dists: jax.Array,  # [B]
    visited_cap: int,
    level: jax.Array | None = None,  # traced level for 3-D links
    active: jax.Array | None = None,  # [B] bool: rows to search (None: all)
    *,
    ef: int,
    metric: VecSimMetric,
    kind: str,
    q_norm: jax.Array | None = None,
    q_meta: tuple | None = None,
    max_iters: int = 0,
    expand: int = 1,
    init_state: tuple | None = None,
    return_state: bool = False,
    iter_budget: jax.Array | None = None,
):
    """Best-first ef-beam search from per-query entry points.

    Returns (beam_d [B, ef], beam_i [B, ef]) sorted ascending; empty slots
    have d=+inf, id=-1. With ``expand=1`` this is step-for-step equivalent
    to ``searchLayer`` (hnsw.h:664-703). ``expand=E`` pops the E best
    unexpanded candidates per iteration (all within the result window) —
    E x fewer loop iterations at slightly broader exploration; used by
    construction, where per-iteration sort/merge overheads dominate.
    Inactive rows (``active=False``) do no work and return empty beams.

    ``init_state``/``return_state`` make the search RESUMABLE — the TPU
    analog of the reference batch iterator's persisted candidate heap +
    spillover (hnsw_batch_iterator.h:94,206-249): state is
    ``(beam_d [B, W'], beam_i, beam_e, visited)`` from a previous call
    (possibly at a smaller ef); resuming continues expansion with the
    carried visited bitmap, so deep paging expands every node once.

    ``iter_budget`` (traced scalar) caps loop iterations below the static
    ``max_iters`` without recompiling — the in-kernel deadline hook (the
    reference checks VECSIM_TIMEOUT every hop, hnsw.h:1923). When
    ``return_state`` is set the trailing outputs are
    ``(state..., completed)`` where ``completed`` is False iff the budget
    expired before the beam converged.
    """
    B = q.shape[0]
    M = links.shape[-1]
    if not max_iters:
        from .. import config

        max_iters = max(
            (config.beam_iter_factor * ef + config.beam_iter_base) // expand, 64
        )
    nbrs_of = _neighbor_gather(links, row_of, level)
    # Working width: the reference's candidate min-heap retains nodes that
    # later fall out of the ef-sized result heap and can still be expanded
    # (hnsw.h searchLayer); extra slots emulate that candidate memory (it
    # matters most at small ef, where losing evicted candidates starves the
    # expansion frontier).
    W = ef + max(min(ef, 128), 16)
    W32 = (visited_cap + 31) // 32
    one = jnp.uint32(1)

    if active is None:
        active_rows = jnp.ones((B,), dtype=bool)
    else:
        active_rows = active
    if init_state is not None:
        beam_d, beam_i, beam_e, visited = init_state
        w0 = beam_d.shape[1]
        if w0 < W:
            beam_d = jnp.pad(beam_d, ((0, 0), (0, W - w0)), constant_values=jnp.inf)
            beam_i = jnp.pad(beam_i, ((0, 0), (0, W - w0)), constant_values=-1)
            beam_e = jnp.pad(beam_e, ((0, 0), (0, W - w0)))
        elif w0 > W:
            beam_d, beam_i, beam_e = beam_d[:, :W], beam_i[:, :W], beam_e[:, :W]
    else:
        entry_ids = jnp.where(active_rows, entry_ids.astype(jnp.int32), -1)
        beam_d = jnp.full((B, W), jnp.inf, dtype=jnp.float32)
        beam_i = jnp.full((B, W), -1, dtype=jnp.int32)
        beam_e = jnp.zeros((B, W), dtype=bool)
        beam_d = beam_d.at[:, 0].set(
            jnp.where(active_rows, entry_dists.astype(jnp.float32), jnp.inf)
        )
        beam_i = beam_i.at[:, 0].set(entry_ids)
        # Visited set as a BITMAP ([B, cap/32] uint32, 1 bit per node) — the
        # byte-map version was [B, cap] (10 GB at 10M nodes x B=1024; the
        # reference's per-query tag array is visited_nodes_handler.h:16-77).
        # Bit sets use scatter-ADD, which equals OR here: neighbor ids within
        # a row are unique (graph invariant) and already-set bits are masked
        # out by ~seen before the scatter.
        visited = jnp.zeros((B, W32), dtype=jnp.uint32)
        # Inactive/absent entries scatter at W32 (truly out-of-bounds, hence
        # dropped) — a -1 index would wrap to the last column.
        visited = visited.at[
            jnp.arange(B), jnp.where(entry_ids >= 0, entry_ids >> 5, W32)
        ].add(
            jnp.left_shift(one, (jnp.maximum(entry_ids, 0) & 31).astype(jnp.uint32)),
            mode="drop",
        )
    done = ~active_rows
    rows_b = jnp.arange(B)
    cap_iters = jnp.int32(max_iters)
    if iter_budget is not None:
        cap_iters = jnp.minimum(cap_iters, iter_budget.astype(jnp.int32))

    E = expand
    C = E * M  # new-candidate block width per iteration

    def cond(state):
        _, _, _, _, done, it = state
        return jnp.logical_and(~jnp.all(done), it < cap_iters)

    def body(state):
        beam_d, beam_i, beam_e, visited, done, it = state
        # Best E unexpanded candidates per query: the beam is sorted, so
        # these are simply the first E unexpanded slots — a cumsum + E
        # one-hot reductions instead of top_k (whose sort-based lowering
        # costs ms at this width).
        unexp = (~beam_e) & (beam_i >= 0)
        rank = jnp.cumsum(unexp.astype(jnp.int32), axis=1) - unexp.astype(jnp.int32)
        iw0 = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
        pos_l, d_l = [], []
        for e in range(E):
            sel = unexp & (rank == e)
            has = jnp.any(sel, axis=1)
            pos_l.append(jnp.sum(jnp.where(sel, iw0, 0), axis=1))
            d_l.append(
                jnp.where(has, jnp.sum(jnp.where(sel, beam_d, 0.0), axis=1), jnp.inf)
            )
        pos = jnp.stack(pos_l, axis=1)  # [B, E]
        cur_d = jnp.stack(d_l, axis=1)
        worst = beam_d[:, ef - 1]  # worst of the RESULT window
        # Stop when: no unexpanded candidate, or beam full and the best
        # candidate cannot improve it (hnsw.h searchLayer termination).
        newly_done = (cur_d[:, 0] == jnp.inf) | (cur_d[:, 0] > worst)
        done2 = done | newly_done
        act = ~done2
        # Secondary pops only while they can still improve the window.
        exp_ok = act[:, None] & (cur_d < jnp.inf) & (cur_d <= worst[:, None])
        cur_i = jnp.take_along_axis(beam_i, pos, axis=1)  # [B, E]
        beam_e = beam_e.at[
            rows_b[:, None], jnp.where(exp_ok, pos, W)
        ].set(True, mode="drop")
        # Neighbor rounds: per pop, so a node reached by two pops in the
        # same iteration is deduped by the visited re-check between rounds
        # (the bitmap scatter-ADD needs each bit added at most once).
        blocks_i = []
        visited2 = visited
        for e in range(E):
            ids_e = jnp.where(exp_ok[:, e], cur_i[:, e], 0)
            nbrs = nbrs_of(ids_e)  # [B, M]
            valid = (nbrs >= 0) & exp_ok[:, e][:, None]
            safe = jnp.where(valid, nbrs, 0)
            words = jnp.take_along_axis(visited2, safe >> 5, axis=1)
            shift = (safe & 31).astype(jnp.uint32)
            seen = (words >> shift) & one > 0
            valid = valid & ~seen
            bits = jnp.where(valid, jnp.left_shift(one, shift), jnp.uint32(0))
            visited2 = visited2.at[rows_b[:, None], safe >> 5].add(bits)
            blocks_i.append(jnp.where(valid, safe, -1))
        new_i = jnp.concatenate(blocks_i, axis=1) if E > 1 else blocks_i[0]
        nd = gathered_dists(
            q, jnp.maximum(new_i, 0), ctx, metric, kind, q_norm, q_meta
        )
        nd = jnp.where(new_i >= 0, nd, jnp.inf)
        # Merge into the beam with one multi-operand stable sort. Measured
        # on TPU this beats every scatter/compare-count merge formulation
        # by an order of magnitude (0.8 ms vs 9-19 ms at [1024, 328+128]):
        # XLA's sort is heavily optimized while broadcast compare-reduces
        # and scatters are not. Stability keeps beam entries ahead of equal
        # new candidates (searchLayer tie behavior).
        all_d = jnp.concatenate([beam_d, nd], axis=1)
        all_i = jnp.concatenate([beam_i, new_i], axis=1)
        all_e = jnp.concatenate([beam_e, jnp.zeros((B, C), dtype=bool)], axis=1)
        out_d, out_i, out_e = jax.lax.sort(
            (all_d, all_i, all_e), num_keys=1, is_stable=True
        )
        return (
            out_d[:, :W], out_i[:, :W], out_e[:, :W], visited2, done2, it + 1
        )

    state = (beam_d, beam_i, beam_e, visited, done, jnp.int32(0))
    beam_d, beam_i, beam_e, visited, done, it = jax.lax.while_loop(cond, body, state)
    if return_state:
        completed = jnp.all(done)
        return (
            beam_d[:, :ef], beam_i[:, :ef],
            (beam_d, beam_i, beam_e, visited), completed, it,
        )
    return beam_d[:, :ef], beam_i[:, :ef]


beam_search = functools.partial(
    jax.jit,
    static_argnames=(
        "visited_cap", "ef", "metric", "kind", "max_iters", "expand",
        "return_state",
    ),
)(beam_search_impl)
beam_search.__doc__ = "Jitted wrapper of beam_search_impl."


# ---------------------------------------------------------------------------
# Diversity pruning (getNeighborsByHeuristic2)
# ---------------------------------------------------------------------------


def diversity_prune_impl(
    q: jax.Array,  # [B, D] target vectors (new node / repaired node)
    cand_ids: jax.Array,  # [B, C] candidate vector ids, -1 padded
    cand_dists: jax.Array,  # [B, C] distances to q, +inf for padded
    ctx: StoreCtx,
    *,
    m: int,
    metric: VecSimMetric,
    kind: str,
    alpha: float = 1.0,
    q_norm: jax.Array | None = None,
) -> jax.Array:
    """Select up to m diverse neighbors per row; returns ids [B, m] (-1 pad).

    Reference greedy rule (hnsw.h:725-779): scan candidates in ascending
    distance-to-q order; keep c unless some already-kept k has
    dist(c, k) < dist(c, q). ``alpha`` generalizes to the Vamana robust-prune
    rule (alpha * dist(c, k) <= dist(c, q) discards, DiskANN/SVS semantics;
    alpha=1.0 == HNSW heuristic-2).

    Implementation: the scan runs over the best 8m candidates (the greedy
    keep set saturates long before that; the reference's candidate pool is
    similarly bounded by efConstruction). Candidate-candidate distances are
    computed ONCE as a batched [B, c_eff, c_eff] matmul on the MXU; the
    greedy keep scan is then pure [B, c_eff]-wide boolean dynamics — no
    per-step vector gathers or kept-vector buffer rewrites (which made the
    scan HBM-traffic-bound at construction batch sizes).
    """
    B, C = cand_ids.shape
    c_eff = min(C, max(8 * m, 64))
    order = jnp.argsort(cand_dists, axis=1)[:, :c_eff]
    s_ids = jnp.take_along_axis(cand_ids, order, axis=1)
    s_d = jnp.take_along_axis(cand_dists, order, axis=1)
    valid = (s_ids >= 0) & jnp.isfinite(s_d)
    safe = jnp.where(valid, s_ids, 0)
    metric_v = VecSimMetric(metric)

    v = jnp.take(ctx.data, safe, axis=0)  # [B, c_eff, D]
    if kind in ("sq8", "sq4"):
        if kind == "sq4":
            from .quantize import unpack4

            v = unpack4(v)
        vmin = jnp.take(ctx.vmin, safe, axis=0)
        delta = jnp.take(ctx.delta, safe, axis=0)
        v = vmin[:, :, None] + delta[:, :, None] * v.astype(jnp.float32)
    else:
        v = v.astype(jnp.float32)
    if kind == "float" and ctx.nav is not None:
        # Caller distances may come from the bf16 nav shadow; recompute the
        # anchor->candidate leg exactly from the gathered fp32 rows so the
        # greedy compare below is precision-consistent with the fp32 pair
        # matrix (candidate ORDER keeps the caller's nav ranking — a
        # tie-break-level perturbation only).
        qf = q.astype(jnp.float32)
        ipq = jnp.einsum(
            "bd,bcd->bc", qf, v,
            preferred_element_type=jnp.float32,
            precision=float_precision(jnp.float32),
        )
        if VecSimMetric(metric) == VecSimMetric.L2:
            s_d = jnp.sum(qf * qf, axis=-1)[:, None] - 2.0 * ipq + jnp.sum(v * v, axis=-1)
        else:
            s_d = 1.0 - ipq
        s_d = jnp.where(valid, s_d, jnp.inf)
    ip = jnp.einsum(
        "bcd,bed->bce", v, v,
        preferred_element_type=jnp.float32,
        precision=float_precision(jnp.float32),
    )
    if metric_v == VecSimMetric.L2:
        aux = jnp.sum(v * v, axis=-1)  # [B, c_eff] |v|^2
        pd = aux[:, :, None] - 2.0 * ip + aux[:, None, :]
    elif kind == "int" and metric_v == VecSimMetric.Cosine:
        norms = jnp.take(ctx.norm, safe, axis=0)
        pd = 1.0 - ip / (norms[:, :, None] * norms[:, None, :])
    else:
        pd = 1.0 - ip

    def step(c, carry):
        kept, count = carry
        # candidate c vs already-kept candidates: row c of the pair matrix
        pd_c = jax.lax.dynamic_index_in_dim(pd, c, axis=1, keepdims=False)
        d_c = jax.lax.dynamic_index_in_dim(s_d, c, axis=1, keepdims=False)
        ok_c = jax.lax.dynamic_index_in_dim(valid, c, axis=1, keepdims=False)
        viol = jnp.any((alpha * pd_c < d_c[:, None]) & kept, axis=-1)
        take = ok_c & ~viol & (count < m)
        kept = jax.lax.dynamic_update_index_in_dim(kept, take, c, axis=1)
        return kept, count + take.astype(jnp.int32)

    init = (jnp.zeros((B, c_eff), dtype=bool), jnp.zeros((B,), jnp.int32))
    kept_flags, _ = jax.lax.fori_loop(0, c_eff, step, init)
    # Compact kept ids to the front, pad with -1.
    key = jnp.where(kept_flags, s_d, jnp.inf)
    sel = jnp.argsort(key, axis=1)[:, :m]
    out = jnp.take_along_axis(jnp.where(kept_flags, s_ids, -1), sel, axis=1)
    return out


diversity_prune = functools.partial(
    jax.jit, static_argnames=("m", "metric", "kind", "alpha")
)(diversity_prune_impl)
diversity_prune.__doc__ = "Jitted wrapper of diversity_prune_impl."


def diversity_prune_chunked(
    q, cand_ids, cand_dists, ctx, *, m, metric, kind, alpha=1.0, q_norm=None,
    q_meta=None, chunk=2048,
):
    """diversity_prune over many rows in fixed-size chunks.

    The prune materializes per-row candidate vectors ([rows, c_eff, D]) and
    the pair matrix ([rows, c_eff, c_eff]); at reverse-edge scale (rows =
    batch*M) those would be GBs, so the row axis is processed ``chunk``
    rows at a time with ``lax.map``, with ``chunk`` shrunk to a ~0.5 GB
    working set. Unjitted — meant to be inlined into fused construction
    programs.

    ``cand_dists=None`` computes the anchor→candidate distances INSIDE each
    chunk (``dists_to_ids``): the full [rows, C, D] gather behind a single
    up-front distance call is itself the dominant allocation at large-M
    reverse-edge scale (13.5 GB at batch 1024 x M0=128 x 768 bf16 — the
    round-3 1M M=64 OOM), so it must be chunked with everything else.
    ``q_meta`` carries the sq8 asymmetric-kernel metadata for that case.
    """
    B = q.shape[0]
    c_eff = min(cand_ids.shape[1], max(8 * m, 64))
    D = ctx.data.shape[-1]
    # Working set per row: the prune's candidate vectors + pair matrix, and
    # (when computing distances here) the C-wide gather for dists_to_ids.
    C = cand_ids.shape[1] if cand_dists is None else 0
    per_row = 4 * c_eff * (2 * D + c_eff) + 2 * C * D
    chunk = max(min(chunk, (512 << 20) // max(per_row, 1)), 128)

    def full(qc, ci, cd, qnc, qmc):
        if cd is None:
            cd = dists_to_ids(
                qc, ci, ctx, metric=metric, kind=kind, q_norm=qnc, q_meta=qmc
            )
        return diversity_prune_impl(
            qc, ci, cd, ctx, m=m, metric=metric, kind=kind, alpha=alpha,
            q_norm=qnc,
        ), cd

    if B <= chunk:
        return full(q, cand_ids, cand_dists, q_norm, q_meta)[0]
    n_chunks = -(-B // chunk)
    pad = n_chunks * chunk - B
    qp = jnp.pad(q, ((0, pad), (0, 0)))
    cip = jnp.pad(cand_ids, ((0, pad), (0, 0)), constant_values=-1)
    cdp = (
        None if cand_dists is None
        else jnp.pad(cand_dists, ((0, pad), (0, 0)), constant_values=jnp.inf)
    )
    qn = None if q_norm is None else jnp.pad(q_norm, (0, pad), constant_values=1.0)
    qm = (
        None if q_meta is None
        else tuple(None if x is None else jnp.pad(x, (0, pad)) for x in q_meta)
    )

    def one(args):
        qc, ci = args[0], args[1]
        rest = list(args[2:])
        cd = rest.pop(0) if cdp is not None else None
        qnc = rest.pop(0) if qn is not None else None
        qmc = (
            None if qm is None
            else tuple(rest.pop(0) if x is not None else None for x in qm)
        )
        return full(qc, ci, cd, qnc, qmc)[0]

    sh = lambda x: x.reshape(n_chunks, chunk, *x.shape[1:])
    args = (sh(qp), sh(cip))
    if cdp is not None:
        args += (sh(cdp),)
    if qn is not None:
        args += (sh(qn),)
    if qm is not None:
        args += tuple(sh(x) for x in qm if x is not None)
    out = jax.lax.map(one, args)
    return out.reshape(n_chunks * chunk, m)[:B]


@functools.partial(jax.jit, static_argnames=("metric", "kind"))
def dists_to_ids(
    q: jax.Array, ids: jax.Array, ctx: StoreCtx, *, metric, kind, q_norm=None, q_meta=None
) -> jax.Array:
    """Masked distances from q[b] to ids[b, :] (-1 -> +inf)."""
    valid = ids >= 0
    safe = jnp.where(valid, ids, 0)
    d = gathered_dists(q, safe, ctx, metric, kind, q_norm, q_meta)
    return jnp.where(valid, d, jnp.inf)


@functools.partial(jax.jit, static_argnames=("metric", "kind"))
def exact_rerank(
    q: jax.Array, ids: jax.Array, ctx: StoreCtx, *, metric, kind,
    q_norm=None, q_meta=None,
):
    """Re-score a result window exactly and re-sort by (distance, id).

    Query traversal may rank candidates with the bf16 nav shadow
    (``config.search_nav_bf16``); this recomputes the returned rows'
    distances against the exact store (nav stripped) and orders them
    lexicographically, so callers always observe exact fp32 scores — the
    reference reports the true distance for every result regardless of how
    the beam found it (hnsw.h:1980-1987). Padded slots (id -1, d=+inf) sort
    last. One [B, W] gather — negligible next to the search loop."""
    ctx = StoreCtx(
        data=ctx.data, sqnorm=ctx.sqnorm, norm=ctx.norm,
        vmin=ctx.vmin, delta=ctx.delta, nav=None,
    )
    d = dists_to_ids(q, ids, ctx, metric=metric, kind=kind,
                     q_norm=q_norm, q_meta=q_meta)
    # Sort key 2 (id ascending) breaks exact-distance ties deterministically
    # and pushes -1 padding behind real rows at +inf... -1 < any id, so map
    # padding to INT32_MAX for the sort, then back.
    sort_ids = jnp.where(ids >= 0, ids, jnp.int32(2**31 - 1))
    d2, i2 = jax.lax.sort((d, sort_ids), num_keys=2)
    return d2, jnp.where(i2 == 2**31 - 1, -1, i2)
