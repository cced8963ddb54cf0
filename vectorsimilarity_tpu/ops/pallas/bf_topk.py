"""Fused brute-force distance + top-k Pallas kernel.

The XLA path (``ops.distances.streaming_topk``) writes each [B, chunk] score
tile to HBM and reads it back for the top-k merge. This kernel fuses both:
the MXU computes one score tile in VMEM, and the running per-query top-k
buffer lives in VMEM scratch across the whole grid — HBM traffic is exactly
one read of the data matrix. This is the speed-of-light design for the
reference's headline benchmark (1M x 768 fp32, BF TopK,
``docs/benchmarks.md:60-63``).

Precision: Mosaic lowers an fp32 ``dot_general`` to a SINGLE bf16 MXU pass
(measured: identical results to an explicit bf16 cast), which is one
precision class below the XLA engine's HIGH (bf16_3x). The kernel therefore
does the bf16_3x decomposition explicitly for fp32 inputs:

    a·b ≈ hi(a)·hi(b) + hi(a)·lo(b) + lo(a)·hi(b),  hi = bf16(a),
                                                    lo = bf16(a - hi)

which matches the XLA lane's error (~1e-5 relative) at 3 bf16-rate passes.
bf16/fp16 stores take the native single-pass path (exact for bf16, same as
the XLA lane). int8 stores ride the s8·s8→s32 MXU lane with the same exact
integer algebra as ``ops.distances.scores_int`` (uint8 stays on XLA). fp32
with ``config.fp32_matmul_precision == "highest"`` is not supported
in-kernel — ``config.pallas_enabled`` gates it off.

Merge strategy: per grid step, candidates better than the current k-th best
are rare after the first few tiles; the kernel reduces the tile to strided
GROUP minima first (G groups, a few fixed VPU passes) and only runs the
O(k) selection over the compact [B, G] group view when the tile actually
improves the top-k (threshold skip). Selection over the group view is exact
unless one group hides a second entry that belongs in the top-k; the kernel
detects that case EXACTLY (a lexicographic census of the tile against the
new k-th best must match the number of pops taken from the tile) and
repairs in-kernel with a full-width merge. At batch 1024 some query
improves on essentially every tile, so moving the pop loop from [B, tile_n]
to [B, G] is what makes the cheap-dtype (bf16/int8/uint8) lanes
matmul-bound instead of selection-bound.

k > 128 (the reference's BF k=500 config) runs as ⌈k/128⌉ passes over the
data: each pass excludes everything lexicographically <= the previous pass's
last (distance, id) via a per-query lower bound — exact because selection
order within a pass is lexicographic by (distance, id).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...types import VecSimMetric

PASS_K = 128  # max k per kernel pass (selection buffer width)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tile_scores(metric, mode, tile_n, q_ref, qaux_ref, data_ref, sqn_ref):
    """One distance tile [B, tile_n] in fp32, shared by both kernels.

    ``qaux`` carries the per-query auxiliary: fp32 query sqnorms (float
    L2), exact integer query sqnorms held in f32 (int L2), or stored query
    norms (int Cosine). ``sqn`` carries per-row sqnorms (float L2) or
    stored row norms (int Cosine); int L2 computes row sqnorms in-kernel
    from the tile already in VMEM (free VPU work, saves an HBM stream).

    fp32 stores: BOTH bf16 hi/lo splits happen IN-KERNEL — computing the
    lo plane as an XLA op outside the custom call is silently destroyed by
    --xla_allow_excess_precision (the f32->bf16->f32 round-trip folds
    away, zeroing the correction), which demotes the whole product to
    one-pass bf16 — measured 2.2e-4 error vs the correct 9e-7.

    int8 stores: scores follow ``ops.distances.scores_int`` exactly —
    s8·s8→s32 MXU dot, integer L2 algebra in int32, ONE cast to f32 at
    the end (the reference's exact integer arithmetic,
    ``spaces/IP/IP.cpp:258-287``).
    """
    dims = (((1,), (1,)), ((), ()))
    if mode == "uint":
        # uint8 rows, shifted into s8 range in-VMEM so the dot rides the
        # MXU s8·s8→s32 path, then corrected exactly in int32 — the same
        # algebra as ``ops.distances._int_dot``:
        #   q·d = (q-128)·(d-128) + 128·Σ(q-128) + 128·Σ(d-128) + 128²·D
        # (queries arrive pre-shifted as int8; row shifts happen here on
        # the tile already in VMEM). L2 needs no correction at all:
        # (q-d) == (qs-ds). Matches spaces/functions/ uint8 kernels
        # (reference: exact integer accumulate, one float cast at the end).
        D = q_ref.shape[1]
        ds = (data_ref[:].astype(jnp.int16) - 128).astype(jnp.int8)
        ip = jax.lax.dot_general(
            q_ref[:], ds, dims, preferred_element_type=jnp.int32
        )
        if metric == VecSimMetric.L2:
            di = ds.astype(jnp.int32)
            dsq = jnp.sum(di * di, axis=1).reshape(1, tile_n)
            qsq = qaux_ref[:, 0:1].astype(jnp.int32)
            return (qsq - 2 * ip + dsq).astype(jnp.float32)
        dsum = jnp.sum(ds.astype(jnp.int32), axis=1).reshape(1, tile_n)
        qsum = qaux_ref[:, 0:1].astype(jnp.int32)
        dot = ip + 128 * qsum + 128 * dsum + (128 * 128) * D
        if metric == VecSimMetric.Cosine:
            return 1.0 - dot.astype(jnp.float32) / (
                qaux_ref[:, 1:2] * sqn_ref[:].reshape(1, tile_n)
            )
        return 1.0 - dot.astype(jnp.float32)
    if mode == "int":
        ip = jax.lax.dot_general(
            q_ref[:], data_ref[:], dims, preferred_element_type=jnp.int32
        )
        if metric == VecSimMetric.L2:
            di = data_ref[:].astype(jnp.int32)
            dsq = jnp.sum(di * di, axis=1).reshape(1, tile_n)
            return (qaux_ref[:].astype(jnp.int32) - 2 * ip + dsq).astype(
                jnp.float32
            )
        if metric == VecSimMetric.Cosine:
            return 1.0 - ip.astype(jnp.float32) / (
                qaux_ref[:] * sqn_ref[:].reshape(1, tile_n)
            )
        return 1.0 - ip.astype(jnp.float32)
    if mode == "bf16_3x":
        qf = q_ref[:]
        q_hi = qf.astype(jnp.bfloat16)
        q_lo = (qf - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dat = data_ref[:]
        d_hi = dat.astype(jnp.bfloat16)
        d_lo = (dat - d_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        ip = jax.lax.dot_general(q_hi, d_hi, dims, preferred_element_type=jnp.float32)
        ip += jax.lax.dot_general(q_hi, d_lo, dims, preferred_element_type=jnp.float32)
        ip += jax.lax.dot_general(q_lo, d_hi, dims, preferred_element_type=jnp.float32)
    else:
        ip = jax.lax.dot_general(
            q_ref[:], data_ref[:], dims, preferred_element_type=jnp.float32
        )
    if metric == VecSimMetric.L2:
        return qaux_ref[:] - 2.0 * ip + sqn_ref[:].reshape(1, tile_n)
    return 1.0 - ip


def _pop_merge(k, B, gids, cand_s, cand_i, best_d_val, best_i_val, count_tile):
    """Lexicographic k-pop merge of (best ∪ candidates).

    Pops the (distance, id) minimum of the union k times with knockout.
    ``cand_s``/``cand_i`` is [B, W] — the full tile (exact merge) or the
    compact group-min view (fast merge). When ``count_tile`` is True also
    returns how many finite pops came from the candidate side (the exact
    verification census for the fast path).

    The EXPLICIT id tie-break matters: the multipass k>128 chain excludes
    by (lo_d, lo_i), so equal distances crossing a pass boundary must be
    ordered by id or an id can repeat/vanish across passes (observed
    on-device with bf16_3x ties at 1M).
    """
    new_d = jnp.zeros((B, k), dtype=jnp.float32)
    new_i = jnp.zeros((B, k), dtype=jnp.int32)
    t_cnt = jnp.zeros((B,), dtype=jnp.int32)
    BIG = jnp.int32(2**31 - 1)
    colk = jax.lax.broadcasted_iota(jnp.int32, (B, k), 1)

    def step(t, carry):
        cur_s, cur_best_d, cur_best_i, new_d, new_i, t_cnt = carry
        bmin = jnp.min(cur_best_d, axis=1)
        smin = jnp.min(cur_s, axis=1)
        # Lowest id among the row minima of each side.
        bid = jnp.min(
            jnp.where(cur_best_d == bmin[:, None], cur_best_i, BIG), axis=1
        )
        sid = jnp.min(jnp.where(cur_s == smin[:, None], cand_i, BIG), axis=1)
        take_b = (bmin < smin) | ((bmin == smin) & (bid <= sid))
        val = jnp.where(take_b, bmin, smin)
        idx = jnp.where(take_b, bid, sid)
        # One-hot write (scatter is not lowerable in Mosaic).
        write = colk == t
        new_d = jnp.where(write, val[:, None], new_d)
        new_i = jnp.where(write, idx[:, None], new_i)
        # Knock out the consumed entry (unique by (value, id)).
        maskb = (cur_best_d == bmin[:, None]) & (cur_best_i == bid[:, None])
        masks = (cur_s == smin[:, None]) & (cand_i == sid[:, None])
        cur_best_d = jnp.where(take_b[:, None] & maskb, jnp.inf, cur_best_d)
        cur_s = jnp.where((~take_b)[:, None] & masks, jnp.inf, cur_s)
        if count_tile:
            t_cnt = t_cnt + jnp.where(~take_b & (val < jnp.inf), 1, 0)
        return cur_s, cur_best_d, cur_best_i, new_d, new_i, t_cnt

    _, _, _, new_d, new_i, t_cnt = jax.lax.fori_loop(
        0, k, step, (cand_s, best_d_val, best_i_val, new_d, new_i, t_cnt)
    )
    return new_d, new_i, t_cnt


def _make_kernel(
    metric: VecSimMetric,
    k: int,
    tile_n: int,
    n_tiles: int,
    with_sqnorm: bool,
    mode: str,  # "bf16_3x" (fp32) | "native" (bf16/fp16) | "int" | "uint"
    group_n: int,
    with_lex: bool,  # multipass (k>128) lower-bound chain active
):
    metric = VecSimMetric(metric)
    G = min(group_n, tile_n)
    L = tile_n // G  # rows per strided group

    def kernel(count_ref, q_ref, qsq_ref, lo_d_ref, lo_i_ref, *rest):
        if with_sqnorm:
            data_ref, sqn_ref, outd_ref, outi_ref, best_d, best_i = rest
        else:
            data_ref, outd_ref, outi_ref, best_d, best_i = rest
            sqn_ref = None
        j = pl.program_id(0)
        B = q_ref.shape[0]

        @pl.when(j == 0)
        def _init():
            best_d[:] = jnp.full_like(best_d, jnp.inf)
            best_i[:] = jnp.full_like(best_i, -1)

        # Score tile [B, TILE_N] on the MXU (see _tile_scores for the
        # precision contract per mode).
        s = _tile_scores(metric, mode, tile_n, q_ref, qsq_ref, data_ref, sqn_ref)
        gids = j * tile_n + jax.lax.broadcasted_iota(jnp.int32, (B, tile_n), 1)
        # Mask dead rows and (for multi-pass k>128) everything lex <= the
        # previous pass's last (distance, id).
        keep = gids < count_ref[0]
        if with_lex:
            lo_d = lo_d_ref[:]  # [B, 1]
            lo_i = lo_i_ref[:]
            keep &= (s > lo_d) | ((s == lo_d) & (gids > lo_i))
        s = jnp.where(keep, s, jnp.inf)

        # Strided group-min view: group g holds columns {g, G+g, 2G+g, ...}
        # (static slices — no lane reshapes). A few fixed VPU passes reduce
        # the selection working set from [B, tile_n] to [B, G].
        gmin = s[:, :G]
        for l in range(1, L):
            gmin = jnp.minimum(gmin, s[:, l * G : (l + 1) * G])

        # Threshold skip: does any candidate beat the current k-th best?
        kth = best_d[:, k - 1].reshape(B, 1)
        improves = jnp.any(gmin < kth)

        @pl.when(improves)
        def _merge():
            # Group-min ids: slices scan lowest-id-first, so `<` keeps the
            # lower id on exact ties (lexicographic within each group).
            # The ids are built ARITHMETICALLY (base + l*G), value-identical
            # to slicing ``gids[:, l*G:(l+1)*G]`` — which Mosaic (libtpu
            # 2026-08) miscompiles with a fatal layout check
            # ("limits[i] <= dim(i) (128 vs. 1)"): lane-offset slices of an
            # int32 broadcasted_iota are the trigger; float slices of ``s``
            # are fine.
            base = j * tile_n + jax.lax.broadcasted_iota(jnp.int32, (B, G), 1)
            gid = base
            acc = s[:, :G]
            for l in range(1, L):
                sl = s[:, l * G : (l + 1) * G]
                upd = sl < acc
                gid = jnp.where(upd, base + l * G, gid)
                acc = jnp.minimum(acc, sl)

            cur_best_d = best_d[:]
            cur_best_i = best_i[:]
            # Fast merge over the compact group view: exact unless a group
            # hides a SECOND entry that belongs in the new top-k.
            new_d, new_i, t_cnt = _pop_merge(
                k, B, gids, gmin, gid, cur_best_d, cur_best_i, True
            )
            if L == 1:
                # Each group is one column — the fast merge IS exact.
                best_d[:] = new_d
                best_i[:] = new_i
            else:
                # Exact verification census: the number of tile entries
                # lexicographically <= the new k-th best must equal the
                # number of pops taken from the tile; a hidden group member
                # inflates the census. (Underfilled-best corner: pops can
                # emit (inf, real-id) from fully-masked groups — the census
                # then overcounts and the repair path runs, which is exact
                # by construction.)
                bd_k = new_d[:, k - 1].reshape(B, 1)
                bi_k = new_i[:, k - 1].reshape(B, 1)
                census = (s < bd_k) | ((s == bd_k) & (gids <= bi_k))
                n_census = jnp.sum(census.astype(jnp.int32), axis=1)
                ok = jnp.all(n_census == t_cnt)

                @pl.when(ok)
                def _commit():
                    best_d[:] = new_d
                    best_i[:] = new_i

                @pl.when(jnp.logical_not(ok))
                def _repair():
                    rd, ri, _ = _pop_merge(
                        k, B, gids, s, gids, cur_best_d, cur_best_i, False
                    )
                    best_d[:] = rd
                    best_i[:] = ri

        @pl.when(j == n_tiles - 1)
        def _flush():
            outd_ref[:] = best_d[:]
            outi_ref[:] = best_i[:]

    return kernel


def _mode_and_aux(queries, data, sqnorms, metric, query_norms):
    """(mode, qk, qaux, with_sqnorm, sqn, itemsize) for a kernel launch.

    int8 stores get the "int" lane (``sqnorms`` then carries the STORED
    fp32 norms for Cosine and is unused for L2/IP — L2 row sqnorms are
    computed in-kernel); uint8 stores get the "uint" lane (queries shifted
    into s8 range host-side, rows shifted in-kernel, exact int32
    correction — see ``_tile_scores``); float stores keep the
    bf16_3x/native split.
    """
    B = queries.shape[0]
    metric = VecSimMetric(metric)
    if data.dtype == jnp.uint8:
        qs8 = (queries.astype(jnp.int16) - 128).astype(jnp.int8)
        qs32 = queries.astype(jnp.int32) - 128
        if metric == VecSimMetric.L2:
            # Σ(q-128)² can exceed f32's exact-int range past dim 1024 —
            # carried as int32 (the kernel's cast is then a no-op).
            qaux = jnp.sum(qs32 * qs32, axis=1, keepdims=True)
            return "uint", qs8, qaux, False, None, 1
        qsum = jnp.sum(qs32, axis=1, keepdims=True).astype(jnp.float32)
        if metric == VecSimMetric.Cosine:
            assert query_norms is not None and sqnorms is not None, (
                "uint8 cosine needs stored and query norms"
            )
            qaux = jnp.concatenate(
                [qsum, query_norms.reshape(B, 1).astype(jnp.float32)], axis=1
            )
            return "uint", qs8, qaux, True, sqnorms.astype(jnp.float32), 1
        return "uint", qs8, qsum, False, None, 1
    if data.dtype == jnp.int8:
        qk = queries.astype(jnp.int8)
        if metric == VecSimMetric.L2:
            qi = queries.astype(jnp.int32)
            qaux = jnp.sum(qi * qi, axis=1, keepdims=True).astype(jnp.float32)
            return "int", qk, qaux, False, None, 1
        if metric == VecSimMetric.Cosine:
            assert query_norms is not None and sqnorms is not None, (
                "int8 cosine needs stored and query norms"
            )
            qaux = query_norms.reshape(B, 1).astype(jnp.float32)
            return "int", qk, qaux, True, sqnorms.astype(jnp.float32), 1
        return "int", qk, jnp.zeros((B, 1), jnp.float32), False, None, 1
    if data.dtype == jnp.float32:
        mode, qk, itemsize = "bf16_3x", queries.astype(jnp.float32), 4
    else:
        mode, qk, itemsize = "native", queries.astype(data.dtype), 2
    with_sqnorm = metric == VecSimMetric.L2
    qaux = (
        jnp.sum(queries.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        if with_sqnorm
        else jnp.zeros((B, 1), jnp.float32)
    )
    sqn = sqnorms.astype(jnp.float32) if with_sqnorm else None
    return mode, qk, qaux, with_sqnorm, sqn, itemsize


def _one_pass(
    queries, data, sqnorms, count, k, *, metric, tile_n, lo_d, lo_i, interpret,
    query_norms=None, group_n=512, with_lex=False,
):
    B, D = queries.shape
    N = data.shape[0]
    n_tiles = N // tile_n
    metric = VecSimMetric(metric)
    mode, qk, qsq, with_sqnorm, sqn, itemsize = _mode_and_aux(
        queries, data, sqnorms, metric, query_norms
    )
    kernel = _make_kernel(
        metric, k, tile_n, n_tiles, with_sqnorm, mode, group_n, with_lex
    )

    rep = lambda j: (0, 0)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # count
        pl.BlockSpec((B, D), rep, memory_space=pltpu.VMEM),  # q
        pl.BlockSpec((B, qsq.shape[1]), rep, memory_space=pltpu.VMEM),  # qaux
        pl.BlockSpec((B, 1), rep, memory_space=pltpu.VMEM),  # lower bound d
        pl.BlockSpec((B, 1), rep, memory_space=pltpu.VMEM),  # lower bound i
        pl.BlockSpec((tile_n, D), lambda j: (j, 0), memory_space=pltpu.VMEM),  # data
    ]
    args = [jnp.asarray([count], dtype=jnp.int32), qk, qsq, lo_d, lo_i, data]
    if with_sqnorm:
        in_specs.append(pl.BlockSpec((tile_n,), lambda j: (j,), memory_space=pltpu.VMEM))
        args.append(sqn)

    # VMEM allowance: Mosaic's live-range accounting runs well above the
    # naive sum of buffers (double-buffered operands + merge-loop copies);
    # measured need at (B=1024, tile=4096, D=768, bf16_3x) is < 100M on a
    # v5e (128M physical). The limit is an allowance, not an allocation, so
    # a generous flat value is safe for small shapes too.
    budget = 110 * 1024 * 1024

    out_d, out_i = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((B, k), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, k), rep, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, k), jnp.float32),
            jax.ShapeDtypeStruct((B, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, k), jnp.float32),
            pltpu.VMEM((B, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * N * (3 if mode == "bf16_3x" else 1),
            bytes_accessed=N * D * itemsize + B * k * 8,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=budget),
        interpret=interpret,
    )(*args)
    return out_d, out_i


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "tile_n", "interpret", "group_n")
)
def pallas_topk(
    queries: jax.Array,  # [B, D] f32/bf16/fp16/int8/uint8
    data: jax.Array,  # [N, D] store dtype, N % tile_n == 0
    sqnorms: jax.Array | None,  # [N] f32: sqnorms (float L2) / norms (int cos)
    count: jax.Array,  # live rows
    k: int,
    *,
    metric: VecSimMetric,
    tile_n: int = 4096,
    interpret: bool = False,
    query_norms: jax.Array | None = None,  # [B] f32, int/uint cosine only
    group_n: int = 512,
):
    """Exact top-k (smallest distances) with fused scan. Returns
    (dists [B, k], ids [B, k]) sorted ascending; k > 128 runs ⌈k/128⌉
    lexicographically-chained passes."""
    B = queries.shape[0]
    N = data.shape[0]
    assert N % tile_n == 0, f"N={N} must be padded to tile_n={tile_n}"

    n_passes = -(-k // PASS_K)
    pass_k = k if n_passes == 1 else PASS_K
    lo_d = jnp.full((B, 1), -jnp.inf, dtype=jnp.float32)
    lo_i = jnp.full((B, 1), -1, dtype=jnp.int32)
    parts_d, parts_i = [], []
    for _ in range(n_passes):
        pd, pi = _one_pass(
            queries, data, sqnorms, count, pass_k,
            metric=metric, tile_n=tile_n, lo_d=lo_d, lo_i=lo_i,
            interpret=interpret, query_norms=query_norms,
            group_n=group_n, with_lex=n_passes > 1,
        )
        parts_d.append(pd)
        parts_i.append(pi)
        if n_passes > 1:
            lo_d = pd[:, -1:]
            lo_i = pi[:, -1:]
    out_d = parts_d[0] if n_passes == 1 else jnp.concatenate(parts_d, axis=1)[:, :k]
    out_i = parts_i[0] if n_passes == 1 else jnp.concatenate(parts_i, axis=1)[:, :k]
    out_i = jnp.where(jnp.isfinite(out_d), out_i, -1)
    return out_d, out_i


# ---------------------------------------------------------------------------
# Group-min engine (default for k <= config.pallas_gm_max_k): the kernel
# keeps NO selection state at all
# ---------------------------------------------------------------------------
#
# The single-buffer kernel above pays an O(k) in-VMEM pop merge whenever ANY
# query in the batch improves — at batch 1024 that is every tile — so the
# cheap-dtype (bf16/int8/uint8) lanes gain only ~1.3x over fp32 despite
# 3-6x cheaper matmuls. This engine moves ALL selection out of the kernel:
# each tile emits its strided GROUP minima only (one fused masked min chain
# after the matmul — no pops, no census, no scratch), and the XLA side
# (a) picks the k+slack smallest group minima with the cheap grouped-argmin
# selector (``distances._lex_topk`` — NOT ``lax.top_k``, whose sort-based
# TPU lowering costs ~90 ms per [1024, 64k] tile), (b) gathers those
# suspect groups' full membership (L rows each, a few hundred rows per
# query) and rescores them with the SAME ``scores_float``/``scores_int``
# code as the XLA streaming engine, and (c) lex-sorts that tiny set.
#
# Exactness: any true top-k entry lives in a group whose min is <= the true
# k-th distance, so it is missed only if its group ranks below the k+slack
# suspects — i.e. only if the rescored k-th best ``d_k`` reaches the first
# UNSELECTED group min ``m_next``. The returned per-query flag is exactly
# that test (with a small epsilon guard for the float lanes, where the
# kernel's bf16_3x/native accumulation order may differ from the rescore's
# by ~1e-7 relative; the integer lanes are bit-exact and need no guard).
# Flagged queries fall back to the streaming engine. Coverage implies the
# result IS the XLA engine's answer: distances come from the same scoring
# code, and the final lex sort enforces the same (distance, id) tie order.


def _make_gm_kernel(metric, tile_n, with_sqnorm, mode, G):
    metric = VecSimMetric(metric)
    L = tile_n // G

    def kernel(count_ref, q_ref, qsq_ref, *rest):
        if with_sqnorm:
            data_ref, sqn_ref, out_ref = rest
        else:
            data_ref, out_ref = rest
            sqn_ref = None
        j = pl.program_id(0)
        B = q_ref.shape[0]
        s = _tile_scores(metric, mode, tile_n, q_ref, qsq_ref, data_ref, sqn_ref)
        gids = j * tile_n + jax.lax.broadcasted_iota(jnp.int32, (B, tile_n), 1)
        s = jnp.where(gids < count_ref[0], s, jnp.inf)
        gmin = s[:, :G]
        for l in range(1, L):
            gmin = jnp.minimum(gmin, s[:, l * G : (l + 1) * G])
        out_ref[:] = gmin

    return kernel


def _rescore_members(queries, rows, metric, mode, sqn_rows, qn):
    """Exact per-query member rescore, vmapped over the batch.

    ``rows`` is [B, C, D] gathered candidates; reuses the XLA engine's own
    scoring functions so coverage implies bit-identical distances to the
    streaming path."""
    from ..distances import scores_float, scores_int

    if mode in ("int", "uint"):
        if metric == VecSimMetric.Cosine:
            return jax.vmap(
                lambda qb, rb, nb, qnb: scores_int(
                    qb[None], rb, metric, data_norms=nb, query_norms=qnb[None]
                )[0]
            )(queries, rows, sqn_rows, qn)
        return jax.vmap(
            lambda qb, rb: scores_int(qb[None], rb, metric)[0]
        )(queries, rows)
    if metric == VecSimMetric.L2:
        return jax.vmap(
            lambda qb, rb, sb: scores_float(qb[None], rb, metric, data_sqnorms=sb)[0]
        )(queries, rows, sqn_rows)
    return jax.vmap(
        lambda qb, rb: scores_float(qb[None], rb, metric)[0]
    )(queries, rows)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "tile_n", "group_n", "slack", "interpret"),
)
def pallas_topk_gm(
    queries: jax.Array,
    data: jax.Array,
    sqnorms: jax.Array | None,  # [N] f32: sqnorms (float L2) / norms (int cos)
    count: jax.Array,
    k: int,
    *,
    metric: VecSimMetric,
    tile_n: int = 4096,
    group_n: int = 256,
    slack: int = 8,
    interpret: bool = False,
    query_norms: jax.Array | None = None,  # [B] f32, int/uint cosine only
):
    """Exact top-k via per-tile group minima + XLA suspect rescue.

    Returns (dists [B, k], ids [B, k], uncovered [B] bool). ``uncovered``
    True means the k-th rescored distance reached the first unselected
    group's min — the suspect set may not cover the true top-k and the
    caller must fall back to an exact path for that batch. Requires
    ``n_tiles * G >= k + slack + 2`` (gate via ``config.pallas_gm_enabled``).
    """
    B, D = queries.shape
    N = data.shape[0]
    metric = VecSimMetric(metric)
    assert N % tile_n == 0, f"N={N} must be padded to tile_n={tile_n}"
    n_tiles = N // tile_n
    G = min(group_n, tile_n)
    L = tile_n // G
    T = n_tiles * G
    S = min(k + slack, T - 2)
    assert S >= k, f"too few groups (T={T}) for k={k}: gate this shape off"
    mode, qk, qsq, with_sqnorm, sqn, itemsize = _mode_and_aux(
        queries, data, sqnorms, metric, query_norms
    )
    kernel = _make_gm_kernel(metric, tile_n, with_sqnorm, mode, G)

    rep = lambda j: (0, 0)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # count
        pl.BlockSpec((B, D), rep, memory_space=pltpu.VMEM),  # q
        pl.BlockSpec((B, qsq.shape[1]), rep, memory_space=pltpu.VMEM),  # qaux
        pl.BlockSpec((tile_n, D), lambda j: (j, 0), memory_space=pltpu.VMEM),  # data
    ]
    args = [jnp.asarray([count], dtype=jnp.int32), qk, qsq, data]
    if with_sqnorm:
        in_specs.append(pl.BlockSpec((tile_n,), lambda j: (j,), memory_space=pltpu.VMEM))
        args.append(sqn)

    gm = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, G), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * N * (3 if mode == "bf16_3x" else 1),
            bytes_accessed=N * D * itemsize + B * T * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*args)

    from ..distances import _lex_topk

    gvals, gpos = _lex_topk(gm, S + 1)  # [B, S+1] smallest group minima
    m_next = gvals[:, S]  # first UNSELECTED group's min (coverage bound)
    sus = gpos[:, :S]  # flat group index t = tile*G + g
    # Member row ids of suspect groups: strided group g of tile j holds
    # columns {g, G+g, ..., (L-1)G+g}, i.e. rows j*tile_n + g + l*G.
    tile_of = sus // G
    g_of = sus % G
    mem = (
        tile_of[:, :, None] * tile_n
        + g_of[:, :, None]
        + jnp.arange(L, dtype=jnp.int32)[None, None, :] * G
    ).reshape(B, S * L)
    # Global-id candidate order: lex ties must break by id, but the natural
    # order here is suspect-rank-major. Sort columns by id per row first so
    # _lex_topk's lowest-position tie rule becomes lowest-id.
    order = jnp.argsort(mem, axis=1)
    mem = jnp.take_along_axis(mem, order, axis=1)
    live = mem < count
    rows = data[mem]  # [B, S*L, D] gather
    sqn_rows = None if sqn is None else sqn[mem]
    # Rescore with the ORIGINAL queries (scores_int handles the uint8
    # shift itself — same algebra as the streaming engine).
    d = _rescore_members(queries, rows, metric, mode, sqn_rows, query_norms)
    d = jnp.where(live, d.astype(jnp.float32), jnp.inf)
    vals, pos = _lex_topk(d, k)
    out_i = jnp.take_along_axis(mem, pos, axis=1)
    out_i = jnp.where(jnp.isfinite(vals), out_i, -1)
    # Coverage flag: the k-th best must beat every unselected group's min.
    # Float lanes guard the kernel-vs-rescore accumulation-order skew; the
    # integer lanes are exact.
    if mode in ("int", "uint"):
        eps = jnp.float32(0.0)
    else:
        eps = 1e-5 * jnp.maximum(
            jnp.float32(1.0), jnp.maximum(jnp.abs(vals[:, k - 1]), jnp.abs(m_next))
        )
    uncovered = ~(vals[:, k - 1] < m_next - eps)
    # All-covered corner: if every live row fit in the suspect set and k
    # exceeds the live candidates, unfilled slots are (inf, -1) — complete
    # iff every group was inspected, which the same flag test handles
    # (m_next == inf when T <= S+1 cannot happen: S <= T-2).
    return vals, out_i, uncovered


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "kind", "tile_n", "group_n", "slack", "chunk",
        "interpret",
    ),
)
def pallas_topk_gm_exact(
    queries,
    data,
    sqnorms,
    count,
    k: int,
    *,
    metric: VecSimMetric,
    kind: str,
    tile_n: int = 4096,
    group_n: int = 256,
    slack: int = 8,
    chunk: int = 1 << 16,
    interpret: bool = False,
    query_norms=None,
):
    """Group-min engine with the exactness fallback fused IN-PROGRAM.

    The separate ``uncovered`` flag forces a device->host sync per dispatch
    (``bool(jnp.any(unc))``), which serializes pipelined serving batches —
    measured 13.3k vs 21.5k QPS at the 1M x 768 headline. Here the ~never
    fallback is a ``lax.cond`` branch running the exact XLA streaming scan
    on device, so callers can pipeline dispatches without reading anything
    back between them. Unconditionally exact.
    """
    from ..distances import streaming_topk

    bd, bi, unc = pallas_topk_gm(
        queries, data, sqnorms, count, k,
        metric=metric, tile_n=tile_n, group_n=group_n, slack=slack,
        interpret=interpret, query_norms=query_norms,
    )

    def fallback(_):
        return streaming_topk(
            queries, (data, sqnorms), count, k,
            metric=VecSimMetric(metric), kind=kind, chunk=chunk,
            query_norms=query_norms,
        )

    return jax.lax.cond(jnp.any(unc), fallback, lambda _: (bd, bi), None)


# ---------------------------------------------------------------------------
# Large k (the reference's BF k=500 config): per-tile local top-c
# ---------------------------------------------------------------------------
#
# The k-wide in-VMEM merge is O(k) sequential pops per improving tile, and
# at k ~ 500 essentially EVERY tile improves, so both the single-buffer and
# the multipass designs drown in selection (measured 2.6 s vs XLA's 1.8 s
# per 1024 x 1M batch at k=512, config.py:59-63). This path keeps NO global
# state in the kernel at all: each tile emits its local top-c (c ~ 32, a
# cheap fixed pop loop), and one small XLA ``top_k`` over the
# [B, n_tiles*c] survivors produces the final answer. Exact whenever no
# single tile contributes more than c entries to the true top-k — with
# random row order the expected per-tile share is k*tile_n/N (~2 at the
# reference shape), so c=32 is astronomically safe; the returned
# ``truncated`` flag detects the failure case EXACTLY (a tile's c-th best
# beating the global k-th means that tile may hide more) and the caller
# falls back to the streaming path for that batch.


def _make_tile_topc_kernel(metric, c, tile_n, with_sqnorm, mode):
    metric = VecSimMetric(metric)

    def kernel(count_ref, q_ref, qsq_ref, *rest):
        if with_sqnorm:
            data_ref, sqn_ref, outd_ref, outi_ref = rest
        else:
            data_ref, outd_ref, outi_ref = rest
            sqn_ref = None
        j = pl.program_id(0)
        B = q_ref.shape[0]

        s = _tile_scores(metric, mode, tile_n, q_ref, qsq_ref, data_ref, sqn_ref)
        gids = j * tile_n + jax.lax.broadcasted_iota(jnp.int32, (B, tile_n), 1)
        s = jnp.where(gids < count_ref[0], s, jnp.inf)

        BIG = jnp.int32(2**31 - 1)
        new_d = jnp.zeros((B, c), dtype=jnp.float32)
        new_i = jnp.zeros((B, c), dtype=jnp.int32)
        colc = jax.lax.broadcasted_iota(jnp.int32, (B, c), 1)

        def step(t, carry):
            cur, new_d, new_i = carry
            smin = jnp.min(cur, axis=1)
            sid = jnp.min(jnp.where(cur == smin[:, None], gids, BIG), axis=1)
            write = colc == t
            new_d = jnp.where(write, smin[:, None], new_d)
            new_i = jnp.where(write, sid[:, None], new_i)
            cur = jnp.where((cur == smin[:, None]) & (gids == sid[:, None]), jnp.inf, cur)
            return cur, new_d, new_i

        _, new_d, new_i = jax.lax.fori_loop(0, c, step, (s, new_d, new_i))
        outd_ref[:] = new_d[None, :, :]
        outi_ref[:] = new_i[None, :, :]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "tile_n", "local_c", "interpret")
)
def pallas_topk_bigk(
    queries: jax.Array,
    data: jax.Array,
    sqnorms: jax.Array | None,
    count: jax.Array,
    k: int,
    *,
    metric: VecSimMetric,
    tile_n: int = 4096,
    local_c: int = 32,
    interpret: bool = False,
    query_norms: jax.Array | None = None,  # [B] f32, int8 cosine only
):
    """Top-k for large k via per-tile local top-c + one XLA merge.

    Returns (dists [B, k], ids [B, k], truncated [B] bool). ``truncated``
    True means a tile filled all ``local_c`` slots inside the global top-k
    and may be hiding more — the caller must fall back to an exact path for
    those queries. Tie order (distance, then lower id) matches
    ``pallas_topk``: pops emit lexicographically within a tile and flat
    positions across tiles are id-ordered.
    """
    B, D = queries.shape
    N = data.shape[0]
    assert N % tile_n == 0, f"N={N} must be padded to tile_n={tile_n}"
    n_tiles = N // tile_n
    c = min(local_c, tile_n)
    assert n_tiles * c >= k, "raise local_c: not enough survivors for k"
    metric = VecSimMetric(metric)
    mode, qk, qsq, with_sqnorm, sqn, itemsize = _mode_and_aux(
        queries, data, sqnorms, metric, query_norms
    )
    kernel = _make_tile_topc_kernel(metric, c, tile_n, with_sqnorm, mode)

    rep = lambda j: (0, 0)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # count
        pl.BlockSpec((B, D), rep, memory_space=pltpu.VMEM),  # q
        pl.BlockSpec((B, qsq.shape[1]), rep, memory_space=pltpu.VMEM),  # qaux
        pl.BlockSpec((tile_n, D), lambda j: (j, 0), memory_space=pltpu.VMEM),  # data
    ]
    args = [jnp.asarray([count], dtype=jnp.int32), qk, qsq, data]
    if with_sqnorm:
        in_specs.append(pl.BlockSpec((tile_n,), lambda j: (j,), memory_space=pltpu.VMEM))
        args.append(sqn)

    local_d, local_i = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        # Tile-major output: Mosaic requires the block's last two dims to
        # tile cleanly (divisible by 8/128 or equal to the array dims), so
        # each grid step owns a full [1, B, c] leading-axis slab.
        out_specs=(
            pl.BlockSpec((1, B, c), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, c), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, B, c), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, B, c), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * N * (3 if mode == "bf16_3x" else 1),
            bytes_accessed=N * D * itemsize + B * n_tiles * c * 8,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*args)

    local_d = jnp.swapaxes(local_d, 0, 1)  # [B, n_tiles, c]
    local_i = jnp.swapaxes(local_i, 0, 1)
    flat_d = local_d.reshape(B, n_tiles * c)
    flat_i = local_i.reshape(B, n_tiles * c)
    neg, pos = jax.lax.top_k(-flat_d, k)
    out_d = -neg
    out_i = jnp.take_along_axis(flat_i, pos, axis=1)
    out_i = jnp.where(jnp.isfinite(out_d), out_i, -1)
    kth = out_d[:, k - 1]
    worst = local_d[:, :, c - 1]  # each tile's c-th best
    truncated = jnp.any((worst <= kth[:, None]) & jnp.isfinite(worst), axis=1)
    return out_d, out_i, truncated


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "kind", "tile_n", "local_c", "chunk", "interpret"
    ),
)
def pallas_topk_bigk_exact(
    queries,
    data,
    sqnorms,
    count,
    k: int,
    *,
    metric: VecSimMetric,
    kind: str,
    tile_n: int = 4096,
    local_c: int = 32,
    chunk: int = 1 << 16,
    interpret: bool = False,
    query_norms=None,
):
    """Big-k engine with the truncation fallback fused in-program — same
    rationale as ``pallas_topk_gm_exact``: the separate flag costs a
    device->host sync per dispatch, the ``lax.cond`` branch costs nothing
    until the (astronomically rare) truncation actually fires."""
    from ..distances import streaming_topk

    bd, bi, trunc = pallas_topk_bigk(
        queries, data, sqnorms, count, k,
        metric=metric, tile_n=tile_n, local_c=local_c,
        interpret=interpret, query_norms=query_norms,
    )

    def fallback(_):
        return streaming_topk(
            queries, (data, sqnorms), count, k,
            metric=VecSimMetric(metric), kind=kind, chunk=chunk,
            query_norms=query_norms,
        )

    return jax.lax.cond(jnp.any(trunc), fallback, lambda _: (bd, bi), None)
