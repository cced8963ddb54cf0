"""Fused brute-force distance + top-k Pallas kernel.

The XLA path (``ops.distances.streaming_topk``) writes each [B, chunk] score
tile to HBM and reads it back for the top-k merge. This kernel fuses both:
the MXU computes one score tile in VMEM, and the running per-query top-k
buffer lives in VMEM scratch across the whole grid — HBM traffic is exactly
one read of the data matrix. This is the speed-of-light design for the
reference's headline benchmark (1M x 768 fp32, BF TopK,
``docs/benchmarks.md:60-63``).

Merge strategy: per grid step, candidates better than the current k-th best
are rare after the first few tiles; the kernel counts them first and only
runs the O(k) selection passes when the tile actually improves the top-k
(threshold skip), so the steady-state cost is one matmul + one compare per
tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...types import VecSimMetric


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(metric: VecSimMetric, k: int, tile_n: int, n_tiles: int, with_sqnorm: bool):
    metric = VecSimMetric(metric)

    def kernel(count_ref, q_ref, qsq_ref, *rest):
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

        # Scores for this tile: [B, TILE_N] on the MXU.
        ip = jax.lax.dot_general(
            q_ref[:],
            data_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if metric == VecSimMetric.L2:
            s = qsq_ref[:] - 2.0 * ip + sqn_ref[:].reshape(1, tile_n)
        else:
            s = 1.0 - ip
        gids = j * tile_n + jax.lax.broadcasted_iota(jnp.int32, (B, tile_n), 1)
        s = jnp.where(gids < count_ref[0], s, jnp.inf)

        # Threshold skip: does any candidate beat the current k-th best?
        kth = best_d[:, k - 1].reshape(B, 1)
        improves = jnp.any(s < kth)

        @pl.when(improves)
        def _merge():
            # O(k) selection: extract the global minimum of (best ∪ tile)
            # k times. Each pass is two VPU row-reductions.
            cur_s = s
            cur_best_d = best_d[:]
            cur_best_i = best_i[:]
            new_d = jnp.zeros((B, k), dtype=jnp.float32)
            new_i = jnp.zeros((B, k), dtype=jnp.int32)

            def step(t, carry):
                cur_s, cur_best_d, cur_best_i, new_d, new_i = carry
                bmin = jnp.min(cur_best_d, axis=1)
                bpos = jnp.argmin(cur_best_d, axis=1)
                smin = jnp.min(cur_s, axis=1)
                spos = jnp.argmin(cur_s, axis=1)
                take_b = bmin <= smin
                val = jnp.where(take_b, bmin, smin)
                # One-hot selection instead of gathers (Mosaic-friendly).
                rowsb = jax.lax.broadcasted_iota(jnp.int32, cur_best_d.shape, 1)
                maskb = rowsb == bpos[:, None]
                rowss = jax.lax.broadcasted_iota(jnp.int32, cur_s.shape, 1)
                masks = rowss == spos[:, None]
                bid = jnp.sum(jnp.where(maskb, cur_best_i, 0), axis=1)
                sid = jnp.sum(jnp.where(masks, gids, 0), axis=1)
                idx = jnp.where(take_b, bid, sid)
                # One-hot write (scatter is not lowerable in Mosaic).
                colk = jax.lax.broadcasted_iota(jnp.int32, (B, k), 1)
                write = colk == t
                new_d = jnp.where(write, val[:, None], new_d)
                new_i = jnp.where(write, idx[:, None], new_i)
                # Knock out the consumed entry.
                cur_best_d = jnp.where(take_b[:, None] & maskb, jnp.inf, cur_best_d)
                cur_s = jnp.where((~take_b)[:, None] & masks, jnp.inf, cur_s)
                return cur_s, cur_best_d, cur_best_i, new_d, new_i

            _, _, _, new_d, new_i = jax.lax.fori_loop(
                0, k, step, (cur_s, cur_best_d, cur_best_i, new_d, new_i)
            )
            best_d[:] = new_d
            best_i[:] = new_i

        @pl.when(j == n_tiles - 1)
        def _flush():
            outd_ref[:] = best_d[:]
            outi_ref[:] = best_i[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "metric", "tile_n", "interpret"))
def pallas_topk(
    queries: jax.Array,  # [B, D] f32/bf16
    data: jax.Array,  # [N, D] same dtype, N % tile_n == 0
    sqnorms: jax.Array | None,  # [N] f32 for L2, None otherwise
    count: jax.Array,  # live rows
    k: int,
    *,
    metric: VecSimMetric,
    tile_n: int = 2048,
    interpret: bool = False,
):
    """Exact top-k (smallest distances) with fused scan. Returns
    (dists [B, k], ids [B, k]) sorted ascending."""
    B, D = queries.shape
    N = data.shape[0]
    assert N % tile_n == 0, f"N={N} must be padded to tile_n={tile_n}"
    n_tiles = N // tile_n
    metric = VecSimMetric(metric)
    with_sqnorm = metric == VecSimMetric.L2

    qsq = (
        jnp.sum(queries.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        if with_sqnorm
        else jnp.zeros((B, 1), jnp.float32)
    )
    kernel = _make_kernel(metric, k, tile_n, n_tiles, with_sqnorm)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # count
        pl.BlockSpec((B, D), lambda j: (0, 0), memory_space=pltpu.VMEM),  # q
        pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),  # qsq
        pl.BlockSpec((tile_n, D), lambda j: (j, 0), memory_space=pltpu.VMEM),  # data
    ]
    args = [jnp.asarray([count], dtype=jnp.int32), queries, qsq, data]
    if with_sqnorm:
        in_specs.append(pl.BlockSpec((tile_n,), lambda j: (j,), memory_space=pltpu.VMEM))
        args.append(sqnorms.astype(jnp.float32))

    out_d, out_i = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((B, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
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
            flops=2 * B * D * N,
            bytes_accessed=N * D * data.dtype.itemsize + B * k * 8,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # Data tile (double-buffered) + score tile + selection carries
            # exceed the 16M default scoped-vmem budget at useful tile sizes.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    out_i = jnp.where(jnp.isfinite(out_d), out_i, -1)
    return out_d, out_i
