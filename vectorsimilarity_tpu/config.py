"""Runtime engine configuration.

``use_pallas``: "auto" enables the fused Pallas brute-force kernel on TPU
backends for float stores with small-k queries (its O(k) in-VMEM selection
beats the XLA streaming scan's HBM round-trips there); "always"/"never"
force it. The XLA path remains the reference implementation for every
(dtype, metric) lane.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# "auto": the fused Pallas kernel serves float stores on TPU backends; the
# XLA streaming path remains the reference engine (every dtype/metric lane)
# and the fallback for CPU, int/sq8 stores, and fp32 stores when exact-fp32
# ("highest") matmuls are requested (the kernel's top precision is bf16_3x,
# the same class as the XLA lane's HIGH).
use_pallas: str = "auto"  # "auto" | "always" | "never"

# fp32 matmul precision on the MXU: "highest" = exact fp32 (bf16_6x, six
# systolic passes); "high" = bf16_3x (~1e-5 relative error, 2x the
# throughput). bf16/fp16 inputs always take the native single-pass path.
# Read at trace time — set it before the first query of a process (jit
# caches trace-time values).
fp32_matmul_precision: str = "high"  # "highest" | "high"

# Device-resident HNSW construction (ops/graph_build.py): connect a whole
# insert batch in ONE jitted dispatch (upper descent, level-0 beam, pruning,
# reverse edges) instead of ~15 host round-trips per batch. False falls back
# to the host-orchestrated path (kept as the semantics reference).
graph_build_device: bool = True
build_batch: int = 1024  # max rows per connect_batch dispatch (pow2)
# Donate the graph state into each build_scan dispatch (links aliased
# in/out: -2.15 GB at 10M x 96 M=16, the fit margin on a 16 GB chip).
# Costs the retry-from-previous-state path on backend flakes, so it is
# opt-in for big builds rather than the default.
build_donate_state: bool = False
# Max rows one tiered insert-job execution migrates into the backend.
# Each migration batch holds the backend lock for one connect dispatch;
# coalescing the whole queue (the pre-round-5 behavior, up to build_batch)
# made that dispatch seconds long at serving scale and queries convoyed
# behind it (measured 2242 -> 77 QPS under async ingest at 200k). Smaller
# batches re-coalesce from the queue anyway — ingest throughput barely
# moves, worst-case query stall drops to one short dispatch.
tiered_migrate_batch: int = 256
# Batches fused per build_scan dispatch (bulk). Short programs on purpose:
# the relay-backed TPU worker kills sessions running multi-minute single
# XLA executions (1M builds crashed reproducibly in the second ~6-min
# 32-batch segment); 4-batch programs (~9 s at 1M x 768) are stable and
# measured rate-neutral (411 v/s either way, docs/benchmarks.md round 3).
build_scan_batches: int = 4
build_reverse_cap: int = 16  # new back-edges joining one row's re-prune
build_beam_expand: int = 4  # candidates popped per construction-beam iteration
# bf16 navigation shadow for fp32 stores: construction beams gather half the
# bytes (random row gathers are the build bottleneck). Candidate RANKING
# during construction uses the shadow (~1e-3 perturbation of near-ties); the
# diversity-prune keep/discard compare recomputes its anchor leg in fp32
# from the gathered rows (precision-consistent with the fp32 pair matrix),
# and query scoring is always exact.
build_nav_bf16: bool = True

# Query-side beam expansion: candidates popped per search-beam iteration.
# E>1 runs fewer while-loop iterations but does E x the gather+merge work
# per iteration; whether that nets out depends on ef (measured at 1M x 768,
# batch 1024, docs/benchmarks.md: ef10 6109 -> 3968 QPS for E=4 — a loss;
# ef500 562 -> 655 — a win; crossover ~ef 150-200). Every secondary pop
# still requires cur_d <= the current result-window worst
# (beam_search_impl), so E>1 only broadens exploration — recall at equal ef
# measures >= the E=1 step-for-step searchLayer stepping.
# "auto" (default) picks 1 below `search_expand_auto_ef` and 4 at/above it;
# an int forces that expansion everywhere (1 = exact stepping parity).
search_beam_expand = "auto"
search_expand_auto_ef: int = 192


def resolve_search_expand(ef: int) -> int:
    """Per-query beam expansion for runtime ef (see search_beam_expand)."""
    e = search_beam_expand
    if e == "auto":
        return 4 if ef >= search_expand_auto_ef else 1
    return max(int(e), 1)


# Serving sub-batch for graph searches: the beam while_loop runs until
# EVERY query in a dispatch converges, so one big batch pays the slowest
# query's iteration count ("straggler coupling"). Measured at 1M x 768,
# M=16/efC=200, batch-1024 workload (docs/benchmarks.md): best dispatch
# size is 1024 at ef=10 (dispatch overhead dominates), 512 at ef=50, and
# 256 at ef >= 100 — where splitting buys +22-42% QPS (ef500: 652 -> 924).
# "auto" (default) applies that schedule; an int splits into chunks of
# that many queries (rounded down to a power of two so every chunk reuses
# one compiled shape) once ef >= search_sub_batch_min_ef; 0 disables.
# Chunks are dispatched before any result is read back, so sub-dispatches
# pipeline; per-query results are byte-identical (beam rows independent).
search_sub_batch = "auto"
search_sub_batch_min_ef: int = 64


def resolve_search_sub_batch(ef: int) -> int:
    """Sub-dispatch size for runtime ef (0 = no splitting)."""
    s = search_sub_batch
    if s == "auto":
        if ef < 32:
            return 0
        return 512 if ef < 100 else 256
    s = int(s)
    if s <= 0 or ef < search_sub_batch_min_ef:
        return 0
    return 1 << (s.bit_length() - 1)



# bf16 navigation shadow for QUERY beams (fp32 stores): traversal ranking
# gathers half the bytes; the returned window is re-scored exactly in fp32
# (``graph_search.exact_rerank`` — one [B, ef] gather + lex re-sort), so
# reported distances, tie order, and the range-query radius filter stay
# exact. Ranking perturbation is the same ~1e-3 near-tie class as
# construction's shadow (crosschecked recall-neutral, docs/benchmarks.md).
search_nav_bf16: bool = True

# Beam-search iteration budget: max_iters = factor * ef + base. This is the
# in-kernel analog of the reference's timeout polling — it bounds worst-case
# latency of a single jitted search; raising it trades tail latency for
# completeness on adversarial graphs.
beam_iter_factor: int = 8
beam_iter_base: int = 64
# Timeout-aware queries run as bounded device segments with the user's
# timeout callback polled between dispatches (the in-flight analog of the
# reference's per-hop VECSIM_TIMEOUT): rows per BF scan segment / beam
# iterations per HNSW search segment.
timeout_poll_rows: int = 1 << 18
timeout_poll_iters: int = 32
pallas_tile_n: int = 4096
# "auto" hands k > pallas_max_k to the LOCAL-TOP-C Pallas path
# (``pallas_topk_bigk``): the single-buffer kernel's O(k) in-VMEM merge is
# slower than XLA's sort-based selection past ~128 (measured 2.6 s vs 1.8 s
# per 1024 x 1M batch at k=512); "always" still forces the multipass
# single-buffer kernel for k > pallas_max_k.
pallas_max_k: int = 128
# Strided group count for the kernel's compact selection view: the k-pop
# merge runs over [B, group_n] instead of [B, tile_n], with an exact
# in-kernel census + full-width repair for the rare group collision.
# Smaller = cheaper pops but more repairs on early tiles.
pallas_group_n: int = 512
# Group-min engine (``pallas_topk_gm``): for k <= pallas_gm_max_k the
# kernel emits per-tile strided group minima ONLY (no in-kernel selection
# state at all — the matmul-bound design) and the XLA side rescores the
# k+slack suspect groups' membership exactly. Preferred over the
# single-buffer kernel wherever it applies.
pallas_gm_max_k: int = 32
pallas_gm_group_n: int = 256
pallas_gm_slack: int = 8
# Per-tile survivor count for the big-k path; exactness is verified by the
# kernel's truncation flag (fallback to streaming on the ~never case).
pallas_local_c: int = 32
pallas_bigk_max: int = 2048


def _pallas_common(kind: str, capacity: int, dtype=None) -> bool:
    if use_pallas == "never":
        return False
    if kind == "int":
        # int8 rides the kernel's s8·s8→s32 MXU lane; uint8 rides the
        # "uint" lane (in-kernel shift + exact int32 correction, the
        # ops/distances._int_dot algebra).
        if dtype is None or jnp.dtype(dtype) not in (jnp.int8, jnp.uint8):
            return False
    elif kind != "float":
        return False
    if capacity % min(pallas_tile_n, capacity) != 0:
        return False
    if dtype is not None and jnp.dtype(dtype) == jnp.float32 and (
        fp32_matmul_precision == "highest"
    ):
        # The kernel's top in-MXU precision is bf16_3x (== XLA HIGH); exact
        # fp32 requests stay on the XLA path.
        return False
    return True


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


# Minimum query-batch rows for the fused kernels on real hardware. The
# group-compact kernel SIGABRTs the TPU compiler (jellyfish
# "limits[i] <= dim(i) (16 vs 1)" in LoweringEmitter::PrepareOutput) when
# lowered at B=128; B=1024 — the serving/headline shape every TPU number
# was measured at — compiles and runs. Until the small-B lowering is
# root-caused, sub-1024 batches ride the XLA streaming engine (exact, and
# those shapes are dispatch-latency-bound anyway). "always" overrides (the
# interpret-mode tests run every B).
pallas_min_batch: int = 1024


def pallas_enabled(kind: str, k: int, capacity: int, dtype=None,
                   batch=None, dim=None) -> bool:
    if not _pallas_common(kind, capacity, dtype):
        return False
    if use_pallas == "always":
        return True
    if k > pallas_max_k:
        return False
    if batch is not None and batch < pallas_min_batch:
        return False
    if dim is not None and dim % 128:
        # Non-lane-aligned rows make XLA relayout-COPY the whole store
        # into the kernel's padded tiling (1.33x of the data array in HBM
        # per dispatch at dim 96 — an 8 GB temp at 10M x 96). The
        # streaming engine handles these dims natively.
        return False
    return _on_tpu()


def pallas_gm_enabled(kind: str, k: int, capacity: int, dtype=None,
                      batch=None, dim=None) -> bool:
    """Gate for the group-min engine (k <= pallas_gm_max_k)."""
    if not _pallas_common(kind, capacity, dtype):
        return False
    if k > pallas_gm_max_k:
        return False
    tile = min(pallas_tile_n, capacity)
    n_groups = (capacity // tile) * min(pallas_gm_group_n, tile)
    if n_groups < k + pallas_gm_slack + 2:  # coverage bound needs 2 spare
        return False
    if use_pallas == "always":
        return True
    if batch is not None and batch < pallas_min_batch:
        return False
    if dim is not None and dim % 128:
        return False  # see pallas_enabled: relayout-copy of the store
    return _on_tpu()


def pallas_bigk_enabled(kind: str, k: int, capacity: int, dtype=None,
                        batch=None, dim=None) -> bool:
    """Gate for the per-tile local-top-c kernel (k in (max_k, bigk_max])."""
    if not _pallas_common(kind, capacity, dtype):
        return False
    if use_pallas == "always":
        return False  # "always" pins the single-buffer/multipass kernel
    if not (pallas_max_k < k <= pallas_bigk_max):
        return False
    if batch is not None and batch < pallas_min_batch:
        return False
    # Enough tiles of survivors to cover k without raising c per-call.
    n_tiles = max(capacity // pallas_tile_n, 1)
    if n_tiles * pallas_local_c < k:
        return False
    if dim is not None and dim % 128:
        return False  # see pallas_enabled: relayout-copy of the store
    return _on_tpu()
