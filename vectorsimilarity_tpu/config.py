"""Runtime engine configuration.

``use_pallas``: "auto" enables the fused Pallas brute-force kernel on TPU
backends for float stores with small-k queries (its O(k) in-VMEM selection
beats the XLA streaming scan's HBM round-trips there); "always"/"never"
force it. The XLA path remains the reference implementation for every
(dtype, metric) lane.
"""

from __future__ import annotations

import jax

# Default "never": the XLA streaming path is the production engine; the
# fused Pallas kernel is opt-in ("auto"/"always") pending more soak time on
# real hardware (it compiles and matches on-device, but remote-compile
# latency through the axon relay is unpredictable).
use_pallas: str = "never"  # "auto" | "always" | "never"

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
build_scan_batches: int = 64  # batches fused per build_scan dispatch (bulk)
build_reverse_cap: int = 16  # new back-edges joining one row's re-prune
build_beam_expand: int = 4  # candidates popped per construction-beam iteration
# bf16 navigation shadow for fp32 stores: construction beams gather half the
# bytes (random row gathers are the build bottleneck); exact fp32 rows still
# drive pruning anchors and query scoring.
build_nav_bf16: bool = True

# Beam-search iteration budget: max_iters = factor * ef + base. This is the
# in-kernel analog of the reference's timeout polling — it bounds worst-case
# latency of a single jitted search; raising it trades tail latency for
# completeness on adversarial graphs.
beam_iter_factor: int = 8
beam_iter_base: int = 64
pallas_tile_n: int = 8192
pallas_max_k: int = 128


def pallas_enabled(kind: str, k: int, capacity: int) -> bool:
    if use_pallas == "never":
        return False
    if kind != "float":
        return False
    if capacity % min(pallas_tile_n, capacity) != 0:
        return False
    if use_pallas == "always":
        return True
    if k > pallas_max_k:
        return False
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:  # pragma: no cover
        return False
