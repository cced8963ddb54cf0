#!/usr/bin/env python
"""Per-dtype fused-scan engine bench: group-min vs single-buffer vs XLA.

Measures the three BF engines per storage dtype at the headline shape
(1M x 768 cosine, k=10, batch 1024 by default) with PIPELINED dispatch
(back-to-back batches, forced once at the end): per-call timing through
the axon relay adds ~30 ms of round-trip latency per dispatch that does
not exist for a production host. Each engine is checked exact against the
XLA streaming engine on device before timing.

Usage:  python benchmarks/pallas_dtype_bench.py [--n 1000000] [--engines gm,pops,xla]
Emits one JSON line per (dtype, engine).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vectorsimilarity_tpu import config
from vectorsimilarity_tpu.ops.distances import streaming_topk
from vectorsimilarity_tpu.ops.pallas.bf_topk import pallas_topk, pallas_topk_gm
from vectorsimilarity_tpu.types import VecSimMetric


def make_data(dtype: str, n: int, dim: int, b: int):
    key = jax.random.PRNGKey(0)
    qk = jax.random.PRNGKey(1)
    if dtype in ("int8", "uint8"):
        lo, hi, jt = (0, 256, jnp.uint8) if dtype == "uint8" else (-127, 128, jnp.int8)
        data = jax.random.randint(key, (n, dim), lo, hi, dtype=jt)
        q = jax.random.randint(qk, (b, dim), lo, hi, dtype=jt)
        norms = jnp.sqrt(jnp.sum(data.astype(jnp.int32) ** 2, axis=1).astype(jnp.float32))
        qn = jnp.sqrt(jnp.sum(q.astype(jnp.int32) ** 2, axis=1).astype(jnp.float32))
        return q, data, norms, qn, "int"
    data = jax.random.normal(key, (n, dim), jnp.float32)
    data = data / jnp.linalg.norm(data, axis=1, keepdims=True)
    q = jax.random.normal(qk, (b, dim), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    if dtype == "bf16":
        data, q = data.astype(jnp.bfloat16), q.astype(jnp.bfloat16)
    return q, data, None, None, "float"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--dtypes", default="fp32,bf16,int8,uint8")
    ap.add_argument("--engines", default="gm,pops,xla")
    args = ap.parse_args()
    n, dim, k, B = args.n, args.dim, args.k, args.batch
    tile = config.pallas_tile_n
    cap = ((n + tile - 1) // tile) * tile
    dev = jax.devices()[0]
    print(f"# device {dev}", file=sys.stderr, flush=True)

    for dtype in args.dtypes.split(","):
        q, data, norms, qn, kind = make_data(dtype, cap, dim, B)
        _ = float(jnp.sum(data[:: max(cap // 16, 1), 0].astype(jnp.float32)))
        count = jnp.int32(n)
        store = (data, norms)

        def run_xla():
            return streaming_topk(q, store, count, k, metric=VecSimMetric.Cosine,
                                  kind=kind, chunk=1 << 18, query_norms=qn)[:2]

        def run_pops():
            return pallas_topk(q, data, norms, count, k,
                               metric=VecSimMetric.Cosine, tile_n=tile,
                               group_n=config.pallas_group_n, query_norms=qn)

        def run_gm():
            d, i, unc = pallas_topk_gm(q, data, norms, count, k,
                                       metric=VecSimMetric.Cosine, tile_n=tile,
                                       group_n=config.pallas_gm_group_n,
                                       slack=config.pallas_gm_slack,
                                       query_norms=qn)
            return d, i

        runners = {"xla": run_xla, "pops": run_pops, "gm": run_gm}
        # Exactness gate vs the streaming engine (ids up to fp near-ties).
        rd, ri = [np.asarray(x) for x in run_xla()]
        for name in args.engines.split(","):
            if name == "xla":
                pass
            else:
                ed, ei = [np.asarray(x) for x in runners[name]()]
                same = ei[:, :k] == ri[:, :k]
                bad = ~same & (np.abs(ed[:, :k] - rd[:, :k]) > 5e-4)
                assert not bad.any(), f"{dtype}/{name} mismatch vs XLA"
            fn = runners[name]
            out = fn()
            _ = float(np.asarray(out[0])[0, 0])  # warm
            rounds = []
            for _r in range(3):
                t0 = time.perf_counter()
                for _i in range(args.repeats):
                    out = fn()
                _ = np.asarray(out[0])[:, :1]
                t1 = time.perf_counter()
                rounds.append(args.repeats * B / (t1 - t0))
            qps = sorted(rounds)[1]
            print(json.dumps({"dtype": dtype, "engine": name, "n": n, "dim": dim,
                              "k": k, "batch": B, "qps": round(qps, 1)}), flush=True)
        del q, data, norms, qn


if __name__ == "__main__":
    main()
