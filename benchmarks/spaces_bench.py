#!/usr/bin/env python
"""Spaces micro-benchmark: per-(dtype, metric) distance-kernel throughput.

The analog of the reference's Google-benchmark kernel suites
(``tests/benchmark/spaces_benchmarks/bm_spaces_*.cpp``, one per dtype incl.
sq8 asymmetric): times the batched score-matrix kernel for every lane and
reports ns per pairwise distance + effective GFLOP/s, so dtype-lane
regressions (e.g. a precision flag forcing a multi-pass matmul) are visible
instead of silently eating the headline bench.

Usage:
    python benchmarks/spaces_bench.py [--n 262144] [--dim 768] [--batch 128]
    python benchmarks/spaces_bench.py --check-order   # assert int8>=bf16>=fp32

Emits one JSON line per lane: {"lane", "ns_per_dist", "gflops", "pairs_per_s"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def materialize(x):
    """Force device materialization (axon relay defers lazy expressions;
    block_until_ready is not reliable there — host-read a slice)."""
    import jax.numpy as jnp

    arr = x[0] if isinstance(x, tuple) else x
    flat = arr.reshape(-1)
    _ = float(jnp.sum(flat[:: max(flat.shape[0] // 8, 1)].astype(jnp.float32)))
    return x


def bench_lane(fn, out_probe, repeats: int) -> float:
    """Median seconds per call; each call is forced via a tiny host read."""
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn()
        out_probe(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262_144)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--metric", choices=["L2", "IP", "Cosine"], default="Cosine")
    ap.add_argument("--check-order", action="store_true",
                    help="exit non-zero unless int8 >= bf16 >= fp32 throughput")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vectorsimilarity_tpu.ops import distances as D
    from vectorsimilarity_tpu.ops import quantize as Q
    from vectorsimilarity_tpu.types import VecSimMetric

    metric = VecSimMetric[args.metric]
    N, dim, B = args.n, args.dim, args.batch
    dev = jax.devices()[0]
    print(f"# spaces bench on {dev}: N={N} dim={dim} B={B} metric={args.metric}",
          file=sys.stderr)

    key = jax.random.PRNGKey(0)
    fdata = jax.random.normal(key, (N, dim), dtype=jnp.float32)
    fdata = materialize(fdata / jnp.linalg.norm(fdata, axis=1, keepdims=True))
    fq = materialize(jax.random.normal(jax.random.PRNGKey(1), (B, dim), dtype=jnp.float32))
    idata = materialize(jax.random.randint(key, (N, dim), -127, 128, dtype=jnp.int8))
    udata = materialize(jax.random.randint(key, (N, dim), 0, 256, dtype=jnp.uint8))
    iq = materialize(jax.random.randint(jax.random.PRNGKey(2), (B, dim), -127, 128, dtype=jnp.int8))
    uq = materialize(jax.random.randint(jax.random.PRNGKey(2), (B, dim), 0, 256, dtype=jnp.uint8))
    inorm = materialize(jnp.sqrt(jnp.sum(idata.astype(jnp.int32) ** 2, 1).astype(jnp.float32)))
    unorm = materialize(jnp.sqrt(jnp.sum(udata.astype(jnp.int32) ** 2, 1).astype(jnp.float32)))
    iqnorm = materialize(jnp.sqrt(jnp.sum(iq.astype(jnp.int32) ** 2, 1).astype(jnp.float32)))
    uqnorm = materialize(jnp.sqrt(jnp.sum(uq.astype(jnp.int32) ** 2, 1).astype(jnp.float32)))
    codes, vmin, delta, _, xsumsq = Q.sq8_quantize(fdata)
    for t in (codes, vmin, delta, xsumsq):
        materialize(t)

    sqn = materialize(jnp.sum(fdata * fdata, axis=1)) if metric == VecSimMetric.L2 else None

    count = jnp.int32(N)
    k = 10

    def probe(out):
        d, i = out
        _ = float(d[0, 0]) + int(i[0, 0])

    def run(q, store, kind, qn=None):
        return D.streaming_topk(q, store, count, k, metric=metric, kind=kind,
                                chunk=min(N, 1 << 16), query_norms=qn)

    lanes = {
        "fp32": lambda: run(fq, (fdata, sqn), "float"),
        "bf16": lambda: run(fq.astype(jnp.bfloat16), (fdata.astype(jnp.bfloat16), sqn), "float"),
        "fp16": lambda: run(fq.astype(jnp.float16), (fdata.astype(jnp.float16), sqn), "float"),
        "int8": lambda: run(iq, (idata, inorm if metric == VecSimMetric.Cosine else
                                 (jnp.sum(idata.astype(jnp.int32)**2, 1).astype(jnp.float32)
                                  if metric == VecSimMetric.L2 else None)), "int",
                            iqnorm if metric == VecSimMetric.Cosine else None),
        "uint8": lambda: run(uq, (udata, unorm if metric == VecSimMetric.Cosine else
                                  (jnp.sum(udata.astype(jnp.int32)**2, 1).astype(jnp.float32)
                                   if metric == VecSimMetric.L2 else None)), "int",
                             uqnorm if metric == VecSimMetric.Cosine else None),
        "sq8": lambda: run(fq, (codes, vmin, delta, xsumsq), "sq8"),
    }

    # bf16/fp16 store copies are lazy: materialize before timing.
    results = {}
    for lane, fn in lanes.items():
        try:
            probe(fn())  # warmup / compile
            sec = bench_lane(fn, probe, args.repeats)
        except Exception as e:  # pragma: no cover
            print(f"# lane {lane} failed: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        pairs = B * N / sec
        flops = 2.0 * B * N * dim / sec
        results[lane] = pairs
        print(json.dumps({
            "lane": f"{lane}_{args.metric}",
            "ns_per_dist": round(1e9 * sec / (B * N), 3),
            "gflops": round(flops / 1e9, 1),
            "pairs_per_s": round(pairs, 0),
        }))

    if args.check_order:
        ok = results.get("int8", 0) >= results.get("bf16", 0) >= results.get("fp32", 0)
        print(f"# lane order int8>=bf16>=fp32: {'OK' if ok else 'VIOLATED'} "
              f"({results.get('int8', 0):.0f} / {results.get('bf16', 0):.0f} / "
              f"{results.get('fp32', 0):.0f} pairs/s)", file=sys.stderr)
        sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
