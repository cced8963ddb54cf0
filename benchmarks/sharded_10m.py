#!/usr/bin/env python
"""BASELINE north-star scale check: 10M x 96 exact top-k on a device mesh.

Runs the row-sharded flat scan (``parallel.sharding.sharded_topk``) over a
10M x 96 fp32 store on whatever mesh is available — the virtual 8-device
CPU mesh by default (sharding correctness; set JAX_PLATFORMS=cpu +
xla_force_host_platform_device_count), or real chips when present — and
cross-checks a query subset against numpy. Emits JSON lines.

Usage: python benchmarks/sharded_10m.py [--n 10000000] [--dim 96] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--dim", type=int, default=96)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument("--check", type=int, default=4, help="queries to cross-check vs numpy")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vectorsimilarity_tpu.parallel.sharding import (
        AXIS, make_mesh, shard_rows, sharded_topk,
    )
    from vectorsimilarity_tpu.types import VecSimMetric

    devices = jax.devices()
    mesh = make_mesh(devices)
    S = mesh.shape[AXIS]
    n = (args.n // S) * S
    dim, k, B = args.dim, args.k, args.queries
    print(json.dumps({"event": "config", "n": n, "dim": dim, "k": k,
                      "devices": S, "platform": devices[0].platform}), flush=True)

    # Per-shard on-device generation: no host materialization of the 10M store.
    shard_n = n // S
    keys = jax.random.split(jax.random.PRNGKey(0), S)

    @jax.jit
    def gen(key):
        return jax.random.normal(key, (shard_n, dim), dtype=jnp.float32)

    parts = [jax.device_put(gen(keys[i]), devices[i]) for i in range(S)]
    from jax.sharding import NamedSharding, PartitionSpec as P

    data = jax.make_array_from_single_device_arrays(
        (n, dim), NamedSharding(mesh, P(AXIS, None)), parts
    )
    sqn = jax.jit(
        lambda d: jnp.sum(d * d, axis=-1),
        out_shardings=NamedSharding(mesh, P(AXIS)),
    )(data)
    rng = np.random.default_rng(1)
    q = rng.standard_normal((B, dim)).astype(np.float32)
    qd = jax.device_put(jnp.asarray(q), NamedSharding(mesh, P()))

    t0 = time.perf_counter()
    dists, ids = sharded_topk(
        qd, (data, sqn), jnp.int32(n), k,
        metric=VecSimMetric.L2, kind="float", mesh=mesh,
    )
    dists, ids = np.asarray(dists), np.asarray(ids)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        d2, i2 = sharded_topk(
            qd, (data, sqn), jnp.int32(n), k,
            metric=VecSimMetric.L2, kind="float", mesh=mesh,
        )
    _ = np.asarray(d2[:1, :1])
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"event": "sharded_topk", "warm_s": round(warm, 2),
                      "s_per_batch": round(dt, 3),
                      "qps": round(B / dt, 1)}), flush=True)

    # Cross-check a few queries against per-shard numpy scans (never
    # materializing more than one shard on host).
    check = min(args.check, B)
    best = np.full((check, k), np.inf)
    besti = np.full((check, k), -1)
    for s in range(S):
        part = np.asarray(parts[s])
        sc = ((q[:check, None] - part[None]) ** 2).sum(-1)
        alld = np.concatenate([best, sc], axis=1)
        alli = np.concatenate(
            [besti, np.tile(np.arange(shard_n) + s * shard_n, (check, 1))], axis=1
        )
        sel = np.argsort(alld, axis=1, kind="stable")[:, :k]
        best = np.take_along_axis(alld, sel, axis=1)
        besti = np.take_along_axis(alli, sel, axis=1)
    ok = all(set(ids[b].tolist()) == set(besti[b].tolist()) for b in range(check))
    print(json.dumps({"event": "crosscheck", "queries": check, "ok": bool(ok)}),
          flush=True)
    assert ok, "sharded top-k mismatch vs numpy"


if __name__ == "__main__":
    main()
