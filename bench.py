#!/usr/bin/env python
"""Headline benchmark: brute-force exact k-NN QPS on 1M x 768 fp32 cosine.

Reproduces the reference's primary micro-benchmark configuration (dbpedia
1M x 768 cosine, ``tests/benchmark/run_files/bm_basics_single_fp32.cpp``,
BF TopK k=10 per ``docs/benchmarks.md:60-63``) with synthetic normalized
vectors, runs it through the public index API on the available accelerator,
and compares against a *measured* single-threaded AVX-512 CPU scan on this
host (``native/bf_baseline.cpp``) — the stand-in for the reference's CPU
flat-index kernel. North star (BASELINE.md): >= 10x the CPU baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def cpu_baseline_qps(n: int, dim: int, k: int, nq: int) -> float:
    """Compile (cached) and run the native CPU scan; returns QPS."""
    cache_key = f"bf_baseline_{n}_{dim}_{k}_{nq}.json"
    cache_path = os.path.join("/tmp", cache_key)
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            return json.load(f)["cpu_qps"]
    binary = "/tmp/bf_baseline"
    src = os.path.join(REPO, "native", "bf_baseline.cpp")
    try:
        if not os.path.exists(binary) or os.path.getmtime(binary) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-funroll-loops", "-o", binary, src],
                check=True, capture_output=True,
            )
        out = subprocess.run(
            [binary, str(n), str(dim), str(k), str(nq)],
            check=True, capture_output=True, text=True, timeout=3600,
        )
        qps = json.loads(out.stdout.strip())["cpu_qps"]
        with open(cache_path, "w") as f:
            json.dump({"cpu_qps": qps}, f)
        return qps
    except Exception as e:  # toolchain missing: fall back to a conservative estimate
        print(f"# cpu baseline unavailable ({e}); using estimate", file=sys.stderr)
        # ~3 GB/scan at ~12 GB/s effective single-core bandwidth.
        return 12e9 / (n * dim * 4)


def supervise() -> None:
    """Run the measurement in a child process with a stall watchdog.

    The axon tunnel occasionally hangs a fresh session on its first device
    dispatch (observed ~1 in 5 sessions; the blocked call never returns, so
    no in-process retry can recover). The child prints heartbeats to
    stderr; if it produces no output for --stall-timeout seconds the parent
    kills it and starts a fresh session, up to 3 attempts."""
    stall = float(os.environ.get("VS_BENCH_STALL_TIMEOUT", "900"))
    for attempt in range(3):
        env = dict(os.environ, VS_BENCH_CHILD="1")
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        import threading

        last = [time.monotonic()]
        out_lines: list[bytes] = []

        def pump(stream, sink):
            for line in iter(stream.readline, b""):
                last[0] = time.monotonic()
                if sink is None:
                    out_lines.append(line)
                else:
                    sink.buffer.write(line)
                    sink.flush()

        t_out = threading.Thread(target=pump, args=(child.stdout, None), daemon=True)
        t_err = threading.Thread(target=pump, args=(child.stderr, sys.stderr), daemon=True)
        t_out.start(); t_err.start()
        while child.poll() is None:
            time.sleep(5)
            if time.monotonic() - last[0] > stall:
                print(f"# stall >{stall:.0f}s (tunnel hang); restarting "
                      f"(attempt {attempt + 2}/3)", file=sys.stderr, flush=True)
                child.kill()
                child.wait()
                time.sleep(30)  # let the tunnel drop the dead client
                break
        else:
            t_out.join(5); t_err.join(5)
            sys.stdout.buffer.write(b"".join(out_lines))
            sys.stdout.flush()
            if child.returncode == 0:
                return
            print(f"# child exited rc={child.returncode}; retrying",
                  file=sys.stderr, flush=True)
            time.sleep(30)
    sys.exit(1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1024, help="queries per device call")
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--quick", action="store_true", help="100k vectors, fewer repeats")
    ap.add_argument("--baseline-queries", type=int, default=8)
    ap.add_argument("--engine", choices=["auto", "pallas", "xla"], default="auto")
    ap.add_argument("--dtype", choices=["fp32", "bf16", "int8"], default="fp32")
    args = ap.parse_args()
    if args.quick:
        args.n = min(args.n, 100_000)
        args.repeats = 3
        args.baseline_queries = 3

    import jax

    from vectorsimilarity_tpu import (
        BFParams, VecSimAlgo, VecSimMetric, VecSimParams, VecSimType, create_index,
    )
    from vectorsimilarity_tpu import config as vs_config

    if args.engine == "pallas":
        vs_config.use_pallas = "always"
    elif args.engine == "xla":
        vs_config.use_pallas = "never"

    import jax.numpy as jnp

    n, dim, k, B = args.n, args.dim, args.k, args.batch
    rng = np.random.default_rng(0)
    vtype = {"fp32": VecSimType.FLOAT32, "bf16": VecSimType.BFLOAT16,
             "int8": VecSimType.INT8}[args.dtype]
    print(f"# building {n}x{dim} {args.dtype} cosine BF index on {jax.devices()[0]}",
          file=sys.stderr)
    idx = create_index(
        VecSimParams(
            algo=VecSimAlgo.BF,
            bfParams=BFParams(type=vtype, dim=dim, metric=VecSimMetric.Cosine),
        )
    )
    # Generate + normalize the dataset ON DEVICE (host->device transfer of a
    # 3 GB store through the axon relay would dominate the build).
    from vectorsimilarity_tpu.core.store import _bucket_capacity

    cap = _bucket_capacity(n, idx.store.block_size)
    key = jax.random.PRNGKey(0)
    adopt = {}
    if args.dtype == "int8":
        data = jax.random.randint(key, (cap, dim), -127, 128, dtype=jnp.int8)
        norms = jnp.sqrt(jnp.sum(data.astype(jnp.int32) ** 2, axis=1).astype(jnp.float32))
        _ = float(jnp.sum(norms[:: max(cap // 16, 1)]))
        adopt = {"data": data, "norm": norms}
        queries = rng.integers(-127, 128, size=(B, dim)).astype(np.int8)
    else:
        data = jax.random.normal(key, (cap, dim), dtype=jnp.float32)
        data = data / jnp.linalg.norm(data, axis=1, keepdims=True)
        if args.dtype == "bf16":
            data = data.astype(jnp.bfloat16)
        # Force materialization: some backends (axon relay) defer lazy
        # expressions until a host read; without this every query would
        # re-run the generator pipeline.
        _ = float(jnp.sum(data[:: max(cap // 16, 1), 0].astype(jnp.float32)))
        adopt = {"data": data}
        queries = rng.standard_normal((B, dim)).astype(idx.np_dtype)
    print("# dataset materialized on device", file=sys.stderr, flush=True)
    idx.store.adopt_device(adopt, count=n)
    idx.labels.label_to_id = {i: i for i in range(n)}
    idx.store.host["label"][:n] = np.arange(n, dtype=np.int64)
    assert idx.index_size == n
    from vectorsimilarity_tpu.core.abstract_index import retry_device

    # Correctness sanity through the full host API (includes label mapping).
    print("# warming the query path (first compile)...", file=sys.stderr, flush=True)
    retry_device(lambda: idx.topk_query_batch(queries, k), attempts=4)
    replies = idx.topk_query_batch(queries, k)
    assert len(replies) == B and len(replies[0]) == k

    # Throughput: R distinct query batches STAGED ON DEVICE. The axon
    # relay's host<->device link (~10 MB/s) would cap any engine at ~3k QPS
    # for 768-d fp32 host-staged batches; a production host feeds queries
    # over PCIe at GB/s, so the engine number is the meaningful one.
    staged = []
    for r in range(args.repeats):
        qk = jax.random.PRNGKey(100 + r)
        if args.dtype == "int8":
            qb = jax.random.randint(qk, (B, dim), -127, 128, dtype=jnp.int8)
            qn = jnp.sqrt(jnp.sum(qb.astype(jnp.int32) ** 2, axis=1).astype(jnp.float32))
        else:
            qb = jax.random.normal(qk, (B, dim), dtype=jnp.float32)
            qb = qb / jnp.linalg.norm(qb, axis=1, keepdims=True)
            if args.dtype == "bf16":
                qb = qb.astype(jnp.bfloat16)
            qn = None
        staged.append((qb, qn))
    _ = [float(jnp.sum(qb[0].astype(jnp.float32))) for qb, _ in staged]  # materialize
    kind = "int" if args.dtype == "int8" else "float"
    needs_qn = kind == "int"
    out = idx.search_knn_device(staged[0][0], k, qn=staged[0][1] if needs_qn else None)
    _ = float(np.asarray(out[0])[0, 0])  # warm compile + force
    # Median of 3 timed rounds: the axon relay adds ~25% run-to-run spread
    # (docs/benchmarks.md methodology) — one round is not a number.
    rounds = []
    for _ in range(3):
        t0 = time.perf_counter()
        for qb, qn in staged:
            out = idx.search_knn_device(qb, k, qn=qn if needs_qn else None)
        _ = np.asarray(out[0])[:, :1]  # force the chain (relay defers laziness)
        t1 = time.perf_counter()
        rounds.append(args.repeats * B / (t1 - t0))
    qps = sorted(rounds)[1]

    # Host-API path: queries fed from host numpy through the full public
    # topk_query_batch (preprocess + upload + search + label mapping). On
    # the axon relay the ~10 MB/s host link dominates this number; on a
    # production host (PCIe) the two converge. Reported alongside so the
    # engine number stays falsifiable against the host execution model.
    host_reps = max(2, args.repeats // 4)
    idx.topk_query_batch(queries, k)  # warm
    t0 = time.perf_counter()
    for _ in range(host_reps):
        replies = idx.topk_query_batch(queries, k)
    t1 = time.perf_counter()
    host_qps = host_reps * B / (t1 - t0)

    print(f"# measuring CPU baseline ({args.baseline_queries} queries)...", file=sys.stderr)
    cpu_qps = cpu_baseline_qps(n, dim, k, args.baseline_queries)
    print(
        json.dumps(
            {
                "metric": f"bf_topk_qps_{n}x{dim}_{args.dtype}_cosine_k{k}",
                "value": round(qps, 2),
                "unit": "qps",
                "vs_baseline": round(qps / cpu_qps, 2),
                "host_api_qps": round(host_qps, 2),
                "engine": (
                    "pallas-gm" if vs_config.pallas_gm_enabled(
                        kind, k, idx.store.capacity,
                        idx.store.fields["data"].device_dtype, batch=B, dim=dim)
                    else "pallas" if vs_config.pallas_enabled(
                        kind, k, idx.store.capacity,
                        idx.store.fields["data"].device_dtype, dim=dim)
                    else "pallas-bigk" if vs_config.pallas_bigk_enabled(
                        kind, k, idx.store.capacity,
                        idx.store.fields["data"].device_dtype, dim=dim)
                    else "xla"
                ),
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("VS_BENCH_CHILD"):
        main()
    else:
        supervise()
