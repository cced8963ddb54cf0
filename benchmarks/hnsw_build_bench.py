#!/usr/bin/env python
"""HNSW bulk-build + ef-sweep benchmark (the reference's graph headline).

Reproduces ``tests/benchmark/run_files/bm_basics_single_fp32.cpp`` scale
(1M x 768 cosine; BASELINE.md targets M=16 efConstruction=200) with
device-generated data and the device-resident construction pipeline
(``HNSWIndex.bulk_build_device`` -> ``ops.graph_build.build_scan``):
whole segments of insert batches run as single dispatches, so the build is
device-compute-bound instead of relay-dispatch-bound.

Emits JSON lines: build throughput, then recall/QPS per ef.

Usage: python benchmarks/hnsw_build_bench.py [--n 1000000] [--dim 768]
       [--m 16] [--efc 200] [--batch 1024] [--scan-batches 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--efc", type=int, default=200)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--scan-batches", type=int, default=64)
    ap.add_argument("--queries", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--data", choices=["embedding", "random"], default="embedding")
    ap.add_argument("--intrinsic-dim", type=int, default=48)
    ap.add_argument("--efs", type=str, default="10,50,100,200,500")
    ap.add_argument("--multi", type=int, default=0, metavar="PER_LABEL",
                    help="multi-value index with PER_LABEL vectors per label "
                         "(the fashion_images-multi analog, "
                         "hnsw_indices_all.txt:4-5); recall over labels")
    ap.add_argument("--skip-sweep", action="store_true")
    ap.add_argument("--no-nav", action="store_true",
                    help="disable the bf16 nav shadow during the build "
                         "(-2 bytes/dim/row of HBM; 10M-scale headroom)")
    ap.add_argument("--donate-state", action="store_true",
                    help="donate graph state per build dispatch (halves "
                         "link-array HBM; loses flake retry)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import vectorsimilarity_tpu as vs
    from vectorsimilarity_tpu.core.interface import VecSimIndexBase
    from vectorsimilarity_tpu.indexes.hnsw import HNSWIndex

    t_start = time.perf_counter()

    def _log_cb(ctx, level, msg):
        print(f"# [{time.perf_counter() - t_start:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

    VecSimIndexBase.log_callback = staticmethod(_log_cb)
    from vectorsimilarity_tpu.types import HNSWParams, VecSimMetric, VecSimType
    from vectorsimilarity_tpu.utils.synthetic import embedding_like
    from vectorsimilarity_tpu.core.store import _bucket_capacity

    n, dim, B = args.n, args.dim, args.queries
    emit(event="config", n=n, dim=dim, M=args.m, efC=args.efc,
         batch=args.batch, scan_batches=args.scan_batches,
         device=str(jax.devices()[0]))

    cap = _bucket_capacity(n, 1024)
    if args.data == "embedding":
        data = embedding_like(jax.random.PRNGKey(0), cap, dim,
                              intrinsic_dim=args.intrinsic_dim)
        # Held-out queries on the SAME manifold via latent_key: the old
        # form (generate cap+B rows, slice the tail) materializes a
        # second full corpus — at 10M x 96 that is +6.4 GB and OOMs.
        qdev = embedding_like(jax.random.PRNGKey(0), B, dim,
                              intrinsic_dim=args.intrinsic_dim,
                              latent_key=jax.random.PRNGKey(977))
    else:
        data = jax.random.normal(jax.random.PRNGKey(0), (cap, dim), dtype=jnp.float32)
        data = data / jnp.linalg.norm(data, axis=1, keepdims=True)
        qdev = jax.random.normal(jax.random.PRNGKey(9), (B, dim), dtype=jnp.float32)
        qdev = qdev / jnp.linalg.norm(qdev, axis=1, keepdims=True)
    # Force materialization (the axon relay defers lazy expressions).
    _ = float(jnp.sum(data[:: max(cap // 16, 1), 0]))
    queries = np.asarray(qdev)

    per_label = max(args.multi, 0)
    labels = np.arange(n, dtype=np.int64) // per_label if per_label > 1 else None
    from vectorsimilarity_tpu import config as vs_config

    if args.no_nav:
        vs_config.build_nav_bf16 = False
    if args.donate_state:
        vs_config.build_donate_state = True
    idx = HNSWIndex(HNSWParams(
        type=VecSimType.FLOAT32, dim=dim, metric=VecSimMetric.Cosine,
        multi=per_label > 1,
        M=args.m, efConstruction=args.efc, initialCapacity=n))
    t0 = time.perf_counter()
    # Both data branches above produce unit rows, so the build adopts the
    # SAME buffer instead of a normalized 3 GB clone (OOM headroom at 1M).
    idx.bulk_build_device(data, n=n, labels=labels, batch=args.batch,
                          scan_batches=args.scan_batches,
                          assume_normalized=True)
    dropped = idx.build_dropped()  # forces the whole build chain
    build_s = time.perf_counter() - t0
    emit(event="hnsw_build", n=n, M=args.m, efC=args.efc,
         seconds=round(build_s, 1), vectors_per_sec=round(n / build_s, 1),
         dropped_reverse_edges=int(dropped),
         max_level=idx.max_level)

    if args.skip_sweep:
        return

    # Exact ground truth on device (streaming scan over the same store).
    bf = vs.create_index(vs.VecSimParams(
        algo=vs.VecSimAlgo.BF,
        bfParams=vs.BFParams(type=vs.VecSimType.FLOAT32, dim=dim,
                             metric=vs.VecSimMetric.Cosine)))
    bf.store.adopt_device({"data": idx.store._device["data"]}, count=n)
    bf.labels.label_to_id = {i: i for i in range(n)}
    bf.store.host["label"][:n] = np.arange(n, dtype=np.int64)
    gt_k = max(args.k, 10)
    if per_label > 1:
        # Label-level ground truth: top ids in score order, deduped by
        # label, keep the first gt_k labels (== per-label min-score rule).
        gt = []
        for r in bf.topk_query_batch(queries, gt_k * per_label):
            seen: list = []
            for i in r.ids.tolist():
                lab = i // per_label
                if lab not in seen:
                    seen.append(lab)
                if len(seen) == gt_k:
                    break
            gt.append(set(seen))
    else:
        gt = [set(r.ids[:gt_k].tolist()) for r in bf.topk_query_batch(queries, gt_k)]

    for ef in (int(x) for x in args.efs.split(",")):
        params = vs.VecSimQueryParams()
        params.hnswRuntimeParams.efRuntime = ef
        idx.topk_query_batch(queries, args.k, params)  # warm
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            replies = idx.topk_query_batch(queries, args.k, params)
        dt = (time.perf_counter() - t0) / reps
        rec = np.mean([
            len(set(r.ids[: args.k].tolist()) & g) / args.k
            for r, g in zip(replies, gt)
        ])
        emit(event="hnsw_topk", ef=ef, k=args.k, qps=round(B / dt, 1),
             ms_per_batch=round(dt * 1e3, 2), recall=round(float(rec), 4))


if __name__ == "__main__":
    main()
