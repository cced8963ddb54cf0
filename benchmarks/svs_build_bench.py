#!/usr/bin/env python
"""SVS-Vamana bulk-build + window-sweep benchmark (device-resident path).

The SVS analog of ``hnsw_build_bench.py``: device-generated data,
``SVSIndex.bulk_build_device`` (fused ``vamana_build_scan`` segments, all
preprocessing — normalize / LeanVec / SQ8 / LVQ4 — on device), exact GT
from a device BF scan over the same buffer. Fills the reference's SVS
benchmark slot at any scale without pushing the dataset through the relay
host link (the reference's SVS dep is an empty submodule — cmake/svs.cmake;
mode semantics per the LVQ/LeanVec papers).

Emits JSON lines: build throughput per mode, then recall/QPS per search
window.

Usage: python benchmarks/svs_build_bench.py [--n 1000000] [--dim 768]
       [--modes none,sq8] [--degree 32] [--cws 200] [--ws 10,50,100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODES = {
    "none": "NONE",
    "sq8": "Scalar",
    "lvq4": "Q4",
    "q4x8": "Q4x8",
    "leanvec": "Q4x8_LeanVec",
}


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--modes", default="none,sq8")
    ap.add_argument("--degree", type=int, default=32)
    ap.add_argument("--cws", type=int, default=200,
                    help="construction window size L")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--scan-batches", type=int, default=4)
    ap.add_argument("--queries", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--ws", default="10,50,100,200")
    ap.add_argument("--intrinsic-dim", type=int, default=48)
    ap.add_argument("--skip-sweep", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import vectorsimilarity_tpu as vs
    from vectorsimilarity_tpu.core.interface import VecSimIndexBase
    from vectorsimilarity_tpu.indexes.svs import SVSIndex

    t_start = time.perf_counter()

    def _log_cb(ctx, level, msg):
        print(f"# [{time.perf_counter() - t_start:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

    VecSimIndexBase.log_callback = staticmethod(_log_cb)
    from vectorsimilarity_tpu.types import (
        SVSParams, SVSRuntimeParams, VecSimMetric, VecSimQueryParams,
        VecSimSvsQuantBits, VecSimType,
    )
    from vectorsimilarity_tpu.utils.synthetic import embedding_like
    from vectorsimilarity_tpu.core.store import _bucket_capacity

    n, dim, B = args.n, args.dim, args.queries
    emit(event="config", n=n, dim=dim, degree=args.degree, cws=args.cws,
         batch=args.batch, scan_batches=args.scan_batches,
         device=str(jax.devices()[0]))

    cap = _bucket_capacity(n, 1024)
    data = embedding_like(jax.random.PRNGKey(0), cap, dim,
                          intrinsic_dim=args.intrinsic_dim)
    qdev = embedding_like(jax.random.PRNGKey(0), B + cap, dim,
                          intrinsic_dim=args.intrinsic_dim)[cap:]
    _ = float(jnp.sum(data[:: max(cap // 16, 1), 0]))  # force materialization
    queries = np.asarray(qdev)

    # Exact ground truth on device once (mode-independent).
    gt = None
    if not args.skip_sweep:
        bf = vs.create_index(vs.VecSimParams(
            algo=vs.VecSimAlgo.BF,
            bfParams=vs.BFParams(type=vs.VecSimType.FLOAT32, dim=dim,
                                 metric=vs.VecSimMetric.Cosine)))
        bf.store.adopt_device({"data": data}, count=n)
        bf.labels.label_to_id = {i: i for i in range(n)}
        bf.store.host["label"][:n] = np.arange(n, dtype=np.int64)
        gt_k = max(args.k, 10)
        gt = [set(r.ids[:gt_k].tolist())
              for r in bf.topk_query_batch(queries, gt_k)]
        del bf

    for mode in args.modes.split(","):
        qbits = getattr(VecSimSvsQuantBits, MODES[mode])
        idx = SVSIndex(SVSParams(
            type=VecSimType.FLOAT32, dim=dim, metric=VecSimMetric.Cosine,
            quantBits=qbits, graph_max_degree=args.degree,
            construction_window_size=args.cws))
        t0 = time.perf_counter()
        # embedding_like rows are unit-norm: the build adopts the SAME
        # buffer instead of a normalized clone (OOM headroom at 1M).
        idx.bulk_build_device(data, n=n, batch=args.batch,
                              scan_batches=args.scan_batches,
                              assume_normalized=True)
        dropped = idx.build_dropped()  # forces the whole build chain
        build_s = time.perf_counter() - t0
        emit(event="svs_build", mode=mode, n=n, dim=dim,
             seconds=round(build_s, 1),
             vectors_per_sec=round(n / build_s, 1),
             dropped_reverse_edges=int(dropped),
             store_bytes_per_vector=round(idx.store.memory_bytes / n, 1))

        if args.skip_sweep:
            del idx
            continue
        for ws in (int(x) for x in args.ws.split(",")):
            params = VecSimQueryParams(
                svsRuntimeParams=SVSRuntimeParams(windowSize=ws))
            idx.topk_query_batch(queries, args.k, params)  # warm
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                replies = idx.topk_query_batch(queries, args.k, params)
            dt = (time.perf_counter() - t0) / reps
            rec = np.mean([
                len(set(int(x) for x in r.ids[: args.k]) & g) / args.k
                for r, g in zip(replies, gt)
            ])
            emit(event="svs_topk", mode=mode, ws=ws, k=args.k,
                 qps=round(B / dt, 1), ms_per_batch=round(dt * 1e3, 2),
                 recall=round(float(rec), 4))
        del idx


if __name__ == "__main__":
    main()
