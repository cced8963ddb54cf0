#!/usr/bin/env python
"""SVS-Vamana benchmark across quantization modes.

Builds one SVS index per mode (NONE / Scalar SQ8 / LVQ4 / two-level Q4x8 /
Q4x8_LeanVec) on identical embedding-like data and reports, per mode:
build wall-time + rate, store bytes/vector (device codes + residuals),
and recall@10 / QPS through the full public ``topk_query_batch`` (host-fed,
including the two-level / LeanVec rerank) over a search-window sweep.
Ground truth is the exact fp32 scan (host numpy). Emits JSON lines.

This fills the reference's SVS benchmark slot (its SVS dep is vendored
empty — ``cmake/svs.cmake``; quant-mode semantics per the LVQ/LeanVec
papers): the comparison story is mode-vs-mode compression/recall/speed
on the same engine.

Usage: python benchmarks/svs_bench.py [--n 100000] [--dim 768]
         [--modes none,sq8,lvq4,q4x8,leanvec] [--ws 10,50,100]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--modes", default="none,sq8,lvq4,q4x8,leanvec")
    ap.add_argument("--ws", default="10,50,100")
    ap.add_argument("--degree", type=int, default=32)
    ap.add_argument("--cws", type=int, default=200,
                    help="construction window size")
    ap.add_argument("--chunk", type=int, default=2048,
                    help="insert batch size")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from vectorsimilarity_tpu.indexes.svs import SVSIndex
    from vectorsimilarity_tpu.types import (
        SVSParams, SVSRuntimeParams, VecSimMetric, VecSimQueryParams,
        VecSimSvsQuantBits, VecSimType,
    )
    from vectorsimilarity_tpu.utils.synthetic import embedding_like_np

    rng = np.random.default_rng(0)
    n, dim, k = args.n, args.dim, args.k
    print(f"# generating {n}x{dim} embedding-like data on host",
          file=sys.stderr, flush=True)
    data = embedding_like_np(rng, n, dim)
    queries = embedding_like_np(rng, args.queries, dim)

    # Exact fp32 cosine ground truth (host; chunked scan).
    print("# exact ground truth...", file=sys.stderr, flush=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    scores = np.empty((args.queries, n), dtype=np.float32)
    step = max((1 << 25) // dim, 1)
    for lo in range(0, n, step):
        scores[:, lo:lo + step] = 1.0 - qn @ data[lo:lo + step].T
    gt = np.argsort(scores, axis=1, kind="stable")[:, :k]

    for mode in args.modes.split(","):
        qbits = getattr(VecSimSvsQuantBits, MODES[mode])
        idx = SVSIndex(SVSParams(
            type=VecSimType.FLOAT32, dim=dim, metric=VecSimMetric.Cosine,
            quantBits=qbits, graph_max_degree=args.degree,
            construction_window_size=args.cws,
        ))
        t0 = time.perf_counter()
        for lo in range(0, n, args.chunk):
            idx.add_vector_batch(data[lo:lo + args.chunk],
                                 np.arange(lo, min(lo + args.chunk, n)))
        build_s = time.perf_counter() - t0
        bpv = idx.store.memory_bytes / n
        print(json.dumps({
            "event": "svs_build", "mode": mode, "n": n, "dim": dim,
            "build_s": round(build_s, 1),
            "vectors_per_s": round(n / build_s, 1),
            "store_bytes_per_vector": round(bpv, 1),
        }), flush=True)

        for ws in [int(x) for x in args.ws.split(",")]:
            params = VecSimQueryParams(
                svsRuntimeParams=SVSRuntimeParams(windowSize=ws))
            idx.topk_query_batch(queries, k, params)  # warm/compile
            best = np.inf
            for _ in range(args.reps):
                t1 = time.perf_counter()
                replies = idx.topk_query_batch(queries, k, params)
                best = min(best, time.perf_counter() - t1)
            rec = float(np.mean([
                len(set(int(l) for l in replies[b].ids) & set(gt[b].tolist())) / k
                for b in range(args.queries)
            ]))
            print(json.dumps({
                "event": "svs_topk", "mode": mode, "ws": ws,
                "recall": round(rec, 4),
                "qps": round(args.queries / best, 1),
                "ms_per_batch": round(best * 1e3, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
