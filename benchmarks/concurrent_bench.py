#!/usr/bin/env python
"""Concurrent insert+query throughput on the tiered index.

The BASELINE.md configs row ends with "concurrent insert+query"; the
reference exercises it via its mock-thread-pool tiered benchmarks
(tests/benchmark/ bm_updated/tiered cases + test_hnsw_tiered.cpp search
jobs). Here: a tiered HNSW index with an async JobQueueThreadPool; a
writer thread ingests vectors through the public add_vector API (flat
frontend + coalesced backend migration jobs) while the main thread runs
batched top-k queries. Both rates are measured over the same wall-clock
window, plus a no-ingest query baseline on the same index.

Usage: python benchmarks/concurrent_bench.py [--n 200000] [--dim 96]
       [--seconds 30] [--qbatch 256] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=96)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--qbatch", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--ef", type=int, default=50)
    ap.add_argument("--threads", type=int, default=2)
    args = ap.parse_args()

    import jax

    import vectorsimilarity_tpu as vs
    from vectorsimilarity_tpu.indexes.tiered import TieredHNSWIndex
    from vectorsimilarity_tpu.types import (
        HNSWParams, TieredHNSWParams, TieredIndexParams, VecSimAlgo,
        VecSimMetric, VecSimParams, VecSimQueryParams, VecSimType,
    )
    from vectorsimilarity_tpu.utils.synthetic import embedding_like
    from vectorsimilarity_tpu.utils.thread_pool import JobQueueThreadPool

    n, dim = args.n, args.dim
    emit(event="config", n=n, dim=dim, seconds=args.seconds,
         qbatch=args.qbatch, k=args.k, ef=args.ef,
         device=str(jax.devices()[0]))

    pool = JobQueueThreadPool(args.threads)
    primary = VecSimParams(algo=VecSimAlgo.HNSWLIB, hnswParams=HNSWParams(
        type=VecSimType.FLOAT32, dim=dim, metric=VecSimMetric.Cosine,
        M=16, efConstruction=200, efRuntime=args.ef, initialCapacity=n))
    tparams = TieredIndexParams(
        primaryIndexParams=primary,
        tieredHnswParams=TieredHNSWParams(swapJobThreshold=1024))
    tparams.jobQueue = pool
    tparams.submitCb = pool.submit_cb
    idx = vs.create_index(VecSimParams(algo=VecSimAlgo.TIERED, tieredParams=tparams))

    # Pre-build the backend device-resident (ingest starts against a warm
    # graph, matching the reference's updated-index protocol).
    data = embedding_like(jax.random.PRNGKey(0), n, dim, intrinsic_dim=48)
    t0 = time.perf_counter()
    idx.backend.bulk_build_device(data, n=n, batch=1024, scan_batches=4)
    emit(event="prebuild", n=n, seconds=round(time.perf_counter() - t0, 1),
         vectors_per_sec=round(n / (time.perf_counter() - t0), 1))

    rng = np.random.default_rng(3)
    queries = rng.standard_normal((args.qbatch, dim)).astype(np.float32)
    new_vecs = rng.standard_normal((4096, dim)).astype(np.float32)
    qp = VecSimQueryParams()
    qp.hnswRuntimeParams.efRuntime = args.ef

    # Warm / compile both paths before timing. Migration coalesces the job
    # queue into pow2 device chunks (<= config.build_batch); compile each
    # size now so the measured window is compile-free.
    idx.topk_query_batch(queries, args.k, qp)
    warm_label = n
    c = 1
    while c <= 1024:
        vb = rng.standard_normal((c, dim)).astype(np.float32)
        idx.backend.add_vector_batch(vb, list(range(warm_label, warm_label + c)))
        warm_label += c
        c *= 2
    for j in range(64):
        idx.add_vector(new_vecs[j % len(new_vecs)], warm_label + j)
    pool.wait_for_quiescence(300)
    warm_label += 64
    # Warm the FLAT tier's capacity buckets too: during the window the
    # frontend grows through pow2 buckets (1024 -> 2048 -> ...) and each
    # new bucket's query program is a fresh XLA compile (~10 s via the
    # relay) that would land INSIDE the measurement. The jit cache is
    # process-wide and keyed on shapes, so a THROWAWAY flat index at the
    # same dim/metric/batch/k compiles exactly the programs the frontend
    # will hit (without touching tiered bookkeeping).
    wbf = vs.create_index(VecSimParams(algo=VecSimAlgo.BF, bfParams=vs.BFParams(
        type=VecSimType.FLOAT32, dim=dim, metric=VecSimMetric.Cosine)))
    grown = 0
    wlab = 0
    while grown < 8192:
        step = max(1024, grown)
        vb = rng.standard_normal((step, dim)).astype(np.float32)
        wbf.add_vector_batch(vb, list(range(wlab, wlab + step)))
        wlab += step
        grown += step
        wbf.topk_query_batch(queries, args.k)
    del wbf

    # ---- baseline: queries only ----
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < max(args.seconds / 3, 5.0):
        idx.topk_query_batch(queries, args.k, qp)
        reps += 1
    base_qps = reps * args.qbatch / (time.perf_counter() - t0)
    emit(event="query_only", qps=round(base_qps, 1))

    # ---- concurrent window ----
    stop = threading.Event()
    ingested = [0]

    def writer():
        label = warm_label
        i = 0
        while not stop.is_set():
            idx.add_vector(new_vecs[i % len(new_vecs)], label)
            label += 1
            i += 1
            ingested[0] = i

    wt = threading.Thread(target=writer, daemon=True)
    t0 = time.perf_counter()
    wt.start()
    reps = 0
    while time.perf_counter() - t0 < args.seconds:
        idx.topk_query_batch(queries, args.k, qp)
        reps += 1
    stop.set()
    dt = time.perf_counter() - t0
    wt.join(10)
    qps = reps * args.qbatch / dt
    ips = ingested[0] / dt
    emit(event="concurrent", seconds=round(dt, 1),
         query_qps=round(qps, 1), insert_per_sec=round(ips, 1),
         qps_vs_query_only=round(qps / base_qps, 3),
         flat_size=idx.frontend.index_size,
         backend_size=idx.backend.index_size)
    # Drain: proves ingest completes and reads see everything.
    ok = pool.wait_for_quiescence(600)
    emit(event="drain", quiesced=bool(ok), final_size=idx.index_size)
    pool.shutdown()


if __name__ == "__main__":
    main()
