#!/usr/bin/env python
"""Benchmark suite reproducing the reference's configurations
(docs/benchmarks.md, BASELINE.md):

  - BF TopK     k in {10, 100, 500}
  - HNSW TopK   {ef,k} in {10,10},{200,10},{100,100},{200,100},{500,500} + recall
  - BF/HNSW Range radius sweeps (+ epsilon for HNSW)
  - Add/Delete label timing (1024 ops)
  - Batch iterator batches {10,100,1000} x {1,3,5}
  - HNSW build throughput (vectors/sec)

Synthetic normalized data (the dbpedia-shaped 1M x 768 config by default;
--small for a laptop-scale sanity run). Prints a JSON-lines report; each
line is one measurement.

Usage:  python benchmarks/run_all.py [--n 1000000] [--dim 768] [--small]
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
    ap.add_argument("--queries", type=int, default=128)
    ap.add_argument("--small", action="store_true", help="20k x 64 sanity config")
    ap.add_argument("--skip-hnsw", action="store_true")
    ap.add_argument("--skip-bf", action="store_true")
    ap.add_argument("--updated", action="store_true",
                    help="BM_VecSimUpdatedIndex: overwrite every label, "
                         "measure memory + TopK before/after")
    ap.add_argument("--updated-n", type=int, default=500_000)
    ap.add_argument("--build-batch", type=int, default=2048)
    ap.add_argument("--hn-n", type=int, default=300_000,
                    help="HNSW sweep scale (build cost scales with n)")
    ap.add_argument("--scan-batches", type=int, default=4)
    ap.add_argument("--data", choices=["embedding", "random"], default="embedding",
                    help="'embedding' models real corpora (intrinsic dim ~48); "
                         "'random' is the uniform pathological case")
    ap.add_argument("--intrinsic-dim", type=int, default=48)
    args = ap.parse_args()
    if args.small:
        args.n, args.dim, args.queries = 20_000, 64, 32
        args.updated_n = min(args.updated_n, 20_000)
    if args.updated:
        _run_updated_index(args, emit)
        return

    import jax
    import jax.numpy as jnp

    import vectorsimilarity_tpu as vs
    from vectorsimilarity_tpu.core.store import _bucket_capacity

    n, dim, B = args.n, args.dim, args.queries
    dev = jax.devices()[0]
    emit(event="config", n=n, dim=dim, queries=B, device=str(dev))
    rng = np.random.default_rng(1)
    queries = rng.standard_normal((B, dim)).astype(np.float32)
    add_vecs = rng.standard_normal((1024, dim)).astype(np.float32)
    from vectorsimilarity_tpu.core.store import _bucket_capacity as _bcap
    import jax.numpy as _jnp
    from vectorsimilarity_tpu.utils.synthetic import embedding_like
    cap0 = _bcap(n, 1024)
    if args.data == "embedding":
        data = embedding_like(jax.random.PRNGKey(0), cap0, dim,
                              intrinsic_dim=args.intrinsic_dim)
        # Held-out queries on the same manifold (same projection, fresh
        # latent) WITHOUT materializing a second full corpus.
        qdev = embedding_like(jax.random.PRNGKey(0), B, dim,
                              intrinsic_dim=args.intrinsic_dim,
                              latent_key=jax.random.PRNGKey(977))
        queries = np.asarray(qdev)
    else:
        data = jax.random.normal(jax.random.PRNGKey(0), (cap0, dim), dtype=_jnp.float32)
        data = data / _jnp.linalg.norm(data, axis=1, keepdims=True)
    _ = float(_jnp.sum(data[:: max(data.shape[0] // 16, 1), 0]))
    emit(event="dataset", mode=args.data,
         intrinsic_dim=args.intrinsic_dim if args.data == "embedding" else dim)
    if args.skip_bf:
        _run_hnsw(args, vs, jax, data, queries, add_vecs, emit)
        return

    # ---------------- BF index (device-side data) ----------------
    bf = vs.create_index(vs.VecSimParams(algo=vs.VecSimAlgo.BF, bfParams=vs.BFParams(
        type=vs.VecSimType.FLOAT32, dim=dim, metric=vs.VecSimMetric.Cosine)))
    bf.store.adopt_device({"data": data}, count=n)
    bf.labels.label_to_id = {i: i for i in range(n)}
    bf.store.host["label"][:n] = np.arange(n, dtype=np.int64)

    for k in (10, 100, 500):
        bf.topk_query_batch(queries, k)  # warm
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = bf.topk_query_batch(queries, k)
        dt = (time.perf_counter() - t0) / reps
        emit(event="bf_topk", k=k, ms_per_batch=round(dt * 1e3, 2),
             qps=round(reps and B / dt, 1))

    # BF range (radius on cosine distance). The reference radii
    # {0.2,0.35,0.5} target its datasets' distance scale and return ~0
    # rows on the embedding-like synthetic — keep them for parity, then
    # add data-driven radii at the query's 10th/100th-neighbor distance
    # so the timed result sets are non-trivial.
    q1 = queries[0]
    qd = bf.topk_query(q1, 128).scores
    radii = [0.2, 0.35, 0.5, round(float(qd[9]), 4), round(float(qd[99]), 4)]
    for radius in radii:
        bf.range_query(q1, radius)  # warm
        t0 = time.perf_counter()
        rep = bf.range_query(q1, radius)
        dt = time.perf_counter() - t0
        emit(event="bf_range", radius=radius, ms=round(dt * 1e3, 2), results=len(rep))

    # BF batch iterator. Warm one throwaway iterator through the same
    # number of refills first: otherwise the first timed refill includes
    # the scoring pass's XLA compile, not serving cost.
    for bs in (10, 100, 1000):
        warm = bf.new_batch_iterator(queries[0])
        for _ in range(3):
            warm.get_next_results(bs)
        it = bf.new_batch_iterator(queries[0])
        t0 = time.perf_counter()
        for _ in range(3):
            it.get_next_results(bs)
        dt = time.perf_counter() - t0
        emit(event="bf_batch_iter", batch=bs, n_batches=3, ms=round(dt * 1e3, 2))

    # Add/Delete label timing (host-path writes)
    t0 = time.perf_counter()
    for i, v in enumerate(add_vecs):
        bf.add_vector(v, n + i)
    dt = (time.perf_counter() - t0) / 1024
    emit(event="bf_add_label", us_per_add=round(dt * 1e6, 1))
    t0 = time.perf_counter()
    for i in range(1024):
        bf.delete_vector(n + i)
    dt = (time.perf_counter() - t0) / 1024
    emit(event="bf_delete_label", us_per_delete=round(dt * 1e6, 1))

    if args.skip_hnsw:
        return
    _run_hnsw(args, vs, jax, data, queries, add_vecs, emit)


def _run_hnsw(args, vs, jax, data, queries, add_vecs, emit):
    import numpy as np
    import sys
    import time
    from vectorsimilarity_tpu.core.store import _bucket_capacity

    n, dim, B = args.n, args.dim, args.queries
    # ---------------- HNSW (reference M=16 efC=200 config) ----------------
    hn_n = min(n, getattr(args, "hn_n", 300_000))  # build cost scales with n
    hn = vs.create_index(vs.VecSimParams(algo=vs.VecSimAlgo.HNSWLIB, hnswParams=vs.HNSWParams(
        type=vs.VecSimType.FLOAT32, dim=dim, metric=vs.VecSimMetric.Cosine,
        M=16, efConstruction=200, initialCapacity=hn_n)))
    t0 = time.perf_counter()
    # Device-resident construction (the production bulk-ingest path):
    # data is already on device; host-feeding it back through the relay
    # would measure the ~10 MB/s link, not the build engine.
    hn.bulk_build_device(data, n=hn_n, batch=1024,
                         scan_batches=getattr(args, "scan_batches", 4))
    build_s = time.perf_counter() - t0
    emit(event="hnsw_build", n=hn_n, M=16, efC=200, seconds=round(build_s, 1),
         vectors_per_sec=round(hn_n / build_s, 1))

    # Ground truth for recall on a query subset.
    gt_k = 100
    gtq = queries[: min(B, 32)]
    bf_small = vs.create_index(vs.VecSimParams(algo=vs.VecSimAlgo.BF, bfParams=vs.BFParams(
        type=vs.VecSimType.FLOAT32, dim=dim, metric=vs.VecSimMetric.Cosine)))
    caph = _bucket_capacity(hn_n, bf_small.store.block_size)
    bf_small.store.adopt_device({"data": data[:caph]}, count=hn_n)
    bf_small.labels.label_to_id = {i: i for i in range(hn_n)}
    bf_small.store.host["label"][:hn_n] = np.arange(hn_n, dtype=np.int64)
    gt = [r.ids.tolist() for r in bf_small.topk_query_batch(gtq, gt_k)]

    for ef, k in ((10, 10), (200, 10), (100, 100), (200, 100), (500, 500)):
        params = vs.VecSimQueryParams()
        params.hnswRuntimeParams.efRuntime = ef
        hn.topk_query_batch(gtq, k, params)  # warm
        t0 = time.perf_counter()
        replies = hn.topk_query_batch(gtq, k, params)
        dt = time.perf_counter() - t0
        kk = min(k, gt_k)
        rec = np.mean([
            len(set(r.ids[:kk].tolist()) & set(g[:kk])) / kk for r, g in zip(replies, gt)
        ])
        emit(event="hnsw_topk", ef=ef, k=k, ms_per_batch=round(dt * 1e3, 2),
             qps=round(len(gtq) / dt, 1), recall=round(float(rec), 4))

    # HNSW range with epsilon sweep: the reference radius 0.35 (~0 rows
    # on this dataset, kept for parity) plus the 100th-neighbor radius of
    # query 0 so the epsilon effect shows on a non-trivial result set.
    # Warm each (radius, epsilon) once — the ef-doubling ladder compiles
    # one program per ef bucket and that cost is not serving cost.
    r100 = round(float(bf_small.topk_query(gtq[0], 128).scores[99]), 4)
    for radius in (0.35, r100):
        for eps in (0.001, 0.01, 0.1):
            params = vs.VecSimQueryParams()
            params.hnswRuntimeParams.epsilon = eps
            hn.range_query(gtq[0], radius, params)  # warm
            t0 = time.perf_counter()
            rep = hn.range_query(gtq[0], radius, params)
            dt = time.perf_counter() - t0
            emit(event="hnsw_range", radius=radius, epsilon=eps,
                 ms=round(dt * 1e3, 2), results=len(rep))

    # HNSW batch iterator grid (reference docs/benchmarks.md: batches
    # {10,100,1000} x {1,3,5}; the resumable device frontier serves
    # these). Warm a throwaway iterator through the same refill ladder:
    # each refill doubles ef, and every NEW ef bucket costs one XLA
    # compile (~15 s via the relay) that steady-state serving never sees.
    for bs in (10, 100, 1000):
        warm = hn.new_batch_iterator(gtq[0])
        for _ in range(3):
            warm.get_next_results(bs)
        it = hn.new_batch_iterator(gtq[0])
        t0 = time.perf_counter()
        got = 0
        for _ in range(3):
            got += len(it.get_next_results(bs))
        dt = time.perf_counter() - t0
        emit(event="hnsw_batch_iter", batch=bs, n_batches=3,
             ms=round(dt * 1e3, 2), results=got)

    # Add/Delete label on HNSW (1024 ops, reference config)
    t0 = time.perf_counter()
    for i, v in enumerate(add_vecs[:256]):
        hn.add_vector(v, hn_n + i)
    dt = (time.perf_counter() - t0) / 256
    emit(event="hnsw_add_label", ms_per_add=round(dt * 1e3, 2))
    t0 = time.perf_counter()
    for i in range(256):
        hn.delete_vector(hn_n + i)
    dt = (time.perf_counter() - t0) / 256
    emit(event="hnsw_delete_label", ms_per_delete=round(dt * 1e3, 2))

    # Production-style deletes: tombstone (mark_delete) + ONE batched
    # repair/compaction (delete_tombstoned_bulk) — the tiered GC path.
    # The per-op number above is repair-eager per delete (a referrer scan
    # + re-prune dispatch each); this is the amortized TPU-native path.
    for i, v in enumerate(add_vecs[:256]):
        hn.add_vector(v, hn_n + i)
    t0 = time.perf_counter()
    nodes = []
    for i in range(256):
        nodes.extend(hn.mark_delete(hn_n + i))
    hn.delete_tombstoned_bulk(nodes)
    dt = (time.perf_counter() - t0) / 256
    emit(event="hnsw_delete_bulk", ms_per_delete=round(dt * 1e3, 2),
         batch=256)


def _run_updated_index(args, emit):
    """BM_VecSimUpdatedIndex (reference docs/benchmarks.md:120-143): flat +
    HNSW indexes of N fp32 vectors; every label overwritten with a new
    vector; memory and TopK (time + recall) measured before and after."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    import vectorsimilarity_tpu as vs
    from vectorsimilarity_tpu.indexes.hnsw import HNSWIndex
    from vectorsimilarity_tpu.types import HNSWParams

    n, dim, B = args.updated_n, args.dim, min(args.queries, 32)
    emit(event="updated_config", n=n, dim=dim, device=str(jax.devices()[0]))

    # Embedding-like data (intrinsic dim ~48), same as the main sweep: on
    # raw gaussian clouds cosine distances concentrate and ranks 11..100
    # are numerical ties, so set-recall@100 vs a tie-broken ground truth
    # collapses for ANY correct search — a dataset artifact, not a search
    # property (the reference benchmarks this config on dbpedia).
    from vectorsimilarity_tpu.utils.synthetic import embedding_like

    # One generation call = one shared projection: originals, overwrites,
    # and queries must come from the SAME corpus distribution.
    allrows = embedding_like(jax.random.PRNGKey(7), 2 * n + B, dim,
                             intrinsic_dim=48)
    d1, d2, queries = allrows[:n], allrows[n:2 * n], np.asarray(allrows[2 * n:])
    host1, host2 = np.asarray(d1), np.asarray(d2)
    # The slices above are independent device buffers; free the combined
    # generation buffer (4.3 GB at 500k x 768 with lane padding) — at
    # 500k the run otherwise OOMs when the HNSW ground-truth index comes up.
    del allrows

    # ---- flat ----
    bf = vs.create_index(vs.VecSimParams(algo=vs.VecSimAlgo.BF, bfParams=vs.BFParams(
        type=vs.VecSimType.FLOAT32, dim=dim, metric=vs.VecSimMetric.Cosine)))
    bf.add_vector_batch(host1, list(range(n)))
    # Warm BEFORE the memory reading: the first query materializes the
    # device array (host mirror + device buffer are both charged), so a
    # pre-query "before" vs post-query "after" reads as phantom 2x growth.
    bf.topk_query_batch(queries, 10)
    emit(event="updated_bf_memory", phase="before", bytes=bf.stats_info().memory)
    for k in (10, 100, 500):
        bf.topk_query_batch(queries, k)
        t0 = time.perf_counter()
        bf.topk_query_batch(queries, k)
        emit(event="updated_bf_topk", phase="before", k=k,
             ms=round((time.perf_counter() - t0) / B * 1e3, 3))
    bf.add_vector_batch(host2, list(range(n)))  # overwrite every label
    assert bf.index_size == n
    emit(event="updated_bf_memory", phase="after", bytes=bf.stats_info().memory)
    for k in (10, 100, 500):
        bf.topk_query_batch(queries, k)  # absorb the one-time re-sync upload
        t0 = time.perf_counter()
        bf.topk_query_batch(queries, k)
        emit(event="updated_bf_topk", phase="after", k=k,
             ms=round((time.perf_counter() - t0) / B * 1e3, 3))

    # ---- HNSW ----
    # Free the flat index before the graph phase: its device store is
    # dead weight (1.6-2.1 GB at 500k) and both phases never overlap in
    # the reference protocol either.
    del bf

    def gt_for_store():
        """Exact ground truth sharing the HNSW store's device buffer.

        The graph store already holds the normalized rows, so the BF GT
        index ADOPTS that buffer (zero-copy, like hnsw_build_bench) —
        re-normalizing a fresh padded copy here cost +4 GB and OOMed the
        500k config."""
        g = vs.create_index(vs.VecSimParams(algo=vs.VecSimAlgo.BF, bfParams=vs.BFParams(
            type=vs.VecSimType.FLOAT32, dim=dim, metric=vs.VecSimMetric.Cosine)))
        g.store.adopt_device({"data": hn.store._device["data"]}, count=n)
        g.labels.label_to_id = {i: i for i in range(n)}
        g.store.host["label"][:n] = np.arange(n, dtype=np.int64)
        return [set(r.ids[:100].tolist()) for r in g.topk_query_batch(queries, 100)]

    hn = HNSWIndex(HNSWParams(
        type=vs.VecSimType.FLOAT32, dim=dim, metric=vs.VecSimMetric.Cosine,
        M=16, efConstruction=200, initialCapacity=n))
    batch = args.build_batch
    t0 = time.perf_counter()
    # Initial build device-resident (d1 lives on device already); the
    # OVERWRITE below is the measured operation and stays on the
    # incremental host API, matching BM_VecSimUpdatedIndex's protocol.
    hn.bulk_build_device(d1, n=n, batch=1024, scan_batches=4)
    del d1  # the store owns its normalized copy now
    emit(event="updated_hnsw_build", phase="before",
         seconds=round(time.perf_counter() - t0, 1))

    def sweep(phase, gt):
        for ef, k in ((10, 10), (200, 10), (100, 100), (200, 100), (500, 500)):
            p = vs.VecSimQueryParams()
            p.hnswRuntimeParams.efRuntime = ef
            hn.topk_query_batch(queries, k, p)
            t0 = time.perf_counter()
            reps = hn.topk_query_batch(queries, k, p)
            dt = (time.perf_counter() - t0) / B
            kk = min(k, 100)
            rec = np.mean([
                len(set(r.ids[:kk].tolist()) & g) / kk for r, g in zip(reps, gt)])
            emit(event="updated_hnsw_topk", phase=phase, ef=ef, k=k,
                 ms=round(dt * 1e3, 3), recall=round(float(rec), 4))

    emit(event="updated_hnsw_memory", phase="before", bytes=hn.stats_info().memory)
    sweep("before", gt_for_store())
    t0 = time.perf_counter()
    for s in range(0, n, batch):
        hn.add_vector_batch(host2[s:s + batch], list(range(s, min(s + batch, n))))
    emit(event="updated_hnsw_overwrite", seconds=round(time.perf_counter() - t0, 1),
         vectors_per_sec=round(n / (time.perf_counter() - t0), 1))
    assert hn.index_size == n
    emit(event="updated_hnsw_memory", phase="after", bytes=hn.stats_info().memory)
    sweep("after", gt_for_store())


if __name__ == "__main__":
    main()
