#!/usr/bin/env python
"""Low-ef recall diagnostic: device beam vs a faithful host replica of the
reference's sequential searchLayer ON THE SAME GRAPH.

The reference search (hnsw.h:664-703 searchLayer + 1872-1940 bottom-layer)
is a candidate min-heap + ef-bounded result max-heap with termination
``best candidate > worst result (when full)``. This script builds a graph
with the device pipeline, then answers the question VERDICT r2 asked: is the
low-ef recall gap a *search-semantics* bug (device beam loses candidates the
heap search would expand) or a *graph-quality* artifact of batched
construction? It runs both searchers on identical links and reports recall
against exact ground truth plus per-query expansion counts.

Usage: python benchmarks/search_diag.py [--n 20000] [--dim 768] [--ef 10]
"""

from __future__ import annotations

import argparse
import heapq
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ref_search(query, entry, links0, upper_links, upper_row, vec_of_upper,
               levels_max, data, ef, k):
    """Sequential reference semantics: greedy descent on upper levels, then
    searchLayer at level 0. Returns (ids, n_expanded)."""

    def dist(i):
        return 1.0 - float(data[i] @ query)

    cur = entry
    cur_d = dist(cur)
    for l in range(levels_max, 0, -1):
        improved = True
        while improved:
            improved = False
            r = upper_row[cur]
            if r < 0:
                break
            for nb in upper_links[r, l - 1]:
                if nb < 0:
                    continue
                d = dist(nb)
                if d < cur_d:
                    cur, cur_d, improved = int(nb), d, True
    # searchLayer level 0 (hnsw.h:664-703): candidates min-heap, results
    # bounded max-heap of ef, visited set.
    visited = {cur}
    candidates = [(cur_d, cur)]  # min-heap
    results = [(-cur_d, cur)]  # max-heap by negated distance
    n_exp = 0
    while candidates:
        d, c = heapq.heappop(candidates)
        if len(results) >= ef and d > -results[0][0]:
            break
        n_exp += 1
        for nb in links0[c]:
            if nb < 0 or nb in visited:
                continue
            visited.add(int(nb))
            nd = dist(nb)
            if len(results) < ef or nd < -results[0][0]:
                heapq.heappush(candidates, (nd, int(nb)))
                heapq.heappush(results, (-nd, int(nb)))
                if len(results) > ef:
                    heapq.heappop(results)
    out = sorted(((-nd, i) for nd, i in results))
    return [i for _, i in out[:k]], n_exp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--efc", type=int, default=200)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--efs", type=str, default="10,20,50,100,200")
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vectorsimilarity_tpu.indexes.hnsw import HNSWIndex
    from vectorsimilarity_tpu.types import HNSWParams, VecSimMetric, VecSimType
    from vectorsimilarity_tpu.utils.synthetic import embedding_like
    from vectorsimilarity_tpu.core.store import _bucket_capacity

    n, dim = args.n, args.dim
    cap = _bucket_capacity(n, 1024)
    data = embedding_like(jax.random.PRNGKey(0), cap, dim, intrinsic_dim=48)
    q = embedding_like(jax.random.PRNGKey(7), args.queries + cap, dim,
                       intrinsic_dim=48)[cap:]
    _ = float(jnp.sum(data[:: max(cap // 16, 1), 0]))

    idx = HNSWIndex(HNSWParams(type=VecSimType.FLOAT32, dim=dim,
                               metric=VecSimMetric.Cosine, M=args.m,
                               efConstruction=args.efc, initialCapacity=n))
    t0 = time.perf_counter()
    idx.bulk_build_device(data, n=n, batch=args.batch)
    print(f"# build {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)

    # Host copies of everything both searchers need.
    idx.store.pull_host("data")
    idx.store.pull_host()
    idx.upper.pull_host()
    data_h = idx.store.host["data"][:n].astype(np.float32)
    links0 = idx.store.host["links0"][:n]
    upper_row = idx.store.host["upper_row"][:n]
    u_n = idx.upper.count
    upper_links = idx.upper.host["links"][:u_n]
    vec_of_upper = idx.upper.host["vec"][:u_n]
    queries = np.asarray(q, np.float32)

    # Exact GT.
    sc = 1.0 - queries @ data_h.T
    gt = np.argsort(sc, axis=1)[:, : args.k]

    for ef in (int(x) for x in args.efs.split(",")):
        # Host reference semantics.
        t0 = time.perf_counter()
        rec_ref, exp_ref = [], []
        for b in range(len(queries)):
            ids, ne = ref_search(queries[b], idx.entry_id, links0, upper_links,
                                 upper_row, vec_of_upper, idx.max_level,
                                 data_h, ef, args.k)
            rec_ref.append(len(set(ids) & set(gt[b].tolist())) / args.k)
            exp_ref.append(ne)
        t_ref = time.perf_counter() - t0
        # Device beam.
        dists, ids = idx.search_knn(queries, args.k, ef)
        rec_dev = np.mean([
            len(set(ids[b][: args.k].tolist()) & set(gt[b].tolist())) / args.k
            for b in range(len(queries))
        ])
        print(json.dumps({
            "ef": ef,
            "recall_host_ref": round(float(np.mean(rec_ref)), 4),
            "recall_device_beam": round(float(rec_dev), 4),
            "mean_expanded_ref": round(float(np.mean(exp_ref)), 1),
            "host_ref_s": round(t_ref, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
