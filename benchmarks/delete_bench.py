#!/usr/bin/env python
"""HNSW delete-path micro-bench: eager per-op vs tombstone + bulk repair.

The reference deletes eagerly per label (repairNodeConnections per
delete); through the axon relay each eager delete pays a referrer scan
plus a re-prune dispatch (~1.3 s/op measured at 200k x 768). The
TPU-native production path is the tiered-GC one: ``mark_delete``
tombstones (host flag writes) and ONE ``delete_tombstoned_bulk``
repairs + compacts the whole set in a few batched dispatches
(hnsw_tiered.h:332-362 executeReadySwapJobs semantics).

Usage: python benchmarks/delete_bench.py [--n 100000] [--dim 768]
       [--eager 64] [--bulk 1024]
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
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--eager", type=int, default=64)
    ap.add_argument("--bulk", type=int, default=1024)
    args = ap.parse_args()

    import jax

    from vectorsimilarity_tpu.indexes.hnsw import HNSWIndex
    from vectorsimilarity_tpu.types import HNSWParams, VecSimMetric, VecSimType
    from vectorsimilarity_tpu.utils.synthetic import embedding_like

    n, dim = args.n, args.dim
    emit(event="config", n=n, dim=dim, eager=args.eager, bulk=args.bulk,
         device=str(jax.devices()[0]))

    data = embedding_like(jax.random.PRNGKey(0), n, dim, intrinsic_dim=48)
    idx = HNSWIndex(HNSWParams(
        type=VecSimType.FLOAT32, dim=dim, metric=VecSimMetric.Cosine,
        M=16, efConstruction=200, initialCapacity=n))
    t0 = time.perf_counter()
    idx.bulk_build_device(data, n=n, batch=1024, scan_batches=4,
                          assume_normalized=True)
    emit(event="build", seconds=round(time.perf_counter() - t0, 1))

    rng = np.random.default_rng(5)
    # Delete labels from the middle of the id space (worst case: swap
    # rewrites + referrer repairs all fire).
    eager_labels = rng.choice(n, size=args.eager, replace=False).tolist()
    # Warm one delete (compiles the re-prune program).
    idx.delete_vector(int(eager_labels[0]))
    t0 = time.perf_counter()
    for lab in eager_labels[1:]:
        idx.delete_vector(int(lab))
    dt = (time.perf_counter() - t0) / max(len(eager_labels) - 1, 1)
    emit(event="hnsw_delete_eager", ms_per_delete=round(dt * 1e3, 2),
         ops=len(eager_labels) - 1)

    remaining = sorted(set(range(n)) - set(int(x) for x in eager_labels))
    bulk_labels = rng.choice(remaining, size=args.bulk, replace=False)
    t0 = time.perf_counter()
    nodes = []
    for lab in bulk_labels:
        nodes.extend(idx.mark_delete(int(lab)))
    t_mark = time.perf_counter() - t0
    removed = idx.delete_tombstoned_bulk(nodes)
    dt = (time.perf_counter() - t0) / len(bulk_labels)
    emit(event="hnsw_delete_bulk", ms_per_delete=round(dt * 1e3, 3),
         mark_ms_per_op=round(t_mark / len(bulk_labels) * 1e3, 3),
         ops=len(bulk_labels), removed=int(removed))

    # Sanity: the deleted labels are gone, a survivor query still works.
    q = np.asarray(data[:1])
    rep = idx.topk_query(q[0], 10)
    assert len(rep) == 10
    gone = set(int(x) for x in eager_labels) | set(int(x) for x in bulk_labels)
    assert not (set(rep.ids) & gone)
    emit(event="sanity", ok=True)


if __name__ == "__main__":
    main()
