#!/usr/bin/env python
"""HNSW query-path tuning sweep on a prebuilt graph.

Loads a reference-format V3/V4 graph file (e.g. the 1M crosscheck export)
and sweeps the query-side knobs — beam expansion, bf16 navigation rerank,
batch size, ef — printing one JSON line per cell: recall@10 vs the supplied
exact ground truth and QPS over device-staged query batches (serving shape;
the axon relay's host link otherwise caps the measurement).

Usage (after benchmarks/ref_crosscheck stage 1):
  python benchmarks/hnsw_query_tune.py /tmp/cc1m_ours.hnsw \
      --q /tmp/cc1m_q.f32 --gt /tmp/cc1m_gt.i32 \
      --efs 10,100,200 --batches 256,1024 --expands 1,4 --navs 0,1
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

DIM, K = 768, 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("graph")
    ap.add_argument("--q", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--dim", type=int, default=DIM)
    ap.add_argument("--k", type=int, default=K)
    ap.add_argument("--efs", default="10,100,200")
    ap.add_argument("--batches", default="256")
    ap.add_argument("--expands", default="1,4")
    ap.add_argument("--navs", default="0,1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--thru", action="store_true",
                    help="measure through search_knn_device (includes the "
                    "auto sub-batch splitter + pipelined dispatches) "
                    "instead of one raw _device_search dispatch")
    ap.add_argument("--regen", action="store_true",
                    help="adopt device-regenerated vectors (embedding_like "
                    "seed 0, the crosscheck recipe) instead of uploading the "
                    "file's ~3 GB through the relay host link")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vectorsimilarity_tpu import config
    from vectorsimilarity_tpu.utils.hnsw_file_format import load_hnsw_file
    from vectorsimilarity_tpu.utils.synthetic import embedding_like

    queries = np.fromfile(args.q, np.float32).reshape(-1, args.dim)
    gt = np.fromfile(args.gt, np.int32).reshape(len(queries), -1)[:, : args.k]

    dev_data = None
    if args.regen:
        dev_data = lambda cap, count, dim: embedding_like(
            jax.random.PRNGKey(0), cap, dim, intrinsic_dim=48)

    t0 = time.perf_counter()
    idx = load_hnsw_file(args.graph, device_data=dev_data)
    print(f"# loaded n={idx.store.count} in {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)

    def stage(batch):
        """Device-staged [batch, dim] queries (tile the query file)."""
        reps = -(-batch // len(queries))
        q = np.tile(queries, (reps, 1))[:batch]
        qp, qn = idx.preprocess_queries(q)
        qd = jnp.asarray(qp)
        qnd = None if qn is None else jnp.asarray(qn)
        # force materialization through the relay before timing
        _ = np.asarray(qd[0, :1])
        return qd, qnd, q

    for batch in [int(x) for x in args.batches.split(",")]:
        qd, qnd, qhost = stage(batch)
        for expand in [x if x == "auto" else int(x)
                       for x in args.expands.split(",")]:
            for nav in [int(x) for x in args.navs.split(",")]:
                config.search_beam_expand = expand
                config.search_nav_bf16 = bool(nav)
                idx._nav_cache = None
                for ef in [int(x) for x in args.efs.split(",")]:
                    if args.thru:
                        run = lambda: idx.search_knn_device(qd, args.k, ef, qnd)
                    else:
                        run = lambda: idx._device_search(qd, qnd, args.k, ef)
                    # compile + warm
                    bd, bi = run()
                    _ = np.asarray(bi[:1, :1])
                    best = np.inf
                    for _ in range(args.reps):
                        t1 = time.perf_counter()
                        bd, bi = run()
                        ids = np.asarray(bi)  # host read = device barrier
                        best = min(best, time.perf_counter() - t1)
                    nq = len(queries)
                    rec = float(np.mean([
                        len(set(ids[b][: args.k].tolist())
                            & set(gt[b % nq].tolist())) / args.k
                        for b in range(min(batch, nq))
                    ]))
                    print(json.dumps({
                        "event": "query_tune", "batch": batch, "thru": args.thru,
                        "expand": expand, "nav_bf16": bool(nav), "ef": ef,
                        "recall": round(rec, 4),
                        "qps": round(batch / best, 1),
                        "ms_per_batch": round(best * 1e3, 1),
                    }), flush=True)


if __name__ == "__main__":
    main()
