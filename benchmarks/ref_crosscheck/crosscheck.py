#!/usr/bin/env python
"""Graph-quality cross-calibration against the REFERENCE implementation on
identical data.

The reference's own HNSW (built from /root/reference sources by build.sh,
see ref_driver.cpp) and our device engine run on byte-identical fp32
vectors, queries, and exact ground truth, so recall numbers are directly
comparable — this is the apples-to-apples answer to "is the recall curve an
implementation gap or dataset hardness?"

Usage:
  python crosscheck.py dump [--n 100000]      # write data/queries/GT files
  ./build.sh && ./ref_driver /tmp/cc_data.f32 100000 768 /tmp/cc_q.f32 256 \
      /tmp/cc_gt.i32 10 16 200 10,50,100,200,500 /tmp/cc_ref.hnsw
  python crosscheck.py ours [--n 100000]      # our device build + ef sweep
  python crosscheck.py cross /tmp/cc_ref.hnsw # our beam on the ref graph

Reference build entry points exercised by ref_driver: HNSWIndex_Single
(hnsw_single.h:15), addVector -> insertElementToGraph (hnsw.h:1548),
topKQuery (hnsw.h:1942), saveIndex V4 (hnsw_serializer_impl.h:43).
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

DIM, Q, K = 768, 256, 10
# File paths are set from --prefix in __main__ (defaults below keep the
# 100k invocation from the docs working verbatim).
DATA, QF, GTF = "/tmp/cc_data.f32", "/tmp/cc_q.f32", "/tmp/cc_gt.i32"


def _gen(n):
    """Identical generation recipe to bench.py / islands: embedding-like
    (intrinsic dim 48), seed 0 for data, seed 7 for queries."""
    import jax
    from vectorsimilarity_tpu.core.store import _bucket_capacity
    from vectorsimilarity_tpu.utils.synthetic import embedding_like

    cap = _bucket_capacity(n, 1024)
    data = np.asarray(
        embedding_like(jax.random.PRNGKey(0), cap, DIM, intrinsic_dim=48),
        np.float32)[:n]
    q = np.asarray(
        embedding_like(jax.random.PRNGKey(7), Q + cap, DIM,
                       intrinsic_dim=48)[cap:], np.float32)
    return data, q


def _recall(ids, gt):
    return float(np.mean([
        len(set(ids[b][:K].tolist()) & set(gt[b].tolist())) / K
        for b in range(gt.shape[0])]))


def cmd_dump(n):
    data, q = _gen(n)
    gt = np.argsort(1.0 - q @ data.T, axis=1)[:, :K].astype(np.int32)
    data.tofile(DATA), q.tofile(QF), gt.tofile(GTF)
    print(f"# wrote {DATA} {QF} {GTF} (n={n})", file=sys.stderr)


def cmd_ours(n, efs, save=None):
    import jax
    from vectorsimilarity_tpu.core.store import _bucket_capacity
    from vectorsimilarity_tpu.indexes.hnsw import HNSWIndex
    from vectorsimilarity_tpu.types import HNSWParams, VecSimMetric, VecSimType
    from vectorsimilarity_tpu.utils.synthetic import embedding_like

    cap = _bucket_capacity(n, 1024)
    data = embedding_like(jax.random.PRNGKey(0), cap, DIM, intrinsic_dim=48)
    queries = np.fromfile(QF, np.float32).reshape(Q, DIM)
    gt = np.fromfile(GTF, np.int32).reshape(Q, K)

    idx = HNSWIndex(HNSWParams(type=VecSimType.FLOAT32, dim=DIM,
                               metric=VecSimMetric.Cosine, M=16,
                               efConstruction=200, initialCapacity=n))
    t0 = time.perf_counter()
    idx.bulk_build_device(data, n=n, batch=1024, assume_normalized=True)
    dt = time.perf_counter() - t0
    print(json.dumps({"event": "our_build", "n": n, "M": 16, "efC": 200,
                      "seconds": round(dt, 1),
                      "vectors_per_sec": round(n / dt, 1)}), flush=True)
    for ef in efs:
        tq = time.perf_counter()
        _, ids = idx.search_knn(queries, K, ef)
        qs = time.perf_counter() - tq
        print(json.dumps({"event": "our_topk", "ef": ef, "k": K,
                          "recall": round(_recall(np.asarray(ids), gt), 4),
                          "qps": round(Q / qs, 1)}), flush=True)
    if save:
        from vectorsimilarity_tpu.utils.hnsw_file_format import save_hnsw_file

        # The stored vectors are byte-identical to the dump (generated with
        # the same keys and adopted un-copied via assume_normalized), so the
        # export reads them from the dump file instead of pulling ~3 GB
        # through the relay (which stalls; store.pull_host docstring).
        vecs = np.fromfile(DATA, np.float32).reshape(n, DIM)
        save_hnsw_file(idx, save, vectors_from=vecs)
        print(f"# saved our graph to {save}", file=sys.stderr, flush=True)


def cmd_cross(path, efs, regen=False):
    from vectorsimilarity_tpu.utils.hnsw_file_format import load_hnsw_file

    queries = np.fromfile(QF, np.float32).reshape(Q, DIM)
    gt = np.fromfile(GTF, np.int32).reshape(Q, K)
    dev_data = None
    if regen:
        # The stored vectors are byte-identical to the dump recipe (both
        # engines normalize an already-normalized embedding_like draw), so
        # regenerate them on device instead of uploading ~3 GB through the
        # relay host link; only links/labels upload.
        import jax
        from vectorsimilarity_tpu.utils.synthetic import embedding_like

        dev_data = lambda cap, count, dim: embedding_like(
            jax.random.PRNGKey(0), cap, dim, intrinsic_dim=48)
    idx = load_hnsw_file(path, device_data=dev_data)
    print(f"# loaded n={idx.store.count} entry={idx.entry_id} "
          f"max_level={idx.max_level}", file=sys.stderr, flush=True)
    for ef in efs:
        _, ids = idx.search_knn(queries, K, ef)
        print(json.dumps({"event": "our_beam_on_ref_graph", "ef": ef,
                          "recall": round(_recall(np.asarray(ids), gt), 4)}),
              flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["dump", "ours", "cross"])
    ap.add_argument("ref_file", nargs="?", default="/tmp/cc_ref.hnsw")
    ap.add_argument("--n", type=int, default=100000)
    ap.add_argument("--efs", type=str, default="10,50,100,200,500")
    ap.add_argument("--prefix", type=str, default="/tmp/cc_",
                    help="data/query/GT file prefix (vary per scale)")
    ap.add_argument("--save", type=str, default=None,
                    help="ours: export the built graph (reference V4 binary)")
    ap.add_argument("--regen", action="store_true",
                    help="cross: adopt device-regenerated vectors instead of "
                    "uploading the file's data through the relay")
    args = ap.parse_args()
    DATA = args.prefix + "data.f32"
    QF = args.prefix + "q.f32"
    GTF = args.prefix + "gt.i32"
    efs = [int(x) for x in args.efs.split(",")]
    if args.cmd == "dump":
        cmd_dump(args.n)
    elif args.cmd == "ours":
        cmd_ours(args.n, efs, save=args.save)
    else:
        cmd_cross(args.ref_file, efs, regen=args.regen)
