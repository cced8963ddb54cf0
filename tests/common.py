"""Shared test helpers: numpy ground-truth distances and recall.

The analog of the reference's flow-test helpers
(``tests/flow/common.py:115`` ``get_ground_truth_results``): ground truth is
computed with float64 numpy, recall = |approx ∩ GT| / |GT|
(``docs/benchmarks.md:15-18``).
"""

from __future__ import annotations

import numpy as np

from vectorsimilarity_tpu.types import VecSimMetric


def gt_scores(queries: np.ndarray, data: np.ndarray, metric: VecSimMetric,
              data_norms=None, query_norms=None) -> np.ndarray:
    """Float64 reference distance matrix [B, N] matching the score conventions."""
    q = np.asarray(queries, dtype=np.float64)
    v = np.asarray(data, dtype=np.float64)
    metric = VecSimMetric(metric)
    if metric == VecSimMetric.L2:
        return ((q[:, None, :] - v[None, :, :]) ** 2).sum(-1)
    ip = q @ v.T
    if metric == VecSimMetric.Cosine and data_norms is not None:
        return 1.0 - ip / (np.asarray(query_norms, dtype=np.float64)[:, None]
                           * np.asarray(data_norms, dtype=np.float64)[None, :])
    return 1.0 - ip


def gt_topk(queries, data, metric, k, labels=None, **kw):
    """Ground-truth top-k labels per query (label = row index by default)."""
    s = gt_scores(queries, data, metric, **kw)
    order = np.argsort(s, axis=1, kind="stable")[:, :k]
    if labels is not None:
        return np.asarray(labels)[order]
    return order


def recall(approx_ids, gt_ids) -> float:
    """|approx ∩ GT| / |GT| averaged over queries."""
    total = 0.0
    for a, g in zip(approx_ids, gt_ids):
        gs = set(int(x) for x in g)
        total += len(gs.intersection(int(x) for x in a)) / max(len(gs), 1)
    return total / len(gt_ids)


def normalize_rows(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)
