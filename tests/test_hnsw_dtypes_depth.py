"""Depth tests the reference covers but round 1 did not: HNSW over
fp16/bf16/uint8 stores, multi-value add/delete/range cycles
(``test_hnsw_multi.cpp``), batch iteration under concurrent mutation, and
large add/delete churn (the reference's 1024-op cycles at size).
"""

import numpy as np
import pytest

import vectorsimilarity_tpu as vs
from vectorsimilarity_tpu.indexes.hnsw import HNSWIndex
from vectorsimilarity_tpu.types import HNSWParams, VecSimMetric, VecSimType, numpy_dtype
from vectorsimilarity_tpu.utils.serializer import check_integrity


def _mk(vtype, dim=24, metric=VecSimMetric.L2, multi=False, M=8, efc=60, n=0):
    return HNSWIndex(HNSWParams(
        type=vtype, dim=dim, metric=metric, multi=multi,
        M=M, efConstruction=efc, initialCapacity=n))


def _query(idx, q, k, ef=80):
    p = vs.VecSimQueryParams()
    p.hnswRuntimeParams.efRuntime = ef
    return idx.topk_query_batch(np.atleast_2d(q), k, p)


@pytest.mark.parametrize("vtype", [VecSimType.FLOAT16, VecSimType.BFLOAT16,
                                   VecSimType.UINT8])
@pytest.mark.parametrize("metric", [VecSimMetric.L2, VecSimMetric.Cosine])
def test_hnsw_dtype_recall(vtype, metric):
    rng = np.random.default_rng(20)
    N, D, k = 1200, 24, 10
    if vtype == VecSimType.UINT8:
        data = rng.integers(0, 200, size=(N, D)).astype(np.uint8)
        f = data.astype(np.float64)
    else:
        raw = rng.standard_normal((N, D)).astype(np.float32)
        data = raw.astype(numpy_dtype(vtype))
        f = data.astype(np.float64)  # ground truth in the STORED precision
    idx = _mk(vtype, dim=D, metric=metric, n=N)
    idx.add_vector_batch(data, list(range(N)))
    assert idx.index_size == N

    if metric == VecSimMetric.Cosine:
        fn = f / np.linalg.norm(f, axis=1, keepdims=True)
        scores = 1.0 - fn[:32] @ fn.T  # [32, N]
    else:
        scores = ((f[:32, None] - f[None]) ** 2).sum(-1)  # [32, N]
    gt = np.argsort(scores, axis=1)[:, :k]
    hits = 0
    for b, reply in enumerate(_query(idx, data[:32], k)):
        hits += len(set(int(x) for x in reply.ids) & set(gt[b].tolist()))
    assert hits / (32 * k) >= 0.85, f"{vtype} {metric}: {hits / (32 * k)}"


def test_multi_add_delete_range_cycles():
    """Multi-value lifecycle depth (test_hnsw_multi.cpp): repeated
    add/delete of labels with several vectors each, range queries dedup by
    label, and final integrity."""
    rng = np.random.default_rng(21)
    D = 16
    idx = _mk(VecSimType.FLOAT32, dim=D, multi=True, n=1024)
    per = 3
    for cycle in range(3):
        data = rng.standard_normal((120 * per, D)).astype(np.float32)
        labels = [i // per for i in range(120 * per)]
        idx.add_vector_batch(data, labels)
        assert idx.index_label_count == 120
        assert idx.index_size == 120 * per
        # range around one stored vector: label appears once
        rep = idx.range_query(data[0], 2.0)
        ids = rep.ids.tolist()
        assert len(ids) == len(set(ids))
        assert 0 in ids
        # distance = min over the label's vectors
        d = idx.get_distance_from(7, data[7 * per])
        assert d == pytest.approx(0.0, abs=1e-4)
        for lab in range(120):
            assert idx.delete_vector(lab) == per
        assert idx.index_size == 0 and idx.index_label_count == 0
    assert check_integrity(idx)


def test_batch_iterator_under_mutation():
    """The BF/HNSW batch iterators snapshot their view; mutating the index
    mid-iteration must neither crash nor return deleted labels from
    batches produced AFTER the delete (reference allows stale results only
    for already-produced batches)."""
    rng = np.random.default_rng(22)
    N, D = 600, 16
    data = rng.standard_normal((N, D)).astype(np.float32)
    idx = _mk(VecSimType.FLOAT32, dim=D, n=N)
    idx.add_vector_batch(data, list(range(N)))
    q = data[5]
    it = idx.new_batch_iterator(q)
    first = it.get_next_results(10)
    assert len(first) == 10
    # mutate: delete some labels including possible frontier members
    for lab in range(0, 40):
        idx.delete_vector(lab)
    more = rng.standard_normal((20, D)).astype(np.float32)
    idx.add_vector_batch(more, list(range(N, N + 20)))
    # iterator keeps producing globally-ordered batches without crashing
    seen = set(first.ids.tolist())
    while not it.is_depleted():
        batch = it.get_next_results(50)
        if not len(batch):
            break
        for lab in batch.ids.tolist():
            assert lab not in seen, "duplicate label across batches"
            seen.add(lab)
    assert len(seen) >= N - 40 - 10
    assert check_integrity(idx)


def test_churn_cycles_at_size():
    """1024 interleaved add/delete ops on a standing index (the
    reference's add/delete cycle benchmarks as a correctness test)."""
    rng = np.random.default_rng(23)
    N, D = 1500, 16
    data = rng.standard_normal((N, D)).astype(np.float32)
    idx = _mk(VecSimType.FLOAT32, dim=D, n=N)
    idx.add_vector_batch(data, list(range(N)))
    next_label = N
    live = set(range(N))
    for op in range(1024):
        if op % 2 == 0:
            v = rng.standard_normal(D).astype(np.float32)
            idx.add_vector(v, next_label)
            live.add(next_label)
            next_label += 1
        else:
            victim = min(live)
            assert idx.delete_vector(victim) == 1
            live.remove(victim)
    assert idx.index_size == len(live)
    assert check_integrity(idx)
    # surviving vectors still findable
    probe = [l for l in sorted(live) if l < N][:16]
    hits = 0
    for lab in probe:
        rep = _query(idx, data[lab], 1)[0]
        hits += int(rep.ids[0]) == lab
    assert hits >= 14
