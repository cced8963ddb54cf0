"""In-flight timeout semantics: bounded device segments + partial results.

The reference checks ``VECSIM_TIMEOUT(ctx)`` inside every hot loop
(``vec_sim_common.h:497``, ``brute_force.h:265``, ``hnsw.h:1923``) and
returns what it has with ``VecSim_QueryReply_TimedOut``. The TPU engine runs
timeout-context queries as bounded device dispatches (BF: row segments,
HNSW: beam-iteration segments) polling the callback between dispatches —
a deadline now bounds DEVICE work, not just host checkpoints.
"""

import numpy as np
import pytest

import vectorsimilarity_tpu as vs
from vectorsimilarity_tpu import config
from vectorsimilarity_tpu.types import (
    BFParams, HNSWParams, VecSimAlgo, VecSimMetric, VecSimParams, VecSimType,
    VecSimQueryParams, VecSimQueryReplyCode,
)


@pytest.fixture(autouse=True)
def _restore_cb():
    yield
    vs.set_timeout_callback(lambda ctx: 0)


def _bf_index(n, dim, seed=0):
    idx = vs.create_index(VecSimParams(
        algo=VecSimAlgo.BF,
        bfParams=BFParams(type=VecSimType.FLOAT32, dim=dim, metric=VecSimMetric.L2),
    ))
    rng = np.random.default_rng(seed)
    data = rng.standard_normal((n, dim)).astype(np.float32)
    for i in range(0, n, 4096):
        idx.add_vector_batch(data[i : i + 4096], list(range(i, min(i + 4096, n))))
    return idx, data


def test_bf_segmented_partial_prefix(monkeypatch):
    # 128k rows = 2 scan chunks; expire after the first segment -> the reply
    # holds only prefix rows and is flagged TimedOut.
    n, dim = 1 << 17, 16
    idx, data = _bf_index(n, dim)
    monkeypatch.setattr(config, "timeout_poll_rows", 1 << 16)

    # Plant the best match in the SECOND half so a full scan must find it.
    target = n - 5
    q = data[target]

    calls = {"n": 0}

    def cb(ctx):
        if ctx != "q1":
            return 0
        calls["n"] += 1
        return 1 if calls["n"] >= 2 else 0

    vs.set_timeout_callback(cb)
    rep = idx.topk_query(q, 10, VecSimQueryParams(timeoutCtx="q1"))
    assert rep.code == VecSimQueryReplyCode.TimedOut
    labels = rep.ids.tolist()
    assert labels, "partial results expected, not empty"
    assert all(l < (1 << 16) for l in labels), "must only contain the scanned prefix"

    # Without a timeout ctx the same query finds the planted match.
    rep2 = idx.topk_query(q, 10)
    assert rep2.code == VecSimQueryReplyCode.OK
    assert rep2.ids.tolist()[0] == target


def test_bf_no_ctx_single_dispatch():
    n, dim = 4096, 16
    idx, data = _bf_index(n, dim)
    vs.set_timeout_callback(lambda ctx: 1)  # fires only when ctx queries ask
    rep = idx.topk_query(data[0], 5)  # no timeoutCtx -> callback consulted
    # contract: with no params the budget still polls the global callback
    assert rep.code == VecSimQueryReplyCode.TimedOut


def test_hnsw_segmented_partial():
    n, dim = 3000, 24
    idx = vs.create_index(VecSimParams(
        algo=VecSimAlgo.HNSWLIB,
        hnswParams=HNSWParams(type=VecSimType.FLOAT32, dim=dim,
                              metric=VecSimMetric.L2, M=8, efConstruction=40),
    ))
    rng = np.random.default_rng(1)
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx.add_vector_batch(data, list(range(n)))

    calls = {"n": 0}

    def cb(ctx):
        if ctx != "deadline":
            return 0
        calls["n"] += 1
        return 1 if calls["n"] >= 2 else 0

    vs.set_timeout_callback(cb)
    rep = idx.topk_query(data[7], 10, VecSimQueryParams(timeoutCtx="deadline",))
    assert rep.code == VecSimQueryReplyCode.TimedOut
    # The first beam segment ran to its iteration cap -> partial results.
    assert len(rep) > 0
    assert calls["n"] >= 2


def test_hnsw_resumable_frontier_reuse(monkeypatch):
    """Deep paging resumes the device beam state instead of re-searching."""
    from vectorsimilarity_tpu.indexes.hnsw import HNSWIndex

    n, dim = 2000, 24
    idx = vs.create_index(VecSimParams(
        algo=VecSimAlgo.HNSWLIB,
        hnswParams=HNSWParams(type=VecSimType.FLOAT32, dim=dim,
                              metric=VecSimMetric.L2, M=8, efConstruction=40,
                              efRuntime=32),
    ))
    rng = np.random.default_rng(2)
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx.add_vector_batch(data, list(range(n)))

    seen_states = []
    orig = HNSWIndex._device_search

    def spy(self, qd, qn, k, ef, **kw):
        seen_states.append(kw.get("init_state") is not None)
        return orig(self, qd, qn, k, ef, **kw)

    monkeypatch.setattr(HNSWIndex, "_device_search", spy)

    it = idx.new_batch_iterator(data[3])
    got = []
    for _ in range(12):
        if it.is_depleted():
            break
        rep = it.get_next_results(50)
        got.extend(rep.ids.tolist())
    assert len(got) == len(set(got)), "batches must be disjoint"
    assert len(got) >= 500
    # At least one refill must have RESUMED carried state.
    assert any(seen_states), f"no resumed search in {seen_states}"

    # Quality: union of the first 100 served must cover the true top-20.
    d = ((data - data[3]) ** 2).sum(1)
    top20 = set(np.argsort(d)[:20].tolist())
    assert len(top20 & set(got[:100])) >= 18
