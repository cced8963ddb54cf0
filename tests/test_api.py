"""C-API veneer, ad-hoc context, info iterator, resolver codes — analog of
``tests/unit/test_common.cpp`` API-surface checks.
"""

import numpy as np
import pytest

import vectorsimilarity_tpu.api as capi
from vectorsimilarity_tpu import (
    BFParams,
    HNSWParams,
    QueryReplyOrder,
    VecSimAlgo,
    VecSimMetric,
    VecSimParams,
    VecSimResolveCode,
    VecSimType,
    VecsimQueryType,
)


def _bf_params(dim=8, multi=False):
    return VecSimParams(
        algo=VecSimAlgo.BF,
        bfParams=BFParams(type=VecSimType.FLOAT32, dim=dim, metric=VecSimMetric.L2, multi=multi),
    )


def test_c_api_roundtrip():
    idx = capi.VecSimIndex_New(_bf_params())
    data = np.random.default_rng(0).standard_normal((30, 8)).astype(np.float32)
    for i, v in enumerate(data):
        assert capi.VecSimIndex_AddVector(idx, v, i) == 1
    assert capi.VecSimIndex_IndexSize(idx) == 30
    rep = capi.VecSimIndex_TopKQuery(idx, data[4], 3)
    assert rep.ids[0] == 4
    rep_by_id = capi.VecSimIndex_TopKQuery(idx, data[4], 3, order=QueryReplyOrder.BY_ID)
    assert list(rep_by_id.ids) == sorted(rep_by_id.ids)
    assert capi.VecSimIndex_DeleteVector(idx, 4) == 1
    assert np.isnan(capi.VecSimIndex_GetDistanceFrom_Unsafe(idx, 4, data[4]))
    rep = capi.VecSimIndex_RangeQuery(idx, data[5], 0.1)
    assert 5 in rep.ids
    with pytest.raises(ValueError):
        capi.VecSimIndex_RangeQuery(idx, data[5], -1.0)


def test_adhoc_ctx_batch_distances():
    idx = capi.VecSimIndex_New(_bf_params())
    data = np.random.default_rng(1).standard_normal((10, 8)).astype(np.float32)
    for i, v in enumerate(data):
        idx.add_vector(v, i)
    q = data[0]
    ctx = capi.VecSimIndex_AdhocBfCtx_New(idx, q)
    d = capi.VecSimIndex_AdhocBfCtx_GetExactDistances(ctx, [0, 3, 7, 999])
    assert d[0] == pytest.approx(0.0, abs=1e-5)
    want3 = float(((data[3] - q) ** 2).sum())
    assert d[1] == pytest.approx(want3, rel=1e-4)
    assert np.isnan(d[3])
    assert capi.VecSimIndex_AdhocBfCtx_GetDistanceFrom(ctx, 7) == pytest.approx(
        float(((data[7] - q) ** 2).sum()), rel=1e-4
    )


def test_adhoc_ctx_multi_takes_min():
    idx = capi.VecSimIndex_New(_bf_params(dim=2, multi=True))
    idx.add_vector(np.array([0, 0], np.float32), 5)
    idx.add_vector(np.array([3, 4], np.float32), 5)
    ctx = capi.VecSimIndex_AdhocBfCtx_New(idx, np.array([3, 4], np.float32))
    assert ctx.get_distance(5) == pytest.approx(0.0)


def test_info_iterator_fields():
    idx = capi.VecSimIndex_New(
        VecSimParams(
            algo=VecSimAlgo.HNSWLIB,
            hnswParams=HNSWParams(type=VecSimType.FLOAT32, dim=8, metric=VecSimMetric.L2, M=8),
        )
    )
    idx.add_vector(np.zeros(8, np.float32), 1)
    fields = capi.VecSimIndex_DebugInfoIterator(idx)
    names = [f.name for f in fields]
    assert "commonInfo" in names
    assert "hnswInfo" in names
    assert "SHARED_MEMORY" in names
    common = next(f for f in fields if f.name == "commonInfo")
    sub = {x.name for x in common.value}
    assert "indexSize" in sub


def test_resolver_codes_via_api():
    idx = capi.VecSimIndex_New(_bf_params())
    code, qp = capi.VecSimIndex_ResolveParams(
        idx, [("BATCH_SIZE", "50")], VecsimQueryType.HYBRID
    )
    assert code == VecSimResolveCode.OK and qp.batchSize == 50
    code, _ = capi.VecSimIndex_ResolveParams(
        idx, [("BATCH_SIZE", "50")], VecsimQueryType.KNN
    )
    assert code == VecSimResolveCode.Err_InvalidPolicy_NHybrid
    code, _ = capi.VecSimIndex_ResolveParams(
        idx, [("HYBRID_POLICY", "adhoc_bf"), ("BATCH_SIZE", "10")], VecsimQueryType.HYBRID
    )
    assert code == VecSimResolveCode.Err_InvalidPolicy_AdHoc_With_BatchSize
    code, _ = capi.VecSimIndex_ResolveParams(
        idx, [("NOPE", "1")], VecsimQueryType.KNN
    )
    assert code == VecSimResolveCode.Err_UnknownParam


def test_query_blob_size():
    assert capi.VecSimParams_GetQueryBlobSize(VecSimType.FLOAT32, 10, VecSimMetric.L2) == 40
    assert capi.VecSimParams_GetQueryBlobSize(VecSimType.INT8, 10, VecSimMetric.Cosine) == 14
    assert capi.VecSimParams_GetQueryBlobSize(VecSimType.FLOAT16, 10, VecSimMetric.Cosine) == 20


def test_estimates_positive():
    p = _bf_params()
    assert capi.VecSimIndex_EstimateInitialSize(p) > 0
    assert capi.VecSimIndex_EstimateElementSize(p) > 0


def test_batch_iterator_api():
    idx = capi.VecSimIndex_New(_bf_params())
    for i in range(10):
        idx.add_vector(np.full(8, i, np.float32), i)
    it = capi.VecSimBatchIterator_New(idx, np.zeros(8, np.float32), None)
    assert capi.VecSimBatchIterator_HasNext(it)
    rep = capi.VecSimBatchIterator_Next(it, 4)
    assert len(rep) == 4
    capi.VecSimBatchIterator_Reset(it)
    rep2 = capi.VecSimBatchIterator_Next(it, 4)
    assert rep.ids.tolist() == rep2.ids.tolist()
