"""Preprocessor-pipeline component tests — ``test_components.cpp`` analog:
the (storage, query) blob pair produced per (dtype, metric) configuration.
"""

import numpy as np
import pytest

from vectorsimilarity_tpu import BFParams, VecSimMetric, VecSimType
from vectorsimilarity_tpu.indexes.brute_force import BruteForceIndex
from vectorsimilarity_tpu.indexes.svs import SVSIndex
from vectorsimilarity_tpu.types import SVSParams, VecSimSvsQuantBits


def make(vtype, metric, dim=8):
    return BruteForceIndex(
        BFParams(type=vtype, dim=dim, metric=metric, blockSize=1024)
    )


def test_cosine_float_normalizes_storage_and_query():
    idx = make(VecSimType.FLOAT32, VecSimMetric.Cosine)
    v = np.full(8, 2.0, np.float32)
    rows = idx.preprocess_storage(v)
    np.testing.assert_allclose(np.linalg.norm(rows["data"][0]), 1.0, rtol=1e-6)
    q, qn = idx.preprocess_queries(v)
    np.testing.assert_allclose(np.linalg.norm(q[0]), 1.0, rtol=1e-6)
    assert qn is None


def test_l2_float_keeps_raw_and_precomputes_sqnorm():
    idx = make(VecSimType.FLOAT32, VecSimMetric.L2)
    v = np.arange(8, dtype=np.float32)
    rows = idx.preprocess_storage(v)
    np.testing.assert_array_equal(rows["data"][0], v)
    assert rows["sqnorm"][0] == pytest.approx(float((v * v).sum()))


def test_cosine_int8_keeps_raw_and_stores_norm():
    idx = make(VecSimType.INT8, VecSimMetric.Cosine)
    v = np.array([3, -4, 0, 0, 0, 0, 0, 0], np.int8)
    rows = idx.preprocess_storage(v)
    np.testing.assert_array_equal(rows["data"][0], v)  # ints not mutated
    assert rows["norm"][0] == pytest.approx(5.0)
    q, qn = idx.preprocess_queries(v)
    assert qn[0] == pytest.approx(5.0)


def test_ip_int8_no_extras():
    idx = make(VecSimType.INT8, VecSimMetric.IP)
    assert "norm" not in idx.store.fields
    assert "sqnorm" not in idx.store.fields


@pytest.mark.parametrize("vtype", [VecSimType.FLOAT16, VecSimType.BFLOAT16])
def test_halfprec_cosine_normalizes_in_storage_dtype(vtype):
    idx = make(vtype, VecSimMetric.Cosine)
    v = np.full(8, 3.0, np.float32).astype(idx.np_dtype)
    rows = idx.preprocess_storage(v)
    assert rows["data"].dtype == idx.np_dtype
    n = np.linalg.norm(rows["data"][0].astype(np.float32))
    assert n == pytest.approx(1.0, rel=2e-2)  # storage-precision rounding


def test_sq8_pipeline_cosine_quantizes_normalized():
    svs = SVSIndex(SVSParams(type=VecSimType.FLOAT32, dim=16,
                             metric=VecSimMetric.Cosine,
                             quantBits=VecSimSvsQuantBits.Scalar))
    v = np.random.default_rng(0).standard_normal(16).astype(np.float32) * 7
    rows = svs.preprocess_storage(v)
    assert rows["data"].dtype == np.uint8
    # Reconstruction must be ~unit-norm (normalized before quantization).
    recon = rows["vmin"][0] + rows["delta"][0] * rows["data"][0].astype(np.float32)
    assert np.linalg.norm(recon) == pytest.approx(1.0, abs=0.05)
    q, qn, qmeta = svs.preprocess_queries(v)
    assert np.linalg.norm(q[0]) == pytest.approx(1.0, rel=1e-5)
    assert qmeta[0][0] == pytest.approx(q[0].sum(), rel=1e-4)


def test_sq8_pipeline_l2_keeps_sumsq():
    svs = SVSIndex(SVSParams(type=VecSimType.FLOAT32, dim=16,
                             metric=VecSimMetric.L2,
                             quantBits=VecSimSvsQuantBits.Scalar))
    v = np.random.default_rng(1).standard_normal(16).astype(np.float32)
    rows = svs.preprocess_storage(v)
    assert rows["sqnorm"][0] == pytest.approx(float((v * v).sum()), rel=1e-4)
    _, _, qmeta = svs.preprocess_queries(v)
    assert qmeta[1][0] == pytest.approx(float((v * v).sum()), rel=1e-4)


def test_fp64_storage_stays_double_on_host():
    idx = make(VecSimType.FLOAT64, VecSimMetric.L2)
    assert idx.store.fields["data"].dtype == np.float64
    v = np.arange(8, dtype=np.float64)
    rows = idx.preprocess_storage(v)
    assert rows["data"].dtype == np.float64
