"""SVS folder serialization — the reference's saveIndex/loadIndex contract
(svs_serializer.cpp:29-38, svs_serializer_impl.h:20-159): byte-compatible
``metadata`` header, create-then-validate-then-restore loading, first-field
mismatch errors."""

import struct

import numpy as np
import pytest

from vectorsimilarity_tpu import (
    SVSParams, VecSimAlgo, VecSimMetric, VecSimParams, VecSimSvsQuantBits,
    VecSimType, create_index,
)
from vectorsimilarity_tpu.utils.svs_file_format import (
    _FIELDS, V0, load_svs_folder, save_svs_folder,
)


def _make(dim=24, metric=VecSimMetric.L2, quant=VecSimSvsQuantBits.NONE,
          multi=False, R=16):
    p = SVSParams(type=VecSimType.FLOAT32, dim=dim, metric=metric, multi=multi,
                  quantBits=quant, graph_max_degree=R,
                  construction_window_size=60, search_window_size=24)
    return create_index(VecSimParams(algo=VecSimAlgo.SVS, svsParams=p))


def _fill(idx, n=300, dim=24, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.standard_normal((n, dim)).astype(np.float32)
    idx.add_vector_batch(data, list(range(n)))
    return data


@pytest.mark.parametrize("quant", [VecSimSvsQuantBits.NONE,
                                   VecSimSvsQuantBits.Scalar])
def test_roundtrip_same_results(tmp_path, quant):
    idx = _make(quant=quant)
    data = _fill(idx)
    save_svs_folder(idx, tmp_path / "svs")
    assert {(tmp_path / "svs" / f).name for f in
            ("metadata", "config", "graph", "data")} <= {
                p.name for p in (tmp_path / "svs").iterdir()}

    idx2 = _make(quant=quant)
    load_svs_folder(idx2, tmp_path / "svs")
    assert idx2.index_size == idx.index_size
    assert idx2.entry_id == idx.entry_id
    for q in data[:8]:
        a = idx.topk_query(q, 5)
        b = idx2.topk_query(q, 5)
        assert a.ids.tolist() == b.ids.tolist()
        np.testing.assert_allclose(a.scores, b.scores, rtol=1e-6)


def test_metadata_binary_layout(tmp_path):
    """The header is the reference's POD sequence: i32 version, then
    dim u64 / vecType i32 / storedDataSize u64 / metric i32 / ..."""
    idx = _make(dim=24, quant=VecSimSvsQuantBits.Scalar)
    _fill(idx, n=10)
    save_svs_folder(idx, tmp_path / "svs")
    buf = (tmp_path / "svs" / "metadata").read_bytes()
    total = 4 + sum(struct.calcsize(f) for _, f in _FIELDS)
    assert len(buf) == total
    version, dim = struct.unpack_from("<iQ", buf, 0)
    assert version == V0
    assert dim == 24
    (vec_type,) = struct.unpack_from("<i", buf, 12)
    assert vec_type == int(VecSimType.FLOAT32)
    (stored,) = struct.unpack_from("<Q", buf, 16)
    assert stored == 24  # SQ8: one uint8 code per dimension
    # Template params for Scalar: QuantBits=1, ResidualBits=0, IsLeanVec=0
    # (svs_factory.cpp:73-74).
    off = 4 + sum(struct.calcsize(f) for _, f in _FIELDS[:16])
    qb, rb = struct.unpack_from("<QQ", buf, off)
    lean = buf[off + 16]
    assert (qb, rb, lean) == (1, 0, 0)


def test_load_rejects_mismatched_params(tmp_path):
    idx = _make(dim=24)
    _fill(idx)
    save_svs_folder(idx, tmp_path / "svs")

    other = _make(dim=32)
    with pytest.raises(RuntimeError, match="dim"):
        load_svs_folder(other, tmp_path / "svs")

    other = _make(dim=24, R=32)
    with pytest.raises(RuntimeError, match="graph_max_degree"):
        load_svs_folder(other, tmp_path / "svs")

    other = _make(dim=24, quant=VecSimSvsQuantBits.Scalar)
    with pytest.raises(RuntimeError, match="storedDataSize"):
        load_svs_folder(other, tmp_path / "svs")


def test_load_rejects_bad_version(tmp_path):
    idx = _make()
    _fill(idx, n=20)
    save_svs_folder(idx, tmp_path / "svs")
    meta = tmp_path / "svs" / "metadata"
    buf = bytearray(meta.read_bytes())
    buf[0:4] = struct.pack("<i", 9)
    meta.write_bytes(bytes(buf))
    with pytest.raises(RuntimeError, match="bad encoding version"):
        load_svs_folder(_make(), tmp_path / "svs")


def test_multi_roundtrip(tmp_path):
    idx = _make(multi=True)
    rng = np.random.default_rng(5)
    data = rng.standard_normal((60, 24)).astype(np.float32)
    idx.add_vector_batch(data, [i % 20 for i in range(60)])
    save_svs_folder(idx, tmp_path / "svs")
    idx2 = _make(multi=True)
    load_svs_folder(idx2, tmp_path / "svs")
    assert idx2.index_size == 60
    assert idx2.index_label_count == 20
    rep = idx2.topk_query(data[3], 4)
    assert len(set(rep.ids.tolist())) == 4  # one hit per label


def test_bindings_surface(tmp_path):
    from vectorsimilarity_tpu.bindings import SVSIndex as PySVSIndex

    p = SVSParams(type=VecSimType.FLOAT32, dim=16, metric=VecSimMetric.L2,
                  graph_max_degree=16, construction_window_size=40,
                  search_window_size=16)
    py = PySVSIndex(p)
    rng = np.random.default_rng(2)
    data = rng.standard_normal((50, 16)).astype(np.float32)
    for i, v in enumerate(data):
        py.add_vector(v, i)
    py.save_index(str(tmp_path / "svs"))
    py2 = PySVSIndex(p, location=str(tmp_path / "svs"))
    assert py2.index_size() == 50
    got = py2.knn_query(data[9], 3)
    assert 9 in [int(x) for x in np.asarray(got[0]).ravel()]
