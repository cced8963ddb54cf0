"""Reference-compatible SVS (Vamana) folder serialization.

The reference saves an SVS index as a FOLDER (``svs_serializer.cpp:29-38``
``SVSSerializer::saveIndex``): a ``metadata`` file with an encoding-version
header plus every field needed to validate reconstruction
(``svs_serializer_impl.h:20-61`` ``saveIndexFields``), alongside
``config``/``graph``/``data`` files written by the upstream Intel SVS
library (``svs_serializer_impl.h:75-80`` ``impl_save``). Loading requires
an index ALREADY CREATED with the same parameters; the metadata file is
then field-compared before the graph/data are adopted
(``svs_serializer_impl.h:85-145`` ``loadIndex``/``compareMetadataFile``).

This module reproduces that contract:

- ``metadata`` is BYTE-COMPATIBLE with the reference (same POD sequence,
  widths, and order as ``saveIndexFields``), so either side can validate
  the other's header.
- ``config``/``graph``/``data`` use a documented numpy container. The
  upstream SVS library's own file formats cannot be matched: the
  reference snapshot vendors SVS as an EMPTY submodule (``cmake/svs.cmake``),
  so those formats are not defined anywhere in the tree (PARITY.md).
- ``load_svs_folder(index, path)`` validates metadata against the live
  index exactly like ``compareMetadataFile`` — field order, one error per
  first mismatching field — then restores stores, labels, and the medoid
  entry point.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path

import numpy as np

from ..types import VecSimMetric, VecSimSvsQuantBits

V0 = 0  # SVSSerializer::EncodingVersion::V0

# Per-row store fields persisted alongside the codes (quantization scales,
# two-level residual codes, norms, multi-value slots).
_PER_ROW_FIELDS = (
    "vmin", "delta", "sqnorm", "norm", "slot", "res", "rvmin", "rdelta", "rsq",
)

# VecSimSvsQuantBits -> (QuantBits, ResidualBits, IsLeanVec) template
# parameters, as instantiated by svs_factory.cpp:70-87.
_TEMPLATE_PARAMS = {
    VecSimSvsQuantBits.NONE: (0, 0, False),
    VecSimSvsQuantBits.Scalar: (1, 0, False),
    VecSimSvsQuantBits.Q8: (8, 0, False),
    VecSimSvsQuantBits.Q4: (4, 0, False),
    VecSimSvsQuantBits.Q4x4: (4, 4, False),
    VecSimSvsQuantBits.Q4x8: (4, 8, False),
    VecSimSvsQuantBits.Q4x8_LeanVec: (4, 8, True),
    VecSimSvsQuantBits.Q8x8_LeanVec: (8, 8, True),
}

# (name, struct format) in saveIndexFields order. bool is 1 byte, enums are
# 4-byte ints, size_t is 8 bytes, alpha is float, epsilon is double.
_FIELDS = (
    ("dim", "<Q"),
    ("vecType", "<i"),
    ("storedDataSize", "<Q"),
    ("metric", "<i"),
    ("blockSize", "<Q"),
    ("isMulti", "<B"),
    ("forcePreprocessing", "<B"),
    ("alpha", "<f"),
    ("graph_max_degree", "<Q"),
    ("window_size", "<Q"),
    ("max_candidate_pool_size", "<Q"),
    ("prune_to", "<Q"),
    ("use_full_search_history", "<B"),
    ("search_window_size", "<Q"),
    ("epsilon", "<d"),
    ("compression_mode", "<i"),
    ("QuantBits", "<Q"),
    ("ResidualBits", "<Q"),
    ("IsLeanVec", "<B"),
    ("isMulti (template param)", "<B"),
    ("lastMode", "<i"),
)


def _metadata_values(index) -> dict:
    """The reference's saveIndexFields values for one of our SVSIndexes."""
    qb, rb, lean = _TEMPLATE_PARAMS[VecSimSvsQuantBits(index.quant)]
    row = index.store.host["data"][0]
    stored = row.nbytes  # bytes per stored element in OUR layout
    return {
        "dim": index.dim,
        "vecType": int(index.vtype),
        "storedDataSize": stored,
        "metric": int(index.metric),
        "blockSize": index.block_size,
        "isMulti": int(bool(index.multi)),
        # We never force redundant preprocessing (the reference sets this
        # for pre-normalized cosine input paths).
        "forcePreprocessing": 0,
        "alpha": float(index.alpha),
        "graph_max_degree": index.R,
        "window_size": index.L_build,
        # Reference defaults (svs_utils.h:114-115): pool = 3x window,
        # prune_to = degree - 4. Our pruner prunes exactly to R.
        "max_candidate_pool_size": 3 * index.L_build,
        "prune_to": index.R,
        "use_full_search_history": 1,
        "search_window_size": index.ws,
        "epsilon": float(index.epsilon),
        "compression_mode": int(VecSimSvsQuantBits(index.quant)),
        "QuantBits": qb,
        "ResidualBits": rb,
        "IsLeanVec": int(lean),
        "isMulti (template param)": int(bool(index.multi)),
        "lastMode": int(getattr(index, "last_mode", 0)),
    }


def write_metadata(index, path: Path) -> None:
    out = bytearray(struct.pack("<i", V0))
    vals = _metadata_values(index)
    for name, fmt in _FIELDS:
        out += struct.pack(fmt, vals[name])
    path.write_bytes(bytes(out))


def check_metadata(index, path: Path) -> None:
    """``compareMetadataFile`` (svs_serializer_impl.h:119-159): read the
    version, then compare every field in order; raise naming the FIRST
    mismatching field. ``lastMode`` is written but not compared, exactly
    like the reference."""
    buf = path.read_bytes()
    (version,) = struct.unpack_from("<i", buf, 0)
    if version >= 1:  # EncodingVersion::INVALID
        raise RuntimeError(f"Cannot load index: bad encoding version: {version}")
    off = 4
    vals = _metadata_values(index)
    for name, fmt in _FIELDS:
        (got,) = struct.unpack_from(fmt, buf, off)
        off += struct.calcsize(fmt)
        if name == "lastMode":
            continue
        want = vals[name]
        if fmt == "<f":
            match = abs(got - want) < 1e-6
        elif fmt == "<d":
            match = abs(got - want) < 1e-12
        else:
            match = int(got) == int(want)
        if not match:
            raise RuntimeError(
                f"Field mismatch in metadata file: {name} (file: {got}, index: {want})")


def save_svs_folder(index, location: str) -> None:
    """``SVSSerializer::saveIndex``: metadata + config + graph + data."""
    loc = Path(location)
    loc.mkdir(parents=True, exist_ok=True)
    index.store.pull_host()
    write_metadata(index, loc / "metadata")

    count = index.store.count
    host = index.store.host
    config = {
        "count": int(count),
        "entry_id": int(index.entry_id),
        "num_marked_deleted": int(index.num_marked_deleted),
        "requested_quant": int(index.requested_quant),
    }
    (loc / "config").write_text(json.dumps(config))

    np.savez(loc / "graph",
             links=host["links"][:count],
             nlinks=host["nlinks"][:count])
    data_fields = {
        "data": host["data"][:count],
        "label": host["label"][:count],
        "flags": host["flags"][:count],
    }
    for f in _PER_ROW_FIELDS:
        if f in index.store.fields:
            data_fields[f] = host[f][:count]
    if getattr(index, "_P_host", None) is not None:
        data_fields["leanvec_P"] = index._P_host  # [dim, leanvec_dim]
    np.savez(loc / "data", **data_fields)
    # np.savez appends .npz; the reference uses bare names — rename.
    for name in ("graph", "data"):
        (loc / f"{name}.npz").replace(loc / name)


def load_svs_folder(index, location: str) -> None:
    """``loadIndex`` contract: ``index`` must be freshly created with the
    same parameters; metadata is validated, then stores are adopted."""
    loc = Path(location)
    check_metadata(index, loc / "metadata")
    config = json.loads((loc / "config").read_text())
    count = int(config["count"])

    with open(loc / "graph", "rb") as f:
        graph = np.load(f)
        links, nlinks = graph["links"], graph["nlinks"]
    with open(loc / "data", "rb") as f:
        data = dict(np.load(f).items())

    if links.shape != (count, index.R):
        raise RuntimeError(
            f"graph shape mismatch: {links.shape} vs ({count}, {index.R})")

    store = index.store
    rows = {"data": data["data"], "label": data["label"], "flags": data["flags"],
            "links": links, "nlinks": nlinks}
    for f in _PER_ROW_FIELDS:
        if f in store.fields and f in data:
            rows[f] = data[f]
    if "leanvec_P" in data:
        import jax.numpy as jnp

        index._P_host = data["leanvec_P"]
        index._P = jnp.asarray(index._P_host)
    ids = store.append(rows)
    assert len(ids) == count

    for i in range(count):
        lab = int(data["label"][i])
        if index.multi:
            slot = index.labels.add(lab, i)
            store.host["slot"][i] = slot
        else:
            index.labels.add(lab, i)
    index.entry_id = int(config["entry_id"])
    index.num_marked_deleted = int(config["num_marked_deleted"])
    index._inserts_since_medoid = 0
