"""Reference-compatible HNSW file format (V3/V4) — import and export.

Parses/emits the binary layout produced by the reference serializer so users
can migrate indexes in either direction:

  [version i32][algo i32][dim u64][type i32][metric i32][blockSize u64]
  [multi u8][initialCapacity u64]                    (hnsw_factory.cpp:173-180)
  [M u64][M0 u64][efConstruction u64][ef u64][epsilon f64][mult f64]
  [curElementCount u64][numMarkedDeleted u64][maxLevel u64][entrypoint u32]
                                         (hnsw_serializer_impl.h restore/saveIndexFields)
  per id: [label u64][flags u8]
  vectors: V3: [numBlocks u32] then per block [len u32][len * elementBytes];
           V4: raw elements, block sizes derived     (data_blocks_container.cpp)
  graph: per block [len u32]; per element [toplevel u64];
         per level [numLinks u16][links u32 x n][incomingSize u32][ids u32 x s]
                                         (graph_data.h:15-20, saveLevel/restoreLevel)

Incoming-unidirectional-edge lists exist in the reference to make deletes
O(degree); our design recomputes referrers with SoA scans, so the loader
discards them and the exporter reconstructs them (edge a->b with no b->a)
so the reference's ``checkIntegrity`` invariants hold on exported files.
"""

from __future__ import annotations

import struct

import numpy as np

from ..types import HNSWParams, VecSimMetric, VecSimType, numpy_dtype

V3 = 3
V4 = 4

_MAXLEVEL_NONE = 2**64 - 1  # HNSW_INVALID_LEVEL (SIZE_MAX) when index empty


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, fmt: str):
        vals = struct.unpack_from("<" + fmt, self.data, self.pos)
        self.pos += struct.calcsize("<" + fmt)
        return vals if len(vals) > 1 else vals[0]

    def read_bytes(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def read_u32_array(self, n: int) -> np.ndarray:
        out = np.frombuffer(self.data, dtype="<u4", count=n, offset=self.pos)
        self.pos += 4 * n
        return out


def load_hnsw_file(path: str, device_data=None):
    """Load a reference-serialized HNSW index (V3/V4) into an HNSWIndex.

    ``device_data``: optional device-resident vector data — an array of
    shape [store capacity bucket, dim] in the STORED representation, or a
    callable ``(capacity, count, dim) -> jax.Array`` producing one. When
    given, the loader adopts it as the device compute copy and uploads only
    the graph/metadata columns (``BlockStore.adopt_device``) — the fast
    path on relay-attached devices, where re-uploading GB-scale vectors
    through the host link would dominate the load (links + labels are
    ~4% of a 768-dim index's bytes). Host mirrors keep the exact file
    contents either way."""
    from ..indexes.hnsw import HNSWIndex

    with open(path, "rb") as f:
        r = _Reader(f.read())

    version = r.read("i")
    if version not in (V3, V4):
        raise ValueError(f"unsupported HNSW encoding version {version}")
    algo = r.read("i")
    if algo != 1:  # VecSimAlgo_HNSWLIB
        raise ValueError(f"not an HNSW index file (algo={algo})")
    dim = r.read("Q")
    vtype = VecSimType(r.read("i"))
    metric = VecSimMetric(r.read("i"))
    block_size = r.read("Q")
    multi = bool(r.read("B"))
    _initial_capacity = r.read("Q")
    M = r.read("Q")
    M0 = r.read("Q")
    ef_construction = r.read("Q")
    ef = r.read("Q")
    epsilon = r.read("d")
    _mult = r.read("d")
    count = r.read("Q")
    num_marked_deleted = r.read("Q")
    max_level = r.read("Q")
    entrypoint = r.read("I")

    params = HNSWParams(
        type=vtype, dim=dim, metric=metric, multi=multi,
        blockSize=block_size or 1024, M=M, efConstruction=ef_construction,
        efRuntime=ef, epsilon=epsilon,
    )
    index = HNSWIndex(params)
    assert index.M0 == M0, f"M0 mismatch: file {M0} vs 2*M {index.M0}"

    labels = np.empty(count, dtype=np.int64)
    flags = np.empty(count, dtype=np.uint8)
    for i in range(count):
        labels[i] = r.read("Q")
        flags[i] = r.read("B")

    # Vector data. Element bytes = dim * sizeof(dtype) (+4 appended norm for
    # int8/uint8 cosine — kept as a separate SoA column here).
    np_dt = numpy_dtype(vtype)
    elem_bytes = dim * np_dt.itemsize
    has_norm_tail = metric == VecSimMetric.Cosine and vtype in (
        VecSimType.INT8, VecSimType.UINT8)
    if has_norm_tail:
        elem_bytes += 4
    vec_raw = bytearray()
    if version == V3:
        num_blocks = r.read("I")
        for _ in range(num_blocks):
            block_len = r.read("I")
            vec_raw += r.read_bytes(block_len * elem_bytes)
    else:
        vec_raw += r.read_bytes(count * elem_bytes)
    raw = np.frombuffer(bytes(vec_raw), dtype=np.uint8).reshape(count, elem_bytes)
    if has_norm_tail:
        data = raw[:, : dim * np_dt.itemsize].copy().view(np_dt).reshape(count, dim)
        norms = raw[:, dim * np_dt.itemsize :].copy().view(np.float32).reshape(count)
    else:
        data = raw.copy().view(np_dt).reshape(count, dim)
        norms = None

    # Graph: block-structured, levels inline; discard incoming-edge lists.
    levels = np.zeros(count, dtype=np.int32)
    links0 = np.full((count, M0), -1, dtype=np.int32)
    nlinks0 = np.zeros(count, dtype=np.int32)
    upper: list[tuple[int, list[np.ndarray]]] = []  # (node, [links per level>=1])
    num_blocks = -(-count // (block_size or 1024)) if count else 0
    node = 0
    for _ in range(num_blocks):
        block_len = r.read("I")
        for _ in range(block_len):
            toplevel = r.read("Q")
            levels[node] = toplevel
            per_level = []
            for lvl in range(toplevel + 1):
                nl = r.read("H")
                ids = r.read_u32_array(nl)
                inc = r.read("I")
                r.read_u32_array(inc)  # incoming edges: recomputed on demand
                if lvl == 0:
                    nlinks0[node] = nl
                    links0[node, :nl] = ids
                else:
                    per_level.append(ids.astype(np.int32))
            if toplevel >= 1:
                upper.append((node, per_level))
            node += 1
    assert node == count, f"graph truncated: {node}/{count}"

    # Populate the SoA store.
    rows = {
        "data": data, "label": labels, "level": levels,
        "links0": links0, "nlinks0": nlinks0, "flags": flags,
        "upper_row": np.full(count, -1, dtype=np.int32),
    }
    if "sqnorm" in index.store.fields:
        if vtype in (VecSimType.INT8, VecSimType.UINT8):
            v64 = data.astype(np.int64)
            rows["sqnorm"] = np.sum(v64 * v64, axis=-1).astype(np.float32)
        else:
            v = data.astype(np.float32 if np_dt != np.float64 else np.float64)
            rows["sqnorm"] = np.sum(v * v, axis=-1).astype(np.float32)
    if "norm" in index.store.fields:
        rows["norm"] = norms if norms is not None else np.zeros(count, np.float32)
    if multi:
        rows["slot"] = np.full(count, -1, dtype=np.int32)
    index.store.append(rows)

    if int(levels.max(initial=0)) + 1 > index.lmax:
        index._grow_lmax(int(levels.max()) + 1)
    for node_id, per_level in upper:
        urow = index._alloc_upper_row(node_id)
        for lvl_i, ids in enumerate(per_level):
            index.upper.host["links"][urow, lvl_i, : len(ids)] = ids
            index.upper.host["nlinks"][urow, lvl_i] = len(ids)
        index.upper.mark_dirty(urow, "links", "nlinks")

    # Label maps (tombstoned rows excluded, like mark_delete leaves them).
    for i in range(count):
        if flags[i] & 1:
            continue
        if multi:
            slot = index.labels.add(int(labels[i]), i)
            index.store.host["slot"][i] = slot
        else:
            index.labels.add(int(labels[i]), i)
    index.num_marked_deleted = int(num_marked_deleted)
    index.entry_id = int(entrypoint) if entrypoint != 2**32 - 1 else -1
    index.max_level = -1 if max_level == _MAXLEVEL_NONE else int(max_level)

    if device_data is not None:
        import jax.numpy as jnp

        st = index.store
        arr = (
            device_data(st.capacity, count, dim)
            if callable(device_data)
            else device_data
        )
        assert arr.shape[0] == st.capacity, (
            f"device_data must be padded to the capacity bucket "
            f"{st.capacity}, got {arr.shape[0]}"
        )
        adopt = {"data": arr.astype(st.fields["data"].device_dtype)}
        for name, spec in st.fields.items():
            if name == "data":
                continue
            h = st.host[name]
            if spec.device_dtype != spec.dtype:
                h = h.astype(spec.device_dtype)
            adopt[name] = jnp.asarray(h)
        st.adopt_device(adopt, count=count)
        # adopt_device flags host mirrors stale for adopted fields; here
        # every host column was just read from the file and stays exact.
        st._host_stale.clear()
    return index


def save_hnsw_file(index, path: str, version: int = V4,
                   vectors_from=None) -> None:
    """Export an HNSWIndex to the reference binary format.

    ``vectors_from`` (np [count, dim], the STORED representation — i.e.
    normalized for cosine) substitutes for the store's vector column so a
    device-resident build can be exported without pulling the multi-GB
    vector array through the relay (the caller often already holds the
    exact bytes it fed ``bulk_build_device``)."""
    if version not in (V3, V4):
        raise ValueError(f"unsupported version {version}")
    # Device-resident builds (bulk_build_device) leave host mirrors stale;
    # serialization is a host path, so materialize them first.
    if vectors_from is not None:
        index.store.pull_host(
            *[f for f in tuple(index.store._host_stale) if f != "data"])
    else:
        index.store.pull_host()
    index.upper.pull_host()
    count = index.store.count
    out = bytearray()
    pk = struct.pack
    out += pk("<i", version)
    out += pk("<i", 1)  # VecSimAlgo_HNSWLIB
    out += pk("<Q", index.dim)
    out += pk("<i", int(index.vtype))
    out += pk("<i", int(index.metric))
    out += pk("<Q", index.block_size)
    out += pk("<B", int(index.multi))
    out += pk("<Q", count)  # maxElements / initial capacity hint
    out += pk("<Q", index.M)
    out += pk("<Q", index.M0)
    out += pk("<Q", index.ef_construction)
    out += pk("<Q", index.ef_runtime)
    out += pk("<d", index.epsilon)
    out += pk("<d", index.mult)
    out += pk("<Q", count)
    out += pk("<Q", index.num_marked_deleted)
    out += pk("<Q", index.max_level if index.max_level >= 0 else _MAXLEVEL_NONE)
    out += pk("<I", index.entry_id if index.entry_id >= 0 else 2**32 - 1)

    labels = index.store.host["label"][:count]
    flags = index.store.host["flags"][:count]
    for i in range(count):
        out += pk("<QB", int(labels[i]), int(flags[i]))

    if vectors_from is not None:
        data = np.asarray(vectors_from)[:count].astype(
            index.store.fields["data"].dtype, copy=False)
    else:
        data = index.store.host["data"][:count]
    has_norm_tail = "norm" in index.store.fields
    bs = index.block_size
    if version == V3:
        num_blocks = -(-count // bs) if count else 0
        out += pk("<I", num_blocks)

    def elem_bytes(i: int) -> bytes:
        b = data[i].tobytes()
        if has_norm_tail:
            b += np.float32(index.store.host["norm"][i]).tobytes()
        return b

    for start in range(0, count, bs):
        blen = min(bs, count - start)
        if version == V3:
            out += pk("<I", blen)
        for i in range(start, start + blen):
            out += elem_bytes(i)

    # Reconstruct incoming-unidirectional-edge lists so the exported file
    # satisfies the reference's checkIntegrity accounting.
    incoming: dict[tuple[int, int], list[int]] = {}
    link_sets: dict[tuple[int, int], set[int]] = {}
    for i in range(count):
        for lvl in range(0, int(index.store.host["level"][i]) + 1):
            link_sets[(i, lvl)] = set(index.get_links(i, lvl))
    for (i, lvl), targets in link_sets.items():
        for t in targets:
            if i not in link_sets.get((t, lvl), ()):  # a->b without b->a
                incoming.setdefault((t, lvl), []).append(i)

    for start in range(0, count, bs):
        blen = min(bs, count - start)
        out += pk("<I", blen)
        for i in range(start, start + blen):
            toplevel = int(index.store.host["level"][i])
            out += pk("<Q", toplevel)
            for lvl in range(toplevel + 1):
                links = index.get_links(i, lvl)
                out += pk("<H", len(links))
                out += np.asarray(links, dtype="<u4").tobytes()
                inc = incoming.get((i, lvl), [])
                out += pk("<I", len(inc))
                out += np.asarray(inc, dtype="<u4").tobytes()

    with open(path, "wb") as f:
        f.write(bytes(out))
