"""Index serialization — versioned save/load.

Reference: ``utils/serializer.h:37-60`` + ``hnsw_serializer_impl.h`` (HNSW
V4: fields + raw vectors + graph). The TPU-native format ("vstpu-v1") is a
single ``.npz``: a JSON metadata blob (params, entry point, counters) plus
every SoA host array — the arrays ARE the index, so save/load is a straight
dump/restore with label maps rebuilt from the label/slot columns. Includes
an integrity checker (``checkIntegrity`` parity).
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np

from ..types import (
    BFParams,
    HNSWParams,
    SVSParams,
    VecSimMetric,
    VecSimSvsQuantBits,
    VecSimType,
)

FORMAT_VERSION = "vstpu-v1"


def _params_to_dict(p) -> dict:
    d = dataclasses.asdict(p)
    for k, v in d.items():
        if hasattr(v, "value"):
            d[k] = int(v)
    return d


def _store_arrays(store, prefix: str) -> dict[str, np.ndarray]:
    return {f"{prefix}{name}": store.host[name][: store.count] for name in store.fields}


def _restore_store(store, arrays: dict, prefix: str, count: int) -> None:
    store._maybe_grow(count)
    for name in store.fields:
        store.host[name][:count] = arrays[f"{prefix}{name}"]
    store.count = count
    store._dirty_from = 0


def _rebuild_labels(index) -> None:
    count = index.store.count
    labels = index.store.host["label"][:count]
    if index.multi:
        slots = index.store.host["slot"][:count]
        flags = index.store.host.get("flags")
        for i in range(count):
            if flags is not None and flags[i] & 1:
                continue  # tombstoned rows have no label entry
            lab, slot = int(labels[i]), int(slots[i])
            if lab in index.labels.label_to_ids:
                index.labels.label_to_ids[lab].add(i)
            else:
                index.labels.label_to_ids[lab] = {i}
                index.labels.label_to_slot[lab] = slot
                index.labels._slot_to_label[slot] = lab
        if index.labels._slot_to_label:
            index.labels._next_slot = max(index.labels._slot_to_label) + 1
        used = set(index.labels._slot_to_label)
        index.labels._free_slots = [s for s in range(index.labels._next_slot) if s not in used]
    else:
        flags = index.store.host.get("flags")
        for i in range(count):
            if flags is not None and flags[i] & 1:
                continue  # tombstoned rows have no label entry
            index.labels.label_to_id[int(labels[i])] = i


def save_index(index, path: str) -> None:
    from ..indexes.brute_force import BruteForceIndex
    from ..indexes.hnsw import HNSWIndex
    from ..indexes.svs import SVSIndex
    from ..indexes.tiered import TieredHNSWIndex

    arrays: dict[str, np.ndarray] = {}
    meta: dict = {"version": FORMAT_VERSION}
    # Device-authoritative content (adopt_device data, device-built graphs)
    # must reach the host mirrors before they are dumped.
    getattr(index, "_ensure_host_links", lambda: None)()
    index.store.pull_host()
    if hasattr(index, "upper"):
        index.upper.pull_host()

    if isinstance(index, TieredHNSWIndex):
        raise ValueError(
            "serialize the tiers separately (run GC + drain jobs first); "
            "the reference likewise serializes backend indexes only"
        )
    if isinstance(index, HNSWIndex):
        meta["kind"] = "hnsw"
        meta["params"] = _params_to_dict(index.params)
        meta["entry_id"] = index.entry_id
        meta["max_level"] = index.max_level
        meta["lmax"] = index.lmax
        meta["num_marked_deleted"] = index.num_marked_deleted
        meta["count"] = index.store.count
        meta["upper_count"] = index.upper.count
        arrays.update(_store_arrays(index.store, "s_"))
        arrays.update(_store_arrays(index.upper, "u_"))
    elif isinstance(index, SVSIndex):
        meta["kind"] = "svs"
        meta["params"] = _params_to_dict(index.params)
        meta["entry_id"] = index.entry_id
        meta["num_marked_deleted"] = index.num_marked_deleted
        meta["count"] = index.store.count
        arrays.update(_store_arrays(index.store, "s_"))
    elif isinstance(index, BruteForceIndex):
        meta["kind"] = "bf"
        meta["params"] = _params_to_dict(index.params)
        meta["count"] = index.store.count
        arrays.update(_store_arrays(index.store, "s_"))
    else:
        raise TypeError(f"cannot serialize {type(index)}")

    np.savez_compressed(path, __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
                        **arrays)


def load_index(path: str):
    from ..indexes.brute_force import BruteForceIndex
    from ..indexes.hnsw import HNSWIndex
    from ..indexes.svs import SVSIndex

    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
    if meta["version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported format version {meta['version']}")
    kind = meta["kind"]
    pd = meta["params"]

    def enums(d, cls_map):
        for k, cls in cls_map.items():
            if k in d:
                d[k] = cls(d[k])
        return d

    if kind == "bf":
        params = BFParams(**enums(pd, {"type": VecSimType, "metric": VecSimMetric}))
        index = BruteForceIndex(params)
    elif kind == "hnsw":
        params = HNSWParams(**enums(pd, {"type": VecSimType, "metric": VecSimMetric}))
        index = HNSWIndex(params)
        if meta["lmax"] > index.lmax:
            index._grow_lmax(meta["lmax"])
    elif kind == "svs":
        params = SVSParams(
            **enums(pd, {"type": VecSimType, "metric": VecSimMetric,
                         "quantBits": VecSimSvsQuantBits,
                         "use_search_history": lambda x: x})
        )
        from ..types import VecSimOptionMode

        params.use_search_history = VecSimOptionMode(params.use_search_history)
        index = SVSIndex(params)
    else:
        raise ValueError(f"unknown kind {kind}")

    _restore_store(index.store, arrays, "s_", meta["count"])
    if kind == "hnsw":
        _restore_store(index.upper, arrays, "u_", meta["upper_count"])
        index.entry_id = meta["entry_id"]
        index.max_level = meta["max_level"]
        index.num_marked_deleted = meta["num_marked_deleted"]
    if kind == "svs":
        index.entry_id = meta["entry_id"]
        index.num_marked_deleted = meta["num_marked_deleted"]
    _rebuild_labels(index)
    return index


def check_integrity(index) -> bool:
    """Structural invariants (hnsw_serializer_impl.h:57 checkIntegrity):
    links point to live rows, counts match, label maps align with columns."""
    getattr(index, "_ensure_host_links", lambda: None)()
    index.store.pull_host()
    count = index.store.count
    labels_col = index.store.host["label"][:count]
    # Label maps agree with the label column.
    if index.multi:
        total = sum(len(v) for v in index.labels.label_to_ids.values())
        flags = index.store.host.get("flags")
        tomb = int((flags[:count] & 1).sum()) if flags is not None else 0
        if total != count - tomb:
            return False
        for lab, ids in index.labels.label_to_ids.items():
            if any(labels_col[i] != lab for i in ids):
                return False
    else:
        flags = index.store.host.get("flags")
        tomb = int((flags[:count] & 1).sum()) if flags is not None else 0
        if len(index.labels) != count - tomb:
            return False
        for lab, i in index.labels.label_to_id.items():
            if labels_col[i] != lab:
                return False
    # Graph links (if any) stay within [0, count).
    for field in ("links0", "links"):
        if field in index.store.fields:
            links = index.store.host[field][:count]
            if links.size and links.max(initial=-1) >= count:
                return False
    if hasattr(index, "upper") and index.upper.count:
        ul = index.upper.host["links"][: index.upper.count]
        if ul.size and ul.max(initial=-1) >= count:
            return False
    return True
