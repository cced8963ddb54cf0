"""Shared machinery for device-backed vector indexes.

TPU re-design of ``VecSimIndexAbstract`` (``vec_sim_index.h:42-390``): owns
dim/type/metric/blockSize, the vector ``BlockStore``, and the preprocessing
pipeline (the reference's calculator + preprocessors,
``spaces/computer/*``). The "distance function chosen once at construction"
becomes "store kind + metric chosen once; jitted score kernels specialize on
them" — same single-dispatch property, compiler-driven.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np

from ..ops.normalize import needs_query_normalize
from ..types import (
    DEFAULT_BLOCK_SIZE,
    VecSimIndexBasicInfo,
    VecSimMetric,
    VecSimType,
    numpy_dtype,
)
from .interface import VecSimIndexBase
from .labels import MultiLabelMap, SingleLabelMap
from .store import BlockStore, FieldSpec


def _x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def retry_device(fn, attempts: int = 3, delay: float = 2.0):
    """Retry a device computation on transient backend failures.

    The axon relay's remote-compile helper occasionally returns HTTP 500 on
    a fresh kernel shape; the retry usually lands in its cache. Only
    idempotent computations should be wrapped."""
    import time

    import jax

    last = None
    for attempt in range(attempts):
        try:
            return fn()
        except jax.errors.JaxRuntimeError as e:  # pragma: no cover - backend flake
            msg = str(e)
            if "remote_compile" not in msg and "INTERNAL" not in msg:
                raise
            last = e
            time.sleep(delay * (attempt + 1))
    raise last


def pow2_bucket(n: int, lo: int = 1) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class DeviceVectorIndex(VecSimIndexBase):
    """Base for BF/HNSW/SVS: vector store + labels + preprocessing."""

    def __init__(
        self,
        *,
        vtype: VecSimType,
        dim: int,
        metric: VecSimMetric,
        multi: bool,
        block_size: int,
        log_ctx: Any = None,
        extra_fields: Optional[dict[str, FieldSpec]] = None,
        initial_capacity: int = 0,
    ):
        super().__init__(log_ctx)
        if dim <= 0:
            raise ValueError("dim must be positive")
        self.vtype = VecSimType(vtype)
        self.dim = int(dim)
        self.metric = VecSimMetric(metric)
        self.multi = bool(multi)
        self.block_size = int(block_size) or DEFAULT_BLOCK_SIZE

        self.np_dtype = numpy_dtype(self.vtype)
        self.is_int = self.vtype in (VecSimType.INT8, VecSimType.UINT8)
        self.store_kind = "int" if self.is_int else "float"

        fields: dict[str, FieldSpec] = {}
        if self.vtype == VecSimType.FLOAT64 and not _x64_enabled():
            fields["data"] = FieldSpec((self.dim,), np.float64, device_dtype=np.float32)
        else:
            fields["data"] = FieldSpec((self.dim,), self.np_dtype)
        fields["label"] = FieldSpec((), np.int64, fill=-1)
        if self.multi:
            fields["slot"] = FieldSpec((), np.int32, fill=-1)
        if self.metric == VecSimMetric.L2:
            # Precomputed ||v||^2 turns L2 scans and neighbor gathers into a
            # single matmul plus rank-1 updates (exact f32 for int inputs;
            # f64 when the store computes at true double precision).
            sq_dtype = (
                np.float64
                if self.vtype == VecSimType.FLOAT64 and _x64_enabled()
                else np.float32
            )
            fields["sqnorm"] = FieldSpec((), sq_dtype)
        if self.is_int and self.metric == VecSimMetric.Cosine:
            fields["norm"] = FieldSpec((), np.float32)
        if extra_fields:
            fields.update(extra_fields)

        self.store = BlockStore(fields, self.block_size)
        if initial_capacity:
            # Pre-size to the expected dataset size: jitted kernels are
            # shape-keyed on the capacity bucket, so pre-sizing avoids one
            # recompile sweep per doubling during bulk builds.
            from .store import _bucket_capacity

            self.store._resize(_bucket_capacity(initial_capacity, self.block_size))
        self.labels = MultiLabelMap() if self.multi else SingleLabelMap()

    # ------------------------------------------------------------------
    # Preprocessing (reference: preprocessors.h pipeline)
    # ------------------------------------------------------------------

    def _as_batch(self, blob: np.ndarray) -> np.ndarray:
        arr = np.asarray(blob)
        if arr.dtype != self.np_dtype:
            arr = arr.astype(self.np_dtype)
        if arr.ndim == 1:
            arr = arr[None, :]
        if arr.shape[-1] != self.dim:
            raise ValueError(f"expected dim {self.dim}, got {arr.shape[-1]}")
        return arr

    def _normalize_rows(self, arr: np.ndarray) -> np.ndarray:
        acc = np.float64 if arr.dtype == np.float64 else np.float32
        v = arr.astype(acc)
        norms = np.sqrt(np.sum(v * v, axis=-1, keepdims=True))
        norms[norms == 0] = 1.0
        return (v / norms).astype(arr.dtype)

    def preprocess_storage(self, blob: np.ndarray) -> dict[str, np.ndarray]:
        """Blob -> storage field rows (CosinePreprocessor semantics:
        float cosine normalizes storage; int cosine keeps raw + norms)."""
        arr = self._as_batch(blob)
        rows: dict[str, np.ndarray] = {}
        if self.metric == VecSimMetric.Cosine and not self.is_int:
            arr = self._normalize_rows(arr)
        rows["data"] = arr
        if "sqnorm" in self.store.fields:
            if self.is_int:
                v64 = arr.astype(np.int64)
                rows["sqnorm"] = np.sum(v64 * v64, axis=-1).astype(np.float32)
            else:
                v = arr.astype(np.float32 if arr.dtype != np.float64 else np.float64)
                rows["sqnorm"] = np.sum(v * v, axis=-1).astype(
                    self.store.fields["sqnorm"].dtype
                )
        if "norm" in self.store.fields:
            v = arr.astype(np.int64)
            rows["norm"] = np.sqrt(np.sum(v * v, axis=-1).astype(np.float32))
        return rows

    def preprocess_queries(self, queries: np.ndarray):
        """Queries -> (device-ready batch, query_norms or None)."""
        arr = self._as_batch(queries)
        qnorms = None
        if needs_query_normalize(self.vtype, self.metric):
            arr = self._normalize_rows(arr)
        elif self.is_int and self.metric == VecSimMetric.Cosine:
            v = arr.astype(np.int64)
            qnorms = np.sqrt(np.sum(v * v, axis=-1).astype(np.float32))
        if self.vtype == VecSimType.FLOAT64 and not _x64_enabled():
            arr = arr.astype(np.float32)
        return arr, qnorms

    def store_tuple(self, dev: dict[str, jax.Array]) -> tuple:
        """Device arrays in the layout ``ops.distances`` expects."""
        if self.is_int:
            return (dev["data"], dev.get("norm"))
        return (dev["data"], dev.get("sqnorm"))

    # ------------------------------------------------------------------
    # Multi-chip query-parallel serving (graph indexes)
    # ------------------------------------------------------------------

    _qmesh = None

    def to_query_sharded(self, mesh):
        """Serve every search with the query batch sharded over ``mesh``
        (store/graph replicated): each chip beams its slice of the batch —
        the graph-index scale-out axis (SURVEY §2 TPU-native equivalent;
        a proximity graph scales over QUERIES, while the flat scan shards
        DATA rows — ``BruteForceIndex.to_sharded``)."""
        with self._lock:
            self._qmesh = mesh
        return self

    def _maybe_shard_queries(self, q: np.ndarray, qnorms):
        """Pad the (already pow2-padded) query batch to the mesh multiple
        and place it sharded; GSPMD batch-partitions the jitted search
        kernels from the input sharding alone."""
        if self._qmesh is None:
            return q, qnorms
        from ..parallel.sharding import AXIS

        s = self._qmesh.shape[AXIS]
        pad = (-len(q)) % s
        if pad:
            q = np.concatenate([q, np.repeat(q[-1:], pad, axis=0)])
            if qnorms is not None:
                qnorms = np.concatenate([qnorms, np.repeat(qnorms[-1:], pad)])
        from jax.sharding import NamedSharding, PartitionSpec as P

        import jax.numpy as jnp

        spec = NamedSharding(self._qmesh, P(AXIS, None))
        q = jax.device_put(jnp.asarray(q), spec)
        if qnorms is not None:
            qnorms = jax.device_put(
                jnp.asarray(qnorms), NamedSharding(self._qmesh, P(AXIS))
            )
        return q, qnorms

    # ------------------------------------------------------------------
    # Host-side exact distance (GetDistanceFrom parity)
    # ------------------------------------------------------------------

    def host_distance(self, idx: int, query: np.ndarray, qnorm=None) -> float:
        """Distance between stored row ``idx`` and a preprocessed query."""
        self.store.pull_host("data", "norm")  # no-op unless device-adopted
        v = self.store.host["data"][idx]
        if self.is_int:
            ip = int(np.dot(v.astype(np.int64), query.astype(np.int64)))
            if self.metric == VecSimMetric.IP:
                return float(1.0 - np.float32(ip))
            if self.metric == VecSimMetric.Cosine:
                denom = np.float32(self.store.host["norm"][idx]) * np.float32(qnorm)
                return float(1.0 - np.float32(ip) / denom)
            d = v.astype(np.int64) - query.astype(np.int64)
            return float(np.dot(d, d))
        acc = np.float64 if v.dtype == np.float64 else np.float32
        vv, qq = v.astype(acc), query.astype(acc)
        if self.metric == VecSimMetric.L2:
            d = vv - qq
            return float(np.dot(d, d))
        return float(1.0 - np.dot(vv, qq))

    # ------------------------------------------------------------------
    # Common info plumbing
    # ------------------------------------------------------------------

    @property
    def index_size(self) -> int:
        return self.store.count

    @property
    def index_label_count(self) -> int:
        return len(self.labels)

    def _basic_info(self, algo) -> VecSimIndexBasicInfo:
        return VecSimIndexBasicInfo(
            algo=algo,
            metric=self.metric,
            type=self.vtype,
            isMulti=self.multi,
            isTiered=False,
            isDisk=False,
            blockSize=self.block_size,
            dim=self.dim,
        )

    @property
    def memory_bytes(self) -> int:
        return self.store.memory_bytes

    def contains_label(self, label: int) -> bool:
        return label in self.labels

    def get_stored_vectors(self, label: int) -> list[np.ndarray]:
        """White-box test hook (reference ``getDataByLabel``)."""
        self.store.pull_host("data")  # no-op unless device-adopted
        return [self.store.host["data"][i].copy() for i in self.labels.ids_of(label)]
