"""SVS-Vamana index — single-layer proximity graph with alpha pruning.

The reference wraps Intel ScalableVectorSearch (``algorithms/svs/svs.h:76-815``,
external dep): a MutableVamanaIndex with graph degree ``graph_max_degree``,
construction window ``construction_window_size``, alpha-robust pruning, and
optional LVQ/LeanVec compression. This is a from-scratch TPU-native Vamana:

  - one flat SoA adjacency (``links`` [cap, R]) searched by the same jitted
    ``beam_search`` kernel as HNSW's level 0 (medoid entry point instead of a
    level hierarchy);
  - construction = batched candidate search + ``diversity_prune`` with the
    Vamana rule (alpha * d(kept, c) <= d(q, c) discards; alpha defaults
    1.2 for L2 / 0.95 for IP-like, vec_sim_common.h:41-42);
  - compression (quantBits, vec_sim_common.h:170-179): NONE keeps the raw
    dtype; Scalar/Q8 store SQ8 codes searched with the asymmetric kernels;
    Q4 stores LVQ-style 4-bit codes two-per-byte (``ops.quantize.pack4``) —
    half the HBM bytes per gathered neighbor; Q4x4/Q4x8 add a second
    residual level used to RERANK the search window (two-level LVQ
    semantics); the LeanVec modes search a learned ``leanvec_dim``
    PCA-projected primary space (4- or 8-bit codes) and rerank with a
    full-dimension SQ8 secondary. All reranks run as one batched
    gather+einsum (``ops.quantize.gathered_recon_dists``). The reference
    delegates these modes to the Intel SVS library, whose sources are an
    empty submodule in the snapshot (cmake/svs.cmake) — semantics here
    follow the mode names and the LVQ/LeanVec papers, TPU-first.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax.numpy as jnp

from .. import config
from ..core.abstract_index import DeviceVectorIndex, pow2_bucket, retry_device
from ..core.interface import TimeoutBudget
from ..core.results import QueryReply, make_reply
from ..core.store import FieldSpec
from ..ops import graph_build
from ..ops.graph_search import StoreCtx, beam_search, dists_to_ids, diversity_prune
from ..ops.quantize import (
    gathered_recon_dists,
    leanvec_project,
    leanvec_train,
    residual_quantize,
    sq4_quantize,
    sq4_reconstruct,
    sq8_quantize,
    sq8_reconstruct,
    unpack4,
)
from ..utils.thread_pool import SharedSVSThreadPool
from ..types import (
    CommonInfo,
    QueryReplyOrder,
    SVSParams,
    SvsInfo,
    SVS_VAMANA_DEFAULT_ALPHA_IP,
    SVS_VAMANA_DEFAULT_ALPHA_L2,
    SVS_VAMANA_DEFAULT_CONSTRUCTION_WINDOW_SIZE,
    SVS_VAMANA_DEFAULT_EPSILON,
    SVS_VAMANA_DEFAULT_GRAPH_MAX_DEGREE,
    SVS_VAMANA_DEFAULT_SEARCH_WINDOW_SIZE,
    VecSearchMode,
    VecSimAlgo,
    VecSimIndexDebugInfo,
    VecSimOptionMode,
    VecSimIndexStatsInfo,
    VecSimMetric,
    VecSimQueryParams,
    VecSimQueryReplyCode,
    VecSimSvsQuantBits,
)

FLAG_DELETED = 1


class SVSIndex(DeviceVectorIndex):
    def __init__(self, params: SVSParams, log_ctx: Any = None):
        self.R = params.graph_max_degree or SVS_VAMANA_DEFAULT_GRAPH_MAX_DEGREE
        self.L_build = (
            params.construction_window_size or SVS_VAMANA_DEFAULT_CONSTRUCTION_WINDOW_SIZE
        )
        self.ws = params.search_window_size or SVS_VAMANA_DEFAULT_SEARCH_WINDOW_SIZE
        self.epsilon = params.epsilon or SVS_VAMANA_DEFAULT_EPSILON
        metric = VecSimMetric(params.metric)
        self.alpha = params.alpha or (
            SVS_VAMANA_DEFAULT_ALPHA_L2 if metric == VecSimMetric.L2 else SVS_VAMANA_DEFAULT_ALPHA_IP
        )
        # The prune rule (ops/graph_search.diversity_prune_impl) discards a
        # candidate c when alpha * d(c, kept) < d(q, c) — exactly DiskANN's
        # robust-prune inequality, so alpha passes VERBATIM: alpha=1.2 (L2
        # default) makes the violation RARER than alpha=1 → fewer discards →
        # the classic denser Vamana graph; alpha=0.95 (IP default) prunes
        # slightly more than heuristic-2. (An earlier 1/alpha inversion had
        # this backwards: L2 graphs built ~45% sparser — mean degree 8.2 vs
        # 14.9 at R=16 — with occasional unreachable nodes and ~2.5pt lower
        # recall at equal window; measured 900x24, ws=30: 0.972 -> 0.997.)
        self._prune_alpha = self.alpha if self.alpha > 0 else 1.0

        quant = VecSimSvsQuantBits(params.quantBits)
        self.requested_quant = quant
        self.quant = quant
        # Decompose the mode: low byte = primary bits, second byte =
        # residual/secondary bits, third byte = LeanVec flag (the enum's own
        # encoding, vec_sim_common.h:170-179; Scalar is SQ8-class).
        qv = int(quant)
        self.primary_bits = 8 if quant == VecSimSvsQuantBits.Scalar else (qv & 0xFF)
        self.res_bits = (qv >> 8) & 0xFF
        self.is_leanvec = bool(qv >> 16)
        self.quantized = self.primary_bits in (4, 8)
        self.is_sq8 = self.quantized  # primary search space is quantized
        # Primary (graph/search) space dimension: LeanVec projects to
        # leanvec_dim (default dim/2, the LeanVec paper's operating point).
        if self.is_leanvec:
            self.pdim = max(1, params.leanvec_dim or params.dim // 2)
        else:
            self.pdim = params.dim
        self._P = None  # LeanVec projection [dim, pdim], trained on first batch
        self._P_host = None

        extra: dict[str, FieldSpec] = {
            "links": FieldSpec((self.R,), np.int32, fill=-1),
            "nlinks": FieldSpec((), np.int32),
            "flags": FieldSpec((), np.uint8),
        }
        if self.quantized:
            extra["vmin"] = FieldSpec((), np.float32)
            extra["delta"] = FieldSpec((), np.float32)
            if self.res_bits:
                extra["rvmin"] = FieldSpec((), np.float32)
                extra["rdelta"] = FieldSpec((), np.float32)

        super().__init__(
            vtype=params.type,
            dim=params.dim,
            metric=params.metric,
            multi=params.multi,
            block_size=params.blockSize,
            log_ctx=log_ctx,
            extra_fields=extra,
        )
        if self.quantized:
            # Storage holds primary codes (two-per-byte for 4-bit);
            # metadata fields carry the per-row scales.
            prow = (self.pdim + 1) // 2 if self.primary_bits == 4 else self.pdim
            self.store.fields["data"] = FieldSpec((prow,), np.uint8)
            self.store._resize(self.store.capacity)  # re-materialize data field
            if self.res_bits:
                # Secondary codes: full-dim SQ8 for LeanVec (independent
                # re-quantization), residual-of-primary otherwise.
                rrow = (self.dim + 1) // 2 if self.res_bits == 4 else self.dim
                self.store.add_field("res", FieldSpec((rrow,), np.uint8))
            if self.metric == VecSimMetric.L2:
                # Σx² in the primary space (asymmetric L2 search) ...
                if "sqnorm" not in self.store.fields:
                    self.store.add_field("sqnorm", FieldSpec((), np.float32))
                if self.is_leanvec:
                    # ... and in the original space (rerank).
                    self.store.add_field("rsq", FieldSpec((), np.float32))
            self.store_kind = "sq4" if self.primary_bits == 4 else "sq8"
        self.params = params
        self.entry_id = -1
        self.num_marked_deleted = 0
        self._inserts_since_medoid = 0
        self._host_links_stale = False  # device-built links not yet pulled
        self._build_dropped: list = []
        # First SVS index attaches to the process-wide shared pool and applies
        # any resize requested before index creation (svs_utils.h:509-518).
        SharedSVSThreadPool.instance().on_index_attached()

    # ------------------------------------------------------------------
    # Preprocessing (quantizing storage pipeline)
    # ------------------------------------------------------------------

    def preprocess_storage(self, blob: np.ndarray) -> dict[str, np.ndarray]:
        if not self.quantized:
            return super().preprocess_storage(blob)
        arr = np.asarray(blob, dtype=np.float32 if self.np_dtype != np.float64 else np.float64)
        if arr.ndim == 1:
            arr = arr[None, :]
        if self.metric == VecSimMetric.Cosine:
            arr = self._parallel_normalize(arr.astype(np.float32))
        arr = arr.astype(np.float32)
        full = jnp.asarray(arr)
        if self.is_leanvec:
            if self._P is None:
                self._train_leanvec(full)
            prim = leanvec_project(full, self._P)
        else:
            prim = full
        quantize = sq4_quantize if self.primary_bits == 4 else sq8_quantize
        codes, vmin, delta, _, psumsq = quantize(prim)
        rows = {
            "data": np.asarray(codes),
            "vmin": np.asarray(vmin),
            "delta": np.asarray(delta),
        }
        if "sqnorm" in self.store.fields:
            rows["sqnorm"] = np.asarray(psumsq)
        if self.res_bits:
            if self.is_leanvec:
                # Secondary = independent full-dimension SQ8 (rerank space).
                res, rvmin, rdelta = residual_quantize(
                    full, jnp.zeros_like(full), self.res_bits
                )
                if "rsq" in self.store.fields:
                    rows["rsq"] = np.asarray(jnp.sum(full * full, axis=-1))
            else:
                # Secondary = residual of the primary decode (two-level LVQ).
                if self.primary_bits == 4:
                    recon = sq4_reconstruct(codes, vmin, delta, self.dim)
                else:
                    recon = sq8_reconstruct(codes, vmin, delta)
                res, rvmin, rdelta = residual_quantize(full, recon, self.res_bits)
            rows["res"] = np.asarray(res)
            rows["rvmin"] = np.asarray(rvmin)
            rows["rdelta"] = np.asarray(rdelta)
        return rows

    def _train_leanvec(self, sample: jnp.ndarray) -> None:
        """Learn the projection ONCE from the first ingest batch and freeze
        it (the reference's tiered SVS similarly trains LeanVec on a
        threshold-sized sample and keeps it, svs_tiered.h trainingTrigger).
        """
        self._P = leanvec_train(sample, self.pdim)
        self._P_host = np.asarray(self._P)
        self.log("info",
                 f"LeanVec projection trained: {self.dim} -> {self.pdim} "
                 f"on {int(sample.shape[0])} rows")

    def _parallel_normalize(self, arr: np.ndarray) -> np.ndarray:
        """Host-side row normalization partitioned over the shared pool —
        the analog of the reference's parallel dataset copy-in
        (svs_utils.h:245 ``parallel_for`` over ``StaticPartition``); numpy
        releases the GIL for the per-chunk vectorized ops."""
        pool = SharedSVSThreadPool.instance()
        nparts = min(pool.size(), max(1, arr.shape[0] // 2048))
        if nparts <= 1:
            return self._normalize_rows(arr)
        out = np.empty_like(arr)
        bounds = np.linspace(0, arr.shape[0], nparts + 1).astype(int)

        def _part(i: int) -> None:
            lo, hi = bounds[i], bounds[i + 1]
            out[lo:hi] = self._normalize_rows(arr[lo:hi])

        pool.parallel_for(_part, nparts)
        return out

    def preprocess_queries(self, queries: np.ndarray):
        """Returns (q, qnorms, qmeta) in the ORIGINAL vector space; the
        search path projects into the LeanVec primary space itself
        (``_primary_queries``) so rerank/adhoc consumers keep the exact
        full-dimension query."""
        if not self.quantized:
            q, qn = super().preprocess_queries(queries)
            return q, qn, None
        arr = np.asarray(queries, dtype=np.float32)
        if arr.ndim == 1:
            arr = arr[None, :]
        if self.metric == VecSimMetric.Cosine:
            arr = self._normalize_rows(arr)
        ysum = arr.sum(axis=-1, dtype=np.float32)
        ysumsq = (arr.astype(np.float32) ** 2).sum(axis=-1, dtype=np.float32)
        return arr, None, (ysum, ysumsq)

    def _primary_queries(self, qd: jnp.ndarray):
        """Map original-space device queries into the primary search space,
        recomputing the asymmetric-kernel metadata there."""
        if self.is_leanvec:
            qd = leanvec_project(qd, self._P)
        qm = (jnp.sum(qd, axis=-1), jnp.sum(qd * qd, axis=-1))
        return qd, qm

    def _ctx(self, dev) -> StoreCtx:
        return StoreCtx(
            data=dev["data"],
            sqnorm=dev.get("sqnorm"),
            norm=dev.get("norm"),
            vmin=dev.get("vmin"),
            delta=dev.get("delta"),
        )

    # ------------------------------------------------------------------
    # Host link accessors
    # ------------------------------------------------------------------

    def _ensure_host_links(self) -> None:
        """Pull device-built links into the host mirrors (one bulk read).

        Host-path mutations (delete/repair/serialize) require fresh host
        links; queries and device construction never need this."""
        if not self._host_links_stale:
            return
        self._host_links_stale = False
        self.store.pull_host("links", "nlinks")

    def get_links(self, node: int) -> list[int]:
        self._ensure_host_links()
        n = int(self.store.host["nlinks"][node])
        return self.store.host["links"][node, :n].tolist()

    def set_links(self, node: int, ids: list[int]) -> None:
        assert len(ids) <= self.R
        self._ensure_host_links()
        row = self.store.host["links"][node]
        row[: len(ids)] = ids
        row[len(ids) :] = -1
        self.store.host["nlinks"][node] = len(ids)
        self.store.mark_dirty(node, "links", "nlinks")

    # ------------------------------------------------------------------
    # Medoid entry point
    # ------------------------------------------------------------------

    def _update_medoid(self, limit: Optional[int] = None) -> None:
        """Entry point = vector closest to the dataset mean (approx medoid).

        ``limit`` restricts the computation to the first ``limit`` rows —
        bulk builds adopt the whole dataset up front but must only pick
        entries among rows whose graph links exist yet."""
        count = self.store.count if limit is None else min(limit, self.store.count)
        if count == 0:
            self.entry_id = -1
            return
        dev = self.store.device_arrays()
        data = dev["data"]
        if self.quantized:
            if self.primary_bits == 4:
                data = unpack4(data)
            data = dev["vmin"][:, None] + dev["delta"][:, None] * data.astype(jnp.float32)
        else:
            data = data.astype(jnp.float32)
        mask = (jnp.arange(data.shape[0]) < count)[:, None]
        mean = jnp.sum(jnp.where(mask, data, 0.0), axis=0) / count
        d = jnp.sum((data - mean[None, :]) ** 2, axis=-1)
        d = jnp.where(mask[:, 0], d, jnp.inf)
        self.entry_id = int(jnp.argmin(d))
        self._inserts_since_medoid = 0

    # ------------------------------------------------------------------
    # Write path
    # ------------------------------------------------------------------

    def add_vector(self, blob: np.ndarray, label: int) -> int:
        return self.add_vector_batch(np.asarray(blob).reshape(1, -1), [label])

    def add_vector_batch(self, vecs: np.ndarray, labels) -> int:
        labels = [int(l) for l in labels]
        with self._lock:
            overwrite: list[int] = []
            if not self.multi:
                overwrite = [l for l in labels if l in self.labels]
                for l in overwrite:
                    self.delete_vector(l)
            vecs = np.atleast_2d(np.asarray(vecs))
            rows = self.preprocess_storage(vecs)
            n = len(labels)
            rows["label"] = np.asarray(labels, dtype=np.int64)
            ids = [int(x) for x in self.store.append(rows)]
            for i, node in enumerate(ids):
                if self.multi:
                    slot = self.labels.add(labels[i], node)
                    self.store.host["slot"][node] = slot
                    self.store.mark_dirty(node, "slot")
                else:
                    self.labels.add(labels[i], node)
            if config.graph_build_device:
                self._connect_batch_device(np.asarray(ids, dtype=np.int32))
            else:
                retry_device(lambda: self._connect_batch(ids, vecs))
            self._inserts_since_medoid += n
            if self.entry_id < 0 or self._inserts_since_medoid * 8 > self.store.count:
                self._update_medoid()
            return n if not overwrite else n - len(overwrite)

    def _unpack4_host(self, packed: np.ndarray) -> np.ndarray:
        lo = packed & np.uint8(0x0F)
        hi = packed >> 4
        return np.concatenate([lo, hi], axis=-1)

    def _q_dev(self, ids):
        """Primary-space float views of freshly stored rows (decoded from
        the primary codes for the quantized modes)."""
        # Bulk builds adopt codes/scales device-side; host reads pull first.
        self.store.pull_host("data", "vmin", "delta", "norm")
        if self.quantized:
            codes = self.store.host["data"][ids]
            if self.primary_bits == 4:
                codes = self._unpack4_host(codes)
            codes = codes.astype(np.float32)
            vmin = self.store.host["vmin"][ids][:, None]
            delta = self.store.host["delta"][ids][:, None]
            q = vmin + delta * codes
            ysum = q.sum(-1, dtype=np.float32)
            ysumsq = (q * q).sum(-1, dtype=np.float32)
            return q.astype(np.float32), None, (ysum, ysumsq)
        q = self.store.host["data"][ids]
        if q.dtype == np.float64 and not jnp.zeros(0).dtype == jnp.float64:
            q = q.astype(np.float32)
        qn = None
        if "norm" in self.store.fields and self.metric == VecSimMetric.Cosine:
            qn = self.store.host["norm"][ids]
        return q, qn, None

    def _device_queries(self, dev, ids_dev):
        """Primary-space float views of stored rows, sliced on device
        (quantized rows are decoded on device; no host round-trip)."""
        if self.quantized:
            codes = dev["data"][ids_dev]
            if self.primary_bits == 4:
                codes = unpack4(codes)
            codes = codes.astype(jnp.float32)
            vmin = dev["vmin"][ids_dev][:, None]
            delta = dev["delta"][ids_dev][:, None]
            q = vmin + delta * codes
            ysum = jnp.sum(q, axis=-1)
            ysumsq = jnp.sum(q * q, axis=-1)
            return q, None, (ysum, ysumsq)
        q = dev["data"][ids_dev]
        qn = None
        if "norm" in self.store.fields and self.metric == VecSimMetric.Cosine:
            qn = dev["norm"][ids_dev]
        return q, qn, None

    def _connect_batch_device(self, ids: np.ndarray) -> None:
        """Connect a batch fully on device: one dispatch per pow2 chunk.

        The Vamana analog of ``HNSWIndex._connect_batch_device``
        (``graph_build.vamana_connect``): beam, alpha pruning, and
        reverse-edge application fuse into one jitted program; device link
        arrays become authoritative and host mirrors are pulled lazily
        (``_ensure_host_links``)."""
        n = len(ids)
        if n == 0:
            return
        dev = self.store.device_arrays()
        ctx = self._ctx(dev)
        state = graph_build.VamanaState(
            dev["links"], dev["nlinks"], jnp.int32(self.entry_id)
        )
        kw = dict(
            L=self.L_build,
            deg=self.R,
            metric=self.metric,
            kind=self.store_kind,
            alpha=self._prune_alpha,
            a_cap=config.build_reverse_cap,
            beam_expand=config.build_beam_expand,
        )
        off = 0
        while off < n:
            c = 1
            while c * 2 <= n - off and c * 2 <= config.build_batch:
                c *= 2
            ch = slice(off, off + c)
            state, d = retry_device(
                lambda s=state, ch=ch: graph_build.vamana_connect(
                    s, ctx, jnp.asarray(ids[ch]), **kw
                )
            )
            self._build_dropped.append(d)
            off += c
        if self.entry_id < 0:
            # Host mirror of the device rule (empty graph adopts the first
            # id); the medoid refresh right after the first batch replaces it.
            self.entry_id = int(ids[0])
        self.store._device["links"] = state.links
        self.store._device["nlinks"] = state.nlinks
        self.store.mark_host_stale("links", "nlinks")
        self._host_links_stale = True

    def build_dropped(self) -> int:
        """Reverse-edge pairs dropped by the device builder's per-row cap
        (``apply_reverse_edges_device``); 0 in healthy builds."""
        total = sum(int(np.asarray(d).sum()) for d in self._build_dropped)
        self._build_dropped = [total]
        return int(total)

    def bulk_build_device(
        self,
        data,
        n: Optional[int] = None,
        labels=None,
        *,
        batch: Optional[int] = None,
        scan_batches: Optional[int] = None,
        assume_normalized: bool = False,
        _deferred: bool = False,
    ):
        """Build the whole Vamana index from a device-resident dataset.

        The SVS analog of ``HNSWIndex.bulk_build_device``: ``data`` is a jax
        array [N, dim] already on device (GB-scale host uploads through a
        relay would dominate the build). Preprocessing — normalization,
        LeanVec projection training, SQ8/LVQ4 primary quantization, residual
        codes — all runs on device; the padded results are adopted as the
        store's compute copy (host mirrors pulled lazily). Construction runs
        ``graph_build.vamana_build_scan`` segments (``scan_batches`` insert
        batches per dispatch, zero host round-trips in between) with the
        medoid entry refreshed between segments on the same +12.5%-growth
        rule as the incremental path.

        The index must be empty. ``labels`` defaults to 0..N-1.
        """
        from ..core.store import _bucket_capacity

        with self._lock:
            if self.store.count:
                raise ValueError("bulk_build_device requires an empty index")
            if n is None:
                n = int(data.shape[0])
            batch = int(batch or config.build_batch)
            scan_batches = int(scan_batches or config.build_scan_batches)
            self._build_dropped = []
            cap = _bucket_capacity(n, self.store.block_size)

            def padded(x, fill):
                if x.shape[0] == cap:
                    return x
                out = jnp.full((cap, *x.shape[1:]), fill, dtype=x.dtype)
                return out.at[:n].set(x[:n])

            # --- device-side preprocessing ---
            adopt: dict = {}
            if self.quantized:
                full = data.astype(jnp.float32)
                if self.metric == VecSimMetric.Cosine and not assume_normalized:
                    nrm = jnp.linalg.norm(full, axis=1, keepdims=True)
                    full = full / jnp.where(nrm == 0, 1.0, nrm)
                if self.is_leanvec:
                    if self._P is None:
                        self._train_leanvec(full[: min(n, 65536)])
                    prim = leanvec_project(full, self._P)
                else:
                    prim = full
                quantize = sq4_quantize if self.primary_bits == 4 else sq8_quantize
                codes, vmin, delta, _, psumsq = quantize(prim)
                adopt["data"] = padded(codes, 0)
                adopt["vmin"] = padded(vmin, 0.0)
                adopt["delta"] = padded(delta, 0.0)
                if "sqnorm" in self.store.fields:
                    adopt["sqnorm"] = padded(psumsq, 0.0)
                if self.res_bits:
                    if self.is_leanvec:
                        res, rvmin, rdelta = residual_quantize(
                            full, jnp.zeros_like(full), self.res_bits
                        )
                        if "rsq" in self.store.fields:
                            adopt["rsq"] = padded(jnp.sum(full * full, axis=-1), 0.0)
                    else:
                        if self.primary_bits == 4:
                            recon = sq4_reconstruct(codes, vmin, delta, self.dim)
                        else:
                            recon = sq8_reconstruct(codes, vmin, delta)
                        res, rvmin, rdelta = residual_quantize(full, recon, self.res_bits)
                    adopt["res"] = padded(res, 0)
                    adopt["rvmin"] = padded(rvmin, 0.0)
                    adopt["rdelta"] = padded(rdelta, 0.0)
            elif self.store_kind == "int":
                di = data.astype(jnp.int32)
                if self.metric == VecSimMetric.Cosine:
                    adopt["norm"] = padded(
                        jnp.sqrt(jnp.sum(di * di, axis=1).astype(jnp.float32)), 1.0
                    )
                if "sqnorm" in self.store.fields:
                    adopt["sqnorm"] = padded(
                        jnp.sum(di * di, axis=1).astype(jnp.float32), 0.0
                    )
                adopt["data"] = padded(data, 0)
            else:
                dd = data.astype(self.store.fields["data"].device_dtype)
                if self.metric == VecSimMetric.Cosine and not assume_normalized:
                    nrm = jnp.linalg.norm(dd.astype(jnp.float32), axis=1, keepdims=True)
                    dd = (
                        dd.astype(jnp.float32) / jnp.where(nrm == 0, 1.0, nrm)
                    ).astype(dd.dtype)
                if "sqnorm" in self.store.fields:
                    adopt["sqnorm"] = padded(
                        jnp.sum(dd.astype(jnp.float32) ** 2, axis=1), 0.0
                    )
                adopt["data"] = padded(dd, 0)
            adopt["links"] = jnp.full((cap, self.R), -1, dtype=jnp.int32)
            adopt["nlinks"] = jnp.zeros((cap,), dtype=jnp.int32)
            self.store.adopt_device(adopt, count=n)

            # --- host metadata (labels; vectors/codes stay device-only) ---
            labs = (
                np.arange(n, dtype=np.int64)
                if labels is None
                else np.asarray(labels, dtype=np.int64)
            )
            self.store.host["label"][:n] = labs
            if self.multi:
                for i in range(n):
                    slot = self.labels.add(int(labs[i]), i)
                    self.store.host["slot"][i] = slot
            else:
                self.labels.label_to_id = {int(l): i for i, l in enumerate(labs)}

            # --- fused construction: scan segments + pow2 tail ---
            dev = self.store.device_arrays()
            ctx = self._ctx(dev)
            kw = dict(
                L=self.L_build,
                deg=self.R,
                metric=self.metric,
                kind=self.store_kind,
                alpha=self._prune_alpha,
                a_cap=config.build_reverse_cap,
                beam_expand=config.build_beam_expand,
            )
            state = graph_build.VamanaState(
                dev["links"], dev["nlinks"], jnp.int32(-1)
            )
        def _segments():
            import jax as _jax

            with self._lock:
                state_ = state
                nb = n // batch
                pos = 0
                built_at_medoid = 0  # rows built at the last medoid refresh
                while nb - pos >= 2:
                    T = min(scan_batches, nb - pos)
                    off0 = pos * batch
                    offsets = jnp.arange(
                        off0, off0 + T * batch, batch, dtype=jnp.int32
                    )

                    def run_segment(s=state_, o=offsets):
                        s2, d2 = graph_build.vamana_build_scan(
                            s, ctx, o, n=batch, **kw
                        )
                        return s2, int(np.asarray(d2).sum())

                    # Dispatch, yield, THEN force (see
                    # HNSWIndex.bulk_build_device: one in-flight segment per
                    # mesh device under a round-robin shard driver; the
                    # forcing read surfaces retryable relay failures).
                    s2, d2 = graph_build.vamana_build_scan(
                        state_, ctx, offsets, n=batch, **kw
                    )
                    yield
                    try:
                        state_, dropped = s2, int(np.asarray(d2).sum())
                    except _jax.errors.JaxRuntimeError:
                        state_, dropped = retry_device(run_segment)
                    self._build_dropped.append(dropped)
                    pos += T
                    built = pos * batch
                    # Same growth rule as the incremental path: refresh the
                    # medoid once the prefix grew >12.5% since the last
                    # refresh (the entry must stay among rows that already
                    # have links).
                    if (built - built_at_medoid) * 8 > built or built_at_medoid == 0:
                        self._update_medoid(limit=built)
                        built_at_medoid = built
                        state_ = graph_build.VamanaState(
                            state_.links, state_.nlinks, jnp.int32(self.entry_id)
                        )
                    self.log("debug", f"svs bulk build: {built}/{n}")
                self.store._device["links"] = state_.links
                self.store._device["nlinks"] = state_.nlinks
                self.store.mark_host_stale("links", "nlinks")
                self._host_links_stale = True
                if state_.entry >= 0:
                    self.entry_id = int(state_.entry)
                tail_start = pos * batch
                if tail_start < n:
                    self._connect_batch_device(
                        np.arange(tail_start, n, dtype=np.int32)
                    )
                self._update_medoid()

        if _deferred:
            return _segments()
        for _ in _segments():
            pass
        return None

    def _connect_batch(self, ids: list[int], raw_vecs: np.ndarray) -> None:
        self._ensure_host_links()  # host path writes host link rows directly
        prev_entry = self.entry_id
        n = len(ids)
        dev = self.store.device_arrays()
        ctx = self._ctx(dev)
        batch_ids = np.asarray(ids, dtype=np.int32)
        ids_dev = jnp.asarray(batch_ids)
        q, qn, qm = self._device_queries(dev, ids_dev)
        L = self.L_build
        cap = self.store.capacity

        beam_i = jnp.full((n, L), -1, dtype=jnp.int32)
        beam_d = jnp.full((n, L), jnp.inf, dtype=jnp.float32)
        if prev_entry >= 0:
            e = jnp.full((n,), prev_entry, dtype=jnp.int32)
            ed = dists_to_ids(
                q, jnp.full((n, 1), prev_entry, dtype=jnp.int32), ctx,
                metric=self.metric, kind=self.store_kind, q_norm=qn, q_meta=qm,
            )[:, 0]
            beam_d, beam_i = beam_search(
                q, ctx, dev["links"], None, e, ed, cap,
                ef=L, metric=self.metric, kind=self.store_kind, q_norm=qn, q_meta=qm,
            )

        if n > 1:
            pair = dists_to_ids(
                q, jnp.broadcast_to(ids_dev[None, :], (n, n)),
                ctx, metric=self.metric, kind=self.store_kind, q_norm=qn, q_meta=qm,
            )
            pair = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, pair)
        else:
            pair = jnp.full((1, 1), jnp.inf, dtype=jnp.float32)

        cand_i = jnp.concatenate([beam_i, jnp.broadcast_to(ids_dev[None, :], (n, n))], axis=1)
        cand_d = jnp.concatenate([beam_d, pair], axis=1)
        sel = np.asarray(
            diversity_prune(
                q, cand_i, cand_d, ctx,
                m=self.R, metric=self.metric, kind=self.store_kind,
                alpha=self._prune_alpha, q_norm=qn,
            )
        )
        self.store.host["links"][batch_ids] = sel
        self.store.host["nlinks"][batch_ids] = (sel >= 0).sum(axis=1).astype(np.int32)
        for node in batch_ids:
            self.store.mark_dirty(int(node), "links", "nlinks")
        valid_sel = sel >= 0
        pairs = np.column_stack(
            [sel[valid_sel], np.broadcast_to(batch_ids[:, None], sel.shape)[valid_sel]]
        ).astype(np.int32)
        self._apply_reverse_edges_fast(pairs)

    def _apply_reverse_edges_fast(self, pairs: np.ndarray) -> None:
        """Batch back-edges via the native host runtime; Python fallback."""
        from .. import native_bridge

        count = self.store.count
        links = self.store.host["links"]
        nlinks = self.store.host["nlinks"]
        res = native_bridge.apply_reverse_edges(links[:count], nlinks[:count], pairs)
        if res is None:
            additions: dict[int, list[int]] = {}
            for nb, node in pairs:
                additions.setdefault(int(nb), []).append(int(node))
            self._apply_reverse_edges(additions)
            return
        overflow, dirty = res
        for r in dirty:
            self.store.mark_dirty(int(r), "links", "nlinks")
        if len(overflow):
            over_set = set(int(x) for x in overflow)
            pending: dict[int, list[int]] = {}
            for nb, node in pairs:
                if int(nb) in over_set:
                    pending.setdefault(int(nb), []).append(int(node))
            rows = [
                (nb, list(dict.fromkeys(self.get_links(nb) + fresh)))
                for nb, fresh in pending.items()
            ]
            self._reprune_rows(rows)

    def _apply_reverse_edges(self, additions: dict[int, list[int]]) -> None:
        overflow: list[tuple[int, list[int]]] = []
        for nb, new_ids in additions.items():
            cur = self.get_links(nb)
            cur_set = set(cur)
            fresh = [x for x in dict.fromkeys(new_ids) if x not in cur_set and x != nb]
            if not fresh:
                continue
            if len(cur) + len(fresh) <= self.R:
                self.set_links(nb, cur + fresh)
            else:
                overflow.append((nb, cur + fresh))
        if overflow:
            self._reprune_rows(overflow)

    def _reprune_rows(self, rows: list[tuple[int, list[int]]]) -> None:
        dev = self.store.device_arrays()
        ctx = self._ctx(dev)
        # Pow2-bucket BOTH dims: (B, C) vary with every overflow set, and
        # on the relay each fresh shape is a ~30 s remote compile — at one
        # reprune per insert chunk that dominated the whole build (measured
        # 100k x 768 build not finishing in 90 min before bucketing; the
        # dozen bucketed shapes compile once each). Padding rows duplicate
        # the last node (results discarded); padding cands are -1 (masked).
        B = len(rows)
        C = pow2_bucket(max(max(len(c) for _, c in rows), 1))
        Bpad = pow2_bucket(B)
        cand = np.full((Bpad, C), -1, dtype=np.int32)
        for bi, (_, c) in enumerate(rows):
            cand[bi, : len(c)] = c
        nodes = [r[0] for r in rows] + [rows[-1][0]] * (Bpad - B)
        q_host, qn_host, qmeta_host = self._q_dev(nodes)
        q = jnp.asarray(q_host)
        qn = None if qn_host is None else jnp.asarray(qn_host)
        qm = None if qmeta_host is None else tuple(jnp.asarray(x) for x in qmeta_host)
        cd = dists_to_ids(
            q, jnp.asarray(cand), ctx, metric=self.metric, kind=self.store_kind,
            q_norm=qn, q_meta=qm,
        )
        sel = np.asarray(
            diversity_prune(
                q, jnp.asarray(cand), cd, ctx, m=self.R,
                metric=self.metric, kind=self.store_kind,
                alpha=self._prune_alpha, q_norm=qn,
            )
        )
        for bi, (node, _) in enumerate(rows):
            self.set_links(node, [int(x) for x in sel[bi] if x >= 0])

    # ------------------------------------------------------------------
    # Delete path
    # ------------------------------------------------------------------

    def delete_vector(self, label: int) -> int:
        with self._lock:
            ids = self.labels.remove_label(label)
            if not ids:
                return 0
            self._ensure_host_links()
            for node in sorted(ids, reverse=True):
                self._delete_node(node)
            self.store.maybe_shrink()
            if self.entry_id >= self.store.count:
                self._update_medoid()
            return len(ids)

    def _referrers(self, node: int) -> list[int]:
        from .. import native_bridge

        self._ensure_host_links()
        count = self.store.count
        hit = native_bridge.find_referrers(self.store.host["links"], count, node)
        if hit is None:
            hit = np.nonzero((self.store.host["links"][:count] == node).any(axis=1))[0]
        return [int(h) for h in hit]

    def _delete_node(self, node: int) -> None:
        repairs: list[tuple[int, list[int]]] = []
        own_links = self.get_links(node)
        for ref in self._referrers(node):
            if ref == node:
                continue
            own = [x for x in self.get_links(ref) if x != node]
            borrowed = [x for x in own_links if x != ref and x != node]
            cand = list(dict.fromkeys(own + borrowed))
            if not borrowed and len(cand) <= self.R:
                self.set_links(ref, cand)
            else:
                repairs.append((ref, cand))
        if repairs:
            self._reprune_rows(repairs)
        self._swap_remove(node)
        if self.entry_id == node or self.entry_id >= self.store.count:
            self._update_medoid()

    def _swap_remove(self, node: int) -> None:
        last = self.store.count - 1
        if node != last:
            for ref in self._referrers(last):
                links = [node if x == last else x for x in self.get_links(ref)]
                self.set_links(ref if ref != last else node, links)
            moved_label = int(self.store.host["label"][last])
            if self.multi:
                if moved_label in self.labels and last in self.labels.label_to_ids.get(moved_label, ()):
                    self.labels.on_swap(moved_label, last, node)
            elif self.labels.label_to_id.get(moved_label) == last:
                self.labels.on_swap(moved_label, node)
            if self.entry_id == last:
                self.entry_id = node
        self.store.swap_delete(node)

    def mark_delete(self, label: int) -> list[int]:
        with self._lock:
            ids = self.labels.remove_label(label)
            for node in ids:
                self.store.host["flags"][node] |= FLAG_DELETED
                self.store.mark_dirty(node, "flags")
                self.num_marked_deleted += 1
            return ids

    def _delete_node_tombstoned(self, node: int) -> None:
        self.store.host["flags"][node] &= ~np.uint8(FLAG_DELETED)
        self.store.mark_dirty(node, "flags")
        self._delete_node(node)

    # ------------------------------------------------------------------
    # Read path
    # ------------------------------------------------------------------

    def _effective_ws(self, k: int, params: Optional[VecSimQueryParams]) -> int:
        ws = self.ws
        if params is not None and params.svsRuntimeParams.windowSize:
            ws = params.svsRuntimeParams.windowSize
        if params is not None and params.svsRuntimeParams.bufferCapacity:
            ws = max(ws, params.svsRuntimeParams.bufferCapacity)
        return max(ws, k)

    def search_knn(self, queries: np.ndarray, k: int, ef: int):
        # High-ef batches split into sub-dispatches to decouple stragglers
        # (config.search_sub_batch; same policy/rationale as HNSWIndex).
        queries = np.atleast_2d(queries)
        sub = config.resolve_search_sub_batch(ef)
        with self._lock:
            if not sub or len(queries) <= sub:
                return self._search_knn_locked(queries, k, ef)
            parts = [
                self._search_knn_locked(queries[s : s + sub], k, ef)
                for s in range(0, len(queries), sub)
            ]
            return (
                np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]),
            )

    def search_resumable(self, queries: np.ndarray, k: int, ef: int, state=None):
        """Resumable beam search for deep paging (``SVSBatchIterator``):
        pass the returned ``state`` back with a larger window to continue
        expansion without re-visiting nodes — the single-layer analog of
        ``HNSWIndex.search_resumable`` (the reference's
        ``svs::vamana::iterator`` similarly resumes its internal schedule,
        ``svs_batch_iterator.h:23-60``). State is invalidated by any index
        mutation (count/capacity/entry changes)."""
        with self._lock:
            bd, bi, st = self._search_knn_locked(
                np.atleast_2d(queries), k, ef,
                init_state=state, return_state=True,
            )
            return bd, bi, st

    def _search_knn_locked(self, queries: np.ndarray, k: int, ef: int,
                           *, init_state=None, return_state: bool = False):
        count = self.store.count
        q, qnorms, qmeta = self.preprocess_queries(queries)
        nq = len(q)
        bpad = pow2_bucket(nq)
        if bpad != nq:
            pad = bpad - nq
            q = np.concatenate([q, np.repeat(q[-1:], pad, axis=0)])
            if qnorms is not None:
                qnorms = np.concatenate([qnorms, np.repeat(qnorms[-1:], pad)])
            if qmeta is not None:
                qmeta = tuple(np.concatenate([m, np.repeat(m[-1:], pad)]) for m in qmeta)
        dev = self.store.device_arrays()
        ctx = self._ctx(dev)
        if self._qmesh is not None:
            q, qnorms = self._maybe_shard_queries(q, qnorms)
            bpad = len(q)
            if qmeta is not None and qmeta[0].shape[0] != bpad:
                qmeta = tuple(
                    np.concatenate([m, np.repeat(m[-1:], bpad - m.shape[0])])
                    for m in qmeta
                )
        qd = jnp.asarray(q)
        qn = None if qnorms is None else jnp.asarray(qnorms)
        qm = None if qmeta is None else tuple(jnp.asarray(m) for m in qmeta)
        if self.quantized:
            # Beam runs in the primary (possibly LeanVec-projected) space.
            qd, qm = self._primary_queries(qd)
        ep = self.entry_id
        e = jnp.full((bpad,), ep, dtype=jnp.int32)
        ed = dists_to_ids(
            qd, jnp.full((bpad, 1), ep, dtype=jnp.int32), ctx,
            metric=self.metric, kind=self.store_kind, q_norm=qn, q_meta=qm,
        )[:, 0]
        ef_pad = min(pow2_bucket(max(ef, k)), max(pow2_bucket(count), 1))
        out = beam_search(
            qd, ctx, dev["links"], None, e, ed, self.store.capacity,
            ef=ef_pad, metric=self.metric, kind=self.store_kind, q_norm=qn, q_meta=qm,
            expand=config.resolve_search_expand(ef),
            init_state=init_state, return_state=return_state,
        )
        if return_state:
            bd, bi, state, _, _ = out
            return np.asarray(bd)[:nq], np.asarray(bi)[:nq], state
        bd, bi = out
        return np.asarray(bd)[:nq], np.asarray(bi)[:nq]

    # ------------------------------------------------------------------
    # Refinement (two-level / LeanVec secondary rerank)
    # ------------------------------------------------------------------

    def _refine_layers(self, dev):
        """(layers, packed_flags, xsumsq) for ``gathered_recon_dists``."""
        if self.is_leanvec:
            return (
                ((dev["res"], dev["rvmin"], dev["rdelta"]),),
                (self.res_bits == 4,),
                dev.get("rsq"),
            )
        return (
            (
                (dev["data"], dev["vmin"], dev["delta"]),
                (dev["res"], dev["rvmin"], dev["rdelta"]),
            ),
            (self.primary_bits == 4, self.res_bits == 4),
            dev.get("sqnorm"),
        )

    def exact_gathered_dists(self, q: np.ndarray, ids: np.ndarray) -> np.ndarray:
        """Best-decode distances from preprocessed original-space queries to
        stored rows — the ad-hoc scoring hook (``core.adhoc``) for modes
        whose primary store lives in a different space than the query."""
        dev = self.store.device_arrays()
        layers, packed, xsumsq = self._refine_layers(dev)
        d = np.asarray(gathered_recon_dists(
            jnp.asarray(q, dtype=jnp.float32), jnp.asarray(np.maximum(ids, 0)),
            layers, xsumsq,
            metric_is_l2=self.metric == VecSimMetric.L2, packed_flags=packed,
        ))
        return np.where(ids >= 0, d, np.inf)

    def _refine(self, queries: np.ndarray, dists: np.ndarray, ids: np.ndarray):
        """Re-score search-window candidates against the best stored decode
        and re-sort each row. For two-level LVQ the decode is
        primary+residual; for LeanVec it is the full-dimension SQ8
        secondary — the reference's rerank contract for these modes."""
        q, _, _ = self.preprocess_queries(queries)
        dev = self.store.device_arrays()
        layers, packed, xsumsq = self._refine_layers(dev)
        safe = np.maximum(ids, 0)
        refined = np.asarray(gathered_recon_dists(
            jnp.asarray(q), jnp.asarray(safe), layers, xsumsq,
            metric_is_l2=self.metric == VecSimMetric.L2, packed_flags=packed,
        ))
        refined = np.where((ids >= 0) & np.isfinite(dists), refined, np.inf)
        order = np.argsort(refined, axis=1, kind="stable")
        return (
            np.take_along_axis(refined, order, axis=1),
            np.take_along_axis(ids, order, axis=1),
        )

    def topk_query(
        self, query: np.ndarray, k: int, params: Optional[VecSimQueryParams] = None
    ) -> QueryReply:
        return self.topk_query_batch(np.asarray(query).reshape(1, -1), k, params)[0]

    def topk_query_batch(
        self, queries: np.ndarray, k: int, params: Optional[VecSimQueryParams] = None
    ) -> list[QueryReply]:
        self.last_mode = VecSearchMode.STANDARD_KNN
        budget = TimeoutBudget(params.timeoutCtx if params else None)
        nq = len(np.atleast_2d(queries))
        if budget.expired():
            return [make_reply([], [], VecSimQueryReplyCode.TimedOut) for _ in range(nq)]
        if self.store.count == 0 or self.entry_id < 0 or k <= 0:
            return [make_reply([], []) for _ in range(nq)]
        ws = self._effective_ws(k, params)
        # Window allowance + distinct-label retry: see HNSWIndex
        # .topk_query_batch (matches hnsw_multi.h:105's label-keyed heap
        # guarantee without one).
        extra = self.num_marked_deleted
        if self.multi:
            extra += max(0, self.store.count - len(self.labels.label_to_ids))
        ws += min(extra, ws)
        qs2 = np.atleast_2d(queries)
        dists, ids = self.search_knn(qs2, k, ws)
        if self.res_bits:
            dists, ids = self._refine(qs2, dists, ids)
        out = []
        flags = self.store.host["flags"]
        id_to_label = self.store.host["label"]
        live_label_total = (
            len(self.labels.label_to_ids) if self.multi else 0
        )

        def filter_live(row_i, row_d):
            valid = row_i >= 0
            row_i, row_d = row_i[valid], row_d[valid]
            live = (flags[row_i] & FLAG_DELETED) == 0
            return row_i[live], row_d[live]

        def dedup(labels, row_d):
            seen: set[int] = set()
            keep = []
            for j, lab in enumerate(labels):
                if int(lab) not in seen:
                    seen.add(int(lab))
                    keep.append(j)
                    if len(keep) >= k:
                        break
            return labels[keep], row_d[keep]

        def research(b, w):
            rd2, ri2 = self.search_knn(qs2[b : b + 1], k, w)
            if self.res_bits:
                rd2, ri2 = self._refine(qs2[b : b + 1], rd2, ri2)
            return filter_live(ri2[0], rd2[0])

        for b in range(nq):
            row_i, row_d = filter_live(ids[b], dists[b])
            labels = id_to_label[row_i]
            if self.multi:
                lab_k, d_k = dedup(labels, row_d)
                target = min(k, live_label_total)
                w = ws
                while (
                    len(lab_k) < target
                    and w < self.store.count
                    and not budget.expired()
                ):
                    w = min(w * 2, self.store.count)
                    ri, rd = research(b, w)
                    lab_k, d_k = dedup(id_to_label[ri], rd)
                out.append(make_reply(lab_k, d_k))
            else:
                tgt = min(k, len(self.labels.label_to_id))
                w = ws
                while (
                    len(labels) < tgt
                    and w < self.store.count
                    and not budget.expired()
                ):
                    w = min(w * 2, self.store.count)
                    row_i, row_d = research(b, w)
                    labels = id_to_label[row_i]
                out.append(make_reply(labels[:k], row_d[:k]))
        if budget.expired():
            for r in out:
                r.code = VecSimQueryReplyCode.TimedOut
        return out

    def range_query(
        self,
        query: np.ndarray,
        radius: float,
        params: Optional[VecSimQueryParams] = None,
        order: QueryReplyOrder = QueryReplyOrder.BY_SCORE,
    ) -> QueryReply:
        self.last_mode = VecSearchMode.RANGE_QUERY
        budget = TimeoutBudget(params.timeoutCtx if params else None)
        if budget.expired():
            return make_reply([], [], VecSimQueryReplyCode.TimedOut)
        if self.store.count == 0 or self.entry_id < 0:
            return make_reply([], [])
        eps = self.epsilon
        if params is not None and params.svsRuntimeParams.epsilon:
            eps = params.svsRuntimeParams.epsilon
        boundary = radius * (1.0 + eps)
        ef = max(self.ws, 32)
        q2 = np.asarray(query).reshape(1, -1)
        # Fresh search per doubling — resume was evaluated and rejected
        # (lossy window, no net saving; see HNSWIndex.range_query note).
        while True:
            dists, ids = self.search_knn(q2, 1, ef)
            d, i = dists[0], ids[0]
            finite = np.isfinite(d)
            if ef >= self.store.count or not finite.any():
                break
            if d[finite].max() > boundary or finite.sum() < ef:
                break
            if budget.expired():
                break
            ef *= 2
        if self.res_bits:
            rd, ri = self._refine(q2, d[None, :], i[None, :])
            d, i = rd[0], ri[0]
        valid = (i >= 0) & (d <= radius)
        row_i = i[valid]
        flags = self.store.host["flags"]
        live = (flags[row_i] & FLAG_DELETED) == 0
        row_i, row_d = row_i[live], d[valid][live]
        reply = make_reply(self.store.host["label"][row_i], row_d)
        if self.multi:
            from ..core.results import filter_results_by_id

            reply = filter_results_by_id(reply)
        if budget.expired():
            reply.code = VecSimQueryReplyCode.TimedOut
        return reply.sort(order)

    def _decode_host(self, ids) -> np.ndarray:
        """Best-available original-space decode of stored rows [n, ~dim]:
        secondary SQ8 for LeanVec, primary+residual for two-level LVQ,
        primary decode otherwise. (4-bit rows of odd dim decode one pad
        column wider; callers dot against zero-padded queries.)"""
        self.store.pull_host(
            "data", "vmin", "delta", "res", "rvmin", "rdelta", "sqnorm", "rsq"
        )  # no-op unless device-adopted
        host = self.store.host
        ids = np.asarray(ids)
        if self.is_leanvec:
            res = host["res"][ids].astype(np.float32)
            return host["rvmin"][ids][:, None] + host["rdelta"][ids][:, None] * res
        codes = host["data"][ids]
        if self.primary_bits == 4:
            codes = self._unpack4_host(codes)
        x = host["vmin"][ids][:, None] + host["delta"][ids][:, None] * codes.astype(np.float32)
        if self.res_bits:
            res = host["res"][ids]
            if self.res_bits == 4:
                res = self._unpack4_host(res)
            r = host["rvmin"][ids][:, None] + host["rdelta"][ids][:, None] * res.astype(np.float32)
            w = min(x.shape[1], r.shape[1])  # widths differ only by pack pad
            x = x[:, :w] + r[:, :w]
        return x

    def get_distance_from(self, label: int, blob: np.ndarray) -> float:
        ids = self.labels.ids_of(label)
        if not ids:
            return float("nan")
        if self.quantized:
            q, _, qm = self.preprocess_queries(np.asarray(blob).reshape(1, -1))
            x = self._decode_host(ids)  # [n, >=dim]
            qrow = np.zeros(x.shape[1], dtype=np.float32)
            qrow[: q.shape[1]] = q[0]
            ip = x @ qrow
            if self.metric == VecSimMetric.L2:
                sq_field = "rsq" if self.is_leanvec else "sqnorm"
                xsq = self.store.host[sq_field][np.asarray(ids)]
                return float(np.min(xsq - 2.0 * ip + qm[1][0]))
            return float(np.min(1.0 - ip))
        q, qnorms, _ = self.preprocess_queries(np.asarray(blob).reshape(1, -1))
        qn = None if qnorms is None else qnorms[0]
        return min(self.host_distance(i, q[0], qn) for i in ids)

    def new_batch_iterator(self, query: np.ndarray, params: Optional[VecSimQueryParams] = None):
        from .svs_batch_iterator import SVSBatchIterator

        return SVSBatchIterator(self, query, params)

    def prefer_adhoc_search(self, subset_size: int, k: int, initial_check: bool = False) -> bool:
        # The reference SVS index reuses the generic heuristic family; apply
        # the BF tree on the same features (svs.h preferAdHocSearch).
        index_size = self.index_size
        subset_size = min(subset_size, index_size)
        r = 0.0 if index_size == 0 else subset_size / max(self.index_label_count, 1)
        res = index_size <= 5500 or r <= 0.15
        self.last_mode = (
            (VecSearchMode.HYBRID_ADHOC_BF if initial_check else VecSearchMode.HYBRID_BATCHES_TO_ADHOC_BF)
            if res
            else VecSearchMode.HYBRID_BATCHES
        )
        return res

    # ------------------------------------------------------------------
    # Info
    # ------------------------------------------------------------------

    def basic_info(self):
        info = self._basic_info(VecSimAlgo.SVS)
        return info

    def stats_info(self) -> VecSimIndexStatsInfo:
        return VecSimIndexStatsInfo(
            memory=self.memory_bytes,
            numberOfMarkedDeleted=self.num_marked_deleted,
        )

    def debug_info(self) -> VecSimIndexDebugInfo:
        return VecSimIndexDebugInfo(
            commonInfo=CommonInfo(
                basicInfo=self.basic_info(),
                indexSize=self.index_size,
                indexLabelCount=self.index_label_count,
                memory=self.memory_bytes,
                lastMode=self.last_mode,
            ),
            svsInfo=SvsInfo(
                quantBits=self.requested_quant,
                alpha=self.alpha,
                graphMaxDegree=self.R,
                constructionWindowSize=self.L_build,
                # Reference defaults when unset (svs_utils.h:114-115):
                # candidate pool = 3x window, prune_to = degree (our pruner
                # prunes exactly to R).
                maxCandidatePoolSize=self.params.max_candidate_pool_size
                or 3 * self.L_build,
                pruneTo=self.params.prune_to or self.R,
                useSearchHistory=self.params.use_search_history
                != VecSimOptionMode.DISABLE,
                numberOfMarkedDeletedNodes=self.num_marked_deleted,
                searchWindowSize=self.ws,
                searchBufferCapacity=self.params.search_buffer_capacity or self.ws,
                leanvecDim=self.pdim if self.is_leanvec else 0,
                epsilon=self.epsilon,
            ),
        )
