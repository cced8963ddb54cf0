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
  - compression: quantBits NONE keeps the raw dtype; Scalar/Q8 store SQ8
    codes searched with the asymmetric kernels (ops.quantize); the 4-bit and
    LeanVec modes fall back to the nearest supported mode with a log, the
    same graceful fallback the reference factory performs when a mode is
    unavailable on the target ISA (svs_factory.cpp:64-117).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax.numpy as jnp

from ..core.abstract_index import DeviceVectorIndex, pow2_bucket, retry_device
from ..core.interface import TimeoutBudget
from ..core.results import QueryReply, make_reply
from ..core.store import FieldSpec
from ..ops.graph_search import StoreCtx, beam_search, dists_to_ids, diversity_prune
from ..ops.quantize import sq8_quantize
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
    VecSimIndexStatsInfo,
    VecSimMetric,
    VecSimQueryParams,
    VecSimQueryReplyCode,
    VecSimSvsQuantBits,
)

FLAG_DELETED = 1

_SQ8_MODES = {
    VecSimSvsQuantBits.Scalar,
    VecSimSvsQuantBits.Q8,
    VecSimSvsQuantBits.Q4,
    VecSimSvsQuantBits.Q4x4,
    VecSimSvsQuantBits.Q4x8,
    VecSimSvsQuantBits.Q4x8_LeanVec,
    VecSimSvsQuantBits.Q8x8_LeanVec,
}


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
        # In Vamana, alpha>1 RELAXES pruning for L2 (keeps more diverse
        # edges): candidate discarded when alpha*d(kept,c) <= d(q,c) means a
        # larger alpha discards FEWER... for our rule (discard when
        # alpha*pair < qd) alpha>1 discards more; invert to 1/alpha so
        # alpha=1.2 keeps the classic Vamana behavior of pruning less
        # aggressively than HNSW's alpha=1.
        self._prune_alpha = 1.0 / self.alpha if self.alpha > 0 else 1.0

        quant = VecSimSvsQuantBits(params.quantBits)
        self.requested_quant = quant
        if quant in _SQ8_MODES and quant not in (
            VecSimSvsQuantBits.Scalar,
            VecSimSvsQuantBits.Q8,
        ):
            # Graceful fallback, mirroring the reference factory's behavior
            # when a quant flavor is unsupported on the target.
            self._pending_log = (
                "warning",
                f"SVS quantization mode {quant.name} is not yet supported on "
                "this target; falling back to Scalar (SQ8)",
            )
            quant = VecSimSvsQuantBits.Scalar
        self.quant = quant
        self.is_sq8 = quant in (VecSimSvsQuantBits.Scalar, VecSimSvsQuantBits.Q8)

        extra: dict[str, FieldSpec] = {
            "links": FieldSpec((self.R,), np.int32, fill=-1),
            "nlinks": FieldSpec((), np.int32),
            "flags": FieldSpec((), np.uint8),
        }
        if self.is_sq8:
            extra["vmin"] = FieldSpec((), np.float32)
            extra["delta"] = FieldSpec((), np.float32)

        super().__init__(
            vtype=params.type,
            dim=params.dim,
            metric=params.metric,
            multi=params.multi,
            block_size=params.blockSize,
            log_ctx=log_ctx,
            extra_fields=extra,
        )
        if self.is_sq8:
            # Storage holds uint8 codes; metadata fields carry the scale.
            self.store.fields["data"] = FieldSpec((self.dim,), np.uint8)
            self.store._resize(self.store.capacity)  # re-materialize data field
            if self.metric == VecSimMetric.L2 and "sqnorm" not in self.store.fields:
                self.store.fields["sqnorm"] = FieldSpec((), np.float32)
                self.store._resize(self.store.capacity)
            self.store_kind = "sq8"
        self.params = params
        self.entry_id = -1
        self.num_marked_deleted = 0
        self._inserts_since_medoid = 0
        if getattr(self, "_pending_log", None):
            self.log(*self._pending_log)
        # First SVS index attaches to the process-wide shared pool and applies
        # any resize requested before index creation (svs_utils.h:509-518).
        SharedSVSThreadPool.instance().on_index_attached()

    # ------------------------------------------------------------------
    # Preprocessing (quantizing storage pipeline)
    # ------------------------------------------------------------------

    def preprocess_storage(self, blob: np.ndarray) -> dict[str, np.ndarray]:
        if not self.is_sq8:
            return super().preprocess_storage(blob)
        arr = np.asarray(blob, dtype=np.float32 if self.np_dtype != np.float64 else np.float64)
        if arr.ndim == 1:
            arr = arr[None, :]
        if self.metric == VecSimMetric.Cosine:
            arr = self._parallel_normalize(arr.astype(np.float32))
        arr = arr.astype(np.float32)
        codes, vmin, delta, xsum, xsumsq = sq8_quantize(jnp.asarray(arr))
        rows = {
            "data": np.asarray(codes),
            "vmin": np.asarray(vmin),
            "delta": np.asarray(delta),
        }
        if "sqnorm" in self.store.fields:
            rows["sqnorm"] = np.asarray(xsumsq)
        return rows

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
        if not self.is_sq8:
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

    def get_links(self, node: int) -> list[int]:
        n = int(self.store.host["nlinks"][node])
        return self.store.host["links"][node, :n].tolist()

    def set_links(self, node: int, ids: list[int]) -> None:
        assert len(ids) <= self.R
        row = self.store.host["links"][node]
        row[: len(ids)] = ids
        row[len(ids) :] = -1
        self.store.host["nlinks"][node] = len(ids)
        self.store.mark_dirty(node, "links", "nlinks")

    # ------------------------------------------------------------------
    # Medoid entry point
    # ------------------------------------------------------------------

    def _update_medoid(self) -> None:
        """Entry point = vector closest to the dataset mean (approx medoid)."""
        count = self.store.count
        if count == 0:
            self.entry_id = -1
            return
        dev = self.store.device_arrays()
        data = dev["data"]
        if self.is_sq8:
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
            retry_device(lambda: self._connect_batch(ids, vecs))
            self._inserts_since_medoid += n
            if self.entry_id < 0 or self._inserts_since_medoid * 8 > self.store.count:
                self._update_medoid()
            return n if not overwrite else n - len(overwrite)

    def _q_dev(self, ids):
        """Float query views of freshly stored rows (reconstructed for sq8)."""
        if self.is_sq8:
            codes = self.store.host["data"][ids].astype(np.float32)
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
        """Float query views of stored rows, sliced on device (sq8 rows are
        reconstructed on device; no host round-trip)."""
        if self.is_sq8:
            codes = dev["data"][ids_dev].astype(jnp.float32)
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

    def _connect_batch(self, ids: list[int], raw_vecs: np.ndarray) -> None:
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
        C = max(len(c) for _, c in rows)
        B = len(rows)
        cand = np.full((B, C), -1, dtype=np.int32)
        for bi, (_, c) in enumerate(rows):
            cand[bi, : len(c)] = c
        nodes = [r[0] for r in rows]
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
            for node in sorted(ids, reverse=True):
                self._delete_node(node)
            self.store.maybe_shrink()
            if self.entry_id >= self.store.count:
                self._update_medoid()
            return len(ids)

    def _referrers(self, node: int) -> list[int]:
        from .. import native_bridge

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
        with self._lock:
            return self._search_knn_locked(queries, k, ef)

    def _search_knn_locked(self, queries: np.ndarray, k: int, ef: int):
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
        qd = jnp.asarray(q)
        qn = None if qnorms is None else jnp.asarray(qnorms)
        qm = None if qmeta is None else tuple(jnp.asarray(m) for m in qmeta)
        ep = self.entry_id
        e = jnp.full((bpad,), ep, dtype=jnp.int32)
        ed = dists_to_ids(
            qd, jnp.full((bpad, 1), ep, dtype=jnp.int32), ctx,
            metric=self.metric, kind=self.store_kind, q_norm=qn, q_meta=qm,
        )[:, 0]
        ef_pad = min(pow2_bucket(max(ef, k)), max(pow2_bucket(count), 1))
        bd, bi = beam_search(
            qd, ctx, dev["links"], None, e, ed, self.store.capacity,
            ef=ef_pad, metric=self.metric, kind=self.store_kind, q_norm=qn, q_meta=qm,
        )
        return np.asarray(bd)[:nq], np.asarray(bi)[:nq]

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
        ws += min(self.num_marked_deleted, ws)
        dists, ids = self.search_knn(np.atleast_2d(queries), k, ws)
        out = []
        flags = self.store.host["flags"]
        id_to_label = self.store.host["label"]
        for b in range(nq):
            row_i, row_d = ids[b], dists[b]
            valid = row_i >= 0
            row_i, row_d = row_i[valid], row_d[valid]
            live = (flags[row_i] & FLAG_DELETED) == 0
            row_i, row_d = row_i[live], row_d[live]
            labels = id_to_label[row_i]
            if self.multi:
                seen: set[int] = set()
                keep = []
                for j, lab in enumerate(labels):
                    if int(lab) not in seen:
                        seen.add(int(lab))
                        keep.append(j)
                keep = keep[:k]
                out.append(make_reply(labels[keep], row_d[keep]))
            else:
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

    def get_distance_from(self, label: int, blob: np.ndarray) -> float:
        ids = self.labels.ids_of(label)
        if not ids:
            return float("nan")
        if self.is_sq8:
            q, _, qm = self.preprocess_queries(np.asarray(blob).reshape(1, -1))
            best = np.inf
            for i in ids:
                codes = self.store.host["data"][i].astype(np.float32)
                vmin = np.float32(self.store.host["vmin"][i])
                delta = np.float32(self.store.host["delta"][i])
                ip = vmin * qm[0][0] + delta * float(codes @ q[0])
                if self.metric == VecSimMetric.L2:
                    d = float(self.store.host["sqnorm"][i] - 2 * ip + qm[1][0])
                else:
                    d = float(1.0 - ip)
                best = min(best, d)
            return best
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
                numberOfMarkedDeletedNodes=self.num_marked_deleted,
                searchWindowSize=self.ws,
                epsilon=self.epsilon,
            ),
        )
