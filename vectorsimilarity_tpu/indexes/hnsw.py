"""HNSW index — flat SoA adjacency + jitted device beam search.

TPU re-design of ``algorithms/hnsw/hnsw.h`` (2.3k LoC). The reference's
pointer-linked ``ElementGraphData`` nodes (``graph_data.h:15-137``) become
dense SoA arrays aligned with the vector store:

  - level-0 links:   ``links0`` [cap, M0] int32 (-1 padded) + ``nlinks0``
  - upper links:     a compact side store for the ~N/M nodes with level>=1:
                     ``links`` [ucap, LMAX, M], ``nlinks`` [ucap, LMAX],
                     with ``upper_row`` [cap] mapping vector id -> row
  - per-node level, flags (DELETED tombstone for the tiered async path)

Queries run fully on device: batched greedy descent over upper levels
(hnsw.h:1872-1886 ``searchBottomLayerEP``) then an ef-beam at level 0
(hnsw.h:1888-1940) — see ``ops/graph_search.py``. Construction is
host-orchestrated but device-assisted: inserts are batched; candidate search
runs the same device beam (hnsw.h:1548-1583 ``insertElementToGraph``),
diversity pruning (hnsw.h:725-779 ``getNeighborsByHeuristic2``) runs as a
batched device ``fori_loop``, and the host only writes link rows. Deletion
keeps the reference's in-place semantics (hnsw.h:946-1184): neighbors are
repaired by re-pruning over (their links ∪ deleted's links), then the row is
removed with swap-with-last including graph id rewrites. Instead of
incoming-unidirectional-edge lists (graph_data.h:17-97) the repair sweep
finds referrers with a vectorized scan over the SoA link arrays — O(N·M/8)
bytes of sequential reads instead of per-edge set bookkeeping.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .. import config
from ..core.abstract_index import DeviceVectorIndex, pow2_bucket, retry_device
from ..ops import graph_build
from ..core.interface import TimeoutBudget
from ..core.results import QueryReply, make_reply
from ..core.store import BlockStore, FieldSpec
from ..ops.graph_search import (
    StoreCtx,
    beam_search,
    dists_to_ids,
    diversity_prune,
    diversity_prune_chunked,
    exact_rerank,
    greedy_level,
)
from ..types import (
    CommonInfo,
    HNSWParams,
    HnswInfo,
    INVALID_LABEL,
    QueryReplyOrder,
    VecSearchMode,
    VecSimAlgo,
    VecSimIndexDebugInfo,
    VecSimIndexStatsInfo,
    VecSimMetric,
    VecSimQueryParams,
    VecSimQueryReplyCode,
)

FLAG_DELETED = 1

_INITIAL_LMAX = 4


@jax.jit
def _compact_stores(dev, udev, idx, uidx, perm, uperm):
    """Gather live rows + remap link ids for both stores in ONE dispatch.

    ``idx``/``uidx`` are full-capacity gather indices (live rows first),
    ``perm``/``uperm`` map old vector ids / upper rows to new ones (-1 gone).
    Bulk tombstone removal uses this instead of per-node swap-with-last row
    moves (and instead of re-uploading compacted host columns, which would
    push the whole store through the host link)."""
    out = {name: jnp.take(arr, idx, axis=0) for name, arr in dev.items()}
    out["links0"] = jnp.where(
        out["links0"] >= 0, jnp.take(perm, jnp.maximum(out["links0"], 0)), -1
    )
    out["upper_row"] = jnp.where(
        out["upper_row"] >= 0, jnp.take(uperm, jnp.maximum(out["upper_row"], 0)), -1
    )
    uout = {name: jnp.take(arr, uidx, axis=0) for name, arr in udev.items()}
    uout["links"] = jnp.where(
        uout["links"] >= 0, jnp.take(perm, jnp.maximum(uout["links"], 0)), -1
    )
    uout["vec"] = jnp.where(
        uout["vec"] >= 0, jnp.take(perm, jnp.maximum(uout["vec"], 0)), -1
    )
    return out, uout


class HNSWIndex(DeviceVectorIndex):
    def __init__(self, params: HNSWParams, log_ctx: Any = None, seed: int = 200):
        self.M = params.M
        self.M0 = 2 * params.M  # hnsw.h:1599 (maxM0 = 2*M)
        self.ef_construction = max(params.efConstruction, self.M)
        self.ef_runtime = params.efRuntime
        self.epsilon = params.epsilon
        self.mult = 1.0 / math.log(self.M)  # hnsw.h:399-404 level sampling
        super().__init__(
            vtype=params.type,
            dim=params.dim,
            metric=params.metric,
            multi=params.multi,
            block_size=params.blockSize,
            log_ctx=log_ctx,
            initial_capacity=params.initialCapacity,
            extra_fields={
                "level": FieldSpec((), np.int32),
                "upper_row": FieldSpec((), np.int32, fill=-1),
                "links0": FieldSpec((self.M0,), np.int32, fill=-1),
                "nlinks0": FieldSpec((), np.int32),
                "flags": FieldSpec((), np.uint8),
            },
        )
        self.params = params
        self.lmax = _INITIAL_LMAX
        self.upper = self._new_upper_store(self.lmax)
        self.entry_id = -1
        self.max_level = -1
        self.num_marked_deleted = 0
        self._rng = np.random.default_rng(seed)
        # Device-resident construction leaves the DEVICE link arrays
        # authoritative; host mirrors are pulled on first host-side access.
        self._host_links_stale = False
        self._build_dropped: list = []

    # ------------------------------------------------------------------
    # Upper-level side store
    # ------------------------------------------------------------------

    def _new_upper_store(self, lmax: int) -> BlockStore:
        return BlockStore(
            {
                "links": FieldSpec((lmax, self.M), np.int32, fill=-1),
                "nlinks": FieldSpec((lmax,), np.int32),
                "vec": FieldSpec((), np.int32, fill=-1),
            },
            block_size=max(self.block_size // max(self.M, 1), 64),
        )

    def _grow_lmax(self, need: int) -> None:
        self._ensure_host_links()  # rebuild below re-uploads from host
        new_lmax = self.lmax
        while new_lmax < need:
            new_lmax *= 2
        old = self.upper
        self.upper = self._new_upper_store(new_lmax)
        if old.count:
            n = old.count
            rows = {
                "links": np.full((n, new_lmax, self.M), -1, dtype=np.int32),
                "nlinks": np.zeros((n, new_lmax), dtype=np.int32),
                "vec": old.host["vec"][:n].copy(),
            }
            rows["links"][:, : self.lmax] = old.host["links"][:n]
            rows["nlinks"][:, : self.lmax] = old.host["nlinks"][:n]
            self.upper.append(rows)
        self.lmax = new_lmax

    def _alloc_upper_row(self, node: int) -> int:
        r = int(
            self.upper.append(
                {
                    "links": np.full((1, self.lmax, self.M), -1, dtype=np.int32),
                    "nlinks": np.zeros((1, self.lmax), dtype=np.int32),
                    "vec": np.asarray([node], dtype=np.int32),
                }
            )[0]
        )
        self.store.host["upper_row"][node] = r
        self.store.mark_dirty(node, "upper_row")
        return r

    # ------------------------------------------------------------------
    # Host link accessors
    # ------------------------------------------------------------------

    def get_links(self, node: int, lvl: int) -> list[int]:
        self._ensure_host_links()
        if lvl == 0:
            n = int(self.store.host["nlinks0"][node])
            return self.store.host["links0"][node, :n].tolist()
        r = int(self.store.host["upper_row"][node])
        n = int(self.upper.host["nlinks"][r, lvl - 1])
        return self.upper.host["links"][r, lvl - 1, :n].tolist()

    def set_links(self, node: int, lvl: int, ids: list[int]) -> None:
        self._ensure_host_links()
        if lvl == 0:
            assert len(ids) <= self.M0
            row = self.store.host["links0"][node]
            row[: len(ids)] = ids
            row[len(ids) :] = -1
            self.store.host["nlinks0"][node] = len(ids)
            self.store.mark_dirty(node, "links0", "nlinks0")
            return
        assert len(ids) <= self.M
        r = int(self.store.host["upper_row"][node])
        row = self.upper.host["links"][r, lvl - 1]
        row[: len(ids)] = ids
        row[len(ids) :] = -1
        self.upper.host["nlinks"][r, lvl - 1] = len(ids)
        self.upper.mark_dirty(r, "links", "nlinks")

    def node_level(self, node: int) -> int:
        return int(self.store.host["level"][node])

    # ------------------------------------------------------------------
    # Device context
    # ------------------------------------------------------------------

    def _device_ctx(self, nav: bool = False):
        """``nav=True`` requests the bf16 navigation shadow (fp32 stores
        only); callers pass the relevant config gate —
        ``config.build_nav_bf16`` for construction,
        ``config.search_nav_bf16`` for queries (which re-score their result
        window exactly, ``graph_search.exact_rerank``)."""
        dev = self.store.device_arrays()
        udev = self.upper.device_arrays()
        nav_arr = None
        if (
            nav
            and self.store_kind == "float"
            and dev["data"].dtype == jnp.float32
        ):
            nav_arr = self._nav_shadow(dev["data"])
        ctx = StoreCtx(
            data=dev["data"], sqnorm=dev.get("sqnorm"), norm=dev.get("norm"),
            nav=nav_arr,
        )
        return dev, udev, ctx

    def _nav_shadow(self, data) -> jnp.ndarray:
        """bf16 shadow of the device data, cached per data buffer (the cast
        costs a full read+write; one insert batch reuses it across every
        kernel, and bulk builds reuse it across the whole build)."""
        cached = getattr(self, "_nav_cache", None)
        if cached is not None and cached[0] is data:
            return cached[1]
        nav = data.astype(jnp.bfloat16)
        self._nav_cache = (data, nav)
        return nav

    # ------------------------------------------------------------------
    # Device-authoritative link state (ops/graph_build.py)
    # ------------------------------------------------------------------

    def _graph_state(self, dev, udev) -> graph_build.GraphState:
        return graph_build.GraphState(
            links0=dev["links0"],
            nlinks0=dev["nlinks0"],
            ulinks=udev["links"],
            unlinks=udev["nlinks"],
            upper_row=dev["upper_row"],
            entry=jnp.int32(self.entry_id),
            max_level=jnp.int32(self.max_level),
        )

    def _adopt_graph_state(self, state: graph_build.GraphState) -> None:
        """Install device-built link arrays as the compute copy; host link
        mirrors become stale and are pulled lazily (``_ensure_host_links``).
        ``upper_row`` stays host-authoritative (the device write mirrors the
        values the host already assigned)."""
        self.store._device["links0"] = state.links0
        self.store._device["nlinks0"] = state.nlinks0
        self.store._device["upper_row"] = state.upper_row
        self.upper._device["links"] = state.ulinks
        self.upper._device["nlinks"] = state.unlinks
        self.store.mark_host_stale("links0", "nlinks0")
        self.upper.mark_host_stale("links", "nlinks")
        self._host_links_stale = True

    def _ensure_host_links(self) -> None:
        """Pull device-built links into the host mirrors (one bulk read).

        Host-path mutations (delete/repair/serialize) require fresh host
        links; queries and device construction never need this."""
        if not self._host_links_stale:
            return
        self._host_links_stale = False
        self.store.pull_host("links0", "nlinks0")
        self.upper.pull_host("links", "nlinks")

    # ------------------------------------------------------------------
    # Write path
    # ------------------------------------------------------------------

    def _sample_level(self) -> int:
        u = self._rng.random()
        return int(-math.log(max(u, 1e-12)) * self.mult)

    def add_vector(self, blob: np.ndarray, label: int) -> int:
        return self.add_vector_batch(np.asarray(blob).reshape(1, -1), [label])

    def add_vector_batch(self, vecs: np.ndarray, labels) -> int:
        """Batched insert — the TPU-native write path.

        The reference inserts one vector at a time (hnsw.h:1764-1818); here a
        whole batch shares the device candidate searches. Intra-batch edges
        are recovered by merging batch-pairwise distances into the candidate
        lists, so batched construction matches sequential recall closely.
        """
        labels = [int(l) for l in labels]
        with self._lock:
            overwrite: list[int] = []
            if not self.multi:
                overwrite = [l for l in labels if l in self.labels]
                if len(overwrite) > 8:
                    # Batched overwrite (updated-index workload): tombstone
                    # the old copies and remove them in ONE bulk
                    # repair+compaction pass instead of per-label
                    # referrer-scan deletes.
                    old_ids: list[int] = []
                    for l in overwrite:
                        old_ids.extend(self.mark_delete(l))
                    self._delete_tombstoned_bulk_locked(old_ids)
                    self.num_marked_deleted -= len(old_ids)
                    self.store.maybe_shrink()
                else:
                    for l in overwrite:
                        self.delete_vector(l)
            rows = self.preprocess_storage(vecs)
            n = len(labels)
            rows["label"] = np.asarray(labels, dtype=np.int64)
            levels = np.asarray([self._sample_level() for _ in range(n)], dtype=np.int32)
            rows["level"] = levels
            # Appends only write the provided fields; row slots recycled by
            # deletes/compaction hold stale flags/upper_row otherwise.
            rows["flags"] = np.zeros(n, dtype=np.uint8)
            rows["upper_row"] = np.full(n, -1, dtype=np.int32)
            if levels.max(initial=0) + 1 > self.lmax:
                self.log("debug", f"growing upper-level capacity to {int(levels.max()) + 1}")
                self._grow_lmax(int(levels.max()) + 1)
            if self._host_links_stale:
                # Capacity growth re-uploads whole stores from host mirrors;
                # pull device-built links first so growth can't clobber them.
                n_up = int((levels >= 1).sum())
                if (
                    self.store.count + n > self.store.capacity
                    or self.upper.count + n_up > self.upper.capacity
                ):
                    self._ensure_host_links()
            ids = self.store.append(rows)
            for i, node in enumerate(ids):
                node = int(node)
                if self.multi:
                    slot = self.labels.add(labels[i], node)
                    self.store.host["slot"][node] = slot
                    self.store.mark_dirty(node, "slot")
                else:
                    self.labels.add(labels[i], node)
                if levels[i] >= 1:
                    self._alloc_upper_row(node)
            if config.graph_build_device:
                self._connect_batch_device(np.asarray(ids, dtype=np.int32), levels)
            else:
                # _connect_batch is idempotent for a fixed id set (links are
                # overwritten, reverse-edge application dedups), so transient
                # backend failures can simply re-run it.
                retry_device(lambda: self._connect_batch([int(x) for x in ids], levels))
            if self.multi:
                return n
            return n if not overwrite else n - len(overwrite)

    # -- construction (device-resident path, ops/graph_build.py) ---------

    def _connect_batch_device(self, ids: np.ndarray, levels: np.ndarray) -> None:
        """Connect a batch fully on device: one dispatch per pow2 chunk.

        Replaces the ~15 host round-trips per batch of the host-orchestrated
        path with a single fused program (upper descent scan, level-0 beam,
        heuristic pruning, reverse edges — ``graph_build.connect_batch``).
        """
        n = len(ids)
        if n == 0:
            return
        ids = np.asarray(ids, dtype=np.int32)
        levels = np.asarray(levels, dtype=np.int32)
        urows = self.store.host["upper_row"][ids].astype(np.int32)
        dev, udev, ctx = self._device_ctx(nav=config.build_nav_bf16)
        state = self._graph_state(dev, udev)
        kw = dict(
            efc=self.ef_construction,
            M=self.M,
            M0=self.M0,
            metric=self.metric,
            kind=self.store_kind,
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
                lambda s=state, ch=ch: graph_build.connect_batch(
                    s, ctx, jnp.asarray(ids[ch]), jnp.asarray(levels[ch]),
                    jnp.asarray(urows[ch]), **kw,
                )
            )
            self._build_dropped.append(d)
            # Host entry bookkeeping mirrors the device rule (first
            # occurrence of a strictly higher level wins) — no device read.
            top_row = int(np.argmax(levels[ch]))
            top = int(levels[ch][top_row])
            if self.entry_id < 0 or top > self.max_level:
                self.entry_id = int(ids[ch][top_row])
                self.max_level = top
            off += c
        self._adopt_graph_state(state)

    def build_dropped(self) -> int:
        """Reverse-edge pairs dropped by the device builder's per-row cap
        (``apply_reverse_edges_device``); 0 in healthy builds."""
        # Entries are device scalars (connect_batch) or [T] arrays
        # (build_scan segments); realized only when asked.
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
        """Build the whole index from a device-resident dataset.

        TPU-native bulk ingest: ``data`` is a jax array [N, dim] already on
        device (GB-scale host uploads through a relay would dominate the
        build — generate or shard the data device-side instead). Vectors are
        normalized / norm-annotated on device, adopted into the store
        (host vector mirrors stay unfilled, ``BlockStore.adopt_device``
        semantics), and the graph is constructed by
        ``ops.graph_build.build_scan`` — ``scan_batches`` insert batches per
        device dispatch, zero host round-trips in between. Host link mirrors
        are pulled lazily on first host-side access.

        The index must be empty. ``labels`` defaults to 0..N-1 (must be
        unique for non-multi indexes).

        ``_deferred=True`` returns a generator instead of running to
        completion: each ``next()`` dispatches ONE fused scan segment and
        yields BEFORE forcing its result, so a multi-shard driver
        (``parallel.sharded_graph.bulk_build_device``) can keep one
        segment in flight on every mesh device at once — the segments of
        different shards overlap instead of serializing shard-after-shard.
        The caller must exhaust the generator.
        """
        from ..core.store import _bucket_capacity

        with self._lock:
            if self.store.count or self.upper.count:
                raise ValueError("bulk_build_device requires an empty index")
            if n is None:
                n = int(data.shape[0])
            batch = int(batch or config.build_batch)
            scan_batches = int(scan_batches or config.build_scan_batches)
            self._build_dropped = []
            cap = _bucket_capacity(n, self.store.block_size)

            # --- level sampling + upper-row layout (host RNG, tiny) ---
            u = self._rng.random(n)
            levels = (-np.log(np.maximum(u, 1e-12)) * self.mult).astype(np.int32)
            if int(levels.max(initial=0)) + 1 > self.lmax:
                self._grow_lmax(int(levels.max()) + 1)
            upper_nodes = np.nonzero(levels >= 1)[0].astype(np.int32)
            n_up = len(upper_nodes)
            urows = np.full(n, -1, dtype=np.int32)
            urows[upper_nodes] = np.arange(n_up, dtype=np.int32)

            # --- device-side preprocessing (CosinePreprocessor semantics) ---
            def padded(x, fill):
                if x.shape[0] == cap:
                    return x
                out = jnp.full((cap, *x.shape[1:]), fill, dtype=x.dtype)
                return out.at[:n].set(x[:n])

            adopt: dict = {}
            if self.store_kind == "int":
                dd = data
                di = dd.astype(jnp.int32)
                if self.metric == VecSimMetric.Cosine:
                    adopt["norm"] = padded(
                        jnp.sqrt(jnp.sum(di * di, axis=1).astype(jnp.float32)), 1.0
                    )
                if "sqnorm" in self.store.fields:
                    adopt["sqnorm"] = padded(
                        jnp.sum(di * di, axis=1).astype(jnp.float32), 0.0
                    )
            else:
                dd = data.astype(self.store.fields["data"].device_dtype)
                if self.metric == VecSimMetric.Cosine and not assume_normalized:
                    # ``assume_normalized`` skips this copy: at 1M x 768 the
                    # normalized clone is an extra 3 GB of HBM held for the
                    # whole build on top of the caller's original — enough
                    # to tip a 16 GB chip into OOM with the nav shadow and
                    # construction transients resident.
                    nrm = jnp.linalg.norm(
                        dd.astype(jnp.float32), axis=1, keepdims=True
                    )
                    dd = (
                        dd.astype(jnp.float32) / jnp.where(nrm == 0, 1.0, nrm)
                    ).astype(dd.dtype)
                if "sqnorm" in self.store.fields:
                    adopt["sqnorm"] = padded(
                        jnp.sum(dd.astype(jnp.float32) ** 2, axis=1), 0.0
                    )
            adopt["data"] = padded(dd, 0)
            adopt["links0"] = jnp.full((cap, self.M0), -1, dtype=jnp.int32)
            adopt["nlinks0"] = jnp.zeros((cap,), dtype=jnp.int32)
            adopt["upper_row"] = padded(jnp.asarray(urows), -1)
            self.store.adopt_device(adopt, count=n)

            # --- host metadata (levels, labels; vectors stay device-only) ---
            self.store.host["level"][:n] = levels
            self.store.host["upper_row"][:n] = urows
            # The host mirror is exact now, so drop the stale mark (set by
            # adopt_device): delete bookkeeping READS host upper_row rows
            # (_swap_remove/_remove_upper_row), and a field left "stale"
            # takes swap_delete's deferred-device-move path, which skips
            # the host-side move — after the first swap the host mirror
            # silently diverges and upper-row mapping corrupts (caught by
            # test_bulk_build_then_delete_pulls_host_mirrors).
            self.store._host_stale.discard("upper_row")
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

            ucap = _bucket_capacity(max(n_up, 1), self.upper.block_size)
            vec_pad = np.full(ucap, -1, dtype=np.int32)
            vec_pad[:n_up] = upper_nodes
            # 'vec' is adopted alongside the link arrays so device and host
            # agree from the start — a later bulk compaction reads the
            # device copy (`_compact_stores`), which would otherwise hold
            # the adopt-time zeros.
            self.upper.adopt_device(
                {
                    "links": jnp.full((ucap, self.lmax, self.M), -1, dtype=jnp.int32),
                    "nlinks": jnp.zeros((ucap, self.lmax), dtype=jnp.int32),
                    "vec": jnp.asarray(vec_pad),
                },
                count=n_up,
            )
            self.upper.host["vec"][:n_up] = upper_nodes
            self.upper._host_stale.discard("vec")  # host mirror already exact

            # --- fused construction: scan segments + pow2 tail ---
            dev, udev, ctx = self._device_ctx(nav=config.build_nav_bf16)
            state = self._graph_state(dev, udev)
            kw = dict(
                efc=self.ef_construction,
                M=self.M,
                M0=self.M0,
                metric=self.metric,
                kind=self.store_kind,
                a_cap=config.build_reverse_cap,
                beam_expand=config.build_beam_expand,
            )
        def _segments():
            import jax as _jax

            with self._lock:
                state_ = state
                nb = n // batch
                pos = 0
                while nb - pos >= 2:
                    T = min(scan_batches, nb - pos)
                    off0 = pos * batch
                    offsets = jnp.arange(
                        off0, off0 + T * batch, batch, dtype=jnp.int32
                    )
                    lv = jnp.asarray(
                        levels[off0 : off0 + T * batch].reshape(T, batch)
                    )
                    ur = jnp.asarray(
                        urows[off0 : off0 + T * batch].reshape(T, batch)
                    )

                    def run_segment(s=state_, o=offsets, l=lv, u=ur):
                        s2, d2 = graph_build.build_scan(s, ctx, o, l, u, **kw)
                        return s2, int(np.asarray(d2).sum())

                    # Donating the state halves the link-array footprint
                    # (in/out aliased) — required headroom at 10M scale —
                    # at the price of the retry-from-previous-state path
                    # (the input buffers are consumed by the dispatch).
                    donate = config.build_donate_state
                    scan_fn = (graph_build.build_scan_donated if donate
                               else graph_build.build_scan)
                    # Dispatch, yield, THEN force: with one driver thread
                    # round-robining several shards, each mesh device keeps
                    # exactly one segment in flight (never more — piling
                    # multi-minute programs into one device's async stream
                    # has crashed relay-backed TPU workers, and the forcing
                    # read is what surfaces retryable failures).
                    s2, d2 = scan_fn(
                        state_, ctx, offsets, lv, ur, **kw
                    )
                    yield
                    try:
                        state_, dropped = s2, int(np.asarray(d2).sum())
                    except _jax.errors.JaxRuntimeError:
                        if donate:
                            # The previous state was donated into the failed
                            # dispatch — nothing to retry from.
                            raise
                        # Retryable backend flake: re-dispatch this segment
                        # from the previous state (idempotent).
                        state_, dropped = retry_device(run_segment)
                    self._build_dropped.append(dropped)
                    pos += T
                    self.log("debug", f"bulk build: {pos * batch}/{n}")
                self._adopt_graph_state(state_)
                tail_start = pos * batch
                if tail_start > 0:
                    pref = levels[:tail_start]
                    top_row = int(np.argmax(pref))
                    self.entry_id = top_row
                    self.max_level = int(pref[top_row])
                if tail_start < n:
                    self._connect_batch_device(
                        np.arange(tail_start, n, dtype=np.int32),
                        levels[tail_start:],
                    )

        if _deferred:
            return _segments()
        for _ in _segments():
            pass
        return None

    # -- construction (host-orchestrated reference path) -----------------

    def _connect_batch(self, ids: list[int], levels: np.ndarray) -> None:
        prev_ep, prev_max = self.entry_id, self.max_level
        n = len(ids)
        # Candidate lists per new node, per level: {(i, lvl): (ids, dists)}
        dev, udev, ctx = self._device_ctx()
        # The batch rows were just synced to device; slice them there instead
        # of re-uploading from host.
        row_sel = jnp.asarray(np.asarray(ids, dtype=np.int32))
        q = dev["data"][row_sel]
        qn = None
        if "norm" in self.store.fields and self.metric == VecSimMetric.Cosine:
            qn = dev["norm"][row_sel]
        efc = self.ef_construction
        cap = self.store.capacity

        # --- graph candidates (snapshot excludes this batch: new rows have
        # no incoming links yet, so they are unreachable) ---
        beam0_d = jnp.full((n, efc), jnp.inf, dtype=jnp.float32)
        beam0_i = jnp.full((n, efc), -1, dtype=jnp.int32)
        upper_cands: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
        if prev_ep >= 0:
            cur = jnp.full((n,), prev_ep, dtype=jnp.int32)
            cur_d = dists_to_ids(
                q, jnp.full((n, 1), prev_ep, dtype=jnp.int32), ctx,
                metric=self.metric, kind=self.store_kind, q_norm=qn,
            )[:, 0]
            # Level-synchronous descent for the whole batch: at each upper
            # level, nodes whose own level >= l run the candidate beam (two
            # device calls per level instead of one per node), everyone else
            # descends greedily.
            levels_np = np.asarray(levels)
            for l in range(prev_max, 0, -1):
                beam_rows = np.nonzero(levels_np >= l)[0]
                if len(beam_rows):
                    nb = len(beam_rows)
                    bpad = pow2_bucket(nb)
                    padded = np.concatenate(
                        [beam_rows, np.repeat(beam_rows[-1:], bpad - nb)]
                    )
                    ridx = jnp.asarray(padded, dtype=jnp.int32)
                    bd, bi = beam_search(
                        q[ridx], ctx, udev["links"], dev["upper_row"],
                        cur[ridx], cur_d[ridx], cap, jnp.int32(l),
                        ef=efc, metric=self.metric, kind=self.store_kind,
                        q_norm=None if qn is None else qn[ridx],
                    )
                    bi_np, bd_np = np.asarray(bi), np.asarray(bd)
                    for row, i in enumerate(beam_rows):
                        upper_cands[(int(i), l)] = (bi_np[row], bd_np[row])
                    rreal = jnp.asarray(beam_rows, dtype=jnp.int32)
                    cur = cur.at[rreal].set(bi[:nb, 0])
                    cur_d = cur_d.at[rreal].set(bd[:nb, 0])
                greedy_mask = levels_np < l
                if greedy_mask.any():
                    cur, cur_d = greedy_level(
                        q, ctx, udev["links"], dev["upper_row"], cur, cur_d,
                        jnp.int32(l), jnp.asarray(greedy_mask),
                        metric=self.metric, kind=self.store_kind, q_norm=qn,
                    )
            beam0_d, beam0_i = beam_search(
                q, ctx, dev["links0"], None, cur, cur_d, cap,
                ef=efc, metric=self.metric, kind=self.store_kind, q_norm=qn,
            )

        # --- intra-batch candidates (kept on device; the host only sees the
        # small per-upper-node slices and the final pruned links — the
        # [n, n] matrix and [n, efc] beams never cross the host boundary) ---
        batch_ids = np.asarray(ids, dtype=np.int32)
        ids_dev = jnp.asarray(batch_ids)
        if n > 1:
            pair_dev = dists_to_ids(
                q, jnp.broadcast_to(ids_dev[None, :], (n, n)),
                ctx, metric=self.metric, kind=self.store_kind, q_norm=qn,
            )
            eye = jnp.eye(n, dtype=bool)
            pair_dev = jnp.where(eye, jnp.inf, pair_dev)
        else:
            pair_dev = jnp.full((1, 1), jnp.inf, dtype=jnp.float32)

        # --- level 0: merge + prune for the whole batch in one device call ---
        cand_i_dev = jnp.concatenate([beam0_i, jnp.broadcast_to(ids_dev[None, :], (n, n))], axis=1)
        cand_d_dev = jnp.concatenate([beam0_d, pair_dev], axis=1)
        sel = np.asarray(
            diversity_prune(
                q, cand_i_dev, cand_d_dev, ctx,
                m=self.M0, metric=self.metric, kind=self.store_kind, q_norm=qn,
            )
        )
        # Host copies of the intra-batch distances only for upper-level nodes.
        upper_rows = np.nonzero(np.asarray(levels) >= 1)[0]
        pair = None
        if len(upper_rows):
            pair = np.asarray(pair_dev[jnp.asarray(upper_rows)])  # [U, n]
        pair_row = {int(r): j for j, r in enumerate(upper_rows)}
        # Bulk-write the new nodes' level-0 rows (sel is already compacted
        # to the front with -1 padding, matching the row layout).
        self.store.host["links0"][batch_ids] = sel
        self.store.host["nlinks0"][batch_ids] = (sel >= 0).sum(axis=1).astype(np.int32)
        for node in batch_ids:
            self.store.mark_dirty(int(node), "links0", "nlinks0")
        # Reverse edges (nb <- node) for level 0, applied natively when the
        # host runtime is available.
        valid_sel = sel >= 0
        pairs = np.column_stack(
            [sel[valid_sel], np.broadcast_to(batch_ids[:, None], sel.shape)[valid_sel]]
        ).astype(np.int32)
        self._apply_reverse_edges_l0(pairs)
        additions: dict[tuple[int, int], list[int]] = {}

        # --- upper levels: grouped by level, one prune call per level ---
        by_level: dict[int, list[tuple[int, np.ndarray, np.ndarray]]] = {}
        for i, node in enumerate(ids):
            li = int(levels[i])
            for l in range(1, li + 1):
                gi, gd = upper_cands.get(
                    (i, l), (np.empty(0, np.int32), np.empty(0, np.float32))
                )
                mask = levels >= l
                mask[i] = False
                ci = np.concatenate([gi, batch_ids[mask]]).astype(np.int32)
                cd = np.concatenate([gd, pair[pair_row[i]][mask]]).astype(np.float32)
                if len(ci) == 0:
                    self.set_links(node, l, [])
                    continue
                by_level.setdefault(l, []).append((i, ci, cd))
        for l, group in by_level.items():
            G = len(group)
            gpad = pow2_bucket(G)
            C = pow2_bucket(max(len(ci) for _, ci, _ in group))
            cand = np.full((gpad, C), -1, dtype=np.int32)
            cd_m = np.full((gpad, C), np.inf, dtype=np.float32)
            rows_q = np.zeros(gpad, dtype=np.int32)
            for g, (i, ci, cdv) in enumerate(group):
                cand[g, : len(ci)] = ci
                cd_m[g, : len(ci)] = cdv
                rows_q[g] = i
            ridx = jnp.asarray(rows_q)
            s = np.asarray(
                diversity_prune(
                    q[ridx], jnp.asarray(cand), jnp.asarray(cd_m), ctx,
                    m=self.M, metric=self.metric, kind=self.store_kind,
                    q_norm=None if qn is None else qn[ridx],
                )
            )
            for g, (i, _, _) in enumerate(group):
                node = ids[i]
                chosen = [int(x) for x in s[g] if x >= 0]
                self.set_links(node, l, chosen)
                for nb in chosen:
                    additions.setdefault((nb, l), []).append(node)

        self._apply_reverse_edges(additions)

        # --- entry point / max level ---
        top = int(levels.max(initial=0))
        if prev_ep < 0 or top > prev_max:
            best = int(np.argmax(levels))
            self.entry_id = ids[best]
            self.max_level = int(levels[best])

    def _apply_reverse_edges_l0(self, pairs: np.ndarray) -> None:
        """Level-0 back-edges for a whole batch: native C append with
        overflow detection; Python fallback groups per neighbor."""
        from .. import native_bridge

        count = self.store.count
        links0 = self.store.host["links0"]
        nlinks0 = self.store.host["nlinks0"]
        res = native_bridge.apply_reverse_edges(links0[:count], nlinks0[:count], pairs)
        if res is None:
            additions: dict[tuple[int, int], list[int]] = {}
            for nb, node in pairs:
                additions.setdefault((int(nb), 0), []).append(int(node))
            self._apply_reverse_edges(additions)
            return
        overflow, dirty = res
        for r in dirty:
            self.store.mark_dirty(int(r), "links0", "nlinks0")
        if len(overflow):
            over_set = set(int(x) for x in overflow)
            pending: dict[int, list[int]] = {}
            for nb, node in pairs:
                if int(nb) in over_set:
                    pending.setdefault(int(nb), []).append(int(node))
            rows = [
                (nb, 0, list(dict.fromkeys(self.get_links(nb, 0) + fresh)))
                for nb, fresh in pending.items()
            ]
            self._reprune_rows(rows)

    def _apply_reverse_edges(self, additions: dict[tuple[int, int], list[int]]) -> None:
        """Add new-node backlinks; re-prune overflowing rows on device.

        Reference ``revisitNeighborConnections`` (hnsw.h:781-868): append if
        room, otherwise re-run the diversity heuristic over old+new.
        """
        overflow: list[tuple[int, int, list[int]]] = []
        for (nb, lvl), new_ids in additions.items():
            cur = self.get_links(nb, lvl)
            cur_set = set(cur)
            fresh = [x for x in dict.fromkeys(new_ids) if x not in cur_set and x != nb]
            if not fresh:
                continue
            cap_l = self.M0 if lvl == 0 else self.M
            if len(cur) + len(fresh) <= cap_l:
                self.set_links(nb, lvl, cur + fresh)
            else:
                overflow.append((nb, lvl, cur + fresh))
        if overflow:
            self._reprune_rows(overflow)

    def _reprune_rows(self, rows: list[tuple[int, int, list[int]]]) -> None:
        """Batched heuristic re-prune of (node, level, candidates) rows."""
        dev, udev, ctx = self._device_ctx()
        for lvl_zero in (True, False):
            group = [r for r in rows if (r[1] == 0) == lvl_zero]
            if not group:
                continue
            m = self.M0 if lvl_zero else self.M
            # Pow2 padding keeps the jit cache small across batches.
            C = pow2_bucket(max(len(c) for _, _, c in group))
            B = pow2_bucket(len(group))
            cand = np.full((B, C), -1, dtype=np.int32)
            for bi, (_, _, c) in enumerate(group):
                cand[bi, : len(c)] = c
            nodes = np.asarray(
                [g[0] for g in group] + [group[-1][0]] * (B - len(group)), dtype=np.int32
            )
            q = dev["data"][jnp.asarray(nodes)]
            qn = None
            if ctx.norm is not None:
                qn = ctx.norm[jnp.asarray(nodes)]
            # Chunked: at bulk-GC scale the repair set is O(tombstones * M)
            # rows and a single up-front [B, C, D] distance gather is tens
            # of GB (observed 103 GB at a 100k-overwrite GC, 1M x 768) —
            # diversity_prune_chunked computes distances inside ~0.5 GB
            # row chunks instead.
            sel = np.asarray(
                diversity_prune_chunked(
                    q, jnp.asarray(cand), None, ctx, m=m,
                    metric=self.metric, kind=self.store_kind, q_norm=qn,
                )
            )
            for bi, (node, lvl, _) in enumerate(group):
                self.set_links(node, lvl, [int(x) for x in sel[bi] if x >= 0])

    # ------------------------------------------------------------------
    # Delete path (in-place: repair + swap, hnsw.h:946-1184)
    # ------------------------------------------------------------------

    def delete_vector(self, label: int) -> int:
        with self._lock:
            ids = self.labels.remove_label(label)
            if not ids:
                return 0
            for node in sorted(ids, reverse=True):
                self._delete_node(node)
            self.store.maybe_shrink()
            return len(ids)

    def _referrers(self, node: int) -> list[tuple[int, int]]:
        """All (referrer, level) with an edge -> node, via SoA scans.

        Uses the native host runtime's scan when available
        (``native/vecsim_host.cpp`` vs_find_referrers); numpy otherwise."""
        from .. import native_bridge

        self._ensure_host_links()
        count = self.store.count
        out = []
        hit = native_bridge.find_referrers(self.store.host["links0"], count, node)
        if hit is None:
            hit = np.nonzero((self.store.host["links0"][:count] == node).any(axis=1))[0]
        out.extend((int(h), 0) for h in hit)
        ucount = self.upper.count
        if ucount:
            ul = self.upper.host["links"][:ucount]
            flat_hit = native_bridge.find_referrers(
                ul.reshape(ucount * self.lmax, self.M), ucount * self.lmax, node
            )
            vec = self.upper.host["vec"]
            if flat_hit is None:
                rows, lvls = np.nonzero((ul == node).any(axis=2))
                out.extend((int(vec[r]), int(l) + 1) for r, l in zip(rows, lvls))
            else:
                for fr in flat_hit:
                    out.append((int(vec[fr // self.lmax]), int(fr % self.lmax) + 1))
        return out

    def _delete_node(self, node: int) -> None:
        node_lvl = self.node_level(node)
        # Repair each referrer: re-prune over (their links ∪ node's links).
        repairs: list[tuple[int, int, list[int]]] = []
        for ref, lvl in self._referrers(node):
            if ref == node:
                continue
            own = [x for x in self.get_links(ref, lvl) if x != node]
            borrowed = (
                [x for x in self.get_links(node, lvl) if x != ref and x != node]
                if lvl <= node_lvl
                else []
            )
            cand = list(dict.fromkeys(own + borrowed))
            cap_l = self.M0 if lvl == 0 else self.M
            if len(cand) <= cap_l and not borrowed:
                self.set_links(ref, lvl, cand)
            else:
                repairs.append((ref, lvl, cand))
        if repairs:
            self._reprune_rows(repairs)
        # Entry point replacement (hnsw.h:1045-1120 semantics).
        if self.entry_id == node:
            self._replace_entry_point(exclude=node)
        # Remove upper row if any.
        self._remove_upper_row(node)
        # Swap-with-last + reference rewrites.
        self._swap_remove(node)

    def _replace_entry_point(self, exclude: int) -> None:
        count = self.store.count
        levels = self.store.host["level"][:count]
        flags = self.store.host["flags"][:count]
        while self.max_level >= 0:
            cands = np.nonzero(
                (levels == self.max_level)
                & (np.arange(count) != exclude)
                & (flags & FLAG_DELETED == 0)
            )[0]
            if len(cands):
                self.entry_id = int(cands[0])
                return
            self.max_level -= 1
        # fall back: any live node
        live = np.nonzero((np.arange(count) != exclude) & (flags & FLAG_DELETED == 0))[0]
        if len(live):
            self.entry_id = int(live[0])
            self.max_level = int(levels[live[0]])
        else:
            self.entry_id = -1
            self.max_level = -1

    def _remove_upper_row(self, node: int) -> None:
        r = int(self.store.host["upper_row"][node])
        if r < 0:
            return
        last = self.upper.count - 1
        moved_vec = int(self.upper.host["vec"][last])
        self.upper.swap_delete(r)
        if r != last:
            self.store.host["upper_row"][moved_vec] = r
            self.store.mark_dirty(moved_vec, "upper_row")
        self.store.host["upper_row"][node] = -1
        self.store.mark_dirty(node, "upper_row")

    def _swap_remove(self, node: int) -> None:
        last = self.store.count - 1
        if node != last:
            # Rewrite references to `last` -> `node` before moving the row.
            for ref, lvl in self._referrers(last):
                links = [node if x == last else x for x in self.get_links(ref, lvl)]
                self.set_links(ref if ref != last else node, lvl, links)
            r = int(self.store.host["upper_row"][last])
            if r >= 0:
                self.upper.host["vec"][r] = node
                self.upper.mark_dirty(r, "vec")
            moved_label = int(self.store.host["label"][last])
            # Tombstoned rows are no longer in the label map (mark_delete
            # removed them); only live rows need the relocation recorded.
            if self.multi:
                if moved_label in self.labels and last in self.labels.label_to_ids.get(moved_label, ()):
                    self.labels.on_swap(moved_label, last, node)
            elif self.labels.label_to_id.get(moved_label) == last:
                self.labels.on_swap(moved_label, node)
            if self.entry_id == last:
                self.entry_id = node
        self.store.swap_delete(node)

    # ------------------------------------------------------------------
    # Tombstones (tiered async delete: markDelete, hnsw.h:430-445)
    # ------------------------------------------------------------------

    def _delete_node_tombstoned(self, node: int) -> None:
        """Physically remove a tombstoned node (its label map entry is gone).

        The tiered GC path: repair neighbors + swap, exactly like
        ``_delete_node`` (removeAndSwapMarkDeletedElement, hnsw.h:1694)."""
        self.store.host["flags"][node] &= ~np.uint8(FLAG_DELETED)
        self.store.mark_dirty(node, "flags")
        self._delete_node(node)

    def delete_tombstoned_bulk(self, nodes) -> int:
        """Physically remove MANY tombstoned nodes in one pass.

        The per-node path (``_delete_node_tombstoned``) pays a full referrer
        scan plus a device re-prune dispatch per node — O(tombstones × N)
        host work. This batches the reference's ``executeReadySwapJobs``
        (hnsw_tiered.h:332-362): one referrer sweep over the SoA link arrays
        for the whole tombstone set, one grouped repair re-prune, then a
        device-side compaction of the stores (gather of live rows + link id
        remap in one dispatch) instead of N swap-with-last row moves.

        All ``nodes`` must be tombstoned (FLAG_DELETED set, label entries
        already removed by ``mark_delete``). Returns the number removed.
        """
        nodes = [int(x) for x in nodes]
        if not nodes:
            return 0
        with self._lock:
            return self._delete_tombstoned_bulk_locked(nodes)

    def _delete_tombstoned_bulk_locked(self, nodes: list[int]) -> int:
        self._ensure_host_links()
        count = self.store.count
        deleted = np.zeros(count, dtype=bool)
        deleted[nodes] = True
        assert (self.store.host["flags"][nodes] & FLAG_DELETED).all(), (
            "bulk removal is for tombstoned nodes"
        )
        l0 = self.store.host["links0"][:count]
        nl0 = self.store.host["nlinks0"][:count]

        # --- batched neighbor repair (reference repair-job semantics) ---
        def repair_candidates(ref: int, lvl: int, row: np.ndarray):
            own = [int(x) for x in row if not deleted[x]]
            borrowed: list[int] = []
            for nb in row:
                if deleted[nb]:
                    borrowed.extend(
                        x for x in self.get_links(int(nb), lvl)
                        if x != ref and not deleted[x]
                    )
            cand = list(dict.fromkeys(own + borrowed))
            cap_l = self.M0 if lvl == 0 else self.M
            if len(cand) <= cap_l and not borrowed:
                self.set_links(ref, lvl, cand)
                return None
            return (ref, lvl, cand)

        repairs: list[tuple[int, int, list[int]]] = []
        hit0 = np.nonzero(
            ((l0 >= 0) & deleted[np.maximum(l0, 0)]).any(axis=1) & ~deleted
        )[0]
        for ref in hit0:
            r = repair_candidates(int(ref), 0, l0[ref][: nl0[ref]])
            if r is not None:
                repairs.append(r)
        ucount = self.upper.count
        if ucount:
            ul = self.upper.host["links"][:ucount]
            un = self.upper.host["nlinks"][:ucount]
            vec = self.upper.host["vec"][:ucount]
            rows_u, lvls_u = np.nonzero(
                ((ul >= 0) & deleted[np.maximum(ul, 0)]).any(axis=2)
            )
            for r, li in zip(rows_u, lvls_u):
                ref = int(vec[r])
                if deleted[ref]:
                    continue
                r2 = repair_candidates(ref, int(li) + 1, ul[r, li][: un[r, li]])
                if r2 is not None:
                    repairs.append(r2)
        if repairs:
            self._reprune_rows(repairs)

        # --- entry point: tombstone flags already exclude the whole set ---
        if self.entry_id >= 0 and deleted[self.entry_id]:
            self._replace_entry_point(exclude=self.entry_id)

        # --- compaction: live rows slide down, link ids remap ---
        live = np.nonzero(~deleted)[0]
        nlive = len(live)
        perm = np.full(count, -1, dtype=np.int32)
        perm[live] = np.arange(nlive, dtype=np.int32)
        uvec = self.upper.host["vec"][:ucount] if ucount else np.empty(0, np.int32)
        ulive = (
            np.nonzero(~deleted[np.maximum(uvec, 0)] & (uvec >= 0))[0]
            if ucount
            else np.empty(0, np.int64)
        )
        nu = len(ulive)
        uperm = np.full(max(ucount, 1), -1, dtype=np.int32)
        uperm[ulive] = np.arange(nu, dtype=np.int32)

        # Push pending repair edits, then compact ON DEVICE (one dispatch —
        # re-uploading compacted host columns would move the whole store
        # through the host link).
        dev, udev, _ = self._device_ctx()
        cap = self.store.capacity
        idx = np.full(cap, max(count - 1, 0), dtype=np.int32)
        idx[:nlive] = live
        ucap_rows = self.upper.capacity
        uidx = np.full(ucap_rows, 0, dtype=np.int32)
        uidx[:nu] = ulive
        perm_pad = np.full(cap, -1, dtype=np.int32)
        perm_pad[:count] = perm
        uperm_pad = np.full(max(ucap_rows, 1), -1, dtype=np.int32)
        uperm_pad[: len(uperm)] = uperm
        new_dev, new_udev = retry_device(
            lambda: _compact_stores(
                dev, udev, jnp.asarray(idx), jnp.asarray(uidx),
                jnp.asarray(perm_pad), jnp.asarray(uperm_pad),
            )
        )
        self.store._device.update(new_dev)
        self.upper._device.update(new_udev)

        # Host mirrors follow the same permutation (stale fields stay stale —
        # their device copies were compacted above).
        for name in self.store.fields:
            self.store.host[name][:nlive] = self.store.host[name][live]
        lh = self.store.host["links0"][:nlive]
        lh[:] = np.where(lh >= 0, perm_pad[np.maximum(lh, 0)], -1)
        urh = self.store.host["upper_row"][:nlive]
        urh[:] = np.where(urh >= 0, uperm[np.maximum(urh, 0)], -1)
        if ucount:
            for name in self.upper.fields:
                self.upper.host[name][:nu] = self.upper.host[name][ulive]
            ulh = self.upper.host["links"][:nu]
            ulh[:] = np.where(ulh >= 0, perm_pad[np.maximum(ulh, 0)], -1)
            uvh = self.upper.host["vec"][:nu]
            uvh[:] = np.where(uvh >= 0, perm[np.maximum(uvh, 0)], -1)
        self.store.count = nlive
        self.upper.count = nu
        for dset in self.store._dirty_rows.values():
            dset.clear()
        self.store._dirty_from = nlive
        for dset in self.upper._dirty_rows.values():
            dset.clear()
        self.upper._dirty_from = nu

        # --- label map + entry remap ---
        if self.entry_id >= 0:
            self.entry_id = int(perm[self.entry_id])
        self.labels = type(self.labels)()
        from ..utils.serializer import _rebuild_labels

        _rebuild_labels(self)
        return len(nodes)

    def mark_delete(self, label: int) -> list[int]:
        """Tombstone all vectors of a label; they stay traversable."""
        with self._lock:
            ids = self.labels.remove_label(label)
            for node in ids:
                self.store.host["flags"][node] |= FLAG_DELETED
                self.store.mark_dirty(node, "flags")
                self.num_marked_deleted += 1
            if self.entry_id in ids:
                self._replace_entry_point(exclude=self.entry_id)
            return ids

    # ------------------------------------------------------------------
    # Read path
    # ------------------------------------------------------------------

    def _effective_ef(self, k: int, params: Optional[VecSimQueryParams]) -> int:
        ef = self.ef_runtime
        if params is not None and params.hnswRuntimeParams.efRuntime:
            ef = params.hnswRuntimeParams.efRuntime
        return max(ef, k)

    def search_knn(self, queries: np.ndarray, k: int, ef: int):
        """Device graph search; returns (dists [B, ef'], ids [B, ef']).

        Host bookkeeping is guarded by the index lock (the reference allows
        lock-free concurrent reads via per-node spinlocks; here device
        dispatch releases the GIL, so the host-side critical section is
        short).

        Large batches are split into ``config.search_sub_batch``-query
        sub-dispatches at high ef (straggler decoupling — the beam loop
        runs until the whole dispatch converges; see config.py). Chunking
        is exact: beam rows are independent, so per-query results are
        byte-identical to the unsplit dispatch."""
        queries = np.atleast_2d(queries)
        sub = config.resolve_search_sub_batch(ef)
        with self._lock:
            if not sub or len(queries) <= sub:
                return self._search_knn_locked(queries, k, ef)
            # Dispatch every chunk before reading any result back: jitted
            # dispatch is async, so chunk i+1 queues while chunk i runs.
            parts = [
                self._search_chunk_device(queries[s : s + sub], k, ef)
                for s in range(0, len(queries), sub)
            ]
            return (
                np.concatenate([np.asarray(bd)[:n] for bd, bi, n in parts]),
                np.concatenate([np.asarray(bi)[:n] for bd, bi, n in parts]),
            )

    def _search_knn_locked(self, queries: np.ndarray, k: int, ef: int):
        bd, bi, nq = self._search_chunk_device(queries, k, ef)
        return np.asarray(bd)[:nq], np.asarray(bi)[:nq]

    def _search_chunk_device(self, queries: np.ndarray, k: int, ef: int):
        """Preprocess/pad/dispatch one query chunk; returns device result
        arrays unmaterialized so chunked callers can pipeline dispatches."""
        q, qnorms = self.preprocess_queries(queries)
        nq = len(q)
        bpad = pow2_bucket(nq)
        if bpad != nq:
            q = np.concatenate([q, np.repeat(q[-1:], bpad - nq, axis=0)])
            if qnorms is not None:
                qnorms = np.concatenate([qnorms, np.repeat(qnorms[-1:], bpad - nq)])
        q, qnorms = self._maybe_shard_queries(q, qnorms)
        qd = jnp.asarray(q)
        qn = None if qnorms is None else jnp.asarray(qnorms)
        bd, bi = self._device_search(qd, qn, k, ef)
        return bd, bi, nq

    def search_knn_device(self, qd, k: int, ef: int, qn=None):
        """Device-array entry point for multi-chip query-parallel search
        (``parallel.sharding.query_parallel_search``) and device-staged
        serving: queries must already be preprocessed (normalized for
        cosine) and batch-padded; their sharding propagates through the
        jitted kernels (GSPMD). Single-device batches are split into
        ``config.search_sub_batch`` pipelined sub-dispatches at high ef
        (straggler decoupling, see config.py); sharded batches are not —
        a row slice would cross shard boundaries and force a reshard."""
        sub = config.resolve_search_sub_batch(ef)
        try:
            single = len(qd.sharding.device_set) == 1
        except AttributeError:
            single = True
        with self._lock:
            if not sub or not single or qd.shape[0] <= sub:
                bd, bi = self._device_search(qd, qn, k, ef)
                return np.asarray(bd), np.asarray(bi)
            parts = [
                self._device_search(
                    qd[s : s + sub], None if qn is None else qn[s : s + sub], k, ef
                )
                for s in range(0, qd.shape[0], sub)
            ]
            return (
                np.concatenate([np.asarray(bd) for bd, bi in parts]),
                np.concatenate([np.asarray(bi) for bd, bi in parts]),
            )

    def _device_search(
        self, qd, qn, k: int, ef: int,
        *, init_state=None, iter_budget=None, return_state=False,
    ):
        count = self.store.count
        bpad = qd.shape[0]
        dev, udev, ctx = self._device_ctx(nav=config.search_nav_bf16)
        if init_state is None:
            ep = self.entry_id
            cur = jnp.full((bpad,), ep, dtype=jnp.int32)
            cur_d = dists_to_ids(
                qd, jnp.full((bpad, 1), ep, dtype=jnp.int32), ctx,
                metric=self.metric, kind=self.store_kind, q_norm=qn,
            )[:, 0]
            for l in range(self.max_level, 0, -1):
                cur, cur_d = greedy_level(
                    qd, ctx, udev["links"], dev["upper_row"], cur, cur_d,
                    jnp.int32(l), metric=self.metric, kind=self.store_kind, q_norm=qn,
                )
        else:
            # Resume: entry args are placeholders (only shapes matter).
            cur = jnp.zeros((bpad,), dtype=jnp.int32)
            cur_d = jnp.zeros((bpad,), dtype=jnp.float32)
        ef_pad = min(pow2_bucket(max(ef, k)), max(pow2_bucket(count), 1))
        out = beam_search(
            qd, ctx, dev["links0"], None, cur, cur_d, self.store.capacity,
            ef=ef_pad, metric=self.metric, kind=self.store_kind, q_norm=qn,
            expand=config.resolve_search_expand(ef),
            init_state=init_state, return_state=return_state,
            iter_budget=iter_budget,
        )
        if ctx.nav is None:
            return out
        # Traversal ranked with the bf16 shadow: re-score the returned
        # window exactly and re-sort, so every caller (topk, range filter,
        # batch iterator) observes true fp32 distances. The resumable state
        # keeps its traversal-order beam untouched.
        if return_state:
            _, bi, state, done, it = out
            bd, bi = exact_rerank(
                qd, bi, ctx, metric=self.metric, kind=self.store_kind, q_norm=qn
            )
            return bd, bi, state, done, it
        bd, bi = exact_rerank(
            qd, out[1], ctx, metric=self.metric, kind=self.store_kind, q_norm=qn
        )
        return bd, bi

    def _pad_queries_device(self, queries: np.ndarray):
        q, qnorms = self.preprocess_queries(queries)
        nq = len(q)
        bpad = pow2_bucket(nq)
        if bpad != nq:
            q = np.concatenate([q, np.repeat(q[-1:], bpad - nq, axis=0)])
            if qnorms is not None:
                qnorms = np.concatenate([qnorms, np.repeat(qnorms[-1:], bpad - nq)])
        q, qnorms = self._maybe_shard_queries(q, qnorms)
        return jnp.asarray(q), None if qnorms is None else jnp.asarray(qnorms), nq

    def _search_knn_segmented(self, queries: np.ndarray, k: int, ef: int, budget):
        """Beam search as bounded device segments with the timeout callback
        polled between dispatches (in-flight VECSIM_TIMEOUT analog,
        hnsw.h:1923). Returns (dists, ids, completed) — ``completed`` False
        means the deadline fired mid-search and the beam so far is a
        partial result."""
        from .. import config

        with self._lock:
            qd, qn, nq = self._pad_queries_device(queries)
            seg = max(config.timeout_poll_iters, 1)
            # Iterations, not expansions: each one covers the resolved beam
            # expansion (beam_search divides its own cap the same way).
            total = max(
                (config.beam_iter_factor * ef + config.beam_iter_base)
                // config.resolve_search_expand(ef),
                64,
            )
            state, completed = None, False
            bd = bi = None
            for _ in range(-(-total // seg)):
                bd, bi, state, done, _ = self._device_search(
                    qd, qn, k, ef,
                    init_state=state, iter_budget=jnp.int32(seg),
                    return_state=True,
                )
                completed = bool(np.asarray(done))  # also the device barrier
                if completed or budget.expired():
                    break
            return np.asarray(bd)[:nq], np.asarray(bi)[:nq], completed

    def search_resumable(self, queries: np.ndarray, k: int, ef: int, state=None):
        """Resumable beam search for deep paging (the reference batch
        iterator's persisted frontier, hnsw_batch_iterator.h:94,206-249):
        pass the returned ``state`` back with a larger ``ef`` to continue
        expansion without re-visiting nodes. State is invalidated by any
        index mutation (capacity/graph changes)."""
        with self._lock:
            qd, qn, nq = self._pad_queries_device(queries)
            bd, bi, state, _, _ = self._device_search(
                qd, qn, k, ef, init_state=state, return_state=True
            )
            return np.asarray(bd)[:nq], np.asarray(bi)[:nq], state

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
        ef = self._effective_ef(k, params)
        # Window allowance for post-search filters: tombstoned nodes and
        # (multi) duplicate values of one label both consume beam slots
        # without contributing distinct results. The reference's multi
        # search needs none of this — its updatable max-heap is keyed by
        # label (hnsw_multi.h:105, updatable_heap.h:24-120); here the beam
        # ranks NODES, so the window grows by the filterable surplus, and
        # a doubling retry below guarantees k distinct live labels.
        extra = self.num_marked_deleted
        if self.multi:
            extra += max(0, self.store.count - len(self.labels.label_to_ids))
        ef += min(extra, ef)
        completed = True
        if budget.ctx is not None:
            dists, ids, completed = self._search_knn_segmented(
                np.atleast_2d(queries), k, ef, budget
            )
        else:
            dists, ids = self.search_knn(np.atleast_2d(queries), k, ef)
        out = []
        flags = self.store.host["flags"]
        id_to_label = self.store.host["label"]
        qs2 = np.atleast_2d(queries)
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

        for b in range(nq):
            row_i, row_d = filter_live(ids[b], dists[b])
            labels = id_to_label[row_i]
            if self.multi:
                lab_k, d_k = dedup(labels, row_d)
                # Distinct-label guarantee: if duplicates/tombstones crowded
                # the window, re-search THIS query with a doubled window
                # until k distinct live labels (or the whole store) are in.
                target = min(k, live_label_total)
                w = ef
                while (
                    len(lab_k) < target
                    and w < self.store.count
                    and not budget.expired()
                ):
                    w = min(w * 2, self.store.count)
                    rd2, ri2 = self.search_knn(qs2[b : b + 1], k, w)
                    ri, rd = filter_live(ri2[0], rd2[0])
                    lab_k, d_k = dedup(id_to_label[ri], rd)
                out.append(make_reply(lab_k, d_k))
            else:
                tgt = min(k, len(self.labels.label_to_id))
                if len(labels) < tgt and not budget.expired():
                    # Tombstone-crowded window (weak case the 2x-ef cap
                    # misses); same doubling retry.
                    w = ef
                    while len(labels) < tgt and w < self.store.count:
                        w = min(w * 2, self.store.count)
                        rd2, ri2 = self.search_knn(qs2[b : b + 1], k, w)
                        row_i, row_d = filter_live(ri2[0], rd2[0])
                        labels = id_to_label[row_i]
                        if budget.expired():
                            break
                out.append(make_reply(labels[:k], row_d[:k]))
        # ``completed`` False means the callback cut the beam mid-search;
        # the iteration-cap case without an expired callback keeps OK (same
        # as the unsegmented path's max_iters bound).
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
        """Epsilon-range search (hnsw.h:1991-2092): explore the
        radius*(1+epsilon) neighborhood, return nodes within radius.

        Implemented as beam search with doubling ef until the beam frontier
        exceeds the epsilon boundary (all boundary nodes explored)."""
        self.last_mode = VecSearchMode.RANGE_QUERY
        budget = TimeoutBudget(params.timeoutCtx if params else None)
        if budget.expired():
            return make_reply([], [], VecSimQueryReplyCode.TimedOut)
        if self.store.count == 0 or self.entry_id < 0:
            return make_reply([], [])
        eps = self.epsilon
        if params is not None and params.hnswRuntimeParams.epsilon:
            eps = params.hnswRuntimeParams.epsilon
        boundary = radius * (1.0 + eps)
        ef = 32
        q2 = np.asarray(query).reshape(1, -1)
        # Each doubling re-searches FRESH — deliberately. Resuming the
        # carried beam (``search_resumable``) was evaluated and rejected:
        # a resumed window cannot recover scored-then-evicted nodes (their
        # visited bits suppress re-scoring — see
        # hnsw_batch_iterator._search_more), and at small ef with a wide
        # radius most sub-radius nodes ARE evicted, so pure resume breaks
        # the epsilon contract. Probing with resume and finishing with one
        # fresh pass is sound but saves nothing: the probes collectively
        # expand every node once (~one full search) and the fresh terminal
        # pass is a second — the same 2E total this loop already costs.
        # A true single-pass design needs the reference's spillover heap
        # (hnsw_batch_iterator.h:206-249) carried in device state.
        while True:
            dists, ids = self.search_knn(q2, 1, ef)
            d, i = dists[0], ids[0]
            finite = np.isfinite(d)
            if ef >= self.store.count or not finite.any():
                break
            worst = d[finite].max()
            if worst > boundary or finite.sum() < ef:
                break
            if budget.expired():
                break
            ef *= 2
        valid = (i >= 0) & (d <= radius)
        row_i = i[valid]
        flags = self.store.host["flags"]
        live = (flags[row_i] & FLAG_DELETED) == 0
        row_i, row_d = row_i[live], d[valid][live]
        labels = self.store.host["label"][row_i]
        if self.multi:
            reply = make_reply(labels, row_d)
            from ..core.results import filter_results_by_id

            reply = filter_results_by_id(reply)
        else:
            reply = make_reply(labels, row_d)
        if budget.expired():
            reply.code = VecSimQueryReplyCode.TimedOut
        return reply.sort(order)

    def get_distance_from(self, label: int, blob: np.ndarray) -> float:
        ids = self.labels.ids_of(label)
        if not ids:
            return float("nan")
        q, qnorms = self.preprocess_queries(np.asarray(blob).reshape(1, -1))
        qn = None if qnorms is None else qnorms[0]
        return min(self.host_distance(i, q[0], qn) for i in ids)

    def new_batch_iterator(self, query: np.ndarray, params: Optional[VecSimQueryParams] = None):
        from .hnsw_batch_iterator import HNSWBatchIterator

        return HNSWBatchIterator(self, query, params)

    # ------------------------------------------------------------------
    # Hybrid-policy heuristic (hnsw.h:2179-2313, sklearn decision tree)
    # ------------------------------------------------------------------

    def prefer_adhoc_search(self, subset_size: int, k: int, initial_check: bool = False) -> bool:
        index_size = self.index_size
        subset_size = min(subset_size, index_size)
        d = self.dim
        M = self.M
        r = 0.0 if index_size == 0 else subset_size / max(self.index_label_count, 1)
        if index_size <= 30000:
            if index_size <= 5500:
                res = True
            elif r <= 0.17:
                res = True
            elif k <= 12:
                if d <= 55:
                    res = False
                else:
                    res = M > 10
            else:
                res = True
        else:
            if r < 0.07:
                if index_size <= 750000:
                    res = True
                elif k <= 7:
                    res = False
                else:
                    res = r <= 0.03
            else:
                if d <= 75:
                    res = False
                elif k <= 12:
                    if r <= 0.21:
                        if M <= 57:
                            res = index_size <= 75000
                        else:
                            res = True
                    else:
                        res = False
                else:
                    if M <= 10:
                        res = r <= 0.17
                    elif index_size <= 300000:
                        res = True
                    else:
                        res = r <= 0.17
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
        return self._basic_info(VecSimAlgo.HNSWLIB)

    def _total_memory_bytes(self) -> int:
        total = self.memory_bytes + self.upper.memory_bytes
        cached = getattr(self, "_nav_cache", None)
        if cached is not None:
            nav = cached[1]
            total += int(np.prod(nav.shape)) * nav.dtype.itemsize
        return total

    def stats_info(self) -> VecSimIndexStatsInfo:
        return VecSimIndexStatsInfo(
            memory=self._total_memory_bytes(),
            numberOfMarkedDeleted=self.num_marked_deleted,
        )

    def debug_info(self) -> VecSimIndexDebugInfo:
        ep_label = INVALID_LABEL
        if self.entry_id >= 0:
            ep_label = int(self.store.host["label"][self.entry_id])
        return VecSimIndexDebugInfo(
            commonInfo=CommonInfo(
                basicInfo=self.basic_info(),
                indexSize=self.index_size,
                indexLabelCount=self.index_label_count,
                memory=self._total_memory_bytes(),
                lastMode=self.last_mode,
            ),
            hnswInfo=HnswInfo(
                M=self.M,
                efConstruction=self.ef_construction,
                efRuntime=self.ef_runtime,
                epsilon=self.epsilon,
                max_level=max(self.max_level, 0),
                entrypoint=ep_label,
                visitedNodesPoolSize=0,
                numberOfMarkedDeletedNodes=self.num_marked_deleted,
            ),
        )

    def get_element_neighbors(self, label: int):
        """Debug parity: VecSimDebug_GetElementNeighborsInHNSWGraph
        (vec_sim_debug.h:37-44, hnsw.h:2317-2345)."""
        ids = self.labels.ids_of(label)
        if not ids:
            return None
        out = []
        for node in ids:
            per_level = []
            for l in range(0, self.node_level(node) + 1):
                per_level.append([int(self.store.host["label"][x]) for x in self.get_links(node, l)])
            out.append(per_level)
        return out
