"""Data-sharded graph index: independent subgraphs, one per mesh device.

``parallel.sharding`` covers the flat scan (rows sharded, all-gather top-k
merge) and query-parallel graph serving (graph replicated, query batch
sharded). This module adds the remaining axis from SURVEY §7.10 — "HNSW CSR
sharded": the *dataset* is partitioned across the mesh, each device owns an
independent HNSW subgraph over its partition, and a query searches every
subgraph concurrently (SPMD over the shard axis) before a single top-k merge
collective combines the per-shard candidates.

This is the standard distributed-ANN recipe (IVF-style sharding with a
graph per shard): per-shard recall at ef equals single-graph recall at the
same ef because each subgraph is an ordinary HNSW over its rows, and the
merge of S exact per-shard top-k lists is the exact global top-k of the
union. The reference has no multi-node story (SURVEY §2 "Parallelism");
this is its TPU-native replacement, scaling index *memory* (each chip holds
1/S of the vectors + links), unlike ``to_query_sharded`` which scales only
throughput.

Design notes:
- Per-shard stores stay ordinary ``HNSWIndex`` objects (all mutation paths —
  add/delete/repair/serialize — reused verbatim); only the *read* path is
  fused: per-shard device arrays are stacked on a leading shard axis, placed
  ``P(AXIS, ...)`` over the mesh, and a single jitted program vmaps the
  greedy-descent + ef-beam kernels over that axis. GSPMD runs each shard's
  beam on its owning device; the only collective is the final [B, S·k]
  top-k merge (an all-gather of k candidates per shard — tiny, rides ICI).
- Labels route to shards round-robin at first sight and stick (a label's
  values colocate, so multi-value dedup and overwrite semantics stay
  per-shard problems the sub-index already solves).
- The stacked placement is cached and invalidated by any mutation; a
  rebuild pads every shard to the max (capacity, upper-capacity, lmax)
  bucket so the stacked program recompiles O(log N) times, same as the
  single-index kernels.
"""

from __future__ import annotations

import functools
import threading
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import config
from ..core.abstract_index import pow2_bucket
from ..core.results import QueryReply, make_reply
from ..indexes.hnsw import FLAG_DELETED, HNSWIndex
from ..ops.graph_search import (
    StoreCtx,
    beam_search_impl,
    dists_to_ids,
    greedy_level_impl,
)
from ..types import HNSWParams, VecSimMetric, VecSimQueryParams
from .sharding import AXIS


def _search_one_shard(
    q, qn, qm, arrs, entry, count, *, k, ef, lmax, cap, metric, kind, expand
):
    """Exact-fp32 descent + beam on ONE shard's arrays; [B, k] local result.

    Mirrors ``HNSWIndex._device_search`` minus the bf16 nav shadow (the
    stacked program reads fp32 rows directly: one gather instead of
    gather + rerank keeps the cross-shard program simple, and per-shard
    batches are a fraction of the single-index batch so the bandwidth
    win matters less). Single-layer graphs (Vamana) pass no ``ulinks`` and
    go straight from the shard's entry/medoid into the beam. Quantized
    stores (sq8/sq4 primaries) carry per-row vmin/delta and the queries'
    (Σy, Σy²) metadata ``qm`` for the asymmetric kernels.
    """
    B = q.shape[0]
    ctx = StoreCtx(
        data=arrs["data"], sqnorm=arrs.get("sqnorm"), norm=arrs.get("norm"),
        vmin=arrs.get("vmin"), delta=arrs.get("delta"),
    )
    ep = jnp.maximum(entry, 0)
    cur = jnp.full((B,), ep, dtype=jnp.int32)
    cur_d = dists_to_ids(
        q, cur[:, None], ctx, metric=metric, kind=kind, q_norm=qn, q_meta=qm
    )[:, 0]
    if "ulinks" in arrs:
        for lvl in range(lmax, 0, -1):
            # Shards whose max level < lvl see all -1 links at this depth
            # (the upper links array is -1-padded): a masked no-op.
            cur, cur_d = greedy_level_impl(
                q, ctx, arrs["ulinks"], arrs["upper_row"], cur, cur_d,
                jnp.int32(lvl), metric=metric, kind=kind, q_norm=qn,
                q_meta=qm,
            )
    bd, bi = beam_search_impl(
        q, ctx, arrs["links"], None, cur, cur_d, cap,
        ef=ef, metric=metric, kind=kind, q_norm=qn, q_meta=qm,
        expand=expand,
    )
    w = bd.shape[1]
    if w < k:
        bd = jnp.pad(bd, ((0, 0), (0, k - w)), constant_values=jnp.inf)
        bi = jnp.pad(bi, ((0, 0), (0, k - w)), constant_values=-1)
    bd, bi = bd[:, :k], bi[:, :k]
    empty = count <= 0
    bd = jnp.where(empty | (bi < 0), jnp.inf, bd)
    bi = jnp.where(empty, -1, bi)
    return bd, bi


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "ef", "lmax", "cap", "metric", "kind", "expand", "k_merge"
    ),
)
def sharded_graph_topk(
    q, qn, stacked, entry, count, qm=None, *, k, ef, lmax, cap, metric,
    kind, expand, k_merge=None,
):
    """All-shard search + global merge.

    ``stacked`` arrays carry a leading shard axis placed over the mesh;
    ``q`` is replicated. vmap over the shard axis keeps every per-shard
    kernel local to its device (GSPMD partitions the batched while-loops
    shard-parallel; shards iterate in lockstep until the slowest converges,
    the same barrier batched queries already accept). The [B, S·k] merge is
    the one cross-device collective.

    Returns (dists [B, k], local_ids [B, k], shard_of [B, k]).
    """
    metric = VecSimMetric(metric)
    fn = functools.partial(
        _search_one_shard, k=k, ef=ef, lmax=lmax, cap=cap,
        metric=metric, kind=kind, expand=expand,
    )
    axes = ({name: 0 for name in stacked}, 0, 0)
    bd, bi = jax.vmap(lambda a, e, c: fn(q, qn, qm, a, e, c), in_axes=axes)(
        stacked, entry, count
    )  # [S, B, k]
    B = q.shape[0]
    all_d = jnp.transpose(bd, (1, 0, 2)).reshape(B, -1)  # [B, S*k]
    all_i = jnp.transpose(bi, (1, 0, 2)).reshape(B, -1)
    # ``k_merge`` widens the GLOBAL merge beyond k (up to S*k): the host
    # filters tombstones/duplicate labels after this truncation, so a
    # crowded shard needs the extra width to keep k live labels in play.
    km = k if k_merge is None else min(int(k_merge), all_d.shape[1])
    neg, sel = jax.lax.top_k(-all_d, km)
    ids = jnp.take_along_axis(all_i, sel, axis=1)
    shard_of = (sel // k).astype(jnp.int32)
    shard_of = jnp.where(ids >= 0, shard_of, -1)
    return -neg, ids, shard_of


class _ShardedGraphBase:
    """Shared machinery: label routing, per-shard delegation, array
    stacking/placement, and the merged SPMD query path. Subclasses supply
    the per-shard index type and its link-array layout."""

    def __init__(self, params, mesh, seed: int = 200):
        self.mesh = mesh
        self.n_shards = int(mesh.shape[AXIS])
        self.params = params
        self.shards = [self._new_shard(i, seed) for i in range(self.n_shards)]
        # Pin each shard's stores to its mesh device: build/search
        # dispatches follow committed operands, so each subgraph's memory
        # AND compute live on its own chip (the memory-scale-out claim;
        # without this every shard store lands on the default device).
        self._devs = list(self.mesh.devices.flat)
        for i, s in enumerate(self.shards):
            self._pin_shard(s, self._devs[i % len(self._devs)])
        self._label_shard: dict[int, int] = {}
        self._rr = 0
        self._placed = None  # (stacked, entry, count, lmax, cap, max_count)
        # One host lock serializes mutation vs placement/query, the same
        # contract as the single indexes (reads are batched dispatches;
        # sub-index locks guard their own bookkeeping).
        self._lock = threading.RLock()

    # subclass hooks -----------------------------------------------------

    def _new_shard(self, i: int, seed: int):
        raise NotImplementedError

    def _pin_shard(self, shard, device) -> None:
        shard.store.set_device(device)
        if hasattr(shard, "upper"):
            shard.upper.set_device(device)

    def _shard_arrays(self, shard, cap, ucap, lmax, pad_rows) -> dict:
        raise NotImplementedError

    def _lmax_of(self, shard) -> int:
        return 0

    def _ucap_of(self, shard) -> int:
        return 1

    def _window(self, k: int, params) -> int:
        raise NotImplementedError

    # -- write path ----------------------------------------------------

    def _shard_of_label(self, label: int) -> int:
        s = self._label_shard.get(label)
        if s is None:
            s = self._rr % self.n_shards
            self._rr += 1
            self._label_shard[label] = s
        return s

    def add_vector(self, blob, label: int) -> int:
        return self.add_vector_batch(np.atleast_2d(np.asarray(blob)), [label])

    def add_vector_batch(self, data, labels) -> int:
        with self._lock:
            return self._add_vector_batch_locked(data, labels)

    def _add_vector_batch_locked(self, data, labels) -> int:
        data = np.atleast_2d(np.asarray(data))
        groups: dict[int, list[int]] = {}
        for i, lab in enumerate(labels):
            groups.setdefault(self._shard_of_label(int(lab)), []).append(i)
        added = 0
        for s, rows in groups.items():
            added += self.shards[s].add_vector_batch(
                data[rows], [int(labels[i]) for i in rows]
            )
        self._placed = None
        return added

    def delete_vector(self, label: int) -> int:
        with self._lock:
            s = self._label_shard.get(int(label))
            if s is None:
                return 0
            removed = self.shards[s].delete_vector(int(label))
            if removed:
                del self._label_shard[int(label)]
                self._placed = None
            return removed

    def bulk_build_device(self, data, n=None, labels=None, **kw) -> None:
        """Partition a device-resident dataset round-robin and bulk-build
        every shard's subgraph with the single-index fused scan
        (``HNSWIndex``/``SVSIndex.bulk_build_device``). ``data`` is a jax
        array [N, dim]; per-shard strided slices stay on device, so the
        host never touches the vectors (relay-friendly, same rationale as
        the single-index bulk path)."""
        with self._lock:
            if self.size:
                raise ValueError("bulk_build_device requires an empty index")
            n = int(data.shape[0]) if n is None else int(n)
            labels = (
                np.arange(n, dtype=np.int64) if labels is None
                else np.asarray(labels)
            )
            S = self.n_shards
            # Deferred per-shard builds, driven round-robin: each shard's
            # generator dispatches ONE fused scan segment per next() and
            # yields before forcing it, so every mesh device keeps one
            # segment in flight at a time — the S subgraph builds overlap
            # on a real mesh instead of serializing shard-after-shard
            # (each shard's store is pinned to its own device, and a jit
            # program runs on the device its inputs live on).
            gens = []
            for i, s in enumerate(self.shards):
                rows = np.arange(i, n, S)
                if not len(rows):
                    continue
                gens.append(
                    s.bulk_build_device(
                        data[i:n:S], labels=labels[rows].tolist(),
                        _deferred=True, **kw
                    )
                )
                for lab in labels[rows]:
                    self._label_shard[int(lab)] = i
            while gens:
                still = []
                for g in gens:
                    try:
                        next(g)
                        still.append(g)
                    except StopIteration:
                        pass
                gens = still
            self._rr = n
            self._placed = None

    @property
    def size(self) -> int:
        return sum(s.index_size for s in self.shards)

    @property
    def index_size(self) -> int:
        return self.size

    # -- batch iterator / info -----------------------------------------

    def new_batch_iterator(self, query, params: Optional[VecSimQueryParams] = None):
        """K-way merge of the per-shard resumable iterators (labels are
        disjoint across shards; see sharded_batch_iterator module doc)."""
        from .sharded_batch_iterator import ShardedBatchIterator

        return ShardedBatchIterator(self, query, params)

    def basic_info(self):
        """Shard-0 basic info with aggregate size — one shard defines the
        type/metric/dim config; isMulti etc. are homogeneous by
        construction."""
        info = self.shards[0].basic_info()
        return info

    def stats_info(self):
        from ..types import VecSimIndexStatsInfo

        return VecSimIndexStatsInfo(
            memory=self.memory_bytes,
            numberOfMarkedDeleted=sum(
                s.num_marked_deleted for s in self.shards
            ),
        )

    def debug_info(self):
        """Aggregate debug info: shard-0's structural fields with
        sharded-wide size/label-count/memory totals. ``shard_debug_info``
        returns the full per-shard list."""
        info = self.shards[0].debug_info()
        info.commonInfo.indexSize = self.index_size
        info.commonInfo.indexLabelCount = sum(
            s.index_label_count for s in self.shards
        )
        info.commonInfo.memory = self.memory_bytes
        return info

    def shard_debug_info(self) -> list:
        return [s.debug_info() for s in self.shards]

    @property
    def memory_bytes(self) -> int:
        """Sum of per-shard accounting plus the stacked placement cache
        (the padded copies device_put over the mesh)."""
        total = sum(s.memory_bytes for s in self.shards)
        if self._placed is not None:
            stacked = self._placed[0]
            total += sum(int(np.prod(a.shape)) * a.dtype.itemsize
                         for a in stacked.values())
        return total

    # -- read path -----------------------------------------------------

    def _ensure_placed(self):
        if self._placed is not None:
            return self._placed
        cap = max(s.store.capacity for s in self.shards)
        ucap = max(max(self._ucap_of(s) for s in self.shards), 1)
        lmax = max(self._lmax_of(s) for s in self.shards)

        def pad_rows(a, n, fill):
            if a.shape[0] < n:
                pads = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
                a = jnp.pad(a, pads, constant_values=fill)
            return a

        per = [
            self._shard_arrays(s, cap, ucap, lmax, pad_rows) for s in self.shards
        ]
        # Assemble the placed stack SHARD-LOCALLY: each padded per-shard
        # array (already living on its own device via the pinned stores)
        # becomes that device's slice of the global array directly.
        # jnp.stack-then-device_put would materialize the whole padded
        # dataset on the default device first — a ~2x single-chip peak that
        # defeats the memory scale-out.
        stacked = {}
        for name in per[0]:
            pieces = [
                jax.device_put(p[name][None], self._devs[i % len(self._devs)])
                for i, p in enumerate(per)
            ]
            sh = NamedSharding(
                self.mesh, P(AXIS, *([None] * (pieces[0].ndim - 1)))
            )
            stacked[name] = jax.make_array_from_single_device_arrays(
                (len(per), *pieces[0].shape[1:]), sh, pieces
            )
        sspec = NamedSharding(self.mesh, P(AXIS))
        entry = jax.device_put(
            jnp.asarray([s.entry_id for s in self.shards], dtype=jnp.int32), sspec
        )
        count = jax.device_put(
            jnp.asarray([s.store.count for s in self.shards], dtype=jnp.int32),
            sspec,
        )
        max_count = max(s.store.count for s in self.shards)
        self._placed = (stacked, entry, count, lmax, cap, max_count)
        return self._placed

    def topk_query(
        self, query, k: int, params: Optional[VecSimQueryParams] = None
    ) -> QueryReply:
        return self.topk_query_batch(np.atleast_2d(np.asarray(query)), k, params)[0]

    def topk_query_batch(
        self, queries, k: int, params: Optional[VecSimQueryParams] = None
    ) -> list[QueryReply]:
        s0 = self.shards[0]
        queries = np.atleast_2d(np.asarray(queries))
        nq = len(queries)
        if self.size == 0 or k <= 0:
            return [make_reply([], []) for _ in range(nq)]
        ef = self._window(k, params)
        q, qnorms = s0.preprocess_queries(queries)[:2]
        with self._lock:
            return self._query_locked(q, qnorms, k, ef, nq)

    def _query_locked(self, q, qnorms, k, ef, nq):
        s0 = self.shards[0]
        stacked, entry, count, lmax, cap, max_count = self._ensure_placed()
        # Per-shard return width: tombstoned rows and (multi) duplicate
        # values survive the device merge and are filtered HERE, so the
        # merge must carry an allowance or a crowded shard underfills k
        # (the single indexes grow their beam window the same way).
        tomb = sum(s.num_marked_deleted for s in self.shards)
        dups = 0
        if s0.multi:
            dups = sum(
                max(0, s.store.count - len(s.labels.label_to_ids))
                for s in self.shards
            )
        flags = [s.store.host["flags"] for s in self.shards]
        id_to_label = [s.store.host["label"] for s in self.shards]
        live_total = sum(
            len(s.labels.label_to_ids if s0.multi else s.labels.label_to_id)
            for s in self.shards
        )
        target = min(k, live_total)

        w_cap = max(pow2_bucket(max_count), 1)
        kq_cap = self.n_shards * w_cap  # every row of every shard

        def dispatch(qd, qn, ef_eff, kq):
            ef_pad = min(pow2_bucket(max(ef_eff, k)), w_cap)
            ks = min(kq, ef_pad)  # per-shard return width
            km = min(kq, self.n_shards * ks)  # global merge width
            qm = None
            if s0.store_kind in ("sq8", "sq4"):
                # Asymmetric-kernel query metadata (Σy, Σy²); queries stay
                # float against the shards' quantized rows.
                qm = (jnp.sum(qd, axis=-1), jnp.sum(qd * qd, axis=-1))
            bd, bi, bs = sharded_graph_topk(
                qd, qn, stacked, entry, count, qm,
                k=ks, ef=ef_pad, lmax=lmax, cap=cap,
                metric=s0.metric, kind=s0.store_kind,
                expand=config.resolve_search_expand(ef_eff),
                k_merge=km,
            )
            return np.asarray(bd), np.asarray(bi), np.asarray(bs), ef_pad, km

        def collect(bd, bi, bs, b, kq):
            rows = []
            seen: set[int] = set()
            for j in range(kq):
                s, i = int(bs[b, j]), int(bi[b, j])
                if s < 0 or i < 0:
                    continue
                if flags[s][i] & FLAG_DELETED:
                    continue
                lab = int(id_to_label[s][i])
                if s0.multi and lab in seen:
                    continue
                seen.add(lab)
                rows.append((lab, float(bd[b, j])))
                if len(rows) >= k:
                    break
            return rows

        qd = jnp.asarray(q)
        qn = None if qnorms is None else jnp.asarray(qnorms)
        kq0 = k + min(tomb + dups, 3 * k + 8)
        bd, bi, bs, ef_pad, kq0 = dispatch(qd, qn, ef, kq0)
        out = []
        for b in range(nq):
            rows = collect(bd, bi, bs, b, kq0)
            # Deficiency retry: a tombstone-heavy or duplicate-crowded
            # shard can still underfill; re-search this query with a
            # doubled window AND merge width. At w == w_cap and
            # kq == S*w_cap the merge is a full sort of every row of every
            # shard, so termination implies completeness.
            w, kq = ef_pad, kq0
            while len(rows) < target and not (w >= w_cap and kq >= kq_cap):
                w = min(w * 2, w_cap)
                kq = min(kq * 2, kq_cap)
                rb = (qd[b : b + 1], None if qn is None else qn[b : b + 1])
                bd2, bi2, bs2, w, kq = dispatch(rb[0], rb[1], w, kq)
                rows = collect(bd2, bi2, bs2, 0, kq)
            out.append(
                make_reply([r[0] for r in rows], [r[1] for r in rows])
            )
        return out

    def range_query(self, query, radius: float, params=None, order=None):
        """Union of per-shard epsilon-range searches. Range results are
        unbounded-size, so the merge happens host-side (no fixed-k
        collective to ride); each shard reuses its index's own range
        kernel (hnsw.h:1991-2092 semantics)."""
        from ..types import QueryReplyOrder

        order = QueryReplyOrder.BY_SCORE if order is None else order
        ids: list[int] = []
        scores: list[float] = []
        with self._lock:
            for s in self.shards:
                r = (s.range_query(query, radius, params)
                     if params is not None else s.range_query(query, radius))
                ids += r.ids.tolist()
                scores += r.scores.tolist()
        ids_a = np.asarray(ids, dtype=np.int64)
        sc_a = np.asarray(scores, dtype=np.float64)
        if order == QueryReplyOrder.BY_ID:
            o = np.argsort(ids_a, kind="stable")
        else:
            o = np.lexsort((ids_a, sc_a))
        return make_reply(ids_a[o], sc_a[o])

    # -- persistence ---------------------------------------------------

    def save(self, path: str) -> None:
        """Directory layout: shard_<i>.npz (each via the ordinary
        serializer) + routing.json (label->shard map and the round-robin
        cursor)."""
        import json
        import os

        from ..utils.serializer import save_index

        with self._lock:
            os.makedirs(path, exist_ok=True)
            for i, s in enumerate(self.shards):
                save_index(s, os.path.join(path, f"shard_{i}.npz"))
            with open(os.path.join(path, "routing.json"), "w") as f:
                json.dump(
                    {"n_shards": self.n_shards, "rr": self._rr,
                     "label_shard": {str(k): v
                                     for k, v in self._label_shard.items()}},
                    f,
                )

    @classmethod
    def load(cls, path: str, mesh):
        import json
        import os

        from ..utils.serializer import load_index

        with open(os.path.join(path, "routing.json")) as f:
            routing = json.load(f)
        n = routing["n_shards"]
        if int(mesh.shape[AXIS]) != n:
            raise ValueError(
                f"index was saved with {n} shards; mesh has {mesh.shape[AXIS]}"
            )
        shards = [
            load_index(os.path.join(path, f"shard_{i}.npz")) for i in range(n)
        ]
        obj = cls.__new__(cls)
        obj.mesh = mesh
        obj.n_shards = n
        obj.params = shards[0].params
        obj.shards = shards
        obj._label_shard = {
            int(k): v for k, v in routing["label_shard"].items()
        }
        obj._rr = routing["rr"]
        obj._placed = None
        obj._lock = threading.RLock()
        return obj


class ShardedHNSW(_ShardedGraphBase):
    """HNSW with the dataset partitioned across a ``jax.sharding.Mesh``.

    Write paths delegate to per-shard ``HNSWIndex`` objects (round-robin
    label routing); the read path runs all subgraph searches as one SPMD
    program (``sharded_graph_topk``). See the module docstring.
    """

    def _new_shard(self, i: int, seed: int):
        return HNSWIndex(self.params, seed=seed + 1000 * i)

    def _lmax_of(self, shard) -> int:
        return shard.lmax

    def _ucap_of(self, shard) -> int:
        return shard.upper.capacity

    def _window(self, k: int, params) -> int:
        return self.shards[0]._effective_ef(k, params)

    def _shard_arrays(self, s, cap, ucap, lmax, pad_rows) -> dict:
        dev = s.store.device_arrays()
        udev = s.upper.device_arrays()
        arrs = {
            "data": pad_rows(dev["data"], cap, 0),
            "links": pad_rows(dev["links0"], cap, -1),
            "upper_row": pad_rows(dev["upper_row"], cap, -1),
        }
        for name in ("sqnorm", "norm"):
            if dev.get(name) is not None:
                arrs[name] = pad_rows(dev[name], cap, 0)
        ul = udev["links"]  # [ucap_s, lmax_s, M]
        if ul.shape[1] < lmax:
            ul = jnp.pad(
                ul, ((0, 0), (0, lmax - ul.shape[1]), (0, 0)),
                constant_values=-1,
            )
        arrs["ulinks"] = pad_rows(ul, ucap, -1)
        return arrs


class ShardedVamana(_ShardedGraphBase):
    """SVS-Vamana with the dataset partitioned across the mesh — the
    single-layer sibling of ``ShardedHNSW``: each device owns an
    independent Vamana subgraph (medoid entry, alpha-pruned links), and
    the SPMD program beams every subgraph from its own medoid before the
    global merge. Supports unquantized stores and single-level SQ8/LVQ4
    primaries (the asymmetric kernels ride the stacked vmin/delta
    columns). Two-level residual and LeanVec modes carry per-shard rerank
    passes + projection matrices the cross-shard program doesn't
    reproduce — shard those via ``to_query_sharded`` instead.
    """

    def _new_shard(self, i: int, seed: int):
        from ..indexes.svs import SVSIndex

        shard = SVSIndex(self.params)
        if shard.res_bits or shard.is_leanvec:
            raise ValueError(
                "ShardedVamana supports unquantized or single-level "
                "SQ8/LVQ4 SVS indexes only (no residual/LeanVec rerank)"
            )
        return shard

    def _window(self, k: int, params) -> int:
        return self.shards[0]._effective_ws(k, params)

    def _shard_arrays(self, s, cap, ucap, lmax, pad_rows) -> dict:
        dev = s.store.device_arrays()
        arrs = {
            "data": pad_rows(dev["data"], cap, 0),
            "links": pad_rows(dev["links"], cap, -1),
        }
        for name in ("sqnorm", "norm", "vmin", "delta"):
            if dev.get(name) is not None:
                arrs[name] = pad_rows(dev[name], cap, 0)
        return arrs
