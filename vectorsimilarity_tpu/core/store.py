"""Device-resident vector storage — TPU equivalent of ``DataBlocksContainer``.

The reference stores vectors in fixed-size contiguous blocks with O(1)
id->pointer access and swap-with-last deletion
(``containers/data_blocks_container.h``, ``containers/data_block.h``). The
TPU design keeps one padded 2-D device array per field (SoA), sized in
doubling capacity buckets so jitted consumers recompile O(log N) times
instead of once per block. Deletion keeps the reference's swap-with-last
semantics (ids stay dense in [0, count)).

Host numpy mirrors are authoritative (they serve ``getDataByLabel``,
serialization and host-side graph construction); the device copy is synced
lazily before compute with batched row scatters.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..types import DEFAULT_BLOCK_SIZE


@jax.jit
def _sync_kernel(dev: dict, suffix, start, dirty):
    """Apply all pending host mutations in ONE device dispatch.

    Un-jitted array ops each pay a full remote dispatch on relay-backed
    backends (~0.5 s apiece measured); fusing the suffix update and every
    per-field scatter into one jitted call makes sync latency flat. (No
    buffer donation: outer scopes legitimately hold references to the
    previous device arrays across a sync.)
    """
    if suffix is not None:
        chunks, = suffix
        for name, chunk in chunks.items():
            dev[name] = jax.lax.dynamic_update_slice_in_dim(
                dev[name], chunk, start, axis=0
            )
    for name, (idx, rows) in dirty.items():
        dev[name] = dev[name].at[idx].set(rows)
    return dev


def _bucket_capacity(n: int, block_size: int) -> int:
    """Smallest doubling bucket >= n (min one block)."""
    cap = max(block_size, DEFAULT_BLOCK_SIZE)
    while cap < n:
        cap *= 2
    return cap


class FieldSpec:
    """One SoA field: trailing shape + dtype + pad value.

    ``device_dtype`` lets the host mirror keep a wider type than the device
    copy (fp64 storage computes at fp32 on TPUs without x64 enabled).
    """

    def __init__(self, shape: tuple, dtype, fill=0, device_dtype=None):
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        self.fill = fill
        self.device_dtype = np.dtype(device_dtype) if device_dtype is not None else self.dtype


class BlockStore:
    """Growable SoA store with swap-with-last delete and lazy device sync.

    Usage::

        store = BlockStore({"data": FieldSpec((dim,), np.float32)}, block_size)
        ids = store.append({"data": rows})           # rows [B, dim]
        moved = store.swap_delete(id)                # reference swap semantics
        dev = store.device_arrays()                  # synced jnp arrays
    """

    def __init__(self, fields: dict[str, FieldSpec], block_size: int = DEFAULT_BLOCK_SIZE):
        self.fields = dict(fields)
        self.block_size = block_size or DEFAULT_BLOCK_SIZE
        self.count = 0
        self.capacity = 0
        self.sharding = None  # NamedSharding: rows spread over a mesh axis
        self.placement = None  # single device the whole store is pinned to
        self.host: dict[str, np.ndarray] = {}
        self._device: dict[str, jax.Array] = {}
        # Per-field dirty rows: a link update must not re-upload the (much
        # larger) vector column of the same row.
        # Fields whose DEVICE copy is authoritative (adopt_device /
        # device-side construction); host mirrors are pulled on demand.
        self._host_stale: set[str] = set()
        self._dirty_rows: dict[str, set[int]] = {n: set() for n in self.fields}
        self._dirty_from: int = 0  # appended/overwritten suffix start
        # Deferred swap-delete row moves on device-authoritative fields:
        # {field: {dst: original_src}} applied as ONE batched gather+scatter
        # per field at the next sync. Without this every swap-delete on an
        # adopted store pulled the whole device copy to host first —
        # ~100 ms/delete at 1M x 768 through the relay, and GBs at 10M.
        self._pending_moves: dict[str, dict[int, int]] = {n: {} for n in self.fields}
        self._device_capacity = -1
        self._resize(_bucket_capacity(1, self.block_size))

    # -- capacity management -------------------------------------------------

    def _resize(self, new_cap: int) -> None:
        if self._host_stale and self._device:
            # Growth re-seeds host arrays and re-uploads them wholesale; any
            # device-authoritative content must reach the host first.
            self.pull_host()
        for name, spec in self.fields.items():
            arr = np.full((new_cap, *spec.shape), spec.fill, dtype=spec.dtype)
            if name in self.host and self.count:
                arr[: self.count] = self.host[name][: self.count]
            self.host[name] = arr
        self.capacity = new_cap

    def _maybe_grow(self, extra: int) -> None:
        need = self.count + extra
        if need > self.capacity:
            self._resize(_bucket_capacity(need, self.block_size))

    def add_field(self, name: str, spec: FieldSpec) -> None:
        """Register an extra SoA field after construction (e.g. the tiered
        frontend's per-row op-id column). Swap-with-last deletion and device
        sync treat it like any constructor-time field."""
        assert name not in self.fields
        self.fields[name] = spec
        arr = np.full((self.capacity, *spec.shape), spec.fill, dtype=spec.dtype)
        self.host[name] = arr
        self._dirty_rows[name] = set()
        self._pending_moves[name] = {}
        self._device_capacity = -1  # force a full re-upload on next sync

    def maybe_shrink(self) -> None:
        """Shrink capacity when count has dropped far below the bucket."""
        target = _bucket_capacity(max(self.count, 1), self.block_size)
        if target < self.capacity and self.count <= target // 2:
            self._resize(target)

    # -- mutation ------------------------------------------------------------

    def append(self, rows: dict[str, np.ndarray]) -> np.ndarray:
        """Append a batch of rows; returns the assigned dense ids."""
        n = len(next(iter(rows.values())))
        self._maybe_grow(n)
        ids = np.arange(self.count, self.count + n, dtype=np.int64)
        for name, vals in rows.items():
            self.host[name][self.count : self.count + n] = vals
        self._dirty_from = min(self._dirty_from, self.count)
        self.count += n
        return ids

    def set_row(self, idx: int, rows: dict[str, np.ndarray]) -> None:
        """Overwrite one existing row (update-in-place path)."""
        for name, vals in rows.items():
            self.host[name][idx] = vals
            self._dirty_rows[name].add(int(idx))

    def swap_delete(self, idx: int) -> int:
        """Delete row ``idx`` by moving the last row into it.

        Returns the id of the row that moved into ``idx`` (== idx when the
        deleted row was the last). Mirrors ``removeElement`` swap-with-last
        (``data_blocks_container.h``).
        """
        last = self.count - 1
        if idx != last:
            for name in self.fields:
                if name in self._host_stale and not (
                    last >= self._dirty_from or last in self._dirty_rows[name]
                ):
                    # Device-authoritative row: defer the move to the next
                    # device sync (one batched gather+scatter per field for
                    # any number of deletes). Chains resolve at record time
                    # so one flat gather from the untouched device array is
                    # exact; a pending host write to ``idx`` is superseded.
                    mv = self._pending_moves[name]
                    mv[int(idx)] = mv.get(int(last), int(last))
                    self._dirty_rows[name].discard(int(idx))
                else:
                    # Host holds the authoritative content for row ``last``
                    # (filled mirror, un-synced append suffix, or set_row).
                    if name in self._host_stale:
                        # ``idx`` may previously have received a deferred
                        # device move; this newer host write supersedes it
                        # only if it scatters AFTER the move flush — which
                        # device_arrays() guarantees (moves flush first).
                        self._pending_moves[name].pop(int(idx), None)
                    self.host[name][idx] = self.host[name][last]
                    self._dirty_rows[name].add(int(idx))
        self.count = last
        return last

    def row(self, name: str, idx: int) -> np.ndarray:
        return self.host[name][idx]

    def mark_dirty(self, idx: int, *fields: str) -> None:
        """Record a direct host-array edit so device sync picks it up.

        Pass the touched field names; with none given, all fields are
        assumed touched (safe but costs sync bandwidth)."""
        for name in fields or self.fields:
            self._dirty_rows[name].add(int(idx))

    # -- device sync ---------------------------------------------------------

    def _flush_moves(self) -> None:
        """Apply deferred swap-delete row moves to the device arrays.

        One gather+scatter per field, padded to a pow2 width (bounded
        compile cache). Runs BEFORE host uploads in ``device_arrays`` (a
        host write to a moved row is newer and must win) and before any
        ``pull_host``."""
        for name, mv in self._pending_moves.items():
            if not mv:
                continue
            dst = np.fromiter(mv.keys(), dtype=np.int32, count=len(mv))
            src = np.fromiter(mv.values(), dtype=np.int32, count=len(mv))
            mv.clear()
            npad = 1
            while npad < len(dst):
                npad *= 2
            pad = npad - len(dst)
            if pad:
                dst = np.concatenate([dst, np.repeat(dst[-1:], pad)])
                src = np.concatenate([src, np.repeat(src[-1:], pad)])
            arr = self._device[name]
            self._device[name] = arr.at[jnp.asarray(dst)].set(
                arr[jnp.asarray(src)], unique_indices=False
            )

    def device_arrays(self) -> dict[str, jax.Array]:
        """Return device copies, applying pending host mutations.

        Appends upload the dirty suffix with one ``dynamic_update_slice`` per
        field; scattered row edits upload with one batched scatter per field.
        """
        def as_dev_dtype(host_rows, spec):
            if spec.device_dtype != spec.dtype:
                return host_rows.astype(spec.device_dtype)
            return host_rows

        self._flush_moves()
        if self._device_capacity != self.capacity:
            # Capacity bucket changed: full upload (row-sharded over the
            # mesh when one is configured — capacity buckets are pow2
            # multiples of the block size, so any pow2 mesh divides evenly).
            for name, spec in self.fields.items():
                arr = jnp.asarray(as_dev_dtype(self.host[name], spec))
                self._device[name] = self._place(arr)
            self._device_capacity = self.capacity
            for dset in self._dirty_rows.values():
                dset.clear()
            self._dirty_from = self.count
            return dict(self._device)

        suffix = None
        start = self._dirty_from
        if start < self.count:
            # Pad the suffix length to a pow2 bucket (bounded jit cache);
            # padded rows repeat real data and land beyond `count` or get
            # rewritten by the next append — harmless either way.
            n = self.count - start
            npad = 1
            while npad < n:
                npad *= 2
            npad = min(npad, self.capacity - start)
            chunks = {}
            for name, spec in self.fields.items():
                c = as_dev_dtype(self.host[name][start : start + npad], spec)
                chunks[name] = jnp.asarray(c)
            suffix = (chunks,)
            for name, dset in self._dirty_rows.items():
                self._dirty_rows[name] = {r for r in dset if r < start}

        dirty = {}
        for name, dset in self._dirty_rows.items():
            if not dset:
                continue
            idx = np.fromiter(dset, dtype=np.int32)
            npad = 1
            while npad < len(idx):
                npad *= 2
            idx = np.concatenate([idx, np.repeat(idx[-1:], npad - len(idx))])
            spec = self.fields[name]
            rows = as_dev_dtype(self.host[name][idx], spec)
            dirty[name] = (jnp.asarray(idx), jnp.asarray(rows))
            dset.clear()

        if suffix is not None or dirty:
            self._device = _sync_kernel(
                dict(self._device), suffix, jnp.int32(start), dirty
            )
        self._dirty_from = self.count
        return dict(self._device)

    def set_sharding(self, mesh, axis: str) -> None:
        """Row-shard the device copy over ``mesh[axis]`` (multi-chip flat
        scan, SURVEY §2 TPU-native equivalent (b)). Takes effect with a full
        re-placement on the next ``device_arrays`` sync; subsequent grows
        re-shard automatically."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        assert isinstance(mesh, Mesh)
        n = int(np.prod([mesh.shape[a] for a in (axis,)]))
        assert self.capacity % n == 0, "capacity bucket must divide the mesh"
        self._mesh, self._axis = mesh, axis
        self.sharding = NamedSharding(mesh, PartitionSpec(axis))
        self._device_capacity = -1  # force re-placement

    def _row_sharding(self, ndim: int):
        from jax.sharding import NamedSharding, PartitionSpec

        return NamedSharding(
            self._mesh, PartitionSpec(self._axis, *([None] * (ndim - 1)))
        )

    def set_device(self, device) -> None:
        """Pin the whole device copy to one device (per-shard subgraph
        stores of the data-sharded classes: each shard's arrays — and
        therefore its build/search dispatches, which follow committed
        operands — live on its own mesh device instead of piling onto the
        default device). Mutually exclusive with ``set_sharding``."""
        assert self.sharding is None, "store is row-sharded"
        self.placement = device
        if self._device:
            self._device = {
                n: jax.device_put(a, device) for n, a in self._device.items()
            }

    def _place(self, arr: jax.Array) -> jax.Array:
        if self.sharding is not None:
            return jax.device_put(arr, self._row_sharding(arr.ndim))
        if self.placement is not None:
            return jax.device_put(arr, self.placement)
        return arr

    def adopt_device(self, arrays: dict[str, jax.Array], count: int) -> None:
        """Bulk-load device-resident data as the compute copy.

        For ingest pipelines whose data is already on device (device-side
        generation, sharded loaders): the provided arrays (padded to a
        capacity bucket) become the device copy directly — no host->device
        upload. Host mirrors are allocated zeroed and NOT filled; host-side
        reads (``getDataByLabel``, serialization, swap-delete row moves) are
        only valid after the caller fills them. Missing fields get zeroed
        device arrays.
        """
        cap = next(iter(arrays.values())).shape[0]
        assert cap == _bucket_capacity(cap, self.block_size), "pad to a capacity bucket"
        self._resize(cap)
        self.count = count
        for name, spec in self.fields.items():
            if name in arrays:
                self._device[name] = self._place(arrays[name])
            else:
                z = jnp.zeros((cap, *spec.shape), dtype=spec.device_dtype)
                self._device[name] = self._place(z)
        self._device_capacity = cap
        for dset in self._dirty_rows.values():
            dset.clear()
        for mv in self._pending_moves.values():
            mv.clear()
        self._dirty_from = count
        self._host_stale = set(arrays)

    def pull_host(self, *fields: str) -> None:
        """Download device-authoritative fields into their host mirrors.

        With no names given, pulls every field marked host-stale (by
        ``adopt_device`` or ``mark_host_stale``). Serialization and host-path
        mutations call this before trusting host arrays.
        """
        self._flush_moves()
        names = [f for f in (fields or tuple(self._host_stale)) if f in self._host_stale]
        if not names or not self.count:
            self._host_stale -= set(names)
            return
        for name in names:
            # Pull in bounded slices: the axon relay stalls indefinitely on
            # multi-GB single-array reads (observed on a 3 GB vector pull at
            # 1M x 768); ~32 MB chunks stream reliably and cost nothing on
            # directly attached chips.
            spec = self.fields[name]
            row_bytes = max(int(np.prod(spec.shape, initial=1))
                            * np.dtype(spec.device_dtype).itemsize, 1)
            step = max((32 << 20) // row_bytes, 1)
            dev = self._device[name]
            for lo in range(0, self.count, step):
                hi = min(lo + step, self.count)
                rows = np.asarray(dev[lo:hi])
                self.host[name][lo:hi] = rows.astype(spec.dtype, copy=False)
        self._host_stale -= set(names)

    def mark_host_stale(self, *fields: str) -> None:
        """Declare device copies authoritative for ``fields`` (device-side
        construction wrote them); host reads must ``pull_host`` first."""
        self._host_stale.update(fields)

    # -- accounting ----------------------------------------------------------

    @property
    def memory_bytes(self) -> int:
        """Actual bytes held: host mirrors + per-buffer device accounting
        (device dtypes can differ from host — fp64-at-fp32 stores, int
        norm columns — so the device side is summed from the real arrays,
        the ``VecSimAllocator`` accounting analog, ``vecsim_malloc.h:24``)."""
        host = sum(a.nbytes for a in self.host.values())
        dev = 0
        for a in self._device.values():
            try:
                dev += int(np.prod(a.shape)) * a.dtype.itemsize
            except Exception:  # pragma: no cover - deleted buffer
                pass
        return host + dev
