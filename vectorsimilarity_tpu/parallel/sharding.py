"""Multi-chip scale-out: shard the vector store across a TPU mesh.

The reference is a single-node shared-memory library; its scale story is
thread concurrency (SURVEY §2 P1-P4). The TPU-native scale story is data
parallelism over ICI: vector blocks are sharded row-wise across a
``jax.sharding.Mesh``; each device scans its shard with the same fused
matmul+top-k kernel; per-shard top-k candidates are all-gathered (k·devices
rows, tiny) and reduced to the global top-k. Queries are replicated; the
only collective on the hot path is one small ``all_gather`` riding ICI.

Deletes keep working because swap-with-last relocations are row writes, and
row writes land in whichever shard owns the row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.distances import scores_float, scores_int, scores_sq8
from ..types import VecSimMetric

AXIS = "shard"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def shard_rows(arr: jax.Array, mesh: Mesh) -> jax.Array:
    """Place an [N, ...] array row-sharded across the mesh."""
    spec = P(AXIS, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate(arr: jax.Array, mesh: Mesh) -> jax.Array:
    return jax.device_put(arr, NamedSharding(mesh, P()))


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "kind", "mesh"), donate_argnums=()
)
def sharded_topk(
    queries: jax.Array,
    store: tuple,
    count: jax.Array,
    k: int,
    *,
    metric: VecSimMetric,
    kind: str,
    mesh: Mesh,
    query_norms: jax.Array | None = None,
):
    """Exact top-k over a row-sharded store.

    ``store`` arrays are [N_global, ...] sharded over AXIS; ``count`` is the
    global live-row count (rows >= count are padding). Returns global
    (dists [B, k], ids [B, k]).
    """
    n_global = store[0].shape[0]
    n_shards = mesh.shape[AXIS]
    shard_n = n_global // n_shards
    B = queries.shape[0]

    def local_topk(q, *arrs):
        local = arrs[: len(store)]
        qn = arrs[len(store)] if query_norms is not None else None
        sidx = jax.lax.axis_index(AXIS)
        offset = sidx * shard_n
        if kind == "float":
            d = scores_float(q, local[0], metric, local[1])
        elif kind == "int":
            d = scores_int(q, local[0], metric, local[1], qn)
        elif kind == "sq8":
            d = scores_sq8(q, local[0], local[1], local[2], local[3], metric)
        else:
            raise ValueError(kind)
        gids = offset + jax.lax.broadcasted_iota(jnp.int32, (B, shard_n), 1)
        d = jnp.where(gids < count, d.astype(jnp.float32), jnp.inf)
        kk = min(k, shard_n)
        neg, loc = jax.lax.top_k(-d, kk)
        ids = jnp.take_along_axis(gids, loc, axis=1)
        ld = -neg
        if kk < k:
            ld = jnp.pad(ld, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
            ids = jnp.pad(ids, ((0, 0), (0, k - kk)), constant_values=-1)
        # Gather every shard's candidates and reduce to the global top-k.
        all_d = jax.lax.all_gather(ld, AXIS, axis=1, tiled=True)  # [B, k*S]
        all_i = jax.lax.all_gather(ids, AXIS, axis=1, tiled=True)
        neg2, sel = jax.lax.top_k(-all_d, k)
        return -neg2, jnp.take_along_axis(all_i, sel, axis=1)

    in_specs = [P()] + [P(AXIS, *([None] * (a.ndim - 1))) for a in store if a is not None]
    args = [queries] + [a for a in store if a is not None]
    # Keep positional alignment: rebuild store tuple inside via closure on
    # which entries were None.
    none_mask = [a is None for a in store]

    def wrapper(q, *arrs):
        it = iter(arrs)
        rebuilt = tuple(None if m else next(it) for m in none_mask)
        rest = list(it)
        qn = rest[0] if rest else None
        full = rebuilt + ((qn,) if query_norms is not None else ())
        return local_topk(q, *full)

    if query_norms is not None:
        in_specs.append(P())
        args.append(query_norms)

    return jax.shard_map(
        wrapper,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P()),
        check_vma=False,
    )(*args)


def query_parallel_search(index, queries, k: int, ef: int, mesh: Mesh):
    """Multi-chip graph search: queries sharded over the mesh, graph
    replicated — GSPMD partitions the jitted beam kernels batch-parallel,
    so every chip searches its slice of the query batch against its local
    graph replica (query-throughput scale-out for HNSW/SVS; the sharded
    *data* axis belongs to the flat scan in ``sharded_topk``).

    ``index`` is an HNSWIndex/SVSIndex; queries [B, D] with B a multiple of
    the mesh size. Returns host (dists, ids) like ``search_knn``.
    """
    import numpy as np

    qspec = NamedSharding(mesh, P(AXIS, None))
    queries = np.asarray(queries)
    B = len(queries)
    assert B % mesh.shape[AXIS] == 0, "pad the query batch to the mesh size"
    # Re-place the query batch sharded; stores/links stay replicated and
    # GSPMD partitions the kernels batch-parallel.
    q_dev = jax.device_put(jnp.asarray(queries), qspec)
    return index.search_knn_device(q_dev, k, ef)


class ShardedFlatStore:
    """Host-side helper: keep a BF store sharded across a mesh.

    Pads the row count to a multiple of the mesh size and re-shards on
    capacity growth. Used by ``BruteForceIndex.to_sharded()`` and the
    multi-chip dry run.
    """

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def pad_rows(self, n: int) -> int:
        s = self.mesh.shape[AXIS]
        return ((n + s - 1) // s) * s

    def place(self, host_arrays: dict[str, np.ndarray]) -> dict[str, jax.Array]:
        out = {}
        for name, arr in host_arrays.items():
            pad = self.pad_rows(arr.shape[0]) - arr.shape[0]
            if pad:
                arr = np.pad(arr, [(0, pad)] + [(0, 0)] * (arr.ndim - 1))
            out[name] = shard_rows(jnp.asarray(arr), self.mesh)
        return out
