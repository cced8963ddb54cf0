"""Ad-hoc brute-force scoring context.

Reference: ``vec_sim_adhoc_bf_ctx.h`` + ``vec_sim.h:236-274``. The hybrid
ad-hoc policy scores each filtered label directly instead of searching; the
context holds the preprocessed query so repeated per-label scoring skips
preprocessing. The TPU twist: ``get_exact_distances`` batches all requested
labels into one device gather+score call instead of a per-label loop.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class AdhocBfCtx:
    def __init__(self, index, query: np.ndarray):
        self.index = index
        pre = index.preprocess_queries(np.asarray(query).reshape(1, -1))
        if len(pre) == 3:  # SVS returns (q, qnorm, qmeta)
            self._q, self._qn, self._qm = pre
        else:
            self._q, self._qn = pre
            self._qm = None

    def get_distance(self, label: int) -> float:
        """Min distance to the label's vectors; NaN if absent
        (``VecSimIndex_AdhocBfCtx_GetDistanceFrom``)."""
        out = self.get_exact_distances([label])
        return float(out[0])

    def get_exact_distances(self, labels) -> np.ndarray:
        """Batched distances for many labels in one device call
        (``VecSimIndex_AdhocBfCtx_GetExactDistances``)."""
        from ..ops.graph_search import StoreCtx, dists_to_ids

        index = self.index
        ids_per_label = [index.labels.ids_of(int(l)) for l in labels]
        width = max((len(x) for x in ids_per_label), default=0)
        if width == 0:
            return np.full(len(labels), np.nan)
        ids = np.full((len(labels), width), -1, dtype=np.int32)
        for r, lst in enumerate(ids_per_label):
            ids[r, : len(lst)] = lst
        if getattr(index, "res_bits", 0):
            # Two-level / LeanVec SVS stores: the index's refinement decode
            # is the exact-scoring surface (the primary store may live in a
            # projected space the generic gather kernel can't score).
            q = np.broadcast_to(self._q[0], (len(labels), self._q.shape[1]))
            d = index.exact_gathered_dists(q, ids)
            best = d.min(axis=1)
            best[~np.isfinite(best)] = np.nan
            return best
        dev = index.store.device_arrays()
        ctx = StoreCtx(
            data=dev["data"],
            sqnorm=dev.get("sqnorm"),
            norm=dev.get("norm"),
            vmin=dev.get("vmin"),
            delta=dev.get("delta"),
        )
        q = jnp.broadcast_to(jnp.asarray(self._q[0]), (len(labels), self._q.shape[1]))
        qn = None
        if self._qn is not None:
            qn = jnp.broadcast_to(jnp.asarray(self._qn[0:1]), (len(labels),))
        qm = None
        if self._qm is not None:
            qm = tuple(
                jnp.broadcast_to(jnp.asarray(m[0:1]), (len(labels),)) for m in self._qm
            )
        d = np.asarray(
            dists_to_ids(
                q, jnp.asarray(ids), ctx,
                metric=index.metric, kind=index.store_kind, q_norm=qn, q_meta=qm,
            )
        )
        best = d.min(axis=1)
        best[~np.isfinite(best)] = np.nan
        return best
