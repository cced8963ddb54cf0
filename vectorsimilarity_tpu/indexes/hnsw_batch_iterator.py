"""HNSW batch iterator — resumable frontier semantics.

Reference: ``hnsw_batch_iterator.h:21-267`` persists the beam frontier and
spillover heap across calls. The TPU re-design keeps a host-side cache of
scored-but-unserved results and re-runs the jitted beam with a doubled ef
only when the cache runs dry — same contract (batches in decreasing quality
until depletion), no device state carried between calls. When ef reaches the
index size the graph has been exhausted and the iterator depletes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.interface import TimeoutBudget
from ..core.results import QueryReply, make_reply
from ..types import QueryReplyOrder, VecSimQueryParams, VecSimQueryReplyCode


class HNSWBatchIterator:
    def __init__(self, index, query: np.ndarray, params: Optional[VecSimQueryParams] = None):
        self.index = index
        self.query = np.array(query, copy=True)
        self.params = params
        base_ef = index.ef_runtime
        if params is not None and params.hnswRuntimeParams.efRuntime:
            base_ef = params.hnswRuntimeParams.efRuntime
        self._base_ef = max(base_ef, 32)
        self.reset()

    def reset(self) -> None:
        self._returned: set[int] = set()
        self._pending: list[tuple[float, int]] = []  # scored, not yet served
        self._seen: set[int] = set()  # returned ∪ pending labels
        self._ef = self._base_ef
        self._exhausted = False

    def is_depleted(self) -> bool:
        if self._pending:
            return False
        if self.index.index_size == 0:
            return True
        return self._exhausted

    def _search_more(self) -> None:
        """One search pass at the current ef; stash fresh labels in order."""
        idx = self.index
        ef = min(self._ef, max(idx.index_size, 1))
        dists, ids = idx.search_knn(self.query, min(ef, idx.index_size), ef)
        row_i, row_d = ids[0], dists[0]
        valid = (row_i >= 0) & np.isfinite(row_d)
        row_i, row_d = row_i[valid], row_d[valid]
        flags = idx.store.host["flags"]
        live = (flags[row_i] & 1) == 0
        row_i, row_d = row_i[live], row_d[live]
        labels = idx.store.host["label"][row_i]
        for lab, d in zip(labels, row_d):
            lab = int(lab)
            if lab not in self._seen:
                self._seen.add(lab)
                self._pending.append((float(d), lab))
        if ef >= idx.index_size or len(self._seen) >= idx.index_label_count:
            self._exhausted = True
        self._ef = ef * 2

    def get_next_results(
        self, n: int, order: QueryReplyOrder = QueryReplyOrder.BY_SCORE
    ) -> QueryReply:
        budget = TimeoutBudget(self.params.timeoutCtx if self.params else None)
        if budget.expired():
            return make_reply([], [], VecSimQueryReplyCode.TimedOut)
        if self.index.index_size == 0:
            self._exhausted = True
            return make_reply([], [])
        self._ef = max(self._ef, n)
        while len(self._pending) < n and not self._exhausted:
            self._search_more()
            if budget.expired():
                break
        serve, self._pending = self._pending[:n], self._pending[n:]
        self._returned.update(lab for _, lab in serve)
        return make_reply([lab for _, lab in serve], [d for d, _ in serve]).sort(order)
