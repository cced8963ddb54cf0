"""Deferred swap-delete row moves on device-authoritative stores.

After ``adopt_device`` (device-built stores) the host vector mirrors are
unfilled; ``swap_delete`` used to ``pull_host`` the whole store before the
host-side row copy — ~100 ms/delete at 1M x 768 through the axon relay and
GBs at 10M. Deletes now defer the row move and the next device sync applies
every pending move as one batched gather+scatter per field
(``BlockStore._flush_moves``). These tests pin the exactness of that path:
move chains, interleaved appends/set_row, pull_host, and the index-level
delete->query flow.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vectorsimilarity_tpu.core.store import BlockStore, FieldSpec, _bucket_capacity


def _mk_store(n, dim=4, block=8):
    st = BlockStore({"data": FieldSpec((dim,), np.float32),
                     "label": FieldSpec((), np.int64, fill=-1)}, block)
    cap = _bucket_capacity(n, block)
    rows = jnp.arange(cap * dim, dtype=jnp.float32).reshape(cap, dim)
    st.adopt_device({"data": rows}, count=n)
    st.host["label"][:n] = np.arange(n)
    # label mirror is host-filled; only "data" stays device-authoritative
    st._host_stale.discard("label")
    return st, np.asarray(rows)


def _expect_after_swap_deletes(ref, n, dels):
    """Numpy simulation of swap-with-last deletes (by current row index)."""
    live = list(range(n))
    rows = ref.copy()
    for idx in dels:
        last = len(live) - 1
        rows[idx] = rows[last]
        live[idx] = live[last]
        live.pop()
    return rows, len(live)


def test_deferred_moves_match_numpy_simulation():
    st, ref = _mk_store(20)
    dels = [3, 3, 17, 0, 5]  # includes a repeat dst and a chained src
    for idx in dels:
        st.swap_delete(idx)
    assert any(st._pending_moves["data"].values() or [1])
    exp, cnt = _expect_after_swap_deletes(ref, 20, dels)
    dev = st.device_arrays()
    assert st.count == cnt
    np.testing.assert_array_equal(np.asarray(dev["data"])[:cnt], exp[:cnt])


def test_chain_through_pending_dst():
    # Delete dst 8 (pulls row last), then delete 3 whose src IS row 8:
    # the recorded move must resolve through the pending chain.
    st, ref = _mk_store(10)
    st.swap_delete(8)   # (8 <- 9)
    st.swap_delete(3)   # (3 <- 8) which logically holds row 9... no:
    # after first delete count=9, last=8, so move is (3 <- 8) and row 8's
    # pending content is row 9's. Resolution makes it (3 <- 9).
    exp, cnt = _expect_after_swap_deletes(ref, 10, [8, 3])
    dev = st.device_arrays()
    np.testing.assert_array_equal(np.asarray(dev["data"])[:cnt], exp[:cnt])


def test_moves_with_appended_suffix_and_set_row():
    st, ref = _mk_store(10)
    # Append two host-valid rows, then delete so that src lands in the
    # un-synced suffix (host content must win over the stale device row).
    newr = np.full((2, 4), 99.0, dtype=np.float32)
    st.append({"data": newr, "label": np.array([100, 101])})
    full = np.concatenate([ref[:10], newr, ref[10:]])[: len(ref)]
    # delete idx 2: src = row 11 (label 101, host-valid suffix)
    st.swap_delete(2)
    exp, cnt = _expect_after_swap_deletes(full, 12, [2])
    dev = st.device_arrays()
    np.testing.assert_array_equal(np.asarray(dev["data"])[:cnt], exp[:cnt])
    # set_row then delete into it: host write supersedes any device move
    st.set_row(1, {"data": np.full(4, -5.0, dtype=np.float32),
                   "label": np.int64(555)})
    exp[1] = -5.0
    st.swap_delete(1)
    exp, cnt2 = _expect_after_swap_deletes(exp, cnt, [1])
    dev = st.device_arrays()
    np.testing.assert_array_equal(np.asarray(dev["data"])[:cnt2], exp[:cnt2])


def test_pull_host_flushes_pending_moves():
    st, ref = _mk_store(16)
    st.swap_delete(4)
    st.swap_delete(4)
    exp, cnt = _expect_after_swap_deletes(ref, 16, [4, 4])
    st.pull_host()
    np.testing.assert_array_equal(st.host["data"][:cnt], exp[:cnt])
    assert not st._host_stale


def test_no_full_pull_on_delete():
    """The perf contract itself: deleting from an adopted store must not
    clear the data field's host-stale bit (i.e. no wholesale pull)."""
    st, _ = _mk_store(32)
    st.swap_delete(1)
    assert "data" in st._host_stale
    assert st._pending_moves["data"]


def test_bf_index_delete_then_query_exact():
    from vectorsimilarity_tpu.indexes.brute_force import BruteForceIndex
    from vectorsimilarity_tpu.types import BFParams, VecSimMetric, VecSimType

    n, dim, k = 64, 8, 5
    idx = BruteForceIndex(BFParams(type=VecSimType.FLOAT32, dim=dim,
                                   metric=VecSimMetric.L2, initialCapacity=n))
    rng = np.random.default_rng(0)
    data = rng.standard_normal((_bucket_capacity(n, idx.store.block_size),
                                dim)).astype(np.float32)
    dd = jnp.asarray(data)
    idx.store.adopt_device({"data": dd, "sqnorm": jnp.sum(dd * dd, axis=1)},
                           count=n)
    idx.labels.label_to_id = {i: i for i in range(n)}
    idx.store.host["label"][:n] = np.arange(n)
    q = rng.standard_normal(dim).astype(np.float32)
    gone = set()
    for lab in (3, 60, 3, 17, 0):
        if lab not in gone:
            assert idx.delete_vector(lab) == 1
            gone.add(lab)
    rep = idx.topk_query(q, k)
    live = [i for i in range(n) if i not in gone]
    d = ((data[live] - q) ** 2).sum(1)
    want = [live[j] for j in np.argsort(d, kind="stable")[:k]]
    assert sorted(int(x) for x in rep.ids) == sorted(want)
