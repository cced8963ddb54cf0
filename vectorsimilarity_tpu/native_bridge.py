"""ctypes bridge to the native host runtime (``native/vecsim_host.cpp``).

Loads ``build/libvecsim_host.so`` (built by ``make native``; auto-built on
first import when a toolchain is present). All call sites keep pure-Python
fallbacks, so the library is an accelerator, not a dependency. The numpy
adjacency buffers are passed zero-copy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_REPO, "build", "libvecsim_host.so")
_SRC = os.path.join(_REPO, "native", "vecsim_host.cpp")

_lib: Optional[ctypes.CDLL] = None
_tried = False

JOB_FN = ctypes.CFUNCTYPE(None, ctypes.c_void_p)


def _build() -> bool:
    try:
        os.makedirs(os.path.dirname(_SO), exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO, _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (
        os.path.exists(_SRC) and os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64 = ctypes.c_int64
    lib.vs_find_referrers.restype = i64
    lib.vs_find_referrers.argtypes = [i32p, i64, i64, ctypes.c_int32, i32p, i64]
    lib.vs_rewrite_id.restype = i64
    lib.vs_rewrite_id.argtypes = [i32p, i64, i64, ctypes.c_int32, ctypes.c_int32]
    lib.vs_apply_reverse_edges.restype = i64
    lib.vs_apply_reverse_edges.argtypes = [
        i32p, i32p, i64, i32p, i64, i32p, i64, i32p, i64, ctypes.POINTER(i64)
    ]
    lib.vs_pool_create.restype = ctypes.c_void_p
    lib.vs_pool_create.argtypes = [ctypes.c_int]
    lib.vs_pool_submit.argtypes = [ctypes.c_void_p, JOB_FN, ctypes.c_void_p]
    lib.vs_pool_wait.restype = ctypes.c_int
    lib.vs_pool_wait.argtypes = [ctypes.c_void_p, i64]
    lib.vs_pool_in_flight.restype = i64
    lib.vs_pool_in_flight.argtypes = [ctypes.c_void_p]
    lib.vs_pool_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def find_referrers(links: np.ndarray, n_rows: int, target: int) -> Optional[np.ndarray]:
    """Rows in links[:n_rows] containing ``target``; None if lib missing."""
    lib = get_lib()
    if lib is None:
        return None
    links = np.ascontiguousarray(links[:n_rows], dtype=np.int32)
    m = links.shape[-1] if links.ndim > 1 else 1
    flat = links.reshape(n_rows, -1)
    out = np.empty(n_rows, dtype=np.int32)
    n = lib.vs_find_referrers(_i32p(flat), n_rows, flat.shape[1], target, _i32p(out), n_rows)
    return out[: min(n, n_rows)].copy()


def rewrite_id(links: np.ndarray, n_rows: int, old_id: int, new_id: int) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    assert links.dtype == np.int32 and links.flags.c_contiguous
    flat = links[:n_rows].reshape(n_rows, -1)
    return int(lib.vs_rewrite_id(_i32p(flat), n_rows, flat.shape[1], old_id, new_id))


def apply_reverse_edges(links: np.ndarray, nlinks: np.ndarray, pairs: np.ndarray):
    """Append back-edges (neighbor, node) into the adjacency rows in C.

    Returns (overflow_row_ids, dirty_row_ids) or None when the native lib is
    unavailable. ``links`` [cap, m] int32 C-contiguous, ``nlinks`` [cap]
    int32, ``pairs`` [P, 2] int32; rows are modified in place.
    """
    lib = get_lib()
    if lib is None:
        return None
    assert links.dtype == np.int32 and links.flags.c_contiguous
    assert nlinks.dtype == np.int32 and nlinks.flags.c_contiguous
    pairs = np.ascontiguousarray(pairs, dtype=np.int32)
    P = len(pairs)
    overflow = np.empty(max(P, 1), dtype=np.int32)
    dirty = np.empty(max(P, 1), dtype=np.int32)
    dirty_count = ctypes.c_int64(0)
    n_over = lib.vs_apply_reverse_edges(
        _i32p(links), _i32p(nlinks), links.shape[1],
        _i32p(pairs), P,
        _i32p(overflow), len(overflow),
        _i32p(dirty), len(dirty), ctypes.byref(dirty_count),
    )
    return overflow[: min(n_over, len(overflow))].copy(), dirty[: dirty_count.value].copy()


class NativePool:
    """C++ worker pool behind the SubmitCB contract; Python callbacks run on
    native threads via ctypes trampolines (which re-acquire the GIL)."""

    def __init__(self, num_threads: int = 4):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native host runtime unavailable")
        self._lib = lib
        self._pool = lib.vs_pool_create(num_threads)
        self._keepalive: dict[int, tuple] = {}
        self._next = 1  # 0 would round-trip through ctypes as a NULL -> None

        @JOB_FN
        def trampoline(arg):
            key = int(arg)
            job, cb = self._keepalive.pop(key)
            cb(job)

        self._trampoline = trampoline

    def submit_cb(self, job_queue, job_queue_ctx, jobs, callbacks) -> int:
        for job, cb in zip(jobs, callbacks):
            key = self._next
            self._next += 1
            self._keepalive[key] = (job, cb)
            self._lib.vs_pool_submit(self._pool, self._trampoline, ctypes.c_void_p(key))
        return 0

    def wait_for_quiescence(self, timeout: float | None = None) -> bool:
        ms = -1 if timeout is None else int(timeout * 1000)
        return bool(self._lib.vs_pool_wait(self._pool, ms))

    def shutdown(self) -> None:
        if self._pool:
            self._lib.vs_pool_destroy(self._pool)
            self._pool = None
