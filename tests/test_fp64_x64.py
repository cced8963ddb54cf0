"""True fp64 compute under JAX x64 (VERDICT r2 item 10).

The FLOAT64 lane silently computes at fp32 on device unless x64 is enabled
(documented in ``config``/``abstract_index``); this suite proves the x64
configuration delivers genuine double precision — the analog of the
reference's ``IP_AVX512F_FP64.h`` kernels — by running the engine in a
subprocess with ``JAX_ENABLE_X64=1`` (x64 must be set before jax
initializes, so it cannot be toggled inside this pytest process).
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = textwrap.dedent("""
    import os
    os.environ["JAX_ENABLE_X64"] = "1"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import vectorsimilarity_tpu as vs
    from vectorsimilarity_tpu.types import (
        BFParams, VecSimAlgo, VecSimMetric, VecSimParams, VecSimType)

    rng = np.random.default_rng(0)
    n, dim, k = 2000, 64, 10
    data = rng.standard_normal((n, dim))  # float64
    for metric in (VecSimMetric.L2, VecSimMetric.IP):
        idx = vs.create_index(VecSimParams(algo=VecSimAlgo.BF, bfParams=BFParams(
            type=VecSimType.FLOAT64, dim=dim, metric=metric)))
        idx.add_vector_batch(data, list(range(n)))
        assert idx.store.host["data"].dtype == np.float64
        assert str(idx.store.device_arrays()["data"].dtype) == "float64"
        q = rng.standard_normal(dim)
        if metric == VecSimMetric.L2:
            gt = ((data - q) ** 2).sum(1)
        else:
            gt = 1.0 - data @ q
        order = np.argsort(gt)[:k]
        rep = idx.topk_query(q, k)
        assert rep.ids.tolist() == order.tolist(), (rep.ids, order)
        # fp64 tolerance: far below anything fp32 could deliver.
        err = np.abs(np.asarray(rep.scores) - gt[order]).max()
        assert err < 1e-11, f"{metric}: err {err:.3e} not double precision"
    print("FP64_X64_OK")
""")


def test_fp64_exact_under_x64():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_ENABLE_X64"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT], env=env, capture_output=True,
        text=True, timeout=600,
    )
    assert "FP64_X64_OK" in out.stdout, (out.stdout, out.stderr[-2000:])
