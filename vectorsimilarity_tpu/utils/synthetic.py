"""Synthetic benchmark datasets.

Uniform random high-dimensional vectors are a pathological ANN benchmark:
with no low-dimensional structure, pairwise distances concentrate and
proximity graphs lose navigability (recall collapses for *any* HNSW-family
implementation as N grows). Real embedding corpora — including dbpedia-768,
the reference's primary benchmark (``bm_basics_single_fp32.cpp``) — have
intrinsic dimension around 30-100. This generator models that: ambient
dimension D, intrinsic dimension d, Gaussian latent, random linear map,
small ambient noise.
"""

from __future__ import annotations


def _embedding_like_jit():
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=(
        "n", "dim", "intrinsic_dim", "noise", "normalize", "dtype",
        "own_latent"))
    def gen(key, lkey, n, dim, intrinsic_dim, noise, normalize, dtype,
            own_latent):
        k1, k2, k3 = jax.random.split(key, 3)
        if own_latent:
            k1, k3 = jax.random.split(lkey, 2)
        z = jax.random.normal(k1, (n, intrinsic_dim), dtype=jnp.float32)
        proj = jax.random.normal(k2, (intrinsic_dim, dim), dtype=jnp.float32)
        proj = proj / jnp.sqrt(float(intrinsic_dim))
        x = z @ proj
        if noise:
            x = x + noise * jax.random.normal(k3, (n, dim), dtype=jnp.float32)
        if normalize:
            x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return x.astype(dtype)

    return gen


_gen = None


def embedding_like(key, n: int, dim: int, intrinsic_dim: int = 48, noise: float = 0.05,
                   dtype=None, normalize: bool = True, latent_key=None):
    """Device-side generation of [n, dim] embedding-like vectors.

    Runs under ``jit`` so XLA fuses the latent/noise temporaries — eager
    execution materializes ~3 full-size intermediates, which OOMs a 16 GB
    chip at 10M x 96. ``latent_key`` draws a fresh latent (and noise)
    while keeping ``key``'s projection: held-out QUERIES on the same
    manifold as a corpus without regenerating the corpus
    (``embedding_like(k, B, dim, latent_key=kq)`` instead of the
    full-size ``embedding_like(k, n + B, dim)[n:]``)."""
    import jax.numpy as jnp

    global _gen
    if _gen is None:
        _gen = _embedding_like_jit()
    return _gen(key, key if latent_key is None else latent_key,
                n, dim, intrinsic_dim, float(noise), normalize,
                dtype or jnp.float32, latent_key is not None)


def embedding_like_np(rng, n: int, dim: int, intrinsic_dim: int = 48, noise: float = 0.05,
                      normalize: bool = True):
    """Host numpy variant (shares the generator's definition, not its bits)."""
    import numpy as np

    z = rng.standard_normal((n, intrinsic_dim)).astype(np.float32)
    proj = rng.standard_normal((intrinsic_dim, dim)).astype(np.float32) / np.sqrt(intrinsic_dim)
    x = z @ proj
    if noise:
        x = x + noise * rng.standard_normal((n, dim)).astype(np.float32)
    if normalize:
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
    return x
