"""Non-negative matrix factorization on device + scOpen imputation.

Replaces the external scopen package's coordinate-descent NMF (reference
muon/_atac/preproc.py:155-236) with jit-compiled multiplicative updates —
each iteration is two dense matmul pairs on the MXU, looped with
`lax.fori_loop` so the whole factorization is one XLA program.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

__all__ = ["nmf", "scopen_impute"]


@lru_cache(maxsize=1)
def _jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


@lru_cache(maxsize=None)
def _nmf_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("k", "max_iter"))
    def f(X, k, alpha, max_iter, key):
        m, n = X.shape
        kw, kh = jax.random.split(key)
        scale = jnp.sqrt(X.mean() / k)
        W = scale * jnp.abs(jax.random.normal(kw, (m, k), X.dtype))
        H = scale * jnp.abs(jax.random.normal(kh, (k, n), X.dtype))
        eps = jnp.asarray(1e-10, X.dtype)

        def body(_, carry):
            W, H = carry
            # multiplicative updates for ½‖X−WH‖² + ½α(‖W‖²+‖H‖²)
            WtX = W.T @ X
            WtW = W.T @ W
            H = H * WtX / (WtW @ H + alpha * H + eps)
            XHt = X @ H.T
            HHt = H @ H.T
            W = W * XHt / (W @ HHt + alpha * W + eps)
            return (W, H)

        W, H = jax.lax.fori_loop(0, max_iter, body, (W, H))
        return W, H

    return f


def nmf(X, n_components: int, alpha: float = 1.0, max_iter: int = 500, seed: int = 0):
    """Factorize X ≈ W·H (all non-negative) with L2 regularization.
    Returns (W (m,k), H (k,n)) as numpy arrays."""
    jax, jnp = _jax()
    f = _nmf_fn()
    key = jax.random.PRNGKey(seed)
    W, H = f(
        jnp.asarray(X, jnp.float32), int(n_components), float(alpha),
        int(max_iter), key,
    )
    return np.asarray(W), np.asarray(H)


def scopen_impute(
    adata,
    n_components: int = 30,
    max_iter: int = 500,
    min_rho: float = 0.0,
    max_rho: float = 0.5,
    alpha: float = 1.0,
    verbose: bool = False,
):
    """scOpen (Li et al. 2019) imputation of binarized peak counts
    (behavior of reference muon/_atac/preproc.py:155-236): binarize,
    per-cell dropout-rate scaling, bounded NMF, clip imputed matrix to
    [0,1]; writes obsm["X_scopen"], varm["scopen"], replaces X."""
    from scipy.sparse import issparse

    X = adata.X.T
    if issparse(X):
        X = np.asarray(X.todense())
    X = np.greater(X, 0).astype(np.float32)

    m, n = X.shape
    n_open = np.log10(np.maximum(X.sum(axis=0), 1.0))
    hi, lo = n_open.max(), n_open.min()
    if verbose:
        print(f"Number of peaks: {m}\nNumber of cells: {n}")

    denom = (hi - lo) if hi > lo else 1.0
    rho = min_rho + (max_rho - min_rho) * (hi - n_open) / denom
    X = X * (1.0 / (1.0 - rho))

    W, H = nmf(X, n_components=n_components, alpha=alpha, max_iter=max_iter)
    M = np.clip(W @ H, 0.0, 1.0)

    adata.obsm["X_scopen"] = H.T
    adata.varm["scopen"] = W
    adata.X = M.T
    return None
