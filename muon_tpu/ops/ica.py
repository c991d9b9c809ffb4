"""FastICA (jit-compiled, symmetric decorrelation, logcosh contrast).

Replaces sklearn FastICA at the reference's mu.tl.ica
(muon/_core/tools.py:1365-1386)."""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

__all__ = ["fastica"]


@lru_cache(maxsize=1)
def _jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


@lru_cache(maxsize=None)
def _fastica_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("n_iter",))
    def f(Xw, W0, n_iter):
        """Xw: whitened data (k, n); W0: (k, k) init. Symmetric FastICA."""

        def sym_decorrelate(W):
            s, u = jnp.linalg.eigh(W @ W.T)
            s = jnp.maximum(s, 1e-12)
            return (u * (1.0 / jnp.sqrt(s))[None, :]) @ u.T @ W

        def body(_, W):
            WX = W @ Xw                       # (k, n)
            g = jnp.tanh(WX)
            g_prime = 1.0 - g * g
            W_new = (g @ Xw.T) / Xw.shape[1] - (
                g_prime.mean(axis=1)[:, None] * W
            )
            return sym_decorrelate(W_new)

        W = sym_decorrelate(W0)
        W = jax.lax.fori_loop(0, n_iter, body, W)
        return W

    return f


def fastica(X, n_components=None, random_state=None, max_iter: int = 200,
            whiten: bool = True):
    """Fit ICA; returns sources (n, k) like sklearn's fit_transform."""
    jax, jnp = _jax()
    X = np.asarray(X, dtype=np.float32)
    n, d = X.shape
    k = n_components or min(n, d)
    mean = X.mean(axis=0)
    Xc = (X - mean).T  # (d, n)

    # PCA whitening
    U, s, _ = np.linalg.svd(Xc @ Xc.T / n)
    Kw = (U[:, :k] / np.sqrt(np.maximum(s[:k], 1e-12))[None, :]).T  # (k, d)
    Xw = Kw @ Xc  # (k, n)

    rng = np.random.default_rng(random_state)
    W0 = rng.normal(size=(k, k)).astype(np.float32)
    W = np.asarray(_fastica_fn()(jnp.asarray(Xw), jnp.asarray(W0), max_iter))
    S = (W @ Xw).T  # (n, k)
    return S
