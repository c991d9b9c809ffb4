"""Dense elementwise/normalization kernels (jit-compiled, VPU-bound)."""

from __future__ import annotations

from functools import lru_cache, partial

__all__ = ["tfidf_dense", "l2norm_dense", "clr_dense"]


@lru_cache(maxsize=1)
def _jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


@lru_cache(maxsize=None)
def _tfidf_dense_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("log_tf", "log_idf", "log_tfidf", "scale"))
    def f(X, log_tf, log_idf, log_tfidf, scale):
        rs = X.sum(axis=1, keepdims=True)
        tf = X / rs
        tf = jnp.where(jnp.isfinite(tf), tf, 0.0)
        if scale is not None and scale not in (0, 1):
            tf = tf * scale
        if log_tf:
            tf = jnp.log1p(tf)
        idf = X.shape[0] / X.sum(axis=0, keepdims=True)
        if log_idf:
            idf = jnp.log1p(idf)
        out = tf * idf
        if log_tfidf:
            out = jnp.log1p(out)
        return jnp.where(jnp.isfinite(out), out, 0.0)

    return f


def tfidf_dense(X, log_tf=True, log_idf=True, log_tfidf=False, scale_factor=1e4):
    sf = None if scale_factor is None else float(scale_factor)
    return _tfidf_dense_fn()(X, log_tf, log_idf, log_tfidf, sf)


@lru_cache(maxsize=None)
def _l2norm_fn():
    jax, jnp = _jax()

    @jax.jit
    def f(X):
        norms = jnp.linalg.norm(X, axis=1, keepdims=True)
        return X / jnp.where(norms == 0, 1.0, norms)

    return f


def l2norm_dense(X):
    return _l2norm_fn()(X)


@lru_cache(maxsize=None)
def _clr_dense_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("axis",))
    def f(X, axis):
        logx = jnp.log1p(X)
        gm = logx.mean(axis=axis, keepdims=True)
        return logx - gm

    return f


def clr_dense(X, axis=0):
    return _clr_dense_fn()(X, axis)
