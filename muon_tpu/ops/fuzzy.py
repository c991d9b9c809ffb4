"""UMAP fuzzy-simplicial-set connectivities (jit-compiled).

Clean-room implementation of the smooth-kNN-distance construction
(McInnes et al. 2018) the reference gets from scanpy/umap-learn
(`_compute_connectivities_umap`, used at muon/_core/preproc.py:33-40,
607-614). The per-cell σ binary search is vectorized over all cells —
a fixed 64-step bisection instead of the reference's per-cell Python loop.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
from scipy import sparse as sp

__all__ = ["compute_connectivities_umap", "membership_strengths"]

SMOOTH_K_TOLERANCE = 1e-5
MIN_K_DIST_SCALE = 1e-3


@lru_cache(maxsize=1)
def _jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


@lru_cache(maxsize=None)
def _smooth_knn_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("n_iter",))
    def f(dists, local_connectivity, bandwidth, n_iter=64):
        """dists: (n, k) sorted ascending (self / zeros allowed).
        Returns (sigmas (n,), rhos (n,))."""
        n, k = dists.shape
        target = jnp.log2(k) * bandwidth

        # rho: distance to the `local_connectivity`-th nearest nonzero
        nonzero = dists > 0.0
        num_nonzero = nonzero.sum(axis=1)
        # sorted nonzero distances (zeros pushed to the end)
        big = jnp.where(nonzero, dists, jnp.inf)
        sorted_nz = jnp.sort(big, axis=1)
        li = jnp.floor(local_connectivity).astype(jnp.int32)
        frac = local_connectivity - li

        def rho_for(row_sorted, nnz):
            def nonzero_case():
                lo = jnp.where(li >= 1, row_sorted[jnp.maximum(li - 1, 0)], 0.0)
                hi = row_sorted[jnp.minimum(li, k - 1)]
                interp = jnp.where(
                    li >= 1,
                    lo + frac * (hi - lo),
                    frac * row_sorted[0],
                )
                # if not enough nonzero neighbors, use the max distance
                return jnp.where(nnz > li, interp, row_sorted[jnp.maximum(nnz - 1, 0)])

            return jnp.where(nnz > 0, nonzero_case(), 0.0)

        rhos = jax.vmap(rho_for)(sorted_nz, num_nonzero)

        # binary search for sigma
        d_adj = jnp.maximum(dists - rhos[:, None], 0.0)

        def psum(sig):
            return jnp.exp(-d_adj / sig[:, None]).sum(axis=1)

        lo = jnp.zeros(n)
        hi = jnp.full(n, jnp.inf)
        mid = jnp.ones(n)

        def body(_, carry):
            lo, hi, mid = carry
            val = psum(mid)
            too_big = val > target
            new_hi = jnp.where(too_big, mid, hi)
            new_lo = jnp.where(too_big, lo, mid)
            new_mid = jnp.where(
                too_big,
                (new_lo + new_hi) / 2.0,
                jnp.where(jnp.isinf(new_hi), new_lo * 2.0, (new_lo + new_hi) / 2.0),
            )
            return new_lo, new_hi, new_mid

        lo, hi, mid = jax.lax.fori_loop(0, n_iter, body, (lo, hi, mid))
        sigmas = mid

        # lower bounds on sigma (umap-learn semantics)
        mean_d = jnp.where(
            num_nonzero > 0, jnp.where(nonzero, dists, 0.0).sum(1) / jnp.maximum(num_nonzero, 1), 0.0
        )
        mean_all = dists.mean()
        sigmas = jnp.where(
            rhos > 0.0,
            jnp.maximum(sigmas, MIN_K_DIST_SCALE * mean_d),
            jnp.maximum(sigmas, MIN_K_DIST_SCALE * mean_all),
        )
        return sigmas, rhos

    return f


@lru_cache(maxsize=None)
def _membership_fn():
    jax, jnp = _jax()

    @jax.jit
    def f(knn_dists, sigmas, rhos):
        vals = jnp.exp(-jnp.maximum(knn_dists - rhos[:, None], 0.0) / sigmas[:, None])
        return vals

    return f


def membership_strengths(knn_indices, knn_dists, sigmas, rhos):
    jax, jnp = _jax()
    n, k = knn_dists.shape
    vals = np.asarray(_membership_fn()(jnp.asarray(knn_dists), sigmas, rhos))
    idx = np.asarray(knn_indices)
    # self edges (index == row) get 0
    rows = np.repeat(np.arange(n), k)
    cols = idx.reshape(-1)
    v = vals.reshape(-1).copy()
    v[cols == rows] = 0.0
    keep = cols >= 0
    return rows[keep], cols[keep], v[keep]


def _fuzzy_union_native(idx, vals, n_obs, set_op_mix_ratio):
    """One C++ counting-sort pass over the dense kNN membership table —
    the scipy transpose/multiply/add chain it replaces measured 25s per
    call at 1M×20 on one core (4 calls per multiome pipeline)."""
    import ctypes as C

    from ..native import load_leiden_lib

    lib = load_leiden_lib()
    idx = np.ascontiguousarray(idx, dtype=np.int32)
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    n, k = idx.shape
    h = lib.knn_fuzzy_union(
        n, k,
        idx.ctypes.data_as(C.POINTER(C.c_int32)),
        vals.ctypes.data_as(C.POINTER(C.c_float)),
        float(set_op_mix_ratio),
    )
    from .leiden import _read_agg_handle

    conn = _read_agg_handle(lib, h, n, (n_obs, n_obs))
    conn.data = conn.data.astype(np.float32)
    conn.sort_indices()  # slot-merge emits row-insertion order
    return conn


def compute_connectivities_umap(
    knn_indices,
    knn_dists,
    n_obs: int,
    n_neighbors: int,
    set_op_mix_ratio: float = 1.0,
    local_connectivity: float = 1.0,
) -> sp.csr_matrix:
    """Fuzzy union of directed membership graphs → symmetric connectivities
    (scanpy `_compute_connectivities_umap` parity)."""
    jax, jnp = _jax()
    knn_dists = jnp.asarray(np.asarray(knn_dists), dtype=jnp.float32)
    sigmas, rhos = _smooth_knn_fn()(knn_dists, float(local_connectivity), 1.0)
    idx = np.asarray(knn_indices)
    if idx.shape[0] == n_obs:
        # dense per-row membership table → native one-pass fuzzy union
        vals = np.asarray(_membership_fn()(knn_dists, sigmas, rhos))
        try:
            conn = _fuzzy_union_native(idx, vals, n_obs, set_op_mix_ratio)
            # fixed-width membership tag: umap's spectral init can seed
            # from this directed (n, k) table entirely on device instead
            # of re-uploading the union CSR in wire format (~29s at 1M
            # through the tunnel, round-5 e2e) — see ops/umap.spectral_init
            conn._muon_tpu_membership = {
                "idx": idx.astype(np.int32, copy=False),
                "vals": vals.astype(np.float32, copy=False),
                "n": n_obs,
            }
            return conn
        except Exception:
            pass  # fall through to the scipy path
    rows, cols, vals = membership_strengths(knn_indices, knn_dists, sigmas, rhos)
    W = sp.coo_matrix((vals, (rows, cols)), shape=(n_obs, n_obs)).tocsr()
    Wt = W.T.tocsr()
    prod = W.multiply(Wt)
    conn = (
        set_op_mix_ratio * (W + Wt - prod) + (1.0 - set_op_mix_ratio) * prod
    )
    conn.eliminate_zeros()
    return conn.tocsr()
