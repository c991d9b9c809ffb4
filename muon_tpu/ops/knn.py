"""Exact batched k-nearest-neighbors on TPU.

Replaces pynndescent NN-descent (reference muon/_core/preproc.py:24-26,
452,520) with brute-force blocked distances + top-k: tile-wise ``QCᵀ``
matmuls ride the MXU, ``lax.top_k`` selects per block, and a scan over row
blocks bounds memory at (block × n). Exact kNN removes the reference's
approximation variance (SURVEY §7 step 4).
"""

from __future__ import annotations

from functools import lru_cache, partial

__all__ = ["knn", "pairwise_sq_dists"]


@lru_cache(maxsize=1)
def _jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


def _block_rows(n: int, d: int, budget: int = 1 << 28) -> int:
    """Row-block size so the (block × n) distance tile stays under budget."""
    b = max(128, budget // (4 * max(n, 1)))
    b = min(b, n)
    # round up to a multiple that divides padded n nicely
    return int(b)


def _topk2(jax, jnp, neg, k, chunk=2048, kk_cap=None):
    """Exact two-stage top-k along the last axis: per-chunk top-k then
    top-k over the candidates. `lax.top_k` over very wide rows (10⁵ lanes)
    is a full sort on TPU; chunking makes it O(n) + O(candidates·log).

    kk_cap < k makes the result approximate (misses only when > kk_cap of
    the global top-k land in one chunk — vanishingly rare for kNN rows)."""
    b, n = neg.shape
    if n <= 2 * chunk:
        return jax.lax.top_k(neg, k)
    nb = -(-n // chunk)
    n_pad = nb * chunk
    negp = jnp.pad(neg, ((0, 0), (0, n_pad - n)), constant_values=-jnp.inf)
    v = negp.reshape(b, nb, chunk)
    kk = min(k if kk_cap is None else min(k, kk_cap), chunk)
    vals, idx = jax.lax.top_k(v, kk)                     # (b, nb, kk)
    gidx = idx + (jnp.arange(nb, dtype=idx.dtype) * chunk)[None, :, None]
    flat_v = vals.reshape(b, nb * kk)
    flat_i = gidx.reshape(b, nb * kk)
    v2, sel = jax.lax.top_k(flat_v, k)                   # (b, k)
    i2 = jnp.take_along_axis(flat_i, sel, axis=1)
    return v2, i2


@lru_cache(maxsize=None)
def _knn_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("k", "metric", "block", "approx"))
    def f(X, k, metric, block, approx=False):
        n, d = X.shape
        # approx: bf16 matmuls for the cross-term (4x MXU rate); norms stay
        # f32. Rank perturbations only near ties — used for the WNN
        # candidate pool, which is 10x oversampled vs the final k.
        mm_dtype = jnp.bfloat16 if approx else X.dtype
        nb = -(-n // block)
        n_pad = nb * block
        Xq = jnp.pad(X, ((0, n_pad - n), (0, 0)))

        if metric in ("cosine", "correlation"):
            Z = X - X.mean(axis=1, keepdims=True) if metric == "correlation" else X
            norms = jnp.linalg.norm(Z, axis=1, keepdims=True)
            Zn = Z / jnp.where(norms == 0, 1.0, norms)
            Zq = jnp.pad(Zn, ((0, n_pad - n), (0, 0)))

            Znm = Zn.astype(mm_dtype)

            def dist_block(i):
                q = jax.lax.dynamic_slice(Zq, (i * block, 0), (block, d))
                return 1.0 - (q.astype(mm_dtype) @ Znm.T).astype(jnp.float32)
        else:  # euclidean / sqeuclidean
            sq = jnp.sum(X * X, axis=1)

            Xm = X.astype(mm_dtype)

            def dist_block(i):
                q = jax.lax.dynamic_slice(Xq, (i * block, 0), (block, d))
                qsq = jnp.sum(q * q, axis=1)
                cross = (q.astype(mm_dtype) @ Xm.T).astype(jnp.float32)
                d2 = qsq[:, None] + sq[None, :] - 2.0 * cross
                return jnp.maximum(d2, 0.0)

        row_ids = jnp.arange(n_pad).reshape(nb, block)

        def body(carry, i):
            d2 = dist_block(i)
            # self-distance forced to -inf so self sorts first
            self_mask = (
                jnp.arange(n)[None, :] == row_ids[i][:, None]
            )
            d2 = jnp.where(self_mask, -jnp.inf, d2)
            neg = -d2
            if approx:
                # TPU-native approximate top-k (hardware partial-reduce,
                # ~3x faster than the chunked exact top-k at 1e5 lanes;
                # measured recall 0.997 at this target). The reference's
                # own neighbors are approximate too (pynndescent
                # NN-descent, muon/_core/preproc.py:26).
                vals, idx = jax.lax.approx_max_k(
                    neg, k + 1, recall_target=0.99
                )
            else:
                vals, idx = _topk2(jax, jnp, neg, k + 1)
            return carry, (-vals, idx)

        _, (dists, idx) = jax.lax.scan(body, None, jnp.arange(nb))
        dists = dists.reshape(n_pad, k + 1)[:n]
        idx = idx.reshape(n_pad, k + 1)[:n]
        dists = dists.at[:, 0].set(0.0)  # self
        if metric == "euclidean":
            dists = dists.at[:, 1:].set(jnp.sqrt(jnp.maximum(dists[:, 1:], 0.0)))
        return idx, dists

    return f


# above this row count the brute-force kernel's n² HBM traffic dominates
# and the IVF index (ops/ivf.py) takes over the approximate path
IVF_THRESHOLD = 200_000


def knn(
    X,
    k: int,
    metric: str = "euclidean",
    include_self: bool = True,
    approx: bool = False,
    method: str = "auto",
    device_out: bool = False,
):
    """Exact kNN. Returns (indices (n, k+1), dists (n, k+1)) with self in
    column 0 (pynndescent convention the reference relies on,
    muon/_core/preproc.py:531).

    approx=True selects hardware approx_max_k selection; above
    IVF_THRESHOLD rows it switches to the k-means inverted-file index
    (ops/ivf.py) whose candidate pruning removes the n² score traffic.
    method: "auto" | "brute" | "ivf" overrides the choice."""
    jax, jnp = _jax()
    from .device import dense_to_device

    X = dense_to_device(X, dtype=jnp.float32)
    n, d = X.shape
    k = min(k, n - 1)
    if method == "ivf" or (
        method == "auto" and approx and n > IVF_THRESHOLD
    ):
        from .ivf import ivf_knn

        idx, dists = ivf_knn(X, k, metric=metric, device_out=device_out)
        if include_self:
            return idx, dists
        return idx[:, 1:], dists[:, 1:]
    if metric in ("sqeuclidean",):
        m = "sqeuclidean"
    elif metric in ("cosine", "correlation"):
        m = metric
    elif metric in ("euclidean", "l2"):
        m = "euclidean"
    else:
        raise NotImplementedError(
            f"metric {metric!r} not supported by the TPU kNN kernel "
            "(euclidean/sqeuclidean/cosine/correlation available)"
        )
    block = _block_rows(n, d)
    idx, dists = _knn_fn()(X, k, m, block, approx)
    if include_self:
        return idx, dists
    return idx[:, 1:], dists[:, 1:]


def pairwise_sq_dists(Q, C):
    """Blocked squared euclidean distances (Q rows × C rows)."""
    jax, jnp = _jax()

    @jax.jit
    def f(Q, C):
        qsq = jnp.sum(Q * Q, axis=1)
        csq = jnp.sum(C * C, axis=1)
        return jnp.maximum(qsq[:, None] + csq[None, :] - 2.0 * Q @ C.T, 0.0)

    return f(jnp.asarray(Q), jnp.asarray(C))
