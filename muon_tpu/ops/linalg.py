"""Dense/sparse linear algebra on TPU: randomized truncated SVD, PCA.

Replaces the reference's ARPACK ``svds`` (muon/_atac/tools.py:53) with a
randomized subspace-iteration SVD (Halko et al. 2011) built on SpMM +
XLA QR — MXU-friendly: the sketch is a skinny dense matrix, so every
FLOP is a large matmul. Exact f32 operands (no bf16 densification) keep
factor parity with the CPU reference at the 1e-5 cosine level.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
from scipy import sparse as sp

from .sparse import DeviceCOO, from_scipy, spmm, spmm_t

__all__ = ["randomized_svd", "truncated_svd", "pca"]


@lru_cache(maxsize=1)
def _jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


def _cholqr(Y):
    """Cholesky-QR² orthonormalization: all FLOPs are (n,l)ᵀ(n,l) matmuls
    and (l,l) triangular solves — MXU-friendly, unlike Householder QR whose
    tall-skinny panel factorization serializes on TPU. The second pass
    restores orthogonality lost to f32 normal-equation conditioning."""
    import jax
    import jax.numpy as jnp

    def once(Y):
        G = Y.T @ Y
        jitter = 1e-7 * (jnp.trace(G) / Y.shape[1]) + 1e-30
        R = jnp.linalg.cholesky(G + jitter * jnp.eye(Y.shape[1], dtype=Y.dtype))
        return jax.scipy.linalg.solve_triangular(
            R, Y.T, lower=True
        ).T

    return once(once(Y))


@lru_cache(maxsize=None)
def _rsvd_coo_fn():
    jax, jnp = _jax()
    from .sparse import _spmm_fn, _chunk_count

    @partial(jax.jit, static_argnames=("k", "l", "n_iter", "seed", "symmetric"))
    def f(X, k, l, n_iter, seed, symmetric=False):
        spmm_ = _spmm_fn()
        C = _chunk_count(X.data.shape[0], l)
        # power iterations gather the dense block in bf16 (halves the HBM
        # traffic of the dominant B[col] gather); CholQR2 after every
        # product plus the f32 Rayleigh-Ritz final pass restore full f32
        # accuracy — measured identical singular values to the all-f32
        # iteration on the 100k×25k benchmark matrix
        lo = (
            jnp.bfloat16 if X.data.dtype == jnp.float32 else X.data.dtype
        )
        mv = lambda B: spmm_(X, B.astype(lo), C, False)    # noqa: E731
        # Xᵀ ≡ X for symmetric inputs (graph Laplacians): the transposed
        # product otherwise runs as an UNSORTED scatter-add when no column
        # permutation is cached — ~10× the sorted segment-sum at 40M nnz
        # (spectral init at 1M cells measured 356s, mostly here)
        if symmetric:
            rmv = mv
        else:
            rmv = lambda B: spmm_(X, B.astype(lo), C, True)  # noqa: E731
        key = jax.random.PRNGKey(seed)
        Omega = jax.random.normal(key, (X.n_cols, l), dtype=jnp.float32)
        Q = _cholqr(mv(Omega))

        def body(_, Q):
            Z = _cholqr(rmv(Q))
            return _cholqr(mv(Z))

        Q = jax.lax.fori_loop(0, n_iter, body, Q)
        if symmetric:
            B = spmm_(X, Q, C, False).T  # XᵀQ = XQ, sorted path
        else:
            B = spmm_(X, Q, C, True).T  # (l, d) — full-precision final pass
        Ub, s_, Vt = jnp.linalg.svd(B, full_matrices=False)
        U = Q @ Ub
        return U[:, :k], s_[:k], Vt[:k]

    return f


def _blocks_profitable(n: int, d: int, nnz: int, l: int) -> bool:
    """Cost-model gate for the dense-row-block XᵀX path.

    Blocks traffic per iteration ≈ 6·n·d bytes (bf16 densify write + two
    matmul reads) at ~sequential bandwidth; the gather pair moves
    ≈ 8·nnz·(l+1) bytes at random-access bandwidth (~3× slower).
    Calibrated on the 100k×25k/22M-nnz bench matrix (299 vs 677 ms,
    predicted 2×, measured 2.3×). Sparse inputs like a 1M-cell kNN graph
    (density 4e-5) must stay on the gather path — the densify would touch
    n·d cells regardless of nnz."""
    return nnz >= 2_000_000 and n * d <= 4 * nnz * (l + 1)


@lru_cache(maxsize=None)
def _rsvd_blocks_fn():
    """Randomized SVD over the dense-row-block layout (see
    ops/sparse.block_layout): subspace iteration on XᵀX where each
    iteration densifies every R-row block ONCE and runs two MXU matmuls —
    no B[col] gather at all. 2.3× faster per iteration than the
    gather spmm_t∘spmm pair on the 100k×25k bench matrix."""
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("n", "k", "l", "n_iter", "seed", "R", "d"))
    def f(flat, vals, n, k, l, n_iter, seed, R, d):
        n_blocks = flat.shape[0]
        valsh = vals.astype(jnp.bfloat16)

        def densify(vl, fl):
            return jax.ops.segment_sum(
                vl, fl, num_segments=R * d + 1, indices_are_sorted=True,
            )[: R * d].reshape(R, d)

        def ata(V):
            # bf16 densify + both matmuls share it; f32 accumulate
            Vh = V.astype(jnp.bfloat16)

            def body(acc, args):
                fl, vl = args
                dense = densify(vl, fl)
                z = jnp.dot(dense, Vh, preferred_element_type=jnp.float32)
                return acc + jnp.dot(
                    dense.T, z.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                ), None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((d, V.shape[1]), jnp.float32), (flat, valsh)
            )
            return acc

        def xv_exact(V):
            # final pass in full f32: densify is exact placement (unique
            # slots), so this equals the dense matmul bit-for-bit
            def body(_, args):
                fl, vl = args
                dense = densify(vl, fl)
                return None, jnp.dot(dense, V, preferred_element_type=jnp.float32)

            _, Y = jax.lax.scan(body, None, (flat, vals))
            return Y.reshape(n_blocks * R, V.shape[1])

        key = jax.random.PRNGKey(seed)
        V = _cholqr(jax.random.normal(key, (d, l), dtype=jnp.float32))
        V = jax.lax.fori_loop(0, n_iter, lambda _, V: _cholqr(ata(V)), V)
        Y = xv_exact(V)  # (n_blocks*R, l); rows >= n are all-zero
        # Rayleigh–Ritz via the l×l Gram (tall-skinny SVD serializes on TPU)
        G = jnp.dot(Y.T, Y, preferred_element_type=jnp.float32)
        lam, W = jnp.linalg.eigh(G)
        lam, W = lam[::-1], W[:, ::-1]
        s_ = jnp.sqrt(jnp.maximum(lam, 0.0))
        U = Y @ (W / jnp.maximum(s_, 1e-30))
        Vt = (V @ W).T
        return U[:n, :k], s_[:k], Vt[:k]

    return f


def randomized_svd(*args, **kwargs):
    from ..utils.profiling import stage

    with stage("linalg/rsvd"):
        return _randomized_svd_impl(*args, **kwargs)


def _randomized_svd_impl(
    X,
    k: int,
    n_oversample: int = 10,
    n_iter: int = 7,
    seed: int = 0,
    method: str = "auto",
    symmetric: bool = False,
):
    """Truncated SVD of a DeviceCOO / dense array via randomized subspace
    iteration. Returns (U [n,k], s [k], Vt [k,d]) in descending order.

    The whole power iteration (SpMMs + QRs + final small SVD) runs as ONE
    jit-compiled XLA program — per-op eager dispatch over a remote device
    link would otherwise dominate the wall time.

    ``method``: "auto" picks the dense-row-block XᵀX kernel (no column
    gather; see ops/sparse.block_layout) for large sparse inputs when
    ``mu.set_options(spmm_blocks=...)`` allows, the gather/segment-sum
    path otherwise; "blocks"/"gather" force a path."""
    jax, jnp = _jax()
    tag = getattr(X, "_muon_tpu_device", None)
    if tag is not None and not sp.issparse(X):
        X = tag[0]  # DeviceBackedCSR etc. — values already on device
    elif hasattr(X, "_h5") and getattr(X, "_sparse", False):
        from .sparse import from_backed

        X = from_backed(X)  # on-disk CSR: blockwise streamed ingest
    elif sp.issparse(X):
        X = from_scipy(X)

    if isinstance(X, DeviceCOO):
        n, d = X.shape
        l = min(k + n_oversample, min(n, d))
        from .device import use_spmm_blocks
        from .sparse import block_layout, pick_block_rows

        if method == "blocks" or (
            method == "auto"
            and _blocks_profitable(n, d, X.nnz, l)
            and use_spmm_blocks()
        ):
            R = pick_block_rows(n, d)
            flat, vals = block_layout(X, R)
            return _rsvd_blocks_fn()(
                flat, vals, n=n, k=int(k), l=int(l), n_iter=int(n_iter),
                seed=int(seed), R=R, d=d,
            )
        return _rsvd_coo_fn()(
            X, int(k), int(l), int(n_iter), int(seed), bool(symmetric)
        )

    X = jnp.asarray(X)
    n, d = X.shape
    mv = lambda B: X @ B            # noqa: E731
    rmv = lambda B: X.T @ B         # noqa: E731

    l = min(k + n_oversample, min(n, d))
    key = jax.random.PRNGKey(seed)
    Omega = jax.random.normal(key, (d, l), dtype=jnp.float32)

    Y = mv(Omega)
    Q, _ = jnp.linalg.qr(Y)
    for _ in range(n_iter):
        Z, _ = jnp.linalg.qr(rmv(Q))
        Q, _ = jnp.linalg.qr(mv(Z))
    B = rmv(Q).T  # (l, d)
    Ub, s_, Vt = jnp.linalg.svd(B, full_matrices=False)
    U = Q @ Ub
    return U[:, :k], s_[:k], Vt[:k]


# alias matching scipy naming
truncated_svd = randomized_svd


@lru_cache(maxsize=None)
def _pca_blocks_fn():
    """Implicitly-centered PCA over the dense-row-block layout, one jitted
    program. Centering folds analytically into the XᵀX subspace iteration:
    with μ = cs/n (cs = column sums), (X−1μᵀ)ᵀ(X−1μᵀ)V = XᵀXV − cs(csᵀV)/n
    — sparsity preserved, no gather (cf. pca() docstring for the reference
    lineage)."""
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("n", "k", "l", "n_iter", "seed", "R", "d"))
    def f(flat, vals, cs, n, k, l, n_iter, seed, R, d):
        n_blocks = flat.shape[0]
        valsh = vals.astype(jnp.bfloat16)
        mu_ = cs / n

        def densify(vl, fl):
            return jax.ops.segment_sum(
                vl, fl, num_segments=R * d + 1, indices_are_sorted=True,
            )[: R * d].reshape(R, d)

        def atca(V):
            Vh = V.astype(jnp.bfloat16)

            def body(acc, args):
                fl, vl = args
                dense = densify(vl, fl)
                z = jnp.dot(dense, Vh, preferred_element_type=jnp.float32)
                return acc + jnp.dot(
                    dense.T, z.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                ), None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((d, V.shape[1]), jnp.float32), (flat, valsh)
            )
            return acc - cs[:, None] * (cs @ V)[None, :] / n

        def xv_centered(V):
            def body(_, args):
                fl, vl = args
                dense = densify(vl, fl)
                return None, jnp.dot(dense, V, preferred_element_type=jnp.float32)

            _, Y = jax.lax.scan(body, None, (flat, vals))
            Y = Y.reshape(n_blocks * R, V.shape[1]) - (mu_ @ V)[None, :]
            # pad rows (>= n) would otherwise carry -μᵀV into the Gram
            mask = (jnp.arange(n_blocks * R) < n)[:, None]
            return jnp.where(mask, Y, 0.0)

        key = jax.random.PRNGKey(seed)
        V = _cholqr(jax.random.normal(key, (d, l), dtype=jnp.float32))
        V = jax.lax.fori_loop(0, n_iter, lambda _, V: _cholqr(atca(V)), V)
        Y = xv_centered(V)
        G = jnp.dot(Y.T, Y, preferred_element_type=jnp.float32)
        lam, W = jnp.linalg.eigh(G)
        lam, W = lam[::-1], W[:, ::-1]
        s_ = jnp.sqrt(jnp.maximum(lam, 0.0))
        U = Y @ (W / jnp.maximum(s_, 1e-30))
        Vt = (V @ W).T
        return U[:n, :k], s_[:k], Vt[:k]

    return f


@lru_cache(maxsize=None)
def _pca_dense_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("k", "l", "n_iter", "seed", "center"))
    def f(X, k, l, n_iter, seed, center):
        n, d = X.shape
        mu = X.mean(axis=0)
        Xc = X - mu if center else X
        key = jax.random.PRNGKey(seed)
        Om = jax.random.normal(key, (d, l), dtype=jnp.float32)
        Q = _cholqr(Xc @ Om)

        def body(_, Q):
            Z = _cholqr(Xc.T @ Q)
            return _cholqr(Xc @ Z)

        Q = jax.lax.fori_loop(0, n_iter, body, Q)
        B = (Xc.T @ Q).T  # (l, d)
        Ub, s_, Vt = jnp.linalg.svd(B, full_matrices=False)
        U = Q @ Ub
        total_var = jnp.sum(Xc * Xc) / (n - 1)
        return U[:, :k], s_[:k], Vt[:k], total_var

    return f


def pca(
    X,
    n_comps: int = 50,
    center: bool = True,
    seed: int = 0,
    n_iter: int = 7,
):
    """PCA via randomized SVD; supports sparse input without densifying.

    For sparse X, centering is folded into the matvec analytically
    ((X - 1 μᵀ) B = X B - 1 (μᵀ B)) so sparsity is preserved — the TPU
    analogue of sklearn's implicitly-centered sparse PCA used by the
    reference via scanpy (SURVEY §2.5 sklearn ledger row).

    Returns (components_scores [n,k], loadings [d,k], explained_variance [k],
    explained_variance_ratio [k])."""
    jax, jnp = _jax()
    was_sparse = sp.issparse(X)
    if was_sparse:
        Xd = from_scipy(X)
        n, d = Xd.shape
        mu = jnp.asarray(np.asarray(X.mean(axis=0)).ravel(), dtype=jnp.float32)
        total_var = float(
            np.asarray((X.multiply(X)).sum()) / (n - 1)
            - float(jnp.sum(mu**2)) * n / (n - 1)
        )

        from .device import use_spmm_blocks
        from .sparse import block_layout, pick_block_rows

        k = min(n_comps, min(n, d) - 1 if center else min(n, d))
        l = min(k + 10, min(n, d))
        if _blocks_profitable(n, d, Xd.nnz, l) and use_spmm_blocks():
            R = pick_block_rows(n, d)
            flat, vals = block_layout(Xd, R)
            cs = (mu * n) if center else jnp.zeros_like(mu)
            U, s_, Vt = _pca_blocks_fn()(
                flat, vals, cs, n=n, k=int(k), l=int(l),
                n_iter=int(n_iter), seed=int(seed), R=R, d=d,
            )
            ev = (s_**2) / (n - 1)
            evr = ev / total_var if total_var > 0 else ev * 0
            return U * s_[None, :], Vt.T, ev, evr

        def mv(B):
            out = spmm(Xd, B)
            if center:
                out = out - (mu @ B)[None, :]
            return out

        def rmv(B):
            out = spmm_t(Xd, B)
            if center:
                out = out - mu[:, None] * jnp.sum(B, axis=0)[None, :]
            return out

    elif isinstance(X, DeviceCOO):
        raise TypeError("pass scipy sparse or dense for pca")
    else:
        # dense input: one jitted CholQR2 power iteration (an eager
        # per-op loop with jnp.linalg.qr serializes tall-skinny QR on TPU
        # and pays tunnel dispatch latency per op — measured 104s for
        # 1M×120 protein PCA, vs seconds jitted)
        from .device import dense_to_device

        X = dense_to_device(X, dtype=jnp.float32)
        n, d = X.shape
        k = min(n_comps, min(n, d) - 1 if center else min(n, d))
        l = min(k + 10, min(n, d))
        U, s_, Vt, tv = _pca_dense_fn()(
            X, k=int(k), l=int(l), n_iter=int(n_iter), seed=int(seed),
            center=bool(center),
        )
        total_var = float(tv)
        ev = (s_**2) / (n - 1)
        evr = ev / total_var if total_var > 0 else ev * 0
        return U * s_[None, :], Vt.T, ev, evr

    k = min(n_comps, min(n, d) - 1 if center else min(n, d))
    l = min(k + 10, min(n, d))
    key = jax.random.PRNGKey(seed)
    Omega = jax.random.normal(key, (d, l), dtype=jnp.float32)
    Q, _ = jnp.linalg.qr(mv(Omega))
    for _ in range(n_iter):
        Z, _ = jnp.linalg.qr(rmv(Q))
        Q, _ = jnp.linalg.qr(mv(Z))
    B = rmv(Q).T
    Ub, s_, Vt = jnp.linalg.svd(B, full_matrices=False)
    U = Q @ Ub
    U, s_, Vt = U[:, :k], s_[:k], Vt[:k]
    ev = (s_**2) / (n - 1)
    evr = ev / total_var if total_var > 0 else ev * 0
    scores = U * s_[None, :]
    return scores, Vt.T, ev, evr
