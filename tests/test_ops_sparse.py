"""Device sparse ops: COO kernels vs scipy ground truth."""

import numpy as np
import pytest
from scipy import sparse as sp

from muon_tpu.ops import sparse as dsp
from muon_tpu.ops.linalg import randomized_svd, pca


@pytest.fixture()
def X():
    rng = np.random.default_rng(0)
    return sp.random(73, 41, density=0.15, random_state=3, format="csr").astype(
        np.float32
    )


class TestCOO:
    def test_roundtrip_sums(self, X):
        d = dsp.from_scipy(X)
        assert np.allclose(np.asarray(dsp.row_sums(d)), X.sum(axis=1).A1 if hasattr(X.sum(axis=1), "A1") else np.asarray(X.sum(axis=1)).ravel(), atol=1e-5)
        assert np.allclose(np.asarray(dsp.col_sums(d)), np.asarray(X.sum(axis=0)).ravel(), atol=1e-5)

    def test_spmm(self, X):
        d = dsp.from_scipy(X)
        rng = np.random.default_rng(1)
        B = rng.normal(size=(41, 7)).astype(np.float32)
        out = np.asarray(dsp.spmm(d, B))
        assert np.allclose(out, X @ B, atol=1e-4)

    def test_spmm_t(self, X):
        d = dsp.from_scipy(X)
        rng = np.random.default_rng(2)
        B = rng.normal(size=(73, 5)).astype(np.float32)
        out = np.asarray(dsp.spmm_t(d, B))
        assert np.allclose(out, X.T @ B, atol=1e-4)

    def test_scale_rows(self, X):
        d = dsp.from_scipy(X)
        s = np.arange(73, dtype=np.float32)
        new = np.asarray(dsp.scale_rows_data(d, s))
        ref = sp.dia_matrix((s, 0), shape=(73, 73)) @ X
        assert np.allclose(dsp.to_scipy_data(X, new).toarray(), ref.toarray(), atol=1e-5)

    def test_binarize(self, X):
        d = dsp.from_scipy(X)
        b = np.asarray(dsp.binarize_data(d))
        assert set(np.unique(b[: X.nnz])) <= {0.0, 1.0}


class TestSVD:
    def test_randomized_svd_vs_dense(self, X):
        dense = X.toarray()
        U, s, Vt = randomized_svd(X, k=10, n_iter=10, seed=0)
        _, s_ref, _ = np.linalg.svd(dense, full_matrices=False)
        assert np.allclose(np.asarray(s), s_ref[:10], rtol=1e-3)
        # reconstruction of the dominant subspace
        approx = np.asarray(U) * np.asarray(s) @ np.asarray(Vt)
        full10 = (
            np.linalg.svd(dense, full_matrices=False)[0][:, :10]
            * s_ref[:10]
        ) @ np.linalg.svd(dense, full_matrices=False)[2][:10]
        assert np.allclose(approx, full10, atol=5e-3)

    def test_singular_vector_cosine(self):
        # structured low-rank + noise: spectral gaps exist, so individual
        # singular vectors are well-conditioned and must match ARPACK-style
        # dense SVD to high precision (BASELINE.md parity row)
        rng = np.random.default_rng(7)
        Z = rng.normal(size=(73, 5)) * np.array([10.0, 8.0, 6.0, 4.0, 2.0])
        W = rng.normal(size=(5, 41))
        dense = (Z @ W + 0.01 * rng.normal(size=(73, 41))).astype(np.float32)
        Xs = sp.csr_matrix(dense)
        U, s, Vt = randomized_svd(Xs, k=5, n_iter=12, seed=0)
        Ur, sr, Vtr = np.linalg.svd(dense.astype(np.float64), full_matrices=False)
        for i in range(5):
            c = abs(np.dot(np.asarray(U)[:, i], Ur[:, i]))
            assert c > 1 - 1e-5, f"component {i}: cosine {c}"

    def test_blocks_method_matches_gather(self, X):
        # dense-row-block XᵀX kernel (ops/sparse.block_layout) must agree
        # with the gather path and with dense SVD on singular values
        dense = X.toarray()
        U, s, Vt = randomized_svd(X, k=8, n_iter=10, seed=0, method="blocks")
        _, s_ref, _ = np.linalg.svd(dense, full_matrices=False)
        assert np.allclose(np.asarray(s), s_ref[:8], rtol=1e-3)
        # subspace agreement with the gather path (per-vector cosine up to sign)
        Ug, sg, Vtg = randomized_svd(X, k=8, n_iter=10, seed=0, method="gather")
        for i in range(8):
            c = abs(np.dot(np.asarray(U)[:, i], np.asarray(Ug)[:, i]))
            assert c > 0.99, f"component {i}: cosine {c}"
        # reconstruction quality
        approx = np.asarray(U) * np.asarray(s) @ np.asarray(Vt)
        Ur, sr, Vtr = np.linalg.svd(dense, full_matrices=False)
        ref = (Ur[:, :8] * sr[:8]) @ Vtr[:8]
        assert np.allclose(approx, ref, atol=5e-3)

    def test_block_layout_roundtrip(self):
        # the device-built block layout densifies back to the original
        import muon_tpu.ops.sparse as dsp_

        rng = np.random.default_rng(3)
        Xs = sp.random(100, 37, density=0.15, random_state=5, format="csr")
        Xs.data = rng.random(Xs.nnz).astype(np.float32)
        dX = dsp_.from_scipy(Xs)
        R = dsp_.pick_block_rows(100, 37)
        flat, vals = dsp_.block_layout(dX, R)
        import jax.numpy as jnp
        import jax

        n_blocks, _ = flat.shape
        out = np.zeros((n_blocks * R, 37), np.float32)
        for b in range(n_blocks):
            densify = jax.ops.segment_sum(
                vals[b], flat[b], num_segments=R * 37 + 1,
                indices_are_sorted=True,
            )[: R * 37].reshape(R, 37)
            out[b * R : (b + 1) * R] = np.asarray(densify)
        assert np.allclose(out[:100], Xs.toarray(), atol=1e-6)
        assert np.abs(out[100:]).max() == 0.0

    def test_pca_blocks_path_matches_dense(self):
        # above the 2M-nnz auto gate -> exercises _pca_blocks_fn
        rng = np.random.default_rng(11)
        n, d, k = 45_000, 100, 5
        Z = rng.normal(size=(n, k)) * np.array([12.0, 9.0, 7.0, 5.0, 3.0])
        W = rng.normal(size=(k, d))
        dense = np.maximum(Z @ W + rng.normal(size=(n, d)), 0.0)
        Xs = sp.csr_matrix(dense.astype(np.float32))
        assert Xs.nnz >= 2_000_000, Xs.nnz
        scores, loadings, ev, evr = pca(Xs, n_comps=k, n_iter=8)
        Xc = dense - dense.mean(axis=0)
        Ur, sr, Vtr = np.linalg.svd(Xc, full_matrices=False)
        ref_scores = Ur[:, :k] * sr[:k]
        for i in range(k):
            c = abs(
                np.dot(np.asarray(scores)[:, i], ref_scores[:, i])
                / (np.linalg.norm(scores[:, i]) * np.linalg.norm(ref_scores[:, i]))
            )
            assert c > 0.999, (i, c)
        assert np.allclose(ev, (sr[:k] ** 2) / (n - 1), rtol=1e-3)

    def test_pca_sparse_matches_dense(self, X):
        scores, loadings, ev, evr = pca(X, n_comps=5, n_iter=10)
        # dense reference PCA
        dense = X.toarray().astype(np.float64)
        Xc = dense - dense.mean(axis=0)
        Ur, sr, Vtr = np.linalg.svd(Xc, full_matrices=False)
        ref_scores = Ur[:, :5] * sr[:5]
        for i in range(5):
            c = abs(
                np.dot(np.asarray(scores)[:, i], ref_scores[:, i])
                / (
                    np.linalg.norm(np.asarray(scores)[:, i])
                    * np.linalg.norm(ref_scores[:, i])
                )
            )
            assert c > 1 - 1e-4
        ref_ev = sr[:5] ** 2 / (X.shape[0] - 1)
        assert np.allclose(np.asarray(ev), ref_ev, rtol=1e-3)


class TestLSI:
    def test_lsi_outputs(self):
        import muon_tpu as mu
        from muon_tpu import atac as ac

        np.random.seed(11)
        X = sp.random(60, 40, density=0.3, format="csr").astype(np.float32)
        ad = mu.AnnData(X)
        ac.pp.tfidf(ad)
        ac.tl.lsi(ad, n_comps=10)
        assert ad.obsm["X_lsi"].shape == (60, 10)
        assert ad.varm["LSI"].shape == (40, 10)
        assert ad.uns["lsi"]["stdev"].shape == (10,)
        # z-scored embeddings
        assert np.allclose(ad.obsm["X_lsi"].mean(axis=0), 0, atol=1e-4)
        assert np.allclose(ad.obsm["X_lsi"].std(axis=0), 1, atol=1e-3)

    def test_lsi_matches_arpack(self):
        """Factor parity vs scipy svds on planted-cluster scATAC-like data
        (BASELINE.md numeric-parity row). Clustered data has real spectral
        gaps, so individual components must match."""
        import muon_tpu as mu
        from muon_tpu import atac as ac
        from scipy.sparse.linalg import svds

        rng = np.random.default_rng(5)
        n, d, g = 90, 60, 5
        dense = rng.poisson(0.2, size=(n, d)).astype(np.float64)
        for i in range(g):  # planted peak blocks per cell group
            dense[i * (n // g):(i + 1) * (n // g), i * (d // g):(i + 1) * (d // g)] += \
                rng.poisson(3.0, size=(n // g, d // g))
        X = sp.csr_matrix(dense)
        ad = mu.AnnData(sp.csr_matrix(dense.astype(np.float32)))
        ac.pp.tfidf(ad)
        ac.tl.lsi(ad, n_comps=5, scale_embeddings=True, n_iter=12)
        # reference path: scipy TF-IDF + ARPACK svds in float64
        tf = np.log1p(np.nan_to_num(dense / dense.sum(1, keepdims=True)) * 1e4)
        idf = np.log1p(n / dense.sum(0, keepdims=True))
        Xt = sp.csr_matrix(tf * idf)
        u, s_, vt = svds(Xt, k=5)
        u, s_ = u[:, ::-1], s_[::-1]
        ref = (u - u.mean(axis=0)) / u.std(axis=0)
        for i in range(5):
            c = abs(
                np.dot(ad.obsm["X_lsi"][:, i], ref[:, i])
                / (np.linalg.norm(ad.obsm["X_lsi"][:, i]) * np.linalg.norm(ref[:, i]))
            )
            assert c > 1 - 1e-5, f"comp {i} cosine {c}"
        assert np.allclose(ad.uns["lsi"]["stdev"], s_ / np.sqrt(n - 1), rtol=1e-3)


class TestCanonicalization:
    def test_unsorted_csr_from_scipy(self):
        """A legal scipy CSR with unsorted within-row indices must produce
        correct products (ADVICE r2: the dense-row-block densify assumes
        sorted indices; from_scipy canonicalizes)."""
        rng = np.random.default_rng(3)
        n, d = 50, 40
        dense = ((rng.random((n, d)) < 0.25) * rng.integers(1, 6, (n, d))).astype(
            np.float32
        )
        X = sp.csr_matrix(dense)
        indptr, idxs, vals = X.indptr.copy(), X.indices.copy(), X.data.copy()
        for r in range(n):
            s, e = indptr[r], indptr[r + 1]
            p = rng.permutation(e - s)
            idxs[s:e], vals[s:e] = idxs[s:e][p], vals[s:e][p]
        Xu = sp.csr_matrix((vals, idxs, indptr), shape=(n, d))
        assert not Xu.has_sorted_indices
        D = dsp.from_scipy(Xu)
        import jax.numpy as jnp

        B = rng.standard_normal((d, 7)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(dsp.spmm(D, jnp.asarray(B))), dense @ B, atol=1e-3
        )
        # the blocks path (densify) is the one that actually assumed order
        scores, *_ = pca(Xu, n_comps=5)
        scores_ref, *_ = pca(sp.csr_matrix(dense), n_comps=5)
        np.testing.assert_allclose(
            np.abs(np.asarray(scores)), np.abs(np.asarray(scores_ref)),
            rtol=1e-2, atol=1e-2,
        )


class TestIvfEdgeCases:
    def test_tiny_n(self):
        """n < 16 used to crash in rng.choice (ADVICE r2)."""
        from muon_tpu.ops.ivf import ivf_knn

        rng = np.random.default_rng(0)
        idx, dd = ivf_knn(rng.standard_normal((10, 4)).astype(np.float32), k=3)
        assert idx.shape == (10, 4)
        assert (idx[:, 0] == np.arange(10)).all()  # self in col 0
        assert (dd[:, 0] == 0).all()

    def test_skewed_cluster_keeps_self(self):
        """A dominant cluster whose chunk list is truncated by P_max must
        still probe each query's own chunk (self-in-col-0 contract)."""
        from muon_tpu.ops.ivf import ivf_knn

        rng = np.random.default_rng(1)
        n = 4000
        X = rng.standard_normal((n, 8)).astype(np.float32) * 0.01
        X[: n // 20] += 50.0  # a few tiny distant clusters
        idx, dd = ivf_knn(X, k=5, n_clusters=16, n_probe=2)
        assert (idx[:, 0] == np.arange(n)).all()
        assert (dd[:, 0] == 0).all()
