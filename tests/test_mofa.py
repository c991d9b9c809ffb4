"""MOFA factor-recovery tests (pattern of reference tests/test_muon_tools.py:
simulate Z·Wᵀ+ε, train, assert R² recovery for exactly the true factors)."""

import numpy as np
import pandas as pd
import pytest

import muon_tpu as mu


def simulate(n=100, d1=120, d2=90, k_true=5, seed=100, noise=1.0):
    rng = np.random.default_rng(seed)
    Z = rng.normal(size=(n, k_true))
    W1 = rng.normal(size=(d1, k_true))
    W2 = rng.normal(size=(d2, k_true))
    Y1 = Z @ W1.T + noise * rng.normal(size=(n, d1))
    Y2 = Z @ W2.T + noise * rng.normal(size=(n, d2))
    return Z, Y1.astype(np.float32), Y2.astype(np.float32)


def r2(x, y):
    c = np.corrcoef(x, y)[0, 1]
    return c * c


def subspace_r2(Z_true, Z_inf, k=5):
    """R² of regressing each true factor on the first k inferred factors —
    rotation-invariant recovery measure (coordinate-ascent FA is only
    identified up to rotation on dense-weight simulations)."""
    A = np.column_stack([Z_inf[:, :k], np.ones(len(Z_inf))])
    out = []
    for t in range(Z_true.shape[1]):
        coef, *_ = np.linalg.lstsq(A, Z_true[:, t], rcond=None)
        pred = A @ coef
        out.append(
            1 - ((Z_true[:, t] - pred) ** 2).sum()
            / ((Z_true[:, t] - Z_true[:, t].mean()) ** 2).sum()
        )
    return np.asarray(out)


class TestMOFAEngine:
    def test_factor_recovery(self):
        """Reference-calibrated: exactly the first 5 (sorted) factors are
        active (R² > 0.1 on the concatenated data), the rest are not
        (reference tests/test_muon_tools.py:36-44); plus the active factors
        must span the true factor subspace."""
        from muon_tpu.models.mofa import MOFAConfig, fit_mofa

        Z, Y1, Y2 = simulate()
        res = fit_mofa(
            [Y1, Y2],
            MOFAConfig(n_factors=10, seed=1),
            n_iterations=1000,
            convergence_mode="fast",
        )
        assert res.Z.shape == (100, 10)
        y = np.concatenate([Y1, Y2], axis=1)
        W = np.concatenate(res.W, axis=0)
        r2f = []
        for i in range(10):
            yhat = np.outer(res.Z[:, i], W[:, i])
            r2f.append(1 - np.sum((y - yhat) ** 2) / np.sum(y**2))
        assert all(v > 0.1 for v in r2f[:5]), r2f
        assert not any(v > 0.1 for v in r2f[5:]), r2f
        # subspace recovery: each true factor well-explained by the 5 active
        A = res.Z[:, :5]
        A = np.column_stack([A, np.ones(len(A))])
        for t in range(5):
            coef, *_ = np.linalg.lstsq(A, Z[:, t], rcond=None)
            pred = A @ coef
            ss = 1 - ((Z[:, t] - pred) ** 2).sum() / (
                (Z[:, t] - Z[:, t].mean()) ** 2
            ).sum()
            assert ss > 0.8, f"true factor {t} subspace R2 {ss}"

    def test_inactive_factors_shrunk(self):
        from muon_tpu.models.mofa import MOFAConfig, fit_mofa

        Z, Y1, Y2 = simulate(k_true=3)
        res = fit_mofa(
            [Y1, Y2], MOFAConfig(n_factors=8, seed=1), n_iterations=300
        )
        # ARD/spike-slab must prune: ~3 active factors (1 split tolerated),
        # and the rest must be dead
        r2pf = res.r2_per_factor[0].sum(axis=0)  # (K,)
        active = (r2pf > 0.1).sum()
        assert 3 <= active <= 4, r2pf
        assert (r2pf < 0.05).sum() >= 8 - 4, r2pf

    def test_elbo_increases(self):
        from muon_tpu.models.mofa import MOFAConfig, fit_mofa

        Z, Y1, Y2 = simulate()
        res = fit_mofa(
            [Y1, Y2], MOFAConfig(n_factors=6, seed=2), n_iterations=100,
            convergence_mode="slow",
        )
        e = res.elbo_history
        assert len(e) > 3
        # monotone after burn-in
        assert np.all(np.diff(e[2:]) > -abs(e[0]) * 1e-6)

    def test_missing_data(self):
        from muon_tpu.models.mofa import MOFAConfig, fit_mofa

        Z, Y1, Y2 = simulate()
        Y1[:20, :] = np.nan  # first cells missing entire view 1
        res = fit_mofa(
            [Y1, Y2], MOFAConfig(n_factors=8, seed=1), n_iterations=300
        )
        ss = subspace_r2(Z, res.Z, k=5)
        assert (ss > 0.5).all(), ss


class TestMuTlMofa:
    def _mdata(self, seed=100):
        Z, Y1, Y2 = simulate(seed=seed)
        m1, m2 = mu.AnnData(Y1), mu.AnnData(Y2)
        m2.var_names = [f"m2var{i}" for i in range(Y2.shape[1])]
        return mu.MuData({"m1": m1, "m2": m2}), Z

    def test_mofa_mudata(self, tmp_path):
        md, Z = self._mdata()
        out = str(tmp_path / "model.hdf5")
        mu.tl.mofa(md, n_factors=10, n_iterations=200, outfile=out)
        assert md.obsm["X_mofa"].shape == (100, 10)
        assert md.varm["LFs"].shape == (md.n_vars, 10)
        assert "mofa" in md.uns
        assert "variance" in md.uns["mofa"]
        # recovery through the full path (rotation-invariant)
        ss = subspace_r2(Z, md.obsm["X_mofa"], k=5)
        assert (ss > 0.75).all(), ss

    def test_mofa_model_file(self, tmp_path):
        import h5py

        md, Z = self._mdata()
        out = str(tmp_path / "model.hdf5")
        mu.tl.mofa(md, n_factors=6, n_iterations=100, outfile=out)
        with h5py.File(out, "r") as f:
            assert f["expectations/Z/group1"].shape == (6, 100)
            assert f["expectations/W/m1"].shape == (6, 120)
            assert f["expectations/W/m2"].shape == (6, 90)
            views = [v.decode() for v in f["views/views"][:]]
            assert views == ["m1", "m2"]
            assert f["variance_explained/r2_per_factor/group1"].shape == (2, 6)

    def test_mofa_anndata(self, tmp_path):
        Z, Y1, _ = simulate()
        ad = mu.AnnData(Y1)
        mu.tl.mofa(ad, n_factors=8, n_iterations=150,
                   outfile=str(tmp_path / "m.hdf5"))
        assert ad.obsm["X_mofa"].shape == (100, 8)

    def test_mofa_groups(self, tmp_path):
        md, Z = self._mdata()
        md.obs["grp"] = pd.Categorical(["A"] * 50 + ["B"] * 50)
        mu.tl.mofa(md, groups_label="grp", n_factors=6, n_iterations=150,
                   outfile=str(tmp_path / "g.hdf5"))
        assert md.obsm["X_mofa"].shape == (100, 6)
        # variance is nested per group
        assert "A" in md.uns["mofa"]["variance"]["m1"]

    def test_mofa_ragged_raises_without_strategy(self, tmp_path):
        md, _ = self._mdata()
        m2 = md.mod["m2"][:80].copy()
        md2 = mu.MuData({"m1": md.mod["m1"], "m2": m2})
        with pytest.raises(IndexError):
            mu.tl.mofa(md2, n_factors=4, n_iterations=50)

    def test_mofa_union_obs(self, tmp_path):
        md, Z = self._mdata()
        m2 = md.mod["m2"][:80].copy()
        md2 = mu.MuData({"m1": md.mod["m1"], "m2": m2})
        mu.tl.mofa(md2, use_obs="union", n_factors=8, n_iterations=300,
                   outfile=str(tmp_path / "u.hdf5"))
        assert md2.obsm["X_mofa"].shape == (100, 8)
        ss = subspace_r2(Z, md2.obsm["X_mofa"], k=5)
        assert (ss > 0.6).all(), ss

    def test_mofa_intersection_obs(self, tmp_path):
        md, Z = self._mdata()
        m2 = md.mod["m2"][:80].copy()
        md2 = mu.MuData({"m1": md.mod["m1"], "m2": m2})
        mu.tl.mofa(md2, use_obs="intersection", n_factors=6, n_iterations=100,
                   outfile=str(tmp_path / "i.hdf5"))
        X = md2.obsm["X_mofa"]
        assert X.shape == (100, 6)
        assert np.isnan(X[80:]).all()
        assert np.isfinite(X[:80]).all()


class TestSpikeslabFactors:
    def test_sample_sparse_recovery(self):
        """spikeslab_factors=True recovers factors active only in a cell
        subset, with spike probabilities separating active/inactive cells
        (reference option surface muon/_core/tools.py:305)."""
        from muon_tpu.models.mofa import MOFAConfig, fit_mofa

        rng = np.random.default_rng(0)
        n, k_true = 300, 3
        Z = rng.normal(size=(n, k_true)).astype(np.float32)
        active = np.zeros((n, k_true), bool)
        for k in range(k_true):  # each factor active in one third of cells
            active[k * 100:(k + 1) * 100, k] = True
        Z = np.where(active, Z + 2.0, 0.0).astype(np.float32)
        W1 = rng.normal(size=(60, k_true)).astype(np.float32)
        W2 = rng.normal(size=(40, k_true)).astype(np.float32)
        Y1 = Z @ W1.T + 0.2 * rng.normal(size=(n, 60)).astype(np.float32)
        Y2 = Z @ W2.T + 0.2 * rng.normal(size=(n, 40)).astype(np.float32)

        res = fit_mofa(
            [Y1, Y2],
            MOFAConfig(n_factors=5, seed=1, spikeslab_factors=True,
                       ard_factors=True),
            n_iterations=1000,
            convergence_mode="fast",
        )
        # subspace recovery of the sparse factors
        Zi = res.Z - res.Z.mean(0)
        for k in range(k_true):
            zt = Z[:, k] - Z[:, k].mean()
            beta, *_ = np.linalg.lstsq(Zi, zt, rcond=None)
            r2 = 1 - ((zt - Zi @ beta) ** 2).sum() / (zt**2).sum()
            assert r2 > 0.95, (k, r2)
        # inferred factor values are shrunk where the truth is inactive
        for k in range(k_true):
            # best-matching inferred factor by |corr| (pruned factors are
            # constant-zero -> nan correlation -> treat as 0)
            cors = np.nan_to_num(
                [
                    abs(np.corrcoef(res.Z[:, j], Z[:, k])[0, 1])
                    for j in range(5)
                ]
            )
            j = int(np.argmax(cors))
            off = np.abs(res.Z[~active[:, k], j]).mean()
            on = np.abs(res.Z[active[:, k], j]).mean()
            assert on > 2 * off, (k, on, off)

    def test_dense_factors_unaffected(self):
        """With dense true factors, ssZ must not hurt recovery (same sim as
        TestFitMOFA.test_factor_recovery's healthy 2-view regime)."""
        from muon_tpu.models.mofa import MOFAConfig, fit_mofa

        rng = np.random.default_rng(1)
        Z = rng.normal(size=(200, 3)).astype(np.float32)
        W1 = rng.normal(size=(60, 3)).astype(np.float32)
        W2 = rng.normal(size=(40, 3)).astype(np.float32)
        Y1 = (Z @ W1.T + 0.2 * rng.normal(size=(200, 60))).astype(np.float32)
        Y2 = (Z @ W2.T + 0.2 * rng.normal(size=(200, 40))).astype(np.float32)
        res = fit_mofa(
            [Y1, Y2],
            MOFAConfig(n_factors=5, seed=1, spikeslab_factors=True),
            n_iterations=1000,
            convergence_mode="fast",
        )
        Zi = res.Z - res.Z.mean(0)
        for k in range(3):
            zt = Z[:, k] - Z[:, k].mean()
            beta, *_ = np.linalg.lstsq(Zi, zt, rcond=None)
            r2 = 1 - ((zt - Zi @ beta) ** 2).sum() / (zt**2).sum()
            assert r2 > 0.9, (k, r2)

    def test_guards(self):
        from muon_tpu.models.mofa import MOFAConfig, fit_mofa

        Y = np.random.default_rng(0).normal(size=(40, 10)).astype(np.float32)
        cfg = MOFAConfig(n_factors=2, spikeslab_factors=True)
        with pytest.raises(NotImplementedError):
            fit_mofa([Y], cfg, n_iterations=5,
                     smooth_covariate=np.linspace(0, 1, 40))

    def test_svi_sample_sparse_recovery(self):
        """spikeslab_factors composes with stochastic VI: sparse factors
        recovered from minibatch training."""
        from muon_tpu.models.mofa import MOFAConfig, fit_mofa

        rng = np.random.default_rng(0)
        n, k_true = 300, 3
        Z = rng.normal(size=(n, k_true)).astype(np.float32)
        active = np.zeros((n, k_true), bool)
        for k in range(k_true):
            active[k * 100:(k + 1) * 100, k] = True
        Z = np.where(active, Z + 2.0, 0.0).astype(np.float32)
        W1 = rng.normal(size=(60, k_true)).astype(np.float32)
        W2 = rng.normal(size=(40, k_true)).astype(np.float32)
        Y1 = Z @ W1.T + 0.2 * rng.normal(size=(n, 60)).astype(np.float32)
        Y2 = Z @ W2.T + 0.2 * rng.normal(size=(n, 40)).astype(np.float32)
        res = fit_mofa(
            [Y1, Y2],
            MOFAConfig(n_factors=5, seed=1, spikeslab_factors=True,
                       ard_factors=True),
            n_iterations=500, svi_mode=True, svi_batch_fraction=0.5,
        )
        Zi = res.Z - res.Z.mean(0)
        for k in range(k_true):
            zt = Z[:, k] - Z[:, k].mean()
            beta, *_ = np.linalg.lstsq(Zi, zt, rcond=None)
            r2 = 1 - ((zt - Zi @ beta) ** 2).sum() / (zt**2).sum()
            assert r2 > 0.9, (k, r2)
