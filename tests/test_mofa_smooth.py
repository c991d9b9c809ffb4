"""MEFISTO smooth factors: GP priors on Z over a covariate
(reference option surface muon/_core/tools.py:529-580)."""

import numpy as np
import pandas as pd
import pytest

import muon_tpu as mu
from muon_tpu.models.mofa import MOFAConfig, fit_mofa


def _sim_temporal(seed=0, n=200, d1=60, d2=40):
    """Two smooth temporal factors + noise; sorted time covariate."""
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 1, n)).astype(np.float32)
    Z = np.stack(
        [np.sin(2 * np.pi * t), np.cos(3 * np.pi * t)], axis=1
    ).astype(np.float32)
    W1 = rng.normal(size=(d1, 2)).astype(np.float32)
    W2 = rng.normal(size=(d2, 2)).astype(np.float32)
    Y1 = Z @ W1.T + 0.5 * rng.normal(size=(n, d1)).astype(np.float32)
    Y2 = Z @ W2.T + 0.5 * rng.normal(size=(n, d2)).astype(np.float32)
    return t, Z, Y1, Y2


def _r2(Z_true, Z_inf, k):
    Zi = Z_inf - Z_inf.mean(axis=0)
    out = []
    for j in range(k):
        zt = Z_true[:, j] - Z_true[:, j].mean()
        beta, *_ = np.linalg.lstsq(Zi, zt, rcond=None)
        out.append(1 - ((zt - Zi @ beta) ** 2).sum() / (zt**2).sum())
    return np.array(out)


class TestSmoothFactors:
    def test_recovery_and_smoothing(self):
        t, Z, Y1, Y2 = _sim_temporal()
        config = MOFAConfig(n_factors=4, seed=0, ard_factors=False)
        smooth = fit_mofa(
            [Y1, Y2], config, n_iterations=150, smooth_covariate=t,
            smooth_opt_every=20, smooth_start_opt=20,
        )
        plain = fit_mofa([Y1, Y2], config, n_iterations=150)
        r2_smooth = _r2(Z, smooth.Z, 2)
        r2_plain = _r2(Z, plain.Z, 2)
        assert (r2_smooth > 0.9).all(), r2_smooth
        # the GP prior must denoise: smooth factors track the truth at
        # least as well as the unsmoothed model
        assert r2_smooth.mean() >= r2_plain.mean() - 0.02, (
            r2_smooth, r2_plain,
        )
        # temporal smoothness: lag-1 roughness of the recovered factors is
        # below the plain model's (the factors were generated smooth)
        def roughness(Zx):
            Zn = (Zx - Zx.mean(0)) / (Zx.std(0) + 1e-9)
            return np.abs(np.diff(Zn[:, :2], axis=0)).mean()

        assert roughness(smooth.Z) <= roughness(plain.Z) + 1e-6

    def test_through_mu_tl(self, tmp_path):
        t, Z, Y1, Y2 = _sim_temporal(seed=1)
        n = len(t)
        obs = pd.DataFrame(
            {"time": t}, index=[f"c{i}" for i in range(n)]
        )
        md = mu.MuData(
            {
                "a": mu.AnnData(X=Y1, obs=obs.copy()),
                "b": mu.AnnData(X=Y2, obs=obs.copy()),
            }
        )
        md.update()
        mu.tl.mofa(
            md, n_factors=4, n_iterations=120, smooth_covariate="time",
            smooth_kwargs={"n_grid": 8, "opt_freq": 20, "start_opt": 20},
            outfile=str(tmp_path / "m.hdf5"),
        )
        r2s = _r2(Z, md.obsm["X_mofa"], 2)
        assert (r2s > 0.85).all(), r2s

    def test_svi_incompatible(self):
        t, Z, Y1, Y2 = _sim_temporal(seed=2, n=60, d1=10, d2=8)
        config = MOFAConfig(n_factors=2, seed=0)
        with pytest.raises(NotImplementedError):
            fit_mofa(
                [Y1, Y2], config, n_iterations=10,
                smooth_covariate=t, svi_mode=True,
            )

    def test_missing_covariate_column(self):
        rng = np.random.default_rng(0)
        obs = pd.DataFrame(index=[f"c{i}" for i in range(20)])
        md = mu.MuData(
            {"a": mu.AnnData(X=rng.normal(size=(20, 5)).astype(np.float32),
                             obs=obs.copy())}
        )
        with pytest.raises(ValueError):
            mu.tl.mofa(md, n_factors=2, smooth_covariate="nope")


class TestWarping:
    """DTW covariate warping across groups (reference option surface
    muon/_core/tools.py:317,538-541: smooth_warping + warping_* kwargs)."""

    @staticmethod
    def _sim_warped(seed=0, n_per=100, d=30):
        """Two groups sharing latent time; group 1's covariate distorted."""
        rng = np.random.default_rng(seed)
        t = np.linspace(0, 1, n_per).astype(np.float32)
        Z = np.stack(
            [np.sin(2 * np.pi * t), np.cos(2 * np.pi * t)], axis=1
        ).astype(np.float32)
        W = rng.normal(size=(d, 2)).astype(np.float32)
        Y0 = Z @ W.T + 0.1 * rng.normal(size=(n_per, d)).astype(np.float32)
        Y1 = Z @ W.T + 0.1 * rng.normal(size=(n_per, d)).astype(np.float32)
        Y = np.concatenate([Y0, Y1]).astype(np.float32)
        groups = np.repeat([0, 1], n_per)
        cov = np.concatenate([t, t**2])  # group 1 observed on distorted clock
        return t, Y, groups, cov

    def test_latent_time_recovery(self):
        t, Y, groups, cov = self._sim_warped()
        n_per = len(t)
        res = fit_mofa(
            [Y], MOFAConfig(n_factors=2, seed=1), groups=groups,
            n_iterations=200, smooth_covariate=cov,
            warping=True, warping_freq=20,
        )
        w = res.warped_covariates
        assert w is not None and w.shape == (2 * n_per,)
        # reference group's covariate is never touched
        assert np.allclose(w[:n_per], cov[:n_per], atol=1e-6)
        # the distorted group is pulled onto the shared latent clock
        err_before = ((cov[n_per:] - t) ** 2).mean()
        err_after = ((w[n_per:] - t) ** 2).mean()
        assert err_after < 0.2 * err_before, (err_before, err_after)
        # DTW paths are monotone, so warped times are non-decreasing
        assert (np.diff(w[n_per:]) >= -1e-6).all()

    def test_through_mu_tl_with_named_ref(self, tmp_path):
        t, Y, groups, cov = self._sim_warped(seed=3)
        n = len(cov)
        obs = pd.DataFrame(
            {
                "time": cov,
                "batch": np.where(groups == 0, "ref", "warped"),
            },
            index=[f"c{i}" for i in range(n)],
        )
        md = mu.MuData({"a": mu.AnnData(X=Y, obs=obs.copy())})
        md.update()
        md.obs["batch"] = obs["batch"].to_numpy()  # global obs column
        mu.tl.mofa(
            md, n_factors=2, n_iterations=150, groups_label="batch",
            smooth_covariate="time", smooth_warping=True,
            smooth_kwargs={"warping_ref": "ref", "warping_freq": 20},
            outfile=str(tmp_path / "w.hdf5"),
        )
        assert "time_warped" in md.obs.columns
        w = md.obs["time_warped"].to_numpy()
        sel_ref = (obs["batch"] == "ref").to_numpy()
        assert np.allclose(w[sel_ref], cov[sel_ref], atol=1e-6)
        err_before = ((cov[~sel_ref] - t) ** 2).mean()
        err_after = ((w[~sel_ref] - t) ** 2).mean()
        assert err_after < 0.5 * err_before, (err_before, err_after)
        import h5py

        with h5py.File(tmp_path / "w.hdf5") as f:
            assert "smooth/warped_covariates" in f

    def test_guards(self):
        rng = np.random.default_rng(0)
        Y = rng.normal(size=(40, 10)).astype(np.float32)
        cfg = MOFAConfig(n_factors=2, seed=0)
        with pytest.raises(ValueError):  # warping without smooth covariate
            fit_mofa([Y], cfg, n_iterations=5, warping=True)
        with pytest.raises(ValueError):  # warping with a single group
            fit_mofa(
                [Y], cfg, n_iterations=5,
                smooth_covariate=np.linspace(0, 1, 40), warping=True,
            )
        md = mu.MuData(
            {"a": mu.AnnData(
                X=Y,
                obs=pd.DataFrame(
                    {"time": np.linspace(0, 1, 40),
                     "batch": ["x"] * 20 + ["y"] * 20},
                    index=[f"c{i}" for i in range(40)],
                ),
            )}
        )
        with pytest.raises(ValueError):  # unknown warping_ref group name
            mu.tl.mofa(
                md, n_factors=2, n_iterations=5, groups_label="batch",
                smooth_covariate="time", smooth_warping=True,
                smooth_kwargs={"warping_ref": "nope"},
            )


class TestSparseGP:
    """Inducing-point GPs (reference option surface
    muon/_core/tools.py:542-543,578-579: sparseGP + frac_inducing)."""

    def test_recovery_matches_full(self):
        t, Z, Y1, Y2 = _sim_temporal(seed=0)
        config = MOFAConfig(n_factors=4, seed=0, ard_factors=False)
        res = fit_mofa(
            [Y1, Y2], config, n_iterations=150, smooth_covariate=t,
            sparse_gp=True, frac_inducing=0.2,
        )
        r2s = _r2(Z, res.Z, 2)
        assert (r2s > 0.9).all(), r2s

    def test_through_mu_tl(self, tmp_path):
        t, Z, Y1, Y2 = _sim_temporal(seed=4)
        n = len(t)
        obs = pd.DataFrame({"time": t}, index=[f"c{i}" for i in range(n)])
        md = mu.MuData(
            {
                "a": mu.AnnData(X=Y1, obs=obs.copy()),
                "b": mu.AnnData(X=Y2, obs=obs.copy()),
            }
        )
        md.update()
        mu.tl.mofa(
            md, n_factors=4, n_iterations=120, smooth_covariate="time",
            smooth_kwargs={"sparseGP": True, "frac_inducing": 0.25,
                           "start_opt": 20, "opt_freq": 20},
            outfile=str(tmp_path / "sg.hdf5"),
        )
        r2s = _r2(Z, md.obsm["X_mofa"], 2)
        assert (r2s > 0.85).all(), r2s

    def test_sparse_with_warping(self):
        t, Y, groups, cov = TestWarping._sim_warped(seed=1)
        n_per = len(t)
        res = fit_mofa(
            [Y], MOFAConfig(n_factors=2, seed=1), groups=groups,
            n_iterations=200, smooth_covariate=cov,
            warping=True, warping_freq=20,
            sparse_gp=True, frac_inducing=0.3,
        )
        w = res.warped_covariates
        err_before = ((cov[n_per:] - t) ** 2).mean()
        err_after = ((w[n_per:] - t) ** 2).mean()
        assert err_after < 0.3 * err_before, (err_before, err_after)

    def test_guard(self):
        Y = np.random.default_rng(0).normal(size=(30, 8)).astype(np.float32)
        with pytest.raises(ValueError):
            fit_mofa([Y], MOFAConfig(n_factors=2), n_iterations=5,
                     sparse_gp=True)


class TestModelGroups:
    """Learned group-correlation matrix Kg (mofapy2 model_groups;
    reference option surface muon/_core/tools.py:564-580)."""

    @staticmethod
    def _sim_correlated_groups(rho, seed=0, n_per=120, d1=50, d2=40):
        """Two groups sharing a time grid; group B's factor is a known
        mixture of group A's factor and an independent smooth function."""
        rng = np.random.default_rng(seed)
        t = np.linspace(0, 1, n_per).astype(np.float32)
        fA = np.sin(2 * np.pi * t)
        g = np.cos(2 * np.pi * t)  # orthogonal to fA over the full period
        fB = rho * fA + np.sqrt(max(1 - rho**2, 0.0)) * g
        z = np.concatenate([fA, fB]).astype(np.float32)[:, None]
        groups = np.repeat([0, 1], n_per)
        W1 = rng.normal(size=(d1, 1)).astype(np.float32)
        W2 = rng.normal(size=(d2, 1)).astype(np.float32)
        Y1 = z @ W1.T + 0.3 * rng.normal(size=(2 * n_per, d1)).astype(np.float32)
        Y2 = z @ W2.T + 0.3 * rng.normal(size=(2 * n_per, d2)).astype(np.float32)
        cov = np.concatenate([t, t]).astype(np.float32)
        return cov, groups, Y1, Y2

    @pytest.mark.parametrize("rho", [0.9, 0.0])
    def test_kg_recovery(self, rho):
        cov, groups, Y1, Y2 = self._sim_correlated_groups(rho)
        config = MOFAConfig(n_factors=2, seed=0, ard_factors=True)
        res = fit_mofa(
            [Y1, Y2], config, groups=groups, n_iterations=120,
            smooth_covariate=cov, smooth_opt_every=15, smooth_start_opt=15,
            model_groups=True,
        )
        assert res.gp_group_corr is not None
        assert res.gp_group_corr.shape == (2, 2, 2)
        # factor 0 carries the signal (factors sorted by variance
        # explained); its learned cross-group correlation tracks rho
        kg01 = float(res.gp_group_corr[0, 0, 1])
        assert abs(kg01 - rho) < 0.35, (kg01, rho)
        # diagonal is exactly 1 by construction
        assert np.allclose(np.diagonal(res.gp_group_corr, axis1=1, axis2=2), 1.0)

    @pytest.mark.parametrize("rho", [0.9, 0.0])
    def test_kg_recovery_sparse_gp(self, rho):
        """model_groups × sparseGP (mofapy2 combines inducing-point GPs
        with the learned Kg; reference option surface
        muon/_core/tools.py:564-580): the inducing-subset Kg objective
        recovers the planted cross-group correlation."""
        cov, groups, Y1, Y2 = self._sim_correlated_groups(rho)
        config = MOFAConfig(n_factors=2, seed=0, ard_factors=True)
        res = fit_mofa(
            [Y1, Y2], config, groups=groups, n_iterations=120,
            smooth_covariate=cov, smooth_opt_every=15, smooth_start_opt=15,
            model_groups=True, sparse_gp=True, frac_inducing=0.4,
        )
        assert res.gp_group_corr is not None
        assert res.gp_group_corr.shape == (2, 2, 2)
        kg01 = float(res.gp_group_corr[0, 0, 1])
        assert abs(kg01 - rho) < 0.35, (kg01, rho)
        assert np.allclose(
            np.diagonal(res.gp_group_corr, axis1=1, axis2=2), 1.0
        )

    def test_kg_recovery_sparse_gp_warped(self):
        """2-group warped simulation under sparseGP + model_groups: the
        warping aligns group B's shifted clock AND the learned Kg reports
        the (perfect) post-alignment cross-group correlation."""
        t, Y, groups, cov = TestWarping._sim_warped(seed=3)
        res = fit_mofa(
            [Y], MOFAConfig(n_factors=2, seed=3), groups=groups,
            n_iterations=200, smooth_covariate=cov,
            warping=True, warping_freq=20,
            sparse_gp=True, frac_inducing=0.3, model_groups=True,
        )
        n_per = len(t)
        w = res.warped_covariates
        err_before = ((cov[n_per:] - t) ** 2).mean()
        err_after = ((w[n_per:] - t) ** 2).mean()
        assert err_after < 0.3 * err_before, (err_before, err_after)
        # the two groups share one latent trajectory post-warping, so the
        # leading factor's learned cross-group correlation must be high
        kg01 = float(res.gp_group_corr[0, 0, 1])
        assert kg01 > 0.6, kg01
