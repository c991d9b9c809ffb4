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
