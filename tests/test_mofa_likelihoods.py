"""Non-gaussian MOFA likelihoods: bernoulli (Jaakkola) + poisson (Seeger)
bound updates — factor recovery on simulated binary / count views
(reference trains these through mofapy2's equivalent bounds;
muon/_core/tools.py likelihood options at :461-466)."""

import numpy as np
import pandas as pd
import pytest

import muon_tpu as mu
from muon_tpu.models.mofa import MOFAConfig, fit_mofa


def _subspace_r2(Z_true, Z_inf, k):
    """R² of regressing each true factor on the inferred factor space."""
    Zi = Z_inf - Z_inf.mean(axis=0)
    out = []
    for j in range(k):
        zt = Z_true[:, j] - Z_true[:, j].mean()
        beta, *_ = np.linalg.lstsq(Zi, zt, rcond=None)
        pred = Zi @ beta
        out.append(1 - ((zt - pred) ** 2).sum() / (zt**2).sum())
    return np.array(out)


def _simulate(seed=0, n=300, k=3):
    # moderate logit scale: saturated probabilities destroy information
    # about factor magnitude and a factor can collapse (true of any
    # bound-based bernoulli VB, including the reference's engine)
    rng = np.random.default_rng(seed)
    Z = rng.normal(size=(n, k)).astype(np.float32)
    W_b = rng.normal(scale=1.2, size=(60, k)).astype(np.float32)
    W_p = rng.normal(scale=0.8, size=(50, k)).astype(np.float32)
    W_g = rng.normal(size=(40, k)).astype(np.float32)
    logits = Z @ W_b.T
    Y_bern = (rng.random(logits.shape) < 1 / (1 + np.exp(-logits))).astype(
        np.float32
    )
    rate = np.log1p(np.exp(np.clip(Z @ W_p.T, -10, 10)))
    Y_pois = rng.poisson(rate).astype(np.float32)
    Y_gauss = (Z @ W_g.T + 0.3 * rng.normal(size=(n, 40))).astype(np.float32)
    return Z, Y_bern, Y_pois, Y_gauss


class TestBernoulli:
    def test_factor_recovery(self):
        Z, Y_bern, _, _ = _simulate()
        config = MOFAConfig(
            n_factors=5, likelihoods=("bernoulli",), seed=0,
            ard_factors=False,
        )
        res = fit_mofa([Y_bern], config, n_iterations=300)
        r2s = _subspace_r2(Z, res.Z, 3)
        assert (r2s > 0.5).all(), f"bernoulli recovery too weak: {r2s}"

    def test_elbo_finite(self):
        _, Y_bern, _, _ = _simulate(seed=1)
        config = MOFAConfig(n_factors=4, likelihoods=("bernoulli",), seed=0)
        res = fit_mofa([Y_bern], config, n_iterations=50)
        assert np.isfinite(res.elbo_history).all()


class TestPoisson:
    def test_factor_recovery(self):
        Z, _, Y_pois, _ = _simulate()
        config = MOFAConfig(
            n_factors=5, likelihoods=("poisson",), seed=0, ard_factors=False,
        )
        res = fit_mofa([Y_pois], config, n_iterations=300)
        r2s = _subspace_r2(Z, res.Z, 3)
        assert (r2s > 0.4).all(), f"poisson recovery too weak: {r2s}"


class TestMixedViews:
    def test_gaussian_plus_bernoulli(self):
        Z, Y_bern, _, Y_gauss = _simulate(seed=2)
        config = MOFAConfig(
            n_factors=5,
            likelihoods=("gaussian", "bernoulli"),
            seed=0,
            ard_factors=False,
        )
        res = fit_mofa(
            [Y_gauss - Y_gauss.mean(axis=0), Y_bern], config, n_iterations=300
        )
        r2s = _subspace_r2(Z, res.Z, 3)
        assert (r2s > 0.7).all(), f"mixed recovery too weak: {r2s}"

    def test_masked_bernoulli(self):
        rng = np.random.default_rng(3)
        Z, Y_bern, _, _ = _simulate(seed=3)
        miss = rng.random(Y_bern.shape) < 0.2
        Yb = Y_bern.copy()
        Yb[miss] = np.nan
        config = MOFAConfig(
            n_factors=5, likelihoods=("bernoulli",), seed=0, ard_factors=False,
        )
        res = fit_mofa([Yb], config, n_iterations=300)
        r2s = _subspace_r2(Z, res.Z, 3)
        # 20% missing binary data: recovery is inherently noisier
        assert r2s.mean() > 0.5 and (r2s > 0.25).all(), (
            f"masked bernoulli too weak: {r2s}"
        )


class TestMuTlLikelihoods:
    def test_mofa_guesses_bernoulli(self, tmp_path):
        """mu.tl.mofa guesses bernoulli for binary views and trains through
        the bound (reference guess_likelihoods, muon/_core/tools.py:271-287)."""
        Z, Y_bern, _, Y_gauss = _simulate(seed=4)
        n = Z.shape[0]
        obs = pd.DataFrame(index=[f"c{i}" for i in range(n)])
        md = mu.MuData(
            {
                "rna": mu.AnnData(X=Y_gauss, obs=obs.copy()),
                "binary": mu.AnnData(X=Y_bern, obs=obs.copy()),
            }
        )
        mu.tl.mofa(
            md, n_factors=5, n_iterations=150,
            outfile=str(tmp_path / "m.hdf5"),
        )
        import h5py

        with h5py.File(tmp_path / "m.hdf5") as f:
            liks = [x.decode() for x in f["model_options/likelihoods"][:]]
        assert liks == ["gaussian", "bernoulli"]
        assert np.isfinite(md.obsm["X_mofa"]).all()
        r2s = _subspace_r2(Z, md.obsm["X_mofa"], 3)
        assert (r2s > 0.6).all()
