"""Stochastic VI and checkpoint/resume for the MOFA engine.

SVI: minibatch natural-gradient-style updates over the cells axis — the
scaling mode for >RAM cell counts (reference option surface:
muon/_core/tools.py:520-527; BASELINE config '1M cells stochastic-VI').
Checkpoint: full VB-state round-trip (SURVEY §5)."""

import numpy as np
import pandas as pd
import pytest

import muon_tpu as mu
from muon_tpu.models.mofa import MOFAConfig, fit_mofa
from muon_tpu.models.checkpoint import save_state, load_state


def _sim(seed=0, n=400, d1=80, d2=60, k=4):
    rng = np.random.default_rng(seed)
    Z = rng.normal(size=(n, k)).astype(np.float32)
    W1 = rng.normal(size=(d1, k)).astype(np.float32)
    W2 = rng.normal(size=(d2, k)).astype(np.float32)
    Y1 = Z @ W1.T + 0.2 * rng.normal(size=(n, d1)).astype(np.float32)
    Y2 = Z @ W2.T + 0.2 * rng.normal(size=(n, d2)).astype(np.float32)
    return Z, Y1, Y2


def _subspace_r2(Z_true, Z_inf, k):
    Zi = Z_inf - Z_inf.mean(axis=0)
    out = []
    for j in range(k):
        zt = Z_true[:, j] - Z_true[:, j].mean()
        beta, *_ = np.linalg.lstsq(Zi, zt, rcond=None)
        out.append(1 - ((zt - Zi @ beta) ** 2).sum() / (zt**2).sum())
    return np.array(out)


class TestSVI:
    def test_factor_recovery(self):
        Z, Y1, Y2 = _sim()
        config = MOFAConfig(n_factors=6, seed=0, ard_factors=False)
        res = fit_mofa(
            [Y1, Y2], config, n_iterations=150,
            svi_mode=True, svi_batch_fraction=0.25,
            svi_learning_rate=1.0, svi_forgetting_rate=0.6,
        )
        r2s = _subspace_r2(Z, res.Z, 4)
        assert (r2s > 0.85).all(), f"SVI recovery too weak: {r2s}"

    def test_svi_close_to_full_batch(self):
        Z, Y1, Y2 = _sim(seed=1)
        config = MOFAConfig(n_factors=6, seed=0, ard_factors=False)
        full = fit_mofa([Y1, Y2], config, n_iterations=150)
        svi = fit_mofa(
            [Y1, Y2], config, n_iterations=200,
            svi_mode=True, svi_batch_fraction=0.5,
        )
        r_full = _subspace_r2(Z, full.Z, 4)
        r_svi = _subspace_r2(Z, svi.Z, 4)
        assert (r_svi > r_full - 0.1).all(), (r_full, r_svi)

    def test_through_mu_tl(self, tmp_path):
        Z, Y1, Y2 = _sim(seed=2)
        n = Z.shape[0]
        obs = pd.DataFrame(index=[f"c{i}" for i in range(n)])
        md = mu.MuData(
            {
                "a": mu.AnnData(X=Y1, obs=obs.copy()),
                "b": mu.AnnData(X=Y2, obs=obs.copy()),
            }
        )
        mu.tl.mofa(
            md, n_factors=6, n_iterations=120, svi_mode=True,
            svi_batch_size=0.25, outfile=str(tmp_path / "m.hdf5"),
        )
        r2s = _subspace_r2(Z, md.obsm["X_mofa"], 4)
        assert (r2s > 0.8).all()


class TestCheckpoint:
    def test_state_roundtrip(self):
        from muon_tpu.models.mofa import _init_state

        _, Y1, Y2 = _sim(seed=3, n=50, d1=20, d2=15)
        config = MOFAConfig(n_factors=3, seed=0)
        masks = [None, (np.random.default_rng(0).random(Y2.shape) > 0.1).astype(np.float32)]
        onehot = np.ones((50, 1), np.float32)
        state = _init_state([Y1, Y2], masks, onehot, config)
        import tempfile, os

        path = os.path.join(tempfile.mkdtemp(), "ck.npz")
        save_state(path, state, [1.0, 2.0], 7)
        state2, elbos, it = load_state(path)
        assert it == 7
        np.testing.assert_array_equal(elbos, [1.0, 2.0])
        assert set(state2.keys()) == set(state.keys())
        np.testing.assert_allclose(
            np.asarray(state2["Z_mean"]), np.asarray(state["Z_mean"])
        )
        assert state2["mask"][0] is None
        np.testing.assert_allclose(
            np.asarray(state2["mask"][1]), np.asarray(state["mask"][1])
        )

    def test_resume_continues_training(self, tmp_path):
        Z, Y1, Y2 = _sim(seed=4)
        config = MOFAConfig(n_factors=6, seed=0, ard_factors=False)
        ck = str(tmp_path / "ck.npz")
        # phase 1: 20 iterations, checkpoint at the end
        fit_mofa(
            [Y1, Y2], config, n_iterations=20, elbo_every=5,
            checkpoint_path=ck, checkpoint_every=20,
        )
        # phase 2: resume and run to 100
        res = fit_mofa([Y1, Y2], config, n_iterations=100, resume_from=ck)
        assert res.n_iterations <= 100
        # the contract: a resumed run is indistinguishable from an
        # uninterrupted one (the checkpoint carries the FULL VB state)
        full = fit_mofa([Y1, Y2], config, n_iterations=100)
        np.testing.assert_allclose(res.Z, full.Z, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(res.W[0], full.W[0], rtol=1e-4, atol=1e-5)
