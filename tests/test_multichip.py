"""Multi-chip sharding: the full MOFA training step over the virtual
8-device CPU mesh (SURVEY §4 'TPU addition'; driver contract
__graft_entry__.dryrun_multichip)."""

import numpy as np
import pytest

import jax


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestMultichip:
    def test_sharded_step_matches_single_device(self):
        """The GSPMD-sharded sweep computes the same ELBO trajectory as the
        unsharded one (same program, different partitioning)."""
        import sys, os

        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        import __graft_entry__ as g
        from muon_tpu.parallel import make_mesh, shard_mofa_state

        step, state = g._toy_problem()
        step_jit = jax.jit(step)
        s1, e1 = step_jit(state)
        s1, e1b = step_jit(s1)

        mesh = make_mesh(8)
        sh_state = shard_mofa_state(g._toy_problem()[1], mesh)
        s2, e2 = step_jit(sh_state)
        s2, e2b = step_jit(s2)

        assert abs(float(e1) - float(e2)) / abs(float(e1)) < 1e-4
        assert abs(float(e1b) - float(e2b)) / abs(float(e1b)) < 1e-4
        np.testing.assert_allclose(
            np.asarray(s1["Z_mean"]), np.asarray(s2["Z_mean"]),
            rtol=1e-3, atol=1e-4,
        )

    def test_mesh_factorization(self):
        from muon_tpu.parallel import make_mesh, mesh_split

        assert mesh_split(8) == (4, 2)
        mesh = make_mesh(8)
        assert dict(mesh.shape) == {"cells": 4, "feat": 2}

    def test_mesh_split_feat_aware(self):
        """Pod-readiness (VERDICT r2 #9): the (cells, feat) factorization
        follows the workload's feature width across mesh sizes {8, 16, 32}:
        narrow views → cells-only, wide views → wider feat axis."""
        from muon_tpu.parallel import mesh_split

        for n in (8, 16, 32):
            # narrow views: feat shards would hold <128 columns each
            assert mesh_split(n, total_feat=120) == (n, 1)
            c, f = mesh_split(n, total_feat=2048)
            assert c * f == n and f >= 2
            c8, f8 = mesh_split(n, total_feat=40_000)
            assert c8 * f8 == n
            if n >= 16:
                assert f8 == 8  # wide views amortize an 8-way feat axis
        # tiny meshes never split the feat axis
        assert mesh_split(2, total_feat=40_000) == (2, 1)
        # unknown width keeps the historical default
        assert mesh_split(16) == (8, 2)

    def test_fit_mofa_with_mesh(self):
        """End-to-end sharded training through fit_mofa(mesh=...)."""
        from muon_tpu.models.mofa import MOFAConfig, fit_mofa
        from muon_tpu.parallel import make_mesh

        rng = np.random.default_rng(0)
        n, k = 96, 3
        Z = rng.normal(size=(n, k)).astype(np.float32)
        Y1 = (Z @ rng.normal(size=(40, k)).T + 0.1 * rng.normal(size=(n, 40))).astype(np.float32)
        Y2 = (Z @ rng.normal(size=(32, k)).T + 0.1 * rng.normal(size=(n, 32))).astype(np.float32)
        config = MOFAConfig(n_factors=4, seed=0, ard_factors=False)
        res = fit_mofa([Y1, Y2], config, n_iterations=80, mesh=make_mesh(8))
        plain = fit_mofa([Y1, Y2], config, n_iterations=80)
        # sharded training is the same program under a different
        # partitioning — results match up to reduction-order noise
        np.testing.assert_allclose(res.Z, plain.Z, rtol=1e-2, atol=1e-3)
        r2p, r2m = [], []
        for Zx, acc in ((plain.Z, r2p), (res.Z, r2m)):
            Zi = Zx - Zx.mean(0)
            for j in range(k):
                zt = Z[:, j] - Z[:, j].mean()
                beta, *_ = np.linalg.lstsq(Zi, zt, rcond=None)
                acc.append(1 - ((zt - Zi @ beta) ** 2).sum() / (zt**2).sum())
        np.testing.assert_allclose(r2m, r2p, atol=0.02)

    def test_svi_with_mesh(self):
        """Stochastic VI over a sharded state: batches gather across the
        cells axis, global parameters blend replicated (the reference's
        SVI surface muon/_core/tools.py:520-527, scaled out)."""
        from muon_tpu.models.mofa import MOFAConfig, fit_mofa
        from muon_tpu.parallel import make_mesh

        rng = np.random.default_rng(1)
        n, k = 128, 3
        Z = rng.normal(size=(n, k)).astype(np.float32)
        Y = (Z @ rng.normal(size=(48, k)).T
             + 0.1 * rng.normal(size=(n, 48))).astype(np.float32)
        config = MOFAConfig(n_factors=4, seed=0, ard_factors=False)
        res = fit_mofa(
            [Y], config, n_iterations=120, svi_mode=True,
            svi_batch_fraction=0.5, mesh=make_mesh(8),
        )
        Zi = res.Z - res.Z.mean(0)
        for j in range(k):
            zt = Z[:, j] - Z[:, j].mean()
            beta, *_ = np.linalg.lstsq(Zi, zt, rcond=None)
            r2 = 1 - ((zt - Zi @ beta) ** 2).sum() / (zt**2).sum()
            assert r2 > 0.8, (j, r2)

    def test_sparse_gp_with_mesh(self):
        """Sparse-GP smooth factors under GSPMD: the (N, M) cross-kernel
        partitions over cells, inducing-point algebra replicates."""
        from muon_tpu.models.mofa import MOFAConfig, fit_mofa
        from muon_tpu.parallel import make_mesh

        rng = np.random.default_rng(2)
        n = 160
        t = np.sort(rng.uniform(0, 1, n)).astype(np.float32)
        Z = np.stack([np.sin(2 * np.pi * t)], 1).astype(np.float32)
        Y = (Z @ rng.normal(size=(40, 1)).T
             + 0.3 * rng.normal(size=(n, 40))).astype(np.float32)
        res = fit_mofa(
            [Y], MOFAConfig(n_factors=2, seed=0, ard_factors=False),
            n_iterations=80, smooth_covariate=t,
            sparse_gp=True, frac_inducing=0.2, mesh=make_mesh(8),
        )
        Zi = res.Z - res.Z.mean(0)
        zt = Z[:, 0] - Z[:, 0].mean()
        beta, *_ = np.linalg.lstsq(Zi, zt, rcond=None)
        r2 = 1 - ((zt - Zi @ beta) ** 2).sum() / (zt**2).sum()
        assert r2 > 0.9, r2

    def test_spikeslab_factors_with_mesh(self):
        from muon_tpu.models.mofa import MOFAConfig, fit_mofa
        from muon_tpu.parallel import make_mesh

        rng = np.random.default_rng(3)
        n, k = 120, 2
        Z = rng.normal(size=(n, k)).astype(np.float32)
        Y1 = (Z @ rng.normal(size=(40, k)).T
              + 0.1 * rng.normal(size=(n, 40))).astype(np.float32)
        Y2 = (Z @ rng.normal(size=(30, k)).T
              + 0.1 * rng.normal(size=(n, 30))).astype(np.float32)
        cfg = MOFAConfig(n_factors=3, seed=1, spikeslab_factors=True)
        res = fit_mofa([Y1, Y2], cfg, n_iterations=150,
                       mesh=make_mesh(8))
        plain = fit_mofa([Y1, Y2], cfg, n_iterations=150)
        # sharded ssz training is the same program under a different
        # partitioning — factors match up to reduction-order noise
        np.testing.assert_allclose(res.Z, plain.Z, rtol=1e-2, atol=1e-3)
