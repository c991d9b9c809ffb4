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

    def test_16_device_mesh_subprocess(self):
        """Pod-readiness (VERDICT r2 #9 done-criterion): the sharded MOFA
        step and the sharded pipeline execute on a 16-virtual-device mesh.
        Runs in a subprocess because this process's backend is pinned to 8
        devices by conftest."""
        import os
        import subprocess
        import sys

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        code = (
            "import jax\n"
            "jax.config.update('jax_num_cpu_devices', 16)\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "import sys; sys.path.insert(0, %r)\n"
            "from __graft_entry__ import dryrun_multichip\n"
            "dryrun_multichip(16)\n" % root
        )
        env = {**os.environ, "JAX_PLATFORMS": "cpu"}
        out = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=600,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "dryrun_multichip OK" in out.stdout, out.stdout

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

    def test_sharded_tfidf_matches_single_device(self):
        """Cells-sharded tfidf (psum'd IDF reduction, reference
        muon/_atac/preproc.py:106) returns exactly the single-device
        values once reassembled (VERDICT r2 #2)."""
        from scipy import sparse as sp
        from muon_tpu.ops.sparse import from_scipy, tfidf_data
        from muon_tpu.parallel import make_mesh, shard_rows, sharded_tfidf_data
        from muon_tpu.parallel.pipeline import sharded_col_sums

        rng = np.random.default_rng(0)
        n, d = 600, 300
        X = sp.random(
            n, d, density=0.05, random_state=np.random.RandomState(0),
            format="csr", dtype=np.float64,
        )
        X.data = np.ceil(X.data * 4)
        mesh = make_mesh(8, feat=1)
        Xs = shard_rows(X, mesh, pad_multiple=64)

        cs = np.asarray(sharded_col_sums(Xs))
        np.testing.assert_allclose(cs, np.asarray(X.sum(axis=0)).ravel(),
                                   rtol=1e-12)

        Ys = sharded_tfidf_data(Xs)
        # reassemble shard blocks into the flat CSR value order
        dX = from_scipy(X)
        ref = np.asarray(tfidf_data(dX))[: X.nnz]
        got = np.empty(X.nnz)
        R = Xs.rows_per_shard
        vals = np.asarray(Ys.data)
        for i in range(Xs.n_shards):
            lo, hi = min(i * R, n), min((i + 1) * R, n)
            s, e = X.indptr[lo], X.indptr[hi]
            got[s:e] = vals[i, : e - s]
        np.testing.assert_allclose(got, ref, rtol=1e-6)

    def test_sharded_lsi_matches_single_device(self):
        """Distributed rSVD (shard-local X·B, psum'd XᵀY and Grams) agrees
        with the single-device randomized SVD AND the exact dense SVD on a
        planted block matrix whose leading spectrum is well separated (a
        flat random spectrum makes tail factors genuinely non-identifiable
        between any two rSVD variants)."""
        from scipy import sparse as sp
        from muon_tpu.ops.linalg import randomized_svd
        from muon_tpu.ops.sparse import from_scipy, tfidf_data
        from muon_tpu.parallel import make_mesh, sharded_lsi

        rng = np.random.default_rng(1)
        n, d, k, g = 512, 200, 6, 8
        # block structure: cells in group j are enriched on feature block j
        lab = rng.integers(0, g, n)
        dense = rng.poisson(0.3, (n, d)).astype(np.float64)
        for j in range(g):
            cols = slice(j * (d // g), (j + 1) * (d // g))
            dense[lab == j, cols] += rng.poisson(
                5.0, ((lab == j).sum(), d // g)
            )
        X = sp.csr_matrix(dense)
        mesh = make_mesh(8, feat=1)
        scores, s_sh, Vt_sh = sharded_lsi(X, mesh, k=k, n_iter=10)
        scores = np.asarray(scores)

        dX = from_scipy(X)
        tf_vals = tfidf_data(dX)
        dX = dX._replace(data=tf_vals)
        U, s1, Vt1 = randomized_svd(dX, k, n_iter=10)

        # exact dense ground truth on the same tfidf values
        Xt = X.copy().astype(np.float64)
        Xt.data[:] = np.asarray(tf_vals)[: X.nnz]
        s_exact = np.linalg.svd(Xt.toarray(), compute_uv=False)[:k]

        np.testing.assert_allclose(np.asarray(s_sh), s_exact, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(s1), s_exact, rtol=1e-3)
        # factor columns match the single-device kernel up to sign
        ref = np.asarray(U) * np.asarray(s1)[None, :]
        for j in range(k):
            a, b = scores[:, j], ref[:, j]
            cos = abs(np.dot(a, b)) / (
                np.linalg.norm(a) * np.linalg.norm(b) + 1e-30
            )
            assert cos > 0.999, (j, cos)

    def test_sharded_knn_matches_single_device(self):
        """Query-sharded exact kNN returns the same neighbor sets as the
        single-device kernel (recall 1.0 on well-separated data)."""
        from muon_tpu.ops.knn import knn
        from muon_tpu.parallel import make_mesh, sharded_knn

        rng = np.random.default_rng(2)
        n, dim, k = 700, 16, 10
        Z = rng.normal(size=(n, dim)).astype(np.float32) * 3
        mesh = make_mesh(8, feat=1)
        D, I = sharded_knn(Z, mesh, k=k)
        D, I = np.asarray(D), np.asarray(I)
        i_ref, d_ref = knn(Z, k=k)
        d_ref, i_ref = np.asarray(d_ref), np.asarray(i_ref)
        assert I.shape == i_ref.shape == (n, k + 1)
        # self in column 0
        np.testing.assert_array_equal(I[:, 0], np.arange(n))
        recall = np.mean([
            len(set(I[i, 1:]) & set(i_ref[i, 1:])) / k for i in range(n)
        ])
        assert recall > 0.999, recall

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

    def test_sharded_umap(self):
        """Edge-sharded UMAP SGD (psum'd attractive updates, all_gather'd
        negative blocks) produces a quality embedding on the virtual mesh
        and is deterministic for a fixed mesh and seed."""
        from scipy.spatial.distance import cdist

        from muon_tpu.ops.fuzzy import compute_connectivities_umap
        from muon_tpu.ops.knn import knn
        from muon_tpu.parallel import make_mesh, sharded_umap_embed

        rng = np.random.default_rng(1)
        n, ncl = 1200, 5
        labels = rng.integers(0, ncl, n)
        cents = rng.normal(size=(ncl, 12)) * 4
        X = (cents[labels] + rng.normal(size=(n, 12))).astype(np.float32)
        idx, d = knn(X, k=15)
        conn = compute_connectivities_umap(
            np.asarray(idx), np.asarray(d), n, 15
        )
        mesh = make_mesh(8, feat=1)
        emb = sharded_umap_embed(conn, mesh, n_epochs=100, random_state=0)
        assert emb.shape == (n, 2) and np.isfinite(emb).all()
        D = cdist(emb, emb)
        same = labels[:, None] == labels[None, :]
        np.fill_diagonal(same, False)
        ratio = D[same].mean() / D[~same].mean()
        assert ratio < 0.4, ratio
        emb2 = sharded_umap_embed(conn, mesh, n_epochs=100, random_state=0)
        np.testing.assert_allclose(emb, emb2)

    def test_cells_sharded_guard_trips_on_replication(self):
        """VERDICT r4 #9: the placement guard used by sharded_ivf_knn /
        sharded_umap_embed must raise if an input meant to be
        cells-sharded arrives replicated — value-equality tests alone
        cannot catch accidental re-replication (every device silently
        does full-size work). Positive case: a correctly sharded put
        passes and each device holds exactly 1/P of the leading axis."""
        import jax
        import jax.numpy as jnp

        from muon_tpu.parallel import make_mesh
        from muon_tpu.parallel.pipeline import _put_cells_sharded

        mesh = make_mesh(8, feat=1)
        P = 8
        arr = jnp.zeros((P, 16, 4), jnp.float32)
        sh = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("cells", None, None)
        )
        rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())

        x = _put_cells_sharded(arr, sh, P, "guard-test")
        assert {s.data.shape for s in x.addressable_shards} == {(1, 16, 4)}

        with pytest.raises(AssertionError, match="replicated"):
            _put_cells_sharded(arr, rep, P, "guard-test")

    def test_sharded_wnn_scores_match_single_device(self):
        """Cells-sharded WNN candidate scoring + top-k returns the same
        neighbors/distances as the single-device fusion kernel (the block
        math is shared code, so this checks the sharding plumbing)."""
        import jax.numpy as jnp
        import ml_dtypes

        from muon_tpu.ops.wnn import _final_topk_fn, _fusion_all_fn
        from muon_tpu.parallel import make_mesh, sharded_wnn_scores

        rng = np.random.default_rng(0)
        n, C, k = 520, 40, 10
        M = 2
        dims = ((0, 12), (12, 20))
        cat = rng.normal(size=(n, 20)).astype(np.float32)
        cat16 = cat.astype(ml_dtypes.bfloat16)
        aux = np.zeros((n, 2 * M), np.float32)
        for m, (lo, hi) in enumerate(dims):
            aux[:, m] = (cat[:, lo:hi] ** 2).sum(1)
            aux[:, M + m] = 1.0
        sigw = np.abs(rng.normal(size=(n, 2 * M))).astype(np.float32) + 0.5
        cand = rng.integers(0, n, size=(n, C)).astype(np.int32)
        cand[rng.random((n, C)) < 0.1] = -1  # ragged padding

        mesh = make_mesh(8, feat=1)
        idx_s, dist_s = sharded_wnn_scores(
            cand, cat16, aux, sigw, dims, mesh, k=k, block=64,
        )

        scores = _fusion_all_fn()(
            jnp.asarray(cand), jnp.asarray(cat16), jnp.asarray(aux),
            jnp.asarray(sigw), 520, dims, "euclidean",
        )
        idx_r, dist_r = _final_topk_fn()(scores, jnp.asarray(cand), k)
        idx_r, dist_r = np.asarray(idx_r), np.asarray(dist_r)

        np.testing.assert_allclose(dist_s, dist_r, rtol=1e-5, atol=1e-6)
        # ids match wherever distances are not tied
        ties = np.abs(np.diff(dist_r, axis=1)) < 1e-7
        stable = np.ones_like(idx_r, bool)
        stable[:, 1:] &= ~ties
        stable[:, :-1] &= ~ties
        assert (idx_s[stable] == idx_r[stable]).mean() > 0.999

    def test_sharded_wnn_bandwidth_matches_single_device(self):
        """Cells-sharded σ bandwidth equals the single-device kernel
        (shared block math — this checks the sharding plumbing and the
        global-row-id threading). VERDICT r4 #4: bandwidth was the only
        WNN phase with no parallel/pipeline form."""
        import jax.numpy as jnp

        from muon_tpu.ops.wnn import _bandwidth_fn
        from muon_tpu.parallel import make_mesh
        from muon_tpu.parallel.pipeline import sharded_wnn_bandwidth

        rng = np.random.default_rng(1)
        n, kk, d, n_bw, block = 1000, 8, 12, 5, 64
        rep = rng.normal(size=(n, d)).astype(np.float32)
        NI = rng.integers(0, n, size=(n, kk)).astype(np.int32)
        NI[rng.random((n, kk)) < 0.05] = -1  # ragged rows

        mesh = make_mesh(8, feat=1)
        bbox = float(np.linalg.norm(np.ptp(rep, axis=0), ord=2))
        for stride in (1, 2):  # full + subsampled candidate pools
            sig_s = sharded_wnn_bandwidth(
                NI, rep, mesh, n_bw=n_bw, block=block, nn_stride=stride,
            )
            sig_r = np.asarray(
                _bandwidth_fn()(
                    jnp.asarray(NI), jnp.asarray(rep), float(n), bbox,
                    n_bw, block, stride,
                )
            )
            np.testing.assert_allclose(sig_s, sig_r, rtol=1e-5, atol=1e-6)

    def test_sharded_wnn_theta_matches_single_device(self):
        """Cells-sharded θ affinity equals the single-device kernel,
        including cross-modality row remapping on a partial overlap."""
        import jax.numpy as jnp

        from muon_tpu.ops.wnn import _theta_fn
        from muon_tpu.parallel import make_mesh
        from muon_tpu.parallel.pipeline import sharded_wnn_theta

        rng = np.random.default_rng(2)
        n1, n2, kk, d = 900, 700, 6, 10
        m = 600  # overlapping cells
        rep = rng.normal(size=(n1, d)).astype(np.float32)
        NI2 = rng.integers(0, n2, size=(n2, kk)).astype(np.int32)
        NI2[rng.random((n2, kk)) < 0.1] = -1
        rows1 = rng.choice(n1, size=m, replace=False).astype(np.int32)
        rows2 = rng.choice(n2, size=m, replace=False).astype(np.int32)
        conv = rng.integers(-1, n1, size=n2).astype(np.int32)
        nnd = np.abs(rng.normal(size=n1)).astype(np.float32) * 0.1
        sig = nnd + 0.5 + np.abs(rng.normal(size=n1)).astype(np.float32)

        mesh = make_mesh(8, feat=1)
        th_s = sharded_wnn_theta(
            rep, rows1, rows2, NI2, conv, nnd, sig, mesh, block=64,
        )

        th_r = np.asarray(
            _theta_fn()(
                jnp.asarray(rep), jnp.asarray(rows1), jnp.asarray(rows2),
                jnp.asarray(NI2), jnp.asarray(conv), jnp.asarray(nnd),
                jnp.asarray(sig),
            )
        )
        np.testing.assert_allclose(th_s, th_r, rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestPublicAPIMesh:
    """VERDICT r3 #2 done-criterion: the PUBLIC muon-compatible entry
    points (ac.pp.tfidf, ac.tl.lsi, mu.pp.neighbors, mu.tl.umap,
    mu.tl.mofa) dispatch to the sharded SPMD programs when a mesh is
    active — via kwarg or the mu.set_options(mesh=...) global — and match
    the single-device results."""

    def _counts(self, n=512, d=160, seed=0, g=8):
        """Planted block counts: a separated leading spectrum keeps the
        top factors identifiable between rSVD variants (a flat random
        spectrum genuinely is not — see
        test_sharded_lsi_matches_single_device)."""
        from scipy import sparse as sp

        rng = np.random.default_rng(seed)
        lab = rng.integers(0, g, n)
        dense = rng.poisson(0.3, (n, d)).astype(np.float64)
        for j in range(g):
            cols = slice(j * (d // g), (j + 1) * (d // g))
            dense[lab == j, cols] += rng.poisson(
                5.0, ((lab == j).sum(), d // g)
            )
        dense[:, 0] += 1.0  # no empty rows (tfidf row sums)
        return sp.csr_matrix(dense)

    def test_tfidf_lsi_mesh_kwarg(self):
        import muon_tpu as mu
        from muon_tpu import atac as ac
        from muon_tpu.parallel import make_mesh

        X = self._counts()
        mesh = make_mesh(8, feat=1)

        a1 = mu.AnnData(X.copy())
        ac.pp.tfidf(a1)
        ac.tl.lsi(a1, n_comps=6, n_iter=10)

        a2 = mu.AnnData(X.copy())
        ac.pp.tfidf(a2, mesh=mesh)
        assert getattr(a2.X, "_muon_tpu_sharded", None) is not None
        ac.tl.lsi(a2, n_comps=6, n_iter=10, mesh=mesh)

        np.testing.assert_allclose(
            np.asarray(a2.X.todense()), np.asarray(a1.X.todense()),
            rtol=1e-5, atol=1e-7,
        )
        s1, s2 = a1.obsm["X_lsi"], a2.obsm["X_lsi"]
        for j in range(6):
            cos = abs(np.dot(s1[:, j], s2[:, j])) / (
                np.linalg.norm(s1[:, j]) * np.linalg.norm(s2[:, j]) + 1e-30
            )
            assert cos > 0.999, (j, cos)
        np.testing.assert_allclose(
            a1.uns["lsi"]["stdev"], a2.uns["lsi"]["stdev"], rtol=1e-3
        )

    def test_neighbors_mesh_single_modality(self):
        import muon_tpu as mu
        from muon_tpu.parallel import make_mesh

        rng = np.random.default_rng(0)
        Xp = rng.normal(size=(400, 12)).astype(np.float32) * 3
        a1 = mu.AnnData(Xp.copy())
        a2 = mu.AnnData(Xp.copy())
        mu.pp.neighbors(a1, n_neighbors=10)
        mu.pp.neighbors(a2, n_neighbors=10, mesh=make_mesh(8, feat=1))
        d1 = a1.obsp["distances"].toarray()
        d2 = a2.obsp["distances"].toarray()
        np.testing.assert_allclose(d2, d1, rtol=1e-3, atol=1e-4)

    def test_wnn_umap_mofa_global_mesh(self):
        """The full multimodal chain through the set_options(mesh=...)
        global: per-modality neighbors → WNN → UMAP → MOFA."""
        import muon_tpu as mu
        from muon_tpu.parallel import make_mesh

        rng = np.random.default_rng(1)
        # n NOT divisible by the 8-wide cells axis: exercises the
        # public-path obs padding (mofa NaN rows, knn/wnn row pads)
        n, ncl = 485, 4
        labels = rng.integers(0, ncl, n)
        cents1 = rng.normal(size=(ncl, 10)) * 4
        cents2 = rng.normal(size=(ncl, 8)) * 4
        R1 = (cents1[labels] + rng.normal(size=(n, 10))).astype(np.float32)
        R2 = (cents2[labels] + rng.normal(size=(n, 8))).astype(np.float32)

        def build():
            m1 = mu.AnnData(R1.copy())
            m2 = mu.AnnData(R2.copy())
            md = mu.MuData({"a": m1, "b": m2})
            mu.pp.neighbors(m1, n_neighbors=12)
            mu.pp.neighbors(m2, n_neighbors=12)
            return md

        md_ref = build()
        mu.pp.neighbors(md_ref)

        mesh = make_mesh(8, feat=1)
        md_mesh = build()
        with mu.set_options(mesh=mesh):
            mu.pp.neighbors(md_mesh)
            mu.tl.umap(md_mesh, maxiter=200)
            mu.tl.mofa(md_mesh, n_factors=4, n_iterations=30)

        d_ref = md_ref.obsp["distances"]
        d_mesh = md_mesh.obsp["distances"]
        # same fused graph up to tie order: compare per-row sorted values
        v1 = np.sort(d_ref.toarray(), axis=1)[:, -5:]
        v2 = np.sort(d_mesh.toarray(), axis=1)[:, -5:]
        np.testing.assert_allclose(v2, v1, rtol=1e-3, atol=1e-4)

        emb = md_mesh.obsm["X_umap"]
        assert emb.shape == (n, 2) and np.isfinite(emb).all()
        from scipy.spatial.distance import cdist

        D = cdist(emb, emb)
        same = labels[:, None] == labels[None, :]
        np.fill_diagonal(same, False)
        assert D[same].mean() / D[~same].mean() < 0.6

        assert md_mesh.obsm["X_mofa"].shape == (n, 4)
        assert np.isfinite(md_mesh.obsm["X_mofa"]).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestShardedIVF:
    def test_sharded_ivf_recall_200k(self):
        """VERDICT r3 #4 done-criterion: sharded IVF kNN (k-means with
        psum'd Lloyd updates, work items sharded over "cells") reaches
        the single-device IVF's recall on clustered data at ≥200k rows.
        Recall is measured against exact brute force on a 256-row query
        sample (full exact kNN at 200k is O(n²))."""
        from scipy.spatial.distance import cdist

        from muon_tpu.ops.ivf import ivf_knn
        from muon_tpu.parallel import make_mesh, sharded_ivf_knn

        rng = np.random.default_rng(0)
        n, d, ncl, k = 200_000, 8, 50, 15
        cents = rng.normal(size=(ncl, d)).astype(np.float32) * 3
        lab = rng.integers(0, ncl, n)
        X = (cents[lab] + 0.4 * rng.normal(size=(n, d))).astype(np.float32)

        mesh = make_mesh(8, feat=1)
        I_sh, D_sh = sharded_ivf_knn(X, mesh, k=k, seed=0)
        I_sd, D_sd = ivf_knn(X, k=k, seed=0)
        I_sd, D_sd = np.asarray(I_sd), np.asarray(D_sd)

        assert I_sh.shape == (n, k + 1)
        np.testing.assert_array_equal(I_sh[:, 0], np.arange(n))

        sample = rng.choice(n, 256, replace=False)
        Dex = cdist(X[sample], X)
        recalls = {}
        for name, I in (("sharded", I_sh), ("single", I_sd)):
            hits = 0
            for si, row in enumerate(sample):
                truth = set(np.argsort(Dex[si])[1 : k + 1])
                hits += len(truth & set(I[row, 1:]))
            recalls[name] = hits / (len(sample) * k)
        assert recalls["sharded"] >= recalls["single"] - 0.01, recalls
        assert recalls["sharded"] > 0.9, recalls

    def test_sharded_ivf_small_n(self):
        """Tiny inputs (fewer rows than the scan block) still work — the
        dryrun chain runs at n=96."""
        from muon_tpu.parallel import make_mesh, sharded_ivf_knn

        rng = np.random.default_rng(1)
        X = rng.normal(size=(96, 6)).astype(np.float32)
        mesh = make_mesh(8, feat=1)
        I, D = sharded_ivf_knn(X, mesh, k=5)
        assert I.shape == (96, 6)
        np.testing.assert_array_equal(I[:, 0], np.arange(96))
        assert np.isfinite(D).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestRingKNN:
    def test_ring_knn_16dev_no_db_replication(self):
        """VERDICT r3 #9 done-criterion: 16-device mesh, per-device DB
        memory ≤ 2/16 of the full table. Structural proof: the DB enters
        cells-sharded (verified via addressable shards) and the compiled
        HLO moves blocks with collective-permute only — no all-gather
        materializes the full table on any device. Runs in a subprocess
        (this process's backend is pinned to 8 devices by conftest)."""
        import os
        import subprocess
        import sys

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        code = """
import jax
jax.config.update('jax_num_cpu_devices', 16)
jax.config.update('jax_platforms', 'cpu')
import sys; sys.path.insert(0, %r)
import numpy as np
import jax.numpy as jnp
from muon_tpu.parallel import make_mesh, sharded_knn
from muon_tpu.parallel.pipeline import _knn_ring_fn

n, dim, k, P = 1600, 12, 10, 16
rng = np.random.default_rng(0)
Z = rng.normal(size=(n, dim)).astype(np.float32) * 3
mesh = make_mesh(16, feat=1)

# correctness vs single-device exact kNN
from muon_tpu.ops.knn import knn
D, I = sharded_knn(Z, mesh, k=k)
i_ref, d_ref = knn(Z, k=k)
i_ref = np.asarray(i_ref)
rec = np.mean([len(set(np.asarray(I)[i,1:]) & set(i_ref[i,1:]))/k
               for i in range(n)])
assert rec > 0.999, rec

# structural memory proof: DB input is cells-sharded (one (1,R,dim)
# block per device = 1/16 of the table) ...
R = n // P
sh3 = jax.sharding.NamedSharding(
    mesh, jax.sharding.PartitionSpec('cells', None, None))
DBs = jax.device_put(jnp.asarray(Z.reshape(P, R, dim)), sh3)
shard_shapes = {s.data.shape for s in DBs.addressable_shards}
assert shard_shapes == {(1, R, dim)}, shard_shapes

# ... and the compiled program never all-gathers it: blocks move with
# collective-permute (the ring), nothing else
f = _knn_ring_fn(mesh, R, n, k, 100, P)
hlo = f.lower(DBs, DBs).compile().as_text()
assert 'collective-permute' in hlo
assert 'all-gather' not in hlo, 'DB must not be re-replicated'
print('RING_KNN_16DEV_OK')
"""
        env = {**os.environ, "JAX_PLATFORMS": "cpu"}
        out = subprocess.run(
            [sys.executable, "-c", code % root], env=env,
            capture_output=True, text=True, timeout=600,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "RING_KNN_16DEV_OK" in out.stdout, out.stdout
