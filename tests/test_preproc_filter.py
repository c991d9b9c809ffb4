"""In-place filtering / intersect / sample tests
(contract: reference tests/test_muon_preproc.py:24-233)."""

import numpy as np
import pandas as pd
import pytest
from scipy import sparse as sp

import muon_tpu as mu
from tests.conftest import make_adata


@pytest.fixture()
def adata():
    # arange X so values identify (obs, var) positions like the reference fixture
    ad = make_adata(50, 20, seed=0)
    ad.X = np.arange(1000, dtype=np.float64).reshape(50, 20)
    return ad


class TestFilterAnnData:
    def test_filter_obs_bool_mask(self, adata):
        rng = np.random.default_rng(42)
        mask = rng.random(50) > 0.5
        orig = adata.X.copy()
        mu.pp.filter_obs(adata, mask)
        assert adata.n_obs == mask.sum()
        assert np.array_equal(adata.X, orig[mask])

    def test_filter_obs_column(self, adata):
        adata.obs["keep"] = np.arange(50) % 2 == 0
        mu.pp.filter_obs(adata, "keep")
        assert adata.n_obs == 25

    def test_filter_obs_func(self, adata):
        adata.obs["val"] = np.arange(50.0)
        mu.pp.filter_obs(adata, "val", lambda x: x < 10)
        assert adata.n_obs == 10

    def test_filter_obs_nonbool_requires_func(self, adata):
        adata.obs["val"] = np.arange(50.0)
        with pytest.raises(ValueError):
            mu.pp.filter_obs(adata, "val")

    def test_filter_obs_names(self, adata):
        mu.pp.filter_obs(adata, ["obs1", "obs5", "obs7"])
        assert list(adata.obs_names) == ["obs1", "obs5", "obs7"]

    def test_filter_obs_by_var_values(self, adata):
        # filter obs by the expression of one var (reference preproc.py:735-741)
        mu.pp.filter_obs(adata, "var0", lambda x: x > 500)
        assert np.all(np.asarray(adata.X)[:, 0] > 500)

    def test_filter_var(self, adata):
        rng = np.random.default_rng(1)
        mask = rng.random(20) > 0.5
        orig = adata.X.copy()
        mu.pp.filter_var(adata, mask)
        assert adata.n_vars == mask.sum()
        assert np.array_equal(adata.X, orig[:, mask])

    def test_consecutive_filters(self, adata):
        orig = adata.X.copy()
        mu.pp.filter_obs(adata, np.arange(50) < 30)
        mu.pp.filter_obs(adata, np.arange(30) >= 10)
        assert adata.n_obs == 20
        assert np.array_equal(adata.X, orig[10:30])

    def test_filter_propagates_sideworld(self, adata):
        adata.obsm["X_pca"] = np.arange(100).reshape(50, 2)
        adata.obsp["d"] = np.arange(2500).reshape(50, 50)
        adata.layers["l"] = adata.X * 2
        adata.raw = adata
        mask = np.arange(50) < 5
        mu.pp.filter_obs(adata, mask)
        assert adata.obsm["X_pca"].shape == (5, 2)
        assert adata.obsp["d"].shape == (5, 5)
        assert adata.layers["l"].shape == (5, 20)
        assert adata.raw.X.shape == (5, 20)

    def test_view_raises(self, adata):
        v = adata[0:10]
        with pytest.raises(ValueError):
            mu.pp.filter_obs(v, np.ones(10, dtype=bool))

    def test_backed_warns(self, adata, tmp_path):
        path = str(tmp_path / "t.h5ad")
        adata.X = sp.csr_matrix(adata.X)
        adata.write(path)
        ad = mu.read_h5ad(path, backed="r")
        assert ad.isbacked
        with pytest.warns(UserWarning):
            mu.pp.filter_obs(ad, np.arange(50) < 10)
        assert ad.n_obs == 10
        assert not ad.isbacked

    def test_filter_sparse(self):
        ad = make_adata(30, 10, sparse=True)
        dense = np.asarray(ad.X.todense())
        mask = np.arange(30) % 3 == 0
        mu.pp.filter_obs(ad, mask)
        assert np.allclose(np.asarray(ad.X.todense()), dense[mask])


class TestFilterMuData:
    def test_filter_obs_mudata(self, mdata):
        mask = np.arange(50) < 20
        mu.pp.filter_obs(mdata, mask)
        assert mdata.n_obs == 20
        assert mdata.mod["mod1"].n_obs == 20
        assert mdata.mod["mod2"].n_obs == 20
        assert np.all(mdata.obsmap["mod1"] == np.arange(1, 21))

    def test_filter_obs_ragged(self):
        m1 = make_adata(10, 4)
        m2 = make_adata(6, 3)
        md = mu.MuData({"m1": m1, "m2": m2})
        x1 = np.asarray(m1.X).copy()
        mask = np.zeros(10, dtype=bool)
        mask[[0, 4, 7, 8]] = True
        mu.pp.filter_obs(md, mask)
        assert md.n_obs == 4
        assert md.mod["m1"].n_obs == 4
        assert md.mod["m2"].n_obs == 2  # obs0, obs4
        # masks reflect raggedness
        assert md.obsm["m2"].sum() == 2
        # maps rerank correctly
        m2map = md.obsmap["m2"]
        assert list(m2map) == [1, 2, 0, 0]
        assert np.allclose(np.asarray(md.mod["m1"].X), x1[mask])

    def test_filter_var_mudata(self, mdata):
        mask = np.zeros(50, dtype=bool)
        mask[:10] = True   # first 10 vars of mod1
        mask[25:30] = True  # vars 5..9 of mod2
        mu.pp.filter_var(mdata, mask)
        assert mdata.n_vars == 15
        assert mdata.mod["mod1"].n_vars == 10
        assert mdata.mod["mod2"].n_vars == 5
        assert list(mdata.mod["mod2"].var_names) == [f"var{i}" for i in range(5, 10)]

    def test_filter_global_columns_kept(self, mdata):
        mdata.obs["anno"] = np.arange(50.0)
        mask = np.arange(50) >= 40
        mu.pp.filter_obs(mdata, mask)
        assert np.allclose(mdata.obs["anno"].to_numpy(), np.arange(40.0, 50.0))

    def test_view_raises(self, mdata):
        v = mdata[0:10]
        with pytest.raises(ValueError):
            mu.pp.filter_obs(v, np.ones(10, dtype=bool))


class TestIntersectSample:
    def test_intersect_obs(self):
        m1 = make_adata(10, 4)
        m2 = make_adata(6, 3)
        md = mu.MuData({"m1": m1, "m2": m2})
        mu.pp.intersect_obs(md)
        assert md.n_obs == 6
        assert md.mod["m1"].n_obs == 6
        assert md.mod["m2"].n_obs == 6

    def test_intersect_obs_no_x(self):
        # X=None case (reference tests/test_muon_preproc.py:207-233)
        m1 = mu.AnnData(
            obs=__import__("pandas").DataFrame(index=[f"obs{i}" for i in range(8)])
        )
        m2 = make_adata(5, 3)
        md = mu.MuData({"m1": m1, "m2": m2})
        mu.pp.intersect_obs(md)
        assert md.n_obs == 5
        assert md.mod["m1"].n_obs == 5

    def test_sample_obs(self, mdata):
        np.random.seed(0)
        v = mu.pp.sample_obs(mdata, 0.2)
        assert v.n_obs == 10
        assert v.is_view

    def test_sample_obs_groupby(self):
        ad = make_adata(40, 5)
        ad.obs["grp"] = pd.Categorical(["a"] * 20 + ["b"] * 20)
        np.random.seed(0)
        v = mu.pp.sample_obs(ad, 0.5, groupby="grp")
        assert v.n_obs == 20


class TestL2Norm:
    def test_l2norm_dense(self):
        ad = make_adata(10, 5)
        mu.pp.l2norm(ad)
        norms = np.linalg.norm(np.asarray(ad.X), axis=1)
        assert np.allclose(norms, 1.0, atol=1e-6)

    def test_l2norm_sparse(self):
        ad = make_adata(10, 5, sparse=True)
        mu.pp.l2norm(ad)
        norms = sp.linalg.norm(ad.X, axis=1)
        nonzero = norms > 0
        assert np.allclose(norms[nonzero], 1.0, atol=1e-6)

    def test_l2norm_rep(self):
        ad = make_adata(10, 5)
        ad.obsm["X_pca"] = np.random.default_rng(0).normal(size=(10, 4))
        mu.pp.l2norm(ad, rep="pca", n_pcs=2)
        assert ad.obsm["X_pca"].shape == (10, 2)
        assert np.allclose(np.linalg.norm(ad.obsm["X_pca"], axis=1), 1.0, atol=1e-6)

    def test_l2norm_mudata(self, mdata):
        mu.pp.l2norm(mdata)
        for m in mdata.mod.values():
            assert np.allclose(
                np.linalg.norm(np.asarray(m.X), axis=1), 1.0, atol=1e-5
            )


class TestPCA:
    def test_pca_matches_svd(self):
        """mu.pp.pca recovers the exact principal subspace on dense data."""
        rng = np.random.default_rng(0)
        X = rng.normal(size=(80, 30)).astype(np.float32)
        X[:, :5] *= 6  # strong leading directions
        ad = mu.AnnData(X=X.copy())
        mu.pp.pca(ad, n_comps=5)
        assert ad.obsm["X_pca"].shape == (80, 5)
        assert ad.varm["PCs"].shape == (30, 5)
        Xc = X - X.mean(axis=0)
        U, s, Vt = np.linalg.svd(Xc, full_matrices=False)
        ref_scores = U[:, :5] * s[:5]
        # per-component correlation up to sign
        for k in range(5):
            c = np.corrcoef(ad.obsm["X_pca"][:, k], ref_scores[:, k])[0, 1]
            assert abs(c) > 0.999, (k, c)
        np.testing.assert_allclose(
            ad.uns["pca"]["variance"], (s[:5] ** 2) / 79, rtol=1e-3
        )

    def test_pca_sparse_implicit_centering(self):
        from scipy import sparse as sp

        rng = np.random.default_rng(1)
        X = rng.poisson(1.0, size=(60, 40)).astype(np.float32)
        ad_d = mu.AnnData(X=X.copy())
        ad_s = mu.AnnData(X=sp.csr_matrix(X))
        mu.pp.pca(ad_d, n_comps=4)
        mu.pp.pca(ad_s, n_comps=4)
        for k in range(4):
            c = np.corrcoef(
                ad_d.obsm["X_pca"][:, k], ad_s.obsm["X_pca"][:, k]
            )[0, 1]
            assert abs(c) > 0.99, (k, c)

    def test_pca_mudata_raises(self, mdata):
        with pytest.raises(TypeError):
            mu.pp.pca(mdata)


def test_sample_obs_seeded():
    """sample_obs(random_state=...) is reproducible (VERDICT r1 weak #7)."""
    import muon_tpu as mu

    ad = mu.AnnData(np.arange(200, dtype=np.float32).reshape(100, 2))
    a = mu.pp.sample_obs(ad, frac=0.3, random_state=7)
    b = mu.pp.sample_obs(ad, frac=0.3, random_state=7)
    c = mu.pp.sample_obs(ad, frac=0.3, random_state=8)
    assert list(a.obs_names) == list(b.obs_names)
    assert list(a.obs_names) != list(c.obs_names)


def test_pull_obs_common_unprefixed_axis1():
    """pull_obs('col') on an axis=1 container merges into ONE unprefixed
    column usable by filter_obs (reference tests/test_muon_preproc.py:101)."""
    import muon_tpu as mu

    A = mu.AnnData(np.zeros((4, 3), np.float32))
    B = mu.AnnData(np.zeros((5, 3), np.float32))
    A.obs_names = [f"a{i}" for i in range(4)]
    B.obs_names = [f"b{i}" for i in range(5)]
    A.obs["louvain"] = pd.Categorical(["x", "x", "y", "y"])
    B.obs["louvain"] = pd.Categorical(["y", "y", "y", "x", "x"])
    md = mu.MuData({"A": A, "B": B}, axis=1)
    md.pull_obs("louvain")
    assert "louvain" in md.obs.columns
    assert "A:louvain" not in md.obs.columns
    mu.pp.filter_obs(md, "louvain", lambda x: x == "y")
    assert md.mod["A"].n_obs == 2 and md.mod["B"].n_obs == 3


def test_pull_var_common_and_prefix_unique():
    import muon_tpu as mu

    A = mu.AnnData(np.zeros((3, 4), np.float32))
    B = mu.AnnData(np.zeros((3, 2), np.float32))
    A.var["sel"] = [1, 0, 1, 0]
    B.var["sel"] = [0, 1]
    A.var["only_a"] = list("wxyz")
    md = mu.MuData({"A": A, "B": B})
    md.pull_var(["sel", "only_a"])
    # common column -> unprefixed merged
    assert list(md.var["sel"]) == [1, 0, 1, 0, 0, 1]
    # unique column -> prefixed by default
    assert "A:only_a" in md.var.columns
    md.pull_var(["only_a"], prefix_unique=False)
    assert "only_a" in md.var.columns
