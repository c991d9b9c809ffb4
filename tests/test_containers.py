"""Container layer tests: AnnData/MuData bookkeeping
(patterned after reference tests/test_muon_preproc.py contracts)."""

import numpy as np
import pandas as pd
import pytest
from scipy import sparse as sp

import muon_tpu as mu
from tests.conftest import make_adata


class TestAnnData:
    def test_basic_dims(self):
        ad = make_adata(10, 5)
        assert ad.shape == (10, 5)
        assert ad.n_obs == 10 and ad.n_vars == 5
        assert list(ad.obs_names[:2]) == ["obs0", "obs1"]

    def test_default_index(self):
        ad = mu.AnnData(X=np.zeros((3, 2)))
        assert list(ad.obs_names) == ["0", "1", "2"]

    def test_view_and_copy(self):
        ad = make_adata(10, 5)
        v = ad[[0, 2, 4]]
        assert v.is_view
        assert v.n_obs == 3
        c = v.copy()
        assert not c.is_view
        # slicing by names
        v2 = ad[["obs1", "obs3"]]
        assert list(v2.obs_names) == ["obs1", "obs3"]
        # 2-axis slicing
        v3 = ad[0:5, ["var0", "var2"]]
        assert v3.shape == (5, 2)

    def test_bool_mask_slicing(self):
        ad = make_adata(10, 5)
        mask = np.zeros(10, dtype=bool)
        mask[:3] = True
        assert ad[mask].n_obs == 3

    def test_aligned_validation(self):
        ad = make_adata(10, 5)
        ad.obsm["X_pca"] = np.zeros((10, 2))
        with pytest.raises(ValueError):
            ad.obsm["bad"] = np.zeros((9, 2))
        ad.layers["counts"] = np.zeros((10, 5))
        with pytest.raises(ValueError):
            ad.layers["bad"] = np.zeros((10, 4))
        ad.obsp["dist"] = np.zeros((10, 10))
        with pytest.raises(ValueError):
            ad.obsp["bad"] = np.zeros((10, 9))

    def test_subset_propagates(self):
        ad = make_adata(10, 5)
        ad.obsm["X_pca"] = np.arange(20).reshape(10, 2)
        ad.obsp["conn"] = np.arange(100).reshape(10, 10)
        ad.layers["l"] = ad.X.copy()
        v = ad[[1, 3]]
        assert v.obsm["X_pca"].shape == (2, 2)
        assert v.obsp["conn"].shape == (2, 2)
        assert v.obsp["conn"][0, 1] == ad.obsp["conn"][1, 3]
        assert v.layers["l"].shape == (2, 5)

    def test_raw(self):
        ad = make_adata(10, 5)
        ad.raw = ad
        ad2 = ad[:, [0, 1]]
        assert ad2.raw.n_vars == 5  # raw keeps all vars

    def test_categorical_cleanup(self):
        ad = make_adata(6, 3)
        ad.obs["grp"] = pd.Categorical(["a", "a", "b", "b", "c", "c"])
        v = ad[[0, 1]]
        assert list(v.obs["grp"].cat.categories) == ["a"]

    def test_obs_vector(self):
        ad = make_adata(5, 3)
        ad.obs["x"] = np.arange(5.0)
        assert np.allclose(ad.obs_vector("x"), np.arange(5.0))
        col = ad.obs_vector("var1")
        assert np.allclose(col, np.asarray(ad.X)[:, 1])


class TestMuData:
    def test_shared_obs(self, mdata):
        assert mdata.n_obs == 50
        assert mdata.n_vars == 50  # 20 + 30 concatenated
        assert np.all(mdata.obsm["mod1"])
        assert np.all(mdata.obsmap["mod1"] == np.arange(1, 51))
        assert np.all(mdata.varmap["mod1"][:20] == np.arange(1, 21))
        assert np.all(mdata.varmap["mod1"][20:] == 0)
        assert np.all(mdata.varmap["mod2"][20:] == np.arange(1, 31))

    def test_ragged_obs(self):
        m1 = make_adata(10, 4)
        m2 = make_adata(6, 3)  # obs0..obs5 subset
        md = mu.MuData({"m1": m1, "m2": m2})
        assert md.n_obs == 10
        assert md.obsm["m2"].sum() == 6
        assert np.all(md.obsmap["m2"][:6] == np.arange(1, 7))
        assert np.all(md.obsmap["m2"][6:] == 0)

    def test_union_order(self):
        m1 = make_adata(3, 2, obs_prefix="a")
        m2 = make_adata(3, 2, obs_prefix="b")
        md = mu.MuData({"m1": m1, "m2": m2})
        assert md.n_obs == 6
        assert list(md.obs_names) == ["a0", "a1", "a2", "b0", "b1", "b2"]

    def test_view(self, mdata):
        v = mdata[[0, 1, 2]]
        assert v.is_view
        assert v.n_obs == 3
        assert v.mod["mod1"].n_obs == 3
        assert v.mod["mod2"].n_obs == 3

    def test_view_ragged(self):
        m1 = make_adata(10, 4)
        m2 = make_adata(6, 3)
        md = mu.MuData({"m1": m1, "m2": m2})
        v = md[[4, 5, 6, 7]]
        assert v.mod["m1"].n_obs == 4
        assert v.mod["m2"].n_obs == 2  # only obs4, obs5 in m2

    def test_axis1(self):
        # shared vars, concatenated obs (reference tests/test_muon_preproc.py:98)
        m1 = make_adata(5, 8, obs_prefix="a")
        m2 = make_adata(7, 8, obs_prefix="b")
        md = mu.MuData({"m1": m1, "m2": m2}, axis=1)
        assert md.n_obs == 12
        assert md.n_vars == 8

    def test_pull_obs(self):
        m1 = make_adata(5, 2)
        m2 = make_adata(5, 3)
        m1.obs["score"] = np.arange(5.0)
        md = mu.MuData({"m1": m1, "m2": m2})
        md.pull_obs()
        assert "m1:score" in md.obs.columns
        assert np.allclose(md.obs["m1:score"].to_numpy().astype(float), np.arange(5.0))

    def test_getitem_mod(self, mdata):
        assert mdata["mod1"] is mdata.mod["mod1"]

    def test_obsm_embedding(self, mdata):
        mdata.obsm["X_test"] = np.zeros((50, 2))
        with pytest.raises(ValueError):
            mdata.obsm["X_bad"] = np.zeros((49, 2))


class TestIO:
    def test_h5ad_roundtrip(self, tmp_path):
        ad = make_adata(10, 5, sparse=True)
        ad.obs["cat"] = pd.Categorical(["x", "y"] * 5)
        ad.obs["num"] = np.arange(10.0)
        ad.obsm["X_pca"] = np.random.default_rng(0).normal(size=(10, 3))
        ad.uns["params"] = {"k": 5, "name": "test", "flag": True}
        ad.layers["counts"] = sp.random(10, 5, density=0.5, format="csr")
        path = str(tmp_path / "t.h5ad")
        ad.write(path)
        ad2 = mu.read_h5ad(path)
        assert ad2.shape == ad.shape
        assert list(ad2.obs["cat"]) == list(ad.obs["cat"])
        assert np.allclose(ad2.obsm["X_pca"], ad.obsm["X_pca"])
        assert ad2.uns["params"]["k"] == 5
        assert ad2.uns["params"]["name"] == "test"
        assert np.allclose(
            np.asarray(ad2.X.todense()), np.asarray(ad.X.todense())
        )
        assert np.allclose(
            np.asarray(ad2.layers["counts"].todense()),
            np.asarray(ad.layers["counts"].todense()),
        )

    def test_h5mu_roundtrip(self, mdata, filepath_h5mu):
        mdata.obs["global_col"] = np.arange(50.0)
        mdata.uns["note"] = "hello"
        mdata.write(filepath_h5mu)
        md2 = mu.read_h5mu(filepath_h5mu)
        assert md2.n_obs == 50 and md2.n_vars == 50
        assert list(md2.mod) == ["mod1", "mod2"]
        assert np.allclose(
            np.asarray(md2.mod["mod1"].X), np.asarray(mdata.mod["mod1"].X)
        )
        assert md2.uns["note"] == "hello"
        assert "global_col" in md2.obs.columns

    def test_h5mu_subpath(self, mdata, filepath_h5mu):
        mdata.write(filepath_h5mu)
        ad = mu.read(filepath_h5mu + "/mod1")
        assert ad.shape == (50, 20)

    def test_backed_read(self, tmp_path):
        ad = make_adata(10, 5, sparse=True)
        path = str(tmp_path / "b.h5ad")
        ad.write(path)
        ad2 = mu.read_h5ad(path, backed="r")
        assert ad2.isbacked
        assert np.allclose(
            np.asarray(ad2.X.to_memory().todense()),
            np.asarray(ad.X.todense()),
        )
        ad2.file.close()


class TestUnsRoundtrip:
    def test_uns_dataframe_roundtrip(self, tmp_path):
        """Nested uns DataFrames (peak annotation) survive h5mu round-trips
        — load-bearing for every ATAC workflow that saves results."""
        from muon_tpu import atac as ac

        adata = mu.AnnData(X=np.zeros((3, 2), np.float32))
        pa = pd.DataFrame(
            {
                "peak": ["chr1_1_2", "chr1_3_4"],
                "gene": ["", "G2"],
                "distance": pd.array([pd.NA, 5], dtype="Int64"),
                "peak_type": ["intergenic", "distal"],
            }
        )
        ac.tl.add_peak_annotation(adata, pa)
        md = mu.MuData({"atac": adata})
        path = str(tmp_path / "pa.h5mu")
        md.write_h5mu(path)
        back = mu.read_h5mu(path)
        pb = back.mod["atac"].uns["atac"]["peak_annotation"]
        assert isinstance(pb, pd.DataFrame)
        assert list(pb["peak"]) == ["chr1:1-2", "chr1:3-4"]
        # nullable Int64 with NA preserved (reference regression class:
        # tests/test_atac_tools.py:13-30)
        assert str(pb["distance"].dtype) == "Int64"
        assert pd.isna(pb["distance"].iloc[0])
        assert pb["distance"].iloc[1] == 5

    def test_uns_recarray_roundtrip(self, tmp_path):
        """Structured record arrays (scanpy's rank_genes_groups layout,
        reference muon/_atac/tools.py:371 delegates to it) survive h5ad
        round-trips, including object-dtype name fields."""
        rng = np.random.default_rng(0)
        ad = mu.AnnData(
            np.log1p(rng.poisson(2.0, size=(60, 20)).astype(np.float32))
        )
        ad.obs["grp"] = [str(i % 3) for i in range(60)]
        mu.tl.rank_genes_groups(ad, "grp")
        path = str(tmp_path / "de.h5ad")
        ad.write(path)
        back = mu.read_h5ad(path)
        res, res2 = ad.uns["rank_genes_groups"], back.uns["rank_genes_groups"]
        for field in ("names", "scores", "pvals", "pvals_adj"):
            assert res2[field].dtype.names == res[field].dtype.names
            for g in res[field].dtype.names:
                a, b = res[field][g], res2[field][g]
                if a.dtype.kind == "O":
                    assert (a == b).all()
                else:
                    assert np.allclose(a.tolist(), b.tolist())
