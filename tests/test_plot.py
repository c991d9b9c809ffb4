"""Plotting smoke + behavior tests (headless Agg backend) — reference
pattern: tests/test_muon_plot.py:11-31."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import pytest

import muon_tpu as mu
from muon_tpu import atac as ac


@pytest.fixture()
def mdata():
    rng = np.random.default_rng(5)
    n = 40
    obs = pd.DataFrame(index=[f"c{i}" for i in range(n)])
    m1 = mu.AnnData(
        X=rng.normal(size=(n, 6)).astype(np.float32),
        obs=obs.copy(),
        var=pd.DataFrame(index=[f"a{i}" for i in range(6)]),
    )
    m2 = mu.AnnData(
        X=rng.normal(size=(n, 4)).astype(np.float32),
        obs=obs.copy(),
        var=pd.DataFrame(index=[f"b{i}" for i in range(4)]),
    )
    md = mu.MuData({"m1": m1, "m2": m2})
    md.obs["celltype"] = pd.Categorical(rng.choice(["T", "B"], size=n))
    md.obsm["X_test"] = rng.normal(size=(n, 2))
    m1.obsm["X_pca"] = rng.normal(size=(n, 3))
    return md


class TestScatter:
    def test_cross_modality_xy(self, mdata):
        ax = mu.pl.scatter(mdata, x="a0", y="b0", show=False)
        assert ax is not None
        plt.close("all")

    def test_color_categorical_palette_writeback(self, mdata):
        mu.pl.scatter(mdata, x="a0", y="a1", color="celltype", show=False)
        assert "celltype_colors" in mdata.uns
        assert len(mdata.uns["celltype_colors"]) == 2
        plt.close("all")

    def test_color_continuous(self, mdata):
        mu.pl.scatter(mdata, x="a0", y="b1", color="b2", show=False)
        plt.close("all")


class TestEmbedding:
    def test_global_basis(self, mdata):
        ax = mu.pl.embedding(mdata, basis="test", color="celltype", show=False)
        assert ax is not None
        plt.close("all")

    def test_mod_basis(self, mdata):
        mu.pl.embedding(mdata, basis="m1:pca", color="a0", show=False)
        plt.close("all")

    def test_missing_basis_raises(self, mdata):
        with pytest.raises(ValueError):
            mu.pl.embedding(mdata, basis="nope", show=False)
        plt.close("all")

    def test_mofa_umap_wrappers(self, mdata):
        mdata.obsm["X_mofa"] = np.asarray(mdata.obsm["X_test"])
        mdata.obsm["X_umap"] = np.asarray(mdata.obsm["X_test"])
        mu.pl.mofa(mdata, show=False)
        mu.pl.umap(mdata, color="celltype", show=False)
        plt.close("all")


class TestHistogram:
    def test_keys_and_groupby(self, mdata):
        mdata.obs["total"] = np.arange(mdata.n_obs, dtype=float)
        mu.pl.histogram(mdata, keys=["total"], show=False)
        mu.pl.histogram(mdata, keys="total", groupby="celltype", show=False)
        plt.close("all")

    def test_bad_key_raises(self, mdata):
        with pytest.raises(AssertionError):
            mu.pl.histogram(mdata, keys=["not_a_key"], show=False)


class TestMofaLoadings:
    def test_loadings(self, mdata):
        rng = np.random.default_rng(0)
        mdata.varm["LFs"] = rng.normal(size=(mdata.n_vars, 4))
        mu.pl.mofa_loadings(mdata, factors=[1, 2], show=False)
        plt.close("all")


class TestAtacPlots:
    @pytest.fixture()
    def atac(self):
        rng = np.random.default_rng(1)
        n = 30
        peaks = [f"chr1:{i*500}-{i*500+400}" for i in range(5)]
        adata = mu.AnnData(
            X=rng.poisson(1.0, size=(n, 5)).astype(np.float32),
            obs=pd.DataFrame(
                {"grp": pd.Categorical(rng.choice(["x", "y"], n))},
                index=[f"BC{i}" for i in range(n)],
            ),
            var=pd.DataFrame(index=peaks),
        )
        adata.obsm["X_lsi"] = rng.normal(size=(n, 2))
        pa = pd.DataFrame(
            {
                "peak": [p.replace(":", "_").replace("-", "_") for p in peaks],
                "gene": ["G1", "G1", "G2", "G2", "G2"],
                "distance": [0, 10, 0, 5, 8],
                "peak_type": ["promoter", "distal", "promoter", "distal", "distal"],
            }
        )
        ac.tl.add_peak_annotation(adata, pa)
        return adata

    def test_embedding_gene_average(self, atac):
        ac.pl.embedding(atac, basis="lsi", color="G1", use_raw=False, show=False)
        plt.close("all")

    def test_embedding_peak_type(self, atac):
        ac.pl.embedding(
            atac, basis="lsi", color="G2", average="peak_type",
            use_raw=False, show=False,
        )
        plt.close("all")

    def test_lsi_wrapper(self, atac):
        ac.pl.lsi(atac, color=atac.var_names[0], use_raw=False, show=False)
        plt.close("all")

    def test_dotplot(self, atac):
        ac.pl.dotplot(atac, ["G1", "G2"], groupby="grp", show=False)
        plt.close("all")

    def test_tss_enrichment_plot(self, atac):
        rng = np.random.default_rng(2)
        tss = mu.AnnData(
            X=rng.random((30, 21)).astype(np.float32),
            obs=atac.obs.copy(),
            var=pd.DataFrame({"TSS_position": np.arange(-10, 11)}),
        )
        ac.pl.tss_enrichment(tss, show=False)
        ac.pl.tss_enrichment(tss, color="grp", show=False)
        plt.close("all")

    def test_fragment_histogram(self, atac, tmp_path):
        from muon_tpu.atac.fragments import write_fragments

        rng = np.random.default_rng(3)
        recs = []
        for s in np.sort(rng.integers(0, 10_000, size=500)):
            recs.append(
                ("chr1", int(s), int(s) + int(rng.integers(60, 400)),
                 f"BC{rng.integers(0, 30)}", 1)
            )
        path = str(tmp_path / "frags.tsv.gz")
        write_fragments(path, recs)
        ac.tl.locate_fragments(atac, path)
        ac.pl.fragment_histogram(atac, region="chr1:0-10000", show=False)
        ac.pl.fragment_histogram(
            atac, region="chr1:0-10000", groupby="grp", show=False
        )
        plt.close("all")
