"""Protein module tests: CLR flavors, DSB normalization, GMM kernel.

Mirrors the reference's test strategy (SURVEY §4): seeded synthetic data,
recovery assertions for model fits, exact-math assertions for
deterministic transforms.
"""

import numpy as np
import pandas as pd
import pytest
from scipy import sparse as sp
from scipy.stats import gmean

import muon_tpu as mu
from muon_tpu import prot as pt


def _adata(X, var_names=None, prefix="cell"):
    n, d = X.shape
    obs = pd.DataFrame(index=[f"{prefix}{i}" for i in range(n)])
    var = pd.DataFrame(
        index=var_names if var_names is not None else [f"p{i}" for i in range(d)]
    )
    return mu.AnnData(X=X, obs=obs, var=var)


class TestCLR:
    def setup_method(self):
        rng = np.random.default_rng(42)
        self.X = rng.poisson(5.0, size=(40, 15)).astype(np.float64)

    @pytest.mark.parametrize("axis", [0, 1])
    def test_seurat_dense_matches_manual(self, axis):
        adata = _adata(self.X.copy())
        pt.pp.clr(adata, axis=axis, flavor="seurat")
        expected = np.log1p(
            self.X / np.exp(np.log1p(self.X).mean(axis=axis, keepdims=True))
        )
        np.testing.assert_allclose(np.asarray(adata.X), expected, rtol=1e-6)

    @pytest.mark.parametrize("axis", [0, 1])
    def test_seurat_sparse_matches_dense(self, axis):
        Xs = self.X.copy()
        Xs[Xs < 4] = 0  # make it sparse
        fmt = sp.csc_matrix if axis == 0 else sp.csr_matrix
        a_sp = _adata(fmt(Xs))
        a_de = _adata(Xs.copy())
        pt.pp.clr(a_sp, axis=axis, flavor="seurat")
        pt.pp.clr(a_de, axis=axis, flavor="seurat")
        assert sp.issparse(a_sp.X), "seurat flavor must preserve sparsity"
        np.testing.assert_allclose(
            np.asarray(a_sp.X.todense()), np.asarray(a_de.X), rtol=1e-5
        )

    @pytest.mark.parametrize("axis", [0, 1])
    def test_stoeckius(self, axis):
        adata = _adata(self.X.copy())
        pt.pp.clr(adata, axis=axis, flavor="stoeckius")
        Xp = self.X + 1
        expected = np.log(Xp / gmean(Xp, axis=axis, keepdims=True))
        np.testing.assert_allclose(np.asarray(adata.X), expected, rtol=1e-6)

    def test_standard(self):
        X = self.X + 1.0  # avoid zeros
        adata = _adata(X.copy())
        pt.pp.clr(adata, axis=0, flavor="standard")
        expected = np.log(X / gmean(X, axis=0, keepdims=True))
        np.testing.assert_allclose(np.asarray(adata.X), expected, rtol=1e-6)

    def test_not_inplace(self):
        adata = _adata(self.X.copy())
        out = pt.pp.clr(adata, inplace=False)
        assert out is not None
        np.testing.assert_array_equal(np.asarray(adata.X), self.X)

    def test_bad_flavor_and_axis(self):
        adata = _adata(self.X.copy())
        with pytest.raises(ValueError):
            pt.pp.clr(adata, flavor="nope")
        with pytest.raises(ValueError):
            pt.pp.clr(adata, axis=2)


class TestGMMKernel:
    def test_background_means_recovery(self):
        from muon_tpu.ops.gmm import background_means

        rng = np.random.default_rng(0)
        N, D = 60, 50
        bg = rng.uniform(-1.0, 0.5, size=N)
        X = np.empty((N, D), np.float32)
        for i in range(N):
            lo = rng.normal(bg[i], 0.15, size=D)
            hi = rng.normal(bg[i] + 3.0, 0.3, size=D)
            pick = rng.random(D) < 0.6
            X[i] = np.where(pick, lo, hi)
        est = background_means(X, seed=1)
        # the lower-component mean should track the true background
        assert np.corrcoef(est, bg)[0, 1] > 0.95
        assert np.abs(est - bg).mean() < 0.2


def _make_dsb_fixture(n_cells=80, n_empty=400, n_prot=25, seed=3):
    """Cells have protein-specific ambient background + real signal;
    empty droplets have only background."""
    rng = np.random.default_rng(seed)
    ambient = rng.uniform(5, 50, size=n_prot)
    empty = rng.poisson(ambient, size=(n_empty, n_prot)).astype(np.float32)
    signal = rng.poisson(200, size=(n_cells, n_prot)) * (
        rng.random((n_cells, n_prot)) < 0.3
    )
    # per-cell efficiency noise (what DSB denoises away)
    eff = np.exp(rng.normal(0, 0.3, size=(n_cells, 1)))
    cells = (rng.poisson(ambient, size=(n_cells, n_prot)) + signal) * eff
    return cells.astype(np.float32), empty


class TestDSB:
    def test_scaling_matches_manual(self):
        cells, empty = _make_dsb_fixture()
        a_cells = _adata(cells.copy())
        a_empty = _adata(empty.copy(), prefix="empty")
        pt.pp.dsb(a_cells, a_empty, denoise_counts=False)
        es = np.log(empty + 10)
        expected = (np.log(cells + 10) - es.mean(axis=0)) / es.std(axis=0, ddof=1)
        np.testing.assert_allclose(
            np.asarray(a_cells.X), expected, rtol=1e-3, atol=1e-4
        )

    def test_mean_subtract(self):
        cells, empty = _make_dsb_fixture()
        a_cells, a_empty = _adata(cells.copy()), _adata(empty.copy(), prefix="empty")
        pt.pp.dsb(a_cells, a_empty, denoise_counts=False, scale_factor="mean_subtract")
        es = np.log(empty + 10)
        expected = np.log(cells + 10) - es.mean(axis=0)
        np.testing.assert_allclose(
            np.asarray(a_cells.X), expected, rtol=1e-3, atol=1e-4
        )

    def test_denoise_reduces_cell_variance(self):
        cells, empty = _make_dsb_fixture()
        a0, a1 = _adata(cells.copy()), _adata(cells.copy())
        e0, e1 = _adata(empty.copy(), prefix="empty"), _adata(empty.copy(), prefix="empty")
        pt.pp.dsb(a0, e0, denoise_counts=False)
        pt.pp.dsb(a1, e1, denoise_counts=True, random_state=0)
        # denoising removes the per-cell technical component: the mean
        # per-cell offset (over background-dominated values) shrinks
        lo0 = np.asarray(a0.X)
        lo1 = np.asarray(a1.X)
        cell_offset0 = np.median(lo0, axis=1)
        cell_offset1 = np.median(lo1, axis=1)
        assert cell_offset1.std() < cell_offset0.std()

    def test_add_layer_and_sparse(self):
        cells, empty = _make_dsb_fixture()
        a_cells = _adata(sp.csr_matrix(cells))
        a_empty = _adata(sp.csr_matrix(empty), prefix="empty")
        pt.pp.dsb(a_cells, a_empty, denoise_counts=False, add_layer=True)
        assert "dsb" in a_cells.layers
        assert sp.issparse(a_cells.X)  # X untouched

    def test_quantile_clipping(self):
        cells, empty = _make_dsb_fixture()
        a_cells, a_empty = _adata(cells.copy()), _adata(empty.copy(), prefix="empty")
        pt.pp.dsb(
            a_cells, a_empty, denoise_counts=False,
            quantile_clipping=True, quantile_clip=(0.05, 0.95),
        )
        X = np.asarray(a_cells.X)
        es = np.log(empty + 10)
        raw = (np.log(cells + 10) - es.mean(axis=0)) / es.std(axis=0, ddof=1)
        q = np.quantile(raw, [0.05, 0.95])
        assert X.min() >= q[0] - 1e-4 and X.max() <= q[1] + 1e-4

    def test_unfiltered_mudata_path(self):
        """data_raw=None: cells/empties split from raw RNA log10 UMI ranges
        (reference muon/_prot/preproc.py:67-95)."""
        rng = np.random.default_rng(7)
        n_prot = 10
        # 300 empty-ish droplets (low RNA), 100 cells (high RNA)
        rna_counts = np.concatenate(
            [rng.integers(50, 800, size=300), rng.integers(5000, 20000, size=100)]
        )
        order = rng.permutation(400)
        rna_counts = rna_counts[order]
        rna = np.zeros((400, 5), np.float32)
        rna[:, 0] = rna_counts
        prot = rng.poisson(20, size=(400, n_prot)).astype(np.float32)
        names = [f"bc{i}" for i in range(400)]
        mdata = mu.MuData(
            {
                "rna": _adata(rna),
                "prot": _adata(prot),
            }
        )
        for m in mdata.mod.values():
            m.obs_names = pd.Index(names)
        mdata.update()
        out = pt.pp.dsb(
            mdata,
            empty_counts_range=(1.0, 3.0),
            cell_counts_range=(3.5, 5.0),
            denoise_counts=False,
        )
        assert out is not None
        assert out.mod["prot"].n_obs == int(
            ((np.log10(rna_counts + 1) >= 3.5) & (np.log10(rna_counts + 1) < 5.0)).sum()
        )

    def test_error_contracts(self):
        cells, empty = _make_dsb_fixture(n_prot=5)
        a_cells, a_empty = _adata(cells), _adata(empty, prefix="empty")
        with pytest.raises(ValueError):
            pt.pp.dsb(a_cells, a_empty, pseudocount=-1)
        with pytest.raises(ValueError):
            pt.pp.dsb(a_cells, _adata(empty[:, :3], prefix="empty"))
        with pytest.raises(ValueError):
            pt.pp.dsb(
                mu.MuData({"prot": a_cells}),
                empty_counts_range=(1.0, 3.0),
                cell_counts_range=(2.0, 4.0),  # overlap
            )


class TestRnaUtils:
    def test_gene_annotation(self):
        from muon_tpu.rna.utils import get_gene_annotation_from_rna

        X = np.zeros((3, 4), np.float32)
        var = pd.DataFrame(
            {
                "interval": ["chr1:100-200", "chr2:5-50", "NA", "chrX:7-9"],
                "gene_ids": ["g1", "g2", "g3", "g4"],
            },
            index=["A", "B", "C", "D"],
        )
        var.loc["C", "interval"] = None
        adata = mu.AnnData(X=X, var=var)
        feats = get_gene_annotation_from_rna(adata)
        assert list(feats.index) == ["A", "B", "D"]
        assert feats.loc["A", "Chromosome"] == "chr1"
        assert feats.loc["A", "Start"] == 100
        assert feats.loc["D", "End"] == 9
        assert feats.loc["B", "gene_id"] == "g2"

    def test_missing_interval_raises(self):
        from muon_tpu.rna.utils import get_gene_annotation_from_rna

        adata = mu.AnnData(X=np.zeros((2, 2), np.float32))
        import pytest

        with pytest.raises(ValueError):
            get_gene_annotation_from_rna(adata)
