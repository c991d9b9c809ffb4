"""Lazy views + backed (out-of-core) container tests.

Reference contracts: anndata lightweight views (cross-modality slicing,
muon DESIGN.md "Container's views"; view-raise on filter,
muon/_core/preproc.py:687-689) and backed mode
(muon/_core/preproc.py:655-668 warn-then-load on filter)."""

import numpy as np
import pandas as pd
import pytest
from scipy import sparse as sp

import muon_tpu as mu
from muon_tpu._core.anndata import _UNSET, BackedMatrix


def _adata(n=50, d=20, seed=0, sparse=False):
    rng = np.random.default_rng(seed)
    X = rng.poisson(1.0, size=(n, d)).astype(np.float32)
    ad = mu.AnnData(sp.csr_matrix(X) if sparse else X)
    ad.obs["grp"] = [str(i % 3) for i in range(n)]
    ad.obsm["X_emb"] = rng.normal(size=(n, 5)).astype(np.float32)
    ad.layers["raw"] = (X * 2).copy() if not sparse else sp.csr_matrix(X * 2)
    ad.obsp["conn"] = sp.csr_matrix(
        (np.ones(n), (np.arange(n), (np.arange(n) + 1) % n)), shape=(n, n)
    )
    return ad


class TestLazyViews:
    def test_view_is_lazy(self):
        ad = _adata()
        v = ad[:10]
        assert v.is_view
        # matrix-sized slots untouched at creation (O(metadata) view)
        assert v._X is _UNSET
        assert v._layers is None and v._obsm is None and v._obsp is None

    def test_view_materializes_correctly(self):
        ad = _adata(sparse=True)
        idx = np.array([3, 1, 4, 40])
        v = ad[idx, 5:15]
        assert np.allclose(
            np.asarray(v.X.todense()),
            np.asarray(ad.X.todense())[idx][:, 5:15],
        )
        assert np.allclose(v.obsm["X_emb"], ad.obsm["X_emb"][idx])
        assert np.allclose(
            np.asarray(v.layers["raw"].todense()),
            np.asarray(ad.layers["raw"].todense())[idx][:, 5:15],
        )
        assert v.obsp["conn"].shape == (4, 4)

    def test_view_of_view(self):
        ad = _adata()
        v = ad[10:40][5:10]
        assert v.n_obs == 5
        assert np.allclose(np.asarray(v.X), np.asarray(ad.X)[15:20])

    def test_view_mutation_copy_on_write(self):
        ad = _adata()
        X_before = np.asarray(ad.X).copy()
        v = ad[:10]
        v.X = np.zeros((10, 20), np.float32)
        # CoW detaches the view (anndata semantics) and leaves parent intact
        assert not v.is_view
        assert np.allclose(np.asarray(ad.X), X_before)
        assert np.allclose(np.asarray(v.X), 0.0)

    def test_view_aligned_write_does_not_leak_to_parent(self):
        ad = _adata()
        v = ad[:10]
        v.obsm["X_new"] = np.ones((10, 2))
        assert "X_new" not in ad.obsm
        emb = v.obsm["X_emb"]
        if hasattr(emb, "setflags"):
            emb[:] = -1.0
        assert not np.any(ad.obsm["X_emb"][:10] == -1.0)

    def test_view_copy(self):
        ad = _adata(sparse=True)
        c = ad[:7, :11].copy()
        assert not c.is_view
        assert c.shape == (7, 11)
        assert np.allclose(
            np.asarray(c.X.todense()), np.asarray(ad.X.todense())[:7, :11]
        )

    def test_filter_on_view_raises(self):
        ad = _adata()
        v = ad[:10]
        with pytest.raises(ValueError):
            mu.pp.filter_obs(v, np.ones(10, bool))

    def test_mudata_view_is_lazy(self):
        m1, m2 = _adata(seed=1), _adata(seed=2, d=8)
        md = mu.MuData({"m1": m1, "m2": m2})
        v = md[:20]
        assert v.is_view
        for mod in v.mod.values():
            assert mod._X is _UNSET
        assert np.allclose(np.asarray(v.mod["m1"].X), np.asarray(m1.X)[:20])


class TestUnsDeepcopy:
    def test_nested_non_dict_containers_not_shared(self):
        ad = _adata()
        df = pd.DataFrame({"a": [1, 2]})
        ad.uns["nested"] = {"lst": [df]}
        c = ad.copy()
        c.uns["nested"]["lst"][0].loc[0, "a"] = 99
        assert ad.uns["nested"]["lst"][0].loc[0, "a"] == 1


class TestBacked:
    def test_read_h5ad_backed(self, tmp_path):
        ad = _adata(sparse=True)
        p = str(tmp_path / "b.h5ad")
        ad.write(p)
        b = mu.read_h5ad(p, backed=True)
        assert b.isbacked
        assert isinstance(b.X, BackedMatrix)
        # row-range read without full materialization
        rows = b.X[5:9]
        assert np.allclose(
            np.asarray(rows.todense()), np.asarray(ad.X.todense())[5:9]
        )
        # unordered + duplicate rows
        rows = b.X[np.array([7, 2, 2, 30])]
        assert np.allclose(
            np.asarray(rows.todense()),
            np.asarray(ad.X.todense())[[7, 2, 2, 30]],
        )

    def test_read_h5ad_backed_dense(self, tmp_path):
        ad = _adata(sparse=False)
        p = str(tmp_path / "bd.h5ad")
        ad.write(p)
        b = mu.read_h5ad(p, backed=True)
        assert isinstance(b.X, BackedMatrix)
        got = b.X[np.array([4, 1, 1]), 3:9]
        assert np.allclose(got, np.asarray(ad.X)[[4, 1, 1], 3:9])

    def test_backed_view_reads_only_rows(self, tmp_path):
        ad = _adata(sparse=True, n=60)
        p = str(tmp_path / "bv.h5ad")
        ad.write(p)
        b = mu.read_h5ad(p, backed=True)
        v = b[10:20]
        assert sp.issparse(v.X)  # materialized subset, not a BackedMatrix
        assert np.allclose(
            np.asarray(v.X.todense()), np.asarray(ad.X.todense())[10:20]
        )

    def test_read_h5mu_backed(self, tmp_path):
        m1, m2 = _adata(seed=1), _adata(seed=2, d=8, sparse=True)
        md = mu.MuData({"m1": m1, "m2": m2})
        p = str(tmp_path / "b.h5mu")
        md.write(p)
        b = mu.read_h5mu(p, backed=True)
        assert b.isbacked
        for mod in b.mod.values():
            assert isinstance(mod.X, BackedMatrix)
            assert mod.isbacked
        # filtering a backed object warns then loads (reference
        # muon/_core/preproc.py:655-668)
        with pytest.warns(UserWarning, match="backed"):
            mu.pp.filter_obs(b.mod["m1"], np.arange(b.mod["m1"].n_obs) < 30)
        assert b.mod["m1"].n_obs == 30
        assert not b.mod["m1"].isbacked


class TestOutOfCore:
    """The BASELINE config-5 ingredient: tfidf + lsi on a backed h5mu
    without ever materializing the full count matrix on host."""

    def test_backed_tfidf_lsi(self, tmp_path):
        from muon_tpu import atac as ac
        from muon_tpu.ops.sparse import DeviceBackedCSR

        rng = np.random.default_rng(0)
        n, d = 300, 120
        X = sp.random(n, d, density=0.2, random_state=0, format="csr")
        X.data = np.ceil(X.data * 5).astype(np.float32)
        ad_mem = mu.AnnData(X.copy())
        md = mu.MuData({"atac": ad_mem})
        p = str(tmp_path / "ooc.h5mu")
        md.write(p)

        b = mu.read_h5mu(p, backed=True)
        atac = b.mod["atac"]
        ac.pp.tfidf(atac)
        # X is structure-on-disk + values-on-device, not a host matrix
        assert isinstance(atac.X, DeviceBackedCSR)
        ac.tl.lsi(atac, n_comps=10)
        assert atac.obsm["X_lsi"].shape == (n, 10)

        # equals the in-memory pipeline
        ac.pp.tfidf(ad_mem)
        ac.tl.lsi(ad_mem, n_comps=10)
        # singular subspaces match up to sign
        got, want = atac.obsm["X_lsi"], ad_mem.obsm["X_lsi"]
        for j in range(10):
            c = np.corrcoef(got[:, j], want[:, j])[0, 1]
            assert abs(abs(c) - 1.0) < 1e-3, (j, c)

        # transformed values readable back on host, matching in-memory
        hostX = atac.X.to_memory()
        assert np.allclose(
            np.asarray(hostX.todense()),
            np.asarray(ad_mem.X.todense()),
            atol=1e-5,
        )

    def test_from_backed_multiblock(self, tmp_path):
        """Blockwise ingest must agree with from_scipy exactly, including
        tiny block sizes that force many splices."""
        import h5py
        from muon_tpu.ops.sparse import from_backed, from_scipy, row_sums, col_sums
        from muon_tpu._core.anndata import BackedMatrix

        rng = np.random.default_rng(1)
        X = sp.random(57, 23, density=0.3, random_state=1, format="csr")
        X.data = np.ceil(X.data * 9).astype(np.float32)
        p = str(tmp_path / "m.h5")
        with h5py.File(p, "w") as f:
            g = f.create_group("X")
            g.attrs["shape"] = np.array(X.shape, np.int64)
            g.create_dataset("data", data=X.data)
            g.create_dataset("indices", data=X.indices.astype(np.int64))
            g.create_dataset("indptr", data=X.indptr.astype(np.int64))
        f = h5py.File(p, "r")
        bm = BackedMatrix(f["X"])
        d1 = from_backed(bm, pad_multiple=8, block_nnz=50)  # many blocks
        d2 = from_scipy(X)
        assert d1.nnz == d2.nnz == X.nnz
        assert np.allclose(np.asarray(row_sums(d1)), np.asarray(row_sums(d2)))
        assert np.allclose(np.asarray(col_sums(d1)), np.asarray(col_sums(d2)))
        f.close()

    def test_backed_filter_reads_only_kept_rows(self, tmp_path):
        ad = _adata(sparse=True, n=80)
        p = str(tmp_path / "f.h5ad")
        ad.write(p)
        b = mu.read_h5ad(p, backed=True)
        keep = np.zeros(80, bool)
        keep[10:20] = True
        with pytest.warns(UserWarning, match="backed"):
            mu.pp.filter_obs(b, keep)
        assert b.n_obs == 10
        assert np.allclose(
            np.asarray(b.X.todense()), np.asarray(ad.X.todense())[10:20]
        )

    def test_backed_negative_row_indices(self, tmp_path):
        """BackedMatrix row reads accept negative indices like to_memory()
        did (ADVICE r2: indptr[-1] corrupted sparse reads, h5py rejected
        dense fancy reads)."""
        for sparse in (True, False):
            ad = _adata(sparse=sparse, n=40)
            p = str(tmp_path / f"neg_{int(sparse)}.h5ad")
            ad.write(p)
            b = mu.read_h5ad(p, backed=True)
            got = b.X[np.array([-1, 0, -40])]
            if hasattr(got, "todense"):
                got = np.asarray(got.todense())
            full = ad.X
            if hasattr(full, "todense"):
                full = np.asarray(full.todense())
            assert np.allclose(got[0], full[-1])
            assert np.allclose(got[1], full[0])
            assert np.allclose(got[2], full[0])
