"""TF-IDF golden-value tests (contract: reference tests/test_atac_preproc.py,
golden values recorded in BASELINE.md)."""

import numpy as np
import pytest
from scipy.sparse import rand as sprand

import muon_tpu as mu
from muon_tpu import atac as ac


@pytest.fixture()
def adata_dense():
    np.random.seed(2020)
    x = np.abs(np.random.normal(size=(4, 5)))
    return mu.AnnData(x)


@pytest.fixture()
def adata_sparse():
    np.random.seed(2020)
    x = sprand(100, 10, density=0.2, format="csr")
    return mu.AnnData(x)


class TestTFIDF:
    def test_tfidf_golden_dense(self, adata_dense):
        adata = adata_dense.copy()
        ac.pp.tfidf(adata, log_tf=True, log_idf=True)
        assert "%.3f" % adata.X[0, 0] == "4.659"
        assert "%.3f" % adata.X[3, 0] == "4.770"

    def test_tfidf_copy(self, adata_dense):
        adata = adata_dense.copy()
        orig = adata.X[0, 0]
        cp = ac.pp.tfidf(adata, log_tf=True, log_idf=True, copy=True)
        assert adata.X[0, 0] == orig
        assert "%.3f" % cp.X[0, 0] == "4.659"

    def test_tfidf_inplace_false(self, adata_dense):
        orig = adata_dense.X[0, 0]
        res = ac.pp.tfidf(adata_dense, log_tf=True, log_idf=True, inplace=False)
        assert adata_dense.X[0, 0] == orig
        assert "%.3f" % res[0, 0] == "4.659"

    def test_tfidf_to_layer(self, adata_dense):
        adata = adata_dense.copy()
        orig = adata.X[0, 0]
        ac.pp.tfidf(adata, log_tf=True, log_idf=True, to_layer="new")
        assert adata.X[0, 0] == orig
        assert "%.3f" % adata.layers["new"][0, 0] == "4.659"

    def test_tfidf_from_layer(self, adata_dense):
        adata = adata_dense.copy()
        adata.layers["counts"] = np.asarray(adata.X).copy() + 1
        ac.pp.tfidf(adata, from_layer="counts")
        assert "%.3f" % adata.X[0, 0] == "2.856"

    def test_tfidf_golden_sparse(self, adata_sparse):
        ac.pp.tfidf(adata_sparse, log_tf=True, log_idf=True)
        assert "%.3f" % adata_sparse.X[10, 9] == "18.749"
        assert "%.3f" % adata_sparse.X[50, 5] == "0.000"

    def test_tfidf_sparse_structure_preserved(self, adata_sparse):
        nnz_before = adata_sparse.X.nnz
        indptr = adata_sparse.X.indptr.copy()
        ac.pp.tfidf(adata_sparse)
        assert adata_sparse.X.nnz == nnz_before
        assert np.array_equal(adata_sparse.X.indptr, indptr)

    def test_tfidf_log_conflict(self, adata_dense):
        with pytest.raises(AttributeError):
            ac.pp.tfidf(adata_dense, log_tf=True, log_idf=True, log_tfidf=True)

    def test_tfidf_matches_scipy_reference_formula(self, adata_sparse):
        X = adata_sparse.X.copy().astype(np.float64)
        ac.pp.tfidf(adata_sparse)
        # independent numpy recomputation
        dense = X.toarray()
        tf = dense / dense.sum(axis=1, keepdims=True)
        tf = np.nan_to_num(tf) * 1e4
        tf = np.log1p(tf)
        idf = np.log1p(dense.shape[0] / dense.sum(axis=0, keepdims=True))
        expected = tf * idf
        assert np.allclose(adata_sparse.X.toarray(), expected, atol=1e-3)


class TestBinarize:
    def test_binarize_sparse(self, adata_sparse):
        ac.pp.binarize(adata_sparse)
        assert set(np.unique(adata_sparse.X.data)) <= {1.0}

    def test_binarize_dense(self, adata_dense):
        ac.pp.binarize(adata_dense)
        assert set(np.unique(np.asarray(adata_dense.X))) <= {0.0, 1.0}


class TestMuDataDispatch:
    def test_tfidf_on_mudata(self, adata_sparse):
        md = mu.MuData({"atac": adata_sparse})
        ac.pp.tfidf(md)
        assert "%.3f" % md.mod["atac"].X[10, 9] == "18.749"

    def test_tfidf_requires_atac(self):
        md = mu.MuData({"rna": mu.AnnData(np.ones((3, 2)))})
        with pytest.raises(TypeError):
            ac.pp.tfidf(md)
