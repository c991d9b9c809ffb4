"""10x / snap reader tests against synthesized CellRanger-format files
(reference io surface: muon/_core/io.py:23-107, muon/_atac/io.py:11-127)."""

import numpy as np
import pandas as pd
import pytest
from scipy import sparse as sp

import muon_tpu as mu
from muon_tpu import atac as ac
from muon_tpu import prot as pt


def _write_10x_h5(path, n_cells=20):
    """CellRanger v3 matrix.h5 with three feature types."""
    import h5py

    rng = np.random.default_rng(0)
    genes = [f"GENE{i}" for i in range(15)]
    peaks = [f"chr1:{i*1000}-{i*1000+500}" for i in range(10)]
    prots = [f"AB{i}" for i in range(5)]
    names = genes + peaks + prots
    ids = [f"ENSG{i}" for i in range(15)] + peaks + [f"AB{i}" for i in range(5)]
    ftypes = (
        [b"Gene Expression"] * 15 + [b"Peaks"] * 10 + [b"Antibody Capture"] * 5
    )
    interval = [f"chr1:{i*100}-{i*100+50}" for i in range(15)] + peaks + [b"NA"] * 5

    # CellRanger layout: CSC matrix of shape (n_features, n_cells)
    Xf = sp.random(30, n_cells, density=0.4, random_state=1, format="csc")
    Xf.data = np.round(Xf.data * 10) + 1
    X = Xf.T.tocsr()  # cells × features view for assertions
    with h5py.File(path, "w") as f:
        g = f.create_group("matrix")
        g.create_dataset("data", data=Xf.data.astype(np.int32))
        g.create_dataset("indices", data=Xf.indices.astype(np.int64))
        g.create_dataset("indptr", data=Xf.indptr.astype(np.int64))
        g.create_dataset("shape", data=np.array([30, n_cells], np.int32))
        g.create_dataset(
            "barcodes",
            data=np.array([f"BC{i}-1".encode() for i in range(n_cells)]),
        )
        feats = g.create_group("features")
        feats.create_dataset("name", data=np.array([s.encode() for s in names]))
        feats.create_dataset(
            "id", data=np.array([s.encode() if isinstance(s, str) else s for s in ids])
        )
        feats.create_dataset("feature_type", data=np.array(ftypes))
        feats.create_dataset(
            "interval",
            data=np.array(
                [s.encode() if isinstance(s, str) else s for s in interval]
            ),
        )
    return X, names


class Test10xH5:
    def test_multimodal_split(self, tmp_path):
        path = str(tmp_path / "matrix.h5")
        X, names = _write_10x_h5(path)
        mdata = mu.read_10x_h5(path)
        assert isinstance(mdata, mu.MuData)
        assert set(mdata.mod) == {"rna", "atac", "prot"}
        assert mdata.mod["rna"].n_vars == 15
        assert mdata.mod["atac"].n_vars == 10
        assert mdata.mod["prot"].n_vars == 5
        assert mdata.n_obs == 20
        # counts round-trip
        np.testing.assert_array_equal(
            np.asarray(mdata.mod["rna"].X.todense()),
            np.asarray(X[:, :15].todense()),
        )
        # interval column patched in (reference muon/_core/io.py:49-64)
        assert "interval" in mdata.mod["rna"].var.columns

    def test_atac_reader_filters_peaks(self, tmp_path):
        path = str(tmp_path / "matrix.h5")
        _write_10x_h5(path)
        adata = ac.read_10x_h5(path)
        assert adata.n_vars == 10
        assert (adata.var["feature_types"] == "Peaks").all()

    def test_prot_reader_filters_antibodies(self, tmp_path):
        path = str(tmp_path / "matrix.h5")
        _write_10x_h5(path)
        adata = pt.read_10x_h5(path)
        assert adata.n_vars == 5


class TestSnap:
    def test_read_snap_pm(self, tmp_path):
        import h5py

        rng = np.random.default_rng(2)
        path = str(tmp_path / "sample.snap")
        n, p = 12, 8
        M = sp.random(n, p, density=0.5, random_state=3, format="coo")
        M.data = np.ceil(M.data * 4)
        with h5py.File(path, "w") as f:
            bd = f.create_group("BD")
            bd.create_dataset(
                "name", data=np.array([f"BC{i}".encode() for i in range(n)])
            )
            bd.create_dataset("TN", data=rng.integers(100, 1000, n))
            pm = f.create_group("PM")
            pm.create_dataset(
                "peakChrom", data=np.array([b"chr1"] * p)
            )
            pm.create_dataset("peakStart", data=np.arange(p) * 1000)
            pm.create_dataset("peakEnd", data=np.arange(p) * 1000 + 500)
            pm.create_dataset("idx", data=M.row + 1)  # snap is 1-based
            pm.create_dataset("idy", data=M.col + 1)
            pm.create_dataset("count", data=M.data.astype(np.int32))
        adata = ac.read_snap(path, matrix="PM")
        assert adata.shape == (n, p)
        np.testing.assert_array_equal(
            np.asarray(adata.X.todense()), M.toarray()
        )
        assert "TN" in adata.obs.columns
        assert adata.var["Chromosome"].iloc[0] == "chr1"

    def test_read_snap_missing_matrix(self, tmp_path):
        import h5py

        path = str(tmp_path / "bad.snap")
        with h5py.File(path, "w") as f:
            bd = f.create_group("BD")
            bd.create_dataset("name", data=np.array([b"BC0"]))
        with pytest.raises(ValueError):
            ac.read_snap(path, matrix="PM")
