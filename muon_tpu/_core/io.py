"""Readers/writers: h5ad / h5mu / 10x Genomics formats.

Reference surface: ``mu.read_10x_h5`` / ``mu.read_10x_mtx``
(muon/_core/io.py:23-107), ``mu.read_h5mu`` / ``mu.read`` with in-file
subpaths like ``"file.h5mu/rna"`` (DESIGN.md:11-31), plus h5ad round-trip.
"""

from __future__ import annotations

import gzip
import os
from pathlib import Path

import numpy as np
import pandas as pd
import h5py
from scipy import sparse as sp
from scipy.io import mmread

from .anndata import AnnData
from .mudata import MuData
from .h5io import read_h5ad, read_h5mu, write_h5ad, write_h5mu, _read_adata_group

__all__ = [
    "read",
    "write",
    "read_h5ad",
    "read_h5mu",
    "write_h5ad",
    "write_h5mu",
    "read_10x_h5",
    "read_10x_mtx",
    "read_anndata_10x_h5",
]


# ---------------------------------------------------------------------------
# 10x HDF5 (CellRanger v3+ format)
# ---------------------------------------------------------------------------


def read_anndata_10x_h5(filename, gex_only: bool = False) -> AnnData:
    """Read a CellRanger .h5 feature-barcode matrix into a single AnnData.

    Layout: ``/matrix`` CSC of shape (n_features, n_barcodes) with a
    ``features`` subgroup (id/name/feature_type/genome[/interval]).
    Equivalent of the scanpy reader used at reference muon/_core/io.py:42.
    """
    with h5py.File(filename, "r") as f:
        if "matrix" not in f:
            raise ValueError(f"{filename} is not a CellRanger v3 h5 file")
        g = f["matrix"]
        shape = tuple(int(x) for x in g["shape"][...])  # (n_features, n_barcodes)
        M = sp.csc_matrix(
            (g["data"][...], g["indices"][...], g["indptr"][...]), shape=shape
        )
        X = M.T.tocsr()  # obs(barcodes) x var(features)
        barcodes = np.array([b.decode() if isinstance(b, bytes) else str(b)
                             for b in g["barcodes"][...]])
        feat = g["features"]
        var = pd.DataFrame(index=pd.Index(
            [v.decode() if isinstance(v, bytes) else str(v) for v in feat["name"][...]],
            name=None,
        ))
        var["gene_ids"] = [v.decode() if isinstance(v, bytes) else str(v)
                           for v in feat["id"][...]]
        var["feature_types"] = [v.decode() if isinstance(v, bytes) else str(v)
                                for v in feat["feature_type"][...]]
        if "genome" in feat:
            var["genome"] = [v.decode() if isinstance(v, bytes) else str(v)
                             for v in feat["genome"][...]]
        if "interval" in feat:
            var["interval"] = [v.decode() if isinstance(v, bytes) else str(v)
                               for v in feat["interval"][...]]
        adata = AnnData(X=X, obs=pd.DataFrame(index=pd.Index(barcodes)), var=var)
        adata.var_names_make_unique()
        if gex_only and "feature_types" in adata.var.columns:
            adata = adata[:, (adata.var["feature_types"] == "Gene Expression").to_numpy()].copy()
        return adata


def read_10x_h5(filename, extended: bool = True, *args, **kwargs) -> MuData:
    """Read 10x h5 into a MuData split by feature type
    (reference muon/_core/io.py:23-72; the ``interval`` var column is kept
    so ATAC peak coordinates survive)."""
    adata = read_anndata_10x_h5(filename, gex_only=False)
    mdata = MuData(adata)
    if extended:
        try:
            from ..atac.tools import initialise_default_files

            initialise_default_files(mdata, filename)
        except Exception:
            pass
    return mdata


# ---------------------------------------------------------------------------
# 10x MTX directory
# ---------------------------------------------------------------------------


def _open_maybe_gz(path):
    p = str(path)
    if os.path.exists(p + ".gz"):
        return gzip.open(p + ".gz", "rt")
    return open(p, "rt")


def read_anndata_10x_mtx(path, gex_only: bool = False) -> AnnData:
    path = Path(path)
    mtx = path / "matrix.mtx"
    mtx_file = str(mtx) + ".gz" if (path / "matrix.mtx.gz").exists() else str(mtx)
    M = mmread(mtx_file).tocsr()
    feat_file = "features.tsv" if (path / "features.tsv").exists() or (
        path / "features.tsv.gz"
    ).exists() else "genes.tsv"
    with _open_maybe_gz(path / feat_file) as fh:
        feats = pd.read_csv(fh, sep="\t", header=None)
    with _open_maybe_gz(path / "barcodes.tsv") as fh:
        barcodes = pd.read_csv(fh, sep="\t", header=None)[0].astype(str).to_numpy()
    X = M.T.tocsr()
    var = pd.DataFrame(index=pd.Index(feats[1].astype(str) if feats.shape[1] > 1
                                      else feats[0].astype(str)))
    var["gene_ids"] = feats[0].astype(str).to_numpy()
    if feats.shape[1] > 2:
        var["feature_types"] = feats[2].astype(str).to_numpy()
    if feats.shape[1] > 5:
        var["interval"] = (
            feats[3].astype(str) + ":" + feats[4].astype(str) + "-" + feats[5].astype(str)
        ).to_numpy()
    adata = AnnData(X=X, obs=pd.DataFrame(index=pd.Index(barcodes)), var=var)
    adata.var_names_make_unique()
    if gex_only and "feature_types" in adata.var.columns:
        adata = adata[:, (adata.var["feature_types"] == "Gene Expression").to_numpy()].copy()
    return adata


def read_10x_mtx(path, extended: bool = True, *args, **kwargs) -> MuData:
    """Read a 10x mtx directory into MuData (reference muon/_core/io.py:75-107)."""
    adata = read_anndata_10x_mtx(path, gex_only=False)
    mdata = MuData(adata)
    if extended:
        try:
            from ..atac.tools import initialise_default_files

            initialise_default_files(mdata, path)
        except Exception:
            pass
    return mdata


# ---------------------------------------------------------------------------
# generic read/write dispatch
# ---------------------------------------------------------------------------


def read(path, backed=None):
    """Read .h5mu / .h5ad, with optional in-file subpath:
    ``read("file.h5mu/rna")`` returns just that modality
    (reference DESIGN.md:11-31, docs/source/io/output.rst)."""
    p = str(path)
    if ".h5mu" in p:
        base, _, sub = p.partition(".h5mu")
        fname = base + ".h5mu"
        sub = sub.lstrip("/")
        if sub:
            with h5py.File(fname, "r") as f:
                return _read_adata_group(f["mod"][sub])
        return read_h5mu(fname, backed=backed)
    if p.endswith(".h5ad"):
        return read_h5ad(p, backed=backed)
    raise ValueError(f"unknown file format: {path}")


def write(path, data=None):
    """Write MuData (.h5mu), AnnData (.h5ad), or a single modality into an
    existing .h5mu via ``write("file.h5mu/rna", adata)``."""
    p = str(path)
    if ".h5mu" in p:
        base, _, sub = p.partition(".h5mu")
        fname = base + ".h5mu"
        sub = sub.lstrip("/")
        if sub:
            if not isinstance(data, AnnData):
                raise TypeError("writing a subpath requires an AnnData")
            from .h5io import _write_adata_group

            mode = "a" if os.path.exists(fname) else "w"
            with h5py.File(fname, mode) as f:
                mod = f.require_group("mod")
                if sub in mod:
                    del mod[sub]
                g = mod.create_group(sub)
                _write_adata_group(g, data)
            return
        if not isinstance(data, MuData):
            raise TypeError(".h5mu requires a MuData object")
        return write_h5mu(fname, data)
    if p.endswith(".h5ad"):
        if isinstance(data, MuData):
            raise TypeError(".h5ad requires an AnnData object")
        return write_h5ad(p, data)
    raise ValueError(f"unknown file format: {path}")
