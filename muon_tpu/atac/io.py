"""ATAC readers (``ac.read_10x_h5`` etc.) — reference muon/_atac/io.py."""

from .._core.io import read_anndata_10x_h5, read_anndata_10x_mtx


def read_10x_h5(filename, *args, **kwargs):
    """Read 10x h5, keep only Peaks features (reference muon/_atac/io.py:11-22)."""
    adata = read_anndata_10x_h5(filename)
    if "feature_types" in adata.var.columns:
        adata = adata[:, (adata.var["feature_types"] == "Peaks").to_numpy()].copy()
    from .files import initialise_default_files
    try:
        from .._core.mudata import MuData

        mdata = MuData({"atac": adata})
        initialise_default_files(mdata, filename)
    except Exception:
        pass
    return adata


def read_10x_mtx(path, *args, **kwargs):
    adata = read_anndata_10x_mtx(path)
    if "feature_types" in adata.var.columns:
        adata = adata[:, (adata.var["feature_types"] == "Peaks").to_numpy()].copy()
    return adata
