"""ATAC readers (``ac.read_10x_h5``, ``ac.read_snap``) — reference
muon/_atac/io.py:11-127."""

from __future__ import annotations

import numpy as np
import pandas as pd

from .._core.io import read_anndata_10x_h5, read_anndata_10x_mtx
from .._core.anndata import AnnData

__all__ = ["read_10x_h5", "read_10x_mtx", "read_snap"]


def read_10x_h5(filename, *args, **kwargs):
    """Read 10x h5 keeping only Peaks features and locating CellRanger
    sidecar files (reference muon/_atac/io.py:11-22)."""
    adata = read_anndata_10x_h5(filename)
    if "feature_types" in adata.var.columns:
        adata = adata[:, (adata.var["feature_types"] == "Peaks").to_numpy()].copy()
    try:
        from .tools import initialise_default_files

        initialise_default_files(adata, filename)
    except Exception:
        pass
    return adata


def read_10x_mtx(path, *args, **kwargs):
    """Read 10x mtx keeping only Peaks features."""
    adata = read_anndata_10x_mtx(path)
    if "feature_types" in adata.var.columns:
        adata = adata[:, (adata.var["feature_types"] == "Peaks").to_numpy()].copy()
    return adata


def read_snap(filename, matrix: str = "PM") -> AnnData:
    """Read a .snap (snaptools) HDF5 file into AnnData (reference
    muon/_atac/io.py:25-127): PM (peaks), GM (genes) or AM/bins matrix in
    COO triplets + barcode metadata from /BD."""
    import h5py
    from scipy.sparse import coo_matrix

    matrix = matrix.upper()
    with h5py.File(filename, "r") as f:
        if "BD" not in f:
            raise ValueError(f"{filename} does not look like a .snap file (no /BD)")
        barcodes = [
            b.decode() if isinstance(b, bytes) else str(b) for b in f["BD/name"][:]
        ]
        obs = pd.DataFrame(index=pd.Index(barcodes, name="barcode"))
        # barcode QC metadata columns
        for key in f["BD"].keys():
            if key == "name":
                continue
            try:
                obs[key] = np.asarray(f[f"BD/{key}"][:])
            except Exception:
                pass

        if matrix == "PM":
            group, name_field = "PM", "peakChrom"
            if "PM" not in f:
                raise ValueError(f"No peak matrix (PM) in {filename}")
            chrom = [c.decode() for c in f["PM/peakChrom"][:]]
            start = np.asarray(f["PM/peakStart"][:])
            end = np.asarray(f["PM/peakEnd"][:])
            var = pd.DataFrame(
                {"Chromosome": chrom, "Start": start, "End": end},
                index=[f"{c}:{s}-{e}" for c, s, e in zip(chrom, start, end)],
            )
            idx, idy, count = f["PM/idx"][:], f["PM/idy"][:], f["PM/count"][:]
        elif matrix == "GM":
            if "GM" not in f:
                raise ValueError(f"No gene matrix (GM) in {filename}")
            names = [g.decode() for g in f["GM/name"][:]]
            var = pd.DataFrame(index=names)
            idx, idy, count = f["GM/idx"][:], f["GM/idy"][:], f["GM/count"][:]
        elif matrix.startswith("AM") or matrix.isdigit():
            if "AM" not in f:
                raise ValueError(f"No cells-by-bins matrix (AM) in {filename}")
            bin_sizes = list(f["AM"].keys())
            bs = matrix[2:] or (matrix if matrix.isdigit() else "")
            if not bs:
                bs = bin_sizes[0]
            if str(bs) not in bin_sizes:
                raise ValueError(
                    f"Bin size {bs} not in {filename} (available: {bin_sizes})"
                )
            g = f[f"AM/{bs}"]
            chrom = [c.decode() for c in g["binChrom"][:]]
            start = np.asarray(g["binStart"][:])
            var = pd.DataFrame(
                {"Chromosome": chrom, "Start": start},
                index=[f"{c}:{s}" for c, s in zip(chrom, start)],
            )
            idx, idy, count = g["idx"][:], g["idy"][:], g["count"][:]
        else:
            raise ValueError(f"Unknown matrix {matrix!r}; use PM, GM, or AM<binsize>")

    # snap stores 1-based indices
    X = coo_matrix(
        (count, (np.asarray(idx) - 1, np.asarray(idy) - 1)),
        shape=(obs.shape[0], var.shape[0]),
        dtype=np.float32,
    ).tocsr()
    return AnnData(X=X, obs=obs, var=var)
