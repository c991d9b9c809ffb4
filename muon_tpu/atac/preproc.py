"""ATAC preprocessing (``ac.pp``): TF-IDF, binarize, scopen.

TPU-native reimplementation of reference muon/_atac/preproc.py. The
sparse path never densifies: TF-IDF is a fused Pallas/XLA kernel over the
COO value vector (muon_tpu.ops.sparse.tfidf_data), preserving the exact
sparsity structure like the reference's diagonal-matmul trick
(muon/_atac/preproc.py:92-114).
"""

from __future__ import annotations

from typing import Optional, Union
from warnings import warn

import numpy as np
from scipy.sparse import issparse

from .._core.anndata import AnnData
from .._core.mudata import MuData

__all__ = ["tfidf", "binarize", "scopen"]


def _get_atac(data):
    if isinstance(data, AnnData):
        return data
    if isinstance(data, MuData) and "atac" in data.mod:
        return data.mod["atac"]
    raise TypeError("Expected AnnData or MuData object with 'atac' modality")


def tfidf(
    data: Union[AnnData, MuData],
    log_tf: bool = True,
    log_idf: bool = True,
    log_tfidf: bool = False,
    scale_factor: Union[int, float] = 1e4,
    inplace: bool = True,
    copy: bool = False,
    from_layer: Optional[str] = None,
    to_layer: Optional[str] = None,
    mesh=None,
):
    """TF-IDF transform of peak counts (reference muon/_atac/preproc.py:16-129).

    TF: counts normalised per cell (× scale_factor, log1p optional);
    IDF: n_cells / per-peak counts (log1p optional); returns TF·IDF.

    ``mesh`` (or the ``mu.set_options(mesh=...)`` global): a
    jax.sharding.Mesh with a "cells" axis — sparse input is then
    row-sharded over the mesh and transformed by the SPMD kernel
    (parallel/pipeline.sharded_tfidf_data, IDF column sums psum'd over
    "cells"); the result carries its device shards for ``ac.tl.lsi``.
    """
    adata = _get_atac(data)
    from .._core.config import current_mesh

    mesh = current_mesh(mesh)

    if log_tfidf and (log_tf or log_idf):
        raise AttributeError(
            "When returning log(TF*IDF), applying neither log(TF) nor "
            "log(IDF) is possible."
        )
    if copy and not inplace:
        raise ValueError("`copy=True` cannot be used with `inplace=False`.")
    if to_layer is not None and not inplace:
        raise ValueError(
            f"`to_layer='{to_layer}'` cannot be used with `inplace=False`."
        )

    if copy:
        adata = adata.copy()

    counts = adata.X if from_layer is None else adata.layers[from_layer]

    if to_layer is not None and to_layer in adata.layers:
        warn(f"Existing layer '{to_layer}' will be overwritten")

    from .._core.anndata import BackedMatrix

    if isinstance(counts, BackedMatrix) and getattr(counts, "_sparse", False):
        # out-of-core path: stream blocks from disk to device, keep the
        # transformed values device-resident and the structure on disk —
        # the full matrix never resides in host memory
        from ..ops import sparse as dsp

        dX = dsp.from_backed(counts)
        new_data = dsp.tfidf_data(
            dX, log_tf=log_tf, log_idf=log_idf, log_tfidf=log_tfidf,
            scale_factor=scale_factor,
        )
        res = dsp.DeviceBackedCSR(
            counts._h5, dX._replace(data=new_data), counts.shape, dX.nnz
        )
    elif issparse(counts) and mesh is not None:
        from ..parallel.pipeline import (
            shard_rows, sharded_tfidf_data, sharded_values_to_scipy,
        )

        X = counts.tocsr()
        Xs = shard_rows(X, mesh)
        Xs = sharded_tfidf_data(
            Xs, log_tf=log_tf, log_idf=log_idf, log_tfidf=log_tfidf,
            scale_factor=scale_factor,
        )
        res = sharded_values_to_scipy(Xs, X)
    elif issparse(counts):
        from ..ops import sparse as dsp

        X = counts.tocsr()
        dX = dsp.from_scipy(X)
        new_data = dsp.tfidf_data(
            dX, log_tf=log_tf, log_idf=log_idf, log_tfidf=log_tfidf,
            scale_factor=scale_factor,
        )
        # values stay device-resident; downstream lsi/pca skip the re-upload
        res = dsp.to_scipy_data(X, new_data, device_X=dX)
    else:
        # dense input: tiny/test-scale data — compute in f64 on host for
        # bit-parity with the reference's numpy path (golden values in
        # tests/test_atac_preproc.py). The sparse device path above is the
        # production path.
        Xd = np.asarray(counts, dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            tf = Xd / Xd.sum(axis=1, keepdims=True)
        tf = np.nan_to_num(tf)
        if scale_factor is not None and scale_factor not in (0, 1):
            tf = tf * scale_factor
        if log_tf:
            tf = np.log1p(tf)
        with np.errstate(divide="ignore", invalid="ignore"):
            idf = Xd.shape[0] / Xd.sum(axis=0, keepdims=True)
        if log_idf:
            idf = np.log1p(idf)
        res = tf * idf
        if log_tfidf:
            res = np.log1p(res)
        res = np.nan_to_num(res, nan=0.0)

    if not inplace:
        return res
    if to_layer is not None:
        adata.layers[to_layer] = res
    else:
        adata.X = res
    if copy:
        return adata
    return None


def binarize(
    data: Union[AnnData, MuData], inplace: bool = True, copy: bool = False
):
    """Make nonzero counts 1 (reference muon/_atac/preproc.py:132-152)."""
    adata = _get_atac(data)
    if copy and not inplace:
        raise ValueError("`copy=True` cannot be used with `inplace=False`.")
    if copy:
        adata = adata.copy()
    if issparse(adata.X):
        if inplace or copy:
            adata.X.data = (adata.X.data != 0).astype(adata.X.data.dtype)
        else:
            X = adata.X.copy()
            X.data = (X.data != 0).astype(X.data.dtype)
            return X
    else:
        if inplace or copy:
            adata.X = (np.asarray(adata.X) != 0).astype(np.float32)
        else:
            return (np.asarray(adata.X) != 0).astype(np.float32)
    if copy:
        return adata
    return None


def scopen(data, *args, **kwargs):
    """Bounded-NMF imputation of binarized peaks (reference
    muon/_atac/preproc.py:155-236). Implemented natively in
    muon_tpu.ops.nmf (jit-compiled multiplicative updates)."""
    from ..ops.nmf import scopen_impute

    return scopen_impute(_get_atac(data), *args, **kwargs)
