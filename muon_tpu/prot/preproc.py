"""Protein/CITE-seq preprocessing (``pt.pp``): DSB and CLR.

TPU-native reimplementation of reference muon/_prot/preproc.py. The
reference's per-cell double-GMM Python loop (its hot path,
muon/_prot/preproc.py:189-198) is replaced by one vmapped EM program
(muon_tpu.ops.gmm); CLR's sparse path is segment-sum device kernels over
the CSR/CSC value vector.
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple, Union
from warnings import warn

import numpy as np
import pandas as pd
from scipy.sparse import issparse, csc_matrix, csr_matrix

from .._core.anndata import AnnData
from .._core.mudata import MuData

__all__ = ["dsb", "clr"]


def dsb(
    data: Union[AnnData, MuData],
    data_raw: Optional[Union[AnnData, MuData]] = None,
    pseudocount: int = 10,
    denoise_counts: bool = True,
    isotype_controls: Optional[Iterable[str]] = None,
    empty_counts_range: Optional[Tuple[float, float]] = None,
    cell_counts_range: Optional[Tuple[float, float]] = None,
    scale_factor: str = "standardize",
    quantile_clipping: bool = False,
    quantile_clip: Tuple[float, float] = (0.001, 0.9995),
    add_layer: bool = False,
    random_state: Optional[int] = None,
) -> Union[None, MuData]:
    """Denoised-and-Scaled-by-Background normalization (Mulè et al. 2020).

    Contract of reference muon/_prot/preproc.py:17-224: empty/cell droplets
    from raw RNA log10-UMI ranges (or a provided raw object); log(X+pc),
    subtract empty mean, ÷ empty std (ddof=1, f64); per-cell 2-GMM
    (tied vs full, BIC-selected) background means; optional isotype-control
    PCA covariate; OLS denoising; quantile clipping.
    """
    toreturn = None
    if data_raw is None:
        if empty_counts_range is None or cell_counts_range is None:
            raise ValueError(
                "without data_raw, `data` must be the unfiltered object and "
                "both empty_counts_range and cell_counts_range are required"
            )
        if max(*empty_counts_range) > min(*cell_counts_range):
            raise ValueError(
                "empty_counts_range and cell_counts_range must not overlap"
            )
        if (
            not isinstance(data, MuData)
            or "prot" not in data.mod
            or "rna" not in data.mod
        ):
            raise TypeError(
                "without data_raw, `data` must be a MuData holding both "
                "'prot' and 'rna' modalities (the unfiltered object)"
            )
        if data.mod["rna"].n_obs != data.mod["prot"].n_obs:
            raise ValueError(
                "different numbers of cells in 'rna' and 'prot' modalities."
            )

        rna_sum = np.asarray(data.mod["rna"].X.sum(axis=1)).squeeze()
        log10umi = np.log10(rna_sum + 1)
        empty_idx = np.where(
            (log10umi >= min(*empty_counts_range))
            & (log10umi < max(*empty_counts_range))
        )[0]
        cell_idx = np.where(
            (log10umi >= min(*cell_counts_range))
            & (log10umi < max(*cell_counts_range))
        )[0]
        cellidx = data.mod["prot"].obs_names[cell_idx]
        empty = data.mod["prot"][empty_idx, :]

        data = data[cellidx, :].copy()
        cells = data.mod["prot"]
        toreturn = data
    elif isinstance(data_raw, AnnData):
        empty = data_raw
    elif isinstance(data_raw, MuData) and "prot" in data_raw.mod:
        empty = data_raw.mod["prot"]
    else:
        raise TypeError(
            "data_raw must be an AnnData or a MuData object with 'prot' modality"
        )

    if isinstance(data, AnnData):
        cells = data
    elif isinstance(data, MuData) and "prot" in data.mod:
        cells = data.mod["prot"]
    else:
        raise TypeError(
            "data must be an AnnData or a MuData object with 'prot' modality"
        )

    if pseudocount < 0:
        raise ValueError("pseudocount cannot be negative")

    if quantile_clipping:
        if len(quantile_clip) != 2:
            raise ValueError("quantile_clip must have exactly 2 values")
        qc = np.asarray(quantile_clip)
        if np.any((qc < 0) | (qc > 1)):
            raise ValueError("quantile_clip must be between 0 and 1")

    if cells.shape[1] != empty.shape[1]:
        raise ValueError("data and data_raw have different numbers of proteins")

    if empty_counts_range is None:  # data_raw is not None
        warn(
            "empty_counts_range values are not provided, treating all the "
            "non-cells as empty droplets"
        )
        keep = ~empty.obs_names.isin(cells.obs_names)
        empty = empty[np.where(keep)[0], :]
    elif data_raw is not None:
        warn(
            "empty_counts_range will be deprecated in the future versions",
            DeprecationWarning,
            stacklevel=2,
        )
        if not isinstance(data_raw, MuData) or "rna" not in data_raw.mod:
            warn(
                "data_raw must be a MuData object with 'rna' modality, "
                "ignoring empty_counts_range and treating all the non-cells "
                "as empty droplets"
            )
            keep = ~empty.obs_names.isin(cells.obs_names)
            empty = empty[np.where(keep)[0], :]
        else:
            rna_sum = np.asarray(data_raw.mod["rna"].X.sum(axis=1)).squeeze()
            log10umi = np.log10(rna_sum + 1)
            bc_umis = pd.Series(log10umi, index=data_raw.mod["rna"].obs_names)
            in_range = (bc_umis >= min(*empty_counts_range)) & (
                bc_umis < max(*empty_counts_range)
            )
            empty_droplets = bc_umis.index[in_range].values
            n_orig = len(empty_droplets)
            cellset = set(cells.obs_names)
            empty_droplets = np.array(
                [b for b in empty_droplets if b not in cellset]
            )
            if len(empty_droplets) != n_orig:
                warn(
                    f"Dropping {n_orig - len(empty_droplets)} empty droplets "
                    "as they are already defined as cells"
                )
            eidx = empty.obs_names.get_indexer(empty_droplets)
            empty = empty[eidx, :].copy()

    if data_raw is not None and cell_counts_range is not None:
        warn("cell_counts_range values are ignored since cells are provided in data")

    import jax.numpy as jnp

    empty_X = empty.X.toarray() if issparse(empty.X) else np.asarray(empty.X)
    cells_X = cells.X.toarray() if issparse(cells.X) else np.asarray(cells.X)
    empty_scaled = np.log(empty_X + pseudocount)
    cells_scaled = np.log(cells_X + pseudocount)

    cells_dtype = cells_scaled.dtype
    # f64 moments over empty droplets, as the reference does
    # (muon/_prot/preproc.py:172-177)
    cells_scaled = cells_scaled - empty_scaled.mean(axis=0, dtype=np.float64)
    if scale_factor == "standardize":
        cells_scaled = cells_scaled / empty_scaled.std(
            axis=0, ddof=1, dtype=np.float64
        )
    if cells_dtype.kind == "f":
        cells_scaled = cells_scaled.astype(cells_dtype, copy=False)

    if denoise_counts:
        from ..ops.gmm import background_means

        bgmeans = background_means(
            cells_scaled.astype(np.float32),
            seed=0 if random_state is None else int(random_state),
        ).astype(cells_scaled.dtype)

        if isotype_controls is not None:
            ctrl_idx = np.where(cells.var_names.isin(set(isotype_controls)))[0]
            if len(ctrl_idx) < len(list(isotype_controls)):
                warn("Some isotype controls are not present in the data.")
            feats = np.hstack(
                (cells_scaled[:, ctrl_idx], bgmeans.reshape(-1, 1))
            )
            # PCA(n_components=1, whiten=True) on device
            mu = feats.mean(axis=0)
            Fc = jnp.asarray(feats - mu)
            U, s, _ = jnp.linalg.svd(Fc, full_matrices=False)
            covar = np.asarray(U[:, :1]) * np.sqrt(feats.shape[0] - 1)
        else:
            covar = bgmeans[:, np.newaxis]

        # OLS with intercept, closed form on device; the reference subtracts
        # the covariate effect while keeping the intercept
        # (muon/_prot/preproc.py:211-214)
        A = jnp.concatenate(
            [jnp.ones((covar.shape[0], 1)), jnp.asarray(covar)], axis=1
        )
        coef, *_ = jnp.linalg.lstsq(A, jnp.asarray(cells_scaled))
        pred_minus_intercept = jnp.asarray(covar) @ coef[1:]
        cells_scaled = cells_scaled - np.asarray(
            pred_minus_intercept, dtype=cells_scaled.dtype
        )

    if quantile_clipping:
        quantiles = np.quantile(cells_scaled, quantile_clip)
        cells_scaled = np.clip(
            cells_scaled, a_min=quantiles.min(), a_max=quantiles.max()
        )

    if add_layer:
        cells.layers["dsb"] = cells_scaled
    else:
        cells.X = cells_scaled
    return toreturn


def clr(
    adata: AnnData,
    inplace: bool = True,
    axis: int = 0,
    flavor: str = "seurat",
):
    """Centered-log-ratio normalization, 3 flavors (reference
    muon/_prot/preproc.py:227-299):

    - ``seurat``: log1p-based, sparsity-preserving;
    - ``stoeckius``: +1 pseudocount, dense geometric mean;
    - ``standard``: plain CLR (may produce −inf on zeros).
    """
    if axis not in (0, 1):
        raise ValueError(
            "Invalid value for `axis` provided. Admissible options are `0` and `1`."
        )
    if not inplace:
        adata = adata.copy()

    x = adata.X

    if flavor == "seurat":
        if issparse(x):
            if axis == 0 and not isinstance(x, csc_matrix):
                warn(
                    "adata.X is sparse but not in CSC format. CSC format "
                    "required for `axis=0`. Converting to CSC."
                )
                x = x.tocsc()
            elif axis == 1 and not isinstance(x, csr_matrix):
                warn(
                    "adata.X is sparse but not in CSR format. CSR format "
                    "required for `axis=1`. Converting to CSR."
                )
                x = x.tocsr()
            import jax.numpy as jnp

            # mean over the FULL axis length (zeros contribute log1p(0)=0),
            # computed as a segment sum over the value vector on device
            n_along = x.shape[axis]
            log_data = jnp.log1p(jnp.asarray(x.data))
            indptr = jnp.asarray(x.indptr)
            seg_sums = jnp.diff(
                jnp.concatenate([jnp.zeros(1, log_data.dtype),
                                 jnp.cumsum(log_data)])[indptr]
            )
            logmean = np.asarray(seg_sums) / n_along
            nnz = np.diff(x.indptr)
            new_data = np.asarray(
                jnp.log1p(
                    jnp.asarray(x.data)
                    / jnp.exp(jnp.asarray(np.repeat(logmean, nnz)))
                )
            )
            x.data[:] = new_data.astype(x.data.dtype)
            # in-place mutation invalidates any device-residency tag
            # (ops/sparse.from_scipy checks identity of .data, which an
            # in-place write preserves — drop the cache explicitly)
            if hasattr(x, "_muon_tpu_device"):
                del x._muon_tpu_device
        else:
            import jax.numpy as jnp

            from ..ops.device import register_dense

            xd = jnp.asarray(x)
            logmean = jnp.log1p(xd).mean(axis=axis, keepdims=True)
            res_dev = jnp.log1p(xd / jnp.exp(logmean))
            x = np.asarray(res_dev, dtype=np.asarray(x).dtype)
            # downstream pca/neighbors re-enter via the residency tag
            # instead of re-uploading the (1M×D) normalized matrix
            if x.dtype == res_dev.dtype:
                register_dense(x, res_dev)
    elif flavor in ("stoeckius", "standard"):
        import jax.numpy as jnp

        if issparse(x):
            x = x.toarray()
        xd = jnp.asarray(np.asarray(x, dtype=np.float64))
        if flavor == "stoeckius":
            xd = xd + 1
        # geometric mean along axis
        gm = jnp.exp(jnp.log(xd).mean(axis=axis, keepdims=True))
        x = np.asarray(jnp.log(xd / gm))
    else:
        raise ValueError(f"Unknown flavor `{flavor}`.")

    adata.X = x
    return None if inplace else adata
