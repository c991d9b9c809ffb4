"""Multimodal preprocessing (``mu.pp``).

TPU-first reimplementation of the reference surface
(muon/_core/preproc.py): in-place filtering, obs intersection/sampling,
L2 normalization, and WNN multimodal neighbors. Container bookkeeping is
host-side; all heavy numerics route through ``muon_tpu.ops`` (JAX/XLA/
Pallas) instead of numba/pynndescent.
"""

from __future__ import annotations

import warnings
from functools import reduce
from typing import Callable, Optional, Sequence, Union

import numpy as np
import pandas as pd
from scipy import sparse as sp

from .anndata import AnnData
from .mudata import MuData

__all__ = [
    "l2norm",
    "pca",
    "neighbors",
    "intersect_obs",
    "filter_obs",
    "filter_var",
    "sample_obs",
]


# ---------------------------------------------------------------------------
# in-place filtering (contract: reference muon/_core/preproc.py:675-831)
# ---------------------------------------------------------------------------


def _resolve_filter_mask(data, attr, key, func):
    """Resolve (key, func) into a boolean keep-mask along `attr`."""
    df = getattr(data, attr)
    names = getattr(data, f"{attr}_names")
    other = "obs" if attr == "var" else "var"
    other_names = getattr(data, f"{other}_names")

    if isinstance(key, str):
        if key in df.columns:
            if func is None:
                if df[key].dtype == bool:
                    func = lambda x: x  # noqa: E731
                else:
                    raise ValueError(
                        f"Function has to be provided since {key} is not boolean"
                    )
            subset = func(df[key].to_numpy())
        elif key in other_names:
            j = np.flatnonzero(other_names == key)
            X = data.X
            col = X[:, j] if attr == "obs" else X[j, :]
            if sp.issparse(col):
                col = np.asarray(col.todense())
            subset = func(np.asarray(col).reshape(-1))
        else:
            raise ValueError(
                f"Column name from .{attr} or one of the {other}_names was "
                f"expected but got {key}."
            )
    else:
        if func is not None:
            raise ValueError(
                f"When providing {attr}_names directly, func has to be None."
            )
        key = np.asarray(key)
        if key.ndim != 1:
            raise ValueError(
                f"filter key must be a column name, a sequence of names, or a "
                f"1-D boolean mask; got {key!r}"
            )
        if key.dtype == bool:
            subset = key
        else:
            subset = np.asarray(names.isin(key))
    subset = np.asarray(subset)
    if subset.dtype != bool:
        raise ValueError("filter predicate must produce a boolean mask")
    return subset


def _filter_attr(data, attr, key, func=None):
    if data.is_view:
        raise ValueError(
            "The provided object is a view. In-place filtering does not "
            "operate on views."
        )
    if data.isbacked and isinstance(data, MuData):
        warnings.warn(
            "MuData object is backed. The requested subset of the .X matrices "
            "of its modalities will be read into memory.",
            UserWarning,
        )
    assert attr in ("obs", "var")

    mask = _resolve_filter_mask(data, attr, key, func)

    if isinstance(data, AnnData):
        if attr == "obs":
            data._inplace_subset_obs(mask)
        else:
            data._inplace_subset_var(mask)
        return

    # ---- MuData branch ----------------------------------------------------
    idx = np.flatnonzero(mask)
    df = getattr(data, attr)
    setattr(data, f"_{attr}", df.iloc[idx].copy())

    attrm = getattr(data, f"{attr}m")
    attrp = getattr(data, f"{attr}p")
    new_m = {k: (v.iloc[idx] if isinstance(v, pd.DataFrame) else np.asarray(v)[idx])
             for k, v in attrm.items() if k not in data.mod}
    new_p = {k: v[idx][:, idx] for k, v in attrp.items()}

    attrmap = getattr(data, f"{attr}map")
    new_maps = {}
    new_masks = {}
    for mname, ad in data.mod.items():
        sub_map = attrmap[mname][idx].astype(np.int64)
        present = sub_map > 0
        local_keep = sub_map[present] - 1  # positions in mod, global order
        keep_sorted = np.sort(local_keep)  # modality keeps its own order
        if attr == "obs":
            ad._inplace_subset_obs(keep_sorted)
        else:
            ad._inplace_subset_var(keep_sorted)
        # re-rank: new 1-based local position for every kept global row
        rank = np.empty(local_keep.size, dtype=np.int64)
        rank[np.argsort(local_keep, kind="stable")] = np.arange(
            1, local_keep.size + 1
        )
        out_map = np.zeros(sub_map.size, dtype=np.uint32)
        out_map[present] = rank
        new_maps[mname] = out_map
        new_masks[mname] = present
    attrmap.clear()
    attrmap.update(new_maps)

    # rebuild aligned dicts against the new axis length
    am = getattr(data, f"_{attr}m_dict")
    am._data.clear()
    for k, v in new_masks.items():
        am[k] = v
    for k, v in new_m.items():
        try:
            am[k] = v
        except ValueError:
            pass
    ap = getattr(data, f"_{attr}p_dict")
    ap._data.clear()
    for k, v in new_p.items():
        try:
            ap[k] = v
        except ValueError:
            pass


def filter_obs(
    data: Union[AnnData, MuData],
    var: Union[str, Sequence[str]],
    func: Optional[Callable] = None,
) -> None:
    """Filter observations in place using any column in .obs, a var_name's
    values in .X, obs_names, or a boolean mask
    (reference muon/_core/preproc.py:834-856)."""
    _filter_attr(data, "obs", var, func)


def filter_var(
    data: Union[AnnData, MuData],
    var: Union[str, Sequence[str]],
    func: Optional[Callable] = None,
) -> None:
    """Filter variables in place (reference muon/_core/preproc.py:859-881)."""
    _filter_attr(data, "var", var, func)


def intersect_obs(mdata: MuData) -> None:
    """Subset observations in place to those present in all modalities
    (reference muon/_core/preproc.py:646-669)."""
    if mdata.isbacked:
        warnings.warn(
            "MuData object is backed. It might be required to re-read the "
            "object with `backed=False` to make the intersection work."
        )
    common_obs = reduce(np.intersect1d, [m.obs_names for m in mdata.mod.values()])
    for mod in mdata.mod:
        filter_obs(mdata.mod[mod], common_obs)
    mdata.update_obs()


def sample_obs(
    data: Union[AnnData, MuData],
    frac: float = 0.1,
    groupby: Optional[str] = None,
    min_n: Optional[int] = None,
    random_state=None,
):
    """Subsample observations, optionally stratified by a categorical .obs
    column; returns a view (reference muon/_core/preproc.py:887-931).
    ``random_state`` seeds the draw (repo-wide reproducibility convention;
    the reference uses the global numpy state)."""
    rng = np.random.default_rng(random_state)
    if groupby is None:
        new_n = int(np.ceil(data.n_obs * frac))
        if min_n is not None and new_n < min_n:
            new_n = min_n
        obs_indices = rng.choice(data.n_obs, size=new_n, replace=False)
        return data[obs_indices]
    if groupby not in data.obs:
        raise ValueError(f"{groupby} is not in .obs")
    if not isinstance(data.obs[groupby].dtype, pd.CategoricalDtype):
        raise TypeError(f".obs['{groupby}'] is not categorical")
    obs_names = []
    for cat in data.obs[groupby].cat.categories:
        view = data[(data.obs[groupby] == cat).to_numpy()]
        new_n = int(np.ceil(view.n_obs * frac))
        if min_n is not None and new_n < min_n:
            new_n = min_n
        obs_names.append(
            rng.choice(view.obs_names.to_numpy(), size=new_n, replace=False)
        )
    return data[np.concatenate(obs_names)]


# ---------------------------------------------------------------------------
# L2 norm
# ---------------------------------------------------------------------------


def _l2norm_inplace(X, n_dims=None):
    if sp.issparse(X):
        norms = sp.linalg.norm(X, axis=1)
        norms[norms == 0] = 1.0
        inv = sp.dia_matrix((1.0 / norms, 0), shape=(X.shape[0], X.shape[0]))
        return (inv @ X).asformat(X.format)
    X = np.asarray(X, dtype=np.float64 if X.dtype == np.float64 else np.float32)
    if n_dims is not None and n_dims > 0:
        X = X[:, :n_dims]
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return X / norms


def l2norm(
    mdata: Union[MuData, AnnData],
    mod: Optional[Union[Sequence[str], str]] = None,
    rep: Optional[Union[Sequence[str], str]] = None,
    n_pcs: Optional[Union[Sequence[int], int]] = 0,
    copy: bool = False,
) -> Optional[Union[MuData, AnnData]]:
    """Normalize observations to unit L2 norm, on X or an ``.obsm`` rep
    (reference muon/_core/preproc.py:179-261)."""
    if isinstance(mdata, AnnData):
        adata = mdata.copy() if copy else mdata
        if rep is not None and not isinstance(rep, str):
            rep = list(rep)[0]
        if n_pcs is not None and not isinstance(n_pcs, (int, np.integer)):
            n_pcs = list(n_pcs)[0]
        if rep is None or rep == "X":
            adata.X = _l2norm_inplace(adata.X)
        else:
            key = rep if rep in adata.obsm else f"X_{rep}"
            if key not in adata.obsm:
                raise KeyError(f"representation {rep!r} not found in .obsm")
            n_dims = n_pcs if (n_pcs and "pca" in key.lower()) else None
            adata.obsm[key] = _l2norm_inplace(np.asarray(adata.obsm[key]), n_dims)
        return adata if copy else None

    mdata = mdata.copy() if copy else mdata
    mods = [mod] if isinstance(mod, str) else (list(mod) if mod is not None
                                               else list(mdata.mod))
    if rep is None or isinstance(rep, str):
        reps = {m: rep for m in mods}
    else:
        reps = dict(zip(mods, rep))
    if n_pcs is None or isinstance(n_pcs, (int, np.integer)):
        npcs = {m: n_pcs for m in mods}
    else:
        npcs = dict(zip(mods, n_pcs))
    for m in mods:
        l2norm(mdata.mod[m], rep=reps.get(m), n_pcs=npcs.get(m), copy=False)
    return mdata if copy else None


# ---------------------------------------------------------------------------
# WNN multimodal neighbors — implemented in ops/wnn.py, re-exported here.
# ---------------------------------------------------------------------------


def neighbors(
    mdata: MuData,
    n_neighbors: Optional[int] = None,
    n_bandwidth_neighbors: int = 20,
    n_multineighbors: int = 200,
    neighbor_keys: Optional[dict] = None,
    metric: str = "euclidean",
    low_memory: Optional[bool] = None,
    key_added: Optional[str] = None,
    weight_key: Optional[str] = "mod_weight",
    add_weights_to_modalities: bool = False,
    eps: float = 1e-4,
    copy: bool = False,
    random_state: Optional[int] = 42,
    use_rep: Optional[str] = None,
    n_pcs: Optional[int] = None,
    mesh=None,
) -> Optional[MuData]:
    """Weighted-nearest-neighbors multimodal fusion (Hao et al. 2020;
    Swanson et al. 2020). TPU-native: exact batched kNN + kernel fusion on
    device, replacing the reference's NN-descent/numba path
    (muon/_core/preproc.py:264-640).

    ``mesh`` (or the ``mu.set_options(mesh=...)`` global): run the kNN
    searches and the candidate fusion scoring as SPMD programs sharded
    over the mesh's "cells" axis (parallel/pipeline)."""
    from ..ops.wnn import wnn_neighbors

    return wnn_neighbors(
        mdata,
        n_neighbors=n_neighbors,
        n_bandwidth_neighbors=n_bandwidth_neighbors,
        n_multineighbors=n_multineighbors,
        neighbor_keys=neighbor_keys,
        metric=metric,
        low_memory=low_memory,
        key_added=key_added,
        weight_key=weight_key,
        add_weights_to_modalities=add_weights_to_modalities,
        eps=eps,
        copy=copy,
        random_state=random_state,
        use_rep=use_rep,
        n_pcs=n_pcs,
        mesh=mesh,
    )


def pca(
    data,
    n_comps: int = 50,
    use_highly_variable: bool = False,
    layer=None,
    zero_center: bool = True,
    random_state: int = 0,
):
    """PCA on device (randomized SVD with implicit centering for sparse
    input — muon_tpu.ops.linalg.pca).

    The reference relies on scanpy's ``sc.pp.pca`` for the per-modality
    representations its WNN/MOFA flows consume (SURVEY §2.5 sklearn ledger
    row); this provides the same surface in-framework. Writes
    ``obsm["X_pca"]``, ``varm["PCs"]``, and
    ``uns["pca"]["variance"/"variance_ratio"]`` (scanpy layout).
    """
    from ..ops.linalg import pca as _pca_op

    adata = data
    if isinstance(data, MuData):
        raise TypeError(
            "Run pca per modality (e.g. mu.pp.pca(mdata.mod['rna']))"
        )

    X = adata.X if layer is None else adata.layers[layer]
    mask = None
    if use_highly_variable and "highly_variable" in adata.var.columns:
        mask = adata.var["highly_variable"].astype(bool).to_numpy()
        X = X[:, mask]

    n_comps = min(n_comps, min(X.shape) - (1 if zero_center else 0))
    scores, loadings, ev, evr = _pca_op(
        X, n_comps=n_comps, center=zero_center, seed=random_state
    )
    adata.obsm["X_pca"] = np.asarray(scores)
    PCs = np.zeros((adata.n_vars, n_comps))
    if mask is not None:
        PCs[mask] = np.asarray(loadings)
    else:
        PCs[:] = np.asarray(loadings)
    adata.varm["PCs"] = PCs
    adata.uns["pca"] = {
        "variance": np.asarray(ev),
        "variance_ratio": np.asarray(evr),
        "params": {
            "n_comps": int(n_comps),
            "zero_center": bool(zero_center),
            "use_highly_variable": bool(use_highly_variable),
        },
    }
    return None
