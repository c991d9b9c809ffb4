"""Multimodal plotting (``mu.pl``) — self-contained matplotlib/seaborn.

Reimplements the reference's plotting surface (muon/_core/plot.py:21-469)
without the scanpy.pl dependency: values resolve through the cross-
modality key grammar (muon_tpu._core.utils._get_values), categorical
palettes are written back into ``uns["<key>_colors"]`` the way scanpy
consumers expect.
"""

from __future__ import annotations

import os
from typing import Iterable, List, Optional, Sequence, Union

import numpy as np
import pandas as pd

from .anndata import AnnData
from .mudata import MuData
from .utils import _get_values

__all__ = [
    "scatter",
    "embedding",
    "mofa",
    "umap",
    "histogram",
    "mofa_loadings",
]


def _plt():
    import matplotlib

    if os.environ.get("DISPLAY") is None and matplotlib.get_backend() not in (
        "agg",
        "Agg",
    ):
        try:
            matplotlib.use("Agg")
        except Exception:
            pass
    import matplotlib.pyplot as plt

    return plt


# scanpy's default categorical palette (vega_10 derivative) so colors match
# users' expectations when switching over
_PALETTE = [
    "#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
    "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf",
    "#aec7e8", "#ffbb78", "#98df8a", "#ff9896", "#c5b0d5",
    "#c49c94", "#f7b6d2", "#c7c7c7", "#dbdb8d", "#9edae5",
]


def _is_categorical(values) -> bool:
    values = pd.Series(values)
    return (
        isinstance(values.dtype, pd.CategoricalDtype)
        or values.dtype == object
        or values.dtype == bool
        or pd.api.types.is_string_dtype(values)
    )


def _savefig_or_show(prefix: str, show=None, save=None):
    plt = _plt()
    if save:
        fname = save if isinstance(save, str) else f"{prefix}.png"
        if not any(fname.endswith(ext) for ext in (".png", ".pdf", ".svg")):
            fname = f"{prefix}{fname}.png"
        plt.savefig(fname, bbox_inches="tight", dpi=150)
    if show or (show is None and not save):
        plt.show()


def _scatter_panel(ax, xs, ys, values, title, data=None, key=None, **kwargs):
    """One scatter panel: continuous → colormap+colorbar, categorical →
    palette + legend (+ palette write-back to uns)."""
    plt = _plt()
    kwargs.setdefault("s", 12)
    kwargs.setdefault("linewidths", 0)
    if values is None:
        ax.scatter(xs, ys, c="#7f7f7f", **kwargs)
    elif _is_categorical(values):
        ser = pd.Series(np.asarray(values, dtype=object))
        cats = pd.Categorical(ser).categories
        colors = [_PALETTE[i % len(_PALETTE)] for i in range(len(cats))]
        for ci, cat in enumerate(cats):
            m = (ser == cat).to_numpy()
            ax.scatter(xs[m], ys[m], c=colors[ci], label=str(cat), **kwargs)
        ax.legend(
            frameon=False, fontsize="small", markerscale=1.5,
            loc="center left", bbox_to_anchor=(1.0, 0.5),
        )
        if data is not None and key is not None:
            data.uns[f"{key}_colors"] = colors
    else:
        vals = np.asarray(values, dtype=float)
        sc_ = ax.scatter(
            xs, ys, c=vals, cmap=kwargs.pop("cmap", "viridis"), **kwargs
        )
        plt.colorbar(sc_, ax=ax, shrink=0.7)
    if title:
        ax.set_title(title)


def scatter(
    data: Union[AnnData, MuData],
    x: Optional[str] = None,
    y: Optional[str] = None,
    color: Optional[Union[str, Sequence[str]]] = None,
    use_raw: Optional[bool] = None,
    layers: Optional[Union[str, Sequence[str]]] = None,
    show: Optional[bool] = None,
    save: Union[str, bool, None] = None,
    **kwargs,
):
    """Scatter along obs with x/y/color resolved across modalities
    (reference muon/_core/plot.py:21-92): each key may be an obs column,
    a var_name in any modality, or ``mod:key`` / ``obsm:idx``."""
    if isinstance(layers, str) or layers is None:
        layers = [layers, layers, layers]

    xs = np.asarray(
        _get_values(data, x, use_raw=use_raw, layer=layers[0]), dtype=float
    )
    ys = np.asarray(
        _get_values(data, y, use_raw=use_raw, layer=layers[1]), dtype=float
    )

    plt = _plt()
    fig, ax = plt.subplots(figsize=(4.2, 4))
    cvals = (
        _get_values(data, color, use_raw=use_raw, layer=layers[2])
        if color is not None
        else None
    )
    _scatter_panel(
        ax, xs, ys, cvals, color if isinstance(color, str) else None,
        data=data, key=color if isinstance(color, str) else None, **kwargs
    )
    ax.set_xlabel(x)
    ax.set_ylabel(y)
    _savefig_or_show("scatter_", show=show, save=save)
    return ax


def _resolve_basis(data, basis: str):
    """Find the embedding array: global obsm, ``X_``-prefixed, or
    ``mod:basis`` (reference muon/_core/plot.py:142-171)."""
    if isinstance(data, AnnData):
        if basis in data.obsm:
            return data, basis
        if "X_" + basis in data.obsm:
            return data, "X_" + basis
        raise ValueError(f"Basis {basis} is not present in .obsm")

    if basis not in data.obsm and "X_" + basis in data.obsm:
        basis = "X_" + basis
    if basis in data.obsm:
        return data, basis

    try:
        mod, basis_mod = basis.split(":")
    except ValueError:
        raise ValueError(
            f"Basis {basis} is not present in the MuData object (.obsm)"
        )
    if mod not in data.mod:
        raise ValueError(
            f"Modality {mod} is not present in the MuData object with "
            f"modalities {', '.join(data.mod)}"
        )
    adata = data.mod[mod]
    if basis_mod not in adata.obsm:
        if "X_" + basis_mod in adata.obsm:
            basis_mod = "X_" + basis_mod
        elif len(adata.obsm) > 0:
            raise ValueError(
                f"Basis {basis_mod} is not present in the modality {mod} "
                f"with embeddings {', '.join(adata.obsm)}"
            )
        else:
            raise ValueError(
                f"Basis {basis_mod} is not present in the modality {mod} "
                "with no embeddings"
            )
    return adata, basis_mod


def embedding(
    data: Union[AnnData, MuData],
    basis: str,
    color: Optional[Union[str, Sequence[str]]] = None,
    use_raw: Optional[bool] = None,
    layer: Optional[str] = None,
    components=(1, 2),
    show: Optional[bool] = None,
    save: Union[str, bool, None] = None,
    **kwargs,
):
    """Embedding scatter in a (possibly per-modality) basis with colors
    pulled from any modality (reference muon/_core/plot.py:100-270)."""
    host, basis_key = _resolve_basis(data, basis)
    emb = np.asarray(host.obsm[basis_key])
    ix, iy = components[0] - 1, components[1] - 1
    xs, ys = emb[:, ix], emb[:, iy]

    keys: List[Optional[str]]
    if color is None:
        keys = [None]
    elif isinstance(color, str):
        keys = [color]
    elif isinstance(color, Iterable):
        keys = list(color)
    else:
        raise TypeError("Expected color to be a string or an iterable.")

    plt = _plt()
    n = len(keys)
    fig, axes = plt.subplots(1, n, figsize=(4.4 * n, 4), squeeze=False)
    label = basis_key.replace("X_", "").upper()

    # when the basis lives in one modality of a ragged MuData, values
    # resolved on the global object must be subset to the host's obs
    sel = None
    if isinstance(data, MuData) and host is not data:
        if not data.obs_names.equals(host.obs_names):
            sel = data.obs_names.get_indexer_for(host.obs_names)

    for ax, key in zip(axes[0], keys):
        vals = None
        if key is not None:
            if key in host.obs.columns:
                vals = host.obs[key].to_numpy()
            else:
                vals = _get_values(data, key, use_raw=use_raw, layer=layer)
                vals = np.asarray(vals)
                if sel is not None:
                    vals = vals[np.where(sel >= 0, sel, 0)]
        _scatter_panel(ax, xs, ys, vals, key, data=host, key=key, **kwargs)
        ax.set_xlabel(f"{label}{components[0]}")
        ax.set_ylabel(f"{label}{components[1]}")
    _savefig_or_show("embedding_", show=show, save=save)
    return axes[0][0] if n == 1 else list(axes[0])


def mofa(mdata: MuData, **kwargs):
    """Scatter in MOFA factor coordinates (reference muon/_core/plot.py:273)."""
    return embedding(mdata, basis="mofa", **kwargs)


def umap(mdata: MuData, **kwargs):
    """UMAP scatter (reference muon/_core/plot.py:282)."""
    return embedding(mdata, basis="umap", **kwargs)


def histogram(
    data: Union[AnnData, MuData],
    keys: Union[str, Sequence[str]],
    groupby: Optional[Union[str, Sequence[str]]] = None,
    show: Optional[bool] = None,
    save: Union[str, bool, None] = None,
    **kwargs,
):
    """Histogram facets over obs keys / var_names with ≤2 groupby
    categories (reference muon/_core/plot.py:296-408)."""
    import seaborn as sns

    if not isinstance(data, (AnnData, MuData)):
        raise TypeError("Expected AnnData or MuData object with 'atac' modality")

    if isinstance(keys, str):
        keys = [keys]

    obs_keys = [k for k in keys if k in data.obs.columns]
    var_keys = [k for k in keys if k in data.var.index.values]
    assert len(obs_keys) + len(var_keys) == len(
        keys
    ), "Keys should be columns of .obs or some of .var_names"

    df = data.obs.loc[:, obs_keys].copy()
    for k in var_keys:
        df[k] = np.asarray(_get_values(data, k), dtype=float)

    hist = sns.histplot

    if groupby is None:
        melted = df.melt()
        g = sns.FacetGrid(melted, col="variable", sharey=False, sharex=False)
        g.map(hist, "value", **kwargs)
        for i, ax in enumerate(g.axes[0]):
            ax.set_xlabel(keys[i])
            ax.set_title("")
    else:
        if isinstance(groupby, str):
            groupby = [groupby]
        if len(groupby) > 2:
            raise ValueError("Maximum 2 categories in groupby")
        if len(groupby) == 2 and len(keys) > 1:
            raise ValueError("Maximum 1 category in groupby with more than 1 key")
        if len(groupby) == 1:
            dfg = pd.concat((df, data.obs.loc[:, groupby]), axis=1)
            melted = dfg.melt(id_vars=groupby[0], ignore_index=False)
            g = sns.FacetGrid(
                melted, col=groupby[0], row="variable", sharey=False, sharex=False
            )
            g.map(hist, "value", **kwargs)
        else:
            dfg = pd.concat((df, data.obs.loc[:, groupby]), axis=1)
            g = sns.FacetGrid(
                dfg, col=groupby[0], row=groupby[1], sharey=False, sharex=False
            )
            g.map(hist, keys[0], **kwargs)

    _savefig_or_show("histogram_", show=show, save=save)


def mofa_loadings(
    mdata: MuData,
    factors: Union[str, Sequence[int], None] = None,
    include_lowest: bool = True,
    n_points: Optional[int] = None,
    show: Optional[bool] = None,
    save: Union[str, bool, None] = None,
):
    """Rank variables by their contribution to MOFA factors, per modality
    (reference muon/_core/plot.py:411-469, scanpy pca_loadings style)."""
    if factors is None:
        factors = [1, 2, 3]
    elif isinstance(factors, str):
        factors = [int(x) for x in factors.split(",")]
    factors = np.array(factors) - 1
    if np.any(factors < 0):
        raise ValueError("Component indices must be greater than zero.")

    if n_points is None:
        n_points = min(30, mdata.n_vars)
    elif mdata.n_vars < n_points:
        raise ValueError(
            f"Tried to plot {n_points} variables, but passed mudata only has "
            f"{mdata.n_vars}."
        )

    if "LFs" not in mdata.varm:
        raise KeyError("No .varm['LFs'] found. Run mu.tl.mofa first.")

    plt = _plt()
    W = np.asarray(mdata.varm["LFs"])
    var_names = mdata.var_names.to_numpy()

    for m in mdata.mod:
        mask = np.asarray(mdata.varmap[m]) != 0
        Wm = W[mask]
        names_m = var_names[mask]
        n_pts = min(n_points, Wm.shape[0])
        fig, axes = plt.subplots(
            1, len(factors), figsize=(3.4 * len(factors), 3.4), squeeze=False
        )
        for ax, f in zip(axes[0], factors):
            w = Wm[:, f]
            order = np.argsort(-w)
            if include_lowest:
                k = max(n_pts // 2, 1)
                idx = np.concatenate([order[:k], order[-k:]])
            else:
                idx = order[:n_pts]
            ys = w[idx]
            ax.scatter(np.arange(len(idx)), ys, s=8, c="k")
            for i, j in enumerate(idx):
                ax.annotate(
                    str(names_m[j]), (i, ys[i]), fontsize=6, rotation=90,
                    ha="center", va="bottom",
                )
            ax.set_title(f"{m}: factor {f + 1}")
            ax.set_xticks([])
        _savefig_or_show("mofa_loadings_", show=show, save=save)
