"""ATAC plotting (``ac.pl``) — self-contained matplotlib/seaborn.

Reimplements reference muon/_atac/plot.py:19-391 without scanpy.pl:
gene-level views aggregate peaks through the peak annotation
(_average_peaks), embeddings delegate to the core embedding renderer,
QC plots (tss_enrichment, fragment_histogram) draw directly.
"""

from __future__ import annotations

import warnings
from collections import defaultdict
from typing import List, Mapping, Optional, Sequence, Union

import numpy as np
import pandas as pd
from scipy.sparse import issparse

from .._core.anndata import AnnData
from .._core.mudata import MuData
from .._core import plot as _core_pl
from . import tools

__all__ = [
    "embedding",
    "pca",
    "lsi",
    "umap",
    "mofa",
    "dotplot",
    "tss_enrichment",
    "fragment_histogram",
]


def _get_atac(data):
    if isinstance(data, AnnData):
        return data
    if isinstance(data, MuData) and "atac" in data.mod:
        return data.mod["atac"]
    raise TypeError("Expected AnnData or MuData object with 'atac' modality")


def _average_peaks(
    adata: AnnData,
    keys: List[str],
    average: Optional[str],
    func: str,
    use_raw: bool,
    layer: Optional[str],
):
    """Aggregate peak values per gene via the peak annotation: 'total'
    (all peaks), 'peak_type' (one column per type), or individual peaks
    (reference muon/_atac/plot.py:19-130). Returns (values DataFrame,
    plotted column names, temporary names)."""
    if average:
        avg_func = getattr(np, func)

    def _matrix(cols):
        if layer:
            m = adata.layers[layer][:, cols]
        elif use_raw and adata.raw is not None:
            m = adata.raw.X[:, cols]
        else:
            m = adata.X[:, cols]
        return np.asarray(m.todense()) if issparse(m) else np.asarray(m)

    attr_names: List[str] = []
    tmp_names: List[str] = []
    x = pd.DataFrame(index=adata.obs.index)
    for key in keys:
        if key not in adata.var_names and key not in adata.obs.columns:
            if "atac" not in adata.uns or "peak_annotation" not in adata.uns["atac"]:
                raise KeyError(
                    f"There is no feature or feature annotation {key}. If it "
                    "is a gene name, load peak annotation with "
                    "muon_tpu.atac.tl.add_peak_annotation first."
                )
            peak_sel = adata.uns["atac"]["peak_annotation"].loc[[key]]
            peak_sel = peak_sel[peak_sel["peak"].isin(adata.var_names.values)]
            peaks = peak_sel["peak"]
            if len(peaks) == 0:
                warnings.warn(f"Peaks for {key} are not found.")
                continue
            peaksidx = adata.var.index.get_indexer_for(peaks)

            if average in ("total", "all"):
                attr_name = f"{key} (all peaks)"
                attr_names.append(attr_name)
                tmp_names.append(attr_name)
                if attr_name not in adata.obs.columns:
                    x[attr_name] = avg_func(_matrix(peaksidx), axis=1)
            elif average == "peak_type":
                peak_dict = defaultdict(list)
                for t, p in zip(peak_sel["peak_type"], peaksidx):
                    peak_dict[t].append(p)
                for t, p in peak_dict.items():
                    attr_name = f"{key} ({t} peaks)"
                    attr_names.append(attr_name)
                    tmp_names.append(attr_name)
                    if attr_name not in adata.obs.columns:
                        x[attr_name] = avg_func(_matrix(p), axis=1)
            else:
                if average not in (None, False, -1):
                    warnings.warn(
                        f"Plotting individual peaks since {average} was not "
                        "recognised. Try using 'total' or 'peak_type'."
                    )
                attr_names += list(peaks.values)
                xp = pd.DataFrame(
                    _matrix(peaksidx), columns=peaks.values, index=x.index
                )
                x = pd.concat([x, xp], axis=1)
        else:
            attr_names.append(key)
            if key in adata.obs.columns:
                x[key] = adata.obs[key].to_numpy()
            else:
                keyloc = adata.var.index.get_loc(key)
                x[key] = _matrix([keyloc])[:, 0]
    return x, attr_names, tmp_names


def embedding(
    data: Union[AnnData, MuData],
    basis: str,
    color: Optional[Union[str, List[str]]] = None,
    average: Optional[str] = "total",
    func: Optional[str] = "mean",
    use_raw: bool = True,
    layer: Optional[str] = None,
    **kwargs,
):
    """Embedding scatter with gene-level peak aggregation for colors
    (reference muon/_atac/plot.py:133-176)."""
    adata = _get_atac(data)

    if color is None:
        return _core_pl.embedding(adata, basis=basis, **kwargs)

    keys = [color] if isinstance(color, str) else list(color)
    x, attr_names, _ = _average_peaks(
        adata=adata, keys=keys, average=average, func=func,
        use_raw=use_raw, layer=layer,
    )
    proxy = AnnData(
        X=np.zeros((adata.n_obs, 1), np.float32),
        obs=pd.concat([adata.obs.copy(), x], axis=1),
    )
    proxy.obsm = dict(adata.obsm)
    ret = _core_pl.embedding(proxy, basis=basis, color=attr_names, **kwargs)
    for aname in attr_names:
        if f"{aname}_colors" in proxy.uns:
            adata.uns[f"{aname}_colors"] = proxy.uns[f"{aname}_colors"]
    return ret


def pca(data, **kwargs):
    """PC scatter (reference muon/_atac/plot.py:179)."""
    return embedding(data, basis="pca", **kwargs)


def lsi(data, **kwargs):
    """LSI component scatter (reference muon/_atac/plot.py:188)."""
    return embedding(data, basis="lsi", **kwargs)


def umap(data, **kwargs):
    """UMAP scatter (reference muon/_atac/plot.py:197)."""
    return embedding(data, basis="umap", **kwargs)


def mofa(mdata, **kwargs):
    """MOFA factor scatter (reference muon/_atac/plot.py:206)."""
    return embedding(mdata, basis="mofa", **kwargs)


def dotplot(
    data: Union[AnnData, MuData],
    var_names: Union[str, Sequence[str], Mapping[str, Union[str, Sequence[str]]]],
    groupby: Optional[str] = None,
    average: Optional[str] = "total",
    func: Optional[str] = "mean",
    use_raw: Optional[bool] = None,
    layer: Optional[str] = None,
    show: Optional[bool] = None,
    save: Union[str, bool, None] = None,
    **kwargs,
):
    """Dot plot of mean expression × fraction-positive per group with
    gene-level peak aggregation (reference muon/_atac/plot.py:215-255)."""
    adata = _get_atac(data)
    keys = [var_names] if isinstance(var_names, str) else list(var_names)
    x, attr_names, _ = _average_peaks(
        adata=adata, keys=keys, average=average, func=func,
        use_raw=bool(use_raw), layer=layer,
    )

    plt = _core_pl._plt()
    if groupby is not None and groupby in adata.obs.columns:
        groups = pd.Categorical(adata.obs[groupby].astype("category"))
        cats = list(groups.categories)
    else:
        groups = pd.Categorical(["all"] * adata.n_obs)
        cats = ["all"]

    means = np.zeros((len(cats), len(attr_names)))
    fracs = np.zeros((len(cats), len(attr_names)))
    vals = x[attr_names].to_numpy(dtype=float)
    for gi, c in enumerate(cats):
        m = np.asarray(groups == c)
        means[gi] = vals[m].mean(axis=0)
        fracs[gi] = (vals[m] > 0).mean(axis=0)

    fig, ax = plt.subplots(
        figsize=(0.6 * len(attr_names) + 2.5, 0.5 * len(cats) + 1.5)
    )
    xx, yy = np.meshgrid(np.arange(len(attr_names)), np.arange(len(cats)))
    rng = means.max() - means.min()
    norm_means = (means - means.min()) / (rng if rng > 0 else 1)
    sc_ = ax.scatter(
        xx.ravel(), yy.ravel(), s=20 + 280 * fracs.ravel(),
        c=norm_means.ravel(), cmap=kwargs.pop("cmap", "Reds"),
        edgecolors="gray", linewidths=0.4,
    )
    ax.set_xticks(np.arange(len(attr_names)))
    ax.set_xticklabels(attr_names, rotation=90)
    ax.set_yticks(np.arange(len(cats)))
    ax.set_yticklabels([str(c) for c in cats])
    plt.colorbar(sc_, ax=ax, shrink=0.5, label=f"{func} value (scaled)")
    _core_pl._savefig_or_show("dotplot_", show=show, save=save)
    return None


def tss_enrichment(
    data: AnnData,
    color: Optional[str] = None,
    title: str = "TSS Enrichment",
    ax=None,
    show: Optional[bool] = None,
    save: Union[str, bool, None] = None,
):
    """Average enrichment around the TSS, optionally grouped
    (reference muon/_atac/plot.py:258-313)."""
    plt = _core_pl._plt()
    ax = ax or plt.gca()

    def _single(ad, label=None):
        xs = ad.var["TSS_position"]
        means = np.asarray(ad.X).mean(axis=0)
        ax.plot(xs, means, label=label)

    if color is not None:
        cols = [color] if isinstance(color, str) else list(color)
        for name, group in data.obs.groupby(cols, observed=True):
            idx = data.obs.index.get_indexer_for(group.index)
            _single(data[idx], label=str(name))
        ax.legend(loc="upper right", title=", ".join(cols))
    else:
        _single(data)

    ax.set_title(title)
    ax.set_xlabel("Distance from TSS, bp")
    ax.set_ylabel("Average TSS enrichment score")
    _core_pl._savefig_or_show("tss_enrichment_", show=show, save=save)
    return None


def fragment_histogram(
    data: Union[AnnData, MuData],
    region: str = "chr1-1-2000000",
    groupby: Optional[Union[str, Sequence[str]]] = None,
    barcodes: Optional[str] = None,
    show: Optional[bool] = None,
    save: Union[str, bool, None] = None,
):
    """Histogram of fragment lengths within a region
    (reference muon/_atac/plot.py:316-391)."""
    import seaborn as sns

    adata = _get_atac(data)

    fragment_path = adata.uns["files"]["fragments"]
    fragments = tools.fetch_regions_to_df(
        fragment_path=fragment_path, features=region
    )
    fragments["length"] = fragments["End"] - fragments["Start"]
    fragments = fragments.set_index("Cell")
    if barcodes and barcodes in adata.obs.columns:
        fragments = fragments.join(adata.obs.set_index(barcodes), how="right")
    else:
        fragments = fragments.join(adata.obs, how="right")

    kwargs = {"binwidth": 5}
    if groupby is not None:
        if isinstance(groupby, str):
            groupby = [groupby]
        if len(groupby) > 2:
            raise ValueError("Maximum 2 categories in groupby")
        if len(groupby) == 2:
            g = sns.FacetGrid(
                fragments, col=groupby[0], row=groupby[1], sharey=False
            )
        else:
            g = sns.FacetGrid(fragments, col=groupby[0], sharey=False)
        g.map(sns.histplot, "length", **kwargs)
        g.set_xlabels("Fragment length (bp)")
        g.set(xlim=(0, 1000))
    else:
        g = sns.histplot(fragments["length"], **kwargs)
        g.set_xlabel("Fragment length (bp)")
        g.set(xlim=(0, 1000))

    _core_pl._savefig_or_show("fragment_histogram_", show=show, save=save)
