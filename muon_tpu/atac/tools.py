"""ATAC tools (``ac.tl``): LSI, peak annotation, motifs, fragments, QC.

TPU-native reimplementation of reference muon/_atac/tools.py. LSI runs as
a randomized truncated SVD on device (replacing ARPACK svds at
muon/_atac/tools.py:53); fragment-level tools stream through the
pure-native tabix reader in muon_tpu.atac.fragments.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from .._core.anndata import AnnData
from .._core.mudata import MuData

__all__ = [
    "lsi",
    "add_peak_annotation",
    "add_peak_annotation_gene_names",
    "add_genes_peaks_groups",
    "rank_peaks_groups",
    "locate_file",
    "locate_genome",
    "locate_fragments",
    "initialise_default_files",
    "count_fragments_features",
    "tss_enrichment",
    "nucleosome_signal",
    "fetch_regions_to_df",
    "scan_sequences",
    "get_sequences",
]


def _get_atac(data):
    if isinstance(data, AnnData):
        return data
    if isinstance(data, MuData) and "atac" in data.mod:
        return data.mod["atac"]
    raise TypeError("Expected AnnData or MuData object with 'atac' modality")


def lsi(
    data: Union[AnnData, MuData],
    scale_embeddings: bool = True,
    n_comps: int = 50,
    n_iter: int = 7,
    random_state: int = 0,
):
    """Latent Semantic Indexing via randomized truncated SVD on TPU
    (semantics of reference muon/_atac/tools.py:29-71: components in
    descending order, embeddings optionally z-scored, stdev = s/√(n−1)).

    Writes ``obsm["X_lsi"]``, ``varm["LSI"]``, ``uns["lsi"]["stdev"]``.
    """
    adata = _get_atac(data)
    from ..ops.linalg import randomized_svd

    n_comps = min(n_comps, adata.X.shape[1])
    U, s, Vt = randomized_svd(
        adata.X, k=n_comps, n_iter=n_iter, seed=random_state
    )
    U = np.asarray(U)
    s = np.asarray(s)
    Vt = np.asarray(Vt)

    # reference stores the (unit-norm) left singular vectors, then z-scores
    cell_embeddings = U
    if scale_embeddings:
        cell_embeddings = (
            cell_embeddings - cell_embeddings.mean(axis=0)
        ) / cell_embeddings.std(axis=0)

    stdev = s / np.sqrt(adata.X.shape[0] - 1)

    adata.obsm["X_lsi"] = cell_embeddings
    adata.uns["lsi"] = {"stdev": stdev}
    adata.varm["LSI"] = Vt.T
    return None


# ---------------------------------------------------------------------------
# The components below land with their respective milestones; importing this
# module must stay cheap, so heavy deps are imported inside functions.
# ---------------------------------------------------------------------------


def add_peak_annotation(*args, **kwargs):
    from .annotation import add_peak_annotation as impl

    return impl(*args, **kwargs)


def add_peak_annotation_gene_names(*args, **kwargs):
    from .annotation import add_peak_annotation_gene_names as impl

    return impl(*args, **kwargs)


def add_genes_peaks_groups(*args, **kwargs):
    from .annotation import add_genes_peaks_groups as impl

    return impl(*args, **kwargs)


def rank_peaks_groups(*args, **kwargs):
    from .annotation import rank_peaks_groups as impl

    return impl(*args, **kwargs)


def locate_file(*args, **kwargs):
    from .files import locate_file as impl

    return impl(*args, **kwargs)


def locate_genome(*args, **kwargs):
    from .files import locate_genome as impl

    return impl(*args, **kwargs)


def locate_fragments(*args, **kwargs):
    from .files import locate_fragments as impl

    return impl(*args, **kwargs)


def initialise_default_files(*args, **kwargs):
    from .files import initialise_default_files as impl

    return impl(*args, **kwargs)


def count_fragments_features(*args, **kwargs):
    from .fragments import count_fragments_features as impl

    return impl(*args, **kwargs)


def tss_enrichment(*args, **kwargs):
    from .fragments import tss_enrichment as impl

    return impl(*args, **kwargs)


def nucleosome_signal(*args, **kwargs):
    from .fragments import nucleosome_signal as impl

    return impl(*args, **kwargs)


def fetch_regions_to_df(*args, **kwargs):
    from .fragments import fetch_regions_to_df as impl

    return impl(*args, **kwargs)


def scan_sequences(*args, **kwargs):
    from .motifs import scan_sequences as impl

    return impl(*args, **kwargs)


def get_sequences(*args, **kwargs):
    from .motifs import get_sequences as impl

    return impl(*args, **kwargs)
