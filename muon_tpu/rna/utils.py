"""RNA gene annotation helper (reference muon/_rna/utils.py:7-37)."""

from __future__ import annotations

from typing import Union

import pandas as pd

from .._core.anndata import AnnData
from .._core.mudata import MuData

__all__ = ["get_gene_annotation_from_rna"]


def get_gene_annotation_from_rna(data: Union[AnnData, MuData]) -> pd.DataFrame:
    """Parse ``var["interval"]`` (``chr:start-end``) of the rna modality into
    a DataFrame(Chromosome/Start/End/gene_id/gene_name), dropping genes
    without coordinates — feeds ATAC fragment counting and TSS enrichment
    (reference call sites muon/_atac/tools.py:795,950)."""
    if isinstance(data, AnnData):
        adata = data
    elif isinstance(data, MuData) and "rna" in data.mod:
        adata = data.mod["rna"]
    else:
        raise TypeError("Expected AnnData or MuData object with 'rna' modality")

    if "interval" not in adata.var.columns:
        raise ValueError(".var object does not have a column named interval")

    parts = []
    for s in adata.var["interval"]:
        if isinstance(s, str) and ":" in s:
            chrom, rest = s.split(":", 1)
            se = rest.split("-")
            if len(se) == 2:
                parts.append((chrom, se[0], se[1]))
                continue
        parts.append((None, None, None))
    features = pd.DataFrame(parts, columns=["Chromosome", "Start", "End"])
    if "gene_ids" in adata.var.columns:
        features["gene_id"] = adata.var["gene_ids"].values
    else:
        features["gene_id"] = adata.var.index.values
    features["gene_name"] = adata.var.index.values
    features.index = adata.var.index
    features = features.loc[~features.Start.isnull()]
    features["Start"] = features["Start"].astype(int)
    features["End"] = features["End"].astype(int)
    return features
