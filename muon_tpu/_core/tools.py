"""Multimodal tools (``mu.tl``): MOFA, SNF, multiplex Leiden/Louvain,
multimodal UMAP, ICA.

TPU-first reimplementation of the reference surface
(muon/_core/tools.py). The MOFA variational-Bayes engine lives in
``muon_tpu.models.mofa`` (pure JAX, replacing mofapy2); graph clustering in
``muon_tpu.ops.leiden`` (replacing leidenalg C++); UMAP embedding in
``muon_tpu.ops.umap`` (replacing umap-learn).
"""

from __future__ import annotations

# Implementations are attached as the subsystems land; each import is lazy
# so that the container layer works without JAX.

from .tools_mofa import mofa  # noqa: F401
from .tools_graph import snf, leiden, louvain, umap  # noqa: F401
from .tools_misc import ica  # noqa: F401
from .tools_de import rank_genes_groups  # noqa: F401

__all__ = ["mofa", "snf", "leiden", "louvain", "umap", "ica"]
