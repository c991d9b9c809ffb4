"""mu.tl misc tools: ICA."""

from __future__ import annotations

__all__ = ["ica"]


def ica(
    data,
    basis: str = "X_pca",
    n_components=None,
    *,
    random_state=None,
    scale: bool = False,
    copy: bool = False,
    **kwargs,
):
    """Independent component analysis on an ``.obsm`` basis → ``X_ica``
    (reference muon/_core/tools.py:1365-1386; FastICA runs as a jit-compiled
    symmetric fixed-point iteration, muon_tpu.ops.ica)."""
    import numpy as np

    from ..ops.ica import fastica

    data = data.copy() if copy else data
    x_ica = fastica(
        np.asarray(data.obsm[basis]), n_components=n_components,
        random_state=random_state, **kwargs,
    )
    if scale:
        x_ica = x_ica / x_ica.std(axis=0)
    data.obsm["X_ica"] = x_ica
    return data if copy else None
