"""Cross-modality value resolver and shared helpers.

Implements the plotting/metadata key grammar of the reference
(muon/_core/utils.py:15-205): global ``.obs`` column, ``var_name``
(searched across modalities with raw/layer fallbacks), ``mod:key``,
``obsm_key:1`` (1-based component), ``mod:obsm_key:1`` — with
obsmap-based reindexing of per-modality vectors onto the global obs axis.
"""

from __future__ import annotations

import warnings
from typing import Iterable, Optional, Union

import numpy as np
import pandas as pd
from scipy.sparse import issparse

from .anndata import AnnData
from .mudata import MuData

__all__ = ["_get_values", "get_values"]


def _apply_obsmap(vec, obsmap):
    """Reindex a per-modality vector onto the global obs axis.

    ``obsmap`` holds 1-based positions (0 = missing); missing entries
    become NaN (vectorized equivalent of the reference's per-element loop,
    muon/_core/utils.py:58-63)."""
    if obsmap is None:
        return vec
    m = np.asarray(obsmap, dtype=np.int64)
    vec = np.asarray(vec)
    if vec.dtype.kind in "fiu" and vec.dtype.kind == "f":
        out = np.full(m.shape[0], np.nan, dtype=vec.dtype)
    elif vec.dtype.kind in "iu":
        out = np.full(m.shape[0], np.nan, dtype=np.float64)
    else:
        out = np.full(m.shape[0], np.nan, dtype=object)
    present = m > 0
    out[present] = vec[m[present] - 1]
    return out


def _get_values(
    data: Union[AnnData, MuData],
    key: Optional[str] = None,
    use_raw: Optional[bool] = None,
    layer: Optional[str] = None,
    obsmap: Optional[np.ndarray] = None,
):
    """Resolve a key to a per-(global)-observation value vector."""
    if key is None:
        return None

    if isinstance(key, Iterable) and not isinstance(key, str):
        all_values = [
            _get_values(data, k, use_raw=use_raw, layer=layer, obsmap=obsmap)
            for k in key
        ]
        df = pd.DataFrame(dict(zip([k for k in key if k is not None], all_values)))
        return df

    if not isinstance(key, str):
        raise TypeError("Expected key to be a string.")

    # 1) global/modality .obs column
    if key in data.obs.columns:
        return _apply_obsmap(data.obs[key].to_numpy(), obsmap)

    # 2) composite "mod:rest"
    key_mod = mod_key = None
    if isinstance(data, MuData) and key not in data.var_names and key not in data.obsm:
        if ":" in key:
            maybe_mod, maybe_key = key.split(":", 1)
            if maybe_mod in data.mod:
                key_mod, mod_key = maybe_mod, maybe_key

    # 3) composite "obsm_key:idx" (1-based)
    obsm_key = obsm_index = None
    if ":" in key and key_mod is None and key not in data.var_names:
        maybe_obsm_key, maybe_index = key.rsplit(":", 1)
        if maybe_obsm_key in data.obsm:
            try:
                maybe_index = int(maybe_index)
            except ValueError:
                maybe_index = None
            if maybe_index == 0:
                raise ValueError(
                    "Enumeration for the components in .obsm starts at 1, "
                    "by convention."
                )
            if maybe_index is not None:
                obsm_key, obsm_index = maybe_obsm_key, maybe_index

    if obsm_key is not None:
        values = np.asarray(data.obsm[obsm_key])[:, obsm_index - 1]
        if issparse(values):
            values = np.asarray(values.todense()).squeeze()
        return _apply_obsmap(values, obsmap)

    if isinstance(data, MuData):
        if key_mod is not None:
            if not data.obs_names.equals(data.mod[key_mod].obs_names) and obsmap is None:
                obsmap = data.obsmap[key_mod]
            return _get_values(
                data.mod[key_mod], key=mod_key, use_raw=use_raw, layer=layer,
                obsmap=obsmap,
            )

        key_in_mod = {m: key in data.mod[m].var_names for m in data.mod}

        if layer is not None and sum(key_in_mod.values()) == 1:
            use_mod = next(m for m, v in key_in_mod.items() if v)
            if layer not in data.mod[use_mod].layers:
                warnings.warn(
                    f"Layer {layer} is not present when searching for the key "
                    f"{key}, using count matrix instead"
                )
                layer = None

        if (use_raw is None or use_raw) and layer is None:
            for m in data.mod:
                if not key_in_mod[m] and data.mod[m].raw is not None:
                    key_in_mod[m] = key in data.mod[m].raw.var_names

        n_hits = sum(key_in_mod.values())
        if n_hits > 1:
            raise ValueError(
                f"var_name {key} is present in multiple modalities. Please "
                f"make the var_names unique, e.g. by calling "
                f".var_names_make_unique()."
            )
        if n_hits == 1:
            use_mod = next(m for m, v in key_in_mod.items() if v)
            if not data.obs_names.equals(data.mod[use_mod].obs_names) and obsmap is None:
                obsmap = data.obsmap[use_mod]
            return _get_values(
                data.mod[use_mod], key=key, use_raw=use_raw, layer=layer,
                obsmap=obsmap,
            )
        raise ValueError(f"Key {key} could not be found.")

    if isinstance(data, AnnData):
        if (use_raw is None or use_raw) and data.raw is not None and layer is None:
            idx = data.raw.var.index.get_indexer_for([key])
            if idx[0] == -1:
                raise ValueError(f"Key {key} could not be found.")
            values = data.raw.X[:, idx[0]]
        elif layer is not None and layer in data.layers:
            idx = data.var.index.get_indexer_for([key])
            if idx[0] == -1:
                raise ValueError(f"Key {key} could not be found.")
            values = data.layers[layer][:, idx[0]]
            if use_raw:
                warnings.warn(f"Layer='{layer}' superseded use_raw={use_raw}")
        else:
            if (use_raw is None or use_raw) and data.raw is None and layer is None:
                warnings.warn(
                    f"Attribute .raw is None when searching for the key {key}, "
                    f"using .X instead"
                )
            if layer is not None and layer not in data.layers:
                warnings.warn(
                    f"Layer {layer} is not present when searching for the key "
                    f"{key}, using count matrix instead"
                )
            idx = data.var.index.get_indexer_for([key])
            if idx[0] == -1:
                raise ValueError(f"Key {key} could not be found.")
            values = data.X[:, idx[0]]
        if len(idx) > 1:
            warnings.warn(
                f"Key {key} is not unique in the index, using the first value..."
            )
        if issparse(values):
            values = np.asarray(values.todense()).squeeze()
        values = np.asarray(values).reshape(-1)
        return _apply_obsmap(values, obsmap)

    raise TypeError("Expected data to be MuData or AnnData")


get_values = _get_values
