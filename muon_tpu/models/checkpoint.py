"""Checkpoint/resume for VB training state.

The reference's only recovery mechanism is mofapy2's save-on-interrupt of
the finished model (muon/_core/tools.py:408-409,501); training itself can
never resume. Here the FULL variational state (every q-moment: Z/W/S/τ/α/θ
plus masks and residuals) round-trips through one .npz, so long runs can
checkpoint periodically and resume mid-training (SURVEY §5 "TPU build:
orbax-style checkpoint of VB state + ELBO trace").
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["save_state", "load_state"]

_NONE = "__none__"


def _flatten(state: dict):
    flat = {}
    for key, val in state.items():
        if isinstance(val, list):
            for i, v in enumerate(val):
                k = f"list:{key}:{i}"
                flat[k] = _NONE if v is None else np.asarray(v)
        else:
            flat[f"leaf:{key}"] = _NONE if val is None else np.asarray(val)
    return flat


def save_state(
    path: str,
    state: dict,
    elbo_history=None,
    iteration: int = 0,
) -> str:
    """Serialize a MOFA VB state dict (models.mofa._init_state layout) with
    its ELBO trace; returns path."""
    flat = _flatten(state)
    flat["meta:iteration"] = np.asarray([iteration])
    if elbo_history is not None:
        flat["meta:elbo_history"] = np.asarray(elbo_history, dtype=np.float64)
    np.savez_compressed(path, **{
        k: (np.asarray(_NONE) if isinstance(v, str) and v == _NONE else v)
        for k, v in flat.items()
    })
    return path


def load_state(path: str) -> Tuple[dict, np.ndarray, int]:
    """Load (state, elbo_history, iteration) saved by save_state. Arrays are
    returned as numpy; converting to device arrays happens on first use
    inside the jitted step."""
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=False)
    state: dict = {}
    lists: dict = {}
    elbos = np.empty(0)
    iteration = 0
    for key in data.files:
        val = data[key]
        is_none = val.dtype.kind in ("U", "S") and str(val) == _NONE
        if key == "meta:iteration":
            iteration = int(val[0])
        elif key == "meta:elbo_history":
            elbos = val
        elif key.startswith("leaf:"):
            state[key[5:]] = None if is_none else jnp.asarray(val)
        elif key.startswith("list:"):
            _, name, idx = key.split(":")
            lists.setdefault(name, {})[int(idx)] = (
                None if is_none else jnp.asarray(val)
            )
    for name, items in lists.items():
        state[name] = [items[i] for i in sorted(items)]
    return state, elbos, iteration
