"""Mesh/sharding layer — scaling over TPU slices via jax.sharding + GSPMD."""

from .mesh import (
    make_mesh,
    mesh_split,
    cells_sharding,
    feat_sharding,
    grid_sharding,
    replicated,
    shard_mofa_state,
)

__all__ = [
    "make_mesh",
    "mesh_split",
    "cells_sharding",
    "feat_sharding",
    "grid_sharding",
    "replicated",
    "shard_mofa_state",
]
