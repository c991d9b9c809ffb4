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
from .pipeline import (
    ShardedCOO,
    shard_rows,
    sharded_col_sums,
    sharded_tfidf_data,
    sharded_rsvd,
    sharded_lsi,
    sharded_knn,
    sharded_ivf_knn,
    sharded_umap_embed,
    sharded_wnn_scores,
)

__all__ = [
    "make_mesh",
    "mesh_split",
    "cells_sharding",
    "feat_sharding",
    "grid_sharding",
    "replicated",
    "shard_mofa_state",
    "ShardedCOO",
    "shard_rows",
    "sharded_col_sums",
    "sharded_tfidf_data",
    "sharded_rsvd",
    "sharded_lsi",
    "sharded_knn",
    "sharded_ivf_knn",
    "sharded_umap_embed",
    "sharded_wnn_scores",
]
