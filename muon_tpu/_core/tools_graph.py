"""mu.tl graph tools: SNF, multiplex Leiden/Louvain, multimodal UMAP.

TPU-first reimplementation of reference muon/_core/tools.py:716-1362.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Mapping, Optional, Sequence, Union

import numpy as np
import pandas as pd
from scipy import sparse as sp

from .anndata import AnnData
from .mudata import MuData

__all__ = ["snf", "leiden", "louvain", "umap"]


@lru_cache(maxsize=1)
def _jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


# ---------------------------------------------------------------------------
# SNF — similarity network fusion (Wang et al. 2014)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _snf_diffusion_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("n_iterations", "k"))
    def f(Ws, n_iterations, k):
        """Ws: (M, n, n) affinity stack. Returns fused (n, n)."""
        M, n, _ = Ws.shape

        def normalize(x):
            row = x.sum(axis=1) - jnp.diagonal(x)
            row = jnp.where(row == 0, 1.0, row)
            x = x / (2.0 * row[:, None])
            x = jnp.fill_diagonal(x, 0.5, inplace=False)
            return (x + x.T) / 2.0

        def dominateset(x):
            # keep k largest per row, then row-normalize (reference
            # muon/_core/tools.py:852-861 keeps top-k per column of the
            # symmetric matrix — equivalent up to the transpose)
            thresh = jax.lax.top_k(x, k)[0][:, -1]  # kth largest per row
            kept = jnp.where(x >= thresh[:, None], x, 0.0)
            return kept / kept.sum(axis=1, keepdims=True)

        Wn = jnp.stack([normalize(Ws[m]) for m in range(M)])
        S = jnp.stack([dominateset(Wn[m]) for m in range(M)])

        def body(_, Wn):
            total = Wn.sum(axis=0)

            def one(m):
                other = (total - Wn[m]) / jnp.maximum(M - 1, 1)
                return S[m] @ other @ S[m].T

            nxt = jnp.stack([one(m) for m in range(M)])
            return jnp.stack([normalize(nxt[m]) for m in range(M)])

        Wn = jax.lax.fori_loop(0, n_iterations, body, Wn)
        fused = Wn.sum(axis=0) / M
        return normalize(fused)

    return f


def _affinity_matrix(dist_dense, k, sigma, eps):
    """Local-scale gaussian affinity (SNFtool affinityMatrix semantics)."""
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("k",))
    def f(dist, known, sigma, eps, k):
        # unknown (non-neighbor) distances are +inf, not 0 — densifying a
        # kNN distance matrix with zeros would make strangers maximally
        # similar (flaw in the reference path, which has no SNF tests)
        known = known | known.T
        dist = jnp.where(known, (dist + dist.T) / 2.0, jnp.inf)
        dist = jnp.fill_diagonal(dist, 0.0, inplace=False)
        sorted_d = jnp.sort(jnp.where(jnp.isfinite(dist), dist, jnp.inf), axis=1)
        kth = jnp.where(jnp.isfinite(sorted_d[:, 1 : k + 1]),
                        sorted_d[:, 1 : k + 1], 0.0)
        cnt = jnp.isfinite(sorted_d[:, 1 : k + 1]).sum(axis=1)
        means = kth.sum(axis=1) / jnp.maximum(cnt, 1) + eps
        sig = (means[:, None] + means[None, :]) / 3.0 + jnp.where(
            jnp.isfinite(dist), dist, 0.0
        ) / 3.0 + eps
        scale = sigma * sig
        dens = jnp.exp(-0.5 * (jnp.where(jnp.isfinite(dist), dist, 0.0) / scale) ** 2) / (
            scale * jnp.sqrt(2 * jnp.pi)
        )
        dens = jnp.where(jnp.isfinite(dist), dens, 0.0)
        dens = jnp.fill_diagonal(dens, 0.0, inplace=False)
        return (dens + dens.T) / 2.0

    return f(*dist_dense, sigma, eps, k)


def snf(
    mdata: MuData,
    n_neighbors: int = 20,
    neighbor_keys=None,
    key_added: Optional[str] = None,
    n_iterations: int = 20,
    sigma: float = 0.5,
    eps: float = None,
    copy: bool = False,
) -> Optional[MuData]:
    """Similarity network fusion (reference muon/_core/tools.py:716-920):
    per-modality local-scale affinities, normalized cross-diffusion, fused
    graph → kNN distances/connectivities. The whole diffusion loop is one
    jit-compiled program over the (M, n, n) affinity stack.

    Deviation (documented): final connectivities keep the k *largest*
    similarities per row (the reference reuses its k-smallest selection,
    which keeps the weakest edges)."""
    jax, jnp = _jax()
    if eps is None:
        eps = float(np.finfo(np.float64).eps)
    mdata = mdata.copy() if copy else mdata

    if neighbor_keys is None:
        modalities = list(mdata.mod.keys())
        neighbor_keys = {}
    elif isinstance(neighbor_keys, str):
        modalities = list(mdata.mod.keys())
        neighbor_keys = {m: neighbor_keys for m in modalities}
    else:
        modalities = list(neighbor_keys.keys())

    neighbors_params, mod_reps, mod_n_pcs = {}, {}, {}
    for mod in modalities:
        nkey = neighbor_keys.get(mod, "neighbors")
        if nkey not in mdata.mod[mod].uns:
            raise ValueError(
                f'Did not find .uns["{nkey}"] for modality "{mod}". '
                "Run neighbors on all modalities first."
            )
        nparams = mdata.mod[mod].uns[nkey]
        neighbors_params[mod] = nparams
        mod_reps[mod] = nparams["params"].get("use_rep", -1)
        mod_n_pcs[mod] = nparams["params"].get("n_pcs", -1)

    Ws = []
    for mod in modalities:
        dmat = mdata.mod[mod].obsp[neighbors_params[mod]["distances_key"]]
        if sp.issparse(dmat):
            dmat = dmat.tocsr()
            dist = np.asarray(dmat.todense())
            known = np.asarray((dmat != 0).todense()).astype(bool)
        else:
            dist = np.asarray(dmat)
            known = np.ones_like(dist, dtype=bool)
        W = _affinity_matrix(
            (jnp.asarray(dist, jnp.float32), jnp.asarray(known)),
            n_neighbors, float(sigma), eps,
        )
        Ws.append(W)
    fused = np.asarray(
        _snf_diffusion_fn()(jnp.stack(Ws), int(n_iterations), int(n_neighbors))
    )

    n = fused.shape[0]
    # final kNN on the fused similarity
    idx = np.argsort(-fused, axis=1)[:, :n_neighbors]
    rows = np.repeat(np.arange(n), n_neighbors)
    cols = idx.reshape(-1)
    simvals = fused[rows, cols]
    conn = sp.csr_matrix((simvals, (rows, cols)), shape=(n, n))
    dvals = 0.5 - simvals
    dmat = sp.csr_matrix((dvals, (rows, cols)), shape=(n, n))

    if key_added is None:
        key_added, conns_key, dists_key = "neighbors", "connectivities", "distances"
    else:
        conns_key, dists_key = f"{key_added}_connectivities", f"{key_added}_distances"
    mdata.obsp[conns_key] = conn
    mdata.obsp[dists_key] = dmat
    mdata.uns[key_added] = {
        "connectivities_key": conns_key,
        "distances_key": dists_key,
        "params": {
            "n_neighbors": n_neighbors,
            "eps": eps,
            "use_rep": mod_reps,
            "n_pcs": mod_n_pcs,
            "method": "snf",
        },
    }
    return mdata if copy else None


# ---------------------------------------------------------------------------
# multiplex Leiden / Louvain
# ---------------------------------------------------------------------------


def _choose_graph(obj, obsp=None, neighbors_key=None):
    if obsp is not None:
        return obj.obsp[obsp]
    nkey = neighbors_key or "neighbors"
    if nkey in obj.uns:
        return obj.obsp[obj.uns[nkey]["connectivities_key"]]
    if "connectivities" in obj.obsp:
        return obj.obsp["connectivities"]
    raise ValueError("No neighbors found; run neighbors first.")


def _cluster(
    mdata,
    resolution=None,
    mod_weights=None,
    random_state: int = 0,
    key_added: str = "leiden",
    neighbors_key: Optional[str] = None,
    directed: bool = True,
    algorithm: str = "leiden",
    **kwargs,
):
    """Multiplex clustering: one partition optimized jointly over the
    per-modality connectivity graphs (reference muon/_core/tools.py:928-1054,
    leidenalg optimise_partition_multiplex semantics)."""
    from ..ops.leiden import multiplex_leiden

    if isinstance(mdata, AnnData):
        adj = _choose_graph(mdata, neighbors_key=neighbors_key)
        labels = multiplex_leiden(
            [adj],
            [resolution if resolution is not None else 1.0],
            [1.0],
            seed=random_state or 0,
            refine=(algorithm == "leiden"),
            n_iterations=kwargs.get("n_iterations"),
        )
        mdata.obs[key_added] = pd.Categorical(
            labels.astype(str),
            categories=[str(i) for i in sorted(set(labels))],
        )
        mdata.uns[algorithm] = {
            "params": {"resolution": resolution, "random_state": random_state}
        }
        return

    mods = list(mdata.mod.keys())
    if isinstance(neighbors_key, Mapping):
        nkeys = {m: neighbors_key.get(m) for m in mods}
    else:
        nkeys = {m: neighbors_key for m in mods}
    adjs = [_choose_graph(mdata.mod[m], neighbors_key=nkeys[m]) for m in mods]

    if resolution is None:
        resolutions = [1.0] * len(mods)
    elif isinstance(resolution, Mapping):
        resolutions = [resolution[m] for m in mods]
    elif isinstance(resolution, (Sequence, np.ndarray)) and not isinstance(
        resolution, str
    ):
        assert len(resolution) == len(mods)
        resolutions = list(resolution)
    else:
        resolutions = [float(resolution)] * len(mods)

    if mod_weights is None:
        weights = [1.0] * len(mods)
    elif isinstance(mod_weights, Mapping):
        weights = [mod_weights.get(m, 1) for m in mods]
    elif isinstance(mod_weights, (Sequence, np.ndarray)) and not isinstance(
        mod_weights, str
    ):
        assert len(mod_weights) == len(mods)
        weights = list(mod_weights)
    else:
        weights = [float(mod_weights)] * len(mods)

    # ragged obs: expand each modality graph onto the global obs axis
    n = mdata.n_obs
    expanded = []
    for m, A in zip(mods, adjs):
        if A.shape[0] == n and bool(np.all(mdata.obsmap[m] == np.arange(1, n + 1))):
            expanded.append(A.tocsr())
        else:
            gmap = np.flatnonzero(np.asarray(mdata.obsmap[m]) > 0)
            A = A.tocoo()
            expanded.append(
                sp.csr_matrix(
                    (A.data, (gmap[A.row], gmap[A.col])), shape=(n, n)
                )
            )

    labels = multiplex_leiden(
        expanded, resolutions, weights, seed=random_state or 0,
        refine=(algorithm == "leiden"),
        n_iterations=kwargs.get("n_iterations"),
    )
    mdata.obs[key_added] = pd.Categorical(
        labels.astype(str), categories=[str(i) for i in sorted(set(labels))]
    )
    mdata.uns[algorithm] = {
        "params": {
            "resolution": resolution,
            "random_state": random_state,
        }
    }


def leiden(
    data: Union[MuData, AnnData],
    resolution=None,
    mod_weights=None,
    random_state: int = 0,
    key_added: str = "leiden",
    neighbors_key=None,
    directed: bool = True,
    **kwargs,
):
    """Multiplex Leiden clustering (reference muon/_core/tools.py:1057-1130)."""
    return _cluster(
        data, resolution=resolution, mod_weights=mod_weights,
        random_state=random_state, key_added=key_added,
        neighbors_key=neighbors_key, directed=directed, algorithm="leiden",
        **kwargs,
    )


def louvain(
    data: Union[MuData, AnnData],
    resolution=None,
    mod_weights=None,
    random_state: int = 0,
    key_added: str = "louvain",
    neighbors_key=None,
    directed: bool = True,
    **kwargs,
):
    """Multiplex Louvain clustering (reference muon/_core/tools.py:1133-1206)."""
    return _cluster(
        data, resolution=resolution, mod_weights=mod_weights,
        random_state=random_state, key_added=key_added,
        neighbors_key=neighbors_key, directed=directed, algorithm="louvain",
        **kwargs,
    )


# ---------------------------------------------------------------------------
# multimodal UMAP
# ---------------------------------------------------------------------------


def umap(
    mdata: Union[MuData, AnnData],
    min_dist: float = 0.5,
    spread: float = 1.0,
    n_components: int = 2,
    maxiter: Optional[int] = None,
    alpha: float = 1.0,
    gamma: float = 1.0,
    negative_sample_rate: int = 5,
    init_pos="spectral",
    random_state: int = 42,
    a: Optional[float] = None,
    b: Optional[float] = None,
    copy: bool = False,
    method: str = "umap",
    neighbors_key: Optional[str] = None,
    mesh=None,
) -> Optional[Union[MuData, AnnData]]:
    """Embed the (multimodal) neighborhood graph with UMAP
    (reference muon/_core/tools.py:1209-1362); the SGD runs as jit-compiled
    epochs on device (muon_tpu.ops.umap).

    ``mesh`` (or the ``mu.set_options(mesh=...)`` global): the SGD runs
    as the SPMD program parallel/pipeline.sharded_umap_embed — edges
    sharded over "cells", one psum per epoch."""
    from .config import current_mesh
    from ..ops.umap import umap_embed, find_ab_params

    data = mdata.copy() if copy else mdata
    nkey = neighbors_key or "neighbors"
    if nkey not in data.uns:
        raise ValueError(
            f'Did not find .uns["{nkey}"]. Run `muon_tpu.pp.neighbors` first.'
        )
    neighbors = data.uns[nkey]
    conn = data.obsp[neighbors["connectivities_key"]]

    if a is None or b is None:
        a, b = find_ab_params(spread, min_dist)

    mesh_r = current_mesh(mesh)
    if mesh_r is not None:
        from ..parallel.pipeline import sharded_umap_embed

        emb = sharded_umap_embed(
            conn.tocsr(),
            mesh_r,
            n_components=n_components,
            n_epochs=maxiter if maxiter else 200,
            min_dist=min_dist,
            spread=spread,
            alpha=alpha,
            gamma=gamma,
            negative_sample_rate=negative_sample_rate,
            random_state=random_state if isinstance(random_state, int) else 42,
        )
    else:
        emb = umap_embed(
        conn.tocsr(),
        n_components=n_components,
        n_epochs=maxiter,
        init=init_pos if init_pos is not None else "spectral",
        # connectivities from ops/fuzzy are symmetric by construction —
        # skip the O(nnz·log) probe (umap_embed re-checks nothing else)
        assume_symmetric=True,
        min_dist=min_dist,
        spread=spread,
        alpha=alpha,
        gamma=gamma,
        negative_sample_rate=negative_sample_rate,
        a=a,
        b=b,
        random_state=random_state if isinstance(random_state, int) else 42,
    )
    data.obsm["X_umap"] = emb
    data.uns["umap"] = {"params": {"a": a, "b": b, "random_state": random_state}}
    return data if copy else None
