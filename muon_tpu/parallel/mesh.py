"""Device-mesh & sharding layer.

The reference is single-process with no distributed backend at all
(SURVEY §2.6: no NCCL/MPI; numba ``prange`` is its only concurrency —
muon/_core/preproc.py:114,147).  The TPU-native scaling story replaces that
with a single-controller JAX mesh:

- axis ``"cells"`` — the data-parallel axis.  Count matrices, factor
  matrices Z (N×K), residuals E (N×D) and kNN query blocks are sharded
  along obs.  The reference analogue is MOFA's SVI minibatching
  (muon/_core/tools.py:520-527) and the >50k-cell low-memory heuristic
  (muon/_core/preproc.py:356).
- axis ``"feat"`` — the tensor-parallel analogue.  Per-view weights
  W (D_m×K), τ (D_m,) and the D axis of residuals are sharded along
  features, so W-sweeps are embarrassingly parallel and Z-sweeps
  psum-reduce over the feat axis (XLA inserts the collectives).

All collectives are XLA-inserted from sharding annotations (GSPMD); no
hand-written NCCL-style code, which is the idiomatic pjit design.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

__all__ = [
    "make_mesh",
    "cells_sharding",
    "feat_sharding",
    "grid_sharding",
    "replicated",
    "shard_mofa_state",
    "mesh_split",
]


@lru_cache(maxsize=1)
def _jax():
    import jax

    return jax


def mesh_split(
    n_devices: int, total_feat: Optional[int] = None
) -> Tuple[int, int]:
    """Factor n_devices into (cells, feat) — cells-major since obs is the
    long axis (10⁶ cells vs 10⁵ features, SURVEY §2.6).

    ``total_feat`` (ΣD over views, when known) steers the feat-axis width
    for pod-scale meshes: wide views amortize feat shards (the W-sweep is
    embarrassingly parallel along D), narrow views leave feat shards idle
    below ~128 columns each and the psum over "feat" in every Z-sweep then
    costs more than it saves — so they get a cells-only mesh."""
    if n_devices < 4:
        return n_devices, 1
    if total_feat is not None:
        if total_feat < 512:
            return n_devices, 1
        if total_feat >= 4096 and n_devices % 8 == 0 and n_devices >= 16:
            return n_devices // 8, 8
        if total_feat >= 1024 and n_devices % 4 == 0 and n_devices >= 8:
            return n_devices // 4, 4
    if n_devices % 2 == 0:
        return n_devices // 2, 2
    return n_devices, 1


def make_mesh(
    n_devices: Optional[int] = None,
    feat: Optional[int] = None,
    total_feat: Optional[int] = None,
):
    """Build a ("cells", "feat") mesh over the first n_devices devices.
    ``total_feat`` (feature-axis width of the workload) picks the feat-axis
    share via :func:`mesh_split` when ``feat`` is not given explicitly."""
    jax = _jax()
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if feat is None:
        _, feat = mesh_split(n_devices, total_feat)
    cells = n_devices // feat
    import numpy as np

    return jax.sharding.Mesh(
        np.asarray(devs[: cells * feat]).reshape(cells, feat), ("cells", "feat")
    )


def cells_sharding(mesh, ndim: int = 2):
    """NamedSharding putting axis 0 on "cells" (rest replicated)."""
    jax = _jax()
    P = jax.sharding.PartitionSpec
    spec = P("cells", *([None] * (ndim - 1)))
    return jax.sharding.NamedSharding(mesh, spec)


def feat_sharding(mesh, ndim: int = 2, axis: int = 0):
    jax = _jax()
    P = jax.sharding.PartitionSpec
    parts = [None] * ndim
    parts[axis] = "feat"
    return jax.sharding.NamedSharding(mesh, P(*parts))


def grid_sharding(mesh):
    """(N, D) arrays: cells × feat 2-D sharding."""
    jax = _jax()
    P = jax.sharding.PartitionSpec
    return jax.sharding.NamedSharding(mesh, P("cells", "feat"))


def replicated(mesh):
    jax = _jax()
    P = jax.sharding.PartitionSpec
    return jax.sharding.NamedSharding(mesh, P())


def shard_mofa_state(state: dict, mesh) -> dict:
    """Place a MOFA VB state dict (models/mofa.py) onto the mesh.

    Z/G (N×·) → cells-sharded; E and masks (N×D) → 2-D cells×feat;
    W/S/SW/τ (D×·) → feat-sharded; global hyperparameters replicated.
    XLA then derives every collective in the jitted sweep (psums over
    "cells" for column sums, over "feat" for the Z-update reductions).
    """
    jax = _jax()
    cells2 = cells_sharding(mesh, 2)
    rep = replicated(mesh)
    if "feat" in mesh.axis_names:
        grid = grid_sharding(mesh)
        feat2 = feat_sharding(mesh, 2, 0)
        feat1 = feat_sharding(mesh, 1, 0)
    else:
        # cells-only mesh (public mesh= kwarg): W/τ stay replicated,
        # N-sized state still shards over "cells"
        grid = cells2
        feat2 = rep
        feat1 = rep

    def put(x, s):
        return None if x is None else jax.device_put(x, s)

    out = dict(state)
    out["Z_mean"] = put(state["Z_mean"], cells2)
    out["Z_var"] = put(state["Z_var"], cells2)
    out["G"] = put(state["G"], cells2)
    out["E"] = [put(e, grid) for e in state["E"]]
    out["mask"] = [put(b, grid) for b in state["mask"]]
    for key in ("M01", "Y0"):
        if key in state:
            out[key] = [put(b, grid) for b in state[key]]
    for k in ("W_hat", "W_var", "S", "SW"):
        out[k] = [put(w, feat2) for w in state[k]]
    out["tau"] = [put(t, feat1) for t in state["tau"]]
    out["ln_tau"] = [put(t, feat1) for t in state["ln_tau"]]
    for key in ("tau_a", "tau_b"):
        if key in state:
            out[key] = [put(t, feat1) for t in state[key]]
    for k in ("alpha", "ln_alpha", "alpha_z", "theta_ln", "theta_ln1m", "theta_mean"):
        out[k] = put(state[k], rep)
    if "gp_K" in state:  # MEFISTO prior covariances: replicated (N is
        out["gp_K"] = put(state["gp_K"], rep)  # moderate when GPs are used)
    # spike-slab factor expectations follow Z (cells axis)
    for key in ("Z_hat", "Z_vhat", "Z_S"):
        if key in state:
            out[key] = put(state[key], cells2)
    for key in ("theta_z_ln", "theta_z_ln1m", "ln_alpha_z", "ssz_on"):
        if key in state:
            out[key] = put(state[key], rep)
    # sparse-GP fields: covariates/groups follow cells, inducing-point
    # arrays and per-factor hypers are small and replicated
    cells1 = cells_sharding(mesh, 1)
    if "gp_cov" in state:
        out["gp_cov"] = put(state["gp_cov"], cells2)
        out["gp_g"] = put(state["gp_g"], cells1)
        for key in ("gp_cov_u", "gp_g_u", "gp_ell", "gp_scale", "gp_Kg"):
            if key in state:
                out[key] = put(state[key], rep)
    return out
