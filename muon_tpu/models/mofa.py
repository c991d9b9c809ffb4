"""MOFA+ (multi-omics factor analysis) — pure-JAX variational-Bayes engine.

From-scratch TPU-native replacement for the external mofapy2 engine the
reference delegates training to (muon/_core/tools.py:419,582-585). The
model is the MOFA+ group factor-analysis model (Argelaguet et al. 2020):

    Y^{m}_{nd} ≈ Σ_k z_{nk} · s^{m}_{dk} ŵ^{m}_{dk},   τ^m_d noise precision

with ARD precisions α^m_k on weights (per view), optional ARD on factors
(per group), and spike-slab sparsity s on weights. Inference is mean-field
coordinate ascent; one full update sweep (W → Z → τ → α → θ → ELBO) is a
single jit-compiled XLA program. Every heavy term is a (N×D)·(D×K) or
(N×D)·(N×K) matmul on the MXU; the K-factor sweeps are `lax.fori_loop`s
over a rank-1-update residual, so nothing re-materializes Y.

Design notes (TPU-first):
- the residual E = Y − Z·SWᵀ lives in HBM once per view and is updated by
  rank-1 corrections inside the sweep (no per-iteration densification);
- missing data: fast path with no mask (common after intersection); masked
  path for union/NaN inputs;
- multi-group: groups enter via a one-hot (N×G) matrix — segment sums are
  small matmuls;
- cells-axis sharding: all N-dimension arrays (Y, E, Z) can be sharded
  over a device mesh; cross-device reductions are the column sums XLA
  inserts automatically under jit with sharded inputs (see
  muon_tpu.parallel.mesh).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import lru_cache, partial
from typing import List, Optional, Sequence

import numpy as np

__all__ = ["MOFAConfig", "MOFAResult", "fit_mofa"]


@lru_cache(maxsize=1)
def _jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


# gamma prior hyperparameters (uninformative, mofapy2 convention)
A0 = 1e-14
B0 = 1e-14
THETA_A0 = 1.0
THETA_B0 = 1.0

CONVERGENCE_THRESHOLDS = {"fast": 5e-4, "medium": 5e-5, "slow": 5e-6}


@dataclass(frozen=True)
class MOFAConfig:
    n_factors: int = 10
    likelihoods: tuple = ("gaussian",)
    ard_weights: bool = True
    ard_factors: bool = True
    spikeslab_weights: bool = True
    spikeslab_factors: bool = False  # kept for surface parity; not used
    n_groups: int = 1
    seed: int = 1


@dataclass
class MOFAResult:
    Z: np.ndarray                      # (N, K)
    W: List[np.ndarray]                # per view (D_m, K) — E[s·ŵ]
    S: List[np.ndarray]                # per view spike probabilities
    alpha: np.ndarray                  # (M, K)
    tau: List[np.ndarray]              # per view (D_m,)
    theta: np.ndarray                  # (M, K)
    elbo_history: np.ndarray
    n_iterations: int
    converged: bool
    r2_per_factor: dict = field(default_factory=dict)  # {group: (M, K)}
    r2_total: dict = field(default_factory=dict)


def _digamma(x):
    jax, jnp = _jax()
    return jax.scipy.special.digamma(x)


def _make_step(config: MOFAConfig, Ds: Sequence[int], N: int, masked: Sequence[bool]):
    """Build the jitted coordinate-ascent sweep for static shapes."""
    jax, jnp = _jax()
    K = config.n_factors
    M = len(Ds)
    G = config.n_groups

    def step(state):
        Zm, Zv = state["Z_mean"], state["Z_var"]
        Gh = state["G"]                      # (N, G) one-hot
        alpha = state["alpha"]               # (M, K) E[α]
        ln_alpha = state["ln_alpha"]
        alpha_z = state["alpha_z"]           # (G, K)
        theta_ln = state["theta_ln"]         # (M, K) E[lnθ]
        theta_ln1m = state["theta_ln1m"]     # (M, K) E[ln(1−θ)]

        new_W, new_Wv, new_S = [], [], []
        Es = list(state["E"])

        # ---------------- W sweep (per view) ----------------
        for m in range(M):
            D = Ds[m]
            tau = state["tau"][m]            # (D,)
            B = state["mask"][m] if masked[m] else None  # (N, D) f32 or None
            E = Es[m]                        # (N, D) masked residual
            SW = state["SW"][m]              # (D, K)
            Wv = state["W_var"][m]
            S = state["S"][m]
            What = state["W_hat"][m]

            z2 = Zv + Zm * Zm                # (N, K)
            if B is None:
                z2_colsum = z2.sum(axis=0)               # (K,)
                zz_colsum = (Zm * Zm).sum(axis=0)
            else:
                z2B = z2.T @ B                            # (K, D)
                zzB = (Zm * Zm).T @ B

            def w_body(k, carry):
                E, What, Wv, S, SW = carry
                zk = jax.lax.dynamic_slice_in_dim(Zm, k, 1, 1)[:, 0]
                swk = jax.lax.dynamic_slice_in_dim(SW, k, 1, 1)[:, 0]
                if B is None:
                    a = tau * z2_colsum[k] + alpha[m, k]
                    b = tau * (zk @ E + swk * zz_colsum[k])
                else:
                    a = tau * z2B[k] + alpha[m, k]
                    b = tau * (zk @ E + swk * zzB[k])
                w_hat = b / a
                v_hat = 1.0 / a
                if config.spikeslab_weights:
                    lam = (
                        theta_ln[m, k]
                        - theta_ln1m[m, k]
                        + 0.5 * ln_alpha[m, k]
                        - 0.5 * jnp.log(a)
                        + 0.5 * b * b / a
                    )
                    s = jax.nn.sigmoid(lam)
                else:
                    s = jnp.ones_like(w_hat)
                sw_new = s * w_hat
                # rank-1 residual correction
                delta = swk - sw_new
                if B is None:
                    E = E + zk[:, None] * delta[None, :]
                else:
                    E = E + (zk[:, None] * delta[None, :]) * B
                What = jax.lax.dynamic_update_slice_in_dim(
                    What, w_hat[:, None], k, 1
                )
                Wv = jax.lax.dynamic_update_slice_in_dim(Wv, v_hat[:, None], k, 1)
                S = jax.lax.dynamic_update_slice_in_dim(S, s[:, None], k, 1)
                SW = jax.lax.dynamic_update_slice_in_dim(SW, sw_new[:, None], k, 1)
                return (E, What, Wv, S, SW)

            E, What, Wv, S, SW = jax.lax.fori_loop(
                0, K, w_body, (E, What, Wv, S, SW)
            )
            Es[m] = E
            new_W.append(What)
            new_Wv.append(Wv)
            new_S.append(S)
            state = {**state, "W_hat": new_W + list(state["W_hat"][m + 1:]),
                     "W_var": new_Wv + list(state["W_var"][m + 1:]),
                     "S": new_S + list(state["S"][m + 1:]),
                     "SW": [SW if i == m else state["SW"][i] for i in range(M)]}

        SWs = state["SW"]
        Svs = state["S"]
        Wvs = state["W_var"]
        Whats = state["W_hat"]
        SWW = [
            Svs[m] * (Wvs[m] + Whats[m] * Whats[m]) for m in range(M)
        ]  # E[(sŵ)²]

        # ---------------- Z sweep ----------------
        prior_prec = (Gh @ alpha_z) if config.ard_factors else jnp.ones((N, K), Zm.dtype)

        # per-view constants
        tSWW = []
        tSW2 = []
        for m in range(M):
            tau = state["tau"][m]
            tSWW.append((tau[:, None] * SWW[m]))          # (D, K)
            tSW2.append((tau[:, None] * SWs[m] * SWs[m]))

        def z_body(k, carry):
            Zm, Zv, Es = carry
            p = jax.lax.dynamic_slice_in_dim(prior_prec, k, 1, 1)[:, 0]
            b = jnp.zeros((N,), Zm.dtype)
            for m in range(M):
                tau = state["tau"][m]
                B = state["mask"][m] if masked[m] else None
                swk = jax.lax.dynamic_slice_in_dim(SWs[m], k, 1, 1)[:, 0]
                tsw = tau * swk
                if B is None:
                    p = p + tSWW[m][:, k].sum()
                    b = b + Es[m] @ tsw + Zm[:, k] * tSW2[m][:, k].sum()
                else:
                    p = p + B @ tSWW[m][:, k]
                    b = b + Es[m] @ tsw + Zm[:, k] * (B @ tSW2[m][:, k])
            z_new = b / p
            v_new = 1.0 / p
            zk_old = jax.lax.dynamic_slice_in_dim(Zm, k, 1, 1)[:, 0]
            delta = zk_old - z_new
            new_Es = []
            for m in range(M):
                swk = jax.lax.dynamic_slice_in_dim(SWs[m], k, 1, 1)[:, 0]
                B = state["mask"][m] if masked[m] else None
                corr = delta[:, None] * swk[None, :]
                new_Es.append(Es[m] + (corr * B if B is not None else corr))
            Zm = jax.lax.dynamic_update_slice_in_dim(Zm, z_new[:, None], k, 1)
            Zv = jax.lax.dynamic_update_slice_in_dim(Zv, v_new[:, None], k, 1)
            return (Zm, Zv, tuple(new_Es))

        Zm, Zv, Es_t = jax.lax.fori_loop(0, K, z_body, (Zm, Zv, tuple(Es)))
        Es = list(Es_t)

        z2 = Zv + Zm * Zm

        # ---------------- τ update ----------------
        # per-view residual sum of squares E[(y − z·sw)²] column sums; the
        # masked case is ((z2 @ SWWᵀ − Zm² @ (SW²)ᵀ) · B) column-summed — a
        # plain (N,K)@(K,D) matmul + elementwise mask, which compiles to a
        # single MXU op (a 3-operand einsum here bloated the HLO and the
        # compile time badly)
        ss_views = []
        n_d_views = []
        for m in range(M):
            B = state["mask"][m] if masked[m] else None
            E = Es[m]
            ss = (E * E).sum(axis=0)
            if B is None:
                ss = ss + z2.sum(0) @ SWW[m].T - (Zm * Zm).sum(0) @ (SWs[m] * SWs[m]).T
                n_d = float(N)
            else:
                corr = z2 @ SWW[m].T - (Zm * Zm) @ (SWs[m] * SWs[m]).T  # (N, D)
                ss = ss + (corr * B).sum(axis=0)
                n_d = B.sum(axis=0)
            ss_views.append(ss)
            n_d_views.append(n_d)

        new_tau, new_ln_tau = [], []
        for m in range(M):
            a = A0 + 0.5 * n_d_views[m]
            b = B0 + 0.5 * ss_views[m]
            new_tau.append(a / b)
            new_ln_tau.append(_digamma(a) - jnp.log(b))

        # ---------------- α update (weights ARD) ----------------
        if config.ard_weights:
            alpha_new = []
            ln_alpha_new = []
            for m in range(M):
                # E[ŵ²] = S(v+ŵ²) + (1−S)/α_prev
                w2 = Svs[m] * (Wvs[m] + Whats[m] ** 2) + (1.0 - Svs[m]) / alpha[m][None, :]
                a = A0 + 0.5 * Ds[m]
                b = B0 + 0.5 * w2.sum(axis=0)
                alpha_new.append(a / b)
                ln_alpha_new.append(_digamma(a) - jnp.log(b))
            alpha = jnp.stack(alpha_new)
            ln_alpha = jnp.stack(ln_alpha_new)

        # ---------------- α_z update (factor ARD per group) ----------------
        if config.ard_factors:
            Ng = Gh.sum(axis=0)  # (G,)
            z2_per_group = Gh.T @ z2  # (G, K)
            a = A0 + 0.5 * Ng[:, None]
            b = B0 + 0.5 * z2_per_group
            alpha_z = a / b

        # ---------------- θ update ----------------
        if config.spikeslab_weights:
            th_ln, th_ln1m, th_mean = [], [], []
            for m in range(M):
                sa = THETA_A0 + Svs[m].sum(axis=0)
                sb = THETA_B0 + Ds[m] - Svs[m].sum(axis=0)
                th_ln.append(_digamma(sa) - _digamma(sa + sb))
                th_ln1m.append(_digamma(sb) - _digamma(sa + sb))
                th_mean.append(sa / (sa + sb))
            theta_ln = jnp.stack(th_ln)
            theta_ln1m = jnp.stack(th_ln1m)
            theta_mean = jnp.stack(th_mean)
        else:
            theta_mean = state["theta_mean"]

        # ---------------- ELBO (up to constants) ----------------
        # reuses the per-view ss from the τ update (identical expression)
        elbo = 0.0
        for m in range(M):
            tau = new_tau[m]
            ln_tau = new_ln_tau[m]
            elbo = elbo + jnp.sum(
                0.5 * n_d_views[m] * (ln_tau - jnp.log(2 * jnp.pi))
                - 0.5 * tau * ss_views[m]
            )
        # KL(Z) with prior precision
        elbo = elbo - 0.5 * jnp.sum(
            prior_prec * z2 - 1.0 - jnp.log(prior_prec * Zv)
        )
        # KL for W (gaussian slab part, vs N(0, 1/α))
        for m in range(M):
            w2 = Wvs[m] + Whats[m] ** 2
            kl_w = 0.5 * (
                alpha[m][None, :] * w2 - 1.0 - ln_alpha[m][None, :] - jnp.log(Wvs[m])
            )
            if config.spikeslab_weights:
                # 1e-6 is the largest eps with 1-eps != 1 in f32
                s = jnp.clip(Svs[m], 1e-6, 1.0 - 1e-6)
                kl_s = s * (jnp.log(s) - theta_ln[m][None, :]) + (1 - s) * (
                    jnp.log(1 - s) - theta_ln1m[m][None, :]
                )
                elbo = elbo - jnp.sum(s * kl_w) - jnp.sum(kl_s)
            else:
                elbo = elbo - jnp.sum(kl_w)

        new_state = {
            "Z_mean": Zm,
            "Z_var": Zv,
            "G": Gh,
            "E": Es,
            "mask": state["mask"],
            "W_hat": Whats,
            "W_var": Wvs,
            "S": Svs,
            "SW": SWs,
            "alpha": alpha,
            "ln_alpha": ln_alpha,
            "alpha_z": alpha_z,
            "tau": new_tau,
            "ln_tau": new_ln_tau,
            "theta_ln": theta_ln if config.spikeslab_weights else state["theta_ln"],
            "theta_ln1m": theta_ln1m
            if config.spikeslab_weights
            else state["theta_ln1m"],
            "theta_mean": theta_mean,
        }
        return new_state, elbo

    return step


def _init_state(Ys, masks, groups_onehot, config: MOFAConfig):
    jax, jnp = _jax()
    key = jax.random.PRNGKey(config.seed)
    N = Ys[0].shape[0]
    K = config.n_factors
    M = len(Ys)
    G = config.n_groups

    Zm = jax.random.normal(key, (N, K), dtype=jnp.float32)
    Zv = jnp.ones((N, K), jnp.float32)
    state = {
        "Z_mean": Zm,
        "Z_var": Zv,
        "G": jnp.asarray(groups_onehot, jnp.float32),
        "E": [],
        "mask": [],
        "W_hat": [],
        "W_var": [],
        "S": [],
        "SW": [],
        "alpha": jnp.ones((M, K), jnp.float32),
        "ln_alpha": jnp.zeros((M, K), jnp.float32),
        "alpha_z": jnp.ones((G, K), jnp.float32),
        "tau": [],
        "ln_tau": [],
        "theta_ln": jnp.full((M, K), math.log(0.5), jnp.float32),
        "theta_ln1m": jnp.full((M, K), math.log(0.5), jnp.float32),
        "theta_mean": jnp.full((M, K), 0.5, jnp.float32),
    }
    for m, Y in enumerate(Ys):
        D = Y.shape[1]
        B = masks[m]
        Yj = jnp.asarray(np.nan_to_num(Y, nan=0.0), jnp.float32)
        state["mask"].append(
            jnp.asarray(B, jnp.float32) if B is not None else None
        )
        # W starts at zero → E starts as (masked) Y
        state["E"].append(Yj if B is None else Yj * jnp.asarray(B, jnp.float32))
        state["W_hat"].append(jnp.zeros((D, K), jnp.float32))
        state["W_var"].append(jnp.ones((D, K), jnp.float32))
        state["S"].append(jnp.full((D, K), 0.5 if config.spikeslab_weights else 1.0,
                                   jnp.float32))
        state["SW"].append(jnp.zeros((D, K), jnp.float32))
        var = np.nanvar(Y, axis=0)
        var[~np.isfinite(var) | (var == 0)] = 1.0
        state["tau"].append(jnp.asarray(1.0 / var, jnp.float32))
        state["ln_tau"].append(jnp.asarray(-np.log(var), jnp.float32))
    return state


def fit_mofa(
    Ys: List[np.ndarray],
    config: MOFAConfig,
    masks: Optional[List[Optional[np.ndarray]]] = None,
    groups: Optional[np.ndarray] = None,
    n_iterations: int = 1000,
    convergence_mode: str = "fast",
    elbo_every: int = 5,
    min_iterations: int = 10,
    verbose: bool = False,
    mesh=None,
) -> MOFAResult:
    """Train MOFA+ by VB coordinate ascent.

    Ys: per-view (N, D_m) arrays, NaN = missing. groups: (N,) int labels.
    Matches the training loop semantics of the reference's mofapy2 bridge
    (muon/_core/tools.py:583-585): ≤ n_iterations sweeps, ELBO-change
    convergence with fast/medium/slow thresholds."""
    jax, jnp = _jax()
    N = Ys[0].shape[0]
    M = len(Ys)
    if groups is None:
        groups = np.zeros(N, dtype=np.int64)
    G = int(groups.max()) + 1
    onehot = np.zeros((N, G), dtype=np.float32)
    onehot[np.arange(N), groups] = 1.0
    config = MOFAConfig(
        n_factors=config.n_factors,
        likelihoods=config.likelihoods,
        ard_weights=config.ard_weights,
        ard_factors=config.ard_factors and G >= 1,
        spikeslab_weights=config.spikeslab_weights,
        spikeslab_factors=config.spikeslab_factors,
        n_groups=G,
        seed=config.seed,
    )

    if masks is None:
        masks = []
        for Y in Ys:
            if np.isnan(Y).any():
                masks.append((~np.isnan(Y)).astype(np.float32))
            else:
                masks.append(None)

    masked = [m is not None for m in masks]
    step = _make_step(config, [Y.shape[1] for Y in Ys], N, masked)
    step_jit = jax.jit(step)

    state = _init_state(Ys, masks, onehot, config)
    if mesh is not None:
        # multi-chip: shard the state over the ("cells","feat") mesh; the
        # jitted sweep then runs SPMD with XLA-inserted collectives
        from ..parallel import shard_mofa_state

        state = shard_mofa_state(state, mesh)

    threshold = CONVERGENCE_THRESHOLDS.get(convergence_mode, 5e-4)
    elbos = []
    first_elbo = None
    converged = False
    it = 0
    while it < n_iterations:
        state, elbo = step_jit(state)
        it += 1
        if it % elbo_every == 0 or it == 1 or it == n_iterations:
            e = float(elbo)
            elbos.append(e)
            if verbose:
                print(f"iter {it}: ELBO {e:.4f}")
            if first_elbo is None:
                first_elbo = e
            elif len(elbos) > 2 and it >= min_iterations:
                delta = abs(elbos[-1] - elbos[-2])
                if delta / max(abs(first_elbo), 1e-30) * 100 < threshold:
                    converged = True
                    break

    Zm = np.asarray(state["Z_mean"])
    SWs = [np.asarray(sw) for sw in state["SW"]]

    # sort factors by total variance explained, descending (mofapy2 orders
    # factors this way before saving, which the reference's active/inactive
    # factor assertions rely on — tests/test_muon_tools.py:42-44)
    Ysc = [np.nan_to_num(Y, nan=0.0) for Y in Ys]
    ss_tot = sum((Y**2).sum() for Y in Ysc)
    r2k = np.zeros(config.n_factors)
    for k in range(config.n_factors):
        res_k = 0.0
        for m, Y in enumerate(Ysc):
            pred = np.outer(Zm[:, k], SWs[m][:, k])
            if masks[m] is not None:
                pred = pred * masks[m]
            res_k += ((Y - pred) ** 2).sum()
        r2k[k] = 1.0 - res_k / max(ss_tot, 1e-30)
    order = np.argsort(-r2k)
    Zm = Zm[:, order]
    SWs = [sw[:, order] for sw in SWs]
    state_S = [np.asarray(s)[:, order] for s in state["S"]]
    alpha_sorted = np.asarray(state["alpha"])[:, order]
    theta_sorted = np.asarray(state["theta_mean"])[:, order]

    result = MOFAResult(
        Z=Zm,
        W=SWs,
        S=state_S,
        alpha=alpha_sorted,
        tau=[np.asarray(t) for t in state["tau"]],
        theta=theta_sorted,
        elbo_history=np.asarray(elbos),
        n_iterations=it,
        converged=converged,
    )

    # variance explained per factor (MOFA convention: 1 − SS_res(k)/SS_tot,
    # per view × group)
    r2pf = {}
    r2tot = {}
    for g in range(G):
        rows = groups == g
        r2 = np.zeros((M, config.n_factors))
        r2t = np.zeros(M)
        for m, Y in enumerate(Ys):
            Yg = np.nan_to_num(Y[rows], nan=0.0)
            Bm = None if masks[m] is None else masks[m][rows]
            if Bm is not None:
                Yg = Yg * Bm
            ss_tot = (Yg**2).sum()
            pred_full = Zm[rows] @ SWs[m].T
            if Bm is not None:
                pred_full = pred_full * Bm
            r2t[m] = max(0.0, 1.0 - ((Yg - pred_full) ** 2).sum() / max(ss_tot, 1e-30))
            for k in range(config.n_factors):
                pred = np.outer(Zm[rows, k], SWs[m][:, k])
                if Bm is not None:
                    pred = pred * Bm
                r2[m, k] = 1.0 - ((Yg - pred) ** 2).sum() / max(ss_tot, 1e-30)
        r2pf[g] = np.maximum(r2, 0.0)
        r2tot[g] = r2t
    result.r2_per_factor = r2pf
    result.r2_total = r2tot
    return result
