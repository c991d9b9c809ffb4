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
    spikeslab_factors: bool = False  # sample-wise sparsity on Z
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
    gp_lengthscales: "Optional[np.ndarray]" = None  # (K,) MEFISTO ℓ per factor
    gp_scales: "Optional[np.ndarray]" = None        # (K,) MEFISTO smoothness
    warped_covariates: "Optional[np.ndarray]" = None  # (N,) aligned covariate
    gp_group_corr: "Optional[np.ndarray]" = None    # (K, G, G) learned Kg


def _digamma(x):
    jax, jnp = _jax()
    return jax.scipy.special.digamma(x)


def _make_step(
    config: MOFAConfig,
    Ds: Sequence[int],
    N: int,
    masked: Sequence[bool],
    liks: Optional[Sequence[str]] = None,
    smooth: bool = False,
    sparse_gp: bool = False,
):
    """Build the jitted coordinate-ascent sweep for static shapes.

    Non-gaussian views (bernoulli / poisson) train through local quadratic
    bounds recomputed at the start of every sweep (mofapy2's scheme):
    - bernoulli (Jaakkola): per-entry precision T = 2λ(ζ)·mask with
      ζ² = E[(z·w)²]; the precision-weighted residual (y − ½)·mask − T·F
      slots into the masked-path math with τ ≡ 1 (per-entry precision is
      just a continuous "mask").
    - poisson (Seeger): per-feature precision κ_d = ¼ + 0.17·max_n(y_nd);
      pseudodata ζ − σ(ζ)(1 − y/softplus(ζ))/κ with ζ = E[z·w].
    For these views τ is fixed by the bound (never updated).
    """
    jax, jnp = _jax()
    K = config.n_factors
    M = len(Ds)
    G = config.n_groups
    if liks is None:
        liks = ["gaussian"] * M
    nongauss = [lk in ("bernoulli", "poisson") for lk in liks]

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
        masks_eff = list(state["mask"])

        # ---------- non-gaussian: refresh bound precisions + pseudodata ----
        z2_top = Zv + Zm * Zm
        for m in range(M):
            if not nongauss[m]:
                continue
            SWm = state["SW"][m]
            SWWm = state["S"][m] * (
                state["W_var"][m] + state["W_hat"][m] ** 2
            )
            M01 = state["M01"][m]            # (N, D) 0/1 observed mask
            Y0 = state["Y0"][m]              # raw y · mask
            F = Zm @ SWm.T                   # (N, D) E[z·w]
            if liks[m] == "bernoulli":
                e2 = (
                    F * F
                    + z2_top @ SWWm.T
                    - (Zm * Zm) @ (SWm * SWm).T
                )
                zeta = jnp.sqrt(jnp.maximum(e2, 1e-10))
                lam = jnp.where(
                    zeta > 1e-4,
                    jnp.tanh(zeta / 2.0) / (4.0 * zeta),
                    0.125,
                )
                T = 2.0 * lam * M01
                masks_eff[m] = T
                Es[m] = (Y0 - 0.5 * M01) - T * F
            else:  # poisson
                kappa = state["tau"][m]      # (D,) fixed bound precision
                rate = jax.nn.softplus(F)
                pseudo = F - jax.nn.sigmoid(F) * (
                    1.0 - Y0 / jnp.maximum(rate, 1e-6)
                ) / kappa[None, :]
                Es[m] = (pseudo - F) * M01
                masks_eff[m] = M01

        # ---------------- W sweep (per view) ----------------
        for m in range(M):
            D = Ds[m]
            tau = state["tau"][m]            # (D,)
            B = masks_eff[m] if masked[m] else None  # (N, D) f32 or None
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
        if smooth:
            # GP prior enters through gp_K in the solve; no diagonal prior
            prior_prec = jnp.zeros((N, K), Zm.dtype)
        elif config.ard_factors:
            prior_prec = Gh @ alpha_z
        else:
            prior_prec = jnp.ones((N, K), Zm.dtype)

        # per-view constants
        tSWW = []
        tSW2 = []
        for m in range(M):
            tau = state["tau"][m]
            tSWW.append((tau[:, None] * SWW[m]))          # (D, K)
            tSW2.append((tau[:, None] * SWs[m] * SWs[m]))

        ssz = config.spikeslab_factors and not smooth
        if ssz:
            # per-cell expansions of the group-level spike-slab parameters
            thz_gap = Gh @ (state["theta_z_ln"] - state["theta_z_ln1m"])
            ln_az_cell = Gh @ state["ln_alpha_z"]          # (N, K)

        def z_body(k, carry):
            Zm, Zv, Zhat, Zvhat, ZS, Es = carry
            p = jax.lax.dynamic_slice_in_dim(prior_prec, k, 1, 1)[:, 0]
            b = jnp.zeros((N,), Zm.dtype)
            for m in range(M):
                tau = state["tau"][m]
                B = masks_eff[m] if masked[m] else None
                swk = jax.lax.dynamic_slice_in_dim(SWs[m], k, 1, 1)[:, 0]
                tsw = tau * swk
                if B is None:
                    p = p + tSWW[m][:, k].sum()
                    b = b + Es[m] @ tsw + Zm[:, k] * tSW2[m][:, k].sum()
                else:
                    p = p + B @ tSWW[m][:, k]
                    b = b + Es[m] @ tsw + Zm[:, k] * (B @ tSW2[m][:, k])
            if smooth and sparse_gp:
                # sparse (inducing-point) GP, SGPR form (mofapy2's
                # sparseGP option, reference muon/_core/tools.py:542-543,
                # 578-579): with Σ = K_mm + K_mn diag(p) K_nm,
                #   E[z]   = K_nm Σ⁻¹ K_mn b
                #   Var[z] = k_ii − diag(Nyström) + diag(K_nm Σ⁻¹ K_mm Σ⁻¹ K_mn)
                # Kernels are built in-step from the covariates so state
                # never holds an (N, N) matrix — cost is O(N·M²+M³).
                cn = state["gp_cov"]
                cu = state["gp_cov_u"]
                ell = state["gp_ell"][k]
                sc = state["gp_scale"][k]
                jit_eps = 1e-4
                gn_ = state["gp_g"]
                gu_ = state["gp_g_u"]
                if "gp_Kg" in state:
                    # learned group-correlation kernel (mofapy2
                    # model_groups × sparseGP, reference option surface
                    # muon/_core/tools.py:564-580): the group factor of
                    # the covariance is Kg[g_i, g_j] instead of the
                    # independent-groups delta — Kg = I recovers it. The
                    # SGPR algebra below is unchanged: Kg is PSD with
                    # unit diagonal, so K stays a valid kernel and the
                    # prior variance k_ii is still s + (1−s+ε).
                    Kgk = jax.lax.dynamic_slice_in_dim(
                        state["gp_Kg"], k, 1, 0
                    )[0]
                    giu = gu_.astype(jnp.int32)
                    gin = gn_.astype(jnp.int32)
                    fac_uu = Kgk[giu][:, giu]
                    fac_nu = Kgk[gin][:, giu]
                else:
                    fac_uu = (gu_[:, None] == gu_[None, :]).astype(Zm.dtype)
                    fac_nu = (gn_[:, None] == gu_[None, :]).astype(Zm.dtype)
                d2u = ((cu[:, None, :] - cu[None, :, :]) ** 2).sum(-1)
                Kmm = sc * jnp.exp(-0.5 * d2u / (ell**2)) * fac_uu + (
                    1.0 - sc + jit_eps
                ) * jnp.eye(cu.shape[0], dtype=Zm.dtype)
                d2nm = ((cn[:, None, :] - cu[None, :, :]) ** 2).sum(-1)
                Knm = sc * jnp.exp(-0.5 * d2nm / (ell**2)) * fac_nu
                Sig = Kmm + (Knm.T * p[None, :]) @ Knm
                L = jnp.linalg.cholesky(Sig)
                w1 = jax.scipy.linalg.cho_solve((L, True), Knm.T @ b)
                z_new = Knm @ w1
                Bm = jax.scipy.linalg.cho_solve((L, True), Knm.T)
                proj = ((Kmm @ Bm) * Bm).sum(axis=0)
                Lm = jnp.linalg.cholesky(Kmm)
                A2 = jax.scipy.linalg.solve_triangular(
                    Lm, Knm.T, lower=True
                )
                q_ii = (A2 * A2).sum(axis=0)
                v_new = jnp.maximum(1.0 + jit_eps - q_ii + proj, 1e-8)
            elif smooth:
                # MEFISTO smooth factor: q(z_k) = N(Σb, Σ) with
                # Σ = (K_k⁻¹ + diag(p))⁻¹, solved via the Woodbury form
                # Σ = K − KS(I + SKS)⁻¹SK (S = diag √p) — Cholesky + two
                # triangular solves, all MXU matmuls, no explicit K⁻¹
                Kk = jax.lax.dynamic_slice_in_dim(state["gp_K"], k, 1, 0)[0]
                sq = jnp.sqrt(p)
                A = jnp.eye(N, dtype=Zm.dtype) + (sq[:, None] * Kk) * sq[None, :]
                L = jnp.linalg.cholesky(A)
                V = jax.scipy.linalg.solve_triangular(
                    L, sq[:, None] * Kk, lower=True
                )  # (N, N) = L⁻¹ S K
                Kb = Kk @ b
                z_new = Kb - V.T @ (V @ b)
                v_new = jnp.maximum(
                    jnp.diagonal(Kk) - (V * V).sum(axis=0), 1e-8
                )
            elif ssz:
                # spike-slab factor (z = s·ẑ, s ~ Bern(θ_z per group)):
                # exactly the W spike-slab update transposed to cells.
                # Z_mean/Z_var keep the E[z]/Var[z] convention so every
                # downstream z² consumer stays valid.
                z_hat = b / p
                v_hat = 1.0 / p
                lam = (
                    thz_gap[:, k]
                    + 0.5 * ln_az_cell[:, k]
                    - 0.5 * jnp.log(p)
                    + 0.5 * b * b / p
                )
                # delayed sparsity (mofapy2 start_sparsity): dense updates
                # until the host loop flips ssz_on — sparsifying from the
                # first sweep kills weak factors before they can grow
                s_z = jnp.where(
                    state["ssz_on"] > 0, jax.nn.sigmoid(lam), 1.0
                )
                z_new = s_z * z_hat
                ez2 = s_z * (v_hat + z_hat * z_hat)
                v_new = jnp.maximum(ez2 - z_new * z_new, 1e-12)
                Zhat = jax.lax.dynamic_update_slice_in_dim(
                    Zhat, z_hat[:, None], k, 1
                )
                Zvhat = jax.lax.dynamic_update_slice_in_dim(
                    Zvhat, v_hat[:, None], k, 1
                )
                ZS = jax.lax.dynamic_update_slice_in_dim(
                    ZS, s_z[:, None], k, 1
                )
            else:
                z_new = b / p
                v_new = 1.0 / p
            zk_old = jax.lax.dynamic_slice_in_dim(Zm, k, 1, 1)[:, 0]
            delta = zk_old - z_new
            new_Es = []
            for m in range(M):
                swk = jax.lax.dynamic_slice_in_dim(SWs[m], k, 1, 1)[:, 0]
                B = masks_eff[m] if masked[m] else None
                corr = delta[:, None] * swk[None, :]
                new_Es.append(Es[m] + (corr * B if B is not None else corr))
            Zm = jax.lax.dynamic_update_slice_in_dim(Zm, z_new[:, None], k, 1)
            Zv = jax.lax.dynamic_update_slice_in_dim(Zv, v_new[:, None], k, 1)
            return (Zm, Zv, Zhat, Zvhat, ZS, tuple(new_Es))

        if ssz:
            Zhat0 = state["Z_hat"]
            Zvhat0 = state["Z_vhat"]
            ZS0 = state["Z_S"]
        else:  # placeholders, untouched by the loop body
            Zhat0 = Zm
            Zvhat0 = Zv
            ZS0 = Zm
        Zm, Zv, Zhat, Zvhat, ZS, Es_t = jax.lax.fori_loop(
            0, K, z_body, (Zm, Zv, Zhat0, Zvhat0, ZS0, tuple(Es))
        )
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
            B = masks_eff[m] if masked[m] else None
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
            if nongauss[m]:
                # τ is fixed by the quadratic bound, never inferred
                new_tau.append(state["tau"][m])
                new_ln_tau.append(state["ln_tau"][m])
                continue
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
        ln_alpha_z = state.get("ln_alpha_z")
        if config.ard_factors:
            Ng = Gh.sum(axis=0)  # (G,)
            if ssz:
                # E[ẑ²] = S(v̂+ẑ²) + (1−S)/α_prev (slab-conditional moment)
                az_cell = Gh @ alpha_z
                zhat2 = ZS * (Zvhat + Zhat * Zhat) + (1.0 - ZS) / az_cell
                z2_per_group = Gh.T @ zhat2
            else:
                z2_per_group = Gh.T @ z2  # (G, K)
            a = A0 + 0.5 * Ng[:, None]
            b = B0 + 0.5 * z2_per_group
            alpha_z = a / b
            if ssz:
                ln_alpha_z = _digamma(a) - jnp.log(b)

        # ---------------- θ_z update (spike-slab factors, per group) -------
        if ssz:
            Ng_col = Gh.sum(axis=0)[:, None]  # (G, 1)
            s_per_group = Gh.T @ ZS           # (G, K)
            sa = THETA_A0 + s_per_group
            sb = THETA_B0 + Ng_col - s_per_group
            theta_z_ln = _digamma(sa) - _digamma(sa + sb)
            theta_z_ln1m = _digamma(sb) - _digamma(sa + sb)
            theta_z_mean = sa / (sa + sb)

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
        # KL(Z) with prior precision (unit-prior surrogate when the GP
        # prior is active — exact GP KL costs K extra Cholesky factorizations
        # and only the convergence deltas matter here)
        kl_prec = jnp.ones_like(prior_prec) if smooth else prior_prec
        elbo = elbo - 0.5 * jnp.sum(
            kl_prec * z2 - 1.0 - jnp.log(kl_prec * Zv)
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
            **(
                {
                    "ssz_on": state["ssz_on"],
                    "Z_hat": Zhat,
                    "Z_vhat": Zvhat,
                    "Z_S": ZS,
                    "theta_z_ln": theta_z_ln,
                    "theta_z_ln1m": theta_z_ln1m,
                    "theta_z_mean": theta_z_mean,
                    "ln_alpha_z": ln_alpha_z,
                }
                if ssz
                else {}
            ),
            "G": Gh,
            "E": Es,
            "mask": masks_eff,
            "M01": state["M01"],
            "Y0": state["Y0"],
            **(
                {
                    "gp_cov": state["gp_cov"],
                    "gp_cov_u": state["gp_cov_u"],
                    "gp_ell": state["gp_ell"],
                    "gp_scale": state["gp_scale"],
                    "gp_g": state["gp_g"],
                    "gp_g_u": state["gp_g_u"],
                    **(
                        {"gp_Kg": state["gp_Kg"]}
                        if "gp_Kg" in state
                        else {}
                    ),
                }
                if (smooth and sparse_gp)
                else ({"gp_K": state["gp_K"]} if smooth else {})
            ),
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


# ---------------------------------------------------------------------------
# MEFISTO smooth factors: GP priors on Z over a covariate
# ---------------------------------------------------------------------------


def _rbf_kernel(jnp, c, ell, scale, jitter=1e-4, gvec=None, Kg=None):
    """K = s·exp(−‖cᵢ−cⱼ‖²/2ℓ²) + (1−s+jitter)·I over covariates c (N, p).

    gvec (N,) group labels makes the kernel block-diagonal across groups
    (mofapy2's model_groups structure with independent groups): smoothness
    is enforced within each group's trajectory only, which is what lets
    DTW warping observe group-specific shapes instead of a prior that has
    already tied the groups together on the unaligned covariate.

    Kg (G, G) — a LEARNED group-correlation matrix (mofapy2 model_groups,
    reference option surface muon/_core/tools.py:564-580): the covariance
    factorizes as Kg[g_i, g_j] · exp(−d²/2ℓ²). Kg = I recovers the
    independent-groups block-diagonal case."""
    d2 = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    K = scale * jnp.exp(-0.5 * d2 / (ell**2))
    if Kg is not None and gvec is not None:
        gi = gvec.astype(jnp.int32)
        K = K * Kg[gi][:, gi]
    elif gvec is not None:
        K = K * (gvec[:, None] == gvec[None, :]).astype(K.dtype)
    return K + (1.0 - scale + jitter) * jnp.eye(c.shape[0], dtype=c.dtype)


def _normalize_kg(jnp, X, eps=1e-4):
    """Kg = corr(X Xᵀ + εI): PSD with unit diagonal by construction."""
    G = X.shape[0]
    Kg = X @ X.T + eps * jnp.eye(G, dtype=X.dtype)
    dd = jnp.sqrt(jnp.diagonal(Kg))
    return Kg / (dd[:, None] * dd[None, :])


@lru_cache(maxsize=None)
def _gp_group_fn():
    """Learn the per-factor group-correlation matrix Kg by gradient ascent
    on the GP marginal term −½(logdet K + μᵀK⁻¹μ + tr(K⁻¹diag(v))) with
    (ℓ, s) fixed — the TPU-idiomatic replacement for mofapy2's scipy
    L-BFGS over its Kg parameterization (autodiff through the Cholesky
    instead of hand-coded gradients)."""
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("n_steps",))
    def f(c, Zm, Zv, ells, scales, gvec, X_all, n_steps=10, lr=0.2):
        N = c.shape[0]
        gi = gvec.astype(jnp.int32)
        d2 = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        eye = jnp.eye(N, dtype=c.dtype)

        def neg_score(X, ell, scale, zm, zv):
            Kg = _normalize_kg(jnp, X)
            K = (
                scale * Kg[gi][:, gi] * jnp.exp(-0.5 * d2 / (ell**2))
                + (1.0 - scale + 1e-4) * eye
            )
            L = jnp.linalg.cholesky(K)
            logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
            sol = jax.scipy.linalg.cho_solve((L, True), zm)
            quad = zm @ sol
            Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
            kinv_diag = (Linv * Linv).sum(axis=0)
            tr = zv @ kinv_diag
            return 0.5 * (logdet + quad + tr)

        grad_one = jax.grad(neg_score)

        def step(X_all, _):
            g = jax.vmap(grad_one)(X_all, ells, scales, Zm.T, Zv.T)
            # normalize step size per factor for stable fixed-lr descent
            gn = jnp.sqrt((g * g).sum(axis=(1, 2), keepdims=True))
            return X_all - lr * g / jnp.maximum(gn, 1e-8), None

        X_all, _ = jax.lax.scan(step, X_all, None, length=n_steps)
        Kg_all = jax.vmap(lambda X: _normalize_kg(jnp, X))(X_all)
        return X_all, Kg_all

    return f


@lru_cache(maxsize=None)
def _gp_hyper_fn():
    """Grid-score GP hyperparameters: per factor, maximize the GP marginal
    term −½(logdet K + μᵀK⁻¹μ + Σᵢ K⁻¹ᵢᵢ vᵢ) over (ℓ, s) — mofapy2
    optimizes its lengthscales/scales the same way (grid + refine)."""
    jax, jnp = _jax()

    @jax.jit
    def f(c, Zm, Zv, ells, scales, gvec=None):
        def score_one(ell, scale):
            K = _rbf_kernel(jnp, c, ell, scale, gvec=gvec)
            L = jnp.linalg.cholesky(K)
            logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
            sol = jax.scipy.linalg.cho_solve((L, True), Zm)  # (N, K)
            quad = (Zm * sol).sum(axis=0)                    # (K,)
            Linv = jax.scipy.linalg.solve_triangular(
                L, jnp.eye(c.shape[0], dtype=c.dtype), lower=True
            )
            kinv_diag = (Linv * Linv).sum(axis=0)            # (N,)
            tr = Zv.T @ kinv_diag                            # (K,)
            return -0.5 * (logdet + quad + tr)               # (K,)

        grid = jax.vmap(
            lambda ell: jax.vmap(lambda s: score_one(ell, s))(scales)
        )(ells)  # (n_ell, n_scale, K)
        flat = grid.reshape(-1, grid.shape[-1])
        best = jnp.argmax(flat, axis=0)
        best_ell = ells[best // scales.shape[0]]
        best_scale = scales[best % scales.shape[0]]
        return best_ell, best_scale

    return f


@lru_cache(maxsize=None)
def _gp_kmat_fn():
    jax, jnp = _jax()

    @jax.jit
    def f(c, ells, scales, gvec=None, Kg=None):
        if Kg is None:
            return jax.vmap(
                lambda e, s: _rbf_kernel(jnp, c, e, s, gvec=gvec)
            )(ells, scales)
        return jax.vmap(
            lambda e, s, kg: _rbf_kernel(jnp, c, e, s, gvec=gvec, Kg=kg)
        )(ells, scales, Kg)

    return f


def _dtw_align(ref_t, ref_z, g_t, g_z, open_begin=True, open_end=True):
    """Warp a group's trajectory onto the reference time base by DTW.

    mofapy2's MEFISTO warping (reference option surface
    muon/_core/tools.py:538-541: warping_freq/ref/open_begin/open_end)
    aligns each group's factor trajectory to a reference group with
    dynamic time warping and replaces the group's covariate with the
    matched reference times. Inputs are per-unique-timepoint group-mean
    factor values; alignment cost is squared Euclidean distance between
    factor vectors. Returns the warped time for each of g's timepoints
    (mean of matched reference times). Host-side numpy: the DP is tiny
    (runs over unique covariate values, not cells) and inherently
    sequential, so it stays off the device.
    """
    C = ((g_z[:, None, :] - ref_z[None, :, :]) ** 2).sum(-1)
    Tg, Tr = C.shape
    D = np.empty((Tg, Tr))
    if open_begin:
        D[0] = C[0]
    else:
        D[0] = np.cumsum(C[0])
    for i in range(1, Tg):
        prev = D[i - 1]
        # min(D[i-1,j], D[i-1,j-1]) is vectorizable; D[i,j-1] is a scan
        diag = np.concatenate(([np.inf], prev[:-1]))
        best_up = np.minimum(prev, diag)
        row = D[i]
        left = np.inf
        ci = C[i]
        for j in range(Tr):
            left = ci[j] + min(best_up[j], left)
            row[j] = left
    j = int(np.argmin(D[-1])) if open_end else Tr - 1
    matched = [[] for _ in range(Tg)]
    i = Tg - 1
    while True:
        matched[i].append(ref_t[j])
        if i == 0 and (open_begin or j == 0):
            break
        cands = []
        if i > 0:
            cands.append((D[i - 1, j], i - 1, j))
            if j > 0:
                cands.append((D[i - 1, j - 1], i - 1, j - 1))
        if j > 0:
            cands.append((D[i, j - 1], i, j - 1))
        _, i, j = min(cands)
    return np.array([np.mean(m) for m in matched])


def _warp_groups(
    cov_norm, groups, Zm, ref, open_begin=True, open_end=True
):
    """Apply DTW warping to every non-reference group's covariate.

    cov_norm: (N,) normalized covariate; groups: (N,) int labels;
    Zm: (N, K) current E[z]. Returns the new (N,) covariate with each
    non-reference group's values replaced by their DTW-matched positions
    on the reference group's time base.
    """
    out = cov_norm.copy()
    rsel = groups == ref
    rt, rinv = np.unique(cov_norm[rsel], return_inverse=True)
    rz = np.zeros((len(rt), Zm.shape[1]))
    np.add.at(rz, rinv, Zm[rsel])
    rz /= np.bincount(rinv)[:, None]
    for g in np.unique(groups):
        if g == ref:
            continue
        gsel = groups == g
        gt, ginv = np.unique(cov_norm[gsel], return_inverse=True)
        gz = np.zeros((len(gt), Zm.shape[1]))
        np.add.at(gz, ginv, Zm[gsel])
        gz /= np.bincount(ginv)[:, None]
        warped = _dtw_align(rt, rz, gt, gz, open_begin, open_end)
        out[gsel] = warped[ginv]
    return out


def _make_svi_step(
    config: MOFAConfig,
    Ds: Sequence[int],
    N: int,
    S: int,
    liks: Sequence[str],
):
    """Stochastic-VI sweep over a size-S cell minibatch (mofapy2's SVI mode,
    reference option surface muon/_core/tools.py:520-527).

    Local variables (the batch's rows of Z) get exact coordinate updates;
    global variables (W, τ, α, θ) are re-estimated from batch statistics
    scaled by N/S and blended into the running values with step size ρ_t —
    the moment-space form of natural-gradient SVI. Requires raw data
    retained in state (Y0/M01 for every view)."""
    jax, jnp = _jax()
    K = config.n_factors
    M = len(Ds)
    scale = N / float(S)
    nongauss = [lk in ("bernoulli", "poisson") for lk in liks]

    def step(state, batch, rho):
        take = lambda a: jnp.take(a, batch, axis=0)  # noqa: E731
        Zm_full, Zv_full = state["Z_mean"], state["Z_var"]
        Zb = take(Zm_full)
        Zvb = take(Zv_full)
        Gb = take(state["G"])
        alpha = state["alpha"]
        ln_alpha = state["ln_alpha"]
        alpha_z = state["alpha_z"]
        theta_ln = state["theta_ln"]
        theta_ln1m = state["theta_ln1m"]
        ssz = config.spikeslab_factors
        if ssz:
            Zhat_b = take(state["Z_hat"])
            Zvhat_b = take(state["Z_vhat"])
            ZS_b = take(state["Z_S"])
            thz_gap_b = Gb @ (state["theta_z_ln"] - state["theta_z_ln1m"])
            ln_az_b = Gb @ state["ln_alpha_z"]

        # ---- batch residuals + bound refresh ----
        # Tgts holds the pseudo-target per view so residuals can be rebuilt
        # cheaply after the W blend: E = Tgt − B·F (B=None → E = Tgt − F)
        Es, Bs, Tgts = [], [], []
        z2b = Zvb + Zb * Zb
        for m in range(M):
            SWm = state["SW"][m]
            Yb = take(state["Y0"][m])
            Mb = take(state["M01"][m]) if state["M01"][m] is not None else None
            F = Zb @ SWm.T
            if not nongauss[m]:
                if Mb is None:
                    Tgts.append(Yb)
                    Es.append(Yb - F)
                    Bs.append(None)
                else:
                    Tgts.append(Yb * Mb)
                    Es.append(Yb * Mb - F * Mb)
                    Bs.append(Mb)
            elif liks[m] == "bernoulli":
                SWWm = state["S"][m] * (
                    state["W_var"][m] + state["W_hat"][m] ** 2
                )
                Mb = Mb if Mb is not None else jnp.ones_like(Yb)
                e2 = F * F + z2b @ SWWm.T - (Zb * Zb) @ (SWm * SWm).T
                zeta = jnp.sqrt(jnp.maximum(e2, 1e-10))
                lam = jnp.where(
                    zeta > 1e-4, jnp.tanh(zeta / 2.0) / (4.0 * zeta), 0.125
                )
                T = 2.0 * lam * Mb
                Tgts.append(Yb - 0.5 * Mb)
                Es.append((Yb - 0.5 * Mb) - T * F)
                Bs.append(T)
            else:  # poisson
                Mb = Mb if Mb is not None else jnp.ones_like(Yb)
                kappa = state["tau"][m]
                rate = jax.nn.softplus(F)
                pseudo = F - jax.nn.sigmoid(F) * (
                    1.0 - Yb / jnp.maximum(rate, 1e-6)
                ) / kappa[None, :]
                Tgts.append(pseudo * Mb)
                Es.append((pseudo - F) * Mb)
                Bs.append(Mb)

        # ---- global W sweep from N/S-scaled batch statistics ----
        new_W, new_Wv, new_S_, new_SW = [], [], [], []
        for m in range(M):
            tau = state["tau"][m]
            B = Bs[m]
            E = Es[m]
            SW = state["SW"][m]
            Wv = state["W_var"][m]
            Sm = state["S"][m]
            What = state["W_hat"][m]
            if B is None:
                z2_colsum = z2b.sum(axis=0) * scale
                zz_colsum = (Zb * Zb).sum(axis=0) * scale
            else:
                z2B = (z2b.T @ B) * scale
                zzB = ((Zb * Zb).T @ B) * scale

            def w_body(k, carry):
                E, What, Wv, Sm, SW = carry
                zk = jax.lax.dynamic_slice_in_dim(Zb, k, 1, 1)[:, 0]
                swk = jax.lax.dynamic_slice_in_dim(SW, k, 1, 1)[:, 0]
                if B is None:
                    a = tau * z2_colsum[k] + alpha[m, k]
                    b = tau * scale * (zk @ E) + tau * swk * zz_colsum[k]
                else:
                    a = tau * z2B[k] + alpha[m, k]
                    b = tau * scale * (zk @ E) + tau * swk * zzB[k]
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
                delta = swk - sw_new
                if B is None:
                    E = E + zk[:, None] * delta[None, :]
                else:
                    E = E + (zk[:, None] * delta[None, :]) * B
                What = jax.lax.dynamic_update_slice_in_dim(What, w_hat[:, None], k, 1)
                Wv = jax.lax.dynamic_update_slice_in_dim(Wv, v_hat[:, None], k, 1)
                Sm = jax.lax.dynamic_update_slice_in_dim(Sm, s[:, None], k, 1)
                SW = jax.lax.dynamic_update_slice_in_dim(SW, sw_new[:, None], k, 1)
                return (E, What, Wv, Sm, SW)

            E, What_b, Wv_b, S_b, SW_b = jax.lax.fori_loop(
                0, K, w_body, (E, What, Wv, Sm, SW)
            )
            Es[m] = E
            # blend batch estimate into globals with step size ρ
            new_W.append((1 - rho) * What + rho * What_b)
            new_Wv.append((1 - rho) * Wv + rho * Wv_b)
            new_S_.append((1 - rho) * Sm + rho * S_b)
            new_SW.append((1 - rho) * SW + rho * SW_b)

        # ---- rebuild batch residuals with the blended W ----
        for m in range(M):
            F = Zb @ new_SW[m].T
            Es[m] = Tgts[m] - (F if Bs[m] is None else Bs[m] * F)

        # ---- local Z sweep on the batch (exact coordinate ascent) ----
        prior_prec = (
            (Gb @ alpha_z) if config.ard_factors else jnp.ones((S, K), Zb.dtype)
        )
        SWs = new_SW
        SWW = [new_S_[m] * (new_Wv[m] + new_W[m] ** 2) for m in range(M)]
        tSWW = [state["tau"][m][:, None] * SWW[m] for m in range(M)]
        tSW2 = [state["tau"][m][:, None] * SWs[m] * SWs[m] for m in range(M)]

        def z_body(k, carry):
            Zb, Zvb, Zhat_c, Zvhat_c, ZS_c, Es = carry
            p = jax.lax.dynamic_slice_in_dim(prior_prec, k, 1, 1)[:, 0]
            b = jnp.zeros((S,), Zb.dtype)
            for m in range(M):
                tau = state["tau"][m]
                B = Bs[m]
                swk = jax.lax.dynamic_slice_in_dim(SWs[m], k, 1, 1)[:, 0]
                tsw = tau * swk
                if B is None:
                    p = p + tSWW[m][:, k].sum()
                    b = b + Es[m] @ tsw + Zb[:, k] * tSW2[m][:, k].sum()
                else:
                    p = p + B @ tSWW[m][:, k]
                    b = b + Es[m] @ tsw + Zb[:, k] * (B @ tSW2[m][:, k])
            if ssz:
                # spike-slab factor update on the batch (same math as the
                # full-batch ssz branch; delayed sparsity via ssz_on)
                z_hat = b / p
                v_hat = 1.0 / p
                lam = (
                    thz_gap_b[:, k]
                    + 0.5 * ln_az_b[:, k]
                    - 0.5 * jnp.log(p)
                    + 0.5 * b * b / p
                )
                s_z = jnp.where(
                    state["ssz_on"] > 0, jax.nn.sigmoid(lam), 1.0
                )
                z_new = s_z * z_hat
                ez2 = s_z * (v_hat + z_hat * z_hat)
                v_new = jnp.maximum(ez2 - z_new * z_new, 1e-12)
                Zhat_c = jax.lax.dynamic_update_slice_in_dim(
                    Zhat_c, z_hat[:, None], k, 1
                )
                Zvhat_c = jax.lax.dynamic_update_slice_in_dim(
                    Zvhat_c, v_hat[:, None], k, 1
                )
                ZS_c = jax.lax.dynamic_update_slice_in_dim(
                    ZS_c, s_z[:, None], k, 1
                )
            else:
                z_new = b / p
                v_new = 1.0 / p
            delta = jax.lax.dynamic_slice_in_dim(Zb, k, 1, 1)[:, 0] - z_new
            new_Es = []
            for m in range(M):
                swk = jax.lax.dynamic_slice_in_dim(SWs[m], k, 1, 1)[:, 0]
                corr = delta[:, None] * swk[None, :]
                new_Es.append(Es[m] + (corr * Bs[m] if Bs[m] is not None else corr))
            Zb = jax.lax.dynamic_update_slice_in_dim(Zb, z_new[:, None], k, 1)
            Zvb = jax.lax.dynamic_update_slice_in_dim(Zvb, v_new[:, None], k, 1)
            return (Zb, Zvb, Zhat_c, Zvhat_c, ZS_c, tuple(new_Es))

        if ssz:
            zc0 = (Zhat_b, Zvhat_b, ZS_b)
        else:
            zc0 = (Zb, Zb, Zb)  # placeholders, untouched by the body
        Zb, Zvb, Zhat_b, Zvhat_b, ZS_b, Es_t = jax.lax.fori_loop(
            0, K, z_body, (Zb, Zvb, *zc0, tuple(Es))
        )
        Es = list(Es_t)
        z2b = Zvb + Zb * Zb

        # ---- global τ / α / θ from scaled batch stats, blended ----
        SWW_new = [new_S_[m] * (new_Wv[m] + new_W[m] ** 2) for m in range(M)]
        new_tau, new_ln_tau = [], []
        new_tau_a, new_tau_b = list(state["tau_a"]), list(state["tau_b"])
        for m in range(M):
            if nongauss[m]:
                new_tau.append(state["tau"][m])
                new_ln_tau.append(state["ln_tau"][m])
                continue
            B = Bs[m]
            E = Es[m]
            ss = (E * E).sum(axis=0)
            if B is None:
                ss = (
                    ss
                    + z2b.sum(0) @ SWW_new[m].T
                    - (Zb * Zb).sum(0) @ (new_SW[m] * new_SW[m]).T
                )
                n_d = float(S)
            else:
                corr = z2b @ SWW_new[m].T - (Zb * Zb) @ (new_SW[m] * new_SW[m]).T
                ss = ss + (corr * B).sum(axis=0)
                n_d = B.sum(axis=0)
            # natural-gradient step on q(τ)'s natural parameters: ratio
            # (moment) blending lets one underdispersed batch blow τ up
            a_hat = A0 + 0.5 * scale * n_d
            b_hat = B0 + 0.5 * scale * jnp.maximum(ss, 1e-10)
            a_new = (1 - rho) * state["tau_a"][m] + rho * a_hat
            b_new = (1 - rho) * state["tau_b"][m] + rho * b_hat
            new_tau_a[m] = a_new
            new_tau_b[m] = b_new
            new_tau.append(a_new / b_new)
            new_ln_tau.append(_digamma(a_new) - jnp.log(b_new))

        if config.ard_weights:
            alpha_new, ln_alpha_new = [], []
            for m in range(M):
                w2 = new_S_[m] * (new_Wv[m] + new_W[m] ** 2) + (
                    1.0 - new_S_[m]
                ) / alpha[m][None, :]
                a = A0 + 0.5 * Ds[m]
                b = B0 + 0.5 * w2.sum(axis=0)
                alpha_new.append((1 - rho) * alpha[m] + rho * (a / b))
                ln_alpha_new.append(
                    (1 - rho) * ln_alpha[m] + rho * (_digamma(a) - jnp.log(b))
                )
            alpha = jnp.stack(alpha_new)
            ln_alpha = jnp.stack(ln_alpha_new)

        ln_alpha_z = state.get("ln_alpha_z")
        if config.ard_factors:
            Ng = Gb.sum(axis=0) * scale
            if ssz:
                az_cell = Gb @ alpha_z
                zhat2 = ZS_b * (Zvhat_b + Zhat_b * Zhat_b) + (
                    1.0 - ZS_b
                ) / az_cell
                z2_per_group = (Gb.T @ zhat2) * scale
            else:
                z2_per_group = (Gb.T @ z2b) * scale
            a = A0 + 0.5 * Ng[:, None]
            b = B0 + 0.5 * z2_per_group
            alpha_z = (1 - rho) * alpha_z + rho * (a / b)
            if ssz:
                ln_alpha_z = (1 - rho) * ln_alpha_z + rho * (
                    _digamma(a) - jnp.log(b)
                )
        if ssz:
            # θ_z from scaled batch slab counts, expectations blended
            Ngc = (Gb.sum(axis=0) * scale)[:, None]
            s_pg = (Gb.T @ ZS_b) * scale
            sa = THETA_A0 + s_pg
            sb = THETA_B0 + Ngc - s_pg
            theta_z_ln = (1 - rho) * state["theta_z_ln"] + rho * (
                _digamma(sa) - _digamma(sa + sb)
            )
            theta_z_ln1m = (1 - rho) * state["theta_z_ln1m"] + rho * (
                _digamma(sb) - _digamma(sa + sb)
            )
            theta_z_mean = (1 - rho) * state["theta_z_mean"] + rho * (
                sa / (sa + sb)
            )

        if config.spikeslab_weights:
            th_ln, th_ln1m, th_mean = [], [], []
            for m in range(M):
                sa = THETA_A0 + new_S_[m].sum(axis=0)
                sb = THETA_B0 + Ds[m] - new_S_[m].sum(axis=0)
                th_ln.append(_digamma(sa) - _digamma(sa + sb))
                th_ln1m.append(_digamma(sb) - _digamma(sa + sb))
                th_mean.append(sa / (sa + sb))
            theta_ln_n = jnp.stack(th_ln)
            theta_ln1m_n = jnp.stack(th_ln1m)
            theta_mean = jnp.stack(th_mean)
        else:
            theta_ln_n, theta_ln1m_n = theta_ln, theta_ln1m
            theta_mean = state["theta_mean"]

        # scatter the batch's Z back
        Zm_full = Zm_full.at[batch].set(Zb)
        Zv_full = Zv_full.at[batch].set(Zvb)
        if ssz:
            ssz_state = {
                "ssz_on": state["ssz_on"],
                "Z_hat": state["Z_hat"].at[batch].set(Zhat_b),
                "Z_vhat": state["Z_vhat"].at[batch].set(Zvhat_b),
                "Z_S": state["Z_S"].at[batch].set(ZS_b),
                "theta_z_ln": theta_z_ln,
                "theta_z_ln1m": theta_z_ln1m,
                "theta_z_mean": theta_z_mean,
                "ln_alpha_z": ln_alpha_z,
            }
        else:
            ssz_state = {}

        # surrogate objective: scaled batch reconstruction error (monitoring)
        elbo = 0.0
        for m in range(M):
            elbo = elbo - 0.5 * scale * jnp.sum(
                new_tau[m] * (Es[m] * Es[m]).sum(axis=0)
            )

        new_state = {
            **state,
            **ssz_state,
            "Z_mean": Zm_full,
            "Z_var": Zv_full,
            "W_hat": new_W,
            "W_var": new_Wv,
            "S": new_S_,
            "SW": new_SW,
            "alpha": alpha,
            "ln_alpha": ln_alpha,
            "alpha_z": alpha_z,
            "tau": new_tau,
            "ln_tau": new_ln_tau,
            "tau_a": new_tau_a,
            "tau_b": new_tau_b,
            "theta_ln": theta_ln_n,
            "theta_ln1m": theta_ln1m_n,
            "theta_mean": theta_mean,
        }
        return new_state, elbo

    return step


@lru_cache(maxsize=None)
def _r2_stats_fn():
    """Per-(group, factor) R² statistics for one view, in one scanned
    device pass (finalization of fit_mofa; replaces per-factor np.outer
    host loops). Returns per-group:
      ssY_g  (G,)   = Σ (Y·B)²
      t1_gk  (G,K)  = Σ_n z_nk ((Y·B) W)_nk
      t2_gk  (G,K)  = Σ_n z²_nk (B W²)_nk
      ssf_g  (G,)   = Σ (Y·B − (ZWᵀ)·B)²
    so ss_res(g,k) = ssY − 2·t1 + t2 (single-factor) and the full-model
    residual comes from ssf."""
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("block", "has_mask"))
    def f(Ym, Bm, Z, W, G, block, has_mask):
        N, D = Ym.shape
        nb = -(-N // block)
        Np = nb * block

        def pad(A):
            return jnp.pad(A, ((0, Np - N),) + ((0, 0),) * (A.ndim - 1))

        Ymp, Zp, Gp = pad(Ym), pad(Z), pad(G)
        Bmp = pad(Bm) if has_mask else None
        W2 = W * W
        w2sum = W2.sum(axis=0)
        K = Z.shape[1]
        Gn = G.shape[1]

        def body(carry, i):
            ssY_g, t1, t2, ssf = carry
            sl = lambda A: jax.lax.dynamic_slice_in_dim(  # noqa: E731
                A, i * block, block, 0
            )
            Yb, Zb, Gb = sl(Ymp), sl(Zp), sl(Gp)
            G1 = Yb @ W  # (b, K)
            if has_mask:
                Bb = sl(Bmp)
                G2 = Bb @ W2
            else:
                G2 = jnp.broadcast_to(w2sum, G1.shape)
            t1 = t1 + Gb.T @ (Zb * G1)
            t2 = t2 + Gb.T @ (Zb * Zb * G2)
            ssY_g = ssY_g + Gb.T @ (Yb * Yb).sum(axis=1)
            P = Zb @ W.T
            if has_mask:
                P = P * Bb
            ssf = ssf + Gb.T @ ((Yb - P) ** 2).sum(axis=1)
            return (ssY_g, t1, t2, ssf), None

        init = (
            jnp.zeros(Gn), jnp.zeros((Gn, K)),
            jnp.zeros((Gn, K)), jnp.zeros(Gn),
        )
        (ssY_g, t1, t2, ssf), _ = jax.lax.scan(body, init, jnp.arange(nb))
        return ssY_g, t1, t2, ssf

    return f


def _init_state(
    Ys, masks, groups_onehot, config: MOFAConfig, liks=None, keep_data=False
):
    jax, jnp = _jax()
    key = jax.random.PRNGKey(config.seed)
    N = Ys[0].shape[0]
    K = config.n_factors
    M = len(Ys)
    G = config.n_groups
    if liks is None:
        liks = ["gaussian"] * M

    Zm = jax.random.normal(key, (N, K), dtype=jnp.float32)
    Zv = jnp.ones((N, K), jnp.float32)
    # independent stream for per-view W inits (bound-based views only);
    # Z keeps the original key so gaussian-only runs are bit-stable
    wkeys = jax.random.split(jax.random.fold_in(key, 7), max(len(Ys), 1))
    state = {
        "Z_mean": Zm,
        "Z_var": Zv,
        "G": jnp.asarray(groups_onehot, jnp.float32),
        "E": [],
        "mask": [],
        "M01": [],
        "Y0": [],
        "W_hat": [],
        "W_var": [],
        "S": [],
        "SW": [],
        "alpha": jnp.ones((M, K), jnp.float32),
        "ln_alpha": jnp.zeros((M, K), jnp.float32),
        "alpha_z": jnp.ones((G, K), jnp.float32),
        "tau": [],
        "ln_tau": [],
        # optimistic slab-probability start (mofapy2 initializes E[θ] at 1,
        # mofapy2 build_model/init_model initTheta qE=1.): a θ=0.5 start
        # closes the W gate on the very first sweep — with random Z the
        # initial evidence term is ≈ −½·ln(τ·Σz²) ≈ −3, so s collapses to
        # ~0.06, θ then LEARNS from the collapsed s and every factor dies
        # (reproduced on clean low-noise data; tau stalls at 1/var(Y)).
        # θ₀=0.99 keeps the gate open until W locks onto real signal; dead
        # factors still shrink because θ is learned per (view, factor).
        "theta_ln": jnp.full((M, K), math.log(0.99), jnp.float32),
        "theta_ln1m": jnp.full((M, K), math.log(0.01), jnp.float32),
        "theta_mean": jnp.full((M, K), 0.99, jnp.float32),
    }
    if config.spikeslab_factors:
        state["ssz_on"] = jnp.zeros((), jnp.float32)
        state["Z_hat"] = Zm
        state["Z_vhat"] = jnp.ones((N, K), jnp.float32)
        state["Z_S"] = jnp.ones((N, K), jnp.float32)
        # optimistic θ_z start (mofapy2 initializes θ at 1): with θ=0.5 the
        # double spike-slab gate (W and Z both at s≈½) stalls all but one
        # factor in a symmetric plateau
        th0 = 0.99
        state["theta_z_ln"] = jnp.full((G, K), math.log(th0), jnp.float32)
        state["theta_z_ln1m"] = jnp.full(
            (G, K), math.log(1.0 - th0), jnp.float32
        )
        state["theta_z_mean"] = jnp.full((G, K), th0, jnp.float32)
        state["ln_alpha_z"] = jnp.zeros((G, K), jnp.float32)
    for m, Y in enumerate(Ys):
        D = Y.shape[1]
        B = masks[m]
        nongauss = liks[m] in ("bernoulli", "poisson")
        # NaN→0 on DEVICE: the host nan_to_num copy costs a fresh 1GB
        # allocation per view at 1M×256 (first-touch-expensive on
        # balloon-backed guests) before the upload even starts
        Yj = jnp.nan_to_num(jnp.asarray(Y, jnp.float32), nan=0.0)
        if nongauss:
            # bound-based views always carry an explicit 0/1 mask + raw data
            M01 = (
                jnp.asarray(B, jnp.float32)
                if B is not None
                else jnp.ones((N, D), jnp.float32)
            )
            state["M01"].append(M01)
            state["Y0"].append(Yj * M01)
            state["mask"].append(M01)
            state["E"].append(jnp.zeros((N, D), jnp.float32))
            if liks[m] == "poisson":
                # Seeger bound precision κ_d = ¼ + 0.17 max_n y_nd
                ymax = np.nanmax(np.nan_to_num(Y, nan=0.0), axis=0)
                kappa = 0.25 + 0.17 * ymax
                state["tau"].append(jnp.asarray(kappa, jnp.float32))
                state["ln_tau"].append(jnp.asarray(np.log(kappa), jnp.float32))
            else:
                state["tau"].append(jnp.ones((D,), jnp.float32))
                state["ln_tau"].append(jnp.zeros((D,), jnp.float32))
            if keep_data:
                # placeholders keep per-view lists aligned; the SVI step
                # never updates τ for bound-based views
                state.setdefault("tau_a", []).append(
                    jnp.ones((D,), jnp.float32)
                )
                state.setdefault("tau_b", []).append(
                    jnp.ones((D,), jnp.float32)
                )
        else:
            # per-column variance over observed entries, computed ON DEVICE
            # from the already-uploaded (NaN-zeroed, masked) view — the two
            # np.nanvar host passes this replaces each allocated several GB
            # of fresh temporaries per 1M×256 view
            Bj = jnp.asarray(B, jnp.float32) if B is not None else None
            Ym = Yj if Bj is None else Yj * Bj
            cnt = float(N) if Bj is None else jnp.maximum(Bj.sum(axis=0), 1.0)
            mean_d = Ym.sum(axis=0) / cnt
            var_d = (Ym * Ym).sum(axis=0) / cnt - mean_d * mean_d
            var = np.asarray(var_d, dtype=np.float64)
            var[~np.isfinite(var) | (var <= 0)] = 1.0
            if keep_data:  # SVI recomputes batch residuals from raw data
                state["M01"].append(Bj)
                state["Y0"].append(Ym)
                # natural parameters of q(τ): blended by the SVI step
                n_obs_d = (
                    float(N) if Bj is None else np.asarray(Bj.sum(axis=0))
                )
                ta = A0 + 0.5 * n_obs_d * np.ones(D)
                tb = ta * var
                state.setdefault("tau_a", []).append(
                    jnp.asarray(ta, jnp.float32)
                )
                state.setdefault("tau_b", []).append(
                    jnp.asarray(tb, jnp.float32)
                )
            else:
                state["M01"].append(None)
                state["Y0"].append(None)
            state["mask"].append(Bj)
            if config.spikeslab_factors:
                # double spike-slab (W and Z) stalls from a zero-W start;
                # break the symmetry like mofapy2's always-random W init
                W0g = 0.1 * jax.random.normal(
                    wkeys[m], (D, K), dtype=jnp.float32
                )
                E0 = Ym - Zm @ W0g.T
                state["E"].append(E0 if Bj is None else E0 * Bj)
            else:
                # W starts at zero → E starts as (masked) Y
                state["E"].append(Ym)
            state["tau"].append(jnp.asarray(1.0 / var, jnp.float32))
            state["ln_tau"].append(jnp.asarray(-np.log(var), jnp.float32))
        if nongauss:
            # random W init with q(s)=1 breaks the W↔Z symmetry for
            # bound-based views: a zero-W start lets the spike-slab collapse
            # them on the first sweep (the Jaakkola/Seeger data term can't
            # outweigh −½log a). Gaussian views keep the zero-W/E=Y start
            # (stronger data term; preserves factor-ordering behavior).
            W0 = jax.random.normal(wkeys[m], (D, K), dtype=jnp.float32)
            state["W_hat"].append(W0)
            state["W_var"].append(jnp.ones((D, K), jnp.float32))
            state["S"].append(jnp.ones((D, K), jnp.float32))
            state["SW"].append(W0)
        elif config.spikeslab_factors:
            W0g = 0.1 * jax.random.normal(wkeys[m], (D, K), dtype=jnp.float32)
            state["W_hat"].append(W0g)
            state["W_var"].append(jnp.ones((D, K), jnp.float32))
            state["S"].append(jnp.ones((D, K), jnp.float32))
            state["SW"].append(W0g)
        else:
            state["W_hat"].append(jnp.zeros((D, K), jnp.float32))
            state["W_var"].append(jnp.ones((D, K), jnp.float32))
            state["S"].append(
                jnp.full(
                    (D, K),
                    0.5 if config.spikeslab_weights else 1.0,
                    jnp.float32,
                )
            )
            state["SW"].append(jnp.zeros((D, K), jnp.float32))
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
    svi_mode: bool = False,
    svi_batch_fraction: float = 0.5,
    svi_learning_rate: float = 1.0,
    svi_forgetting_rate: float = 0.5,
    svi_start_stochastic: int = 1,
    callback=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    resume_from: Optional[str] = None,
    smooth_covariate: Optional[np.ndarray] = None,
    smooth_n_grid: int = 10,
    smooth_opt_every: int = 25,
    smooth_start_opt: int = 20,
    model_groups: bool = False,
    warping: bool = False,
    warping_freq: int = 20,
    warping_ref: int = 0,
    warping_open_begin: bool = True,
    warping_open_end: bool = True,
    sparse_gp: bool = False,
    frac_inducing: Optional[float] = None,
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
            if isinstance(Y, np.ndarray) and np.isnan(Y).any():
                masks.append((~np.isnan(Y)).astype(np.float32))
            elif not isinstance(Y, np.ndarray):
                # device-resident view (jax array): NaN scan on device,
                # mask materialized only if NaNs actually exist
                import jax.numpy as jnp

                if bool(jnp.isnan(Y).any()):
                    masks.append(jnp.where(jnp.isnan(Y), 0.0, 1.0))
                else:
                    masks.append(None)
            else:
                masks.append(None)

    liks = list(config.likelihoods)
    if len(liks) < M:
        liks = liks + ["gaussian"] * (M - len(liks))
    # bound-based views always run through the masked (per-entry precision)
    # path
    masked = [
        m is not None or lk in ("bernoulli", "poisson")
        for m, lk in zip(masks, liks)
    ]
    smooth = smooth_covariate is not None
    if smooth and svi_mode:
        raise NotImplementedError(
            "smooth factors (MEFISTO) with svi_mode are not supported yet — "
            "use full-batch training"
        )
    if config.spikeslab_factors and smooth:
        raise NotImplementedError(
            "spikeslab_factors is not supported together with smooth "
            "covariates (a factor cannot have both a GP prior and a "
            "spike-slab prior)"
        )
    if sparse_gp and not smooth:
        raise ValueError("sparse_gp requires smooth_covariate")
    if warping:
        if not smooth:
            raise ValueError("warping requires smooth_covariate")
        if G < 2:
            raise ValueError("warping requires at least two groups")
        if np.asarray(smooth_covariate).ndim > 1 and np.asarray(
            smooth_covariate
        ).shape[1] > 1:
            raise NotImplementedError(
                "warping is only supported for 1-D covariates"
            )

    Ds_all = [Y.shape[1] for Y in Ys]
    if svi_mode:
        S = max(1, min(N, int(round(svi_batch_fraction * N))))
        svi_step = _make_svi_step(config, Ds_all, N, S, liks)
        step_jit = jax.jit(svi_step)
        rng_batch = np.random.default_rng(config.seed)

        def _svi_chunk(state, batches, rhos):
            # Fold T steps into ONE device program (lax.scan keeps the
            # compiled size O(1) in T). Per-call dispatch through the
            # tunneled runtime costs ~seconds at 1M cells, so handing the
            # scheduler elbo_every steps at a time removes the dominant
            # host-side cost of SVI training. Per-step ELBOs come back
            # stacked, so recording/convergence semantics are unchanged.
            def body(s, xs):
                b, r = xs
                s2, e = svi_step(s, b, r)
                return s2, e

            return jax.lax.scan(body, state, (batches, rhos))

        chunk_jit = jax.jit(_svi_chunk)
    else:
        step = _make_step(
            config, Ds_all, N, masked, liks, smooth=smooth,
            sparse_gp=sparse_gp,
        )
        step_jit = jax.jit(step)

    it0 = 0
    resumed_elbos: list = []
    if resume_from is not None:
        from .checkpoint import load_state

        state, prev_elbos, it0 = load_state(resume_from)
        resumed_elbos = list(np.asarray(prev_elbos))
    else:
        state = _init_state(Ys, masks, onehot, config, liks, keep_data=svi_mode)

    gp_ell = gp_scale = gp_cov = gp_ell_grid = gp_scale_grid = None
    if smooth:
        c = np.asarray(smooth_covariate, np.float32)
        if c.ndim == 1:
            c = c[:, None]
        # normalize covariate scale so the lengthscale grid is unitless
        span = max(float(c.max() - c.min()), 1e-9)
        _cov_span, _cov_min = span, float(c.min())
        gp_cov = jnp.asarray((c - c.min()) / span)
        gp_ell_grid = jnp.asarray(
            np.geomspace(0.05, 1.0, smooth_n_grid).astype(np.float32)
        )
        gp_scale_grid = jnp.asarray(
            np.linspace(0.05, 0.95, max(3, smooth_n_grid // 2)).astype(
                np.float32
            )
        )
        gp_ell = jnp.full((config.n_factors,), 0.2, jnp.float32)
        gp_scale = jnp.full((config.n_factors,), 0.5, jnp.float32)
        gvec_j = jnp.asarray(np.asarray(groups).astype(np.float32))
        if sparse_gp:
            # inducing points: covariate-quantile-spaced cells WITHIN each
            # group (the kernel is block-diagonal across groups, so every
            # group needs its own coverage of the time range; mofapy2
            # samples a random fraction, quantile spacing is deterministic
            # and covers gaps better)
            Mu = min(
                N,
                max(10, int(round(frac_inducing * N)))
                if frac_inducing
                else min(1000, N),
            )
            cov_flat = np.asarray(gp_cov)[:, 0]
            grp_np = np.asarray(groups)
            parts = []
            for g in np.unique(grp_np):
                rows = np.flatnonzero(grp_np == g)
                m_g = max(2, int(round(Mu * len(rows) / N)))
                order_c = rows[np.argsort(cov_flat[rows], kind="stable")]
                parts.append(
                    order_c[
                        np.linspace(0, len(rows) - 1, min(m_g, len(rows)))
                        .round()
                        .astype(int)
                    ]
                )
            idx_u = np.unique(np.concatenate(parts))
            idx_u_j = jnp.asarray(idx_u.astype(np.int32))
            if "gp_cov_u" not in state:
                state["gp_cov"] = gp_cov
                state["gp_cov_u"] = gp_cov[idx_u_j]
                state["gp_ell"] = gp_ell
                state["gp_scale"] = gp_scale
                state["gp_g"] = gvec_j
                state["gp_g_u"] = gvec_j[idx_u_j]
        elif "gp_K" not in state:
            state["gp_K"] = _gp_kmat_fn()(gp_cov, gp_ell, gp_scale, gvec_j)
    # learned group-correlation matrix Kg (mofapy2 model_groups); Kg
    # starts at I (independent groups) and is optimized on the
    # smooth_opt_every cadence. Dense path: Kg enters via the
    # precomputed gp_K; sparse path: Kg enters the in-step SGPR kernels
    # via state["gp_Kg"], and its marginal-likelihood objective is
    # evaluated on the inducing subset (the Nyström restriction keeps
    # the learning step O(M²) instead of O(N²))
    learn_kg = bool(model_groups and smooth and G > 1)
    gp_Xg = gp_Kg = None
    if learn_kg:
        gp_Xg = jnp.tile(
            jnp.eye(G, dtype=jnp.float32)[None], (config.n_factors, 1, 1)
        )
        gp_Kg = jax.vmap(lambda X: _normalize_kg(jnp, X))(gp_Xg)
        if sparse_gp:
            state["gp_Kg"] = gp_Kg
    if mesh is not None:
        # multi-chip: shard the state over the ("cells","feat") mesh; the
        # jitted sweep then runs SPMD with XLA-inserted collectives
        from ..parallel import shard_mofa_state

        state = shard_mofa_state(state, mesh)

    threshold = CONVERGENCE_THRESHOLDS.get(convergence_mode, 5e-4)
    elbos = resumed_elbos
    first_elbo = elbos[0] if elbos else None
    converged = False
    it = it0
    while it < n_iterations:
        if config.spikeslab_factors and it == 15:
            state = {**state, "ssz_on": jnp.ones((), jnp.float32)}
        if svi_mode:
            # steps until the next host-side event; the chunk of steps in
            # between runs as one scanned device call
            horizon = n_iterations - it
            if config.spikeslab_factors and it < 15:
                horizon = min(horizon, 15 - it)  # ssz toggle edits state
            if callback is not None and elbo_every:
                horizon = min(horizon, elbo_every - it % elbo_every)
            if checkpoint_path and checkpoint_every:
                horizon = min(
                    horizon, checkpoint_every - it % checkpoint_every
                )
            chunk = max(1, min(horizon, elbo_every))
            # ρ_t = lr · (t − t₀ + 1)^(−forgetting), the Robbins-Monro step
            # schedule mofapy2 uses for its stochastic option surface;
            # batches drawn sequentially so the draw order matches the
            # one-step-per-call loop exactly
            rhos = np.asarray(
                [
                    min(
                        1.0,
                        svi_learning_rate
                        * max(1, it + j - svi_start_stochastic + 2)
                        ** (-svi_forgetting_rate),
                    )
                    for j in range(chunk)
                ],
                np.float32,
            )
            batches = np.stack(
                [
                    rng_batch.choice(N, size=S, replace=False)
                    for _ in range(chunk)
                ]
            ).astype(np.int32)
            state, elbo_seq = chunk_jit(
                state, jnp.asarray(batches), jnp.asarray(rhos)
            )
            elbo_host = None  # fetched lazily, one d2h sync per chunk
            for j in range(chunk):
                itj = it + j + 1
                if not (
                    itj % elbo_every == 0 or itj == 1 or itj == n_iterations
                ):
                    continue
                if elbo_host is None:
                    elbo_host = np.asarray(elbo_seq)
                e = float(elbo_host[j])
                elbos.append(e)
                if verbose:
                    print(f"iter {itj}: ELBO {e:.4f}")
                # stochastic objective: the minibatch ELBO is noisy, so
                # convergence is judged on RUNNING-WINDOW means (W recent
                # evaluations vs the W before them) — the smoothed
                # analogue of mofapy2's stochastic stop
                # (muon/_core/tools.py:520-527 option surface)
                if first_elbo is None:
                    first_elbo = e
                    continue
                W = 5
                fresh = len(elbos) - len(resumed_elbos)
                if fresh >= 2 * W and itj - it0 >= min_iterations:
                    recent = float(np.mean(elbos[-W:]))
                    prev = float(np.mean(elbos[-2 * W : -W]))
                    delta = abs(recent - prev)
                    if delta / max(abs(first_elbo), 1e-30) * 100 < threshold:
                        converged = True
                        break
            it += chunk
            elbo = elbo_seq[-1]
            if converged:
                break
            if callback is not None and it % elbo_every == 0:
                callback(it, state, float(elbo))
            if (
                checkpoint_path
                and checkpoint_every
                and it % checkpoint_every == 0
            ):
                from .checkpoint import save_state

                save_state(checkpoint_path, state, np.asarray(elbos), it)
            continue
        state, elbo = step_jit(state)
        it += 1
        if (
            warping
            and it >= smooth_start_opt
            and it % warping_freq == 0
        ):
            cov_np = _warp_groups(
                np.asarray(gp_cov)[:, 0],
                np.asarray(groups),
                np.asarray(state["Z_mean"], np.float64),
                int(warping_ref),
                warping_open_begin,
                warping_open_end,
            )
            gp_cov = jnp.asarray(cov_np.astype(np.float32)[:, None])
            if sparse_gp:
                state["gp_cov"] = gp_cov
                state["gp_cov_u"] = gp_cov[idx_u_j]
            else:
                state["gp_K"] = _gp_kmat_fn()(
                    gp_cov, gp_ell, gp_scale, gvec_j, gp_Kg
                )
        if (
            smooth
            and it >= smooth_start_opt
            and it % smooth_opt_every == 0
        ):
            if sparse_gp:
                gp_ell, gp_scale = _gp_hyper_fn()(
                    state["gp_cov_u"],
                    state["Z_mean"][idx_u_j],
                    state["Z_var"][idx_u_j],
                    gp_ell_grid, gp_scale_grid,
                    state["gp_g_u"],
                )
                state["gp_ell"] = gp_ell
                state["gp_scale"] = gp_scale
                if learn_kg:
                    # Kg gradient ascent on the inducing-subset marginal
                    # (same objective as the dense path, restricted to
                    # the M quantile-spaced cells — every group is
                    # represented there by construction)
                    gp_Xg, gp_Kg = _gp_group_fn()(
                        state["gp_cov_u"],
                        state["Z_mean"][idx_u_j],
                        state["Z_var"][idx_u_j],
                        gp_ell, gp_scale,
                        state["gp_g_u"], gp_Xg,
                    )
                    state["gp_Kg"] = gp_Kg
            else:
                # (ℓ, s) grid search under the independent-groups kernel
                # (approximation: mofapy2 alternates hyper blocks the same
                # way), then Kg gradient steps with (ℓ, s) fixed
                gp_ell, gp_scale = _gp_hyper_fn()(
                    gp_cov, state["Z_mean"], state["Z_var"],
                    gp_ell_grid, gp_scale_grid, gvec_j,
                )
                if learn_kg:
                    gp_Xg, gp_Kg = _gp_group_fn()(
                        gp_cov, state["Z_mean"], state["Z_var"],
                        gp_ell, gp_scale, gvec_j, gp_Xg,
                    )
                state["gp_K"] = _gp_kmat_fn()(
                    gp_cov, gp_ell, gp_scale, gvec_j, gp_Kg
                )
        if callback is not None and it % elbo_every == 0:
            callback(it, state, float(elbo))
        if checkpoint_path and checkpoint_every and it % checkpoint_every == 0:
            from .checkpoint import save_state

            save_state(checkpoint_path, state, np.asarray(elbos), it)
        if it % elbo_every == 0 or it == 1 or it == n_iterations:
            e = float(elbo)
            elbos.append(e)
            if verbose:
                print(f"iter {it}: ELBO {e:.4f}")
            if first_elbo is None:
                first_elbo = e
            elif (
                len(elbos) - len(resumed_elbos) > 2
                and it - it0 >= min_iterations
            ):
                # convergence judged on iterations run in THIS session — a
                # resumed run must not stop on the tiny delta between the
                # checkpointed tail and its own first sweep
                delta = abs(elbos[-1] - elbos[-2])
                if delta / max(abs(first_elbo), 1e-30) * 100 < threshold:
                    converged = True
                    break

    Zm = np.asarray(state["Z_mean"])
    SWs = [np.asarray(sw) for sw in state["SW"]]

    # R²/variance-explained statistics for ALL (group, view, factor)
    # combinations in one scanned device pass per view (_r2_stats_fn).
    # The host loops this replaces materialized a fresh 1M×256 np.outer
    # per (factor, view) — ~200GB of single-core host traffic at 1M cells
    # (measured: the dominant term of the 385s mofa stage, round 3).
    r2_stats = []
    onehot_j = jnp.asarray(onehot, jnp.float32)
    for m in range(M):
        Ym_dev = state["Y0"][m]
        Bm_dev = state["mask"][m]
        if Ym_dev is None:
            Yj = jnp.nan_to_num(jnp.asarray(Ys[m], jnp.float32), nan=0.0)
            Ym_dev = Yj if Bm_dev is None else Yj * Bm_dev
        blk = max(1024, min(65536, N))
        ssY_g, t1, t2, ssf = _r2_stats_fn()(
            Ym_dev,
            Bm_dev if Bm_dev is not None else Ym_dev,  # dummy when unused
            state["Z_mean"], state["SW"][m], onehot_j,
            blk, Bm_dev is not None,
        )
        r2_stats.append(
            (
                np.asarray(ssY_g, np.float64),
                np.asarray(t1, np.float64),
                np.asarray(t2, np.float64),
                np.asarray(ssf, np.float64),
            )
        )

    # sort factors by total variance explained, descending (mofapy2 orders
    # factors this way before saving, which the reference's active/inactive
    # factor assertions rely on — tests/test_muon_tools.py:42-44)
    ss_tot = sum(st[0].sum() for st in r2_stats)
    # ss_res(m, k) = ΣY² − 2·Σ z_k (Y·B) w_k + Σ z_k² (B w_k²)
    res_k = sum(
        st[0].sum() - 2.0 * st[1].sum(axis=0) + st[2].sum(axis=0)
        for st in r2_stats
    )
    r2k = 1.0 - res_k / max(ss_tot, 1e-30)
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
        gp_lengthscales=(
            np.asarray(gp_ell)[order] if smooth else None
        ),
        gp_scales=(np.asarray(gp_scale)[order] if smooth else None),
        warped_covariates=(
            np.asarray(gp_cov)[:, 0] * _cov_span + _cov_min
            if warping
            else None
        ),
        gp_group_corr=(
            np.asarray(gp_Kg)[order] if gp_Kg is not None else None
        ),
    )

    # variance explained per factor (MOFA convention: 1 − SS_res(k)/SS_tot,
    # per view × group) — same device statistics, reordered along k
    r2pf = {}
    r2tot = {}
    for g in range(G):
        r2 = np.zeros((M, config.n_factors))
        r2t = np.zeros(M)
        for m in range(M):
            ssY_g, t1, t2, ssf = r2_stats[m]
            st = max(float(ssY_g[g]), 1e-30)
            res_gk = ssY_g[g] - 2.0 * t1[g] + t2[g]  # (K,) pre-order
            r2[m] = 1.0 - res_gk[order] / st
            r2t[m] = max(0.0, 1.0 - float(ssf[g]) / st)
        r2pf[g] = np.maximum(r2, 0.0)
        r2tot[g] = r2t
    result.r2_per_factor = r2pf
    result.r2_total = r2tot
    return result
