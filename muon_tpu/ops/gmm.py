"""Batched 1-D Gaussian-mixture EM on device.

The reference's DSB denoising fits TWO 2-component sklearn GMMs (tied and
full covariance) *per cell* in a Python loop and picks the lower-BIC fit
(muon/_prot/preproc.py:179-198) — the hot loop of the protein module.
Here both fits for ALL cells run as one jit+vmap program: EM is a
`lax.fori_loop` over a fixed iteration budget with a convergence freeze
(converged cells stop updating), so the whole denoising pass is two
batched (N, D) programs on the VPU with no host round-trips.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

__all__ = ["background_means"]

REG_COVAR = 1e-6
LOG2PI = float(np.log(2.0 * np.pi))


@lru_cache(maxsize=1)
def _jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


def _em_1d(x, resp0, tied: bool, n_iter: int, tol: float):
    """EM for a 2-component 1-D GMM on a single cell's protein vector.

    x: (D,) observations. resp0: (D, 2) initial responsibilities.
    Returns (means (2,), log_likelihood_per_sample, n_params).
    tied=True shares one variance across components (sklearn
    covariance_type="tied" in 1-D), else per-component ("full").
    """
    jax, jnp = _jax()
    D = x.shape[0]

    def m_step(resp):
        nk = resp.sum(axis=0) + 1e-10            # (2,)
        means = (resp * x[:, None]).sum(axis=0) / nk
        diff2 = (x[:, None] - means[None, :]) ** 2
        if tied:
            # tied 1-D covariance: pooled within-component variance
            var = (resp * diff2).sum() / D + REG_COVAR
            variances = jnp.stack([var, var])
        else:
            variances = (resp * diff2).sum(axis=0) / nk + REG_COVAR
        weights = nk / D
        return weights, means, variances

    def log_prob(weights, means, variances):
        # (D, 2) weighted log-densities
        lp = (
            -0.5 * (LOG2PI + jnp.log(variances))[None, :]
            - 0.5 * (x[:, None] - means[None, :]) ** 2 / variances[None, :]
            + jnp.log(weights)[None, :]
        )
        return lp

    def e_step(weights, means, variances):
        lp = log_prob(weights, means, variances)
        norm = jax.scipy.special.logsumexp(lp, axis=1)
        resp = jnp.exp(lp - norm[:, None])
        return resp, norm.mean().astype(x.dtype)

    weights, means, variances = m_step(resp0)

    def body(_, carry):
        weights, means, variances, ll_prev, done = carry
        resp, ll = e_step(weights, means, variances)
        w2, m2, v2 = m_step(resp)
        new_done = done | (jnp.abs(ll - ll_prev) < tol)
        # freeze converged fits (sklearn stops at tol on mean log-lik delta)
        keep = lambda new, old: jnp.where(done, old, new)  # noqa: E731
        return (
            keep(w2, weights),
            keep(m2, means),
            keep(v2, variances),
            keep(ll, ll_prev),
            new_done,
        )

    init = (
        weights,
        means,
        variances,
        jnp.asarray(-jnp.inf, x.dtype),
        jnp.asarray(False),
    )
    weights, means, variances, ll, _ = jax.lax.fori_loop(0, n_iter, body, init)
    n_params = 4 if tied else 5  # means 2 + weights 1 + variances (1|2)
    return means, ll, n_params


@lru_cache(maxsize=None)
def _background_means_fn(n_iter: int, tol: float):
    jax, jnp = _jax()

    @jax.jit
    def f(X, key):
        N, D = X.shape
        # Quantile-split initial responsibilities: cells' protein values are
        # bimodal (background vs signal); seeding the components at the low/
        # high quantiles separates the modes reliably, reaching a better
        # likelihood than the reference's random-responsibility init
        # (muon/_prot/preproc.py:181-182 — which often stalls at a merged
        # solution within sklearn's tol). A small random perturbation keeps
        # symmetric ties broken, honoring the reference's rationale that a
        # deterministic init can collapse one component's variance.
        q = jnp.quantile(X, jnp.asarray([0.25, 0.85]), axis=1).T  # (N, 2)
        d_lo = jnp.abs(X - q[:, :1])
        d_hi = jnp.abs(X - q[:, 1:])
        r_base = jnp.stack(
            [
                jnp.where(d_lo <= d_hi, 0.95, 0.05),
                jnp.where(d_lo <= d_hi, 0.05, 0.95),
            ],
            axis=-1,
        )  # (N, D, 2)
        noise = 0.02 * jax.random.uniform(key, (2, N, D, 1))
        r = jnp.clip(r_base[None] + jnp.concatenate([noise, -noise], -1), 0.01, 0.99)
        r = r / r.sum(axis=-1, keepdims=True)

        def per_cell(x, r_tied, r_full):
            m_t, ll_t, p_t = _em_1d(x, r_tied, True, n_iter, tol)
            m_f, ll_f, p_f = _em_1d(x, r_full, False, n_iter, tol)
            # BIC = -2·D·ll + p·ln(D); lower wins
            bic_t = -2.0 * D * ll_t + p_t * jnp.log(jnp.asarray(D, x.dtype))
            bic_f = -2.0 * D * ll_f + p_f * jnp.log(jnp.asarray(D, x.dtype))
            return jnp.where(bic_t < bic_f, m_t.min(), m_f.min())

        return jax.vmap(per_cell)(X, r[0], r[1])

    return f


def background_means(
    X, seed: int = 0, n_iter: int = 100, tol: float = 1e-3
):
    """Per-cell background mean via BIC-selected 2-component GMM.

    X: (n_cells, n_proteins) log-scaled values. Returns (n_cells,) of the
    smaller component mean of the better (tied vs full covariance) fit —
    the vectorized equivalent of the reference's per-cell loop
    (muon/_prot/preproc.py:189-198).

    The cells axis is padded to a power-of-two bucket so the jitted EM
    program compiles once per protein-panel size, not once per dataset."""
    jax, jnp = _jax()
    f = _background_means_fn(int(n_iter), float(tol))
    key = jax.random.PRNGKey(seed)
    X = np.asarray(X)
    n = X.shape[0]
    n_pad = max(64, 1 << (n - 1).bit_length())
    if n_pad != n:
        X = np.concatenate([X, np.ones((n_pad - n, X.shape[1]), X.dtype)], axis=0)
    return np.asarray(f(jnp.asarray(X), key))[:n]
