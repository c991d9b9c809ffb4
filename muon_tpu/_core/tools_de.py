"""Differential expression / accessibility: rank_genes_groups on device.

The reference delegates peak ranking to scanpy's rank_genes_groups
(muon/_atac/tools.py:371). This is the TPU-native equivalent: group
means/variances come from one-hot × matrix products (SpMM on the MXU for
sparse input), Welch t-tests are elementwise VPU math over (groups ×
genes), and the Wilcoxon variant ranks gene blocks with device sorts.
Results land in ``uns["rank_genes_groups"]`` with scanpy's structure
(names/scores/pvals/pvals_adj/logfoldchanges as records arrays) so
downstream consumers (ac.tl.add_genes_peaks_groups) work unchanged.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import numpy as np
import pandas as pd
from scipy import sparse as sp

__all__ = ["rank_genes_groups"]


@lru_cache(maxsize=1)
def _jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


def _group_moments(X, onehot):
    """Per-group sums of X and X² → (g, D) each, via SpMM/matmul."""
    jax, jnp = _jax()
    if sp.issparse(X):
        from ..ops import sparse as dsp

        dX = dsp.from_scipy(X.tocsr())
        s1 = np.asarray(dsp.spmm_t(dX, onehot)).T  # (g, D)
        dX2 = dX._replace(data=dX.data * dX.data)
        s2 = np.asarray(dsp.spmm_t(dX2, onehot)).T
    else:
        Xd = jnp.asarray(np.asarray(X), jnp.float32)
        G = jnp.asarray(onehot)
        s1 = np.asarray(G.T @ Xd)
        s2 = np.asarray(G.T @ (Xd * Xd))
    return s1, s2


def _bh_adjust(pvals: np.ndarray) -> np.ndarray:
    """Benjamini-Hochberg FDR per group row."""
    n = pvals.shape[-1]
    order = np.argsort(pvals, axis=-1)
    ranked = np.take_along_axis(pvals, order, axis=-1)
    adj = ranked * n / np.arange(1, n + 1)
    adj = np.minimum.accumulate(adj[..., ::-1], axis=-1)[..., ::-1]
    out = np.empty_like(adj)
    np.put_along_axis(out, order, np.clip(adj, 0, 1), axis=-1)
    return out


def _norm_sf(z):
    from scipy.stats import norm

    return norm.sf(z)


def rank_genes_groups(
    adata,
    groupby: str,
    groups="all",
    reference: str = "rest",
    method: str = "t-test",
    n_genes: Optional[int] = None,
    corr_method: str = "benjamini-hochberg",
    layer: Optional[str] = None,
    key_added: str = "rank_genes_groups",
    **kwargs,
):
    """Rank genes/peaks per group vs rest (scanpy-compatible results dict).

    Methods: "t-test" / "t-test_overestim_var" (Welch on device moments),
    "wilcoxon" (device rank-sums with tie-corrected normal approximation),
    "logreg" (multinomial logistic-regression coefficients, MXU matmuls).
    """
    jax, jnp = _jax()

    X = adata.X if layer is None else adata.layers[layer]
    n, D = X.shape
    cats = pd.Categorical(adata.obs[groupby].astype("category"))
    all_names = list(cats.categories.astype(str))
    if groups == "all" or groups is None:
        use_groups = all_names
    else:
        use_groups = [str(g) for g in groups]

    codes = cats.codes.astype(np.int64)
    g = len(all_names)
    onehot = np.zeros((n, g), np.float32)
    valid = codes >= 0
    onehot[np.nonzero(valid)[0], codes[valid]] = 1.0
    counts = onehot.sum(axis=0)  # (g,)

    if n_genes is None or n_genes > D:
        n_genes = D

    s1, s2 = _group_moments(X, onehot)  # (g, D)
    tot1 = s1.sum(axis=0)
    tot2 = s2.sum(axis=0)
    n_tot = counts.sum()

    names_rec, scores_rec, pvals_rec, padj_rec, lfc_rec = {}, {}, {}, {}, {}

    if method in ("t-test", "t-test_overestim_var"):
        for gi, gname in enumerate(all_names):
            if gname not in use_groups:
                continue
            n1 = counts[gi]
            if reference == "rest":
                nr = n_tot - n1
                m1 = s1[gi] / max(n1, 1)
                mr = (tot1 - s1[gi]) / max(nr, 1)
                v1 = np.maximum(s2[gi] / max(n1, 1) - m1**2, 0) * n1 / max(n1 - 1, 1)
                vr = (
                    np.maximum((tot2 - s2[gi]) / max(nr, 1) - mr**2, 0)
                    * nr
                    / max(nr - 1, 1)
                )
            else:
                ri = all_names.index(str(reference))
                nr = counts[ri]
                m1 = s1[gi] / max(n1, 1)
                mr = s1[ri] / max(nr, 1)
                v1 = np.maximum(s2[gi] / max(n1, 1) - m1**2, 0) * n1 / max(n1 - 1, 1)
                vr = (
                    np.maximum(s2[ri] / max(nr, 1) - mr**2, 0) * nr / max(nr - 1, 1)
                )
            if method == "t-test_overestim_var":
                # scanpy's variant: the rest-group size is replaced by n1
                # in BOTH the denominator and the Welch-Satterthwaite dof
                # (scanpy passes ns_rest = ns_group; ADVICE r1 #4)
                nr_eff = n1
            else:
                nr_eff = nr
            denom = np.sqrt(v1 / n1 + vr / nr_eff) + 1e-30
            t = (m1 - mr) / denom
            # Welch-Satterthwaite dof
            with np.errstate(divide="ignore", invalid="ignore"):
                dof = (v1 / n1 + vr / nr_eff) ** 2 / (
                    (v1 / n1) ** 2 / max(n1 - 1, 1)
                    + (vr / nr_eff) ** 2 / max(nr_eff - 1, 1)
                )
            dof = np.nan_to_num(dof, nan=1.0)
            dof = np.maximum(dof, 1.0)
            from scipy.stats import t as t_dist

            pv = 2 * t_dist.sf(np.abs(t), dof)
            lfc = np.log2(
                (np.expm1(m1) + 1e-9) / (np.expm1(mr) + 1e-9)
            )
            order = np.argsort(-t)[:n_genes]
            names_rec[gname] = adata.var_names.to_numpy()[order]
            scores_rec[gname] = t[order].astype(np.float32)
            pvals_rec[gname] = pv[order]
            padj = _bh_adjust(pv)
            padj_rec[gname] = padj[order]
            lfc_rec[gname] = lfc[order].astype(np.float32)

    elif method == "wilcoxon":
        Xd = np.asarray(X.todense()) if sp.issparse(X) else np.asarray(X)
        Xj = jnp.asarray(Xd, jnp.float32)
        G = jnp.asarray(onehot)

        @jax.jit
        def ranksum(Xj, G):
            # average ranks per gene (ties averaged) via double argsort with
            # tie correction through sorted-value runs
            order = jnp.argsort(Xj, axis=0)
            sorted_x = jnp.take_along_axis(Xj, order, axis=0)
            rnk = jnp.argsort(order, axis=0).astype(jnp.float32) + 1.0
            # tie-average: mean rank of equal values. For each position,
            # compute min and max rank of its value run via searchsorted.
            def per_gene(xs, rk, xcol):
                lo = jnp.searchsorted(xs, xcol, side="left") + 1.0
                hi = jnp.searchsorted(xs, xcol, side="right")
                return (lo + hi) / 2.0

            avg_rank = jax.vmap(per_gene, in_axes=(1, 1, 1), out_axes=1)(
                sorted_x, rnk, Xj
            )
            rank_sums = G.T @ avg_rank  # (g, D)
            # tie correction term Σ(t³−t)/(n(n−1)) per gene
            eq = (sorted_x[1:] == sorted_x[:-1]).astype(jnp.float32)
            # run lengths are implicit; use the identity
            # Σ(t³−t) = Σ_i 6·c_i where c_i counts ordered equal pairs… use
            # simpler exact route: Σ t³ − Σ t = 3·Σ_i (hi_i − lo_i) terms —
            # computed from per-element run sizes:
            run_size = jax.vmap(
                lambda xs, xcol: jnp.searchsorted(xs, xcol, side="right")
                - jnp.searchsorted(xs, xcol, side="left"),
                in_axes=(1, 1),
                out_axes=1,
            )(sorted_x, Xj).astype(jnp.float32)
            # Σ over runs of (t³ − t) = Σ over elements of (t² − 1)
            tie_term = (run_size**2 - 1.0).sum(axis=0)
            return rank_sums, tie_term

        rank_sums, tie_term = ranksum(Xj, G)
        rank_sums = np.asarray(rank_sums)
        tie_term = np.asarray(tie_term)

        for gi, gname in enumerate(all_names):
            if gname not in use_groups:
                continue
            n1 = counts[gi]
            nr = n_tot - n1
            mu = n1 * (n_tot + 1) / 2.0
            tie_corr = 1.0 - tie_term / max(n_tot * (n_tot * n_tot - 1.0), 1.0)
            sigma = np.sqrt(n1 * nr * (n_tot + 1) / 12.0 * np.maximum(tie_corr, 1e-12))
            z = (rank_sums[gi] - mu) / np.maximum(sigma, 1e-30)
            pv = 2 * _norm_sf(np.abs(z))
            m1 = s1[gi] / max(n1, 1)
            mr = (tot1 - s1[gi]) / max(nr, 1)
            lfc = np.log2((np.expm1(m1) + 1e-9) / (np.expm1(mr) + 1e-9))
            order = np.argsort(-z)[:n_genes]
            names_rec[gname] = adata.var_names.to_numpy()[order]
            scores_rec[gname] = z[order].astype(np.float32)
            pvals_rec[gname] = pv[order]
            padj_rec[gname] = _bh_adjust(pv)[order]
            lfc_rec[gname] = lfc[order].astype(np.float32)
    elif method == "logreg":
        # scanpy parity: sklearn LogisticRegression coefficients as scores
        # (scanpy's _rank_genes_groups logreg branch; reference reaches it
        # through muon/_atac/tools.py:371 rank_peaks_groups). TPU-native
        # replacement: full-batch multinomial softmax regression trained
        # with Adam — every step is two (n×D)·(D×g) MXU matmuls. Like
        # scanpy, only scores/names are meaningful (pvals are NaN).
        import optax

        Xd = np.asarray(X.todense()) if sp.issparse(X) else np.asarray(X)
        Xj = jnp.asarray(Xd, jnp.float32)
        y = jnp.asarray(np.where(valid, codes, 0), jnp.int32)
        wv = jnp.asarray(valid.astype(np.float32))
        C_reg = float(kwargs.get("C", 1.0))
        n_steps = int(kwargs.get("max_iter", 200))

        @jax.jit
        def fit(Xj, y, wv):
            D_ = Xj.shape[1]
            params = {
                "W": jnp.zeros((D_, g), jnp.float32),
                "b": jnp.zeros((g,), jnp.float32),
            }
            opt = optax.adam(5e-2)
            state = opt.init(params)

            def loss_fn(p):
                logits = Xj @ p["W"] + p["b"]
                ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
                reg = 0.5 / C_reg * jnp.sum(p["W"] ** 2)
                return jnp.sum(ce * wv) + reg

            def step(carry, _):
                p, s = carry
                grads = jax.grad(loss_fn)(p)
                upd, s = opt.update(grads, s, p)
                return (optax.apply_updates(p, upd), s), None

            (params, _), _ = jax.lax.scan(step, (params, state), None, length=n_steps)
            # centre class coefficients (softmax is shift-invariant; sklearn's
            # symmetric multinomial parameterization has the same property)
            return params["W"] - params["W"].mean(axis=1, keepdims=True)

        W = np.asarray(fit(Xj, y, wv))  # (D, g)

        for gi, gname in enumerate(all_names):
            if gname not in use_groups:
                continue
            n1 = counts[gi]
            nr = n_tot - n1
            coef = W[:, gi]
            m1 = s1[gi] / max(n1, 1)
            mr = (tot1 - s1[gi]) / max(nr, 1)
            lfc = np.log2((np.expm1(m1) + 1e-9) / (np.expm1(mr) + 1e-9))
            order = np.argsort(-coef)[:n_genes]
            names_rec[gname] = adata.var_names.to_numpy()[order]
            scores_rec[gname] = coef[order].astype(np.float32)
            pvals_rec[gname] = np.full(len(order), np.nan)
            padj_rec[gname] = np.full(len(order), np.nan)
            lfc_rec[gname] = lfc[order].astype(np.float32)
    else:
        raise ValueError(f"Unknown method {method!r}")

    def rec(d, dtype):
        return pd.DataFrame(d).to_records(index=False, column_dtypes=dtype)

    adata.uns[key_added] = {
        "params": {
            "groupby": groupby,
            "reference": reference,
            "method": method,
            "use_raw": False,
            "layer": layer,
            "corr_method": corr_method,
        },
        "names": rec(names_rec, "O"),
        "scores": rec(scores_rec, "float32"),
        "pvals": rec(pvals_rec, "float64"),
        "pvals_adj": rec(padj_rec, "float64"),
        "logfoldchanges": rec(lfc_rec, "float32"),
    }
    return None
