"""Probe: calibrate the e2e MOFA quality gate.

Round-4 finding: the absolute label-probe R2 > 0.5 gate fails at smoke
scale (0.310) even though MOFA is converged — the ceiling of the metric
on these views is ~0.45 (raw counts) and the e2e actually feeds
NORMALIZED+log1p views (topvar re-selected post-normalization), which
score lower still. Hypothesis: the views are UNCENTERED (fit_mofa does
not center; the public tl.mofa bridge does), so factors waste capacity
on feature means.

This probe reproduces the EXACT e2e views and measures, at several
iteration budgets: label-probe R2, variance-explained, vs the PCA
baseline the pipeline already computes — to pick a scale-robust gate.
"""
import os
import time

os.environ.setdefault("MUON_TPU_BENCH_SCALE", "100")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import numpy as np

import bench_e2e as E

E._enable_compile_cache()


def label_r2(Z, labels, n_clusters):
    Z = np.asarray(Z, np.float64)
    n = len(labels)
    sub = np.random.default_rng(1).choice(n, size=min(n, 100_000), replace=False)
    Zs = np.column_stack([Z[sub], np.ones(len(sub))])
    Yoh = np.eye(n_clusters)[labels[sub]]
    resid = Yoh - Zs @ np.linalg.lstsq(Zs, Yoh, rcond=None)[0]
    sst = ((Yoh - Yoh.mean(0)) ** 2).sum()
    return float(1.0 - (resid**2).sum() / sst)


def main():
    import scipy.sparse as sp

    from muon_tpu.models.mofa import MOFAConfig, fit_mofa
    from muon_tpu.ops import sparse as dsp

    rna_X, atac_X, prot_X, labels = E._synth_cached()
    n = rna_X.shape[0]
    print(f"n={n}", flush=True)

    # --- exact e2e preprocessing: libsize-normalize + log1p, then topvar
    # on the NORMALIZED matrix (the e2e replaces rna.X before hvg.select)
    def normalize(X):
        X = sp.csr_matrix(X, dtype=np.float32)
        rs = np.asarray(X.sum(1)).ravel()
        X = sp.diags(1e4 / np.maximum(rs, 1.0)) @ X
        X.data = np.log1p(X.data)
        return X

    def topvar(X_csr, dn=256):
        Xd = dsp.from_scipy(X_csr)
        cs = np.asarray(dsp.col_sums(Xd))
        c2 = np.asarray(dsp.col_sums(Xd._replace(data=Xd.data**2)))
        var = c2 / n - (cs / n) ** 2
        sel = np.argsort(-var)[:dn]
        return np.asarray(X_csr[:, sel].todense(), np.float32)

    rna_n = normalize(rna_X)
    atac_n = normalize(atac_X)
    Y_rna = topvar(rna_n)
    Y_atac = topvar(atac_n)

    # PCA baseline: 15 comps of the rna HVG view (stand-in for the e2e's
    # X_pca[:, :15]; same data family)
    Yc = Y_rna - Y_rna.mean(0)
    U, s, _ = np.linalg.svd(Yc, full_matrices=False)
    Zpca = U[:, :15] * s[:15]
    pca_r2 = label_r2(Zpca, labels, E.N_CLUSTERS)
    print(f"pca15(rna norm-HVG) label R2: {pca_r2:.3f}", flush=True)

    cfg = MOFAConfig(n_factors=15, likelihoods=["gaussian"] * 2)

    def varexp(res, views):
        tot, expl = 0.0, 0.0
        for Y, W in zip(views, res.W):
            Yc = Y - Y.mean(0)
            R = Yc - res.Z @ W.T
            tot += float((Yc**2).sum())
            expl += float((Yc**2).sum() - (R**2).sum())
        return expl / tot

    for center in (False, True):
        views = [Y_rna, Y_atac]
        if center:
            views = [Y - Y.mean(0) for Y in views]
        for iters in (5, 20, 100):
            t0 = time.perf_counter()
            res = fit_mofa(
                views, cfg, n_iterations=iters, min_iterations=iters,
                svi_mode=True, svi_batch_fraction=1.0, elbo_every=1000,
                convergence_mode="slow",
            )
            r2 = label_r2(res.Z, labels, E.N_CLUSTERS)
            ve = varexp(res, views)
            print(
                f"center={center} iters={iters}: t={time.perf_counter()-t0:.1f}s"
                f" label_r2={r2:.3f} varexp={ve:.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
