"""North-star benchmark: 1M cells × 3 modalities end-to-end on ONE chip
(BASELINE.json config 5; VERDICT r1 next-round item #1).

Pipeline (the full muon user journey, reference paths
muon/_atac/preproc.py:16 + tools.py:29, muon/_core/preproc.py:264,
muon/_core/tools.py:583-585,1057,1209):

  synthesize 3-modality multiome  →  device ingest (wire-format upload)
  → ATAC tfidf + lsi(50)  → RNA log1p + pca(50)  → prot CLR + pca(30)
  → per-modality neighbors (IVF kNN at this scale) → WNN fusion
  → multiplex leiden → UMAP (200 epochs) → stochastic-VI MOFA (K=15)
  on the 256+256 most variable rna+atac features.

Prints one line per stage and ONE final JSON line:
  {"metric": "e2e_1m_3mod_sec", "value": T, "unit": "s", "vs_baseline": R}

vs_baseline is measured-CPU extrapolation: the cached CPU numbers for
tfidf+lsi (scipy/ARPACK, BASELINE_MEASURED.json) and wnn+leiden+umap /
MOFA (same XLA programs pinned to the CPU backend) scaled linearly in
cells from their measured scale to 1M. The XLA-CPU stand-in is believed
to understate the reference's numba/numpy stack, but that is NOT provable
in this image (muon/pynndescent/mofapy2 are not installed) — treat the
CPU side as a stand-in, not a measurement of the reference itself.
vs_baseline_svi_cpu additionally replaces the full-batch CPU MOFA term
with a measured stochastic-VI CPU term (same iterations/batch size —
mofapy2 offers the same stochastic mode, reference option surface
muon/_core/tools.py:520-527), which is the FAIRER comparison since a CPU
user at 1M cells would also minibatch. Components and scale factors are
printed so both extrapolations are auditable.

MUON_TPU_BENCH_SCALE=100 runs a 10k-cell smoke version.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")


def _enable_compile_cache():
    # the axon sitecustomize preimports jax at interpreter startup, so env
    # vars set at module scope are read too late — config.update is the
    # only reliable switch (same pitfall as JAX_PLATFORMS, see CLAUDE.md).
    # Persistent-cache hits turn the ~5-10min per-process recompile tax of
    # this benchmark into seconds.
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ["JAX_COMPILATION_CACHE_DIR"],
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


_enable_compile_cache()

import numpy as np
from scipy import sparse as sp

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

_SCALE = max(1, int(os.environ.get("MUON_TPU_BENCH_SCALE", "1")))
N = 1_000_000 // _SCALE
D_RNA, NNZ_RNA = 20_000, 100
D_ATAC, NNZ_ATAC = 25_000, 150
D_PROT = 120
K_MOFA, MOFA_ITERS = 15, 100
N_CLUSTERS = 20
CACHE = os.path.join(HERE, "BASELINE_MEASURED.json")

_stage_times = {}


def timed(name):
    class _T:
        def __enter__(self):
            self.t0 = time.perf_counter()

        def __exit__(self, *a):
            dt = time.perf_counter() - self.t0
            _stage_times[name] = round(dt, 2)
            print(f"[stage] {name}: {dt:.2f}s", flush=True)

    return _T()


def synth():
    """Clustered 3-modality multiome at 1M cells (power-law feature
    popularity for realistic sparsity skew, cluster-shifted programs so
    every downstream stage has real structure to find)."""
    rng = np.random.default_rng(0)
    labels = rng.integers(0, N_CLUSTERS, N)

    def counts(d, nnz_per, cluster_frac=0.3):
        pop = rng.pareto(1.2, d) + 1.0
        # per-cluster popularity tilt: a random subset of features is
        # boosted for each cluster
        boost = np.ones((N_CLUSTERS, d))
        for c in range(N_CLUSTERS):
            sel = rng.choice(d, size=d // 20, replace=False)
            boost[c, sel] = 8.0
        nnz = N * nnz_per
        cols = np.empty(nnz, np.int32)
        # draw per cluster so the tilted profile applies
        start = 0
        order = np.argsort(labels, kind="stable")
        sizes = np.bincount(labels, minlength=N_CLUSTERS)
        for c in range(N_CLUSTERS):
            m = sizes[c] * nnz_per
            p = pop * boost[c]
            p /= p.sum()
            cols[start : start + m] = rng.choice(d, size=m, p=p)
            start += m
        rows = np.repeat(order, nnz_per).astype(np.int32)
        data = rng.integers(1, 5, size=nnz).astype(np.float32)
        X = sp.coo_matrix((data, (rows, cols)), shape=(N, d))
        X.sum_duplicates()
        return X.tocsr()

    rna = counts(D_RNA, NNZ_RNA)
    atac = counts(D_ATAC, NNZ_ATAC)
    cent = rng.normal(size=(N_CLUSTERS, D_PROT)) * 2.0
    prot = np.maximum(
        cent[labels] + rng.normal(size=(N, D_PROT)), 0.0
    ).astype(np.float32) + rng.poisson(3.0, size=(N, D_PROT)).astype(np.float32)
    return rna, atac, prot, labels


def _synth_cached():
    """Disk-cache the synthetic dataset (210s to generate at 1M on one
    core; ~10s to reload). Cache key = the size parameters."""
    tag = f"{N}_{D_RNA}_{D_ATAC}_{D_PROT}"
    path = f"/tmp/muon_e2e_synth_{tag}.npz"
    if os.path.exists(path):
        z = np.load(path)
        rna = sp.csr_matrix(
            (z["rd"], z["ri"], z["rp"]), shape=(N, D_RNA), copy=False
        )
        atac = sp.csr_matrix(
            (z["ad"], z["ai"], z["ap"]), shape=(N, D_ATAC), copy=False
        )
        return rna, atac, z["prot"], z["labels"]
    rna, atac, prot, labels = synth()
    np.savez(
        path,
        rd=rna.data, ri=rna.indices, rp=rna.indptr,
        ad=atac.data, ai=atac.indices, ap=atac.indptr,
        prot=prot, labels=labels,
    )
    return rna, atac, prot, labels


def _measure_svi_cpu_term(cache):
    """CPU-XLA cost of the SAME stochastic-VI MOFA this pipeline runs
    (VERDICT r2 item #8: mofapy2 exposes the same stochastic mode —
    reference option surface muon/_core/tools.py:520-527 — so a fair CPU
    user would also minibatch). Per-iteration cost is measured at two N
    with the batch size held at the 1M run's S, then extrapolated
    linearly in N: t(N) = a + b·N separates the batch-sized term from
    the full-state (Z/E, N-sized) term instead of assuming either
    dominates. Cached in BASELINE_MEASURED.json."""
    import jax

    from muon_tpu.models.mofa import MOFAConfig, fit_mofa

    S = min(50_000, N)
    pts = []
    changed = False
    for n_meas in (S, 2 * S):
        key = f"mofa_svi_sec_per_iter_{n_meas}cells_s{S}_k{K_MOFA}_cpu_xla"
        t_it = cache.get(key)
        if t_it is None:
            rng = np.random.default_rng(0)
            Z = rng.normal(size=(n_meas, K_MOFA)).astype(np.float32)
            Ys = [
                (Z @ rng.normal(size=(K_MOFA, 256))
                 + 0.5 * rng.normal(size=(n_meas, 256))).astype(np.float32)
                for _ in range(2)
            ]
            cfg = MOFAConfig(
                n_factors=K_MOFA, likelihoods=["gaussian"] * 2
            )
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                kw = dict(
                    svi_mode=True, svi_batch_fraction=S / n_meas,
                    convergence_mode="slow", elbo_every=1000,
                )
                fit_mofa(Ys, cfg, n_iterations=2, min_iterations=2, **kw)
                t0 = time.perf_counter()
                fit_mofa(Ys, cfg, n_iterations=12, min_iterations=12, **kw)
                t_it = (time.perf_counter() - t0) / 12
            cache[key] = t_it
            changed = True
        pts.append((n_meas, t_it))
    if changed:
        json.dump(cache, open(CACHE, "w"), indent=1)
    (n1, t1), (n2, t2) = pts
    b = (t2 - t1) / (n2 - n1)
    a = t1 - b * n1
    return MOFA_ITERS * max(a + b * N, t1)


def _warm_env():
    """One-time environment warm-up, OUTSIDE the timed pipeline (like the
    persistent compile cache): this guest's memory is lazily backed by the
    hypervisor, so the FIRST touch of each page of peak RSS costs ~10s/GB
    (measured 2026-08-18: fresh-alloc 1GB fill = 10.6s vs 0.13s warm), and
    the tunnel's first large h2d pays a one-time ~70-90s staging setup
    (160MB first = 68-90s, same size after = 2-4s at ~40-75MB/s).
    Pre-faulting an arena and doing one dummy large transfer moves both
    costs out of the measured stages; a long-running production process
    pays them once per boot, not per operation."""
    import jax

    gb = int(
        os.environ.get(
            "MUON_TPU_PREFAULT_GB", str(max(2, min(14, N // 70_000)))
        )
    )
    blocks = []
    for _ in range(gb):
        b = np.empty(1 << 28, np.float32)  # 1 GB
        b.fill(0.0)
        blocks.append(b)
    del blocks
    z = np.empty(80_000_000, np.int32)  # 320 MB dummy transfer
    z.fill(1)
    da = jax.device_put(z)
    _ = float(da.ravel()[0])
    _ = np.asarray(da)  # d2h staging too
    del da, z


def main():
    import muon_tpu as mu
    from muon_tpu import atac as ac
    from muon_tpu import prot as pt

    print(f"n_cells={N} rna={D_RNA} atac={D_ATAC} prot={D_PROT}", flush=True)
    mu.set_options(profile=True)  # per-substage wall timers (wnn/umap/...)
    with timed("synth(host)"):
        rna_X, atac_X, prot_X, labels = _synth_cached()
    with timed("warmup(env,untimed)"):
        _warm_env()

    t_all0 = time.perf_counter()

    rna = mu.AnnData(rna_X)
    atac = mu.AnnData(atac_X)
    prot = mu.AnnData(prot_X)
    mdata = mu.MuData({"rna": rna, "atac": atac, "prot": prot})

    # --- per-modality preprocessing -------------------------------------
    with timed("atac.tfidf+lsi50"):
        ac.pp.tfidf(atac)
        ac.tl.lsi(atac, n_comps=50)

    with timed("rna.norm+pca50"):
        from muon_tpu.ops.linalg import pca as _pca
        from muon_tpu.ops import sparse as dsp

        # library-size normalize + log1p on the device value vector
        dX = dsp.from_scipy(rna.X)
        rs = dsp.row_sums(dX)
        import jax.numpy as jnp

        inv = 1e4 / jnp.maximum(rs, 1.0)
        vals = jnp.log1p(dsp.scale_rows_data(dX, inv))
        rna_norm = dsp.to_scipy_data(rna.X.tocsr(), vals, device_X=dX)
        rna.X = rna_norm
        scores, _, _, _ = _pca(rna.X, n_comps=50)
        rna.obsm["X_pca"] = np.asarray(scores)

    with timed("prot.clr+pca30"):
        pt.pp.clr(prot)
        scores, _, _, _ = _pca(np.asarray(prot.X), n_comps=30)
        prot.obsm["X_pca"] = np.asarray(scores)
        from muon_tpu.ops.device import unregister_dense

        unregister_dense(prot.X)  # 480MB HBM pin otherwise outlives pca

    # MOFA inputs: most-variable 256 features per count modality, captured
    # BEFORE the big matrices are dropped
    with timed("hvg.select"):
        import jax

        from functools import partial

        @partial(jax.jit, static_argnames=("dn", "n"))
        def _sel_cols(data, row, col, lut, dn, n):
            # scatter-add into a (n, dn+1) grid; column 0 collects the
            # unselected/padded entries and is dropped. add (not set) so
            # zero-data pad slots can never clobber real values.
            pos = lut[col]
            # int32 flat index: n·(dn+1) = 257M at 1M cells, < 2³¹
            dest = row * (dn + 1) + pos
            out = jnp.zeros(n * (dn + 1), jnp.float32)
            out = out.at[dest].add(data.astype(jnp.float32))
            return out.reshape(n, dn + 1)[:, 1:]

        def topvar_dense(X_csr, dn=256):
            # column variance from device col sums, then a DEVICE LUT
            # scatter (the host LUT pass allocated ~3GB of fresh
            # temporaries per modality at 250M nnz)
            Xd = dsp.from_scipy(X_csr)
            cs = np.asarray(dsp.col_sums(Xd))
            c2 = np.asarray(dsp.col_sums(Xd._replace(data=Xd.data**2)))
            n = X_csr.shape[0]
            var = c2 / n - (cs / n) ** 2
            sel = np.argsort(-var)[:dn]
            lut = np.zeros(X_csr.shape[1], np.int32)
            lut[sel] = np.arange(1, dn + 1, dtype=np.int32)
            # result stays DEVICE-RESIDENT: fit_mofa accepts jax arrays,
            # so the (1M, 256) views never round-trip through the host
            return _sel_cols(
                Xd.data, Xd.row, Xd.col, jnp.asarray(lut), dn, n
            )

        Y_rna = topvar_dense(rna.X)
        Y_atac = topvar_dense(atac.X)

    # free the count matrices: downstream stages run on reps
    rna.X = None
    atac.X = None
    gc.collect()

    # --- stochastic-VI MOFA (before the graph phase: its device-resident
    # (1M, 256) views + VB state would otherwise overlap WNN's candidate
    # matrix peak — measured HBM OOM with both resident) -----------------
    with timed("mofa.svi"):
        from muon_tpu.models.mofa import MOFAConfig, fit_mofa

        cfg = MOFAConfig(n_factors=K_MOFA, likelihoods=["gaussian"] * 2)
        res = fit_mofa(
            [Y_rna, Y_atac], cfg,
            n_iterations=MOFA_ITERS, min_iterations=20,
            svi_mode=True, svi_batch_fraction=min(50_000 / N, 1.0),
            elbo_every=5,
        )
        mdata.obsm["X_mofa"] = res.Z
        del Y_rna, Y_atac, res
        gc.collect()

    # MOFA quality gate (VERDICT r4 #3): the factors must actually recover
    # the planted cluster structure, not merely run for 10s — otherwise an
    # undertrained model silently pads the headline. Linear-probe R²:
    # regress one-hot(labels) on [rep, 1] over a subsample (reference test
    # pattern: factor recovery, tests/test_muon_tools.py:25-49).
    #
    # CALIBRATION (exp_mofa_gate.py, smoke scale): converged fits on these
    # normalized HVG views cap at R²≈0.33 (the views' own ceiling — PCA-15
    # on them scores 0.17, raw-count views 0.45), while garbage factors
    # (random Z, dead/NaN W) score ≈0.00. An absolute 0.5 threshold sits
    # ABOVE the converged ceiling; the discriminating gate is RELATIVE:
    # factors must be at least as label-informative as the pipeline's own
    # linear baseline (first K_MOFA PCA comps), plus a floor far above
    # chance (16 regressors / 100k samples ⇒ chance R² ≈ 0.002).
    def _label_probe_r2(rep):
        R = np.asarray(rep, dtype=np.float64)
        sub = np.random.default_rng(1).choice(
            N, size=min(N, 100_000), replace=False
        )
        Rs = np.column_stack([R[sub], np.ones(len(sub))])
        Yoh = np.eye(N_CLUSTERS)[labels[sub]]
        resid = Yoh - Rs @ np.linalg.lstsq(Rs, Yoh, rcond=None)[0]
        sst = ((Yoh - Yoh.mean(0)) ** 2).sum()
        return float(1.0 - (resid**2).sum() / sst)

    mofa_r2 = _label_probe_r2(mdata.obsm["X_mofa"])
    pca_r2 = _label_probe_r2(rna.obsm["X_pca"][:, :K_MOFA])
    print(
        f"[quality] MOFA label-probe R2: {mofa_r2:.3f} "
        f"(pca{K_MOFA} baseline: {pca_r2:.3f})", flush=True,
    )
    assert mofa_r2 > max(0.2, 0.8 * pca_r2), (
        f"MOFA factors degenerate: label-probe R2={mofa_r2:.3f} "
        f"vs pca{K_MOFA} baseline {pca_r2:.3f}"
    )

    # --- neighbors + fusion + clustering + embedding --------------------
    with timed("neighbors.rna"):
        mu.pp.neighbors(rna, n_neighbors=20, use_rep="X_pca")
    with timed("neighbors.atac"):
        mu.pp.neighbors(atac, n_neighbors=20, use_rep="X_lsi")
    with timed("neighbors.prot"):
        mu.pp.neighbors(prot, n_neighbors=20, use_rep="X_pca")

    with timed("wnn"):
        mu.pp.neighbors(mdata)

    # leiden and UMAP both consume the WNN graph but use DISJOINT hardware:
    # leiden is pure host work (C++ local move + numpy aggregation, zero
    # jax), while UMAP's wall time is the device SGD with the host merely
    # dispatching chunks. Running leiden in a worker thread hides its
    # ~100s at 1M cells behind the SGD (ctypes/numpy release the GIL; the
    # stage timers skip the device-queue flush off the main thread so the
    # leiden clock never waits behind queued SGD programs).
    import threading

    leiden_wall = {}

    def _leiden_job():
        # exceptions must not vanish into the thread (ADVICE r4): stash
        # and re-raise on the main thread after join
        t0 = time.perf_counter()
        try:
            mu.tl.leiden(mdata, resolution=1.0)
            leiden_wall["s"] = time.perf_counter() - t0
        except BaseException as e:  # noqa: BLE001
            leiden_wall["error"] = e

    with timed("leiden+umap(overlapped)"):
        th = threading.Thread(target=_leiden_job)
        th.start()
        t0u = time.perf_counter()
        mu.tl.umap(mdata)
        _stage_times["umap200(thread)"] = round(time.perf_counter() - t0u, 2)
        th.join()
    if "error" in leiden_wall:
        raise RuntimeError("leiden worker thread failed") from leiden_wall["error"]
    _stage_times["leiden(thread)"] = round(leiden_wall.get("s", float("nan")), 2)

    total = time.perf_counter() - t_all0

    # quality gate: the pipeline must actually work, not just run
    from sklearn.metrics import adjusted_rand_score

    ari = adjusted_rand_score(labels, mdata.obs["leiden"].to_numpy())
    print(f"[quality] leiden ARI vs planted clusters: {ari:.3f}", flush=True)

    # --- CPU-extrapolated baseline (auditable) ---------------------------
    cache = json.load(open(CACHE)) if os.path.exists(CACHE) else {}
    comps = {}
    t = cache.get("tfidf_lsi_100000x25000_nnz250_k50")
    if t:
        comps["tfidf_lsi(meas@100k x10)"] = t * (N / 100_000)
    t = cache.get("wnn_leiden_umap_100000cells_cpu_xla")
    if t:
        # 2-mod measurement; this pipeline fuses 3 modalities (+1 kNN, +1
        # fusion pass ≈ x1.4) — scale cells linearly, modality factor 1.4
        comps["wnn_leiden_umap(meas@100k x10 x1.4mods)"] = (
            t * (N / 100_000) * 1.4
        )
    t = cache.get("mofa_iters_per_sec_10000cells_k15_cpu_xla")
    if t:
        comps[f"mofa({MOFA_ITERS}it, meas@10k)"] = MOFA_ITERS / t * (N / 10_000)
    baseline = sum(comps.values()) if comps else None
    for k, v in comps.items():
        print(f"[cpu-extrapolation] {k}: {v:.0f}s", flush=True)

    # fair-CPU variant: the MOFA term assumes the CPU user also runs the
    # stochastic mode (VERDICT r2 item #8) — everything else is shared
    try:
        svi_term = _measure_svi_cpu_term(cache)
        print(
            f"[cpu-extrapolation] mofa_svi({MOFA_ITERS}it, 2-point fit): "
            f"{svi_term:.0f}s", flush=True,
        )
        nonmofa = sum(
            v for k, v in comps.items() if not k.startswith("mofa")
        )
        baseline_svi = (nonmofa + svi_term) if comps else None
    except Exception as e:
        print(f"[cpu-extrapolation] svi variant failed: {e!r}", flush=True)
        baseline_svi = None

    out = {
        "metric": f"e2e_{N}cells_3mod_sec",
        "value": round(total, 1),
        "unit": "s",
        "vs_baseline": round(baseline / total, 2) if baseline else None,
        "vs_baseline_svi_cpu": (
            round(baseline_svi / total, 2) if baseline_svi else None
        ),
        "stages": _stage_times,
        "leiden_ari": round(ari, 3),
        "mofa_label_r2": round(mofa_r2, 3),
        "pca_label_r2": round(pca_r2, 3),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
