"""Benchmarks vs the CPU reference (BASELINE.json configs).

Default (no argument) — the headline metric, ONE JSON line:
  TF-IDF + LSI seconds per 100k cells: ``ac.pp.tfidf`` (fused sparse device
  kernel) → ``ac.tl.lsi`` (randomized truncated SVD, k=50) on synthetic ATAC
  counts, 100k × 25k (~2.5e7 nnz). Reference code path:
  muon/_atac/preproc.py:16 + muon/_atac/tools.py:29 (scipy + ARPACK, CPU).

Extra modes (``python bench.py <mode>``), each printing ONE JSON line:
  wnn   — BASELINE config 4: 100k-cell multiome mu.pp.neighbors (per-mod +
          WNN fusion) + multiplex leiden + multimodal UMAP.
          Reference path muon/_core/preproc.py:264 + tools.py:1057,1209.
  mofa  — BASELINE config 3: MOFA K=15 VB ELBO iterations/sec on a 10k-cell
          RNA+ATAC pair. Reference path muon/_core/tools.py:583-585.

Output: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline = reference_cpu_seconds / our_seconds (speedup; >1 is faster).

CPU reference numbers are measured once (scipy/ARPACK for tfidf+lsi; the
same XLA programs pinned to the CPU backend for wnn/mofa — a CONSERVATIVE
stand-in, since XLA-CPU is itself faster than the reference's
numba/numpy/mofapy2 stack) and cached in BASELINE_MEASURED.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

# persistent XLA compile cache: makes cold driver runs warm-start (the
# in-process warm-up below already amortizes compiles within one run)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")


def _enable_compile_cache():
    # axon sitecustomize preimports jax, so the env var is read before this
    # module runs — config.update is the only reliable switch (CLAUDE.md)
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


_enable_compile_cache()

import numpy as np
from scipy import sparse as sp

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

# scale divisor for smoke-testing (MUON_TPU_BENCH_SCALE=10 → 10k cells)
_SCALE = max(1, int(os.environ.get("MUON_TPU_BENCH_SCALE", "1")))
N_CELLS = 100_000 // _SCALE
N_PEAKS = 25_000
NNZ_PER_CELL = 250
K = 50
CACHE = os.path.join(HERE, "BASELINE_MEASURED.json")
CONFIG_KEY = f"tfidf_lsi_{N_CELLS}x{N_PEAKS}_nnz{NNZ_PER_CELL}_k{K}"


def make_counts(seed: int = 0) -> sp.csr_matrix:
    """Synthetic ATAC-like counts: ~NNZ_PER_CELL open peaks per cell with a
    power-law peak popularity profile (realistic column skew for SpMM
    load-balancing)."""
    rng = np.random.default_rng(seed)
    nnz = N_CELLS * NNZ_PER_CELL
    # popularity-skewed peak choice
    pop = rng.pareto(1.2, N_PEAKS) + 1.0
    pop /= pop.sum()
    cols = rng.choice(N_PEAKS, size=nnz, p=pop).astype(np.int32)
    rows = np.repeat(np.arange(N_CELLS, dtype=np.int32), NNZ_PER_CELL)
    data = rng.integers(1, 5, size=nnz).astype(np.float32)
    X = sp.coo_matrix((data, (rows, cols)), shape=(N_CELLS, N_PEAKS))
    X.sum_duplicates()
    return X.tocsr()


def _reference_tfidf_lsi_cpu(X: sp.csr_matrix) -> float:
    """The reference's algorithm (scipy dia matmuls + ARPACK svds), timed.

    Mirrors muon/_atac/preproc.py:92-114 and muon/_atac/tools.py:53-63
    behaviorally (not copied): TF row scaling ×1e4 log1p, IDF log1p column
    scaling, svds(k=50), z-scored embeddings."""
    from scipy.sparse.linalg import svds

    t0 = time.perf_counter()
    n = X.shape[0]
    rs = np.asarray(X.sum(axis=1)).ravel()
    tf = sp.dia_matrix((1.0 / rs, 0), shape=(n, n)) @ X
    tf = tf.multiply(1e4)
    tf.data = np.log1p(tf.data)
    cs = np.asarray(X.sum(axis=0)).ravel()
    idf = np.log1p(n / cs)
    res = (tf @ sp.dia_matrix((idf, 0), shape=(len(idf), len(idf)))).tocsr()
    res.data = np.nan_to_num(res.data)
    U, s, Vt = svds(res.astype(np.float64), k=K)
    order = np.argsort(-s)
    U = U[:, order]
    emb = (U - U.mean(axis=0)) / U.std(axis=0)
    emb.sum()  # force materialization
    return time.perf_counter() - t0


def _our_tfidf_lsi(X: sp.csr_matrix) -> float:
    import muon_tpu as mu
    from muon_tpu import atac as ac

    adata = mu.AnnData(X=X.copy())
    t0 = time.perf_counter()
    ac.pp.tfidf(adata)
    ac.tl.lsi(adata, n_comps=K)
    np.asarray(adata.obsm["X_lsi"]).sum()  # block on host materialization
    return time.perf_counter() - t0


def _load_cache():
    try:
        return json.load(open(CACHE)) if os.path.exists(CACHE) else {}
    except Exception:
        return {}


def _save_cache(cache):
    json.dump(cache, open(CACHE, "w"), indent=1)


_ALL_RESULTS = []


def _emit(metric, value, unit, baseline, extra=None, defer=False):
    rec = {
        "metric": metric,
        "value": round(value, 4),
        "unit": unit,
        "vs_baseline": round(
            baseline / value if unit == "s" else value / baseline, 3
        ),
    }
    if extra:
        rec.update(extra)
    _ALL_RESULTS.append(rec)
    if defer:
        return rec
    print(json.dumps(rec), flush=True)
    return rec


def _upload_seconds(timings) -> float:
    """Sum the transfer-dominated stages out of a profiling capture
    (VERDICT r3 #8: make tunnel-bandwidth noise separable from kernel
    regressions). Upload stages: from_scipy / from_backed wire uploads,
    wnn rep/table uploads, and result downloads."""
    return sum(
        v
        for k, vs in timings.items()
        if any(t in k for t in ("from_scipy", "from_backed", "upload",
                                "download"))
        for v in vs
    )


# ---------------------------------------------------------------------------
# mode: wnn — BASELINE config 4 (100k WNN + leiden + UMAP)
# ---------------------------------------------------------------------------


def _make_multiome_reps(n, seed=0, n_clusters=12, d1=30, d2=30):
    """Clustered per-modality representations (the post-PCA/LSI state the
    WNN stage consumes — reference muon/_core/preproc.py:364-382)."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, n_clusters, n)
    c1 = rng.normal(size=(n_clusters, d1)) * 3.0
    c2 = rng.normal(size=(n_clusters, d2)) * 3.0
    r1 = (c1[labels] + rng.normal(size=(n, d1))).astype(np.float32)
    r2 = (c2[labels] + rng.normal(size=(n, d2))).astype(np.float32)
    return r1, r2, labels


def _run_wnn_pipeline(n, seed=0, algo_seed=42):
    import muon_tpu as mu
    from sklearn.metrics import adjusted_rand_score

    r1, r2, labels = _make_multiome_reps(n, seed=seed)
    m1 = mu.AnnData(np.zeros((n, 1), np.float32))
    m2 = mu.AnnData(np.zeros((n, 1), np.float32))
    m1.obsm["X_pca"] = r1
    m2.obsm["X_lsi"] = r2
    md = mu.MuData({"rna": m1, "atac": m2})
    t0 = time.perf_counter()
    mu.pp.neighbors(m1, n_neighbors=20, use_rep="X_pca",
                    random_state=algo_seed)
    mu.pp.neighbors(m2, n_neighbors=20, use_rep="X_lsi",
                    random_state=algo_seed)
    mu.pp.neighbors(md, random_state=algo_seed)
    mu.tl.leiden(md, resolution=1.0, random_state=algo_seed)
    mu.tl.umap(md, random_state=algo_seed)
    np.asarray(md.obsm["X_umap"]).sum()  # force host materialization
    dt = time.perf_counter() - t0
    ari = adjusted_rand_score(labels, md.obs["leiden"].to_numpy())
    return dt, ari


def bench_wnn():
    n = 100_000 // _SCALE
    key = f"wnn_leiden_umap_{n}cells_cpu_xla"
    cache = _load_cache()
    baseline = cache.get(key)
    if baseline is None:
        # CPU stand-in measured at n/10 and extrapolated linearly (every
        # stage is O(n) in cells at fixed k/C/epochs); XLA-CPU runs the
        # same programs, which UNDERSTATES the reference's own cost.
        # WARMED: a throwaway run compiles everything first so the timed
        # baseline is steady-state, not compile-dominated (VERDICT r4 #5)
        import jax

        n_small = max(n // 10, 1000)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            _run_wnn_pipeline(n_small, seed=1)  # warm-up (compiles)
            t_small, _ = _run_wnn_pipeline(n_small, seed=1)
        baseline = t_small * (n / n_small)
        cache[key] = baseline
        _save_cache(cache)
    _run_wnn_pipeline(n, seed=2)  # warm-up (compiles)
    # one extra WARM PROFILED run for the upload/compute split (stage()'s
    # per-stage queue flush contaminates wall time — VERDICT r4 #1), then
    # 3 algorithm seeds timed UNPROFILED: clustering quality must be
    # seed-stable (ARI spread < 0.02) so perf work can't silently trade
    # quality for speed (VERDICT r2 item #10).
    import muon_tpu as mu
    from muon_tpu.utils.profiling import get_timings, reset_timings

    reset_timings()
    with mu.set_options(profile=True):
        _run_wnn_pipeline(n, seed=3, algo_seed=42)
    upload = _upload_seconds(get_timings())
    times, aris = [], []
    for algo_seed in (42, 7, 2026):
        dt, ari = _run_wnn_pipeline(n, seed=3, algo_seed=algo_seed)
        times.append(dt)
        aris.append(ari)
    spread = max(aris) - min(aris)
    assert spread < 0.02, f"leiden ARI unstable across seeds: {aris}"
    ours = min(times)
    _emit(
        f"wnn_leiden_umap_sec_per_{n}_cells", ours, "s", baseline,
        extra={"ari_per_seed": [round(a, 4) for a in aris],
               "ari_spread": round(spread, 4),
               "upload_s": round(upload, 3),
               "compute_s": round(ours - upload, 3),
               "times_s": [round(t, 3) for t in times]},
    )
    return ours, baseline


# ---------------------------------------------------------------------------
# mode: dsb — BASELINE config 2 (CITE-seq CLR + DSB vs empty droplets)
# ---------------------------------------------------------------------------


def _make_citeseq(n_cells, n_empty, n_prot=140, seed=0):
    """Unfiltered CITE-seq droplet pool: real cells (high RNA UMI, protein
    signal over ambient) + empty droplets (low UMI, ambient-only)."""
    rng = np.random.default_rng(seed)
    n = n_cells + n_empty
    is_cell = np.zeros(n, bool)
    is_cell[:n_cells] = True
    rna_umi = np.where(is_cell, rng.poisson(3000, n), rng.poisson(40, n))
    # one gene is enough for the log10-UMI droplet classifier
    rna = sp.csr_matrix(rna_umi.astype(np.float32)[:, None])
    ambient = rng.gamma(2.0, 2.0, n_prot)
    prot = rng.poisson(ambient[None, :], (n, n_prot)).astype(np.float32)
    signal = rng.poisson(30.0, (n_cells, n_prot // 3)).astype(np.float32)
    cols = rng.choice(n_prot, n_prot // 3, replace=False)
    prot[:n_cells, cols] += signal
    return rna, prot


def _run_dsb(n_cells, n_empty, seed=0):
    import muon_tpu as mu
    from muon_tpu import prot as pt

    rna, prot_X = _make_citeseq(n_cells, n_empty, seed=seed)
    md = mu.MuData(
        {"rna": mu.AnnData(rna), "prot": mu.AnnData(prot_X.copy())}
    )
    t0 = time.perf_counter()
    pt.pp.clr(md.mod["prot"])
    md.mod["prot"].X = prot_X  # CLR timed separately from DSB input
    out = pt.pp.dsb(
        md,
        empty_counts_range=(0.3, 2.5),
        cell_counts_range=(2.8, 4.5),
        random_state=1,
    )
    np.asarray(out.mod["prot"].X).sum()
    return time.perf_counter() - t0


def bench_dsb():
    n_cells = 10_000 // _SCALE
    n_empty = 50_000 // _SCALE
    key = f"clr_dsb_{n_cells}cells_{n_empty}empty_cpu_xla_fullscale"
    cache = _load_cache()
    baseline = cache.get(key)
    if baseline is None:
        # CPU stand-in: the same vmapped-EM XLA program pinned to the CPU
        # backend — conservative vs the reference's per-cell sklearn GMM
        # loop (muon/_prot/preproc.py:189-198), which fits 2 GMMs per cell
        # in Python.
        # Measured at FULL scale (r5 fix): the old n/10-extrapolation
        # understated the dominant EM term — background_means pads cells to
        # a power-of-two bucket, so the 1k probe (pad 1024) does 1/16 the
        # EM work of the 10k run (pad 16384), not 1/10 (exp_dsb_profile.py:
        # EM is 19.4s of the 21.6s full-scale CPU wall).
        # WARMED like bench_mofa: throwaway compile run first (VERDICT r4 #5)
        import jax

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            _run_dsb(n_cells, n_empty, seed=1)  # warm-up (compiles)
            baseline = _run_dsb(n_cells, n_empty, seed=1)
        cache[key] = baseline
        _save_cache(cache)
    _run_dsb(n_cells, n_empty, seed=2)  # warm-up
    ours = min(_run_dsb(n_cells, n_empty, seed=3),
               _run_dsb(n_cells, n_empty, seed=4))
    _emit(f"clr_dsb_sec_{n_cells}cells_{n_empty}empty", ours, "s", baseline)
    return ours, baseline


# ---------------------------------------------------------------------------
# mode: mofa — BASELINE config 3 (MOFA K=15, ELBO iterations/sec)
# ---------------------------------------------------------------------------


def _mofa_iters_per_sec(n_iters=50, n=10_000, d1=2000, d2=3000, k=15,
                        seed=0):
    from muon_tpu.models.mofa import MOFAConfig, fit_mofa

    rng = np.random.default_rng(seed)
    Z = rng.normal(size=(n, k)).astype(np.float32)
    Y1 = (Z @ rng.normal(size=(k, d1)) + 0.5 * rng.normal(size=(n, d1))).astype(np.float32)
    Y2 = (Z @ rng.normal(size=(k, d2)) + 0.5 * rng.normal(size=(n, d2))).astype(np.float32)
    cfg = MOFAConfig(n_factors=k, likelihoods=["gaussian", "gaussian"])
    # warm-up: compile the sweep
    fit_mofa([Y1, Y2], cfg, n_iterations=2, min_iterations=2,
             convergence_mode="slow", elbo_every=1000)
    t0 = time.perf_counter()
    fit_mofa([Y1, Y2], cfg, n_iterations=n_iters, min_iterations=n_iters,
             convergence_mode="slow", elbo_every=1000)
    dt = time.perf_counter() - t0
    return n_iters / dt


def bench_mofa():
    n = 10_000 // _SCALE
    key = f"mofa_iters_per_sec_{n}cells_k15_cpu_xla"
    cache = _load_cache()
    baseline = cache.get(key)
    if baseline is None:
        import jax

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            baseline = _mofa_iters_per_sec(n_iters=10, n=n)
        cache[key] = baseline
        _save_cache(cache)
    ours = _mofa_iters_per_sec(n_iters=50, n=n)
    _emit(f"mofa_elbo_iters_per_sec_{n}cells_k15", ours, "iters/s", baseline)
    return ours, baseline


def bench_tfidf_lsi(defer=False):
    import muon_tpu as mu
    from muon_tpu.utils.profiling import get_timings, reset_timings

    X = make_counts()

    cache = _load_cache()
    baseline = cache.get(CONFIG_KEY)
    if baseline is None:
        baseline = _reference_tfidf_lsi_cpu(X)
        cache = _load_cache()
        cache[CONFIG_KEY] = baseline
        _save_cache(cache)

    # warm-up run compiles every kernel (XLA first compile is slow and not
    # the steady-state number a production pipeline sees). One extra WARM
    # PROFILED run supplies the upload/compute split; the TIMED runs are
    # UNPROFILED — the per-stage device-queue flush in stage() costs a host
    # round-trip through the tunnel at every stage boundary and destroyed
    # dispatch overlap in the r3/r4 numbers (VERDICT r4 weak-#1/next-#1).
    # Three timed reps so tunnel variance is visible in the artifact.
    _our_tfidf_lsi(X)
    reset_timings()
    with mu.set_options(profile=True):
        profiled_wall = _our_tfidf_lsi(X)
    upload = _upload_seconds(get_timings())
    times = [_our_tfidf_lsi(X) for _ in range(3)]
    ours = min(times)
    rec = _emit(
        "tfidf_lsi_sec_per_100k_cells", ours, "s", baseline,
        extra={
            "upload_s": round(upload, 3),
            "compute_s": round(ours - upload, 3),
            "times_s": [round(t, 3) for t in times],
            "profiled_wall_s": round(profiled_wall, 3),
        },
        defer=defer,
    )
    return rec


def main_all():
    """Default driver entry: measure EVERY BASELINE config (1: tfidf+lsi,
    2: CLR+DSB, 3: MOFA, 4: WNN+leiden+UMAP), one JSON line each, and
    persist the full set to BENCH_ALL.json.

    The headline tfidf_lsi metric RUNS FIRST — on fresh host/device state
    — but PRINTS LAST so a tail-parsing driver records it. Running it
    after the other configs measurably regressed it (8.59s vs 6.5s in
    BENCH_r03 vs r02: run-order contamination from the 100k-cell WNN
    state, VERDICT r3 weak-#2/item-#3)."""
    failures = []
    headline = None
    try:
        headline = bench_tfidf_lsi(defer=True)
    except Exception as e:
        failures.append(f"bench_tfidf_lsi: {e!r}")
        print(f"[bench] bench_tfidf_lsi FAILED: {e!r}", file=sys.stderr,
              flush=True)
    for fn in (bench_dsb, bench_mofa, bench_wnn):
        try:
            fn()
        except Exception as e:  # a broken side-mode must not hide the rest
            failures.append(f"{fn.__name__}: {e!r}")
            print(f"[bench] {fn.__name__} FAILED: {e!r}", file=sys.stderr,
                  flush=True)
    if headline is not None:
        print(json.dumps(headline), flush=True)
    out = {"results": _ALL_RESULTS}
    if failures:
        out["failures"] = failures
    with open(os.path.join(HERE, "BENCH_ALL.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode == "wnn":
        bench_wnn()
    elif mode == "mofa":
        bench_mofa()
    elif mode == "dsb":
        bench_dsb()
    elif mode == "tfidf_lsi":
        bench_tfidf_lsi()
    else:
        main_all()
