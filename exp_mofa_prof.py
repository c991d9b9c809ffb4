"""Per-iteration cost anatomy of SVI MOFA at 1M cells (perf lab, not shipped)."""
import os, sys, time

def _cfg():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
_cfg()

import numpy as np
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from muon_tpu.models.mofa import MOFAConfig, fit_mofa

z = np.load("/tmp/muon_reps_1000000.npz")
Y = [z["Y_rna"], z["Y_atac"]]
N = Y[0].shape[0]
cfg = MOFAConfig(n_factors=15, likelihoods=["gaussian"] * 2)

def run(iters, frac, elbo_every):
    t0 = time.perf_counter()
    fit_mofa(Y, cfg, n_iterations=iters, min_iterations=iters,
             svi_mode=True, svi_batch_fraction=frac, elbo_every=elbo_every)
    return time.perf_counter() - t0

# host-side batch draw cost
rng = np.random.default_rng(0)
t0 = time.perf_counter()
for _ in range(5):
    rng.choice(N, size=50_000, replace=False)
print(f"rng.choice x5: {time.perf_counter()-t0:.2f}s", flush=True)

t4 = run(4, 0.05, 5)
print(f"4 iters (incl compile+setup): {t4:.1f}s", flush=True)
t24 = run(24, 0.05, 5)
print(f"24 iters: {t24:.1f}s -> per-iter {(t24-t4)/20:.3f}s", flush=True)
t24b = run(24, 0.05, 1000)
print(f"24 iters elbo_every=1000: {t24b:.1f}s", flush=True)
t24c = run(24, 0.025, 5)
print(f"24 iters batch 25k: {t24c:.1f}s (compile for new S)", flush=True)
t44c = run(44, 0.025, 5)
print(f"44 iters batch 25k: {t44c:.1f}s -> per-iter {(t44c-t24c)/20:.3f}s", flush=True)
