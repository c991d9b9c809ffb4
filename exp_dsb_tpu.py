"""Probe: TPU-side DSB wall breakdown (counterpart of exp_dsb_profile.py,
which showed the CPU wall is 90% background_means EM). On TPU the EM is
one dispatch — so where do the ~6.8s go? Times each phase of the dsb flow
on the tunneled device, warm."""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import numpy as np

import bench as B


def main():
    import muon_tpu as mu
    from muon_tpu import prot as pt
    from muon_tpu.ops import gmm

    n_cells, n_empty = 10_000, 50_000

    # warm-up (compiles)
    B._run_dsb(n_cells, n_empty, seed=1)

    rna, prot_X = B._make_citeseq(n_cells, n_empty, seed=3)
    t = {}

    def mark(name, t0):
        t[name] = time.perf_counter() - t0
        return time.perf_counter()

    t0 = time.perf_counter()
    md = mu.MuData({"rna": mu.AnnData(rna), "prot": mu.AnnData(prot_X.copy())})
    t0 = mark("mudata_build", t0)
    pt.pp.clr(md.mod["prot"])
    t0 = mark("clr", t0)
    md.mod["prot"].X = prot_X

    orig_bg = gmm.background_means

    def timed_bg(X, **k):
        tb = time.perf_counter()
        out = orig_bg(X, **k)
        t["background_means"] = time.perf_counter() - tb
        return out

    gmm.background_means = timed_bg
    import muon_tpu.prot.preproc  # noqa: F401  (dsb imports from ops.gmm lazily)

    tb0 = time.perf_counter()
    out = pt.pp.dsb(
        md, empty_counts_range=(0.3, 2.5), cell_counts_range=(2.8, 4.5),
        random_state=1,
    )
    np.asarray(out.mod["prot"].X).sum()
    t["dsb_total"] = time.perf_counter() - tb0
    gmm.background_means = orig_bg

    for k, v in t.items():
        print(f"{k}: {v:.3f}s", flush=True)

    # isolate the jitted EM call itself (second call, same shapes)
    import jax.numpy as jnp

    X = np.log(np.abs(np.random.default_rng(0).normal(size=(10_000, 120)))
               .astype(np.float32) + 10.0)
    tb = time.perf_counter()
    r = orig_bg(X, seed=0)
    print(f"background_means(10k x 120) warm: {time.perf_counter()-tb:.3f}s",
          flush=True)
    tb = time.perf_counter()
    r = orig_bg(X, seed=1)
    print(f"background_means repeat: {time.perf_counter()-tb:.3f}s", flush=True)


if __name__ == "__main__":
    main()
