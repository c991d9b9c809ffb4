"""Probe: where do _run_dsb's seconds go? (BENCH_ALL r5: 6.8s on TPU vs
~4s warm XLA-CPU baseline — vs_baseline 0.59, a regression to explain.)

CPU-pinned (safe to run alongside a TPU job): separates host container /
numpy costs (backend-independent) from jax-executed parts. The TPU gap
then = jax parts' tunnel overhead vs their local-CPU cost.
"""
import time

import jax

jax.config.update("jax_platforms", "cpu")  # BEFORE any backend init

import cProfile
import pstats

import numpy as np

import bench as B


def main():
    import muon_tpu as mu
    from muon_tpu import prot as pt
    from muon_tpu.ops import gmm

    n_cells, n_empty = 10_000, 50_000
    rna, prot_X = B._make_citeseq(n_cells, n_empty, seed=3)

    # warm-up (compiles)
    B._run_dsb(n_cells, n_empty, seed=1)

    # stage-level timers
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

    # instrument background_means
    orig_bg = gmm.background_means
    def timed_bg(*a, **k):
        tb = time.perf_counter()
        out = orig_bg(*a, **k)
        t["background_means"] = time.perf_counter() - tb
        return out
    gmm.background_means = timed_bg
    import muon_tpu.prot.preproc as pp
    pp_bg = getattr(pp, "background_means", None)

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

    # function-level profile of one full run
    pr = cProfile.Profile()
    pr.enable()
    B._run_dsb(n_cells, n_empty, seed=4)
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
