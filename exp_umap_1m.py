"""Probe: UMAP SGD epoch cost at 1M cells / ~40M edges on the real TPU.

E2E r3 profile showed umap/sgd_200epochs = 823s (~4.1s/epoch) with the
fixed Dmax=64 dense-row layout. Hypothesis: per-bucket mean degree ~7 at
1M cells means ~90% of gathered slots are padding. Variants:
  A  bucketed, fixed Dmax=64   (round-3 shipped behavior)
  B  bucketed, adaptive Dmax   (cost-model pick, expected 8)
  C  flat edge list            (round-2 behavior, _optimize_fn symmetric)

Usage: python exp_umap_1m.py [n_cells] [variants e.g. ABC]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import numpy as np
from scipy import sparse as sp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from muon_tpu.ops.umap import (
        _build_buckets, _optimize_fn, _optimize_layout_bucketed_fn,
        edge_schedule, find_ab_params,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    variants = sys.argv[2] if len(sys.argv) > 2 else "ABC"
    k = 20
    n_epochs = 200
    rng = np.random.default_rng(0)

    t0 = time.perf_counter()
    heads0 = np.repeat(np.arange(n, dtype=np.int32), k)
    tails0 = rng.integers(0, n, n * k).astype(np.int32)
    # fuzzy-ish weights: log-uniform in (1/200, 1] so eps spans [1, 200]
    w0 = np.exp(rng.uniform(np.log(1.0 / 200.0), 0.0, n * k)).astype(
        np.float32
    )
    G = sp.coo_matrix(
        (np.concatenate([w0, w0]),
         (np.concatenate([heads0, tails0]),
          np.concatenate([tails0, heads0]))),
        shape=(n, n),
    ).tocsr()
    G.sum_duplicates()
    heads, tails, eps, w, dc_exp = edge_schedule(G.tocoo(), n_epochs)
    E = len(heads)
    print(f"[probe] n={n} E={E} host_build={time.perf_counter()-t0:.1f}s",
          flush=True)

    a, b = find_ab_params(1.0, 0.5)
    emb = rng.normal(size=(n, 2)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    dc_exp_j = jnp.asarray(dc_exp)

    def sync(x):
        return float(np.asarray(x[:1, :1]).sum())

    def run_bucketed(tag):
        t0 = time.perf_counter()
        (strides, heads_bs, tails_bs, eps_bs, eons_bs, starts_bs,
         ends_bs) = _build_buckets(heads, tails, eps, n, n_epochs)
        slots = sum(int(t.size) for t in tails_bs)
        print(f"[{tag}] layout {time.perf_counter()-t0:.1f}s "
              f"buckets={len(strides)} strides={strides} "
              f"slots={slots/1e6:.1f}M",
              flush=True)
        f = _optimize_layout_bucketed_fn()
        args = (tuple(tails_bs), tuple(heads_bs), tuple(eps_bs),
                tuple(starts_bs), tuple(ends_bs))
        st = (jnp.asarray(emb), tuple(eons_bs), key)
        t0 = time.perf_counter()
        st = f(st[0], st[1], *args, dc_exp_j, 0.0, 8, n_epochs,
               a, b, 1.0, 1.0, 5, st[2], tuple(strides))
        sync(st[0])
        print(f"[{tag}] warm(8ep,+compile) {time.perf_counter()-t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        st = f(st[0], st[1], *args, dc_exp_j, 8.0, 8, n_epochs,
               a, b, 1.0, 1.0, 5, st[2], tuple(strides))
        sync(st[0])
        dt = time.perf_counter() - t0
        print(f"[{tag}] 8 epochs warm: {dt:.2f}s = {dt/8*1000:.0f}ms/epoch "
              f"-> 200ep = {dt/8*200:.0f}s", flush=True)

    def run_flat(tag):
        from muon_tpu.ops.umap import _row_bounds

        f = _optimize_fn()
        eps_j = jnp.asarray(eps)
        hj, tj = jnp.asarray(heads), jnp.asarray(tails)
        hs, he = _row_bounds(heads, n)
        hs_j, he_j = jnp.asarray(hs), jnp.asarray(he)
        dummy = jnp.zeros(1, jnp.int32)
        st = (jnp.asarray(emb), eps_j, key)
        t0 = time.perf_counter()
        st = f(st[0], st[1], hj, tj, eps_j, hs_j, he_j, dummy, dummy,
               0.0, 3, n_epochs,
               a, b, 1.0, 1.0, 5, st[2], True, True, dummy)
        sync(st[0])
        print(f"[{tag}] warm(3ep,+compile) {time.perf_counter()-t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        st = f(st[0], st[1], hj, tj, eps_j, hs_j, he_j, dummy, dummy,
               3.0, 3, n_epochs,
               a, b, 1.0, 1.0, 5, st[2], True, True, dummy)
        sync(st[0])
        dt = time.perf_counter() - t0
        print(f"[{tag}] 3 epochs warm: {dt:.2f}s = {dt/3*1000:.0f}ms/epoch "
              f"-> 200ep = {dt/3*200:.0f}s", flush=True)

    if "B" in variants:
        run_bucketed("B:flat-bucketed")
    if "C" in variants:
        run_flat("C:flat")


if __name__ == "__main__":
    main()
