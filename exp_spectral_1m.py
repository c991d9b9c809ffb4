"""Probe: spectral_init at 1M cells — membership-operator device seed vs
the exact union-CSR rsvd path (VERDICT r5 follow-up; validates the
round-5 spectral-seed commit at the scale the 1M e2e runs).

Builds a 1M-row fuzzy kNN membership table (k=20, clustered reps → real
neighbor structure), assembles the union graph the way the pipeline does
(native fuzzy union), and times both spectral paths end-to-end including
their transfers. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")


def _enable_compile_cache():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


_enable_compile_cache()

import numpy as np

N = int(os.environ.get("N", 1_000_000))
K = 20


def main():
    from muon_tpu.ops.fuzzy import compute_connectivities_umap
    from muon_tpu.ops.knn import knn
    from muon_tpu.ops.umap import spectral_init

    rng = np.random.default_rng(0)
    nc = 20
    labels = rng.integers(0, nc, N)
    C = rng.normal(size=(nc, 30)).astype(np.float32) * 3
    X = (C[labels] + rng.normal(size=(N, 30)).astype(np.float32))

    t0 = time.time()
    idx, dists = knn(X, K - 1, approx=N > 20000)
    idx = np.asarray(idx)
    dists = np.asarray(dists, np.float64)
    print(f"knn: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    conn = compute_connectivities_umap(idx, dists, N, K)
    print(f"union: {time.time()-t0:.1f}s nnz={conn.nnz}", flush=True)
    tag = getattr(conn, "_muon_tpu_membership", None)
    assert tag is not None

    # warm both paths once at small scale is pointless (shape-specific);
    # time two reps each, report the min (tunnel variance)
    times_fast, times_ref = [], []
    for rep in range(2):
        t0 = time.time()
        emb_fast = spectral_init(
            conn.tocsr(), 2, seed=42, membership=tag
        )
        times_fast.append(time.time() - t0)
        print(f"membership seed rep{rep}: {times_fast[-1]:.1f}s", flush=True)
    for rep in range(2):
        t0 = time.time()
        emb_ref = spectral_init(conn.tocsr(), 2, seed=42)
        times_ref.append(time.time() - t0)
        print(f"union-rsvd seed rep{rep}: {times_ref[-1]:.1f}s", flush=True)

    def sep(emb):
        # cluster separation on a 20k subsample (host O(n^2) otherwise)
        sub = rng.choice(N, 20000, replace=False)
        e, l = emb[sub], labels[sub]
        from scipy.spatial.distance import cdist

        D = cdist(e, e)
        same = l[:, None] == l[None, :]
        np.fill_diagonal(same, False)
        return float(D[same].mean() / D[~same].mean())

    out = {
        "metric": "spectral_init_1m_sec",
        "n": N,
        "membership_s": round(min(times_fast), 2),
        "union_rsvd_s": round(min(times_ref), 2),
        "membership_times": [round(t, 2) for t in times_fast],
        "union_times": [round(t, 2) for t in times_ref],
        "sep_membership": round(sep(emb_fast), 4),
        "sep_union": round(sep(emb_ref), 4),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
