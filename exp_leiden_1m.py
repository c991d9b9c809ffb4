"""Profile multiplex leiden at 1M cells × 3 layers on host (VERDICT r3
#6: leiden ≤ 60s at 1M). Synthetic clustered kNN-like symmetric graphs
approximate the WNN/modality connectivities the e2e feeds it."""
import os
import sys
import time

os.environ["MUON_TPU_PROFILE"] = "1"

import numpy as np
from scipy import sparse as sp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_layer(n, k, ncl, seed, lab):
    rng = np.random.default_rng(seed)
    # neighbors: 90% same-cluster, 10% random
    tails = np.empty(n * k, np.int64)
    same = rng.random(n * k) < 0.9
    rnd = rng.integers(0, n, n * k)
    # same-cluster neighbor: random member of own cluster via sorted order
    order = np.argsort(lab, kind="stable")
    starts = np.searchsorted(lab[order], np.arange(ncl))
    ends = np.searchsorted(lab[order], np.arange(ncl), side="right")
    heads = np.repeat(np.arange(n, dtype=np.int64), k)
    hl = lab[heads]
    u = rng.integers(0, 1 << 30, n * k)
    within = order[starts[hl] + u % np.maximum(ends[hl] - starts[hl], 1)]
    tails = np.where(same, within, rnd)
    w = rng.uniform(0.05, 1.0, n * k)
    A = sp.coo_matrix((np.concatenate([w, w]),
                       (np.concatenate([heads, tails]),
                        np.concatenate([tails, heads]))), shape=(n, n))
    A = A.tocsr()
    A.sum_duplicates()
    A.setdiag(0)
    A.eliminate_zeros()
    return A.astype(np.float32), lab


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # stage() drains must not
    # touch the tunneled TPU from a side process (CLAUDE.md one-client rule)

    from muon_tpu.ops.leiden import multiplex_leiden

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    t0 = time.perf_counter()
    layers = []
    lab = np.random.default_rng(99).integers(0, 24, n)
    for s in range(3):
        path = f"/tmp/leiden_layer_{n}_{s}.npz"
        if os.path.exists(path):
            z = np.load(path)
            A = sp.csr_matrix((z["d"], z["i"], z["p"]), shape=(n, n))
        else:
            A, _ = make_layer(n, 20, 24, s, lab)
            np.savez(path, d=A.data, i=A.indices, p=A.indptr)
        layers.append(A)
    print(f"[build] {time.perf_counter()-t0:.1f}s "
          f"nnz={[l.nnz for l in layers]}", flush=True)

    t0 = time.perf_counter()
    labels = multiplex_leiden(layers, seed=0)
    dt = time.perf_counter() - t0
    from sklearn.metrics import adjusted_rand_score

    ari = adjusted_rand_score(lab, labels)
    print(f"[leiden] total {dt:.1f}s ncomm={labels.max()+1} "
          f"ARI(last-layer labels)={ari:.3f}", flush=True)


if __name__ == "__main__":
    main()
