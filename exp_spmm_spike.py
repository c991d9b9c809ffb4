"""VERDICT r1 #8 spike: dense-row-block SpMM vs the segment_sum gather path.

Hypothesis: X @ B (X sparse 100k x 25k, nnz 250/row; B 25k x 50) on TPU is
bounded by the B[col] random gather in the current kernel. A row-block
densify (sorted segment_sum placement into a (R, d) bf16 buffer) followed
by a dense MXU matmul trades random HBM reads for sequential traffic:
~2 * n_blocks * R * d * 2B = 10GB/pass = ~15ms roofline on v5e.

One-hot matmul variants (the other workaround floated in round 1) cost
T*k flops per entry = 640 TFLOP/pass at T=512,k=50 -> >3s at peak bf16;
ruled out on paper, measured here only at small scale for the record.

Prints warm per-pass times for: current spmm, current spmm_t,
dense-block spmm, dense-block fused X^T(XQ).
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import numpy as np
from scipy import sparse as sp

import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from muon_tpu.ops import sparse as dsp

import jax
import jax.numpy as jnp
from functools import partial

N, D, NNZ, K = 100_000, 25_000, 250, 50
R = 4096  # rows per dense block


def sync(x):
    return float(jnp.asarray(x).sum())


def make():
    rng = np.random.default_rng(0)
    pop = rng.pareto(1.2, D) + 1.0
    pop /= pop.sum()
    cols = rng.choice(D, size=N * NNZ, p=pop).astype(np.int32)
    rows = np.repeat(np.arange(N, dtype=np.int32), NNZ)
    data = rng.random(N * NNZ).astype(np.float32)
    X = sp.coo_matrix((data, (rows, cols)), shape=(N, D))
    X.sum_duplicates()
    return X.tocsr()


# ---- dense-block layout ----------------------------------------------------

def block_layout(Xcsr, R, bucket=65536):
    """(n_blocks, E_pad) padded per-block flat indices + values.

    flat = (row % R) * d + col, ascending within each block (CSR row-major,
    sorted indices); pads point at the R*d overflow slot."""
    n, d = Xcsr.shape
    n_blocks = -(-n // R)
    indptr = Xcsr.indptr
    starts = indptr[np.minimum(np.arange(n_blocks) * R, n)]
    ends = indptr[np.minimum((np.arange(n_blocks) + 1) * R, n)]
    cnt = ends - starts
    E = int(cnt.max())
    E_pad = -(-E // bucket) * bucket
    flat = np.full((n_blocks, E_pad), R * d, np.int32)
    vals = np.zeros((n_blocks, E_pad), np.float32)
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    fl = (rows % R) * d + Xcsr.indices
    for b in range(n_blocks):
        m = cnt[b]
        flat[b, :m] = fl[starts[b]:ends[b]]
        vals[b, :m] = Xcsr.data[starts[b]:ends[b]]
    return jnp.asarray(flat), jnp.asarray(vals), n_blocks


@partial(jax.jit, static_argnames=("R", "d"))
def spmm_denseblock(flat, vals, B, R, d):
    Bh = B.astype(jnp.bfloat16)

    def body(_, args):
        fl, vl = args
        dense = jax.ops.segment_sum(
            vl.astype(jnp.bfloat16), fl, num_segments=R * d + 1,
            indices_are_sorted=True,
        )[: R * d].reshape(R, d)
        yb = jnp.dot(dense, Bh, preferred_element_type=jnp.float32)
        return None, yb

    _, Y = jax.lax.scan(body, None, (flat, vals))
    return Y.reshape(-1, B.shape[1])


@partial(jax.jit, static_argnames=("R", "d"))
def ata_denseblock(flat, vals, Q, R, d):
    """Fused X^T (X Q) with ONE densify per block."""
    Qh = Q.astype(jnp.bfloat16)

    def body(acc, args):
        fl, vl = args
        dense = jax.ops.segment_sum(
            vl.astype(jnp.bfloat16), fl, num_segments=R * d + 1,
            indices_are_sorted=True,
        )[: R * d].reshape(R, d)
        z = jnp.dot(dense, Qh, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(
            dense.T, z.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )
        return acc, None

    acc, _ = jax.lax.scan(body, jnp.zeros((d, Q.shape[1]), jnp.float32), (flat, vals))
    return acc


def timeit(f, *a, reps=3):
    sync(f(*a))  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    X = make()
    print(f"nnz={X.nnz}", flush=True)
    dX = dsp.from_scipy(X)
    B = jnp.asarray(np.random.default_rng(1).random((D, K), np.float32))
    Q = jnp.asarray(np.random.default_rng(2).random((N, K), np.float32))

    t = timeit(lambda: dsp.spmm(dX, B))
    print(f"current spmm (gather+segsum): {t*1e3:.1f} ms", flush=True)
    t = timeit(lambda: dsp.spmm_t(dX, Q))
    print(f"current spmm_t:               {t*1e3:.1f} ms", flush=True)
    t = timeit(lambda: dsp.spmm_t(dX, dsp.spmm(dX, B)))
    print(f"current X^T(XB):              {t*1e3:.1f} ms", flush=True)

    t0 = time.perf_counter()
    flat, vals, n_blocks = block_layout(X, R)
    print(f"block_layout host prep: {time.perf_counter()-t0:.2f}s "
          f"(n_blocks={n_blocks}, E_pad={flat.shape[1]})", flush=True)

    t = timeit(lambda: spmm_denseblock(flat, vals, B, R, D))
    print(f"denseblock spmm:              {t*1e3:.1f} ms", flush=True)
    t = timeit(lambda: ata_denseblock(flat, vals, B, R, D))
    print(f"denseblock fused X^T(XB):     {t*1e3:.1f} ms", flush=True)

    # numeric check vs scipy
    ref = X @ np.asarray(B)
    got = np.asarray(spmm_denseblock(flat, vals, B, R, D))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    print(f"denseblock max rel err vs scipy (bf16 path): {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
