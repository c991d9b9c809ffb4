"""Probe: where does the WNN bandwidth/theta stage spend its time at scale?

VERDICT r4 #4: bandwidth+theta is 111.6s of the 249s WNN at 1M — the
largest un-attacked single-chip term. This probe times the bandwidth
kernel and ablations at a configurable n to localize the cost:

  full       — the production _bandwidth_fn
  no_jaccard — same kernel with the (b,C,kk,kk) equality reduction
               replaced by a constant (isolates the VPU compare cost)
  no_sygather— Sy gather replaced by a broadcast (isolates the (b,C,kk)
               NI row-gather cost)
  no_topk    — top_k/dedup replaced by a plain mean (isolates selection)
  theta      — one _theta_fn call (same-mod) at the same n

Usage: python exp_wnn_bw.py [n] [kk]   (defaults 500000 20)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")


def _cache():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


_cache()

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
kk = int(sys.argv[2]) if len(sys.argv) > 2 else 20
d = 40
n_bw = 20

rng = np.random.default_rng(0)
labels = rng.integers(0, 20, n)
cents = rng.normal(size=(20, d)).astype(np.float32) * 3
rep = (cents[labels] + rng.normal(size=(n, d))).astype(np.float32)

# synthetic kNN graph: random neighbors within the same cluster (structure
# similar to a real kNN graph: high 2-hop overlap)
NI = np.empty((n, kk), np.int32)
order = np.argsort(labels, kind="stable")
starts = np.searchsorted(labels[order], np.arange(21))
for c in range(20):
    rows = order[starts[c] : starts[c + 1]]
    NI[rows] = rows[rng.integers(0, len(rows), (len(rows), kk))]

import jax
import jax.numpy as jnp

from muon_tpu.ops import wnn as W


def timeit(f, *args, reps=3, tag=""):
    out = f(*args)
    jax.tree.map(lambda x: None, out)
    float(jnp.asarray(out).ravel()[0].sum()) if hasattr(out, "ravel") else None
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        _ = float(jnp.asarray(out).ravel()[0])
        ts.append(time.perf_counter() - t0)
    print(f"{tag:14s} best={min(ts):7.3f}s  all={[round(t,3) for t in ts]}",
          flush=True)
    return min(ts)


NI_j = jnp.asarray(NI)
rep_j = jnp.asarray(rep)
bbox = float(np.linalg.norm(np.ptp(rep, axis=0), ord=2))
block = max(32, min(1024, (1 << 26) // max(1, kk * kk * 4)))
block = min(block, n)
print(f"n={n} kk={kk} d={d} block={block}", flush=True)

t_full = timeit(
    lambda: W._bandwidth_fn()(NI_j, rep_j, float(n), bbox, n_bw, block),
    tag="full",
)

# production kernel with the stride-2 subsampled candidate pool (round 5):
# time + σ agreement vs the full pool
t_s2 = timeit(
    lambda: W._bandwidth_fn()(NI_j, rep_j, float(n), bbox, n_bw, block, 2),
    tag="stride2",
)
sig1 = np.asarray(W._bandwidth_fn()(NI_j, rep_j, float(n), bbox, n_bw, block))
sig2 = np.asarray(
    W._bandwidth_fn()(NI_j, rep_j, float(n), bbox, n_bw, block, 2)
)
rel = np.abs(sig2 - sig1) / np.maximum(np.abs(sig1), 1e-9)
print(
    f"sigma stride2 vs full: corr={np.corrcoef(sig1, sig2)[0,1]:.5f} "
    f"rel_diff mean={rel.mean():.4f} p99={np.percentile(rel, 99):.4f}",
    flush=True,
)


# --- ablation variants (kernel body with pieces switched off) --------------
from functools import lru_cache, partial


@lru_cache(maxsize=None)
def _ablate_fn(no_jaccard=False, no_sygather=False, no_topk=False,
               no_gather=False):
    @partial(jax.jit, static_argnames=("n_bw", "block"))
    def f(NI, rep, N_total, bbox_norm, n_bw, block):
        n, kk = NI.shape
        NI_safe = jnp.where(NI < 0, 0, NI)
        valid_ni = NI >= 0
        nb = -(-n // block)
        n_pad = nb * block
        NI_p = jnp.pad(NI, ((0, n_pad - n), (0, 0)), constant_values=-1)
        rep_p = jnp.pad(rep, ((0, n_pad - n), (0, 0)))
        set_sizes = valid_ni.sum(axis=1)
        rep_sq = (rep * rep).sum(axis=1)
        rep16 = rep.astype(jnp.bfloat16)

        def body(carry, i):
            sl = lambda A: jax.lax.dynamic_slice_in_dim(A, i * block, block, 0)
            NI_b = sl(NI_p)
            rep_b = sl(rep_p)
            row_b = jnp.arange(block) + i * block
            NI_b_safe = jnp.where(NI_b < 0, 0, NI_b)
            cand_nn = NI_safe[NI_b_safe].reshape(block, kk * kk)
            cand_nn = jnp.where(
                (NI_b < 0).repeat(kk, axis=1), -1,
                jnp.where(valid_ni[NI_b_safe].reshape(block, kk * kk),
                          cand_nn, -1),
            )
            cand = jnp.concatenate([NI_b, cand_nn], axis=1)
            C = cand.shape[1]
            cand_safe = jnp.where(cand < 0, 0, cand)

            if no_jaccard:
                jac_dist = jnp.full((block, C), 0.5)
            else:
                Sx = jnp.where(NI_b < 0, -2, NI_b)
                if no_sygather:
                    Sy = jnp.broadcast_to(NI_b[:, None, :], (block, C, kk))
                else:
                    Sy = NI[cand_safe]
                    Sy = jnp.where(valid_ni[cand_safe], Sy, -3)
                inter = (Sx[:, None, :, None] == Sy[:, :, None, :]).sum(
                    (-1, -2))
                sx_size = set_sizes[jnp.where(row_b < n, row_b, 0)][:, None]
                sy_size = set_sizes[cand_safe]
                union = sx_size + sy_size - inter
                jac_dist = 1.0 - inter / jnp.maximum(union, 1)

            if no_gather:
                cross = jnp.zeros((block, C), jnp.float32)
                csq = jnp.ones((block, C), jnp.float32)
            else:
                c16 = rep16[cand_safe]
                cross = jnp.einsum(
                    "bd,bcd->bc", rep_b.astype(jnp.bfloat16), c16,
                    preferred_element_type=jnp.float32,
                )
                csq = rep_sq[cand_safe]
            qsq = (rep_b * rep_b).sum(-1)[:, None]
            eucl = jnp.sqrt(jnp.maximum(qsq + csq - 2.0 * cross, 0.0))

            score = (N_total - jac_dist * N_total) + (bbox_norm - eucl) / bbox_norm
            bad = (cand < 0) | (cand == row_b[:, None]) | (jac_dist >= 1.0)
            score = jnp.where(bad, N_total + 1.0, score)
            if no_topk:
                sig = eucl[:, :kk].mean(1)
                return carry, sig
            osz = min(C, 4 * n_bw)
            _, top_idx = jax.lax.top_k(-score, osz)
            top_c = jnp.take_along_axis(cand, top_idx, axis=1)
            top_e = jnp.take_along_axis(eucl, top_idx, axis=1)
            top_bad = (
                jnp.take_along_axis(score, top_idx, axis=1) >= N_total + 1.0
            )
            eq = top_c[:, None, :] == top_c[:, :, None]
            tri = jnp.tril(jnp.ones((osz, osz), bool), k=-1)
            dup = (eq & tri[None]).any(-1)
            invalid = top_bad | dup
            keep = (~invalid) & (jnp.cumsum(~invalid, axis=1) <= n_bw)
            cnt = keep.sum(1)
            sig = jnp.where(
                cnt > 0,
                (top_e * keep).sum(1) / jnp.maximum(cnt, 1),
                eucl[:, :kk].mean(1),
            )
            return carry, sig

        _, sig = jax.lax.scan(body, None, jnp.arange(nb))
        return sig.reshape(n_pad)[:n]

    return f


for tag, kw in (
    [
        ("ablate_base", {}),
        ("no_jaccard", dict(no_jaccard=True)),
        ("no_sygather", dict(no_sygather=True)),
        ("no_topk", dict(no_topk=True)),
        ("no_repgather", dict(no_gather=True)),
        ("gathers_only", dict(no_jaccard=True, no_topk=True)),
    ]
    if os.environ.get("WNN_BW_ABLATE")
    else []
):
    timeit(
        lambda kw=kw: _ablate_fn(**kw)(
            NI_j, rep_j, float(n), bbox, n_bw, block
        ),
        tag=tag,
    )

# theta (same-mod: rows1 == rows2, conv = identity)
rows = jnp.arange(n, dtype=jnp.int32)
conv = jnp.arange(n, dtype=jnp.int32)
nnd = jnp.ones(n, jnp.float32) * 0.5
sig = W._bandwidth_fn()(NI_j, rep_j, float(n), bbox, n_bw, block)
t_theta = timeit(
    lambda: W._theta_fn()(rep_j, rows, rows, NI_j, conv, nnd, sig),
    tag="theta",
)

print(f"[extrapolate to 1M, 3 mods] bandwidth {t_full*1e6/n*3:.1f}s + "
      f"theta(9 calls) {t_theta*1e6/n*9:.1f}s", flush=True)
