"""Probe: what actually costs in a 1M-cell UMAP SGD epoch on this TPU.

Times the constituent primitives at e2e scale (n=1M vertices, E=16M
gathered edge rows/epoch) to decide where optimization effort goes:
random vs sorted gathers, narrow (n,2) vs wide tables, segment_sum,
and the assembled attractive/negative passes.
"""
import os, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

n = 1_000_000
E = 16_000_000
R = 5
rng = np.random.default_rng(0)

emb = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))
idx_rand = jnp.asarray(rng.integers(0, n, E).astype(np.int32))
idx_sort = jnp.sort(idx_rand)
heads_sorted = jnp.asarray(np.sort(rng.integers(0, n, E).astype(np.int32)))


def timeit(name, fn, *a, reps=3):
    fn(*a)  # compile
    float(jnp.zeros(()).sum())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*a)
        # force through the tunnel
        f = out[0] if isinstance(out, tuple) else out
        float(f.ravel()[:1].sum())
        ts.append(time.perf_counter() - t0)
    print(f"{name:42s} {min(ts)*1e3:9.1f} ms")
    return min(ts)


g_rand = jax.jit(lambda e, i: e[i])
g_sort = jax.jit(lambda e, i: e[i])
timeit("gather (E,2) random idx", g_rand, emb, idx_rand)
timeit("gather (E,2) sorted idx", g_sort, emb, idx_sort)

emb8 = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
emb128 = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))
timeit("gather (E,8) random idx", g_rand, emb8, idx_rand)
E4 = E // 4
timeit("gather (E/4,128) random idx", g_rand, emb128, idx_rand[:E4])

seg = jax.jit(lambda g, h: jax.ops.segment_sum(g, h, num_segments=n,
                                               indices_are_sorted=True))
gvals = jnp.asarray(rng.normal(size=(E, 2)).astype(np.float32))
timeit("segment_sum (E,2) sorted", seg, gvals, heads_sorted)


@jax.jit
def attract(emb, heads, tails):
    h = emb[heads]
    t = emb[tails]
    diff = h - t
    d2 = (diff * diff).sum(-1)
    gc = (-2.0 * 1.58 * 0.9 * d2 ** (0.9 - 1.0)) / (1.58 * d2**0.9 + 1.0)
    gc = jnp.where(d2 > 0, gc, 0.0)
    g = jnp.clip(gc[..., None] * diff, -4.0, 4.0)
    return jax.ops.segment_sum(g, heads, num_segments=n,
                               indices_are_sorted=True)


timeit("attractive pass (E edges)", attract, emb, heads_sorted, idx_rand)


@jax.jit
def negative(emb, key):
    key, sub = jax.random.split(key)
    negs = jax.random.randint(sub, (n, R), 0, n)
    vneg = emb[negs.reshape(-1)].reshape(n, R, -1)
    diffn = emb[:, None, :] - vneg
    d2n = (diffn * diffn).sum(-1)
    coeff = (2.0 * 1.0 * 0.9) / ((0.001 + d2n) * (1.58 * d2n**0.9 + 1.0))
    gn = jnp.clip(coeff[..., None] * diffn, -4.0, 4.0)
    return gn.sum(axis=1)


timeit("negative pass (n x 5)", negative, emb, jax.random.PRNGKey(0))

# variant: attractive with single fused gather of heads++tails
@jax.jit
def attract_fused(emb, heads, tails):
    both = emb[jnp.concatenate([heads, tails])]
    h, t = both[:E], both[E:]
    diff = h - t
    d2 = (diff * diff).sum(-1)
    gc = (-2.0 * 1.58 * 0.9 * d2 ** (0.9 - 1.0)) / (1.58 * d2**0.9 + 1.0)
    gc = jnp.where(d2 > 0, gc, 0.0)
    g = jnp.clip(gc[..., None] * diff, -4.0, 4.0)
    return jax.ops.segment_sum(g, heads, num_segments=n,
                               indices_are_sorted=True)


timeit("attractive, fused h+t gather", attract_fused, emb, heads_sorted,
       idx_rand)

# variant: emb stored (n,) complex64 — half the minor-dim padding
embc = jax.jit(lambda e: jax.lax.complex(e[:, 0], e[:, 1]))(emb)


@jax.jit
def attract_cplx(embc, heads, tails):
    h = embc[heads]
    t = embc[tails]
    diff = h - t
    d2 = (diff.real * diff.real + diff.imag * diff.imag)
    gc = (-2.0 * 1.58 * 0.9 * d2 ** (0.9 - 1.0)) / (1.58 * d2**0.9 + 1.0)
    gc = jnp.where(d2 > 0, gc, 0.0)
    gr = jnp.clip(gc * diff.real, -4.0, 4.0)
    gi = jnp.clip(gc * diff.imag, -4.0, 4.0)
    g = jax.lax.complex(gr, gi)
    return jax.ops.segment_sum(g, heads, num_segments=n,
                               indices_are_sorted=True)


timeit("attractive, complex64 layout", attract_cplx, embc, heads_sorted,
       idx_rand)
print("done")
