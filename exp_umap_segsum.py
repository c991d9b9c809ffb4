"""Follow-up probe: fast alternatives to the (E,2) sorted segment_sum
that dominates a UMAP SGD epoch (1.35s of 1.55s at E=16M, n=1M)."""
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
rng = np.random.default_rng(0)
heads = jnp.asarray(np.sort(rng.integers(0, n, E).astype(np.int32)))
g = jnp.asarray(rng.normal(size=(E, 2)).astype(np.float32))
# row starts for cumsum-diff (host precompute, one-time per edge layout)
h_np = np.asarray(heads)
starts = jnp.asarray(np.searchsorted(h_np, np.arange(n)).astype(np.int32))
ends = jnp.asarray(np.searchsorted(h_np, np.arange(n), side="right").astype(np.int32))


def timeit(name, fn, *a, reps=3):
    out = fn(*a)
    float(out.ravel()[:1].sum())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*a)
        float(out.ravel()[:1].sum())
        ts.append(time.perf_counter() - t0)
    print(f"{name:42s} {min(ts)*1e3:9.1f} ms")
    return out


ref = timeit("segment_sum (E,2) 2D", jax.jit(
    lambda g, h: jax.ops.segment_sum(g, h, num_segments=n,
                                     indices_are_sorted=True)), g, heads)


@jax.jit
def seg_1d(g, h):
    a = jax.ops.segment_sum(g[:, 0], h, num_segments=n,
                            indices_are_sorted=True)
    b = jax.ops.segment_sum(g[:, 1], h, num_segments=n,
                            indices_are_sorted=True)
    return jnp.stack([a, b], axis=1)


o1 = timeit("2x segment_sum 1D", seg_1d, g, heads)


@jax.jit
def cumsum_diff(g, starts, ends):
    cs = jnp.cumsum(g.astype(jnp.float64), axis=0) if False else jnp.cumsum(g, axis=0)
    cs = jnp.concatenate([jnp.zeros((1, 2), cs.dtype), cs], axis=0)
    return cs[ends] - cs[starts]


o2 = timeit("cumsum + boundary diff (f32)", cumsum_diff, g, starts, ends)


@jax.jit
def cumsum_diff_1d(g, starts, ends):
    out = []
    for c in range(2):
        cs = jnp.cumsum(g[:, c])
        cs = jnp.concatenate([jnp.zeros((1,), cs.dtype), cs])
        out.append(cs[ends] - cs[starts])
    return jnp.stack(out, axis=1)


o3 = timeit("1-D cumsum + diff x2", cumsum_diff_1d, g, starts, ends)

# correctness + f32 cumsum error at E=16M (values ~N(0,1))
r = np.asarray(ref)
for name, o in [("1d", o1), ("cs", o2), ("cs1d", o3)]:
    d = np.abs(np.asarray(o) - r)
    rel = d.max() / (np.abs(r).max() + 1e-9)
    print(f"  {name}: max abs err {d.max():.3e}  (rel {rel:.2e})")

# wide-lane reshape trick: (E,2) -> (E/64, 128) won't match segments; but
# try segment_sum over (E, 128) to confirm lanes are the issue
g128 = jnp.asarray(rng.normal(size=(E // 16, 128)).astype(np.float32))
h16 = heads[::16]
timeit("segment_sum (E/16,128)", jax.jit(
    lambda g, h: jax.ops.segment_sum(g, h, num_segments=n,
                                     indices_are_sorted=True)), g128, h16)
print("done")
