"""Device/dtype resolution for the compute layer."""

from __future__ import annotations

from functools import lru_cache


@lru_cache(maxsize=1)
def jax_mod():
    import jax

    return jax


def compute_dtype():
    import jax.numpy as jnp

    from .._core.config import OPTIONS

    return {
        "float32": jnp.float32,
        "float64": jnp.float64,
        "bfloat16": jnp.bfloat16,
    }[OPTIONS["compute_dtype"]]


def on_tpu() -> bool:
    jax = jax_mod()
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


_DENSE_CACHE: dict = {}


def register_dense(arr, dev) -> None:
    """Tag a host ndarray as already resident on device (dense analogue of
    the scipy ``_muon_tpu_device`` tag in ops/sparse). Keyed by id() with a
    weakref guard against id reuse; the entry (and its HBM) dies with the
    host array."""
    import weakref

    import numpy as np

    if not isinstance(arr, np.ndarray):
        return
    key = id(arr)
    try:
        ref = weakref.ref(arr, lambda r, k=key: _DENSE_CACHE.pop(k, None))
    except TypeError:
        return
    _DENSE_CACHE[key] = (ref, dev)


def unregister_dense(arr) -> None:
    """Drop a residency tag (frees the HBM copy once no op holds it)."""
    _DENSE_CACHE.pop(id(arr), None)


def dense_to_device(arr, dtype=None):
    """jnp.asarray with residency reuse: a registered host array (e.g. the
    output of a device op that was downloaded for API parity) re-enters
    without paying the h2d transfer again — at 1M cells a rep is 160-480MB
    through a ~40MB/s tunnel, re-uploaded by pca→neighbors→WNN otherwise."""
    import numpy as np

    import jax.numpy as jnp

    if isinstance(arr, np.ndarray):
        ent = _DENSE_CACHE.get(id(arr))
        if ent is not None:
            ref, dev = ent
            if ref() is arr and (dtype is None or dev.dtype == dtype):
                return dev
        dev = jnp.asarray(arr) if dtype is None else jnp.asarray(arr, dtype)
        register_dense(arr, dev)
        return dev
    return jnp.asarray(arr) if dtype is None else jnp.asarray(arr, dtype)


def use_spmm_blocks() -> bool:
    """Gate for the dense-row-block SpMM path (ops/sparse.block_layout).

    "auto" enables it everywhere — the kernel is plain XLA (segment_sum +
    matmul) and wins wherever repeated XᵀX products amortize the layout
    build; set ``spmm_blocks=False`` to force the gather path."""
    from .._core.config import OPTIONS

    opt = OPTIONS["spmm_blocks"]
    if opt == "auto":
        return True
    return bool(opt)
