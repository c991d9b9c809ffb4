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
