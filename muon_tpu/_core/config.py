"""Global options store with context-manager semantics.

Parity with ``mu.set_options`` (reference muon/_core/config.py:3-51), plus
TPU-specific options that control the compute backend.
"""

from __future__ import annotations

OPTIONS = {
    # TPU/JAX backend options (new in muon_tpu)
    "device": "auto",        # "auto" | "tpu" | "cpu"
    # "auto" | True | False — dense-row-block SpMM for large XᵀX products
    # (Pallas itself is blocked on Mosaic vector gather; this is the
    # measured XLA workaround, 2.3× on the 100k×25k rSVD iteration)
    "spmm_blocks": "auto",
    "compute_dtype": "float32",
    "display_style": "text",  # kept for mudata-parity ("text" | "html")
    "profile": False,         # per-stage wall timers (muon_tpu.utils.profiling)
    # jax.sharding.Mesh with a "cells" axis — when set (and spanning >1
    # device), the public pipeline entry points (ac.pp.tfidf, ac.tl.lsi,
    # mu.pp.neighbors, mu.tl.umap, mu.tl.mofa) dispatch to the sharded
    # SPMD programs in muon_tpu.parallel.pipeline
    "mesh": None,
}


def _valid_mesh(m):
    if m is None:
        return True
    return hasattr(m, "shape") and "cells" in getattr(m, "axis_names", ())


_VALID_OPTIONS = {
    "device": lambda x: x in ("auto", "tpu", "cpu", "gpu"),
    "spmm_blocks": lambda x: x in ("auto", True, False),
    "compute_dtype": lambda x: x in ("float32", "float64", "bfloat16"),
    "display_style": lambda x: x in ("text", "html"),
    "profile": lambda x: x in (True, False),
    "mesh": _valid_mesh,
}


def current_mesh(mesh=None):
    """Resolve the active device mesh for a pipeline call: an explicit
    ``mesh=`` kwarg wins over the ``mu.set_options(mesh=...)`` global.
    Returns None unless the resolved mesh spans more than one device
    (single-device meshes fall through to the plain kernels, which skip
    the shard/psum overhead)."""
    m = mesh if mesh is not None else OPTIONS.get("mesh")
    if m is None:
        return None
    if not _valid_mesh(m):
        raise ValueError(
            "mesh must be a jax.sharding.Mesh with a 'cells' axis"
        )
    if int(getattr(m, "size", 1)) <= 1:
        return None
    return m


class set_options:
    """Set global options, usable directly or as a context manager::

        mu.set_options(compute_dtype="float32")
        with mu.set_options(device="cpu"):
            ...
    """

    def __init__(self, **kwargs):
        self.old = {}
        for k, v in kwargs.items():
            if k not in OPTIONS:
                raise ValueError(
                    f"argument name {k!r} is not in the set of valid options "
                    f"{set(OPTIONS)}"
                )
            if k in _VALID_OPTIONS and not _VALID_OPTIONS[k](v):
                raise ValueError(f"option {k!r} given an invalid value: {v!r}")
            self.old[k] = OPTIONS[k]
        OPTIONS.update(kwargs)

    def __enter__(self):
        return self

    def __exit__(self, *args):
        OPTIONS.update(self.old)
