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
}

_VALID_OPTIONS = {
    "device": lambda x: x in ("auto", "tpu", "cpu", "gpu"),
    "spmm_blocks": lambda x: x in ("auto", True, False),
    "compute_dtype": lambda x: x in ("float32", "float64", "bfloat16"),
    "display_style": lambda x: x in ("text", "html"),
    "profile": lambda x: x in (True, False),
}


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
