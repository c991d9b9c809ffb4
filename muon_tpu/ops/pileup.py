"""Device kernels for fragment-interval aggregation.

The reference's TSS pileup fills a dense cells×positions matrix with one
Python slice-add per fragment (muon/_atac/tools.py:1044-1059) — its hot QC
loop. Here the same computation is a difference-array scatter plus a row
cumsum: add +score at the fragment's clipped start column, −score at its
end column, cumsum along positions. O(nnz) scatter on the VPU + one dense
scan; no per-record host work.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

__all__ = ["interval_pileup"]


@lru_cache(maxsize=1)
def _jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


@lru_cache(maxsize=None)
def _pileup_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("n_cells", "n_pos"))
    def f(cells, starts, ends, scores, n_cells, n_pos):
        # difference array with one spill column for ends at n_pos
        diff = jnp.zeros((n_cells + 1, n_pos + 1), jnp.int32)
        s = jnp.clip(starts, 0, n_pos)
        e = jnp.clip(ends, 0, n_pos)
        # invalid cells (barcode not found → -1, or padding → n_cells) all
        # fall into the extra row
        row = jnp.where((cells >= 0) & (cells < n_cells), cells, n_cells)
        diff = diff.at[row, s].add(scores)
        diff = diff.at[row, e].add(-scores)
        out = jnp.cumsum(diff[:n_cells, :n_pos], axis=1)
        return out

    return f


def interval_pileup(cells, starts, ends, scores, n_cells: int, n_pos: int):
    """Accumulate per-cell coverage over [start, end) intervals.

    cells: int array of row ids (−1 = skip); starts/ends: positions relative
    to the pileup window (will be clipped to [0, n_pos]); scores: per-
    fragment weights. Returns (n_cells, n_pos) int32."""
    jax, jnp = _jax()
    f = _pileup_fn()
    return np.asarray(
        f(
            jnp.asarray(cells, jnp.int32),
            jnp.asarray(starts, jnp.int32),
            jnp.asarray(ends, jnp.int32),
            jnp.asarray(scores, jnp.int32),
            int(n_cells),
            int(n_pos),
        )
    )
