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
    cells = np.asarray(cells, np.int32)
    # pad the fragment axis to a power-of-two bucket: one compile per
    # (n_cells, n_pos) pair instead of one per query's record count
    nnz = cells.shape[0]
    pad = max(4096, 1 << max(nnz - 1, 1).bit_length())
    ext = pad - nnz

    def p(a, fill):
        a = np.asarray(a, np.int32)
        return np.concatenate([a, np.full(ext, fill, np.int32)]) if ext else a

    return np.asarray(
        f(
            p(cells, -1),
            p(starts, 0),
            p(ends, 0),
            p(scores, 0),
            int(n_cells),
            int(n_pos),
        )
    )
