"""PWM motif scanning as batched one-hot convolution on device.

TPU-native replacement for the MOODS C++ scanner the reference uses
(muon/_atac/tools.py:398-443). Sequences are one-hot encoded to
(n_seq, L, 4); all motifs of one width form a single conv kernel
(w, 4, n_motifs), so scoring every motif × sequence × position is a
handful of `lax.conv_general_dilated` calls on the MXU — instead of the
reference's per-sequence scanner loop.

Log-odds and p-value thresholds follow MOODS' definitions:
  lo[b,j]   = log((pfm[b,j] + pc·bg[b]) / ((Σ_b pfm[b,j] + pc) · bg[b]))
  threshold = min t with P_bg(score ≥ t) ≤ p   (exact DP distribution)
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Sequence, Tuple

import numpy as np

__all__ = [
    "pfm_to_log_odds",
    "threshold_from_p",
    "scan_scores",
    "find_hits",
]

_BASE_INDEX = np.full(256, -1, np.int8)
for i, b in enumerate(b"ACGT"):
    _BASE_INDEX[b] = i
for i, b in enumerate(b"acgt"):
    _BASE_INDEX[b] = i


@lru_cache(maxsize=1)
def _jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


def flat_bg(n: int = 4) -> np.ndarray:
    return np.full(n, 1.0 / n)


def pfm_to_log_odds(
    pfm: np.ndarray, bg=None, pseudocount: float = 0.0001
) -> np.ndarray:
    """Position-frequency matrix (4, w) → log-odds (4, w), MOODS semantics
    (reference usage: muon/_atac/tools.py:414)."""
    pfm = np.asarray(pfm, np.float64)
    if bg is None:
        bg = flat_bg(4)
    bg = np.asarray(bg, np.float64)
    total = pfm.sum(axis=0, keepdims=True)
    p = (pfm + pseudocount * bg[:, None]) / (total + pseudocount)
    return np.log(p / bg[:, None])


def threshold_from_p(lo: np.ndarray, bg=None, pvalue: float = 0.0001) -> float:
    """Smallest score t with P_bg(score ≥ t) ≤ pvalue, by exact DP over the
    discretized per-column score distribution (MOODS threshold_from_p
    semantics; reference usage muon/_atac/tools.py:438)."""
    lo = np.asarray(lo, np.float64)
    if bg is None:
        bg = flat_bg(4)
    bg = np.asarray(bg, np.float64)
    w = lo.shape[1]
    # discretize to integer grid fine enough for w columns
    span = lo.max() - lo.min()
    scale = 20000.0 / max(span * w, 1e-9)
    iscores = np.round(lo * scale).astype(np.int64)  # (4, w)
    offset = iscores.min(axis=0)  # per column min
    shifted = iscores - offset[None, :]
    max_total = int(shifted.max(axis=0).sum())
    dist = np.zeros(max_total + 1)
    dist[0] = 1.0
    pos = 0
    for j in range(w):
        col = np.zeros(int(shifted[:, j].max()) + 1)
        for b in range(4):
            col[shifted[b, j]] += bg[b]
        dist = np.convolve(dist[: pos + 1], col)
        pos += int(shifted[:, j].max())
    # tail probabilities, descending score
    tail = np.cumsum(dist[::-1])[::-1]
    ok = np.nonzero(tail <= pvalue)[0]
    if len(ok) == 0:
        t_int = max_total + 1  # nothing passes
    else:
        t_int = ok[0]
    return (t_int + offset.sum()) / scale


def encode_sequences(sequences: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
    """One-hot encode to (n, L_max, 4) plus per-position validity mask.
    Unknown bases (N etc.) are zero-encoded and invalid."""
    n = len(sequences)
    L = max((len(s) for s in sequences), default=0)
    idx = np.full((n, L), -1, np.int8)
    for i, s in enumerate(sequences):
        b = np.frombuffer(s.encode(), np.uint8)
        idx[i, : len(b)] = _BASE_INDEX[b]
    valid = idx >= 0
    onehot = np.zeros((n, L, 4), np.float32)
    ii, jj = np.nonzero(valid)
    onehot[ii, jj, idx[ii, jj]] = 1.0
    return onehot, valid


@lru_cache(maxsize=None)
def _conv_fn():
    jax, jnp = _jax()

    def f(onehot, invalid, kernel):
        # onehot (N, L, 4); kernel (w, 4, M) → scores (N, L-w+1, M)
        dn = jax.lax.conv_dimension_numbers(
            onehot.shape, kernel.shape, ("NWC", "WIO", "NWC")
        )
        scores = jax.lax.conv_general_dilated(
            onehot, kernel, (1,), "VALID", dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        # windows touching an invalid position get -inf
        w = kernel.shape[0]
        ones = jnp.ones((w, 1, 1), jnp.float32)
        bad = jax.lax.conv_general_dilated(
            invalid[:, :, None], ones, (1,), "VALID", dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        return jnp.where(bad > 0, -jnp.inf, scores)

    return jax.jit(f)


def scan_scores(
    sequences: Sequence[str], log_odds: List[np.ndarray]
) -> Dict[int, np.ndarray]:
    """Score every (sequence, motif, offset) on device.

    log_odds: list of (4, w_m) matrices. Returns {width: scores} with
    scores (n_seq, L-w+1, n_motifs_of_width) and a parallel {width:
    motif_indices} mapping — see find_hits for the flattened interface."""
    jax, jnp = _jax()
    onehot, valid = encode_sequences(sequences)
    invalid = (~valid).astype(np.float32)
    by_width: Dict[int, List[int]] = {}
    for m, lo in enumerate(log_odds):
        by_width.setdefault(lo.shape[1], []).append(m)

    f = _conv_fn()
    out = {}
    for w, midx in by_width.items():
        kernel = np.stack(
            [np.asarray(log_odds[m], np.float32).T for m in midx], axis=-1
        )  # (w, 4, M)
        if onehot.shape[1] < w:
            continue
        scores = f(jnp.asarray(onehot), jnp.asarray(invalid), jnp.asarray(kernel))
        out[w] = (np.asarray(scores), midx)
    return out


def find_hits(
    sequences: Sequence[str],
    log_odds: List[np.ndarray],
    thresholds: Sequence[float],
):
    """All (seq_idx, motif_idx, position, score) with score ≥ threshold —
    the device equivalent of the reference's MOODS scan loop
    (muon/_atac/tools.py:504-509)."""
    res = scan_scores(sequences, log_odds)
    seq_is, mot_is, poss, scs = [], [], [], []
    thresholds = np.asarray(thresholds, np.float64)
    for w, (scores, midx) in res.items():
        th = thresholds[np.asarray(midx)]
        si, pi, mi = np.nonzero(scores >= th[None, None, :])
        seq_is.append(si)
        mot_is.append(np.asarray(midx)[mi])
        poss.append(pi)
        scs.append(scores[si, pi, mi])
    if not seq_is:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.float64),
        )
    order_keys = np.concatenate(seq_is)
    cat = (
        np.concatenate(seq_is),
        np.concatenate(mot_is),
        np.concatenate(poss),
        np.concatenate(scs),
    )
    order = np.lexsort((cat[2], cat[1], cat[0]))
    return tuple(a[order] for a in cat)
