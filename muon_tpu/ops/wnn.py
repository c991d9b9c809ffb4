"""Weighted-nearest-neighbors multimodal fusion + single-modality neighbors.

TPU-native implementation of the reference's WNN
(muon/_core/preproc.py:264-640, Hao et al. 2020 / Swanson et al. 2020):

* per-modality kNN graphs: exact blocked kNN (ops.knn) instead of
  pynndescent NN-descent;
* kernel bandwidths: the reference's Jaccard×Euclidean tie-break search
  (muon/_core/preproc.py:52-111) becomes an exact candidate-set scan over
  neighbors-of-neighbors — a dense (block, C, k, k) equality reduction on
  the VPU instead of a numba custom metric inside NN-descent;
* affinity ratios θ, softmax modality weights, candidate-graph fusion and
  the final top-k are jit-compiled kernels over fixed-width index mats.

Host code only does index bookkeeping and CSR assembly.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
from scipy import sparse as sp

from .fuzzy import compute_connectivities_umap
from .knn import knn

__all__ = ["single_neighbors", "wnn_neighbors", "choose_representation"]


@lru_cache(maxsize=1)
def _jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


# ---------------------------------------------------------------------------
# representation choice (scanpy `_choose_representation` parity)
# ---------------------------------------------------------------------------


def choose_representation(adata, use_rep=None, n_pcs=None):
    from scipy.sparse import issparse

    if use_rep is None or use_rep == -1:
        if "X_pca" in adata.obsm:
            rep = np.asarray(adata.obsm["X_pca"])
            if n_pcs is not None and n_pcs not in (-1, 0):
                rep = rep[:, :n_pcs]
            return np.asarray(rep, dtype=np.float32)
        if adata.n_vars > 50:
            from .linalg import pca as _pca

            scores, *_ = _pca(
                adata.X if issparse(adata.X) else np.asarray(adata.X),
                n_comps=min(50, adata.n_vars - 1),
            )
            adata.obsm["X_pca"] = np.asarray(scores)
            rep = adata.obsm["X_pca"]
            if n_pcs is not None and n_pcs not in (-1, 0):
                rep = rep[:, :n_pcs]
            return np.asarray(rep, dtype=np.float32)
        X = adata.X
        if issparse(X):
            X = np.asarray(X.todense())
        return np.asarray(X, dtype=np.float32)
    if use_rep == "X":
        X = adata.X
        if issparse(X):
            X = np.asarray(X.todense())
        return np.asarray(X, dtype=np.float32)
    rep = np.asarray(adata.obsm[use_rep])
    if n_pcs is not None and n_pcs not in (-1, 0) and "pca" in str(use_rep).lower():
        rep = rep[:, :n_pcs]
    return np.asarray(rep, dtype=np.float32)


# ---------------------------------------------------------------------------
# single-modality neighbors (scanpy sc.pp.neighbors parity surface)
# ---------------------------------------------------------------------------


def single_neighbors(
    adata,
    n_neighbors: int = 15,
    use_rep=None,
    n_pcs=None,
    metric: str = "euclidean",
    key_added=None,
    random_state: int = 0,
    mesh=None,
):
    """Exact-kNN + UMAP connectivities for one modality. Writes
    ``obsp["distances"]/["connectivities"]`` and ``uns["neighbors"]`` with
    the params-in-uns convention WNN re-reads (SURVEY §5 observability).

    With an active mesh (kwarg or ``mu.set_options(mesh=...)``) the kNN
    runs as the SPMD program parallel/pipeline.sharded_knn — query rows
    sharded over "cells"."""
    from .._core.config import current_mesh

    mesh = current_mesh(mesh)
    rep = choose_representation(adata, use_rep=use_rep, n_pcs=n_pcs)
    if mesh is not None and metric in ("euclidean", "l2"):
        from .knn import IVF_THRESHOLD

        if rep.shape[0] > IVF_THRESHOLD:
            # at-scale path: sharded IVF (same threshold as the
            # single-device dispatch in ops/knn.knn)
            from ..parallel.pipeline import sharded_ivf_knn

            idx, dists = sharded_ivf_knn(
                np.asarray(rep, np.float32), mesh, k=n_neighbors - 1
            )
            idx = np.asarray(idx)
            dists = np.asarray(dists, np.float64)
        else:
            from ..parallel.pipeline import sharded_knn

            d2, idx = sharded_knn(
                np.asarray(rep, np.float32), mesh, k=n_neighbors - 1
            )
            idx = np.asarray(idx)
            dists = np.sqrt(np.maximum(np.asarray(d2, np.float64), 0.0))
    else:
        # large inputs use the approximate kNN path (bf16 cross-terms +
        # hardware approx top-k, recall ~0.997) — the reference's
        # neighbors are approximate as well (pynndescent NN-descent)
        idx_dev, dists_dev = knn(
            rep, n_neighbors - 1, metric=metric,
            approx=rep.shape[0] > 20000, device_out=True,
        )
        idx = np.asarray(idx_dev)
        dists = np.asarray(dists_dev, dtype=np.float64)

    n = adata.n_obs
    k = idx.shape[1]  # n_neighbors incl self
    conn = compute_connectivities_umap(idx, dists, n, k)

    rows = np.repeat(np.arange(n), k - 1)
    cols = idx[:, 1:].reshape(-1)
    vals = dists[:, 1:].reshape(-1)
    dmat = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    # Device-resident kNN tag: WNN (_load_mod) re-reads this graph as a
    # fixed-width (n, k−1) index matrix. Tagging the already-computed
    # result skips the CSR→matrix host rebuild AND — when the kNN ran on
    # device — the ~160MB/mod re-upload through the tunnel (13.9s/mod
    # measured in the 1M e2e, round 5). Columns are SORTED to match the
    # CSR-rebuild path exactly: the bandwidth kernel's σ selection breaks
    # Jaccard ties by candidate position, so neighbor ORDER (not just the
    # set) is behavior the fallback path pins.
    nn_tag = {
        "n": n,
        "nnz": int(dmat.nnz),
        "NI": np.sort(idx[:, 1:].astype(np.int32, copy=False), axis=1),
        "nnd": dists[:, 1:].min(axis=1).astype(np.float32),
        "NI_dev": None,
        "nnd_dev": None,
    }
    if mesh is None:
        import jax.numpy as jnp

        nn_tag["NI_dev"] = jnp.sort(
            idx_dev[:, 1:].astype(jnp.int32), axis=1
        )
        nn_tag["nnd_dev"] = jnp.min(
            dists_dev[:, 1:].astype(jnp.float32), axis=1
        )
    dmat._muon_tpu_knn = nn_tag

    if key_added is None:
        key_added, conns_key, dists_key = "neighbors", "connectivities", "distances"
    else:
        conns_key, dists_key = f"{key_added}_connectivities", f"{key_added}_distances"
    adata.obsp[dists_key] = dmat
    adata.obsp[conns_key] = conn
    adata.uns[key_added] = {
        "connectivities_key": conns_key,
        "distances_key": dists_key,
        "params": {
            "n_neighbors": int(n_neighbors),
            "method": "umap",
            "random_state": random_state,
            "metric": metric,
            "use_rep": use_rep if use_rep is not None else -1,
            "n_pcs": n_pcs if n_pcs is not None else -1,
        },
    }
    return adata


# ---------------------------------------------------------------------------
# WNN kernels
# ---------------------------------------------------------------------------


def _neighbor_index_matrix(dmat: sp.csr_matrix):
    """CSR kNN-graph rows → fixed-width (n, kk) index matrix (pad −1) and
    per-row min distance."""
    n = dmat.shape[0]
    counts = np.diff(dmat.indptr)
    if counts.min() == 0:
        raise ValueError(
            "A cell has no neighbors in a modality graph. Make sure to "
            "subset before calculating nearest neighbors."
        )
    kk = int(counts.max())
    NI = np.full((n, kk), -1, dtype=np.int32)
    ND = np.full((n, kk), np.inf, dtype=np.float32)
    for_r = np.repeat(np.arange(n), counts)
    pos = np.arange(dmat.nnz) - np.repeat(dmat.indptr[:-1], counts)
    NI[for_r, pos] = dmat.indices.astype(np.int32)
    ND[for_r, pos] = dmat.data.astype(np.float32)
    nnd = ND.min(axis=1)
    return NI, nnd


def _bandwidth_block_math(
    jax, jnp, NI_b, rep_b, row_b, tables, N_total, bbox_norm, n_bw, n
):
    """σ for one row block: mean euclidean distance to the ``n_bw`` cells
    with the largest Jaccard distance between neighbor sets (tie-break:
    largest euclidean), among neighbors + neighbors-of-neighbors
    candidates. Shared by the single-device kernel (_bandwidth_fn) and
    the cells-sharded form (parallel/pipeline.sharded_wnn_bandwidth) so
    the two paths cannot drift. ``tables`` = (NI, NI_sub, set_sizes,
    rep_sq, rep16) — FULL n-sized arrays (replicated under sharding),
    computed ONCE outside the block scan. NI_sub may be column-SUBSAMPLED
    (see _bandwidth_tables): the candidate pool then holds kk + kk·s
    entries instead of kk + kk², cutting the Sy/rep gathers and the
    Jaccard compare proportionally — the pool was already an approximation
    of the reference's NN-descent search (muon/_core/preproc.py:452-462),
    which samples candidates randomly. Validity is derived from the
    gathered values themselves (pad slots carry −1), not from separate
    boolean-table gathers — two (b, C, ·) gathers fewer per block."""
    NI, NI_sub, set_sizes, rep_sq, rep16 = tables
    block, kk = NI_b.shape
    s = NI_sub.shape[1]

    NI_b_safe = jnp.where(NI_b < 0, 0, NI_b)
    # candidates: own neighbors + (subsampled) neighbors-of-neighbors.
    # Gather the RAW rows: pad entries arrive as −1 and rows reached via
    # an invalid j are masked below — no separate validity gather.
    cand_nn = NI_sub[NI_b_safe].reshape(block, kk * s)
    cand_nn = jnp.where((NI_b < 0).repeat(s, axis=1), -1, cand_nn)
    cand = jnp.concatenate([NI_b, cand_nn], axis=1)  # (b, C)
    C = cand.shape[1]
    cand_safe = jnp.where(cand < 0, 0, cand)

    # jaccard between S_x (b, kk) and S_y (b, C, kk)
    Sx = jnp.where(NI_b < 0, -2, NI_b)           # pad never matches
    Sy = NI[cand_safe]                            # (b, C, kk), pad = −1
    Sy = jnp.where(Sy >= 0, Sy, -3)
    inter = (Sx[:, None, :, None] == Sy[:, :, None, :]).sum((-1, -2))
    sx_size = set_sizes[jnp.where(row_b < n, row_b, 0)][:, None]
    sy_size = set_sizes[cand_safe]
    union = sx_size + sy_size - inter
    jac_dist = 1.0 - inter / jnp.maximum(union, 1)

    # euclidean in rep space: ‖q−c‖² = |q|² + |c|² − 2 q·c with the
    # cross-term as a bf16 MXU einsum and |c|² gathered from the
    # precomputed global norms (f32 accumulate; ~1e-3 relative
    # error on distances used only to average a bandwidth)
    c16 = rep16[cand_safe]                       # (b, C, d) bf16
    cross = jnp.einsum(
        "bd,bcd->bc", rep_b.astype(jnp.bfloat16), c16,
        preferred_element_type=jnp.float32,
    )
    qsq = (rep_b * rep_b).sum(-1)[:, None]
    csq = rep_sq[cand_safe]
    eucl = jnp.sqrt(jnp.maximum(qsq + csq - 2.0 * cross, 0.0))

    score = (N_total - jac_dist * N_total) + (bbox_norm - eucl) / bbox_norm
    bad = (
        (cand < 0)
        | (cand == row_b[:, None])
        | (jac_dist >= 1.0)
    )
    score = jnp.where(bad, N_total + 1.0, score)
    # prefer-unique: duplicate candidates must not be picked twice.
    # Oversample the top-k 4×, then dedup only among the winners —
    # the full-candidate (b, C, C) pairwise compare this replaces
    # was ~half the kernel's VPU work at C≈400 (duplicates carry
    # IDENTICAL scores, so copies sort adjacent and surviving-first
    # reproduces the full dedup unless >3·n_bw of the leading slots
    # are duplicates — then σ averages over the unique subset).
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
    # fall back to plain neighbor distances if no valid candidates
    sig = jnp.where(
        cnt > 0,
        (top_e * keep).sum(1) / jnp.maximum(cnt, 1),
        eucl[:, :kk].mean(1),
    )
    return sig


def _bandwidth_tables(jnp, NI, rep, nn_stride=1):
    """The full-array tables every bandwidth block gathers from: neighbor
    matrix (raw + clamped/subsampled), validity, set sizes, squared norms,
    bf16 rep copy — all computed once, outside the per-block scan.

    ``nn_stride`` > 1 strides the columns used for the 2-hop candidate
    expansion (every ``nn_stride``-th neighbor of each neighbor), shrinking
    the candidate pool from kk+kk² to kk+kk·⌈kk/stride⌉. The Jaccard sets
    themselves stay FULL-width — only the pool the σ winners are drawn
    from is thinned. Measured 2×: Sy gather + compare + rep gather + top-k
    all scale with the pool (probe exp_wnn_bw.py: 4.07s → ~2.1s per
    200k-cell modality at stride 2)."""
    return (
        NI,
        NI[:, ::nn_stride],
        (NI >= 0).sum(axis=1),
        (rep * rep).sum(axis=1),
        rep.astype(jnp.bfloat16),
    )


def _auto_nn_stride(kk: int) -> int:
    """Stride-2 subsampling of the 2-hop pool once neighbor lists are wide
    enough that ~kk²/2 candidates still oversample the n_bw winners 5×+."""
    return 2 if kk >= 16 else 1


@lru_cache(maxsize=None)
def _bandwidth_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("n_bw", "block", "nn_stride"))
    def f(NI, rep, N_total, bbox_norm, n_bw, block, nn_stride=1):
        n, kk = NI.shape
        nb = -(-n // block)
        n_pad = nb * block
        NI_p = jnp.pad(NI, ((0, n_pad - n), (0, 0)), constant_values=-1)
        rep_p = jnp.pad(rep, ((0, n_pad - n), (0, 0)))
        tables = _bandwidth_tables(jnp, NI, rep, nn_stride)

        def body(carry, i):
            sl = lambda A: jax.lax.dynamic_slice_in_dim(A, i * block, block, 0)  # noqa: E731
            row_b = jnp.arange(block) + i * block
            sig = _bandwidth_block_math(
                jax, jnp, sl(NI_p), sl(rep_p), row_b, tables,
                N_total, bbox_norm, n_bw, n,
            )
            return carry, sig

        _, sig = jax.lax.scan(body, None, jnp.arange(nb))
        return sig.reshape(n_pad)[:n]

    return f


def _theta_block_math(
    jnp, rows1b, rows2b, rep_full, NI2_full, conv, nnd_full, sigma_full
):
    """θ affinity for one row block (reference
    muon/_core/preproc.py:480-503): r = mean of the FULL mod1 rep over
    mod2-neighbors; θ = exp(−max(‖x−r‖−nnd,0)/(σ−nnd)). Shared by the
    single-device kernel (_theta_fn) and the cells-sharded form
    (parallel/pipeline.sharded_wnn_theta). All ``*_full`` tables are
    n-sized (replicated under sharding); only the row-id vectors are
    block-local."""
    NI2b = NI2_full[rows2b]              # (block, kk) mod2-local
    valid = NI2b >= 0
    mapped = conv[jnp.where(valid, NI2b, 0)]   # mod1-local or -1
    valid = valid & (mapped >= 0)
    gathered = rep_full[jnp.where(valid, mapped, 0)]  # (b, kk, d)
    w = valid[..., None].astype(rep_full.dtype)
    r = (gathered * w).sum(1) / jnp.maximum(w.sum(1), 1.0)
    q = rep_full[rows1b]
    nndb = nnd_full[rows1b]
    sigb = sigma_full[rows1b]
    dist = jnp.sqrt(jnp.maximum(((q - r) ** 2).sum(-1), 0.0))
    return jnp.exp(
        -jnp.maximum(dist - nndb, 0.0)
        / jnp.maximum(sigb - nndb, 1e-12)
    )


@lru_cache(maxsize=None)
def _theta_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("block",))
    def f(rep_full, rows1, rows2, NI2_full, conv, nnd_full, sigma_full,
          block=32768):
        """θ affinity (reference muon/_core/preproc.py:480-503):
        r = mean of the FULL mod1 rep over mod2-neighbors;
        θ = exp(−max(‖x−r‖−nnd,0)/(σ−nnd)).

        The mod2-local → mod1-local neighbor remap happens HERE (gathering
        ``conv[NI2_full[rows2]]``) so the only per-(mod1,mod2) uploads are
        the small row/conv index vectors — rep_full / NI2_full / nnd / σ
        stay device-resident across all modality pairs (the previous
        per-pair re-uploads of the 1M×d rep and 1M×kk neighbor matrix
        were ~240MB per call through a ~40MB/s tunnel).

        Chunked over cells: the (m, kk, d) neighbor gather is ~11GB at
        1M cells in one piece (measured OOM); a lax.scan over row blocks
        bounds it at (block, kk, d)."""
        m = rows1.shape[0]
        kk = NI2_full.shape[1]
        nb = max(1, -(-m // block))
        m_pad = nb * block
        rows1p = jnp.pad(rows1, (0, m_pad - m))
        rows2p = jnp.pad(rows2, (0, m_pad - m))

        def body(_, args):
            rows1b, rows2b = args
            th = _theta_block_math(
                jnp, rows1b, rows2b, rep_full, NI2_full, conv,
                nnd_full, sigma_full,
            )
            return _, th

        _, th = jax.lax.scan(
            body, None,
            (
                rows1p.reshape(nb, block),
                rows2p.reshape(nb, block),
            ),
        )
        return th.reshape(m_pad)[:m]

    return f


def _fusion_block_math(jnp, q, cc, aux_q, aux_c, sw_b, ok, dims, metric):
    """Score one row block of candidates against the concatenated rep
    table — shared by the single-device kernel below and the sharded
    scorer (parallel/pipeline.sharded_wnn_scores) so the fusion math
    cannot drift between them.

        score[cell, c] = Σ_m  w_m[cell] · exp(−dist_m(cell, cand)/σ_m[cell])
    """
    block, C = ok.shape
    M = len(dims)
    total = jnp.zeros((block, C), jnp.float32)
    for m, (lo, hi) in enumerate(dims):
        cross = jnp.einsum(
            "bd,bcd->bc", q[:, lo:hi], cc[:, :, lo:hi],
            preferred_element_type=jnp.float32,
        )
        if metric == "cosine":
            dist = 1.0 - cross
        else:
            d2 = aux_q[:, m : m + 1] + aux_c[:, :, m] - 2.0 * cross
            dist = jnp.sqrt(jnp.maximum(d2, 0.0))
        pres = aux_c[:, :, M + m] * aux_q[:, M + m : M + m + 1]
        sig = jnp.maximum(sw_b[:, m : m + 1], 1e-12)
        contrib = jnp.exp(-dist / sig) * sw_b[:, M + m : M + m + 1]
        total = total + jnp.where(ok, contrib * pres, 0.0)
    return total


@lru_cache(maxsize=None)
def _fusion_all_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("block", "dims", "metric"))
    def f(cl, cat16, aux, sigw, block, dims, metric):
        """Fused ALL-modality candidate scoring (reference fusion loop,
        muon/_core/preproc.py:571-601):

            score[cell, c] = Σ_m  w_m[cell] · exp(−dist_m(cell, cand)/σ_m[cell])

        The candidate gather is ROW-OVERHEAD-bound on this toolchain
        (measured ~1.6-3.4GB/s effective for 60-100B rows vs 800GB/s HBM),
        so the per-modality kernels' 3 separate gathers were the stage cost
        (37s/modality at 1M cells). Here every modality's rep lives in ONE
        concatenated (n_global, ΣD) bf16 table gathered once per block —
        3× fewer row-gathers — and distances come from the norm form
        (f32 norms in ``aux``, one bf16 MXU cross-term per modality slice)
        instead of materializing (block, C, d) diffs.

        cl    (n_pad, C)  global candidate ids (pad −1)
        cat16 (n_pad, ΣD) bf16 concatenated reps (absent/pad rows zero)
        aux   (n_pad, 2M) f32: [|x|²_m | present_m]; cosine stores 1.0 norms
        sigw  (n_pad, 2M) f32: [σ_m | w_m] (σ of absent rows arbitrary>0)
        dims  tuple of (lo, hi) column slices per modality
        """
        n_pad, C = cl.shape
        M = len(dims)
        nb = n_pad // block

        def body(_, i):
            cl_b = jax.lax.dynamic_slice_in_dim(cl, i * block, block, 0)
            ok = cl_b >= 0
            cl_s = jnp.where(ok, cl_b, 0)
            cc = cat16[cl_s]                       # (b, C, ΣD) ONE gather
            aux_c = aux[cl_s]                      # (b, C, 2M)
            q = jax.lax.dynamic_slice_in_dim(cat16, i * block, block, 0)
            aux_q = jax.lax.dynamic_slice_in_dim(aux, i * block, block, 0)
            sw_b = jax.lax.dynamic_slice_in_dim(sigw, i * block, block, 0)

            total = _fusion_block_math(
                jnp, q, cc, aux_q, aux_c, sw_b, ok, dims, metric
            )
            return _, total

        _, acc = jax.lax.scan(body, None, jnp.arange(nb))
        return acc.reshape(n_pad, C)

    return f


@lru_cache(maxsize=None)
def _cand_dedup_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("block",), donate_argnums=(0,))
    def f(cand, block=131072):
        """Per-row dedup + compaction. Rows are independent, so the sort/
        argsort runs over row blocks via lax.scan — one (n, C) sort with
        its temporaries is ~15GB at 1M cells × C=600 (measured HBM
        exhaustion); blocked it peaks at (block, C). The input is donated
        and the output stays PADDED to the block multiple (trimming here
        copied 2.4GB; padding rows are all −1 and downstream kernels mask
        on that anyway)."""
        n, C = cand.shape
        nb = max(1, -(-n // block))
        n_pad = nb * block
        cp = jnp.pad(cand, ((0, n_pad - n), (0, 0)), constant_values=-1)

        def body(_, cb):
            cs = jnp.sort(cb, axis=1)
            dup = jnp.concatenate(
                [
                    jnp.zeros((cb.shape[0], 1), bool),
                    (cs[:, 1:] == cs[:, :-1]) & (cs[:, 1:] >= 0),
                ],
                axis=1,
            )
            cs = jnp.where(dup, -1, cs)
            order = jnp.argsort(cs < 0, axis=1, stable=True)
            compact = jnp.take_along_axis(cs, order, axis=1)
            return _, (compact, (compact >= 0).sum(axis=1).max())

        _, (compact, nv) = jax.lax.scan(
            body, None, cp.reshape(nb, block, C)
        )
        return compact.reshape(n_pad, C), nv.max()

    return f


@lru_cache(maxsize=None)
def _trim_pad_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("n_pad", "maxc"), donate_argnums=(0,))
    def f(cand, n_pad, maxc):
        # dedup pads coarser (131072) than fusion (1024), so this is a
        # pure donated slice — no fill, no second buffer beyond the output
        return cand[:n_pad, :maxc]

    return f


@lru_cache(maxsize=None)
def _final_topk_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("k",))
    def f(scores, cand, k):
        dist = jnp.sqrt(0.5 * (1.0 - scores))
        dist = jnp.where(cand >= 0, dist, jnp.inf)
        neg = -dist
        vals, pos = jax.lax.top_k(neg, k)
        idx = jnp.take_along_axis(cand, pos, axis=1)
        return idx, -vals

    return f


# ---------------------------------------------------------------------------
# the WNN driver
# ---------------------------------------------------------------------------


def wnn_neighbors(
    mdata,
    n_neighbors=None,
    n_bandwidth_neighbors: int = 20,
    n_multineighbors: int = 200,
    neighbor_keys=None,
    metric: str = "euclidean",
    low_memory=None,
    key_added=None,
    weight_key="mod_weight",
    add_weights_to_modalities: bool = False,
    eps: float = 1e-4,
    copy: bool = False,
    random_state=42,
    use_rep=None,
    n_pcs=None,
    mesh=None,
):
    jax, jnp = _jax()
    from .._core.anndata import AnnData
    from .._core.config import current_mesh

    if isinstance(mdata, AnnData):
        # single-modality convenience (scanpy sc.pp.neighbors surface)
        return single_neighbors(
            mdata, n_neighbors=n_neighbors or 15, metric=metric,
            use_rep=use_rep, n_pcs=n_pcs,
            key_added=key_added, random_state=random_state or 0,
            mesh=mesh,
        )
    mesh = current_mesh(mesh)

    mdata = mdata.copy() if copy else mdata
    if neighbor_keys is None:
        modalities = list(mdata.mod.keys())
        neighbor_keys = {}
    else:
        modalities = list(neighbor_keys.keys())
    n_mods = len(modalities)
    n_global = mdata.n_obs

    # -- collect per-modality state ------------------------------------------
    neighbors_params, reps, mod_reps, mod_n_pcs = {}, {}, {}, {}
    mod_neighbors = []
    for mod in modalities:
        nkey = neighbor_keys.get(mod, "neighbors")
        if nkey not in mdata.mod[mod].uns:
            raise ValueError(
                f'Did not find .uns["{nkey}"] for modality "{mod}". '
                f"Run neighbors on all modalities first."
            )
        nparams = mdata.mod[mod].uns[nkey]
        use_rep = nparams["params"].get("use_rep", None)
        n_pcs = nparams["params"].get("n_pcs", None)
        if use_rep == -1:
            use_rep = None
        if n_pcs == -1:
            n_pcs = None
        mod_neighbors.append(nparams["params"].get("n_neighbors", 0))
        neighbors_params[mod] = nparams
        reps[mod] = choose_representation(mdata.mod[mod], use_rep, n_pcs)
        mod_reps[mod] = use_rep if use_rep is not None else -1
        mod_n_pcs[mod] = n_pcs if n_pcs is not None else -1

    if n_neighbors is None:
        valid = [k for k in mod_neighbors if k > 0]
        n_neighbors = int(round(float(np.mean(valid)), 0))

    # global ↔ local index maps
    g2l, present, l2g = {}, {}, {}
    for mod in modalities:
        m = np.asarray(mdata.obsmap[mod], dtype=np.int64)
        present[mod] = m > 0
        g = np.full(n_global, -1, dtype=np.int32)
        g[m > 0] = (m[m > 0] - 1).astype(np.int32)
        g2l[mod] = g
        loc2glob = np.full(mdata.mod[mod].n_obs, -1, dtype=np.int64)
        loc2glob[m[m > 0] - 1] = np.flatnonzero(m > 0)
        l2g[mod] = loc2glob

    from ..utils.profiling import stage

    # -- bandwidths σ and affinity ratios θ -----------------------------------
    # reps and fixed-width neighbor matrices live on DEVICE for the whole
    # bandwidth/theta/candidate phase: at 1M cells each rep is ~160MB and
    # the per-pair re-uploads through the ~40MB/s tunnel used to dominate
    # the stage (325s of the warm 546s WNN at 1M, measured round 3)
    NIs, nnds, sigmas = {}, {}, {}
    rep_dev, NI_dev, nnd_dev, sig_dev = {}, {}, {}, {}

    def _load_mod(mod):
        if mod in NI_dev:
            return
        with stage(f"wnn/upload[{mod}]"):
            dm = mdata.mod[mod].obsp[neighbors_params[mod]["distances_key"]]
            # single_neighbors tags its own output with the fixed-width
            # neighbor matrix (host + device copies) — reuse it instead of
            # rebuilding from CSR and re-uploading ~160MB/mod through the
            # tunnel. nnz guards against in-place edits of the graph.
            tag = getattr(dm, "_muon_tpu_knn", None)
            if (
                tag is not None
                and tag["n"] == mdata.mod[mod].n_obs
                and tag["nnz"] == int(dm.nnz)
            ):
                NIs[mod], nnds[mod] = tag["NI"], tag["nnd"]
                NI_dev[mod] = (
                    tag["NI_dev"]
                    if tag["NI_dev"] is not None
                    else jnp.asarray(tag["NI"])
                )
                nnd_dev[mod] = (
                    tag["nnd_dev"]
                    if tag["nnd_dev"] is not None
                    else jnp.asarray(tag["nnd"])
                )
            else:
                NI, nnd = _neighbor_index_matrix(dm.tocsr())
                NIs[mod], nnds[mod] = NI, nnd
                NI_dev[mod] = jnp.asarray(NI)
                nnd_dev[mod] = jnp.asarray(nnd)
            from .device import dense_to_device

            rep_dev[mod] = dense_to_device(reps[mod], dtype=jnp.float32)

    ratios = np.full((n_global, n_mods), -np.inf, dtype=np.float64)
    for i1, mod1 in enumerate(modalities):
      with stage(f"wnn/bandwidth+theta[{mod1}]"):
        _load_mod(mod1)
        NI = NIs[mod1]
        rep = reps[mod1]
        bbox = float(np.linalg.norm(np.ptp(rep, axis=0), ord=2))
        n_loc = rep.shape[0]
        block = max(32, min(1024, (1 << 26) // max(1, NI.shape[1] ** 2 * 4)))
        block = min(block, n_loc)
        nn_stride = _auto_nn_stride(NI.shape[1])
        with stage(f"wnn/bandwidth[{mod1}]"):
            if mesh is not None:
                from ..parallel.pipeline import sharded_wnn_bandwidth

                sigmas[mod1] = sharded_wnn_bandwidth(
                    NI, rep, mesh,
                    n_bw=min(n_bandwidth_neighbors, max(NI.shape[1], 1)),
                    block=block, nn_stride=nn_stride,
                )
                sig_dev[mod1] = jnp.asarray(sigmas[mod1])
            else:
                sig_dev[mod1] = _bandwidth_fn()(
                    NI_dev[mod1], rep_dev[mod1], float(n_loc), bbox,
                    min(n_bandwidth_neighbors, max(NI.shape[1], 1)), block,
                    nn_stride,
                )
                sigmas[mod1] = np.asarray(sig_dev[mod1])

        # thetas/currtheta are indexed by mod1-LOCAL row (explicit rows1
        # scatter, not prefix slicing) so partially-overlapping or permuted
        # modalities stay aligned (ADVICE r1 #1)
        thetas = np.full((n_loc, max(n_mods - 1, 1)), -np.inf)
        currtheta = np.full(n_loc, -np.inf)
        lasti = 0
        for i2, mod2 in enumerate(modalities):
            # cells present in both modalities, in mod1-local order
            both = present[mod1] & present[mod2]
            rows1 = g2l[mod1][both]          # mod1-local indices
            rows2 = g2l[mod2][both]          # mod2-local indices
            _load_mod(mod2)
            # mod2-local → mod1-local neighbor remap, applied on device
            conv = g2l[mod1][l2g[mod2]].astype(np.int32)
            with stage(f"wnn/theta[{mod1}|{mod2}]"):
                if mesh is not None:
                    from ..parallel.pipeline import sharded_wnn_theta

                    th = sharded_wnn_theta(
                        reps[mod1].astype(np.float32, copy=False),
                        rows1.astype(np.int32),
                        rows2.astype(np.int32),
                        NIs[mod2], conv,
                        nnds[mod1], sigmas[mod1], mesh,
                    )
                else:
                    th = np.asarray(
                        _theta_fn()(
                            rep_dev[mod1],
                            jnp.asarray(rows1.astype(np.int32)),
                            jnp.asarray(rows2.astype(np.int32)),
                            NI_dev[mod2],
                            jnp.asarray(conv),
                            nnd_dev[mod1],
                            sig_dev[mod1],
                        )
                    )
            if i1 == i2:
                currtheta[rows1] = th
            else:
                thetas[rows1, lasti] = th
                lasti += 1
        own_rows_global = np.flatnonzero(present[mod1])
        own_local = g2l[mod1][own_rows_global]
        if n_mods > 1:
            ratios[own_rows_global, i1] = currtheta[own_local] / (
                np.max(thetas[own_local], axis=1) + eps
            )
        else:
            ratios[own_rows_global, i1] = 0.0

    # softmax over modalities
    r = ratios - ratios.max(axis=1, keepdims=True)
    ew = np.exp(r)
    ew[~np.isfinite(ratios)] = 0.0
    weights = ew / np.maximum(ew.sum(axis=1, keepdims=True), 1e-30)

    # -- candidate graph (device-resident: the (n, C) candidate matrix is
    # never downloaded or re-uploaded — at 100k cells it is ~160MB and the
    # tunnel h2d link moves ~50MB/s, which used to dominate the stage) -----
    m_per = n_multineighbors
    # rows pre-padded to the dedup block multiple: donation in
    # _cand_dedup_fn needs input/output shapes to match (a (n, C) input
    # against the padded output silently copied 2.4GB at 1M cells)
    n_dpad = -(-n_global // 131072) * 131072 if n_global > 131072 else n_global
    cand_j = jnp.full((n_dpad, n_mods * m_per), -1, dtype=jnp.int32)
    # fusion ingredients are retained ON DEVICE (bf16) while each rep is
    # still resident, so the scoring table below is assembled by device
    # scatter instead of a 1M×ΣD host build + re-upload (14.4s measured
    # in the 1M e2e, round 5)
    fusion_metric = metric if metric in ("euclidean", "cosine") else "euclidean"
    rep16_dev, sq_dev = {}, {}
    for i, mod in enumerate(modalities):
      with stage(f"wnn/candidates[{mod}]"):
        n_loc_m = reps[mod].shape[0]
        cmetric = neighbors_params[mod]["params"].get("metric", "euclidean")
        k_cand = min(m_per, n_loc_m - 1)
        # candidate pool is 10x oversampled vs the final k: bf16 cross
        # terms are plenty accurate for pool SELECTION and 4x faster.
        # rep_dev reuses the device copy from the bandwidth phase (no
        # re-upload).
        if mesh is not None and cmetric in ("euclidean", "l2"):
            # multi-chip: query rows sharded over "cells"
            from ..parallel.pipeline import sharded_knn

            rep_dev.pop(mod, None)
            _, idx_h = sharded_knn(
                np.asarray(reps[mod], np.float32), mesh, k=k_cand
            )
            idx = jnp.asarray(idx_h)
        else:
            rdev = rep_dev.pop(mod, None)
            if rdev is None:
                from .device import dense_to_device

                rdev = dense_to_device(reps[mod], dtype=jnp.float32)
            # keep the fusion-scoring view of this rep (bf16 + row norms)
            # before the f32 copy is released for HBM headroom
            if mesh is not None:
                pass  # sharded fusion consumes host tables below
            elif fusion_metric == "cosine":
                nrm = jnp.linalg.norm(rdev, axis=1, keepdims=True)
                rep16_dev[mod] = (
                    rdev / jnp.where(nrm == 0, 1.0, nrm)
                ).astype(jnp.bfloat16)
                sq_dev[mod] = jnp.ones((n_loc_m,), jnp.float32)
            else:
                rep16_dev[mod] = rdev.astype(jnp.bfloat16)
                sq_dev[mod] = (rdev * rdev).sum(axis=1)
            idx, _ = knn(rdev, k_cand, metric=cmetric,
                         approx=n_loc_m > 20000, device_out=True)
            del rdev
        NI_dev.pop(mod, None)  # HBM headroom for the (n, 200) pool
        from .device import unregister_dense

        unregister_dense(reps[mod])  # residency tag would pin the rep
        idx = idx[:, 1:]  # drop self (device array)
        l2g_j = jnp.asarray(l2g[mod].astype(np.int32))
        glob = jnp.where(idx >= 0, l2g_j[jnp.where(idx >= 0, idx, 0)], -1)
        cand_j = cand_j.at[
            l2g_j, i * m_per : i * m_per + glob.shape[1]
        ].set(glob)
        del idx, glob  # (1M, 200) int32 buffers — keep HBM headroom

    # dedup + compact per row, all on device (input donated; output stays
    # padded to the dedup block multiple with all−1 rows past n_global)
    dedup = _cand_dedup_fn()
    cand_j, nvalid = dedup(cand_j)
    maxc = max(int(nvalid), n_neighbors + 1)
    # bucket the trim width so downstream kernels compile per 64-bucket
    maxc = min(cand_j.shape[1], -(-maxc // 64) * 64)

    # -- fusion -----------------------------------------------------------------
    # trim + row-pad the candidate matrix ONCE as a donated device slice
    # (the eager trim+pad chain spiked ~9GB at 1M cells — measured OOM),
    # then score every modality in ONE kernel over a concatenated rep
    # table (see _fusion_all_fn: the per-modality gathers were the cost)
    block = min(1024, max(64, n_global))
    n_pad = -(-n_global // block) * block
    cand_p = _trim_pad_fn()(cand_j, n_pad, maxc)
    del cand_j
    with stage("wnn/fusion"):
        Dsum = sum(reps[mod].shape[1] for mod in modalities)
        dims_list, off = [], 0
        for mod in modalities:
            d_m = reps[mod].shape[1]
            dims_list.append((off, off + d_m))
            off += d_m
        kfin = min(n_neighbors + 1, maxc)
        if mesh is not None:
            # multi-chip: candidate rows sharded over "cells", rep table
            # replicated (parallel/pipeline.sharded_wnn_scores shares
            # _fusion_block_math with the single-device kernel below)
            import ml_dtypes

            cat = np.zeros((n_pad, Dsum), np.float32)
            aux = np.zeros((n_pad, 2 * n_mods), np.float32)
            sigw = np.zeros((n_pad, 2 * n_mods), np.float32)
            for i, mod in enumerate(modalities):
                repv = reps[mod]
                off0, off1 = dims_list[i]
                rows = l2g[mod]  # mod-local → global (every entry valid)
                if fusion_metric == "cosine":
                    nrm = np.linalg.norm(repv, axis=1, keepdims=True)
                    repv = repv / np.where(nrm == 0, 1.0, nrm)
                    aux[rows, i] = 1.0
                else:
                    aux[rows, i] = (repv * repv).sum(axis=1)
                cat[rows, off0:off1] = repv
                aux[rows, n_mods + i] = 1.0
                sigw[rows, i] = sigmas[mod]
                sigw[:n_global, n_mods + i] = weights[:, i].astype(np.float32)
            from ..parallel.pipeline import sharded_wnn_scores

            cat16_h = cat.astype(ml_dtypes.bfloat16)
            del cat
            idx_sh, dist_sh = sharded_wnn_scores(
                np.asarray(cand_p)[:n_global], cat16_h[:n_global],
                aux[:n_global], sigw[:n_global], tuple(dims_list),
                mesh, metric=fusion_metric, k=kfin,
            )
            scores_j = None
        else:
            # device-scatter assembly from the bf16 reps kept resident by
            # the candidate phase — no 1M×ΣD host build or re-upload (the
            # bf16-wire upload alone was 14.4s at 1M, round-5 e2e)
            cat16 = jnp.zeros((n_pad, Dsum), jnp.bfloat16)
            aux_j = jnp.zeros((n_pad, 2 * n_mods), jnp.float32)
            sigw_j = jnp.zeros((n_pad, 2 * n_mods), jnp.float32)
            for i, mod in enumerate(modalities):
                off0, off1 = dims_list[i]
                rows_d = jnp.asarray(l2g[mod].astype(np.int32))
                cat16 = cat16.at[rows_d, off0:off1].set(rep16_dev.pop(mod))
                aux_j = aux_j.at[rows_d, i].set(sq_dev.pop(mod))
                aux_j = aux_j.at[rows_d, n_mods + i].set(1.0)
                sigw_j = sigw_j.at[rows_d, i].set(
                    jnp.asarray(sigmas[mod], jnp.float32)
                )
            sigw_j = sigw_j.at[:n_global, n_mods:].set(
                jnp.asarray(weights.astype(np.float32))
            )
            scores_j = _fusion_all_fn()(
                cand_p, cat16, aux_j, sigw_j,
                block, tuple(dims_list), fusion_metric,
            )
            del cat16

    # -- final kNN + connectivities ----------------------------------------------
    stage_final = stage("wnn/finalize")
    stage_final.__enter__()
    if scores_j is None:
        idx_f = np.asarray(idx_sh)
        dist_f = np.asarray(dist_sh, dtype=np.float64)
    else:
        idx_f, dist_f = _final_topk_fn()(scores_j, cand_p, kfin)
        idx_f = np.asarray(idx_f)[:n_global]
        dist_f = np.asarray(dist_f, dtype=np.float64)[:n_global]

    conn = compute_connectivities_umap(idx_f, dist_f, n_global, kfin)
    # direct CSR build: rows arrive in row-major order and candidates are
    # already deduped per row, so the scipy coo→csr constructor's global
    # 20M-entry lexsort is redundant — one (n, k) column argsort per row
    # (invalid slots pushed to the end) builds sorted-indices CSR directly
    # (~3x faster at 1M×20 on one core)
    # INVARIANT (ADVICE r4): this fast path requires per-row-UNIQUE
    # candidate columns — guaranteed upstream by _cand_dedup_fn (the old
    # COO constructor would instead have summed duplicates). Guarded by
    # the adjacent-equal check below, which is O(nk) and free next to the
    # argsort.
    mask = np.isfinite(dist_f) & (idx_f >= 0)
    sort_key = np.where(mask, idx_f, np.iinfo(np.int32).max)
    ordc = np.argsort(sort_key, axis=1, kind="stable")
    idx_s = np.take_along_axis(idx_f, ordc, axis=1)
    dist_s = np.take_along_axis(dist_f, ordc, axis=1)
    mask_s = np.take_along_axis(mask, ordc, axis=1)
    if (
        (idx_s[:, 1:] == idx_s[:, :-1]) & mask_s[:, 1:] & mask_s[:, :-1]
    ).any():
        raise AssertionError(
            "wnn finalize: duplicate candidate columns within a row — "
            "_cand_dedup_fn invariant violated upstream"
        )
    counts = mask_s.sum(axis=1)
    indptr = np.zeros(n_global + 1, np.int64)
    np.cumsum(counts, out=indptr[1:])
    flat_keep = mask_s.ravel()
    dmat = sp.csr_matrix(
        (
            dist_s.ravel()[flat_keep],
            idx_s.ravel()[flat_keep].astype(np.int32, copy=False),
            indptr,
        ),
        shape=(n_global, n_global),
    )

    # -- write back ---------------------------------------------------------------
    for i, mod in enumerate(modalities):
        if weight_key:
            w = weights[present[mod], i]
            if add_weights_to_modalities:
                mdata.mod[mod].obs[weight_key] = w
            else:
                mdata.obs[f"{mod}:{weight_key}"] = np.where(
                    present[mod], weights[:, i], np.nan
                )

    if key_added is None:
        key_added, conns_key, dists_key = "neighbors", "connectivities", "distances"
    else:
        conns_key, dists_key = f"{key_added}_connectivities", f"{key_added}_distances"
    mdata.obsp[dists_key] = dmat
    mdata.obsp[conns_key] = conn
    mdata.uns[key_added] = {
        "connectivities_key": conns_key,
        "distances_key": dists_key,
        "params": {
            "n_neighbors": int(n_neighbors),
            "n_multineighbors": int(n_multineighbors),
            "metric": metric,
            "eps": eps,
            "random_state": random_state,
            "use_rep": mod_reps,
            "n_pcs": mod_n_pcs,
            "method": "umap",
        },
    }
    mdata.update_obs()
    stage_final.__exit__(None, None, None)
    return mdata if copy else None
