"""IVF (inverted-file) approximate kNN on TPU.

Brute-force kNN writes the full n×n score matrix through HBM — at 1M cells
that is ~2TB of traffic (>1h) regardless of how fast the MXU computes it.
The IVF index prunes it: device k-means partitions the points, every query
scores only the points in the ``n_probe`` nearest clusters, and candidate
traffic drops by ~n/(n_probe·cluster_size) (~60× at 1M cells, C=1024).

This replaces pynndescent NN-descent (the reference's ANN engine,
muon/_core/preproc.py:24-26) at the scales where the brute-force device
kernel (ops/knn.py) stops being the right tool. The pieces:

* k-means: Lloyd iterations as blocked matmul + argmin + segment-sum —
  all MXU/VPU, no host round-trips inside the loop.
* cluster layout: points sorted by cluster (host argsort of the 4MB
  assignment vector); clusters larger than the pad width L are SPLIT into
  chunks of ≤L on host, so skewed clusters lose no points to padding.
* probing: each query block (one chunk of one home cluster) scores the
  chunks of its home cluster's ``n_probe`` nearest clusters — shared
  probes per block keep the gather perfectly coalesced.
* scoring: bf16 cross-terms on the MXU, f32 norms, hardware
  ``approx_max_k`` selection per block.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

__all__ = ["ivf_knn", "build_ivf_layout"]


@lru_cache(maxsize=1)
def _jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


# k-means partition cache: the multiome pipeline searches the SAME
# representation twice per modality — once for the per-modality neighbor
# graph (k≈20, mu.pp.neighbors) and once for the WNN candidate pool
# (k≈200, reference fusion loop muon/_core/preproc.py:571-601). The
# partition (centroids + assignment) is independent of k/n_probe, and the
# 8 Lloyd iterations are a double-digit-seconds cost at 1M cells. Keyed
# by a VALUE fingerprint (strided device sum), not object identity, so a
# re-upload or dtype-preserving copy of the same matrix still hits.
_PARTITION_CACHE: dict = {}
_PARTITION_CACHE_MAX = 4


def _partition_key(jnp, X, C, iters, seed):
    """Value fingerprint of X for the partition cache.

    ADVICE r4 (medium): a single strided sum could alias after edits in
    unsampled positions. The key now mixes (a) two sample sets at coprime
    strides/offsets, (b) FULL-array min/max/sum reductions (one cheap
    device pass — every element participates, so any single-element edit
    changes the key), and (c) the dtype. All six scalars come back in one
    d2h transfer."""
    n, d = X.shape
    flat = X.ravel()
    sa = flat[:: max(1, (n * d) // 4096)]
    sb = flat[1 :: max(1, (n * d) // 2731)]
    stats = jnp.stack(
        [
            sa.sum(),
            jnp.abs(sa).sum(),
            sb.sum(),
            (sb.astype(jnp.float32) ** 2).sum(),
            flat.min().astype(jnp.float32),
            flat.max().astype(jnp.float32),
            flat.astype(jnp.float32).sum(),
        ]
    )
    vals = tuple(round(float(v), 6) for v in np.asarray(stats))
    return (int(n), int(d), str(X.dtype), int(C), int(iters), int(seed)) + vals


@lru_cache(maxsize=None)
def _kmeans_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("C", "iters", "block"))
    def f(X, init_idx, C, iters, block):
        n, d = X.shape
        cent = X[init_idx]  # (C, d)
        nb = -(-n // block)
        n_pad = nb * block
        Xp = jnp.pad(X, ((0, n_pad - n), (0, 0)))
        valid = (jnp.arange(n_pad) < n)

        def assign(cent):
            csq = (cent * cent).sum(1)
            c16 = cent.astype(jnp.bfloat16)

            def body(_, i):
                q = jax.lax.dynamic_slice(Xp, (i * block, 0), (block, d))
                cross = (q.astype(jnp.bfloat16) @ c16.T).astype(jnp.float32)
                d2 = csq[None, :] - 2.0 * cross  # + qsq (const per row)
                return None, jnp.argmin(d2, axis=1).astype(jnp.int32)

            _, a = jax.lax.scan(body, None, jnp.arange(nb))
            return a.reshape(n_pad)

        def lloyd(_, cent):
            a = assign(cent)
            a_eff = jnp.where(valid, a, C)  # padded rows → dropped segment
            sums = jax.ops.segment_sum(Xp, a_eff, num_segments=C + 1)[:C]
            cnts = jax.ops.segment_sum(
                valid.astype(jnp.float32), a_eff, num_segments=C + 1
            )[:C]
            new = sums / jnp.maximum(cnts[:, None], 1.0)
            # empty clusters keep their previous centroid
            return jnp.where(cnts[:, None] > 0, new, cent)

        cent = jax.lax.fori_loop(0, iters, lloyd, cent)
        return cent, assign(cent)[:n]

    return f


@lru_cache(maxsize=None)
def _search_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("k", "L", "metric"))
    def f(Xs, qids, probe_pos, probe_cnt, k, L, metric):
        """Score every query block against its probed chunks.

        Xs         (n, d)   points SORTED by cluster
        qids       (I, QB)  per-item query positions into Xs (pad −1)
        probe_pos  (I, P)   chunk start positions (pad −1)
        probe_cnt  (I, P)   chunk lengths
        Returns (I, QB, k+1) candidate positions + distances.
        """
        n, d = Xs.shape

        def body(_, it):
            qid, ppos, pcnt = it
            q_ok = qid >= 0
            qs = jnp.where(q_ok, qid, 0)
            q = Xs[qs]                                  # (QB, d)
            # candidate positions: (P, L) grid clamped into range
            grid = jnp.where(ppos[:, None] >= 0, ppos[:, None], 0) + \
                jnp.arange(L, dtype=jnp.int32)[None, :]
            cvalid = (
                (ppos[:, None] >= 0)
                & (jnp.arange(L, dtype=jnp.int32)[None, :] < pcnt[:, None])
            ).reshape(-1)
            cpos = jnp.clip(grid.reshape(-1), 0, n - 1)  # (P*L,)
            c = Xs[cpos]                                 # (P*L, d) f32
            # center LOCALLY before the matmul: probed points are all near
            # the query block, so |x−μ| is on the scale of true neighbor
            # distances and the f32 cross-term never cancels against |x|².
            # (bf16 cross-terms measured recall 0.81 on tight clusters —
            # neighbor gaps sit below bf16 resolution of the local scale;
            # the matmul is not the bottleneck here, gathers are.)
            # For unit vectors (cosine path) 1−cos = ‖q−c‖²/2, so one
            # centered euclidean kernel serves both metrics.
            mu = q.mean(axis=0)
            qc = q - mu
            cc = c - mu
            cross = qc @ cc.T
            d2 = (
                (qc * qc).sum(1)[:, None]
                + (cc * cc).sum(1)[None, :]
                - 2.0 * cross
            )
            d2 = jnp.maximum(d2, 0.0)
            dist = 0.5 * d2 if metric == "cosine" else d2
            # self first (exact-knn convention: col 0 = self, dist 0)
            is_self = cpos[None, :] == qs[:, None]
            dist = jnp.where(is_self, -jnp.inf, dist)
            dist = jnp.where(cvalid[None, :], dist, jnp.inf)
            if dist.shape[1] <= 4096:  # hardware partial-reduce needs width
                vals, sel = jax.lax.top_k(-dist, k + 1)
            else:
                vals, sel = jax.lax.approx_max_k(
                    -dist, k + 1, recall_target=0.95
                )
            pos = cpos[sel]
            return None, (pos, -vals)

        _, (pos, dvals) = jax.lax.scan(
            body, None, (qids, probe_pos, probe_cnt)
        )
        return pos, dvals

    return f


@lru_cache(maxsize=None)
def _scatter_back_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("n", "k1", "sqrt_"))
    def f(pos, dvals, order_j, qflat, n, k1, sqrt_):
        """Map per-work-item results back to original row order ON DEVICE.

        The host version of this (download → numpy fancy-index) moves
        (n, k+1) × 8 bytes over the tunneled d2h link — 1.6GB ≈ 40s per
        modality at 1M cells × k=200 (measured: the WNN candidate stage's
        dominant cost). Device scatter keeps the candidate pool resident
        end-to-end."""
        ok = qflat >= 0
        rows = jnp.where(ok, order_j[jnp.where(ok, qflat, 0)], n)
        dflat = dvals.reshape(-1, k1)
        src_idx = order_j[pos.reshape(-1, k1)]
        # slots that never saw a real candidate carry dist=+inf and clamped
        # garbage positions — mask them to -1 so downstream >=0 masks drop
        # them (self carries the -inf marker and must survive)
        src_idx = jnp.where(dflat == jnp.inf, -1, src_idx)
        idx_full = jnp.full((n + 1, k1), -1, jnp.int32)
        idx_full = idx_full.at[rows].set(src_idx, mode="drop")
        d_full = jnp.zeros((n + 1, k1), jnp.float32)
        d_full = d_full.at[rows].set(dvals.reshape(-1, k1), mode="drop")
        idx_full, d_full = idx_full[:n], d_full[:n]
        d_full = d_full.at[:, 0].set(0.0)
        if sqrt_:
            d_full = d_full.at[:, 1:].set(
                jnp.sqrt(jnp.maximum(d_full[:, 1:], 0.0))
            )
        return idx_full, d_full

    return f


def build_ivf_layout(a_np, cent_np, C, n_probe, block_queries):
    """Host-side IVF layout shared by the single-device and sharded
    searchers: sort points by cluster, split oversize clusters into ≤L
    chunks (never truncated), build per-cluster probe lists from the
    tiny C×C centroid-distance problem, and emit fixed-shape work items
    (one per QB consecutive sorted queries).

    Returns (order, qids (I, QB), probe_pos (I, P), probe_cnt (I, P), L).
    """
    order = np.argsort(a_np, kind="stable").astype(np.int32)
    sizes = np.bincount(a_np, minlength=C)
    offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)

    # chunk width: generous percentile, clusters above it are split (never
    # truncated) into multiple chunks
    L = int(np.quantile(sizes[sizes > 0], 0.9)) if (sizes > 0).any() else 1
    L = max(128, -(-L // 128) * 128)
    chunk_start, chunk_len, chunk_cluster = [], [], []
    for c in range(C):
        s, e = int(offsets[c]), int(offsets[c + 1])
        while s < e:
            chunk_start.append(s)
            chunk_len.append(min(L, e - s))
            chunk_cluster.append(c)
            s += L
    chunk_start = np.asarray(chunk_start, np.int32)
    chunk_len = np.asarray(chunk_len, np.int32)
    chunk_cluster = np.asarray(chunk_cluster, np.int32)

    # probe lists: n_probe nearest clusters per cluster (tiny C×C problem)
    cn = cent_np
    c2 = (cn * cn).sum(1)
    dcc = c2[:, None] + c2[None, :] - 2.0 * cn @ cn.T
    P_eff = min(n_probe, C)
    probe_of = np.argsort(dcc, axis=1)[:, :P_eff]  # (C, P)

    # expand probed clusters into chunks, padded to a fixed width
    chunks_of = [[] for _ in range(C)]
    for ci, cc in enumerate(chunk_cluster):
        chunks_of[cc].append(ci)
    probe_chunks = []
    for c in range(C):
        lst = []
        for pc in probe_of[c]:
            lst.extend(chunks_of[pc])
        probe_chunks.append(lst)
    P_max = max((len(x) for x in probe_chunks), default=1)
    P_max = min(P_max, 4 * P_eff)  # bound extreme skew

    # work items: per chunk, blocks of QB consecutive (sorted) queries
    QB = int(block_queries)
    item_q, item_ppos, item_pcnt = [], [], []
    for ci in range(len(chunk_start)):
        c = int(chunk_cluster[ci])
        pcs = list(probe_chunks[c][:P_max])
        if ci not in pcs:
            # P_max truncation of a heavily skewed home cluster must never
            # drop the query block's OWN chunk — self-in-col-0 is a contract
            # downstream (_scatter_back d[:,0]=0, wnn idx[:,1:]).
            pcs[-1] = ci
        ppos = np.full(P_max, -1, np.int32)
        pcnt = np.zeros(P_max, np.int32)
        ppos[: len(pcs)] = chunk_start[pcs]
        pcnt[: len(pcs)] = chunk_len[pcs]
        s, e = int(chunk_start[ci]), int(chunk_start[ci] + chunk_len[ci])
        for qs in range(s, e, QB):
            row = np.full(QB, -1, np.int32)
            row[: min(QB, e - qs)] = np.arange(qs, min(qs + QB, e))
            item_q.append(row)
            item_ppos.append(ppos)
            item_pcnt.append(pcnt)
    qids = np.stack(item_q)
    probe_pos = np.stack(item_ppos)
    probe_cnt = np.stack(item_pcnt)
    return order, qids, probe_pos, probe_cnt, L


def ivf_knn(
    X,
    k: int,
    metric: str = "euclidean",
    n_clusters=None,
    n_probe: int = 8,
    kmeans_iters: int = 8,
    block_queries: int = 1024,
    seed: int = 0,
    device_out: bool = False,
    use_partition_cache: bool = True,
):
    """Approximate kNN via a device IVF index. Same return convention as
    ops.knn.knn: (indices (n, k+1), dists (n, k+1)), self in column 0.
    device_out=True keeps the result on device (no d2h of the (n, k+1)
    matrices — callers that consume the pool on device skip ~GBs of
    tunnel traffic at 1M cells)."""
    jax, jnp = _jax()
    X = jnp.asarray(X, dtype=jnp.float32)
    n, d = X.shape
    k = min(k, n - 1)
    if metric in ("cosine", "correlation"):
        Z = X - X.mean(axis=1, keepdims=True) if metric == "correlation" else X
        norms = jnp.linalg.norm(Z, axis=1, keepdims=True)
        X = Z / jnp.where(norms == 0, 1.0, norms)
        metric = "cosine"
    elif metric in ("euclidean", "l2", "sqeuclidean"):
        metric = "euclidean" if metric != "sqeuclidean" else "sqeuclidean"
    else:
        raise NotImplementedError(f"metric {metric!r} not supported by IVF")

    C = n_clusters or int(2 ** round(np.log2(max(np.sqrt(n), 16))))
    C = min(C, max(16, n // 64))
    C = max(1, min(C, n))  # rng.choice(n, C, replace=False) needs C <= n
    pkey = _partition_key(jnp, X, C, kmeans_iters, seed)
    hit = _PARTITION_CACHE.pop(pkey, None) if use_partition_cache else None
    if hit is not None:
        cent_np, assign_np = hit
    else:
        rng = np.random.default_rng(seed)
        init_idx = jnp.asarray(
            rng.choice(n, size=C, replace=False).astype(np.int32)
        )
        blk = max(256, min(8192, (1 << 27) // max(C * 4, 1)))
        cent, assign = _kmeans_fn()(X, init_idx, C, kmeans_iters, blk)
        cent_np, assign_np = np.asarray(cent), np.asarray(assign)
    _PARTITION_CACHE[pkey] = (cent_np, assign_np)  # re-insert = LRU touch
    while len(_PARTITION_CACHE) > _PARTITION_CACHE_MAX:
        _PARTITION_CACHE.pop(next(iter(_PARTITION_CACHE)))

    # ---- host: cluster layout + work items (4MB download at 1M cells) ----
    order, qids, probe_pos, probe_cnt, L = build_ivf_layout(
        assign_np, cent_np, C, n_probe, block_queries
    )

    Xs = X[jnp.asarray(order)]
    pos, dvals = _search_fn()(
        Xs,
        jnp.asarray(qids),
        jnp.asarray(probe_pos),
        jnp.asarray(probe_cnt),
        int(k),
        int(L),
        metric,
    )

    if device_out:
        return _scatter_back_fn()(
            pos, dvals, jnp.asarray(order),
            jnp.asarray(qids.reshape(-1)), int(n), int(k + 1),
            metric == "euclidean",
        )

    # scatter item results back to original row order
    pos = np.asarray(pos).reshape(-1, k + 1)
    dvals = np.asarray(dvals).reshape(-1, k + 1)
    qflat = qids.reshape(-1)
    keep = qflat >= 0
    idx_out = np.empty((n, k + 1), np.int32)
    d_out = np.empty((n, k + 1), np.float32)
    orig_rows = order[qflat[keep]]
    src = order[pos[keep]]
    dk = dvals[keep]
    src[dk == np.inf] = -1  # insufficient-candidate slots → -1 (keep -inf self)
    idx_out[orig_rows] = src
    d_out[orig_rows] = dk
    d_out[:, 0] = 0.0  # self
    if metric == "euclidean":
        d_out[:, 1:] = np.sqrt(np.maximum(d_out[:, 1:], 0.0))
    return idx_out, d_out
