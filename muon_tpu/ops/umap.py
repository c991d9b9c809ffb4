"""UMAP embedding optimizer (jit-compiled SGD epochs on device).

Replaces umap-learn's numba SGD (used by the reference via scanpy at
muon/_core/tools.py:1341-1357): the fuzzy graph edges live as flat device
arrays, each epoch is one fused XLA program (attractive updates on due
edges + uniform negative samples), and all epochs run inside a single
``lax.fori_loop`` — no host round-trips during optimization.

Deviation from umap-learn (documented): updates within an epoch are
accumulated per vertex (sorted segment-sums, Hogwild-style collisions
resolved by summation) rather than applied as sequential in-place writes;
clip and schedule semantics match.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
from scipy import sparse as sp

__all__ = ["umap_embed", "find_ab_params", "spectral_init"]


@lru_cache(maxsize=1)
def _jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


def find_ab_params(spread: float = 1.0, min_dist: float = 0.5):
    """Fit the differentiable curve 1/(1+a x^{2b}) (umap-learn parity)."""
    from scipy.optimize import curve_fit

    def curve(x, a, b):
        return 1.0 / (1.0 + a * x ** (2 * b))

    xv = np.linspace(0, spread * 3, 300)
    yv = np.zeros(xv.shape)
    yv[xv < min_dist] = 1.0
    yv[xv >= min_dist] = np.exp(-(xv[xv >= min_dist] - min_dist) / spread)
    params, _ = curve_fit(curve, xv, yv)
    return float(params[0]), float(params[1])


def edge_schedule(graph, n_epochs: int):
    """Shared host-side edge prep for the single-device and sharded
    optimizers: prune edges umap-learn would never sample, derive
    ``epochs_per_sample``, sort by head (so per-epoch accumulations are
    sorted segment-sums), and precompute the expected per-epoch due rate
    per vertex (the repulsion scale — see
    ``_optimize_layout_bucketed_fn``).

    Returns (heads, tails, epochs_per_sample, weights, dc_exp)."""
    n = graph.shape[0]
    graph = sp.coo_matrix(graph)
    w = graph.data.astype(np.float64)
    w[w < w.max() / float(n_epochs)] = 0.0
    keep = w > 0
    heads = graph.row[keep].astype(np.int32)
    tails = graph.col[keep].astype(np.int32)
    w = w[keep]
    eps = (w.max() / w).astype(np.float32)
    if np.any(np.diff(heads) < 0):  # CSR→COO rows arrive pre-sorted
        order = np.argsort(heads, kind="stable")
        heads, tails, eps, w = heads[order], tails[order], eps[order], w[order]
    dc_exp = np.zeros(n, np.float32)
    np.add.at(dc_exp, heads, (1.0 / eps).astype(np.float32))
    return heads, tails, eps, w, dc_exp


@lru_cache(maxsize=None)
def _spectral_membership_fn():
    jax, jnp = _jax()
    from .linalg import _cholqr

    @partial(jax.jit, static_argnames=("m", "n_iter"))
    def f(idx, vals, key, m, n_iter):
        """Leading eigenvectors of S = D^{-1/2}(W+Wᵀ)D^{-1/2} where W is
        the directed (n, k) fuzzy-membership table — subspace iteration
        with CholeskyQR² + a Rayleigh-Ritz step. W·X is a fixed-width
        gather and Wᵀ·X a segment_sum: no sparse wire format, no host
        CSR, everything rides the device copy of the (n, k) table."""
        n, k = idx.shape
        rows = jnp.arange(n, dtype=jnp.int32)[:, None]
        v = jnp.where((idx < 0) | (idx == rows), 0.0, vals)
        safe = jnp.where(idx < 0, 0, idx)
        deg = v.sum(1) + jax.ops.segment_sum(
            v.reshape(-1), safe.reshape(-1), num_segments=n
        )
        s = jnp.where(deg > 0, 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-30)), 0.0)

        def matvec(Q):
            X = Q * s[:, None]
            y1 = (v[..., None] * X[safe]).sum(1)            # W·X
            y2 = jax.ops.segment_sum(                        # Wᵀ·X
                (v[..., None] * X[:, None, :]).reshape(n * k, -1),
                safe.reshape(-1),
                num_segments=n,
            )
            return (y1 + y2) * s[:, None]

        Q = _cholqr(jax.random.normal(key, (n, m), dtype=jnp.float32))
        # S² per iteration (the symmetric rsvd path it replaces also
        # applies the operator twice per subspace iteration): quadratic
        # |λ|-gap amplification — one application per step measurably
        # under-converges the 3-vector seed at n_iter=4
        Q = jax.lax.fori_loop(
            0, n_iter, lambda _, Q: _cholqr(matvec(matvec(Q))), Q
        )
        AQ = matvec(Q)
        lam, V = jnp.linalg.eigh(Q.T @ AQ)                   # ascending
        order = jnp.argsort(-jnp.abs(lam))
        return Q @ V[:, order]

    return f


def _spectral_postprocess(emb, n_components, seed):
    """Shared tail of both spectral paths: drop the trivial top
    eigenvector, expand to the SGD's working scale, add jitter."""
    emb = np.asarray(emb)[:, 1 : n_components + 1]
    expansion = 10.0 / max(np.abs(emb).max(), 1e-12)
    emb = emb * expansion
    rng = np.random.default_rng(seed)
    emb = emb + rng.normal(scale=1e-4, size=emb.shape)
    return emb.astype(np.float32)


def spectral_init(
    graph: sp.csr_matrix,
    n_components: int,
    seed: int = 0,
    membership=None,
    membership_min_nnz: int = 8_000_000,
):
    """Spectral layout from the normalized graph adjacency (TPU-native
    replacement for umap-learn's ARPACK spectral init,
    reference delegation point muon/_core/tools.py:1341-1357).

    With a ``membership`` tag (the fixed-width (n, k) directed membership
    table compute_connectivities_umap attaches to its output) and a graph
    above ``membership_min_nnz``, the seed comes from the symmetrized
    membership operator D^{-1/2}(W+Wᵀ)D^{-1/2} entirely on device — no
    union-CSR wire upload (~29s at 1M×40M-edges through the tunnel) and
    no host Dm12 scaling pass. Below the gate (every test-scale graph)
    the exact union-graph path runs, so small-scale behavior is
    unchanged; at seed scale the two operators differ only by the
    −W∘Wᵀ union term, which perturbs a LAYOUT SEED that 200 SGD epochs
    then rework."""
    n = graph.shape[0]
    if (
        membership is not None
        and membership.get("n") == n
        and membership["idx"].shape == membership["vals"].shape
        and graph.nnz >= membership_min_nnz
    ):
        import jax

        jnp = _jax()[1]
        m = min(n_components + 8, n)
        # 6 S²-iterations measure seed-equivalent to the exact union-rsvd
        # path (cluster-separation 0.174 vs 0.171 on the probe; 4 iters
        # reach only 0.22) and each application is one gather + one
        # segment_sum over the (n, k) table — still ≪ the CSR wire upload
        U = _spectral_membership_fn()(
            jnp.asarray(membership["idx"]),
            jnp.asarray(membership["vals"]),
            jax.random.PRNGKey(seed),
            m,
            6,
        )
        return _spectral_postprocess(
            np.asarray(U[:, : n_components + 1]), n_components, seed
        )

    from .linalg import randomized_svd

    deg = np.asarray(graph.sum(axis=1)).ravel()
    deg[deg == 0] = 1.0
    Dm12 = sp.dia_matrix((1.0 / np.sqrt(deg), 0), shape=(n, n))
    A = (Dm12 @ graph @ Dm12).tocsr()
    k = n_components + 1
    # init-grade accuracy: 4 subspace iterations separate the leading
    # eigenvectors plenty for a LAYOUT seed (200 SGD epochs follow); 12
    # iterations cost ~3x more and measurably change nothing downstream
    U, s, Vt = randomized_svd(
        A.astype(np.float32), k=k, n_iter=4, seed=seed, symmetric=True
    )
    return _spectral_postprocess(U, n_components, seed)


def _row_bounds(heads_sorted, n):
    """Per-vertex [start, end) into a head-SORTED edge list — the index
    pairs for the cumsum-diff segment reduction (see _segsum_sorted)."""
    starts = np.searchsorted(heads_sorted, np.arange(n)).astype(np.int32)
    ends = np.searchsorted(
        heads_sorted, np.arange(n), side="right"
    ).astype(np.int32)
    return starts, ends


def _segsum_sorted(jnp, g, starts, ends):
    """Sorted-segment sum as prefix-sum + boundary difference.

    ``jax.ops.segment_sum`` over a (E, 2) array lowers to a layout that
    fills 2 of 128 lanes — measured 1355ms at E=16M on v5e, vs 62ms for
    cumsum + two boundary gathers (exactly the same result up to f32
    prefix-sum rounding: max abs err 9e-4 on N(0,1) data at 16M rows,
    4e-5 relative — noise against clipped, annealed SGD gradients).
    Requires rows grouped by segment (heads sorted), which the edge
    layout already guarantees."""
    cs = jnp.cumsum(g, axis=0)
    zero = jnp.zeros((1,) + g.shape[1:], cs.dtype)
    cs = jnp.concatenate([zero, cs], axis=0)
    return cs[ends] - cs[starts]


def _build_buckets(heads, tails, epochs_per_sample, n, n_epochs):
    """Bucket edges by ⌊log2(eps)⌋ into FLAT per-bucket edge lists;
    bucket b is processed only every 2^b epochs (see
    `_optimize_layout_bucketed_fn`).

    The max stride is capped at ~n_epochs/12 so the schedule jitter a
    bucket introduces (≤ stride−1 epochs) stays a small fraction of the
    run — at 200 epochs the weakest edges fire ≤15 epochs late, still on
    their own cadence. Below ~2M edges the epoch cost is the negative
    pass + fixed overhead and bucketing buys nothing — one stride-1
    bucket there reproduces the unbucketed kernel exactly.

    Buckets stay FLAT 1-D (sorted-by-head edge lists + sorted
    segment-sums) rather than dense (rows, Dmax) grids: TPU tile layouts
    pad a narrow minor dim to 128 lanes, so a (rows, 8) f32 grid occupies
    16× its logical size in HBM — measured compile-time OOM at 1M cells
    (15.85G requested), while XLA lays (E,)/(E, dims) arrays out without
    padding. Each bucket's edge axis is padded to a coarse power-of-two
    bucket (pad edges: head n−1, eps ∞ → never due, zero gradient) so the
    kernel compiles once per size class, not once per dataset.

    Returns (strides, heads_bs, tails_bs, eps_bs, eons_bs, starts_bs,
    ends_bs) lists of device arrays; starts/ends are the per-vertex row
    bounds for the cumsum-diff reduction (_segsum_sorted)."""
    _, jnp = _jax()
    E = len(heads)
    max_exp = (
        0
        if E < 2_000_000
        else int(
            np.clip(np.floor(np.log2(max(1.0, n_epochs / 12.0))), 0, 5)
        )
    )
    finite = np.isfinite(epochs_per_sample)
    bid = np.full(len(heads), max_exp, np.int64)
    bid[finite] = np.clip(
        np.floor(np.log2(np.maximum(epochs_per_sample[finite], 1.0))),
        0, max_exp,
    ).astype(np.int64)
    strides, heads_bs, tails_bs, eps_bs, eons_bs = [], [], [], [], []
    starts_bs, ends_bs = [], []
    for bi in range(max_exp + 1):
        sel = bid == bi
        if not sel.any() and bi > 0:
            continue
        hh, tt, ee = heads[sel], tails[sel], epochs_per_sample[sel]
        Eb = len(hh)
        grain = max(8192, 1 << max(Eb.bit_length() - 4, 3))
        Eb_pad = -(-max(Eb, 1) // grain) * grain
        if Eb_pad > Eb:
            # heads padded with n-1 keeps the sorted-segment promise valid
            hh = np.pad(hh, (0, Eb_pad - Eb), constant_values=n - 1)
            tt = np.pad(tt, (0, Eb_pad - Eb))
            ee = np.pad(ee, (0, Eb_pad - Eb), constant_values=np.inf)
        e_j = jnp.asarray(ee.astype(np.float32))
        strides.append(1 << bi)
        heads_bs.append(jnp.asarray(hh.astype(np.int32)))
        tails_bs.append(jnp.asarray(tt.astype(np.int32)))
        eps_bs.append(e_j)
        eons_bs.append(e_j)  # eons starts at eps (first due at t=eps)
        ss, ee_b = _row_bounds(hh, n)
        starts_bs.append(jnp.asarray(ss))
        ends_bs.append(jnp.asarray(ee_b))
    return (strides, heads_bs, tails_bs, eps_bs, eons_bs, starts_bs,
            ends_bs)


@lru_cache(maxsize=None)
def _optimize_layout_bucketed_fn():
    """Symmetric-graph SGD epochs over PER-STRIDE flat edge lists.

    umap-learn's due schedule touches each edge only every
    ``epochs_per_sample`` epochs — on real fuzzy graphs the mean due
    fraction is ~0.19 (measured, 50k-cell 12-cluster fixture), so an
    epoch kernel that gathers EVERY edge and masks does ~5× excess HBM
    work. Edges are therefore bucketed by ⌊log2(eps)⌋ (strides 1, 2, 4,
    …, 32) and bucket b is processed only every 2^b epochs inside a
    ``lax.cond`` — a skipped bucket costs nothing. Because stride_b ≤
    min(eps in bucket), at most one due event accrues between
    processings, so every edge still fires exactly on its own schedule
    (≤ stride−1 epochs late, ≤ 31 of 200 for the weakest edges — the
    annealing α moves <16% within that window). Symmetry is preserved
    per bucket: (i,j) and (j,i) share a weight, hence an eps, hence a
    bucket, so the tail-fold (2× head update) stays valid.

    Each bucket is a flat head-sorted edge list (see `_build_buckets`
    for why not a dense grid: TPU tile padding), reduced with a sorted
    segment-sum — the same layout the unbucketed kernel uses.

    Repulsion uses the EXPECTED per-epoch due rate Σ_e 1/eps_e per
    vertex (``dc_exp``, precomputed on host) instead of the realized
    per-epoch due count: the expectation matches umap-learn's
    negative-rounds-per-due-edge exactly, and the realized count is
    BURSTY under bucketing (a whole bucket's dues land on its stride
    epochs) — measured on the 4-cluster fixture, burst-scaled repulsion
    degraded cluster separation 0.20→0.65 while the expectation form
    reproduces the unbucketed 0.20."""
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("n_run", "n_epochs", "neg_rate",
                                       "strides"))
    def f(emb, eons_bs, tails_bs, heads_bs, eps_bs, starts_bs, ends_bs,
          dc_exp, epoch0, n_run, n_epochs, a, b, gamma, init_alpha,
          neg_rate, key, strides):
        n = emb.shape[0]
        B = len(strides)

        def bucket_pass(emb, eons_l, tails_l, heads_l, starts_l, ends_l,
                        eps_l, epoch):
            due = eons_l <= (epoch + 1.0)            # (E_b,)
            h = emb[heads_l]
            t = emb[tails_l]
            diff = h - t
            d2 = (diff * diff).sum(-1)
            grad_coeff = (-2.0 * a * b * d2 ** (b - 1.0)) / (
                a * d2**b + 1.0
            )
            grad_coeff = jnp.where(d2 > 0, grad_coeff, 0.0)
            g = jnp.clip(grad_coeff[..., None] * diff, -4.0, 4.0)
            g = jnp.where(due[..., None], g, 0.0)
            # heads sorted → cumsum-diff reduction (22x the (E,2)
            # segment_sum on v5e, see _segsum_sorted)
            upd = _segsum_sorted(jnp, g, starts_l, ends_l)
            eons_l = jnp.where(due, eons_l + eps_l, eons_l)
            return upd, eons_l

        def epoch_body(i, carry):
            emb, eons_bs, key = carry
            epoch = epoch0 + i
            alpha = init_alpha * (1.0 - epoch / n_epochs)

            upd_h = jnp.zeros_like(emb)
            new_eons = []
            for bi in range(B):
                stride = strides[bi]
                eons_l = eons_bs[bi]

                def run(eons_l=eons_l, bi=bi):
                    return bucket_pass(
                        emb, eons_l, tails_bs[bi], heads_bs[bi],
                        starts_bs[bi], ends_bs[bi], eps_bs[bi], epoch,
                    )

                def skip(eons_l=eons_l):
                    return (jnp.zeros_like(emb), eons_l)

                if stride == 1:
                    u, e_ = run()
                else:
                    u, e_ = jax.lax.cond(
                        jnp.asarray(epoch, jnp.int32) % stride == 0,
                        run, skip,
                    )
                upd_h = upd_h + u
                new_eons.append(e_)
            dc = dc_exp

            key, sub = jax.random.split(key)
            negs = jax.random.randint(sub, (n, neg_rate), 0, n)
            vneg = emb[negs.reshape(-1)].reshape(n, neg_rate, -1)
            diffn = emb[:, None, :] - vneg
            d2n = (diffn * diffn).sum(-1)
            coeff = (2.0 * gamma * b) / (
                (0.001 + d2n) * (a * d2n**b + 1.0)
            )
            gn = jnp.where(
                d2n[..., None] > 0,
                jnp.clip(coeff[..., None] * diffn, -4.0, 4.0),
                4.0,
            )
            self_hit = negs == jnp.arange(n, dtype=negs.dtype)[:, None]
            gn = jnp.where(self_hit[..., None], 0.0, gn)
            upd_neg = gn.sum(axis=1) * dc[:, None]

            # symmetric fold: tail update ≡ head update
            emb = emb + alpha * (2.0 * upd_h + upd_neg)
            return (emb, tuple(new_eons), key)

        return jax.lax.fori_loop(
            0, n_run, epoch_body, (emb, eons_bs, key)
        )

    return f


@lru_cache(maxsize=None)
def _optimize_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("n_run", "n_epochs", "neg_rate",
                                       "move_other", "symmetric"))
    def f(emb, eons, heads, tails, epochs_per_sample, hstarts, hends,
          tstarts, tends, epoch0, n_run, n_epochs, a, b, gamma,
          init_alpha, neg_rate, key, move_other, symmetric, tsort):
        """One chunk of SGD epochs.

        Edges arrive PRE-SORTED BY HEAD, so the attractive accumulation is
        a direct sorted segment-sum — no per-epoch permutation gather.
        TPU scatter-add over millions of indices is the slow path, sorted
        segment reduction the fast one (same trade as ops/sparse SpMM).

        For a SYMMETRIC edge list (fuzzy simplicial sets are symmetric by
        construction) the tail update is algebraically the head update:
        g(j→i) = −g(i→j) with identical schedules, so
        Σ_{tail=v} −g(e) = Σ_{head=v} g(e). The whole tail path (one
        random (E,dim) gather + one segment-sum per epoch) collapses into
        doubling the head update. The asymmetric fallback keeps the
        explicit tail-sorted pass.

        Negative sampling is VERTEX-pooled (documented deviation from
        umap-learn's per-edge draws): each vertex draws neg_rate uniform
        negatives per epoch, and the repulsive gradient is scaled by that
        vertex's number of due edges — same expectation as umap-learn's
        per-(due-edge × neg_rate) scheme, but the gather volume drops from
        n_edges×neg_rate (~15M rows at 100k cells) to n×neg_rate (~0.5M),
        which was the dominating cost of an epoch.
        """
        n = emb.shape[0]

        def epoch_body(i, carry):
            emb, eons, key = carry
            epoch = epoch0 + i
            alpha = init_alpha * (1.0 - epoch / n_epochs)
            due = eons <= (epoch + 1.0)

            h = emb[heads]
            t = emb[tails]
            diff = h - t
            d2 = (diff * diff).sum(-1)
            # attractive gradient
            grad_coeff = (-2.0 * a * b * d2 ** (b - 1.0)) / (
                a * d2**b + 1.0
            )
            grad_coeff = jnp.where(d2 > 0, grad_coeff, 0.0)
            g = jnp.clip(grad_coeff[:, None] * diff, -4.0, 4.0)
            g = jnp.where(due[:, None], g, 0.0)

            # heads sorted → cumsum-diff reductions (see _segsum_sorted)
            upd_h = _segsum_sorted(jnp, g, hstarts, hends)

            # per-vertex due-edge count (how many negative-sample rounds
            # this vertex would have run in umap-learn's per-edge scheme).
            # int32 prefix sum: exact at any edge count, unlike f32 cumsum
            # which loses integer precision past 2^24 (~16.8M) cumulative
            # edges (ADVICE r4)
            dc = _segsum_sorted(
                jnp, due.astype(jnp.int32), hstarts, hends
            ).astype(emb.dtype)
            key, sub = jax.random.split(key)
            negs = jax.random.randint(sub, (n, neg_rate), 0, n)
            # flatten: a 2D-indexed gather from a narrow table lowered to
            # a ~40× slower path on this toolchain (12.5s vs 0.3s for the
            # same 5M rows, measured)
            vneg = emb[negs.reshape(-1)].reshape(n, neg_rate, -1)
            diffn = emb[:, None, :] - vneg
            d2n = (diffn * diffn).sum(-1)           # (n, R)
            coeff = (2.0 * gamma * b) / (
                (0.001 + d2n) * (a * d2n**b + 1.0)
            )
            gn = jnp.where(
                d2n[..., None] > 0,
                jnp.clip(coeff[..., None] * diffn, -4.0, 4.0),
                4.0,
            )
            self_hit = negs == jnp.arange(n, dtype=negs.dtype)[:, None]
            gn = jnp.where(self_hit[..., None], 0.0, gn)
            upd_neg = gn.sum(axis=1) * dc[:, None]

            if move_other and symmetric:
                emb = emb + alpha * (2.0 * upd_h + upd_neg)
            elif move_other:
                upd_t = _segsum_sorted(jnp, g[tsort], tstarts, tends)
                emb = emb + alpha * (upd_h + upd_neg) - alpha * upd_t
            else:
                emb = emb + alpha * (upd_h + upd_neg)

            eons = jnp.where(due, eons + epochs_per_sample, eons)
            return (emb, eons, key)

        return jax.lax.fori_loop(
            0, n_run, epoch_body, (emb, eons, key)
        )

    return f


def umap_embed(
    graph: sp.csr_matrix,
    n_components: int = 2,
    n_epochs=None,
    init="spectral",
    min_dist: float = 0.5,
    spread: float = 1.0,
    alpha: float = 1.0,
    gamma: float = 1.0,
    negative_sample_rate: int = 5,
    a=None,
    b=None,
    random_state: int = 42,
    assume_symmetric=None,
):
    """Optimize a low-dimensional embedding of a fuzzy simplicial graph.

    ``assume_symmetric=True`` skips the O(nnz·log) scipy ``Gk − Gkᵀ``
    probe — fuzzy-union connectivities (ops/fuzzy) are symmetric by
    construction, and the probe costs ~10-15s at 40M edges on one core."""
    jax, jnp = _jax()
    from ..utils.profiling import stage

    n = graph.shape[0]
    # capture the membership tag BEFORE the tocoo() rebind below drops it
    # (round-5 regression: the 1M e2e silently fell back to the union-CSR
    # spectral path because getattr ran on the COO copy)
    membership_tag = getattr(graph, "_muon_tpu_membership", None)
    graph = graph.tocoo()
    if a is None or b is None:
        a, b = find_ab_params(spread, min_dist)
    if n_epochs is None:
        n_epochs = 500 if n <= 10000 else 200

    # umap-learn edge pruning + head-sort + expected due rate (shared
    # with the sharded optimizer, parallel/pipeline.sharded_umap_embed)
    heads, tails, epochs_per_sample, w, dc_exp_np = edge_schedule(
        graph, n_epochs
    )

    # symmetric edge list (fuzzy simplicial sets are; pruning preserves
    # it) → the optimizer can fold the tail pass into the head pass
    if assume_symmetric is None:
        Gk = sp.csr_matrix(
            (w, (heads, tails)), shape=(n, n)
        )
        diffG = Gk - Gk.T
        symmetric = bool(np.abs(diffG.data).max(initial=0.0) < 1e-12)
    else:
        symmetric = bool(assume_symmetric)

    # pad the edge axis to a coarse bucket (1/16 granularity) so the epoch
    # kernel compiles once per size class instead of once per dataset —
    # per-shape recompiles cost 10-60s on a tunneled TPU (CLAUDE.md).
    # Padded edges have eons = +inf (never due): zero gradient, zero
    # due-count, and head 0 accumulates only zeros.
    E = len(heads)
    bucket = max(8192, 1 << max(E.bit_length() - 4, 3))
    E_pad = -(-max(E, 1) // bucket) * bucket
    if E_pad > E:
        # heads padded with n-1 to keep the sorted-segment promise valid
        heads = np.pad(heads, (0, E_pad - E), constant_values=n - 1)
        tails = np.pad(tails, (0, E_pad - E))
        epochs_per_sample = np.pad(
            epochs_per_sample, (0, E_pad - E), constant_values=np.inf
        )

    if isinstance(init, np.ndarray):
        emb = np.asarray(init, dtype=np.float32)
    elif init == "random":
        rng = np.random.default_rng(random_state)
        emb = rng.uniform(-10, 10, size=(n, n_components)).astype(np.float32)
    else:
        with stage("umap/spectral_init"):
            emb = spectral_init(
                sp.csr_matrix(graph), n_components,
                seed=random_state if isinstance(random_state, int) else 0,
                membership=membership_tag,
            )

    key = jax.random.PRNGKey(random_state if isinstance(random_state, int) else 0)
    # epochs run in chunks: one multi-minute XLA program can trip the TPU
    # worker watchdog (measured: 25-epoch chunks at 1M cells / 40M edges
    # CRASHED the worker, not a graceful OOM), and chunking costs only a
    # dispatch per chunk.
    E_eff = max(1, len(heads))

    if symmetric:
        # PER-STRIDE flat edge lists (see _optimize_layout_bucketed_fn):
        # edges bucketed by ⌊log2(eps)⌋ so rarely-due edges are only
        # gathered on their stride epochs.
        stage_build = stage("umap/edge_layout(host)")
        stage_build.__enter__()
        (strides, heads_bs, tails_bs, eps_bs, eons_bs, starts_bs,
         ends_bs) = _build_buckets(
            heads, tails, epochs_per_sample, n, n_epochs
        )
        # expected per-epoch due rate per vertex — the repulsion scale
        # (see _optimize_layout_bucketed_fn docstring)
        dc_exp_j = jnp.asarray(dc_exp_np)
        f = _optimize_layout_bucketed_fn()
        state = (jnp.asarray(emb), tuple(eons_bs), key)
        heads_bs, tails_bs, eps_bs = (
            tuple(heads_bs), tuple(tails_bs), tuple(eps_bs)
        )
        starts_bs, ends_bs = tuple(starts_bs), tuple(ends_bs)
        stage_build.__exit__(None, None, None)
        chunk = max(1, min(25, int(3.0e8 // E_eff)))
        with stage(f"umap/sgd_{n_epochs}epochs"):
            for e0 in range(0, int(n_epochs), chunk):
                n_run = min(chunk, int(n_epochs) - e0)
                state = f(
                    state[0], state[1], tails_bs, heads_bs, eps_bs,
                    starts_bs, ends_bs, dc_exp_j, float(e0), int(n_run),
                    int(n_epochs), float(a), float(b), float(gamma),
                    float(alpha), int(negative_sample_rate), state[2],
                    tuple(strides),
                )
        with stage("umap/download"):
            return np.asarray(state[0])

    # asymmetric fallback: narrow edge-list kernel with an explicit
    # tail-sorted pass
    f = _optimize_fn()
    eps = jnp.asarray(epochs_per_sample)
    state = (jnp.asarray(emb), eps, key)
    heads_j, tails_j = jnp.asarray(heads), jnp.asarray(tails)
    hs, he = _row_bounds(heads, n)
    tsort = np.argsort(tails, kind="stable")
    ts, te = _row_bounds(tails[tsort], n)
    tsort_j = jnp.asarray(tsort.astype(np.int32))
    hs_j, he_j = jnp.asarray(hs), jnp.asarray(he)
    ts_j, te_j = jnp.asarray(ts), jnp.asarray(te)
    chunk = max(1, min(25, int(1.2e8 // E_eff)))
    for e0 in range(0, int(n_epochs), chunk):
        n_run = min(chunk, int(n_epochs) - e0)
        state = f(
            state[0], state[1], heads_j, tails_j, eps, hs_j, he_j,
            ts_j, te_j, float(e0), int(n_run), int(n_epochs), float(a),
            float(b), float(gamma), float(alpha),
            int(negative_sample_rate), state[2], True, symmetric, tsort_j,
        )
    return np.asarray(state[0])
