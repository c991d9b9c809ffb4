"""Sparse count matrices on TPU: flat padded-COO layout + XLA segment kernels.

TPUs have no native sparse support (SURVEY §7 "hard parts" #1). The layout
here is a flat, padded coordinate format sorted by row (CSR order), with a
precomputed by-column permutation for transposed products:

    data  (nnz_pad,) f32   — padded entries are 0
    row   (nnz_pad,) i32   — padded entries = n_rows (extra segment)
    col   (nnz_pad,) i32   — padded entries = n_cols
    perm_bycol (nnz_pad,) i32 — permutation that sorts entries by column

Everything the reference does with scipy.sparse diagonal matmuls
(muon/_atac/preproc.py:92-114) becomes elementwise math on the ``data``
vector plus segment reductions — ideal for the VPU, with SpMM feeding the
MXU via skinny dense operands. All kernels are jit-compiled once (cached
via ``lru_cache``); the nnz axis is padded to a static multiple so shapes
never retrace.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple, Optional, Tuple

import numpy as np
from scipy import sparse as sp

__all__ = [
    "DeviceCOO",
    "DeviceBackedCSR",
    "from_scipy",
    "from_backed",
    "to_scipy_data",
    "row_sums",
    "col_sums",
    "spmm",
    "spmm_t",
    "block_layout",
    "tfidf_data",
    "with_col_perm",
    "scale_rows_data",
    "binarize_data",
]


class DeviceCOO(NamedTuple):
    """Device-resident sparse matrix in padded COO (row-major order)."""

    data: object  # jnp (nnz_pad,)
    row: object   # jnp (nnz_pad,) int32
    col: object   # jnp (nnz_pad,) int32
    perm_bycol: object  # jnp (nnz_pad,) int32
    n_rows: int
    n_cols: int
    nnz: int

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_rows, self.n_cols)


@lru_cache(maxsize=1)
def _jax():
    import jax
    import jax.numpy as jnp

    def flatten(x):
        return (x.data, x.row, x.col, x.perm_bycol), (x.n_rows, x.n_cols, x.nnz)

    def unflatten(aux, children):
        return DeviceCOO(*children, *aux)

    jax.tree_util.register_pytree_node(DeviceCOO, flatten, unflatten)
    return jax, jnp


class LazyDeviceCSR(sp.csr_matrix):
    """CSR whose value vector lives on device until someone reads it.

    Structure-preserving transforms (TF-IDF, binarize, CLR) produce new
    values as a device array. Downloading them eagerly costs seconds at
    production scale (the tunneled d2h link moves ~30-50MB/s and 25M f32
    values are 100MB) — and the typical pipeline (tfidf → lsi →
    neighbors) never reads the host values at all, it re-enters the
    device through the residency tag. So ``.data`` materializes lazily:
    the d2h copy runs on first attribute read, and any *assignment* to
    ``.data`` drops the device cache (a mutation guard strictly stronger
    than the identity check used for plain matrices).
    """

    @property
    def data(self):
        d = self.__dict__.get("_data_host")
        if d is None:
            dev = self.__dict__.get("_lazy_dev")
            if dev is not None:
                d = np.asarray(dev)[: self.__dict__["_lazy_nnz"]]
            else:  # pre-construction access from scipy internals
                d = np.empty(0, dtype=np.float32)
            self.__dict__["_data_host"] = d
        return d

    @data.setter
    def data(self, v):
        self.__dict__["_data_host"] = v
        # explicit data replacement invalidates the device cache
        self.__dict__.pop("_lazy_dev", None)
        self.__dict__.pop("_muon_tpu_device", None)

    def materialized(self) -> bool:
        return self.__dict__.get("_data_host") is not None


def from_scipy(X, pad_multiple: int = 8192, dtype=None) -> DeviceCOO:
    from ..utils.profiling import stage

    with stage("sparse/from_scipy"):
        return _from_scipy_impl(X, pad_multiple, dtype)


def _from_scipy_impl(X, pad_multiple: int = 8192, dtype=None) -> DeviceCOO:
    """Upload a scipy sparse matrix into padded device COO.

    If the matrix carries a device-residency tag (attached by
    ``to_scipy_data`` when a transform kept its values on device), the
    cached DeviceCOO is returned without any host→device transfer — so
    pipelines like tfidf → lsi never round-trip 100MB-scale index arrays
    through the (tunneled) host link."""
    jax, jnp = _jax()
    cached = getattr(X, "_muon_tpu_device", None)
    if cached is not None:
        dX, host_ref = cached
        if host_ref is None:
            # lazy matrix: valid as long as .data was never replaced
            # (the setter would have dropped the tag) — do NOT touch
            # X.data here, that would trigger the d2h materialization
            if dX.shape == X.shape:
                return dX
        elif (
            host_ref is X.data
            and dX.shape == X.shape
            and dX.nnz == X.nnz
        ):
            return dX
    X = X.tocsr()
    # The dense-row-block path (block_layout densify) and the transposed
    # segment kernels rely on column indices being sorted within each row
    # (indices_are_sorted=True). scipy CSR does not guarantee this for
    # hand-built (data, indices, indptr) triples — canonicalize here once.
    if not X.has_sorted_indices:
        X.sort_indices()
    n, d = X.shape
    nnz = X.nnz
    pad = max(pad_multiple, ((nnz + pad_multiple - 1) // pad_multiple) * pad_multiple)
    if dtype is None:
        # keep f64 inputs exact when the backend supports it (CPU parity
        # tests); f32 otherwise (TPU production path)
        if X.dtype == np.float64 and jax.config.jax_enable_x64:
            dtype = np.float64
        else:
            dtype = np.float32

    # --- minimize bytes over the (tunneled) host→device link ---
    # values: raw counts are small integers → ship uint8/uint16 and widen
    # on device
    dmax = X.data.max(initial=0)
    dmin = X.data.min(initial=0)
    wire_val = None
    if X.dtype.kind in "iu" or (nnz > 0 and float(dmin) >= 0):
        # integrality probe by cast-and-compare: the narrow cast is needed
        # on success anyway, and comparing it back is ~5x cheaper than the
        # np.allclose(data, round(data)) pass it replaces
        for wt, lim in ((np.uint8, 255), (np.uint16, 65535)):
            if X.dtype.kind in "iu" and dmax >= lim:
                continue
            if dmax < lim:
                v = X.data[:nnz].astype(wt)
                if X.dtype.kind in "iu" or np.array_equal(
                    v, X.data[:nnz]
                ):
                    wire_val = np.zeros(pad, wt)
                    wire_val[:nnz] = v
                break
    if wire_val is None:
        wire_val = np.zeros(pad, dtype)
        wire_val[:nnz] = X.data

    # columns: int16 when the feature axis allows it
    indices = X.indices
    if d < np.iinfo(np.int16).max:
        wire_col = np.full(pad, -1, np.int16)
        wire_col[:nnz] = indices
    else:
        wire_col = np.full(pad, d, np.int32)
        wire_col[:nnz] = indices

    # rows: derived on device from indptr (n+1 ints instead of nnz)
    indptr = np.asarray(X.indptr, np.int32)

    data_j, row_j, col_j = _decode_wire(
        jnp.asarray(wire_val),
        jnp.asarray(wire_col),
        jnp.asarray(indptr),
        jnp.asarray(nnz, jnp.int32),
        n,
        d,
        np.dtype(dtype).name,
        wire_col.dtype == np.int16,
    )
    # block-layout E hint from the host indptr (free here; saves a scalar
    # d2h sync — ~0.3s on the tunnel — if rsvd later builds the layout)
    R_hint = pick_block_rows(n, d)
    nb = max(1, -(-n // R_hint))
    bounds = np.minimum(np.arange(nb + 1, dtype=np.int64) * R_hint, n)
    cnts = (indptr[bounds[1:]].astype(np.int64)
            - indptr[bounds[:-1]].astype(np.int64))
    cnts[-1] += pad - nnz  # pad entries are clamped into the last block
    _cache_put(_epad_hint, (id(row_j), R_hint), int(cnts.max()),
               evict_on=row_j)

    # perm_bycol stays lazy (None): a 25M-element device sort costs more
    # than unsorted transposed segment-sums unless the matrix is reused
    # many times — build it explicitly with with_col_perm() if needed
    return DeviceCOO(data_j, row_j, col_j, None, n, d, nnz)


@lru_cache(maxsize=None)
def _ingest_block_fn():
    jax, jnp = _jax()

    @partial(
        jax.jit,
        static_argnames=("n", "d", "R", "col16"),
        donate_argnums=(0, 1, 2),
    )
    def f(buf_data, buf_row, buf_col, wire_val, wire_col, bounds, bn, r0,
          offset, n, d, R, col16):
        """Decode one row-block (cast values, derive row ids from local
        boundaries) and splice it into the device buffers at `offset`.
        Invalid tail entries become neutral (data 0, row n, col d) so the
        splice never needs a fixup pass."""
        cap = wire_val.shape[0]
        data_b = wire_val.astype(buf_data.dtype)
        col_b = wire_col.astype(jnp.int32)
        if col16:
            col_b = jnp.where(col_b < 0, d, col_b)
        pos = jnp.arange(cap, dtype=jnp.int32)
        bumps = jax.ops.segment_sum(
            jnp.ones((R,), jnp.int32), jnp.minimum(bounds, cap),
            num_segments=cap + 1,
        )[:cap]
        row_b = jnp.cumsum(bumps).astype(jnp.int32) + r0
        valid = pos < bn
        row_b = jnp.where(valid, jnp.minimum(row_b, n - 1), n)
        col_b = jnp.where(valid, col_b, d)
        data_b = jnp.where(valid, data_b, 0)
        buf_data = jax.lax.dynamic_update_slice(buf_data, data_b, (offset,))
        buf_row = jax.lax.dynamic_update_slice(buf_row, row_b, (offset,))
        buf_col = jax.lax.dynamic_update_slice(buf_col, col_b, (offset,))
        return buf_data, buf_row, buf_col

    return f


def from_backed(
    bm, pad_multiple: int = 8192, block_nnz: int = 16 << 20, dtype=None
) -> DeviceCOO:
    """Stream an on-disk CSR (:class:`BackedMatrix` over an h5 group) into
    padded device COO **block by block** — host residency is bounded by
    one block (≈``block_nnz`` entries), never the full matrix. This is the
    out-of-core ingest path for BASELINE config 5 (1M cells × 3 mods); the
    reference's analogue is anndata backed mode + tabix streaming
    (muon/_core/preproc.py:655-668, SURVEY §5 long-axis streaming)."""
    jax, jnp = _jax()
    cached = getattr(bm, "_muon_tpu_device", None)
    if cached is not None and cached[0].shape == tuple(bm.shape):
        return cached[0]
    h5 = bm._h5
    if not getattr(bm, "_sparse", False):
        raise TypeError("from_backed expects a sparse (CSR group) BackedMatrix")
    n, d = bm.shape
    if dtype is None:
        dtype = np.float32
    indptr = h5["indptr"][...].astype(np.int64)
    nnz = int(indptr[-1])

    # row blocks targeting ~block_nnz entries; all padded to one capacity
    # so the ingest kernel compiles once
    blocks = []
    r0 = 0
    while r0 < n:
        r1 = int(np.searchsorted(indptr, indptr[r0] + block_nnz, side="left"))
        r1 = max(r1, r0 + 1)
        r1 = min(r1, n)
        blocks.append((r0, r1))
        r0 = r1
    if not blocks:
        blocks = [(0, 0)]
    cap = max(
        (int(indptr[r1] - indptr[r0]) for r0, r1 in blocks), default=0
    )
    cap = max(pad_multiple, -(-cap // pad_multiple) * pad_multiple)
    R = max(r1 - r0 for r0, r1 in blocks)

    pad_alloc = max(
        pad_multiple, -(-(nnz + cap) // pad_multiple) * pad_multiple
    )
    buf_data = jnp.zeros((pad_alloc,), dtype)
    buf_row = jnp.full((pad_alloc,), n, jnp.int32)
    buf_col = jnp.full((pad_alloc,), d, jnp.int32)

    col16 = d < np.iinfo(np.int16).max
    d_ds, i_ds = h5["data"], h5["indices"]
    ingest = _ingest_block_fn()
    offset = 0
    for r0, r1 in blocks:
        s, e = int(indptr[r0]), int(indptr[r1])
        bn = e - s
        d_np = np.asarray(d_ds[s:e])
        i_np = np.asarray(i_ds[s:e])
        # Canonicalize: third-party h5 files may store unsorted column
        # indices within rows; the block-densify path assumes sortedness.
        if bn > 1:
            drops = np.flatnonzero(np.diff(i_np.astype(np.int64)) < 0) + 1
            if drops.size:
                local_starts = (
                    indptr[r0 + 1 : r1] - indptr[r0]
                ).astype(np.int64)
                if not np.isin(drops, local_starts).all():
                    rowid = np.repeat(
                        np.arange(r1 - r0, dtype=np.int64),
                        np.diff(indptr[r0 : r1 + 1]).astype(np.int64),
                    )
                    order = np.lexsort((i_np, rowid))
                    d_np = d_np[order]
                    i_np = i_np[order]
        # narrow the value wire format when the block is small-int
        wire_val = None
        if d_np.dtype.kind in "iu" or (
            bn > 0 and float(d_np.min(initial=0)) >= 0
        ):
            dmax = d_np.max(initial=0)
            for wt, lim in ((np.uint8, 255), (np.uint16, 65535)):
                if dmax < lim:
                    v = d_np.astype(wt)
                    if d_np.dtype.kind in "iu" or np.array_equal(
                        v.astype(d_np.dtype), d_np
                    ):
                        wire_val = np.zeros(cap, wt)
                        wire_val[:bn] = v
                    break
        if wire_val is None:
            wire_val = np.zeros(cap, dtype)
            wire_val[:bn] = d_np
        if col16:
            wire_col = np.full(cap, -1, np.int16)
        else:
            wire_col = np.full(cap, d, np.int32)
        wire_col[:bn] = i_np
        # local row boundaries of rows r0+1..r1, padded by repeating bn
        bounds = np.full(R, bn, np.int32)
        bounds[: r1 - r0] = (indptr[r0 + 1 : r1 + 1] - indptr[r0]).astype(
            np.int32
        )
        buf_data, buf_row, buf_col = ingest(
            buf_data, buf_row, buf_col,
            jnp.asarray(wire_val), jnp.asarray(wire_col),
            jnp.asarray(bounds),
            jnp.asarray(bn, jnp.int32), jnp.asarray(r0, jnp.int32),
            jnp.asarray(offset, jnp.int32),
            n, d, R, col16,
        )
        offset += bn

    out = DeviceCOO(buf_data, buf_row, buf_col, None, n, d, nnz)
    try:
        bm._muon_tpu_device = (out, None)
    except Exception:
        pass
    return out


def _backed_matrix_cls():
    from .._core.anndata import BackedMatrix

    return BackedMatrix


class DeviceBackedCSR(_backed_matrix_cls()):
    """Sparse matrix whose STRUCTURE lives on disk (HDF5 CSR group) and
    whose VALUES live on device — the output of structure-preserving
    transforms (TF-IDF, binarize) applied to backed matrices. Downstream
    device ops re-enter through the ``_muon_tpu_device`` tag with zero
    host residency; host access (``to_memory``/slicing) reads structure
    from disk and downloads only the needed values. Subclasses
    :class:`BackedMatrix` so container code paths treat it uniformly."""

    def __init__(self, h5group, dcoo: DeviceCOO, shape, nnz):
        self._h5 = h5group
        self.shape = tuple(shape)
        self.nnz = int(nnz)
        self.dtype = np.dtype(np.float32)
        self._sparse = True
        self._muon_tpu_device = (dcoo, None)
        self._indptr = None

    @property
    def ndim(self):
        return 2

    def to_memory(self) -> sp.csr_matrix:
        jax, jnp = _jax()
        vals = np.asarray(self._muon_tpu_device[0].data)[: self.nnz]
        return sp.csr_matrix(
            (vals, self._h5["indices"][...], self._h5["indptr"][...]),
            shape=self.shape,
        )

    def _subset(self, oidx, vidx=None):
        jax, jnp = _jax()
        oidx = np.asarray(oidx, dtype=np.int64)
        oidx = np.where(oidx < 0, oidx + self.shape[0], oidx)
        if len(oidx) >= 0.5 * self.shape[0]:
            M = self.to_memory()[oidx]
        else:
            if self._indptr is None:
                self._indptr = self._h5["indptr"][...].astype(np.int64)
            indptr = self._indptr
            starts, ends = indptr[oidx], indptr[oidx + 1]
            counts = ends - starts
            total = int(counts.sum())
            if total:
                pos = np.concatenate(
                    [np.arange(s, e) for s, e in zip(starts, ends)]
                )
                # one device gather + one d2h instead of many tiny reads
                vals = np.asarray(
                    self._muon_tpu_device[0].data[jnp.asarray(pos)]
                )
                i_ds = self._h5["indices"]
                idx = np.empty(total, dtype=np.int64)
                out_off = 0
                i = 0
                m = len(oidx)
                while i < m:
                    j = i
                    while (
                        j + 1 < m
                        and oidx[j + 1] == oidx[j] + 1
                        and starts[j + 1] == ends[j]
                    ):
                        j += 1
                    s, e = int(starts[i]), int(ends[j])
                    if e > s:
                        idx[out_off : out_off + (e - s)] = i_ds[s:e]
                        out_off += e - s
                    i = j + 1
            else:
                vals = np.empty(0, np.float32)
                idx = np.empty(0, np.int64)
            new_indptr = np.concatenate([[0], np.cumsum(counts)]).astype(
                np.int64
            )
            M = sp.csr_matrix(
                (vals, idx, new_indptr), shape=(len(oidx), self.shape[1])
            )
        full_v = vidx is None or (
            len(vidx) == self.shape[1]
            and np.array_equal(vidx, np.arange(self.shape[1]))
        )
        return M if full_v else M[:, vidx]

def with_col_perm(X: DeviceCOO) -> DeviceCOO:
    """Materialize the by-column permutation (sorted transposed products)."""
    jax, jnp = _jax()
    if X.perm_bycol is not None:
        return X
    return X._replace(perm_bycol=jnp.argsort(X.col, stable=True).astype(jnp.int32))


@lru_cache(maxsize=None)
def _decode_wire_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("n", "d", "dtype", "col16"))
    def f(wire_val, wire_col, indptr, nnz, n, d, dtype, col16):
        pad = wire_val.shape[0]
        data_j = wire_val.astype(dtype)
        col_j = wire_col.astype(jnp.int32)
        if col16:
            col_j = jnp.where(col_j < 0, d, col_j)
        # row id of entry i: scatter +1 at each row boundary (indptr[1:n])
        # then prefix-sum — one cumsum instead of 25M binary searches
        # (searchsorted over the indptr measured ~6× slower on TPU)
        pos = jnp.arange(pad, dtype=jnp.int32)
        bumps = jax.ops.segment_sum(
            jnp.ones((n,), jnp.int32),
            indptr[1:],  # boundaries of rows 1..n (may repeat: empty rows)
            num_segments=pad,
        )
        row_j = jnp.cumsum(bumps).astype(jnp.int32)
        row_j = jnp.where(pos < nnz, jnp.minimum(row_j, n - 1), n)
        return data_j, row_j, col_j

    return f


def _decode_wire(wire_val, wire_col, indptr, nnz, n, d, dtype, col16):
    """One fused XLA program for the on-device COO decode (cast + row
    derivation + column permutation) — eager per-op dispatch through a
    remote/tunneled device link costs more than the math."""
    return _decode_wire_fn()(wire_val, wire_col, indptr, nnz, n, d, dtype, col16)


def to_scipy_data(X_csr, new_data, device_X: Optional[DeviceCOO] = None) -> sp.csr_matrix:
    """Rebuild a scipy CSR with the same sparsity pattern but new values.
    (Structure-preserving transforms — TF-IDF, binarize, CLR — only touch
    the value vector.)

    When ``device_X`` (the source DeviceCOO) is provided and ``new_data``
    is a device array, the result is tagged device-resident: downstream
    ops (lsi, pca, neighbors) reuse the device buffers directly."""
    if device_X is not None and hasattr(new_data, "devices"):
        out = LazyDeviceCSR(X_csr.shape, dtype=np.float32)
        out.indices = X_csr.indices.copy()
        out.indptr = X_csr.indptr.copy()
        out.__dict__["_data_host"] = None
        out.__dict__["_lazy_dev"] = new_data
        out.__dict__["_lazy_nnz"] = X_csr.nnz
        out.__dict__["_muon_tpu_device"] = (
            device_X._replace(data=new_data),
            None,
        )
        return out
    out = X_csr.copy()
    out.data = np.asarray(new_data)[: X_csr.nnz]
    return out


# ---------------------------------------------------------------------------
# jitted kernels (built once, cached)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _row_sums_fn():
    jax, jnp = _jax()

    @jax.jit
    def f(X):
        s = jax.ops.segment_sum(
            X.data, X.row, num_segments=X.n_rows + 1, indices_are_sorted=True
        )
        return s[: X.n_rows]

    return f


@lru_cache(maxsize=None)
def _col_sums_fn():
    jax, jnp = _jax()

    @jax.jit
    def f(X):
        s = jax.ops.segment_sum(X.data, X.col, num_segments=X.n_cols + 1)
        return s[: X.n_cols]

    return f


def row_sums(X: DeviceCOO):
    return _row_sums_fn()(X)


def col_sums(X: DeviceCOO):
    return _col_sums_fn()(X)


def _chunk_count(nnz_pad: int, k: int, budget_bytes: int = 6 << 30) -> int:
    """Number of scan chunks so the (chunk, k) gather stays under budget."""
    per_entry = 4 * max(k, 1)
    chunk = max(8192, budget_bytes // per_entry)
    c = max(1, -(-nnz_pad // chunk))
    while nnz_pad % c:
        c += 1
    return c


@lru_cache(maxsize=None)
def _spmm_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("C", "transpose"))
    def f(X, B, C, transpose):
        chunk = X.data.shape[0] // C
        Bp = jnp.concatenate([B, jnp.zeros((1, B.shape[1]), B.dtype)], axis=0)
        sorted_seg = True
        if transpose:
            if X.perm_bycol is not None:
                perm = X.perm_bycol
                data, seg, gat = X.data[perm], X.col[perm], X.row[perm]
            else:
                data, seg, gat = X.data, X.col, X.row
                sorted_seg = False
            n_out = X.n_cols
        else:
            data, seg, gat = X.data, X.row, X.col
            n_out = X.n_rows

        out_dtype = jnp.promote_types(X.data.dtype, B.dtype)
        # segment ids are sorted (row-major storage / by-column permutation):
        # sorted segment_sum lowers much better on TPU than generic
        # scatter-add. Chunked over nnz so the (chunk, k) gather intermediate
        # stays within a fixed HBM budget.
        if C == 1:
            vals = (data[:, None] * Bp[gat]).astype(out_dtype)
            acc = jax.ops.segment_sum(
                vals, seg, num_segments=n_out + 1,
                indices_are_sorted=sorted_seg,
            )
        else:
            def body(acc, args):
                d, s, g = args
                vals = (d[:, None] * Bp[g]).astype(out_dtype)
                return acc + jax.ops.segment_sum(
                    vals, s, num_segments=n_out + 1,
                    indices_are_sorted=sorted_seg,
                ), None

            acc = jnp.zeros((n_out + 1, B.shape[1]), out_dtype)
            acc, _ = jax.lax.scan(
                body, acc,
                (
                    data.reshape(C, chunk),
                    seg.reshape(C, chunk),
                    gat.reshape(C, chunk),
                ),
            )
        return acc[:n_out]

    return f


def spmm(X: DeviceCOO, B):
    """X @ B — gather rows of B by column id, scale, segment-sum by row id.

    Exact f32 (no densification), chunked over the nnz axis to bound the
    gather intermediate. Replaces scipy CSR matmul at the reference's
    LSI/TF-IDF call sites (muon/_atac/tools.py:53, preproc.py:96)."""
    C = _chunk_count(X.data.shape[0], B.shape[1])
    return _spmm_fn()(X, B, C, False)


def spmm_t(X: DeviceCOO, B):
    """Xᵀ @ B for B of shape (n_rows, k) — same data, column segments."""
    C = _chunk_count(X.data.shape[0], B.shape[1])
    return _spmm_fn()(X, B, C, True)


# ---------------------------------------------------------------------------
# dense-row-block layout: the SpMM workaround for repeated XᵀX products
# ---------------------------------------------------------------------------
#
# Pallas can't express the B[col] vector gather (Mosaic has no VMEM vector
# gather on this image), but the gather can be removed entirely for the
# X^T(X·V) pattern that dominates randomized SVD: scatter each R-row block
# of X into a dense (R, d) buffer (one sorted segment_sum — sequential HBM
# writes), then hit the MXU twice with dense·V and denseᵀ·(dense·V). One
# densify amortizes over BOTH products. Measured on the 100k×25k bench
# matrix (v5e): fused XᵀXB 299ms vs 677ms for the gather spmm_t∘spmm pair.


@lru_cache(maxsize=None)
def _block_max_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("R", "n_blocks"))
    def f(row, R, n_blocks):
        block = jnp.minimum(row // R, n_blocks - 1)
        counts = jax.ops.segment_sum(
            jnp.ones_like(row), block, num_segments=n_blocks,
            indices_are_sorted=True,
        )
        return counts.max()

    return f


@lru_cache(maxsize=None)
def _block_layout_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("R", "d", "n_blocks", "E_pad"))
    def f(data, row, col, R, d, n_blocks, E_pad):
        block = jnp.minimum(row // R, n_blocks - 1)
        counts = jax.ops.segment_sum(
            jnp.ones_like(row), block, num_segments=n_blocks,
            indices_are_sorted=True,
        )
        starts = jnp.cumsum(counts) - counts
        pos = jnp.arange(row.shape[0], dtype=jnp.int32) - starts[block]
        dest = block * E_pad + pos
        # intra-block flat index; pad entries (row=n, col=d, data=0) land on
        # the R*d overflow segment or on a zero-contribution valid slot
        flat_local = jnp.minimum((row - block * R) * d + col, R * d)
        flat = jnp.full((n_blocks * E_pad,), R * d, jnp.int32)
        flat = flat.at[dest].set(
            flat_local, mode="drop", unique_indices=True,
            indices_are_sorted=True,
        )
        vals = jnp.zeros((n_blocks * E_pad,), data.dtype)
        vals = vals.at[dest].set(
            data, mode="drop", unique_indices=True, indices_are_sorted=True,
        )
        return flat.reshape(n_blocks, E_pad), vals.reshape(n_blocks, E_pad)

    return f


def pick_block_rows(n: int, d: int, budget_bytes: int = 1 << 30) -> int:
    """Rows per dense block: (R, d) bf16 buffer capped at ``budget_bytes``."""
    R = 4096
    while R > 8 and R * d * 2 > budget_bytes:
        R //= 2
    while R // 2 >= n and R > 8:
        R //= 2
    return R


# bounded caches: built layouts + host-computed max-block-nnz hints, keyed
# by the identity of the device data buffer (rebuilding costs ~0.6s at 22M
# nnz on the tunnel — ~half of it the scalar d2h sync the hint avoids).
# Entries are evicted when their SOURCE buffer is garbage-collected: a
# cached (flat, vals) layout is GBs of HBM at production nnz, and keeping
# it alive past its matrix measurably OOMs the downstream WNN stage.
_layout_cache: dict = {}
_epad_hint: dict = {}


def _cache_put(cache, key, value, cap=8, evict_on=None):
    if len(cache) >= cap:
        cache.pop(next(iter(cache)))
    cache[key] = value
    if evict_on is not None:
        import weakref

        def _evict(cache=cache, key=key):
            cache.pop(key, None)

        try:
            weakref.finalize(evict_on, _evict)
        except TypeError:  # object doesn't support weakrefs: rely on cap
            pass


def block_layout(X: DeviceCOO, R: int):
    """(n_blocks, E_pad) per-row-block flat indices + values, built ON
    DEVICE from the existing COO buffers (a host loop costs seconds at
    production nnz; this is one scatter with sorted unique indices).

    ``flat`` holds (row%R)*d + col ascending within each block; pad slots
    point at the R*d overflow segment so a sorted segment_sum densify
    drops them for free."""
    jax, jnp = _jax()
    ck = (id(X.row), id(X.data), R)
    hit = _layout_cache.get(ck)
    if hit is not None:
        return hit
    n_blocks = max(1, -(-X.n_rows // R))
    # the E hint is structure-only, so it survives value replacement
    # (tfidf swaps .data but shares .row)
    E = _epad_hint.get((id(X.row), R))
    if E is None:
        E = int(_block_max_fn()(X.row, R, n_blocks))
    # bucket-pad the block-entry axis: coarse 64k buckets at scale, tight
    # power-of-two for test-sized inputs (recompile avoidance either way)
    if E >= 65536:
        E_pad = -(-E // 65536) * 65536
    else:
        E_pad = 1 << max(10, (E - 1).bit_length())
    flat, vals = _block_layout_fn()(
        X.data, X.row, X.col, R=R, d=X.n_cols, n_blocks=n_blocks,
        E_pad=E_pad,
    )
    _cache_put(_layout_cache, ck, (flat, vals), evict_on=X.data)
    return flat, vals


@lru_cache(maxsize=None)
def _tfidf_fn():
    jax, jnp = _jax()

    @partial(jax.jit, static_argnames=("log_tf", "log_idf", "log_tfidf", "scale"))
    def f(X, log_tf, log_idf, log_tfidf, scale):
        rs = jax.ops.segment_sum(
            X.data, X.row, num_segments=X.n_rows + 1, indices_are_sorted=True
        )
        cs = jax.ops.segment_sum(X.data, X.col, num_segments=X.n_cols + 1)
        tf = X.data / rs[X.row]
        tf = jnp.where(jnp.isfinite(tf), tf, 0.0)
        if scale is not None and scale not in (0, 1):
            tf = tf * scale
        if log_tf:
            tf = jnp.log1p(tf)
        idf = X.n_rows / cs
        if log_idf:
            idf = jnp.log1p(idf)
        out = tf * jnp.concatenate([idf, jnp.zeros((1,), idf.dtype)])[X.col]
        if log_tfidf:
            out = jnp.log1p(out)
        return jnp.where(jnp.isfinite(out), out, 0.0)

    return f


def tfidf_data(
    X: DeviceCOO,
    log_tf: bool = True,
    log_idf: bool = True,
    log_tfidf: bool = False,
    scale_factor: float = 1e4,
):
    """Fused TF-IDF on the value vector (semantics of reference
    muon/_atac/preproc.py:85-119)."""
    sf = None if scale_factor is None else float(scale_factor)
    return _tfidf_fn()(X, log_tf, log_idf, log_tfidf, sf)


@lru_cache(maxsize=None)
def _scale_rows_fn():
    jax, jnp = _jax()

    @jax.jit
    def f(X, s):
        sp_ = jnp.concatenate([s, jnp.zeros((1,), s.dtype)])
        return X.data * sp_[X.row]

    return f


def scale_rows_data(X: DeviceCOO, row_scale):
    return _scale_rows_fn()(X, row_scale)


@lru_cache(maxsize=None)
def _binarize_fn():
    jax, jnp = _jax()

    @jax.jit
    def f(X):
        return jnp.where(X.data != 0, 1.0, 0.0).astype(X.data.dtype)

    return f


def binarize_data(X: DeviceCOO):
    return _binarize_fn()(X)
