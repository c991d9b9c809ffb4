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
    "from_scipy",
    "to_scipy_data",
    "row_sums",
    "col_sums",
    "spmm",
    "spmm_t",
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
    # perm_bycol stays lazy (None): a 25M-element device sort costs more
    # than unsorted transposed segment-sums unless the matrix is reused
    # many times — build it explicitly with with_col_perm() if needed
    return DeviceCOO(data_j, row_j, col_j, None, n, d, nnz)


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
