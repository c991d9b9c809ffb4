"""Native (C++) runtime components, loaded via ctypes.

The fragments engine (fragments.cpp) replaces the reference's pysam/htslib
dependency for bgzf/tabix fragment streaming. The shared library is built
on demand with g++ (no pybind11 in the image); rebuilt automatically when
the source is newer than the binary.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from functools import lru_cache

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD_LOCK = threading.Lock()


def _ensure_built(name: str, libs=()) -> str:
    src = os.path.join(_HERE, f"{name}.cpp")
    lib = os.path.join(_HERE, f"libmuon_{name}.so")
    with _BUILD_LOCK:
        if (
            not os.path.exists(lib)
            or os.path.getmtime(lib) < os.path.getmtime(src)
        ):
            cmd = [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                src, "-o", lib, *[f"-l{x}" for x in libs],
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True, text=True)
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                msg = getattr(e, "stderr", str(e))
                raise RuntimeError(
                    f"failed to build native {name} library: {msg}"
                ) from e
    return lib


@lru_cache(maxsize=1)
def load_fragments_lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(_ensure_built("fragments", libs=("z",)))
    c = ctypes
    lib.frag_open.restype = c.c_void_p
    lib.frag_open.argtypes = [c.c_char_p]
    lib.frag_close.argtypes = [c.c_void_p]
    lib.frag_n_contigs.restype = c.c_int
    lib.frag_n_contigs.argtypes = [c.c_void_p]
    lib.frag_contig_name.restype = c.c_char_p
    lib.frag_contig_name.argtypes = [c.c_void_p, c.c_int]
    lib.frag_set_barcodes.argtypes = [c.c_void_p, c.c_char_p, c.c_int]
    lib.frag_fetch.restype = c.c_long
    lib.frag_fetch.argtypes = [c.c_void_p, c.c_char_p, c.c_long, c.c_long]
    lib.frag_stream.restype = c.c_long
    lib.frag_stream.argtypes = [c.c_void_p, c.c_long]
    lib.frag_fetch_many.restype = c.c_long
    lib.frag_fetch_many.argtypes = [
        c.c_void_p,
        c.POINTER(c.c_int32),   # tids
        c.POINTER(c.c_int64),   # begs
        c.POINTER(c.c_int64),   # ends
        c.c_long,               # n_regions
        c.POINTER(c.c_int64),   # region_offsets out (n_regions+1)
    ]
    for name, ty in [
        ("frag_starts", c.POINTER(c.c_int64)),
        ("frag_ends", c.POINTER(c.c_int64)),
        ("frag_cells", c.POINTER(c.c_int32)),
        ("frag_scores", c.POINTER(c.c_int32)),
        ("frag_name_offsets", c.POINTER(c.c_int32)),
    ]:
        fn = getattr(lib, name)
        fn.restype = ty
        fn.argtypes = [c.c_void_p]
    lib.frag_name_buf.restype = c.c_void_p
    lib.frag_name_buf.argtypes = [c.c_void_p]
    lib.frag_name_buf_len.restype = c.c_long
    lib.frag_name_buf_len.argtypes = [c.c_void_p]
    lib.frag_write_bgzf.restype = c.c_int
    lib.frag_write_bgzf.argtypes = [c.c_char_p, c.c_char_p, c.c_long]
    lib.tabix_build.restype = c.c_int
    lib.tabix_build.argtypes = [c.c_char_p]
    return lib


@lru_cache(maxsize=1)
def load_leiden_lib() -> ctypes.CDLL:
    """Native multiplex Leiden local-moving engine (leiden.cpp) — the
    counterpart of the reference's leidenalg C++ dependency."""
    lib = ctypes.CDLL(_ensure_built("leiden"))
    c = ctypes
    lib.multiplex_local_move.restype = c.c_int64  # number of applied moves
    lib.multiplex_local_move.argtypes = [
        c.c_int64,                     # n
        c.c_int32,                     # n_layers
        c.POINTER(c.c_int64),          # indptr_all
        c.POINTER(c.c_int32),          # indices_all
        c.POINTER(c.c_double),         # data_all
        c.POINTER(c.c_int64),          # payload_off
        c.POINTER(c.c_double),         # deg_all
        c.POINTER(c.c_double),         # two_m
        c.POINTER(c.c_double),         # gamma
        c.POINTER(c.c_double),         # layer_w
        c.POINTER(c.c_int64),          # labels (in/out)
        c.POINTER(c.c_int64),          # restrict or NULL
        c.c_int32,                     # max_passes
        c.c_uint64,                    # seed
        c.c_int32,                     # randomized (refinement mode)
        c.c_double,                    # theta_frac
        c.POINTER(c.c_double),         # total applied gain out (or NULL)
    ]
    lib.csr_aggregate.restype = c.c_void_p
    lib.csr_aggregate.argtypes = [
        c.c_int64, c.c_int64,
        c.POINTER(c.c_int64), c.POINTER(c.c_int32), c.POINTER(c.c_double),
        c.POINTER(c.c_int64),
    ]
    lib.csr_symmetrize.restype = c.c_void_p
    lib.csr_symmetrize.argtypes = [
        c.c_int64,
        c.POINTER(c.c_int64), c.POINTER(c.c_int32), c.POINTER(c.c_double),
        c.c_int32,
    ]
    lib.knn_fuzzy_union.restype = c.c_void_p
    lib.knn_fuzzy_union.argtypes = [
        c.c_int64, c.c_int64,
        c.POINTER(c.c_int32), c.POINTER(c.c_float), c.c_double,
    ]
    lib.agg_nnz.restype = c.c_int64
    lib.agg_nnz.argtypes = [c.c_void_p]
    lib.agg_indptr.restype = c.POINTER(c.c_int64)
    lib.agg_indptr.argtypes = [c.c_void_p]
    lib.agg_indices.restype = c.POINTER(c.c_int32)
    lib.agg_indices.argtypes = [c.c_void_p]
    lib.agg_data.restype = c.POINTER(c.c_double)
    lib.agg_data.argtypes = [c.c_void_p]
    lib.agg_free.argtypes = [c.c_void_p]
    return lib
