"""Fragment-file access: pure-native bgzf/tabix streaming.

Replaces the reference's pysam.TabixFile usage (muon/_atac/tools.py:666-675)
with the in-repo C++ engine (muon_tpu/native/fragments.cpp). Records come
back as numpy arrays — barcodes are resolved to int32 row indices inside
C++, so the per-record Python dict lookups that dominate the reference's
fragment loops (muon/_atac/tools.py:868-878,1052-1058) disappear.
"""

from __future__ import annotations

import ctypes
from typing import Iterable, Optional, Sequence

import numpy as np

from ..native import load_fragments_lib

__all__ = ["TabixFragments", "write_fragments"]


class TabixFragments:
    """Region-indexed reader over a bgzip'd, tabix-indexed fragments file."""

    def __init__(self, path: str, barcodes: Optional[Sequence[str]] = None):
        self._lib = load_fragments_lib()
        self._f = self._lib.frag_open(path.encode())
        if not self._f:
            raise FileNotFoundError(f"could not open fragments file {path}")
        self.path = path
        if barcodes is not None:
            self.set_barcodes(barcodes)

    # -- lifecycle ----------------------------------------------------------

    def close(self):
        if getattr(self, "_f", None):
            self._lib.frag_close(self._f)
            self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    # -- metadata -----------------------------------------------------------

    @property
    def contigs(self):
        n = self._lib.frag_n_contigs(self._f)
        return [
            self._lib.frag_contig_name(self._f, i).decode() for i in range(n)
        ]

    def set_barcodes(self, barcodes: Iterable[str]):
        bs = list(barcodes)
        blob = b"\0".join(s.encode() for s in bs) + b"\0"
        self._lib.frag_set_barcodes(self._f, blob, len(bs))

    # -- record access ------------------------------------------------------

    def _results(self, n: int, names: bool = False):
        if n <= 0:
            out = dict(
                starts=np.empty(0, np.int64),
                ends=np.empty(0, np.int64),
                cells=np.empty(0, np.int32),
                scores=np.empty(0, np.int32),
            )
            if names:
                out["names"] = np.empty(0, dtype=object)
            return out
        as_np = np.ctypeslib.as_array
        out = dict(
            starts=as_np(self._lib.frag_starts(self._f), (n,)).copy(),
            ends=as_np(self._lib.frag_ends(self._f), (n,)).copy(),
            cells=as_np(self._lib.frag_cells(self._f), (n,)).copy(),
            scores=as_np(self._lib.frag_scores(self._f), (n,)).copy(),
        )
        if names:
            offs = as_np(self._lib.frag_name_offsets(self._f), (n + 1,))
            buflen = self._lib.frag_name_buf_len(self._f)
            buf = ctypes.string_at(self._lib.frag_name_buf(self._f), buflen)
            out["names"] = np.array(
                [buf[offs[i]:offs[i + 1]].decode() for i in range(n)],
                dtype=object,
            )
        return out

    def fetch(self, chrom: str, start: int, end: int, names: bool = False):
        """Fetch records overlapping [start, end) on chrom.

        Returns dict of arrays: starts, ends, cells (int32 row ids from the
        barcode dict, −1 if unknown), scores; plus names if requested."""
        n = self._lib.frag_fetch(self._f, chrom.encode(), int(start), int(end))
        if n < 0:
            raise IOError(f"fetch failed on {self.path}")
        return self._results(int(n), names=names)

    def fetch_many(self, chroms, starts, ends, names: bool = False):
        """Batched region fetch: all queries execute inside one native
        call (the reference's per-feature fetch loop is its hot I/O path,
        muon/_atac/tools.py:859-878). Returns the usual arrays plus
        ``region_offsets`` (n_regions+1) delimiting each query's records.
        Unknown contigs yield empty slices."""
        tid_of = {c: i for i, c in enumerate(self.contigs)}
        tids = np.asarray(
            [tid_of.get(str(c), -1) for c in chroms], np.int32
        )
        begs = np.asarray(starts, np.int64)
        fins = np.asarray(ends, np.int64)
        nreg = len(tids)
        offs = np.zeros(nreg + 1, np.int64)
        n = self._lib.frag_fetch_many(
            self._f,
            tids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            begs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            fins.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            nreg,
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if n < 0:
            raise IOError(f"fetch_many failed on {self.path}")
        out = self._results(int(n), names=names)
        out["region_offsets"] = offs
        return out

    def stream(self, n_max: int, names: bool = False):
        """Read the first n_max records of the file (across contigs)."""
        n = self._lib.frag_stream(self._f, int(n_max))
        if n < 0:
            raise IOError(f"stream failed on {self.path}")
        return self._results(int(n), names=names)


def write_fragments(path: str, records) -> str:
    """Write records to a bgzip'd fragments file + tabix index.

    records: iterable of (chrom, start, end, barcode, score) tuples or a
    DataFrame with those 5 columns — must be sorted by (chrom, start).
    Returns path. Enables fragment-file creation without htslib (used for
    test fixtures and pipeline outputs)."""
    lib = load_fragments_lib()
    try:
        import pandas as pd

        if isinstance(records, pd.DataFrame):
            records = records.itertuples(index=False)
    except ImportError:
        pass
    lines = [
        f"{c}\t{int(s)}\t{int(e)}\t{b}\t{int(sc)}\n"
        for (c, s, e, b, sc) in records
    ]
    data = "".join(lines).encode()
    if lib.frag_write_bgzf(path.encode(), data, len(data)) != 0:
        raise IOError(f"failed to write bgzf file {path}")
    if lib.tabix_build(path.encode()) != 0:
        raise IOError(f"failed to build tabix index for {path}")
    return path
