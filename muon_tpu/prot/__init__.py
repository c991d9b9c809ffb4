"""Protein/CITE-seq modality module (``import muon_tpu.prot as pt``) —
reference muon/_prot/__init__.py:1-2."""

from . import preproc as pp
from .io import read_10x_h5, read_10x_mtx

__all__ = ["pp", "read_10x_h5", "read_10x_mtx"]
