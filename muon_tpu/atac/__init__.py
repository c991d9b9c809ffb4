"""ATAC modality module (``from muon_tpu import atac as ac``).

Reference surface: muon/_atac/__init__.py:1-4 (pp/tl/pl/io submodules).
"""

from . import preproc as pp
from . import tools as tl
from . import plot as pl
from . import io
from .io import read_10x_h5, read_10x_mtx, read_snap

__all__ = [
    "pp", "tl", "pl", "io", "read_10x_h5", "read_10x_mtx", "read_snap",
]
