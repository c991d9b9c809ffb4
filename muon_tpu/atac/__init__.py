"""ATAC modality module (``from muon_tpu import atac as ac``).

Reference surface: muon/_atac/__init__.py:1-4 (pp/tl/pl/io submodules).
"""

from . import preproc as pp
from . import tools as tl
from . import plot as pl
from . import io

__all__ = ["pp", "tl", "pl", "io"]
