"""muon-tpu: TPU-native multimodal single-cell omics framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of scverse/muon
(reference muon/__init__.py:1-14): the MuData/AnnData container substrate,
multimodal preprocessing (``mu.pp``), tools (``mu.tl``), plotting
(``mu.pl``), and the ATAC (``muon_tpu.atac``) and protein
(``muon_tpu.prot``) modality modules — with all heavy numerics running as
jit-compiled XLA programs and Pallas kernels over device-sharded matrices.
"""

__version__ = "0.1.0"

from ._core.anndata import AnnData, Raw
from ._core.mudata import MuData
from ._core.io import (
    read,
    write,
    read_h5mu,
    read_h5ad,
    write_h5mu,
    write_h5ad,
    read_10x_h5,
    read_10x_mtx,
)
from ._core.config import set_options
from ._core import preproc as pp
from ._core import tools as tl
from ._core import plot as pl
from . import utils

from . import atac
from . import prot
from . import rna

__all__ = [
    "AnnData",
    "MuData",
    "Raw",
    "read",
    "write",
    "read_h5mu",
    "read_h5ad",
    "write_h5mu",
    "write_h5ad",
    "read_10x_h5",
    "read_10x_mtx",
    "set_options",
    "pp",
    "tl",
    "pl",
    "utils",
    "atac",
    "prot",
    "rna",
]
