"""RNA modality module (``import muon_tpu.rna``) — reference
muon/_rna/__init__.py."""

from . import utils

__all__ = ["utils"]
