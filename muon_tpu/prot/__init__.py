"""Protein/CITE-seq modality module (``muon_tpu.prot as pt``) — reference muon/_prot."""
