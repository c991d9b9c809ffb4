"""ATAC modality module (``muon_tpu.atac as ac``) — reference muon/_atac."""
