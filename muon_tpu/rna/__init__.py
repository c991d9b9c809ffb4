"""RNA modality helpers — reference muon/_rna."""
