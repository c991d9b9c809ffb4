"""Motif scanning: JASPAR PWMs scored as device convolutions.

Reimplements the reference's MOODS-based scanning stack
(muon/_atac/tools.py:381-517) with the in-repo PWM kernels
(muon_tpu.ops.pwm) and the vendored JASPAR database
(muon_tpu/atac/_ref/ — 746 PFMs repacked into one npz)."""

from __future__ import annotations

import os
from typing import Iterable, List, Optional, Union

import numpy as np
import pandas as pd

from .._core.anndata import AnnData
from .._core.mudata import MuData
from ..ops import pwm as _pwm

__all__ = ["scan_sequences", "get_sequences"]

_REF_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_ref")


def _parse_motif_ids(filename: Optional[str] = None) -> pd.DataFrame:
    """motif_id → TF gene name table (reference muon/_atac/tools.py:381-389)."""
    if filename is None:
        filename = os.path.join(_REF_DIR, "motif_to_gene.txt")
    motifs = pd.read_csv(filename, sep="\t", header=None)
    motifs.columns = ["motif_id", "tf_gene_name"]
    return motifs.set_index("motif_id")


def _load_jaspar_pfms():
    data = np.load(os.path.join(_REF_DIR, "jaspar_pfms.npz"))
    names = sorted(data.files)
    return names, [data[n] for n in names]


def _parse_motif_matrices(
    files: Optional[List[str]] = None,
    background: Union[int, Iterable] = 4,
    pseudocount: float = 0.0001,
):
    """PFMs → log-odds matrices (reference muon/_atac/tools.py:392-416;
    MOODS pfm_to_log_odds semantics in muon_tpu.ops.pwm)."""
    bg = (
        _pwm.flat_bg(background)
        if not isinstance(background, Iterable)
        else np.asarray(list(background), np.float64)
    )
    if files is None:
        names, pfms = _load_jaspar_pfms()
    else:
        names = [os.path.basename(f)[:-4] if f.endswith(".pfm") else f for f in files]
        pfms = [np.loadtxt(f) for f in files]
    matrices = [_pwm.pfm_to_log_odds(p, bg, pseudocount) for p in pfms]
    return {"motifs": names, "matrices": matrices}


class MotifScanner:
    """Device PWM scanner: matrices + per-motif p-value thresholds
    (replaces MOODS.scan.Scanner, reference muon/_atac/tools.py:419-443)."""

    def __init__(self, matrices, bg, thresholds):
        self.matrices = [np.asarray(m, np.float64) for m in matrices]
        self.bg = bg
        self.thresholds = np.asarray(thresholds, np.float64)

    def scan(self, sequences):
        return _pwm.find_hits(list(sequences), self.matrices, self.thresholds)


def _prepare_motif_scanner(
    matrices=None,
    background: Union[int, Iterable] = 4,
    pvalue: float = 0.0001,
    max_hits: int = 10,
) -> MotifScanner:
    bg = (
        _pwm.flat_bg(background)
        if not isinstance(background, Iterable)
        else np.asarray(list(background), np.float64)
    )
    if matrices is None:
        matrices = _parse_motif_matrices(files=None, background=background)[
            "matrices"
        ]
    thresholds = [_pwm.threshold_from_p(m, bg, pvalue) for m in matrices]
    return MotifScanner(matrices, bg, thresholds)


def scan_sequences(
    sequences,
    motif_scanner: Optional[MotifScanner] = None,
    matrices=None,
    motifs=None,
    motif_meta: Optional[pd.DataFrame] = None,
    background: int = 4,
    pvalue: float = 0.0001,
    max_hits: int = 10,
) -> pd.DataFrame:
    """Scan sequences for motif hits (JASPAR by default); returns a
    DataFrame[sequence, motif_id, position, score] joined with motif
    metadata (reference muon/_atac/tools.py:446-517). All motifs scan in a
    few batched convolutions instead of a per-sequence scanner loop."""
    if motifs is None:
        assert matrices is None, (
            "Both a list of matrices and a corresponding list of motif IDs "
            "should be provided — or none to use the built-in ones, unless "
            "a scanner is provided."
        )

    if motif_scanner is None:
        if matrices is None:
            parsed = _parse_motif_matrices(files=None, background=background)
            motifs = parsed["motifs"]
            matrices = parsed["matrices"]
        else:
            assert motifs is not None, (
                "A list of motif IDs should be provided if building a "
                "scanner from matrices"
            )
        motif_scanner = _prepare_motif_scanner(
            matrices=matrices, background=background, pvalue=pvalue,
            max_hits=max_hits,
        )
        if motif_meta is None:
            motif_meta = _parse_motif_ids()
    else:
        assert motifs is not None, (
            "A list of motif IDs should be provided that corresponds to the "
            "matrices that the motif scanner was built on."
        )

    sequences = list(sequences)
    seq_i, mot_i, pos, score = motif_scanner.scan(sequences)
    matches = pd.DataFrame(
        {
            "sequence": [sequences[i] for i in seq_i],
            "motif_id": [motifs[m] for m in mot_i],
            "position": pos,
            "score": score,
        }
    )
    if motif_meta is not None:
        matches = (
            matches.set_index("motif_id").join(motif_meta, how="left").reset_index()
        )
    return matches


def get_sequences(
    data: Union[AnnData, MuData],
    bed: Optional[str],
    fasta_file: Optional[str] = None,
    bed_file: Optional[str] = None,
) -> List[str]:
    """Extract sequences for BED intervals from an (indexed) genome FASTA
    (reference muon/_atac/tools.py:520-566 — pybedtools replaced by the
    in-repo faidx reader)."""
    if isinstance(data, AnnData):
        adata = data
    elif isinstance(data, MuData) and "atac" in data.mod:
        adata = data.mod["atac"]
    else:
        raise TypeError("Expected AnnData or MuData object with 'atac' modality")

    if "files" not in adata.uns or "genome" not in adata.uns["files"]:
        if fasta_file is not None:
            from .tools import locate_genome

            locate_genome(adata, fasta_file)
        else:
            raise FileNotFoundError(
                "Genome file has to be provided with `fasta_file` or located "
                "using muon_tpu.atac.tl.locate_genome."
            )
    else:
        fasta_file = adata.uns["files"]["genome"]

    if bed_file is not None:
        assert bed is None
        bed = open(bed_file).read()
    elif bed is None:
        # use all ATAC features, expected to be named chrX:NNN-NNN
        bed = "\n".join(
            i.replace(":", "-", 1).replace("-", "\t", 2)
            for i in adata.var.index.values
        )

    from ._fasta import FastaFile

    sequences = []
    with FastaFile(fasta_file) as fa:
        for line in bed.strip().splitlines():
            if not line.strip():
                continue
            parts = line.split("\t")
            chrom, start, end = parts[0], int(parts[1]), int(parts[2])
            sequences.append(fa.fetch(chrom, start, end))
    return sequences
