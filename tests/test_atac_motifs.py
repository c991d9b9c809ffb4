"""Motif scanning tests: PWM math, threshold DP, device conv scan, FASTA."""

import numpy as np
import pandas as pd
import pytest

import muon_tpu as mu
from muon_tpu import atac as ac
from muon_tpu.ops import pwm


class TestPWMMath:
    def test_log_odds_formula(self):
        pfm = np.array(
            [[10, 0], [0, 10], [0, 0], [0, 0]], dtype=float
        )  # A then C, strongly
        lo = pwm.pfm_to_log_odds(pfm, pseudocount=0.0001)
        # dominant base ≈ log(1/0.25) = log 4; absent base very negative
        assert abs(lo[0, 0] - np.log(4)) < 0.01
        assert lo[1, 0] < -5
        assert lo.shape == (4, 2)

    def test_threshold_monotone_in_p(self):
        rng = np.random.default_rng(0)
        pfm = rng.integers(0, 30, size=(4, 8)).astype(float)
        lo = pwm.pfm_to_log_odds(pfm)
        t_strict = pwm.threshold_from_p(lo, pvalue=1e-5)
        t_loose = pwm.threshold_from_p(lo, pvalue=1e-2)
        assert t_strict > t_loose

    def test_threshold_matches_bruteforce(self):
        """Exact check against full enumeration for a tiny motif."""
        rng = np.random.default_rng(1)
        pfm = rng.integers(0, 20, size=(4, 5)).astype(float)
        lo = pwm.pfm_to_log_odds(pfm)
        # enumerate all 4^5 sequences
        from itertools import product

        scores = np.array(
            [sum(lo[b, j] for j, b in enumerate(seq)) for seq in product(range(4), repeat=5)]
        )
        for p in (0.01, 0.001):
            t = pwm.threshold_from_p(lo, pvalue=p)
            frac = (scores >= t).mean()
            assert frac <= p + 1e-12
            # t is minimal up to discretization: slightly below t exceeds p
            frac_below = (scores >= t - 0.01).mean()
            assert frac_below > p or frac == frac_below

    def test_scan_scores_match_numpy(self):
        rng = np.random.default_rng(2)
        lo = [pwm.pfm_to_log_odds(rng.integers(0, 20, size=(4, w)).astype(float))
              for w in (4, 4, 6)]
        seqs = ["ACGTACGTAC", "TTTTACGT", "GG"]
        res = pwm.scan_scores(seqs, lo)
        b2i = {c: i for i, c in enumerate("ACGT")}
        for w, (scores, midx) in res.items():
            for si, s in enumerate(seqs):
                for p in range(scores.shape[1]):
                    for mi, m in enumerate(midx):
                        if p + w <= len(s):
                            expect = sum(
                                lo[m][b2i[s[p + j]], j] for j in range(w)
                            )
                            assert abs(scores[si, p, mi] - expect) < 1e-4
                        else:
                            assert scores[si, p, mi] == -np.inf

    def test_unknown_bases_masked(self):
        lo = [np.ones((4, 3))]
        (si, mi, pos, sc) = pwm.find_hits(["ACNGT"], lo, [0.0])
        # windows covering N (positions 0,1,2 overlap index 2) are excluded
        assert list(pos) == []


class TestScanSequences:
    def test_planted_motif_found(self):
        """Plant a strong consensus; the scanner must report it at the right
        position with the built-in JASPAR database."""
        from muon_tpu.atac.motifs import (
            _parse_motif_matrices, _parse_motif_ids, scan_sequences,
        )

        parsed = _parse_motif_matrices()
        # pick a wide motif (≥10 bp) so its consensus can clear p=1e-4
        # (a 6-bp consensus has probability 4⁻⁶ ≈ 2.4e-4 > 1e-4 under flat
        # background — MOODS would find nothing there either)
        meta = _parse_motif_ids()
        name = next(
            n
            for n, m in zip(parsed["motifs"], parsed["matrices"])
            if m.shape[1] >= 12 and n in meta.index
        )
        m_idx = parsed["motifs"].index(name)
        lo = parsed["matrices"][m_idx]
        consensus = "".join("ACGT"[b] for b in np.argmax(lo, axis=0))
        seq = "TTGACTGAC" + consensus + "GACTGACTG"
        hits = scan_sequences(
            [seq],
            matrices=[parsed["matrices"][m_idx]],
            motifs=[name],
            motif_meta=meta,
            pvalue=1e-4,
        )
        assert (hits["motif_id"] == name).any()
        row = hits[hits["motif_id"] == name].iloc[0]
        assert row["position"] == 9
        assert row["tf_gene_name"] == meta.loc[name, "tf_gene_name"]

    def test_full_jaspar_scan_smoke(self):
        from muon_tpu.atac.motifs import scan_sequences

        rng = np.random.default_rng(3)
        seqs = ["".join(rng.choice(list("ACGT"), 80)) for _ in range(5)]
        hits = scan_sequences(seqs, pvalue=1e-3)
        assert set(hits.columns) >= {
            "sequence", "motif_id", "position", "score", "tf_gene_name",
        }
        # with p=1e-3 over 746 motifs × ~70 offsets × 5 seqs, hits exist
        assert len(hits) > 0


class TestFasta:
    @pytest.fixture()
    def fasta(self, tmp_path):
        fa = tmp_path / "genome.fa"
        chr1 = "ACGTACGTACGTACGTACGTACGTACGTAC"  # 30 bases
        chr2 = "GGGGCCCCAAAATTTTGGGGCCCCAAAATTTTGC"  # 34
        with open(fa, "w") as f:
            f.write(">chr1 description\n")
            for i in range(0, len(chr1), 10):
                f.write(chr1[i:i + 10] + "\n")
            f.write(">chr2\n")
            for i in range(0, len(chr2), 10):
                f.write(chr2[i:i + 10] + "\n")
        return str(fa), chr1, chr2

    def test_fetch(self, fasta):
        from muon_tpu.atac._fasta import FastaFile

        path, chr1, chr2 = fasta
        with FastaFile(path) as fa:
            assert fa.references == ["chr1", "chr2"]
            assert fa.fetch("chr1", 0, 30) == chr1
            assert fa.fetch("chr1", 5, 15) == chr1[5:15]
            assert fa.fetch("chr2", 8, 25) == chr2[8:25]
            assert fa.fetch("chr2", 30, 100) == chr2[30:]
            with pytest.raises(KeyError):
                fa.fetch("chrX", 0, 1)

    def test_fai_roundtrip(self, fasta):
        from muon_tpu.atac._fasta import FastaFile
        import os

        path, chr1, _ = fasta
        FastaFile(path).close()  # builds .fai
        assert os.path.exists(path + ".fai")
        with FastaFile(path) as fa:  # now reads .fai
            assert fa.fetch("chr1", 3, 9) == chr1[3:9]

    def test_get_sequences(self, fasta):
        path, chr1, chr2 = fasta
        adata = mu.AnnData(
            X=np.zeros((2, 2), np.float32),
            var=pd.DataFrame(index=["chr1:0-10", "chr2:4-12"]),
        )
        ac.tl.locate_genome(adata, path)
        seqs = ac.tl.get_sequences(adata, bed=None)
        assert seqs == [chr1[0:10], chr2[4:12]]
        # explicit bed string
        seqs2 = ac.tl.get_sequences(adata, bed="chr1\t2\t6")
        assert seqs2 == [chr1[2:6]]
