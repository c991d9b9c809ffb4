"""Fragments subsystem tests: native bgzf/tabix engine + fragment tools.

The reference has no tests for these paths (muon/_atac/tools.py:824 "TODO:
write tests"); here every tool is validated against brute-force numpy
recomputation on synthetic fragment files written by the in-repo writer.
"""

import numpy as np
import pandas as pd
import pytest

import muon_tpu as mu
from muon_tpu import atac as ac
from muon_tpu.atac.fragments import TabixFragments, write_fragments

N_CELLS = 40
CHROMS = ["chr1", "chr2"]


@pytest.fixture(scope="module")
def frag_path(tmp_path_factory):
    """Synthetic sorted fragments file: ~20k fragments over 2 chroms,
    barcodes BC0..BC39 plus some unknown barcodes."""
    rng = np.random.default_rng(11)
    recs = []
    for chrom in CHROMS:
        starts = np.sort(rng.integers(0, 500_000, size=10_000))
        for s in starts:
            length = int(rng.choice([80, 120, 200, 260, 350]))
            bc = (
                f"BC{rng.integers(0, N_CELLS)}"
                if rng.random() > 0.05
                else f"UNKNOWN{rng.integers(5)}"
            )
            recs.append((chrom, int(s), int(s) + length, bc, int(rng.integers(1, 4))))
    path = str(tmp_path_factory.mktemp("frags") / "atac_fragments.tsv.gz")
    write_fragments(path, recs)
    return path, recs


@pytest.fixture()
def atac_adata(frag_path):
    path, _ = frag_path
    rng = np.random.default_rng(0)
    adata = mu.AnnData(
        X=rng.poisson(1.0, size=(N_CELLS, 10)).astype(np.float32),
        obs=pd.DataFrame(index=[f"BC{i}" for i in range(N_CELLS)]),
    )
    ac.tl.locate_fragments(adata, path)
    return adata


class TestEngine:
    def test_fetch_matches_bruteforce(self, frag_path):
        path, recs = frag_path
        tf = TabixFragments(path)
        for chrom, beg, end in [
            ("chr1", 100_000, 150_000),
            ("chr2", 0, 1_000),
            ("chr1", 499_000, 600_000),
        ]:
            expect = sorted(
                (s, e, b, sc)
                for (c, s, e, b, sc) in recs
                if c == chrom and s < end and e > beg
            )
            got = tf.fetch(chrom, beg, end, names=True)
            assert len(got["starts"]) == len(expect)
            got_t = sorted(
                zip(
                    got["starts"].tolist(),
                    got["ends"].tolist(),
                    got["names"].tolist(),
                    got["scores"].tolist(),
                )
            )
            assert got_t == expect
        tf.close()

    def test_contigs_and_unknown(self, frag_path):
        path, _ = frag_path
        with TabixFragments(path) as tf:
            assert tf.contigs == CHROMS
            assert len(tf.fetch("chrMT", 0, 1000)["starts"]) == 0

    def test_barcode_mapping(self, frag_path):
        path, recs = frag_path
        with TabixFragments(path, barcodes=[f"BC{i}" for i in range(N_CELLS)]) as tf:
            got = tf.fetch("chr1", 0, 50_000, names=True)
            for c, name in zip(got["cells"], got["names"]):
                if name.startswith("BC"):
                    assert c == int(name[2:])
                else:
                    assert c == -1

    def test_stream(self, frag_path):
        path, recs = frag_path
        with TabixFragments(path) as tf:
            got = tf.stream(500, names=True)
            assert len(got["starts"]) == 500
            expect = recs[:500]
            assert got["starts"].tolist() == [r[1] for r in expect]
            assert got["names"].tolist() == [r[3] for r in expect]
            # more than the file holds → everything
            got_all = tf.stream(10**9)
            assert len(got_all["starts"]) == len(recs)


class TestLocate:
    def test_locate_file_missing(self, atac_adata):
        with pytest.raises(FileNotFoundError):
            ac.tl.locate_file(atac_adata, "fragments", "/nonexistent/file.gz")

    def test_locate_fragments_registers(self, atac_adata, frag_path):
        assert atac_adata.uns["files"]["fragments"] == frag_path[0]

    def test_locate_genome(self, atac_adata, tmp_path):
        fa = tmp_path / "genome.fa"
        fa.write_text(">chr1\nACGT\n")
        ac.tl.locate_genome(atac_adata, str(fa))
        assert atac_adata.uns["files"]["genome"] == str(fa)


class TestCountFragments:
    def test_counts_match_bruteforce(self, atac_adata, frag_path):
        _, recs = frag_path
        features = pd.DataFrame(
            {
                "Chromosome": ["chr1", "chr1", "chr2"],
                "Start": [10_000, 200_000, 50_000],
                "End": [20_000, 260_000, 90_000],
            }
        )
        with pytest.warns(FutureWarning):
            out = ac.tl.count_fragments_features(
                atac_adata, features, extend_upstream=0, extend_downstream=0
            )
        assert out.shape == (N_CELLS, 3)
        X = np.asarray(out.X.todense())
        for fi, f in features.iterrows():
            expect = np.zeros(N_CELLS)
            for (c, s, e, b, sc) in recs:
                if (
                    c == f.Chromosome
                    and s < f.End
                    and e > f.Start
                    and b.startswith("BC")
                ):
                    expect[int(b[2:])] += sc
            np.testing.assert_array_equal(X[:, fi], expect)

    def test_count_fragments_not_reads(self, atac_adata, frag_path):
        _, recs = frag_path
        features = pd.DataFrame(
            {"Chromosome": ["chr1"], "Start": [10_000], "End": [20_000]}
        )
        out = ac.tl.count_fragments_features(
            atac_adata, features, extend_upstream=0, extend_downstream=0,
            count_reads=False,
        )
        X = np.asarray(out.X.todense())
        expect = np.zeros(N_CELLS)
        for (c, s, e, b, sc) in recs:
            if c == "chr1" and s < 20_000 and e > 10_000 and b.startswith("BC"):
                expect[int(b[2:])] += 1
        np.testing.assert_array_equal(X[:, 0], expect)

    def test_stranded_extension(self, atac_adata):
        features = pd.DataFrame(
            {
                "Chromosome": ["chr1", "chr1"],
                "Start": [100_000, 100_000],
                "End": [101_000, 101_000],
                "Strand": ["+", "-"],
            }
        )
        with pytest.warns(FutureWarning):
            out = ac.tl.count_fragments_features(
                atac_adata, features, stranded=True,
                extend_upstream=2000, extend_downstream=0,
            )
        Xp = np.asarray(out.X.todense())
        # + feature extends [98k, 101k), − extends [100k, 103k): totals differ
        # from each other unless fragments are symmetric (vanishingly unlikely)
        assert Xp[:, 0].sum() != Xp[:, 1].sum()

    def test_requires_features(self, atac_adata):
        with pytest.raises(ValueError):
            ac.tl.count_fragments_features(atac_adata, None)

    def test_requires_located_fragments(self):
        adata = mu.AnnData(X=np.zeros((3, 2), np.float32))
        features = pd.DataFrame(
            {"Chromosome": ["chr1"], "Start": [0], "End": [10]}
        )
        with pytest.raises(KeyError):
            ac.tl.count_fragments_features(adata, features)


class TestTSS:
    def test_pileup_matches_bruteforce(self, atac_adata, frag_path):
        _, recs = frag_path
        features = pd.DataFrame(
            {
                "Chromosome": ["chr1", "chr2"],
                "Start": [100_000, 200_000],
                "End": [100_500, 200_500],
            }
        )
        up, down = 1000, 1000
        tss = ac.tl.tss_enrichment(
            atac_adata, features, extend_upstream=up, extend_downstream=down,
            return_tss=True,
        )
        n_pos = up + down + 1
        assert tss.shape == (N_CELLS, n_pos)
        # brute force pileup
        expect = np.zeros((N_CELLS, n_pos))
        for _, f in features.iterrows():
            t0 = f.Start - up
            for (c, s, e, b, sc) in recs:
                if (
                    c == f.Chromosome
                    and s < f.Start + down
                    and e > t0
                    and b.startswith("BC")
                ):
                    cs, ce = max(s - t0, 0), min(e - t0, n_pos)
                    if cs < ce:
                        expect[int(b[2:]), cs:ce] += sc
        flank = np.hstack([expect[:, :100], expect[:, -100:]]).mean(axis=1)
        flank[flank == 0] = flank.mean()
        center_dist = (n_pos - 1001) // 2
        center = expect[:, center_dist:-center_dist].mean(axis=1)
        np.testing.assert_allclose(
            atac_adata.obs["tss_score"].to_numpy(), center / flank, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(tss.X), expect / flank[:, None], rtol=1e-6
        )
        assert "tss_score" in tss.obs.columns

    def test_sampling_cap(self, atac_adata):
        features = pd.DataFrame(
            {
                "Chromosome": ["chr1"] * 50,
                "Start": np.arange(50) * 1000 + 10_000,
                "End": np.arange(50) * 1000 + 10_500,
            }
        )
        tss = ac.tl.tss_enrichment(
            atac_adata, features, n_tss=10, random_state=0, return_tss=True
        )
        assert tss is not None  # smoke: sampling path works


class TestNucleosomeSignal:
    def test_matches_bruteforce(self, atac_adata, frag_path):
        _, recs = frag_path
        n_read = 5000
        ac.tl.nucleosome_signal(atac_adata, n=n_read)
        mat = np.zeros((N_CELLS, 2))
        for (c, s, e, b, sc) in recs[:n_read]:
            if not b.startswith("BC"):
                continue
            length = e - s
            if length < 147:
                mat[int(b[2:]), 0] += 1
            elif length < 294:
                mat[int(b[2:]), 1] += 1
        mat[mat[:, 0] == 0, :] += 1
        np.testing.assert_allclose(
            atac_adata.obs["nucleosome_signal"].to_numpy(),
            mat[:, 1] / mat[:, 0],
        )


class TestFetchRegions:
    def test_df_and_relative(self, frag_path):
        path, recs = frag_path
        df = ac.tl.fetch_regions_to_df(path, "chr1:10000-30000")
        expect = [
            (s, e, b, sc)
            for (c, s, e, b, sc) in recs
            if c == "chr1" and s < 30_000 and e > 10_000
        ]
        assert df.shape[0] == len(expect)
        assert set(df.columns) == {
            "Chromosome", "Start", "End", "Cell", "Score", "Feature",
        }
        # relative coordinates center on the feature midpoint
        df_rel = ac.tl.fetch_regions_to_df(
            path, "chr1:10000-30000", relative_coordinates=True
        )
        assert (df_rel["Start"] == df["Start"] - 20_000).all()


class TestPeakAnnotation:
    def test_add_peak_annotation(self):
        from io import StringIO

        adata = mu.AnnData(X=np.zeros((2, 2), np.float32))
        tsv = StringIO(
            "chrom\tstart\tend\tgene\tdistance\tpeak_type\n"
            "chr1\t100\t200\tG1;G2\t0;-150\tpromoter;distal\n"
            "chr1\t500\t600\tG3\t20\tdistal\n"
        )
        pa = pd.read_csv(tsv, sep="\t")
        out = ac.tl.add_peak_annotation(adata, pa, return_annotation=True)
        assert out.index.name == "gene"
        assert list(out.index) == ["G1", "G2", "G3"]
        assert list(out["peak"]) == [
            "chr1:100-200", "chr1:100-200", "chr1:500-600",
        ]
        assert out["distance"].tolist() == [0, -150, 20]
        assert adata.uns["atac"]["peak_annotation"] is not None

    def test_missing_distance_nullable(self):
        adata = mu.AnnData(X=np.zeros((2, 2), np.float32))
        pa = pd.DataFrame(
            {
                "peak": ["chr1_100_200", "chr1_500_600"],
                "gene": ["", "G1"],
                "distance": [None, 10],
                "peak_type": ["intergenic", "promoter"],
            }
        )
        out = ac.tl.add_peak_annotation(adata, pa, return_annotation=True)
        # missing distance preserved as pd.NA with Int64 dtype (reference
        # regression: tests/test_atac_tools.py:13-30)
        assert str(out["distance"].dtype) == "Int64"
        assert pd.isna(out["distance"].iloc[0])
        assert out["distance"].iloc[1] == 10
        # peak id reconstructed from underscores
        assert out["peak"].iloc[0] == "chr1:100-200"

    def test_add_gene_names_via_rna(self):
        atac = mu.AnnData(X=np.zeros((3, 2), np.float32))
        rna = mu.AnnData(
            X=np.zeros((3, 2), np.float32),
            var=pd.DataFrame(
                {"gene_ids": ["ENSG1", "ENSG2"]}, index=["GeneA", "GeneB"]
            ),
        )
        mdata = mu.MuData({"atac": atac, "rna": rna})
        pa = pd.DataFrame(
            {
                "peak": ["chr1_1_2", "chr1_3_4"],
                "gene": ["ENSG1", "ENSG2"],
                "distance": [0, 5],
                "peak_type": ["promoter", "distal"],
            }
        )
        ac.tl.add_peak_annotation(mdata, pa)
        out = ac.tl.add_peak_annotation_gene_names(mdata, return_annotation=True)
        assert out.index.name == "gene_name"
        assert set(out.index) == {"GeneA", "GeneB"}
