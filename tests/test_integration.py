"""End-to-end multiome pipeline: the BASELINE configs at test scale.

read_10x_h5 → ac.pp.tfidf → ac.tl.lsi → mu.pp.pca(rna) → per-modality
neighbors → mu.pp.neighbors (WNN) → mu.tl.leiden → mu.tl.umap →
mu.tl.mofa → mu.pl plots — driven exactly as a reference muon user would.
"""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import pytest
from scipy import sparse as sp

import muon_tpu as mu
from muon_tpu import atac as ac
from muon_tpu.ops.wnn import single_neighbors

N_CELLS = 150
N_CLUST = 3


@pytest.fixture(scope="module")
def multiome_h5(tmp_path_factory):
    """Synthesized CellRanger h5 with clustered RNA + ATAC signal."""
    import h5py

    rng = np.random.default_rng(7)
    n_genes, n_peaks = 60, 80
    labels = np.repeat(np.arange(N_CLUST), N_CELLS // N_CLUST)

    gene_prog = rng.gamma(2.0, 1.0, size=(N_CLUST, n_genes))
    peak_prog = rng.gamma(2.0, 1.0, size=(N_CLUST, n_peaks)) * (
        rng.random((N_CLUST, n_peaks)) < 0.4
    )
    rna = rng.poisson(gene_prog[labels] * 2.0).astype(np.float32)
    atac = rng.poisson(peak_prog[labels]).astype(np.float32)
    Xall = np.concatenate([rna, atac], axis=1)

    names = [f"GENE{i}" for i in range(n_genes)] + [
        f"chr1:{i*1000}-{i*1000+500}" for i in range(n_peaks)
    ]
    ftypes = [b"Gene Expression"] * n_genes + [b"Peaks"] * n_peaks
    path = str(tmp_path_factory.mktemp("mo") / "matrix.h5")
    Xf = sp.csc_matrix(Xall.T)
    with h5py.File(path, "w") as f:
        g = f.create_group("matrix")
        g.create_dataset("data", data=Xf.data.astype(np.int32))
        g.create_dataset("indices", data=Xf.indices.astype(np.int64))
        g.create_dataset("indptr", data=Xf.indptr.astype(np.int64))
        g.create_dataset(
            "shape", data=np.array([Xall.shape[1], N_CELLS], np.int32)
        )
        g.create_dataset(
            "barcodes",
            data=np.array([f"BC{i}-1".encode() for i in range(N_CELLS)]),
        )
        feats = g.create_group("features")
        feats.create_dataset("name", data=np.array([s.encode() for s in names]))
        feats.create_dataset("id", data=np.array([s.encode() for s in names]))
        feats.create_dataset("feature_type", data=np.array(ftypes))
    return path, labels


def test_full_multiome_pipeline(multiome_h5, tmp_path):
    path, labels = multiome_h5

    # --- ingest ---
    mdata = mu.read_10x_h5(path)
    assert set(mdata.mod) == {"rna", "atac"}
    assert mdata.n_obs == N_CELLS
    rna, atac = mdata.mod["rna"], mdata.mod["atac"]

    # --- ATAC: TF-IDF → LSI ---
    ac.pp.tfidf(atac)
    ac.tl.lsi(atac, n_comps=10)
    assert atac.obsm["X_lsi"].shape == (N_CELLS, 10)

    # --- RNA: log1p-ish + PCA ---
    rna.X = np.log1p(np.asarray(rna.X.todense(), dtype=np.float32))
    mu.pp.pca(rna, n_comps=10)
    assert rna.obsm["X_pca"].shape == (N_CELLS, 10)

    # --- per-modality neighbors + WNN fusion ---
    single_neighbors(rna, n_neighbors=15, use_rep="X_pca")
    single_neighbors(atac, n_neighbors=15, use_rep="X_lsi")
    mu.pp.neighbors(mdata)
    assert "connectivities" in mdata.obsp and "distances" in mdata.obsp
    assert "rna:mod_weight" in mdata.obs.columns

    # --- multiplex clustering on the fused graph ---
    mu.tl.leiden(mdata, resolution=1.0)
    from sklearn.metrics import adjusted_rand_score

    ari = adjusted_rand_score(labels, mdata.obs["leiden"].to_numpy())
    assert ari > 0.9, f"fused clustering ARI {ari}"
    assert mdata.uns["leiden"]["params"]["resolution"] == 1.0

    # --- multimodal UMAP ---
    mu.tl.umap(mdata)
    E = np.asarray(mdata.obsm["X_umap"])
    assert E.shape == (N_CELLS, 2) and np.isfinite(E).all()
    cents = np.stack([E[labels == i].mean(0) for i in range(N_CLUST)])
    intra = np.mean(
        [np.linalg.norm(E[labels == i] - cents[i], axis=1).mean()
         for i in range(N_CLUST)]
    )
    from scipy.spatial.distance import pdist

    assert pdist(cents).mean() > 2 * intra

    # --- MOFA on both modalities ---
    mu.tl.mofa(
        mdata, n_factors=6, n_iterations=200, use_var=None,
        outfile=str(tmp_path / "model.hdf5"),
    )
    Xm = np.asarray(mdata.obsm["X_mofa"])
    assert Xm.shape == (N_CELLS, 6) and np.isfinite(Xm).all()
    # the factor space separates the clusters linearly
    from sklearn.metrics import silhouette_score

    assert silhouette_score(Xm[:, :3], labels) > 0.1

    # --- plots (headless smoke on real results) ---
    mu.pl.umap(mdata, color="leiden", show=False)
    mu.pl.mofa(mdata, color="leiden", show=False)
    mu.pl.embedding(mdata, basis="atac:lsi", color="leiden", show=False)
    plt.close("all")

    # --- round-trip the annotated object ---
    out = str(tmp_path / "out.h5mu")
    mdata.write_h5mu(out)
    back = mu.read_h5mu(out)
    assert set(back.mod) == {"rna", "atac"}
    np.testing.assert_array_equal(
        back.obs["leiden"].to_numpy().astype(str),
        mdata.obs["leiden"].to_numpy().astype(str),
    )
    np.testing.assert_allclose(
        np.asarray(back.obsm["X_mofa"]), Xm, rtol=1e-5
    )


def test_citeseq_pipeline(tmp_path):
    """CITE-seq flow (BASELINE config #2): CLR + DSB vs empty droplets,
    then RNA+protein WNN fusion."""
    rng = np.random.default_rng(11)
    n_cells, n_empty, n_prot, n_genes = 150, 500, 25, 50
    labels = np.repeat(np.arange(3), n_cells // 3)

    ambient = rng.uniform(4, 30, n_prot)
    prot_prog = rng.gamma(3.0, 20.0, size=(3, n_prot)) * (
        rng.random((3, n_prot)) < 0.35
    )
    gene_prog = rng.gamma(2.0, 1.5, size=(3, n_genes))
    prot_cells = rng.poisson(ambient + prot_prog[labels]).astype(np.float32)
    prot_empty = rng.poisson(ambient, (n_empty, n_prot)).astype(np.float32)
    rna_cells = rng.poisson(gene_prog[labels] * 2).astype(np.float32)

    obs = pd.DataFrame(index=[f"C{i}" for i in range(n_cells)])
    var_p = pd.DataFrame(index=[f"AB{i}" for i in range(n_prot)])
    prot = mu.AnnData(X=sp.csr_matrix(prot_cells), obs=obs.copy(), var=var_p.copy())
    raw_prot = mu.AnnData(
        X=sp.csr_matrix(np.vstack([prot_cells, prot_empty])),
        obs=pd.DataFrame(
            index=[f"C{i}" for i in range(n_cells)]
            + [f"E{i}" for i in range(n_empty)]
        ),
        var=var_p.copy(),
    )
    rna = mu.AnnData(X=rna_cells, obs=obs.copy(),
                     var=pd.DataFrame(index=[f"G{i}" for i in range(n_genes)]))
    mdata = mu.MuData({"rna": rna, "prot": prot})

    from muon_tpu import prot as pt

    # CLR into a layer, DSB into X
    clr_out = pt.pp.clr(mdata.mod["prot"], inplace=False)
    assert clr_out is not None
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pt.pp.dsb(mdata.mod["prot"], raw_prot, random_state=0)
    X = np.asarray(mdata.mod["prot"].X)
    assert np.isfinite(X).all()
    # DSB zero-centers the ambient background
    bg_entries = prot_prog[labels] == 0
    assert abs(np.median(X[bg_entries])) < 1.0

    # RNA PCA + WNN
    mdata.mod["rna"].X = np.log1p(mdata.mod["rna"].X)
    mu.pp.pca(mdata.mod["rna"], n_comps=10)
    mu.pp.pca(mdata.mod["prot"], n_comps=10)
    single_neighbors(mdata.mod["rna"], n_neighbors=15, use_rep="X_pca")
    single_neighbors(mdata.mod["prot"], n_neighbors=15, use_rep="X_pca")
    mu.pp.neighbors(mdata)
    mu.tl.leiden(mdata, resolution=1.0)
    from sklearn.metrics import adjusted_rand_score

    ari = adjusted_rand_score(labels, mdata.obs["leiden"].to_numpy())
    assert ari > 0.85, f"CITE-seq fused ARI {ari}"
