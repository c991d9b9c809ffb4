"""SNF / multiplex clustering / UMAP / ICA tests."""

import numpy as np
import pytest
from scipy import sparse as sp

import muon_tpu as mu
from tests.test_neighbors import clustered_data


def ari(a, b):
    """Adjusted Rand index (tiny, dependency-free)."""
    a = np.asarray(a)
    b = np.asarray(b)
    n = len(a)
    ua, ia = np.unique(a, return_inverse=True)
    ub, ib = np.unique(b, return_inverse=True)
    C = np.zeros((len(ua), len(ub)))
    np.add.at(C, (ia, ib), 1)
    comb = lambda x: x * (x - 1) / 2  # noqa: E731
    sum_comb = comb(C).sum()
    sum_a = comb(C.sum(1)).sum()
    sum_b = comb(C.sum(0)).sum()
    exp = sum_a * sum_b / comb(n)
    mx = (sum_a + sum_b) / 2
    return (sum_comb - exp) / (mx - exp)


@pytest.fixture()
def mdata_clusters():
    X1, labels = clustered_data(n_per=40, n_clusters=4, d=12, seed=0)
    X2, _ = clustered_data(n_per=40, n_clusters=4, d=9, seed=1)
    m1, m2 = mu.AnnData(X1), mu.AnnData(X2)
    md = mu.MuData({"m1": m1, "m2": m2})
    mu.pp.neighbors(m1, n_neighbors=12)
    mu.pp.neighbors(m2, n_neighbors=12)
    return md, labels


class TestLeiden:
    def test_multiplex_leiden(self, mdata_clusters):
        md, labels = mdata_clusters
        mu.tl.leiden(md, resolution=1.0, random_state=1)
        assert "leiden" in md.obs.columns
        got = md.obs["leiden"].cat.codes.to_numpy()
        assert ari(labels, got) > 0.9

    def test_leiden_anndata(self, mdata_clusters):
        md, labels = mdata_clusters
        ad = md.mod["m1"]
        mu.tl.leiden(ad, resolution=1.0, random_state=1)
        got = ad.obs["leiden"].cat.codes.to_numpy()
        assert ari(labels, got) > 0.9

    def test_louvain(self, mdata_clusters):
        md, labels = mdata_clusters
        mu.tl.louvain(md, resolution=1.0, random_state=1)
        got = md.obs["louvain"].cat.codes.to_numpy()
        assert ari(labels, got) > 0.9

    def test_per_mod_resolution(self, mdata_clusters):
        md, labels = mdata_clusters
        mu.tl.leiden(md, resolution={"m1": 1.0, "m2": 0.8},
                     mod_weights={"m1": 1.0, "m2": 0.5}, random_state=1)
        assert "leiden" in md.obs.columns

    def test_aggregated_levels_keep_rb_objective(self):
        """Regression (ADVICE r1 #2): dropping self-loops on aggregated
        levels made merges free — a planted 4-block SBM collapsed to ONE
        community at resolution 1.0. With self-loops kept in deg/two_m the
        multi-level objective stays RB modularity of the original graph
        and the planted partition is recovered."""
        from muon_tpu.ops.leiden import leiden_labels

        rng = np.random.default_rng(0)
        n_per, k = 60, 4
        labels = np.repeat(np.arange(k), n_per)
        P = np.where(labels[:, None] == labels[None, :], 0.3, 0.03)
        A = (rng.random((k * n_per, k * n_per)) < P).astype(float)
        A = np.triu(A, 1)
        A = sp.csr_matrix(A + A.T)
        got = leiden_labels(A, resolution=1.0, seed=0)
        assert got.max() + 1 >= 3, "graph collapsed into too few communities"
        assert ari(labels, got) > 0.95

    def test_resolution_effect(self, mdata_clusters):
        md, labels = mdata_clusters
        mu.tl.leiden(md, resolution=0.05, key_added="lo", random_state=1)
        mu.tl.leiden(md, resolution=3.0, key_added="hi", random_state=1)
        n_lo = md.obs["lo"].nunique()
        n_hi = md.obs["hi"].nunique()
        assert n_lo <= n_hi


class TestSNF:
    def test_snf(self, mdata_clusters):
        md, labels = mdata_clusters
        mu.tl.snf(md, n_neighbors=15, n_iterations=5)
        assert "connectivities" in md.obsp
        assert "distances" in md.obsp
        assert md.uns["neighbors"]["params"]["method"] == "snf"
        # fused graph respects clusters
        conn = md.obsp["connectivities"].tocsr()
        same = total = 0
        for i in range(md.n_obs):
            nb = conn.indices[conn.indptr[i]:conn.indptr[i + 1]]
            same += (labels[nb] == labels[i]).sum()
            total += len(nb)
        assert same / total > 0.9

    def test_snf_then_leiden(self, mdata_clusters):
        md, labels = mdata_clusters
        mu.tl.snf(md, n_neighbors=15, n_iterations=5)
        from muon_tpu.ops.leiden import leiden_labels

        got = leiden_labels(md.obsp["connectivities"], resolution=1.0, seed=1)
        assert ari(labels, got) > 0.85


class TestUMAP:
    def test_umap_mudata(self, mdata_clusters):
        md, labels = mdata_clusters
        mu.pp.neighbors(md)
        mu.tl.umap(md, maxiter=100)
        emb = md.obsm["X_umap"]
        assert emb.shape == (md.n_obs, 2)
        assert np.isfinite(emb).all()
        # clusters separate in embedding: same-cluster dists < other dists
        from scipy.spatial.distance import cdist

        D = cdist(emb, emb)
        same_mask = labels[:, None] == labels[None, :]
        np.fill_diagonal(same_mask, False)
        assert D[same_mask].mean() < 0.5 * D[~same_mask].mean()

    def test_umap_requires_neighbors(self, mdata_clusters):
        md, _ = mdata_clusters
        with pytest.raises(ValueError, match="neighbors"):
            mu.tl.umap(md)

    def test_umap_anndata(self, mdata_clusters):
        md, labels = mdata_clusters
        ad = md.mod["m1"]
        mu.tl.umap(ad, maxiter=50)
        assert ad.obsm["X_umap"].shape == (ad.n_obs, 2)


class TestICA:
    def test_ica(self):
        rng = np.random.default_rng(0)
        S = np.column_stack(
            [np.sign(np.sin(np.arange(500) / 5.0)), rng.laplace(size=500)]
        )
        A = rng.normal(size=(2, 6))
        X = (S @ A).astype(np.float32)
        ad = mu.AnnData(X)
        ad.obsm["X_pca"] = X
        mu.tl.ica(ad, basis="X_pca", n_components=2, random_state=0)
        got = ad.obsm["X_ica"]
        assert got.shape == (500, 2)
        # recovered sources correlate with the truth (up to permutation/sign)
        cors = np.abs(np.corrcoef(S.T, got.T)[:2, 2:])
        assert cors.max(axis=1).min() > 0.9
