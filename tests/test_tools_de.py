"""rank_genes_groups: device DE stats validated against scipy."""

import numpy as np
import pandas as pd
import pytest
from scipy import sparse as sp
from scipy.stats import mannwhitneyu, ttest_ind

import muon_tpu as mu


@pytest.fixture()
def adata():
    rng = np.random.default_rng(0)
    n, d = 120, 25
    X = rng.normal(1.0, 1.0, size=(n, d)).astype(np.float32)
    labels = rng.choice(["a", "b", "c"], size=n)
    # plant differential genes
    X[labels == "a", 0] += 3.0
    X[labels == "b", 1] += 2.0
    obs = pd.DataFrame({"cluster": labels},
                       index=[f"c{i}" for i in range(n)])
    var = pd.DataFrame(index=[f"g{i}" for i in range(d)])
    return mu.AnnData(X=X, obs=obs, var=var), X, labels


class TestTTest:
    def test_matches_scipy_welch(self, adata):
        ad, X, labels = adata
        mu.tl.rank_genes_groups(ad, "cluster", method="t-test")
        res = ad.uns["rank_genes_groups"]
        assert res["params"]["method"] == "t-test"
        # check group 'a' stats against scipy Welch t-test, gene by gene
        names = res["names"]["a"]
        scores = res["scores"]["a"]
        pvals = res["pvals"]["a"]
        gidx = {f"g{i}": i for i in range(X.shape[1])}
        for k in range(5):
            j = gidx[names[k]]
            t_ref, p_ref = ttest_ind(
                X[labels == "a", j], X[labels != "a", j], equal_var=False
            )
            assert abs(scores[k] - t_ref) < 1e-2
            assert abs(pvals[k] - p_ref) < 1e-3

    def test_top_gene_is_planted(self, adata):
        ad, X, labels = adata
        mu.tl.rank_genes_groups(ad, "cluster", method="t-test")
        res = ad.uns["rank_genes_groups"]
        assert res["names"]["a"][0] == "g0"
        assert res["names"]["b"][0] == "g1"

    def test_sparse_input_matches_dense(self, adata):
        ad, X, labels = adata
        Xp = np.clip(X, 0, None)
        ad_d = mu.AnnData(X=Xp.copy(), obs=ad.obs.copy(), var=ad.var.copy())
        ad_s = mu.AnnData(X=sp.csr_matrix(Xp), obs=ad.obs.copy(), var=ad.var.copy())
        mu.tl.rank_genes_groups(ad_d, "cluster")
        mu.tl.rank_genes_groups(ad_s, "cluster")
        for grp in ("a", "b", "c"):
            assert list(ad_d.uns["rank_genes_groups"]["names"][grp]) == list(
                ad_s.uns["rank_genes_groups"]["names"][grp]
            )
            np.testing.assert_allclose(
                ad_d.uns["rank_genes_groups"]["scores"][grp],
                ad_s.uns["rank_genes_groups"]["scores"][grp],
                rtol=1e-3, atol=1e-4,
            )

    def test_explicit_reference(self, adata):
        ad, X, labels = adata
        mu.tl.rank_genes_groups(ad, "cluster", groups=["a"], reference="b")
        res = ad.uns["rank_genes_groups"]
        names = res["names"].dtype.names
        assert names == ("a",)
        j = 0  # g0 planted in a only
        t_ref, _ = ttest_ind(
            X[labels == "a", j], X[labels == "b", j], equal_var=False
        )
        gidx = list(res["names"]["a"]).index("g0")
        assert abs(res["scores"]["a"][gidx] - t_ref) < 1e-2


class TestWilcoxon:
    def test_matches_scipy(self, adata):
        ad, X, labels = adata
        mu.tl.rank_genes_groups(ad, "cluster", method="wilcoxon")
        res = ad.uns["rank_genes_groups"]
        names = res["names"]["a"]
        scores = res["scores"]["a"]
        gidx = {f"g{i}": i for i in range(X.shape[1])}
        for k in range(4):
            j = gidx[names[k]]
            u, p_ref = mannwhitneyu(
                X[labels == "a", j], X[labels != "a", j],
                alternative="two-sided", method="asymptotic",
            )
            n1 = (labels == "a").sum()
            n2 = (labels != "a").sum()
            # convert U to rank-sum z and compare p-values
            assert abs(res["pvals"]["a"][k] - p_ref) < 5e-3

    def test_ties_handled(self):
        rng = np.random.default_rng(1)
        n = 80
        X = rng.integers(0, 3, size=(n, 5)).astype(np.float32)  # heavy ties
        labels = np.array(["x"] * 40 + ["y"] * 40)
        X[labels == "x", 0] += 2
        ad = mu.AnnData(
            X=X, obs=pd.DataFrame({"g": labels}, index=[f"c{i}" for i in range(n)])
        )
        mu.tl.rank_genes_groups(ad, "g", method="wilcoxon")
        res = ad.uns["rank_genes_groups"]
        assert res["names"]["x"][0] == "0" or res["names"]["x"][0] == ad.var_names[0]
        j = 0
        u, p_ref = mannwhitneyu(
            X[labels == "x", j], X[labels == "y", j],
            alternative="two-sided", method="asymptotic",
        )
        k = list(res["names"]["x"]).index(ad.var_names[0])
        assert abs(res["pvals"]["x"][k] - p_ref) < 5e-3


class TestIntegration:
    def test_rank_peaks_groups(self):
        """ATAC wrapper: DE + gene-name attachment end to end."""
        from muon_tpu import atac as ac

        rng = np.random.default_rng(2)
        n = 60
        peaks = [f"chr1:{i*1000}-{i*1000+500}" for i in range(6)]
        X = rng.poisson(2.0, size=(n, 6)).astype(np.float32)
        labels = np.array(["p", "q"] * 30)
        X[labels == "p", 2] += 5
        adata = mu.AnnData(
            X=X,
            obs=pd.DataFrame({"cl": labels}, index=[f"c{i}" for i in range(n)]),
            var=pd.DataFrame(index=peaks),
        )
        pa = pd.DataFrame(
            {
                "peak": [p.replace(":", "_").replace("-", "_") for p in peaks],
                "gene": [f"GENE{i}" for i in range(6)],
                "distance": [0] * 6,
                "peak_type": ["promoter"] * 6,
            }
        )
        ac.tl.add_peak_annotation(adata, pa)
        ac.tl.rank_peaks_groups(adata, "cl", add_peak_type=True)
        res = adata.uns["rank_genes_groups"]
        assert res["names"]["p"][0] == peaks[2]
        assert "genes" in res and "peak_type" in res
        genes_p = res["genes"]["p"]
        assert genes_p[0] == "GENE2"

    def test_bh_adjustment_monotone(self, adata):
        ad, X, labels = adata
        mu.tl.rank_genes_groups(ad, "cluster")
        res = ad.uns["rank_genes_groups"]
        assert (res["pvals_adj"]["a"] >= res["pvals"]["a"] - 1e-12).all()


class TestLogreg:
    def test_planted_genes_win(self, adata):
        ad, X, labels = adata
        mu.tl.rank_genes_groups(ad, "cluster", method="logreg")
        res = ad.uns["rank_genes_groups"]
        assert res["params"]["method"] == "logreg"
        # the planted markers carry the largest coefficients
        assert res["names"]["a"][0] == "g0"
        assert res["names"]["b"][0] == "g1"
        # coefficients are real numbers, pvals are NaN (scanpy logreg parity)
        assert np.isfinite(res["scores"]["a"]).all()
        assert np.isnan(res["pvals"]["a"]).all()

    def test_matches_sklearn_direction(self, adata):
        ad, X, labels = adata
        mu.tl.rank_genes_groups(ad, "cluster", method="logreg")
        ours = ad.uns["rank_genes_groups"]["scores"]["a"]
        names = ad.uns["rank_genes_groups"]["names"]["a"]
        from sklearn.linear_model import LogisticRegression

        clf = LogisticRegression(max_iter=500).fit(X, labels)
        coef_a = clf.coef_[list(clf.classes_).index("a")]
        gidx = {f"g{i}": i for i in range(X.shape[1])}
        ref = np.array([coef_a[gidx[nm]] for nm in names])
        # same optimum up to optimizer tolerance: rank correlation is high
        from scipy.stats import spearmanr

        rho = spearmanr(ours, ref).statistic
        assert rho > 0.95
