"""Single-modality neighbors + WNN fusion tests
(quality-level parity per SURVEY §7 hard-part 3: assert graph quality,
not edge identity, since the reference itself is approximate)."""

import numpy as np
import pytest
from scipy import sparse as sp

import muon_tpu as mu


def clustered_data(n_per=40, n_clusters=3, d=12, seed=0, noise=0.3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)) * 4
    X = np.concatenate(
        [centers[i] + noise * rng.normal(size=(n_per, d)) for i in range(n_clusters)]
    ).astype(np.float32)
    labels = np.repeat(np.arange(n_clusters), n_per)
    return X, labels


class TestSingleNeighbors:
    def test_outputs(self):
        X, labels = clustered_data()
        ad = mu.AnnData(X)
        mu.pp.neighbors(ad, n_neighbors=10)
        assert "distances" in ad.obsp and "connectivities" in ad.obsp
        assert ad.uns["neighbors"]["params"]["n_neighbors"] == 10
        dmat = ad.obsp["distances"]
        assert dmat.shape == (120, 120)
        assert (np.diff(dmat.indptr) == 9).all()  # k-1 neighbors per row

    def test_knn_correctness(self):
        X, labels = clustered_data()
        ad = mu.AnnData(X)
        mu.pp.neighbors(ad, n_neighbors=10)
        dmat = ad.obsp["distances"].toarray()
        # neighbors should overwhelmingly be same-cluster
        same = 0
        total = 0
        for i in range(120):
            nbrs = np.flatnonzero(dmat[i])
            same += (labels[nbrs] == labels[i]).sum()
            total += len(nbrs)
        assert same / total > 0.95

    def test_knn_exactness_vs_scipy(self):
        from muon_tpu.ops.knn import knn
        from scipy.spatial.distance import cdist

        rng = np.random.default_rng(3)
        X = rng.normal(size=(50, 7)).astype(np.float32)
        idx, dists = knn(X, 5)
        D = cdist(X, X)
        for i in range(50):
            ref = np.argsort(D[i])[:6]
            assert set(np.asarray(idx)[i]) == set(ref), i
            assert np.allclose(np.sort(np.asarray(dists)[i]), np.sort(D[i][ref]), atol=1e-3)

    def test_connectivities_symmetric(self):
        X, _ = clustered_data()
        ad = mu.AnnData(X)
        mu.pp.neighbors(ad, n_neighbors=8)
        C = ad.obsp["connectivities"]
        assert abs(C - C.T).max() < 1e-6
        assert C.max() <= 1.0 + 1e-6

    def test_fuzzy_union_native_matches_scipy(self):
        """The native one-pass knn_fuzzy_union must reproduce the scipy
        W + Wᵀ − W∘Wᵀ reference construction exactly (incl. ragged −1
        padding, self edges, and mix ratios)."""
        from scipy import sparse as sp

        from muon_tpu.ops import fuzzy

        rng = np.random.default_rng(7)
        n, k = 300, 9
        # unique neighbor ids per row (kNN contract — duplicates within a
        # row never occur in real top-k output)
        idx = np.argsort(rng.random((n, n)), axis=1)[:, :k].astype(np.int32)
        idx[:, 0] = np.arange(n)  # self in col 0
        idx[rng.random((n, k)) < 0.1] = -1  # ragged padding
        vals = rng.random((n, k)).astype(np.float32)
        for mix in (1.0, 0.6):
            native = fuzzy._fuzzy_union_native(idx, vals, n, mix)
            # scipy reference (the fallback path's construction)
            rows = np.repeat(np.arange(n), k)
            cols = idx.reshape(-1)
            v = vals.reshape(-1).copy()
            v[cols == rows] = 0.0
            keep = cols >= 0
            W = sp.coo_matrix(
                (v[keep], (rows[keep], cols[keep])), shape=(n, n)
            ).tocsr()
            Wt = W.T.tocsr()
            prod = W.multiply(Wt)
            ref = mix * (W + Wt - prod) + (1.0 - mix) * prod
            ref.eliminate_zeros()
            assert abs(native - ref).max() < 1e-6, mix


class TestWNN:
    def _make_mdata(self, informative=(True, True), seed=0, n_per=40):
        X1, labels = clustered_data(n_per=n_per, seed=seed)
        if informative[1]:
            X2, _ = clustered_data(n_per=n_per, d=9, seed=seed + 1)
        else:
            rng = np.random.default_rng(seed + 2)
            X2 = rng.normal(size=(X1.shape[0], 9)).astype(np.float32)
        m1, m2 = mu.AnnData(X1), mu.AnnData(X2)
        md = mu.MuData({"m1": m1, "m2": m2})
        mu.pp.neighbors(m1, n_neighbors=10)
        mu.pp.neighbors(m2, n_neighbors=10)
        return md, labels

    def test_wnn_outputs(self):
        md, labels = self._make_mdata()
        mu.pp.neighbors(md)
        assert "distances" in md.obsp and "connectivities" in md.obsp
        assert "neighbors" in md.uns
        assert md.uns["neighbors"]["params"]["n_neighbors"] == 10
        assert "m1:mod_weight" in md.obs.columns
        assert "m2:mod_weight" in md.obs.columns
        w1 = md.obs["m1:mod_weight"].to_numpy()
        w2 = md.obs["m2:mod_weight"].to_numpy()
        assert np.allclose(w1 + w2, 1.0, atol=1e-5)
        # 11 neighbors per row (n_neighbors + 1)
        assert (np.diff(md.obsp["distances"].indptr) == 11).all()

    def test_wnn_graph_quality(self):
        md, labels = self._make_mdata()
        mu.pp.neighbors(md)
        dmat = md.obsp["distances"].tocsr()
        same = total = 0
        for i in range(md.n_obs):
            nbrs = dmat.indices[dmat.indptr[i]:dmat.indptr[i + 1]]
            same += (labels[nbrs] == labels[i]).sum()
            total += len(nbrs)
        assert same / total > 0.95

    def test_wnn_weights_favor_informative(self):
        md, labels = self._make_mdata(informative=(True, False))
        mu.pp.neighbors(md)
        w1 = md.obs["m1:mod_weight"].to_numpy()
        # the informative modality should get clearly higher weight on average
        assert np.nanmean(w1) > 0.6

    def test_wnn_requires_per_mod_neighbors(self):
        X1, _ = clustered_data()
        md = mu.MuData({"m1": mu.AnnData(X1)})
        with pytest.raises(ValueError, match="neighbors"):
            mu.pp.neighbors(md)

    def test_wnn_key_added(self):
        md, _ = self._make_mdata()
        mu.pp.neighbors(md, key_added="wnn")
        assert "wnn" in md.uns
        assert "wnn_distances" in md.obsp
        assert "wnn_connectivities" in md.obsp

    def test_wnn_copy(self):
        md, _ = self._make_mdata()
        out = mu.pp.neighbors(md, copy=True)
        assert out is not md
        assert "distances" in out.obsp
        assert "distances" not in md.obsp

    def test_wnn_ragged(self):
        md, labels = self._make_mdata()
        # make m2 ragged: drop last 20 obs
        m2 = md.mod["m2"][: md.n_obs - 20].copy()
        md = mu.MuData({"m1": md.mod["m1"], "m2": m2})
        mu.pp.neighbors(md.mod["m1"], n_neighbors=10)
        mu.pp.neighbors(md.mod["m2"], n_neighbors=10)
        mu.pp.neighbors(md)
        assert md.obsp["distances"].shape == (md.n_obs, md.n_obs)
        # graph quality still good on the shared cells
        dmat = md.obsp["distances"].tocsr()
        same = total = 0
        for i in range(md.n_obs):
            nbrs = dmat.indices[dmat.indptr[i]:dmat.indptr[i + 1]]
            same += (labels[nbrs] == labels[i]).sum()
            total += len(nbrs)
        assert same / total > 0.9

    def test_wnn_permuted_modality_order(self):
        """Regression (ADVICE r1 #1): θ gathers used prefix-sliced subset
        indexing, which silently mis-aligned whenever a modality's obs
        order differed from the global order. Weights must be invariant to
        a permutation of one modality's rows."""
        md, labels = self._make_mdata()
        mu.pp.neighbors(md)
        w_ref = md.obs["m1:mod_weight"].to_numpy()

        # rebuild with m2's obs stored in a shuffled order
        rng = np.random.default_rng(5)
        perm = rng.permutation(md.n_obs)
        m1 = md.mod["m1"].copy()
        X2 = np.asarray(md.mod["m2"].X)[perm]
        m2 = mu.AnnData(X2)
        m1.obs_names = [f"cell{i}" for i in range(md.n_obs)]
        m2.obs_names = [f"cell{perm[i]}" for i in range(md.n_obs)]
        md2 = mu.MuData({"m1": m1, "m2": m2})
        mu.pp.neighbors(md2.mod["m1"], n_neighbors=10)
        mu.pp.neighbors(md2.mod["m2"], n_neighbors=10)
        mu.pp.neighbors(md2)

        w1 = md2.obs["m1:mod_weight"].to_numpy()
        order = [list(md2.obs_names).index(f"cell{i}") for i in range(md.n_obs)]
        assert np.allclose(w1[order], w_ref, atol=1e-3)

    def test_wnn_add_weights_to_modalities(self):
        md, _ = self._make_mdata()
        mu.pp.neighbors(md, add_weights_to_modalities=True)
        assert "mod_weight" in md.mod["m1"].obs.columns

    def test_wnn_knn_tag_fallback_equivalent(self):
        """single_neighbors tags its obsp distances with the device-resident
        kNN matrices (round 5: skips ~160MB/mod of tunnel re-uploads in
        WNN). A graph WITHOUT the tag (external/h5-loaded obsp) must go
        through the CSR-rebuild fallback and produce an equivalent fused
        graph — same edges up to fusion-score rounding (bf16 table built on
        device vs host)."""
        md, _ = self._make_mdata()
        for m in md.mod.values():
            assert hasattr(m.obsp["distances"], "_muon_tpu_knn")
        mu.pp.neighbors(md)
        d_tag = md.obsp["distances"].tocsr()
        w_tag = md.obs["m1:mod_weight"].to_numpy()

        # strip the tags (as an h5mu round-trip would) and rerun
        for m in md.mod.values():
            del m.obsp["distances"]._muon_tpu_knn
        mu.pp.neighbors(md)
        d_raw = md.obsp["distances"].tocsr()
        w_raw = md.obs["m1:mod_weight"].to_numpy()

        assert np.allclose(w_tag, w_raw, atol=1e-4)
        a = {tuple(x) for x in np.array(d_tag.nonzero()).T}
        b = {tuple(x) for x in np.array(d_raw.nonzero()).T}
        overlap = len(a & b) / max(len(a | b), 1)
        assert overlap > 0.98, overlap


class TestApproxKnn:
    """The approximate path (bf16 cross-terms + lax.approx_max_k) keeps
    the exact path's contract: self in column 0, high agreement with the
    exact neighbors (on TPU the hardware top-k measures recall 0.997 at
    recall_target=0.99; the CPU lowering is exact)."""

    def test_contract_and_agreement(self):
        import numpy as np
        from muon_tpu.ops.knn import knn

        rep = np.random.default_rng(0).normal(size=(3000, 16)).astype(
            np.float32
        )
        i_ex, d_ex = knn(rep, 10, approx=False)
        i_ap, d_ap = knn(rep, 10, approx=True)
        i_ex, i_ap = np.asarray(i_ex), np.asarray(i_ap)
        assert (np.asarray(i_ap)[:, 0] == np.arange(3000)).all()
        assert np.asarray(d_ap)[:, 0].max() == 0.0
        recall = np.mean(
            [len(set(a[1:]) & set(b[1:])) / 10
             for a, b in zip(i_ex[:500], i_ap[:500])]
        )
        assert recall > 0.9, recall


class TestIvfKnn:
    """IVF (k-means inverted file) approximate kNN — the >200k-cell path
    that replaces the brute-force kernel's n² score traffic."""

    def test_recall_vs_exact(self):
        from muon_tpu.ops.knn import knn
        from muon_tpu.ops.ivf import ivf_knn

        X, _ = clustered_data(n_per=2500, n_clusters=8, d=16, seed=4)
        idx_e, _ = knn(X, 15)
        idx_a, d_a = ivf_knn(X, 15, n_clusters=64, n_probe=8)
        hits = total = 0
        ie, ia = np.asarray(idx_e), np.asarray(idx_a)
        for i in range(X.shape[0]):
            hits += len(set(ie[i]) & set(ia[i]))
            total += ie.shape[1]
        recall = hits / total
        assert recall > 0.9, recall
        # self in column 0 with distance 0 (knn convention)
        assert (ia[:, 0] == np.arange(X.shape[0])).all()
        assert np.allclose(np.asarray(d_a)[:, 0], 0.0)
        # distances are true euclidean and ascending-ish
        assert np.isfinite(np.asarray(d_a)).all()

    def test_cosine(self):
        from muon_tpu.ops.knn import knn
        from muon_tpu.ops.ivf import ivf_knn

        X, _ = clustered_data(n_per=1500, n_clusters=6, d=12, seed=5)
        idx_e, _ = knn(X, 10, metric="cosine")
        idx_a, _ = ivf_knn(X, 10, metric="cosine", n_clusters=32)
        ie, ia = np.asarray(idx_e), np.asarray(idx_a)
        recall = np.mean([
            len(set(ie[i]) & set(ia[i])) / ie.shape[1]
            for i in range(X.shape[0])
        ])
        assert recall > 0.85, recall

    def test_method_dispatch(self):
        from muon_tpu.ops.knn import knn

        X, _ = clustered_data(n_per=400, n_clusters=4, d=8, seed=6)
        idx, dists = knn(X, 8, approx=True, method="ivf")
        assert idx.shape == (1600, 9)

    def test_partition_cache_reuse_and_no_false_hit(self):
        # the multiome pipeline searches the same rep twice (k=20 neighbor
        # graph, then k=200 WNN candidate pool); the k-means partition is
        # cached by value fingerprint and must (a) be reused across k, (b)
        # never alias different data
        from muon_tpu.ops import ivf

        ivf._PARTITION_CACHE.clear()
        X, _ = clustered_data(n_per=800, n_clusters=5, d=10, seed=11)
        idx1, _ = ivf.ivf_knn(X, 10, n_clusters=32)
        assert len(ivf._PARTITION_CACHE) == 1
        key1, part1 = next(iter(ivf._PARTITION_CACHE.items()))
        idx2, _ = ivf.ivf_knn(X, 20, n_clusters=32)  # different k, same data
        # same partition object reused (no second k-means run)
        assert next(iter(ivf._PARTITION_CACHE.values()))[1] is part1[1]
        # k=20 result must contain the k=10 neighbors (same partition,
        # deterministic search)
        overlap = np.mean([
            len(set(idx1[i]) & set(idx2[i])) / idx1.shape[1]
            for i in range(X.shape[0])
        ])
        assert overlap > 0.99, overlap
        Y = X + 1.7  # different data → different fingerprint
        ivf.ivf_knn(Y, 10, n_clusters=32)
        keys = list(ivf._PARTITION_CACHE)
        assert len(keys) == 2 and keys[0] == key1

    def test_device_out_matches_host(self):
        # device-resident scatter-back must agree exactly with the host
        # numpy path (the d2h-free route the WNN candidate stage takes)
        from muon_tpu.ops.ivf import ivf_knn

        X, _ = clustered_data(n_per=1000, n_clusters=5, d=10, seed=7)
        idx_h, d_h = ivf_knn(X, 12, n_clusters=32)
        idx_d, d_d = ivf_knn(X, 12, n_clusters=32, device_out=True)
        assert np.array_equal(np.asarray(idx_d), idx_h)
        assert np.allclose(np.asarray(d_d), d_h, atol=1e-6)
