"""scOpen imputation on the in-repo jit NMF (reference
muon/_atac/preproc.py:155-236, external scopen package replaced)."""

import numpy as np
import pandas as pd
import pytest

import muon_tpu as mu
from muon_tpu import atac as ac


class TestScopen:
    def test_imputation_recovers_structure(self):
        """Binarized low-rank openness: NMF imputation must fill in the
        dropped-out entries better than the raw binary matrix."""
        rng = np.random.default_rng(0)
        n, p, k = 80, 60, 4
        W = rng.random((n, k)) * (rng.random((n, k)) < 0.5)
        H = rng.random((k, p)) * (rng.random((k, p)) < 0.5)
        prob = np.clip(W @ H, 0, 1)
        truth = (prob > 0.4).astype(np.float32)
        # dropout: observe only 60% of the open entries
        observed = truth * (rng.random((n, p)) < 0.6)
        adata = mu.AnnData(
            X=observed.copy(),
            obs=pd.DataFrame(index=[f"c{i}" for i in range(n)]),
            var=pd.DataFrame(index=[f"p{i}" for i in range(p)]),
        )
        ac.pp.scopen(adata, n_components=8, max_iter=300)
        assert "X_scopen" in adata.obsm
        assert adata.obsm["X_scopen"].shape == (n, 8)
        assert adata.varm["scopen"].shape == (p, 8)
        imputed = np.asarray(adata.X)
        assert imputed.min() >= 0 and imputed.max() <= 1
        # imputed scores on dropped-out open entries exceed closed entries
        dropped = (truth == 1) & (observed == 0)
        closed = truth == 0
        assert imputed[dropped].mean() > imputed[closed].mean() + 0.05

    def test_nmf_factorization_quality(self):
        from muon_tpu.ops.nmf import nmf

        rng = np.random.default_rng(1)
        W0 = rng.random((40, 3))
        H0 = rng.random((3, 30))
        X = (W0 @ H0).astype(np.float32)
        W, H = nmf(X, n_components=3, alpha=0.0, max_iter=800)
        rel = np.linalg.norm(X - W @ H) / np.linalg.norm(X)
        assert rel < 0.05, rel
        assert (W >= 0).all() and (H >= 0).all()
