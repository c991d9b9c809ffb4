"""_get_values key grammar tests
(contract: reference tests/test_key_parsing.py:16-101)."""

import numpy as np
import pandas as pd
import pytest

import muon_tpu as mu
from muon_tpu._core.utils import _get_values
from tests.conftest import make_adata


@pytest.fixture(params=[True, False])
def mdata_kp(request):
    same_obs = request.param
    m1 = make_adata(20, 5, seed=1)
    m1.var_names = [f"mod1_var{i}" for i in range(5)]
    if same_obs:
        m2 = make_adata(20, 7, seed=2)
    else:
        m2 = make_adata(12, 7, seed=2)
    m2.var_names = [f"mod2_var{i}" for i in range(7)]
    m1.obs["mod1_col"] = np.arange(m1.n_obs, dtype=float)
    m2.obs["mod2_col"] = np.arange(m2.n_obs, dtype=float)
    m1.obs["common_col"] = np.ones(m1.n_obs)
    m2.obs["common_col"] = np.zeros(m2.n_obs)
    md = mu.MuData({"mod1": m1, "mod2": m2})
    md.obs["global_col"] = np.arange(md.n_obs, dtype=float)
    md.obsm["X_emb"] = np.column_stack(
        [np.arange(md.n_obs), -np.arange(md.n_obs)]
    ).astype(float)
    return md, same_obs


class TestKeyGrammar:
    def test_global_obs(self, mdata_kp):
        md, _ = mdata_kp
        vals = _get_values(md, "global_col")
        assert np.allclose(vals, np.arange(md.n_obs))

    def test_mod_prefixed_obs(self, mdata_kp):
        md, same_obs = mdata_kp
        vals = _get_values(md, "mod2:mod2_col")
        assert len(vals) == md.n_obs
        if same_obs:
            assert np.allclose(vals, np.arange(md.n_obs))
        else:
            # ragged: missing obs are NaN
            assert np.isnan(vals.astype(float)).sum() == md.n_obs - 12

    def test_var_name_search(self, mdata_kp):
        md, same_obs = mdata_kp
        vals = _get_values(md, "mod1_var0")
        assert len(vals) == md.n_obs
        expected = np.asarray(md.mod["mod1"].X)[:, 0]
        assert np.allclose(np.asarray(vals, dtype=float), expected)

    def test_var_in_second_mod_ragged(self, mdata_kp):
        md, same_obs = mdata_kp
        vals = np.asarray(_get_values(md, "mod2_var0"), dtype=float)
        if not same_obs:
            assert np.isnan(vals).sum() == md.n_obs - 12

    def test_obsm_component(self, mdata_kp):
        md, _ = mdata_kp
        vals = _get_values(md, "X_emb:2")
        assert np.allclose(vals, -np.arange(md.n_obs))

    def test_obsm_zero_index_raises(self, mdata_kp):
        md, _ = mdata_kp
        with pytest.raises(ValueError):
            _get_values(md, "X_emb:0")

    def test_mod_obsm_component(self, mdata_kp):
        md, same_obs = mdata_kp
        md.mod["mod1"].obsm["X_pca"] = np.column_stack(
            [np.arange(20.0), np.arange(20.0) * 2]
        )
        vals = _get_values(md, "mod1:X_pca:2")
        assert np.allclose(np.asarray(vals, dtype=float)[:20], np.arange(20.0) * 2)

    def test_missing_key_raises(self, mdata_kp):
        md, _ = mdata_kp
        with pytest.raises(ValueError):
            _get_values(md, "not_a_key")

    def test_ambiguous_var_raises(self):
        m1 = make_adata(5, 2)
        m2 = make_adata(5, 2)
        md = mu.MuData({"m1": m1, "m2": m2})  # both have var0/var1
        with pytest.raises(ValueError, match="multiple modalities"):
            _get_values(md, "var0")

    def test_layer_fallback(self):
        m1 = make_adata(5, 2)
        m1.layers["scaled"] = np.asarray(m1.X) * 10
        md = mu.MuData({"m1": m1})
        vals = _get_values(md, "var1", layer="scaled")
        assert np.allclose(
            np.asarray(vals, dtype=float), np.asarray(m1.X)[:, 1] * 10
        )

    def test_raw_fallback(self):
        m1 = make_adata(5, 3)
        m1.raw = m1
        orig = np.asarray(m1.X)[:, 2].copy()
        # drop var2 from the modality — still findable via raw
        mu.pp.filter_var(m1, ["var0", "var1"])
        md = mu.MuData({"m1": m1})
        vals = _get_values(md, "var2")
        assert np.allclose(np.asarray(vals, dtype=float), orig)

    def test_multiple_keys(self, mdata_kp):
        md, _ = mdata_kp
        df = _get_values(md, ["global_col", "X_emb:1"])
        assert isinstance(df, pd.DataFrame)
        assert df.shape == (md.n_obs, 2)
