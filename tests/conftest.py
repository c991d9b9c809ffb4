"""Test config: run JAX on a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (SURVEY §4: TPU addition)."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# x64 on for tests: f64 inputs keep reference (numpy) precision, so golden
# values match to the printed decimal. TPU production runs f32.
os.environ.setdefault("JAX_ENABLE_X64", "1")
# Single-core machine: the persistent compilation cache makes repeated
# test runs skip XLA recompiles entirely.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

# The axon sitecustomize may have registered the TPU PJRT plugin at
# interpreter startup (importing jax before this conftest runs), making
# env-var overrides too late. Backends initialize lazily, so forcing the
# platform through jax.config still works here — giving the 8-device
# virtual CPU mesh the multi-chip sharding tests need (SURVEY §4).
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pytest
from scipy import sparse as sp


@pytest.fixture()
def filepath_h5mu(tmp_path):
    return str(tmp_path / "test.h5mu")


@pytest.fixture()
def filepath_hdf5(tmp_path):
    return str(tmp_path / "mofa_model.hdf5")


def make_adata(n_obs=50, n_vars=20, seed=0, sparse=False, obs_prefix="obs"):
    import muon_tpu as mu

    rng = np.random.default_rng(seed)
    if sparse:
        X = sp.random(n_obs, n_vars, density=0.3, random_state=seed, format="csr")
    else:
        X = rng.normal(size=(n_obs, n_vars)).astype(np.float32)
    obs = pd.DataFrame(index=pd.Index([f"{obs_prefix}{i}" for i in range(n_obs)]))
    var = pd.DataFrame(index=pd.Index([f"var{i}" for i in range(n_vars)]))
    return mu.AnnData(X=X, obs=obs, var=var)


@pytest.fixture()
def mdata():
    """Small two-modality MuData with shared obs (reference fixture pattern:
    tests/test_muon_preproc.py:14-21)."""
    import muon_tpu as mu

    mod1 = make_adata(50, 20, seed=1)
    mod2 = make_adata(50, 30, seed=2)
    return mu.MuData({"mod1": mod1, "mod2": mod2})
