"""LazyDeviceCSR: transformed sparse values stay on device until a host
read (ops/sparse.to_scipy_data device path; see docs/design.md 'sparse
substrate')."""

import numpy as np
import pytest
from scipy import sparse as sp

from muon_tpu.ops import sparse as dsp
from muon_tpu.ops.sparse import LazyDeviceCSR


@pytest.fixture
def tf_pair():
    X = sp.random(300, 200, density=0.05, format="csr", random_state=0,
                  dtype=np.float32)
    X.data = np.round(X.data * 4 + 1).astype(np.float32)
    dX = dsp.from_scipy(X)
    nd = dsp.tfidf_data(dX)
    return X, dX, nd


class TestLazyDeviceCSR:
    def test_lazy_until_read(self, tf_pair):
        X, dX, nd = tf_pair
        out = dsp.to_scipy_data(X, nd, device_X=dX)
        assert isinstance(out, LazyDeviceCSR)
        assert not out.materialized()
        # device fast path must not force the download
        dX2 = dsp.from_scipy(out)
        assert not out.materialized()
        assert dX2.data is nd  # reused device values, no re-upload

    def test_values_correct_on_materialization(self, tf_pair):
        X, dX, nd = tf_pair
        out = dsp.to_scipy_data(X, nd, device_X=dX)
        eager = dsp.to_scipy_data(X, np.asarray(nd))
        np.testing.assert_allclose(out.data, eager.data, rtol=1e-6)
        assert out.materialized()
        # scipy ops behave like a plain csr after materialization
        v = out @ np.ones(X.shape[1], np.float32)
        np.testing.assert_allclose(
            v, eager @ np.ones(X.shape[1], np.float32), rtol=1e-6
        )

    def test_assignment_drops_device_cache(self, tf_pair):
        X, dX, nd = tf_pair
        out = dsp.to_scipy_data(X, nd, device_X=dX)
        out.data = np.ones(X.nnz, np.float32)
        assert out.__dict__.get("_muon_tpu_device") is None
        # next upload must see the NEW values
        dX2 = dsp.from_scipy(out)
        np.testing.assert_allclose(
            np.asarray(dX2.data)[: X.nnz], np.ones(X.nnz), rtol=1e-6
        )

    def test_copy_materializes(self, tf_pair):
        X, dX, nd = tf_pair
        out = dsp.to_scipy_data(X, nd, device_X=dX)
        c = out.copy()
        np.testing.assert_allclose(
            c.data, dsp.to_scipy_data(X, np.asarray(nd)).data, rtol=1e-6
        )

    def test_eager_path_without_device_tag(self, tf_pair):
        X, dX, nd = tf_pair
        out = dsp.to_scipy_data(X, np.asarray(nd))
        assert not isinstance(out, LazyDeviceCSR)
        assert isinstance(out, sp.csr_matrix)
