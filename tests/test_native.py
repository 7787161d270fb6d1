"""Tests for the native C++ XNOR/popcount host engine."""
import numpy as np
import pytest

from bnn_tpu import native
from bnn_tpu.kernels.packing import pack_bits
from bnn_tpu.kernels.gemm import binary_gemm_reference

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native build unavailable")


class TestNativePacking:
    @pytest.mark.parametrize("k", [32, 64, 100, 7])
    def test_pack_rows_matches_jnp_layout(self, k):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4, k)).astype(np.float32)
        ours = native.pack_rows(x)
        jnp_packed = np.asarray(pack_bits(x, axis=-1))
        np.testing.assert_array_equal(ours, jnp_packed)

    @pytest.mark.parametrize("k,n", [(64, 16), (100, 10), (256, 128)])
    def test_pack_weights_matches_jnp_layout(self, k, n):
        rng = np.random.default_rng(1)
        w = rng.normal(size=(k, n)).astype(np.float32)
        ours = native.pack_weights(w)
        jnp_packed = np.asarray(pack_bits(w, axis=-2))
        np.testing.assert_array_equal(ours, jnp_packed)


class TestNativeGemm:
    @pytest.mark.parametrize("m,k,n", [(4, 64, 8), (3, 100, 5), (16, 512, 64)])
    def test_matches_reference(self, m, k, n):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(m, k)).astype(np.float32)
        w = rng.normal(size=(k, n)).astype(np.float32)
        wp = native.pack_weights(w)
        scale = np.abs(rng.normal(size=n)).astype(np.float32)
        add = rng.normal(size=n).astype(np.float32)
        out = native.gemm(x, wp, k, scale, add)
        ref = np.asarray(binary_gemm_reference(x, np.asarray(wp), k, scale, add))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)

    def test_no_scale(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(8, 96)).astype(np.float32)
        w = rng.normal(size=(96, 32)).astype(np.float32)
        out = native.gemm(x, native.pack_weights(w), 96)
        exact = np.where(x >= 0, 1.0, -1.0) @ np.where(w >= 0, 1.0, -1.0)
        np.testing.assert_array_equal(out, exact)

    def test_threads_reported(self):
        assert native.num_threads() >= 1


class TestLoaderBounds:
    """The C batch-assembly kernel takes no N: Python must bounds-check
    (a bad index would read out-of-bounds memory instead of raising)."""

    def _store(self):
        imgs = np.zeros((8, 4, 4, 3), np.uint8)
        labels = np.arange(8, dtype=np.int32)
        one = np.ones(3, np.float32)
        return imgs, labels, one

    def test_out_of_range_index_raises(self):
        if not native.loader_available():
            pytest.skip("loader build unavailable")
        imgs, labels, one = self._store()
        with pytest.raises(IndexError, match="out of range"):
            native.load_batch(imgs, np.array([0, 8]), labels, one, one * 0)
        with pytest.raises(IndexError, match="out of range"):
            native.load_batch(imgs, np.array([-1]), labels, one, one * 0)

    def test_short_labels_raise(self):
        if not native.loader_available():
            pytest.skip("loader build unavailable")
        imgs, _, one = self._store()
        with pytest.raises(ValueError, match="labels length"):
            native.load_batch(imgs, np.array([0]), np.zeros(3, np.int32),
                              one, one * 0)
