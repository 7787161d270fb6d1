"""Bitpacking + binary GEMM kernel tests (Pallas in interpreter mode on CPU;
the same kernels compile for TPU via Mosaic)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bnn_tpu.kernels.packing import pack_bits, packed_words, unpack_bits
from bnn_tpu.kernels.gemm import (
    binary_gemm,
    binary_gemm_reference,
    popcount_gemm_reference,
)


class TestPacking:
    @pytest.mark.parametrize("k", [32, 64, 96, 33, 7, 100])
    def test_pack_unpack_roundtrip(self, k):
        w = jax.random.normal(jax.random.key(0), (k, 16))
        p = pack_bits(w, axis=-2)
        assert p.shape == (packed_words(k), 16)
        assert p.dtype == jnp.uint32
        u = unpack_bits(p, k, axis=-2)
        expected = jnp.where(w >= 0, 1.0, -1.0)
        np.testing.assert_array_equal(u[:k], expected)
        # padding rows must be exactly 0
        if packed_words(k) * 32 != k:
            np.testing.assert_array_equal(u[k:], 0.0)

    def test_compression_ratio(self):
        w = jax.random.normal(jax.random.key(1), (512, 512))
        p = pack_bits(w, axis=-2)
        assert w.size * 4 / (p.size * 4) == 32.0  # fp32 -> 1 bit

    def test_pack_axis_last(self):
        x = jax.random.normal(jax.random.key(2), (4, 64))
        p = pack_bits(x, axis=-1)
        assert p.shape == (4, 2)
        u = unpack_bits(p, 64, axis=-1)
        np.testing.assert_array_equal(u, jnp.where(x >= 0, 1.0, -1.0))


class TestBinaryGemm:
    def _check(self, m, k, n, scale=True, add=True, seed=0):
        kx, kw_, ks, kb = jax.random.split(jax.random.key(seed), 4)
        x = jax.random.normal(kx, (m, k))
        w = jax.random.normal(kw_, (k, n))
        wp = pack_bits(w, axis=-2)
        s = jax.random.normal(ks, (n,)) if scale else None
        b = jax.random.normal(kb, (n,)) if add else None
        ref = binary_gemm_reference(x, wp, k, s, b)
        out = binary_gemm(x, wp, k, s, b, interpret=True)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
        # cross-check against exact integer math
        xs = np.where(np.asarray(x) >= 0, 1.0, -1.0)
        ws = np.where(np.asarray(w) >= 0, 1.0, -1.0)
        exact = xs @ ws
        if scale:
            exact = exact * np.asarray(s)
        if add:
            exact = exact + np.asarray(b)
        np.testing.assert_allclose(out, exact, rtol=1e-4, atol=1e-4)

    def test_aligned(self):
        self._check(16, 256, 128)

    def test_unaligned_k(self):
        self._check(8, 100, 128)

    def test_unaligned_all(self):
        self._check(5, 70, 10)

    def test_multiple_k_tiles(self):
        self._check(8, 1024, 128)

    def test_no_scale_no_add(self):
        self._check(8, 256, 128, scale=False, add=False)

    def test_large_n_tiling(self):
        self._check(8, 256, 512)

    def test_sign_zero_is_plus_one(self):
        x = jnp.zeros((8, 32))
        w = jnp.ones((32, 128))
        wp = pack_bits(w, axis=-2)
        out = binary_gemm(x, wp, 32, interpret=True)
        np.testing.assert_array_equal(out, 32.0)  # (+1) . (+1) summed


class TestPopcountGemm:
    @pytest.mark.parametrize("m,k,n", [(4, 64, 8), (3, 100, 5), (8, 256, 16)])
    def test_matches_reference(self, m, k, n):
        kx, kw_ = jax.random.split(jax.random.key(3))
        x = jax.random.normal(kx, (m, k))
        w = jax.random.normal(kw_, (k, n))
        wp = pack_bits(w, axis=-2)
        ref = binary_gemm_reference(x, wp, k)
        pop = popcount_gemm_reference(x, wp, k)
        np.testing.assert_allclose(pop, ref, atol=1e-5)


class TestFusedConv:
    @pytest.mark.parametrize("h,c,o,k", [(8, 32, 16, 3), (8, 32, 16, 1),
                                         (10, 64, 128, 5)])
    def test_matches_xla_conv(self, h, c, o, k):
        from bnn_tpu.kernels.conv import binary_conv2d_s1
        from bnn_tpu import functional as F
        x = jax.random.normal(jax.random.key(0), (2, h, h, c))
        w = jnp.where(jax.random.normal(jax.random.key(1), (k, k, c, o)) >= 0,
                      1, -1).astype(jnp.int8)
        s = jnp.abs(jax.random.normal(jax.random.key(2), (o,)))
        b = jax.random.normal(jax.random.key(3), (o,))
        out = binary_conv2d_s1(x, w, s, b, interpret=True)
        ref = F.conv(jnp.where(x >= 0, 1.0, -1.0), w.astype(jnp.float32),
                     1, k // 2) * s + b
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)

    def test_supports_predicate(self):
        from bnn_tpu.kernels.conv import supports
        assert supports((3, 3), (1, 1), (1, 1), (1, 1), 1)
        assert not supports((3, 3), (2, 2), (1, 1), (1, 1), 1)
        assert not supports((3, 3), (1, 1), (0, 0), (1, 1), 1)
        assert not supports((2, 2), (1, 1), (1, 1), (1, 1), 1)


class TestDeployedPallasConvMode:
    def test_parity(self):
        from flax import nnx
        from bnn_tpu import BConfig, layers as blayers
        from bnn_tpu.inference.deploy import DeployedConv
        from bnn_tpu.ops import (BasicInputBinarizer, BasicScaleBinarizer,
                                 XNORWeightBinarizer)
        bc = BConfig(BasicInputBinarizer, BasicScaleBinarizer,
                     XNORWeightBinarizer)
        layer = blayers.Conv2d(32, 16, 3, padding=1, bconfig=bc,
                               rngs=nnx.Rngs(0))
        x = jax.random.normal(jax.random.key(5), (2, 8, 8, 32))
        x = jnp.where(x == 0, 1e-3, x)
        expected = layer(x)
        dep = DeployedConv(layer, mode="pallas-conv", interpret=True)
        np.testing.assert_allclose(dep(x), expected, rtol=1e-4, atol=1e-4)

    def test_unsupported_geometry_raises(self):
        # must be a real raise, not an assert: under python -O the guard
        # would vanish and the kernel would compute wrong strides silently
        from flax import nnx
        from bnn_tpu import BConfig, layers as blayers
        from bnn_tpu.inference.deploy import DeployedConv
        from bnn_tpu.ops import (BasicInputBinarizer, BasicScaleBinarizer,
                                 XNORWeightBinarizer)
        bc = BConfig(BasicInputBinarizer, BasicScaleBinarizer,
                     XNORWeightBinarizer)
        layer = blayers.Conv2d(32, 16, 3, stride=2, padding=1, bconfig=bc,
                               rngs=nnx.Rngs(0))
        dep = DeployedConv(layer, mode="pallas-conv", interpret=True)
        x = jax.random.normal(jax.random.key(6), (2, 8, 8, 32))
        with pytest.raises(ValueError, match="stride-1"):
            dep(x)


class TestPallasPopcountGemm:
    """Pallas packed-activation XNOR/popcount GEMM vs references.

    (Renamed from a second ``TestPopcountGemm``, which shadowed the
    reference-oracle class above — pytest silently collected only one.)
    """

    def _case(self, m, k, n, seed):
        kx, kw_ = jax.random.split(jax.random.key(seed))
        x = jax.random.normal(kx, (m, k))
        w = jnp.where(jax.random.normal(kw_, (k, n)) >= 0, 1.0, -1.0)
        return x, w

    @pytest.mark.parametrize("m,k,n", [(8, 64, 16), (17, 100, 33),
                                       (64, 512, 128), (5, 33, 7)])
    def test_matches_references(self, m, k, n):
        from bnn_tpu.kernels import (binary_gemm_reference, pack_bits,
                                     popcount_gemm, popcount_gemm_reference)
        x, w = self._case(m, k, n, 0)
        wp = pack_bits(w, axis=-2)
        xs = jnp.where(x >= 0, 1.0, -1.0)
        xp = pack_bits(xs, axis=-1)
        scale = jnp.linspace(0.5, 2.0, n)
        add = jnp.linspace(-1.0, 1.0, n)
        want = binary_gemm_reference(x, wp, k, scale, add)
        ref = popcount_gemm_reference(xs, wp, k, scale, add)
        got = popcount_gemm(xp, wp, k, scale, add, interpret=True)
        np.testing.assert_allclose(ref, want, atol=1e-4)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_block_tiling_boundaries(self):
        from bnn_tpu.kernels import (binary_gemm_reference, pack_bits,
                                     popcount_gemm)
        x, w = self._case(40, 300, 72, 3)
        wp = pack_bits(w, axis=-2)
        xp = pack_bits(jnp.where(x >= 0, 1.0, -1.0), axis=-1)
        want = binary_gemm_reference(x, wp, 300)
        got = popcount_gemm(xp, wp, 300, block_m=16, block_n=64, block_kw=8,
                            interpret=True)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_activation_hbm_bytes_are_32x_smaller(self):
        from bnn_tpu.kernels import pack_bits
        x = jnp.ones((128, 1024), jnp.float32)
        xp = pack_bits(x, axis=-1)
        assert xp.size * xp.dtype.itemsize * 32 == x.size * x.dtype.itemsize
