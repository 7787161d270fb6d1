"""Space-to-depth stem rewrite: exactness and model-level parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from bnn_tpu import models, nn
from bnn_tpu import functional as F
from bnn_tpu.inference.stem import (
    SpaceToDepthConv,
    space_to_depth_stem,
)


@pytest.mark.parametrize(
    "k,pad,cin,cout,h,w,bias",
    [
        (7, 3, 3, 64, 32, 32, False),   # the basic ResNet stem shape
        (3, 1, 3, 16, 16, 20, False),   # the DaBNN stem first conv
        (5, 2, 4, 8, 16, 16, True),
        (2, 0, 3, 8, 16, 16, False),    # even kernel
        (7, 2, 3, 8, 18, 18, True),     # even pad, kernel+pad parity mix
        (1, 0, 6, 8, 8, 8, False),      # pointwise stride-2
    ],
)
def test_s2d_conv_matches_direct(k, pad, cin, cout, h, w, bias):
    rngs = nnx.Rngs(0)
    conv = nn.Conv2d(cin, cout, k, stride=2, padding=pad, bias=bias,
                     rngs=rngs)
    x = jax.random.normal(jax.random.key(1), (2, h, w, cin))
    ref = conv(x)
    got = SpaceToDepthConv(conv)(x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_odd_spatial_falls_back():
    conv = nn.Conv2d(3, 8, 3, stride=2, padding=1, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.key(1), (1, 15, 15, 3))
    np.testing.assert_allclose(SpaceToDepthConv(conv)(x), conv(x),
                               rtol=1e-6, atol=1e-6)


def test_rewrite_targets_only_small_cin_stride2():
    rngs = nnx.Rngs(0)
    net = nn.Sequential(
        nn.Conv2d(3, 32, 7, stride=2, padding=3, bias=False, rngs=rngs),
        nn.Conv2d(32, 32, 3, stride=2, padding=1, bias=False, rngs=rngs),
        nn.Conv2d(32, 32, 3, stride=1, padding=1, bias=False, rngs=rngs),
    )
    assert space_to_depth_stem(net) == 1
    assert isinstance(net[0], SpaceToDepthConv)
    assert isinstance(net[1], nn.Conv2d)  # C_in too large
    assert isinstance(net[2], nn.Conv2d)  # stride 1
    assert space_to_depth_stem(net) == 0  # idempotent, no double-wrap


def test_resnet18_stem_rewrite_parity():
    model = models.resnet18(num_classes=10, rngs=nnx.Rngs(0))
    model.eval()
    x = jax.random.normal(jax.random.key(2), (2, 32, 32, 3))
    ref = model(x)
    assert space_to_depth_stem(model) == 1
    out = model(x)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_dabnn_stem_rewrite_parity():
    model = models.resnet18(num_classes=10, stem_type="dabnn",
                            rngs=nnx.Rngs(0))
    model.eval()
    x = jax.random.normal(jax.random.key(3), (2, 32, 32, 3))
    ref = model(x)
    # both stride-2 small-C_in convs: conv1 (C_in=3) and conv2_2 (C_in=16)
    assert space_to_depth_stem(model) == 2
    np.testing.assert_allclose(model(x), ref, rtol=2e-4, atol=2e-4)


def test_grad_flows_through_s2d(tmp_path):
    """The rewrite is trace-time only; grads still reach the shared kernel."""
    conv = nn.Conv2d(3, 8, 7, stride=2, padding=3, bias=False,
                     rngs=nnx.Rngs(0))
    s2d = SpaceToDepthConv(conv)
    x = jax.random.normal(jax.random.key(4), (1, 16, 16, 3))

    def loss(m, x):
        return jnp.sum(m(x) ** 2)

    g_ref = nnx.grad(loss)(conv, x)
    g_s2d = nnx.grad(loss)(s2d, x)
    ref_leaf = jax.tree.leaves(g_ref)[0]
    s2d_leaf = jax.tree.leaves(g_s2d)[0]
    np.testing.assert_allclose(s2d_leaf, ref_leaf, rtol=1e-4, atol=1e-5)


class TestFusedStemKernel:
    """Pallas stem megakernel (interpret mode) vs the conv/pool oracle."""

    def _check(self, n, h, w, c, o, rps):
        from bnn_tpu.kernels.stem import fused_stem, fused_stem_reference
        k1, k2, k3 = jax.random.split(jax.random.key(n * h + w), 3)
        x = jax.random.normal(k1, (n, h, w, c))
        wk = jax.random.normal(k2, (7, 7, c, o)) * 0.1
        b = jax.random.normal(k3, (o,))
        ref = fused_stem_reference(x, wk, b)
        got = fused_stem(x, wk, b, rows_per_step=rps, interpret=True)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_single_block(self):
        self._check(1, 16, 8, 3, 8, None)

    def test_multi_block_grid(self):
        self._check(2, 16, 8, 3, 8, 2)

    def test_channels_padded(self):
        self._check(1, 8, 8, 1, 8, 2)

    def test_resnet_shape_family(self):
        self._check(1, 32, 32, 3, 16, 4)

    def test_no_bias(self):
        from bnn_tpu.kernels.stem import fused_stem, fused_stem_reference
        x = jax.random.normal(jax.random.key(0), (1, 16, 16, 3))
        wk = jax.random.normal(jax.random.key(1), (7, 7, 3, 8)) * 0.1
        np.testing.assert_allclose(
            fused_stem(x, wk, interpret=True),
            fused_stem_reference(x, wk), rtol=1e-5, atol=1e-5)


class TestFuseStemPass:
    def _model(self, **kw):
        m = models.resnet18(num_classes=10, rngs=nnx.Rngs(0), **kw)
        m.eval()
        return m

    def test_fuse_and_parity(self):
        from bnn_tpu.inference import FusedStem, fuse_stem
        m = self._model()
        x = jax.random.normal(jax.random.key(2), (2, 32, 32, 3))
        ref = m(x)
        assert fuse_stem(m, interpret=True) == 1
        assert isinstance(m.conv1, FusedStem)
        assert isinstance(m.bn1, nn.Identity)
        assert isinstance(m.maxpool, nn.Identity)
        np.testing.assert_allclose(m(x), ref, rtol=2e-4, atol=2e-4)

    def test_fallback_above_batch_cap(self):
        from bnn_tpu.inference import fuse_stem
        m = self._model()
        x = jax.random.normal(jax.random.key(3), (3, 32, 32, 3))
        ref = m(x)
        assert fuse_stem(m, max_batch=2) == 1  # B=3 > cap -> unfused path
        np.testing.assert_allclose(m(x), ref, rtol=2e-4, atol=2e-4)

    def test_wraps_space_to_depth_conv(self):
        from bnn_tpu.inference import fuse_stem, space_to_depth_stem
        m = self._model()
        x = jax.random.normal(jax.random.key(4), (1, 32, 32, 3))
        ref = m(x)
        assert space_to_depth_stem(m) == 1
        assert fuse_stem(m, interpret=True) == 1
        np.testing.assert_allclose(m(x), ref, rtol=2e-4, atol=2e-4)

    def test_dabnn_stem_not_fused(self):
        from bnn_tpu.inference import fuse_stem
        m = self._model(stem_type="dabnn")
        assert fuse_stem(m) == 0

    def test_idempotent(self):
        from bnn_tpu.inference import fuse_stem
        m = self._model()
        assert fuse_stem(m, interpret=True) == 1
        assert fuse_stem(m, interpret=True) == 0


class TestFusedStemV2:
    """Phase-decomposed B=1 stem kernel (kernels/stem.py fused_stem_v2)."""

    def test_matches_reference(self):
        from bnn_tpu.kernels.stem import fused_stem_reference, fused_stem_v2

        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
        w = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, jnp.float32)
        b = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
        got = fused_stem_v2(x, w, b, interpret=True)
        ref = fused_stem_reference(x, w, b)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_fused_stem_module_dispatches_v2_at_b1(self):
        """FusedStem must run v2 at B=1 (H % 16) and stay exact."""
        from bnn_tpu import models
        from bnn_tpu.inference import fuse_stem
        from bnn_tpu.inference.stem import FusedStem

        rng = np.random.RandomState(4)
        m = models.resnet18(num_classes=10, rngs=nnx.Rngs(0))
        m.eval()
        x1 = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
        ref = F.max_pool(jnp.maximum(m.bn1(m.conv1(x1)), 0), 3, 2, 1)
        assert fuse_stem(m, interpret=True) == 1
        assert isinstance(m.conv1, FusedStem)
        np.testing.assert_allclose(m.conv1(x1), ref, rtol=1e-4, atol=1e-4)
        # B=2 takes the v1 grid kernel; B=9 the unfused fallback — both exact
        x2 = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
        ref2 = F.max_pool(jnp.maximum(m.bn1(
            m.conv1._inner()(x2)), 0), 3, 2, 1)
        np.testing.assert_allclose(m.conv1(x2), ref2, rtol=1e-4, atol=1e-4)


class TestFusedStemV3:
    def test_matches_reference(self):
        from bnn_tpu.kernels.stem import fused_stem_reference, fused_stem_v3

        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
        w = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, jnp.float32)
        b = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
        got = fused_stem_v3(x, w, b, interpret=True)
        ref = fused_stem_reference(x, w, b)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_224(self):
        """Full ImageNet geometry (the deployed serving shape)."""
        from bnn_tpu.kernels.stem import fused_stem_reference, fused_stem_v3

        rng = np.random.RandomState(6)
        x = jnp.asarray(rng.randn(1, 224, 224, 3), jnp.float32)
        w = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, jnp.float32)
        got = fused_stem_v3(x, w, None, interpret=True)
        ref = fused_stem_reference(x, w, None)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_fused_stem_v3_non_square():
    """Non-square inputs (review r3): v3's per-phase col count must come
    from the WIDTH, not the height."""
    from bnn_tpu.kernels.stem import fused_stem_reference, fused_stem_v3

    rng = np.random.RandomState(9)
    for h, w in ((32, 48), (48, 32), (16, 64)):
        x = jnp.asarray(rng.randn(1, h, w, 3), jnp.float32)
        wk = jnp.asarray(rng.randn(7, 7, 3, 32) * 0.1, jnp.float32)
        got = fused_stem_v3(x, wk, None, interpret=True)
        ref = fused_stem_reference(x, wk, None)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
