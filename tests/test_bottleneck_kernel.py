"""Bottleneck megakernel tests (Pallas interpret mode on CPU).

Covers ``kernels.bottleneck.fused_bottleneck`` against its jnp oracle and
the ``FusedBottleneck`` path of ``inference.fuse_blocks`` on a binary
ResNet-50 (reference bnn/models/layers/res_block.py:59-118).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from bnn_tpu import BConfig, models, nn, prepare_binary_model
from bnn_tpu.inference import deploy, fuse_blocks, optimize_deployed
from bnn_tpu.inference.megablock import FusedBottleneck
from bnn_tpu.kernels.bottleneck import (
    fused_bottleneck,
    fused_bottleneck_reference,
)
from bnn_tpu.models.layers import Bottleneck
from bnn_tpu.ops import (
    BasicInputBinarizer,
    BasicScaleBinarizer,
    XNORWeightBinarizer,
)

BCONFIG = BConfig(
    activation_pre_process=BasicInputBinarizer,
    activation_post_process=BasicScaleBinarizer,
    weight_pre_process=XNORWeightBinarizer,
)


def _pm1(key, shape):
    return jnp.where(jax.random.bernoulli(key, 0.5, shape), 1, -1) \
        .astype(jnp.int8)


def _case(n, h, w, c, width, seed=0):
    ks = jax.random.split(jax.random.key(seed), 16)
    x = jax.random.normal(ks[0], (n, h, w, c)) + 0.01
    args = (x, _pm1(ks[1], (1, 1, c, width)),
            _pm1(ks[2], (3, 3, width, width)),
            _pm1(ks[3], (1, 1, width, c)))
    scales = tuple(
        jax.random.normal(ks[4 + i], (width if i < 4 else c,)) * 0.1
        + (1.0 if i % 2 == 0 else 0.0) for i in range(6))
    kw = dict(threshold1=jax.random.normal(ks[10], (c,)) * 0.1,
              threshold2=jax.random.normal(ks[11], (width,)) * 0.1,
              threshold3=jax.random.normal(ks[12], (width,)) * 0.1,
              prelu1=jax.random.normal(ks[13], (width,)) * 0.1 + 0.2,
              prelu3=jax.random.normal(ks[14], (c,)) * 0.1 + 0.2)
    return args + scales, kw


class TestFusedBottleneckKernel:
    @pytest.mark.parametrize("act", ["relu", "prelu", "identity"])
    def test_acts(self, act):
        args, kw = _case(1, 8, 8, 16, 8)
        ref = fused_bottleneck_reference(*args, act=act, **kw)
        got = fused_bottleneck(*args, act=act, interpret=True, **kw)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("z21", [True, False])
    def test_sign_zero_and_tiling(self, z21):
        args, kw = _case(2, 8, 8, 16, 8, seed=1)
        kw = dict(kw, zero_to_one=z21)
        ref = fused_bottleneck_reference(*args, act="prelu", **kw)
        for rps in (2, 4, None):
            got = fused_bottleneck(*args, act="prelu", rows_per_step=rps,
                                   interpret=True, **kw)
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_projection_shortcut(self):
        # ResNet-50 layer1.0: stride 1, channels change, 1x1 projection
        ks = jax.random.split(jax.random.key(9), 10)
        c, cout, width = 8, 32, 8
        x = jax.random.normal(ks[0], (2, 8, 8, c)) + 0.01
        args = (x, _pm1(ks[1], (1, 1, c, width)),
                _pm1(ks[2], (3, 3, width, width)),
                _pm1(ks[3], (1, 1, width, cout)),
                jax.random.normal(ks[4], (width,)) * 0.1 + 1, None,
                None, None,
                jax.random.normal(ks[5], (cout,)) * 0.1 + 1, None)
        kw = dict(wd=_pm1(ks[6], (1, 1, c, cout)),
                  scaled=jax.random.normal(ks[7], (cout,)) * 0.1 + 1,
                  addd=jax.random.normal(ks[8], (cout,)) * 0.1,
                  thresholdd=jax.random.normal(ks[9], (c,)) * 0.05,
                  act="prelu", zero_to_one=False)
        ref = fused_bottleneck_reference(*args, **kw)
        got = fused_bottleneck(*args, interpret=True, **kw)
        assert got.shape[-1] == cout
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_mixed_acts_and_odd_h(self):
        args, kw = _case(1, 7, 8, 16, 8, seed=2)
        ref = fused_bottleneck_reference(
            *args, act=("prelu", "identity", "relu"), **kw)
        got = fused_bottleneck(*args, act=("prelu", "identity", "relu"),
                               interpret=True, **kw)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


class TestFuseBottleneckPass:
    def _deployed(self, c=16, planes=4):
        rngs = nnx.Rngs(0)
        net = nn.Sequential(
            Bottleneck(c, planes, rngs=rngs, activation=nn.PReLU),
        )
        model = prepare_binary_model(net, bconfig=BCONFIG)
        x = jax.random.normal(jax.random.key(1), (4, 8, 8, c)) + 0.01
        model.train()
        model(x)
        model.eval()
        return deploy(model, use_pallas=False)

    @pytest.mark.slow
    def test_fuse_and_parity(self):
        dep = self._deployed()
        x = jax.random.normal(jax.random.key(2), (2, 8, 8, 16)) + 0.01
        optimize_deployed(dep)
        expected = dep(x)
        assert fuse_blocks(dep, interpret=True) == 1
        assert isinstance(dep[0], FusedBottleneck)
        np.testing.assert_allclose(dep(x), expected, rtol=1e-4, atol=1e-4)

    def test_batch_cap_falls_back(self):
        dep = self._deployed()
        optimize_deployed(dep)
        x = jax.random.normal(jax.random.key(3), (3, 8, 8, 16)) + 0.01
        expected = dep(x)
        fuse_blocks(dep, max_fused_batch=2, interpret=True)
        np.testing.assert_allclose(dep(x), expected, rtol=1e-6, atol=1e-6)

    @pytest.mark.slow
    def test_resnet50_fusion_parity(self):
        def build_dep():
            m = models.resnet50(num_classes=10, rngs=nnx.Rngs(0))
            m = prepare_binary_model(
                m, bconfig=BCONFIG,
                ignore_layers_name=["_first_", "_last_"])
            m.eval()
            d = deploy(m, use_pallas=False)
            optimize_deployed(d)
            return d

        x = jax.random.normal(jax.random.key(4), (1, 32, 32, 3)) + 0.01
        want = build_dep()(x)
        dep = build_dep()
        # 16 blocks - 3 strided (layer1.0's stride-1 projection fuses too)
        assert fuse_blocks(dep, interpret=True) == 13
        np.testing.assert_allclose(dep(x), want, rtol=1e-5, atol=1e-5)
