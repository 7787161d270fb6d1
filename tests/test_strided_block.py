"""Strided (downsample) block megakernel tests (Pallas interpret on CPU).

Covers ``kernels.strided_block.fused_downsample_block`` against its jnp
oracle and the ``FusedDownBlock`` path of the ``inference.fuse_blocks``
pass (eligibility, batch/odd-shape dispatch, parity with the unfused
deployed model). Mirrors the stride-2 BasicBlock + AvgPool->1x1->BN
shortcut of reference bnn/models/layers/res_block.py:41-47 and
bnn/models/resnet.py:128-133 after deployment.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from bnn_tpu import BConfig, nn, prepare_binary_model
from bnn_tpu.inference import deploy, fuse_blocks, optimize_deployed
from bnn_tpu.inference.megablock import FusedDownBlock
from bnn_tpu.kernels.strided_block import (
    fused_downsample_block,
    fused_downsample_block_reference,
)
from bnn_tpu.models.layers import BasicBlock, conv1x1
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


def _case(n, h, w, ci, co, seed=0):
    ks = jax.random.split(jax.random.key(seed), 12)
    x = jax.random.normal(ks[0], (n, h, w, ci)) + 0.01
    args = (x, _pm1(ks[1], (3, 3, ci, co)), _pm1(ks[2], (3, 3, co, co)),
            _pm1(ks[3], (1, 1, ci, co)),
            jax.random.normal(ks[4], (co,)) * 0.1 + 1.0,
            jax.random.normal(ks[5], (co,)) * 0.1,
            jax.random.normal(ks[6], (co,)) * 0.1 + 1.0,
            jax.random.normal(ks[7], (co,)) * 0.1,
            jax.random.normal(ks[8], (co,)) * 0.1 + 1.0,
            jax.random.normal(ks[9], (co,)) * 0.1)
    kw = dict(threshold1=jax.random.normal(ks[10], (ci,)) * 0.1,
              thresholdd=jax.random.normal(ks[11], (ci,)) * 0.05)
    return args, kw


class TestFusedDownsampleBlockKernel:
    @pytest.mark.parametrize("act", ["relu", "prelu", "identity"])
    def test_acts(self, act):
        args, kw = _case(1, 8, 8, 8, 16)
        ref = fused_downsample_block_reference(*args, act=act, **kw)
        got = fused_downsample_block(*args, act=act, interpret=True, **kw)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("z21", [True, False])
    def test_sign_zero_convention(self, z21):
        args, kw = _case(2, 8, 8, 8, 16, seed=1)
        # exact zeros in the input exercise sign(0) on both sign sites
        x = args[0].at[:, ::2, ::2, :].set(0.0)
        args = (x,) + args[1:]
        kw = dict(kw, zero_to_one=z21)
        ref = fused_downsample_block_reference(*args, act="prelu", **kw)
        got = fused_downsample_block(*args, act="prelu", interpret=True,
                                     **kw)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_row_tiling_halo(self):
        args, kw = _case(1, 16, 12, 8, 8, seed=2)
        ref = fused_downsample_block_reference(*args, act="prelu", **kw)
        for rps in (2, 4, 8):
            got = fused_downsample_block(*args, act="prelu",
                                         rows_per_step=rps, interpret=True,
                                         **kw)
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_odd_out_height_single_step(self):
        # H2 = 7 (the layer4.0 shape family): one grid step, no halos
        args, kw = _case(1, 14, 14, 8, 16, seed=3)
        ref = fused_downsample_block_reference(*args, act="prelu", **kw)
        got = fused_downsample_block(*args, act="prelu", interpret=True,
                                     **kw)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_channel_reduction(self):
        args, kw = _case(2, 8, 8, 16, 8, seed=4)
        ref = fused_downsample_block_reference(*args, act="relu", **kw)
        got = fused_downsample_block(*args, act="relu", interpret=True,
                                     **kw)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_exact_integer_math(self):
        # epilogues = identity: outputs are exact small integers
        args, _ = _case(1, 8, 8, 8, 8, seed=5)
        x, w1, w2, wd = args[:4]
        one, zero = jnp.ones((8,)), jnp.zeros((8,))
        got = fused_downsample_block(x, w1, w2, wd, one, zero, one, zero,
                                     one, zero, act="identity",
                                     interpret=True)
        ref = fused_downsample_block_reference(x, w1, w2, wd, one, zero,
                                               one, zero, one, zero,
                                               act="identity")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        assert np.all(np.asarray(got) == np.round(np.asarray(got)))


def _downsample(ci, co, rngs):
    return nn.Sequential(
        nn.AvgPool2d(kernel_size=2, stride=2, ceil_mode=True,
                     count_include_pad=False),
        conv1x1(ci, co, rngs=rngs),
        nn.BatchNorm2d(co, rngs=rngs),
    )


class TestFusedDownBlockPass:
    def _deployed(self, ci=8, co=16, act=nn.ReLU):
        rngs = nnx.Rngs(0)
        net = nn.Sequential(
            BasicBlock(ci, co, stride=2,
                       downsample=_downsample(ci, co, rngs),
                       rngs=rngs, activation=act),
        )
        model = prepare_binary_model(net, bconfig=BCONFIG)
        x = jax.random.normal(jax.random.key(1), (4, 8, 8, ci)) + 0.01
        model.train()
        model(x)
        model.eval()
        return deploy(model, use_pallas=False)

    @pytest.mark.parametrize("act", [nn.ReLU, nn.PReLU])
    def test_fuse_and_parity(self, act):
        dep = self._deployed(act=act)
        x = jax.random.normal(jax.random.key(2), (2, 8, 8, 8)) + 0.01
        optimize_deployed(dep)
        expected = dep(x)
        assert fuse_blocks(dep, strided=True, interpret=True) == 1
        assert isinstance(dep[0], FusedDownBlock)
        np.testing.assert_allclose(dep(x), expected, rtol=1e-4, atol=1e-4)

    def test_fuse_folds_bns_itself(self):
        dep = self._deployed()
        x = jax.random.normal(jax.random.key(3), (1, 8, 8, 8)) + 0.01
        expected = dep(x)
        assert fuse_blocks(dep, strided=True, interpret=True) == 1  # no optimize first
        assert isinstance(dep[0].block.downsample[2], nn.Identity)
        np.testing.assert_allclose(dep(x), expected, rtol=1e-4, atol=1e-4)

    def test_batch_and_odd_shape_fall_back(self):
        dep = self._deployed()
        optimize_deployed(dep)
        fuse_blocks(dep, strided=True, max_fused_batch=2, interpret=True)
        x = jax.random.normal(jax.random.key(4), (3, 8, 8, 8)) + 0.01
        dep2 = self._deployed()
        optimize_deployed(dep2)
        np.testing.assert_allclose(dep(x), dep2(x), rtol=1e-6, atol=1e-6)
        # odd spatial size: falls back to the held block
        x_odd = jax.random.normal(jax.random.key(5), (1, 7, 7, 8)) + 0.01
        np.testing.assert_allclose(dep(x_odd), dep2(x_odd),
                                   rtol=1e-6, atol=1e-6)

    def test_strided_on_by_default(self):
        # default ON since round 3 (the earlier post-act "net loss" was
        # measured on a degenerate foldable model — megablock.py warning);
        # strided=False still opts out
        dep = self._deployed()
        optimize_deployed(dep)
        assert fuse_blocks(dep, strided=False, interpret=True) == 0
        assert isinstance(dep[0], BasicBlock)
        assert fuse_blocks(dep, interpret=True) == 1

    def test_idempotent(self):
        dep = self._deployed()
        optimize_deployed(dep)
        assert fuse_blocks(dep, strided=True, interpret=True) == 1
        assert fuse_blocks(dep, strided=True, interpret=True) == 0
        assert isinstance(dep[0].block, BasicBlock)

    @pytest.mark.slow
    def test_resnet18_full_fusion_parity(self):
        """End to end: all 8 blocks of a binary ResNet-18 fuse (5 + 3).

        Fused is compared against the UNFUSED deployed model (what fusion
        must preserve). An untrained ternary net is chaotic vs the QAT
        float path — exact-zero activations sit on sign boundaries and
        f32 rounding flips cascade — so QAT-vs-deployed parity is covered
        by the per-layer tests, not a whole-net logit compare.
        """
        from bnn_tpu import models

        def build_deployed():
            m = models.resnet18(num_classes=10, rngs=nnx.Rngs(0))
            m = prepare_binary_model(
                m, bconfig=BCONFIG,
                ignore_layers_name=["_first_", "_last_"])
            m.eval()
            d = deploy(m, use_pallas=False)
            optimize_deployed(d)
            return d

        x = jax.random.normal(jax.random.key(6), (1, 32, 32, 3)) + 0.01
        want = build_deployed()(x)
        dep = build_deployed()
        assert fuse_blocks(dep, strided=True, interpret=True) == 8
        n_down = sum(isinstance(m, FusedDownBlock)
                     for _, m in __import__("bnn_tpu").binarize
                     .named_modules(dep))
        assert n_down == 3
        np.testing.assert_allclose(dep(x), want, rtol=1e-5, atol=1e-5)


class TestPreActDownBlockPass:
    """Pre-activation downsample blocks fuse by default (as do post-act
    ones since round 3 — megablock.py's measurement warning explains the
    earlier post-act opt-out)."""

    def _deployed(self, ci=8, co=16):
        from bnn_tpu.models.layers import PreBasicBlock
        rngs = nnx.Rngs(0)
        net = nn.Sequential(
            PreBasicBlock(ci, co, stride=2,
                          downsample=_downsample(ci, co, rngs),
                          rngs=rngs, activation=nn.PReLU),
        )
        model = prepare_binary_model(net, bconfig=BCONFIG)
        x = jax.random.normal(jax.random.key(21), (4, 8, 8, ci)) + 0.01
        model.train()
        model(x)
        model.eval()
        return deploy(model, use_pallas=False)

    def test_fused_by_default_with_parity(self):
        dep = self._deployed()
        x = jax.random.normal(jax.random.key(22), (2, 8, 8, 8)) + 0.01
        optimize_deployed(dep)  # folds bn1/bn2 into thresholds, ds bn after
        expected = dep(x)
        assert fuse_blocks(dep, interpret=True) == 1  # no strided=True
        assert isinstance(dep[0], FusedDownBlock) and dep[0].pre
        np.testing.assert_allclose(dep(x), expected, rtol=1e-4, atol=1e-4)

    def test_folds_bns_itself(self):
        dep = self._deployed()
        x = jax.random.normal(jax.random.key(23), (1, 8, 8, 8)) + 0.01
        expected = dep(x)
        assert fuse_blocks(dep, interpret=True) == 1
        blk = dep[0].block
        assert isinstance(blk.bn1, nn.Identity)
        assert blk.conv1.threshold is not None  # folded BN-before
        np.testing.assert_allclose(dep(x), expected, rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    def test_preact_resnet18_all_blocks_fuse(self):
        from bnn_tpu import models
        from bnn_tpu.models.layers import PreBasicBlock

        def build_dep():
            m = models.resnet18(num_classes=10, block_type=PreBasicBlock,
                                activation=nn.PReLU, rngs=nnx.Rngs(0))
            m = prepare_binary_model(
                m, bconfig=BCONFIG,
                ignore_layers_name=["_first_", "_last_"])
            m.eval()
            d = deploy(m, use_pallas=False)
            optimize_deployed(d)
            return d

        x = jax.random.normal(jax.random.key(24), (1, 32, 32, 3)) + 0.01
        want = build_dep()(x)
        dep = build_dep()
        assert fuse_blocks(dep, interpret=True) == 8
        np.testing.assert_allclose(dep(x), want, rtol=1e-5, atol=1e-5)
