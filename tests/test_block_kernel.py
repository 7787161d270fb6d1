"""Fused residual-block megakernel tests (Pallas interpret mode on CPU).

Covers ``kernels.block.fused_basic_block`` against its jnp oracle and an
exact numpy composition, plus the ``inference.fuse_blocks`` deployment pass
(eligibility, batch dispatch, numerical parity with the unfused deployed
model). Mirrors the whole-block semantics of reference
bnn/models/layers/res_block.py BasicBlock after BN folding.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from bnn_tpu import BConfig, nn, prepare_binary_model
from bnn_tpu.inference import deploy, fuse_blocks, optimize_deployed
from bnn_tpu.inference.megablock import FusedBlock
from bnn_tpu.kernels.block import (
    fused_basic_block,
    fused_basic_block_reference,
)
from bnn_tpu.models.layers import BasicBlock
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


def _inputs(n, h, w, c, seed=0):
    ks = jax.random.split(jax.random.key(seed), 7)
    # keep pre-sign values away from 0 so fused/oracle/exact paths agree
    x = jax.random.normal(ks[0], (n, h, w, c)) + 0.01
    w1 = jnp.where(jax.random.normal(ks[1], (3, 3, c, c)) >= 0, 1, -1)
    w2 = jnp.where(jax.random.normal(ks[2], (3, 3, c, c)) >= 0, 1, -1)
    s1 = jax.random.uniform(ks[3], (c,), minval=0.5, maxval=1.5)
    a1 = jax.random.normal(ks[4], (c,)) * 0.1
    s2 = jax.random.uniform(ks[5], (c,), minval=0.5, maxval=1.5)
    a2 = jax.random.normal(ks[6], (c,)) * 0.1
    return x, w1.astype(jnp.int8), w2.astype(jnp.int8), s1, a1, s2, a2


class TestFusedBasicBlockKernel:
    def _check(self, n, h, w, c, seed=0, rtol=1e-4, **kw):
        x, w1, w2, s1, a1, s2, a2 = _inputs(n, h, w, c, seed)
        ref = fused_basic_block_reference(
            x, w1, w2, s1, a1, s2, a2,
            **{k: v for k, v in kw.items()
               if k in ("act", "prelu1", "prelu2", "threshold")})
        out = fused_basic_block(x, w1, w2, s1, a1, s2, a2,
                                interpret=True, **kw)
        np.testing.assert_allclose(out, ref, rtol=rtol, atol=1e-4)

    @pytest.mark.parametrize("taps", [1, 3, 9])
    def test_taps_per_dot(self, taps):
        self._check(2, 8, 8, 16, taps_per_dot=taps)

    @pytest.mark.parametrize("rows", [2, 4, 8])
    def test_row_tiling_halo(self, rows):
        # rows < h exercises the 2-row halo BlockSpecs + boundary zeroing
        self._check(1, 8, 8, 16, rows_per_step=rows)

    def test_batch_grid(self):
        self._check(4, 6, 6, 8, rows_per_step=6)

    @pytest.mark.parametrize("act", ["relu", "prelu", "identity",
                                     ("prelu", "relu")])
    def test_activations(self, act):
        kw = {"act": act}
        if "prelu" in (act if isinstance(act, tuple) else (act,)):
            kw["prelu1"] = jnp.full((16,), 0.3)
            kw["prelu2"] = 0.1
        self._check(1, 8, 8, 16, **kw)

    def test_threshold(self):
        thr = jax.random.normal(jax.random.key(9), (16,)) * 0.2
        self._check(1, 8, 8, 16, threshold=thr)

    @pytest.mark.parametrize("z21", [True, False])
    def test_sign_zero_convention(self, z21):
        # exact zeros in the input (as after ReLU): the two conventions
        # must each match their oracle, and must differ from each other
        x, w1, w2, s1, a1, s2, a2 = _inputs(1, 8, 8, 16, seed=7)
        x = jnp.maximum(x, 0.0)  # ~half exact zeros
        ref = fused_basic_block_reference(x, w1, w2, s1, a1, s2, a2,
                                          zero_to_one=z21)
        out = fused_basic_block(x, w1, w2, s1, a1, s2, a2,
                                zero_to_one=z21, interpret=True)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
        other = fused_basic_block_reference(x, w1, w2, s1, a1, s2, a2,
                                            zero_to_one=not z21)
        assert float(jnp.max(jnp.abs(ref - other))) > 1.0

    def test_bf16_io(self):
        x, w1, w2, s1, a1, s2, a2 = _inputs(1, 8, 8, 16)
        x = x.astype(jnp.bfloat16)
        ref = fused_basic_block_reference(x, w1, w2, s1, a1, s2, a2)
        out = fused_basic_block(x, w1, w2, s1, a1, s2, a2, interpret=True)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(out.astype(jnp.float32),
                                   ref.astype(jnp.float32),
                                   rtol=2e-2, atol=2e-2)

    def test_exact_integer_math(self):
        # independent exact composition in numpy (int accumulation)
        n, h, w, c = 1, 6, 6, 8
        x, w1, w2, s1, a1, s2, a2 = _inputs(n, h, w, c, seed=3)
        xs = np.where(np.asarray(x) >= 0, 1, -1).astype(np.int32)

        def conv(sv, wk):
            sp = np.pad(sv, ((0, 0), (1, 1), (1, 1), (0, 0)))
            out = np.zeros((n, h, w, c), np.int32)
            for dy in range(3):
                for dx in range(3):
                    out += np.einsum("nhwi,io->nhwo",
                                     sp[:, dy:dy + h, dx:dx + w, :],
                                     np.asarray(wk[dy, dx], np.int32))
            return out

        y1 = conv(xs, w1) * np.asarray(s1) + np.asarray(a1)
        y1 = np.maximum(y1, 0)
        hs = np.where(y1 >= 0, 1, -1).astype(np.int32)
        y2 = conv(hs, w2) * np.asarray(s2) + np.asarray(a2)
        exact = np.maximum(y2 + np.asarray(x), 0)
        out = fused_basic_block(x, w1, w2, s1, a1, s2, a2, interpret=True)
        np.testing.assert_allclose(out, exact, rtol=1e-4, atol=1e-4)


class TestFuseBlocksPass:
    def _deployed_block_model(self, c=8, act=nn.ReLU):
        rngs = nnx.Rngs(0)
        net = nn.Sequential(
            BasicBlock(c, c, rngs=rngs, activation=act),
            BasicBlock(c, c, rngs=rngs, activation=act),
        )
        model = prepare_binary_model(net, bconfig=BCONFIG)
        model.eval()
        # give BN running stats a non-trivial value
        x = jax.random.normal(jax.random.key(1), (4, 8, 8, c)) + 0.01
        model.train()
        model(x)
        model.eval()
        return deploy(model, use_pallas=False)

    @pytest.mark.parametrize("act", [nn.ReLU, nn.PReLU])
    def test_fuse_and_parity(self, act):
        dep = self._deployed_block_model(act=act)
        x = jax.random.normal(jax.random.key(2), (2, 8, 8, 8)) + 0.01
        optimize_deployed(dep)
        expected = dep(x)
        n = fuse_blocks(dep, interpret=True)
        assert n == 2
        assert isinstance(dep[0], FusedBlock)
        np.testing.assert_allclose(dep(x), expected, rtol=1e-4, atol=1e-4)

    def test_fuse_folds_bn_itself(self):
        dep = self._deployed_block_model()
        x = jax.random.normal(jax.random.key(3), (1, 8, 8, 8)) + 0.01
        expected = dep(x)
        n = fuse_blocks(dep, interpret=True)  # no optimize_deployed first
        assert n == 2
        np.testing.assert_allclose(dep(x), expected, rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    def test_large_batch_falls_back(self):
        dep = self._deployed_block_model()
        optimize_deployed(dep)
        x = jax.random.normal(jax.random.key(4), (3, 8, 8, 8)) + 0.01
        expected = dep(x)
        fuse_blocks(dep, max_fused_batch=2, interpret=True)
        # batch 3 > max_fused_batch: runs the original deployed ops
        np.testing.assert_allclose(dep(x), expected, rtol=1e-6, atol=1e-6)
        # batch 2 runs the megakernel, same numbers
        np.testing.assert_allclose(dep(x[:2]), expected[:2],
                                   rtol=1e-4, atol=1e-4)

    def test_shape_predicate_dispatch(self):
        from bnn_tpu.inference import default_fuse_predicate
        # v5e-measured win region: channel extremes only
        assert default_fuse_predicate(1, 56, 56, 64)
        assert default_fuse_predicate(1, 7, 7, 512)
        assert not default_fuse_predicate(1, 28, 28, 128)
        assert not default_fuse_predicate(1, 14, 14, 256)
        dep = self._deployed_block_model()
        optimize_deployed(dep)
        x = jax.random.normal(jax.random.key(5), (1, 8, 8, 8)) + 0.01
        expected = dep(x)
        # a predicate rejecting this c=8 model keeps the original ops
        fuse_blocks(dep, interpret=True, fuse_when=lambda n, h, w, c: c >= 64)
        np.testing.assert_allclose(dep(x), expected, rtol=1e-6, atol=1e-6)
        # fuse_when=None disables the filter: megakernel path, same numbers
        dep2 = self._deployed_block_model()
        optimize_deployed(dep2)
        assert fuse_blocks(dep2, interpret=True, fuse_when=None) == 2
        np.testing.assert_allclose(dep2(x), expected, rtol=1e-4, atol=1e-4)

    def test_fuse_blocks_idempotent(self):
        dep = self._deployed_block_model()
        optimize_deployed(dep)
        x = jax.random.normal(jax.random.key(6), (1, 8, 8, 8)) + 0.01
        assert fuse_blocks(dep, interpret=True) == 2
        expected = dep(x)
        # second pass must not wrap FusedBlock.block again
        assert fuse_blocks(dep, interpret=True) == 0
        assert isinstance(dep[0], FusedBlock)
        assert isinstance(dep[0].block, BasicBlock)
        np.testing.assert_allclose(dep(x), expected, rtol=1e-6, atol=1e-6)

    def test_relu_zero_parity_through_fuse(self):
        # block inputs with exact zeros (post-ReLU regime): deployed+fused
        # must match the QAT model bit-for-bit semantics (sign(0) == 0)
        rngs = nnx.Rngs(0)
        net = nn.Sequential(BasicBlock(8, 8, rngs=rngs, activation=nn.PReLU))
        model = prepare_binary_model(net, bconfig=BCONFIG)
        x = jnp.maximum(jax.random.normal(jax.random.key(7), (2, 8, 8, 8)),
                        0.0)
        model.train()
        model(x)
        model.eval()
        want = model(x)
        dep = deploy(model, use_pallas=False)
        optimize_deployed(dep)
        assert fuse_blocks(dep, interpret=True) == 1
        np.testing.assert_allclose(dep(x), want, rtol=1e-4, atol=1e-4)

    def test_strided_block_not_fused(self):
        rngs = nnx.Rngs(0)
        down = nn.Sequential(nn.Conv2d(8, 16, 1, stride=2, bias=False,
                                       rngs=rngs),
                             nn.BatchNorm2d(16, rngs=rngs))
        net = nn.Sequential(BasicBlock(8, 16, stride=2, downsample=down,
                                       rngs=rngs))
        model = prepare_binary_model(net, bconfig=BCONFIG)
        model.eval()
        dep = deploy(model, use_pallas=False)
        assert fuse_blocks(dep, interpret=True) == 0
        assert isinstance(dep[0], BasicBlock)


class TestPreActivationFusion:
    """Pre-activation (PreBasicBlock) megakernel path: threshold2 + pre
    ordering (reference bnn/models/layers/res_block.py:121-167)."""

    def test_kernel_pre_ordering_and_threshold2(self):
        from bnn_tpu.kernels.block import fused_basic_block_reference
        ks = jax.random.split(jax.random.key(11), 9)
        n, h, w, c = 2, 8, 8, 8
        x = jax.random.normal(ks[0], (n, h, w, c)) + 0.01
        w1 = jnp.where(jax.random.normal(ks[1], (3, 3, c, c)) >= 0, 1,
                       -1).astype(jnp.int8)
        w2 = jnp.where(jax.random.normal(ks[2], (3, 3, c, c)) >= 0, 1,
                       -1).astype(jnp.int8)
        args = (x, w1, w2,
                jax.random.normal(ks[3], (c,)) * 0.1 + 1,
                jax.random.normal(ks[4], (c,)) * 0.1,
                jax.random.normal(ks[5], (c,)) * 0.1 + 1,
                jax.random.normal(ks[6], (c,)) * 0.1)
        kw = dict(act="prelu", threshold=jax.random.normal(ks[7], (c,)) * .1,
                  threshold2=jax.random.normal(ks[8], (c,)) * 0.1,
                  pre=True, zero_to_one=False)
        ref = fused_basic_block_reference(*args, **kw)
        got = fused_basic_block(*args, interpret=True, **kw)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
        # pre ordering differs from post on the same inputs
        post = fused_basic_block_reference(*args, **dict(kw, pre=False))
        assert float(jnp.max(jnp.abs(post - ref))) > 1e-3

    def _deployed_preact(self, c=8, act=nn.PReLU):
        from bnn_tpu.models.layers import PreBasicBlock
        rngs = nnx.Rngs(0)
        net = nn.Sequential(
            PreBasicBlock(c, c, rngs=rngs, activation=act),
            PreBasicBlock(c, c, rngs=rngs, activation=act),
        )
        model = prepare_binary_model(net, bconfig=BCONFIG)
        x = jax.random.normal(jax.random.key(12), (4, 8, 8, c)) + 0.01
        model.train()
        model(x)
        model.eval()
        return deploy(model, use_pallas=False)

    def test_fuse_preact_and_parity(self):
        dep = self._deployed_preact()
        x = jax.random.normal(jax.random.key(13), (2, 8, 8, 8)) + 0.01
        optimize_deployed(dep)  # folds bn1/bn2 into sign thresholds
        expected = dep(x)
        assert fuse_blocks(dep, interpret=True) == 2
        assert isinstance(dep[0], FusedBlock) and dep[0].pre
        np.testing.assert_allclose(dep(x), expected, rtol=1e-4, atol=1e-4)

    def test_fuse_preact_folds_bn_itself(self):
        dep = self._deployed_preact()
        x = jax.random.normal(jax.random.key(14), (1, 8, 8, 8)) + 0.01
        expected = dep(x)
        assert fuse_blocks(dep, interpret=True) == 2  # no optimize first
        np.testing.assert_allclose(dep(x), expected, rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    def test_preact_resnet18_full_fusion(self):
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

        x = jax.random.normal(jax.random.key(15), (1, 32, 32, 3)) + 0.01
        want = build_dep()(x)
        dep = build_dep()
        # 5 stride-1 pre-act blocks + 3 pre-act downsample blocks
        # (pre-act down-fusion is on by default — measured 2.1x on v5e)
        assert fuse_blocks(dep, interpret=True) == 8
        np.testing.assert_allclose(dep(x), want, rtol=1e-5, atol=1e-5)
