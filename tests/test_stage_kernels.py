"""Whole-stage megakernels (kernels/model.py) + the fusion pass
(inference/stages.py). Kernels run in interpret mode on CPU against the
jnp oracles / the unfused deployed graph."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from bnn_tpu import BConfig, models, prepare_binary_model
from bnn_tpu.inference import deploy, fuse_blocks, fuse_stages, optimize_deployed
from bnn_tpu.inference.stages import FusedStage
from bnn_tpu.kernels.model import (
    BlockParams,
    fused_down_stage,
    fused_down_stage_reference,
    fused_pair,
    fused_pair_reference,
)
from bnn_tpu.ops import (
    BasicInputBinarizer,
    BasicScaleBinarizer,
    XNORWeightBinarizer,
)

rng = np.random.RandomState(7)


def rw(*s):
    return jnp.asarray(np.where(rng.randn(*s) >= 0, 1, -1), jnp.int8)


def rf(*s):
    return jnp.asarray(rng.randn(*s).astype(np.float32))


def mk_basic(c):
    return BlockParams("basic", rw(3, 3, c, c), rw(3, 3, c, c),
                       scale1=jnp.abs(rf(c)) + 0.1, add1=rf(c) * 0.1,
                       scale2=jnp.abs(rf(c)) + 0.1, add2=rf(c) * 0.1,
                       threshold=rf(c) * 0.05, threshold2=rf(c) * 0.05)


def mk_down(ci):
    co = 2 * ci
    return BlockParams("down", rw(3, 3, ci, co), rw(3, 3, co, co),
                       wd=rw(ci, co),
                       scale1=jnp.abs(rf(co)) + 0.1, add1=rf(co) * 0.1,
                       scale2=jnp.abs(rf(co)) + 0.1, add2=rf(co) * 0.1,
                       scaled=jnp.abs(rf(co)) + 0.1, addd=rf(co) * 0.1,
                       threshold=rf(ci) * 0.05, threshold2=rf(co) * 0.05,
                       thresholdd=rf(ci) * 0.05)


class TestStageKernels:
    def test_pair_matches_reference(self):
        c = 8
        x = rf(1, 16, 16, c)
        blocks = [mk_basic(c), mk_basic(c)]
        got = fused_pair(x, blocks, interpret=True)
        ref = fused_pair_reference(x, blocks)
        np.testing.assert_allclose(got.astype(jnp.float32), ref,
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("pre,z21", [(False, True), (True, False)])
    def test_down_stage_matches_reference(self, pre, z21):
        c = 8
        x = rf(1, 16, 16, c)
        blocks = [mk_down(c), mk_basic(2 * c)]
        got = fused_down_stage(x, blocks, act="prelu", pre=pre,
                               zero_to_one=z21, interpret=True)
        ref = fused_down_stage_reference(x, blocks, act="prelu", pre=pre,
                                         zero_to_one=z21)
        np.testing.assert_allclose(got.astype(jnp.float32), ref,
                                   rtol=1e-4, atol=1e-4)

    def test_down_stage_with_head(self):
        c = 8
        x = rf(1, 16, 16, c)
        blocks = [mk_down(c), mk_basic(2 * c)]
        wfc, bfc = rf(2 * c, 10), rf(10)
        got = fused_down_stage(x, blocks, wfc, bfc, interpret=True)
        ref = fused_down_stage_reference(x, blocks, wfc, bfc)
        assert got.shape == (1, 10)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


# torch-parity ternary: exercises the {-1, 0, +1} sign path through the
# whole net (a zero_to_one+ReLU net has constant +1 activations)
BC = BConfig(
    activation_pre_process=BasicInputBinarizer,
    activation_post_process=BasicScaleBinarizer,
    weight_pre_process=XNORWeightBinarizer,
)


def _deployed_resnet18():
    m = models.resnet18(num_classes=10, rngs=nnx.Rngs(0))
    m = prepare_binary_model(m, bconfig=BC,
                             ignore_layers_name=["_first_", "_last_"])
    m.eval()
    m = deploy(m, use_pallas=False)
    optimize_deployed(m)
    return m


class TestFuseStagesPass:
    @pytest.mark.slow
    def test_resnet18_all_stages_bit_exact(self):
        ref = _deployed_resnet18()
        x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
        expected = ref(x)

        dep = _deployed_resnet18()
        n = fuse_stages(dep, interpret=True)
        assert n == 4
        assert isinstance(dep.layer1, FusedStage)
        assert isinstance(dep.layer4, FusedStage)
        np.testing.assert_array_equal(dep(x), expected)

    @pytest.mark.slow
    def test_pair_only_policy_composes_with_fuse_blocks(self):
        ref = _deployed_resnet18()
        x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
        expected = ref(x)

        dep = _deployed_resnet18()
        n = fuse_stages(dep, kinds=("pair",), interpret=True)
        assert n == 1  # only layer1
        assert isinstance(dep.layer1, FusedStage)
        assert not isinstance(dep.layer2, FusedStage)
        nb = fuse_blocks(dep, max_fused_batch=4, interpret=True)
        # layerN.1 stride-1 blocks + layer1's inner blocks (stage fallback)
        assert nb >= 3
        np.testing.assert_array_equal(dep(x), expected)

    def test_small_batch_uses_kernel_bit_exact(self):
        """B=2 <= the default cap runs the in-kernel image unroll."""
        ref = _deployed_resnet18()
        xb = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
        expected = ref(xb)
        dep = _deployed_resnet18()
        fuse_stages(dep, interpret=True)
        np.testing.assert_array_equal(dep(xb), expected)

    def test_large_batch_falls_back(self):
        ref = _deployed_resnet18()
        xb = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
        expected = ref(xb)
        dep = _deployed_resnet18()
        fuse_stages(dep, max_fused_batch=1, interpret=True)
        np.testing.assert_array_equal(dep(xb), expected)


class TestStageEligibilityGuards:
    """The chain kernel applies block 0's act kinds + sign convention to
    every block — heterogeneous stages must stay unfused (they would
    silently serve wrong outputs, not error)."""

    def test_mixed_activation_stage_does_not_fuse(self):
        from bnn_tpu import nn as fnn
        dep = _deployed_resnet18()
        x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
        dep.layer1[1].act1 = fnn.PReLU(64, rngs=nnx.Rngs(0))
        dep.layer1[1].act2 = fnn.PReLU(64, rngs=nnx.Rngs(1))
        expected = dep(x)
        # kinds=('pair',): isolate the guard — layer1 is the only pair
        # candidate, so nothing may fuse and the forward stays identical
        # (fusing the down stages here would drag in the documented
        # sign-boundary avgpool atoms their kernels have on the
        # mixed-sign activations this modified net produces)
        n = fuse_stages(dep, kinds=("pair",), interpret=True)
        assert n == 0
        assert not isinstance(dep.layer1, FusedStage)
        np.testing.assert_array_equal(dep(x), expected)

    def test_mixed_sign_convention_stage_does_not_fuse(self):
        dep = _deployed_resnet18()
        x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
        dep.layer1[1].conv1.zero_to_one = True
        dep.layer1[1].conv2.zero_to_one = True
        expected = dep(x)
        n = fuse_stages(dep, kinds=("pair",), interpret=True)
        assert n == 0
        assert not isinstance(dep.layer1, FusedStage)
        np.testing.assert_array_equal(dep(x), expected)

    def test_cap_above_kernel_limit_falls_back(self):
        """fuse_stages(max_fused_batch=16) + batch 12: the stage must
        route to the fallback, not trip fused_chain's n<=8 assert."""
        ref = _deployed_resnet18()
        xb = jnp.asarray(rng.randn(12, 32, 32, 3), jnp.float32)
        expected = ref(xb)
        dep = _deployed_resnet18()
        fuse_stages(dep, max_fused_batch=16, interpret=True)
        np.testing.assert_array_equal(dep(xb), expected)


class TestFuseEntry:
    """Stem + layer1 merged into one dispatch (inference.fuse_entry)."""

    def _fused(self, entry: bool):
        from bnn_tpu.inference import fuse_entry, fuse_stem
        dep = _deployed_resnet18()
        assert fuse_stem(dep, interpret=True) == 1
        fuse_stages(dep, interpret=True)
        if entry:
            assert fuse_entry(dep) == 1
        return dep

    def test_merged_matches_split_bit_exact(self):
        """The merged kernel runs the same stem body + block bodies as the
        split (FusedStem -> FusedStage) pipeline — outputs identical."""
        from bnn_tpu.inference import FusedEntry
        from bnn_tpu import nn as fnn
        x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
        split = self._fused(entry=False)
        merged = self._fused(entry=True)
        assert isinstance(merged.conv1, FusedEntry)
        assert isinstance(merged.layer1, fnn.Identity)
        np.testing.assert_array_equal(merged(x), split(x))

    def test_merged_matches_split_bf16(self):
        """At bf16 IO the kernel rounds the stem activation to bf16 at the
        same point the split kernel boundary does — still bit-exact."""
        x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.bfloat16)
        split = self._fused(entry=False)
        merged = self._fused(entry=True)
        np.testing.assert_array_equal(
            np.asarray(merged(x), np.float32),
            np.asarray(split(x), np.float32))

    def test_merged_matches_unfused_model(self):
        """Against the plain deployed graph: same math, different float
        summation order (stem selector matmuls) — tight tolerance."""
        ref = _deployed_resnet18()
        x = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
        merged = self._fused(entry=True)
        np.testing.assert_allclose(merged(x), ref(x), rtol=1e-4, atol=1e-4)

    def test_above_cap_falls_back(self):
        ref = _deployed_resnet18()
        xb = jnp.asarray(rng.randn(5, 64, 64, 3), jnp.float32)
        merged = self._fused(entry=True)  # stage cap = 4 < 5
        np.testing.assert_allclose(merged(xb), ref(xb), rtol=1e-4, atol=1e-4)


class TestChainGenerality:
    """fused_chain beyond pairs: ResNet-34-style 3+-block stages."""

    def test_three_block_chain(self):
        from bnn_tpu.kernels.model import fused_chain, fused_chain_reference

        c = 8
        x = rf(1, 16, 16, c)
        blocks = [mk_down(c), mk_basic(2 * c), mk_basic(2 * c)]
        got = fused_chain(x, blocks, interpret=True)
        ref = fused_chain_reference(x, blocks)
        np.testing.assert_allclose(got.astype(jnp.float32), ref,
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    def test_resnet34_layer1_fuses(self):
        """ResNet-34's 3-block layer1 fuses as one stage; its 13MB layer4
        stays on the per-block path (VMEM budget)."""
        x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)

        def build():
            mm = models.resnet34(num_classes=10, rngs=nnx.Rngs(0))
            mm = prepare_binary_model(
                mm, bconfig=BC, ignore_layers_name=["_first_", "_last_"])
            mm.eval()
            mm = deploy(mm, use_pallas=False)
            optimize_deployed(mm)
            return mm

        refm = build()
        expected = refm(x)
        dep = build()
        n = fuse_stages(dep, interpret=True)
        assert n >= 1
        assert isinstance(dep.layer1, FusedStage)
        assert len(dep.layer1.stage) == 3
        assert not isinstance(dep.layer4, FusedStage)  # over budget
        np.testing.assert_array_equal(dep(x), expected)


@pytest.mark.slow
def test_stage_fallback_keeps_block_megakernels():
    """B > stage cap must fall back to PER-BLOCK megakernels, not the raw
    unfused ops (review r3): fuse_blocks wraps the inner blocks of a
    FusedStage for exactly this path."""
    from bnn_tpu.inference.megablock import FusedBlock

    ref = _deployed_resnet18()
    xb = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    expected = ref(xb)

    dep = _deployed_resnet18()
    fuse_stages(dep, kinds=("pair",), max_fused_batch=1, interpret=True)
    fuse_blocks(dep, max_fused_batch=4, interpret=True)
    assert isinstance(dep.layer1, FusedStage)
    # the stage's fallback Sequential now holds per-block megakernels
    assert isinstance(dep.layer1.stage[0], FusedBlock)
    assert isinstance(dep.layer1.stage[1], FusedBlock)
    np.testing.assert_array_equal(dep(xb), expected)   # B=2: fallback path
    x1 = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    np.testing.assert_array_equal(dep(x1), ref(x1))    # B=1: chain kernel


@pytest.mark.slow
def test_fuse_head_into_last_stage():
    """The classifier avgpool + float fc fold into layer4's chain kernel;
    the fallback path still applies the original head modules."""
    from bnn_tpu import nn as bnn
    from bnn_tpu.inference import fuse_head

    ref = _deployed_resnet18()
    x1 = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    xb = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    exp1, expb = ref(x1), ref(xb)

    dep = _deployed_resnet18()
    fuse_stages(dep, interpret=True)
    assert fuse_head(dep) == 1
    assert isinstance(dep.avgpool, bnn.Identity)
    assert isinstance(dep.fc, bnn.Identity)
    assert dep.layer4._head is not None
    np.testing.assert_allclose(dep(x1), exp1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dep(xb), expb, rtol=1e-5, atol=1e-5)  # fallback
    # idempotent / no double-fuse
    assert fuse_head(dep) == 0
