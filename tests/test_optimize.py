"""Deployment graph-optimizer tests: BN folding parity."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from bnn_tpu import BConfig, models, nn, prepare_binary_model
from bnn_tpu.inference import deploy, optimize_deployed
from bnn_tpu.models.layers import PreBasicBlock
from bnn_tpu.ops import BasicInputBinarizer, BasicScaleBinarizer, XNORWeightBinarizer

BC_PM1 = BConfig(
    activation_pre_process=BasicInputBinarizer.with_args(zero_to_one=True),
    activation_post_process=BasicScaleBinarizer,
    weight_pre_process=XNORWeightBinarizer,
)


def _randomize_bn(model, key):
    """Give BN layers non-trivial running stats so folds are non-trivial."""
    i = 0
    from bnn_tpu.binarize import named_modules
    for _, m in named_modules(model):
        if isinstance(m, nn.BatchNorm2d):
            k1, k2, k3, k4 = jax.random.split(jax.random.fold_in(key, i), 4)
            c = m.num_features
            m.mean[...] = jax.random.normal(k1, (c,)) * 0.2
            m.var[...] = jnp.abs(jax.random.normal(k2, (c,))) + 0.5
            m.scale[...] = jax.random.normal(k3, (c,)) * 0.5 + 1.0
            m.bias[...] = jax.random.normal(k4, (c,)) * 0.1
            i += 1


def _no_zeros(x):
    return jnp.where(x == 0, 1e-3, x)


class TestPostActFold:
    def test_sequential_conv_bn_fold(self):
        rngs = nnx.Rngs(0)
        net = nn.Sequential(
            nn.Conv2d(3, 32, 3, padding=1, rngs=rngs),
            nn.BatchNorm2d(32, rngs=rngs),
            nn.PReLU(32, rngs=rngs),
            nn.Conv2d(32, 32, 3, padding=1, rngs=rngs),
            nn.BatchNorm2d(32, rngs=rngs),
        )
        net = prepare_binary_model(net, bconfig=BC_PM1,
                                   ignore_layers_name=["_first_"])
        net.eval()
        _randomize_bn(net, jax.random.key(1))
        x = _no_zeros(jax.random.normal(jax.random.key(2), (2, 8, 8, 3)))
        dep = deploy(net, use_pallas=False)
        expected = dep(x)
        n = optimize_deployed(dep)
        assert n == 2  # float conv+bn AND deployed conv+bn folded
        assert isinstance(dep[1], nn.Identity)
        assert isinstance(dep[4], nn.Identity)
        np.testing.assert_allclose(dep(x), expected, rtol=2e-4, atol=2e-4)

    def test_resnet18_postact_fold_parity(self):
        model = models.resnet18(num_classes=10, activation=nn.PReLU,
                                rngs=nnx.Rngs(0))
        model = prepare_binary_model(model, bconfig=BC_PM1,
                                     ignore_layers_name=["_first_", "_last_"])
        model.eval()
        _randomize_bn(model, jax.random.key(3))
        x = _no_zeros(jax.random.normal(jax.random.key(4), (2, 32, 32, 3)))
        dep = deploy(model, use_pallas=False)
        expected = dep(x)
        n = optimize_deployed(dep)
        assert n >= 17  # stem + 16 block bns + downsample bns
        got = dep(x)
        np.testing.assert_allclose(got, expected, rtol=1e-3, atol=2e-3)


class TestPreActThresholdFold:
    def test_preact_resnet_threshold_fold_parity(self):
        model = models.resnet18(block_type=PreBasicBlock, activation=nn.PReLU,
                                num_classes=10, rngs=nnx.Rngs(0))
        model = prepare_binary_model(model, bconfig=BC_PM1,
                                     ignore_layers_name=["_first_", "_last_"])
        model.eval()
        _randomize_bn(model, jax.random.key(5))
        x = _no_zeros(jax.random.normal(jax.random.key(6), (2, 32, 32, 3)))
        dep = deploy(model, use_pallas=False)
        expected = dep(x)
        n = optimize_deployed(dep)
        assert n >= 16  # every block bn eliminated via thresholds
        from bnn_tpu.inference import DeployedConv
        from bnn_tpu.binarize import named_modules
        th = [m for _, m in named_modules(dep)
              if isinstance(m, DeployedConv) and m.threshold is not None]
        assert th, "no thresholded convs produced"
        np.testing.assert_allclose(dep(x), expected, rtol=1e-3, atol=2e-3)

    def test_threshold_fold_int8_format(self):
        rngs = nnx.Rngs(0)
        net = nn.Sequential(
            nn.BatchNorm2d(16, rngs=rngs),
            nn.Conv2d(16, 32, 3, padding=1, rngs=rngs),
        )
        net = prepare_binary_model(net, bconfig=BC_PM1)
        net.eval()
        _randomize_bn(net, jax.random.key(7))
        x = _no_zeros(jax.random.normal(jax.random.key(8), (2, 8, 8, 16)))
        dep = deploy(net, use_pallas=False, weight_format="int8")
        expected = dep(x)
        n = optimize_deployed(dep)
        assert n == 1
        np.testing.assert_allclose(dep(x), expected, rtol=2e-4, atol=2e-4)

    def test_threshold_fold_grouped_conv(self):
        """Grouped convs (BATS sep/dil ops): the kernel I axis is only
        C_in/groups wide, so the per-in-channel BN flips are a 2D (I, O)
        map keyed by each output channel's group. A (C_in, 1) broadcast
        crashed here (found by the BATS serving sweep); both int8 and
        packed formats must fold bit-exactly at the prediction level."""
        from bnn_tpu import layers as blayers
        from bnn_tpu.inference import fold_bn_before
        from bnn_tpu.inference.deploy import DeployedConv

        for fmt in ("int8", "packed"):
            rngs = nnx.Rngs(0)
            bn = nn.BatchNorm2d(12, rngs=rngs)
            bn.use_running_average = True
            bn.scale[...] = jnp.where(jnp.arange(12) % 3 == 0, -1.5, 2.0)
            bn.mean[...] = jnp.linspace(-0.5, 0.5, 12)
            bn.var[...] = jnp.full((12,), 0.8)
            bn.bias[...] = jnp.linspace(0.2, -0.2, 12)
            bconv = blayers.Conv2d(12, 24, 3, padding=1, groups=4,
                                   bconfig=BC_PM1, rngs=rngs)
            dconv = DeployedConv(bconv, use_pallas=False,
                                 weight_format=fmt)
            assert dconv.mode == "conv" and dconv.groups == 4
            x = _no_zeros(jax.random.normal(jax.random.key(11),
                                            (2, 6, 6, 12)))
            expected = dconv(bn(x))
            assert fold_bn_before(bn, dconv)
            np.testing.assert_allclose(dconv(x), expected, rtol=2e-4,
                                       atol=2e-4)

    def test_threshold_fold_gemm_mode_int8_format(self):
        """weight_format='int8' on a GEMM-mode pointwise conv: storage is
        bit-packed u32 REGARDLESS of the format flag (deploy.py stores
        patch-extraction order packed), so the fold must take the
        unpack/repack path, not the literal-int8 multiply (crashed on
        BATS preprocess 1x1 convs, found by the serving sweep)."""
        from bnn_tpu import layers as blayers
        from bnn_tpu.inference import fold_bn_before
        from bnn_tpu.inference.deploy import DeployedConv

        rngs = nnx.Rngs(0)
        C = 288
        bn = nn.BatchNorm2d(C, rngs=rngs)
        bn.use_running_average = True
        bn.scale[...] = jnp.where(jnp.arange(C) % 2 == 0, -1.5, 2.0)
        bn.mean[...] = jnp.linspace(-0.5, 0.5, C)
        bn.var[...] = jnp.full((C,), 0.8)
        bn.bias[...] = jnp.linspace(0.2, -0.2, C)
        bconv = blayers.Conv2d(C, 72, 1, bconfig=BC_PM1, rngs=rngs)
        dconv = DeployedConv(bconv, use_pallas=False, weight_format="int8")
        assert dconv.mode == "gemm", dconv.mode
        x = _no_zeros(jax.random.normal(jax.random.key(3), (2, 4, 4, C)))
        expected = dconv(bn(x))
        assert fold_bn_before(bn, dconv)
        np.testing.assert_allclose(dconv(x), expected, rtol=2e-4, atol=2e-4)

    def test_threshold_fold_im2col_layout(self):
        """GEMM/im2col-layout weights are channel-MAJOR on the K axis:
        the per-channel BN sign flips must repeat over the filter taps
        (a (C,1) broadcast crashed; a wrong order would scramble)."""
        from bnn_tpu import layers as blayers
        from bnn_tpu.inference import fold_bn_before
        from bnn_tpu.inference.deploy import DeployedConv

        rngs = nnx.Rngs(0)
        bn = nn.BatchNorm2d(8, rngs=rngs)
        bn.use_running_average = True
        # negative gammas on half the channels: flips must hit the weights
        bn.scale[...] = jnp.where(jnp.arange(8) % 2 == 0, -1.5, 2.0)
        bn.mean[...] = jnp.linspace(-0.5, 0.5, 8)
        bn.var[...] = jnp.full((8,), 0.8)
        bn.bias[...] = jnp.linspace(0.2, -0.2, 8)
        bconv = blayers.Conv2d(8, 16, 3, padding=1, bconfig=BC_PM1,
                               rngs=rngs)
        dconv = DeployedConv(bconv, mode="im2col", use_pallas=False)
        assert dconv.mode == "im2col"
        x = _no_zeros(jax.random.normal(jax.random.key(11), (2, 6, 6, 8)))
        expected = dconv(bn(x))
        assert fold_bn_before(bn, dconv)
        np.testing.assert_allclose(dconv(x), expected, rtol=2e-4, atol=2e-4)

    @pytest.mark.slow
    def test_negative_gamma_flip(self):
        rngs = nnx.Rngs(0)
        net = nn.Sequential(
            nn.BatchNorm2d(16, rngs=rngs),
            nn.Conv2d(16, 32, 1, rngs=rngs),
        )
        net = prepare_binary_model(net, bconfig=BC_PM1)
        net.eval()
        # force some negative gammas: flips must fold into weights
        net[0].scale[...] = jnp.where(jnp.arange(16) % 2 == 0, -1.5, 2.0)
        net[0].mean[...] = jnp.linspace(-0.5, 0.5, 16)
        net[0].var[...] = jnp.full((16,), 0.8)
        net[0].bias[...] = jnp.linspace(0.2, -0.2, 16)
        x = _no_zeros(jax.random.normal(jax.random.key(9), (2, 4, 4, 16)))
        dep = deploy(net, use_pallas=False)
        expected = dep(x)
        assert optimize_deployed(dep) == 1
        np.testing.assert_allclose(dep(x), expected, rtol=2e-4, atol=2e-4)
