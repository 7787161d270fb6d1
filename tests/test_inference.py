"""Deployment (bitpacked inference) tests: numerical parity between the QAT
fake path and the deployed packed path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from bnn_tpu import BConfig, nn, prepare_binary_model
from bnn_tpu import layers as blayers
from bnn_tpu.inference import (
    DeployedConv,
    DeployedLinear,
    deploy,
    model_weight_bytes,
)
from bnn_tpu.ops import (
    BasicInputBinarizer,
    BasicScaleBinarizer,
    Identity,
    StochasticInputBinarizer,
    XNORScaleBinarizer,
    XNORWeightBinarizer,
)

BCONFIG = BConfig(
    activation_pre_process=BasicInputBinarizer,
    activation_post_process=BasicScaleBinarizer,
    weight_pre_process=XNORWeightBinarizer,
)


def _rand_no_zeros(key, shape):
    # avoid exact zeros: QAT sign(0)=0 vs deployed sign(0)=+1
    x = jax.random.normal(key, shape)
    return jnp.where(x == 0, 1e-3, x)


class TestDeployedLinear:
    @pytest.mark.parametrize("in_f,out_f,bias", [(64, 32, True), (100, 10, False)])
    def test_parity(self, in_f, out_f, bias):
        layer = blayers.Linear(in_f, out_f, bias=bias, bconfig=BCONFIG,
                               rngs=nnx.Rngs(0))
        layer.activation_post_process.alpha[...] = jnp.abs(
            jax.random.normal(jax.random.key(1), (out_f,))) + 0.1
        x = _rand_no_zeros(jax.random.key(2), (4, in_f))
        expected = layer(x)
        dep = deploy(layer, use_pallas=False)
        assert isinstance(dep, DeployedLinear)
        np.testing.assert_allclose(dep(x), expected, rtol=1e-5, atol=1e-5)

    def test_parity_pallas_interpret(self):
        layer = blayers.Linear(128, 64, bconfig=BCONFIG, rngs=nnx.Rngs(0))
        x = _rand_no_zeros(jax.random.key(3), (8, 128))
        expected = layer(x)
        dep = deploy(layer, use_pallas=True, interpret=True)
        np.testing.assert_allclose(dep(x), expected, rtol=1e-5, atol=1e-5)

    def test_center_weights_folded(self):
        bconfig = BConfig(
            activation_pre_process=BasicInputBinarizer,
            activation_post_process=BasicScaleBinarizer,
            weight_pre_process=XNORWeightBinarizer.with_args(center_weights=True),
        )
        layer = blayers.Linear(64, 16, bconfig=bconfig, rngs=nnx.Rngs(0))
        x = _rand_no_zeros(jax.random.key(4), (4, 64))
        expected = layer(x)
        dep = deploy(layer, use_pallas=False)
        np.testing.assert_allclose(dep(x), expected, rtol=1e-5, atol=1e-5)

    def test_no_alpha(self):
        bconfig = BConfig(
            activation_pre_process=BasicInputBinarizer,
            activation_post_process=Identity,
            weight_pre_process=XNORWeightBinarizer.with_args(compute_alpha=False),
        )
        layer = blayers.Linear(64, 16, bconfig=bconfig, rngs=nnx.Rngs(0))
        x = _rand_no_zeros(jax.random.key(5), (4, 64))
        expected = layer(x)
        dep = deploy(layer, use_pallas=False)
        np.testing.assert_allclose(dep(x), expected, rtol=1e-5, atol=1e-5)


class TestDeployedConv:
    @pytest.mark.parametrize("ksize,stride,pad", [(1, 1, 0), (3, 1, 1), (3, 2, 1), (5, 2, 2)])
    def test_conv2d_parity(self, ksize, stride, pad):
        layer = blayers.Conv2d(32, 16, ksize, stride=stride, padding=pad,
                               bconfig=BCONFIG, rngs=nnx.Rngs(0))
        x = _rand_no_zeros(jax.random.key(6), (2, 8, 8, 32))
        expected = layer(x)
        dep = deploy(layer, use_pallas=False)
        assert isinstance(dep, DeployedConv)
        np.testing.assert_allclose(dep(x), expected, rtol=1e-4, atol=1e-4)

    def test_conv1d_parity(self):
        layer = blayers.Conv1d(32, 16, 3, padding=1, bconfig=BCONFIG,
                               rngs=nnx.Rngs(0))
        x = _rand_no_zeros(jax.random.key(7), (2, 12, 32))
        expected = layer(x)
        dep = deploy(layer, use_pallas=False)
        np.testing.assert_allclose(dep(x), expected, rtol=1e-4, atol=1e-4)

    def test_conv2d_parity_pallas_interpret(self):
        layer = blayers.Conv2d(32, 16, 3, padding=1, bconfig=BCONFIG,
                               rngs=nnx.Rngs(0))
        x = _rand_no_zeros(jax.random.key(8), (2, 8, 8, 32))
        expected = layer(x)
        dep = deploy(layer, use_pallas=True, interpret=True)
        np.testing.assert_allclose(dep(x), expected, rtol=1e-4, atol=1e-4)

    def test_xnor_spatial_scale_post(self):
        bconfig = BConfig(
            activation_pre_process=BasicInputBinarizer,
            activation_post_process=XNORScaleBinarizer,
            weight_pre_process=XNORWeightBinarizer,
        )
        layer = blayers.Conv2d(32, 16, 3, padding=1, bconfig=bconfig,
                               rngs=nnx.Rngs(0))
        x = _rand_no_zeros(jax.random.key(9), (2, 8, 8, 32))
        expected = layer(x)
        dep = deploy(layer, use_pallas=False)
        np.testing.assert_allclose(dep(x), expected, rtol=1e-4, atol=1e-4)


class TestDeployModel:
    def _bin_model(self):
        rngs = nnx.Rngs(0)
        net = nn.Sequential(
            nn.Conv2d(3, 32, 3, padding=1, rngs=rngs),
            nn.BatchNorm2d(32, rngs=rngs),
            nn.PReLU(32, rngs=rngs),
            nn.Conv2d(32, 64, 3, stride=2, padding=1, rngs=rngs),
            nn.BatchNorm2d(64, rngs=rngs),
            nn.PReLU(64, rngs=rngs),
            nn.AdaptiveAvgPool2d(1),
            nn.Flatten(),
            nn.Linear(64, 10, rngs=rngs),
        )
        return prepare_binary_model(net, bconfig=BCONFIG,
                                    ignore_layers_name=["_first_"])

    def test_whole_model_parity_and_structure(self):
        model = self._bin_model()
        model.eval()
        x = _rand_no_zeros(jax.random.key(10), (2, 8, 8, 3))
        expected = model(x)
        dep = deploy(model, use_pallas=False)
        assert type(dep[0]) is nn.Conv2d  # float layer untouched
        assert isinstance(dep[3], DeployedConv)
        assert isinstance(dep[8], DeployedLinear)
        np.testing.assert_allclose(dep(x), expected, rtol=1e-4, atol=1e-4)

    def test_ineligible_layers_left_alone(self):
        bconfig = BConfig(
            activation_pre_process=StochasticInputBinarizer,  # not deployable
            activation_post_process=BasicScaleBinarizer,
            weight_pre_process=XNORWeightBinarizer,
        )
        layer = blayers.Linear(16, 4, bconfig=bconfig, rngs=nnx.Rngs(0))
        dep = deploy(layer)
        assert dep is layer

    def test_weight_compression(self):
        model = self._bin_model()
        before = model_weight_bytes(model)
        dep = deploy(model, use_pallas=False)
        after = model_weight_bytes(dep)
        # binary layers dominate: overall compression should be large
        assert before / after > 10


class TestSignZeroParity:
    """sign(0) must follow the QAT binarizer's convention exactly —
    systematic after ReLU, which emits exact zeros (the torch-parity
    default sign(0)=0 makes activations ternary)."""

    @pytest.mark.parametrize("z21", [False, True])
    def test_linear_exact_zero_inputs(self, z21):
        layer = blayers.Linear(
            32, 8,
            bconfig=BConfig(
                activation_pre_process=BasicInputBinarizer.with_args(
                    zero_to_one=z21),
                activation_post_process=BasicScaleBinarizer,
                weight_pre_process=XNORWeightBinarizer,
            ),
            rngs=nnx.Rngs(0))
        layer.eval()
        x = jnp.maximum(jax.random.normal(jax.random.key(1), (4, 32)), 0.0)
        assert float(jnp.mean((x == 0).astype(jnp.float32))) > 0.2
        want = layer(x)
        dep = deploy(layer, use_pallas=False)
        np.testing.assert_allclose(dep(x), want, rtol=1e-4, atol=1e-5)
        dep_p = deploy(layer, use_pallas=True, interpret=True)
        np.testing.assert_allclose(dep_p(x), want, rtol=1e-4, atol=1e-5)

    def test_conv_exact_zero_inputs(self):
        layer = blayers.Conv2d(8, 8, 3, padding=1, bconfig=BCONFIG,
                               rngs=nnx.Rngs(0))
        layer.eval()
        x = jnp.maximum(
            jax.random.normal(jax.random.key(2), (2, 8, 8, 8)), 0.0)
        want = layer(x)
        dep = deploy(layer, use_pallas=False, weight_format="int8")
        np.testing.assert_allclose(dep(x), want, rtol=1e-4, atol=1e-5)

    def test_relu_model_deploy_parity(self):
        # whole model with a ReLU stem: half the binarized conv's inputs
        # are exact zeros — regression for the sign(0)=+1 deploy divergence
        model = TestDeployModel()._bin_model()
        model.eval()
        x = jax.random.normal(jax.random.key(3), (2, 8, 8, 3))
        want = model(x)
        dep = deploy(model, use_pallas=False)
        np.testing.assert_allclose(dep(x), want, rtol=1e-4, atol=1e-4)


class TestMixedPrecision:
    def test_bf16_deployed_parity(self):
        from bnn_tpu.utils import cast_floats
        model = TestDeployModel()._bin_model()
        model.eval()
        x = _rand_no_zeros(jax.random.key(20), (2, 8, 8, 3))
        y_ref = model(x)
        dep = deploy(model, use_pallas=False, weight_format="int8")
        cast_floats(dep, jnp.bfloat16)
        y16 = dep(x.astype(jnp.bfloat16))
        assert y16.dtype == jnp.bfloat16
        # The deployed path reproduces the QAT model's sign decisions
        # EXACTLY at matched precision (including sign(0)=0 ternary
        # semantics), so bf16-deployed must equal bf16-QAT bit-for-bit.
        cast_floats(model, jnp.bfloat16)
        y16_qat = model(x.astype(jnp.bfloat16))
        np.testing.assert_array_equal(np.asarray(y16), np.asarray(y16_qat))
        # vs the f32 reference only rounding-scale drift is expected, except
        # where a near-zero pre-sign value flips discretely under rounding —
        # a single flip shifts a whole sample's logits, so bound loosely.
        diff = jnp.abs(y16.astype(jnp.float32) - y_ref)
        assert float(jnp.max(diff)) < 1.0, np.asarray(diff)
        assert bool(jnp.all(jnp.isfinite(y16.astype(jnp.float32))))

    def test_packed_weights_not_cast(self):
        from bnn_tpu.utils import cast_floats
        layer = blayers.Linear(64, 16, bconfig=BCONFIG, rngs=nnx.Rngs(0))
        dep = deploy(layer, use_pallas=False)
        cast_floats(dep, jnp.bfloat16)
        assert dep.w_packed[...].dtype == jnp.uint32
        assert dep.scale[...].dtype == jnp.bfloat16


class TestPredictor:
    def test_predictor_end_to_end(self):
        from bnn_tpu.inference import Predictor

        model = TestDeployModel()._bin_model()
        model.eval()
        x = _rand_no_zeros(jax.random.key(40), (5, 8, 8, 3))
        ref_logits = model(x)
        ref_preds = jnp.argmax(ref_logits, -1)

        pred = Predictor.from_model(model, batch_size=4, use_pallas=False)
        out = pred(np.asarray(x))
        assert out.shape == (5, 10)  # padding stripped
        agreement = float(jnp.mean(
            (jnp.argmax(out, -1) == ref_preds).astype(jnp.float32)))
        assert agreement >= 0.8

    def test_predictor_defaults_resolve_by_platform(self):
        """Predictor()/deploy() with NO arguments must work on CPU:
        use_pallas=None auto-resolves to the exact XLA fallback off-TPU
        (Mosaic kernels would crash here)."""
        from bnn_tpu.inference import Predictor

        model = TestDeployModel()._bin_model()
        model.eval()
        pred = Predictor.from_model(model)      # all defaults
        x = _rand_no_zeros(jax.random.key(44), (2, 8, 8, 3))
        assert pred(np.asarray(x)).shape == (2, 10)
        dep = deploy(TestDeployModel()._bin_model())  # deploy() defaults too
        assert dep(x).shape == (2, 10)

    def test_predictor_from_checkpoint(self, tmp_path):
        from bnn_tpu.inference import Predictor
        from bnn_tpu.utils import save_checkpoint

        def model_fn(seed=0):
            return TestDeployModel()._bin_model()

        model = model_fn()
        model.eval()
        path = str(tmp_path / "qat")
        save_checkpoint(path, model)
        pred = Predictor.from_checkpoint(path, model_fn, batch_size=8,
                                         use_pallas=False, dtype=None,
                                         fold_bn=False)
        x = _rand_no_zeros(jax.random.key(41), (3, 8, 8, 3))
        out = pred(np.asarray(x))
        # with no dtype cast and no folds, predictions match the deployed
        # model of the restored weights exactly
        expected = deploy(model, use_pallas=False)(x)
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


class TestMeshPredictor:
    """Multi-chip serving: Predictor(mesh=...) splits batches over the data
    axis with shard_map (weights replicated, no collectives in the
    forward). Runs on the virtual 8-device CPU mesh (conftest)."""

    def _build(self):
        from bnn_tpu import models
        m = models.resnet18(num_classes=10, rngs=nnx.Rngs(0))
        m = prepare_binary_model(
            m,
            bconfig=BConfig(
                activation_pre_process=BasicInputBinarizer.with_args(
                    zero_to_one=True),
                activation_post_process=BasicScaleBinarizer,
                weight_pre_process=XNORWeightBinarizer,
            ),
            ignore_layers_name=["_first_", "_last_"])
        m.eval()
        return m

    def test_sharded_matches_single_device(self):
        from bnn_tpu.inference import Predictor
        from bnn_tpu.parallel import make_mesh
        x = jax.random.normal(jax.random.key(31), (6, 32, 32, 3))
        ref = Predictor.from_model(self._build(), batch_size=8,
                                   dtype=jnp.float32, use_pallas=False)(x)
        mesh = make_mesh(data=len(jax.devices()), model=1)
        pred = Predictor.from_model(self._build(), batch_size=8,
                                    dtype=jnp.float32, use_pallas=False,
                                    mesh=mesh)
        out = pred(x)
        assert out.shape == (6, 10)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_batch_must_divide_mesh(self):
        from bnn_tpu.inference import Predictor
        from bnn_tpu.parallel import make_mesh
        mesh = make_mesh(data=len(jax.devices()), model=1)
        with pytest.raises(ValueError):
            Predictor.from_model(self._build(), batch_size=6,
                                 use_pallas=False, mesh=mesh)

    def test_empty_batch_is_a_loud_error(self):
        """N=0 requests used to die with an unrelated IndexError deep in
        the chunk loop; the shared batched_call now names the problem."""
        from bnn_tpu.inference import Predictor
        pred = Predictor.from_model(self._build(), batch_size=4,
                                    use_pallas=False, dtype=jnp.float32)
        with pytest.raises(ValueError, match="empty request batch"):
            pred(np.zeros((0, 32, 32, 3), np.float32))

    def test_tp_with_explicit_fuse_raises(self):
        """tensor_parallel silently overriding an explicit fuse=True was
        a benchmarking footgun — it must raise like the gemm-impl
        conflict does."""
        from bnn_tpu.inference import Predictor
        from bnn_tpu.parallel import make_mesh
        mesh = make_mesh(data=1, model=len(jax.devices()))
        with pytest.raises(ValueError, match="incompatible with fuse"):
            Predictor.from_model(self._build(), batch_size=8, mesh=mesh,
                                 tensor_parallel=True, fuse=True,
                                 use_pallas=False)


class TestGroupedDeploy:
    """Grouped-conv deployment (VERDICT r2 missing #3): BATS networks use
    groups=12 throughout (reference bnn/models/layers/bats_ops.py:108-173);
    they must be servable by the bitpacked engine, not just trainable."""

    def test_grouped_conv_parity(self):
        layer = blayers.Conv2d(24, 24, 3, padding=1, groups=12, bias=False,
                               bconfig=BCONFIG, rngs=nnx.Rngs(0))
        x = _rand_no_zeros(jax.random.key(20), (2, 8, 8, 24))
        expected = layer(x)
        dep = deploy(layer, use_pallas=False)
        assert isinstance(dep, DeployedConv)
        assert dep.groups == 12 and dep.mode == "conv"
        np.testing.assert_allclose(dep(x), expected, rtol=1e-4, atol=1e-4)

    def test_grouped_pointwise_parity(self):
        # 1x1 grouped conv must NOT take the gemm path
        layer = blayers.Conv2d(512, 512, 1, groups=4, bconfig=BCONFIG,
                               rngs=nnx.Rngs(0))
        x = _rand_no_zeros(jax.random.key(21), (2, 4, 4, 512))
        expected = layer(x)
        dep = deploy(layer, use_pallas=False)
        assert dep.mode == "conv"
        np.testing.assert_allclose(dep(x), expected, rtol=1e-4, atol=1e-4)

    def test_padded_pointwise_not_fusion_eligible(self):
        """The bottleneck/downsample kernels run 1x1 convs as bare dots —
        a padded 1x1 must not pass eligibility (its padding would be
        silently dropped when fused)."""
        from bnn_tpu.inference.megablock import _pointwise_deployed

        padded = blayers.Conv2d(8, 16, 1, padding=1, bconfig=BCONFIG,
                                rngs=nnx.Rngs(0))
        assert not _pointwise_deployed(DeployedConv(padded, use_pallas=False))
        plain = blayers.Conv2d(8, 16, 1, bconfig=BCONFIG, rngs=nnx.Rngs(0))
        assert _pointwise_deployed(DeployedConv(plain, use_pallas=False))

    def test_grouped_rejects_gemm_mode(self):
        layer = blayers.Conv2d(24, 24, 3, padding=1, groups=12,
                               bconfig=BCONFIG, rngs=nnx.Rngs(0))
        with pytest.raises(NotImplementedError, match="grouped"):
            DeployedConv(layer, mode="im2col")

    @pytest.mark.slow
    def test_bats_network_deploys(self):
        """deploy(BATS CIFAR net) must replace the grouped 3x3/5x5 convs
        with bitpacked layers and keep QAT parity."""
        from bnn_tpu import models
        from bnn_tpu.binarize import named_modules

        # layers=4 so normal cells (grouped sep/dil convs) exist — at
        # layers=2 every cell is a reduction cell (pool/skip ops only)
        net = models.BATSNetworkCIFAR(C=12, num_classes=10, layers=4,
                                      auxiliary=False,
                                      genotype=models.BATS_EXAMPLE, groups=4,
                                      rngs=nnx.Rngs(0))
        net = prepare_binary_model(net, bconfig=BCONFIG,
                                   ignore_layers_name=["_first_", "_last_"])
        net.eval()
        x = _rand_no_zeros(jax.random.key(22), (2, 16, 16, 3))
        expected = net(x)

        before = model_weight_bytes(net)
        dep = deploy(net, use_pallas=False)
        grouped = [m for _, m in named_modules(dep)
                   if isinstance(m, DeployedConv) and m.groups != 1]
        assert grouped, "no grouped convs were deployed"
        out = dep(x)
        exp = expected[0] if isinstance(expected, tuple) else expected
        got = out[0] if isinstance(out, tuple) else out
        # whole-model QAT-vs-deployed on a random-init net drifts by sign()
        # flips at exact-zero BN boundaries (f32 associativity; the deployed
        # int path is the more exact one) — exact per-layer parity is
        # asserted in test_grouped_conv_parity; here assert agreement at the
        # prediction level plus structure/compression
        rel = float(jnp.linalg.norm(got - exp) / jnp.linalg.norm(exp))
        assert rel < 0.15, rel
        assert model_weight_bytes(dep) < before


class TestPopcountServing:
    """Packed-activation XNOR/popcount serving mode (VERDICT r2 next #6):
    exact vs the default int8-MXU path for zero_to_one-trained layers."""

    Z1 = BConfig(
        activation_pre_process=BasicInputBinarizer.with_args(zero_to_one=True),
        activation_post_process=BasicScaleBinarizer,
        weight_pre_process=XNORWeightBinarizer,
    )

    def test_linear_popcount_exact(self):
        from bnn_tpu.inference import set_gemm_impl

        layer = blayers.Linear(96, 32, bconfig=self.Z1, rngs=nnx.Rngs(0))
        x = jax.random.normal(jax.random.key(30), (4, 96))
        dep = deploy(layer, use_pallas=False)
        expected = dep(x)
        assert set_gemm_impl(dep) == [""]
        assert dep.gemm_impl == "popcount"
        np.testing.assert_allclose(dep(x), expected, rtol=1e-6, atol=1e-6)

    def test_pointwise_conv_popcount_exact(self):
        from bnn_tpu.inference import set_gemm_impl

        layer = blayers.Conv2d(320, 64, 1, bconfig=self.Z1, rngs=nnx.Rngs(0))
        x = jax.random.normal(jax.random.key(31), (2, 4, 4, 320))
        dep = deploy(layer, use_pallas=False)
        assert dep.mode == "gemm"
        expected = dep(x)
        set_gemm_impl(dep)
        assert dep.gemm_impl == "popcount"
        np.testing.assert_allclose(dep(x), expected, rtol=1e-6, atol=1e-6)

    def test_ternary_layers_stay_mxu(self):
        from bnn_tpu.inference import set_gemm_impl

        # torch-parity sign(0)=0 cannot pack; must not switch
        layer = blayers.Linear(96, 32, bconfig=BCONFIG, rngs=nnx.Rngs(0))
        dep = deploy(layer, use_pallas=False)
        assert set_gemm_impl(dep) == []
        assert dep.gemm_impl == "mxu"

    def test_padded_conv_stays_mxu(self):
        from bnn_tpu.inference import set_gemm_impl

        layer = blayers.Conv2d(320, 64, 3, padding=1, bconfig=self.Z1,
                               rngs=nnx.Rngs(0))
        dep = deploy(layer, use_pallas=False)
        assert set_gemm_impl(dep) == []

    def test_unknown_impl_raises(self):
        # a typo'd impl must raise, not silently keep serving 'mxu' while
        # reporting layers switched (would also slip through under python -O
        # as an assert)
        from bnn_tpu.inference import set_gemm_impl

        layer = blayers.Linear(96, 32, bconfig=self.Z1, rngs=nnx.Rngs(0))
        dep = deploy(layer, use_pallas=False)
        with pytest.raises(ValueError, match="popcnt"):
            set_gemm_impl(dep, "popcnt")
        assert dep.gemm_impl == "mxu"

    def test_predictor_popcount_mode(self):
        from bnn_tpu.inference import Predictor

        rngs = nnx.Rngs(0)
        net = nn.Sequential(
            nn.Conv2d(3, 64, 3, padding=1, rngs=rngs),
            nn.BatchNorm2d(64, rngs=rngs),
            nn.PReLU(64, rngs=rngs),
            nn.Conv2d(64, 512, 1, rngs=rngs),   # pointwise -> popcount
            nn.AdaptiveAvgPool2d(1),
            nn.Flatten(),
            nn.Linear(512, 16, rngs=rngs),       # dense -> popcount
        )
        net = prepare_binary_model(net, bconfig=self.Z1,
                                   ignore_layers_name=["_first_"])
        net.eval()
        common = dict(batch_size=4, use_pallas=False, fuse=False,
                      space_to_depth=False, dtype=None)
        x = np.asarray(jax.random.normal(jax.random.key(32), (4, 8, 8, 3)))
        ref = Predictor.from_model(net, **common)
        pred = Predictor.from_model(net, binary_gemm_impl="popcount", **common)
        assert len(pred.popcount_layers) >= 2, pred.popcount_layers
        np.testing.assert_allclose(pred(x), ref(x), rtol=1e-5, atol=1e-5)
