"""Tests for meters, checkpointing and the FLOPs/BOPs counter."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from bnn_tpu import BConfig, nn, prepare_binary_model
from bnn_tpu.ops import BasicInputBinarizer, BasicScaleBinarizer, XNORWeightBinarizer
from bnn_tpu.utils import (
    AverageMeter,
    ProgressMeter,
    accuracy,
    count_ops,
    count_parameters,
    load_checkpoint,
    restore_into,
    save_checkpoint,
)

BC = BConfig(BasicInputBinarizer, BasicScaleBinarizer, XNORWeightBinarizer)


def make_net(seed=0):
    rngs = nnx.Rngs(seed)
    return nn.Sequential(
        nn.Conv2d(3, 16, 3, padding=1, rngs=rngs),
        nn.BatchNorm2d(16, rngs=rngs),
        nn.ReLU(),
        nn.AdaptiveAvgPool2d(1),
        nn.Flatten(),
        nn.Linear(16, 4, rngs=rngs),
    )


class TestMeters:
    def test_average_meter(self):
        m = AverageMeter("loss", ":.2f")
        m.update(2.0)
        m.update(4.0, n=3)
        assert m.val == 4.0
        assert m.count == 4
        assert m.avg == pytest.approx(3.5)
        assert "loss" in str(m)

    def test_progress_meter_prints(self, capsys):
        m = AverageMeter("acc", ":.1f")
        m.update(1.0)
        ProgressMeter(10, [m], prefix="Epoch[0]").display(3)
        out = capsys.readouterr().out
        assert "Epoch[0]" in out and "acc" in out

    def test_accuracy_topk(self):
        logits = jnp.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
        target = jnp.array([1, 2])
        top1, top2 = accuracy(logits, target, topk=(1, 2))
        assert top1 == pytest.approx(50.0)
        assert top2 == pytest.approx(50.0)
        top3 = accuracy(logits, target, topk=(3,))[0]
        assert top3 == pytest.approx(100.0)

    def test_accuracy_clamps_k_to_classes(self):
        """The reference's standard topk=(1, 5) call on a 2-class head
        must not crash (same clamp as make_eval_step)."""
        logits = jnp.array([[0.1, 0.9], [0.8, 0.2]])
        target = jnp.array([1, 1])
        top1, top5 = accuracy(logits, target, topk=(1, 5))
        assert top1 == pytest.approx(50.0)
        assert top5 == pytest.approx(100.0)  # within-2 == within-all

    def test_count_parameters(self):
        lin = nn.Linear(4, 3, rngs=nnx.Rngs(0))
        assert count_parameters(lin) == 4 * 3 + 3


class TestCheckpoint:
    def test_round_trip(self, tmp_path):
        net = prepare_binary_model(make_net(), bconfig=BC)
        net.eval()
        net[5].activation_post_process.alpha[...] = jnp.arange(4.0)
        x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
        expected = net(x)
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, net, metadata={"epoch": 3, "best_acc1": 71.5})

        fresh = prepare_binary_model(make_net(seed=9), bconfig=BC)
        fresh.eval()
        payload = load_checkpoint(path)
        assert payload["metadata"]["epoch"] == 3
        skipped = restore_into(fresh, payload)
        assert skipped == []
        np.testing.assert_array_equal(fresh(x), expected)

    def test_restore_preserves_destination_dtype(self, tmp_path):
        """torch load_state_dict semantics: restoring an f32-saved
        checkpoint into a bf16-cast model keeps the model bf16 (both
        strict and non-strict paths)."""
        from bnn_tpu.utils import cast_floats

        net = prepare_binary_model(make_net(), bconfig=BC)
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, net)  # f32 arrays on disk

        for strict in (True, False):
            fresh = prepare_binary_model(make_net(seed=9), bconfig=BC)
            cast_floats(fresh, jnp.bfloat16)
            restore_into(fresh, load_checkpoint(path), strict=strict)
            kernels = [v for p, v in jax.tree_util.tree_leaves_with_path(
                nnx.state(fresh)) if hasattr(v, "dtype")]
            float_dtypes = {v.dtype for v in kernels
                            if jnp.issubdtype(v.dtype, jnp.floating)}
            assert float_dtypes == {jnp.dtype(jnp.bfloat16)}, (
                strict, float_dtypes)

    def test_best_copy(self, tmp_path):
        net = make_net()
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, net, is_best=True)
        assert os.path.isdir(path + ".best")

    def test_non_strict_restore_skips_mismatches(self, tmp_path):
        net = make_net()
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, net)
        other = nn.Sequential(
            nn.Conv2d(3, 16, 3, padding=1, rngs=nnx.Rngs(1)),
            nn.BatchNorm2d(16, rngs=nnx.Rngs(1)),
            nn.ReLU(),
            nn.AdaptiveAvgPool2d(1),
            nn.Flatten(),
            nn.Linear(16, 7, rngs=nnx.Rngs(1)),  # different head size
        )
        payload = load_checkpoint(path)
        skipped = restore_into(other, payload, strict=False)
        assert any("5" in s for s in skipped)  # head not restored
        np.testing.assert_array_equal(other[0].kernel[...],
                                      net[0].kernel[...])


class TestCastFloats:
    def test_keep_batch_stats_leaves_running_stats_f32(self):
        """Pure-bf16 TRAINING casts must keep BN running stats f32: flax
        computes batch statistics in f32 and assigns them into the stat
        variables — with bf16 stats that is an unsafe f32->bf16 scatter
        cast (a future-JAX error, warned today). keep_batch_stats=True
        narrows params only."""
        import warnings

        from bnn_tpu.utils import cast_floats

        net = make_net()
        cast_floats(net, jnp.bfloat16, keep_batch_stats=True)
        stats = jax.tree.leaves(nnx.state(net, nnx.BatchStat))
        params = jax.tree.leaves(nnx.state(net, nnx.Param))
        assert {v.dtype for v in stats} == {jnp.dtype(jnp.float32)}
        assert {v.dtype for v in params
                if jnp.issubdtype(v.dtype, jnp.floating)} == {
                    jnp.dtype(jnp.bfloat16)}
        # train-mode forward must not hit the unsafe-scatter warning
        net.train()
        x = jnp.zeros((2, 8, 8, 3), jnp.bfloat16)
        with warnings.catch_warnings():
            warnings.simplefilter("error", FutureWarning)
            net(x)

    def test_default_cast_narrows_everything(self):
        from bnn_tpu.utils import cast_floats

        net = make_net()
        cast_floats(net, jnp.bfloat16)
        leaves = [v for v in jax.tree.leaves(nnx.state(net))
                  if jnp.issubdtype(v.dtype, jnp.floating)]
        assert {v.dtype for v in leaves} == {jnp.dtype(jnp.bfloat16)}


class TestOpCounter:
    def test_float_model_all_flops(self):
        net = make_net()
        ops = count_ops(net, (1, 8, 8, 3))
        assert ops.bops == 0
        conv_flops = 2 * 8 * 8 * 16 * 9 * 3
        fc_flops = 2 * 16 * 4
        assert ops.flops == conv_flops + fc_flops

    def test_binary_model_split(self):
        net = prepare_binary_model(make_net(), bconfig=BC,
                                   ignore_layers_name=["_first_"])
        ops = count_ops(net, (1, 8, 8, 3))
        assert ops.flops == 2 * 8 * 8 * 16 * 9 * 3  # conv stays float
        assert ops.bops == 2 * 16 * 4               # binarized fc
        assert ops.effective_flops < ops.flops + ops.bops

    def test_identity_config_counts_as_flops(self):
        # swapped-but-Identity layers are float math
        net = prepare_binary_model(make_net(), bconfig=BC,
                                   custom_config_layers_name={"0": BConfig(),
                                                              "5": BConfig()})
        ops = count_ops(net, (1, 8, 8, 3))
        assert ops.bops == 0

    def test_deployed_model_counts_bops(self):
        from bnn_tpu.inference import deploy
        net = prepare_binary_model(make_net(), bconfig=BC,
                                   ignore_layers_name=["_first_"])
        dep = deploy(net, use_pallas=False)
        ops = count_ops(dep, (1, 8, 8, 3))
        assert ops.bops == 2 * 16 * 4


class TestDeployedCheckpoint:
    def test_deployed_model_round_trip(self, tmp_path):
        """Packed uint32 weights survive Orbax save/restore (serving
        checkpoint flow)."""
        from bnn_tpu.inference import deploy
        net = prepare_binary_model(make_net(), bconfig=BC,
                                   ignore_layers_name=["_first_"])
        net.eval()
        dep = deploy(net, use_pallas=False)
        x = jax.random.normal(jax.random.key(1), (2, 8, 8, 3))
        x = jnp.where(x == 0, 1e-3, x)
        expected = dep(x)
        path = str(tmp_path / "served")
        save_checkpoint(path, dep)

        net2 = prepare_binary_model(make_net(seed=7), bconfig=BC,
                                    ignore_layers_name=["_first_"])
        net2.eval()
        dep2 = deploy(net2, use_pallas=False)
        restore_into(dep2, load_checkpoint(path))
        np.testing.assert_array_equal(dep2(x), expected)

    def test_train_deploy_restore_flow(self, tmp_path):
        """QAT checkpoint -> fresh model -> restore -> deploy matches
        deploying the original."""
        from bnn_tpu.inference import deploy
        net = prepare_binary_model(make_net(), bconfig=BC)
        net.eval()
        path = str(tmp_path / "qat")
        save_checkpoint(path, net)
        x = jax.random.normal(jax.random.key(2), (2, 8, 8, 3))
        x = jnp.where(x == 0, 1e-3, x)
        expected = deploy(net, use_pallas=False)(x)

        fresh = prepare_binary_model(make_net(seed=3), bconfig=BC)
        fresh.eval()
        restore_into(fresh, load_checkpoint(path))
        got = deploy(fresh, use_pallas=False)(x)
        np.testing.assert_array_equal(got, expected)


class TestDebugHelpers:
    """Numeric sanitizers (SURVEY.md §5.2 equivalents)."""

    def test_debug_nans_raises_on_nan(self):
        from bnn_tpu.utils import debug_nans
        import pytest
        with pytest.raises(FloatingPointError):
            with debug_nans():
                jnp.log(jnp.zeros(4)) * 0.0 / 0.0  # 0/0 -> NaN
        # config restored
        assert not jax.config.jax_debug_nans

    def test_checkify_errors_raises_inside_jit(self):
        from bnn_tpu.utils import checkify_errors
        import pytest

        @jax.jit
        def f(x):
            return jnp.sqrt(x)  # NaN for negative input

        g = checkify_errors(f)
        np.testing.assert_allclose(g(jnp.array([4.0])), [2.0])
        with pytest.raises(Exception, match="nan"):
            g(jnp.array([-1.0]))

    def test_assert_finite_names_the_bad_leaf(self):
        from bnn_tpu.utils import assert_finite
        import pytest
        good = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
        assert_finite(good)  # no raise
        bad = {"a": jnp.ones(3), "b": {"c": jnp.array([1.0, jnp.nan])}}
        with pytest.raises(ValueError, match="c"):
            assert_finite(bad, name="grads")
