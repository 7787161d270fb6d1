"""Tests for the model transformation pass.

Mirrors the reference's test/test_binarize.py (single-layer swap, whole-net
swap with per-layer fp32 override, state round-trip) and adds the ignore-rule
tests the reference lacks (SURVEY.md §4 gaps — these would have caught the
swapped `_first_`/`_last_` mapping, reference bnn/binarize.py:47-50).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from bnn_tpu import BConfig, nn, named_modules, prepare_binary_model
from bnn_tpu import layers as blayers
from bnn_tpu.ops import (
    BasicInputBinarizer,
    BasicScaleBinarizer,
    Identity,
    XNORWeightBinarizer,
)

BCONFIG = BConfig(
    activation_pre_process=BasicInputBinarizer,
    activation_post_process=BasicScaleBinarizer,
    weight_pre_process=XNORWeightBinarizer,
)


def make_net(seed: int = 0) -> nn.Sequential:
    rngs = nnx.Rngs(seed)
    return nn.Sequential(
        nn.Conv2d(3, 16, 1, rngs=rngs),
        nn.BatchNorm2d(16, rngs=rngs),
        nn.ReLU(),
        nn.Conv2d(16, 16, 1, rngs=rngs),
        nn.BatchNorm2d(16, rngs=rngs),
        nn.ReLU(),
        nn.AdaptiveAvgPool2d(1),
        nn.Flatten(),
        nn.Linear(16, 3, rngs=rngs),
    )


class TestNamedModules:
    def test_order_and_paths(self):
        net = make_net()
        names = [n for n, _ in named_modules(net)]
        assert names[0] == ""
        assert "0" in names and "8" in names
        # depth-first, root-first like torch
        assert names.index("0") < names.index("1")

    def test_nested_paths(self):
        class Block(nnx.Module):
            def __init__(self, rngs):
                self.conv1 = nn.Conv2d(3, 3, 3, rngs=rngs)
                self.downsample = nn.Sequential(
                    nn.AvgPool2d(2), nn.Conv2d(3, 3, 1, rngs=rngs)
                )

        class Model(nnx.Module):
            def __init__(self, rngs):
                self.layer1 = nn.Sequential(Block(rngs), Block(rngs))

        m = Model(nnx.Rngs(0))
        names = {n for n, _ in named_modules(m)}
        assert "layer1.0.conv1" in names
        assert "layer1.1.downsample.1" in names


class TestPrepareBinaryModel:
    def test_single_layer_swap_returns_binary_type(self):
        layer = nn.Linear(4, 4, rngs=nnx.Rngs(0))
        out = prepare_binary_model(layer, bconfig=BCONFIG)
        assert isinstance(out, blayers.Linear)

    def test_whole_net_swap(self):
        net = prepare_binary_model(make_net(), bconfig=BCONFIG)
        assert isinstance(net[0], blayers.Conv2d)
        assert isinstance(net[3], blayers.Conv2d)
        assert isinstance(net[8], blayers.Linear)
        # non-swappable layers untouched
        assert isinstance(net[1], nn.BatchNorm2d)

    def test_custom_config_override_keeps_layer_fp32(self):
        # reference cifar10.py convention: swap but with all-Identity config
        net = prepare_binary_model(
            make_net(), bconfig=BCONFIG,
            custom_config_layers_name={"0": BConfig(), "8": BConfig()},
        )
        num_identity = sum(
            isinstance(m, (blayers.Conv2d, blayers.Linear))
            and isinstance(m.weight_pre_process, Identity)
            for _, m in named_modules(net)
        )
        assert num_identity == 2
        assert isinstance(net[0], blayers.Conv2d)  # still swapped
        assert isinstance(net[0].activation_pre_process, Identity)
        assert isinstance(net[3].activation_pre_process, BasicInputBinarizer)

    def test_ignore_literal(self):
        net = prepare_binary_model(make_net(), bconfig=BCONFIG,
                                   ignore_layers_name=["3"])
        assert isinstance(net[0], blayers.Conv2d)
        assert type(net[3]) is nn.Conv2d

    def test_ignore_first_last(self):
        net = prepare_binary_model(make_net(), bconfig=BCONFIG,
                                   ignore_layers_name=["_first_", "_last_"])
        assert type(net[0]) is nn.Conv2d  # first conv kept fp32
        assert type(net[8]) is nn.Linear  # last linear kept fp32
        assert isinstance(net[3], blayers.Conv2d)

    def test_ignore_first_only(self):
        # would have caught the reference's swapped special-word dict
        net = prepare_binary_model(make_net(), bconfig=BCONFIG,
                                   ignore_layers_name=["_first_"])
        assert type(net[0]) is nn.Conv2d
        assert isinstance(net[8], blayers.Linear)

    def test_ignore_last_only(self):
        net = prepare_binary_model(make_net(), bconfig=BCONFIG,
                                   ignore_layers_name=["_last_"])
        assert isinstance(net[0], blayers.Conv2d)
        assert type(net[8]) is nn.Linear

    def test_ignore_regex(self):
        class Model(nnx.Module):
            def __init__(self, rngs):
                self.layer1 = nn.Sequential(nn.Conv2d(3, 3, 1, rngs=rngs))
                self.layer2 = nn.Sequential(nn.Conv2d(3, 3, 1, rngs=rngs))
                self.fc = nn.Linear(3, 3, rngs=rngs)

        m = prepare_binary_model(Model(nnx.Rngs(0)), bconfig=BCONFIG,
                                 ignore_layers_name=["$layer2.*$"])
        assert isinstance(m.layer1[0], blayers.Conv2d)
        assert type(m.layer2[0]) is nn.Conv2d
        assert isinstance(m.fc, blayers.Linear)

    def test_weights_shared_with_float_model(self):
        net = make_net()
        w_ref = net[0].kernel
        bnet = prepare_binary_model(net, bconfig=BCONFIG)
        assert bnet[0].kernel is w_ref

    def test_reconversion_of_binary_model(self):
        # identity self-mapping: a binary model can be re-converted
        net = prepare_binary_model(make_net(), bconfig=BCONFIG)
        w_ref = net[0].kernel
        net2 = prepare_binary_model(net, bconfig=BCONFIG)
        assert isinstance(net2[0], blayers.Conv2d)
        assert net2[0].kernel is w_ref


class TestStateRoundTrip:
    def test_state_dict_round_trip(self):
        """Save a binarized model's state, rebuild fresh, load, outputs equal
        (reference: test/test_binarize.py:95-110)."""
        net = prepare_binary_model(make_net(seed=0), bconfig=BCONFIG)
        net.eval()
        # perturb a binarizer param so the round-trip is non-trivial
        net[3].activation_post_process.alpha[...] = jnp.linspace(0.5, 2.0, 16)
        x = jax.random.normal(jax.random.key(42), (2, 8, 8, 3))
        expected = net(x)

        state = nnx.state(net)
        fresh = prepare_binary_model(make_net(seed=123), bconfig=BCONFIG)
        fresh.eval()
        nnx.update(fresh, state)
        np.testing.assert_array_equal(fresh(x), expected)

    def test_forward_under_jit(self):
        net = prepare_binary_model(make_net(), bconfig=BCONFIG)
        net.eval()
        x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
        eager = net(x)
        jitted = nnx.jit(lambda m, v: m(v))(net, x)
        np.testing.assert_allclose(jitted, eager, atol=1e-6)

    def test_gradients_flow_through_binarized_net(self):
        net = prepare_binary_model(make_net(), bconfig=BCONFIG)
        net.train()

        def loss_fn(model, v):
            return jnp.mean(model(v) ** 2)

        x = jax.random.normal(jax.random.key(1), (2, 8, 8, 3)) * 0.1
        grads = nnx.grad(loss_fn)(net, x)
        leaves = jax.tree_util.tree_leaves(grads)
        assert leaves, "no gradient leaves"
        assert any(float(jnp.sum(jnp.abs(g))) > 0 for g in leaves)


class TestContainerWalk:
    """Dict/list containers in the module walk and by-name replacement
    (VERDICT r2 weak #7; reference walks torch's _modules registry which
    covers ModuleDict — bnn/binarize.py traversal)."""

    def _dict_net(self):
        class DictNet(nnx.Module):
            def __init__(self, rngs):
                # flax >= 0.12 requires dict attrs be marked as data
                self.branches = nnx.data({
                    "a": nn.Conv2d(3, 8, 1, rngs=rngs),
                    "b": nn.Conv2d(3, 8, 1, rngs=rngs),
                })
                self.head = nn.Linear(16, 4, rngs=rngs)

            def __call__(self, x):
                ya = self.branches["a"](x).mean(axis=(1, 2))
                yb = self.branches["b"](x).mean(axis=(1, 2))
                return self.head(jnp.concatenate([ya, yb], axis=-1))

        return DictNet(nnx.Rngs(0))

    def test_named_modules_sees_dict_children(self):
        net = self._dict_net()
        names = dict(named_modules(net))
        assert "branches.a" in names and "branches.b" in names

    def test_binarize_reaches_dict_children(self):
        net = prepare_binary_model(self._dict_net(), bconfig=BCONFIG)
        assert isinstance(net.branches["a"], blayers.Conv2d)
        assert isinstance(net.branches["b"], blayers.Conv2d)
        assert isinstance(net.head, blayers.Linear)
        out = net(jnp.ones((2, 4, 4, 3)))
        assert out.shape == (2, 4)

    def test_set_module_by_name_in_list(self):
        from bnn_tpu.binarize import get_module_by_name, set_module_by_name

        class ListNet(nnx.Module):
            def __init__(self, rngs):
                self.blocks = nnx.data([nn.Linear(4, 4, rngs=rngs),
                                        nn.Linear(4, 4, rngs=rngs)])

        net = ListNet(nnx.Rngs(0))
        new = nn.Linear(4, 4, rngs=nnx.Rngs(7))
        set_module_by_name(net, "blocks.1", new)
        assert net.blocks[1] is new
        assert get_module_by_name(net, "blocks.1") is new


class TestSharedAndContainerModules:
    def test_weight_tied_module_swaps_at_every_path(self):
        """A module referenced from two parents must be binarized at BOTH
        references (it used to silently stay float at the second path)."""
        class Tied(nnx.Module):
            def __init__(self, rngs):
                lin = nn.Linear(4, 4, rngs=rngs)
                self.a = lin
                self.b = lin

            def __call__(self, x):
                return self.b(self.a(x))

        t = prepare_binary_model(Tied(nnx.Rngs(0)), bconfig=BCONFIG)
        assert isinstance(t.a, blayers.Linear)
        assert isinstance(t.b, blayers.Linear)
        assert t.a is t.b  # tying preserved: ONE binary module
        t(jnp.ones((2, 4)))

    def test_nnx_list_children_walk_and_swap(self):
        """flax's nnx.List stores children under INT keys in vars() —
        the walk used to crash on key.startswith and the swap could not
        address the children."""
        nnx_list = getattr(nnx, "List", None)
        if nnx_list is None:
            pytest.skip("this flax has no nnx.List")

        class M(nnx.Module):
            def __init__(self, rngs):
                self.blocks = nnx_list([nn.Linear(4, 4, rngs=rngs),
                                        nn.Linear(4, 2, rngs=rngs)])

            def __call__(self, x):
                for b in self.blocks:
                    x = b(x)
                return x

        m = prepare_binary_model(M(nnx.Rngs(0)), bconfig=BCONFIG)
        assert all(isinstance(b, blayers.Linear) for b in m.blocks)
        assert m(jnp.ones((2, 4))).shape == (2, 2)


class TestStockFlaxModel:
    """Binarizing a model built from stock flax layers (nnx.Conv/nnx.Linear)
    — the reference maps every float layer type it supports
    (bnn/binarize.py:12-18); VERDICT r2 missing #4."""

    def _flax_cnn(self):
        class CNN(nnx.Module):
            def __init__(self, rngs):
                self.conv1 = nnx.Conv(3, 16, (3, 3), strides=1,
                                      padding="SAME", rngs=rngs)
                self.conv2 = nnx.Conv(16, 32, (3, 3), strides=2,
                                      padding="SAME", rngs=rngs)
                self.fc = nnx.Linear(32, 5, rngs=rngs)

            def __call__(self, x):
                x = jax.nn.relu(self.conv1(x))
                x = jax.nn.relu(self.conv2(x))
                return self.fc(x.mean(axis=(1, 2)))

        return CNN(nnx.Rngs(0))

    def test_convs_and_linear_binarize(self):
        net = self._flax_cnn()
        w1 = net.conv1.kernel
        bnet = prepare_binary_model(net, bconfig=BCONFIG)
        assert isinstance(bnet.conv1, blayers.Conv2d)
        assert isinstance(bnet.conv2, blayers.Conv2d)
        assert isinstance(bnet.fc, blayers.Linear)
        assert bnet.conv1.kernel is w1  # adopted by reference, not copied
        out = bnet(jnp.ones((2, 8, 8, 3)))
        assert out.shape == (2, 5)

    def test_geometry_preserved(self):
        """Binarized-with-Identity flax conv computes the same conv."""
        from bnn_tpu.ops import Identity

        ident = BConfig(activation_pre_process=Identity,
                        activation_post_process=Identity,
                        weight_pre_process=Identity)
        conv = nnx.Conv(3, 8, (3, 3), strides=2, padding="SAME",
                        rngs=nnx.Rngs(0))
        x = jax.random.normal(jax.random.key(5), (2, 9, 9, 3))
        expected = conv(x)
        bconv = blayers.Conv2d.from_module(conv, ident)
        np.testing.assert_allclose(bconv(x), expected, rtol=1e-5, atol=1e-5)

    def test_1d_flax_conv_dispatches(self):
        conv = nnx.Conv(4, 8, (5,), padding="SAME", rngs=nnx.Rngs(0))
        b = blayers.Conv2d.from_module(conv, BCONFIG)
        assert isinstance(b, blayers.Conv1d)
        out = b(jnp.ones((2, 16, 4)))
        assert out.shape == (2, 16, 8)

    def test_pair_padding_maps(self):
        conv = nnx.Conv(3, 8, (3, 3), padding=[(1, 1), (1, 1)],
                        rngs=nnx.Rngs(0))
        b = blayers.Conv2d.from_module(conv, BCONFIG)
        assert b.padding == (1, 1)

    def test_ignore_first_last_applies_to_flax(self):
        net = self._flax_cnn()
        bnet = prepare_binary_model(net, bconfig=BCONFIG,
                                    ignore_layers_name=["_first_", "_last_"])
        assert type(bnet.conv1) is nnx.Conv     # first stays float
        assert type(bnet.fc) is nnx.Linear      # last stays float
        assert isinstance(bnet.conv2, blayers.Conv2d)


def test_int_keyed_dict_container_round_trip():
    """Int-keyed dict children: dotted names stringify the key, so
    get/set_module_by_name must fall back to int keys (review r3)."""
    from bnn_tpu.binarize import get_module_by_name, set_module_by_name

    class Net(nnx.Module):
        def __init__(self, rngs):
            self.d = nnx.data({0: nn.Linear(4, 4, rngs=rngs),
                               1: nn.Linear(4, 4, rngs=rngs)})

    net = Net(nnx.Rngs(0))
    names = dict(named_modules(net))
    assert "d.0" in names
    assert get_module_by_name(net, "d.0") is net.d[0]
    bnet = prepare_binary_model(net, bconfig=BCONFIG)
    assert isinstance(bnet.d[0], blayers.Linear)
    new = nn.Linear(4, 4, rngs=nnx.Rngs(5))
    set_module_by_name(bnet, "d.1", new)
    assert bnet.d[1] is new
