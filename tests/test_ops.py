"""Unit tests for STE primitives and the binarizer zoo.

Covers the reference test surface (test/test_binarize.py:118-126) plus the
gradient/STE tests the reference lacks (SURVEY.md §4 gaps).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import bnn_tpu
from bnn_tpu import nn
from bnn_tpu.ops import (
    AdvancedInputBinarizer,
    BasicInputBinarizer,
    BasicScaleBinarizer,
    Identity,
    StochasticInputBinarizer,
    XNORScaleBinarizer,
    XNORWeightBinarizer,
    resolve,
    sign_ste,
    stochastic_sign_ste,
    tanh_surrogate_sign,
)


class TestSignSTE:
    def test_forward_matches_sign(self):
        x = jnp.array([-2.0, -0.5, 0.0, 0.3, 1.7])
        np.testing.assert_array_equal(sign_ste(x), jnp.sign(x))

    def test_grad_hardtanh_mask(self):
        # reference zeroes grads where |x| >= 1 (bnn/ops.py:68-73)
        x = jnp.array([-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0])
        g = jax.grad(lambda v: jnp.sum(sign_ste(v)))(x)
        np.testing.assert_array_equal(g, jnp.array([0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 0.0]))

    def test_grad_scales_cotangent(self):
        x = jnp.array([0.5, -0.25])
        g = jax.grad(lambda v: jnp.sum(sign_ste(v) * jnp.array([3.0, 7.0])))(x)
        np.testing.assert_allclose(g, [3.0, 7.0])


class TestStochasticSign:
    def test_outputs_are_binary(self):
        x = jax.random.normal(jax.random.key(0), (1000,))
        y = stochastic_sign_ste(x, jax.random.key(1))
        assert set(np.unique(np.asarray(y))) <= {-1.0, 1.0}

    def test_saturated_inputs_deterministic(self):
        x = jnp.array([2.0, -2.0])
        for i in range(5):
            y = stochastic_sign_ste(x, jax.random.key(i))
            np.testing.assert_array_equal(y, jnp.array([1.0, -1.0]))

    def test_probability_tracks_input(self):
        # P(+1) = (x+1)/2 for x in (-1, 1)
        x = jnp.full((20000,), 0.5)
        y = stochastic_sign_ste(x, jax.random.key(0))
        p = float(jnp.mean(y == 1.0))
        assert abs(p - 0.75) < 0.02

    def test_grad_mask(self):
        x = jnp.array([-2.0, 0.5, 2.0])
        g = jax.grad(lambda v: jnp.sum(stochastic_sign_ste(v, jax.random.key(0))))(x)
        np.testing.assert_array_equal(g, jnp.array([0.0, 1.0, 0.0]))


class TestTanhSurrogate:
    def test_forward_is_sign(self):
        x = jnp.array([-3.0, -0.1, 0.2, 5.0])
        np.testing.assert_array_equal(tanh_surrogate_sign(x), jnp.sign(x))

    def test_grad_is_tanh_derivative(self):
        x = jnp.array([-0.5, 0.0, 0.3])
        t = 5.0
        g = jax.grad(lambda v: jnp.sum(tanh_surrogate_sign(v, t)))(x)
        expected = t * (1.0 - jnp.tanh(x * t) ** 2)
        np.testing.assert_allclose(g, expected, rtol=1e-5)


class TestXNORWeightBinarizer:
    def test_alpha_2d(self):
        w = jnp.array([[1.0, -2.0], [3.0, -4.0], [0.5, 0.5]])  # (in=3, out=2)
        out = XNORWeightBinarizer()(w)
        alpha = jnp.mean(jnp.abs(w), axis=0)  # per-out-channel
        np.testing.assert_allclose(out, jnp.sign(w) * alpha, rtol=1e-6)

    def test_alpha_4d(self):
        w = jax.random.normal(jax.random.key(0), (3, 3, 4, 8))  # HWIO
        out = XNORWeightBinarizer()(w)
        alpha = jnp.mean(jnp.abs(w), axis=(0, 1, 2), keepdims=True)
        np.testing.assert_allclose(out, jnp.sign(w) * alpha, rtol=1e-5)

    def test_no_alpha(self):
        w = jax.random.normal(jax.random.key(1), (5, 7))
        out = XNORWeightBinarizer(compute_alpha=False)(w)
        np.testing.assert_array_equal(out, jnp.sign(w))

    def test_center_weights(self):
        w = jax.random.normal(jax.random.key(2), (3, 3, 4, 8)) + 1.0
        centered = w - jnp.mean(w, axis=-2, keepdims=True)
        out = XNORWeightBinarizer(compute_alpha=False, center_weights=True)(w)
        np.testing.assert_allclose(out, jnp.sign(centered), rtol=1e-6)

    def test_grad_flows_through_ste(self):
        w = jnp.array([[0.5, -0.5]])
        g = jax.grad(lambda v: jnp.sum(XNORWeightBinarizer(compute_alpha=False)(v)))(w)
        np.testing.assert_array_equal(g, jnp.ones_like(w))


class TestScaleBinarizers:
    def test_basic_scale_linear(self):
        lin = nn.Linear(4, 6, rngs=nnx.Rngs(0))
        scale = BasicScaleBinarizer(lin)
        assert scale.alpha[...].shape == (6,)
        out = jnp.ones((2, 6))
        np.testing.assert_array_equal(scale(out, jnp.ones((2, 4))), out)
        scale.alpha[...] = jnp.arange(6.0)
        np.testing.assert_allclose(scale(out, None), jnp.broadcast_to(jnp.arange(6.0), (2, 6)))

    def test_basic_scale_conv(self):
        conv = nn.Conv2d(3, 8, 3, rngs=nnx.Rngs(0))
        scale = BasicScaleBinarizer(conv)
        assert scale.alpha[...].shape == (8,)

    def test_basic_scale_custom_shape(self):
        lin = nn.Linear(4, 6, rngs=nnx.Rngs(0))
        scale = BasicScaleBinarizer(lin, shape=(1, 6))
        assert scale.alpha[...].shape == (1, 6)

    def test_basic_scale_is_trainable(self):
        lin = nn.Linear(4, 6, rngs=nnx.Rngs(0))
        scale = BasicScaleBinarizer(lin)
        params = nnx.state(scale, nnx.Param)
        leaves = jax.tree_util.tree_leaves(params)
        assert len(leaves) == 1 and leaves[0].shape == (6,)

    def test_xnor_scale_matches_manual(self):
        conv = nn.Conv2d(3, 5, 3, stride=1, padding=1, rngs=nnx.Rngs(0))
        scale = XNORScaleBinarizer(conv)
        x = jax.random.normal(jax.random.key(3), (2, 8, 8, 3))
        layer_out = jnp.ones((2, 8, 8, 5))
        result = scale(layer_out, x)
        a = jnp.mean(jnp.abs(x), axis=-1, keepdims=True)
        k = jnp.full((3, 3, 1, 1), 1.0 / 9.0)
        expected = layer_out * bnn_tpu.functional.conv(a, k, stride=1, padding=1)
        np.testing.assert_allclose(result, expected, rtol=1e-5)


    def test_xnor_scale_dilated_conv(self):
        """The scale map must trace the layer's dilation, or its spatial
        shape mismatches the layer output (e.g. BATS DilConv)."""
        from bnn_tpu import BConfig, prepare_binary_model
        from bnn_tpu.ops import BasicInputBinarizer, XNORWeightBinarizer

        conv = nn.Conv2d(4, 8, 3, padding=2, dilation=2, rngs=nnx.Rngs(0))
        b = prepare_binary_model(conv, bconfig=BConfig(
            BasicInputBinarizer, XNORScaleBinarizer, XNORWeightBinarizer))
        out = b(jax.random.normal(jax.random.key(0), (1, 8, 8, 4)))
        assert out.shape == (1, 8, 8, 8)


class TestIdentityAndRegistry:
    def test_identity_one_and_two_arg(self):
        ident = Identity()
        x = jnp.ones((3,))
        np.testing.assert_array_equal(ident(x), x)
        np.testing.assert_array_equal(ident(x, jnp.zeros((3,))), x)

    def test_registry_resolution(self):
        assert resolve("BasicInputBinarizer") is BasicInputBinarizer
        assert resolve("XNORWeightBinarizer") is XNORWeightBinarizer
        assert resolve("Identity") is Identity
        assert resolve("nn.Identity") is Identity

    def test_registry_unknown_raises(self):
        with pytest.raises(KeyError, match="Unknown binarizer"):
            resolve("NotARealBinarizer")

    def test_with_args(self):
        factory = XNORWeightBinarizer.with_args(compute_alpha=False)
        b1, b2 = factory(), factory()
        assert b1 is not b2
        assert b1.compute_alpha is False
        chained = factory.with_args(center_weights=True)()
        assert chained.compute_alpha is False and chained.center_weights is True

    def test_stochastic_binarizer_module(self):
        b = StochasticInputBinarizer()
        y = b(jax.random.normal(jax.random.key(0), (100,)))
        assert set(np.unique(np.asarray(y))) <= {-1.0, 1.0}

    def test_advanced_binarizer_module(self):
        b = AdvancedInputBinarizer(t=3.0)
        x = jnp.array([-0.5, 0.5])
        np.testing.assert_array_equal(b(x), jnp.sign(x))


class TestReferenceFunctionShims:
    """The reference exposes raw autograd Functions (bnn/ops.py:51-92);
    ported user code calls them as ``SignActivation.apply(x)``."""

    def test_sign_activation_apply(self):
        import jax
        import jax.numpy as jnp
        from bnn_tpu.ops import SignActivation, sign_ste

        x = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
        assert jnp.all(SignActivation.apply(x) == sign_ste(x))
        g = jax.grad(lambda v: jnp.sum(SignActivation.apply(v)))(x)
        assert jnp.allclose(g, jnp.asarray([0.0, 1.0, 1.0, 1.0, 0.0]))

    def test_stochastic_apply(self):
        import jax
        import jax.numpy as jnp
        from bnn_tpu.ops import SignActivationStochastic

        x = jax.random.normal(jax.random.key(0), (128,))
        y = SignActivationStochastic.apply(x, jax.random.key(1))
        assert set(map(float, jnp.unique(y))) <= {-1.0, 1.0}


class TestPoolGradModes:
    """max_pool tie-routing knob (bnn_tpu/functional.py): 'exact' is the
    torch-parity select_and_scatter default; 'all_ties' is the opt-in fast
    backward (sends the window gradient to EVERY tied maximum) measured in
    benchmarks/train_sweep.py. On tie-free inputs the two must agree."""

    def _grad(self, x, g, k=3, s=2, p=1):
        import bnn_tpu.functional as F

        return jax.grad(lambda v: (F.max_pool(v, k, s, p) * g).sum())(x)

    def test_unknown_mode_raises(self):
        # a typo'd mode must raise, not silently keep 'exact' routing
        import bnn_tpu.functional as F

        with pytest.raises(ValueError, match="allties"):
            F.set_pool_grad_mode("allties")
        assert F._POOL_GRAD_MODE == "exact"

    def test_tie_free_matches_exact(self):
        import bnn_tpu.functional as F

        x = jax.random.normal(jax.random.key(0), (2, 13, 13, 5))
        g = jax.random.normal(jax.random.key(1), (2, 7, 7, 5))
        gx_exact = self._grad(x, g)
        out_exact = F.max_pool(x, 3, 2, 1)
        prev = F.set_pool_grad_mode("all_ties")
        try:
            assert jnp.array_equal(F.max_pool(x, 3, 2, 1), out_exact)
            gx_at = self._grad(x, g)
        finally:
            F.set_pool_grad_mode(prev)
        np.testing.assert_allclose(np.asarray(gx_at), np.asarray(gx_exact),
                                   rtol=0, atol=1e-5)

    def test_ties_share_gradient(self):
        import bnn_tpu.functional as F

        x = jnp.zeros((1, 4, 4, 1)).at[0, 1, 1, 0].set(5.0)
        x = x.at[0, 1, 2, 0].set(5.0)
        g = jnp.ones((1, 2, 2, 1))
        prev = F.set_pool_grad_mode("all_ties")
        try:
            gx = np.asarray(self._grad(x, g))[0, :, :, 0]
        finally:
            F.set_pool_grad_mode(prev)
        # (1,1) is max of 4 windows, (1,2) ties in the two right windows
        assert gx[1, 1] == 4.0 and gx[1, 2] == 2.0
        gx_exact = np.asarray(self._grad(x, g))[0, :, :, 0]
        assert gx_exact[1, 1] == 4.0 and gx_exact[1, 2] == 0.0  # first-argmax

    def test_default_mode_is_exact(self):
        import bnn_tpu.functional as F

        assert F._POOL_GRAD_MODE == "exact"

    def test_index_mode_bitwise_matches_exact(self):
        """'index' (int8 argmax map + gather backward) reproduces the
        select_and_scatter routing bit-for-bit, ties included."""
        import bnn_tpu.functional as F

        rng = np.random.default_rng(0)
        for shape, k, s, p, cm in [
            ((2, 16, 16, 4), 3, 2, 1, False),     # the ResNet stem geometry
            ((1, 10, 10, 3), 2, 2, 0, False),     # tiling, no pad
            ((1, 11, 9, 3), 3, 1, 1, False),      # stride 1 (dense overlap)
            ((1, 14, 14, 2), 2, 3, 0, False),     # stride > kernel (gaps)
            ((1, 11, 11, 2), 3, 2, 1, True),      # ceil_mode extension
            ((1, 8, 8, 2), (3, 2), (2, 3), (1, 0), False),  # asymmetric
        ]:
            # quantize so duplicate maxima (ties) are common
            x = jnp.asarray(
                np.round(rng.standard_normal(shape) * 4) / 4, jnp.float32)

            def grad(mode):
                prev = F.set_pool_grad_mode(mode)
                try:
                    def loss(v):
                        o = F.max_pool(v, k, s, p, ceil_mode=cm)
                        w = jnp.arange(o.size, dtype=jnp.float32)
                        return (o * w.reshape(o.shape)).sum()
                    return (F.max_pool(x, k, s, p, ceil_mode=cm),
                            jax.grad(loss)(x))
                finally:
                    F.set_pool_grad_mode(prev)

            (o1, g1), (o2, g2) = grad("exact"), grad("index")
            assert jnp.array_equal(o1, o2), (shape, k, s, p, cm)
            assert jnp.array_equal(g1, g2), (shape, k, s, p, cm)

    def test_index_mode_beats_exact_on_uncovered_tail(self):
        """When (H + 2p - k) % s != 0 leaves trailing REAL input rows
        uncovered by any window (H=9, k=3, s=3, p=1 leaves row/col 8
        uncovered), torch gives those rows zero gradient. JAX's
        reduce_window transpose (select_and_scatter path — our 'exact'
        mode) incorrectly scatters gradient into them; the 'index'
        backward gathers only from real covering windows and matches
        torch. Oracle: torch.nn.functional.max_pool2d backward."""
        import bnn_tpu.functional as F

        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        x_np = np.round(rng.standard_normal((2, 9, 9, 2)) * 4) / 4
        xt = torch.tensor(x_np.transpose(0, 3, 1, 2), dtype=torch.float32,
                          requires_grad=True)
        ot = torch.nn.functional.max_pool2d(xt, 3, 3, 1)
        w = torch.arange(ot.numel(), dtype=torch.float32)
        (ot * w.reshape(2, 3, 3, 2).permute(0, 3, 1, 2)).sum().backward()
        gt = xt.grad.numpy().transpose(0, 2, 3, 1)

        x = jnp.asarray(x_np, jnp.float32)
        prev = F.set_pool_grad_mode("index")
        try:
            def loss(v):
                o = F.max_pool(v, 3, 3, 1)
                wts = jnp.arange(o.size, dtype=jnp.float32)
                return (o * wts.reshape(o.shape)).sum()
            gx = jax.grad(loss)(x)
        finally:
            F.set_pool_grad_mode(prev)
        np.testing.assert_array_equal(np.asarray(gx), gt)
        # the uncovered tail must be exactly zero
        assert np.abs(np.asarray(gx)[:, 8, :, :]).sum() == 0.0
        assert np.abs(np.asarray(gx)[:, :, 8, :]).sum() == 0.0
