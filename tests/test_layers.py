"""Golden-numerics parity tests for the binary layers.

The input/weight/expected constants are the reference's golden vectors
(test/test_layers.py:22-25, 37, 47-49, 59-66), transposed from NCHW/OIHW to
this framework's channels-last NHWC/HWIO layouts. Values must match to 1e-4,
establishing bit-level parity of the binarization math.
"""
import jax.numpy as jnp
import numpy as np
from flax import nnx

from bnn_tpu import BConfig, nn, prepare_binary_model
from bnn_tpu import layers as blayers
from bnn_tpu.ops import BasicInputBinarizer, BasicScaleBinarizer, XNORWeightBinarizer

DATA = np.array(
    [-0.05263, -0.05068, -0.03849, 0.03104, 0.0772, 0.03038, -0.06640, 0.05894,
     0.13059, 0.03433, -0.25811, 0.13785],
    dtype=np.float32,
).reshape(1, 3, 2, 2)  # NCHW as in the reference
WEIGHTS = np.array(
    [-0.0252, 0.0084, -0.0676, 0.0891, -0.0010, 0.0518, 0.0380, 0.2866, -0.0050],
    dtype=np.float32,
)

BCONFIG = BConfig(
    activation_pre_process=BasicInputBinarizer,
    activation_post_process=BasicScaleBinarizer,
    weight_pre_process=XNORWeightBinarizer,
)


def test_linear_layer():
    layer = nn.Linear(3, 3, bias=False, rngs=nnx.Rngs(0))
    # torch weight is (out, in); ours is (in, out)
    layer.kernel[...] = jnp.asarray(WEIGHTS.reshape(3, 3).T)
    x = jnp.asarray(DATA[:, :, 0, 0].reshape(1, 3))
    layer = prepare_binary_model(layer, bconfig=BCONFIG)
    assert isinstance(layer, blayers.Linear)

    output = layer(x)
    expected = jnp.array([[0.0337, -0.0473, -0.1099]])
    np.testing.assert_allclose(output, expected, atol=1e-4)


def test_conv1d_layer():
    layer = nn.Conv1d(3, 3, 1, bias=False, rngs=nnx.Rngs(0))
    # torch (O, I, W) -> ours (W, I, O)
    w_oiw = WEIGHTS.reshape(3, 3, 1)
    layer.kernel[...] = jnp.asarray(np.transpose(w_oiw, (2, 1, 0)))
    # torch NCL -> NLC
    x = jnp.asarray(np.transpose(DATA[:, :, :, 0].reshape(1, 3, 2), (0, 2, 1)))
    layer = prepare_binary_model(layer, bconfig=BCONFIG)
    assert isinstance(layer, blayers.Conv1d)

    output = layer(x)
    expected_ncl = np.array([[[0.0337, 0.0337], [-0.0473, -0.0473], [-0.1099, -0.1099]]])
    np.testing.assert_allclose(output, np.transpose(expected_ncl, (0, 2, 1)), atol=1e-4)


def test_conv2d_layer():
    layer = nn.Conv2d(3, 3, 1, bias=False, rngs=nnx.Rngs(0))
    # torch (O, I, H, W) -> ours (H, W, I, O)
    w_oihw = WEIGHTS.reshape(3, 3, 1, 1)
    layer.kernel[...] = jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)))
    x = jnp.asarray(np.transpose(DATA, (0, 2, 3, 1)))  # NCHW -> NHWC
    layer = prepare_binary_model(layer, bconfig=BCONFIG)
    assert isinstance(layer, blayers.Conv2d)

    output = layer(x)
    expected_nchw = np.array(
        [[[[0.0337, 0.0337], [0.0337, -0.0337]],
          [[-0.0473, -0.0473], [-0.0473, 0.0473]],
          [[-0.1099, -0.1099], [-0.1099, 0.1099]]]]
    )
    np.testing.assert_allclose(output, np.transpose(expected_nchw, (0, 2, 3, 1)), atol=1e-4)


def test_post_process_receives_original_input():
    """The two-arg post contract: post(layer_out, ORIGINAL layer_in)
    (reference bnn/layers/conv.py:94-97)."""
    captured = {}

    class Probe(BasicScaleBinarizer):
        def __call__(self, layer_out, layer_in=None):
            captured["in"] = layer_in
            return super().__call__(layer_out, layer_in)

    layer = nn.Linear(3, 3, bias=False, rngs=nnx.Rngs(0))
    bconfig = BConfig(
        activation_pre_process=BasicInputBinarizer,
        activation_post_process=Probe,
        weight_pre_process=XNORWeightBinarizer,
    )
    layer = prepare_binary_model(layer, bconfig=bconfig)
    x = jnp.array([[0.5, -0.2, 0.1]])
    layer(x)
    np.testing.assert_array_equal(captured["in"], x)  # original, not sign(x)


def test_from_module_shares_parameters():
    float_layer = nn.Linear(4, 2, rngs=nnx.Rngs(0))
    binary = blayers.Linear.from_module(float_layer, BCONFIG)
    assert binary.kernel is float_layer.kernel
    assert binary.bias is float_layer.bias
    # mutating one is visible through the other (progressive-step semantics)
    float_layer.kernel[...] = jnp.zeros_like(float_layer.kernel[...])
    np.testing.assert_array_equal(binary.kernel[...], 0.0)


def test_binary_conv_geometry_preserved():
    float_layer = nn.Conv2d(3, 8, 3, stride=2, padding=1, groups=1, bias=True,
                            rngs=nnx.Rngs(0))
    binary = blayers.Conv2d.from_module(float_layer, BCONFIG)
    assert binary.kernel_size == (3, 3)
    assert binary.stride == (2, 2)
    assert binary.padding == (1, 1)
    assert binary.kernel is float_layer.kernel
    x = jnp.ones((1, 8, 8, 3))
    assert binary(x).shape == (1, 4, 4, 8)


def test_update_copies_binarizer_state():
    float_layer = nn.Linear(4, 2, rngs=nnx.Rngs(0))
    b1 = blayers.Linear.from_module(float_layer, BCONFIG)
    b1.activation_post_process.alpha[...] = jnp.array([3.0, 4.0])
    b2 = blayers.Linear.from_module(b1, BCONFIG, update=True)
    np.testing.assert_array_equal(b2.activation_post_process.alpha[...], [3.0, 4.0])
    b3 = blayers.Linear.from_module(b1, BCONFIG, update=False)
    np.testing.assert_array_equal(b3.activation_post_process.alpha[...], [1.0, 1.0])


class TestContainersAndPools:
    def test_sequential_setitem_in_range_replaces(self):
        s = nn.Sequential(nn.ReLU(), nn.ReLU())
        s[1] = nn.Identity()
        assert isinstance(s[1], nn.Identity) and len(s) == 2

    def test_sequential_setitem_out_of_range_raises(self):
        """torch parity: assignment cannot extend the container — an
        out-of-range setattr would create an orphan layer the forward
        never runs (but binarize/checkpoint would walk)."""
        import pytest

        s = nn.Sequential(nn.ReLU(), nn.ReLU())
        with pytest.raises(IndexError):
            s[2] = nn.ReLU()
        with pytest.raises(IndexError):
            s[-3] = nn.ReLU()

    def test_adaptive_avg_pool_non_divisible_matches_torch(self):
        """torch's variable-window semantics on non-divisible sizes —
        a fixed-kernel approximation is silently wrong numerically."""
        import pytest

        torch = pytest.importorskip("torch")
        from bnn_tpu import functional as F

        for size, out in ((7, 3), (5, 2), (10, 4)):
            x = np.random.RandomState(size).rand(2, size, size, 3)
            x = x.astype(np.float32)
            got = np.asarray(F.adaptive_avg_pool(jnp.asarray(x), out))
            want = torch.nn.functional.adaptive_avg_pool2d(
                torch.from_numpy(x.transpose(0, 3, 1, 2)), out
            ).numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
