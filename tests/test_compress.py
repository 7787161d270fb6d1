"""Weight-only int8/int4 compression of the float remainder of a deployed
model (inference/compress.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from bnn_tpu import BConfig, nn, models, prepare_binary_model
from bnn_tpu.inference import (
    DeployedConv,
    QuantizedConv,
    QuantizedLinear,
    deploy,
    quantize_float_layers,
    state_bytes,
)
from bnn_tpu.inference.compress import _pack_int4, _quantize, _unpack_int4
from bnn_tpu.ops import (
    BasicInputBinarizer,
    BasicScaleBinarizer,
    XNORWeightBinarizer,
)


def _bconfig():
    return BConfig(
        activation_pre_process=BasicInputBinarizer,
        activation_post_process=BasicScaleBinarizer,
        weight_pre_process=XNORWeightBinarizer,
    )


def test_int4_pack_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(-7, 8, size=(3, 64, 5)).astype(np.int8)
    packed = _pack_int4(jnp.asarray(q))
    assert packed.shape == (3, 32, 5)
    out = _unpack_int4(packed)
    np.testing.assert_array_equal(np.asarray(out), q)


@pytest.mark.parametrize("group", [None, 16])
def test_quantize_error_bound(group):
    w = jax.random.normal(jax.random.key(0), (7, 7, 3, 64))
    q, scale = _quantize(w, 8, group)
    if group is None:
        deq = q.astype(jnp.float32) * scale
        deq = deq.reshape(w.shape)
    else:
        deq = (q.astype(jnp.float32) * scale[:, None, :]).reshape(-1, 64)
        deq = deq[: 7 * 7 * 3].reshape(w.shape)
    err = jnp.max(jnp.abs(deq - w))
    bound = jnp.max(jnp.abs(w)) / 127.0 * 0.5 + 1e-6
    # per-channel/group scales only tighten the per-tensor bound
    assert float(err) <= float(bound) * 1.001


@pytest.mark.parametrize("bits", [8, 4])
def test_quantized_linear_close(bits):
    lin = nn.Linear(512, 1000, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.key(1), (4, 512))
    y_ref = lin(x)
    qlin = QuantizedLinear(lin, bits=bits)
    y = qlin(x)
    rel = float(jnp.max(jnp.abs(y - y_ref)) / jnp.max(jnp.abs(y_ref)))
    assert rel < (0.01 if bits == 8 else 0.12)
    stored = qlin.w_q[...].size * qlin.w_q[...].dtype.itemsize
    assert stored <= 512 * 1000 * (1 if bits == 8 else 0.5)


@pytest.mark.parametrize("bits", [8, 4])
def test_quantized_conv_close(bits):
    conv = nn.Conv2d(3, 64, 7, stride=2, padding=3, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    y_ref = conv(x)
    y = QuantizedConv(conv, bits=bits)(x)
    rel = float(jnp.max(jnp.abs(y - y_ref)) / jnp.max(jnp.abs(y_ref)))
    assert rel < (0.01 if bits == 8 else 0.08)


@pytest.mark.slow
def test_quantize_float_layers_end_to_end():
    m = models.resnet18(num_classes=10, rngs=nnx.Rngs(0))
    m = prepare_binary_model(m, bconfig=_bconfig(),
                             ignore_layers_name=["_first_", "_last_"])
    m.eval()
    x = jax.random.normal(jax.random.key(2), (1, 64, 64, 3))
    dep = deploy(m, use_pallas=False, weight_format="packed")
    y_ref = dep(x)
    before = state_bytes(dep)
    # num_classes=10 shrinks fc below the default min_params; quantize it
    # explicitly but keep the sign-feeding stem conv in float (its
    # quantization error would flip sign bits downstream)
    quantize_float_layers(dep, bits=8, min_params=4096, skip=("conv1",))
    after = state_bytes(dep)
    assert after < before  # fc shrank ~4x
    kinds = {type(mm) for _, mm in _iter(dep)}
    assert QuantizedLinear in kinds and QuantizedConv not in kinds
    assert DeployedConv in kinds
    y = dep(x)
    rel = float(jnp.max(jnp.abs(y - y_ref)) / (jnp.max(jnp.abs(y_ref)) + 1e-9))
    assert rel < 0.02


def _iter(model):
    from bnn_tpu.binarize import named_modules
    return named_modules(model)


def test_single_layer_model_returned():
    lin = nn.Linear(8, 8, rngs=nnx.Rngs(0))
    out = quantize_float_layers(lin, min_params=0)
    assert isinstance(out, QuantizedLinear)


def test_min_params_skips_small():
    m = nn.Sequential(nn.Conv2d(3, 4, 1, rngs=nnx.Rngs(0)),
                      nn.Linear(4096, 1000, rngs=nnx.Rngs(0)))
    quantize_float_layers(m, min_params=1000)
    assert type(m[0]) is nn.Conv2d
    assert isinstance(m[1], QuantizedLinear)


def test_predictor_with_quantized_head():
    from bnn_tpu.inference import Predictor

    m = models.resnet18(num_classes=1000, rngs=nnx.Rngs(0))
    m = prepare_binary_model(m, bconfig=_bconfig(),
                             ignore_layers_name=["_first_", "_last_"])
    x = np.asarray(jax.random.normal(jax.random.key(3), (2, 64, 64, 3)))
    ref = Predictor(  # fresh deploy of an identical model, no quantization
        _rebuild(), batch_size=2, use_pallas=False, fuse=False,
        space_to_depth=False, dtype=None)(x)
    p = Predictor(m, batch_size=2, use_pallas=False, fuse=False,
                  space_to_depth=False, dtype=None, quantize_float_bits=8)
    out = p(x)
    rel = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert rel < 0.02  # head-only int8: error stays linear in the logits


def _rebuild():
    m = models.resnet18(num_classes=1000, rngs=nnx.Rngs(0))
    return prepare_binary_model(m, bconfig=_bconfig(),
                                ignore_layers_name=["_first_", "_last_"])


def test_quantized_model_checkpoint_roundtrip(tmp_path):
    from bnn_tpu.utils.checkpoint import (load_checkpoint, restore_into,
                                          save_checkpoint)

    lin = nn.Linear(64, 32, rngs=nnx.Rngs(0))
    q = QuantizedLinear(lin, bits=4)
    x = jax.random.normal(jax.random.key(1), (3, 64))
    want = q(x)
    save_checkpoint(str(tmp_path / "q"), q)
    lin2 = nn.Linear(64, 32, rngs=nnx.Rngs(1))  # different init
    q2 = QuantizedLinear(lin2, bits=4)
    restore_into(q2, load_checkpoint(str(tmp_path / "q")))
    np.testing.assert_array_equal(np.asarray(q2(x)), np.asarray(want))


def test_int4_odd_group_rejected():
    """Explicit odd group must fail loudly at _store, not with an opaque
    broadcast error later (ADVICE r2)."""
    import pytest
    lin = nn.Linear(32, 8, rngs=nnx.Rngs(0))
    with pytest.raises(ValueError, match="even"):
        QuantizedLinear(lin, bits=4, group=7)


def test_predictor_quantizes_single_float_layer():
    """Predictor(quantize_float_bits=) must use the RETURN VALUE of
    quantize_float_layers — a model that is itself one big float layer is
    replaced, not mutated (ADVICE r2)."""
    from bnn_tpu.inference import Predictor
    from bnn_tpu.inference.compress import _QuantizedBase

    lin = nn.Linear(256, 128, rngs=nnx.Rngs(0))
    pred = Predictor.from_model(lin, batch_size=2, use_pallas=False,
                                fuse=False, space_to_depth=False,
                                dtype=None, quantize_float_bits=8)
    served = pred.served_model()
    assert isinstance(served, _QuantizedBase), type(served)
    x = np.random.RandomState(0).randn(2, 256).astype(np.float32)
    out = pred(x)
    expected = lin(jnp.asarray(x))
    rel = float(jnp.linalg.norm(out - expected) / jnp.linalg.norm(expected))
    assert rel < 0.01


def test_predictor_state_bytes_public_api():
    from bnn_tpu.inference import Predictor

    lin = nn.Linear(64, 32, rngs=nnx.Rngs(0))
    pred = Predictor.from_model(lin, batch_size=2, use_pallas=False,
                                fuse=False, space_to_depth=False, dtype=None)
    n = pred.state_bytes()
    # fp32 kernel + bias
    assert n == (64 * 32 + 32) * 4
