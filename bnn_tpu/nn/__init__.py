"""Float NN module library (the framework's ``torch.nn`` equivalent).

The reference model zoo builds fp32 models from ``torch.nn`` primitives and
then hands them to the transformation pass (SURVEY L1/L3). Here the same role
is played by these NNX modules: torch-like constructor geometry, channels-last
compute, all forward math delegated to :mod:`bnn_tpu.functional` so each layer
lowers to fusable XLA ops.

``Sequential`` names its children ``"0", "1", ...`` so module paths are
identical to torch's (``layer2.0.downsample.1``) and the reference's YAML
recipes work verbatim (examples/recepies/imagenet-baseline.yaml:13-15).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import nnx

from .. import functional as F

Size = Union[int, Sequence[int]]


def _kaiming_uniform(key, shape, fan_in, a=math.sqrt(5.0)):
    # torch's default Conv/Linear init: kaiming_uniform(a=sqrt(5)) over fan_in
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


class Identity(nnx.Module):
    def __call__(self, x, *unused):
        return x


class Linear(nnx.Module):
    """Dense layer, kernel shape ``(in, out)``."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True, *,
                 rngs: nnx.Rngs):
        self.in_features = in_features
        self.out_features = out_features
        self.kernel = nnx.Param(
            _kaiming_uniform(rngs.params(), (in_features, out_features), in_features)
        )
        if bias:
            bound = 1.0 / math.sqrt(in_features)
            self.bias = nnx.Param(
                jax.random.uniform(rngs.params(), (out_features,), jnp.float32, -bound, bound)
            )
        else:
            self.bias = None

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.linear(x, self.kernel[...],
                        self.bias[...] if self.bias is not None else None)


class _ConvNd(nnx.Module):
    _ND = 2

    def __init__(self, in_channels: int, out_channels: int, kernel_size: Size,
                 stride: Size = 1, padding: Union[str, Size] = 0, dilation: Size = 1,
                 groups: int = 1, bias: bool = True, *, rngs: nnx.Rngs):
        nd = self._ND
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = F._ntuple(kernel_size, nd)
        self.stride = F._ntuple(stride, nd)
        self.padding = padding if isinstance(padding, str) else F._ntuple(padding, nd)
        self.dilation = F._ntuple(dilation, nd)
        self.groups = groups
        kshape = self.kernel_size + (in_channels // groups, out_channels)
        fan_in = (in_channels // groups) * math.prod(self.kernel_size)
        self.kernel = nnx.Param(_kaiming_uniform(rngs.params(), kshape, fan_in))
        if bias:
            bound = 1.0 / math.sqrt(fan_in)
            self.bias = nnx.Param(
                jax.random.uniform(rngs.params(), (out_channels,), jnp.float32, -bound, bound)
            )
        else:
            self.bias = None

    def __call__(self, x: jax.Array) -> jax.Array:
        y = F.conv(x, self.kernel[...], self.stride, self.padding, self.dilation,
                   self.groups)
        if self.bias is not None:
            y = y + self.bias[...]
        return y


class Conv1d(_ConvNd):
    """1-D convolution over ``(N, L, C)`` input, kernel ``(W, I, O)``."""
    _ND = 1


class Conv2d(_ConvNd):
    """2-D convolution over ``(N, H, W, C)`` input, kernel ``(H, W, I, O)``."""
    _ND = 2


class BatchNorm2d(nnx.BatchNorm):
    """Channels-last batch norm with torch hyperparameters (momentum 0.1,
    eps 1e-5). Works for any rank with channels last, so it also covers the
    1-D case.

    ``use_fast_variance=False`` (unlike the flax default): the one-pass
    E[x^2]-E[x]^2 form loses ~1e-4 relative accuracy in fp32 to
    cancellation, which the sign() binarizers downstream amplify into
    activation-bit flips — the two-pass form keeps train-mode forwards
    aligned with the torch reference (measured in
    tests/test_reference_parity.py)."""

    def __init__(self, num_features: int, eps: float = 1e-5, momentum: float = 0.1,
                 affine: bool = True, use_fast_variance: bool = False,
                 *, rngs: nnx.Rngs):
        super().__init__(
            num_features,
            epsilon=eps,
            momentum=1.0 - momentum,
            use_bias=affine,
            use_scale=affine,
            use_fast_variance=use_fast_variance,
            rngs=rngs,
        )


BatchNorm1d = BatchNorm2d


class ReLU(nnx.Module):
    def __init__(self, inplace: bool = False):
        pass

    def __call__(self, x: jax.Array) -> jax.Array:
        return jax.nn.relu(x)


class PReLU(nnx.Module):
    """PReLU with ``num_parameters`` per-channel slopes (channels-last).

    The branch condition is ``x > 0`` (torch parity), NOT ``x >= 0``: the
    value at 0 is 0 either way, but the subgradient differs (slope vs 1) —
    and binary conv outputs contain EXACT zeros systematically (alpha x
    integer dot products), so the choice measurably changes training
    gradients (found by tests/test_reference_parity.py)."""

    def __init__(self, num_parameters: int = 1, init: float = 0.25, *,
                 rngs: Optional[nnx.Rngs] = None):
        self.weight = nnx.Param(jnp.full((num_parameters,), init, dtype=jnp.float32))

    def __call__(self, x: jax.Array) -> jax.Array:
        return jnp.where(x > 0, x, x * self.weight[...])


class Tanh(nnx.Module):
    def __call__(self, x: jax.Array) -> jax.Array:
        return jnp.tanh(x)


class Hardtanh(nnx.Module):
    def __init__(self, min_val: float = -1.0, max_val: float = 1.0, inplace: bool = False):
        self.min_val = min_val
        self.max_val = max_val

    def __call__(self, x: jax.Array) -> jax.Array:
        return jnp.clip(x, self.min_val, self.max_val)


class MaxPool2d(nnx.Module):
    def __init__(self, kernel_size: Size, stride: Size = None, padding: Size = 0,
                 ceil_mode: bool = False):
        self.kernel_size, self.stride = kernel_size, stride
        self.padding, self.ceil_mode = padding, ceil_mode

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.max_pool(x, self.kernel_size, self.stride, self.padding, self.ceil_mode)


MaxPool1d = MaxPool2d


class AvgPool2d(nnx.Module):
    def __init__(self, kernel_size: Size, stride: Size = None, padding: Size = 0,
                 ceil_mode: bool = False, count_include_pad: bool = True):
        self.kernel_size, self.stride = kernel_size, stride
        self.padding, self.ceil_mode = padding, ceil_mode
        self.count_include_pad = count_include_pad

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.avg_pool(x, self.kernel_size, self.stride, self.padding,
                          self.ceil_mode, self.count_include_pad)


class AdaptiveAvgPool2d(nnx.Module):
    def __init__(self, output_size: Size = 1):
        self.output_size = output_size

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.adaptive_avg_pool(x, self.output_size)


class Flatten(nnx.Module):
    def __init__(self, start_axis: int = 1):
        self.start_axis = start_axis

    def __call__(self, x: jax.Array) -> jax.Array:
        return F.flatten(x, self.start_axis)


class Sequential(nnx.Module):
    """Container whose children are named ``"0", "1", ...`` (torch-style
    paths)."""

    def __init__(self, *modules: nnx.Module):
        self._num_layers = len(modules)
        for i, m in enumerate(modules):
            setattr(self, str(i), m)

    def __call__(self, x):
        for i in range(self._num_layers):
            x = getattr(self, str(i))(x)
        return x

    def __len__(self) -> int:
        return self._num_layers

    def __getitem__(self, idx: int):
        if idx < 0:
            idx += self._num_layers
        return getattr(self, str(idx))

    def __setitem__(self, idx: int, module: nnx.Module):
        if idx < 0:
            idx += self._num_layers
        if not 0 <= idx < self._num_layers:
            # torch parity: assignment cannot extend the container — an
            # out-of-range setattr would create an orphan attribute that
            # the forward never executes (but binarize/checkpoint walk)
            raise IndexError(
                f"index {idx} out of range for {self._num_layers} layers")
        setattr(self, str(idx), module)

    def __iter__(self):
        return (getattr(self, str(i)) for i in range(self._num_layers))


class ModuleList(nnx.Module):
    """List container with torch-style digit child names."""

    def __init__(self, modules: Sequence[nnx.Module] = ()):
        self._num_layers = 0
        for m in modules:
            self.append(m)

    def append(self, module: nnx.Module):
        setattr(self, str(self._num_layers), module)
        self._num_layers += 1
        return self

    def __iadd__(self, modules: Sequence[nnx.Module]):
        for m in modules:
            self.append(m)
        return self

    def __len__(self) -> int:
        return self._num_layers

    def __getitem__(self, idx: int):
        if idx < 0:
            idx += self._num_layers
        return getattr(self, str(idx))

    def __setitem__(self, idx: int, module: nnx.Module):
        if idx < 0:
            idx += self._num_layers
        if not 0 <= idx < self._num_layers:
            # torch parity: assignment cannot extend the container — an
            # out-of-range setattr would create an orphan attribute that
            # the forward never executes (but binarize/checkpoint walk)
            raise IndexError(
                f"index {idx} out of range for {self._num_layers} layers")
        setattr(self, str(idx), module)

    def __iter__(self):
        return (getattr(self, str(i)) for i in range(self._num_layers))


class MultiheadAttention(nnx.Module):
    """Multi-head self/cross attention built from :class:`Linear` projections.

    Exists to demonstrate (and test) that the binarization machinery is
    architecture-agnostic: ``prepare_binary_model`` swaps the four
    projections like any other ``Linear``, so attention models binarize with
    the same BConfigs/recipes as CNNs (the reference is conv-only;
    SURVEY.md §5.7 requires the abstraction not to preclude attention).

    Input: channels-last ``(N, L, E)``; optional additive mask broadcastable
    to ``(N, H, L, S)``.
    """

    def __init__(self, embed_dim: int, num_heads: int, bias: bool = True, *,
                 rngs: nnx.Rngs):
        assert embed_dim % num_heads == 0
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.q_proj = Linear(embed_dim, embed_dim, bias=bias, rngs=rngs)
        self.k_proj = Linear(embed_dim, embed_dim, bias=bias, rngs=rngs)
        self.v_proj = Linear(embed_dim, embed_dim, bias=bias, rngs=rngs)
        self.out_proj = Linear(embed_dim, embed_dim, bias=bias, rngs=rngs)

    def __call__(self, query: jax.Array, key: jax.Array = None,
                 value: jax.Array = None, mask: jax.Array = None) -> jax.Array:
        key = query if key is None else key
        value = key if value is None else value
        n, l, _ = query.shape
        s = key.shape[1]
        h, d = self.num_heads, self.head_dim

        q = self.q_proj(query).reshape(n, l, h, d).transpose(0, 2, 1, 3)
        k = self.k_proj(key).reshape(n, s, h, d).transpose(0, 2, 1, 3)
        v = self.v_proj(value).reshape(n, s, h, d).transpose(0, 2, 1, 3)

        logits = jnp.einsum("nhld,nhsd->nhls", q, k) / math.sqrt(d)
        if mask is not None:
            logits = logits + mask
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("nhls,nhsd->nhld", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(n, l, self.embed_dim)
        return self.out_proj(out)


class LayerNorm(nnx.LayerNorm):
    """Channels-last layer norm with torch-style constructor."""

    def __init__(self, normalized_shape: int, eps: float = 1e-5,
                 elementwise_affine: bool = True, *, rngs: nnx.Rngs):
        super().__init__(normalized_shape, epsilon=eps,
                         use_bias=elementwise_affine,
                         use_scale=elementwise_affine, rngs=rngs)
