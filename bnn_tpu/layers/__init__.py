"""Binary (quantization-aware) layers.

Drop-in binary versions of :mod:`bnn_tpu.nn`'s ``Linear``/``Conv1d``/
``Conv2d``, mirroring the reference's ``bnn.layers`` (bnn/layers/linear.py,
bnn/layers/conv.py). Each holds a :class:`~bnn_tpu.bconfig.BConfig` and
instantiates its three binarizers; the forward contract is

    ``post(op(pre(x), weight_pre(W)) + bias, x)``

with the two-argument post-process receiving BOTH the layer output and the
original (pre-binarization) input (reference bnn/layers/conv.py:90-97).

``from_module`` adopts the float module's parameter objects by reference
(NOT by copy) so weights are shared across progressive recipe steps, exactly
like the reference's tensor sharing (bnn/layers/conv.py:111-112).
"""
from __future__ import annotations



import jax
from flax import nnx

from .. import functional as F
from .. import nn
from ..bconfig import BConfig
from .helpers import copy_parameters

__all__ = ["Linear", "Conv1d", "Conv2d", "BinaryLinear", "BinaryConv1d", "BinaryConv2d"]


def _attach_binarizers(layer: nnx.Module, bconfig: BConfig) -> None:
    assert bconfig is not None, "bconfig is required for a binarized module"
    layer.bconfig = bconfig
    layer.activation_pre_process = bconfig.activation_pre_process()
    layer.activation_post_process = bconfig.activation_post_process(layer)
    layer.weight_pre_process = bconfig.weight_pre_process()


class Linear(nn.Linear):
    """Binarized dense layer (reference: bnn/layers/linear.py:10-44)."""

    _FLOAT_MODULE = nn.Linear

    def __init__(self, in_features: int, out_features: int, bias: bool = True, *,
                 bconfig: BConfig = None, rngs: nnx.Rngs = None):
        super().__init__(in_features, out_features, bias,
                         rngs=rngs if rngs is not None else nnx.Rngs(0))
        _attach_binarizers(self, bconfig)

    def __call__(self, x: jax.Array) -> jax.Array:
        xq = self.activation_pre_process(x)
        w = self.weight_pre_process(self.kernel[...])
        y = F.linear(xq, w, self.bias[...] if self.bias is not None else None)
        return self.activation_post_process(y, x)

    @classmethod
    def from_module(cls, mod: nnx.Module, bconfig: BConfig = None,
                    update: bool = False) -> "Linear":
        assert type(mod) in (cls._FLOAT_MODULE, cls, nnx.Linear), (
            f"{cls.__name__}.from_module only works for "
            f"{cls._FLOAT_MODULE.__name__} / nnx.Linear / {cls.__name__}"
        )
        if bconfig is None:
            bconfig = getattr(mod, "bconfig", None)
            assert bconfig is not None, "The input module requires a predefined bconfig"
        new = cls(mod.in_features, mod.out_features,
                  bias=mod.bias is not None, bconfig=bconfig)
        new.kernel = mod.kernel  # shared Param object, not a copy
        new.bias = mod.bias
        if update:
            copy_parameters(mod, new, bconfig)
        return new


class _BinaryConvNd:
    """Mixin implementing the binary conv forward + from_module adoption."""

    def __call__(self, x: jax.Array) -> jax.Array:
        xq = self.activation_pre_process(x)
        w = self.weight_pre_process(self.kernel[...])
        y = F.conv(xq, w, self.stride, self.padding, self.dilation, self.groups)
        if self.bias is not None:
            y = y + self.bias[...]
        return self.activation_post_process(y, x)

    @classmethod
    def from_module(cls, mod: nnx.Module, bconfig: BConfig = None,
                    update: bool = False):
        if type(mod) is nnx.Conv:
            return _from_flax_conv(mod, bconfig, update=update)
        assert type(mod) in (cls._FLOAT_MODULE, cls), (
            f"{cls.__name__}.from_module only works for "
            f"{cls._FLOAT_MODULE.__name__} / nnx.Conv / {cls.__name__}"
        )
        if bconfig is None:
            bconfig = getattr(mod, "bconfig", None)
            assert bconfig is not None, "The input module requires a predefined bconfig"
        new = cls(mod.in_channels, mod.out_channels, mod.kernel_size,
                  stride=mod.stride, padding=mod.padding, dilation=mod.dilation,
                  groups=mod.groups, bias=mod.bias is not None, bconfig=bconfig)
        new.kernel = mod.kernel  # shared Param object, not a copy
        new.bias = mod.bias
        if update:
            copy_parameters(mod, new, bconfig)
        return new


class Conv1d(_BinaryConvNd, nn.Conv1d):
    """Binarized 1-D convolution (reference: bnn/layers/conv.py:10-62)."""

    _FLOAT_MODULE = nn.Conv1d

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0,
                 dilation=1, groups=1, bias=True, *, bconfig: BConfig = None,
                 rngs: nnx.Rngs = None):
        nn.Conv1d.__init__(self, in_channels, out_channels, kernel_size, stride,
                           padding, dilation, groups, bias,
                           rngs=rngs if rngs is not None else nnx.Rngs(0))
        _attach_binarizers(self, bconfig)


class Conv2d(_BinaryConvNd, nn.Conv2d):
    """Binarized 2-D convolution (reference: bnn/layers/conv.py:65-117)."""

    _FLOAT_MODULE = nn.Conv2d

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0,
                 dilation=1, groups=1, bias=True, *, bconfig: BConfig = None,
                 rngs: nnx.Rngs = None):
        nn.Conv2d.__init__(self, in_channels, out_channels, kernel_size, stride,
                           padding, dilation, groups, bias,
                           rngs=rngs if rngs is not None else nnx.Rngs(0))
        _attach_binarizers(self, bconfig)


def _from_flax_conv(mod: "nnx.Conv", bconfig: BConfig = None,
                    update: bool = False):
    """Adapt a stock ``flax.nnx.Conv`` into a binary conv (the analogue of
    the reference mapping every float conv type, bnn/binarize.py:12-18).

    flax geometry maps directly — both use channels-last activations and
    ``(*spatial, I/groups, O)`` kernels — so the kernel/bias Params are
    adopted by reference, like torch-module adoption. Rank is taken from
    ``kernel_size`` (1-D -> Conv1d, 2-D -> Conv2d).
    """
    if bconfig is None:
        bconfig = getattr(mod, "bconfig", None)
        assert bconfig is not None, "The input module requires a predefined bconfig"
    nd = len(mod.kernel_size)
    if nd not in (1, 2):
        raise NotImplementedError(
            f"binarizing a {nd}-D flax conv is not supported (1-D/2-D only)")
    if mod.input_dilation not in (1, None, (1,) * nd):
        raise NotImplementedError("flax input_dilation (transposed-style "
                                  "conv) has no binary-layer equivalent")
    if getattr(mod, "mask", None) is not None:
        raise NotImplementedError("masked flax convs are not supported")
    padding = mod.padding
    if not isinstance(padding, (str, int)):
        # flax accepts [(lo, hi), ...] pairs; symmetric pairs map to our
        # torch-style per-dim ints
        pairs = list(padding)
        if all(isinstance(p, int) for p in pairs):
            padding = tuple(pairs)
        elif all(len(p) == 2 and p[0] == p[1] for p in pairs):
            padding = tuple(p[0] for p in pairs)
        else:
            raise NotImplementedError(
                f"asymmetric flax padding {padding!r} is not supported")
    cls = Conv1d if nd == 1 else Conv2d
    new = cls(mod.in_features, mod.out_features, mod.kernel_size,
              stride=mod.strides, padding=padding,
              dilation=mod.kernel_dilation, groups=mod.feature_group_count,
              bias=mod.use_bias, bconfig=bconfig)
    new.kernel = mod.kernel  # shared Param object, not a copy
    new.bias = mod.bias if mod.use_bias else None
    if update:
        copy_parameters(mod, new, bconfig)
    return new


# Explicit aliases for readability at call sites
BinaryLinear = Linear
BinaryConv1d = Conv1d
BinaryConv2d = Conv2d
