"""Serving-format compression for the float remainder of a deployed model.

The deployment pass (``inference.deploy``) bitpacks every *binary* layer to
1 bit/weight (32x). What keeps a whole deployed model from the 30x+ regime
is the float remainder the reference's convention leaves in fp32: the first
conv and the classifier head (reference examples/cifar10.py:63-71 keeps
``conv1``/``fc`` full-precision; examples/recepies/imagenet-baseline.yaml
ignores ``_first_``/``_last_``). On a packed binary ResNet-18 the fp32 fc
alone is ~2.05 MB of a ~3.5 MB model.

This module stores those float layers in weight-only int8 (or packed int4)
with per-out-channel symmetric scales, dequantizing to the compute dtype in
graph — the dequant is a few VPU ops on tensors that are tiny next to the
activations, so serving speed is unchanged while checkpoint/HBM weight bytes
drop 4-8x on the float remainder.

Numerics: per-channel int8 weight quantization of a conv/linear is
well-understood to be accuracy-neutral for CNN classifiers (max per-weight
error = 0.5 * max|w_ch| / 127); int4 uses group-wise scales (default group
64) to bound the error and is opt-in.

The reference framework has no serving/compression machinery at all
(reference README.md:22); these formats are part of the execution layer it
lacks.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from .. import functional as F
from .. import nn
from ..binarize import named_modules, set_module_by_name

__all__ = [
    "QuantizedConv",
    "QuantizedLinear",
    "quantize_float_layers",
    "state_bytes",
]


def _quantize(w: jax.Array, bits: int, group: Optional[int]):
    """Symmetric weight-only quantization along all-but-last axes.

    Returns ``(q, scale)`` with ``q`` int8 in ``[-qmax, qmax]`` and
    ``w ~= q * scale``. ``scale`` is per-out-channel ``(O,)`` or per
    ``(group, O)`` block ``(K/group, O)`` when ``group`` is set.
    """
    qmax = float(2 ** (bits - 1) - 1)
    out_ch = w.shape[-1]
    w2d = w.reshape(-1, out_ch)
    if group is None:
        amax = jnp.max(jnp.abs(w2d), axis=0)  # (O,)
        scale = jnp.maximum(amax / qmax, 1e-12)
        q = jnp.clip(jnp.round(w2d / scale), -qmax, qmax).astype(jnp.int8)
        return q.reshape(w.shape), scale.astype(jnp.float32)
    k = w2d.shape[0]
    pad = (-k) % group
    wp = jnp.pad(w2d, ((0, pad), (0, 0)))
    wg = wp.reshape(-1, group, out_ch)
    amax = jnp.max(jnp.abs(wg), axis=1)  # (K/g, O)
    scale = jnp.maximum(amax / qmax, 1e-12)
    q = jnp.clip(jnp.round(wg / scale[:, None, :]), -qmax, qmax)
    return q.astype(jnp.int8), scale.astype(jnp.float32)


def _pack_int4(q: jax.Array) -> jax.Array:
    """Pack int4 values (int8 storage, range [-7, 7]) 2-per-byte along the
    second-to-last axis (which must be even)."""
    lo = q[..., 0::2, :] & 0xF
    hi = q[..., 1::2, :] & 0xF
    return (lo | (hi << 4)).astype(jnp.int8)


def _unpack_int4(p: jax.Array) -> jax.Array:
    """Inverse of :func:`_pack_int4` (sign-extends each nibble)."""
    lo = ((p & 0xF) ^ 0x8) - 0x8  # sign-extend low nibble
    hi = (((p >> 4) & 0xF) ^ 0x8) - 0x8
    out = jnp.stack([lo, hi], axis=-2)  # (..., G/2, 2, O)
    return out.reshape(p.shape[:-2] + (2 * p.shape[-2],) + p.shape[-1:])


class _QuantizedBase(nnx.Module):
    """Shared int8/int4 weight storage + in-graph dequantization."""

    def _store(self, w: jax.Array, bits: int, group: Optional[int]):
        assert bits in (8, 4), bits
        if bits == 4 and group is None:
            group = 64
        if bits == 4 and group % 2:
            raise ValueError(
                f"int4 packing pairs values along the in-group axis; "
                f"group must be even, got {group}")
        self.bits = bits
        self.group = group
        self.k_shape = tuple(w.shape)
        q, scale = _quantize(w, bits, group)
        if bits == 4:
            # q is (K/g, g, O); pack nibbles along the in-group axis
            q = _pack_int4(q)
        self.w_q = nnx.Variable(q)
        self.w_scale = nnx.Variable(scale)

    def _dequant(self, dtype) -> jax.Array:
        q = self.w_q[...]
        scale = self.w_scale[...]
        if self.bits == 4:
            q = _unpack_int4(q)
        if self.group is not None:
            w = q.astype(dtype) * scale[:, None, :].astype(dtype)
            w = w.reshape(-1, self.k_shape[-1])
            k = 1
            for d in self.k_shape[:-1]:
                k *= d
            w = w[:k]  # drop group padding rows
        else:
            w = q.astype(dtype) * scale.astype(dtype)
        return w.reshape(self.k_shape)


class QuantizedLinear(_QuantizedBase):
    """Weight-only int8/int4 dense layer (drop-in for :class:`bnn_tpu.nn.Linear`)."""

    def __init__(self, layer: nn.Linear, *, bits: int = 8,
                 group: Optional[int] = None):
        self.in_features = layer.in_features
        self.out_features = layer.out_features
        self._store(layer.kernel[...], bits, group)
        self.bias = (nnx.Variable(layer.bias[...])
                     if layer.bias is not None else None)

    def __call__(self, x: jax.Array) -> jax.Array:
        w = self._dequant(x.dtype)
        b = self.bias[...].astype(x.dtype) if self.bias is not None else None
        return F.linear(x, w, b)


class QuantizedConv(_QuantizedBase):
    """Weight-only int8/int4 convolution (drop-in for ``nn.Conv1d/Conv2d``)."""

    def __init__(self, layer: nn._ConvNd, *, bits: int = 8,
                 group: Optional[int] = None):
        self.in_channels = layer.in_channels
        self.out_channels = layer.out_channels
        self.kernel_size = layer.kernel_size
        self.stride = layer.stride
        self.padding = layer.padding
        self.dilation = layer.dilation
        self.groups = layer.groups
        self._store(layer.kernel[...], bits, group)
        self.bias = (nnx.Variable(layer.bias[...])
                     if layer.bias is not None else None)

    def __call__(self, x: jax.Array) -> jax.Array:
        w = self._dequant(x.dtype)
        y = F.conv(x, w, self.stride, self.padding, self.dilation, self.groups)
        if self.bias is not None:
            y = y + self.bias[...].astype(y.dtype)
        return y


def quantize_float_layers(model: nnx.Module, *, bits: int = 8,
                          group: Optional[int] = None,
                          min_params: int = 2 ** 14,
                          skip: tuple = ()) -> nnx.Module:
    """Replace plain float ``nn.Conv1d/Conv2d/Linear`` layers with weight-only
    quantized equivalents, in place.

    Binary/deployed layers are untouched (they are already 1-bit). Layers
    with fewer than ``min_params`` kernel entries are skipped — deliberately
    a generous default: small float layers (a ResNet stem is 9.4k params,
    ~19 KB in bf16) save nothing worth compressing, AND a stem's output feeds
    ``sign()`` activations, where even per-channel int8 error flips bits and
    perturbs the binary network discretely. The layers worth quantizing are
    the big heads (a ResNet-18 fc is 512k params), whose error stays linear
    in the logits. ``skip`` excludes further layers by exact name. Returns
    the model (or the replacement when the model itself is a single float
    layer).
    """
    replacements = {}
    for name, m in named_modules(model):
        if name in skip:
            continue
        if type(m) is nn.Linear:
            if m.kernel[...].size >= min_params:
                replacements[name] = QuantizedLinear(m, bits=bits, group=group)
        elif type(m) in (nn.Conv1d, nn.Conv2d):
            if m.kernel[...].size >= min_params:
                replacements[name] = QuantizedConv(m, bits=bits, group=group)
    if "" in replacements:
        return replacements[""]
    for name, new in replacements.items():
        set_module_by_name(model, name, new)
    return model


def state_bytes(model: nnx.Module) -> int:
    """Total bytes of every array in the model's state — weights, biases,
    scales, norm statistics. The honest whole-model number for compression
    reporting (unlike kernel-only counts)."""
    total = 0
    for leaf in jax.tree.leaves(nnx.state(model)):
        if hasattr(leaf, "dtype") and hasattr(leaf, "size"):
            total += leaf.size * leaf.dtype.itemsize
    return total
