"""Candidate operations for BATS binary architecture search (ECCV'20).

Channels-last implementation of the capability of reference
bnn/models/layers/bats_ops.py. Every conv candidate is an instance of one
parameterized module (`_BinConvOp`): a chain of BN -> Conv -> PReLU stages
(the binary-friendly ordering) followed by an optional 4-group channel
shuffle and an optional residual skip. The public classes only declare
their stage geometry.

Reference quirks fixed (SURVEY.md §7.5):
- ``drop_path`` builds a proper ``[N,1,1,1]`` Bernoulli mask (the reference's
  ``torch.tensor(x.size(0),1,1,1)`` constructs a scalar, bats_ops.py:36);
- ``self.skip = skip or True`` (always True, bats_ops.py:58) is implemented
  as the intended ``self.skip = skip`` — callers in ``OPS`` pass
  ``skip=True`` so behavior is unchanged.
"""
from __future__ import annotations

from collections import namedtuple
from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from ... import nn

Genotype = namedtuple("Genotype", "normal normal_concat reduce reduce_concat")

PRIMITIVES = [
    "none",
    "max_pool_3x3",
    "avg_pool_3x3",
    "skip_connect",
    "sep_conv_3x3",
    "sep_conv_5x5",
    "dil_conv_3x3",
    "dil_conv_5x5",
]

_SHUFFLE_GROUPS = 4


def channel_shuffle(x: jax.Array, groups: int) -> jax.Array:
    """Interleave channel groups (channels-last)."""
    n, h, w, c = x.shape
    grouped = x.reshape(n, h, w, groups, c // groups)
    return jnp.swapaxes(grouped, -1, -2).reshape(n, h, w, c)


def drop_path(x: jax.Array, drop_prob: float, key: jax.Array) -> jax.Array:
    """Stochastic depth: zero the whole residual branch per-sample."""
    if drop_prob <= 0.0:
        return x
    keep = 1.0 - drop_prob
    gate = jax.random.bernoulli(key, keep, (x.shape[0], 1, 1, 1))
    return x * gate.astype(x.dtype) / keep


# one conv stage: (cin, cout, ksize, stride, padding, dilation, groups) where
# ksize/stride/padding may be int or (h, w) tuples
Stage = Tuple


class _BinConvOp(nnx.Module):
    """BN -> Conv -> PReLU stage chain with optional shuffle + residual."""

    def __init__(self, stages: Sequence[Stage], affine: bool, skip: bool,
                 stride: int, shuffle: bool, *, rngs: nnx.Rngs):
        chain = []
        for cin, cout, k, s, p, d, g in stages:
            chain += [
                nn.BatchNorm2d(cin, affine=affine, rngs=rngs),
                nn.Conv2d(cin, cout, k, stride=s, padding=p, dilation=d,
                          groups=g, bias=False, rngs=rngs),
                nn.PReLU(num_parameters=cout, rngs=rngs),
            ]
        self.op = nn.Sequential(*chain)
        self._shuffle = shuffle
        # residual only when shapes are preserved end to end
        self._residual = (skip and stride == 1
                          and stages[0][0] == stages[-1][1])
        # kept for introspection parity with the reference
        self.skip = skip
        self.stride = stride

    def __call__(self, x: jax.Array) -> jax.Array:
        h = self.op(x)
        if self._shuffle:
            h = channel_shuffle(h, _SHUFFLE_GROUPS)
        return x + h if self._residual else h


class FactorizedConv(_BinConvOp):
    """1xk then kx1 factorized conv (reference: bats_ops.py:55-75)."""

    def __init__(self, C: int, kernel_size: int, stride: int,
                 affine: bool = True, skip: bool = False, *, rngs: nnx.Rngs):
        half = kernel_size // 2
        super().__init__(
            [(C, C, (1, kernel_size), (1, stride), (0, half), 1, 1),
             (C, C, (kernel_size, 1), (stride, 1), (half, 0), 1, 1)],
            affine, skip, stride, shuffle=True, rngs=rngs)


class ReLUConvBN(_BinConvOp):
    """BN -> Conv -> PReLU preprocessing op (reference: bats_ops.py:78-105;
    the name is historical — the actual order is the binary-friendly one)."""

    def __init__(self, C_in: int, C_out: int, kernel_size: int, stride: int,
                 padding: int, affine: bool = True, skip: bool = False, *,
                 rngs: nnx.Rngs):
        super().__init__(
            [(C_in, C_out, kernel_size, stride, padding, 1, 1)],
            affine, skip, stride, shuffle=False, rngs=rngs)
        self.C_in = C_in
        self.C_out = C_out


class DilConv(_BinConvOp):
    """Grouped dilated conv op (reference: bats_ops.py:108-145)."""

    def __init__(self, C_in: int, C_out: int, kernel_size: int, stride: int,
                 padding: int, dilation: int, affine: bool = True,
                 skip: bool = False, groups: int = 12, *, rngs: nnx.Rngs):
        super().__init__(
            [(C_in, C_in, kernel_size, stride, padding, dilation, groups)],
            affine, skip, stride, shuffle=True, rngs=rngs)


class SepConv(_BinConvOp):
    """Grouped separable conv op (reference: bats_ops.py:148-173)."""

    def __init__(self, C_in: int, C_out: int, kernel_size: int, stride: int,
                 padding: int, affine: bool = True, skip: bool = False,
                 groups: int = 12, *, rngs: nnx.Rngs):
        super().__init__(
            [(C_in, C_in, kernel_size, stride, padding, 1, groups)],
            affine, skip, stride, shuffle=True, rngs=rngs)


class Zero(nnx.Module):
    """The 'none' op: zeros, spatially strided (reference: bats_ops.py:176-187)."""

    def __init__(self, stride: int):
        self.stride = stride

    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        s = self.stride
        # ceil semantics like the reference's x[:, :, ::s, ::s] — floor
        # would mismatch the other strided ops' shapes on odd maps and
        # crash the cell-edge sum
        return jnp.zeros((n, -(-h // s), -(-w // s), c), dtype=x.dtype)


class FactorizedReduce(nnx.Module):
    """Stride-2 reduction via two offset 1x1 convs (reference:
    bats_ops.py:190-209)."""

    def __init__(self, C_in: int, C_out: int, affine: bool = True, *,
                 rngs: nnx.Rngs):
        assert C_out % 2 == 0
        self.activation = nn.PReLU(num_parameters=C_out, rngs=rngs)
        self.conv_1 = nn.Conv2d(C_in, C_out // 2, 1, stride=2, padding=0,
                                bias=False, rngs=rngs)
        self.conv_2 = nn.Conv2d(C_in, C_out // 2, 1, stride=2, padding=0,
                                bias=False, rngs=rngs)
        self.bn = nn.BatchNorm2d(C_in, affine=affine, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.bn(x)
        even, odd = self.conv_1(x), self.conv_2(x[:, 1:, 1:, :])
        return self.activation(jnp.concatenate([even, odd], axis=-1))


def _pool(cls, **fixed):
    def build(C, stride, affine, skip, groups, rngs):
        return cls(3, stride=stride, padding=1, **fixed)
    return build


def _identity_or_reduce(C, stride, affine, skip, groups, rngs):
    if stride == 1:
        return nn.Identity()
    return FactorizedReduce(C, C, affine=affine, rngs=rngs)


def _sep(k):
    def build(C, stride, affine, skip, groups, rngs):
        return SepConv(C, C, k, stride, k // 2, affine=affine, skip=skip,
                       groups=groups, rngs=rngs)
    return build


def _dil(k):
    def build(C, stride, affine, skip, groups, rngs):
        return DilConv(C, C, k, stride, k - 1, 2, affine=affine, skip=skip,
                       groups=groups, rngs=rngs)
    return build


OPS: Dict[str, Callable] = {
    "none": lambda C, stride, affine, skip, groups, rngs: Zero(stride),
    "avg_pool_3x3": _pool(nn.AvgPool2d, count_include_pad=False),
    "max_pool_3x3": _pool(nn.MaxPool2d),
    "skip_connect": _identity_or_reduce,
    "sep_conv_3x3": _sep(3),
    "sep_conv_5x5": _sep(5),
    "sep_conv_7x7": _sep(7),
    "dil_conv_3x3": _dil(3),
    "dil_conv_5x5": _dil(5),
    "conv_7x1_1x7": lambda C, stride, affine, skip, groups, rngs:
        FactorizedConv(C, 7, stride, affine=affine, skip=skip, rngs=rngs),
}
