"""Candidate operations for BATS binary architecture search (ECCV'20).

Channels-last re-implementation of reference bnn/models/layers/bats_ops.py.
All conv ops follow the binary-friendly BN -> Conv -> PReLU ordering with an
optional residual skip and a 4-group channel shuffle.

Reference quirks fixed (SURVEY.md §7.5):
- ``drop_path`` builds a proper ``[N,1,1,1]`` Bernoulli mask (the reference's
  ``torch.tensor(x.size(0),1,1,1)`` constructs a scalar, bats_ops.py:36);
- ``self.skip = skip or True`` (always True, bats_ops.py:58) is implemented
  as the intended ``self.skip = skip`` — callers in ``OPS`` pass
  ``skip=True`` so behavior is unchanged.
"""
from __future__ import annotations

from collections import namedtuple
from typing import Callable, Dict

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


def channel_shuffle(x: jax.Array, groups: int) -> jax.Array:
    """Interleave channel groups (channels-last)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(n, h, w, c)


def drop_path(x: jax.Array, drop_prob: float, key: jax.Array) -> jax.Array:
    """Stochastic depth: zero the whole residual branch per-sample."""
    if drop_prob <= 0.0:
        return x
    keep_prob = 1.0 - drop_prob
    mask = jax.random.bernoulli(key, keep_prob, (x.shape[0], 1, 1, 1))
    return x / keep_prob * mask.astype(x.dtype)


class FactorizedConv(nnx.Module):
    """1xk then kx1 factorized conv (reference: bats_ops.py:55-75)."""

    def __init__(self, C: int, kernel_size: int, stride: int, affine: bool = True,
                 skip: bool = False, *, rngs: nnx.Rngs):
        self.skip = skip
        self.stride = stride
        self.op = nn.Sequential(
            nn.BatchNorm2d(C, affine=affine, rngs=rngs),
            nn.Conv2d(C, C, (1, kernel_size), stride=(1, stride),
                      padding=(0, kernel_size // 2), bias=False, rngs=rngs),
            nn.PReLU(num_parameters=C, rngs=rngs),
            nn.BatchNorm2d(C, affine=affine, rngs=rngs),
            nn.Conv2d(C, C, (kernel_size, 1), stride=(stride, 1),
                      padding=(kernel_size // 2, 0), bias=False, rngs=rngs),
            nn.PReLU(num_parameters=C, rngs=rngs),
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        out = channel_shuffle(self.op(x), 4)
        if self.skip and self.stride == 1:
            return x + out
        return out


class ReLUConvBN(nnx.Module):
    """BN -> Conv -> PReLU preprocessing op (reference: bats_ops.py:78-105;
    the name is historical — the actual order is the binary-friendly one)."""

    def __init__(self, C_in: int, C_out: int, kernel_size: int, stride: int,
                 padding: int, affine: bool = True, skip: bool = False, *,
                 rngs: nnx.Rngs):
        self.skip = skip
        self.stride = stride
        self.C_in = C_in
        self.C_out = C_out
        self.op = nn.Sequential(
            nn.BatchNorm2d(C_in, affine=affine, rngs=rngs),
            nn.Conv2d(C_in, C_out, kernel_size, stride=stride, padding=padding,
                      bias=False, rngs=rngs),
            nn.PReLU(num_parameters=C_out, rngs=rngs),
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.skip and self.stride == 1 and self.C_in == self.C_out:
            return x + self.op(x)
        return self.op(x)


class DilConv(nnx.Module):
    """Grouped dilated conv op (reference: bats_ops.py:108-145)."""

    def __init__(self, C_in: int, C_out: int, kernel_size: int, stride: int,
                 padding: int, dilation: int, affine: bool = True,
                 skip: bool = False, groups: int = 12, *, rngs: nnx.Rngs):
        self.skip = skip
        self.stride = stride
        self.op = nn.Sequential(
            nn.BatchNorm2d(C_in, affine=affine, rngs=rngs),
            nn.Conv2d(C_in, C_in, kernel_size=kernel_size, stride=stride,
                      padding=padding, dilation=dilation, groups=groups,
                      bias=False, rngs=rngs),
            nn.PReLU(num_parameters=C_in, rngs=rngs),
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        out = channel_shuffle(self.op(x), 4)
        if self.skip and self.stride == 1:
            return x + out
        return out


class SepConv(nnx.Module):
    """Grouped separable conv op (reference: bats_ops.py:148-173)."""

    def __init__(self, C_in: int, C_out: int, kernel_size: int, stride: int,
                 padding: int, affine: bool = True, skip: bool = False,
                 groups: int = 12, *, rngs: nnx.Rngs):
        self.skip = skip
        self.stride = stride
        self.op = nn.Sequential(
            nn.BatchNorm2d(C_in, affine=affine, rngs=rngs),
            nn.Conv2d(C_in, C_in, kernel_size=kernel_size, stride=stride,
                      padding=padding, groups=groups, bias=False, rngs=rngs),
            nn.PReLU(num_parameters=C_in, rngs=rngs),
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        out = channel_shuffle(self.op(x), 4)
        if self.skip and self.stride == 1:
            return x + out
        return out


class Zero(nnx.Module):
    """The 'none' op: zeros, spatially strided (reference: bats_ops.py:176-187)."""

    def __init__(self, stride: int):
        self.stride = stride

    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        return jnp.zeros((n, h // self.stride, w // self.stride, c), dtype=x.dtype)


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
        out = jnp.concatenate(
            [self.conv_1(x), self.conv_2(x[:, 1:, 1:, :])], axis=-1
        )
        return self.activation(out)


OPS: Dict[str, Callable] = {
    "none": lambda C, stride, affine, skip, groups, rngs: Zero(stride),
    "avg_pool_3x3": lambda C, stride, affine, skip, groups, rngs: nn.AvgPool2d(
        3, stride=stride, padding=1, count_include_pad=False),
    "max_pool_3x3": lambda C, stride, affine, skip, groups, rngs: nn.MaxPool2d(
        3, stride=stride, padding=1),
    "skip_connect": lambda C, stride, affine, skip, groups, rngs: (
        nn.Identity() if stride == 1 else FactorizedReduce(C, C, affine=affine, rngs=rngs)),
    "sep_conv_3x3": lambda C, stride, affine, skip, groups, rngs: SepConv(
        C, C, 3, stride, 1, affine=affine, skip=skip, groups=groups, rngs=rngs),
    "sep_conv_5x5": lambda C, stride, affine, skip, groups, rngs: SepConv(
        C, C, 5, stride, 2, affine=affine, skip=skip, groups=groups, rngs=rngs),
    "sep_conv_7x7": lambda C, stride, affine, skip, groups, rngs: SepConv(
        C, C, 7, stride, 3, affine=affine, skip=skip, groups=groups, rngs=rngs),
    "dil_conv_3x3": lambda C, stride, affine, skip, groups, rngs: DilConv(
        C, C, 3, stride, 2, 2, affine=affine, skip=skip, groups=groups, rngs=rngs),
    "dil_conv_5x5": lambda C, stride, affine, skip, groups, rngs: DilConv(
        C, C, 5, stride, 4, 2, affine=affine, skip=skip, groups=groups, rngs=rngs),
    "conv_7x1_1x7": lambda C, stride, affine, skip, groups, rngs: FactorizedConv(
        C, 7, stride, affine=affine, skip=skip, rngs=rngs),
}
