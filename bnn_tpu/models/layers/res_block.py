"""Residual blocks for BNN-adapted ResNets.

Post-activation (``BasicBlock``/``Bottleneck``, torchvision-style) and
pre-activation (``PreBasicBlock``/``PreBottleneck``, XNOR-Net BN→Conv→Act
ordering) variants, mirroring reference bnn/models/layers/res_block.py.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
from flax import nnx

from ... import nn
from .common import conv1x1, conv3x3, make_activation


class BasicBlock(nnx.Module):
    expansion = 1

    def __init__(self, inplanes: int, planes: int, stride: int = 1,
                 downsample: Optional[nnx.Module] = None, groups: int = 1,
                 base_width: int = 64, dilation: int = 1,
                 norm_layer: Optional[Callable] = None, activation=nn.ReLU, *,
                 rngs: nnx.Rngs):
        if norm_layer is None:
            norm_layer = nn.BatchNorm2d
        if groups != 1 or base_width != 64:
            raise ValueError("BasicBlock only supports groups=1 and base_width=64")
        if dilation > 1:
            raise NotImplementedError("Dilation > 1 not supported in BasicBlock")
        self.conv1 = conv3x3(inplanes, planes, stride, rngs=rngs)
        self.bn1 = norm_layer(planes, rngs=rngs)
        self.conv2 = conv3x3(planes, planes, rngs=rngs)
        self.bn2 = norm_layer(planes, rngs=rngs)
        self.act1 = make_activation(activation, planes, rngs=rngs)
        self.act2 = make_activation(activation, planes, rngs=rngs)
        self.downsample = downsample
        self.stride = stride

    def __call__(self, x: jax.Array) -> jax.Array:
        identity = x
        out = self.act1(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.act2(out + identity)


class Bottleneck(nnx.Module):
    # ResNet V1.5: stride on the 3x3 conv (reference
    # bnn/models/layers/res_block.py:59-64).
    expansion = 4

    def __init__(self, inplanes: int, planes: int, stride: int = 1,
                 downsample: Optional[nnx.Module] = None, groups: int = 1,
                 base_width: int = 64, dilation: int = 1,
                 norm_layer: Optional[Callable] = None, activation=nn.ReLU, *,
                 rngs: nnx.Rngs):
        if norm_layer is None:
            norm_layer = nn.BatchNorm2d
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = conv1x1(inplanes, width, rngs=rngs)
        self.bn1 = norm_layer(width, rngs=rngs)
        self.conv2 = conv3x3(width, width, stride, groups, dilation, rngs=rngs)
        self.bn2 = norm_layer(width, rngs=rngs)
        self.conv3 = conv1x1(width, planes * self.expansion, rngs=rngs)
        self.bn3 = norm_layer(planes * self.expansion, rngs=rngs)
        self.act1 = make_activation(activation, width, rngs=rngs)
        self.act2 = make_activation(activation, width, rngs=rngs)
        self.act3 = make_activation(activation, planes * self.expansion, rngs=rngs)
        self.downsample = downsample
        self.stride = stride

    def __call__(self, x: jax.Array) -> jax.Array:
        identity = x
        out = self.act1(self.bn1(self.conv1(x)))
        out = self.act2(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.act3(out + identity)


class PreBasicBlock(nnx.Module):
    """Pre-activation basic block: BN -> Conv -> Act (reference:
    bnn/models/layers/res_block.py:121-167)."""

    expansion = 1

    def __init__(self, inplanes: int, planes: int, stride: int = 1,
                 downsample: Optional[nnx.Module] = None, groups: int = 1,
                 base_width: int = 64, dilation: int = 1,
                 norm_layer: Optional[Callable] = None, activation=nn.ReLU, *,
                 rngs: nnx.Rngs):
        if norm_layer is None:
            norm_layer = nn.BatchNorm2d
        if groups != 1 or base_width != 64:
            raise ValueError("PreBasicBlock only supports groups=1 and base_width=64")
        if dilation > 1:
            raise NotImplementedError("Dilation > 1 not supported in PreBasicBlock")
        self.conv1 = conv3x3(inplanes, planes, stride, rngs=rngs)
        self.bn1 = norm_layer(inplanes, rngs=rngs)
        self.conv2 = conv3x3(planes, planes, rngs=rngs)
        self.bn2 = norm_layer(planes, rngs=rngs)
        self.act1 = make_activation(activation, planes, rngs=rngs)
        self.act2 = make_activation(activation, planes, rngs=rngs)
        self.downsample = downsample
        self.stride = stride

    def __call__(self, x: jax.Array) -> jax.Array:
        identity = x
        out = self.act1(self.conv1(self.bn1(x)))
        out = self.act2(self.conv2(self.bn2(out)))
        if self.downsample is not None:
            identity = self.downsample(x)
        return out + identity


class PreBottleneck(nnx.Module):
    """Pre-activation bottleneck (reference:
    bnn/models/layers/res_block.py:170-229).

    Note: ``bn3`` is correctly built with ``width`` channels — in the
    pre-activation ordering it normalizes conv2's output *before* conv3
    (reference forward at res_block.py:220-222)."""

    expansion = 4

    def __init__(self, inplanes: int, planes: int, stride: int = 1,
                 downsample: Optional[nnx.Module] = None, groups: int = 1,
                 base_width: int = 64, dilation: int = 1,
                 norm_layer: Optional[Callable] = None, activation=nn.ReLU, *,
                 rngs: nnx.Rngs):
        if norm_layer is None:
            norm_layer = nn.BatchNorm2d
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = conv1x1(inplanes, width, rngs=rngs)
        self.bn1 = norm_layer(inplanes, rngs=rngs)
        self.conv2 = conv3x3(width, width, stride, groups, dilation, rngs=rngs)
        self.bn2 = norm_layer(width, rngs=rngs)
        self.conv3 = conv1x1(width, planes * self.expansion, rngs=rngs)
        self.bn3 = norm_layer(width, rngs=rngs)
        self.act1 = make_activation(activation, width, rngs=rngs)
        self.act2 = make_activation(activation, width, rngs=rngs)
        self.act3 = make_activation(activation, planes * self.expansion, rngs=rngs)
        self.downsample = downsample
        self.stride = stride

    def __call__(self, x: jax.Array) -> jax.Array:
        identity = x
        out = self.act1(self.conv1(self.bn1(x)))
        out = self.act2(self.conv2(self.bn2(out)))
        out = self.act3(self.conv3(self.bn3(out)))
        if self.downsample is not None:
            identity = self.downsample(x)
        return out + identity
