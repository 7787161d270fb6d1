"""Hierarchical binary block (Bulat & Tzimiropoulos).

Three sequential BN -> Act -> conv3x3 stages with channel splits
``planes/2, planes/4, planes/4``, concatenated and residual-added
(reference: bnn/models/layers/hierarchical_block.py).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ... import nn
from .common import conv3x3, make_activation


class HBlock(nnx.Module):
    # the reference HBlock lacks this attribute, which crashes
    # ResNet._make_layer's ``block.expansion`` access; the block maps
    # planes -> planes so the correct value is 1
    expansion = 1

    def __init__(self, inplanes: int, planes: int, stride: int = 1,
                 downsample: Optional[nnx.Module] = None, groups: int = 1,
                 base_width: int = 64, dilation: int = 1,
                 norm_layer: Optional[Callable] = None, activation=nn.ReLU, *,
                 rngs: nnx.Rngs):
        if norm_layer is None:
            norm_layer = nn.BatchNorm2d
        if dilation > 1:
            raise NotImplementedError("Dilation > 1 not supported in HBlock")
        if stride > 1:
            raise NotImplementedError("Stride > 1 not supported in HBlock")
        self.bn1 = norm_layer(inplanes, rngs=rngs)
        self.conv1 = conv3x3(inplanes, planes // 2, groups=groups, rngs=rngs)
        self.bn2 = norm_layer(planes // 2, rngs=rngs)
        self.conv2 = conv3x3(planes // 2, planes // 4, groups=groups, rngs=rngs)
        self.bn3 = norm_layer(planes // 4, rngs=rngs)
        self.conv3 = conv3x3(planes // 4, planes // 4, groups=groups, rngs=rngs)

        self.act1 = make_activation(activation, inplanes, rngs=rngs)
        self.act2 = make_activation(activation, planes // 2, rngs=rngs)
        self.act3 = make_activation(activation, planes // 4, rngs=rngs)

        self.downsample = downsample

    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        out1 = self.conv1(self.act1(self.bn1(x)))
        out2 = self.conv2(self.act2(self.bn2(out1)))
        out3 = self.conv3(self.act3(self.bn3(out2)))
        out = jnp.concatenate([out1, out2, out3], axis=-1)
        if self.downsample is not None:
            residual = self.downsample(residual)
        return out + residual
