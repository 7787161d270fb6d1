"""BNN-adapted ResNet family (reference: bnn/models/resnet.py).

BNN-specific deltas vs a vanilla ResNet, preserved from the reference:

- pluggable ``block_type`` (post-/pre-activation basic & bottleneck, HBlock)
  and ``activation`` class (PReLU supported with per-channel slopes);
- ``stem_type='basic' | 'dabnn'`` (DaBNN efficient stem, reference
  bnn/models/resnet.py:10-47);
- the downsample path is AvgPool -> 1x1 conv -> BN instead of a strided conv
  (reference bnn/models/resnet.py:128-133) — the standard BNN trick that
  keeps the shortcut information-preserving.

Attribute names (``conv1``, ``layer1..4``, ``downsample.1`` ...) match the
reference exactly so YAML recipes addressing layers by path work verbatim.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Type

import jax
import jax.numpy as jnp
from flax import nnx

from .. import nn
from .layers import BasicBlock, Bottleneck
from .layers import conv1x1


class DaBNNStem(nnx.Module):
    """DaBNN efficient stem (reference: bnn/models/resnet.py:10-47)."""

    def __init__(self, planes: int, norm_layer: Optional[Callable] = None,
                 activation=nn.ReLU, *, rngs: nnx.Rngs):
        self.conv1 = nn.Sequential(
            nn.Conv2d(3, planes // 2, kernel_size=3, stride=2, padding=1,
                      bias=False, rngs=rngs),
            norm_layer(planes // 2, rngs=rngs),
            activation() if activation is nn.ReLU else activation(
                num_parameters=planes // 2, rngs=rngs),
        )
        self.conv2_1 = nn.Sequential(
            nn.Conv2d(planes // 2, planes // 4, 1, 1, bias=False, rngs=rngs),
            norm_layer(planes // 4, rngs=rngs),
            activation() if activation is nn.ReLU else activation(
                num_parameters=planes // 4, rngs=rngs),
        )
        self.conv2_2 = nn.Sequential(
            nn.Conv2d(planes // 4, planes // 2, kernel_size=3, stride=2,
                      padding=1, bias=False, rngs=rngs),
            norm_layer(planes // 2, rngs=rngs),
            activation() if activation is nn.ReLU else activation(
                num_parameters=planes // 2, rngs=rngs),
        )
        self.conv3 = nn.Sequential(
            nn.Conv2d(planes, planes, 1, 1, bias=False, rngs=rngs),
            norm_layer(planes, rngs=rngs),
            activation() if activation is nn.ReLU else activation(
                num_parameters=planes, rngs=rngs),
        )
        self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.conv1(x)
        x = jnp.concatenate(
            [self.conv2_2(self.conv2_1(x)), self.maxpool(x)], axis=-1
        )
        return self.conv3(x)


class ResNet(nnx.Module):
    def __init__(
        self,
        block: Type,
        layers: List[int],
        num_classes: int = 1000,
        zero_init_residual: bool = False,
        groups: int = 1,
        width_per_group: int = 64,
        replace_stride_with_dilation: Optional[List[bool]] = None,
        norm_layer: Optional[Callable] = None,
        activation: Optional[Callable] = None,
        stem_type: str = "basic",
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        if norm_layer is None:
            norm_layer = nn.BatchNorm2d
        if activation is None:
            activation = nn.ReLU
        self._norm_layer = norm_layer
        self._activation = activation

        self.stem_type = stem_type
        self.inplanes = 64
        self.dilation = 1
        if replace_stride_with_dilation is None:
            replace_stride_with_dilation = [False, False, False]
        if len(replace_stride_with_dilation) != 3:
            raise ValueError(
                "replace_stride_with_dilation should be None or a 3-element "
                f"tuple, got {replace_stride_with_dilation}"
            )
        self.groups = groups
        self.base_width = width_per_group
        if stem_type == "basic":
            self.conv1 = nn.Conv2d(3, self.inplanes, kernel_size=7, stride=2,
                                   padding=3, bias=False, rngs=rngs)
            self.bn1 = norm_layer(self.inplanes, rngs=rngs)
        elif stem_type == "dabnn":
            self.conv1 = DaBNNStem(self.inplanes, norm_layer=norm_layer, rngs=rngs)
        else:
            raise ValueError(f"Unknown stem_type {stem_type!r}")
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, 64, layers[0], rngs=rngs)
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2,
                                       dilate=replace_stride_with_dilation[0],
                                       rngs=rngs)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2,
                                       dilate=replace_stride_with_dilation[1],
                                       rngs=rngs)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2,
                                       dilate=replace_stride_with_dilation[2],
                                       rngs=rngs)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(self.outplanes, num_classes, rngs=rngs)

        # kaiming-normal fan_out re-init of conv kernels (reference
        # bnn/models/resnet.py:103-108); BN is already ones/zeros by default.
        for _, m in self._iter_convs():
            fan_out = m.out_channels * m.kernel_size[0] * m.kernel_size[1]
            std = (2.0 / fan_out) ** 0.5
            m.kernel[...] = std * jax.random.normal(rngs.params(), m.kernel[...].shape)

        if zero_init_residual:
            for m in self._iter_modules():
                if isinstance(m, Bottleneck):
                    m.bn3.scale[...] = jnp.zeros_like(m.bn3.scale[...])
                elif isinstance(m, BasicBlock):
                    m.bn2.scale[...] = jnp.zeros_like(m.bn2.scale[...])

    def _iter_modules(self):
        from ..binarize import named_modules
        for _, m in named_modules(self):
            yield m

    def _iter_convs(self):
        from ..binarize import named_modules
        for name, m in named_modules(self):
            if isinstance(m, nn.Conv2d):
                yield name, m

    def _make_layer(self, block: Type, planes: int, blocks: int, stride: int = 1,
                    dilate: bool = False, *, rngs: nnx.Rngs) -> nn.Sequential:
        norm_layer = self._norm_layer
        downsample = None
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.AvgPool2d(kernel_size=stride, stride=stride, ceil_mode=True,
                             count_include_pad=False),
                conv1x1(self.inplanes, planes * block.expansion, stride=1, rngs=rngs),
                norm_layer(planes * block.expansion, rngs=rngs),
            )

        layers = [block(self.inplanes, planes, stride, downsample, self.groups,
                        self.base_width, previous_dilation, norm_layer,
                        activation=self._activation, rngs=rngs)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes, groups=self.groups,
                                base_width=self.base_width, dilation=self.dilation,
                                norm_layer=norm_layer, activation=self._activation,
                                rngs=rngs))
        self.outplanes = planes * block.expansion
        return nn.Sequential(*layers)

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.conv1(x)
        if self.stem_type == "basic":
            x = self.maxpool(self.relu(self.bn1(x)))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x)
        x = x.reshape(x.shape[0], -1)
        return self.fc(x)


def _resnet(arch: str, block: Type, layers: List[int], **kwargs) -> ResNet:
    return ResNet(block, layers, **kwargs)


def resnet18(block_type: Optional[Type] = None, **kwargs) -> ResNet:
    """ResNet-18 with pluggable block type (reference:
    bnn/models/resnet.py:180-189)."""
    return _resnet("resnet18", BasicBlock if block_type is None else block_type,
                   [2, 2, 2, 2], **kwargs)


def resnet34(block_type: Optional[Type] = None, **kwargs) -> ResNet:
    """ResNet-34 (reference: bnn/models/resnet.py:192-201)."""
    return _resnet("resnet34", BasicBlock if block_type is None else block_type,
                   [3, 4, 6, 3], **kwargs)


def resnet50(block_type: Optional[Type] = None, **kwargs) -> ResNet:
    """ResNet-50 (reference: bnn/models/resnet.py:204-213)."""
    return _resnet("resnet50", Bottleneck if block_type is None else block_type,
                   [3, 4, 6, 3], **kwargs)
