"""BNN-adapted ResNet family (reference: bnn/models/resnet.py).

BNN-specific deltas vs a vanilla ResNet, preserved from the reference:

- pluggable ``block_type`` (post-/pre-activation basic & bottleneck) and
  ``activation`` class (PReLU supported with per-channel slopes). HBlock
  (models/layers/hierarchical_block.py) is stride-1-only like the
  reference's, so it composes into custom single-resolution trunks, not
  the strided ``_stage`` builder here;
- ``stem_type='basic' | 'dabnn'`` (DaBNN efficient stem, reference
  bnn/models/resnet.py:10-47);
- the shortcut on strided stages is AvgPool -> 1x1 conv -> BN instead of a
  strided conv (reference bnn/models/resnet.py:128-133) — the standard BNN
  trick that keeps the shortcut information-preserving.

The network is assembled from a declarative stage plan by pure module-level
builder functions rather than stateful methods; attribute names (``conv1``,
``layer1..4``, ``downsample.1`` ...) match the reference exactly so YAML
recipes addressing layers by path work verbatim.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Type

import jax
import jax.numpy as jnp
from flax import nnx

from .. import nn
from .layers import BasicBlock, Bottleneck
from .layers import conv1x1
from .layers.common import make_activation

_STAGE_WIDTHS = (64, 128, 256, 512)
_STEM_WIDTH = 64


def _cba(cin: int, cout: int, k: int, stride: int, norm: Callable,
         activation, rngs: nnx.Rngs, groups: int = 1) -> nn.Sequential:
    """conv(k x k, no bias) -> norm -> activation."""
    return nn.Sequential(
        nn.Conv2d(cin, cout, kernel_size=k, stride=stride, padding=k // 2,
                  groups=groups, bias=False, rngs=rngs),
        norm(cout, rngs=rngs),
        make_activation(activation, cout, rngs=rngs),
    )


class DaBNNStem(nnx.Module):
    """DaBNN efficient stem (reference: bnn/models/resnet.py:10-47).

    A stride-2 3x3 trunk feeding two parallel branches — a 1x1-squeeze /
    3x3-stride-2 conv path and a plain maxpool path — whose concatenation
    is mixed by a final 1x1 conv. Total downsampling x4, like conv7x7/s2 +
    maxpool but far cheaper.
    """

    def __init__(self, planes: int, norm_layer: Optional[Callable] = None,
                 activation=nn.ReLU, *, rngs: nnx.Rngs):
        norm_layer = nn.BatchNorm2d if norm_layer is None else norm_layer
        half, quarter = planes // 2, planes // 4
        self.conv1 = _cba(3, half, 3, 2, norm_layer, activation, rngs)
        self.conv2_1 = _cba(half, quarter, 1, 1, norm_layer, activation, rngs)
        self.conv2_2 = _cba(quarter, half, 3, 2, norm_layer, activation, rngs)
        self.conv3 = _cba(planes, planes, 1, 1, norm_layer, activation, rngs)
        self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)

    def __call__(self, x: jax.Array) -> jax.Array:
        trunk = self.conv1(x)
        conv_path = self.conv2_2(self.conv2_1(trunk))
        pool_path = self.maxpool(trunk)
        return self.conv3(jnp.concatenate([conv_path, pool_path], axis=-1))


def _avgpool_shortcut(cin: int, cout: int, stride: int, norm: Callable,
                      rngs: nnx.Rngs) -> nn.Sequential:
    """The BNN projection shortcut: AvgPool -> conv1x1 -> BN (reference
    bnn/models/resnet.py:128-133). Addressable as ``downsample.1`` in
    recipes (e.g. examples/recepies/imagenet-baseline.yaml:13-15)."""
    return nn.Sequential(
        nn.AvgPool2d(kernel_size=stride, stride=stride, ceil_mode=True,
                     count_include_pad=False),
        conv1x1(cin, cout, stride=1, rngs=rngs),
        norm(cout, rngs=rngs),
    )


def _stage(block: Type, cin: int, planes: int, count: int, stride: int,
           dilation: int, dilate: bool, groups: int, base_width: int,
           norm: Callable, activation, rngs: nnx.Rngs):
    """Build one ResNet stage; returns (Sequential, fan_out, new_dilation)."""
    entry_dilation = dilation
    if dilate:
        dilation *= stride
        stride = 1
    cout = planes * block.expansion
    shortcut = (None if stride == 1 and cin == cout
                else _avgpool_shortcut(cin, cout, stride, norm, rngs))
    blocks = [block(cin, planes, stride, shortcut, groups, base_width,
                    entry_dilation, norm, activation=activation, rngs=rngs)]
    blocks += [block(cout, planes, groups=groups, base_width=base_width,
                     dilation=dilation, norm_layer=norm,
                     activation=activation, rngs=rngs)
               for _ in range(count - 1)]
    return nn.Sequential(*blocks), cout, dilation


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
        rngs = nnx.Rngs(0) if rngs is None else rngs
        norm = nn.BatchNorm2d if norm_layer is None else norm_layer
        activation = nn.ReLU if activation is None else activation
        dilate = (list(replace_stride_with_dilation)
                  if replace_stride_with_dilation is not None
                  else [False, False, False])
        if len(dilate) != 3:
            raise ValueError(
                "replace_stride_with_dilation should be None or a 3-element "
                f"tuple, got {replace_stride_with_dilation}"
            )

        self.stem_type = stem_type
        if stem_type == "basic":
            self.conv1 = nn.Conv2d(3, _STEM_WIDTH, kernel_size=7, stride=2,
                                   padding=3, bias=False, rngs=rngs)
            self.bn1 = norm(_STEM_WIDTH, rngs=rngs)
        elif stem_type == "dabnn":
            # the requested activation reaches the stem too (the reference
            # hard-codes ReLU there even for PReLU nets,
            # ref models/resnet.py:90 — a silent config deviation)
            self.conv1 = DaBNNStem(_STEM_WIDTH, norm_layer=norm,
                                   activation=activation, rngs=rngs)
        else:
            raise ValueError(f"Unknown stem_type {stem_type!r}")
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)

        fan, dilation = _STEM_WIDTH, 1
        for idx, (planes, count) in enumerate(zip(_STAGE_WIDTHS, layers)):
            stage, fan, dilation = _stage(
                block, fan, planes, count,
                stride=1 if idx == 0 else 2,
                dilation=dilation,
                dilate=False if idx == 0 else dilate[idx - 1],
                groups=groups, base_width=width_per_group,
                norm=norm, activation=activation, rngs=rngs)
            setattr(self, f"layer{idx + 1}", stage)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(fan, num_classes, rngs=rngs)

        self._init_weights(rngs, zero_init_residual)

    def _init_weights(self, rngs: nnx.Rngs, zero_init_residual: bool) -> None:
        """Kaiming-normal fan_out re-init of conv kernels (reference
        bnn/models/resnet.py:103-108); BN is already ones/zeros by default.
        ``zero_init_residual`` zeroes each block's last BN scale so blocks
        start as identities (reference :110-116)."""
        from ..binarize import named_modules
        for _, m in named_modules(self):
            if isinstance(m, nn.Conv2d):
                fan_out = m.out_channels * m.kernel_size[0] * m.kernel_size[1]
                m.kernel[...] = (2.0 / fan_out) ** 0.5 * jax.random.normal(
                    rngs.params(), m.kernel[...].shape)
            elif zero_init_residual and isinstance(m, Bottleneck):
                m.bn3.scale[...] = jnp.zeros_like(m.bn3.scale[...])
            elif zero_init_residual and isinstance(m, BasicBlock):
                m.bn2.scale[...] = jnp.zeros_like(m.bn2.scale[...])

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.conv1(x)
        if self.stem_type == "basic":
            x = self.maxpool(self.relu(self.bn1(x)))
        for i in (1, 2, 3, 4):
            x = getattr(self, f"layer{i}")(x)
        x = self.avgpool(x)
        return self.fc(x.reshape(x.shape[0], -1))


# depth -> (per-stage block counts, default block type); factory docs cite
# reference bnn/models/resnet.py:180-213
_CONFIGS = {
    18: ([2, 2, 2, 2], BasicBlock),
    34: ([3, 4, 6, 3], BasicBlock),
    50: ([3, 4, 6, 3], Bottleneck),
}


def _build(depth: int, block_type: Optional[Type], kwargs) -> ResNet:
    counts, default_block = _CONFIGS[depth]
    return ResNet(default_block if block_type is None else block_type,
                  counts, **kwargs)


def resnet18(block_type: Optional[Type] = None, **kwargs) -> ResNet:
    """ResNet-18 with pluggable block type (reference:
    bnn/models/resnet.py:180-189)."""
    return _build(18, block_type, kwargs)


def resnet34(block_type: Optional[Type] = None, **kwargs) -> ResNet:
    """ResNet-34 (reference: bnn/models/resnet.py:192-201)."""
    return _build(34, block_type, kwargs)


def resnet50(block_type: Optional[Type] = None, **kwargs) -> ResNet:
    """ResNet-50 (reference: bnn/models/resnet.py:204-213)."""
    return _build(50, block_type, kwargs)
