"""Residual blocks for BNN-adapted ResNets.

One parameterized implementation covers all four blocks of reference
bnn/models/layers/res_block.py. A block is a *chain of conv units*, each
unit wrapped in normalization and activation, plus an identity shortcut.
The two orderings the BNN literature uses differ only in two places, so
they are data, not code:

- **post-activation** (torchvision style, reference res_block.py:8-118):
  ``conv -> BN -> act`` per unit, with the last unit's activation fired
  *after* the shortcut add;
- **pre-activation** (XNOR-Net style, reference res_block.py:121-228):
  ``BN -> conv -> act`` per unit, nothing after the add. The norm sits on
  the unit's *input*, so its width is the unit's fan-in.

The per-class unit plans (geometry of each conv) are the only thing the
four public classes define. Attribute names (``conv1``/``bn1``/``act1``...,
``downsample``) match the reference so YAML recipes, checkpoints, and the
deployment fusion passes address them identically.

Note on ``PreBottleneck``: its third norm is correctly built with ``width``
channels — in pre-activation ordering it normalizes conv2's output *before*
conv3 (the reference builds the same shape at res_block.py:200, by accident
of a copy-paste, but its forward at :220-222 needs exactly this).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
from flax import nnx

from ... import nn
from .common import conv1x1, conv3x3, make_activation

# a unit is (fan_in, fan_out, ksize, stride, groups, dilation)
Unit = Tuple[int, int, int, int, int, int]


def _two_3x3(name: str, inplanes: int, planes: int, stride: int, groups: int,
             base_width: int, dilation: int) -> Sequence[Unit]:
    """Plan for the basic (two 3x3 convs) blocks."""
    if groups != 1 or base_width != 64:
        raise ValueError(f"{name} only supports groups=1 and base_width=64")
    if dilation > 1:
        raise NotImplementedError(f"Dilation > 1 not supported in {name}")
    return (
        (inplanes, planes, 3, stride, 1, 1),
        (planes, planes, 3, 1, 1, 1),
    )


def _squeeze_expand(name: str, inplanes: int, planes: int, stride: int,
                    groups: int, base_width: int, dilation: int
                    ) -> Sequence[Unit]:
    """Plan for the bottleneck (1x1 -> 3x3 -> 1x1) blocks.

    ResNet V1.5 convention: the stride lives on the middle 3x3 conv
    (reference bnn/models/layers/res_block.py:59-64).
    """
    width = int(planes * (base_width / 64.0)) * groups
    return (
        (inplanes, width, 1, 1, 1, 1),
        (width, width, 3, stride, groups, dilation),
        (width, 4 * planes, 1, 1, 1, 1),
    )


class _UnitChain(nnx.Module):
    """Shared machinery: build numbered conv/bn/act attributes from a unit
    plan and run them in the ordering selected by ``preact``."""

    preact: bool = False  # overridden per subclass

    def __init__(self, inplanes: int, planes: int, stride: int = 1,
                 downsample: Optional[nnx.Module] = None, groups: int = 1,
                 base_width: int = 64, dilation: int = 1,
                 norm_layer: Optional[Callable] = None, activation=nn.ReLU, *,
                 rngs: nnx.Rngs):
        norm = nn.BatchNorm2d if norm_layer is None else norm_layer
        units = self._plan(type(self).__name__, inplanes, planes, stride,
                           groups, base_width, dilation)
        self.n_units = len(units)
        for i, (cin, cout, k, s, g, d) in enumerate(units, start=1):
            conv = (conv3x3(cin, cout, s, g, d, rngs=rngs) if k == 3
                    else conv1x1(cin, cout, stride=s, rngs=rngs))
            setattr(self, f"conv{i}", conv)
            setattr(self, f"bn{i}", norm(cin if self.preact else cout,
                                         rngs=rngs))
            setattr(self, f"act{i}", make_activation(activation, cout,
                                                     rngs=rngs))
        self.downsample = downsample
        self.stride = stride

    # subclasses bind this to one of the plan functions above
    _plan = staticmethod(_two_3x3)

    def __call__(self, x: jax.Array) -> jax.Array:
        shortcut = x if self.downsample is None else self.downsample(x)
        h = x
        for i in range(1, self.n_units + 1):
            conv = getattr(self, f"conv{i}")
            norm = getattr(self, f"bn{i}")
            if self.preact:
                h = getattr(self, f"act{i}")(conv(norm(h)))
            else:
                h = norm(conv(h))
                if i < self.n_units:
                    h = getattr(self, f"act{i}")(h)
        h = h + shortcut
        return h if self.preact else getattr(self, f"act{self.n_units}")(h)


class BasicBlock(_UnitChain):
    """Post-activation basic block (reference res_block.py:8-56)."""
    expansion = 1
    preact = False
    _plan = staticmethod(_two_3x3)


class Bottleneck(_UnitChain):
    """Post-activation bottleneck (reference res_block.py:59-118)."""
    expansion = 4
    preact = False
    _plan = staticmethod(_squeeze_expand)


class PreBasicBlock(_UnitChain):
    """Pre-activation basic block, BN -> Conv -> Act (reference
    res_block.py:121-167)."""
    expansion = 1
    preact = True
    _plan = staticmethod(_two_3x3)


class PreBottleneck(_UnitChain):
    """Pre-activation bottleneck (reference res_block.py:170-229)."""
    expansion = 4
    preact = True
    _plan = staticmethod(_squeeze_expand)
