"""Hierarchical binary block (Bulat & Tzimiropoulos).

A cascade of BN -> Act -> conv3x3 stages whose widths taper as
``planes/2, planes/4, planes/4``; every stage's output is kept and the
concatenation of all of them (which sums back to ``planes`` channels) is
residual-added to the input. Reference:
bnn/models/layers/hierarchical_block.py.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ... import nn
from .common import conv3x3, make_activation

# numerators over 4 of the per-stage output widths: planes/2, planes/4x2
_TAPER = (2, 1, 1)


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
        norm = nn.BatchNorm2d if norm_layer is None else norm_layer
        for arg, what in ((dilation, "Dilation"), (stride, "Stride")):
            if arg > 1:
                raise NotImplementedError(f"{what} > 1 not supported in HBlock")
        fan_in = inplanes
        for i, quarters in enumerate(_TAPER, start=1):
            fan_out = planes * quarters // 4
            setattr(self, f"bn{i}", norm(fan_in, rngs=rngs))
            setattr(self, f"act{i}", make_activation(activation, fan_in,
                                                     rngs=rngs))
            setattr(self, f"conv{i}", conv3x3(fan_in, fan_out, groups=groups,
                                              rngs=rngs))
            fan_in = fan_out
        self.downsample = downsample

    def __call__(self, x: jax.Array) -> jax.Array:
        shortcut = x if self.downsample is None else self.downsample(x)
        taps = []
        h = x
        for i in range(1, len(_TAPER) + 1):
            h = getattr(self, f"bn{i}")(h)
            h = getattr(self, f"act{i}")(h)
            h = getattr(self, f"conv{i}")(h)
            taps.append(h)
        return jnp.concatenate(taps, axis=-1) + shortcut
