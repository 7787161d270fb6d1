"""Shared conv helpers for the model zoo (reference:
bnn/models/layers/common.py)."""
from __future__ import annotations

from flax import nnx

from ... import nn


def conv3x3(in_planes: int, out_planes: int, stride: int = 1, groups: int = 1,
            dilation: int = 1, *, rngs: nnx.Rngs) -> nn.Conv2d:
    """3x3 convolution with padding."""
    return nn.Conv2d(in_planes, out_planes, kernel_size=3, stride=stride,
                     padding=dilation, groups=groups, bias=False,
                     dilation=dilation, rngs=rngs)


def conv1x1(in_planes: int, out_planes: int, stride: int = 1, *,
            rngs: nnx.Rngs) -> nn.Conv2d:
    """1x1 convolution."""
    return nn.Conv2d(in_planes, out_planes, kernel_size=1, stride=stride,
                     bias=False, rngs=rngs)


def make_activation(activation, num_parameters: int, *, rngs: nnx.Rngs):
    """Instantiate an activation class the way the reference does: ReLU takes
    no channel count, PReLU-likes get ``num_parameters``
    (reference: bnn/models/layers/res_block.py:34-35)."""
    if activation is nn.ReLU or activation is None:
        return nn.ReLU()
    return activation(num_parameters=num_parameters, rngs=rngs)
