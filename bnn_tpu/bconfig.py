"""Binarization configuration.

Mirror of the reference's ``BConfig`` (bnn/bconfig.py:11-25): a dataclass of
three binarizer *classes* (or ``with_args`` factories) — never instances —
that parameterize a binary layer:

- ``activation_pre_process``: applied to the layer input (one argument)
- ``activation_post_process``: applied to ``(layer_out, layer_in)``; its
  constructor receives the layer module (for channel counts / geometry)
- ``weight_pre_process``: applied to the layer kernel (one argument)
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Callable

from flax import nnx

from .ops.binarizers import Identity


@dataclass
class BConfig:
    activation_pre_process: Callable = Identity
    activation_post_process: Callable = Identity
    weight_pre_process: Callable = Identity

    def __post_init__(self) -> None:
        for f in dataclasses.fields(self):
            value = getattr(self, f.name)
            if isinstance(value, nnx.Module):
                raise ValueError(
                    "BConfig received an instance, please pass the class instead."
                )
