"""FLOPs / BOPs counting for (binarized) models.

The reference delegates op counting to the external ``pthflops`` package with
a manual conv-vs-rest split (reference README.md:130-152); here it is a
native capability: convs/linears whose inputs AND weights are binarized count
as BOPs (binary ops), everything else as FLOPs. The standard BNN cost model
(XNOR-Net paper) prices a BOP at 1/64 of a FLOP; both raw counts and the
discounted total are reported.

Counting is shape-only (``jax.eval_shape``): no real computation or device.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from .. import layers as blayers
from .. import nn
from ..binarize import named_modules
from ..inference.deploy import DeployedConv, DeployedLinear
from ..ops.binarizers import Identity

__all__ = ["count_ops", "OpCount"]

_CONV_TYPES = (nn.Conv1d, nn.Conv2d, blayers.Conv1d, blayers.Conv2d,
               DeployedConv)
_LIN_TYPES = (nn.Linear, blayers.Linear, DeployedLinear)


@dataclass
class OpCount:
    flops: int = 0
    bops: int = 0
    per_layer: Dict[str, Tuple[str, int]] = field(default_factory=dict)

    @property
    def effective_flops(self) -> float:
        """BOPs discounted 64x (XNOR-Net convention, reference README.md:143)."""
        return self.flops + self.bops / 64.0

    def __repr__(self) -> str:
        return (f"OpCount(flops={self.flops:,}, bops={self.bops:,}, "
                f"effective={self.effective_flops:,.0f})")


def _is_binary(m) -> bool:
    if isinstance(m, (DeployedConv, DeployedLinear)):
        return True
    if isinstance(m, (blayers.Linear, blayers.Conv1d, blayers.Conv2d)):
        return (not isinstance(m.activation_pre_process, Identity)
                and not isinstance(m.weight_pre_process, Identity))
    return False


_PATCH_LOCK = __import__("threading").Lock()


def _capture_shapes(model: nnx.Module, input_shape) -> Dict[str, tuple]:
    """Shape-only forward pass recording each eligible layer's in/out shape.

    Patches the layer classes' ``__call__`` process-globally for the
    duration of the trace, so it holds a lock: a concurrent forward pass
    in another thread during the (shape-only, fast) trace would dispatch
    through the wrapper; reentrant/parallel ``count_ops`` calls serialize.
    """
    # trace an eval-mode clone: BatchNorm in train mode would mutate its
    # stats under eval_shape's trace, which nnx forbids
    model = nnx.merge(*nnx.split(model))
    model.eval()
    targets = {id(m): name for name, m in named_modules(model)
               if isinstance(m, _CONV_TYPES + _LIN_TYPES)}
    captured: Dict[str, tuple] = {}
    saved = {}

    def _wrap(orig):
        def call(self, x, *a, **kw):
            out = orig(self, x, *a, **kw)
            if id(self) in targets:
                captured[targets[id(self)]] = (x.shape, out.shape)
            return out
        return call

    with _PATCH_LOCK:
        for _, m in named_modules(model):
            t = type(m)
            if id(m) in targets and t not in saved:
                saved[t] = t.__call__
                t.__call__ = _wrap(t.__call__)
        try:
            x = jax.ShapeDtypeStruct(tuple(input_shape), jnp.float32)
            jax.eval_shape(lambda v: model(v), x)
        finally:
            for t, orig in saved.items():
                t.__call__ = orig
    return captured


def count_ops(model: nnx.Module, input_shape: Tuple[int, ...]) -> OpCount:
    """Count MAC ops (2 * MACs) for one forward pass at ``input_shape``.

    Binary layers (sign inputs + sign weights, or deployed layers) are
    reported as BOPs; everything else as FLOPs.
    """
    shapes = _capture_shapes(model, input_shape)
    counts = OpCount()
    for name, m in named_modules(model):
        if name not in shapes:
            continue
        in_shape, out_shape = shapes[name]
        if isinstance(m, _CONV_TYPES):
            ksz = math.prod(m.kernel_size)
            in_ch = m.in_channels // getattr(m, "groups", 1)
            macs = math.prod(out_shape[:-1]) * m.out_channels * ksz * in_ch
        else:
            macs = math.prod(in_shape[:-1]) * m.in_features * m.out_features
        ops = 2 * macs
        kind = "bops" if _is_binary(m) else "flops"
        counts.per_layer[name] = (kind, ops)
        if kind == "bops":
            counts.bops += ops
        else:
            counts.flops += ops
    return counts
