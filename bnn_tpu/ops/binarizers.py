"""The binarizer (quantizer) zoo as flax NNX modules.

TPU-native re-implementation of the reference op library (bnn/ops.py:40-221).
Binarizers are small NNX modules so that stateful ones (e.g. the learnable
per-channel scale of :class:`BasicScaleBinarizer`) carry their parameters in
the model pytree and train under ``jit`` like any other parameter.

Layout note: this framework is channels-last (NHWC activations, HWIO /
``(in, out)`` kernels), so "per-out-channel" always means the LAST axis —
the reference's dim-0/dim-1 torch conventions (bnn/ops.py:116-127) map to
``out_axis=-1`` / ``in_axis=-2`` here, uniformly for every kernel rank.
"""
from __future__ import annotations

import itertools
import math
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import nnx

from .. import functional as F
from .registry import register
from .ste import (resolve_surrogate, sign_pm1_ste, sign_ste,
                  stochastic_sign_ste, surrogate_sign)

__all__ = [
    "BinarizerBase",
    "Identity",
    "BasicInputBinarizer",
    "StochasticInputBinarizer",
    "AdvancedInputBinarizer",
    "XNORWeightBinarizer",
    "BasicScaleBinarizer",
    "XNORScaleBinarizer",
]


class _PartialWrapper:
    """Chainable constructor factory (API parity with the reference's
    ``with_args`` machinery, bnn/ops.py:10-35)."""

    def __init__(self, p: partial):
        self.p = p

    def __call__(self, *args, **kwargs):
        return self.p(*args, **kwargs)

    def with_args(self, **kwargs):
        return _PartialWrapper(partial(self.p.func, *self.p.args, **{**self.p.keywords, **kwargs}))

    def __repr__(self):
        return repr(self.p)


class BinarizerBase(nnx.Module):
    """Base class for all binarizers.

    Subclasses implement ``__call__``. Input/weight binarizers take one
    tensor; output (scale) binarizers take ``(layer_out, layer_in)`` — the
    two-argument post-process contract of the reference (bnn/bconfig.py:7,
    bnn/layers/conv.py:94-97) that XNOR-Net's spatial scaling needs.
    """

    @classmethod
    def with_args(cls, **kwargs) -> _PartialWrapper:
        return _PartialWrapper(partial(cls, **kwargs))


@register(aliases=("nn.Identity", "identity"))
class Identity(BinarizerBase):
    """No-op binarizer, usable in any of the three binarizer slots.

    Accepts one argument (pre/weight slots) or two (post slot), covering both
    the reference's ``nn.Identity`` and its two-arg ``Identity``
    (bnn/bconfig.py:6-8).
    """

    def __init__(self, module: nnx.Module = None):
        pass

    def __call__(self, x: jax.Array, *unused) -> jax.Array:
        return x


@register
class BasicInputBinarizer(BinarizerBase):
    """Element-wise deterministic sign with hardtanh-STE gradients.

    Reference: bnn/ops.py:143-152. By default matches ``torch.sign``
    (``sign(0) == 0``). With ``zero_to_one=True`` exact zeros map to ``+1``
    instead — bit-identical to the bitpacked deployment path (recommended for
    models with ReLU, which produces exact zeros; see
    :func:`bnn_tpu.ops.ste.sign_pm1_ste`).
    """

    def __init__(self, zero_to_one: bool = False):
        self.zero_to_one = zero_to_one

    def __call__(self, x: jax.Array) -> jax.Array:
        return sign_pm1_ste(x) if self.zero_to_one else sign_ste(x)


# Default-seed dispenser for stochastic binarizers built without explicit
# rngs (the recipe path instantiates one per layer with no args): every
# instance must get a DISTINCT stream — a fixed default seed would make
# all layers draw bit-identical noise, perfectly correlating the flips
# the stochastic binarizer exists to decorrelate. Deterministic per
# process construction order (the reference's global-torch-RNG analogue,
# bnn/ops.py:87-89); pass rngs= / seed= explicitly for full control.
_STOCHASTIC_SEED = itertools.count()


@register
class StochasticInputBinarizer(BinarizerBase):
    """Stochastic sign binarizer (reference: bnn/ops.py:155-164).

    Carries its own NNX RNG stream so each call draws fresh noise while
    remaining jit-compatible. Without explicit ``rngs``/``seed`` each
    instance draws from a distinct auto-assigned stream (see
    ``_STOCHASTIC_SEED`` above).
    """

    def __init__(self, rngs: Optional[nnx.Rngs] = None,
                 seed: Optional[int] = None):
        if rngs is None:
            rngs = nnx.Rngs(next(_STOCHASTIC_SEED) if seed is None else seed)
        self.rngs = rngs

    def __call__(self, x: jax.Array) -> jax.Array:
        return stochastic_sign_ste(x, self.rngs())


@register
class AdvancedInputBinarizer(BinarizerBase):
    """Sign forward with a pluggable soft surrogate gradient.

    Reference: bnn/ops.py:167-177 (implemented with the documented intent;
    see :func:`bnn_tpu.ops.ste.surrogate_sign` for the deviation note).
    ``derivative_funct`` mirrors the reference's constructor knob
    (bnn/ops.py:168-171): any odd squashing callable, or one of the
    registry names in :data:`bnn_tpu.ops.ste.SURROGATES` ("tanh", "erf",
    "softsign", "hardtanh", "sin") so recipes can declare it as a string:
    ``name: AdvancedInputBinarizer, args: {derivative_funct: erf, t: 3}``.
    """

    def __init__(self, derivative_funct="tanh", t: float = 5.0):
        self.derivative_funct = resolve_surrogate(derivative_funct)
        self.t = t

    def __call__(self, x: jax.Array) -> jax.Array:
        return surrogate_sign(x, self.derivative_funct, self.t)


@register
class XNORWeightBinarizer(BinarizerBase):
    """XNOR-Net analytical weight binarizer: ``alpha * sign(W)``.

    ``alpha`` is the per-out-channel mean L1 norm of the weights
    (reference: bnn/ops.py:95-140). Works for any kernel rank >= 2 with the
    framework's out-last layout: linear ``(in, out)``, conv1d ``(W, I, O)``,
    conv2d ``(H, W, I, O)``.

    Args:
        compute_alpha: if True scale sign(W) by the analytic alpha.
        center_weights: subtract the per-position mean over the in-channel
            axis first (reference: bnn/ops.py:130-132 centers over dim 1,
            which is the in-channel axis in torch's OIHW — ``in_axis=-2``
            here).
    """

    def __init__(self, compute_alpha: bool = True, center_weights: bool = False):
        self.compute_alpha = compute_alpha
        self.center_weights = center_weights

    def _compute_alpha(self, w: jax.Array) -> jax.Array:
        if w.ndim < 2:
            raise ValueError(f"Expected kernel rank >= 2, got {w.ndim}")
        reduce_axes = tuple(range(w.ndim - 1))  # everything except out
        return jnp.mean(jnp.abs(w), axis=reduce_axes, keepdims=True)

    def __call__(self, w: jax.Array) -> jax.Array:
        if self.center_weights:
            w = w - jnp.mean(w, axis=-2, keepdims=True)
        if self.compute_alpha:
            alpha = self._compute_alpha(w)
            return sign_ste(w) * alpha
        return sign_ste(w)


@register
class BasicScaleBinarizer(BinarizerBase):
    """Learnable per-out-channel scale applied to the layer output.

    Reference: bnn/ops.py:180-205 (alpha Parameter of shape ``[1, C, 1...]``
    in NCHW; here simply ``(C,)`` which broadcasts over the channels-last
    output).
    """

    def __init__(self, module: nnx.Module, shape: Optional[Sequence[int]] = None):
        if shape is None:
            num_channels = getattr(module, "out_features", None)
            if num_channels is None:
                num_channels = getattr(module, "out_channels", None)
            if num_channels is None:
                raise ValueError(
                    f"Unknown layer of type {type(module)} missing out_channels/out_features"
                )
            shape = (num_channels,)
        self.alpha = nnx.Param(jnp.ones(tuple(shape), dtype=jnp.float32))

    def __call__(self, layer_out: jax.Array, layer_in: jax.Array = None) -> jax.Array:
        return layer_out * self.alpha[...]


@register
class XNORScaleBinarizer(BinarizerBase):
    """Data-driven XNOR-Net spatial scaling ``K``.

    ``K = (mean_c |x|) * k`` with ``k`` a uniform kernel of the layer's
    receptive field, applied with the layer's stride/padding. The reference
    implementation (bnn/ops.py:208-221) is broken as shipped (wrong super
    call, ``torch.mean`` missing its input, kernel shape); this is the
    corrected XNOR-Net formulation.
    """

    def __init__(self, module: nnx.Module):
        if not hasattr(module, "kernel_size"):
            # the spatial scale K is defined by a conv's receptive field;
            # there is no sensible K for a Linear (the reference is equally
            # conv-only but dies with an opaque AttributeError)
            raise TypeError(
                "XNORScaleBinarizer only applies to conv layers (needs "
                f"kernel_size/stride/padding); got {type(module).__name__}. "
                "Use BasicScaleBinarizer for dense layers.")
        self.kernel_size = tuple(module.kernel_size)
        self.stride = module.stride
        self.padding = module.padding
        # the scale map must trace the SAME receptive-field geometry as
        # the layer, dilation included, or its spatial shape mismatches
        # the layer output (e.g. BATS DilConv)
        self.dilation = getattr(module, "dilation", 1)

    def __call__(self, layer_out: jax.Array, layer_in: jax.Array) -> jax.Array:
        a = jnp.mean(jnp.abs(layer_in), axis=-1, keepdims=True)
        # fixed uniform averaging kernel; a compile-time constant under jit
        k = jnp.full(
            self.kernel_size + (1, 1),
            1.0 / math.prod(self.kernel_size),
            dtype=layer_in.dtype,
        )
        scale = F.conv(a, k, stride=self.stride, padding=self.padding,
                       dilation=self.dilation)
        return layer_out * scale
