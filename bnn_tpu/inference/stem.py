"""Space-to-depth stem rewrite for serving latency.

The fp32 stem conv (7x7, stride 2, C_in=3 — reference
bnn/models/resnet.py:~100 equivalent, ours models/resnet.py) is the worst
possible shape for the TPU: 3 input channels occupy 3 of 128 lanes and XLA's
conv runs it at ~2 TFLOP/s (measured ~120us at B=1 on v5e, ~40% of the whole
deployed binary ResNet-18). The classic MLPerf-TPU fix is exact and free:

    conv(x, w; k, stride=2, pad=p)
      == conv(s2d2(x), T(w); ceil((k+f)/2), stride=1, pad=p')

where ``s2d2`` is 2x2 space-to-depth (``(N,H,W,C) -> (N,H/2,W/2,4C)``) and
``T`` zero-pads the kernel to even extent and rearranges it so each of the
four phase taps lands on its s2d channel slice. The stem becomes a
4x4xC_in*4 -> C_out stride-1 conv — K=192 deep for C_in=3 — which XLA tiles
onto the MXU properly. No approximation: outputs are bit-identical up to
float summation order.

:class:`SpaceToDepthConv` wraps the original ``nn.Conv2d`` (same kernel /
bias arrays — checkpoints still round-trip) and performs the rearrangement
at trace time; :func:`space_to_depth_stem` rewrites a model's eligible
stride-2 small-C_in float convs in place.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from .. import functional as F
from .. import nn
from ..binarize import named_modules, set_module_by_name

__all__ = ["SpaceToDepthConv", "space_to_depth_stem"]


def _transform_kernel(w: jax.Array, pad_h: int, pad_w: int):
    """Rearrange an HWIO stride-2 kernel for 2x2 space-to-depth input.

    Returns ``(w_s2d, (pl_h, ph_extra), (pl_w, pw_extra))`` where ``w_s2d``
    has shape ``(ceil, ceil, 4*I, O)`` and the pads are the stride-1 conv's
    left padding and the kernel's front zero-fill (needed to compute the
    right padding against the output size).
    """
    kh, kw, cin, cout = w.shape
    fh, fw = pad_h % 2, pad_w % 2  # front fill so extent starts even
    k8h, k8w = kh + fh, kw + fw
    k8h += k8h % 2
    k8w += k8w % 2
    w8 = jnp.pad(w, ((fh, k8h - kh - fh), (fw, k8w - kw - fw), (0, 0), (0, 0)))
    # padded row index p = 2*ki + di; channel order of s2d is (di, dj, c)
    t = w8.reshape(k8h // 2, 2, k8w // 2, 2, cin, cout)
    t = t.transpose(0, 2, 1, 3, 4, 5).reshape(k8h // 2, k8w // 2, 4 * cin,
                                              cout)
    return t, (pad_h + fh) // 2, (pad_w + fw) // 2


def _s2d(x: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


class SpaceToDepthConv(nnx.Module):
    """Exact space-to-depth execution of a stride-2 float conv.

    Holds the original :class:`~bnn_tpu.nn.Conv2d` (weight/bias arrays are
    shared, not copied) so checkpoints and later re-deploys see the original
    module; only the forward computation changes. Inputs with odd H/W (or
    under-size inputs) fall back to the wrapped conv, as do batches above
    ``max_batch``: measured on v5e (deployed binary ResNet-18, 224^2), s2d
    wins 1.7-1.9x at B<=8 but the extra HBM pass for the s2d transpose
    LOSES at B>=16 where XLA's native conv already has enough output rows
    to tile the MXU. The dispatch is on the traced (static) shape, so each
    batch size compiles its better path.
    """

    def __init__(self, conv: nn.Conv2d, *, max_batch: int = 8):
        assert tuple(F._ntuple(conv.stride, 2)) == (2, 2), conv.stride
        assert not isinstance(conv.padding, str), conv.padding
        assert tuple(F._ntuple(conv.dilation, 2)) == (1, 1), conv.dilation
        assert conv.groups == 1
        self.conv = conv
        self.max_batch = max_batch

    def __call__(self, x: jax.Array) -> jax.Array:
        conv = self.conv
        n, h, w, _ = x.shape
        kh, kw = conv.kernel_size
        ph, pw = F._ntuple(conv.padding, 2)
        if (n > self.max_batch or h % 2 or w % 2
                or h + 2 * ph < kh or w + 2 * pw < kw):
            return conv(x)
        out_h = (h + 2 * ph - kh) // 2 + 1
        out_w = (w + 2 * pw - kw) // 2 + 1
        kern, pl_h, pl_w = _transform_kernel(conv.kernel[...], ph, pw)
        ks_h, ks_w = kern.shape[0], kern.shape[1]
        pr_h = out_h - (h // 2) - pl_h + ks_h - 1
        pr_w = out_w - (w // 2) - pl_w + ks_w - 1
        y = jax.lax.conv_general_dilated(
            _s2d(x), kern.astype(x.dtype), window_strides=(1, 1),
            padding=((pl_h, pr_h), (pl_w, pr_w)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if conv.bias is not None:
            y = y + conv.bias[...].astype(y.dtype)
        return y


def _eligible(m) -> bool:
    return (
        isinstance(m, nn.Conv2d)
        and type(m).__module__ == "bnn_tpu.nn"
        and tuple(F._ntuple(m.stride, 2)) == (2, 2)
        and not isinstance(m.padding, str)
        and tuple(F._ntuple(m.dilation, 2)) == (1, 1)
        and m.groups == 1
        and m.in_channels <= 16  # only worthwhile where lanes are starved
    )


def space_to_depth_stem(model: nnx.Module, *, max_in_channels: int = 16,
                        max_batch: int = 8) -> int:
    """Rewrite eligible stride-2 small-C_in float convs in place.

    Targets the stem convs (basic 7x7/s2 ``conv1``, DaBNN 3x3/s2 first
    conv). Binary/deployed convs are never touched (their input layout is
    the packed/sign domain). Each rewrite only activates for traced batch
    sizes ``<= max_batch`` (see :class:`SpaceToDepthConv`). Returns the
    number of convs rewritten.
    """
    done = 0
    wrapped = []  # don't re-wrap the conv held inside a SpaceToDepthConv
    for name, m in list(named_modules(model)):
        if isinstance(m, SpaceToDepthConv):
            wrapped.append(name + ".")
            continue
        if any(name.startswith(p) for p in wrapped):
            continue
        if _eligible(m) and m.in_channels <= max_in_channels:
            set_module_by_name(model, name,
                               SpaceToDepthConv(m, max_batch=max_batch))
            done += 1
    return done
