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
from ..kernels.stem import fused_stem, fused_stem_v2, fused_stem_v3

__all__ = ["SpaceToDepthConv", "space_to_depth_stem", "FusedStem",
           "fuse_stem"]


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
        # loud errors, not asserts: direct construction with an unsupported
        # conv must not silently compute a wrong rearrangement under python -O
        if (tuple(F._ntuple(conv.stride, 2)) != (2, 2)
                or isinstance(conv.padding, str)
                or tuple(F._ntuple(conv.dilation, 2)) != (1, 1)
                or conv.groups != 1):
            raise ValueError(
                "SpaceToDepthConv requires stride-2, numeric padding, "
                "dilation 1, groups 1; got "
                f"stride={conv.stride} padding={conv.padding} "
                f"dilation={conv.dilation} groups={conv.groups}")
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


class FusedStem(nnx.Module):
    """Megakernel execution of the basic ResNet stem.

    Runs ``maxpool3x3/s2(relu(conv7x7/s2(x) + bias))`` as ONE Pallas kernel
    (:func:`bnn_tpu.kernels.stem.fused_stem`) — measured 3.8x over the
    unfused XLA chain at B=1 on v5e (120us -> 31us), which makes the float
    stem cheaper than the binary body it feeds. Holds the original conv
    (weight/bias arrays shared; a :class:`SpaceToDepthConv` wrapper is
    accepted and kept for the fallback path). Batches above ``max_batch``
    and non-stem-shaped inputs fall back to conv -> ReLU -> maxpool via the
    held modules.
    """

    def __init__(self, conv, *, max_batch: int = 8, interpret: bool = False):
        inner = conv.conv if isinstance(conv, SpaceToDepthConv) else conv
        if not (tuple(inner.kernel_size) == (7, 7)
                and tuple(F._ntuple(inner.stride, 2)) == (2, 2)
                and not isinstance(inner.padding, str)
                and tuple(F._ntuple(inner.padding, 2)) == (3, 3)
                and tuple(F._ntuple(inner.dilation, 2)) == (1, 1)
                and inner.groups == 1 and inner.in_channels <= 4):
            raise ValueError(
                "FusedStem requires a 7x7/s2/p3 conv with dilation 1, "
                "groups 1 and <=4 input channels; got "
                f"kernel_size={inner.kernel_size} stride={inner.stride} "
                f"padding={inner.padding} dilation={inner.dilation} "
                f"groups={inner.groups} in_channels={inner.in_channels}")
        self.conv = conv
        self.max_batch = max_batch
        self.interpret = interpret

    def _inner(self):
        c = self.conv
        return c.conv if isinstance(c, SpaceToDepthConv) else c

    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, _ = x.shape
        if n > self.max_batch or h % 8 or w % 4:
            y = jnp.maximum(self.conv(x), 0)
            return F.max_pool(y, 3, 2, 1)
        inner = self._inner()
        bias = inner.bias[...] if inner.bias is not None else None
        # phase-decomposed variants (224^2 v5e): v3 (H-oct x W-quad,
        # image-grid) ~19 us at B=1 and ~16.4 us/img at B=2-8 (1.7-2x over
        # the v1 grid kernel); v2 (H-oct, B=1) ~24; v1 30.5; unfused XLA
        # ~120. At B>=16 XLA's conv wins outright (v3 measured 1.0 ms vs
        # XLA 0.76 ms at B=64) — the max_batch cap already routes there.
        if h % 16 == 0 and w % 8 == 0:
            return fused_stem_v3(x, inner.kernel[...], bias,
                                 interpret=self.interpret)
        if n == 1 and h % 16 == 0:
            return fused_stem_v2(x, inner.kernel[...], bias,
                                 interpret=self.interpret)
        return fused_stem(x, inner.kernel[...], bias,
                          interpret=self.interpret)


def fuse_stem(model: nnx.Module, *, max_batch: int = 8,
              interpret: bool = False) -> int:
    """Fuse eligible basic ResNet stems (conv1+bn1+relu+maxpool) in place.

    Requires ``bn1`` already folded (run
    :func:`~bnn_tpu.inference.optimize.optimize_deployed` first, or this
    pass folds it itself via :func:`~bnn_tpu.inference.optimize.
    fold_bn_after`). Returns the number of stems fused. Like the other
    serving rewrites, the megakernel dispatches on the traced batch size;
    larger batches run the original chain.
    """
    from ..models.resnet import ResNet
    from .optimize import fold_bn_after

    fused = 0
    for _, m in list(named_modules(model)):
        if not isinstance(m, ResNet) or m.stem_type != "basic":
            continue
        if isinstance(m.conv1, FusedStem):
            continue
        conv = m.conv1
        inner = conv.conv if isinstance(conv, SpaceToDepthConv) else conv
        if not (isinstance(inner, nn.Conv2d)
                and type(inner).__module__ == "bnn_tpu.nn"
                and tuple(inner.kernel_size) == (7, 7)
                and tuple(F._ntuple(inner.stride, 2)) == (2, 2)
                and not isinstance(inner.padding, str)
                and tuple(F._ntuple(inner.padding, 2)) == (3, 3)
                and inner.groups == 1 and inner.in_channels <= 4):
            continue
        if not isinstance(m.relu, nn.ReLU):
            continue
        mp = m.maxpool
        mp_stride = mp.stride if getattr(mp, "stride", None) is not None \
            else getattr(mp, "kernel_size", None)
        if not (isinstance(mp, nn.MaxPool2d)
                and tuple(F._ntuple(mp.kernel_size, 2)) == (3, 3)
                and tuple(F._ntuple(mp_stride, 2)) == (2, 2)
                and tuple(F._ntuple(mp.padding, 2)) == (1, 1)
                and not mp.ceil_mode):
            continue
        bn = m.bn1
        if isinstance(bn, nn.BatchNorm2d):
            if not fold_bn_after(inner, bn):
                continue
            m.bn1 = nn.Identity()
        elif not isinstance(bn, nn.Identity):
            continue
        m.conv1 = FusedStem(conv, max_batch=max_batch, interpret=interpret)
        m.relu = nn.Identity()
        m.maxpool = nn.Identity()
        fused += 1
    return fused
