"""Whole-block fusion pass for small-batch serving.

Replaces deployed post-activation ``BasicBlock``s (stride 1, identity
shortcut) with :class:`FusedBlock`, which executes the ENTIRE block —
sign -> conv1 -> epilogue -> act -> sign -> conv2 -> epilogue -> residual
-> act — as one Pallas megakernel (:func:`bnn_tpu.kernels.block.
fused_basic_block`) with the feature map resident in VMEM.

Where it wins (measured on v5e, PReLU binary ResNet-18): SMALL batch.
At B=1, fusing every eligible block cuts whole-model latency 398us ->
285us (1.4x; the QAT fake-quant graph runs 205us, so fusion recovers most
of the deployed path's B=1 regression). Two effects stack:

1. Isolated kernel-vs-ops wins at the shape extremes, where XLA's convs
   underfill the MXU: 1.3x at 56x56x64, 3.6x at 7x7x512 (XLA drops to
   ~10 TOP/s at M=49). At 28x28x128 / 14x14x256 the kernel's ~8-10us
   floor LOSES to XLA's 4-5us in isolation.
2. An in-context "boundary tax": chaining deployed stages inflates them
   well beyond their isolated times (layer3+layer4 run 2x their isolated
   sum; XLA loses VMEM pinning / prefetch quality as the graph grows).
   Every fused block removes ~8 op boundaries, so fusing ALL eligible
   blocks beats the isolated-win-region-only policy end to end
   (285us vs 359us) — hence ``fuse_when=None`` (always fuse under the
   batch cap) is the default.

At batch >= ~8 XLA runs the unfused sequence at 120-330 TOP/s — near the
int8 roofline and above the megakernel's ~50-110 TOP/s (its in-VMEM patch
assembly costs more than the saved HBM round trips) — so the batch cap
keeps large batches on the original ops. TPU programs are statically
scheduled: there is no per-op launch overhead to save; fusion here is
purely an HBM-traffic / MXU-shape / scheduling play.

ROUND-3 MEASUREMENT WARNING (the degenerate-model trap, rediscovered the
hard way): a ``zero_to_one=True`` model with post-act ReLU is DEGENERATE
— ``sign(relu(x)) == +1`` everywhere, XLA range-simplifies the compare
and folds the ENTIRE binary body to constants (compiled flops drop from
3.77G to 0.46G), so unfused XLA timings on that config measure only the
stem. A mid-round policy sweep on such a model wrongly concluded the
kernels should be off; re-measured on honest configs (torch-parity
ternary sign, or PReLU) full fusion wins at every small batch: B=1
62 vs 236 us unfused, B=4 151 vs 342, B=8 ~tie, B=64 XLA (caps route
there). Always check ``jit(f).lower(x).compile().cost_analysis()['flops']``
before believing a binary-net benchmark.

:class:`FusedBlock` dispatches at trace time on the actual input shape:
the megakernel runs iff ``batch <= max_fused_batch`` AND ``fuse_when(n,
h, w, c)`` holds. :func:`default_fuse_predicate` (the isolated win
region) remains available for deployments that fuse selectively. Both
paths read the same underlying weight arrays.

Run :func:`~bnn_tpu.inference.optimize.optimize_deployed` first (or let
:func:`fuse_blocks` call the per-block BN folds itself) so the BNs are
already folded into the conv epilogues.

The reference framework has no runtime at all (reference README.md:22);
this pass is part of the execution layer it explicitly lacks.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from .. import functional as F
from .. import nn
from ..binarize import named_modules, set_module_by_name
from ..kernels.block import fused_basic_block
from ..kernels.packing import unpack_bits
from ..kernels.bottleneck import fused_bottleneck
from ..kernels.strided_block import fused_downsample_block
from ..models.layers import BasicBlock, Bottleneck, PreBasicBlock
from .deploy import DeployedConv
from .optimize import fold_bn_after

__all__ = ["fuse_blocks", "FusedBlock", "FusedDownBlock", "FusedBottleneck",
           "default_fuse_predicate"]


def _conv_weight_int8(conv: DeployedConv):
    """The conv's ``+/-1`` weights as int8 in storage-layout order.

    Detects packing by shape, not ``weight_format``: GEMM-mode convs store
    packed int32 lanes regardless of the requested format.
    """
    w = conv.w_packed[...]
    if w.shape[-2] != conv.k:  # packed int32 lanes
        w = unpack_bits(w, conv.k, axis=-2, dtype=jnp.int8)
        w = w[..., : conv.k, :]
    return w


def default_fuse_predicate(n: int, h: int, w: int, c: int) -> bool:
    """v5e-measured region where the megakernel beats XLA's ops IN ISOLATION.

    At B<=4 the kernel wins at the channel extremes (C<=64: wide spatial,
    XLA conv ~35 TOP/s; C>=512: M=h*w too small for XLA's tiling, ~10
    TOP/s) and loses in the middle where XLA already runs at 90-105 TOP/s
    against the kernel's ~8-10us fixed floor. NOTE: end to end, fusing
    everything (``fuse_when=None``, the default) measured FASTER than this
    selective policy — whole-graph boundary effects outweigh the isolated
    losses (see module docstring). Use this (or a
    `utils.timing.loop_time` sweep on the target chip) only when fusing
    selectively.
    """
    return c <= 64 or c >= 512


def _act_kind(m) -> tuple:
    """(kind, slope_or_None) for a block activation module."""
    if isinstance(m, nn.ReLU):
        return "relu", None
    if isinstance(m, nn.PReLU):
        return "prelu", m.weight
    if isinstance(m, nn.Identity):
        return "identity", None
    return None, None


def _fusable_conv(conv) -> bool:
    return (
        isinstance(conv, DeployedConv)
        and conv.mode == "conv"
        and tuple(conv.kernel_size) == (3, 3)
        and tuple(F._ntuple(conv.stride, 2)) == (1, 1)
        and tuple(F._ntuple(conv.dilation, 2)) == (1, 1)
        and not isinstance(conv.padding, str)
        and tuple(F._ntuple(conv.padding, 2)) == (1, 1)
        and conv.in_channels == conv.out_channels
        and conv.spatial_post is None
    )


class FusedBlock(nnx.Module):
    """Megakernel execution of a deployed post-activation BasicBlock.

    Holds the original block (same weight arrays — no duplication) for the
    large-batch path and for checkpoint round-trips.
    """

    def __init__(self, block, *, max_fused_batch: int = 4,
                 fuse_when=None, pre: bool = False,
                 taps_per_dot: int = 9, interpret: bool = False):
        self.block = block
        self.max_fused_batch = max_fused_batch
        self.fuse_when = fuse_when or (lambda n, h, w, c: True)
        self.pre = pre  # pre-activation ordering (PreBasicBlock)
        self.taps_per_dot = taps_per_dot
        self.interpret = interpret

    def __call__(self, x):
        b = self.block
        if x.shape[0] > self.max_fused_batch or not self.fuse_when(*x.shape):
            return b(x)
        a1_kind, a1_slope = _act_kind(b.act1)
        a2_kind, a2_slope = _act_kind(b.act2)
        thr = (b.conv1.threshold[...]
               if b.conv1.threshold is not None else None)
        thr2 = (b.conv2.threshold[...]
                if b.conv2.threshold is not None else None)
        p1 = a1_slope[...] if a1_slope is not None else None
        p2 = a2_slope[...] if a2_slope is not None else None
        return fused_basic_block(
            x,
            _conv_weight_int8(b.conv1),
            _conv_weight_int8(b.conv2),
            b.conv1.scale[...], b.conv1.add[...],
            b.conv2.scale[...], b.conv2.add[...],
            act=(a1_kind, a2_kind), prelu1=p1, prelu2=p2,
            threshold=thr, threshold2=thr2, pre=self.pre,
            zero_to_one=getattr(b.conv1, "zero_to_one", False),
            out_dtype=x.dtype,
            taps_per_dot=self.taps_per_dot, interpret=self.interpret,
        )


class FusedDownBlock(nnx.Module):
    """Megakernel execution of a deployed STRIDE-2 (downsample) BasicBlock.

    Covers the blocks :class:`FusedBlock` cannot — conv1 at stride 2 with
    the BNN AvgPool->1x1->BN shortcut — via
    :func:`bnn_tpu.kernels.strided_block.fused_downsample_block`. Holds the
    original block (same weight arrays) for the large-batch path and for
    checkpoint round-trips.
    """

    def __init__(self, block, *, max_fused_batch: int = 4,
                 pre: bool = False, interpret: bool = False):
        self.block = block
        self.max_fused_batch = max_fused_batch
        self.pre = pre  # pre-activation ordering (PreBasicBlock)
        self.interpret = interpret

    def __call__(self, x):
        b = self.block
        n, h, w, _ = x.shape
        if n > self.max_fused_batch or h % 2 or w % 2:
            return b(x)
        dconv = b.downsample[1]
        a1_kind, a1_slope = _act_kind(b.act1)
        a2_kind, a2_slope = _act_kind(b.act2)

        def thr(conv):
            return conv.threshold[...] if conv.threshold is not None else None

        return fused_downsample_block(
            x,
            _conv_weight_int8(b.conv1),
            _conv_weight_int8(b.conv2),
            _conv_weight_int8(dconv),
            b.conv1.scale[...], b.conv1.add[...],
            b.conv2.scale[...], b.conv2.add[...],
            dconv.scale[...], dconv.add[...],
            act=(a1_kind, a2_kind),
            prelu1=a1_slope[...] if a1_slope is not None else None,
            prelu2=a2_slope[...] if a2_slope is not None else None,
            threshold1=thr(b.conv1), threshold2=thr(b.conv2),
            thresholdd=thr(dconv), pre=self.pre,
            zero_to_one=getattr(b.conv1, "zero_to_one", False),
            out_dtype=x.dtype, interpret=self.interpret,
        )


class FusedBottleneck(nnx.Module):
    """Megakernel execution of a deployed stride-1 Bottleneck (ResNet-50).

    Holds the original block (same weight arrays) for the large-batch
    path and for checkpoint round-trips.
    """

    def __init__(self, block, *, max_fused_batch: int = 4,
                 interpret: bool = False):
        self.block = block
        self.max_fused_batch = max_fused_batch
        self.interpret = interpret

    def __call__(self, x):
        b = self.block
        if x.shape[0] > self.max_fused_batch:
            return b(x)
        kinds, slopes = zip(*(_act_kind(a) for a in (b.act1, b.act2,
                                                     b.act3)))

        def thr(conv):
            return conv.threshold[...] if conv.threshold is not None else None

        def slope(s):
            return s[...] if s is not None else None

        kw = {}
        if b.downsample is not None:  # stride-1 projection shortcut
            dconv = b.downsample[1]
            kw = dict(wd=_conv_weight_int8(dconv), scaled=dconv.scale[...],
                      addd=dconv.add[...], thresholdd=thr(dconv))
        return fused_bottleneck(
            x,
            _conv_weight_int8(b.conv1),
            _conv_weight_int8(b.conv2),
            _conv_weight_int8(b.conv3),
            b.conv1.scale[...], b.conv1.add[...],
            b.conv2.scale[...], b.conv2.add[...],
            b.conv3.scale[...], b.conv3.add[...],
            act=kinds,
            prelu1=slope(slopes[0]), prelu2=slope(slopes[1]),
            prelu3=slope(slopes[2]),
            threshold1=thr(b.conv1), threshold2=thr(b.conv2),
            threshold3=thr(b.conv3),
            zero_to_one=getattr(b.conv1, "zero_to_one", False),
            out_dtype=x.dtype, interpret=self.interpret, **kw,
        )


def _pointwise_deployed(conv) -> bool:
    return (isinstance(conv, DeployedConv)
            and conv.mode in ("conv", "gemm", "im2col")
            and tuple(conv.kernel_size) == (1, 1)
            and tuple(F._ntuple(conv.stride, 2)) == (1, 1)
            # the kernels execute 1x1 convs as bare dots: a padded or
            # dilated 1x1 would silently lose its padding when fused
            and not isinstance(conv.padding, str)
            and tuple(F._ntuple(conv.padding, 2)) == (0, 0)
            and tuple(F._ntuple(conv.dilation, 2)) == (1, 1)
            and conv.spatial_post is None)


def _eligible_bottleneck(block) -> bool:
    if not isinstance(block, Bottleneck):
        return False
    dconv = dbn = None
    if block.downsample is not None:
        # stride-1 projection: AvgPool(k=s=1) (a no-op) -> 1x1 conv -> BN
        ds = block.downsample
        if not (isinstance(ds, nn.Sequential) and len(ds) == 3):
            return False
        ap, dconv, dbn = ds[0], ds[1], ds[2]
        ap_stride = ap.stride if getattr(ap, "stride", None) is not None \
            else getattr(ap, "kernel_size", None)
        if not (isinstance(ap, nn.AvgPool2d)
                and tuple(F._ntuple(ap.kernel_size, 2)) == (1, 1)
                and tuple(F._ntuple(ap_stride, 2)) == (1, 1)):
            return False
        if not _pointwise_deployed(dconv):
            return False
        if getattr(dconv, "zero_to_one", False) != getattr(
                block.conv1, "zero_to_one", False):
            return False
    if not (_pointwise_deployed(block.conv1)
            and _pointwise_deployed(block.conv3)):
        return False
    c2 = block.conv2
    if not (isinstance(c2, DeployedConv) and c2.mode == "conv"
            and tuple(c2.kernel_size) == (3, 3)
            and tuple(F._ntuple(c2.stride, 2)) == (1, 1)
            and tuple(F._ntuple(c2.dilation, 2)) == (1, 1)
            and not isinstance(c2.padding, str)
            and tuple(F._ntuple(c2.padding, 2)) == (1, 1)
            and c2.in_channels == c2.out_channels
            and c2.spatial_post is None):
        return False
    if block.downsample is None \
            and block.conv1.in_channels != block.conv3.out_channels:
        return False  # identity residual needs matching channels
    z = getattr(block.conv1, "zero_to_one", False)
    if any(getattr(cv, "zero_to_one", False) != z
           for cv in (block.conv2, block.conv3)):
        return False
    if any(_act_kind(a)[0] is None for a in (block.act1, block.act2,
                                             block.act3)):
        return False
    for ci, bi in (("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3")):
        bn = getattr(block, bi)
        if isinstance(bn, nn.Identity):
            continue
        if isinstance(bn, nn.BatchNorm2d) and fold_bn_after(
                getattr(block, ci), bn):
            setattr(block, bi, nn.Identity())
            continue
        return False
    if dbn is not None and not isinstance(dbn, nn.Identity):
        if isinstance(dbn, nn.BatchNorm2d) and fold_bn_after(dconv, dbn):
            block.downsample[2] = nn.Identity()
        else:
            return False
    return True


def _downsample_parts(block):
    """(avgpool, conv1x1, bn) of an eligible BNN downsample, else None."""
    ds = block.downsample
    if not isinstance(ds, nn.Sequential) or len(ds) != 3:
        return None
    ap, conv, bn = ds[0], ds[1], ds[2]
    if not isinstance(ap, nn.AvgPool2d):
        return None
    stride = ap.stride if ap.stride is not None else ap.kernel_size
    if (tuple(F._ntuple(ap.kernel_size, 2)) != (2, 2)
            or tuple(F._ntuple(stride, 2)) != (2, 2)
            or tuple(F._ntuple(ap.padding, 2)) != (0, 0)):
        return None
    # pointwise convs deploy in either conv or gemm mode; for a 1x1 the
    # weight layouts coincide ((C_in, C_out) on the trailing axes)
    if not _pointwise_deployed(conv):  # incl. zero padding / no dilation
        return None
    return ap, conv, bn


def _eligible_down(block) -> bool:
    from .optimize import fold_bn_before

    pre = isinstance(block, PreBasicBlock)
    if not isinstance(block, (BasicBlock, PreBasicBlock)) \
            or block.downsample is None:
        return False
    c1, c2 = block.conv1, block.conv2
    for conv, stride in ((c1, 2), (c2, 1)):
        if not (isinstance(conv, DeployedConv) and conv.mode == "conv"
                and tuple(conv.kernel_size) == (3, 3)
                and tuple(F._ntuple(conv.stride, 2)) == (stride, stride)
                and tuple(F._ntuple(conv.dilation, 2)) == (1, 1)
                and not isinstance(conv.padding, str)
                and tuple(F._ntuple(conv.padding, 2)) == (1, 1)
                and conv.spatial_post is None):
            return False
    parts = _downsample_parts(block)
    if parts is None:
        return False
    _, dconv, bn = parts
    z = getattr(c1, "zero_to_one", False)
    if (getattr(c2, "zero_to_one", False) != z
            or getattr(dconv, "zero_to_one", False) != z):
        return False
    a1, _ = _act_kind(block.act1)
    a2, _ = _act_kind(block.act2)
    if a1 is None or a2 is None:
        return False
    # BNs must be folded — fold them here if still present. Post-act: into
    # the conv epilogues; pre-act: into the convs' sign thresholds.
    if pre:
        for bi, ci_ in (("bn1", "conv1"), ("bn2", "conv2")):
            bn_ = getattr(block, bi)
            if isinstance(bn_, nn.Identity):
                continue
            if isinstance(bn_, nn.BatchNorm2d) and fold_bn_before(
                    bn_, getattr(block, ci_)):
                setattr(block, bi, nn.Identity())
                continue
            return False
        folds = ((dconv, bn, lambda: block.downsample.__setitem__(
            2, nn.Identity())),)
    else:
        folds = (
            (block.conv1, block.bn1, lambda: setattr(block, "bn1",
                                                     nn.Identity())),
            (block.conv2, block.bn2, lambda: setattr(block, "bn2",
                                                     nn.Identity())),
            (dconv, bn, lambda: block.downsample.__setitem__(
                2, nn.Identity())))
    for layer, bn_, setter in folds:
        if isinstance(bn_, nn.Identity):
            continue
        if isinstance(bn_, nn.BatchNorm2d) and fold_bn_after(layer, bn_):
            setter()
            continue
        return False
    return True


def _eligible(block) -> bool:
    if not isinstance(block, BasicBlock) or block.downsample is not None:
        return False
    if not (_fusable_conv(block.conv1) and _fusable_conv(block.conv2)):
        return False
    if (getattr(block.conv1, "zero_to_one", False)
            != getattr(block.conv2, "zero_to_one", False)):
        return False  # kernel applies one sign(0) convention to both signs
    a1, _ = _act_kind(block.act1)
    a2, _ = _act_kind(block.act2)
    if a1 is None or a2 is None:
        return False
    # BNs must be folded (Identity) — try folding them here if still present
    for ci, bi in (("conv1", "bn1"), ("conv2", "bn2")):
        bn = getattr(block, bi)
        if isinstance(bn, nn.Identity):
            continue
        if isinstance(bn, nn.BatchNorm2d) and fold_bn_after(
                getattr(block, ci), bn):
            setattr(block, bi, nn.Identity())
            continue
        return False
    return True


def _eligible_pre(block) -> bool:
    """Pre-activation BasicBlock: bn -> sign -> conv, act before residual.

    bn1/bn2 fold into the convs' sign THRESHOLDS (the BN-before identity,
    inference.optimize.fold_bn_before); the megakernel consumes them as
    threshold/threshold2 with ``pre=True`` ordering.
    """
    from .optimize import fold_bn_before

    if not isinstance(block, PreBasicBlock) or block.downsample is not None:
        return False
    if not (_fusable_conv(block.conv1) and _fusable_conv(block.conv2)):
        return False
    if (getattr(block.conv1, "zero_to_one", False)
            != getattr(block.conv2, "zero_to_one", False)):
        return False
    a1, _ = _act_kind(block.act1)
    a2, _ = _act_kind(block.act2)
    if a1 is None or a2 is None:
        return False
    for bi, ci in (("bn1", "conv1"), ("bn2", "conv2")):
        bn = getattr(block, bi)
        if isinstance(bn, nn.Identity):
            continue
        if isinstance(bn, nn.BatchNorm2d) and fold_bn_before(
                bn, getattr(block, ci)):
            setattr(block, bi, nn.Identity())
            continue
        return False
    return True


def fuse_blocks(model: nnx.Module, *, max_fused_batch: int = 4,
                fuse_when=None, strided: bool = True,
                taps_per_dot: int = 9, interpret: bool = False) -> int:
    """Replace eligible deployed BasicBlocks with FusedBlocks (in place).

    Returns the number of blocks fused. Apply after
    :func:`~bnn_tpu.inference.deploy` (+ ideally
    :func:`~bnn_tpu.inference.optimize.optimize_deployed`). Whether the
    megakernel actually runs is decided per trace by ``max_fused_batch``
    and ``fuse_when`` (see :class:`FusedBlock`); the default ``None``
    always fuses below the batch cap — measured fastest end to end.

    ``strided=True`` (default ON since round 3) additionally fuses
    stride-2 downsample blocks via :class:`FusedDownBlock`. The earlier
    "net loss for post-act" measurement was taken on a degenerate
    zero_to_one+ReLU model whose unfused downsamples XLA folded away (see
    the module docstring warning); on honest configs the fused downs are
    a large win (they carry most of the 236 -> 62us B=1 gap together with
    the stage kernels).
    """
    fused = 0
    wrapped = []  # don't descend into fused blocks (their .block stays live)
    for name, m in list(named_modules(model)):
        # NOTE: FusedStage subtrees are NOT skipped — their fallback
        # Sequential (batches above the stage cap) should still get
        # per-block megakernels; FusedStage captured its metadata at
        # construction, so wrapping its children is safe.
        if isinstance(m, (FusedBlock, FusedDownBlock, FusedBottleneck)):
            wrapped.append(name + ".")
            continue
        if any(name.startswith(p) for p in wrapped):
            continue
        if _eligible(m):
            set_module_by_name(model, name, FusedBlock(
                m, max_fused_batch=max_fused_batch, fuse_when=fuse_when,
                taps_per_dot=taps_per_dot, interpret=interpret))
            fused += 1
        elif _eligible_pre(m):
            set_module_by_name(model, name, FusedBlock(
                m, max_fused_batch=max_fused_batch, fuse_when=fuse_when,
                pre=True, taps_per_dot=taps_per_dot, interpret=interpret))
            fused += 1
        elif _eligible_bottleneck(m):
            set_module_by_name(model, name, FusedBottleneck(
                m, max_fused_batch=max_fused_batch, interpret=interpret))
            fused += 1
        elif _eligible_down(m) and (strided or isinstance(m, PreBasicBlock)):
            set_module_by_name(model, name, FusedDownBlock(
                m, max_fused_batch=max_fused_batch,
                pre=isinstance(m, PreBasicBlock), interpret=interpret))
            fused += 1
    return fused
